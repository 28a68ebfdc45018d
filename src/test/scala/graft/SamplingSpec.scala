package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSample: same rows regardless of partitioning, ~fraction kept") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.3, seed = 1)
      .as[Long].collect().sorted.toSeq
    val b = Sampling.deterministicSample(df.repartition(13), "id", 0.3, seed = 1)
      .as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(math.abs(a.length / 10000.0 - 0.3) < 0.02)
  }

  test("deterministicSample: different seeds give different samples") {
    val df = spark.range(1000).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.5, seed = 1).as[Long].collect().toSet
    val b = Sampling.deterministicSample(df, "id", 0.5, seed = 2).as[Long].collect().toSet
    assert(a != b)
  }

  test("deterministicSample: fractions nest (0.2 sample is a subset of 0.5)") {
    val df = spark.range(5000).toDF("id")
    val small = Sampling.deterministicSample(df, "id", 0.2).as[Long].collect().toSet
    val big = Sampling.deterministicSample(df, "id", 0.5).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedSample: per-stratum fractions; unlisted strata dropped") {
    val df = (1 to 3000).map(i => (i.toLong, Seq("a", "b", "c")(i % 3))).toDF("id", "k")
    val out = Sampling.stratifiedSample(df, "k", Map("a" -> 1.0, "b" -> 0.3), "id")
    val byK = out.groupBy("k").count().as[(String, Long)].collect().toMap
    assert(byK("a") == 1000L)
    assert(math.abs(byK("b") / 1000.0 - 0.3) < 0.06)
    assert(!byK.contains("c"))
  }

  test("rebalanceToDistribution: output follows the target mix; binding stratum kept whole") {
    // strata sizes: a=4000, b=500, c=1000, d=300 (d untargeted);
    // targets a:b:c = 2:1:1 → shares 0.5/0.25/0.25; binding stratum is
    // b (500/0.25 = 2000 = M) → b keeps ALL 500, a keeps ~1000 of
    // 4000, c keeps ~500 of 1000, d dropped.
    val df = (
      (1 to 4000).map(i => (i.toLong, "a")) ++
      (1 to 500).map(i => (10000L + i, "b")) ++
      (1 to 1000).map(i => (20000L + i, "c")) ++
      (1 to 300).map(i => (30000L + i, "d"))).toDF("id", "k")
    val out = Sampling.rebalanceToDistribution(
      df, "k", Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0), "id")
    val byK = out.groupBy($"k").count().as[(String, Long)].collect().toMap
    assert(byK("b") == 500L) // binding stratum: fraction exactly 1
    assert(math.abs(byK("a") / 1000.0 - 1.0) < 0.12)
    assert(math.abs(byK("c") / 500.0 - 1.0) < 0.15)
    assert(!byK.contains("d"))
    // deterministic: same result on a different partitioning
    val again = Sampling.rebalanceToDistribution(
      df.repartition(13), "k", Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0), "id")
      .select($"id").as[Long].collect().toSet
    assert(again == out.select($"id").as[Long].collect().toSet)
    // a targeted stratum ABSENT from the corpus is ignored (the mix
    // is computed over observed strata, matching the SQL oracle's
    // inner join on counts): 'a' keeps everything, no 'b' rows appear
    val noB = df.where($"k" =!= "b")
    val onlyA = Sampling.rebalanceToDistribution(
      noB, "k", Map("a" -> 1.0, "b" -> 1.0), "id")
    assert(onlyA.count() == 4000L)
    // corpus with NO targeted strata at all → empty
    assert(Sampling.rebalanceToDistribution(
      df.where($"k" === "d"), "k", Map("a" -> 1.0), "id").count() == 0L)
  }
}
