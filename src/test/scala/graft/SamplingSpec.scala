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
}
