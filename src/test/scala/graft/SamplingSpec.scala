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

  test("splitByHash: disjoint, exhaustive, ~weights, partition-independent") {
    val df = spark.range(20000).toDF("id")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.splitByHash(df, w, "id", seed = 3)
    val byS = out.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test")) // exhaustive, no nulls
    assert(byS.values.sum == 20000L)
    assert(math.abs(byS("train") / 20000.0 - 0.8) < 0.01)
    assert(math.abs(byS("val") / 20000.0 - 0.1) < 0.01)
    val again = Sampling.splitByHash(df.repartition(17), w, "id", seed = 3)
      .where($"split" === "val").select($"id").as[Long].collect().toSet
    val valIds = out.where($"split" === "val").select($"id").as[Long].collect().toSet
    assert(again == valIds)
  }

  test("temp-column hygiene: poisoned __graft_h/__graft_rn user columns survive intact") {
    // A user frame that already has the operators' old fixed temp
    // names: outputs must match the clean-frame run AND keep the
    // poisoned columns' values.
    val clean = spark.range(2000).toDF("id")
    val poisoned = clean
      .withColumn("__graft_h", $"id" * 2)
      .withColumn("__graft_rn", $"id" + 7)
    val w = Seq("train" -> 0.8, "val" -> 0.2)
    val cleanSplit = Sampling.splitByHash(clean, w, "id", seed = 3)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val out = Sampling.splitByHash(poisoned, w, "id", seed = 3)
    assert(out.columns.toSeq ==
      Seq("id", "__graft_h", "__graft_rn", "split"))
    out.select($"id", $"__graft_h", $"__graft_rn", $"split")
      .as[(Long, Long, Long, String)].collect().foreach {
        case (id, h, rn, split) =>
          assert(h == id * 2 && rn == id + 7 && split == cleanSplit(id))
      }
    val poisoned2 = (
      (1 to 300).map(i => (i.toLong, "big")) ++
      (1 to 40).map(i => (1000L + i, "small"))).toDF("id", "k")
      .withColumn("__graft_rn", $"id" + 1)
    val capped = Sampling.capPerStratum(poisoned2, "k", 100, "id")
    val byK = capped.groupBy($"k").count().as[(String, Long)].collect().toMap
    assert(byK == Map("big" -> 100L, "small" -> 40L))
    assert(capped.where($"__graft_rn" =!= $"id" + 1).count() == 0)
  }

  test("splitByHash: growing a prefix split only absorbs rows from later splits") {
    val df = spark.range(5000).toDF("id")
    def trainIds(tw: Double) = Sampling.splitByHash(
      df, Seq("train" -> tw, "val" -> ((1 - tw) / 2), "test" -> ((1 - tw) / 2)),
      "id", seed = 1).where($"split" === "train").select($"id").as[Long].collect().toSet
    assert(trainIds(0.6).subsetOf(trainIds(0.9)))
  }

  test("splitByHash: null id gets a null split; weights validated") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("id")
    val out = Sampling.splitByHash(df, Seq("a" -> 1.0), "id")
    assert(out.where($"id".isNull).select($"split").collect().head.isNullAt(0))
    assert(out.where($"id".isNotNull && $"split" === "a").count() == 2)
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(df, Seq("a" -> 0.5, "a" -> 0.5), "id")
    }
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(df, Seq("a" -> 0.0), "id")
    }
  }

  test("capPerStratum: exact per-stratum counts, deterministic, rank-stable caps") {
    val df = (
      (1 to 300).map(i => (i.toLong, "big")) ++
      (1 to 40).map(i => (1000L + i, "small"))).toDF("id", "k")
    val out = Sampling.capPerStratum(df, "k", 100, "id")
    val byK = out.groupBy($"k").count().as[(String, Long)].collect().toMap
    assert(byK("big") == 100L)   // capped exactly
    assert(byK("small") == 40L)  // under-cap stratum untouched
    // deterministic under repartitioning
    val again = Sampling.capPerStratum(df.repartition(7), "k", 100, "id")
      .select($"id").as[Long].collect().toSet
    assert(again == out.select($"id").as[Long].collect().toSet)
    // a smaller cap is a prefix of a larger one (hash rank is stable)
    val c50 = Sampling.capPerStratum(df, "k", 50, "id")
      .select($"id").as[Long].collect().toSet
    assert(c50.subsetOf(again))
    // the rank filter compiles to WindowGroupLimit (map-side pre-prune
    // BEFORE the stratum shuffle — the 100 TB skew guard)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("upsample: times-many copies with 0-based rep; ≤0/null drop the row") {
    val df = Seq(
      (1L, 3L), (2L, 1L), (3L, 0L), (4L, -2L))
      .toDF("id", "w")
      .union(Seq((5L, null.asInstanceOf[java.lang.Long])).toDF("id", "w"))
    val out = Sampling.upsample(df, $"w")
      .select($"id", $"rep").as[(Long, Long)].collect().toSeq.sorted
    assert(out == Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)))
    // no shuffle: the fan-out is row-local inside the scan's task
    val plan = Sampling.upsample(df, $"w").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shuffleForTraining: contiguous permutation matching the md5 order") {
    val n = 2000
    val df = spark.range(n).toDF("id")
    val out = Sampling.shuffleForTraining(df, "id", seed = 3)
      .as[(Long, Long)].collect().toSeq
    assert(out.length == n)
    assert(out.map(_._2).sorted == (0L until n.toLong))
    // matches the reference rank: ORDER BY md5(id || ':3') || ':' || id
    val expected = (0L until n.toLong)
      .sortBy(i => md5Hex(s"$i:3") + ":" + i)
      .zipWithIndex.map { case (id, r) => id -> r.toLong }.toMap
    out.foreach { case (id, r) => assert(r == expected(id), s"id $id") }
  }

  test("shuffleForTraining: reproducible under repartitioning; seed changes the order") {
    val df = spark.range(5000).toDF("id")
    val a = Sampling.shuffleForTraining(df, "id", seed = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Sampling.shuffleForTraining(df.repartition(17), "id", seed = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    val c = Sampling.shuffleForTraining(df, "id", seed = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a != c)
  }

  test("mixCorpora: epochs + fractional sample per source, contiguous global order") {
    val a = spark.range(1000).toDF("id")   // weight 2.5 -> 2 epochs + ~500
    val b = spark.range(1000, 1800).toDF("id") // weight 0.25 -> ~200
    val out = Sampling.mixCorpora(Seq((a, 2.5), (b, 0.25)), "id", seed = 5)
    val rows = out.select($"source_idx", $"id", $"rep", $"order_id")
      .as[(Int, Long, Long, Long)].collect().toSeq
    // contiguous permutation across the whole mix
    assert(rows.map(_._4).sorted == (0L until rows.length.toLong))
    val bySrc = rows.groupBy(_._1)
    // source 0: every id appears at rep 0 and 1; rep 2 is the ~0.5 sample
    val s0 = bySrc(0)
    assert(s0.count(_._3 == 0L) == 1000)
    assert(s0.count(_._3 == 1L) == 1000)
    val s0frac = s0.count(_._3 == 2L)
    assert(math.abs(s0frac - 500) < 80, s"frac epoch size $s0frac")
    // source 1: single fractional epoch at rep 0
    val s1 = bySrc(1)
    assert(s1.forall(_._3 == 0L))
    assert(math.abs(s1.length - 200) < 60, s"source-1 size ${s1.length}")
  }

  test("splitByCluster: no cluster straddles splits; singletons match splitByHash") {
    val df = spark.range(1000).toDF("id")
    // chain 0-1-2, pair 10-11, star 20-{21,22,23}: clusters of
    // diameter > 1 included on purpose
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L), (20L, 22L), (20L, 23L))
      .toDF("id_a", "id_b")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val rows = Sampling.splitByCluster(df, pairs, w, "id", seed = 3)
      .as[(Long, String)].collect()
    // row count BEFORE the Map conversion: toMap would silently
    // dedup a multi-row-per-id regression
    assert(rows.length == 1000)
    val out = rows.toMap
    assert(out.size == 1000)
    // every clustered doc shares its cluster-min's split
    for (grp <- Seq(Seq(0L, 1L, 2L), Seq(10L, 11L), Seq(20L, 21L, 22L, 23L)))
      assert(grp.map(out).distinct.size == 1, s"cluster $grp straddles splits")
    // unclustered docs get exactly their splitByHash assignment
    val byHash = Sampling.splitByHash(df, w, "id", seed = 3)
      .as[(Long, String)].collect().toMap
    val clustered = Set(0L, 1L, 2L, 10L, 11L, 20L, 21L, 22L, 23L)
    for (i <- 0L until 1000L if !clustered(i)) assert(out(i) == byHash(i))
    // and reproducible under repartitioning
    val again = Sampling.splitByCluster(df.repartition(13), pairs.repartition(2),
      w, "id", seed = 3).as[(Long, String)].collect().toMap
    assert(again == out)
  }

  test("mixCorpora: reproducible under repartitioning; fractional picks nest in the source sample") {
    val a = spark.range(500).toDF("id")
    val b = spark.range(500, 900).toDF("id")
    val m1 = Sampling.mixCorpora(Seq((a, 0.4), (b, 1.0)), "id", seed = 9)
      .select($"source_idx", $"id", $"rep", $"order_id")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._4).toSeq
    val m2 = Sampling.mixCorpora(Seq((a.repartition(7), 0.4), (b.repartition(3), 1.0)),
      "id", seed = 9)
      .select($"source_idx", $"id", $"rep", $"order_id")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._4).toSeq
    assert(m1 == m2)
    // the 0.4 sample of source 0 equals deterministicSample at the derived seed
    val expect = Sampling.deterministicSample(a, "id", 0.4, seed = 9 * 131)
      .as[Long].collect().toSet
    assert(m1.filter(_._1 == 0).map(_._2).toSet == expect)
    // weight 1.0 = exactly one full epoch, no fractional rows
    assert(m1.filter(_._1 == 1).forall(_._3 == 0L))
    assert(m1.count(_._1 == 1) == 400)
  }

  test("temperatureWeights/Mix: natural identity, alpha=0 equalizes, composition") {
    val df = spark.range(400).select(
      when($"id" < 100, "a").otherwise("b").as("src"), $"id")
    def rates(alpha: Double): Map[String, Double] =
      Sampling.temperatureWeights(df, "src", alpha).collect()
        .map(r => (r.getString(0), r.getDouble(2))).toMap
    // alpha = 1: the natural mix — every source rate exactly 1
    assert(rates(1.0) == Map("a" -> 1.0, "b" -> 1.0))
    // alpha = 0: equal budgets (200 each) — a upsampled 2x, b 2/3
    val w0 = rates(0.0)
    assert(w0("a") == 2.0)
    assert(w0("b") == 0.666667)
    // monotone: 0 < alpha < 1 sits between the two regimes
    val wh = rates(0.5)
    assert(wh("a") > 1.0 && wh("a") < 2.0)
    assert(wh("b") < 1.0 && wh("b") > 0.666667)

    val mixed = Sampling.temperatureMix(df, "src", "id", alpha = 0.0, seed = 1)
    val counts = mixed.groupBy("src").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // a: rate 2.0 = exactly two full epochs; b: 2/3 hash sample
    assert(counts("a") == 200)
    assert(counts("b") > 150 && counts("b") < 250, s"b=${counts("b")}")
    // contiguous global training order
    val n = mixed.count()
    val mm = mixed.agg(min($"order_id"), max($"order_id")).head()
    assert(mm.getLong(0) == 0 && mm.getLong(1) == n - 1)
    // alpha = 1 on equal-weight sources: every row exactly once
    val nat = Sampling.temperatureMix(df, "src", "id", alpha = 1.0)
    assert(nat.count() == 400)
    assert(nat.select($"src", $"id").distinct().count() == 400)
  }

  test("negativeSample: k non-self negatives per anchor, deterministic") {
    val df = (1L to 200L).map(i => (i, s"payload$i")).toDF("id", "v")
    val out = Sampling.negativeSample(df, "id", k = 3, seed = 7)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 600)
    // never self, j complete per anchor
    assert(out.forall { case (a, _, n) => a != n })
    val perAnchor = out.groupBy(_._1)
    assert(perAnchor.size == 200 && perAnchor.values.forall(_.map(_._2).sorted.toSeq == Seq(0, 1, 2)))
    // reproducible across partitionings
    val again = Sampling.negativeSample(df.repartition(13), "id", k = 3, seed = 7)
      .as[(Long, Int, Long)].collect()
    assert(out.toSet == again.toSet)
    // a different seed draws a different assignment
    val other = Sampling.negativeSample(df, "id", k = 3, seed = 8)
      .as[(Long, Int, Long)].collect()
    assert(other.toSet != out.toSet)
  }

  test("negativeSample: draws are roughly uniform over the corpus") {
    val df = (1L to 500L).map(i => (i, i)).toDF("id", "v")
    val out = Sampling.negativeSample(df, "id", k = 8, seed = 1)
      .select($"neg_id").as[Long].collect()
    val counts = out.groupBy(identity).view.mapValues(_.size).toMap
    // 4000 draws over 500 ids: E = 8; no id should be wildly hot or absent
    assert(counts.size > 450, s"only ${counts.size} distinct negatives drawn")
    assert(counts.values.max <= 30, s"hottest negative drawn ${counts.values.max}x")
  }

  test("allocateBudget: quotas sum to the target exactly; largest remainders win") {
    // counts 3:3:1 over target 10 -> exact shares 30/7, 30/7, 10/7;
    // floors 4,4,1 leave 1 unit; remainders 2/7, 2/7, 3/7 -> c's is
    // LARGEST, so c (the smallest group!) gets the extra unit -
    // exactly the case naive biggest-group-first rounding gets wrong
    val df = (Seq.fill(3)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("g")
    val out = Sampling.allocateBudget(df, "g", target = 10)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("a", 3L, 4L), ("b", 3L, 4L), ("c", 1L, 2L)))
    assert(out.map(_._3).sum == 10L)
    // a target that naive rounding would drift on: 100 groups of 1,
    // target 50 -> every share is 0.5; exactly 50 groups get a unit
    val many = (0 until 100).map(i => f"g$i%03d").toDF("g")
    val m = Sampling.allocateBudget(many, "g", target = 50)
      .as[(String, Long, Long)].collect()
    assert(m.map(_._3).sum == 50L)
    assert(m.count(_._3 == 1L) == 50)
    // rem ties broken by group key: the lexicographically first 50 win
    assert(m.filter(_._3 == 1L).map(_._1).sorted.toSeq ==
      (0 until 50).map(i => f"g$i%03d"))
    // empty input (or all-null keys) with target > 0 cannot meet the
    // Σ quota == target invariant — it raises instead of returning an
    // empty frame a shard-sizing consumer would silently accept
    val emptyEx = intercept[Exception] {
      Sampling.allocateBudget(df.where(lit(false)), "g", 10).collect()
    }
    def allMsgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ allMsgs(e.getCause))
    assert(allMsgs(emptyEx).exists(_.contains("cannot meet target")))
    val nullEx = intercept[Exception] {
      Sampling.allocateBudget(
        Seq[Option[String]](None, None).toDF("g"), "g", 10).collect()
    }
    assert(allMsgs(nullEx).exists(_.contains("cannot meet target")))
    // target 0 over an empty input is fine: empty plan, no raise
    assert(Sampling.allocateBudget(df.where(lit(false)), "g", 0)
      .collect().isEmpty)
    // null groups dropped; determinism; the groups cap fires loudly
    val a = Sampling.allocateBudget(df.repartition(5), "g", 10)
      .collect().toSet
    assert(a == Sampling.allocateBudget(df, "g", 10).collect().toSet)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val ex = intercept[Exception] {
      Sampling.allocateBudget(many, "g", 50, maxGroups = 10).collect()
    }
    assert(msgs(ex).exists(_.contains("maxGroups")))
  }
}
