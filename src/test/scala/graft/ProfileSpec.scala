package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact row/null/distinct counts per column") {
    val df = Seq(
      (Some("a"), Some(1)), (Some("a"), None), (None, Some(2)), (Some("b"), Some(2)))
      .toDF("s", "i")
    val out = Profile.profile(df)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out("s") == ((4L, 1L, 2L)))
    assert(out("i") == ((4L, 1L, 2L)))
  }

  test("profile: approx mode returns plausible estimates") {
    val df = (1 to 1000).map(i => i % 100).toDF("v")
    val (_, _, dist) = Profile.profile(df, approx = true)
      .as[(String, Long, Long, Long)].head() match {
        case (_, n, nulls, d) => (n, nulls, d)
      }
    assert(dist > 80 && dist < 120)
  }

  test("profile: 60-column corpus profile is one pass, no expand, no codegen blowup") {
    import org.apache.spark.sql.functions._
    // the realistic corpus-profile call: wide schema, approx distinct
    val nCols = 60
    val wide = spark.range(500).select(
      (0 until nCols).map(i => (col("id") * (i + 1) % 37).as(s"c$i")): _*)
    // fail instead of silently falling back if generated code breaks
    // (the 64 KB Janino method-limit hazard documented in SURVEY §6a)
    val prior = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Profile.profile(wide, approx = true)
      val rows = out.as[(String, Long, Long, Long)].collect()
      assert(rows.length == nCols)
      assert(rows.forall(_._2 == 500L)) // n_rows
      assert(rows.forall(_._3 == 0L)) // n_nulls
      // c0 = id % 37 has 37 distinct values; HLL at default precision
      // is exact-ish at this cardinality
      val d0 = rows.find(_._1 == "c0").get._4
      assert(d0 >= 30 && d0 <= 44, s"c0 distinct estimate $d0")
      val plan = out.queryExecution.executedPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val inner = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // approx path: single aggregation over a single leaf — no
      // Expand (the exact multi-distinct rewrite would multiply every
      // input row by the distinct-column count: a 60× blowup)
      assert(inner.collectLeaves().size == 1, "profile must scan once")
      assert(!inner.toString.contains("Expand"),
        "approx profile must not use the expand-based distinct rewrite")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("quantiles: exact values on a known distribution, approx within tolerance") {
    import graft.operators.Profile
    // values 1..101 → p·(n−1) interpolation lands exactly on
    // 1 + 100p for every p
    val df = spark.range(1, 102).toDF("v")
      .withColumn("w", $"v" * 2)
      .repartition(7)
    val exact = Profile
      .quantiles(df, Seq("v", "w"), Seq(0.0, 0.25, 0.5, 0.95, 1.0))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(exact(("v", 0.0)) == 1.0)
    assert(exact(("v", 0.25)) == 26.0)
    assert(exact(("v", 0.5)) == 51.0)
    assert(exact(("v", 0.95)) == 96.0)
    assert(exact(("v", 1.0)) == 101.0)
    assert(exact(("w", 0.5)) == 102.0)
    // approx t-digest stays within 1% of exact at default accuracy
    val approx = Profile
      .quantiles(df, Seq("v"), Seq(0.25, 0.5, 0.95), approx = true)
      .collect()
      .map(r => r.getDouble(1) -> r.getDouble(2))
      .toMap
    Seq(0.25 -> 26.0, 0.5 -> 51.0, 0.95 -> 96.0).foreach { case (p, want) =>
      assert(math.abs(approx(p) - want) <= 1.0, s"p=$p got ${approx(p)}")
    }
    intercept[IllegalArgumentException] {
      Profile.quantiles(df, Nil)
    }
    intercept[IllegalArgumentException] {
      Profile.quantiles(df, Seq("v"), Seq(1.5))
    }
  }

  test("quantiles: approx within 1% of exact at sf1 (the 100 TB configuration)") {
    // Empirical accuracy bound at REAL scale: 6M-row sf1 lineitem,
    // the same (column × prob) grid the q_quantiles board row uses.
    // Cancels (doesn't silently pass) when the generated sf1 data is
    // absent — regenerate with graft.tools.GenScale.
    import graft.operators.Profile
    val dir = "/root/repo/testdata-sf1"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists(),
      s"sf1 data not generated at $dir")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    def grid(approx: Boolean): Map[(String, Double), Double] =
      Profile.quantiles(li, cols, probs, approx = approx)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
    val exact = grid(approx = false)
    val sketch = grid(approx = true)
    val n = li.count().toDouble
    sketch.foreach { case ((c, p), got) =>
      // Quantile sketches guarantee RANK error (value error is
      // meaningless on discrete columns like integer l_quantity,
      // where adjacent values sit 4% apart): the returned element's
      // CDF bracket [P(X < got), P(X <= got)] must cover p to within
      // 1% of rank.
      import org.apache.spark.sql.functions.{sum, when, col}
      val Seq(below, atOrBelow) = li
        .agg(sum(when(col(c) < got, 1L).otherwise(0L)),
          sum(when(col(c) <= got, 1L).otherwise(0L)))
        .collect().head.toSeq.map(_.asInstanceOf[Long].toDouble / n)
      assert(below <= p + 0.01 && atOrBelow >= p - 0.01,
        s"$c p=$p: approx $got has CDF bracket [$below, $atOrBelow] " +
          s"(exact ${exact((c, p))})")
    }
  }

  test("quantilesByGroup: equals per-group Profile.quantiles, one row per cell") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 300).map(i => (i.toLong, if (i % 3 == 0) "a" else "b", (i * 7 % 100).toDouble))
      .toDF("id", "g", "v")
    val probs = Seq(0.25, 0.5, 0.9)
    val grouped = graft.operators.Profile.quantilesByGroup(df, "g", Seq("v"), probs)
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    assert(grouped.size == 2 * probs.size)
    for (g <- Seq("a", "b"); p <- probs) {
      val solo = graft.operators.Profile.quantiles(df.where(col("g") === g), Seq("v"), Seq(p))
        .select("quantile").as[Double].head()
      assert(grouped((g, p)) == solo, s"group $g p $p")
    }
  }

  test("topValues / topValuesByGroup: counts, deterministic ties, WindowGroupLimit") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"), ("a", "z"), ("a", "z"),
      ("b", "p"), ("b", "p"), ("b", "p"), ("b", "q"))
      .toDF("g", "v")
    val top = graft.operators.Profile.topValues(df, "v", 2)
      .as[(String, Long)].collect().toSeq
    // p:3, then x:2 vs z:2 tie -> x (smaller value)
    assert(top == Seq(("p", 3L), ("x", 2L)))
    val byG = graft.operators.Profile.topValuesByGroup(df, "g", "v", 2)
      .as[(String, String, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(byG == Seq(
      ("a", "x", 2L, 1), ("a", "z", 2L, 2),
      ("b", "p", 3L, 1), ("b", "q", 1L, 2)))
    val plan = graft.operators.Profile.topValuesByGroup(df, "g", "v", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    val planTop = graft.operators.Profile.topValues(df, "v", 2)
      .queryExecution.executedPlan.toString
    assert(planTop.contains("TakeOrderedAndProject"), s"expected TakeOrdered in:\n$planTop")
  }

  test("dropBelowGroupQuantile: per-group thresholds, ties kept, null values dropped") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a", Some(10.0)), (2L, "a", Some(20.0)), (3L, "a", Some(30.0)),
      (4L, "a", Some(40.0)), (5L, "a", Some(50.0)),
      (6L, "b", Some(100.0)), (7L, "b", Some(200.0)), (8L, "b", Some(300.0)),
      (9L, "b", None)).toDF("id", "g", "v")
    // group a: p50 of {10..50} = 30 -> keep 3,4,5 (tie at 30 kept)
    // group b: p50 of {100,200,300} = 200 -> keep 7,8; null v dropped
    val kept = graft.operators.Profile.dropBelowGroupQuantile(df, "v", "g", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L, 7L, 8L))
    // p0 keeps everything non-null; p1 keeps only each group's max
    val all = graft.operators.Profile.dropBelowGroupQuantile(df, "v", "g", 0.0)
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    val top = graft.operators.Profile.dropBelowGroupQuantile(df, "v", "g", 1.0)
      .select("id").as[Long].collect().toSet
    assert(top == Set(5L, 8L))
  }

  test("winsorize: per-group clip at [pLo, pHi], nulls stay null, validation") {
    // group a = {0..10}: p10 -> 1.0, p90 -> 9.0 (exact interpolation
    // indexes); group b shifted by 100 gets its OWN bounds
    val df = ((0 to 10).map(v => (v.toLong, "a", Some(v.toDouble))) ++
      (0 to 10).map(v => (100L + v, "b", Some(100.0 + v))) :+
      (99L, "a", None: Option[Double]))
      .toDF("id", "g", "v")
    val out = graft.operators.Profile.winsorize(df, "v", "g", 0.1, 0.9)
      .select($"id", $"v_w").as[(Long, Option[Double])].collect().toMap
    assert(out(0L).contains(1.0) && out(10L).contains(9.0), "edges clip")
    assert(out(5L).contains(5.0) && out(9L).contains(9.0), "interior unchanged")
    assert(out(100L).contains(101.0) && out(110L).contains(109.0), "own group bounds")
    assert(out(99L).isEmpty, "null value clips to null")
    // p0/p1 clip nothing
    val id = graft.operators.Profile.winsorize(df, "v", "g", 0.0, 1.0)
      .where($"v".isNotNull)
      .select(($"v" === $"v_w").as[Boolean]).collect()
    assert(id.forall(identity))
    intercept[IllegalArgumentException] {
      graft.operators.Profile.winsorize(df, "v", "g", 0.9, 0.1)
    }
  }

  test("corpusCard: hand-computed per-group stats; null texts counted, not measured") {
    val df = Seq(
      ("en", "aaaa"), ("en", "aaaa"), ("en", "bb"), // dup pair + unique
      ("en", null.asInstanceOf[String]), // doc counted, no fp/length
      ("de", "xyz"))
      .toDF("lang", "text")
    val out = graft.operators.Profile.corpusCard(df, "lang", "text")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // en: 4 docs, 3 texts; mean = 10/3; p50 of {2,4,4} = 4;
    // dup = 1 - 2/3
    assert(out("en") == ("en", 4L, 3.3333, 4.0, 0.333333), out("en"))
    assert(out("de") == ("de", 1L, 3.0, 3.0, 0.0))
    // a group whose texts are ALL null: counted docs, null stats —
    // and no ANSI divide-by-zero job kill
    val allNull = Seq(("fr", null.asInstanceOf[String]), ("fr", null.asInstanceOf[String]))
      .toDF("lang", "text")
    val fr = graft.operators.Profile.corpusCard(allNull, "lang", "text")
      .select($"n_docs", $"mean_chars", $"p50_chars", $"dup_rate")
      .collect().head
    assert(fr.getLong(0) == 2L && fr.isNullAt(1) && fr.isNullAt(2) && fr.isNullAt(3), fr)
  }

  test("lDiversity: homogeneity attack flagged, nulls add no diversity, validation") {
    // group (a): 6 rows but ONE sensitive value — k-anonymous yet
    // fully exposed; group (b): 3 rows / 3 values — diverse;
    // group (c): 2 rows, one null sensitive -> diversity 1
    val df = (Seq.fill(6)(("a", Some("s1"))) ++
      Seq(("b", Some("s1")), ("b", Some("s2")), ("b", Some("s3")),
        ("c", Some("s9")), ("c", None)))
      .toDF("g", "sv")
    val out = graft.operators.Profile.lDiversity(df, Seq("g"), "sv", l = 2L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // (l, n_rows, n_groups, n_low, rows_at_risk, min_div)
    assert(out == (2L, 11L, 3L, 2L, 8L, 1L), out)
    // the k-audit at k=2 sees NO risk in group a — the attack
    // l-diversity exists to catch
    val k = graft.operators.Profile.kAnonymity(df, Seq("g"), k = 2L)
      .select($"n_small_groups").as[Long].head()
    assert(k == 0L)
    intercept[IllegalArgumentException] {
      graft.operators.Profile.lDiversity(df, Seq("sv"), "sv", 2L)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profile.lDiversity(df, Seq("g"), "sv", 1L)
    }
  }

  test("percentileRank: tie-sharing ranks per group, singleton 0, nulls drop") {
    val df = Seq(
      (1L, "a", Some(10.0)), (2L, "a", Some(20.0)), (3L, "a", Some(20.0)),
      (4L, "a", Some(40.0)),
      (5L, "b", Some(7.0)), // singleton group
      (6L, "a", None)).toDF("id", "g", "v")
    val out = graft.operators.Profile.percentileRank(df, "v", "g")
      .select($"id", $"v_pct").as[(Long, Double)].collect().toMap
    // (rank-1)/(n-1) over n=4: 0, 1/3, 1/3, 1
    assert(out(1L) == 0.0 && out(4L) == 1.0)
    assert(out(2L) == out(3L) && out(2L) == 0.333333, "ties share the rank")
    assert(out(5L) == 0.0, "singleton group is 0")
    assert(!out.contains(6L), "null scores drop")
  }

  test("bucketByGroupQuantiles: per-group terciles, null value tags null") {
    val df = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(2.0)), (3L, "a", Some(3.0)),
      (4L, "a", Some(4.0)), (5L, "a", Some(5.0)), (6L, "a", Some(6.0)),
      (7L, "a", Some(7.0)), (8L, "a", Some(8.0)), (9L, "a", Some(9.0)),
      (10L, "b", Some(10.0)), (11L, "b", Some(20.0)), (12L, "b", None))
      .toDF("id", "g", "v")
    // group a terciles over 1..9: t1 = 3.666667, t2 = 6.333333
    // group b median split (single prob): exercised separately below
    val out = graft.operators.Profile
      .bucketByGroupQuantiles(df, "v", "g")
      .select("id", "bucket").as[(Long, Option[String])].collect().toMap
    assert((1L to 3L).forall(out(_).contains("head")))
    assert((4L to 6L).forall(out(_).contains("middle")))
    assert((7L to 9L).forall(out(_).contains("tail")))
    // group b with default terciles: 10 -> head, 20 -> tail, null -> null
    assert(out(10L).contains("head") && out(11L).contains("tail"))
    assert(out(12L).isEmpty)
    // single cut point, custom labels: median split, ties keep the lower label
    val halves = graft.operators.Profile
      .bucketByGroupQuantiles(df, "v", "g", probs = Seq(0.5),
        labels = Seq("lo", "hi"), outCol = "half")
      .select("id", "half").as[(Long, Option[String])].collect().toMap
    assert(halves(5L).contains("lo") && halves(6L).contains("hi"))
    assert(halves(10L).contains("lo") && halves(11L).contains("hi"))
    // bad shapes fail fast
    intercept[IllegalArgumentException] {
      graft.operators.Profile.bucketByGroupQuantiles(
        df, "v", "g", probs = Seq(0.5), labels = Seq("only"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profile.bucketByGroupQuantiles(
        df, "v", "g", probs = Seq(0.7, 0.3), labels = Seq("a", "b", "c"))
    }
  }

  test("paddingStats: bucket caps, overflow pads to own max, nulls drop") {
    val df = Seq(Some(1L), Some(4L), Some(5L), Some(8L), Some(9L), Some(20L), None)
      .toDF("l")
    val out = graft.operators.Profile.paddingStats(df, "l", Seq(4, 8))
      .orderBy("bucket")
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    // bucket 0 (cap 4): {1,4} -> waste 1 - 5/8; bucket 1 (cap 8): {5,8};
    // overflow (cap = own max 20): {9,20}
    assert(out(0) == ((0, 4L, 2L, 5L, 4L, 0.375)))
    assert(out(1) == ((1, 8L, 2L, 13L, 8L, 0.1875)))
    assert(out(2) == ((2, 20L, 2L, 29L, 20L, 0.275)))
    intercept[IllegalArgumentException] {
      graft.operators.Profile.paddingStats(df, "l", Seq(8, 4))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profile.paddingStats(df, "l", Seq())
    }
  }

  test("keySkew: hand-computed stats, hot key dominates top_share") {
    // key a: 6 rows, b: 2, c: 1, d: 1 → total 10, distinct 4, max 6
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")).toDF("k")
    val r = Profile.keySkew(df, "k", topK = 2)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r == ((10L, 4L, 6L, 2.5, 2.4, 0.8)))
    // topK larger than the key count: share caps at 1.0
    val all = Profile.keySkew(df, "k", topK = 100)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(all._6 == 1.0)
  }

  test("keySkew: uniform keys give skew_factor 1") {
    val df = (1 to 40).map(i => s"k${i % 8}").toDF("k")
    val r = Profile.keySkew(df, "k", topK = 3)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r._5 == 1.0)
    assert(r._6 == 0.375) // 3 of 8 equal keys
  }

  test("stageFunnel: independent vs cumulative counts, order matters, one agg job") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1, 10, "x"), (2, 20, "x"), (3, 30, "y"), (4, 40, "y"), (5, 50, "z"))
      .toDF("id", "v", "g")
    val out = Profile.stageFunnel(df, Seq(
      "v_min" -> (col("v") >= 20), // passes: 2,3,4,5 → 4
      "not_z" -> (col("g") =!= "z"), // alone: 1,2,3,4 → 4; cum: 2,3,4 → 3
      "big" -> (col("v") >= 40))) // alone: 4,5 → 2; cum: 4 → 1
      .as[(Int, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0, "v_min", 4L, 4L, 0.8),
      (1, "not_z", 4L, 3L, 0.6),
      (2, "big", 2L, 1L, 0.2)))
    // single aggregation: exactly one Aggregate above the scan, no join
    val plan = Profile.stageFunnel(df, Seq("a" -> (col("v") > 0)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"funnel must be one scan:\n$plan")
  }

  test("equiDepthHistogram: equal masses on uniform data, tail resolution on skew") {
    // 100 uniform values into 10 bins -> 10 rows each
    val uni = (1 to 100).map(_.toDouble).toDF("v")
    val out = Profile.equiDepthHistogram(uni, "v", bins = 10)
      .as[(Int, Option[Double], Option[Double], Long)].collect().sortBy(_._1)
    assert(out.length == 10)
    assert(out.forall(_._4 == 10L), out.mkString(","))
    assert(out.head._2.isEmpty && out.last._3.isEmpty) // open ends
    // lo/hi chain: each bucket's hi is the next bucket's lo
    out.sliding(2).foreach { case Array(a, b) => assert(a._3 == b._2) }
    // skewed data: the one outlier gets its own top bucket instead of
    // emptying 9 equi-width buckets
    val skew = ((1 to 99).map(_ => 1.0 + scala.util.Random.nextInt(5)) :+ 1e9)
      .toDF("v")
    val s10 = Profile.equiDepthHistogram(skew, "v", bins = 10)
      .as[(Int, Option[Double], Option[Double], Long)].collect()
    assert(s10.map(_._4).sum == 100L)
    // determinism under repartitioning
    val a = Profile.equiDepthHistogram(uni.repartition(7), "v", 10)
      .collect().toSet
    assert(a == Profile.equiDepthHistogram(uni, "v", 10).collect().toSet)
    intercept[IllegalArgumentException] {
      Profile.equiDepthHistogram(uni, "v", bins = 1)
    }
  }

  test("robustScaleByGroup: outlier-immune where mean/sd is not; MAD-zero null") {
    // group a: {1..9} plus a huge outlier; median 5.5, MAD = 2.5
    val vals = (1 to 9).map(_.toDouble) :+ 1e9
    val df = vals.map(("a", _)).toDF("g", "v")
    val out = Profile.robustScaleByGroup(df, "v", "g")
      .as[(String, Double, Option[Double])].collect().sortBy(_._2)
    def r(x: Double, dp: Int) = BigDecimal(x)
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    // v=1: (1 - 5.5) / (1.4826 * 2.5)
    assert(out.head._3.contains(r(-4.5 / (1.4826 * 2.5), 4)))
    // the normal values sit inside ±2 robust z; only the outlier is far
    assert(out.init.forall(_._3.exists(z => math.abs(z) < 2.0)))
    assert(out.last._3.exists(_ > 1000))
    // the MEAN/SD scaling is wrecked by the same outlier: every
    // normal point collapses to ~-0.33 sd (indistinguishable)
    val classic = Profile.standardizeByGroup(df, "v", "g")
      .as[(String, Double, Option[Double])].collect().sortBy(_._2)
    assert(classic.init.forall(_._3.exists(z => math.abs(z + 0.3333) < 0.01)))
    // constant-majority group: MAD 0 -> null
    val const = Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0))
      .toDF("g", "v")
    assert(Profile.robustScaleByGroup(const, "v", "g")
      .where($"v_rz".isNotNull).count() == 0)
    // null values pass through with null rz; determinism
    val withNull = df.union(Seq(("a", null.asInstanceOf[java.lang.Double]))
      .map(t => (t._1, Option(t._2).map(_.toDouble)))
      .toDF("g", "v"))
    val a1 = Profile.robustScaleByGroup(withNull, "v", "g").collect().toSet
    val a2 = Profile.robustScaleByGroup(withNull.repartition(7), "v", "g")
      .collect().toSet
    assert(a1 == a2 && a1.size == 11)
  }

  test("rollupCard: three granularities from one pass; level separates rolled-up from null dims") {
    val df = Seq(
      ("en", "a", 10), ("en", "a", 20), ("en", "b", 30),
      ("de", "a", 40),
      (null, "a", 50)) // genuinely-null lang — NOT a subtotal
      .toDF("lang", "source", "n")
    val rolled = Profile.rollupCard(df, Seq("lang", "source"), "n")
    // integral input → sum_<value> converts ONCE to BIGINT (no raw
    // wide-DECIMAL output column to materialize asymmetrically)
    assert(rolled.schema("sum_n").dataType ==
      org.apache.spark.sql.types.LongType)
    val out = rolled
      .as[(Option[String], Option[String], Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2, r._3) -> ((r._4, r._6))).toMap
    // grand total: level 3
    assert(out((None, None, 3L)) == ((5L, 30.0)))
    // per-lang subtotals: level 1
    assert(out((Some("en"), None, 1L)) == ((3L, 20.0)))
    assert(out((Some("de"), None, 1L)) == ((1L, 40.0)))
    // the genuinely-null lang keeps level 1 subtotal AND level 0 cell
    assert(out((None, None, 1L)) == ((1L, 50.0)))
    assert(out((None, Some("a"), 0L)) == ((1L, 50.0)))
    // cells: level 0
    assert(out((Some("en"), Some("a"), 0L)) == ((2L, 15.0)))
    assert(out((Some("en"), Some("b"), 0L)) == ((1L, 30.0)))
    // one aggregation pass (expand, not a union of scans)
    val plan = Profile.rollupCard(df, Seq("lang", "source"), "n")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), s"rollup must be one expanded scan:\n$plan")
    intercept[IllegalArgumentException] {
      Profile.rollupCard(df, Nil, "n")
    }
    // fractional input → DOUBLE sum (still one post-accumulation cast)
    val frac = Seq(("en", "a", 1.5), ("en", "a", 2.25)).toDF("lang", "source", "n")
    val fr = Profile.rollupCard(frac, Seq("lang"), "n")
    assert(fr.schema("sum_n").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(fr.where(org.apache.spark.sql.functions.col("level") === 1)
      .select("sum_n").as[Double].head() == 3.75)
  }

  test("standardizeByGroup: hand moments, zero-spread and null handling, name hygiene") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", Some(5.0)), // mean 3, sd sqrt(8/3)
      ("b", Some(7.0)), ("b", Some(7.0)),                   // zero spread
      ("c", Some(9.0)),                                     // singleton
      ("a", None))
      .toDF("g", "v")
    val out = Profile.standardizeByGroup(df, "v", "g")
      .as[(String, Option[Double], Option[Double])].collect()
    val byKey = out.groupBy(_._1)
    def r(x: Double, dp: Int) = BigDecimal(x)
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sd = r(math.sqrt(8.0 / 3), 6)
    val aZ = byKey("a").flatMap(_._3).sorted
    assert(aZ.toSeq == Seq(r(-2.0 / sd, 4), 0.0, r(2.0 / sd, 4)))
    // zero-spread and singleton groups: null z, not zero or NaN
    assert(byKey("b").forall(_._3.isEmpty))
    assert(byKey("c").forall(_._3.isEmpty))
    // null value passes through with null z
    assert(byKey("a").exists(r => r._2.isEmpty && r._3.isEmpty))
    // temp-name hygiene: a __mean input column survives untouched
    val tricky = Seq(("a", 1.0, 99.0), ("a", 2.0, 98.0))
      .toDF("g", "v", "__mean")
    val t2 = Profile.standardizeByGroup(tricky, "v", "g")
    assert(t2.columns.count(_ == "__mean") == 1 &&
      t2.select("__mean").as[Double].collect().sorted.toSeq == Seq(98.0, 99.0))
  }

  test("funnel/sweep report frames: stage and threshold counts are capped loudly") {
    import org.apache.spark.sql.functions._
    val df = Seq((1, 10)).toDF("id", "v")
    val tooMany = (0 to 1000).map(i => s"s$i" -> (col("v") > i))
    assert(intercept[IllegalArgumentException] {
      Profile.stageFunnel(df, tooMany)
    }.getMessage.contains("1000"))
    assert(intercept[IllegalArgumentException] {
      Profile.stageFunnelByGroup(df, "id", tooMany)
    }.getMessage.contains("1000"))
    assert(intercept[IllegalArgumentException] {
      Profile.gateSweep(df, "v", (0 to 1000).map(_.toDouble))
    }.getMessage.contains("1000"))
  }

  test("stageFunnel: empty frame yields zero counts and null-safe shares") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0).toDF("id")
    val out = Profile.stageFunnel(df, Seq("pos" -> (col("id") > 0)))
      .selectExpr("pass_count", "cum_count").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 0L)))
  }

  test("histogram: equi-width bins, max closes last bin, constants, nulls, empty") {
    import graft.operators.Profile
    // 0..9 into 5 bins of width 2: exactly 2 per bin; 9 (the max)
    // closes into bin 4
    val out = Profile.histogram(spark.range(10).toDF("v"), "v", bins = 5)
      .orderBy($"bin")
      .select($"bin", $"lo", $"hi", $"n_rows")
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(0, 1, 2, 3, 4))
    assert(out.map(_._4) == Seq(2L, 2L, 2L, 2L, 2L))
    assert(out.head == ((0, 0.0, 1.8, 2L)))
    assert(out.last == ((4, 7.2, 9.0, 2L)))
    // constant column: everything in bin 0, lo == hi
    val const = Profile.histogram(
      Seq(5.0, 5.0, 5.0).toDF("v"), "v", bins = 4)
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(const == Seq((0, 5.0, 5.0, 3L)))
    // nulls dropped
    val withNulls = Profile.histogram(
      Seq(Some(1.0), None, Some(3.0)).toDF("v"), "v", bins = 2)
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(withNulls.map(_._4).sum == 2L)
    // empty input -> empty histogram
    assert(Profile.histogram(
      spark.range(5).toDF("v").where($"v" < 0), "v").count() == 0)
  }

  test("histogramByGroup: per-group bounds; null groups dropped") {
    import graft.operators.Profile
    val df = ((0 until 10).map(v => (Some("a"), v.toDouble)) ++
      (0 until 4).map(v => (Some("b"), 100.0 + v)) ++
      Seq((Option.empty[String], 5.0))).toDF("g", "v")
    val out = Profile.histogramByGroup(df, "g", "v", bins = 2)
      .orderBy($"g", $"bin")
      .as[(String, Int, Double, Double, Long)].collect().toSeq
    // group a: [0,9] in 2 bins of width 4.5 -> 5 and 5
    // group b: [100,103] -> 2 and 2; the null group vanishes
    assert(out == Seq(
      ("a", 0, 0.0, 4.5, 5L), ("a", 1, 4.5, 9.0, 5L),
      ("b", 0, 100.0, 101.5, 2L), ("b", 1, 101.5, 103.0, 2L)))
  }

  test("stageFunnelByGroup: per-group pass/cum counts match per-group stageFunnel") {
    import graft.operators.Profile
    val df = ((1 to 10).map(i => ("a", i)) ++ (1 to 4).map(i => ("b", i)))
      .toDF("g", "v")
    val stages = Seq("ge2" -> ($"v" >= 2), "even" -> ($"v" % 2 === 0))
    val out = Profile.stageFunnelByGroup(df, "g", stages)
      .select($"g", $"stage_idx", $"pass_count", $"cum_count", $"cum_share")
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // group a: 10 rows, ge2 -> 9, even -> 5, cum(ge2, even) -> 5
    assert(out(("a", 0)) == ((9L, 9L, 0.9)))
    assert(out(("a", 1)) == ((5L, 5L, 0.5)))
    // group b: 4 rows, ge2 -> 3, even -> 2, cum -> 2
    assert(out(("b", 0)) == ((3L, 3L, 0.75)))
    assert(out(("b", 1)) == ((2L, 2L, 0.5)))
    // parity with the global funnel applied per slice
    for (g <- Seq("a", "b")) {
      val solo = Profile.stageFunnel(df.where($"g" === g), stages)
        .select($"stage_idx", $"pass_count", $"cum_count", $"cum_share")
        .as[(Int, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      for (i <- stages.indices) assert(solo(i) == out((g, i)), s"$g stage $i")
    }
  }

  test("gateSweep: hand-computed pass counts/shares, one row per threshold") {
    import graft.operators.Profile
    val df = Seq[java.lang.Double](1.0, 2.0, 2.0, 3.5, 4.0, 5.0, null)
      .toDF("v")
    val out = Profile.gateSweep(df, "v", Seq(2.0, 3.5, 4.5))
      .select($"threshold", $"pass_count", $"pass_share")
      .as[(Double, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // 7 rows total (null counts in the denominator, never passes)
    assert(out(2.0) == ((5L, math.rint(5.0 / 7 * 1e6) / 1e6)))
    assert(out(3.5) == ((3L, math.rint(3.0 / 7 * 1e6) / 1e6)))
    assert(out(4.5) == ((1L, math.rint(1.0 / 7 * 1e6) / 1e6)))
    assert(out.size == 3)
    // empty input: zero counts, null shares
    val empty = Profile.gateSweep(df.where($"v" > 100), "v", Seq(1.0))
      .select($"pass_count", $"pass_share").collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }

  test("corrMatrix: hand-computed pairs, listwise null drop, zero variance") {
    import graft.operators.Profile
    // y = 2x (r = 1), z anti-monotone with x on the complete rows,
    // c constant (zero variance -> null), one row with a null y
    // drops listwise everywhere
    val df = Seq(
      (Some(1.0), Some(2.0), Some(3.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(2.0), Some(5.0)),
      (Some(3.0), Some(6.0), Some(1.0), Some(5.0)),
      (Some(9.0), None, Some(9.0), Some(5.0)))
      .toDF("x", "y", "z", "c")
    val out = Profile.corrMatrix(df, Seq("x", "y", "z", "c"), scale = 6)
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.size == 6)
    assert(out(("x", "y")) == ((3L, Some(1.0))))
    assert(out(("x", "z")) == ((3L, Some(-1.0))))
    assert(out(("y", "z")) == ((3L, Some(-1.0))))
    assert(out(("x", "c")) == ((3L, None)))
    assert(out(("y", "c")) == ((3L, None)))
    assert(out(("z", "c")) == ((3L, None)))
  }

  test("corrMatrix: reproducible under repartitioning (exact decimal moments)") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).select(
      (col("id") % 37).cast("double").as("a"),
      ((col("id") * 7) % 11).cast("double").as("b"))
    val one = Profile.corrMatrix(df, Seq("a", "b")).collect().toSeq
    val other = Profile.corrMatrix(df.repartition(13), Seq("a", "b"))
      .collect().toSeq
    assert(one == other && one.size == 1)
  }

  test("crossTab: hand-computed expected/contrib; chi2 and dof derive") {
    import graft.operators.Profile
    // 2x2 with a known dependence: a->x 30, a->y 10, b->x 10, b->y 30
    val df = (Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))).toDF("s", "l")
    val out = Profile.crossTab(df, "s", "l")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out.size == 4)
    // all marginals 40, n=80 -> expected 20 everywhere
    assert(out(("a", "x")) == ((30L, 20.0, 5.0))) // (30-20)^2/20
    assert(out(("b", "y")) == ((30L, 20.0, 5.0)))
    assert(out(("a", "y")) == ((10L, 20.0, 5.0)))
    val chi2 = out.values.map(_._3).sum
    assert(chi2 == 20.0) // textbook 2x2 chi2 for this table
    // independent table -> zero contributions
    val ind = (Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(20)(("b", "y"))).toDF("s", "l")
    val ic = Profile.crossTab(ind, "s", "l")
      .as[(String, String, Long, Double, Double)].collect()
    assert(ic.forall(_._5 == 0.0))
  }

  test("madOutliers: hand-computed median/MAD/flags per group") {
    import graft.operators.Profile
    // g1 values 1..5 + far outlier 100: med 3.5, devs
    // {2.5,1.5,0.5,0.5,1.5,96.5} -> MAD 1.5, k=3 cutoff 4.5 -> only
    // 100 flagged. g2 constant: MAD 0, any deviation flags.
    val df = Seq(
      ("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g1", 4.0), ("g1", 5.0),
      ("g1", 100.0),
      ("g2", 7.0), ("g2", 7.0), ("g2", 7.0))
      .toDF("g", "v")
    val out = Profile.madOutliers(df, "g", "v")
      .as[(String, Long, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("g1") == ((6L, 3.5, 1.5, 1L, math.rint(1.0 / 6 * 1e6) / 1e6)))
    assert(out("g2") == ((3L, 7.0, 0.0, 0L, 0.0)))
  }

  test("distributionDrift: hand-computed smoothed shares and divergence contributions") {
    import graft.operators.Profile
    // A: {x:3, y:1}; B: {x:1, z:1}. Union keys K=3.
    // p_a = (n_a+1)/(4+3), p_b = (n_b+1)/(2+3)
    val a = Seq("x", "x", "x", "y").toDF("k")
    val b = Seq("x", "z").toDF("k")
    val out = Profile.distributionDrift(a, b, "k")
      .as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val (paX, pbX) = (r6(4.0 / 7), r6(2.0 / 5))
    assert(out("x")._2 == 3L && out("x")._3 == 1L)
    assert(out("x")._4 == paX && out("x")._5 == pbX)
    assert(out("x")._6 == r6(paX * r6(math.log(paX / pbX))))
    val mX = (paX + pbX) / 2
    assert(out("x")._8 == r6(0.5 * paX * r6(math.log(paX / mX))
      + 0.5 * pbX * r6(math.log(pbX / mX))))
    // y absent in B, z absent in A — smoothing keeps both finite
    assert(out("y")._3 == 0L && out("y")._5 == r6(1.0 / 5))
    assert(out("z")._2 == 0L && !out("z")._6.isNaN && !out("z")._6.isInfinite)
  }

  test("distributionDrift: identical slices have zero divergence; null keys drop") {
    import graft.operators.Profile
    val a = Seq(Some("x"), Some("x"), Some("y"), None).toDF("k")
    val out = Profile.distributionDrift(a, a, "k").collect()
    assert(out.length == 2) // null key excluded
    out.foreach { r =>
      assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0)
    }
  }

  test("madOutliers: null values drop; approx mode plausible") {
    import graft.operators.Profile
    val df = (Seq.tabulate(200)(i => ("a", Some(i.toDouble))) :+
      (("a", None: Option[Double]))).toDF("g", "v")
    val exact = Profile.madOutliers(df, "g", "v").collect().head
    assert(exact.getLong(1) == 200L) // null dropped
    val approx = Profile.madOutliers(df, "g", "v", approx = true)
      .collect().head
    assert(math.abs(approx.getDouble(2) - exact.getDouble(2)) <= 2.0)
  }

  test("cmsSketch/cmsLookup: upper-bound estimates, exact without collisions") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val occ = (1 to 40).flatMap(i => Seq.fill(i)(s"w$i"))
    val df = occ.toDF("v")
    val sketch = Profile.cmsSketch(df, "v", d = 4, w = 4096)
    // bounded state: at most d*w rows; total mass = d * occurrences
    assert(sketch.count() <= 4L * 4096)
    assert(sketch.agg(sum("cnt")).head.getLong(0) == 4L * occ.size)
    val items = (1 to 40).map(i => s"w$i").toDF("v")
    val est = Profile.cmsLookup(sketch, items, "v")
      .as[(String, Long)].collect().toMap
    (1 to 40).foreach { i =>
      assert(est(s"w$i") >= i, s"w$i: ${est(s"w$i")} < $i (CMS never undercounts)")
      // 40 values in 4096 buckets: collisions essentially impossible
      assert(est(s"w$i") == i, s"w$i: ${est(s"w$i")} != $i")
    }
    // unseen item -> 0 (tiny w forces every bucket to exist check)
    val unseen = Profile.cmsLookup(sketch, Seq("nope").toDF("v"), "v")
      .as[(String, Long)].head()
    assert(unseen._2 >= 0)
  }

  test("cmsSketch: shard sketches union by summing counts") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val a = Seq("x", "x", "y").toDF("v")
    val b = Seq("x", "z").toDF("v")
    val merged = Profile.cmsSketch(a, "v").union(Profile.cmsSketch(b, "v"))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Profile.cmsSketch(a.union(b), "v")
    val m = merged.as[(Int, Int, Long)].collect().toSet
    val w = whole.as[(Int, Int, Long)].collect().toSet
    assert(m == w)
  }

  test("kAnonymity: counts small groups and rows at risk; nulls are a quasi value") {
    // groups: (a,1)x3, (a,null)x2, (b,1)x1 → k=3: two small groups, 3 rows
    val df = Seq(("a", Some(1)), ("a", Some(1)), ("a", Some(1)),
      ("a", None), ("a", None), ("b", Some(1)))
      .toDF("q1", "q2")
    val out = Profile.kAnonymity(df, Seq("q1", "q2"), k = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(out == ((3L, 6L, 3L, 2L, 3L, 1L)))
  }

  test("kAnonymityFlags: per-row group sizes and risk flags match the audit") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2)).toDF("q1", "q2")
    val out = Profile.kAnonymityFlags(df, Seq("q1", "q2"), k = 2L)
      .select("q1", "group_size", "at_risk")
      .as[(String, Long, Boolean)].collect().toSet
    assert(out == Set(("a", 3L, false), ("b", 1L, true)))
  }

  test("kAnonymity: empty input gives a zero report") {
    val df = Seq.empty[(String, Int)].toDF("q1", "q2")
    val out = Profile.kAnonymity(df, Seq("q1"), k = 5L)
      .select("n_rows", "n_groups", "rows_at_risk").as[(Long, Long, Long)]
      .collect().head
    assert(out == ((0L, 0L, 0L)))
  }

  test("cramersV: perfect association 1, independence 0, zero cells counted, 1xk null") {
    // 2x2 perfect: diagonal only — the two ZERO cells contribute half of chi2
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("s", "l")
    val p = Profile.cramersV(perfect, "s", "l").head()
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) ==
      ((4L, 2L, 2L, 1L)))
    assert(p.getDouble(4) == 4.0 && p.getDouble(5) == 1.0)
    // exact independence
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("s", "l")
    val i = Profile.cramersV(indep, "s", "l").head()
    assert(i.getDouble(4) == 0.0 && i.getDouble(5) == 0.0)
    // a 1xk table has no association to measure
    val flat = Seq(("a", "x"), ("a", "y")).toDF("s", "l")
    assert(Profile.cramersV(flat, "s", "l").head().isNullAt(5))
  }

  test("distinctHll: both estimator branches accurate, duplicate-invariant, null drop") {
    // 2000 distinct at m=4096 → the linear-counting branch (n/m ≈ 0.5,
    // error well under 2%); generous 8% slack keeps the test hash-free
    val vals = (1 to 2000).map(i => ("g", s"v$i")).toDF("g", "v")
    val one = Profile.distinctHll(vals, "g", "v").collect().toSeq
    val est = one.head.getDouble(2)
    assert(math.abs(est - 2000) / 2000.0 < 0.08, s"linear-counting est $est")
    // 50k distinct → the raw HLL estimator (1.04/√4096 ≈ 1.6% stderr)
    val big = (1 to 50000).map(i => ("g", s"w$i")).toDF("g", "v")
    val bigEst = Profile.distinctHll(big, "g", "v").head().getDouble(2)
    assert(math.abs(bigEst - 50000) / 50000.0 < 0.05, s"raw est $bigEst")
    // a sketch of DISTINCT values: duplicates cannot move any register
    assert(Profile.distinctHll(vals.unionAll(vals), "g", "v")
      .collect().toSeq == one)
    // null values drop; repartition-deterministic (grouped max)
    val withNull = vals.unionAll(
      Seq(("g", null.asInstanceOf[String])).toDF("g", "v"))
    assert(Profile.distinctHll(withNull, "g", "v").collect().toSeq == one)
    assert(Profile.distinctHll(vals.repartition(13), "g", "v")
      .collect().toSeq == one)
  }

  test("per-group join-backs treat a NULL group as a real slice") {
    // groupBy computes the null group's threshold/moments; a plain
    // equality join-back would silently drop or null-score its rows
    val df = Seq[(Option[String], Option[Double])](
      (Some("a"), Some(1.0)), (Some("a"), Some(2.0)), (Some("a"), Some(3.0)),
      (None, Some(10.0)), (None, Some(20.0)), (None, Some(30.0)))
      .toDF("g", "v")
    // winsorize is row-preserving for the null group too
    val w = Profile.winsorize(df, "v", "g", pLo = 0.0, pHi = 0.5)
    assert(w.count() == 6)
    assert(w.where($"g".isNull).select($"v_w").as[Double]
      .collect().sorted.toSeq == Seq(10.0, 20.0, 20.0))
    // the gate keeps the null group's own top half
    val gated = Profile.dropBelowGroupQuantile(df, "v", "g", prob = 0.5)
    assert(gated.where($"g".isNull).select($"v").as[Double]
      .collect().sorted.toSeq == Seq(20.0, 30.0))
    // z-scores are real numbers for the null group, not nulls
    val z = Profile.standardizeByGroup(df, "v", "g")
    assert(z.where($"g".isNull && $"v_z".isNotNull).count() == 3)
    val rz = Profile.robustScaleByGroup(df, "v", "g")
    assert(rz.where($"g".isNull && $"v_rz".isNotNull).count() == 3)
    // quantile buckets label the null group like any other
    val b = Profile.bucketByGroupQuantiles(df, "v", "g",
      probs = Seq(0.5), labels = Seq("low", "high"))
    assert(b.where($"g".isNull).count() == 3)
  }

  test("mutualInformation: perfect = ln2/NMI 1, independence = 0, null drop") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("s", "l")
    val p = Profile.mutualInformation(perfect, "s", "l").head()
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == ((4L, 2L, 2L)))
    assert(p.getDouble(3) == 0.693147 && p.getDouble(6) == 1.0)
    assert(p.getDouble(4) == 0.693147 && p.getDouble(5) == 0.693147)
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("s", "l")
    val i = Profile.mutualInformation(indep, "s", "l").head()
    assert(i.getDouble(3) == 0.0 && i.getDouble(6) == 0.0)
    // a constant column has zero entropy → NMI undefined (null)
    val flat = Seq(("a", "x"), ("a", "y")).toDF("s", "l")
    assert(Profile.mutualInformation(flat, "s", "l").head().isNullAt(6))
    // null categories excluded, matching cramersV's contract
    val withNull = Seq[(Option[String], Option[String])](
      (Some("a"), Some("x")), (Some("a"), Some("x")),
      (Some("b"), Some("y")), (Some("b"), Some("y")),
      (None, Some("x")), (Some("a"), None)).toDF("s", "l")
    assert(Profile.mutualInformation(withNull, "s", "l").collect().toSeq ==
      Profile.mutualInformation(perfect, "s", "l").collect().toSeq)
  }

  test("cramersV/crossTab: null categories are excluded, not counted as zeros") {
    // a null category would inflate n and the marginals while its
    // observed cell never matches the grid's equality join — the
    // report must equal the null-free slice exactly
    val withNull = Seq[(Option[String], Option[String])](
      (Some("a"), Some("x")), (Some("a"), Some("x")),
      (Some("b"), Some("y")), (Some("b"), Some("y")),
      (None, Some("x")), (Some("a"), None)).toDF("s", "l")
    val clean = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("s", "l")
    assert(Profile.cramersV(withNull, "s", "l").collect().toSeq ==
      Profile.cramersV(clean, "s", "l").collect().toSeq)
    assert(Profile.crossTab(withNull, "s", "l").collect().toSet ==
      Profile.crossTab(clean, "s", "l").collect().toSet)
  }

  test("topKCoverage: cumulative shares, count-tie determinism, k beyond keys") {
    // counts: a=4, b=3, c=2, d=1 (total 10)
    val rows = Seq.fill(4)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") :+ "d"
    val out = Profile.topKCoverage(rows.toDF("k"), "k", Seq(1, 2, 10))
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, 4L, 0.4), (2, 7L, 0.7), (10, 10L, 1.0)))
    // ties break on key asc: x and y both 2 — top-1 must be x
    val tied = Seq("x", "x", "y", "y").toDF("k")
    assert(Profile.topKCoverage(tied, "k", Seq(1))
      .as[(Int, Long, Double)].head() == ((1, 2L, 0.5)))
    // null keys drop; empty input → zero rows, null coverage
    val withNull = Seq[Option[String]](Some("a"), None).toDF("k")
    assert(Profile.topKCoverage(withNull, "k", Seq(1)).head().getLong(1) == 1L)
    val empty = Seq.empty[String].toDF("k")
    val e = Profile.topKCoverage(empty, "k", Seq(2)).head()
    assert(e.getLong(1) == 0L && e.isNullAt(2))
  }

  test("psi: identical slices read 0, a shift reads 'broken', bins/edges behave") {
    import org.apache.spark.sql.functions.{col => c}
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val same = Profile.psi(ref, ref, "v", bins = 10).collect()
    assert(same.length == 10)
    assert(same.forall(_.getDouble(7) == 0.0), "equal shares cancel exactly")
    // a +50 shift drains the low bins: total PSI far over the 0.25 bar
    val shifted = (51 to 150).map(_.toDouble).toDF("v")
    val drift = Profile.psi(ref, shifted, "v", bins = 10).collect()
    val total = drift.map(_.getDouble(7)).sum
    assert(total > 0.25, s"psi $total")
    // open-ended edge bins: bin 0 has null lo, bin 9 null hi
    val byBin = drift.map(r => r.getInt(0) -> r).toMap
    assert(byBin(0).isNullAt(1) && byBin(9).isNullAt(2))
    // null values drop
    val withNull = (Seq[Option[Double]](Some(1.0), None) ++
      (2 to 50).map(d => Some(d.toDouble))).toDF("v")
    val n = Profile.psi(withNull, withNull, "v", bins = 5)
      .agg(org.apache.spark.sql.functions.sum(c("n_ref"))).head().getLong(0)
    assert(n == 50L)
  }

  test("psi: the report is the COMPLETE bin grid - both-empty bins keep their term") {
    // all-identical reference values collapse every row into bin 0;
    // bins 1..9 are empty on BOTH sides, yet with Laplace smoothing
    // each still carries a nonzero psi_term whenever the totals differ
    val ref = Seq.fill(10)(1.0).toDF("v")
    val cur = Seq.fill(20)(1.0).toDF("v")
    val out = Profile.psi(ref, cur, "v", bins = 10).collect()
    assert(out.length == 10, "full 0..bins-1 grid")
    val empty = out.filter(r => r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(empty.length == 9)
    assert(empty.forall(_.getDouble(7) > 0.0),
      "smoothed term of an empty bin is nonzero when totals differ")
  }

  test("joinCardinality: exact explosion math, skew headline, null keys drop") {
    val a = Seq(1, 1, 1, 2, 3, 4).toDF("k")  // key 1 x3
    val b = Seq(1, 1, 2, 5).toDF("k")        // key 1 x2
    val r = Profile.joinCardinality(a, "k", b, "k").head()
    // shared {1, 2}: 3*2 + 1*1 = 7 rows, worst key contributes 6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) == ((6L, 4L, 4L, 3L, 2L, 7L, 6L)))
    // it predicts the real join exactly
    assert(a.join(b, Seq("k")).count() == 7L)
    val withNull = Seq[Option[Int]](Some(1), None).toDF("k")
    val rn = Profile.joinCardinality(withNull, "k", b, "k").head()
    assert(rn.getLong(0) == 1L && rn.getLong(5) == 2L)
    // disjoint keys → zero rows, zero max
    val z = Profile.joinCardinality(Seq(9).toDF("k"), "k", b, "k").head()
    assert(z.getLong(4) == 0L && z.getLong(5) == 0L && z.getLong(6) == 0L)
  }

  test("missingnessProfile: hand cells, jaccard extremes, no-null pair null") {
    val df = Seq[(Option[Int], Option[Int], Option[Int])](
      (None, Some(1), Some(1)), (None, None, Some(1)),
      (Some(1), None, Some(1)), (Some(1), Some(1), Some(1)))
      .toDF("x", "y", "z")
    val out = Profile.missingnessProfile(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    // x null rows {1,2}, y null {2,3}, both {2}: jaccard 1/3
    assert(out(("x", "y")) == ((4L, 2L, 2L, 1L, Some(0.333333))))
    // z never null → both pairs with z have empty unions only if x/y... x has nulls
    assert(out(("x", "z")) == ((4L, 2L, 0L, 0L, Some(0.0))))
    // identical masks → 1.0
    val same = Seq[(Option[Int], Option[Int])]((None, None), (Some(1), Some(2)))
      .toDF("a", "b")
    assert(Profile.missingnessProfile(same, Seq("a", "b")).head().getDouble(6) == 1.0)
    // neither side has nulls → null jaccard
    val full = Seq((1, 2), (3, 4)).toDF("a", "b")
    assert(Profile.missingnessProfile(full, Seq("a", "b")).head().isNullAt(6))
  }

  private def ks(rows: Seq[(String, Double)]): (Long, Long, Option[Double]) = {
    val r = Profile.ksTest(rows.toDF("g", "v"), "v", "g", "A", "B").head()
    (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  test("ksTest: hand gap, identical zero, disjoint one, empty-side null") {
    // F_A jumps at {1,2}, F_B at {2,3}: max gap 0.5 at v=1 and v=2
    assert(ks(Seq(("A", 1), ("A", 2), ("B", 2), ("B", 3))) == ((2L, 2L, Some(0.5))))
    assert(ks(Seq(("A", 1), ("A", 2), ("B", 1), ("B", 2))) == ((2L, 2L, Some(0.0))))
    assert(ks(Seq(("A", 1), ("A", 2), ("B", 5), ("B", 6))) == ((2L, 2L, Some(1.0))))
    assert(ks(Seq(("A", 1), ("A", 2)))._3.isEmpty)
  }

  test("ksTest: other groups and nulls drop; repartition-invariant") {
    val base = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
    val noisy = (base ++ Seq(("C", 9.0))).toDF("g", "v")
      .unionByName(Seq(("A", Option.empty[Double])).toDF("g", "v"))
    val r = Profile.ksTest(noisy, "v", "g", "A", "B").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 0.5)))
    val rnd = new scala.util.Random(2)
    val big = Seq.fill(500)((if (rnd.nextBoolean()) "A" else "B",
      rnd.nextInt(60).toDouble)).toDF("g", "v")
    val one = Profile.ksTest(big, "v", "g", "A", "B").collect().toSeq
    val many = Profile.ksTest(big.repartition(17), "v", "g", "A", "B").collect().toSeq
    assert(one == many)
  }

  private def gini(rows: Seq[(String, Double)]): Map[String, (Long, Double, Option[Double])] =
    Profile.giniByGroup(rows.toDF("g", "v"), "v", "g").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap

  test("giniByGroup: equality 0, single-holder (n-1)/n, hand values with ties") {
    val out = gini(
      Seq.fill(4)(("eq", 5.0)) ++
        (Seq.fill(3)(("one", 0.0)) :+ ("one", 12.0)) ++
        Seq(("lin", 1.0), ("lin", 2.0), ("lin", 3.0), ("lin", 4.0)) ++
        Seq(("tie", 1.0), ("tie", 1.0), ("tie", 2.0)))
    assert(out("eq") == ((4L, 20.0, Some(0.0))))
    assert(out("one") == ((4L, 12.0, Some(0.75))))
    assert(out("lin") == ((4L, 10.0, Some(0.25))))
    assert(out("tie")._3.get == 0.166667)
  }

  test("giniByGroup: all-zero null, null drop, negative raise, repartition invariance") {
    assert(gini(Seq(("z", 0.0), ("z", 0.0)))("z")._3.isEmpty)
    val withNull = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0))).toDF("g", "v")
    assert(Profile.giniByGroup(withNull, "v", "g").head().getLong(1) == 2L)
    val ex = intercept[Exception] {
      Profile.giniByGroup(Seq(("a", -1.0)).toDF("g", "v"), "v", "g").collect()
    }
    assert(ex.getMessage.contains("giniByGroup"))
    val rnd = new scala.util.Random(9)
    val big = Seq.fill(400)((s"g${rnd.nextInt(4)}", rnd.nextInt(50).toDouble))
      .toDF("g", "v")
    val one = Profile.giniByGroup(big, "v", "g").collect().toSet
    val many = Profile.giniByGroup(big.repartition(13), "v", "g").collect().toSet
    assert(one == many)
  }

  test("benfordTest: digit extraction, hand chi2, drops and shares") {
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0 // digit 1 twice
    val df = (vals.map(Option(_)) ++ Seq(None, Some(0.0), Some(-3.0))).toDF("v")
    val out = Profile.benfordTest(df, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(out.size == 9 && out(1)._1 == 2L && out(5)._1 == 1L)
    assert(out(1)._2 == 0.2)
    // expected shares are the shared literals and sum to exactly 1
    assert(out.values.map(_._3).sum == 1.0)
    val e1 = 10.0 * 0.3010299957
    val hand = math.rint((2.0 - e1) * (2.0 - e1) / e1 * 1e6) / 1e6
    assert(out(1)._4 == hand)
    // small fractions: first SIGNIFICANT digit, not first char
    val frac = Profile.benfordTest(Seq(0.00456).toDF("v"), "v").head()
    assert(frac.getInt(0) == 4)
  }

  test("tCloseness: hand-computed ordered EMD, symmetric mirror groups") {
    // a: {1×3, 2×1}, b: {1×1, 2×3}; global 4/4 → cumQ(1)=0.5
    // EMD(a) = |0.75−0.5|/(2−1) = 0.25 = EMD(b)
    val df = (Seq.fill(3)(("a", 1)) ++ Seq(("a", 2)) ++
      Seq(("b", 1)) ++ Seq.fill(3)(("b", 2))).toDF("q", "v")
    val out = Profile.tCloseness(df, Seq("q"), "v", t = 0.2)
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(out == Set(("a", 4L, 0.25, true), ("b", 4L, 0.25, true)))
    // below-threshold flag side
    val loose = Profile.tCloseness(df, Seq("q"), "v", t = 0.3)
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(loose.forall(!_._4))
  }

  test("tCloseness: null quasi keys drop instead of reporting spurious EMD") {
    // a null-quasi group would never match the grid join-back (cumg
    // stuck at 0 → fake max-EMD breach); it is already suppressed, so
    // it leaves the audit — and the global distribution — entirely
    val df = (Seq.fill(3)((Option("a"), 1)) ++ Seq((Option("a"), 2)) ++
      Seq((Option("b"), 1)) ++ Seq.fill(3)((Option("b"), 2)) ++
      Seq((Option.empty[String], 1), (Option.empty[String], 2))).toDF("q", "v")
    val out = Profile.tCloseness(df, Seq("q"), "v", t = 0.2)
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(out == Set(("a", 4L, 0.25, true), ("b", 4L, 0.25, true)))
  }

  test("tCloseness: order matters (shifted bands), m=1 zero, null drop, guard") {
    // ordered EMD sees the SHIFT between {1} and {3}
    val shifted = (Seq.fill(2)(("a", 1)) ++ Seq.fill(2)(("b", 3))).toDF("q", "v")
    val s = Profile.tCloseness(shifted, Seq("q"), "v", t = 0.4)
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(s == Set(("a", 2L, 0.5, true), ("b", 2L, 0.5, true)))
    // single sensitive value everywhere → nothing to leak
    val mono = Seq(("a", 7), ("b", 7), ("b", 7)).toDF("q", "v")
    assert(Profile.tCloseness(mono, Seq("q"), "v", t = 0.1)
      .as[(String, Long, Double, Boolean)].collect().forall(r => r._3 == 0.0 && !r._4))
    // null sensitive rows drop entirely
    val withNull = Seq[(String, Option[Int])](("a", Some(1)), ("a", None), ("b", Some(2)))
      .toDF("q", "v")
    assert(Profile.tCloseness(withNull, Seq("q"), "v", t = 0.5)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).head().getLong(0) == 2L)
    // cardinality guard raises in-plan
    val wide = (1 to 40).map(i => ("g", i)).toDF("q", "v")
    val ex = intercept[Exception] {
      Profile.tCloseness(wide, Seq("q"), "v", t = 0.1, maxValues = 10).collect()
    }
    assert(ex.getMessage.contains("tCloseness"))
  }

  test("tCloseness: repartition-invariant") {
    val df = (1 to 400).map(i => (s"g${i % 5}", i * 31 % 7)).toDF("q", "v")
    val one = Profile.tCloseness(df, Seq("q"), "v", t = 0.1).collect().toSet
    val many = Profile.tCloseness(df.repartition(13), Seq("q"), "v", t = 0.1)
      .collect().toSet
    assert(one == many)
  }

  private def spearman(rows: Seq[(Double, Double)]): (Long, Option[Double]) = {
    val r = Profile.spearmanCorr(rows.toDF("x", "y"), "x", "y").head()
    (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
  }

  test("spearmanCorr: hand-computed tied case, monotone extremes, constant null") {
    // x=(1,2,2,4) → 2·ranks (2,5,5,8); y=(10,20,30,40) → (2,4,6,8)
    // ρ = 72/(√72·√80) = 3/√10
    val (n, rho) = spearman(Seq((1, 10), (2, 20), (2, 30), (4, 40)))
    assert(n == 4L)
    assert(math.abs(rho.get - 3.0 / math.sqrt(10.0)) < 1e-6)
    // any strictly monotone map scores exactly ±1 regardless of shape
    val mono = (1 to 50).map(i => (i.toDouble, math.exp(i / 10.0)))
    assert(spearman(mono)._2.get == 1.0)
    assert(spearman(mono.map { case (x, y) => (x, -y) })._2.get == -1.0)
    // a constant column has zero rank variance
    assert(spearman(Seq((1, 5), (2, 5), (3, 5)))._2.isEmpty)
  }

  test("spearmanCorr: outlier immunity vs Pearson, null drop, repartition invariance") {
    import org.apache.spark.sql.functions.col
    // one huge outlier cannot move ranks
    val base = (1 to 30).map(i => (i.toDouble, (31 - i).toDouble))
    val withOutlier = base :+ (1e9, 1e9)
    val clean = spearman(base)._2.get
    val spiked = spearman(withOutlier)._2.get
    assert(clean == -1.0 && spiked > -1.0 && spiked < -0.8)
    val withNulls = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (2.0, 3.0), (null, 9.0), (4.0, null), (3.0, 1.0))
      .toDF("x", "y")
    assert(Profile.spearmanCorr(withNulls, "x", "y").head().getLong(0) == 3L)
    val df = (1 to 300).map(i => ((i * 37 % 50).toDouble, (i * 13 % 40).toDouble))
      .toDF("x", "y")
    val one = Profile.spearmanCorr(df, "x", "y").collect().toSeq
    val many = Profile.spearmanCorr(df.repartition(17), "x", "y").collect().toSeq
    assert(one == many)
  }

  test("functionalDependencies: hand-computed g3 violations and strength") {
    import graft.operators.Profile
    // a -> b holds exactly; b -> a: b=x maps to {a1 x2, a2 x1} ->
    // 1 violation of 4 rows; nulls drop per pair
    val df = Seq(
      ("a1", "x"), ("a1", "x"), ("a2", "x"), ("a3", "y"),
      (null.asInstanceOf[String], "x"))
      .toDF("a", "b")
    val out = Profile.functionalDependencies(df, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("a", "b")) == ((4L, 3L, 0L, 1.0)))
    assert(out(("b", "a")) == ((4L, 2L, 1L, 0.75)))
    intercept[IllegalArgumentException] {
      Profile.functionalDependencies(df, Seq("a"))
    }
  }
}
