package graft

import graft.operators.Eval
import org.apache.spark.sql.functions.col

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): (Double, Long, Long) =
    Eval.rocAuc(rows.toDF("score", "label"), "score", "label")
      .as[(Double, Long, Long)].collect().head

  test("rocAuc: perfect separation is 1.0, inverted is 0.0") {
    val sep = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
    assert(auc(sep) == ((1.0, 2L, 2L)))
    assert(auc(sep.map { case (s, l) => (s, !l) }) == ((0.0, 2L, 2L)))
  }

  test("rocAuc: hand-computed value with ties matches the average-rank convention") {
    // scores: pos {0.5, 0.5, 0.3}, neg {0.5, 0.2}
    // pairs: each pos vs each neg — wins: (0.5>0.2)x2, (0.3>0.2);
    // ties at 0.5: 2 pos x 1 neg = 2 half-credits → (3 + 1) / 6
    val rows = Seq((0.5, true), (0.5, true), (0.3, true), (0.5, false), (0.2, false))
    val (a, p, n) = auc(rows)
    assert(p == 3L && n == 2L)
    assert(math.abs(a - 4.0 / 6.0) < 1e-6)
  }

  test("rocAuc: all-tied scores give 0.5; single-class gives NaN") {
    assert(auc(Seq((0.7, true), (0.7, false), (0.7, true)))._1 == 0.5)
    assert(auc(Seq((0.7, true), (0.3, true)))._1.isNaN)
  }

  test("rocAuc: complement symmetry and partitioning invariance on random data") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(40) / 40.0, rnd.nextBoolean()))
    val (a, p, n) = auc(rows)
    // reversing score order flips every win/loss, keeps half-credits
    val (ar, _, _) = auc(rows.map { case (s, l) => (-s, l) })
    assert(math.abs(a + ar - 1.0) < 1e-5)
    val repart = Eval.rocAuc(
      rows.toDF("score", "label").repartition(13), "score", "label")
      .as[(Double, Long, Long)].collect().head
    assert(repart == ((a, p, n)))
  }

  test("rocAuc: ignores null scores and labels") {
    val df = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.9, true), (0.1, false), (null, true), (0.5, null))
      .toDF("score", "label")
    val out = Eval.rocAuc(df, "score", "label")
      .as[(Double, Long, Long)].collect().head
    assert(out == ((1.0, 1L, 1L)))
  }

  private def calib(rows: Seq[(Double, Boolean)], bins: Int) =
    Eval.calibrationBins(rows.toDF("score", "label"), "score", "label", bins)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("calibrationBins: bin assignment, exact means, positive rates") {
    val rows = Seq(
      (0.05, false), (0.15, true), (0.18, false),  // bins 0, 1, 1
      (0.95, true), (0.99, true))                  // bin 9
    val out = calib(rows, 10)
    assert(out.keySet == Set(0L, 1L, 9L))
    assert(out(0L) == ((1L, 0.05, 0.0)))
    assert(out(1L) == ((2L, 0.165, 0.5)))
    assert(out(9L) == ((2L, 0.97, 1.0)))
  }

  test("calibrationBins: out-of-range scores clamp into the edge bins") {
    val out = calib(Seq((-0.3, false), (1.7, true), (1.0, true)), 10)
    assert(out.keySet == Set(0L, 9L))
    assert(out(0L)._1 == 1L && out(9L)._1 == 2L)
  }

  test("calibrationBins: a well-calibrated score has mean_score near pos_rate") {
    // label true iff a deterministic 'coin' below the score
    val rows = for (i <- 0 until 2000) yield {
      val s = (i % 100) / 100.0
      (s, (i * 2654435761L % 1000) / 1000.0 < s)
    }
    val out = calib(rows, 5)
    out.values.foreach { case (_, ms, pr) => assert(math.abs(ms - pr) < 0.06) }
  }

  test("bootstrapMeanCI: brackets the mean, deterministic, seed-sensitive") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map(i => (i.toLong, 50.0 + rnd.nextGaussian() * 10))
    val df = rows.toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame, seed: Long = 0L) =
      graft.operators.Eval.bootstrapMeanCI(d, "id", "v", replicates = 64, seed = seed)
        .as[(Long, Long, Double, Double, Double)].head()
    val (n, b, mean, lo, hi) = run(df)
    assert(n == 400L && b == 64L)
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    // sane width for sd=10, n=400: ~2x 1.96·10/20 = ~2; allow slack
    assert(hi - lo > 0.5 && hi - lo < 5.0, s"width ${hi - lo}")
    // hash draws make the whole resampling partitioning-invariant
    assert(run(df.repartition(13)) == (n, b, mean, lo, hi))
    // a different seed redraws every replicate
    val other = run(df, seed = 99L)
    assert(other._3 == mean && (other._4 != lo || other._5 != hi))
    // null ids/values drop from both the point estimate and the draws
    val withNulls = (rows.map { case (i, v) => (Some(i), Some(v)) } :+
      ((None: Option[Long], Some(1e9))) :+ ((Some(9999L), None: Option[Double])))
      .toDF("id", "v")
    assert(run(withNulls)._1 == 400L)
    intercept[IllegalArgumentException] {
      graft.operators.Eval.bootstrapMeanCI(df, "id", "v", replicates = 4)
    }
  }

  test("rrfFuse: hand-computed fusion, consensus beats single-list wins, determinism") {
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 'b' is rank 2 in BOTH lists; 'a' and 'c' take rank 1 in
    // one and rank 3 in the other. 1/x is CONVEX, so
    // RRF(a) = 1/61 + 1/63 > RRF(b) = 2/62 — the hand-checkable
    // signature of reciprocal fusion (extremes edge out the middle).
    val r1 = Seq((0L, "a", 1), (0L, "b", 2), (0L, "c", 3)).toDF("q", "doc", "rank")
    val r2 = Seq((0L, "c", 1), (0L, "b", 2), (0L, "a", 3)).toDF("q", "doc", "rank")
    val out = Eval.rrfFuse(Seq(r1, r2), "q", "doc", "rank", c = 60, topK = 10)
      .as[(Long, String, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq("a", "c", "b"))
    assert(out.head._3 == r8(r8(1.0 / 61) + r8(1.0 / 63)))
    assert(out(2)._3 == r8(r8(1.0 / 62) + r8(1.0 / 62)))
    // a/c tie on score (symmetric ranks) -> doc order breaks it
    assert(out(0)._3 == out(1)._3)
    // a doc present in only one list still scores (no inner-join loss)
    val r3 = Seq((0L, "z", 1)).toDF("q", "doc", "rank")
    val withZ = Eval.rrfFuse(Seq(r1, r3), "q", "doc", "rank", topK = 10)
      .as[(Long, String, Double, Int)].collect()
    assert(withZ.exists(_._2 == "z"))
    // determinism under repartitioning; topK truncates
    val a1 = Eval.rrfFuse(Seq(r1.repartition(3), r2.repartition(2)),
      "q", "doc", "rank", topK = 2).collect().toSeq
    val a2 = Eval.rrfFuse(Seq(r1, r2), "q", "doc", "rank", topK = 2)
      .collect().toSeq
    assert(a1.toSet == a2.toSet && a2.length == 2)
    intercept[IllegalArgumentException] { Eval.rrfFuse(Nil, "q", "doc", "rank") }
  }

  test("ndcgAtK: hand-computed graded gains, perfect ranking = 1, edge queries") {
    import graft.operators.Eval
    def r(x: Double, dp: Int) = BigDecimal(x)
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def t8(rel: Int, rank: Int) =
      BigDecimal(r((math.pow(2.0, rel) - 1.0) / math.log(rank + 1.0), 8))
    // q1: ranked docs a(rel 3), b(rel 0), c(rel 1); judged ideal
    // ordering is a, c (+unretrieved d rel 2 at ideal rank 2!)
    val ranked = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3),
      (2L, "a", 1), (2L, "d", 2), // q2: perfect order
      (3L, "a", 1)) // q3: no positive judgments anywhere
      .toDF("q", "doc", "rank")
    val rels = Seq(
      (1L, "a", 3), (1L, "c", 1), (1L, "d", 2),
      (2L, "a", 2), (2L, "d", 1),
      (3L, "a", 0))
      .toDF("q", "doc", "rel")
    val out = Eval.ndcgAtK(ranked, rels, "q", "doc", "rank", "rel", k = 10)
      .as[(Long, Double, Option[Double], Option[Double])].collect()
      .map(row => row._1 -> row).toMap
    val dcg1 = (t8(3, 1) + t8(0, 2) + t8(1, 3)).toDouble
    val idcg1 = (t8(3, 1) + t8(2, 2) + t8(1, 3)).toDouble
    assert(out(1L)._2 == r(dcg1, 6) && out(1L)._3.contains(r(idcg1, 6)))
    assert(out(1L)._4.contains(r(dcg1 / idcg1, 6)))
    // q2 retrieved its judgments in ideal order -> ndcg exactly 1
    assert(out(2L)._4.contains(1.0))
    // q3 has no positive judgment -> null ndcg, not 0 or 1
    assert(out(3L)._4.isEmpty && out(3L)._2 == 0.0)
    // a query present only in rels (never retrieved) -> dcg 0
    val rels2 = rels.union(Seq((4L, "z", 3)).toDF("q", "doc", "rel"))
    val out2 = Eval.ndcgAtK(ranked, rels2, "q", "doc", "rank", "rel", k = 10)
      .as[(Long, Double, Option[Double], Option[Double])].collect()
      .map(row => row._1 -> row).toMap
    assert(out2(4L)._2 == 0.0 && out2(4L)._4.contains(0.0))
    // determinism under repartitioning
    val a = Eval.ndcgAtK(ranked.repartition(5), rels.repartition(3),
      "q", "doc", "rank", "rel", k = 10).collect().toSet
    assert(a == Eval.ndcgAtK(ranked, rels, "q", "doc", "rank", "rel", 10)
      .collect().toSet)
  }

  test("cohenKappa: the textbook 2x2 worked example") {
    // yes/yes 20, yes/no 5, no/yes 10, no/no 15: po = 0.7,
    // pe = (25·30 + 25·20)/50² = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(out.getLong(0) == 50 && out.getLong(1) == 35)
    assert(math.abs(out.getDouble(2) - 0.7) < 1e-9)
    assert(math.abs(out.getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(out.getDouble(4) - 0.4) < 1e-9)
  }

  test("cohenKappa: perfect agreement is 1; constant raters yield null kappa; nulls drop") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")).toDF("a", "b")
    assert(math.abs(Eval.cohenKappa(perfect, "a", "b").head().getDouble(4) - 1.0) < 1e-9)
    // both raters always say "x": pe = 1, chance correction undefined
    val const = Seq.fill(5)(("x", "x")).toDF("a", "b")
    val r = Eval.cohenKappa(const, "a", "b").head()
    assert(r.getLong(0) == 5 && r.isNullAt(4))
    // unlabeled rows drop before counting
    val withNulls = Seq(("y", "y"), (null, "y"), ("y", null)).toDF("a", "b")
    assert(Eval.cohenKappa(withNulls, "a", "b").head().getLong(0) == 1)
  }

  test("cohenKappa: repartition-invariant") {
    val rows = (1 to 200).map(i =>
      (s"l${i % 4}", if (i % 9 == 0) "l0" else s"l${i % 4}"))
    val df = rows.toDF("a", "b")
    val one = Eval.cohenKappa(df, "a", "b").collect().toSeq
    val many = Eval.cohenKappa(df.repartition(13), "a", "b").collect().toSeq
    assert(one == many)
  }

  private def ap(rows: Seq[(Double, Boolean)]): (Double, Long, Long) =
    Eval.averagePrecision(rows.toDF("score", "label"), "score", "label")
      .as[(Double, Long, Long)].collect().head

  test("averagePrecision: perfect separation is 1.0; no positives is NaN") {
    val sep = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
    assert(ap(sep) == ((1.0, 2L, 2L)))
    assert(ap(Seq((0.9, false), (0.1, false)))._1.isNaN)
  }

  test("averagePrecision: hand-computed tied-block value (pessimistic step)") {
    // blocks desc: 0.5 {p=2,t=3} prec 2/3; 0.3 {p=1,t=1} cp=3,ct=4 prec 3/4
    // AP = (2*(2/3) + 1*(3/4)) / 3 = 25/36
    val rows = Seq((0.5, true), (0.5, true), (0.3, true), (0.5, false), (0.2, false))
    val (a, p, n) = ap(rows)
    assert(p == 3L && n == 2L)
    assert(math.abs(a - 25.0 / 36.0) < 1e-6)
  }

  test("averagePrecision: repartition-invariant and null-dropping") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)((rnd.nextInt(20) / 20.0, rnd.nextInt(5) == 0))
    val one = ap(rows)
    val many = Eval.averagePrecision(
      rows.toDF("score", "label").repartition(17), "score", "label")
      .as[(Double, Long, Long)].collect().head
    assert(one == many)
    val withNulls = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.9, true), (0.1, false), (null, true), (0.5, null)).toDF("score", "label")
    val r = Eval.averagePrecision(withNulls, "score", "label")
      .as[(Double, Long, Long)].collect().head
    assert(r == ((1.0, 1L, 1L)))
  }

  test("gainsTable: hand deciles, perfect separation lift, tied-block no-split") {
    // perfect top-half separation at 2 buckets: lift 2.0 in bucket 1
    val sep = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("score", "label")
    val out = Eval.gainsTable(sep, "score", "label", buckets = 2)
      .as[(Int, Long, Long, Double, Long, Long, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, 2L, 2L, 1.0, 2L, 2L, 1.0, 2.0),
      (2, 2L, 0L, 0.0, 4L, 2L, 1.0, 1.0)))
    // a tied block lands whole in its end-fraction bucket — bucket 1
    // can be empty, and the block never splits
    val tied = Seq((0.5, true), (0.5, true), (0.5, false), (0.1, false))
      .toDF("score", "label")
    val t = Eval.gainsTable(tied, "score", "label", buckets = 2)
      .as[(Int, Long, Long, Double, Long, Long, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(t.map(_._1) == Seq(2) && t.head._2 == 4L)
    // no positives → gains/lift null
    val neg = Eval.gainsTable(
      Seq((0.9, false), (0.1, false)).toDF("score", "label"),
      "score", "label", buckets = 2).collect()
    assert(neg.forall(r => r.isNullAt(6) && r.isNullAt(7)))
  }

  test("abTest: hand two-proportion z, degenerate arms, variant filtering") {
    // control 1/4, treat 3/4: pooled 0.5, se = sqrt(0.125), z = sqrt(2)
    val rows = Seq(("a", true), ("a", false), ("a", false), ("a", false),
      ("b", true), ("b", true), ("b", true), ("b", false),
      ("c", true)) // other variant drops
    val r = Eval.abTest(rows.toDF("v", "c"), "v", "c", "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 1L, 4L, 3L)))
    assert(r.getDouble(4) == 0.25 && r.getDouble(5) == 0.75 && r.getDouble(6) == 0.5)
    assert(math.abs(r.getDouble(7) - math.sqrt(2.0)) < 1e-6)
    // one arm empty → null lift and z
    val solo = Eval.abTest(Seq(("a", true)).toDF("v", "c"), "v", "c", "a", "b").head()
    assert(solo.isNullAt(6) && solo.isNullAt(7))
    // everyone converted → pooled variance 0 → z null, lift still 0
    val all = Eval.abTest(Seq(("a", true), ("b", true)).toDF("v", "c"),
      "v", "c", "a", "b").head()
    assert(all.getDouble(6) == 0.0 && all.isNullAt(7))
  }

  test("regressionStats: perfect fit, hand residuals, constant-label null r2") {
    val perfect = Seq((1.0, 1.0), (2.5, 2.5)).toDF("p", "y")
    val r0 = Eval.regressionStats(perfect, "p", "y").head()
    assert(r0.getDouble(1) == 0.0 && r0.getDouble(2) == 0.0 && r0.getDouble(3) == 1.0)
    // labels (1,2,3), preds all 2: sse = 2, sst = 2 → r2 exactly 0
    val mid = Seq((2.0, 1.0), (2.0, 2.0), (2.0, 3.0)).toDF("p", "y")
    val r1 = Eval.regressionStats(mid, "p", "y").head()
    assert(r1.getDouble(1) == 0.666667)
    assert(r1.getDouble(2) == 0.816497)
    assert(r1.getDouble(3) == 0.0)
    // constant labels: explained variance undefined
    val const = Seq((1.0, 2.0), (3.0, 2.0)).toDF("p", "y")
    assert(Eval.regressionStats(const, "p", "y").head().isNullAt(3))
    val withNull = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 1.0), (null, 2.0), (3.0, null)).toDF("p", "y")
    assert(Eval.regressionStats(withNull, "p", "y").head().getLong(0) == 1L)
  }

  test("mcnemarTest: hand cells and statistic, concordant-only null, null drop") {
    // truth always true; a/b are boolean predictions
    val rows = Seq(
      (true, true, true), (true, true, true), (true, true, true), // both correct
      (false, false, true),                                       // both wrong
      (true, false, true), (true, false, true),
      (true, false, true), (true, false, true),                   // a_only x4
      (false, true, true))                                        // b_only x1
    val r = Eval.mcnemarTest(rows.toDF("a", "b", "y"), "a", "b", "y").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((9L, 3L, 1L, 4L, 1L)))
    assert(r.getDouble(5) == 1.8) // (4-1)^2 / 5
    // identical predictions → no discordant evidence
    val same = Seq((true, true, true), (false, false, true))
    assert(Eval.mcnemarTest(same.toDF("a", "b", "y"), "a", "b", "y")
      .head().isNullAt(5))
    val withNull = Seq[(java.lang.Boolean, java.lang.Boolean, java.lang.Boolean)](
      (true, false, true), (null, true, true), (true, null, true))
      .toDF("a", "b", "y")
    assert(Eval.mcnemarTest(withNull, "a", "b", "y").head().getLong(0) == 1L)
  }

  test("confusionStats: hand-computed cells and metrics, degenerate nulls") {
    // scores >= 0.5 predicted positive
    val rows = Seq((0.9, true), (0.8, false), (0.6, true), (0.4, true),
      (0.3, false), (0.1, false))
    val r = Eval.confusionStats(rows.toDF("score", "label"), "score", "label", 0.5)
      .head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 1L, 2L, 1L)))
    assert(r.getDouble(5) == 0.666667) // accuracy 4/6
    assert(r.getDouble(6) == 0.666667) // precision 2/3
    assert(r.getDouble(7) == 0.666667) // recall 2/3
    assert(r.getDouble(8) == 0.666667) // f1 = p = r here
    // nothing predicted positive → precision null, f1 null (fn>0 branch needs fp+tp>0)
    val none = Eval.confusionStats(
      Seq((0.1, true), (0.2, false)).toDF("score", "label"), "score", "label", 0.9)
      .head()
    assert(none.isNullAt(6) && none.getDouble(7) == 0.0)
    // tp=0 with both denominators > 0 → f1 exactly 0
    val zero = Eval.confusionStats(
      Seq((0.9, false), (0.1, true)).toDF("score", "label"), "score", "label", 0.5)
      .head()
    assert(zero.getDouble(8) == 0.0)
    // null rows drop
    val withNulls = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.9, true), (null, true), (0.3, null)).toDF("score", "label")
    assert(Eval.confusionStats(withNulls, "score", "label", 0.5).head().getLong(1) == 1L)
  }

  test("expectedCalibrationError: hand value, zero for perfectly calibrated bins") {
    // bin 0: 4 rows ms=0.05 pr=0.25 → 4·0.2; bin 9: 2 rows ms=0.95 pr=1 → 2·0.05
    val rows = Seq((0.05, true), (0.05, false), (0.05, false), (0.05, false),
      (0.95, true), (0.95, true))
    val r = Eval.expectedCalibrationError(
      rows.toDF("score", "label"), "score", "label", bins = 10)
      .as[(Long, Long, Double)].collect().head
    assert(r._1 == 6L && r._2 == 2L)
    assert(math.abs(r._3 - 0.15) < 1e-9)
    // mean score == pos rate in every bin → ece 0
    val calibrated = Seq((0.25, true), (0.25, false), (0.25, false), (0.25, false),
      (0.75, true), (0.75, true), (0.75, true), (0.75, false))
    val c = Eval.expectedCalibrationError(
      calibrated.toDF("score", "label"), "score", "label", bins = 10)
      .as[(Long, Long, Double)].collect().head
    assert(c._3 == 0.0)
  }

  test("ndcgAtK: null query/doc ids drop - no half-rows from the full join") {
    val ranked = Seq[(Option[String], Option[String], Int)](
      (Some("q1"), Some("d1"), 1), (None, Some("dx"), 1),
      (Some("q1"), None, 2)).toDF("q", "d", "rank")
    val rels = Seq[(Option[String], Option[String], Int)](
      (Some("q1"), Some("d1"), 3), (None, Some("dx"), 3))
      .toDF("q", "d", "rel")
    val out = Eval.ndcgAtK(ranked, rels, "q", "d", "rank", "rel", k = 10)
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "q1",
      s"null ids must not split into half-rows: ${out.toSeq}")
  }

  test("bhCorrection: step-up rescues below-cut failures, ties share the block rank") {
    // q=0.1, m=3: crits 0.0333/0.0667/0.1 — 0.07 FAILS its own crit
    // but 0.09 passes rank 3, so the step-up rejects ALL three
    val df = Seq(0.003, 0.07, 0.09).toDF("p")
    val out = Eval.bhCorrection(df, "p", q = 0.1)
      .as[(Double, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._5).forall(identity), s"step-up must reject all: ${out.toSeq}")
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L))
    assert(out(1)._4 == 0.066667)
    // plain case: the large p stays admitted
    val out2 = Eval.bhCorrection(Seq(0.01, 0.02, 0.03, 0.5).toDF("p"), "p", 0.1)
      .as[(Double, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out2.map(r => (r._1, r._5)).toSeq ==
      Seq((0.01, true), (0.02, true), (0.03, true), (0.5, false)))
    // tie block shares its LARGEST rank and decides as one
    val tied = Eval.bhCorrection(Seq(0.02, 0.02).toDF("p"), "p", 0.1)
      .as[(Double, Long, Long, Double, Boolean)].collect().toSeq
    assert(tied == Seq((0.02, 2L, 2L, 0.1, true)))
    intercept[Exception] {
      Eval.bhCorrection(Seq(1.5).toDF("p"), "p", 0.1).collect()
    }
    intercept[IllegalArgumentException] {
      Eval.bhCorrection(df, "p", 0.0)
    }
  }

  test("rocAucByGroup: each slice equals the global operator on that slice; NaN class-absent") {
    val df = Seq(
      ("en", 0.9, true), ("en", 0.8, false), ("en", 0.7, true), ("en", 0.1, false),
      ("de", 0.2, true), ("de", 0.9, false), ("de", 0.5, true),
      ("th", 0.5, true), ("th", 0.6, true)) // no negatives → NaN
      .toDF("g", "score", "label")
    val by = Eval.rocAucByGroup(df, "g", "score", "label")
      .collect().map(r =>
        r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    for (g <- Seq("en", "de")) {
      val solo = Eval.rocAuc(df.where($"g" === g), "score", "label").head()
      assert(by(g) == ((solo.getDouble(0), solo.getLong(1), solo.getLong(2))), g)
    }
    assert(by("th")._1.isNaN && by("th")._2 == 2L && by("th")._3 == 0L)
  }

  test("welchTTest: hand-computed t and Welch-Satterthwaite df, degenerate guards") {
    // A = {1,2,3}: mean 2, var 1. B = {5,7,9}: mean 7, var 4.
    // se2 = 1/3 + 4/3 = 5/3; t = 5/sqrt(5/3) = sqrt(15); df = 50/17.
    val df = (Seq(1, 2, 3).map(x => ("a", x.toDouble)) ++
      Seq(5, 7, 9).map(x => ("b", x.toDouble))).toDF("g", "x")
    val r = Eval.welchTTest(df, "g", "x", "a", "b").head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 7.0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 4.0)
    assert(r.getDouble(6) == math.rint(math.sqrt(15.0) * 1e6) / 1e6)
    assert(r.getDouble(7) == math.rint(50.0 / 17.0 * 1e4) / 1e4)
    // one-row side: variance undefined -> t/df null
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "x")
    val t0 = Eval.welchTTest(tiny, "g", "x", "a", "b").head()
    assert(t0.isNullAt(6) && t0.isNullAt(7))
    // constant-valued arm whose 6 dp-rounded mean makes qa - n*ma^2
    // come out a hair negative in FP: var must clamp to exactly 0.0,
    // never a tiny negative, and t/df null out on the se2 > 0 guard
    // (with x = 0.1: qa = 0.03 exactly via DECIMAL, but n·ma² in
    // double is 0.030000000000000006 — unclamped va would be ~ -2e-18)
    val const = (Seq.fill(3)(("a", 0.1)) ++
      Seq(("b", 2.0), ("b", 4.0), ("b", 6.0))).toDF("g", "x")
    val cr = Eval.welchTTest(const, "g", "x", "a", "b").head()
    assert(cr.getDouble(4) == 0.0, s"var_a must clamp to 0, got $cr")
    assert(cr.getDouble(5) == 4.0)

    intercept[IllegalArgumentException] {
      Eval.welchTTest(df, "g", "x", "a", "a")
    }
  }

  test("mannWhitneyU: hand-computed tie-averaged U, tie-corrected z, effect size") {
    // A = {1,2,3}, B = {2,3,4}: ranks 1, 2.5, 2.5, 4.5, 4.5, 6
    // R_b = 13, U_b = 7; T = 12; varU = 0.75*(7 - 0.4) = 4.95
    val df = (Seq(1, 2, 3).map(x => ("a", x.toDouble)) ++
      Seq(2, 3, 4).map(x => ("b", x.toDouble))).toDF("g", "x")
    val r = Eval.mannWhitneyU(df, "g", "x", "a", "b").head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getDouble(2) == 7.0)
    assert(r.getDouble(3) == math.rint(2.5 / math.sqrt(4.95) * 1e6) / 1e6)
    assert(r.getDouble(4) == math.rint((14.0 / 9.0 - 1.0) * 1e6) / 1e6)
    // every value tied: zero variance -> z null, U still defined
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "x")
    val tr = Eval.mannWhitneyU(tied, "g", "x", "a", "b").head()
    assert(tr.isNullAt(3))
    assert(tr.getDouble(2) == 1.0) // U_b = 1*2 - 1 = 1 (mid-rank 2)
    // repartition determinism (distributed prefix-sum ranks)
    assert(Eval.mannWhitneyU(df.repartition(7), "g", "x", "a", "b")
      .collect().toSeq == Eval.mannWhitneyU(df, "g", "x", "a", "b")
      .collect().toSeq)
  }

  test("anovaF: hand-computed SS terms and F, degenerate guards") {
    // a={1,2,3} m=2 w=2; b={2,4,6} m=4 w=8; c={5,5,5} m=5 w=0
    // grand mean 3.666667 (6dp); SSB = 14.000001 from the 6dp-rounded
    // per-group terms (the exact-fraction value is 14; the rounded
    // grand mean moves each squared deviation by ~1e-6)
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 4, 6).map(("b", _)) ++
      Seq(5, 5, 5).map(("c", _))).map { case (g, v) => (g, v.toDouble) }
      .toDF("g", "x")
    val r = Eval.anovaF(df, "g", "x").head()
    assert((r.getLong(0), r.getLong(1)) == ((9L, 3L)))
    assert(r.getDouble(2) == 14.000001 && r.getDouble(3) == 10.0)
    assert((r.getLong(4), r.getLong(5)) == ((2L, 6L)))
    assert(r.getDouble(6) == 4.2)
    // one group only: F null (df1 = 0)
    val one = Eval.anovaF(df.where($"g" === "a"), "g", "x").head()
    assert(one.isNullAt(6))
    // zero within-variance: F null, not infinity
    val konst = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "x")
    assert(Eval.anovaF(konst, "g", "x").head().isNullAt(6))
  }

  test("leveneTest: equal dispersion reads F = 0, unequal reads F > 0") {
    val equal = (Seq(1, 2, 3).map(("a", _)) ++ Seq(10, 11, 12).map(("b", _)))
      .map { case (g, v) => (g, v.toDouble) }.toDF("g", "x")
    assert(Eval.leveneTest(equal, "g", "x").head().getDouble(6) == 0.0)
    val unequal = (Seq(1, 2, 3).map(("a", _)) ++ Seq(0, 20, 40).map(("b", _)))
      .map { case (g, v) => (g, v.toDouble) }.toDF("g", "x")
    val r = Eval.leveneTest(unequal, "g", "x").head()
    assert(r.getDouble(6) > 0.0 && r.getLong(1) == 2L)
  }

  test("pairedTTest: hand-computed t over differences, constant diff guards") {
    val df = Seq((3.0, 2.0), (5.0, 3.0), (9.0, 6.0)).toDF("a", "b")
    val r = Eval.pairedTTest(df, "a", "b").head()
    // diffs {1, 2, 3}: mean 2, var 1, t = 2/sqrt(1/3) = 2*sqrt(3)
    assert(r.getLong(0) == 3L && r.getDouble(1) == 2.0 && r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == math.rint(2.0 * math.sqrt(3.0) * 1e6) / 1e6)
    assert(r.getLong(4) == 2L)
    val const = Seq((2.0, 1.0), (3.0, 2.0)).toDF("a", "b")
    assert(Eval.pairedTTest(const, "a", "b").head().isNullAt(3))
    // null sides drop
    val withNull = df.union(Seq((null.asInstanceOf[java.lang.Double], 1.0)
      .asInstanceOf[(java.lang.Double, Double)]).toDF("a", "b"))
    assert(Eval.pairedTTest(withNull, "a", "b").head().getLong(0) == 3L)
  }

  test("wilsonCI: matches the closed form, clamps to [0,1], null group is a slice") {
    val df = (Seq.fill(1)(("g1", true)) ++ Seq.fill(3)(("g1", false)) ++
      Seq.fill(5)(("g2", true))).toDF("g", "ok")
    val z = 1.959964
    def wilson(s: Long, n: Long): (Double, Double) = {
      val p = s.toDouble / n; val z2 = z * z
      val den = 1.0 + z2 / n
      val c = (p + z2 / (2.0 * n)) / den
      val h = z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)) / den
      (math.rint(math.max(0, c - h) * 1e6) / 1e6,
        math.rint(math.min(1, c + h) * 1e6) / 1e6)
    }
    val by = Eval.wilsonCI(df, "g", "ok")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
    assert(by("g1")._1 == 4L && by("g1")._2 == 1L)
    assert((by("g1")._3, by("g1")._4) == wilson(1, 4))
    // all-success arm: hi clamps to <= 1.0
    assert((by("g2")._3, by("g2")._4) == wilson(5, 5) && by("g2")._4 <= 1.0)
  }

  test("brierDecomposition: hand-computed Murphy terms") {
    val df = Seq((0.1, false), (0.9, true), (0.8, false), (0.3, false))
      .toDF("p", "y")
    val r = Eval.brierDecomposition(df, "p", "y", bins = 2).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(2) == 0.1875)   // mean squared error
    assert(r.getDouble(3) == 0.08125)  // reliability
    assert(r.getDouble(4) == 0.0625)   // resolution
    assert(r.getDouble(5) == 0.1875)   // uncertainty = .25*.75
  }

  /** rows for bucket means: bins=4, `spec` = (positives, total) per bin */
  private def isoDf(spec: Seq[(Int, Int)]) =
    spec.zipWithIndex.flatMap { case ((pos, n), b) =>
      (0 until n).map(i => (b * 0.25 + 0.1, i < pos))
    }.toDF("s", "y")

  private def iso(spec: Seq[(Int, Int)]) =
    Eval.isotonicCalibration(isoDf(spec), "s", "y", bins = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("isotonicCalibration: textbook violator pooling, weighted") {
    // means [0.1, 0.3, 0.2, 0.4] -> pool bins 1,2 to 0.25
    val out = iso(Seq((1, 10), (3, 10), (2, 10), (4, 10)))
    assert(out(0L) == ((10L, 1L, 0L, 0.1)))
    assert(out(1L) == ((10L, 3L, 1L, 0.25)) && out(2L) == ((10L, 2L, 1L, 0.25)))
    assert(out(3L) == ((10L, 4L, 3L, 0.4)))
    // weighted: [0.5 (n=2), 0.2 (n=8)] pools to 9/10... then 0.9 stays
    val w = iso(Seq((1, 2), (2, 10), (9, 10)))
    assert(w(0L)._4 == 0.25 && w(1L)._4 == 0.25 && w(0L)._3 == 0L)
    assert(w(2L)._4 == 0.9)
  }

  test("isotonicCalibration: fully decreasing pools to one block; monotone stays put") {
    val dec = iso(Seq((9, 10), (6, 10), (3, 10), (2, 10)))
    assert(dec.values.map(_._4).toSet == Set(0.5)) // global mean 20/40
    assert(dec.values.map(_._3).toSet == Set(0L))
    val mono = iso(Seq((1, 10), (2, 10), (5, 10), (9, 10)))
    assert(mono(0L)._4 == 0.1 && mono(3L)._4 == 0.9)
    assert(mono.values.map(_._3).toSet.size == 4) // four distinct blocks
  }

  test("isotonicCalibration: equal adjacent means share the canonical block label") {
    val eq = iso(Seq((2, 10), (2, 10), (7, 10)))
    assert(eq(0L)._4 == 0.2 && eq(1L)._4 == 0.2)
    assert(eq(0L)._3 == 0L && eq(1L)._3 == 0L) // value-run canonicalization
    assert(eq(2L)._3 == 2L)
  }

  test("isotonicCalibration: monotone + mean-preserving on random data; empty bins skipped") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(400)((rnd.nextInt(80) / 100.0,
      rnd.nextDouble() < 0.5)).toDF("s", "y")
    val out = Eval.isotonicCalibration(rows, "s", "y", bins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    val recon = out.map(r => r._2 * r._4).sum
    assert(math.abs(recon - out.map(_._3.toDouble).sum) < out.length * 1e-3)
    assert(out.forall(_._1 < 8)) // scores < 0.8: top bins absent
  }

  test("isotonicColumn: step serving — fill-forward, back-fill, clamp, null") {
    val table = Seq((2L, 0.2), (5L, 0.5))
    val scores = Seq[java.lang.Double](0.0, 0.35, 0.59, 1.7, -0.3, null)
      .toDF("s")
    val got = scores.select(
      Eval.isotonicColumn(table, col("s"), bins = 10).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(got == Seq(0.2, 0.2, 0.5, 0.5, 0.2, null))
  }

  test("isotonicColumn: serving a fit's own buckets returns the fitted values") {
    val fitted = Eval.isotonicCalibration(
      isoDf(Seq((1, 10), (3, 10), (2, 10), (4, 10))), "s", "y", bins = 4)
    val table = Eval.collectIsotonic(fitted)
    val served = isoDf(Seq((1, 10), (3, 10), (2, 10), (4, 10)))
      .select(col("s"), Eval.isotonicColumn(table, col("s"), bins = 4).as("c"))
      .distinct().collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(served(0.1) == 0.1 && served(0.35) == 0.25 &&
      served(0.6) == 0.25 && served(0.85) == 0.4)
  }

  private def kripp(rows: Seq[(Int, String)]) =
    Eval.krippendorffAlpha(rows.toDF("item", "label"), "item", "label").head()

  /** Direct reference computation of nominal alpha for cross-checks. */
  private def krippRef(rows: Seq[(Int, String)]): Double = {
    val byItem = rows.groupBy(_._1).values.map(_.map(_._2))
      .filter(_.size >= 2).toSeq
    val n = byItem.map(_.size).sum.toDouble
    val x = byItem.map { ls =>
      val m = ls.size.toDouble
      val s2 = ls.groupBy(identity).values.map(g => g.size.toDouble * g.size).sum
      (m * m - s2) / (m - 1)
    }.sum
    val nc = byItem.flatten.groupBy(identity).values.map(_.size.toDouble)
    1.0 - (n - 1) * x / (n * n - nc.map(c => c * c).sum)
  }

  test("krippendorffAlpha: hand-computed mixed-m example") {
    // item1: a,a,b (m=3, A/(m-1)=2) item2: a,b (A/(m-1)=2) item3: a (drops)
    // n=5, n_a=3, n_b=2 -> Do=4/5, De=12/20, alpha = 1 - 0.8/0.6 = -1/3
    val r = kripp(Seq(1 -> "a", 1 -> "a", 1 -> "b", 2 -> "a", 2 -> "b", 3 -> "a"))
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.8 && r.getDouble(3) == 0.6)
    assert(math.abs(r.getDouble(4) - (-1.0 / 3.0)) < 1e-6)
  }

  test("krippendorffAlpha: perfect agreement is 1, constant pool is null, nulls drop") {
    val perfect = kripp(Seq(1 -> "a", 1 -> "a", 2 -> "b", 2 -> "b"))
    assert(perfect.getDouble(4) == 1.0)
    val const = kripp(Seq(1 -> "a", 1 -> "a", 2 -> "a", 2 -> "a"))
    assert(const.isNullAt(4)) // De = 0: no chance disagreement to correct by
    val withNull = Eval.krippendorffAlpha(
      Seq[(Integer, String)]((1, "a"), (1, "a"), (1, null), (2, "b"))
        .toDF("item", "label"), "item", "label").head()
    assert(withNull.getLong(0) == 1L && withNull.getLong(1) == 2L)
  }

  private def krippI(rows: Seq[(Int, Double)]) =
    Eval.krippendorffAlphaInterval(rows.toDF("item", "v"), "item", "v").head()

  /** Direct reference computation of interval alpha. */
  private def krippIRef(rows: Seq[(Int, Double)]): Double = {
    val byItem = rows.groupBy(_._1).values.map(_.map(_._2))
      .filter(_.size >= 2).toSeq
    val n = byItem.map(_.size).sum.toDouble
    val x = byItem.map { vs =>
      val m = vs.size.toDouble
      2 * (m * vs.map(v => v * v).sum - math.pow(vs.sum, 2)) / (m - 1)
    }.sum
    val all = byItem.flatten
    val y = 2 * (n * all.map(v => v * v).sum - math.pow(all.sum, 2))
    1.0 - (n - 1) * x / y
  }

  test("krippendorffAlphaInterval: hand-computed example; near misses beat far misses") {
    // item1: 1,2  item2: 1,1 -> Do = 0.5, De = 0.5, alpha = 0
    val r = krippI(Seq(1 -> 1.0, 1 -> 2.0, 2 -> 1.0, 2 -> 1.0))
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.0)
    // same label-pattern shape, but the one disagreement is 1-vs-2
    // (near) vs 1-vs-5 (far): interval alpha punishes distance where
    // the nominal metric sees identical "one mismatched pair" pools.
    // near: X=2, Y=234 -> 1 - 10/234; far: X=32, Y=288 -> 1 - 160/288
    val near = krippI(Seq(1 -> 1.0, 1 -> 2.0, 2 -> 1.0, 2 -> 1.0,
      3 -> 5.0, 3 -> 5.0))
    val far = krippI(Seq(1 -> 1.0, 1 -> 5.0, 2 -> 1.0, 2 -> 1.0,
      3 -> 5.0, 3 -> 5.0))
    assert(math.abs(near.getDouble(4) - (1.0 - 10.0 / 234)) < 1e-6)
    assert(math.abs(far.getDouble(4) - (1.0 - 160.0 / 288)) < 1e-6)
    assert(near.getDouble(4) > far.getDouble(4))
    // perfect agreement across distinct item values
    val perfect = krippI(Seq(1 -> 2.0, 1 -> 2.0, 2 -> 4.0, 2 -> 4.0))
    assert(perfect.getDouble(4) == 1.0)
    // constant pool: no variance to disagree against
    assert(krippI(Seq(1 -> 3.0, 1 -> 3.0, 2 -> 3.0, 2 -> 3.0)).isNullAt(4))
  }

  test("krippendorffAlphaInterval: matches the reference; guards out-of-range values") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 100).flatMap { i =>
      Seq.fill(1 + rnd.nextInt(4))(i -> (1.0 + rnd.nextInt(9) * 0.5))
    }
    val r = krippI(rows)
    assert(math.abs(r.getDouble(4) - krippIRef(rows)) < 1e-6)
    val repart = Eval.krippendorffAlphaInterval(
      rows.toDF("item", "v").repartition(13), "item", "v").head()
    assert(repart == r)
    intercept[Exception] {
      krippI(Seq(1 -> 1.0, 1 -> 1500.0))
    }
  }

  test("krippendorffAlpha: matches the reference computation across varying m and repartitioning") {
    val rnd = new scala.util.Random(7)
    // items rated 1..5 times over 4 labels — exercises D = Π(m−1) folding
    val rows = (1 to 120).flatMap { i =>
      Seq.fill(1 + rnd.nextInt(5))(i -> s"l${rnd.nextInt(4)}")
    }
    val expected = krippRef(rows)
    val r = kripp(rows)
    assert(math.abs(r.getDouble(4) - expected) < 1e-6)
    val repart = Eval.krippendorffAlpha(
      rows.toDF("item", "label").repartition(13), "item", "label").head()
    assert(repart == r) // exact decimal path: bit-identical under repartitioning
  }
}
