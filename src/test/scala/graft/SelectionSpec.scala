package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private val targetish = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "a cat and a dog sat"))
  private val rawExtra = Seq(
    (4L, "stock prices fell sharply today"),
    (5L, "quarterly earnings beat forecasts"),
    (6L, "the cat sat on the rug"),
    (7L, ""),
    (8L, "markets rallied on earnings news"))

  test("unigramsAndBigrams: unigrams then bigrams, multiplicity kept") {
    val out = Seq("the cat the cat").toDF("t")
      .select(Selection.unigramsAndBigrams(col("t"))).as[Seq[String]].head()
    assert(out == Seq("the", "cat", "the", "cat", "the cat", "cat the", "the cat"))
  }

  test("unigramsAndBigrams: single token, empty, null") {
    val out = Seq(Some("word"), Some("  "), Some(""), None).toDF("t")
      .select(Selection.unigramsAndBigrams(col("t"))).as[Option[Seq[String]]].collect()
    assert(out(0).get == Seq("word"))
    assert(out(1).get.isEmpty)
    assert(out(2).get.isEmpty)
    assert(out(3).isEmpty) // null text -> null array
  }

  test("dsirWeights: target-like docs outweigh off-target docs; empty doc weighs 0") {
    val raw = (targetish ++ rawExtra).toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    val w = Selection.dsirWeights(raw, target, "text", "doc_id", numBuckets = 256)
      .as[(Long, Double)].collect().toMap
    assert(w.size == 8)
    // every target-corpus doc scores above every finance doc
    val tgtMin = Seq(1L, 2L, 3L, 6L).map(w).min
    val offMax = Seq(4L, 5L, 8L).map(w).max
    assert(tgtMin > offMax, s"target min $tgtMin should beat off-target max $offMax")
    assert(w(7L) == 0.0)
  }

  test("dsirWeights: reproducible under repartitioning") {
    val raw = (targetish ++ rawExtra).toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    val a = Selection.dsirWeights(raw, target, "text", "doc_id").as[(Long, Double)]
      .collect().toMap
    val b = Selection.dsirWeights(raw.repartition(7), target.repartition(3),
      "text", "doc_id").as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("dsirLogRatios: bounded by numBuckets, matches hand-computed ratio") {
    val raw = Seq((1L, "aa bb"), (2L, "aa cc")).toDF("doc_id", "text")
    val target = Seq((1L, "aa aa")).toDF("doc_id", "text")
    val b = 16
    val ratios = Selection.dsirLogRatios(raw, target, "text", numBuckets = b, alpha = 1.0)
    assert(ratios.count() <= b)
    // raw occurrences: aa,bb,"aa bb",aa,cc,"aa cc" (Nr=6); target: aa,aa,"aa aa" (Nt=3)
    val aaBucket = Seq("aa").toDF("g").select(Selection.gramBucket(col("g"), b)).as[Int].head()
    val got = ratios.where(col("bucket") === aaBucket).select("log_ratio").as[Double].head()
    // bucket collisions are possible at b=16: compute expected from actual collision sets
    val rawGrams = Seq("aa", "bb", "aa bb", "aa", "cc", "aa cc")
    val tgtGrams = Seq("aa", "aa", "aa aa")
    def bucketOf(s: String) = Seq(s).toDF("g").select(Selection.gramBucket(col("g"), b)).as[Int].head()
    val cr = rawGrams.count(bucketOf(_) == aaBucket)
    val ct = tgtGrams.count(bucketOf(_) == aaBucket)
    val expected = BigDecimal(
      math.log((ct + 1.0) / (3 + 1.0 * b)) - math.log((cr + 1.0) / (6 + 1.0 * b)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }

  test("dsirResample: k rows, subset of corpus, deterministic, biased toward target") {
    val raw = (targetish ++ rawExtra).toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    val sel = Selection.dsirResample(raw, target, "text", "doc_id", k = 4, numBuckets = 256)
      .as[(Long, Double)].collect()
    assert(sel.length == 4)
    val again = Selection.dsirResample(raw.repartition(5), target, "text", "doc_id",
      k = 4, numBuckets = 256).as[(Long, Double)].collect()
    assert(sel.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // with clearly separated weights, most picks should be target-like
    val picks = sel.map(_._1).toSet
    assert(picks.intersect(Set(1L, 2L, 3L, 6L)).size >= 3)
  }

  test("dsirSelfWeights/dsirSelfResample: identical to the two-frame forms") {
    val raw = (targetish.map { case (i, t) => (i, t, "good") } ++
      rawExtra.map { case (i, t) => (i, t, "other") }).toDF("doc_id", "text", "src")
    val twoFrame = Selection.dsirWeights(raw, raw.where(col("src") === "good"),
      "text", "doc_id", numBuckets = 256).as[(Long, Double)].collect().sortBy(_._1).toSeq
    val oneFrame = Selection.dsirSelfWeights(raw, "text", col("src") === "good",
      "doc_id", numBuckets = 256).as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(oneFrame == twoFrame)
    val selA = Selection.dsirResample(raw, raw.where(col("src") === "good"),
      "text", "doc_id", k = 4, numBuckets = 256).as[(Long, Double)].collect().sortBy(_._1).toSeq
    val selB = Selection.dsirSelfResample(raw, "text", col("src") === "good",
      "doc_id", k = 4, numBuckets = 256).as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(selA == selB)
  }

  test("dsirResample: corpus-fraction k takes the rank path — same rows, no global limit") {
    // 200 docs, k = 40% of the corpus: the regime where a global
    // orderBy().limit(k) would merge numPartitions*k rows into one
    // task. exactMergeLimit=10 forces the distributed rank path;
    // Int.MaxValue forces the TakeOrdered path; both must pick the
    // IDENTICAL row set.
    val words = Seq("cat", "dog", "mat", "stock", "bond", "rug", "sat", "news")
    val raw = (1L to 200L).map { i =>
      (i, s"the ${words((i % 8).toInt)} ${words(((i / 8) % 8).toInt)} sat")
    }.toDF("doc_id", "text").repartition(8)
    val target = targetish.toDF("doc_id", "text")
    val k = 80
    val viaRank = Selection.dsirResample(raw, target, "text", "doc_id",
      k = k, numBuckets = 256, exactMergeLimit = 10)
    val viaLimit = Selection.dsirResample(raw, target, "text", "doc_id",
      k = k, numBuckets = 256, exactMergeLimit = Int.MaxValue)
    val a = viaRank.as[(Long, Double)].collect().sortBy(_._1).toSeq
    val b = viaLimit.as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(a.length == k)
    assert(a == b, "rank-filter path must select exactly the limit path's rows")
    val plan = viaRank.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"),
      s"large-k path must not single-task merge:\n$plan")
    assert(!plan.contains("GlobalLimit"),
      s"large-k path must not global-limit:\n$plan")
    // and the small-k default still compiles to the cheap merge
    val small = Selection.dsirResample(raw, target, "text", "doc_id",
      k = 5, numBuckets = 256)
    assert(small.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(small.count() == 5)
  }

  test("nbTrain: hand-computed log-odds on a tiny labeled set; null labels excluded") {
    val labeled = Seq(
      (1L, "good good", Some(true)),
      (2L, "bad", Some(false)),
      (3L, "ignored text", None)).toDF("doc_id", "text", "label")
    val b = 64
    val model = Selection.nbTrain(labeled, "text", col("label"), numBuckets = b)
    assert(model.count() <= b)
    // pos grams: good, good, "good good" (np=3); neg grams: bad (nn=1)
    def bucketOf(s: String) = Seq(s).toDF("g").select(Selection.gramBucket(col("g"), b)).as[Int].head()
    val goodB = bucketOf("good")
    val cp = Seq("good", "good", "good good").count(bucketOf(_) == goodB)
    val cn = Seq("bad").count(bucketOf(_) == goodB)
    val expected = BigDecimal(
      math.log((cp + 1.0) / (3 + 1.0 * b)) - math.log((cn + 1.0) / (1 + 1.0 * b)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = model.where(col("bucket") === goodB).select("log_odds").as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
  }

  test("nbScore: separates classes on held-out docs; tokenless docs score 0") {
    val labeled = (targetish.map { case (i, t) => (i, t, true) } ++
      rawExtra.filter(_._2.nonEmpty).map { case (i, t) => (i, t, false) })
      .toDF("doc_id", "text", "label")
    val model = Selection.nbTrain(labeled, "text", col("label"), numBuckets = 256)
    val heldOut = Seq(
      (100L, "the cat sat"), // target-like
      (101L, "earnings beat forecasts sharply"), // finance-like
      (102L, "")).toDF("doc_id", "text")
    val s = Selection.nbScore(heldOut, model, "text", "doc_id", numBuckets = 256)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(s(100L)._1 > 0, s"target-like doc should score positive: ${s(100L)}")
    assert(s(101L)._1 < 0, s"finance doc should score negative: ${s(101L)}")
    assert(s(102L) == ((0.0, 0L)))
    assert(s(100L)._2 == 5L) // 3 unigrams + 2 bigrams
  }

  test("nbSelfScore: identical to nbTrain -> nbScore, nulls fit-excluded but scored") {
    val labeled = (targetish.map { case (i, t) => (i, t, Some(true)) } ++
      rawExtra.map { case (i, t) => (i, t, Some(false)) } :+
      ((99L, "the cat earnings", Option.empty[Boolean])))
      .toDF("doc_id", "text", "label")
    val model = Selection.nbTrain(labeled, "text", col("label"), numBuckets = 128)
    val twoStep = Selection.nbScore(labeled, model, "text", "doc_id", numBuckets = 128)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val oneStep = Selection.nbSelfScore(labeled, "text", col("label"), "doc_id",
      numBuckets = 128).as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(oneStep == twoStep)
    // the null-label doc is scored (present) with nonzero grams
    assert(oneStep.exists(r => r._1 == 99L && r._3 > 0))
  }

  test("dsirWeightColumn: identical to dsirWeights via the collected ratio table") {
    val raw = (targetish ++ rawExtra).toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    val viaJoin = Selection.dsirWeights(raw, target, "text", "doc_id", numBuckets = 256)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val ratios = Selection.collectDsirRatios(
      Selection.dsirLogRatios(raw, target, "text", numBuckets = 256))
    val local = raw.select(col("doc_id"),
      Selection.dsirWeightColumn(ratios, col("text"), numBuckets = 256).as("dsir_logw"))
    val viaMap = local.as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaMap == viaJoin)
    val plan = local.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serving path must not shuffle:\n$plan")
  }

  test("nbScoreLocal: identical to nbScore, zero shuffles in the plan") {
    val labeled = (targetish.map { case (i, t) => (i, t, true) } ++
      rawExtra.filter(_._2.nonEmpty).map { case (i, t) => (i, t, false) })
      .toDF("doc_id", "text", "label")
    val model = Selection.nbTrain(labeled, "text", col("label"), numBuckets = 256)
    val docs = (targetish ++ rawExtra :+ ((50L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val viaJoin = Selection.nbScore(docs, model, "text", "doc_id", numBuckets = 256)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val local = Selection.nbScoreLocal(docs,
      Selection.collectNbModel(model), "text", "doc_id", numBuckets = 256)
    val viaMap = local.as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(viaMap == viaJoin)
    val plan = local.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serving path must not shuffle:\n$plan")
  }

  test("nbScore: reproducible under repartitioning, grams absent from model ignored") {
    val labeled = Seq((1L, "alpha beta", true), (2L, "gamma delta", false))
      .toDF("doc_id", "text", "label")
    val model = Selection.nbTrain(labeled, "text", col("label"), numBuckets = 512)
    val docs = Seq((10L, "alpha nosuchtoken"), (11L, "beta gamma")).toDF("doc_id", "text")
    val a = Selection.nbScore(docs, model, "text", "doc_id", numBuckets = 512)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val bRes = Selection.nbScore(docs.repartition(4), model, "text", "doc_id", numBuckets = 512)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(a == bRes)
    // "alpha nosuchtoken": only "alpha" (and maybe its bigram bucket by
    // collision) hits the model — n_grams counts MATCHED grams only
    assert(a.head._3 >= 1L)
  }

  test("weightedSample: k rows, reproducible, proportional-ish bias, zero-mass rows excluded") {
    val df = (1L to 400L).map(i =>
      (i, if (i <= 200) 1.0 else 9.0)) // heavy rows 9x the mass
      .toDF("doc_id", "w")
      .union(Seq((401L, 0.0), (402L, -1.0)).toDF("doc_id", "w"))
      .union(Seq((403L, Option.empty[Double])).toDF("doc_id", "w"))
    val sel = Selection.weightedSample(df, "doc_id", "w", k = 100, seed = 5)
      .as[(Long, Double)].collect()
    assert(sel.length == 100)
    assert(sel.forall(r => r._1 <= 400L), "zero/negative/null mass must never select")
    // expected heavy share = 200*9/(200*1+200*9) = 0.9; hash noise band
    val heavy = sel.count(_._1 > 200L)
    assert(heavy > 75 && heavy <= 100, s"heavy=$heavy")
    val again = Selection.weightedSample(df.repartition(7), "doc_id", "w",
      k = 100, seed = 5).as[(Long, Double)].collect()
    assert(sel.map(_._1).toSet == again.map(_._1).toSet)
    // different seed -> (almost surely) different pick
    val other = Selection.weightedSample(df, "doc_id", "w", k = 100, seed = 6)
      .as[(Long, Double)].collect()
    assert(other.map(_._1).toSet != sel.map(_._1).toSet)
  }

  test("weightedSample: rank path selects the same rows as the limit path") {
    val df = (1L to 300L).map(i => (i, (i % 7 + 1).toDouble)).toDF("doc_id", "w")
    val lim = Selection.weightedSample(df, "doc_id", "w", k = 120, seed = 2)
      .as[(Long, Double)].collect().map(_._1).toSet
    val rank = Selection.weightedSample(df, "doc_id", "w", k = 120, seed = 2,
      exactMergeLimit = 10).as[(Long, Double)].collect().map(_._1).toSet
    assert(lim == rank)
    val plan = Selection.weightedSample(df, "doc_id", "w", k = 120, seed = 2,
      exactMergeLimit = 10).queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"), "rank path must not global-limit")
  }
}
