package graft

import graft.functions.{Bloom, TextAnalysis}
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("build + mightContain: no false negatives, bounded false positives") {
    val members = (1 to 2000).map(i => s"gram-$i")
    val df = members.toDF("v")
    val filter = Bloom.build(df, "v", members.size.toLong, fpp = 0.01).get
    // every inserted value probes true
    val hits = df.where(Bloom.mightContain(filter, col("v"))).count()
    assert(hits == members.size)
    // absent values: FP rate in the ballpark of fpp (generous bound)
    val absent = (1 to 2000).map(i => s"other-$i").toDF("v")
    val fps = absent.where(Bloom.mightContain(filter, col("v"))).count()
    assert(fps < 200, s"false-positive rate too high: $fps / 2000")
    // the probe is a row-local literal predicate: no join, no shuffle
    // (probe a non-local frame — LocalRelation folds eagerly)
    val ranged = spark.range(100).select(concat(lit("gram-"), col("id")).as("v"))
    val plan = ranged.where(Bloom.mightContain(filter, col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
  }

  test("build: empty frame gives None; null probe gives null") {
    assert(Bloom.build(Seq.empty[String].toDF("v"), "v", 10L).isEmpty)
    val filter = Bloom.build(Seq("a").toDF("v"), "v", 1L).get
    val out = Seq(Some("a"), None).toDF("v")
      .select(Bloom.mightContain(filter, col("v"))).collect()
    assert(out(0).getBoolean(0))
    assert(out(1).isNullAt(0))
  }

  test("bloomAgg: items/bits clamped to the session runtime-filter caps") {
    // absurd item count must not throw — it clamps and still works
    val df = (1 to 100).map(_.toString).toDF("v")
    val filter = Bloom.build(df, "v", Long.MaxValue / 2, fpp = 0.01).get
    val hits = df.where(Bloom.mightContain(filter, col("v"))).count()
    assert(hits == 100)
  }

  private def corpus = {
    // per-doc-unique tokens: zero accidental shared 13-grams; docs
    // 20–24 are exact clones of 0–4 (the contamination), 27 is null
    def txt(i: Long) = (0 until 15).map(j => s"t${i}_$j").mkString(" ")
    (0L until 30L).map { i =>
      val text =
        if (i == 27) null
        else if (i >= 20 && i < 25) txt(i - 20)
        else txt(i)
      (i, text)
    }.toDF("doc_id", "text")
  }

  test("contaminationHitsBloom == exact path, even at fpp 0.5") {
    val bench = corpus.where(col("doc_id") < 10)
      .select(explode(graft.operators.Dedup.wordShingles(col("text"), 13)).as("gram"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().sortBy(_._1).toSeq
    val exact = sorted(TextAnalysis.contaminationHits(corpus, bench, "text", "doc_id", 13))
    assert(exact.nonEmpty, "fixture must actually contaminate")
    val bloom = sorted(TextAnalysis.contaminationHitsBloom(corpus, bench, "text", "doc_id", 13))
    assert(bloom == exact)
    // a deliberately FP-heavy filter: verification must still kill every FP
    val noisy = sorted(TextAnalysis.contaminationHitsBloom(
      corpus, bench, "text", "doc_id", 13, fpp = 0.5))
    assert(noisy == exact)
  }

  test("decontaminateBloom == exact decontaminate; empty benchmark drops nothing") {
    val bench = corpus.where(col("doc_id") < 10)
      .select(explode(graft.operators.Dedup.wordShingles(col("text"), 13)).as("gram"))
    val exact = TextAnalysis.decontaminate(corpus, bench, "text", "doc_id", 13)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bloom = TextAnalysis.decontaminateBloom(corpus, bench, "text", "doc_id", 13)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(bloom == exact)
    val none = TextAnalysis.decontaminateBloom(
      corpus, bench.limit(0), "text", "doc_id", 13)
    assert(none.count() == corpus.count())
  }
}
