package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, TextAnalysis}
import graft.operators.{Dedup, Parallelism, Selection}

/** The README quickstart, as compiling code that runs in CI — the
  * canonical web-corpus curation pipeline a new user copies first:
  *
  *   raw crawl text
  *     → encoding repair   (TextAnalysis.fixEncoding)
  *     → HTML extraction   (TextAnalysis.stripHtml)
  *     → quality gates     (TextAnalysis.qualityFlags — Gopher-style)
  *     → near-dup removal  (Dedup.minHashLshDedup — banded LSH)
  *     → model selection   (Selection.nbTrain / nbScore — CCNet-style)
  *     → training shards   (TextAnalysis.packToShards — 512-token ids)
  *
  * Every stage is an oracle-checked operator on its own
  * (q_fix_encoding, q_html_text, q_quality_flags, q_dedup_apply,
  * q_nb_quality, q_pack_shards); `q_curation_e2e` hash-checks a
  * composed chain. This main just narrates the same composition at a
  * small SF and prints per-stage survivor counts.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01
  *       sbt "runMain graft.tools.Quickstart"`
  */
object Quickstart {

  /** The pipeline, sfDir-parameterized so QuickstartSpec can run it
    * inside the suite. Returns (per-stage counts, final shard frame).
    */
  def run(spark: SparkSession, sfDir: String): (Seq[(String, Long)], DataFrame) = {
    // 0. Read the raw corpus. spread() re-splits a small unsplittable
    //    parquet so the codegen'd text chain below parallelizes.
    val raw = Parallelism.spread(
      spark.read.parquet(s"$sfDir/documents.parquet"))

    // 1-2. Encoding repair + HTML extraction — one codegen'd,
    //      row-local column chain; no shuffle, no UDF.
    val cleaned = raw.select(
      col("doc_id"), col("lang"),
      TextAnalysis.stripHtml(TextAnalysis.fixEncoding(col("text"))).as("text"))

    // 3. Gopher-style quality gates: one struct column carries every
    //    gate flag plus the aggregate pass — filter on `pass`, keep
    //    the per-gate booleans for the funnel report if you want it.
    val gated = cleaned
      .withColumn("q", TextAnalysis.qualityFlags(col("text"), minWords = 20))
      .where(col("q.pass"))
      .select(col("doc_id"), col("lang"), col("text"))

    // 4. Near-dup removal: MinHash signatures → banded LSH buckets →
    //    candidate verify → connected components → keep one doc per
    //    cluster. Two-pass (id-only candidates shuffle, never text).
    val deduped = Dedup.minHashLshDedup(
      gated, "text", "doc_id",
      shingleK = 5, numHashes = 8, bands = 2, jaccardThreshold = 0.5)

    // 5. Model-based selection, CCNet-style: train a hashed
    //    Naive-Bayes quality model on a weak label (here: English
    //    docs as the "good" class), score everything, keep the top.
    val model = Selection.nbTrain(
      deduped, "text", col("lang") === "en", numBuckets = 4096)
    val scored = Selection.nbScore(deduped, model, "text", "doc_id")
    val selected = deduped.join(
      scored.where(col("nb_score") > 0.0).select("doc_id"), Seq("doc_id"))

    // 6. Pack into fixed-length training sequences under the shipped
    //    BPE fixture: documents concatenate in doc_id order and split
    //    across sequence boundaries; one token-id shuffle total.
    val shards = TextAnalysis.packToShards(
      selected, "text", Bpe.testFixture, col("doc_id"), seqLen = 512)

    val counts = Seq(
      "raw" -> raw.count(),
      "gated" -> gated.count(),
      "deduped" -> deduped.count(),
      "selected" -> selected.count(),
      "sequences" -> shards.count())
    (counts, shards)
  }

  /** The README "useful variations" block, compiled so the docs
    * can't drift from the API (never run standalone — QuickstartSpec
    * exercises the main pipeline; these return plans only).
    */
  def variations(gated: DataFrame, selected: DataFrame,
      evalGrams: DataFrame): Seq[DataFrame] = {
    val pairs = Dedup.minHashLshPairs(gated, "text", "doc_id", 5, 8, 2, 0.5)
    Seq(
      Dedup.dropNearDuplicatesBy(gated, pairs, "doc_id",
        rank = length(col("text"))),
      TextAnalysis.decontaminate(selected, evalGrams, "text", "doc_id", 13),
      graft.operators.Profile.stageFunnelByGroup(gated, "lang",
        Seq("len" -> (length(col("text")) > 200),
          "quality" -> TextAnalysis.qualityFlags(col("text"), 20)("pass"))),
      graft.operators.Sampling.splitByCluster(selected, pairs,
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01), "doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (counts, _) = run(spark, dir)
    counts.foreach { case (stage, n) => println(f"[quickstart] $stage%-10s $n%7d") }
    spark.stop()
  }
}
