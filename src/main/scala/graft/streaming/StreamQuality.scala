package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming twins of the text-quality path, plus the foreachBatch
  * dedup-sink pattern that closes the training-data loop: documents
  * arrive on a stream, are scored/filtered row-by-row, exact-deduped
  * within a watermark, and appended to partitioned parquet.
  *
  * The quality/language/token columns are pure row-local expressions
  * (`graft.functions.TextAnalysis`), so they attach to a streaming
  * DataFrame unchanged — no state, no watermark needed until the
  * dedup stage.
  */
object StreamQuality {

  /** Attach language, quality and token-count columns to a (streaming
    * or batch) DataFrame — stateless, so the micro-batch plan stays
    * a pure map.
    */
  def withQualitySignals(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", TextAnalysis.languageId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))

  /** Attach a trained Naive-Bayes quality score (+ matched-gram
    * count) to a streaming or batch frame — the serving side of
    * `graft.operators.Selection`: the model (trained offline with
    * `nbTrain`, collected via `collectNbModel` — bounded by
    * numBuckets) ships as a literal map, so scoring is a pure
    * row-local map over the stream: no state, no watermark, no
    * shuffle in the micro-batch plan.
    */
  def withNbScore(
      df: DataFrame,
      model: Map[Int, Double],
      textCol: String,
      numBuckets: Int = 4096,
      outCol: String = "nb_score",
      gramsCol: String = "nb_grams"): DataFrame = {
    val sCol = graft.Cols.unique("__nb", df)
    df.withColumn(sCol,
      graft.operators.Selection.nbScoreColumn(model, col(textCol), numBuckets))
      .withColumn(outCol, col(s"$sCol.nb_score"))
      .withColumn(gramsCol, col(s"$sCol.n_grams"))
      .drop(sCol)
  }

  /** Quality gate: keep rows whose score clears `minQuality` and
    * whose token count is in [minTokens, maxTokens]. Stateless.
    */
  def qualityFilter(
      df: DataFrame,
      textCol: String,
      minQuality: Double = 0.5,
      minTokens: Int = 5,
      maxTokens: Int = 1 << 20): DataFrame =
    // The barrier keeps the filter referencing the staged quality /
    // token columns; otherwise predicate pushdown substitutes the
    // multi-regex scoring expressions into the Filter and every row
    // pays them twice (once to filter, once for the output columns).
    graft.operators.Parallelism.pushdownBarrier(withQualitySignals(df, textCol))
      .where(col("quality") >= minQuality &&
        col("n_tokens").between(minTokens, maxTokens))

  /** The foreachBatch sink pattern for a streamed dedup pipeline:
    * each micro-batch is quality-filtered, exact-deduped WITHIN the
    * batch (content-hash groupBy — cheap, bounded by batch size), and
    * handed to `write` (typically parquet-append partitioned by a
    * date/source column). Cross-batch dups are the watermark-bounded
    * job of [[StreamDedup]] upstream; batch-local dups (same doc
    * twice in one trigger) are closed out here, so the sink never
    * writes a duplicate content key in one commit.
    *
    * foreachBatch (vs a plain file sink) is the pattern because the
    * dedup groupBy is a batch-only operation — inside the callback
    * the micro-batch is an ordinary DataFrame, so the full batch
    * operator library applies. Exactly-once comes from the sink's
    * idempotence on (batchId, content key): `write` receives the
    * batchId to implement idempotent commits.
    */
  def dedupSink(
      stream: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double = 0.5)(
      write: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val cleaned = qualityFilter(batch.toDF(), textCol, minQuality)
        val deduped = graft.operators.Dedup.exact(cleaned, Seq(textCol), idCol)
        write(deduped, batchId)
      }

  /** Convenience: [[dedupSink]] wired to a parquet directory with
    * processing-time triggers — the shape a training corpus ingestion
    * job actually runs. Each micro-batch lands in its own
    * `batch_id=N` partition directory with OVERWRITE semantics, so a
    * replayed batch (failure after write, before the checkpoint
    * commit) rewrites the same directory instead of appending
    * duplicates — that per-batch idempotence is what makes the sink
    * exactly-once. Read the corpus with partition discovery
    * (`spark.read.parquet(outDir)`); `batch_id` arrives as a column.
    */
  def dedupToParquet(
      stream: DataFrame,
      textCol: String,
      idCol: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
      minQuality: Double = 0.5): DataStreamWriter[Row] =
    dedupSink(stream, textCol, idCol, minQuality) { (batch, batchId) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    }
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)

  /** Live quality monitoring: run the one-scan gate funnel
    * ([[graft.operators.Profile.stageFunnel]]) over every micro-batch
    * and append the |stages|-row report to `outDir/batch_id=N` — the
    * feed a crawl-health dashboard reads (is the new source suddenly
    * failing `known_lang`? did `min_tokens` survivors crater this
    * hour?). Same idempotent per-batch-directory OVERWRITE contract
    * as [[dedupToParquet]]; the sink stores counts only, so it stays
    * byte-tiny at any stream volume.
    */
  def funnelToParquet(
      stream: DataFrame,
      stages: Seq[(String, org.apache.spark.sql.Column)],
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute")): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.Profile.stageFunnel(batch.toDF(), stages)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
}
