package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming deduplication — the streaming twin of
  * `graft.operators.Dedup.exact`.
  *
  * Uses `dropDuplicatesWithinWatermark` so the dedup state is evicted
  * once the watermark passes — the only shape whose state stays
  * bounded on an unbounded stream. Exact `dropDuplicates` (no
  * watermark) on a stream grows state forever.
  */
object StreamDedup {

  /** Drop events whose `cols` combination was already seen within the
    * watermark window. `tsCol` must be an event-time timestamp.
    */
  def exactWithinWatermark(
      stream: DataFrame,
      cols: Seq[String],
      tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(cols)

  /** Content-hash variant: dedup on md5 of the content columns so
    * only a 32-char key (not the full payload) is kept in state.
    */
  def byContentHash(
      stream: DataFrame,
      contentCols: Seq[String],
      tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("__ck", graft.operators.Dedup.contentKey(contentCols))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__ck"))
      .drop("__ck")

  /** Streaming NEAR-dedup against unbounded history — the continuous
    * form of [[graft.operators.Dedup.minHashLshPairsIncremental]].
    *
    * Watermark-bounded state ([[exactWithinWatermark]]) can only
    * look back one watermark window, and only exactly. This sink
    * keeps the history in STORAGE instead of stream state: accepted
    * documents land in `outDir` (one idempotent `batch_id=N`
    * partition per micro-batch) and their minhash signatures append
    * to the bucketed signature table `sigTable`. Each new micro-batch
    * is (1) exact-deduped within the batch, (2) near-dup-checked
    * against the ENTIRE accepted history — the batch pays a signature
    * pass, candidates join its band rows against the bucketed table,
    * history text joins back only for verification candidates — and
    * (3) survivors are written and signed, becoming history for the
    * next trigger. Lookback is unbounded, executor state is zero, and
    * per-trigger cost scales with the batch (plus candidate volume),
    * not the history.
    *
    * Idempotence: the data write overwrites its own `batch_id`
    * partition, so a replayed batch rewrites rather than duplicates —
    * and the history read EXCLUDES the in-flight `batch_id`, so a
    * replayed batch never flags itself against its own first write.
    * A replay DOES append its signature rows a second time — harmless
    * to results (candidate pairs are `distinct` and verification is
    * driven by the pair list) but it grows the table; run
    * [[graft.operators.Dedup.compactMinHashSignatures]] periodically
    * if replays are common.
    * Within-batch NEAR-dups (two new near-identical docs in one
    * trigger) are out of scope here, as in the batch operator — both
    * survive vs history; run `minHashLshPairs` over `outDir`
    * periodically if that matters.
    *
    * @param bootstrapNumBuckets bucket count when this sink creates
    *        `sigTable` on its first batch (ignored once it exists).
    */
  def incrementalToParquet(
      stream: DataFrame,
      textCol: String,
      idCol: String,
      outDir: String,
      sigTable: String,
      checkpointDir: String,
      jaccardThreshold: Double = 0.5,
      maxBucket: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
      bootstrapNumBuckets: Int = 64): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        processIncrementalBatch(b.toDF(), batchId, textCol, idCol, outDir,
          sigTable, jaccardThreshold, maxBucket, bootstrapNumBuckets)
      }
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)

  /** One micro-batch of [[incrementalToParquet]] — public so the
    * replay path (foreachBatch re-invoked with the same `batchId`
    * after checkpoint recovery) is directly testable.
    */
  def processIncrementalBatch(
      b: DataFrame,
      batchId: Long,
      textCol: String,
      idCol: String,
      outDir: String,
      sigTable: String,
      jaccardThreshold: Double = 0.5,
      maxBucket: Int = 0,
      bootstrapNumBuckets: Int = 64): Unit = {
    import graft.operators.Dedup
    val spark = b.sparkSession
    val batch = Dedup.exact(b, Seq(textCol), idCol)
    val survivors =
      (if (spark.catalog.tableExists(sigTable)) {
        // Exclude the in-flight batch's own partition: on replay
        // (checkpoint recovery) outDir already holds this batch's
        // previous write, and near-dup pairs WITHIN the batch would
        // flag each other against "history", silently shrinking the
        // rewritten partition. Candidate rows from the batch's
        // replayed signature rows drop out in the verification join
        // against this filtered corpus.
        val history = spark.read.parquet(outDir)
          .where(col("batch_id") =!= batchId)
        val flagged = Dedup
          .minHashLshPairsIncremental(batch, history, sigTable,
            textCol, idCol, jaccardThreshold, maxBucket)
          .select(col("id_b").as(idCol))
          .distinct()
        batch.join(flagged, Seq(idCol), "left_anti")
      } else batch).localCheckpoint() // two consumers: data + signatures
    survivors.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    if (spark.catalog.tableExists(sigTable))
      Dedup.appendMinHashSignatures(survivors, textCol, idCol, sigTable)
    else
      Dedup.writeMinHashSignatures(survivors, textCol, idCol, sigTable,
        numBuckets = bootstrapNumBuckets)
  }
}
