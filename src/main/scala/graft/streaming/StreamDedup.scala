package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
