package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — batch and Structured Streaming twins of
  * `graft.functions.ColumnFunctions.sessionId` (reference
  * column_functions.py:281).
  *
  * The streaming path uses Spark's native `session_window` (gap-based
  * session windows with watermark-driven state eviction) — the
  * idiomatic replacement for hand-rolled lag()-based sessionization,
  * and the only shape that bounds state at 100 TB/day event volumes.
  */
object Sessionize {

  /** Batch session aggregation: one row per (key, session window)
    * with event count and value sum. Works on a static DataFrame.
    */
  def sessionAgg(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "30 minutes",
      valueCol: Option[String] = None): DataFrame = {
    val aggs = count(lit(1)).as("n_events") +:
      valueCol.map(v => sum(col(v)).as("value_sum")).toSeq
    val aggNames = "n_events" +: valueCol.map(_ => "value_sum").toSeq
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        (col(keyCol) +:
          col("session_window.start").as("session_start") +:
          col("session_window.end").as("session_end") +:
          aggNames.map(col)): _*)
  }

  /** Streaming session aggregation: same contract over a streaming
    * DataFrame, with a watermark so session state is evicted once the
    * gap can no longer be extended.
    */
  def streamingSessionAgg(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
