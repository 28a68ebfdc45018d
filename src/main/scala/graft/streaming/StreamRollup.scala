package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming twin of the batch event rollups
  * ([[graft.operators.Events.tumblingRollup]]): the same per-window
  * events/users/value report, computed incrementally over an
  * unbounded stream with watermark-bounded state.
  *
  * Differences from the batch twin, by streaming contract:
  *   - windows come from the native `window()` expression over a
  *     TIMESTAMP column (batch uses integer epoch-ms floor division;
  *     both floor — `window()` is epoch-anchored), emitted as exact
  *     `window_start_ms` (`unix_millis`, so sub-second widths label
  *     correctly) for schema parity;
  *   - `n_users` is `approx_count_distinct` — exact distinct inside
  *     an incremental aggregation would need unbounded per-window
  *     user sets in the state store, exactly what a stream must not
  *     hold (the batch twin stays the exact report);
  *   - the value sum rides the same exact DECIMAL(18,6) accumulator
  *     (order-independence matters MORE under micro-batch retries).
  *
  * State shape: one row per open window; the watermark closes
  * windows `delay` behind the max event time, so state is bounded by
  * windows-per-delay regardless of stream length. Append output mode
  * emits each window exactly once, on close — the shape a downstream
  * parquet/metrics sink wants.
  */
object StreamRollup {

  /** Shared agg/report body — tumbling is exactly hopping with
    * slide == width, so both surfaces delegate here and a future
    * change has ONE site.
    */
  private def rollup(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      userCol: String,
      win: Column,
      delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(win.as("__w"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(userCol).as("n_users_approx"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__sv"),
        count(col(valueCol)).as("__nv"))
      .select(
        unix_millis(col("__w.start")).as("window_start_ms"),
        col("n_events"), col("n_users_approx"),
        round(col("__sv").cast("double"), 4).as("sum_value"),
        round(col("__sv").cast("double") / col("__nv"), 4).as("avg_value"))

  /** Tumbling-window rollup over a streaming (or batch) frame.
    *
    * @param tsCol     TIMESTAMP column (event time).
    * @param width     window width, e.g. "1 day" / "8 hours".
    * @param delay     watermark delay bounding state and lateness.
    * @return per closed window: (window_start_ms, n_events,
    *         n_users_approx, sum_value 4 dp, avg_value 4 dp).
    */
  def tumbling(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      userCol: String,
      width: String,
      delay: String): DataFrame =
    rollup(df, tsCol, valueCol, userCol, window(col(tsCol), width), delay)

  /** Hopping (sliding) twin — same contract with `slide` < `width`
    * via the native `window(ts, width, slide)` covering windows
    * (the closed-form explode the batch twin uses is built in here).
    */
  def hopping(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      userCol: String,
      width: String,
      slide: String,
      delay: String): DataFrame =
    rollup(df, tsCol, valueCol, userCol, window(col(tsCol), width, slide), delay)
}
