package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed (key, bucket) aggregate flowing between the two
  * stateful stages.
  */
case class AnomalyBucket(key: String, bucket_ms: Long, value: Double)

/** Per-key trailing history: the last `trailing` closed buckets,
  * oldest first — the only state the z-score needs, so state size is
  * trailing × |keys| regardless of stream length.
  */
case class AnomalyState(recent: List[AnomalyBucket])

/** A scored bucket; `zscore` is None during warmup or zero spread —
  * mirroring the batch contract.
  */
case class AnomalyScore(
    key: String,
    bucket_ms: Long,
    value: Double,
    zscore: Option[Double],
    is_anomaly: Boolean)

/** Streaming twin of [[graft.operators.Events.anomalies]]: rolling
  * z-score flags over per-key bucket aggregates, computed
  * incrementally on an unbounded stream.
  *
  * Two chained stateful stages (append mode end to end):
  *   1. watermarked tumbling aggregation — one row per (key, bucket),
  *      emitted exactly once when the watermark closes the bucket
  *      (exact DECIMAL value sums, 4 dp at the boundary — the batch
  *      discipline, which matters MORE under micro-batch retries);
  *   2. `flatMapGroupsWithState` keyed by key — state is the last
  *      `trailing` closed buckets, each arriving bucket is scored
  *      against the state BEFORE being appended (the score never sees
  *      the value it judges, as in batch), rounded mean/sd 6 dp,
  *      z 4 dp.
  *
  * Declared differences from the batch twin, both inherent to
  * streaming:
  *   - no gap fill: a silent bucket is unobservable until its
  *     watermark passes, and materializing it would need timer-based
  *     emission — the batch operator remains the gap-aware report;
  *   - scoring order is bucket-closure order (watermark-monotone per
  *     key); buckets arriving closed in the same micro-batch are
  *     scored in bucket_ms order.
  *
  * State bound: trailing × |keys| rows, no timeout needed.
  */
object StreamAnomaly {

  def anomalies(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      width: String,
      delay: String,
      trailing: Int = 7,
      z: Double = 3.0): Dataset[AnomalyScore] = {
    require(trailing >= 2, "trailing window must hold at least 2 buckets")
    val spark = stream.sparkSession
    import spark.implicits._
    val closed = stream
      .withWatermark(tsCol, delay)
      .groupBy(
        col(keyCol).cast("string").as("key"),
        window(col(tsCol), width).as("__w"))
      .agg(round(sum(col(valueCol).cast("decimal(18,6)")).cast("double"), 4)
        .as("value"))
      .select(col("key"), unix_millis(col("__w.start")).as("bucket_ms"),
        col("value"))
      .as[AnomalyBucket]

    def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

    def score(
        key: String,
        rows: Iterator[AnomalyBucket],
        state: GroupState[AnomalyState]): Iterator[AnomalyScore] = {
      var recent = state.getOption.map(_.recent).getOrElse(Nil)
      val out = rows.toSeq.sortBy(_.bucket_ms).map { b =>
        val window = recent.takeRight(trailing)
        val zs =
          if (window.size >= trailing) {
            val n = window.size
            val mean = r(window.map(_.value).sum / n, 6)
            val sd = r(math.sqrt(math.max(0.0,
              window.map(v => v.value * v.value).sum / n - mean * mean)), 6)
            if (sd > 0) Some(r(math.abs(b.value - mean) / sd, 4)) else None
          } else None
        recent = (recent :+ b).takeRight(trailing)
        AnomalyScore(key, b.bucket_ms, b.value, zs, zs.exists(_ > z))
      }
      state.update(AnomalyState(recent))
      out.iterator
    }

    closed
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        score)
  }
}
