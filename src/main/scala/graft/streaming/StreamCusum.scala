package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One decided event: both CUSUM levels AFTER folding this event, and
  * the alarm verdict.
  */
case class CusumAlarm(
    key: String,
    ts_ms: Long,
    value: Double,
    cusum_hi: Double,
    cusum_lo: Double,
    alarm: Boolean)

/** Per-key state: the two one-sided CUSUM levels in exact 6-dp
  * MICRO-UNITS (the same quantization as the batch twin's
  * DECIMAL(18,6) deviations), so a level can never drift from the
  * batch computation by accumulated float error — two longs per key,
  * constant state regardless of stream length.
  */
case class CusumState(hiMicro: Long, loMicro: Long)

/** Streaming twin of [[graft.operators.Events.cusum]]: continuous
  * two-sided CUSUM drift alarms on a live stream — the batch
  * operator audits yesterday's level shift, this one pages on it
  * while it is happening (the monitoring shape: z-score spikes fire
  * [[StreamAnomaly]], slow sustained degradation fires this).
  *
  * `flatMapGroupsWithState` keyed by key, update mode: each arriving
  * event folds S = max(0, S + d) on both sides and emits its levels
  * + verdict. Deviations quantize to 6-dp micro-unit longs exactly
  * like the batch twin's DECIMAL(18,6), so on the same in-order data
  * the decisions are IDENTICAL to the oracle-checked batch operator
  * (the spec asserts it).
  *
  * Declared difference from the batch twin (inherent): fold order is
  * micro-batch arrival, ts-sorted within a batch per key — a LATE
  * event folds into the CURRENT level rather than its historical
  * position (the batch audit is the exact retrospective). State is
  * two longs per key and never times out (a key that goes quiet and
  * returns keeps its level — CUSUM's memory is the point).
  */
object StreamCusum {

  private def micro6(x: Double): Long =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.unscaledValue().longValueExact()

  def alarms(
      stream: DataFrame,
      keyCol: String,
      tsMsCol: String,
      valueCol: String,
      target: Double,
      slack: Double,
      h: Double): Dataset[CusumAlarm] = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(h > 0, s"h must be positive, got $h")
    val spark = stream.sparkSession
    import spark.implicits._
    val hMicro = micro6(h)
    val typed = stream
      .where(col(keyCol).isNotNull && col(tsMsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        col(tsMsCol).cast("long").as("ts_ms"),
        col(valueCol).cast("double").as("value"))
      .as[(String, Long, Double)]

    def decide(
        key: String,
        rows: Iterator[(String, Long, Double)],
        state: GroupState[CusumState]): Iterator[CusumAlarm] = {
      var s = state.getOption.getOrElse(CusumState(0L, 0L))
      val out = rows.toSeq.sortBy(_._2).map { case (_, ts, x) =>
        val hi = math.max(0L, s.hiMicro + micro6(x - target - slack))
        val lo = math.max(0L, s.loMicro + micro6(-(x - target) - slack))
        s = CusumState(hi, lo)
        CusumAlarm(key, ts, x, hi / 1e6, lo / 1e6,
          hi > hMicro || lo > hMicro)
      }
      state.update(s)
      out.iterator
    }

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(decide)
  }
}
