package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the attribution
  * primitive ("join each click to the impressions it followed
  * within N minutes") computed incrementally over two unbounded
  * streams.
  *
  * Semantics: INTERVAL join, not as-of — a right event joins EVERY
  * left event sharing the key whose timestamp precedes it by at most
  * `maxDelay` (the batch as-of twin,
  * [[graft.operators.TemporalJoin]], is the dedup-to-nearest shape).
  * `leftOuter` additionally emits each unmatched left event exactly
  * once — with null right columns — after the watermark proves no
  * match can still arrive (the "impressions that never converted"
  * report).
  *
  * Scale shape: both sides shuffle once on the join key into the
  * SAME state-store partitioning (co-partitioned stateful join);
  * per-key state holds only rows younger than the watermark bound —
  * the time-range condition is what lets Spark evict left rows older
  * than `maxDelay` + `watermarkDelay` and right rows older than
  * `watermarkDelay`, so state is bounded by the event rate × the
  * window regardless of stream length. Without the range condition a
  * stream-stream join would hold BOTH streams forever; this operator
  * exists to make the bounded form the easy path.
  *
  * Column contract: the two frames must have disjoint column names
  * except `keyCol` (rename upstream; the output carries left.* then
  * right.* minus its join key).
  */
object StreamJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      maxDelay: String,
      watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "leftOuter").contains(joinType),
      s"joinType must be inner or leftOuter, got $joinType")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"left/right column names must be disjoint apart from $keyCol; clashing: $overlap")
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    // the right watermark is what closes unmatched-left emission for
    // leftOuter; the range condition below is what bounds state
    val r = right.withWatermark(rightTsCol, watermarkDelay)
      .withColumnRenamed(keyCol, "__rk")
    val cond = col(keyCol) === col("__rk") &&
      col(rightTsCol) >= col(leftTsCol) &&
      col(rightTsCol) <= col(leftTsCol) + expr(s"interval $maxDelay")
    l.join(r, cond, joinType).drop("__rk")
  }
}
