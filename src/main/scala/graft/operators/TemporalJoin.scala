package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark SQL lacks natively, shaped for scale.
  *
  * Both operators avoid the planner's fallback for range predicates
  * (broadcast-nested-loop or cartesian): as-of rides a union + one
  * ordered window (one shuffle on the key), range-join rides interval
  * bucketing (one equi-shuffle + post-filter).
  */
object TemporalJoin {

  /** As-of join: attach to each left row the LATEST right row with
    * `rightTs` ≤ `leftTs` (within `toleranceMs` when ≥ 0), per `keys`.
    *
    * Implementation: tag and union both sides, order by (ts, right
    * rows first at equal ts — inclusive match), running `last` of the
    * right payload. One shuffle on `keys`, O(n log n) in-partition,
    * no range-condition join anywhere.
    *
    * Determinism requires the right side unique per (keys, rightTs);
    * pre-aggregate otherwise.
    *
    * Output: all left columns, then `<prefix>ts` (matched right
    * timestamp) and `<prefix><c>` for each right value column — null
    * when no right row qualifies.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      keys: Seq[String],
      rightCols: Seq[String],
      toleranceMs: Long = -1L,
      prefix: String = "right_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq

    val rPayload = struct(
      (col(rightTs).cast("long").as("__rts") +: rightCols.map(col)): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).cast("long").as("__ts")
        :+ lit(1).as("__isR") :+ rPayload.as("__rv")): _*)
    val lPayload = struct(leftCols.map(col): _*)
    val l = left.select(
      (keys.map(col) :+ col(leftTs).cast("long").as("__ts")
        :+ lit(0).as("__isR") :+ lPayload.as("__lv")): _*)

    val unioned = r
      .withColumn("__lv", lit(null).cast(l.schema("__lv").dataType))
      .unionByName(l.withColumn("__rv", lit(null).cast(r.schema("__rv").dataType)))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = unioned
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__isR") === 0)

    val inTolerance =
      if (toleranceMs < 0) col("__m").isNotNull
      else col("__m").isNotNull && (col("__ts") - col("__m.__rts") <= toleranceMs)
    val gated = withMatch.withColumn("__m", when(inTolerance, col("__m")))

    val outCols: Seq[Column] =
      leftCols.map(c => col(s"__lv.$c").as(c)) ++
        (col("__m.__rts").as(s"${prefix}ts") +:
          rightCols.map(c => col(s"__m.$c").as(s"$prefix$c")))
    gated.select(outCols: _*)
  }

  /** Point-in-interval (range) join: inner-join `points` rows into
    * every `intervals` row whose [startCol, endCol] contains the
    * point, per `keys`.
    *
    * Implementation: explode each interval to the buckets it covers
    * (width `bucketWidth` — pick ≈ the median interval length so each
    * interval covers O(1) buckets), equi-join on (keys, bucket), then
    * the exact BETWEEN filter. A point's bucket is covered at most
    * once per interval, so no dedup is needed.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = graft.Cols.unique("__b", points, intervals)
    val p = points.withColumn(b, floor(col(pointCol).cast("long") / bucketWidth))
    val i = intervals.withColumn(
      b,
      explode(
        sequence(
          floor(col(startCol).cast("long") / bucketWidth),
          floor(col(endCol).cast("long") / bucketWidth))))
    p.join(i, keys :+ b)
      .where(col(pointCol).between(col(startCol), col(endCol)))
      .drop(b)
  }
}
