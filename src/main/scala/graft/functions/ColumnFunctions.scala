package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-in / Column-out analytics functions.
  *
  * Re-expression of the reference's `kolang/column_functions.py` as
  * idiomatic Scala Spark. Everything here composes built-in
  * (whole-stage-codegen'd) expressions — no UDFs — so Catalyst can
  * push, prune and fuse freely. Window-based functions take an
  * explicit `partitionBy`; at 100 TB an unpartitioned window is a
  * single-task sort, so callers should always partition unless the
  * frame is genuinely global (the reference has the same semantics).
  */
object ColumnFunctions {

  /** Percent of `c` within its partition's total
    * (reference column_functions.py:31 `percent`).
    */
  def percent(c: Column, partitionBy: Seq[Column] = Nil, r: Int = 2): Column =
    round(lit(100) * c / sum(c).over(Window.partitionBy(partitionBy: _*)), r)

  /** Aggregate: exact median (interpolated percentile 0.5), matching
    * the reference's `percentile(col, array(0.5))[0]`
    * (reference column_functions.py:71 `median`).
    */
  def median(c: Column): Column = percentile(c, lit(0.5))

  /** Parse a "[a, b, c]"-style string into array<string>
    * (reference column_functions.py:98 `str_array_to_array`).
    * Empty / "[]" / null input → null.
    */
  def strArrayToArray(c: Column): Column = {
    val stripped = translate(c, "[]", "")
    split(when(stripped =!= "", stripped), ", ")
  }

  /** Running sum of `c` ordered by `onCol` (RANGE frame: ties share a
    * value), optionally partitioned
    * (reference column_functions.py:177 `cumulative_sum`).
    */
  def cumulativeSum(
      c: Column,
      onCol: Column,
      ascending: Boolean = true,
      partitionBy: Seq[Column] = Nil): Column = {
    val ord = if (ascending) onCol.asc else onCol.desc
    val w = Window
      .partitionBy(partitionBy: _*)
      .orderBy(ord)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    sum(c).over(w)
  }

  /** Running percent-of-total ordered by `onCol`
    * (reference column_functions.py:563 `cumulative_percent`).
    */
  def cumulativePercent(
      c: Column,
      onCol: Column,
      ascending: Boolean = true,
      partitionBy: Seq[Column] = Nil,
      r: Int = 2): Column = {
    val ord = if (ascending) onCol.asc else onCol.desc
    val wSum = Window
      .partitionBy(partitionBy: _*)
      .orderBy(ord)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wTotal = Window.partitionBy(partitionBy: _*)
    round(lit(100) * sum(c).over(wSum) / sum(c).over(wTotal), r)
  }

  /** Bucket a numeric column to multiples of `scale`
    * (reference column_functions.py:256 `bin`).
    */
  def binCol(c: Column, scale: Double = 10, flooring: Boolean = true): Column =
    if (flooring) floor(c / scale) * scale
    else round(c / scale, 0) * scale

  /** Deterministic session id: a new session starts when the gap from
    * the previous event of the same device exceeds `sessionTimeMin`.
    *
    * Semantics of reference column_functions.py:281 `session_id`, but
    * NOT its implementation: the reference tagged session starts with
    * `monotonically_increasing_id()` (non-deterministic, untestable,
    * and unstable under retries at scale). We instead number sessions
    * per device with a running count of start flags — one shuffle on
    * `deviceId`, deterministic output `"<device>#<n>"`.
    *
    * `createdAt` is epoch milliseconds (long), as in the reference.
    */
  def sessionId(
      deviceId: Column,
      createdAt: Column,
      sessionTimeMin: Int = 30): Column = {
    val gapMs = sessionTimeMin * 60000L
    val w = Window.partitionBy(deviceId).orderBy(createdAt)
    val prev = lag(createdAt, 1).over(w)
    val isStart = prev.isNull || (createdAt - prev > gapMs)
    val sessionNum = sum(isStart.cast("long"))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    concat(deviceId.cast("string"), lit("#"), sessionNum.cast("string"))
  }

  /** Aggregate: count of rows satisfying `cond`
    * (reference column_functions.py:312 `cond_count`).
    */
  def condCount(cond: Column): Column = count(when(cond, true))

  /** Aggregate: count of rows satisfying the SQL condition string. */
  def condCount(cond: String): Column = condCount(expr(cond))

  /** Row-wise sum of many columns
    * (reference column_functions.py:490 `sum_columns`).
    */
  def sumColumns(cols: Seq[Column]): Column =
    cols.foldLeft(lit(0): Column)(_ + _)

  /** True when `arrayCol` contains the (non-literal) value of `c`
    * (reference column_functions.py:531 `array_contains_column`).
    * `array_contains` takes a column value directly in Spark — no
    * need for the reference's intersect trick.
    */
  def arrayContainsColumn(c: Column, arrayCol: Column): Column =
    array_contains(arrayCol, c)

  /** Aggregate: weighted average, optionally rounded
    * (reference column_functions.py:617 `weighted_average`).
    */
  def weightedAverage(c: Column, weight: Column, r: Int = -1): Column = {
    val avg = sum(c * weight) / sum(weight)
    if (r >= 0) round(avg, r) else avg
  }

  /** Aggregate: distinct count treating NULL as one extra value
    * (reference column_functions.py:650 `count_distinct_with_nulls`).
    */
  def countDistinctWithNulls(c: Column): Column =
    countDistinct(c) + countDistinct(when(c.isNull, lit(true)))

  /** Percent of `c` against the partition total restricted to rows
    * where every `cubeCols` entry is non-null — percent-of-leaf when
    * used over `cube()` output
    * (reference column_functions.py:668 `cube_percent`).
    */
  def cubePercent(
      c: Column,
      cubeCols: Seq[Column],
      partitionBy: Seq[Column] = Nil,
      r: Int = 2): Column = {
    val allNonNull = cubeCols
      .map(_.isNotNull)
      .foldLeft(lit(true): Column)(_ && _)
    val w = Window.partitionBy(partitionBy: _*)
    round(lit(100) * c / sum(when(allNonNull, c)).over(w), r)
  }

  /** Moving average over a ROWS frame of `period` rows ordered by
    * `order` (reference column_functions.py:703 `moving_average`).
    * `mode`: "previous" | "center" | "next". `partitionBy` is an
    * addition over the reference — an unpartitioned ordered window is
    * a single-task sort at scale.
    */
  def movingAverage(
      value: Column,
      order: Column,
      period: Int,
      mode: String = "center",
      r: Int = -1,
      partitionBy: Seq[Column] = Nil): Column = {
    val p = period - 1
    val (s, e) = mode match {
      case "previous" => (-p, 0)
      case "center"   => (-math.ceil(p / 2.0).toInt, math.floor(p / 2.0).toInt)
      case "next"     => (0, p)
      case other =>
        throw new IllegalArgumentException(
          s"mode must be previous|center|next, got: $other")
    }
    val w = Window.partitionBy(partitionBy: _*).orderBy(order).rowsBetween(s, e)
    val mavg = avg(value).over(w)
    if (r >= 0) round(mavg, r) else mavg
  }
}
