package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning at 100 TB.
  *
  * A parquet scan prunes row groups and files from their min/max
  * column statistics — but the stats only help if the writer CLUSTERS
  * the data so each file covers a narrow value range. Sorting handles
  * one predicate column; multi-dimensional filters (lang AND length,
  * date AND domain …) need an order that keeps ALL dimensions local.
  * The Z-order (Morton) curve does exactly that: interleaving the
  * bits of the quantized dimensions maps nearby (x, y, …) tuples to
  * nearby curve positions, so a range-partitioned, sorted write
  * produces files whose per-dimension min/max boxes are small — and
  * a filter on ANY of the interleaved dimensions skips most files.
  * (The technique behind clustered layouts in modern lakehouse table
  * formats; the curve itself is Morton, 1966.)
  *
  * Everything here is plain column arithmetic (codegen'd, no UDF)
  * plus `repartitionByRange` — the ordinary Spark range-shuffle
  * machinery does the clustering.
  */
object Layout {

  /** Morton/Z-value of `cols`: bit-interleave the low `bits` bits of
    * each column (caller quantizes to [0, 2^bits) — e.g. `least(x,
    * lit((1 << bits) - 1))` or a hash bucket). Plain shift/and/or
    * terms, fully whole-stage-codegen. `bits × cols.size` must fit a
    * signed Long.
    */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*cols must fit a signed long, got $bits*${cols.size}")
    val k = cols.size
    val terms = for {
      b <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * k + j)
    terms.reduce(_ + _)
  }

  /** Write `df` parquet-clustered along the Z-order of `zCols`:
    * range-partition on the z-value into `numFiles` output files,
    * sort within each, write. Files then cover disjoint z-ranges =
    * small multi-dimensional bounding boxes = min/max pruning works
    * for filters on any of the clustered dimensions.
    *
    * One range shuffle (sampled boundaries — balanced files even on
    * skewed z distributions) + a local sort: the same cost as any
    * sorted write, no extra pass.
    */
  def layoutZOrder(
      df: DataFrame,
      zCols: Seq[Column],
      bits: Int,
      path: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val zCol = graft.Cols.unique("__z", df)
    df.withColumn(zCol, zorderValue(zCols, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction plan: assign files to target-size bins by
    * first-fit over the size-descending order — the classic next-fit
    * decreasing bound (≤ 2× optimal bins, and ≥ half-full bins except
    * possibly the last). Input is a FILE LISTING (one row per file),
    * which is metadata — millions of rows at most even for a 100 TB
    * table — so the single global window sort is deliberate and
    * cheap; the expensive part (actually rewriting the data) happens
    * downstream, one task per bin, embarrassingly parallel.
    *
    * Deterministic: ties in size break on `fileCol`, and the greedy
    * cumulative-sum rule (`bin = floor(cum_before / target)`) depends
    * only on the sorted order — an oracle replays it with one window.
    *
    * @return input columns + `bin` (0-based compaction group).
    */
  def compactionPlan(
      files: DataFrame,
      fileCol: String,
      sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(sizeCol).desc, col(fileCol))
      .rowsBetween(Long.MinValue, -1)
    // Integer `div`, not double `/`: cumulative byte counts pass
    // 2^53 (double's exact-integer ceiling) at petabyte listings.
    files
      .withColumn("__cb", coalesce(sum(col(sizeCol).cast("long")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cast(__cb div ${targetBytes}L as int)"))
      .drop("__cb")
  }
}
