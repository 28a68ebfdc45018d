package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe twins of the global-window column functions.
  *
  * `percent(c)` / `cumulativePercent(c, on)` / `movingAverage(...)`
  * with no `partitionBy` are faithful to the reference and fine on
  * post-aggregation cardinalities — but on raw data an
  * empty-partition window moves EVERYTHING to one task
  * (`WindowExec: No Partition Defined`). The operators here compute
  * the same values with distributed plans:
  *
  *  - totals via a scalar aggregate broadcast back (never a window);
  *  - running sums via a range-partitioned prefix sum: local window
  *    per range partition + per-partition offsets (an aggregate of
  *    ≤ numPartitions rows — bounded by cluster layout, not data);
  *  - moving averages via halo exchange: each range partition
  *    receives copies of the frame-width boundary rows of its
  *    neighbours, computes the window locally, and drops the halo.
  */
object Cumulative {

  /** `outCol` = 100·value/Σvalue, the global Σ computed as a scalar
    * aggregate and broadcast-cross-joined back — no single-partition
    * window, safe directly on raw data.
    */
  def withPercentOfTotal(
      df: DataFrame,
      value: Column,
      outCol: String,
      r: Int = 2): DataFrame =
    df.crossJoin(broadcast(df.agg(sum(value).as("__tot"))))
      .withColumn(outCol, round(lit(100) * value / col("__tot"), r))
      .drop("__tot")

  /** Scale-safe twin of `cubePercent`: the denominator counts only
    * rows where every `cubeCols` entry is non-null (the leaf level of
    * a `cube()`), computed as a scalar aggregate and broadcast back.
    */
  def withCubePercent(
      df: DataFrame,
      value: Column,
      cubeCols: Seq[Column],
      outCol: String,
      r: Int = 2): DataFrame = {
    val allNonNull = cubeCols.map(_.isNotNull).reduce(_ && _)
    df.crossJoin(broadcast(df.agg(sum(when(allNonNull, value)).as("__tot"))))
      .withColumn(outCol, round(lit(100) * value / col("__tot"), r))
      .drop("__tot")
  }

  /** Global running sum of `value` ordered by `onCol` (RANGE frame —
    * ties share a value), computed as a distributed prefix sum:
    *
    *  1. range-repartition on the order key (equal keys land in one
    *     partition — a pure function of the key — so the RANGE frame
    *     never straddles a boundary);
    *  2. each partition computes its local running sum in parallel
    *     (window partitioned by `spark_partition_id()`);
    *  3. per-partition totals (≤ numPartitions rows, an aggregate)
    *     turn into prefix offsets with a tiny single-partition window
    *     — bounded by the cluster's partition count, not by n — and
    *     broadcast back.
    *
    * The range exchange is referenced by both branches with an
    * identical subtree, so ReuseExchange shuffles once.
    */
  def withCumulativeSum(
      df: DataFrame,
      value: Column,
      onCol: Column,
      outCol: String,
      ascending: Boolean = true): DataFrame =
    prefixSums(df, Seq(value -> outCol), onCol, ascending) { (local, off, _) =>
      local + coalesce(off, lit(0))
    }

  /** Several running sums over ONE range exchange: the per-partition
    * offset frame carries one column per value, so callers needing
    * both a cumulative numerator and a cumulative denominator (AUC /
    * average-precision / KS style sweeps) pay a single checkpoint
    * instead of chaining [[withCumulativeSum]].
    */
  def withCumulativeSums(
      df: DataFrame,
      values: Seq[(Column, String)],
      onCol: Column,
      ascending: Boolean = true): DataFrame =
    prefixSums(df, values, onCol, ascending) { (local, off, _) =>
      local + coalesce(off, lit(0))
    }

  /** Global running percent-of-total ordered by `onCol` — the prefix
    * sum of [[withCumulativeSum]] over the broadcast grand total.
    */
  def withCumulativePercent(
      df: DataFrame,
      value: Column,
      onCol: Column,
      outCol: String,
      ascending: Boolean = true,
      r: Int = 2): DataFrame =
    prefixSums(df, Seq(value -> outCol), onCol, ascending) { (local, off, tot) =>
      round(lit(100) * (local + coalesce(off, lit(0))) / tot, r)
    }

  /** The ONE distributed prefix-sum core (every public cumulative
    * wrapper above routes here — the checkpoint reasoning below is
    * correctness-critical and deliberately not duplicated).
    */
  private def prefixSums(
      df: DataFrame,
      values: Seq[(Column, String)],
      onCol: Column,
      ascending: Boolean)(
      out: (Column, Column, Column) => Column): DataFrame = {
    require(values.nonEmpty, "no values given")
    val ord = if (ascending) onCol.asc else onCol.desc
    // Uniquified temp names: the user's frame survives to the output,
    // so a fixed __pid/__off/__tot would clobber same-named columns.
    val pidCol = graft.Cols.unique("__pid", df)
    val offCols = values.map { case (_, o) => graft.Cols.unique(s"__off_$o", df) }
    val totCols = values.map { case (_, o) => graft.Cols.unique(s"__tot_$o", df) }
    val psCols = values.map { case (_, o) => graft.Cols.unique(s"__ps_$o", df) }
    // Lazy localCheckpoint: the offsets branch and the main branch
    // both consume `part`, and `spark_partition_id()` is only
    // meaningful if they see the SAME physical partitioning. Without
    // the checkpoint the two branches are separately-optimized
    // subtrees (column pruning gives them different projections, so
    // ReuseExchange need not fire) and range-boundary SAMPLING can
    // differ between the two executions once data outgrows the sample
    // — silently mis-assigned offsets. The checkpoint pins one RDD
    // (one exchange, one set of boundaries) shared by both branches.
    val part = df.repartitionByRange(ord)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint(false)
    // The local window re-clusters by __pid (one hash exchange —
    // Catalyst can't see that range partitioning already co-locates
    // the id); parallelism is preserved: one task per range partition.
    val wLoc = Window.partitionBy(col(pidCol)).orderBy(ord)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // Offsets: ≤ numPartitions aggregated rows; the constant-key
    // window is single-partition by construction on a bounded input.
    // pmod(__pid, 1) is constant-VALUED but not foldable, so the
    // planner keeps a real (single-group) partition spec instead of
    // warning about an undefined one.
    val wOff = Window.partitionBy(pmod(col(pidCol), lit(1))).orderBy(col(pidCol))
    val aggs = values.zip(psCols).map { case ((v, _), ps) => sum(v).as(ps) }
    val offs = part
      .groupBy(col(pidCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(pidCol) +:
        (psCols.zip(offCols).map { case (ps, oc) =>
          sum(col(ps))
            .over(wOff.rowsBetween(Window.unboundedPreceding, -1)).as(oc)
        } ++ psCols.zip(totCols).map { case (ps, tc) =>
          sum(col(ps)).over(wOff.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)).as(tc)
        }): _*)
    val joined = part.join(broadcast(offs), Seq(pidCol))
    values.zip(offCols.zip(totCols)).foldLeft(joined) {
      case (acc, ((v, o), (oc, tc))) =>
        acc.withColumn(o, out(sum(v).over(wLoc), col(oc), col(tc)))
    }.drop(pidCol +: (offCols ++ totCols): _*)
  }

  /** Global moving average over a ROWS frame of `period` rows ordered
    * by `order` (unique keys — ROWS frames are ill-defined under
    * ties), distributed by halo exchange:
    *
    *  1. range-repartition on the order key;
    *  2. copy each partition's first `after`-rows to its left
    *     neighbour and last `before`-rows to its right neighbour
    *     (the halo — O(numPartitions · period) duplicated rows);
    *  3. every partition now holds every row of every frame it owns:
    *     compute the window locally, keep only the partition's own
    *     rows.
    *
    * Halo adjacency is only sufficient when every partition holds at
    * least max(before, after) rows and no partition is empty. The
    * frame is checkpointed at full parallelism (stable partition ids
    * + the three halo branches share one sort) and VALIDATED on the
    * materialized per-partition counts (≤ numPartitions rows
    * collected). If a partition is too thin, the final layout is
    * derived in closed form from those counts — parts = min(current−1,
    * n / 2·halo), the 2× margin covering range-sampler imbalance —
    * and the data is re-ranged FROM THE CHECKPOINTED BLOCKS, never
    * from the original lineage, so a composed (join/filter) input is
    * computed exactly once regardless of layout retries. The
    * practical 100 TB regime — a 7-row window over million-row range
    * partitions — always takes exactly one checkpoint; a thin corpus
    * takes two (the probe + the derived layout).
    */
  def withMovingAverage(
      df: DataFrame,
      value: Column,
      order: Column,
      outCol: String,
      period: Int,
      mode: String = "center",
      r: Int = -1): DataFrame = {
    val p = period - 1
    val (s, e) = mode match {
      case "previous" => (-p, 0)
      case "center"   => (-math.ceil(p / 2.0).toInt, math.floor(p / 2.0).toInt)
      case "next"     => (0, p)
      case other =>
        throw new IllegalArgumentException(
          s"mode must be previous|center|next, got: $other")
    }
    val before = -s
    val after = e
    val halo = math.max(math.max(before, after), 1)
    val mavgOut = (c: Column) => if (r >= 0) round(c, r) else c

    // Uniquified temp names: the user's frame survives to the output,
    // so fixed __pid/__rnA/… would clobber same-named user columns.
    val pidCol = graft.Cols.unique("__pid", df)
    val rnACol = graft.Cols.unique("__rnA", df)
    val rnDCol = graft.Cols.unique("__rnD", df)
    val tgtCol = graft.Cols.unique("__tgt", df)
    val ownCol = graft.Cols.unique("__own", df)
    var base = df
    var parts = df.sparkSession.sparkContext.defaultParallelism
    var failures = 0
    while (parts > 1) {
      val ranged = base.repartitionByRange(parts, order.asc)
        .withColumn(pidCol, spark_partition_id())
        .localCheckpoint(true)
      val counts = ranged.groupBy(col(pidCol)).count().collect()
      val thickEnough =
        counts.length == parts && counts.forall(_.getLong(1) >= halo)
      if (thickEnough) {
        val wAsc = Window.partitionBy(col(pidCol)).orderBy(order.asc)
        val wDesc = Window.partitionBy(col(pidCol)).orderBy(order.desc)
        val tagged = ranged
          .withColumn(rnACol, row_number().over(wAsc))
          .withColumn(rnDCol, row_number().over(wDesc))
        val own = tagged.withColumn(tgtCol, col(pidCol)).withColumn(ownCol, lit(true))
        val toPrev = tagged.where(col(rnACol) <= after && col(pidCol) > 0)
          .withColumn(tgtCol, col(pidCol) - 1).withColumn(ownCol, lit(false))
        val toNext = tagged.where(col(rnDCol) <= before)
          .withColumn(tgtCol, col(pidCol) + 1).withColumn(ownCol, lit(false))
        val wFrame = Window.partitionBy(col(tgtCol)).orderBy(order.asc).rowsBetween(s, e)
        return own.unionByName(toPrev).unionByName(toNext)
          .withColumn(outCol, mavgOut(avg(value).over(wFrame)))
          .where(col(ownCol))
          .drop(pidCol, rnACol, rnDCol, tgtCol, ownCol)
      }
      // Derive the final layout in closed form from the counts the
      // probe already collected (n is exact), and re-range from the
      // CHECKPOINTED blocks — the original lineage never re-executes.
      // First failure retries gently (−1, capped by the exact-n
      // bound); a SECOND consecutive failure means the range
      // partitioner keeps emitting thin/empty partitions (heavily
      // duplicated order keys), so halve instead — O(log par) probes
      // to the single-partition fallback, never O(par).
      val n = counts.map(_.getLong(1)).sum
      failures += 1
      val next = if (failures >= 2) parts / 2L else parts - 1L
      parts = math.min(next, n / (2L * halo)).toInt
      base = ranged.drop(pidCol)
    }
    // Single partition: trivially exact (the window sees every row).
    // The key is constant-VALUED but column-derived (not foldable),
    // keeping the partition spec non-empty. `base` may be the probe's
    // checkpoint — same rows, cheaper source.
    val w = Window.partitionBy(coalesce(length(order.cast("string")) * 0, lit(0)))
      .orderBy(order.asc).rowsBetween(s, e)
    base.withColumn(outCol, mavgOut(avg(value).over(w)))
  }
}
