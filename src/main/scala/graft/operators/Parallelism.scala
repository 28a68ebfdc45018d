package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for CPU-bound kernel stages.
  *
  * A 100 TB table arrives as ~10⁵–10⁶ file splits, so scan parallelism
  * is free. A small (or unsplittable single-row-group) file arrives as
  * 1–2 tasks — and a per-row kernel (shingling, hashing, regex
  * counting) then runs on 1–2 cores of a 32-core executor. The fix is
  * a repartition, but an UNCONDITIONAL repartition inside an operator
  * would re-shuffle the full corpus at real scale where the scan is
  * already wide.
  *
  * [[spread]] gates on the optimizer's size estimate (file-metadata
  * only — no job runs): inputs smaller than `bytesPerCore ×
  * defaultParallelism` are round-robin repartitioned to full
  * parallelism (the shuffle moves at most that many bytes, trivially
  * cheap by construction); anything larger is left untouched. At
  * cluster scale this is always a no-op.
  */
object Parallelism {

  /** Default budget per core under which repartitioning is
    * obviously-cheap: 4 MiB/core (128 MiB across 32 cores).
    */
  val DefaultBytesPerCore: Long = 4L << 20

  def spread(df: DataFrame, bytesPerCore: Long = DefaultBytesPerCore): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val par = sc.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est >= BigInt(
        org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes)) {
      // Plan leaves WITHOUT real statistics (LogicalRDD from
      // localCheckpoint, in-memory/RDD-backed frames) report the
      // defaultSizeInBytes sentinel (Long.MaxValue) — i.e. "huge" for
      // exactly the small in-memory frames this operator exists to
      // protect. Fall back to the LEAF RDDs' partition counts, read
      // from plan metadata — `df.rdd` would materialize every AQE
      // stage of a composed plan just to learn the count. Plans with
      // no RDD leaf stay untouched (conservative no-op).
      val leafParts = org.apache.spark.sql.GraftSqlBridge.leafRddPartitions(df)
      if (leafParts.nonEmpty && leafParts.max < par) df.repartition(par) else df
    } else if (est < BigInt(bytesPerCore) * par) df.repartition(par)
    else df
  }

  private val stageCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Optimizer barrier: predicates cannot push through a
    * CollectMetrics node (`observe`), and — unlike a nondeterministic
    * dummy column, which ColumnPruning deletes and thereby re-enables
    * the pushdown — it cannot be pruned away. Use above a projection
    * that stages EXPENSIVE per-row expressions a downstream filter
    * references: without it, predicate pushdown substitutes the
    * expression into the Filter (or a join condition), re-evaluating
    * it once per reference per row. The metric itself is a row count
    * (negligible); the name is uniquified so one query can hold
    * several barriers. Works on batch and streaming frames.
    */
  def pushdownBarrier(df: DataFrame): DataFrame =
    df.observe(s"graft_stage_${stageCounter.incrementAndGet()}",
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
}
