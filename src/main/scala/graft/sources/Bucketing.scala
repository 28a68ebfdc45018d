package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free joins.
  *
  * At 100 TB the dominant cost of a fact-fact join (e.g. lineitem ⋈
  * orders) is shuffling both sides. Writing both tables bucketed by
  * the join key with the SAME bucket count lets Spark plan a
  * SortMergeJoin with NO exchange on either side — the bucketing IS
  * the partitioning. Spark's bucketing rides the session catalog
  * (`saveAsTable`), so these helpers manage catalog tables, not bare
  * paths.
  */
object Bucketing {

  /** Cluster `df` so the bucketed write that follows emits ONE file
    * per bucket instead of (write tasks × buckets) files. Spark's
    * bucketed writer opens a separate file per bucket id PER TASK, so
    * a 32-task write into 64 buckets leaves ~2048 tiny files — the
    * guide-§6 small-files failure measured on the round-16 signature
    * table: a 17 MB table in 2048 files cost ~20 s of scan task time
    * for 10k rows. `repartition(numBuckets, bucketCols)` uses the
    * SAME pmod(murmur3, n) placement as the bucket-id expression, so
    * every task holds exactly one bucket and the write emits exactly
    * one file for it. The extra exchange moves id-sized signature
    * rows once — at any scale that is cheaper than crippling every
    * later scan of the table.
    */
  def clusterForBuckets(
      df: DataFrame, bucketCols: Seq[String], numBuckets: Int): DataFrame =
    df.repartition(numBuckets,
      bucketCols.map(org.apache.spark.sql.functions.col): _*)

  /** Write `df` as a bucketed (and optionally sorted) catalog table.
    * Sorting within buckets additionally removes the join-time sort.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    val w0 = clusterForBuckets(df, bucketCols, numBuckets).write
      .mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w.saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket columns. The plan
    * should contain no Exchange under the join — assert with
    * [[exchangeCount]] in tests/audits.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Number of shuffle exchanges in a DataFrame's executed plan —
    * 0 for a correctly co-bucketed join.
    */
  def exchangeCount(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val inner = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    inner.collect { case e: ShuffleExchangeLike => e }.size
  }
}
