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
    val w0 = df.write
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
