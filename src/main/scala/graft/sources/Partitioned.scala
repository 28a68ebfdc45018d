package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-layout partitioned parquet — the physical-layout tool that
  * turns a full-corpus scan into a directory-pruned one: a corpus
  * written `lang=en/ lang=de/ …` serves every per-slice query by
  * reading ONLY the matching directories (the `PartitionFilters`
  * entry in the scan plan; zero data files of other slices are even
  * listed). At 100 TB this is the difference between a per-language
  * job reading 100 TB and reading its own 2 TB slice.
  *
  * Write discipline: rows are repartitioned BY the partition columns
  * first, so each dynamic partition is produced by one task (without
  * it, every upstream task appends its own file to every partition —
  * tasks × partitions small files, the classic layout mistake).
  * Cardinality is guarded: partition columns are directory names,
  * so a high-cardinality column (an id, a timestamp) is rejected
  * in-plan before it can create millions of directories.
  */
object Partitioned {

  /** Write `df` hive-partitioned by `partitionCols`; returns the
    * bounded partition manifest (one row per partition tuple with
    * its row count). The manifest is a SECOND scan of the input (a
    * map-side-combined count — cheap relative to the write, but not
    * free; callers that cannot afford it can derive counts from
    * `observe` metrics on their own write).
    *
    * `filesPerPartition` bounds per-task volume on SKEWED partition
    * values: with the default 1 each partition tuple is written by
    * exactly one task (fewest files), which serializes a hot value —
    * a `lang=en` slice holding most of the corpus would funnel
    * through a single writer. Setting it to F salts the repartition
    * key so a hot partition spreads over ≤ F tasks/files while small
    * partitions still produce ≤ F (usually 1 non-empty) files.
    */
  def writePartitioned(
      df: DataFrame,
      outDir: String,
      partitionCols: Seq[String],
      maxPartitions: Long = 10000L,
      filesPerPartition: Int = 1): DataFrame = {
    require(partitionCols.nonEmpty, "no partition columns given")
    require(partitionCols.distinct == partitionCols,
      "partition columns must be distinct")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val pcols = partitionCols.map(col)
    val manifest = df.groupBy(pcols: _*).agg(count(lit(1)).as("n_rows"))
    // directory-count guard, in-plan (the gapFill discipline): fold
    // the cap into the manifest count the caller reads anyway
    val guarded = manifest.localCheckpoint()
    val nParts = guarded.count()
    require(nParts <= maxPartitions,
      s"writePartitioned: $nParts partition tuples exceed " +
        s"maxPartitions=$maxPartitions - partition columns must be " +
        "low-cardinality (directory names, not ids)")
    // Deterministic row-content salt (retry-safe — a rand()/row-id
    // salt can lose rows when a task retries under a different
    // shuffle assignment): hash every non-partition column.
    val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
    val keys =
      if (filesPerPartition == 1 || dataCols.isEmpty) pcols
      else pcols :+ pmod(hash(dataCols: _*), lit(filesPerPartition))
    df.repartition(keys: _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
    guarded
  }

  /** Read a partitioned layout. Filters on partition columns that the
    * caller applies to the result prune at the DIRECTORY level —
    * [[assertPartitionPruned]] is the spec-side proof.
    */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Plan-shape assertion for specs and pipeline pre-flights: the
    * scan of `df` must carry a non-empty PartitionFilters entry on
    * `colName` — i.e. the predicate reached the directory level
    * instead of being applied post-scan to all files.
    */
  def assertPartitionPruned(df: DataFrame, colName: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    val ok = plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains(colName) &&
        !l.contains("PartitionFilters: []"))
    require(ok, s"partition pruning on '$colName' did NOT reach the scan:\n" +
      plan.linesIterator.filter(_.contains("PartitionFilters"))
        .mkString("\n"))
  }
}
