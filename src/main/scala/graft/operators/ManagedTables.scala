package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared helper for operators that persist bucketed catalog tables
  * (minhash signature tables, IVF indexes): drop any existing entry
  * and clear a genuinely ORPHANED default-warehouse location — an
  * in-memory catalog forgets tables across sessions while the
  * directory survives, which would fail the next `saveAsTable` with
  * LOCATION_ALREADY_EXISTS. The location is touched only for simple
  * (unqualified) names, in the default database, with no surviving
  * catalog entry — anything else may be another table's data and is
  * the caller's to manage.
  */
private[graft] object ManagedTables {

  /** Rewrite a bucketed catalog table in place from `df` (typically a
    * transform of the table itself) — see [[rewriteTable]] for the
    * crash contract.
    */
  def rewriteBucketed(
      spark: SparkSession,
      table: String,
      df: org.apache.spark.sql.DataFrame,
      numBuckets: Int,
      bucketSortCols: Seq[String]): Unit = {
    require(bucketSortCols.nonEmpty, "need at least one bucket column")
    rewriteTable(spark, table, df, Some((numBuckets, bucketSortCols)))
  }

  /** THE sibling-rewrite crash contract, shared by every operator
    * that replaces a persisted table (IVF compaction, signature-table
    * compaction, PQ index rebuild): the rows land in a `__compact`
    * sibling first (bucketed with `bucketSpec` when given), every
    * existing `graft.*` table property plus `extraProps` is set on
    * the sibling, and only then is the original dropped and the
    * sibling renamed over it — a crash mid-rewrite leaves either the
    * untouched original or a complete sibling, never half a table.
    * `df` must be safe to evaluate while the original still exists
    * (compactions read the original; rebuilds read the corpus). The
    * original not existing yet is fine — this is then a crash-safe
    * first build.
    */
  def rewriteTable(
      spark: SparkSession,
      table: String,
      df: org.apache.spark.sql.DataFrame,
      bucketSpec: Option[(Int, Seq[String])] = None,
      extraProps: Map[String, String] = Map.empty): Unit =
    rewriteTableImpl(spark, table, df, bucketSpec, extraProps,
      failBeforeSwap = false)

  /** [[rewriteTable]] with a test-only crash injection point:
    * `failBeforeSwap` throws after the sibling is complete but before
    * the drop/rename swap — the state a real crash would leave. The
    * crash-contract spec drives all three call-site shapes through
    * this.
    */
  private[graft] def rewriteTableImpl(
      spark: SparkSession,
      table: String,
      df: org.apache.spark.sql.DataFrame,
      bucketSpec: Option[(Int, Seq[String])],
      extraProps: Map[String, String],
      failBeforeSwap: Boolean): Unit = {
    val existing = spark.catalog.tableExists(table)
    val props = (if (existing)
        spark.sql(s"SHOW TBLPROPERTIES `$table`")
          .collect().map(r => r.getString(0) -> r.getString(1))
          .filter(_._1.startsWith("graft.")).toMap
      else Map.empty[String, String]) ++ extraProps
    val tmp = table + "__compact"
    // a sibling left by a previous crash is superseded state
    dropAndClearOrphan(spark, tmp)
    bucketSpec match {
      case Some((n, cols)) =>
        // one file per bucket, not (tasks × buckets) — see
        // Bucketing.clusterForBuckets
        graft.sources.Bucketing.clusterForBuckets(df, cols, n)
          .write.mode("overwrite").format("parquet")
          .bucketBy(n, cols.head, cols.tail: _*)
          .sortBy(cols.head, cols.tail: _*)
          .saveAsTable(tmp)
      case None => df.write.mode("overwrite").format("parquet").saveAsTable(tmp)
    }
    if (props.nonEmpty) {
      val kv = props.map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")
      spark.sql(s"ALTER TABLE `$tmp` SET TBLPROPERTIES ($kv)")
    }
    if (failBeforeSwap)
      throw new IllegalStateException(
        s"injected crash before swapping `$tmp` over `$table`")
    // dropAndClearOrphan (not plain DROP) so a catalog-lost-but-
    // directory-surviving original can't fail the rename
    dropAndClearOrphan(spark, table)
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

  def dropAndClearOrphan(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (!table.contains(".") && spark.catalog.currentDatabase == "default" &&
        !spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        // The path is deleted only if NO catalog entry (any database,
        // any table) claims it or a descendant — an external table
        // parked at the default-warehouse path of a managed-table
        // name must not have its data destroyed by name inference.
        val target = fs.makeQualified(loc).toUri.getPath.stripSuffix("/")
        val claimed = org.apache.spark.sql.GraftSqlBridge
          .tableLocations(spark).exists { u =>
            val p = new org.apache.hadoop.fs.Path(u)
            val q = fs.makeQualified(p).toUri.getPath.stripSuffix("/")
            q == target || q.startsWith(target + "/")
          }
        if (claimed)
          System.err.println(
            s"[graft] NOT clearing $loc: a catalog table claims that " +
              s"location; `$table` will fail to save until it moves")
        else {
          System.err.println(s"[graft] clearing orphaned location $loc " +
            s"before recreating managed table `$table`")
          fs.delete(loc, true)
        }
      }
    }
  }
}
