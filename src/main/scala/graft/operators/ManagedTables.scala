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
private[operators] object ManagedTables {
  def dropAndClearOrphan(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (!table.contains(".") && spark.catalog.currentDatabase == "default" &&
        !spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }
}
