package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming CDC apply — the continuous twin of
  * [[graft.operators.Versioning.applyChanges]]: a change stream
  * (base-shaped payload + version + op) folds into a managed parquet
  * snapshot table, one MERGE per micro-batch.
  *
  * Each batch rewrites the table through the shared sibling-rewrite
  * crash contract ([[graft.operators.ManagedTables.rewriteTable]]):
  * a crash mid-batch leaves the untouched previous snapshot or the
  * complete new one, never half a table. Replay safety comes from
  * applyChanges itself being IDEMPOTENT — re-applying a batch to the
  * already-updated base rewrites the same payloads and re-deletes
  * absent keys, reproducing the identical snapshot — so foreachBatch
  * re-invocation after checkpoint recovery converges without a
  * batch-id ledger. Stream state is ZERO (no watermark, no
  * aggregation buffers): the table itself is the state.
  */
object StreamUpsert {

  /** Continuous upsert/delete apply of `changes` into `table`.
    *
    * Readers in OTHER sessions (or the launching session) that hold
    * a cached relation across a batch swap must
    * `spark.catalog.refreshTable(table)` before re-reading — the
    * swap replaces every data file (standard snapshot-table
    * semantics; the stream refreshes only its own cloned session).
    */
  def applyToTable(
      changes: DataFrame,
      table: String,
      idCol: String,
      versionCol: String,
      opCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 minute")): DataStreamWriter[Row] =
    changes.writeStream
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        processBatch(b.toDF(), table, idCol, versionCol, opCol)
      }
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)

  /** One micro-batch MERGE — public so replay (same batch re-applied
    * after recovery) is directly testable.
    */
  def processBatch(
      b: DataFrame,
      table: String,
      idCol: String,
      versionCol: String,
      opCol: String): Unit = {
    if (b.isEmpty) return
    val spark = b.sparkSession
    val base =
      if (spark.catalog.tableExists(table)) {
        // drop any file-listing cache left from the previous swap —
        // the rename replaces every data file under the table path
        spark.catalog.refreshTable(table)
        spark.table(table)
      } else b.drop(versionCol, opCol).limit(0)
    val next = graft.operators.Versioning.applyChanges(
      base, b, idCol, versionCol, opCol)
    // rewriteTable evaluates `next` while the original table still
    // exists (the contract's compaction shape) and swaps atomically.
    graft.operators.ManagedTables.rewriteTable(spark, table, next)
    // the swap replaced every data file: invalidate this session's
    // cached relation so concurrent readers re-list, instead of
    // failing on the vanished previous-generation files
    spark.catalog.refreshTable(table)
  }
}
