package graft

import graft.streaming.StreamUpsert
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

case class SUChange(id: Long, v: String, version: Long, op: String)

class StreamUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(table: String): Map[Long, String] = {
    // a reader crossing a snapshot swap must re-list the table's
    // files (standard file-table semantics; the stream's refresh
    // covers its own cloned session, not this one)
    spark.catalog.refreshTable(table)
    spark.table(table).as[(Long, String)].collect().toMap
  }

  test("applyToTable: change batches fold into the managed snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SUChange]
    val ckpt = Files.createTempDirectory("graft_su_ckpt").toString
    val table = "graft_stream_upsert_t1"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val query = StreamUpsert
      .applyToTable(input.toDF(), table, "id", "version", "op", ckpt,
        trigger = Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // batch 1: first build from inserts
      input.addData(SUChange(1, "a", 1, "upsert"), SUChange(2, "b", 1, "upsert"))
      query.processAllAvailable()
      assert(snapshot(table) == Map(1L -> "a", 2L -> "b"))
      // batch 2: update 1, delete 2, insert 3; latest-wins inside the batch
      input.addData(
        SUChange(1, "a2", 2, "upsert"), SUChange(2, "b", 2, "delete"),
        SUChange(3, "c", 1, "upsert"), SUChange(3, "c2", 2, "upsert"))
      query.processAllAvailable()
      assert(snapshot(table) == Map(1L -> "a2", 3L -> "c2"))
    } finally {
      query.stop()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("processBatch: replaying the same batch is idempotent") {
    val table = "graft_stream_upsert_t2"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val b1 = Seq(SUChange(1, "x", 1, "upsert"), SUChange(2, "y", 1, "upsert")).toDF()
      StreamUpsert.processBatch(b1, table, "id", "version", "op")
      val b2 = Seq(SUChange(1, "x2", 2, "upsert"), SUChange(2, "y", 2, "delete")).toDF()
      StreamUpsert.processBatch(b2, table, "id", "version", "op")
      val after = snapshot(table)
      assert(after == Map(1L -> "x2"))
      // checkpoint-recovery shape: the LAST batch re-applies
      StreamUpsert.processBatch(b2, table, "id", "version", "op")
      assert(snapshot(table) == after)
      // empty replay batch is a no-op, not a table wipe
      StreamUpsert.processBatch(b2.limit(0), table, "id", "version", "op")
      assert(snapshot(table) == after)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
