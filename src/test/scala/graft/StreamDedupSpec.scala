package graft

import graft.streaming.StreamDedup
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

case class SDDoc(doc_id: Long, text: String)

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("incrementalToParquet: unbounded-lookback near-dedup, history grows per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SDDoc]
    val out = Files.createTempDirectory("graft_inc_out").toString
    val ckpt = Files.createTempDirectory("graft_inc_ckpt").toString
    val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val tB = "completely different content about astronomy and the moons of jupiter"
    val tC = "a third new document about cooking pasta with garlic and olive oil"
    val tD = "sailing across the southern ocean alone takes considerable preparation"
    val query = StreamDedup
      .incrementalToParquet(input.toDF(), "text", "doc_id", out,
        "graft_stream_sigs", ckpt,
        trigger = Trigger.ProcessingTime("100 milliseconds"),
        bootstrapNumBuckets = 4)
      .start()
    try {
      // batch 1 bootstraps: both docs accepted, signature table created
      input.addData(SDDoc(1, tA), SDDoc(2, tB))
      query.processAllAvailable()
      assert(spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
        == Set(1L, 2L))
      assert(spark.catalog.tableExists("graft_stream_sigs"))
      // batch 2: 101 duplicates history doc 1 (dropped); 102/103 are
      // batch-internal exact dups (102 kept); 102 is novel vs history
      input.addData(SDDoc(101, tA), SDDoc(102, tC), SDDoc(103, tC))
      query.processAllAvailable()
      assert(spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
        == Set(1L, 2L, 102L))
      // batch 3: 201 duplicates BATCH-2's survivor (caught only
      // because signatures grew); 202 is novel
      input.addData(SDDoc(201, tC), SDDoc(202, tD))
      query.processAllAvailable()
      assert(spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
        == Set(1L, 2L, 102L, 202L))
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS graft_stream_sigs")
    }
  }
}
