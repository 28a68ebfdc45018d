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

  test("processIncrementalBatch: replayed batch is idempotent — no self-flagging") {
    val out = Files.createTempDirectory("graft_rep_out").toString
    val sig = "graft_stream_sigs_replay"
    val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
    // two WITHIN-batch near-dups (not exact): one token differs, so
    // exact dedup keeps both and only the replay hazard could drop one
    val tC1 = "a third new document about cooking pasta with garlic and olive oil"
    val tC2 = "a third new document about cooking pasta with garlic and olive butter"
    try {
      StreamDedup.processIncrementalBatch(
        Seq(SDDoc(1, tA)).toDF(), 0L, "text", "doc_id", out, sig,
        bootstrapNumBuckets = 4)
      StreamDedup.processIncrementalBatch(
        Seq(SDDoc(101, tC1), SDDoc(102, tC2)).toDF(), 1L, "text", "doc_id",
        out, sig, bootstrapNumBuckets = 4)
      val first = spark.read.parquet(out)
        .select($"doc_id").as[Long].collect().toSet
      assert(first == Set(1L, 101L, 102L)) // within-batch near-dups out of scope
      // REPLAY batch 1 (checkpoint recovery): its own previous write
      // must not act as history — 101/102 would flag each other and
      // the partition would shrink.
      StreamDedup.processIncrementalBatch(
        Seq(SDDoc(101, tC1), SDDoc(102, tC2)).toDF(), 1L, "text", "doc_id",
        out, sig, bootstrapNumBuckets = 4)
      val replayed = spark.read.parquet(out)
        .select($"doc_id").as[Long].collect().toSet
      assert(replayed == Set(1L, 101L, 102L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $sig")
    }
  }
}
