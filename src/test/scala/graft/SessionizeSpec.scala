package graft

import graft.streaming.Sessionize
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(user: String, ts: Timestamp, v: Double)

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int) = new Timestamp(minute * 60000L)

  test("sessionAgg (batch): events split into gap-separated sessions") {
    val df = Seq(
      Ev("u1", t(0), 1.0), Ev("u1", t(10), 2.0), // session 1
      Ev("u1", t(120), 3.0), // > 30 min gap → session 2
      Ev("u2", t(5), 4.0))
      .toDF()
    val out = Sessionize
      .sessionAgg(df, "user", "ts", gap = "30 minutes", valueCol = Some("v"))
      .orderBy($"user", $"session_start")
      .select($"user", $"n_events", $"value_sum")
      .as[(String, Long, Double)]
      .collect()
      .toSeq
    assert(out == Seq(("u1", 2L, 3.0), ("u1", 1L, 3.0), ("u2", 1L, 4.0)))
  }

  test("StreamDedup: duplicates within watermark dropped, state key is the content hash") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val deduped = graft.streaming.StreamDedup.byContentHash(
      input.toDF(), Seq("user", "v"), "ts", watermark = "10 minutes")
    val query = deduped.writeStream
      .format("memory")
      .queryName("graft_dedup")
      .outputMode("append")
      .start()
    try {
      input.addData(Ev("u1", t(0), 1.0), Ev("u1", t(1), 1.0), Ev("u1", t(2), 2.0))
      query.processAllAvailable()
      val out = spark.table("graft_dedup").select($"user", $"v")
        .as[(String, Double)].collect().toSeq
      assert(out.sorted == Seq(("u1", 1.0), ("u1", 2.0)))
    } finally query.stop()
  }

  test("streamingSessionAgg: MemoryStream sessions emitted after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = Sessionize.streamingSessionAgg(
      input.toDF(), "user", "ts", gap = "30 minutes", watermark = "10 minutes")
    val query = sessions.writeStream
      .format("memory")
      .queryName("graft_sessions")
      .outputMode("append")
      .start()
    try {
      input.addData(Ev("u1", t(0), 1.0), Ev("u1", t(10), 2.0))
      query.processAllAvailable()
      // advance event time far past watermark so the session closes
      input.addData(Ev("u1", t(600), 9.0))
      query.processAllAvailable()
      input.addData(Ev("u1", t(1200), 9.0))
      query.processAllAvailable()
      val out = spark.table("graft_sessions")
        .select($"user", $"n_events")
        .as[(String, Long)]
        .collect()
        .toSeq
      assert(out.contains(("u1", 2L))) // the first closed session
    } finally query.stop()
  }
}
