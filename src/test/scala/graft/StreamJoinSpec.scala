package graft

import graft.streaming.StreamJoin
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Impression(user_id: Long, imp_ts: Timestamp, ad: String)
case class Click(user_id: Long, click_ts: Timestamp, target: String)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int) = new Timestamp(minute * 60000L)

  test("intervalJoin inner: clicks attach to every impression within the window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoin.intervalJoin(
      imps.toDF(), clicks.toDF(), "user_id", "imp_ts", "click_ts",
      maxDelay = "10 minutes", watermarkDelay = "5 minutes")
    val query = joined.writeStream
      .format("memory").queryName("graft_attr").outputMode("append").start()
    try {
      // user 1: two impressions (t1, t5), click at t8 — inside BOTH
      // windows (interval semantics: two output rows). Click at t20
      // is > 10 min after both — no row. User 2: click BEFORE the
      // impression — never joins.
      imps.addData(
        Impression(1, t(1), "a"), Impression(1, t(5), "b"),
        Impression(2, t(9), "c"))
      clicks.addData(
        Click(1, t(8), "x"), Click(1, t(20), "y"), Click(2, t(7), "z"))
      query.processAllAvailable()
      val out = spark.table("graft_attr")
        .select($"user_id", $"ad", $"target")
        .as[(Long, String, String)].collect().toSet
      assert(out == Set((1L, "a", "x"), (1L, "b", "x")))
    } finally query.stop()
  }

  test("intervalJoin leftOuter: unmatched impressions emit null clicks on watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoin.intervalJoin(
      imps.toDF(), clicks.toDF(), "user_id", "imp_ts", "click_ts",
      maxDelay = "10 minutes", watermarkDelay = "5 minutes",
      joinType = "leftOuter")
    val query = joined.writeStream
      .format("memory").queryName("graft_attr_outer").outputMode("append").start()
    try {
      imps.addData(Impression(1, t(1), "a"), Impression(2, t(2), "b"))
      clicks.addData(Click(1, t(4), "x"))
      query.processAllAvailable()
      // advance BOTH watermarks far past imp+maxDelay so the
      // unmatched impression (user 2) can be proven matchless
      imps.addData(Impression(9, t(60), "w"))
      clicks.addData(Click(9, t(61), "w"))
      query.processAllAvailable()
      val out = spark.table("graft_attr_outer")
        .select($"user_id", $"ad", $"target")
        .as[(Long, String, Option[String])].collect().toSet
      assert(out.contains((1L, "a", Some("x"))), out)
      assert(out.contains((2L, "b", None)), s"unmatched impression must emit: $out")
    } finally query.stop()
  }

  test("intervalJoin: validates join type and clashing columns") {
    val l = Seq((1L, t(1), "a")).toDF("user_id", "imp_ts", "ad")
    val r = Seq((1L, t(2), "x")).toDF("user_id", "click_ts", "target")
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(l, r, "user_id", "imp_ts", "click_ts",
        "10 minutes", "5 minutes", joinType = "full")
    }
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(l, l.withColumnRenamed("imp_ts", "click_ts"),
        "user_id", "imp_ts", "click_ts", "10 minutes", "5 minutes")
    }
  }

  test("intervalJoin: state plateaus under watermark eviction (bounded by rate x window)") {
    // The scale claim in the Scaladoc — "state is bounded by the
    // event rate × the window regardless of stream length" — measured
    // with the state-store metrics instead of asserted by narrative:
    // 12 equal-rate batches, each 30 event-minutes later (twice the
    // 15-minute maxDelay+watermark keep window), so eviction must hold
    // numRowsTotal flat while cumulative input grows 12×.
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoin.intervalJoin(
      imps.toDF(), clicks.toDF(), "user_id", "imp_ts", "click_ts",
      maxDelay = "10 minutes", watermarkDelay = "5 minutes")
    val query = joined.writeStream
      .format("memory").queryName("graft_attr_state").outputMode("append").start()
    try {
      val perBatch = 20
      val stateRows = (0 until 12).map { b =>
        val base = b * 30
        imps.addData((0 until perBatch).map(i =>
          Impression(i.toLong, t(base), s"ad$b")): _*)
        clicks.addData((0 until perBatch).map(i =>
          Click(i.toLong, t(base + 1), s"c$b")): _*)
        query.processAllAvailable()
        val p = query.lastProgress
        if (p == null || p.stateOperators.isEmpty) 0L
        else p.stateOperators.map(_.numRowsTotal).sum
      }
      // warm-up aside, the second half must not sit above the first —
      // a leak grows monotonically with batch count
      val firstHalf = stateRows.slice(2, 6).max
      val secondHalf = stateRows.slice(6, 12).max
      assert(secondHalf <= firstHalf * 3 / 2 + 1,
        s"state grew across halves: $stateRows")
      // absolute bound: a few batches of both sides, never the stream
      val fed = 12L * perBatch * 2
      assert(stateRows.last <= fed / 3,
        s"final state ${stateRows.last} not << cumulative input $fed: $stateRows")
    } finally query.stop()
  }

  test("intervalJoin on batch frames: same semantics, usable as the oracle twin") {
    // the operator body is engine-agnostic — running it on batch
    // frames replays the exact interval semantics
    val l = Seq((1L, t(1), "a"), (1L, t(5), "b"), (2L, t(9), "c"))
      .toDF("user_id", "imp_ts", "ad")
    val r = Seq((1L, t(8), "x"), (1L, t(20), "y"), (2L, t(7), "z"))
      .toDF("user_id", "click_ts", "target")
    val out = StreamJoin.intervalJoin(
      l, r, "user_id", "imp_ts", "click_ts", "10 minutes", "5 minutes")
      .select($"user_id", $"ad", $"target")
      .as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "a", "x"), (1L, "b", "x")))
  }
}
