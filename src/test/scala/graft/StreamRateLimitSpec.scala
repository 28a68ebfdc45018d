package graft

import graft.streaming.StreamRateLimit
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class RateEv(k: String, ts_ms: Long)

class StreamRateLimitSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[RateEv]], maxEvents: Int, windowMs: Long) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RateEv]
    val out = StreamRateLimit.decisions(input.toDF(), "k", "ts_ms",
      maxEvents, windowMs)
    val name = s"graft_rate_${System.nanoTime()}"
    val query = out.writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      spark.table(name).as[(String, Long, Int, Boolean)].collect().toSeq
    } finally query.stop()
  }

  test("burst over the limit is flagged from the exact threshold event") {
    val out = run(Seq(Seq(RateEv("u", 0L), RateEv("u", 10L), RateEv("u", 20L),
      RateEv("u", 2000L))), maxEvents = 2, windowMs = 100L)
      .filter(_._1 == "u").sortBy(_._2)
    assert(out.map(r => (r._3, r._4)) ==
      Seq((1, false), (2, false), (3, true), (1, false)))
  }

  test("state persists across triggers and purges outside the window") {
    val out = run(Seq(
      Seq(RateEv("u", 0L), RateEv("u", 10L)),
      Seq(RateEv("u", 20L)),          // 3rd in-window event, prior state
      Seq(RateEv("u", 500L))),        // window slid past everything
      maxEvents = 2, windowMs = 100L)
      .sortBy(_._2)
    assert(out.map(r => (r._2, r._4)) ==
      Seq((0L, false), (10L, false), (20L, true), (500L, false)))
  }

  test("keys are independent and occupancy saturates at maxEvents + 1") {
    val out = run(Seq(Seq(
      RateEv("a", 1L), RateEv("a", 2L), RateEv("a", 3L), RateEv("a", 4L),
      RateEv("b", 1L))), maxEvents = 1, windowMs = 100L)
    val a = out.filter(_._1 == "a").sortBy(_._2)
    // every event after the first violates; occupancy never exceeds 2
    assert(a.map(_._4) == Seq(false, true, true, true))
    assert(a.map(_._3).max == 2)
    assert(out.filter(_._1 == "b").forall(!_._4))
  }

  test("late arrival cannot evict a newer timestamp from state") {
    // maxEvents=1, window=100: t=200 arrives, then LATE t=150, then
    // t=260 — 200 is inside (160, 260], so 260 must be flagged; an
    // unsorted state trim would have evicted 200 in favour of 150.
    // 150 itself is NOT flagged: 200 is in its future, outside its
    // own trailing window (50, 150].
    val out = run(Seq(
      Seq(RateEv("u", 200L)),
      Seq(RateEv("u", 150L)),
      Seq(RateEv("u", 260L))),
      maxEvents = 1, windowMs = 100L)
      .sortBy(_._2)
    assert(out.map(r => (r._2, r._4)) ==
      Seq((150L, false), (200L, false), (260L, true)))
  }

  test("a late event is decided by its own trailing window, never its future") {
    // maxEvents=2, window=100: 200 and 250 arrive, then LATE 60 —
    // both state timestamps are in 60's future, so its window
    // (-40, 60] holds only itself: occupancy 1, no violation.
    val out = run(Seq(
      Seq(RateEv("u", 200L), RateEv("u", 250L)),
      Seq(RateEv("u", 60L))),
      maxEvents = 2, windowMs = 100L).sortBy(_._2)
    assert(out.map(r => (r._2, r._3, r._4)) ==
      Seq((60L, 1, false), (200L, 1, false), (250L, 2, false)))
  }

  test("validation rejects degenerate parameters") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RateEv]
    intercept[IllegalArgumentException] {
      StreamRateLimit.decisions(input.toDF(), "k", "ts_ms", 0, 100L)
    }
    intercept[IllegalArgumentException] {
      StreamRateLimit.decisions(input.toDF(), "k", "ts_ms", 1, 0L)
    }
  }
}
