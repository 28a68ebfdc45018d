package graft

import graft.streaming.StreamRollup
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class RollEv(user_id: Long, ts: Timestamp, value: Double)

class StreamRollupSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int) = new Timestamp(minute * 60000L)

  test("streaming tumbling rollup: windows close on watermark, counts/sums match batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RollEv]
    val rolled = StreamRollup.tumbling(
      input.toDF(), "ts", "value", "user_id",
      width = "10 minutes", delay = "5 minutes")
    val query = rolled.writeStream
      .format("memory").queryName("graft_rollup").outputMode("append").start()
    try {
      // window [0,10): two users, three events; window [10,20): one
      input.addData(
        RollEv(1, t(1), 1.5), RollEv(2, t(2), 2.5), RollEv(1, t(9), 3.0),
        RollEv(3, t(11), 4.0))
      query.processAllAvailable()
      // advance the watermark far enough to CLOSE both windows
      input.addData(RollEv(9, t(40), 0.0))
      query.processAllAvailable()
      val out = spark.table("graft_rollup")
        .select($"window_start_ms", $"n_events", $"n_users_approx",
          $"sum_value", $"avg_value")
        .as[(Long, Long, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      assert(out.contains(0L) && out.contains(600000L), out.keySet)
      val w0 = out(0L)
      assert(w0._2 == 3L, "n_events in [0,10)")
      assert(w0._3 == 2L, "two distinct users (HLL exact at this cardinality)")
      assert(w0._4 == 7.0 && w0._5 == 2.3333, (w0._4, w0._5))
      val w1 = out(600000L)
      assert(w1._2 == 1L && w1._4 == 4.0)

      // batch twin agreement on the closed shape (exact n_users there)
      val batch = graft.operators.Events.tumblingRollup(
        Seq((1L, 60000L, 1.5), (2L, 120000L, 2.5), (1L, 540000L, 3.0),
          (3L, 660000L, 4.0)).toDF("user_id", "ts_ms", "value"),
        "ts_ms", "value", "user_id", widthMs = 600000L)
        .select($"window_start_ms", $"n_events", $"sum_value")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
      assert(batch(0L)._2 == w0._2 && batch(0L)._3 == w0._4)
      assert(batch(600000L)._2 == w1._2 && batch(600000L)._3 == w1._4)
    } finally query.stop()
  }

  test("streaming hopping rollup: each event lands in width/slide covering windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RollEv]
    val rolled = StreamRollup.hopping(
      input.toDF(), "ts", "value", "user_id",
      width = "10 minutes", slide = "5 minutes", delay = "5 minutes")
    val query = rolled.writeStream
      .format("memory").queryName("graft_hopping").outputMode("append").start()
    try {
      input.addData(RollEv(1, t(7), 2.0)) // covered by starts at 0 and 5
      input.addData(RollEv(9, t(40), 0.0)) // close them
      query.processAllAvailable()
      val starts = spark.table("graft_hopping")
        .where($"n_events" === 1 && $"sum_value" === 2.0)
        .select($"window_start_ms").as[Long].collect().toSet
      assert(starts == Set(0L, 300000L), starts)
    } finally query.stop()
  }
}
