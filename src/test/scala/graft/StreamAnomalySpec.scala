package graft

import graft.streaming.StreamAnomaly
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class AnomEv(k: Long, ts: Timestamp, value: Double)

class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000L
  private def t(d: Int, msInDay: Long = 1) = new Timestamp(d * day + msInDay)

  test("streaming anomalies: warmup silent, spike flagged against trailing closed buckets") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AnomEv]
    val scored = StreamAnomaly.anomalies(
      input.toDF(), "ts", "k", "value",
      width = "1 day", delay = "1 day", trailing = 3, z = 3.0)
    val query = scored.writeStream
      .format("memory").queryName("graft_anom").outputMode("append").start()
    try {
      // noisy-but-flat history: 3 warmup days, then a spike day, with
      // two events on day 0 exercising the in-bucket sum
      input.addData(
        AnomEv(1, t(0), 4.0), AnomEv(1, t(0, 2000), 6.0), // day 0 -> 10
        AnomEv(1, t(1), 11.0), AnomEv(1, t(2), 12.0),
        AnomEv(1, t(3), 500.0),
        AnomEv(1, t(4), 11.0))
      query.processAllAvailable()
      // push the watermark far ahead so every bucket closes
      input.addData(AnomEv(9, t(30), 0.0))
      query.processAllAvailable()
      val out = spark.table("graft_anom").as[
        (String, Long, Double, Option[Double], Boolean)].collect()
        .filter(_._1 == "1").sortBy(_._2)
      assert(out.map(_._3).toSeq == Seq(10.0, 11.0, 12.0, 500.0, 11.0))
      // first 3 buckets are warmup: no score
      assert(out.take(3).forall(r => r._4.isEmpty && !r._5))
      // the spike is judged against {10, 11, 12}: mean 11, sd ~0.816
      val spike = out(3)
      assert(spike._4.isDefined && spike._5, s"spike row $spike")
      // the day after is judged against {11, 12, 500} - not anomalous
      assert(!out(4)._5)
    } finally query.stop()
  }

  test("streaming anomalies: state holds only `trailing` buckets per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AnomEv]
    val scored = StreamAnomaly.anomalies(
      input.toDF(), "ts", "k", "value",
      width = "1 day", delay = "0 seconds", trailing = 2, z = 2.0)
    val query = scored.writeStream
      .format("memory").queryName("graft_anom2").outputMode("append").start()
    try {
      // feed day by day so each micro-batch closes exactly one bucket
      for (d <- 0 until 6)
        input.addData(AnomEv(1, t(d), if (d == 4) 99.0 else 5.0 + d))
      input.addData(AnomEv(9, t(30), 0.0))
      query.processAllAvailable()
      val out = spark.table("graft_anom2").as[
        (String, Long, Double, Option[Double], Boolean)].collect()
        .filter(_._1 == "1").sortBy(_._2)
      assert(out.length == 6)
      // bucket 4 (99.0) scored against {7, 8}: flagged
      assert(out(4)._5, out.mkString(","))
      // bucket 5 scored against {8, 99}: wide sd, not flagged
      assert(!out(5)._5)
      intercept[IllegalArgumentException] {
        StreamAnomaly.anomalies(input.toDF(), "ts", "k", "value",
          "1 day", "1 day", trailing = 1)
      }
    } finally query.stop()
  }
}
