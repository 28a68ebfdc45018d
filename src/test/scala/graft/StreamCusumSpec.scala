package graft

import graft.streaming.StreamCusum
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class CusumEv(k: String, ts_ms: Long, v: Double)

class StreamCusumSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      batches: Seq[Seq[CusumEv]],
      target: Double, slack: Double, h: Double) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CusumEv]
    val out = StreamCusum.alarms(input.toDF(), "k", "ts_ms", "v",
      target, slack, h)
    val name = s"graft_cusum_${System.nanoTime()}"
    val query = out.writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      spark.table(name)
        .as[(String, Long, Double, Double, Double, Boolean)]
        .collect().toSeq
    } finally query.stop()
  }

  test("levels and alarms match the oracle-checked batch twin on in-order data") {
    // the batch spec's hand case: [60, 30, 58], target 50 slack 5 h 10
    val out = run(Seq(Seq(
      CusumEv("u", 1L, 60.0), CusumEv("u", 2L, 30.0), CusumEv("u", 3L, 58.0))),
      target = 50.0, slack = 5.0, h = 10.0).sortBy(_._2)
    assert(out.map(r => (r._2, r._4, r._5, r._6)) == Seq(
      (1L, 5.0, 0.0, false),
      (2L, 0.0, 15.0, true),
      (3L, 3.0, 2.0, false)))
    // and against the batch operator itself, value for value
    val batch = graft.operators.Events.cusum(
      Seq((1L, 60.0), (2L, 30.0), (3L, 58.0)).toDF("t", "v")
        .selectExpr("'u' as k", "t", "v"),
      "k", Seq("t"), "v", 50.0, 5.0, 10.0)
      .select("t", "cusum_hi", "cusum_lo", "alarm")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(r => (r._2, r._4, r._5, r._6)) == batch)
  }

  test("level persists across triggers - CUSUM memory is the point") {
    // three quiet-ish batches each +7 over target+slack: the level
    // accumulates 7, 14, 21 and crosses h=20 only on the third
    val out = run(Seq(
      Seq(CusumEv("u", 1L, 62.0)),
      Seq(CusumEv("u", 2L, 62.0)),
      Seq(CusumEv("u", 3L, 62.0))),
      target = 50.0, slack = 5.0, h = 20.0).sortBy(_._2)
    assert(out.map(r => (r._4, r._6)) ==
      Seq((7.0, false), (14.0, false), (21.0, true)))
  }

  test("keys are independent; degenerate params rejected") {
    val out = run(Seq(Seq(CusumEv("a", 1L, 200.0), CusumEv("b", 1L, 50.0))),
      50.0, 5.0, 10.0)
    assert(out.filter(_._1 == "a").head._6)
    assert(!out.filter(_._1 == "b").head._6)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CusumEv]
    intercept[IllegalArgumentException] {
      StreamCusum.alarms(input.toDF(), "k", "ts_ms", "v", 0.0, -1.0, 10.0)
    }
  }
}
