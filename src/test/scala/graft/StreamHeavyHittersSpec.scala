package graft

import graft.streaming.StreamHeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def latest(table: String): Map[String, Long] = {
    val rows = spark.table(table)
      .as[(Int, Long, String, Long)].collect()
    val maxGen = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter(r => r._2 == maxGen(r._1)).map(r => r._3 -> r._4).toMap
  }

  test("continuous MG: the guaranteed heavy hitter survives across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamHeavyHitters.heavyHittersContinuous(
      input.toDF(), "value", k = 4, shards = 2)
    val query = out.writeStream
      .format("memory").queryName("graft_mg").outputMode("update").start()
    try {
      // trigger 1: 'hot' dominates amid noise
      input.addData(Seq.fill(50)("hot") ++ (1 to 30).map(i => s"n$i"): _*)
      query.processAllAvailable()
      // trigger 2: more noise, 'hot' keeps flowing — it must STILL be
      // present in its shard's latest report (state persisted)
      input.addData(Seq.fill(30)("hot") ++ (31 to 60).map(i => s"n$i"): _*)
      query.processAllAvailable()
      val cands = latest("graft_mg")
      assert(cands.contains("hot"), s"guaranteed hitter lost: $cands")
      // MG counters are lower bounds, never overestimates
      assert(cands("hot") <= 80L)
      // state bound: each shard holds at most k candidates
      val byShard = spark.table("graft_mg").as[(Int, Long, String, Long)]
        .collect().groupBy(r => (r._1, r._2)).values
      assert(byShard.forall(_.length <= 4))
    } finally query.stop()
  }

  test("continuous MG: a second heavy key in another shard is tracked independently") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamHeavyHitters.heavyHittersContinuous(
      input.toDF(), "value", k = 2, shards = 4)
    val query = out.writeStream
      .format("memory").queryName("graft_mg2").outputMode("update").start()
    try {
      input.addData(
        Seq.fill(40)("alpha") ++ Seq.fill(35)("beta") ++
          (1 to 20).map(i => s"x$i"): _*)
      query.processAllAvailable()
      val cands = latest("graft_mg2")
      assert(cands.contains("alpha") && cands.contains("beta"), cands.toString)
      intercept[IllegalArgumentException] {
        StreamHeavyHitters.heavyHittersContinuous(input.toDF(), "value", k = 0)
      }
    } finally query.stop()
  }
}
