package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Power-user skew probe for the per-user event-join family
  * (round-14 verdict ask #2): attributionCredits, eventFunnel,
  * timeToConvert, topPaths all join or window per user, so ONE user
  * holding a large slice of the corpus concentrates that user's
  * work in one task. This probe rewrites ~10% of the sf1 events onto
  * a single user id and times each operator base-vs-skew.
  *
  * Round-15 measurements at sf1 (1M events, 15k users; skew = one
  * user holding 100k events), warm JIT:
  *  - attributionCredits, JOIN form (per-user touches×conversions
  *    range join, quadratic in a user's rate — the 10% user alone
  *    contributes ~80M joined rows in one task): 2.33 s base →
  *    5.72 s skew (2.5× and growing with the square of the rate).
  *  - attributionCredits, SWEEP form (the shipped rewrite: running
  *    prefix counts + last_value probes, linear rows): 1.07 s base
  *    → 1.39 s skew (1.3×; 4.1× faster than the join form under
  *    skew).
  *  - eventFunnel 0.36→0.21 s, timeToConvert 1.41→0.72 s, topPaths
  *    1.47→0.72 s: all LINEAR per-user shapes (one collect_list
  *    fold / one partition sort); skew concentrates but does not
  *    multiply their work — bounded, measured, no cap needed.
  *
  * `SPARK_GRAFT_SF_DIR=<sf1 dir> sbt "runMain graft.tools.SkewProbe"`
  * prints one line per (operator, variant) with seconds + rows.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.SparkEntry.t(spark, dir, "events")
      .select("event_id", "user_id", "ts_ms", "event_type")
      .localCheckpoint()
    // ~10% of all events land on user -1 (deterministic by event id)
    val skewed = base
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) === 0, lit(-1L))
          .otherwise(col("user_id")))
      .localCheckpoint()

    def time(name: String, variant: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SKEW|$name%-16s|$variant%-5s|$sec%8.2fs|rows=$n")
    }

    val steps = Seq("view", "click", "purchase")
    // warm the attribution codegen/JIT once so base-vs-skew compares
    // steady-state costs, not first-query compilation
    Events.attributionCredits(base, "user_id", "ts_ms", "event_id",
      "event_type", Seq("view", "click"), "purchase",
      windowMs = 259200000L).count()
    for ((variant, df) <- Seq("base" -> base, "skew" -> skewed)) {
      time("attribution", variant)(Events.attributionCredits(
        df, "user_id", "ts_ms", "event_id", "event_type",
        Seq("view", "click"), "purchase", windowMs = 259200000L))
      time("eventFunnel", variant)(Events.eventFunnel(
        df, "user_id", "ts_ms", "event_type", steps))
      time("timeToConvert", variant)(Events.timeToConvert(
        df, "user_id", "ts_ms", "event_type", steps))
      time("topPaths", variant)(Events.topPaths(
        df, "user_id", "ts_ms", "event_type", n = 3, topK = 20))
    }
    spark.stop()
  }
}
