package graft

import org.apache.spark.sql.functions._

/** Schema-drift canary for the driver's `events` testdata.
  *
  * The driver has regenerated `events.ts` with different physical
  * types across rounds (nanos INT64 → naive micros); each change
  * silently broke every events-reading query. This spec reads the
  * REAL parquet at every available SF and asserts `ts_ms` resolves
  * and carries sane epoch-millis values, so the next regeneration
  * fails HERE with a named test instead of redding the board.
  */
class EventsSchemaSpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(s"$d/events.parquet").exists())

  test("events.ts adapter resolves ts_ms at every SF") {
    assert(sfDirs.nonEmpty, "no driver testdata found")
    sfDirs.foreach { dir =>
      val ev = SparkEntry.t(spark, dir, "events")
      val row = ev
        .agg(
          min(col("ts_ms")).as("lo"),
          max(col("ts_ms")).as("hi"),
          count(when(col("ts_ms").isNull, 1)).as("nulls"),
          count(lit(1)).as("n"))
        .head()
      val (lo, hi, nulls, n) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      assert(n > 0, s"$dir: events is empty")
      assert(nulls == 0, s"$dir: ts_ms has $nulls nulls")
      // Epoch-millis sanity window: 2000-01-01 .. 2100-01-01. A unit
      // slip (micros/nanos read as millis) lands far outside it.
      val y2000 = 946684800000L
      val y2100 = 4102444800000L
      assert(lo >= y2000 && hi <= y2100,
        s"$dir: ts_ms range [$lo, $hi] outside plausible epoch-millis window " +
          "— events.ts physical type changed again; extend SparkEntry.t")
    }
  }
}
