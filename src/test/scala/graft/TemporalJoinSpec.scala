package graft

import graft.operators.TemporalJoin
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq( // (key, ts, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0))
    .toDF("sym", "qts", "px")

  private val trades = Seq( // (key, ts, qty)
    ("A", 5L, 100L), // before any quote → null
    ("A", 20L, 200L), // equal ts → inclusive match at 20
    ("A", 25L, 300L), // between 20 and 30 → 20
    ("A", 99L, 400L), // after all → 30
    ("C", 50L, 500L)) // key with no quotes → null
    .toDF("sym", "tts", "qty")

  test("asOf: latest right row at or before each left timestamp") {
    val out = TemporalJoin
      .asOf(trades, quotes, "tts", "qts", Seq("sym"), Seq("px"), prefix = "q_")
      .select($"qty", $"q_ts", $"q_px")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    assert(out(100L).isEmpty)
    assert(out(200L).contains((20L, 2.0)))
    assert(out(300L).contains((20L, 2.0)))
    assert(out(400L).contains((30L, 3.0)))
    assert(out(500L).isEmpty)
  }

  test("asOf: tolerance gates stale matches") {
    val out = TemporalJoin
      .asOf(trades, quotes, "tts", "qts", Seq("sym"), Seq("px"),
        toleranceMs = 10L, prefix = "q_")
      .select($"qty", $"q_px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(300L).contains(2.0)) // gap 5 ≤ 10
    assert(out(400L).isEmpty) // gap 69 > 10
  }

  test("rangeJoin: matches a naive between-join across bucket widths") {
    val points = (0L until 200L by 7L).map(tt => ("k", tt)).toDF("k", "pt")
    val ivals = Seq(("k", 10L, 40L), ("k", 35L, 60L), ("k", 150L, 150L))
      .toDF("k", "s", "e")
    val naive = points.join(ivals, Seq("k"))
      .where($"pt".between($"s", $"e"))
      .select($"pt", $"s").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(1L, 13L, 64L, 1000L)) {
      val got = TemporalJoin.rangeJoin(points, ivals, "pt", "s", "e", Seq("k"), w)
        .select($"pt", $"s").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"bucketWidth=$w")
    }
  }
}
