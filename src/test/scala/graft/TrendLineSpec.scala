package graft

import graft.operators.TrendLine
import org.apache.spark.sql.functions._

class TrendLineSpec extends SparkSpec {
  import spark.implicits._

  test("degree-1 fit recovers an exact linear trend and extends it") {
    // y = 5 + 2x over 10 consecutive days
    val df = (0 until 10)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), 5.0 + 2 * i))
      .toDF("date", "y")
    val out = TrendLine.addTrendLine(df, Seq("y"), "date", predictionDay = 3, degree = 1)
    assert(out.count() == 13) // 10 data days + 3 prediction days
    val rows = out
      .select($"date".cast("string"), $"y", round($"y_trendline", 6).as("t"))
      .collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), r.getDouble(2)))
      .toMap
    // on-data date: exact fit
    assert(rows("2024-01-01")._2 == 5.0)
    assert(rows("2024-01-10")._2 == 23.0)
    // prediction date: extrapolated, original value null
    assert(rows("2024-01-13")._1.isEmpty)
    assert(rows("2024-01-13")._2 == 29.0)
  }

  test("degree-2 fit recovers a quadratic") {
    val df = (0 until 8)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        1.0 + i * i))
      .toDF("date", "y")
    val out = TrendLine.addTrendLine(df, Seq("y"), "date", degree = 2)
    val t = out
      .select($"date".cast("string"), round($"y_trendline", 6).as("t"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(t("2024-01-05") == 17.0) // x=4 → 1+16
  }

  test("null values are excluded from the fit consistently (moments share a row set)") {
    // y observed as 2.0 on 5 dates, null on 5 more: the correct
    // least-squares fit of the observed points is the constant 2.0.
    val df = (0 until 10)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        if (i < 5) Some(2.0) else None))
      .toDF("date", "y")
    val out = TrendLine.addTrendLine(df, Seq("y"), "date")
    val t = out.select(round($"y_trendline", 6)).as[Double].collect().toSet
    assert(t == Set(2.0))
  }

  test("multiple value columns fitted independently") {
    val df = (0 until 5)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        1.0 * i, 10.0 - i))
      .toDF("date", "up", "down")
    val out = TrendLine.addTrendLine(df, Seq("up", "down"), "date")
    assert(out.columns.contains("up_trendline") && out.columns.contains("down_trendline"))
    val r = out.where($"date" === "2024-01-03")
      .select(round($"up_trendline", 6), round($"down_trendline", 6))
      .as[(Double, Double)].head()
    assert(r == ((2.0, 8.0)))
  }
}
