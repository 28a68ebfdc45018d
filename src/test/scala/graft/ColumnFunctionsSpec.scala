package graft

import graft.functions.ColumnFunctions._
import org.apache.spark.sql.functions._

class ColumnFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("percent: share of global and per-partition totals") {
    val df = Seq(("a", 10.0), ("a", 30.0), ("b", 60.0)).toDF("k", "v")
    val global = df.select(percent($"v").as("p")).as[Double].collect().sorted
    assert(global.toSeq == Seq(10.0, 30.0, 60.0))
    val perK = df
      .select($"k", percent($"v", Seq($"k")).as("p"))
      .as[(String, Double)]
      .collect()
      .toMap
    assert(perK("b") == 100.0)
  }

  test("median: interpolated percentile 0.5") {
    val df = Seq(1.0, 2.0, 3.0, 10.0).toDF("v")
    val m = df.agg(graft.functions.ColumnFunctions.median($"v").as("m")).as[Double].head()
    assert(m == 2.5)
  }

  test("strArrayToArray: parses bracketed lists, null on empty") {
    val df = Seq("[a, b, c]", "[]", "[x]").toDF("s")
    val out = df.select(strArrayToArray($"s").as("a")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b", "c"))
    assert(out(1).isNullAt(0))
    assert(out(2).getSeq[String](0) == Seq("x"))
  }

  test("cumulativeSum: ordered running total per partition") {
    val df = Seq(("u1", 1, 10.0), ("u1", 2, 5.0), ("u2", 1, 7.0)).toDF("u", "t", "v")
    val out = df
      .select($"u", $"t", cumulativeSum($"v", $"t", partitionBy = Seq($"u")).as("cs"))
      .as[(String, Int, Double)]
      .collect()
      .map { case (u, t, cs) => (u, t) -> cs }
      .toMap
    assert(out(("u1", 1)) == 10.0 && out(("u1", 2)) == 15.0 && out(("u2", 1)) == 7.0)
  }

  test("cumulativePercent: reaches 100 at the last ordered row") {
    val df = Seq((1, 25.0), (2, 25.0), (3, 50.0)).toDF("k", "v")
    val out = df
      .select($"k", cumulativePercent($"v", $"k").as("cp"))
      .as[(Int, Double)]
      .collect()
      .toMap
    assert(out(1) == 25.0 && out(2) == 50.0 && out(3) == 100.0)
  }

  test("binCol: floors and rounds to scale multiples") {
    val df = Seq(1234.0, 1567.0).toDF("v")
    val floored = df.select(binCol($"v", 1000).as("b")).as[Double].collect().toSeq
    assert(floored == Seq(1000.0, 1000.0))
    val rounded =
      df.select(binCol($"v", 1000, flooring = false).as("b")).as[Double].collect().toSeq
    assert(rounded == Seq(1000.0, 2000.0))
  }

  test("sessionId: new session when gap exceeds threshold, deterministic ids") {
    val min = 60000L
    val df = Seq(
      ("d1", 0L), ("d1", 10 * min), ("d1", 50 * min), // gap 40min > 30min → new session
      ("d2", 0L))
      .toDF("dev", "ts")
    val out = df
      .select($"dev", $"ts", sessionId($"dev", $"ts", 30).as("sid"))
      .as[(String, Long, String)]
      .collect()
      .map { case (d, t, s) => (d, t) -> s }
      .toMap
    assert(out(("d1", 0L)) == "d1#1")
    assert(out(("d1", 10 * min)) == "d1#1")
    assert(out(("d1", 50 * min)) == "d1#2")
    assert(out(("d2", 0L)) == "d2#1")
  }

  test("condCount: counts rows matching the predicate") {
    val df = Seq(1, 5, 10, 15).toDF("v")
    val n = df.agg(condCount($"v" > 6).as("n")).as[Long].head()
    assert(n == 2L)
    val nStr = df.agg(condCount("v > 6").as("n")).as[Long].head()
    assert(nStr == 2L)
  }

  test("sumColumns: row-wise sum") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
    val s = df.select(sumColumns(Seq($"a", $"b", $"c")).as("s")).as[Double].head()
    assert(s == 6.0)
  }

  test("arrayContainsColumn: membership against a column value") {
    val df = Seq(("a", Seq("a", "b")), ("c", Seq("a", "b"))).toDF("v", "arr")
    val out = df.select(arrayContainsColumn($"v", $"arr").as("m")).as[Boolean].collect().toSeq
    assert(out == Seq(true, false))
  }

  test("weightedAverage: sum(v*w)/sum(w) with rounding") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("v", "w")
    val wa = df.agg(weightedAverage($"v", $"w", 2).as("wa")).as[Double].head()
    assert(wa == 17.5)
  }

  test("countDistinctWithNulls: null counts as one extra distinct value") {
    val df = Seq(Some("a"), Some("b"), None, None).toDF("v")
    val n = df.agg(countDistinctWithNulls($"v").as("n")).as[Long].head()
    assert(n == 3L)
  }

  test("cubePercent: percent against the all-non-null leaf total") {
    val df = Seq(("x", "p", 10.0), ("x", "q", 30.0), ("y", "p", 60.0)).toDF("a", "b", "v")
    val cubed = df
      .cube($"a", $"b")
      .agg(sum($"v").as("rev"))
      .select($"a", $"b", cubePercent($"rev", Seq($"a", $"b")).as("pct"))
    val leafTotalRow =
      cubed.where($"a".isNull && $"b".isNull).select($"pct").as[Double].head()
    assert(leafTotalRow == 100.0) // grand total = sum of leaves
    val leaf = cubed.where($"a" === "x" && $"b" === "q").select($"pct").as[Double].head()
    assert(leaf == 30.0)
  }

  test("movingAverage: previous/center/next frames") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("t", "v")
    def ma(mode: String) =
      df.select($"t", movingAverage($"v", $"t", 3, mode, 2).as("m"))
        .as[(Int, Double)]
        .collect()
        .toMap
    assert(ma("previous")(3) == 20.0) // (10+20+30)/3
    assert(ma("center")(2) == 20.0)
    assert(ma("next")(1) == 20.0)
    intercept[IllegalArgumentException](movingAverage($"v", $"t", 3, "sideways"))
  }
}
