package graft

import graft.functions.ColumnFunctions._
import graft.functions.TextFunctions._
import graft.operators.DataFrameOps
import org.apache.spark.sql.functions._

/** The reference package's own docstring examples, replayed verbatim:
  * a kolang user switching to graft gets the documented outputs.
  * (Each case cites the reference docstring it reproduces.)
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  test("percent: column_functions.py:50 example (1..4 → 10/20/30/40)") {
    val out = spark.range(1, 5).toDF("count")
      .withColumn("percent", percent($"count"))
      .select($"count", $"percent").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("median: column_functions.py:84 example (evens → 15, odds → 18)") {
    val df = spark.range(0, 34, 3).toDF("value")
      .withColumn("even", $"value" % 2 === 0)
    val out = df.groupBy($"even")
      .agg(graft.functions.ColumnFunctions.median($"value").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(out == Map(true -> 15.0, false -> 18.0))
  }

  test("str_array_to_array: column_functions.py:111 example incl. empty/null cases") {
    val df = Seq(
      Some("['a', 'b', 'c']"), Some("[]"), Some(""), Some("a"), None)
      .toDF("str_array")
    val out = df.select(strArrayToArray($"str_array")).collect()
    assert(out(0).getSeq[String](0) == Seq("'a'", "'b'", "'c'"))
    assert(out(1).isNullAt(0)) // "[]" → null
    assert(out(2).isNullAt(0)) // ""   → null
    assert(out(3).getSeq[String](0) == Seq("a"))
    assert(out(4).isNullAt(0)) // null → null
  }

  test("number_normalizer: column_functions.py:150 example") {
    val out = Seq("۰۹۱۲۴۱۷۸۷۵۷", "۲۴۱۷۷7656۱۲", "۲۴۱ a سلام ab8").toDF("s")
      .select(numberNormalizer($"s")).as[String].collect().toSeq
    assert(out == Seq("09124178757", "24177765612", "241 a سلام ab8"))
  }

  test("text_cleaner: column_functions.py:234 example") {
    val out = Seq("sjkdf sdk❤️❤️fskd j", "۷7۲ 67 gh^&g    df", "۱a%%!. سلام ab😂😂8()")
      .toDF("s")
      .select(textCleaner($"s")).as[String].collect().toSeq
    assert(out == Seq("sjkdf sdk fskd j", "772 67 gh g df", "1a سلام ab 8 "))
  }

  test("cumulative_sum: column_functions.py:197 example (value=3 over ids 0..4)") {
    val out = spark.range(0, 5).toDF("id").withColumn("value", lit(3))
      .select($"id", cumulativeSum($"value", $"id").as("cs"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 3L, 1L -> 6L, 2L -> 9L, 3L -> 12L, 4L -> 15L))
  }

  test("jalali_date: column_functions.py:379 example (2021-08-12)") {
    val df = Seq("2021-08-12").toDF("d").select(to_date($"d").as("date"))
    val out = df.select(
      jalaliDate($"date").as("s1"),
      jalaliDate($"date", "%Y-%m").as("s2"),
      jalaliDate($"date", "month:%m,day:%d").as("s3"))
      .as[(String, String, String)].head()
    assert(out == (("1400-05-21", "1400-05", "month:05,day:21")))
  }

  test("unpivot: dataframe_functions.py:26 example (pivot round trip, nulls dropped)") {
    val data = Seq(
      ("Banana", 1000, "USA"), ("Beans", 1600, "USA"), ("Orange", 2000, "USA"),
      ("Orange", 2000, "USA"), ("Banana", 400, "China"), ("Beans", 1500, "China"),
      ("Orange", 4000, "China"), ("Banana", 2000, "Canada"), ("Beans", 2000, "Mexico"))
      .toDF("Product", "Amount", "Country")
    val pivoted = data.groupBy("Product").pivot("Country").sum("Amount")
    val out = DataFrameOps
      .unpivot(pivoted, Seq("USA", "China", "Canada", "Mexico"), "Country", "Amount")
      .select($"Product", $"Country", $"Amount")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(
      ("Orange", "USA", 4000L), ("Orange", "China", 4000L),
      ("Beans", "USA", 1600L), ("Beans", "China", 1500L), ("Beans", "Mexico", 2000L),
      ("Banana", "USA", 1000L), ("Banana", "China", 400L), ("Banana", "Canada", 2000L)))
  }

  test("array_contains_column: column_functions.py:545 example") {
    val df = Seq(
      ("xyzz", Seq("xyc", "hello")), ("bye", Seq("kdf", "bye")),
      ("b", Seq("b", "bye")), ("hello", Seq("sd", "sds")))
      .toDF("word", "words")
    val out = df.filter(arrayContainsColumn($"word", $"words"))
      .select($"word").as[String].collect().toSet
    assert(out == Set("bye", "b"))
  }
}
