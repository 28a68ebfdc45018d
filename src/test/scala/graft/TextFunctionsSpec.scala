package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("numberNormalizer: Arabic and Persian digits → ASCII") {
    val df = Seq("٠١٢ ۳۴۵ 67").toDF("s")
    val out = df.select(numberNormalizer($"s").as("n")).as[String].head()
    assert(out == "012 345 67")
  }

  test("textCleaner: strips emoji, normalizes Arabic letter variants, collapses spaces") {
    val df = Seq("hello ❤❤  world يك").toDF("s")
    val out = df.select(textCleaner($"s").as("c")).as[String].head()
    assert(out == "hello world یک")
  }

  test("textCleaner: accept-list keeps extra characters") {
    val df = Seq("a.b,c").toDF("s")
    val out = df.select(textCleaner($"s", accept = "\\.").as("c")).as[String].head()
    assert(out == "a.b c")
  }

  test("persianNumber: formats then maps digits") {
    val df = Seq(123L).toDF("v")
    val out = df.select(persianNumber($"v").as("p")).as[String].head()
    assert(out == "۱۲۳")
  }

  test("jalaliDate: known Gregorian↔Jalali anchors") {
    val df = Seq("2024-03-20", "2000-01-01", "2023-09-23").toDF("d")
      .select(to_date($"d").as("d"))
    val out = df.select($"d".cast("string"), jalaliDate($"d").as("j"))
      .as[(String, String)].collect().toMap
    assert(out("2024-03-20") == "1403-01-01") // Nowruz 1403
    assert(out("2000-01-01") == "1378-10-11")
    assert(out("2023-09-23") == "1402-07-01") // first of Mehr
  }

  test("jalaliToGregorian: inverse anchors and five-century round trip") {
    val anchors = Seq("1403-01-01" -> "2024-03-20", "1378-10-11" -> "2000-01-01",
      "1402-07-01" -> "2023-09-23")
    val back = anchors.map(_._1).toDF("j")
      .select($"j", jalaliToGregorian($"j").cast("string").as("g"))
      .as[(String, String)].collect().toMap
    anchors.foreach { case (j, g) => assert(back(j) == g, j) }
    // Round trip: every day 1800-01-01 .. 2299-12-31 survives
    // gregorian → jalali string → gregorian.
    val days = spark.range(0, 182621).select(
      date_add(to_date(lit("1800-01-01")), $"id".cast("int")).as("d"))
    val bad = days
      .withColumn("rt", jalaliToGregorian(jalaliDate($"d")))
      .where($"rt" =!= $"d" || $"rt".isNull)
      .count()
    assert(bad == 0)
  }

  test("jalaliDate: format tokens (names, persian digits, literals)") {
    val df = Seq("2024-03-20").toDF("d").select(to_date($"d").as("d"))
    val named = df.select(jalaliDate($"d", "%d %B %Y").as("j")).as[String].head()
    assert(named == "01 فروردین 1403")
    val fa = df.select(jalaliDate($"d", "%fY/%fm/%fd").as("j")).as[String].head()
    assert(fa == "۱۴۰۳/۰۱/۰۱")
    val season = df.select(jalaliDate($"d", "%C").as("j")).as[String].head()
    assert(season == "بهار")
  }
}
