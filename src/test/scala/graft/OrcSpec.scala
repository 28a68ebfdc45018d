package graft

import graft.sources.Orc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class OrcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_orc").toString + "/t"

  test("writeOrc/readOrc: values round-trip incl. nulls, newlines, unicode") {
    val df = Seq(
      (1L, Some("line1\nline2"), Some("en")),
      (2L, Some("quote\" comma, pipe|"), None),
      (3L, None, Some("fa — فارسی")),
      (4L, Some(""), Some(""))).toDF("id", "text", "lang")
    val p = tmp()
    Orc.writeOrc(df, p)
    val back = Orc.readOrc(spark, p, df.schema)
      .as[(Long, Option[String], Option[String])].collect().toSet
    assert(back == df.as[(Long, Option[String], Option[String])].collect().toSet)
  }

  test("readOrc: explicit schema prunes extras and nulls missing columns") {
    val p = tmp()
    Orc.writeOrc(Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "extra"), p)
    val narrow = Orc.readOrc(spark, p, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("added_later", StringType))))
    assert(narrow.columns.toSeq == Seq("id", "v", "added_later"))
    assert(narrow.where(col("added_later").isNull).count() == 2)
  }

  test("readOrc: filters push into the ORC scan") {
    val p = tmp()
    Orc.writeOrc((1L to 1000L).map(i => (i, s"t$i")).toDF("id", "v"), p)
    val q = Orc.readOrc(spark, p, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
      .where(col("id") > 900)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,900)"),
      s"no pushdown in:\n$plan")
    assert(q.count() == 100)
  }
}
