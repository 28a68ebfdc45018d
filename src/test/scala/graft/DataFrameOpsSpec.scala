package graft

import graft.operators.DataFrameOps
import graft.implicits._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DataFrameOpsSpec extends SparkSpec {
  import spark.implicits._

  test("unpivot: wide → long, nulls dropped by default") {
    val df = Seq((1, Some(10.0), None: Option[Double]), (2, Some(20.0), Some(30.0)))
      .toDF("id", "a", "b")
    val out = DataFrameOps.unpivot(df, Seq("a", "b"), "measure", "value")
    assert(out.columns.toSeq == Seq("id", "measure", "value"))
    assert(out.count() == 3) // null b of row 1 dropped
    val kept = DataFrameOps.unpivot(df, Seq("a", "b"), "m", "v", ignoreNull = false)
    assert(kept.count() == 4)
  }

  test("transpose: keys become columns, columns become rows") {
    val df = Seq(("r1", 1, 10), ("r2", 2, 20)).toDF("k", "x", "y")
    val out = DataFrameOps.transpose(df, "k")
    assert(out.columns.toSeq == Seq("index", "r1", "r2"))
    val rows = out.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("x") == ("1", "2"))
    assert(rows("y") == ("10", "20"))
  }

  test("transpose: refuses large inputs") {
    val big = spark.range(100).withColumn("v", $"id" * 2)
    intercept[IllegalArgumentException](DataFrameOps.transpose(big.toDF(), "id", maxRows = 10))
  }

  test("transpose: guard fires before a full collect (bounded fetch)") {
    // 100M rows would OOM the driver if transpose collected before
    // guarding; the limit(maxRows + 1) fetch makes the failure
    // instant. Finishing at all (within the suite timeout) IS the
    // assertion that only maxRows + 1 rows crossed to the driver.
    val huge = spark.range(100000000L).withColumn("v", $"id" * 2)
    val start = System.nanoTime()
    intercept[IllegalArgumentException](DataFrameOps.transpose(huge.toDF(), "id", maxRows = 10))
    assert((System.nanoTime() - start) < 30e9)
  }

  test("unionAll: pads missing columns with typed nulls") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, 3.5)).toDF("id", "score")
    val out = DataFrameOps.unionAll(Seq(a, b))
    assert(out.columns.toSet == Set("id", "name", "score"))
    assert(out.schema("score").dataType == DoubleType)
    assert(out.count() == 2)
  }

  test("safeUnion: casts conflicting column types to string") {
    val a = Seq((1, 100)).toDF("id", "v") // v: int
    val b = Seq((2, "abc")).toDF("id", "v") // v: string
    val out = DataFrameOps.safeUnion(Seq(a, b))
    assert(out.schema("v").dataType == StringType)
    assert(out.select($"v").as[String].collect().toSet == Set("100", "abc"))
  }

  test("localToDf: explicit schema round trip") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType)))
    val out = DataFrameOps.localToDf(spark, Seq(Row(1, "a"), Row(2, null)), schema)
    assert(out.count() == 2)
    assert(out.schema == schema)
  }

  test("localToDf: inferred schema follows the reference type table") {
    // the reference equivalent_type mapping: string/int/long/double/
    // float/bool/timestamp, catch-all → string
    val ts = java.sql.Timestamp.valueOf("2024-02-29 12:34:56")
    val rows = Seq(
      Row("a", 1, 2L, 3.5, 4.5f, true, ts, null),
      Row(null, 7, 8L, 9.5, 0.5f, false, ts, null))
    val out = DataFrameOps.localToDf(spark, rows,
      Seq("s", "i", "l", "d", "f", "b", "t", "allnull"))
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("s") == StringType)
    assert(types("i") == IntegerType)
    assert(types("l") == LongType)
    assert(types("d") == DoubleType)
    assert(types("f") == FloatType)
    assert(types("b") == BooleanType)
    assert(types("t") == TimestampType)
    assert(types("allnull") == StringType) // reference catch-all
    assert(out.schema.fields.forall(_.nullable))
    assert(out.count() == 2)
    // first-non-null wins: a leading null doesn't force the fallback
    val out2 = DataFrameOps.localToDf(spark,
      Seq(Row(null), Row(42)), Seq("x"))
    assert(out2.schema("x").dataType == IntegerType)
    // unrecognized runtime class → stringified, not a crash
    val out3 = DataFrameOps.localToDf(spark,
      Seq(Row(new java.net.URI("http://h/p"))), Seq("u"))
    assert(out3.schema("u").dataType == StringType)
    assert(out3.select($"u").as[String].head() == "http://h/p")
  }

  test("isNullOrIn: implicit column extension") {
    val df = Seq(Some("a"), Some("b"), None).toDF("v")
    val out = df.where($"v".isNullOrIn("a")).count()
    assert(out == 2) // "a" and null
  }
}
