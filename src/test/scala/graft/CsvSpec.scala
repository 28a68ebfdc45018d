package graft

import graft.sources.Csv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CsvSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType)))

  test("toCsvLines -> parseCsvLines round trips hostile strings incl. null vs empty") {
    val rows = Seq(
      (1L, Some("plain")),
      (2L, Some("com,ma and \"quote\"")),
      (3L, Some("new\nline tab\t end")),
      (4L, Some("unicode Привет 😀 你好")),
      (5L, Some("")),           // empty string must NOT collapse to null
      (6L, None),               // null must NOT become ""
      (7L, Some("back\\slash")))
    val df = rows.toDF("id", "text")
    val back = Csv.parseCsvLines(Csv.toCsvLines(df), "csv", docSchema)
    assert(back.where(col(Csv.corruptCol).isNotNull).count() == 0)
    val got = back.select($"id", $"text").as[(Long, Option[String])]
      .collect().toSeq.sortBy(_._1)
    assert(got == rows.sortBy(_._1))
    // the documented lossy corner: a payload string EQUAL to the null
    // token reads back as null (parser unquotes before the compare)
    val tok = Seq((8L, Some("\\N"))).toDF("id", "text")
    val tokBack = Csv.parseCsvLines(Csv.toCsvLines(tok), "csv", docSchema)
      .select($"text").collect().head
    assert(tokBack.isNullAt(0))
  }

  test("parseCsvLines: short rows pad null + flag, long/bad rows quarantine") {
    val lines = Seq(
      "1,ok",
      "2",                // short: text pads null AND the line is flagged
      "3,a,EXTRA",        // long: quarantine
      "x,notanumber")     // type mismatch on id: quarantine
      .toDF("csv")
    val out = Csv.parseCsvLines(lines, "csv", docSchema)
      .select($"id", $"text", col(Csv.corruptCol))
      .collect()
    assert(out(0).getLong(0) == 1 && out(0).getString(1) == "ok" && out(0).isNullAt(2))
    // column-count mismatch is a malformation in CSV (unlike JSON's
    // missing fields): partial result kept, raw line recorded
    assert(out(1).getLong(0) == 2 && out(1).isNullAt(1) && out(1).getString(2) == "2")
    assert(!out(2).isNullAt(2) && out(2).getString(2) == "3,a,EXTRA")
    assert(!out(3).isNullAt(2) && out(3).getString(2) == "x,notanumber")
    intercept[IllegalArgumentException] {
      Csv.parseCsvLines(lines, "csv", docSchema.add(Csv.corruptCol, StringType))
    }
  }

  test("writeCsv: one file per shard, manifest bounds, ordered read-back") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    try {
      val df = spark.range(100).toDF("id")
        .withColumn("text", concat(lit("doc "), $"id"))
      val manifest = Csv.writeCsv(df, dir, "id", rowsPerShard = 40, seed = 1)
        .orderBy("shard")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(manifest.map(m => (m._1, m._2)) == Seq((0L, 40L), (1L, 40L), (2L, 20L)))
      (0 to 2).foreach { sh =>
        val files = new java.io.File(s"$dir/shard=$sh").listFiles()
          .filter(f => f.getName.endsWith(".txt") || f.getName.startsWith("part-"))
        assert(files.length == 1, s"shard $sh: ${files.length} files")
      }
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType),
        StructField("order_id", LongType)))
      val rows = Csv.readCsv(spark, dir, schema)
        .select($"id", $"order_id", col(Csv.corruptCol)).collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      assert(rows.length == 100)
      assert(rows.forall(_._3.isEmpty), "no line may quarantine")
      // same deterministic order as the jsonl writer (shared
      // shardAssignment)
      val expected = graft.operators.Sampling
        .shuffleForTraining(df, "id", seed = 1, "order_id")
        .select($"id", $"order_id").as[(Long, Long)].collect().toMap
      rows.foreach { case (id, ord, _) => assert(expected(id) == ord) }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
