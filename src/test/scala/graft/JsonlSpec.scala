package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType)))

  test("toJsonLines -> parseJsonLines round trips hostile strings") {
    val rows = Seq(
      (1L, Some("plain")),
      (2L, Some("quo\"te back\\slash")),
      (3L, Some("new\nline tab\t end")),
      (4L, Some("unicode Привет 😀 你好")),
      (5L, Some("")),
      (6L, None))
    val df = rows.toDF("id", "text")
    val back = Jsonl.parseJsonLines(Jsonl.toJsonLines(df), "json", docSchema)
    assert(back.where(col(Jsonl.corruptCol).isNotNull).count() == 0)
    val got = back.select($"id", $"text").as[(Long, Option[String])]
      .collect().toSeq.sortBy(_._1)
    assert(got == rows.sortBy(_._1))
  }

  test("parseJsonLines: corrupt quarantines, missing null, extra ignored") {
    val lines = Seq(
      """{"id": 1, "text": "ok"}""",
      """{"id": 2, "text": "extra", "bonus": 9}""",
      """{"id": 3}""",
      """{"id": 4, "text": """,
      "not json at all").toDF("json")
    val out = Jsonl.parseJsonLines(lines, "json", docSchema)
      .select($"id", $"text", col(Jsonl.corruptCol))
      .collect()
    assert(out(0).getLong(0) == 1 && out(0).getString(1) == "ok" && out(0).isNullAt(2))
    assert(out(1).getLong(0) == 2 && out(1).getString(1) == "extra" && out(1).isNullAt(2))
    assert(out(2).getLong(0) == 3 && out(2).isNullAt(1) && out(2).isNullAt(2))
    assert(out(3).isNullAt(0) && out(3).getString(2).startsWith("""{"id": 4"""))
    assert(out(4).isNullAt(0) && out(4).getString(2) == "not json at all")
    // schema already holding the quarantine column fails fast
    intercept[IllegalArgumentException] {
      Jsonl.parseJsonLines(lines, "json", docSchema.add(Jsonl.corruptCol, StringType))
    }
  }

  private def back_rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), col("order_id"), col(Jsonl.corruptCol))
      .collect().map(r => (
        if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2))))

  test("writeJsonl: one file per shard, manifest bounds, ordered read-back") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    try {
      val df = spark.range(100).toDF("id")
        .withColumn("text", concat(lit("doc "), $"id"))
      val manifest = Jsonl.writeJsonl(df, dir, "id", rowsPerShard = 40, seed = 1)
        .orderBy("shard")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(manifest.map(m => (m._1, m._2)) == Seq((0L, 40L), (1L, 40L), (2L, 20L)))
      manifest.foreach { case (shard, n, first, last) =>
        assert(first == shard * 40 && last == shard * 40 + n - 1)
      }
      // exactly one data file per shard directory
      (0 to 2).foreach { sh =>
        val files = new java.io.File(s"$dir/shard=$sh").listFiles()
          .filter(f => f.getName.endsWith(".txt") || f.getName.startsWith("part-"))
        assert(files.length == 1, s"shard $sh: ${files.length} files")
      }
      // read back: every row lands in the shard its order dictates,
      // and the embedded order_id matches the deterministic shuffle
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("text", StringType),
        StructField("order_id", LongType)))
      // one materializing pass (a corrupt-only COUNT is rejected by
      // the source — referenced columns must include data columns)
      val rows = back_rows(Jsonl.readJsonl(spark, dir, schema))
      assert(rows.length == 100)
      assert(rows.forall(_._3.isEmpty), "no line may quarantine")
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
