package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's sf0.1 testdata to sf1.
  *
  * The driver only ships sf ≤ 0.1 (TESTDATA.md); the round-4 verdict
  * asks for an EMPIRICAL sf1 correctness + bench pass. This tool
  * derives sf1 from sf0.1 with 10 offset-keyed copies (copy 0 is the
  * original, byte-identical):
  *
  *  - `region`/`nation` stay fixed (TPC-H dims don't scale).
  *  - Fact/dim keys shift by `copy * tableCardinality` so keys stay
  *    dense, unique, and referentially intact (orders→customer,
  *    lineitem→orders/part/supplier, events→user).
  *  - `documents.text` in copies > 0 replaces every 5th token on each
  *    line with `token~c`. Within a copy, perturbation is a pure
  *    function of line content, so exact-dup groups, boilerplate
  *    lines, and aligned near-dup pairs survive per copy; across
  *    copies, ~1/5 of tokens differ, so k-shingle Jaccard falls to
  *    ~0.5^k/(2-0.5^k) ≈ 0.07 (k=5) — far below dedup thresholds.
  *    Growth regime (pairs ∝ n), not the adversarial clone regime
  *    (pairs ∝ n·copies²) that `tools/ScaleProbe --clone` covers.
  *  - `embeddings.embedding` in copies > 0 gets hash-seeded noise in
  *    [-0.2, 0.2) per component. Source components average |x| ≈ 0.1
  *    (σ² ≈ 0.013), so noise variance A²/12 ≈ 0.013 puts cross-copy
  *    cosine at ≈ 1/√2 ≈ 0.7 — below every near-dup threshold in the
  *    suite (growth regime: near-dup populations scale ∝ n, not
  *    ∝ n·copies²); query sets selected as `vec_id < 5` stay fixed
  *    while the corpus grows 10×.
  *
  * Each table lands as ONE `<table>.parquet` file (driver layout, so
  * `tools/check_oracle.py` views resolve identically).
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/testdata-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")

    // copy index cross-joined in: c = 0..copies-1, c = 0 is the original
    val cIdx = spark.range(copies).toDF("__c")
    def cloned(t: String): DataFrame = src(t).crossJoin(cIdx)
    def off(k: String, stride: Long) = col(k) + col("__c") * stride

    def writeOne(df: DataFrame, t: String): Unit = {
      val tmp = s"$outDir/__tmp_$t"
      // 4 MiB row groups: a single-file table is only splittable at
      // row-group boundaries — one giant row group (the parquet
      // default) would serialize every sf1 scan onto one core, which
      // is a data-layout artifact, not an engine property. Real
      // cluster-scale tables arrive as many files/row groups.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 4 * 1024 * 1024)
        .parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$outDir/$t.parquet")
      if (dst.exists()) dst.delete()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dir.listFiles().foreach(_.delete()); dir.delete()
      println(s"[genscale] $t -> $dst (${dst.length() / 1024 / 1024} MiB)")
    }

    new java.io.File(outDir).mkdirs()
    writeOne(src("region"), "region")
    writeOne(src("nation"), "nation")
    writeOne(cloned("customer")
      .withColumn("c_custkey", off("c_custkey", 15000L))
      .drop("__c"), "customer")
    writeOne(cloned("supplier")
      .withColumn("s_suppkey", off("s_suppkey", 1000L))
      .drop("__c"), "supplier")
    writeOne(cloned("part")
      .withColumn("p_partkey", off("p_partkey", 20000L))
      .drop("__c"), "part")
    writeOne(cloned("orders")
      .withColumn("o_orderkey", off("o_orderkey", 150000L))
      .withColumn("o_custkey", off("o_custkey", 15000L))
      .drop("__c"), "orders")
    writeOne(cloned("lineitem")
      .withColumn("l_orderkey", off("l_orderkey", 150000L))
      .withColumn("l_partkey", off("l_partkey", 20000L))
      .withColumn("l_suppkey", off("l_suppkey", 1000L))
      .drop("__c"), "lineitem")
    // events.ts has drifted across driver testdata generations
    // (nanos INT64 → naive micros); normalize every shape to ONE
    // output type, tz-adjusted micros (identity epoch map under the
    // pinned UTC session tz), which both `epoch_ms(ts)` (DuckDB
    // oracle) and SparkEntry's `unix_millis(ts)` fallback floor to
    // the same millis.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = cloned("events")
    val tsMicros = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case org.apache.spark.sql.types.TimestampNTZType => expr("cast(ts as timestamp)")
      case _ => col("ts")
    }
    writeOne(ev
      .withColumn("event_id", off("event_id", 100000L))
      .withColumn("user_id", off("user_id", 1500L))
      .withColumn("ts", tsMicros)
      .drop("__c"), "events")
    writeOne(cloned("documents")
      .withColumn("doc_id", off("doc_id", 5000L))
      .withColumn("text", expr(
        """CASE WHEN __c = 0 THEN text ELSE
          |  array_join(transform(split(text, '\n'), line ->
          |    array_join(transform(split(line, ' '), (t, i) ->
          |      CASE WHEN i % 5 = 0 THEN concat(t, '~', __c) ELSE t END),
          |    ' ')), '\n') END""".stripMargin))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__c"), "documents")
    writeOne(cloned("embeddings")
      .withColumn("vec_id", off("vec_id", 2000L))
      .withColumn("embedding", expr(
        """CASE WHEN __c = 0 THEN embedding ELSE
          |  transform(embedding, (x, i) -> cast(x +
          |    (pmod(hash(vec_id, i), 1000) / 1000.0 - 0.5) * 0.4 as float))
          |END""".stripMargin))
      .drop("__c"), "embeddings")
    spark.stop()
  }
}
