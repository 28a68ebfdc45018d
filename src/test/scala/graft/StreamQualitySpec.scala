package graft

import graft.streaming.StreamQuality
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Doc(doc_id: Long, text: String, ts: Timestamp)

class StreamQualitySpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int) = new Timestamp(minute * 60000L)

  private val good =
    "The quick brown fox jumps over the lazy dog and keeps running through the field."
  private val bad = "!!! ??? ###"

  test("qualityFilter matches the batch quality/token semantics") {
    val df = Seq(
      Doc(1, good, t(0)),
      Doc(2, bad, t(1)),
      Doc(3, "tiny", t(2)))
      .toDF()
    val kept = StreamQuality.qualityFilter(df, "text", minQuality = 0.3, minTokens = 5)
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
    // signals agree with the batch functions they wrap
    val sig = StreamQuality.withQualitySignals(df, "text")
      .where($"doc_id" === 1)
      .select($"quality", $"n_tokens")
      .head()
    val direct = df.where($"doc_id" === 1).select(
      graft.functions.TextAnalysis.qualityScore($"text"),
      graft.functions.TextAnalysis.tokenCount($"text")).head()
    assert(sig == direct)
  }

  test("qualityFilter attaches to a streaming DataFrame (stateless plan)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val filtered = StreamQuality.qualityFilter(
      input.toDF(), "text", minQuality = 0.3, minTokens = 5)
    val query = filtered.writeStream
      .format("memory").queryName("graft_quality").outputMode("append").start()
    try {
      input.addData(Doc(1, good, t(0)), Doc(2, bad, t(1)))
      query.processAllAvailable()
      val out = spark.table("graft_quality").select($"doc_id").as[Long].collect().toSeq
      assert(out == Seq(1L))
    } finally query.stop()
  }

  test("chunk/repetition/redact compose on a streaming frame (row-local, stateless)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val chunked = input.toDF()
      .withColumn("r", graft.functions.TextAnalysis.repetitionSignals($"text"))
      .withColumn("clean", graft.functions.TextAnalysis.redact($"text"))
      .select($"doc_id", $"r.top_ngram_char_frac".as("rep"),
        posexplode(graft.functions.TextAnalysis.chunkTokens($"clean", 6, 2))
          .as(Seq("idx", "chunk")))
    val query = chunked.writeStream
      .format("memory").queryName("graft_chunks").outputMode("append").start()
    try {
      input.addData(Doc(1, good, t(0)))
      query.processAllAvailable()
      val rows = spark.table("graft_chunks").collect()
      assert(rows.length >= 2) // 14 tokens, stride 4 → 4 chunks
      assert(rows.forall(!_.isNullAt(1)))
    } finally query.stop()
  }

  test("dedupToParquet: batch-local dups collapse, quality gate applies, parquet lands") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val query = StreamQuality
      .dedupToParquet(input.toDF(), "text", "doc_id", out, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        minQuality = 0.3)
      .start()
    try {
      // doc 11/12 share content (one survives, smallest id), 13 fails quality
      input.addData(
        Doc(11, good, t(0)), Doc(12, good, t(1)), Doc(13, bad, t(2)))
      query.awaitTermination(60000)
      val written = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSeq
      assert(written == Seq(11L))
    } finally query.stop()
  }

  test("withNbScore: streamed scores equal the batch nbScore join path") {
    import graft.operators.Selection
    val labeled = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the dog sat on the rug", true),
      (3L, "stock prices fell sharply", false),
      (4L, "earnings beat forecasts", false)).toDF("doc_id", "text", "label")
    val modelDf = Selection.nbTrain(labeled, "text", col("label"), numBuckets = 128)
    val model = Selection.collectNbModel(modelDf)
    val heldOut = Seq(
      Doc(10, "the cat sat", t(0)),
      Doc(11, "earnings fell sharply", t(1)),
      Doc(12, "", t(2)))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val scored = StreamQuality.withNbScore(input.toDF(), model, "text", numBuckets = 128)
    val query = scored.writeStream
      .format("memory").queryName("graft_nb_stream").outputMode("append").start()
    try {
      input.addData(heldOut: _*)
      query.processAllAvailable()
      val streamed = spark.table("graft_nb_stream")
        .select($"doc_id", $"nb_score", $"nb_grams")
        .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
      val batch = Selection.nbScore(heldOut.toDF(), modelDf, "text", "doc_id",
        numBuckets = 128).as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
      assert(streamed == batch)
      // the class separation survives serving
      val byId = streamed.map(r => r._1 -> r._2).toMap
      assert(byId(10L) > 0 && byId(11L) < 0 && byId(12L) == 0.0)
    } finally query.stop()
  }

  test("funnelToParquet: per-batch funnel rows match the batch operator, batch_id lands") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = Files.createTempDirectory("graft_funnel_out").toString
    val ckpt = Files.createTempDirectory("graft_funnel_ckpt").toString
    val stages = Seq(
      "nonempty" -> (trim(col("text")) =!= ""),
      "longish" -> (length(col("text")) >= 20))
    val docs = Seq(Doc(1, good, t(0)), Doc(2, bad, t(1)), Doc(3, "", t(2)))
    val query = StreamQuality
      .funnelToParquet(input.toDF(), stages, out, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      input.addData(docs: _*)
      query.awaitTermination(60000)
      val written = spark.read.parquet(out)
        .select($"batch_id", $"stage", $"pass_count", $"cum_count")
        .as[(Long, String, Long, Long)].collect().sortBy(_._2).toSeq
      val expected = graft.operators.Profile
        .stageFunnel(docs.toDF(), stages)
        .select($"stage", $"pass_count", $"cum_count")
        .as[(String, Long, Long)].collect().sortBy(_._1)
        .map { case (s, p, c) => (0L, s, p, c) }.toSeq
      assert(written == expected)
      // good + bad pass nonempty (2); only good survives longish cum (1)
      assert(written.map(r => r._2 -> r._4).toMap ==
        Map("nonempty" -> 2L, "longish" -> 1L))
    } finally query.stop()
  }
}
