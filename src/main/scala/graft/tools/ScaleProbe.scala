package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe: replicate the documents table k× (fresh
  * ids) and time the LSH dedup pipelines, to see how candidate volume
  * and wall time grow with corpus size on a constant-baseline-Jaccard
  * corpus. `sbt "runMain graft.tools.ScaleProbe"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")

    def replicate(k: Int): DataFrame =
      (0 until k)
        .map(i => base.select((col("doc_id") + i * 10000000L).as("doc_id"), col("text")))
        .reduce(_ unionByName _)

    // warmup
    Dedup.minHashLshPairs(base, "text", "doc_id", 5, 8, 2, 0.5)
      .write.format("noop").mode("overwrite").save()

    // Growth replication: replicas get synthetic md5-chunk text that
    // shares no shingles with anything (the corpus grows 8×, the
    // absolute near-dup population stays the base corpus's) — the
    // realistic regime, where cost must track candidate volume, not
    // n². The clone corpus (every doc duplicated k×, pair output
    // grows ∝ k²·n by construction) is kept as the adversarial
    // bound: there the verification payload IS the output, so any
    // design pays ∝ pairs·|set|.
    def replicateGrowth(k: Int): DataFrame =
      (0 until k).map { i =>
        val t = if (i == 0) col("text")
          else concat_ws(" ", (1 to 8).map(j =>
            md5(concat(col("doc_id"), lit(i * 31 + j)))): _*)
        base.select((col("doc_id") + i * 10000000L).as("doc_id"), t.as("text"))
      }.reduce(_ unionByName _)

    for (k <- Seq(1, 2, 4, 8); bands <- Seq(2)) {
      val docs = replicateGrowth(k)
      val t0 = System.nanoTime()
      val n = Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, bands, 0.5).count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Dedup.simHashPairs(docs, "text", "doc_id", bits = 48, maxHamming = 1)
        .write.format("noop").mode("overwrite").save()
      val tSim = (System.nanoTime() - t1) / 1e9
      println(f"SCALE|k=$k%-2d docs=${k * 5000}%-6d minhash(bands=$bands)=$tPairs%7.2fs pairs=$n%-8d simhash48=$tSim%7.2fs")
    }
    for (k <- Seq(1, 8)) {
      val docs = replicate(k)
      val t0 = System.nanoTime()
      val n = Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 2, 0.5).count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      println(f"SCALE-CLONE|k=$k%-2d docs=${k * 5000}%-6d minhash=$tPairs%7.2fs pairs=$n%-8d (adversarial: output ∝ k²n)")
    }

    // Embedding near-dup: auto planes (occupancy-constant buckets)
    // should keep pair-generation cost tracking candidate volume, not
    // n², as the corpus replicates 8×. The fixed-plane column shows
    // what the round-1 design (planes frozen at 6) would do.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    def replicateEmb(k: Int): DataFrame =
      (0 until k)
        .map(i => emb.select((col("vec_id") + i * 10000000L).as("vec_id"), col("embedding")))
        .reduce(_ unionByName _)
    graft.operators.Similarity
      .nearDupPairs(emb, "embedding", "vec_id", dim = 64, threshold = 0.9)
      .write.format("noop").mode("overwrite").save() // warmup
    for (k <- Seq(1, 2, 4, 8)) {
      val e = replicateEmb(k)
      val nRows = e.count()
      val planes = graft.operators.Similarity.autoPlanes(nRows)
      val t0 = System.nanoTime()
      val nAuto = graft.operators.Similarity
        .nearDupPairs(e, "embedding", "vec_id", dim = 64, threshold = 0.9,
          numTables = 2).count()
      val tAuto = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nFixed = graft.operators.Similarity
        .nearDupPairs(e, "embedding", "vec_id", dim = 64, threshold = 0.9,
          numPlanes = 6).count()
      val tFixed = (System.nanoTime() - t1) / 1e9
      println(f"SCALE-EMB|k=$k%-2d vecs=$nRows%-7d auto(planes=$planes,tables=2)=$tAuto%7.2fs pairs=$nAuto%-6d fixed(planes=6)=$tFixed%7.2fs pairs=$nFixed%-6d")
    }

    // Quantized vs float payloads: at cluster scale the int8 path's
    // win is BYTES — every scan/shuffle/storage hop moves ~4× less
    // vector data (the local-CPU kernel time is a wash at these row
    // counts; the bandwidth advantage needs real IO to show). Measure
    // the materialized sizes directly.
    {
      val e = replicateEmb(8)
      def bytesOf(df: DataFrame): Long = {
        val p = java.nio.file.Files.createTempDirectory("graft_int8_probe").toString
        df.write.mode("overwrite").parquet(p)
        val dir = new java.io.File(p)
        val sz = dir.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
        org.apache.commons.io.FileUtils.deleteDirectory(dir)
        sz
      }
      val floatBytes = bytesOf(e.select(col("vec_id"), col("embedding")))
      val int8Bytes = bytesOf(e.select(col("vec_id"),
        graft.functions.VectorFunctions.quantize8(col("embedding")).as("q8")))
      println(f"SCALE-INT8|vecs=${e.count()}%-7d floatParquet=${floatBytes / 1024}%6d KiB int8Parquet=${int8Bytes / 1024}%6d KiB ratio=${floatBytes.toDouble / int8Bytes}%.2f")
    }
    spark.stop()
  }
}
