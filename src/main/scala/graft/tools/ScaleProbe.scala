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

    for (k <- Seq(1, 2, 4, 8); bands <- Seq(2)) {
      val docs = replicate(k)
      val t0 = System.nanoTime()
      val n = Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, bands, 0.5).count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Dedup.simHashPairs(docs, "text", "doc_id", bits = 48, maxHamming = 1)
        .write.format("noop").mode("overwrite").save()
      val tSim = (System.nanoTime() - t1) / 1e9
      println(f"SCALE|k=$k%-2d docs=${k * 5000}%-6d minhash(bands=$bands)=$tPairs%7.2fs pairs=$n%-8d simhash48=$tSim%7.2fs")
    }
    spark.stop()
  }
}
