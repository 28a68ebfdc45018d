package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fine-grained stage timing for the minhash pair pipeline (dev tool).
  * `sbt "runMain graft.tools.PairsProbe"`.
  */
object PairsProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val d = spark.read.parquet(s"$dir/documents.parquet")
    def docs = d.unionByName(
      d.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("scan+union only")(docs)
    val sh = Dedup.charShingles(col("text"), 5)
    val shingled = docs.select(col("doc_id").as("__id"), sh.as("__sh"))
    time("shingles native")(shingled)
    time("shingles native x2")(shingled)
    val minned = shingled.withColumn("__mins", Dedup.chunkMinsNative(col("__sh"), 8))
    time("+chunkMins")(minned)
    time("+chunkMins x2")(minned)
    val rp = docs.repartition(32)
    val minnedRp = rp.select(col("doc_id").as("__id"), sh.as("__sh"))
      .withColumn("__mins", Dedup.chunkMinsNative(col("__sh"), 8))
    time("+chunkMins repart32")(minnedRp)
    time("+chunkMins repart32 x2")(minnedRp)
    val exploded = minned
      .select(col("__id"), col("__sh"),
        posexplode(Dedup.bandKeys(col("__mins"), 8, 2)).as(Seq("__bpos", "__bkey")))
    time("+bands exploded")(exploded)
    val keysOnly = minned
      .select(col("__id"),
        posexplode(Dedup.bandKeys(col("__mins"), 8, 2)).as(Seq("__bpos", "__bkey")))
    time("keys only exploded")(keysOnly)
    time("full pairs")(Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 2, 0.5))
    time("full pairs x2")(Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 2, 0.5))
    time("full pairs repart")(Dedup.minHashLshPairs(docs.repartition(32), "text", "doc_id", 5, 8, 2, 0.5))
    spark.stop()
  }
}
