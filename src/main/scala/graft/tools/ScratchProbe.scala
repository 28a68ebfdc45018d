package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component timing for the per-gram pipeline (dev tool). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
      .localCheckpoint(true)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[scratch] $name%-32s $best%8.3f s")
    }
    val grams = docs.select(col("doc_id"),
      explode(graft.operators.Selection.unigramsAndBigrams(col("text"))).as("g"))
    time("explode only")(grams)
    time("explode+length")(grams.select(col("doc_id"), length(col("g"))))
    time("explode+xxhash64")(grams.select(col("doc_id"), xxhash64(col("g"))))
    time("explode+md5")(grams.select(col("doc_id"), md5(col("g"))))
    time("explode+md5+conv")(grams.select(col("doc_id"),
      pmod(conv(substring(md5(col("g")), 1, 4), 16, 10).cast("int"), lit(64))))
    time("explode+md5 grouped")(grams
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("g")), 1, 4), 16, 10).cast("int"), lit(64)).as("b"))
      .groupBy("b").count())
    spark.stop()
  }
}
