package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Parallelism}

object SigProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32).localCheckpoint(true)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      var best = Double.MaxValue
      for (_ <- 1 to 3) { val t0=System.nanoTime(); df.write.format("noop").mode("overwrite").save(); best=math.min(best,(System.nanoTime()-t0)/1e9) }
      println(f"[sig] $name%-36s $best%7.3f s")
    }
    val sh = Dedup.charShingles(col("text"), 5)
    time("size+mins same projection")(docs.select(col("doc_id"),
      size(sh).as("sz"), Dedup.chunkMinsNative(sh, 8).as("mins")))
    time("mins only")(docs.select(col("doc_id"), Dedup.chunkMinsNative(sh, 8).as("mins")))
    time("size only")(docs.select(col("doc_id"), size(sh).as("sz")))
    time("staged via barrier")(Parallelism.pushdownBarrier(
      docs.select(col("doc_id"), sh.as("__sh")))
      .select(col("doc_id"), size(col("__sh")).as("sz"),
        Dedup.chunkMinsNative(col("__sh"), 8).as("mins")))
    spark.stop()
  }
}
