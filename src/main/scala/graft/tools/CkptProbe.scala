package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CkptProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) { val t0=System.nanoTime(); f; best=math.min(best,(System.nanoTime()-t0)/1e9) }
      println(f"[ckpt] $name%-40s $best%7.3f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
    val occ = docs.select(col("doc_id").as("__doc"), (col("lang")==="en").as("__tgt"),
      explode(graft.operators.Selection.unigramsAndBigrams(col("text"))).as("__gram"))
      .select(col("__doc"), col("__tgt"),
        graft.operators.Selection.gramBucket(col("__gram"), 64).as("bucket"))
    time("occ noop")(occ.write.format("noop").mode("overwrite").save())
    time("occ localCheckpoint(true)"){ val c = occ.localCheckpoint(true); c.unpersist(true); () }
    val tk = docs.select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("__w"))
    time("tokens noop")(tk.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
