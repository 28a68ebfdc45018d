package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase timing for q_ann_ivf (dev tool). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    println(s"rows=${e.count()}")
    for (i <- 1 to 3)
      time(s"ivf run $i")(Similarity.ivfTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10, stride = 100, nprobe = 2))
    val q = Similarity.ivfTopK(e, e.where(col("vec_id") < 5),
      "embedding", "vec_id", "vec_id", k = 10, stride = 100, nprobe = 2)
    q.explain("formatted")
    spark.stop()
  }
}
