package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal clone-corpus timing (dev tool). */
object CloneOnly {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = (0 until 8)
      .map(i => base.select((col("doc_id") + i * 10000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    Dedup.minHashLshPairs(base, "text", "doc_id", 5, 8, 2, 0.5).count() // warm
    for (i <- 1 to 2) {
      val q = Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 2, 0.5)
      val t0 = System.nanoTime()
      val n = q.count()
      println(f"CLONE8 run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$n")
      println(s"=== PLAN run $i ===")
      println(q.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort") ||
          l.contains("Window") || l.contains("Aggregate") || l.contains("Scan parquet"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
