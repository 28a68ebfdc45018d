package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing of the shipped dupNgramStats alone (dev tool). */
object StageTimeProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
        println(s"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"wall=${ms.getOrElse(-1L) / 1e3}%.2f s")
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val d = docs.unionByName(
      docs.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      graft.functions.TextAnalysis.dupNgramStats(d, "text", "doc_id", n = 5)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
