package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q_dedup_clusters (dev tool).
  * `sbt "runMain graft.tools.ClusterProbe"`.
  */
object ClusterProbe {
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
    val docs = d.unionByName(
      d.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val pairs = Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 2, 0.5)
    time("pairs noop")(pairs.write.format("noop").mode("overwrite").save())

    // full clusters, end to end
    time("duplicateClusters full")(
      Dedup.duplicateClusters(pairs).write.format("noop").mode("overwrite").save())

    // phase by phase
    val pairs2 = Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 2, 0.5)
    val edges = time("edges checkpoint")(
      pairs2.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs2.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(true))
    var labels = time("seed checkpoint")(
      edges.groupBy(col("src").as("id"))
        .agg(least(col("src"), min(col("dst"))).as("label"))
        .localCheckpoint(true))
    for (iter <- 0 until 2) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("__dl")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("__dl")).as("__nl"))
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("__nl"), col("label"))).as("label"))
      val next = time(s"round $iter step+jump ckpt")(
        stepped
          .join(stepped.select(col("id").as("label"), col("label").as("__ll")), Seq("label"), "left")
          .select(col("id"), least(col("label"), coalesce(col("__ll"), col("label"))).as("label"))
          .localCheckpoint(true))
      val changed = time(s"round $iter changed count")(
        next.join(labels.withColumnRenamed("label", "__old"), Seq("id"))
          .where(col("label") =!= col("__old")).limit(1).count())
      println(s"round $iter changed=$changed")
      labels = next
    }
    spark.stop()
  }
}
