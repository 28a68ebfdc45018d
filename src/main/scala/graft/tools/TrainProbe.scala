package graft.tools

import org.apache.spark.sql.SparkSession

/** Deep-equivalence probe for the incremental BPE trainer: train far
  * past the spec's 5-merge fixture (to exhaustion) and dump the merge
  * list for diffing against the naive reference implementation.
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val spec = graft.functions.Bpe.train(docs, "text", numMerges = k)
    println(f"[train] ${spec.merges.size} merges in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/scala_merges.txt"),
      spec.merges.map { case (f, s) => f + "\t" + s }.mkString("\n"))
    spark.stop()
  }
}
