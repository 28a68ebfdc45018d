package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NearestCentroid kernel microbench (dev tool, round 17): times the
  * expression alone — 200k synthetic rows × nlist centroids × dim —
  * for both metrics, isolating the eval() loop cost from query/plan
  * noise. `sbt "runMain graft.tools.NcProbe [rows] [nlist] [dim]"`.
  */
object NcProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).flatMap(_.toIntOption).getOrElse(200000)
    val nlist = args.lift(1).flatMap(_.toIntOption).getOrElse(100)
    val dim = args.lift(2).flatMap(_.toIntOption).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = spark.range(rows).select(col("id"),
      expr(s"transform(sequence(1, $dim), i -> cast(pmod(id * i, 97) as double) / 97)")
        .as("v"))
      .localCheckpoint(true)
    val cen = spark.range(nlist).select(col("id").as("cid"),
      expr(s"transform(sequence(1, $dim), i -> cast(pmod(id * 31 + i, 89) as double) / 89)")
        .as("cvec"))
    val matrix = cen.agg(sort_array(
      collect_list(struct(col("cid"), col("cvec")))).as("cens"))
    for (metric <- Seq("cosine", "l2r6")) {
      val df = vecs.crossJoin(broadcast(matrix))
        .select(graft.functions.VectorFunctions
          .nearestCentroidNative(col("v"), col("cens"), metric).as("m"))
        .select(col("m.cid"))
      df.write.format("noop").mode("overwrite").save() // warm
      var best = Double.MaxValue
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[ncprobe] $metric%-7s rows=$rows nlist=$nlist dim=$dim  best=$best%8.3f s")
    }
    spark.stop()
  }
}
