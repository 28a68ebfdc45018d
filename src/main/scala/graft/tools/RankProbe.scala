package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 probe for the `dsirResample` corpus-fraction-k rank path: at
  * k = 40% of the corpus the selection must route to the distributed
  * prefix-sum rank filter — no `TakeOrderedAndProject`, no
  * `GlobalLimit` anywhere in the physical plan (those are the
  * single-task merge shapes that break at 100 TB) — and the result
  * must hold exactly k rows. Prints one JSON line with rows+seconds.
  *
  * `sbt "runMain graft.tools.RankProbe"` with `SPARK_GRAFT_SF_DIR`
  * pointing at the sf1 derivation (tools/sf1_gate.sh runs it last).
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val k = (n * 2 / 5).toInt
    val target = docs.where(col("lang") === "en").select("doc_id", "text")
    val sel = graft.operators.Selection
      .dsirResample(docs, target, "text", "doc_id", k)
    val plan = sel.queryExecution.executedPlan.toString
    require(!plan.contains("TakeOrderedAndProject"),
      "rank path regressed: TakeOrderedAndProject in plan")
    require(!plan.contains("GlobalLimit"),
      "rank path regressed: GlobalLimit in plan")
    val t0 = System.nanoTime()
    val rows = sel.count()
    val sec = (System.nanoTime() - t0) / 1e9
    require(rows == k, s"rank path selected $rows rows, expected $k")
    println(s"""{"probe":"dsir_rank_path","corpus":$n,"k":$k,"rows":$rows,"sec":$sec}""")
    spark.stop()
  }
}
