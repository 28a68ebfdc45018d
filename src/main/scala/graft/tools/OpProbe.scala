package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Operator-level metric dump for a SparkEntry query (dev tool,
  * round 16): executes the query once (warm) plus once measured, then
  * walks the FINAL adaptive physical plan printing each operator with
  * its interesting metrics (duration/time ns, output rows, shuffle
  * bytes) — the SQL-tab view, on stdout.
  *
  * `sbt "runMain graft.tools.OpProbe q_dsir"`
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Set(
      "duration", "time in aggregation build", "scan time", "shuffle bytes written",
      "local bytes read", "remote bytes read", "number of output rows",
      "time to build hash map", "time to broadcast", "time to collect",
      "data size", "sort time", "spill size", "build time")

    def dump(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.toSeq
        .filter { case (_, m) => interesting.exists(m.name.getOrElse("").contains) ||
          interesting.contains(m.name.getOrElse("")) }
        .map { case (k, m) =>
          val v = m.value
          val nm = m.name.getOrElse(k)
          if (m.metricType == "timing") f"$nm=${v / 1e3}%.2fs"
          else if (m.metricType == "nsTiming") f"$nm=${v / 1e9}%.2fs"
          else if (m.metricType == "size") f"$nm=${v / 1e6}%.1fMB"
          else s"$nm=$v"
        }
      println("  " * depth + p.nodeName + "  " + ms.mkString(" | "))
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      kids.foreach(dump(_, depth + 1))
    }

    for (name <- args.toSeq) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val df = fn(spark, dir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"===== $name wall=${(System.nanoTime() - t0) / 1e9}%.2f s =====")
      // The writer runs its own QueryExecution; re-execute through the
      // plan's RDD to populate metrics on THIS QueryExecution instead.
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan.execute().count()
      println(f"(metric pass wall=${(System.nanoTime() - t1) / 1e9}%.2f s)")
      dump(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
