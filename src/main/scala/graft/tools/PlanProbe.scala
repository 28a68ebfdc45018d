package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the headline queries (dev tool).
  * `sbt "runMain graft.tools.PlanProbe [query ...]"`; `--audit`
  * prints a one-line summary (scans/pruned schemas, exchange and
  * codegen counts) for every query instead.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // static plan analysis: AQE defers codegen/exchange decisions
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("--audit")) audit(spark, dir)
    else {
      val names = if (args.nonEmpty) args.toSeq else Seq("q_ann_lsh")
      names.foreach { n =>
        println(s"===== $n =====")
        graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }

  private def audit(spark: SparkSession, dir: String): Unit = {
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val scans = "ReadSchema: struct<([^>]*)>".r
          .findAllMatchIn(plan).map(_.group(1).split(",").length).toSeq
        val pushed = "PushedFilters: \\[([^\\]]+)\\]".r
          .findAllMatchIn(plan).count(_.group(1).trim.nonEmpty)
        val shuffles =
          "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
            .findAllIn(plan).size
        val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
        val codegen = "Found (\\d+) WholeStageCodegen".r
          .findFirstMatchIn(
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.CodegenMode))
          .map(_.group(1)).getOrElse("0")
        println(f"AUDIT|$name%-26s|scans=${scans.mkString("+")}%-8s|pushedFilters=$pushed|shuffles=$shuffles|broadcasts=$broadcasts|codegenSpans=$codegen")
      } catch { case e: Throwable => println(s"AUDIT|$name|error: ${e.getMessage}") }
    }
  }
}
