package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query stage profiler (dev tool, round 16): runs the named
  * SparkEntry queries through the noop sink with a listener that
  * aggregates per-stage wall, executor task time, shuffle bytes and
  * task counts — the "where does the time go" view the Spark UI gives,
  * printed to stdout so it can drive the optimization loop.
  *
  * `sbt "runMain graft.tools.QueryProbe q_dsir q_lm_score3"`
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  *      SPARK_GRAFT_PROBE_RUNS (default 2; run 1 is the warm-up).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_PROBE_RUNS")
      .flatMap(_.toIntOption).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(name: String) {
      var wallMs = 0L; var taskMs = 0L; var tasks = 0
      var shufReadB = 0L; var shufWriteB = 0L; var inputB = 0L
      var spillMemB = 0L; var spillDiskB = 0L
      var count = 0
    }
    val stages = mutable.LinkedHashMap.empty[String, St]
    var jobs = 0
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (record) jobs += 1
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = if (record) {
        val si = sc.stageInfo
        val key = si.name.takeWhile(_ != '\n').take(90)
        val st = stages.getOrElseUpdate(key, St(key))
        st.wallMs += (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(0L)
        st.taskMs += si.taskMetrics.executorRunTime
        st.tasks += si.numTasks
        st.shufReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        st.shufWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        st.inputB += si.taskMetrics.inputMetrics.bytesRead
        st.spillMemB += si.taskMetrics.memoryBytesSpilled
        st.spillDiskB += si.taskMetrics.diskBytesSpilled
        st.count += 1
      }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q_dsir")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // warm-up run (JIT + codegen cache + parquet footers)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      stages.clear(); jobs = 0
      record = true
      val t0 = System.nanoTime()
      var wall = 0.0
      for (_ <- 2 to math.max(2, runs)) {
        val r0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        wall += (System.nanoTime() - r0) / 1e9
      }
      record = false
      val n = math.max(1, runs - 1)
      println(f"===== $name  wall=${wall / n}%.2f s/run  jobs=${jobs / n} =====")
      val rows = stages.values.toSeq.sortBy(-_.taskMs)
      for (s <- rows) {
        println(f"  stage x${s.count}%-3d wall=${s.wallMs / n / 1e3}%6.2f s " +
          f"task=${s.taskMs / n / 1e3}%7.2f s tasks=${s.tasks / n}%4d " +
          f"in=${s.inputB / n / 1e6}%6.1f MB sr=${s.shufReadB / n / 1e6}%6.1f MB " +
          f"sw=${s.shufWriteB / n / 1e6}%6.1f MB " +
          (if (s.spillMemB + s.spillDiskB > 0)
            f"SPILL mem=${s.spillMemB / n / 1e6}%.1f MB disk=${s.spillDiskB / n / 1e6}%.1f MB "
          else "") + s.name)
      }
    }
    spark.stop()
  }
}
