package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time the stages of dupNgramStats piecewise (dev tool for the
  * round-6 staged-frame rewrite): checkpoint materialization vs
  * count aggregation vs join-back.
  */
object StageTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        println(s"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"wall=${ms.getOrElse(-1L) / 1e3}%.2f s  ${si.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val d = docs.unionByName(
      docs.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    val n = 5
    val tk = d.select(col("doc_id").as("__id"),
      graft.functions.TextAnalysis.tokens(col("text")).as("__w"))
    val gramsPlain = tk
      .select(col("__id"), explode(
        when(size(col("__w")) >= n, array_distinct(expr(
          s"transform(sequence(0, size(__w) - $n), i -> array_join(slice(__w, i + 1, $n), ' '))")))
          .otherwise(array(array_join(col("__w"), " ")))).as("__g"))
      .select(col("__id"), md5(col("__g")).as("__g"))
    println(s"[probe] doc partitions: ${d.rdd.getNumPartitions}")
    timed("docs count") { println(d.count()) }
    timed("tokenize count") { println(tk.select(size(col("__w"))).agg(sum("size(__w)")).collect().head) }
    val gramsNoMd5 = tk
      .select(col("__id"), explode(
        when(size(col("__w")) >= n, array_distinct(expr(
          s"transform(sequence(0, size(__w) - $n), i -> array_join(slice(__w, i + 1, $n), ' '))")))
          .otherwise(array(array_join(col("__w"), " ")))).as("__g"))
    timed("grams no-md5 count") { println(gramsNoMd5.count()) }
    println(s"[probe] gram partitions: ${gramsPlain.rdd.getNumPartitions}")
    timed("gram frame count (no checkpoint)") { println(gramsPlain.count()) }
    val spreadGrams = {
      val dd = graft.operators.Parallelism.spread(d)
      dd.select(col("doc_id").as("__id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("__w"))
        .select(col("__id"), explode(
          when(size(col("__w")) >= n, array_distinct(expr(
            s"transform(sequence(0, size(__w) - $n), i -> array_join(slice(__w, i + 1, $n), ' '))")))
            .otherwise(array(array_join(col("__w"), " ")))).as("__g"))
        .select(col("__id"), md5(col("__g")).as("__g"))
    }
    timed("gram frame count (spread input)") { println(spreadGrams.count()) }
    val grams = timed("localCheckpoint(true)") { gramsPlain.localCheckpoint(true) }
    val docsCnt = grams.groupBy(col("__g")).agg(count(lit(1)).as("__docs"))
    timed("groupBy(__g) count") { docsCnt.write.format("noop").mode("overwrite").save() }
    val joined = grams.join(docsCnt, Seq("__g"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        round(sum(when(col("__docs") >= 2, 1).otherwise(0)).cast("double") /
          count(lit(1)), 4).as("dup_ngram_frac"))
    timed("join-back + final agg") { joined.write.format("noop").mode("overwrite").save() }
    timed("full operator (as shipped)") {
      graft.functions.TextAnalysis.dupNgramStats(d, "text", "doc_id", n = 5)
        .write.format("noop").mode("overwrite").save()
    }
    locally { () } // stmt separator
    // variant A: no checkpoint — recompute the (spread) gram lineage
    // on both sides of the groupBy+join
    locally {
      val sg = {
        val dd = graft.operators.Parallelism.spread(d)
        dd.select(col("doc_id").as("__id"),
          graft.functions.TextAnalysis.tokens(col("text")).as("__w"))
          .select(col("__id"), explode(
            when(size(col("__w")) >= n, array_distinct(expr(
              s"transform(sequence(0, size(__w) - $n), i -> array_join(slice(__w, i + 1, $n), ' '))")))
              .otherwise(array(array_join(col("__w"), " ")))).as("__g"))
          .select(col("__id"), md5(col("__g")).as("__g"))
      }
      val dc = sg.groupBy(col("__g")).agg(count(lit(1)).as("__docs"))
      val out = sg.join(dc, Seq("__g")).groupBy(col("__id"))
        .agg(count(lit(1)).as("n_grams"),
          round(sum(when(col("__docs") >= 2, 1).otherwise(0)).cast("double") /
            count(lit(1)), 4).as("dup_ngram_frac"))
      timed("variant A: no-ckpt recompute") {
        out.write.format("noop").mode("overwrite").save()
      }
    }
    // variant B: checkpoint, but 128-bit xxhash64-pair key instead of
    // the md5 hex string (16 bytes of longs vs 32-char string)
    locally {
      val sg = {
        val dd = graft.operators.Parallelism.spread(d)
        dd.select(col("doc_id").as("__id"),
          graft.functions.TextAnalysis.tokens(col("text")).as("__w"))
          .select(col("__id"), explode(
            when(size(col("__w")) >= n, array_distinct(expr(
              s"transform(sequence(0, size(__w) - $n), i -> array_join(slice(__w, i + 1, $n), ' '))")))
              .otherwise(array(array_join(col("__w"), " ")))).as("__g"))
          .select(col("__id"), xxhash64(col("__g")).as("__g1"),
            xxhash64(lit(1), col("__g")).as("__g2"))
          .localCheckpoint(true)
      }
      val dc = sg.groupBy(col("__g1"), col("__g2")).agg(count(lit(1)).as("__docs"))
      val out = sg.join(dc, Seq("__g1", "__g2")).groupBy(col("__id"))
        .agg(count(lit(1)).as("n_grams"),
          round(sum(when(col("__docs") >= 2, 1).otherwise(0)).cast("double") /
            count(lit(1)), 4).as("dup_ngram_frac"))
      timed("variant B: ckpt + xxhash64-pair key") {
        out.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
