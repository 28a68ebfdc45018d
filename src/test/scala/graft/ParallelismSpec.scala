package graft

import graft.operators.Parallelism
import org.apache.spark.sql.functions._

class ParallelismSpec extends SparkSpec {
  import spark.implicits._

  test("spread: tiny input repartitions to defaultParallelism") {
    val tiny = Seq(1, 2, 3).toDF("v")
    val out = Parallelism.spread(tiny)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("spread: input above the size gate is left untouched") {
    val df = spark.range(100).toDF("v")
    // force the gate shut with a zero budget
    val out = Parallelism.spread(df, bytesPerCore = 0L)
    assert(out eq df)
  }

  test("spread: stats-free (RDD-backed) thin frame still spreads") {
    // An RDD-backed frame reports the defaultSizeInBytes sentinel
    // ("huge"), so the size gate alone would skip exactly the small
    // in-memory frames the operator protects — the partition-count
    // fallback must catch them.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v", IntegerType)))
    val thin = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1), Row(2), Row(3)), 1), schema)
    assert(thin.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes),
      "premise: the frame must be stats-free for this test to bite")
    val out = Parallelism.spread(thin)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("spread: stats-free frame already at full parallelism is untouched") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val par = spark.sparkContext.defaultParallelism
    val schema = StructType(Seq(StructField("v", IntegerType)))
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 100).map(Row(_)), par), schema)
    val out = Parallelism.spread(wide)
    assert(out eq wide)
  }

  test("pushdownBarrier: filter stays above the staged projection") {
    val staged = Seq("a b c", "d").toDF("t")
      .select(col("t"), size(split(col("t"), " ")).as("n"))
    val plain = staged.where(col("n") >= 2)
    val barred = Parallelism.pushdownBarrier(staged).where(col("n") >= 2)
    // same rows either way
    assert(barred.select("t").as[String].collect().toSeq ==
      plain.select("t").as[String].collect().toSeq)
    // without the barrier the predicate is substituted below the
    // projection; with it, a CollectMetrics node pins the filter above
    val optimized = barred.queryExecution.optimizedPlan
    val metricsIdx = optimized.collect {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c
    }
    assert(metricsIdx.nonEmpty, "CollectMetrics missing from optimized plan")
    val filterAboveMetrics = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.find(_.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.CollectMetrics]).isDefined => f
    }
    assert(filterAboveMetrics.isDefined, "filter was pushed through the barrier")
  }

  test("pushdownBarrier: unique metric names compose in one query") {
    val a = Parallelism.pushdownBarrier(Seq(1).toDF("v"))
    val b = Parallelism.pushdownBarrier(Seq(2).toDF("v"))
    assert(a.union(b).as[Int].collect().sorted.toSeq == Seq(1, 2))
  }
}
