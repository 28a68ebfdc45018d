package graft

import graft.functions.ColumnFunctions
import graft.operators.Cumulative
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The scale-safe operators must agree exactly with their
  * global-window column-function twins — same values, computed with
  * distributed plans (range prefix sum / halo exchange / broadcast
  * totals) instead of an empty-partition window.
  */
class CumulativeSpec extends SparkSpec {
  import spark.implicits._

  // 200 rows over 4 test partitions so every operator genuinely
  // crosses partition boundaries.
  private def df: DataFrame =
    spark.range(200).select(
      col("id"),
      (col("id") * 37 % 100).as("v"),
      (col("id") % 7).as("g"))
      .repartition(4)

  private def sortedDoubles(d: DataFrame, c: String): Seq[(Long, Double)] =
    d.select(col("id"), col(c).cast("double")).as[(Long, Double)].collect()
      .sortBy(_._1).toSeq

  test("withPercentOfTotal matches percent() with no partition") {
    val want = sortedDoubles(
      df.withColumn("p", ColumnFunctions.percent(col("v"), r = 6)), "p")
    val got = sortedDoubles(
      Cumulative.withPercentOfTotal(df, col("v"), "p", r = 6), "p")
    assert(got == want)
  }

  test("withCubePercent matches cubePercent() with no partition") {
    val cubed = df.cube(col("g")).agg(sum(col("v")).as("sv"))
      .withColumn("id", coalesce(col("g"), lit(-1L)))
    val want = sortedDoubles(
      cubed.withColumn("p", ColumnFunctions.cubePercent(col("sv"), Seq(col("g")), r = 6)), "p")
    val got = sortedDoubles(
      Cumulative.withCubePercent(cubed, col("sv"), Seq(col("g")), "p", r = 6), "p")
    assert(got == want)
  }

  test("withCumulativeSum matches cumulativeSum() globally, both directions") {
    for (asc <- Seq(true, false)) {
      val want = sortedDoubles(
        df.withColumn("cs", ColumnFunctions.cumulativeSum(col("v"), col("id"), asc)), "cs")
      val got = sortedDoubles(
        Cumulative.withCumulativeSum(df, col("v"), col("id"), "cs", asc), "cs")
      assert(got == want, s"ascending=$asc")
    }
  }

  test("withCumulativeSums: one pass matches two chained withCumulativeSum calls") {
    for (asc <- Seq(true, false)) {
      val two = Cumulative.withCumulativeSum(
        Cumulative.withCumulativeSum(df, col("v"), col("id"), "a", asc),
        col("v") * 2, col("id"), "b", asc)
      val one = Cumulative.withCumulativeSums(
        df, Seq((col("v"), "a"), (col("v") * 2, "b")), col("id"), asc)
      val key = (d: org.apache.spark.sql.DataFrame) =>
        d.select(col("id"), col("a").cast("long"), col("b").cast("long"))
          .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(key(one) == key(two), s"ascending=$asc")
    }
  }

  test("withCumulativeSum: RANGE semantics under ties") {
    val ties = Seq((1, 1, 10), (2, 1, 20), (3, 2, 5)).toDF("id", "t", "v")
    val want = sortedDoubles(
      ties.withColumn("cs", ColumnFunctions.cumulativeSum(col("v"), col("t"))), "cs")
    val got = sortedDoubles(
      Cumulative.withCumulativeSum(ties, col("v"), col("t"), "cs"), "cs")
    assert(got == want) // both tie rows see the shared 30
  }

  test("withCumulativePercent matches cumulativePercent()") {
    val want = sortedDoubles(
      df.withColumn("cp", ColumnFunctions.cumulativePercent(col("v"), col("id"), r = 6)), "cp")
    val got = sortedDoubles(
      Cumulative.withCumulativePercent(df, col("v"), col("id"), "cp", r = 6), "cp")
    assert(got == want)
  }

  test("withMovingAverage matches movingAverage() in every mode") {
    for (mode <- Seq("previous", "center", "next")) {
      val want = sortedDoubles(
        df.withColumn("m",
          ColumnFunctions.movingAverage(col("v"), col("id"), 7, mode, r = 6)), "m")
      val got = sortedDoubles(
        Cumulative.withMovingAverage(df, col("v"), col("id"), "m", 7, mode, r = 6), "m")
      assert(got == want, s"mode=$mode")
    }
  }

  test("withMovingAverage: thin range partitions fall back to a thicker layout") {
    // 10 rows over defaultParallelism(4) partitions → 2-3 rows each,
    // below the before=3 halo of a centred 7-row frame: without the
    // partition-count validation the frame silently truncates at the
    // second partition boundary.
    val thin = (1L to 10L).map(i => (i, i.toDouble * 3)).toDF("id", "v")
    val want = sortedDoubles(
      thin.withColumn("m", ColumnFunctions.movingAverage(col("v"), col("id"), 7, "center", 6)), "m")
    val got = sortedDoubles(
      Cumulative.withMovingAverage(thin, col("v"), col("id"), "m", 7, "center", 6), "m")
    assert(got == want)
  }

  test("withMovingAverage: at most one checkpoint (thickness probed before materializing)") {
    // thin input: probe resolves parts=1 → exact single-partition
    // window, ZERO checkpoints (pre-probe code paid up to
    // log2(parallelism) full materializations here)
    // count ADDED persistent-RDD ids only: the ContextCleaner may
    // concurrently unpersist unreachable checkpoints from earlier
    // tests, so absolute sizes can shrink mid-test
    //
    // thin input: the full-parallelism probe checkpoint fails
    // validation, the final layout is derived from its counts and
    // re-ranged from the checkpointed blocks → exactly ONE
    // materialization of the input (pre-fix: up to log2(parallelism))
    val thin = (1L to 10L).map(i => (i, i.toDouble * 3)).toDF("id", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val thinOut = Cumulative.withMovingAverage(thin, col("v"), col("id"), "m", 7, "center", 6)
    thinOut.collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).size <= 1)

    // thick input: probe accepts the full parallelism first try →
    // exactly ONE checkpoint (thickOut stays referenced so the
    // cleaner can't collect it before the assertion)
    val thick = (1L to 1000L).map(i => (i, i.toDouble)).toDF("id", "v")
    val before2 = spark.sparkContext.getPersistentRDDs.keySet
    val thickOut = Cumulative.withMovingAverage(thick, col("v"), col("id"), "m", 7, "center", 6)
    thickOut.collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before2).size == 1)
  }

  test("withMovingAverage: frame clipped at the global edges") {
    val tiny = Seq((1, 2.0), (2, 4.0), (3, 6.0)).toDF("id", "v")
    val got = Cumulative
      .withMovingAverage(tiny, col("v"), col("id"), "m", 3, "center")
      .select(col("id").cast("long"), col("m")).as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3.0), (2L, 4.0), (3L, 5.0)))
  }
}
