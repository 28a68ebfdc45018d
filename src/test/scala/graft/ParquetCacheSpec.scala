package graft

import graft.sources.ParquetCache
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ParquetCacheSpec extends SparkSpec {
  import spark.implicits._

  test("loadOrCalculate: computes missing combinations once, then loads") {
    val dir = Files.createTempDirectory("graft_pc").toString + "/cache"
    var calls = 0
    def func(params: Map[String, Any]) = {
      calls += 1
      val m = params("month").toString.toInt
      spark.range(3).select($"id", lit(m * 100).as("v"))
    }
    val first = ParquetCache.loadOrCalculate(
      spark, func, dir, Seq("month" -> Seq(1, 2)), log = false)
    assert(calls == 2)
    assert(first.count() == 6)
    // month is a partition column on the read
    assert(first.columns.contains("month"))

    // second call: nothing recomputed
    val second = ParquetCache.loadOrCalculate(
      spark, func, dir, Seq("month" -> Seq(1, 2)), log = false)
    assert(calls == 2)
    assert(second.count() == 6)

    // new combination: only the new one computed
    val third = ParquetCache.loadOrCalculate(
      spark, func, dir, Seq("month" -> Seq(1, 2, 3)), log = false)
    assert(calls == 3)
    assert(third.count() == 9)
  }

  test("loadOrCalculateWithReport: hit/rebuild/failure counts per call") {
    val dir = Files.createTempDirectory("graft_pcr").toString + "/cache"
    def func(params: Map[String, Any]) = {
      val m = params("month").toString.toInt
      if (m == 9) throw new RuntimeException("boom")
      spark.range(2).select($"id", lit(m).as("v"))
    }
    val (_, r1) = ParquetCache.loadOrCalculateWithReport(
      spark, func, dir, Seq("month" -> Seq(1, 2)), log = false)
    assert(r1.hits == 0 && r1.rebuilds == 2 && r1.failed.isEmpty)
    assert(r1.built.toSet == Set(Map("month" -> 1), Map("month" -> 2)))

    val (_, r2) = ParquetCache.loadOrCalculateWithReport(
      spark, func, dir, Seq("month" -> Seq(1, 2, 3)), log = false)
    assert(r2.hits == 2 && r2.rebuilds == 1 && r2.failed.isEmpty)
    assert(r2.loaded.toSet == Set(Map("month" -> 1), Map("month" -> 2)))
    assert(r2.built == Seq(Map("month" -> 3)))

    // error=ignore failures are reported, not silent
    val (_, r3) = ParquetCache.loadOrCalculateWithReport(
      spark, func, dir, Seq("month" -> Seq(1, 9)), log = false)
    assert(r3.hits == 1 && r3.rebuilds == 0 && r3.failed.size == 1)
    assert(r3.failed.head._1 == Map("month" -> 9))
    assert(r3.failed.head._2.contains("boom"))

    // overwrite reports rebuilds, not hits
    val (_, r4) = ParquetCache.loadOrCalculateWithReport(
      spark, func, dir, Seq("month" -> Seq(1)), overwrite = true, log = false)
    assert(r4.hits == 0 && r4.rebuilds == 1)
  }

  test("loadOrCalculate: partition filters prune to one directory") {
    val dir = Files.createTempDirectory("graft_pc2").toString + "/cache"
    def func(params: Map[String, Any]) =
      spark.range(2).select($"id")
    val df = ParquetCache.loadOrCalculate(
      spark, func, dir, Seq("k" -> Seq("a", "b")), log = false)
    val pruned = df.where($"k" === "a")
    assert(pruned.count() == 2)
    // partition pruning: physical scan should mention PartitionFilters on k
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("k"))
  }

  test("loadOrCalculate: error=ignore skips failing combinations") {
    val dir = Files.createTempDirectory("graft_pc3").toString + "/cache"
    def func(params: Map[String, Any]) = {
      if (params("k") == "bad") throw new RuntimeException("boom")
      spark.range(2).select($"id")
    }
    val df = ParquetCache.loadOrCalculate(
      spark, func, dir, Seq("k" -> Seq("ok", "bad")), log = false)
    assert(df.count() == 2)
    intercept[RuntimeException] {
      ParquetCache.loadOrCalculate(
        spark, func, dir, Seq("k" -> Seq("bad")), log = false, error = "stop")
    }
  }
}
