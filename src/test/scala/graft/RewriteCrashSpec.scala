package graft

import graft.operators.{ManagedTables, Pq}
import org.apache.spark.sql.functions._

/** Crash contract of the ONE sibling-rewrite helper
  * (ManagedTables.rewriteTable) behind compactIvfIndex,
  * compactMinHashSignatures, and writePqIndex: a crash after the
  * sibling is complete but before the swap leaves the ORIGINAL table
  * untouched (still queryable, properties intact) plus a complete
  * sibling — never half a table — and the next rewrite recovers by
  * superseding the sibling.
  */
class RewriteCrashSpec extends SparkSpec {
  import spark.implicits._

  private def crash(body: => Unit): Unit = {
    val ex = intercept[IllegalStateException](body)
    assert(ex.getMessage.contains("injected crash"))
  }

  test("bucketed rewrite: injected crash leaves original + complete sibling; next rewrite recovers") {
    val t = "graft_crash_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${t}__compact")
    val df = (0L until 40L).map(i => (i % 4, i)).toDF("k", "v")
    ManagedTables.rewriteTable(spark, t, df, Some((2, Seq("k"))),
      Map("graft.test.keep" -> "yes"))
    val before = spark.table(t).as[(Long, Long)].collect().toSet

    // crash mid-compaction (the df reads the original, like a real
    // compaction)
    crash(ManagedTables.rewriteTableImpl(spark, t,
      spark.table(t).where($"v" < 20), Some((2, Seq("k"))),
      Map.empty, failBeforeSwap = true))
    // original untouched, properties intact
    assert(spark.table(t).as[(Long, Long)].collect().toSet == before)
    val props = spark.sql(s"SHOW TBLPROPERTIES $t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.test.keep").contains("yes"))
    // the sibling is complete (all 20 surviving rows)
    assert(spark.table(s"${t}__compact").count() == 20)

    // recovery: a rerun supersedes the crashed sibling and swaps
    ManagedTables.rewriteTable(spark, t,
      spark.table(t).where($"v" < 20), Some((2, Seq("k"))))
    assert(spark.table(t).count() == 20)
    assert(!spark.catalog.tableExists(s"${t}__compact"))
    // graft.* props survived the swap via the copy step
    val props2 = spark.sql(s"SHOW TBLPROPERTIES $t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2.get("graft.test.keep").contains("yes"))
  }

  test("plain rewrite (PQ-table shape): crash-safe first build and rebuild") {
    val t = "graft_crash_plain"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${t}__compact")
    // crash during the FIRST build: no original to damage, sibling
    // complete, table still absent
    crash(ManagedTables.rewriteTableImpl(spark, t,
      Seq((1, "a"), (2, "b")).toDF("id", "s"), None,
      Map("graft.pq.buildId" -> "b0"), failBeforeSwap = true))
    assert(!spark.catalog.tableExists(t))
    assert(spark.table(s"${t}__compact").count() == 2)
    // recovery
    ManagedTables.rewriteTable(spark, t,
      Seq((1, "a"), (2, "b")).toDF("id", "s"), None,
      Map("graft.pq.buildId" -> "b1"))
    assert(spark.table(t).count() == 2)
    // rebuild over the live table: crash keeps the old rows readable
    crash(ManagedTables.rewriteTableImpl(spark, t,
      Seq((9, "z")).toDF("id", "s"), None,
      Map("graft.pq.buildId" -> "b2"), failBeforeSwap = true))
    assert(spark.table(t).count() == 2)
  }

  test("writePqIndex: a crash between the two table swaps fails the read path fast") {
    val rnd = new scala.util.Random(5)
    val c = (0L until 64L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
    Pq.writePqIndex(c, "vec", "id", "graft_crash_pq", dim = 8, m = 2,
      numCentroids = 4)
    val q = c.where($"id" < 2)
    // healthy index searches fine
    assert(Pq.pqTopKFromIndex(spark, "graft_crash_pq", q, "vec", "id", k = 3)
      .count() > 0)
    // simulate the crash window: the codebooks table swapped to a NEW
    // build, the codes table still the old one
    ManagedTables.rewriteTable(spark, "graft_crash_pq__codebooks",
      spark.table("graft_crash_pq__codebooks"), None,
      Map("graft.pq.buildId" -> "other-build"))
    val ex = intercept[IllegalStateException] {
      Pq.pqTopKFromIndex(spark, "graft_crash_pq", q, "vec", "id", k = 3)
    }
    assert(ex.getMessage.contains("graft.pq.buildId"))
    // a full rebuild heals it
    Pq.writePqIndex(c, "vec", "id", "graft_crash_pq", dim = 8, m = 2,
      numCentroids = 4)
    assert(Pq.pqTopKFromIndex(spark, "graft_crash_pq", q, "vec", "id", k = 3)
      .count() > 0)
  }
}
