package graft

import graft.operators.Versioning
import org.apache.spark.sql.functions._

class VersioningSpec extends SparkSpec {
  import spark.implicits._

  private def statuses(
      old: Seq[(Long, String, String)],
      neu: Seq[(Long, String, String)]): Map[Long, String] =
    Versioning.snapshotDiff(
      old.toDF("id", "a", "b"), neu.toDF("id", "a", "b"), "id", Seq("a", "b"))
      .as[(Long, String)].collect().toMap

  test("snapshotDiff: added / removed / changed / unchanged partition the id space") {
    val out = statuses(
      Seq((1L, "x", "p"), (2L, "y", "q"), (3L, "z", "r")),
      Seq((1L, "x", "p"), (2L, "y", "Q"), (4L, "w", "s")))
    assert(out == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff: null vs empty-string and boundary shifts are 'changed'") {
    // null ≠ '' under the null tag, and ("ab","c") ≠ ("a","bc") under
    // the separator — the two classic concat-hash collisions.
    val old = Seq((1L, null.asInstanceOf[String], "p"), (2L, "ab", "c"))
    val neu = Seq((1L, "", "p"), (2L, "a", "bc"))
    val out = statuses(old, neu)
    assert(out == Map(1L -> "changed", 2L -> "changed"))
  }

  test("snapshotDiffStats: bounded counts match the per-row diff") {
    val old = (1L to 100L).map(i => (i, s"t$i", "s"))
    val neu = old.collect {
      case (i, t, s) if i % 10 != 3 =>
        (if (i % 10 == 5) i + 1000 else i, if (i % 10 == 4) t + "!" else t, s)
    }
    val stats = Versioning.snapshotDiffStats(
      old.toDF("id", "a", "b"), neu.toDF("id", "a", "b"), "id", Seq("a", "b"))
      .as[(String, Long)].collect().toMap
    assert(stats == Map(
      "added" -> 10L, "removed" -> 20L, "changed" -> 10L, "unchanged" -> 70L))
  }

  test("snapshotDiff: identical snapshots are all 'unchanged', empty sides degrade") {
    val s = Seq((1L, "x", "y"), (2L, "u", "v"))
    assert(statuses(s, s).values.toSet == Set("unchanged"))
    assert(statuses(Nil, s).values.toSet == Set("added"))
    assert(statuses(s, Nil).values.toSet == Set("removed"))
  }

  test("applyChanges: upsert/delete/insert with latest-wins") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val changes = Seq(
      (2L, "b2", 1L, "upsert"),  // update
      (3L, "c", 1L, "delete"),   // delete
      (5L, "e", 1L, "upsert"),   // insert
      (2L, "b3", 2L, "upsert"),  // later version wins
      (5L, "e", 2L, "delete"),   // insert then delete -> gone
      (4L, "dX", 1L, "delete"),  // delete then later re-upsert
      (4L, "d2", 3L, "upsert"))
      .toDF("id", "v", "version", "op")
    val out = Versioning.applyChanges(base, changes, "id", "version", "op")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b3"), (4L, "d2")))
  }

  test("applyChanges: same-version ties break deterministically (op desc)") {
    val base = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq((1L, "a2", 1L, "upsert"), (1L, "zzz", 1L, "delete"))
      .toDF("id", "v", "version", "op")
    // 'upsert' > 'delete' lexically -> the upsert wins the tie
    val out = Versioning.applyChanges(base, changes, "id", "version", "op")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a2")))
  }

  test("applyChanges: unknown op fails the job; bad shapes rejected") {
    val base = Seq((1L, "a")).toDF("id", "v")
    val bad = Seq((1L, "x", 1L, "uspert")).toDF("id", "v", "version", "op")
    val e = intercept[Exception](
      Versioning.applyChanges(base, bad, "id", "version", "op").collect())
    assert(e.getMessage.contains("unknown op") ||
      e.getCause != null && e.getCause.getMessage.contains("unknown op"))
    intercept[IllegalArgumentException](Versioning.applyChanges(
      base.withColumnRenamed("id", "k"), bad, "id", "version", "op"))
    intercept[IllegalArgumentException](Versioning.applyChanges(
      base.withColumn("op", lit("x")), bad, "id", "version", "op"))
  }

  test("applyChanges: partitioning-invariant") {
    val rnd = new scala.util.Random(3)
    val base = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    val changes = Seq.fill(300)((rnd.nextInt(250).toLong + 1, s"c${rnd.nextInt(1000)}",
      rnd.nextInt(5).toLong, if (rnd.nextBoolean()) "upsert" else "delete"))
      .toDF("id", "v", "version", "op")
    val a = Versioning.applyChanges(base, changes, "id", "version", "op")
      .collect().toSet
    val b = Versioning.applyChanges(
      base.repartition(7), changes.repartition(11), "id", "version", "op")
      .collect().toSet
    assert(a == b)
  }

  private def scd2(rows: Seq[(Long, String, Long)]) =
    Versioning.scd2History(rows.toDF("id", "v", "ver"), "id", "ver", Seq("v"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet

  test("scd2History: intervals chain, last is current") {
    val out = scd2(Seq((1L, "a", 1L), (1L, "b", 3L), (1L, "c", 7L), (2L, "x", 2L)))
    assert(out == Set(
      (1L, "a", 1L, Some(3L), false),
      (1L, "b", 3L, Some(7L), false),
      (1L, "c", 7L, None, true),
      (2L, "x", 2L, None, true)))
  }

  test("scd2History: consecutive no-op re-assertions collapse into the open interval") {
    val out = scd2(Seq(
      (1L, "a", 1L), (1L, "a", 2L), (1L, "b", 3L), (1L, "a", 4L), (1L, "a", 5L)))
    // a@2 collapses into [1,3); a re-appearing at 4 is a REAL change
    // (non-consecutive), a@5 collapses into it.
    assert(out == Set(
      (1L, "a", 1L, Some(3L), false),
      (1L, "b", 3L, Some(4L), false),
      (1L, "a", 4L, None, true)))
  }

  test("scd2History: duplicate versions pick the fingerprint-desc winner deterministically") {
    val rows = Seq((1L, "a", 1L), (1L, "z", 1L), (1L, "m", 1L))
    val out = scd2(rows)
    assert(out.size == 1)
    val winner = out.head._2
    // md5-desc winner of {"a","z","m"} — stable across runs and shuffles
    assert(scd2(scala.util.Random.shuffle(rows)) == out)
    assert(Set("a", "z", "m").contains(winner))
  }

  test("scd2History: null payloads fingerprint distinctly from empty strings") {
    val df = Seq[(Long, String, Long)]((1L, null, 1L), (1L, "", 2L))
      .toDF("id", "v", "ver")
    val out = Versioning.scd2History(df, "id", "ver", Seq("v"))
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSet
    assert(out == Set(
      (1L, None, 1L, Some(2L), false),
      (1L, Some(""), 2L, None, true)))
  }

  test("snapshotAsOf: covering intervals only; later inserts and edits invisible") {
    val hist = Versioning.scd2History(Seq(
      (1L, "a", 1L), (1L, "b", 3L), (1L, "c", 7L), // edits around asOf
      (2L, "x", 5L), // inserted AFTER asOf=4 — must be absent
      (3L, "m", 2L), (3L, "m", 4L), // no-op keeps [2, null) open
      (4L, "q", 4L)) // valid_from == asOf is included
      .toDF("id", "v", "ver"), "id", "ver", Seq("v"))
    val at4 = Versioning.snapshotAsOf(hist, asOf = 4L)
      .as[(Long, String)].collect().toSet
    assert(at4 == Set((1L, "b"), (3L, "m"), (4L, "q")))
    // asOf at the far future = the is_current rows
    val at99 = Versioning.snapshotAsOf(hist, asOf = 99L)
      .as[(Long, String)].collect().toSet
    assert(at99 == Set((1L, "c"), (2L, "x"), (3L, "m"), (4L, "q")))
    // before every change: empty table
    assert(Versioning.snapshotAsOf(hist, asOf = 0L).count() == 0)
    // bookkeeping columns are dropped
    assert(Versioning.snapshotAsOf(hist, 4L).columns.toSeq == Seq("id", "v"))
    // non-history frames are rejected
    intercept[IllegalArgumentException] {
      Versioning.snapshotAsOf(Seq((1L, "a")).toDF("id", "v"), 4L)
    }
  }

  test("scd2History: partitioning-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(400)((rnd.nextInt(40).toLong,
      s"p${rnd.nextInt(6)}", rnd.nextInt(20).toLong))
    val a = scd2(rows)
    val b = Versioning.scd2History(
      rows.toDF("id", "v", "ver").repartition(13), "id", "ver", Seq("v"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(a == b)
  }
}
