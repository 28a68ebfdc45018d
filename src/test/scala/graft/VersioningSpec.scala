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
}
