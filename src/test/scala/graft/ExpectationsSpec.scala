package graft

import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rules: Seq[Expectation],
      rows: Seq[(java.lang.Long, java.lang.Double, String)]) =
    Expectations.validate(rows.toDF("k", "x", "s"), rules)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  private val clean: Seq[(java.lang.Long, java.lang.Double, String)] =
    Seq((1L, 1.0, "A"), (2L, 2.0, "B"), (3L, 3.0, "C"))

  test("all five rule kinds pass on clean data") {
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val out = run(Seq(
      NotNull("k"), InRange("x", 0, 10), MatchesRegex("s", "^[A-Z]$"),
      Unique(Seq("k")), RefIntegrity("k", dim, "dk")), clean)
    assert(out.size == 5)
    assert(out.values.forall { case (v, t, p) => v == 0L && t == 3L && p })
  }

  test("each rule counts exactly its own violations") {
    val dim = Seq(1L, 2L).toDF("dk")
    val rows: Seq[(java.lang.Long, java.lang.Double, String)] = Seq(
      (1L, 1.0, "A"),
      (null, -5.0, "bb"),   // null key, below range, regex fail
      (2L, 99.0, "C"),      // above range
      (2L, 2.0, "D"),       // duplicate key, orphan-free
      (7L, 3.0, "E"))       // orphan fk
    val out = run(Seq(
      NotNull("k"), InRange("x", 0, 10), MatchesRegex("s", "^[A-Z]$"),
      Unique(Seq("k")), RefIntegrity("k", dim, "dk")), rows)
    assert(out(("not_null", "k")) == ((1L, 5L, false)))
    assert(out(("in_range", "x")) == ((2L, 5L, false)))
    assert(out(("regex", "s")) == ((1L, 5L, false)))
    assert(out(("unique", "k")) == ((1L, 5L, false)))
    assert(out(("ref_integrity", "k")) == ((1L, 5L, false)))
  }

  test("nulls violate only not_null, never range/regex/ref rules") {
    val dim = Seq(1L).toDF("dk")
    val rows: Seq[(java.lang.Long, java.lang.Double, String)] =
      Seq((1L, null, null), (null, null, null))
    val out = run(Seq(
      NotNull("x"), InRange("x", 0, 10), MatchesRegex("s", "^[A-Z]$"),
      RefIntegrity("k", dim, "dk")), rows)
    assert(out(("not_null", "x"))._1 == 2L)
    assert(out(("in_range", "x"))._1 == 0L)
    assert(out(("regex", "s"))._1 == 0L)
    assert(out(("ref_integrity", "k"))._1 == 0L)
  }

  test("unique counts repeated null keys and multi-column tuples") {
    val rows: Seq[(java.lang.Long, java.lang.Double, String)] = Seq(
      (null, 1.0, "A"), (null, 1.0, "B"),   // two null keys: 1 violation
      (5L, 1.0, "C"), (5L, 1.0, "C"), (5L, 1.0, "C"))
    val single = run(Seq(Unique(Seq("k"))), rows)
    assert(single(("unique", "k"))._1 == 3L) // 5 rows - {null, 5} = 3
    val multi = run(Seq(Unique(Seq("k", "s"))), rows)
    // 5 rows − 3 distinct tuples {(null,A),(null,B),(5,C)} = 2
    assert(multi(("unique", "k,s"))._1 == 2L)
  }

  test("ref integrity uses the distinct dim key set (dup dim keys are fine)") {
    val dim = Seq(1L, 1L, 1L).toDF("dk")
    val out = run(Seq(RefIntegrity("k", dim, "dk")), clean)
    // total must stay 3: the dup-keyed dim must not fan the fact out
    assert(out(("ref_integrity", "k")) == ((2L, 3L, false)))
  }

  test("empty input: zero violations over zero rows, all pass") {
    val out = run(Seq(NotNull("k"), Unique(Seq("k"))),
      Seq.empty[(java.lang.Long, java.lang.Double, String)])
    assert(out.values.toSet == Set((0L, 0L, true)))
  }

  test("failingSamples: each rule samples exactly its own offenders with values") {
    val dim = Seq(1L, 2L).toDF("dk")
    val rows: Seq[(java.lang.Long, java.lang.Double, String, Long)] = Seq(
      (1L, 1.0, "A", 10L),
      (null, -5.0, "bb", 11L),  // null key, below range, regex fail
      (2L, 99.0, "C", 12L),     // above range
      (2L, 2.0, "D", 13L),      // duplicate key (with row 12)
      (7L, 3.0, "E", 14L))      // orphan fk
    val df = rows.toDF("k", "x", "s", "rid")
    val out = Expectations.failingSamples(df, Seq(
      NotNull("k"), InRange("x", 0, 10), MatchesRegex("s", "^[A-Z]$"),
      Unique(Seq("k")), RefIntegrity("k", dim, "dk")),
      orderCol = "rid", maxPerRule = 5)
      .as[(String, String, Int, Long, Option[String])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).toSeq).toMap
    assert(out("not_null").map(r => (r._4, r._5)) == Seq((11L, None)))
    assert(out("in_range").map(r => (r._4, r._5.get)) ==
      Seq((11L, "-5.0"), (12L, "99.0")))
    assert(out("regex").map(r => (r._4, r._5.get)) == Seq((11L, "bb")))
    // BOTH copies of the duplicated key sample (ranked by rid)
    assert(out("unique").map(_._4) == Seq(12L, 13L))
    assert(out("ref_integrity").map(r => (r._4, r._5.get)) == Seq((14L, "7")))
  }

  test("failingSamples: the cap binds per rule and compiles to WindowGroupLimit") {
    val rows = (0L until 100L).map(i => (null: java.lang.Long, i))
    val df = rows.toDF("k", "rid")
    val q = Expectations.failingSamples(df, Seq(NotNull("k")), "rid",
      maxPerRule = 3)
    val got = q.as[(String, String, Int, Long, Option[String])].collect()
      .sortBy(_._3)
    // exactly 3 samples: the LOWEST keys, ranked 1..3
    assert(got.map(r => (r._3, r._4)).toSeq == Seq((1, 0L), (2, 1L), (3, 2L)))
    // map-side pre-pruning before the rule-partitioned shuffle
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    // deterministic under repartitioning
    val again = Expectations.failingSamples(df.repartition(7),
      Seq(NotNull("k")), "rid", maxPerRule = 3)
      .as[(String, String, Int, Long, Option[String])].collect().sortBy(_._3)
    assert(got.toSeq == again.toSeq)
  }

  test("failingSamples: temp-name family survives adversarial input columns") {
    val dim = Seq(1L).toDF("dk")
    val df = Seq((2L, 5L, "x", 7L))
      .toDF("k", "__exps_ref_4", "__exps_e", "rid")
    val out = Expectations.failingSamples(df,
      Seq(RefIntegrity("k", dim, "dk"), Unique(Seq("k"))), "rid")
      .as[(String, String, Int, Long, Option[String])].collect()
    assert(out.map(_._1).toSet == Set("ref_integrity"))
  }
}
