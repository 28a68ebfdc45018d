package graft

import graft.operators.Preference
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private val judgments = Seq(
    // A vs B: A wins 2-1 (one judgment recorded in reversed orientation)
    ("A", "B", "a"), ("A", "B", "b"), ("B", "A", "b"),
    // A vs C: 1-1 with a tie
    ("A", "C", "a"), ("C", "A", "a"), ("A", "C", "tie"),
    // B vs C: B sweeps
    ("B", "C", "a"), ("C", "B", "b"))

  test("winRates: orientations pool, counts and rates are exact") {
    val out = Preference.winRates(judgments.toDF("a", "b", "w"), "a", "b", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          Option(r.get(6)).map(_.asInstanceOf[Double])))).toMap
    assert(out(("A", "B")) == ((3L, 2L, 1L, 0L, Some(0.666667))))
    assert(out(("A", "C")) == ((3L, 1L, 1L, 1L, Some(0.5))))
    assert(out(("B", "C")) == ((2L, 2L, 0L, 0L, Some(1.0))))
  }

  test("winRates: all-tied pair has null win rate") {
    val out = Preference.winRates(
      Seq(("X", "Y", "tie")).toDF("a", "b", "w"), "a", "b", "w").head()
    assert(out.getLong(5) == 1L && out.isNullAt(6))
  }

  test("copelandScores: majority wins, tied majorities give half points") {
    val out = Preference.copelandScores(
      judgments.toDF("a", "b", "w"), "a", "b", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getInt(6)))).toMap
    // A: beats B, ties C -> 1.5; B: loses A, beats C -> 1.0; C: 0.5
    assert(out("A") == ((1L, 1L, 0L, 1.5, 1)))
    assert(out("B") == ((1L, 0L, 1L, 1.0, 2)))
    assert(out("C") == ((0L, 1L, 1L, 0.5, 3)))
  }

  test("bradleyTerry: strengths order with win dominance; symmetric pairs tie") {
    val df = Seq(
      ("A", "B", "a"), ("A", "B", "a"), ("A", "C", "a"), ("A", "C", "a"),
      ("B", "C", "a"), ("B", "C", "a"), ("B", "A", "a"), ("C", "A", "a"))
      .toDF("a", "b", "w")
    val out = Preference.bradleyTerry(df, "a", "b", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(out("A")._1 == 4L && out("A")._2 == 6L)
    assert(out("A")._3 > out("B")._3 && out("B")._3 > out("C")._3)
    assert(out("A")._4 == 1 && out("B")._4 == 2 && out("C")._4 == 3)
    // mean-1 normalization: strengths sum to ~k
    val s = out.values.map(_._3).sum
    assert(math.abs(s - 3.0) < 1e-3)
    val sym = Preference.bradleyTerry(
      Seq(("A", "B", "a"), ("B", "A", "a")).toDF("a", "b", "w"), "a", "b", "w")
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getInt(4)))).toMap
    assert(sym("A") == ((1.0, 1)) && sym("B") == ((1.0, 1)))
  }

  test("bradleyTerry: ties drop; zero-win items stay rankable; repartition-invariant") {
    val df = Seq(
      ("A", "B", "a"), ("A", "B", "tie"), ("A", "C", "a"), ("B", "C", "a"))
      .toDF("a", "b", "w")
    val one = Preference.bradleyTerry(df, "a", "b", "w").collect().toSeq
      .sortBy(_.getString(0))
    val c = one.find(_.getString(0) == "C").get
    assert(c.getLong(1) == 0L && c.getDouble(3) == 0.0 && c.getInt(4) == 3)
    val many = Preference.bradleyTerry(df.repartition(13), "a", "b", "w")
      .collect().toSeq.sortBy(_.getString(0))
    assert(one == many) // exact decimal path: bit-identical
  }

  test("preference guards: bad winner, self-comparison, maxItems all raise") {
    intercept[Exception] {
      Preference.winRates(
        Seq(("A", "B", "A")).toDF("a", "b", "w"), "a", "b", "w").collect()
    }
    intercept[Exception] {
      Preference.winRates(
        Seq(("A", "A", "a")).toDF("a", "b", "w"), "a", "b", "w").collect()
    }
    intercept[Exception] {
      Preference.bradleyTerry(
        Seq(("A", "B", "a"), ("B", "C", "a"), ("C", "D", "a"))
          .toDF("a", "b", "w"), "a", "b", "w", maxItems = 2).collect()
    }
  }
}
