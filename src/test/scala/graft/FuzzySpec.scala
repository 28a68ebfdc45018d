package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def bruteDist1(vals: Seq[String]): Set[(String, String)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val v = vals.distinct
    (for {
      a <- v; b <- v if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
  }

  test("editDistancePairs: matches the all-pairs baseline (completeness + no false pairs)") {
    val vals = Seq(
      "spark", "spa4k", "sparkk", "spark", "park", "sprk", "stark",
      "batch", "botch", "bath", "match", "watch", "hatch",
      "align", "alien", "allen", "totally-unrelated")
    val got = Fuzzy.editDistancePairs(vals.toDF("v"), "v")
      .select($"a", $"b").as[(String, String)].collect().toSet
    assert(got == bruteDist1(vals))
    assert(got.contains(("park", "spark")))  // single insert
    assert(got.contains(("spa4k", "spark"))) // substitution
    assert(got.contains(("spark", "sparkk"))) // single delete
    assert(!got.contains(("batch", "match")) ||
      bruteDist1(vals).contains(("batch", "match"))) // sanity: sub at pos 0 IS dist 1
  }

  test("editDistancePairs: dist column is always 1 and pairs are unique") {
    val vals = Seq("aaaa", "aaab", "aaba", "abaa", "baaa", "aaa", "aaaaa")
    val rows = Fuzzy.editDistancePairs(vals.toDF("v"), "v", minLen = 2)
      .collect()
    assert(rows.forall(_.getInt(2) == 1))
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("editDistancePairs: length gate and null/dup tolerance") {
    val df = Seq(Some("ab"), Some("ab"), None, Some("abc"),
      Some("x" * 80), Some("x" * 80 + "y")).toDF("v")
    // maxLen 10 drops the 80-char values entirely
    val got = Fuzzy.editDistancePairs(df, "v", minLen = 2, maxLen = 10)
      .select($"a", $"b").as[(String, String)].collect().toSet
    assert(got == Set(("ab", "abc")))
  }

  test("editDistancePairs: maxBucket drops oversize buckets deterministically") {
    // 12 values all sharing the deletion key "aa" (3-char 'a'-heavy
    // strings): cap 5 kills that bucket; pairs that ALSO share a
    // finer key survive.
    val vals = ('b' to 'm').map(c => s"a${c}a") :+ "aba_"
    val capped = Fuzzy.editDistancePairs(vals.toDF("v"), "v", maxBucket = 5)
      .select($"a", $"b").as[(String, String)].collect().toSet
    val uncapped = Fuzzy.editDistancePairs(vals.toDF("v"), "v")
      .select($"a", $"b").as[(String, String)].collect().toSet
    assert(capped.subsetOf(uncapped))
    assert(uncapped == bruteDist1(vals))
    // the a?a–a?a pairs share ONLY the killed "aa" bucket; the
    // insert pair survives through its own finer "aba" key
    assert(capped == Set(("aba", "aba_")))
  }

  test("editDistancePairs: randomized equivalence with the brute force") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val vals = Seq.fill(120)(
      (0 until (2 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(3))).mkString)
    val got = Fuzzy.editDistancePairs(vals.toDF("v"), "v")
      .select($"a", $"b").as[(String, String)].collect().toSet
    assert(got == bruteDist1(vals))
  }

  test("jaroWinkler: reference values, boost threshold, empty-side zero") {
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(Fuzzy.jaroWinkler($"a", $"b")).head().getDouble(0)
    // classic reference pairs — exact doubles match DuckDB's
    // jaro_winkler_similarity (probed values)
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("a", "") == 0.0 && jw("", "") == 0.0)
    // the 0.7 boost threshold: jaro 0.5 with a shared prefix stays 0.5
    assert(jw("aaxxxxxx", "aayyyyyy") == 0.5)
    // just above the threshold boosts
    assert(jw("ab", "abcdefghij") == 0.7866666666666667)
  }

  test("jaroWinklerPairs: blocked candidates only, threshold filter, validation") {
    val df = Seq(
      ("b1", "jonathan"), ("b1", "jonathon"), // high JW — pair
      ("b1", "zebra"),                        // same block, low JW
      ("b2", "jonathan2")                     // other block: no pair
    ).toDF("blk", "name")
    val out = Fuzzy.jaroWinklerPairs(df, "name", Seq("blk"), threshold = 0.9)
      .as[(String, String, Double)].collect().toSeq
    assert(out.map(p => (p._1, p._2)) == Seq(("jonathan", "jonathon")))
    assert(out.head._3 > 0.9)
    intercept[IllegalArgumentException] {
      Fuzzy.jaroWinklerPairs(df, "name", Nil)
    }
  }
}
