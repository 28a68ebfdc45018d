package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Randomized-model tests: the native kernels must agree with
  * straightforward driver-side Scala models on arbitrary inputs
  * (unicode, whitespace runs, short strings). Seeded → reproducible.
  */
class NativeKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val vocab = Seq(
    "alpha", "beta", "gamma", "کلمه", "中文字", "día", "x", "yz", "q1w2", "longword123")

  private def randText(): String =
    Seq.fill(1 + rng.nextInt(8))(vocab(rng.nextInt(vocab.length))).mkString(" ")

  private def modelCharShingles(s: String, k: Int): Seq[String] = {
    val cps = s.codePoints().toArray
    def sub(from: Int, until: Int) = new String(cps, from, until - from)
    if (cps.length < k) Seq(s)
    else (0 to cps.length - k).map(i => sub(i, i + k)).distinct
  }

  private def modelWordNgrams(s: String, n: Int): Seq[String] = {
    val toks = s.trim.split("\\s+", -1).toSeq
    if (toks.length < n) Seq(toks.mkString(" "))
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).distinct
  }

  test("charShingles agrees with the code-point model on 200 random texts") {
    for (k <- Seq(1, 3, 5, 8)) {
      val texts = Seq.fill(50)(randText())
      val got = texts.toDF("t")
        .select(Dedup.charShingles($"t", k)).collect()
        .map(_.getSeq[String](0).toSeq).toSeq
      val want = texts.map(modelCharShingles(_, k))
      assert(got == want, s"k=$k")
    }
  }

  test("wordShingles agrees with the token model on 200 random texts") {
    for (n <- Seq(1, 2, 3, 4)) {
      val texts = Seq.fill(50)(randText())
      val got = texts.toDF("t")
        .select(Dedup.wordShingles($"t", n)).collect()
        .map(_.getSeq[String](0).toSeq).toSeq
      val want = texts.map(modelWordNgrams(_, n))
      assert(got == want, s"n=$n")
    }
  }

  test("jaccardSim agrees with the set model on 100 random array pairs") {
    val cases = Seq.fill(100) {
      (Seq.fill(1 + rng.nextInt(6))(vocab(rng.nextInt(vocab.length))).distinct,
        Seq.fill(1 + rng.nextInt(6))(vocab(rng.nextInt(vocab.length))).distinct)
    }
    val got = cases.toDF("a", "b")
      .select(Dedup.jaccardSim($"a", $"b")).as[Double].collect().toSeq
    val want = cases.map { case (a, b) =>
      a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size.toDouble
    }
    assert(got == want)
  }

  test("simHash: invariant to duplicate features, full signature range reachable") {
    val texts = Seq.fill(100)(randText())
    val withDups = texts.map(t => t + " " + t.split(" ").head)
    val base = texts.toDF("t").select(Dedup.simHash($"t", 28, 1)).as[Long].collect()
    // distinct unigrams are unchanged by repeating an existing word
    val dup = withDups.toDF("t").select(Dedup.simHash($"t", 28, 1)).as[Long].collect()
    assert(base.toSeq == dup.toSeq)
    assert(base.forall(s => s >= 0 && s < (1L << 28)))
    assert(base.distinct.length > 50) // signatures spread
  }

  test("UnigramEncode agrees with the driver-side unit+Viterbi model on 200 random texts") {
    val spec = graft.functions.Unigram.testFixture
    // unicode words, whitespace runs, punctuation, leading/trailing ws
    val messy = Seq(" ", "\t", "\n", "  ")
    def messyText(): String = {
      val parts = Seq.fill(1 + rng.nextInt(8))(vocab(rng.nextInt(vocab.length)))
      parts.mkString(messy(rng.nextInt(messy.length))) +
        (if (rng.nextBoolean()) " " else "")
    }
    val texts = Seq.fill(200)(messyText())
    val got = texts.toDF("t")
      .select(graft.functions.Unigram.unigramTokens($"t", spec)).collect()
      .map(_.getSeq[String](0).toSeq).toSeq
    val want = texts.map { t =>
      graft.functions.Unigram.unitStrings(t).toSeq.flatMap(u =>
        graft.functions.Unigram.viterbi(u, spec.scoreOf, spec.maxPieceLen).toSeq)
    }
    assert(got == want)
    // counts/ids are projections of the same stream
    val counts = texts.toDF("t")
      .select(graft.functions.Unigram.unigramTokenCount($"t", spec))
      .as[Int].collect().toSeq
    assert(counts == want.map(_.length))
  }
}
