package graft

import graft.functions.{Bpe, Unigram}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: Viterbi kernel determinism (hand-computed
  * DP tables), trainer semantics on a controlled corpus, encode
  * totality / decode round-trip, and the shipped fixture.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def scoreMap(ps: (String, Int)*): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    ps.foreach { case (p, s) => m.put(p, Integer.valueOf(s)) }
    m
  }

  test("viterbi: max-likelihood segmentation, hand-computed") {
    // [ab][ab] = -8M beats [a][b][a][b] = -12M and any mix
    val m = scoreMap("a" -> -3000000, "b" -> -3000000,
      "ab" -> -4000000, "ba" -> -10000000)
    assert(Unigram.viterbi("abab", m, 2).toSeq == Seq("ab", "ab"))
    // prefers the higher-probability split even when it uses MORE
    // pieces: [a][b] = -6M beats [ab] = -7M
    val m2 = scoreMap("a" -> -3000000, "b" -> -3000000, "ab" -> -7000000)
    assert(Unigram.viterbi("ab", m2, 2).toSeq == Seq("a", "b"))
  }

  test("viterbi: score tie breaks to fewer pieces") {
    // [ab] = -5M == [a][b] = -5M -> fewer pieces wins
    val m = scoreMap("a" -> -2000000, "b" -> -3000000, "ab" -> -5000000)
    assert(Unigram.viterbi("ab", m, 2).toSeq == Seq("ab"))
    // [aa] = -4M == [a][a] = -4M -> [aa]
    val m2 = scoreMap("a" -> -2000000, "aa" -> -4000000)
    assert(Unigram.viterbi("aa", m2, 2).toSeq == Seq("aa"))
  }

  test("trainer: frequent words become whole pieces, EM prunes unused seeds") {
    val docs = Seq.fill(50)("table scan table scan table").toDF("text")
    val spec = Unigram.train(docs, "text", numPieces = 266,
      emRounds = 2, maxPieceLen = 6, maxUnitLen = 16)
    assert(spec.pieces.length <= 266)
    val multis = spec.pieces.map(_._1).filter(_.length >= 2)
    // the corpus's whole units (Ġ-prefixed interior words and the
    // bare first word) must be among the kept pieces
    assert(multis.contains("Ġtable") || multis.contains("table"))
    assert(multis.contains("Ġscan"))
    // encode with the trained spec: interior words are single pieces
    val n = Seq("table scan table").toDF("s")
      .select(Unigram.unigramTokenCount($"s", spec).as("n")).as[Int].head()
    assert(n <= 4, s"trained vocab should cover whole words, got $n pieces")
  }

  test("trainer: scores are the quantized smoothed log-probs, ids ordered") {
    val docs = Seq.fill(10)("aa aa").toDF("text")
    val spec = Unigram.train(docs, "text", numPieces = 260,
      emRounds = 1, maxPieceLen = 4)
    // 256 symbols first (lexicographic), then multis by (count desc, piece asc)
    assert(spec.pieces.length >= 257)
    val symbolPart = spec.pieces.take(256).map(_._1)
    assert(symbolPart == symbolPart.sorted)
    assert(symbolPart.forall(_.length == 1))
    // every score is a negative micro-nat log-prob
    assert(spec.pieces.forall(_._2 < 0))
  }

  test("encode totality: any bytes segment; decode round-trips modulo whitespace") {
    val spec = Unigram.testFixture
    val texts = Seq("the table", "héllo wörld", "日本語テスト", "",
      "tabs\tand\nnewlines", "  leading and  runs ", "zzz ~!@# 123")
    val df = texts.toDF("s")
    val toks = df.select(Unigram.unigramTokens($"s", spec).as("t"))
      .as[Seq[String]].collect()
    val counts = df.select(Unigram.unigramTokenCount($"s", spec).as("n"))
      .as[Int].collect()
    toks.zip(counts).foreach { case (t, n) => assert(t.length == n) }
    // decode(tokens) == the whitespace-NORMALIZED original (runs of
    // whitespace read back as one space — the SentencePiece
    // convention); non-whitespace bytes are lossless
    toks.zip(texts).foreach { case (t, s) =>
      assert(Bpe.decode(t) == s.split("\\s+").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("fixture: 256 symbols + 16 learned pieces; ids stable; chunks windowed") {
    val spec = Unigram.testFixture
    assert(spec.pieces.length == 272)
    assert(spec.pieces.take(256).forall(_._1.length == 1))
    val ids = Seq("the table").toDF("s")
      .select(Unigram.unigramTokenIds($"s", spec).as("i"))
      .as[Seq[Int]].head()
    assert(ids.forall(i => i >= 0 && i < 272))
    val chunks = Seq("table scan table scan").toDF("s")
      .select(Unigram.unigramChunks($"s", spec, maxTokens = 2).as("c"))
      .as[Seq[String]].head()
    assert(chunks.mkString == "table scan table scan")
    // overlap: stride = maxTokens − overlap = 1, so window i decodes
    // pieces [i, i+2) of the token stream — check against the stream
    val df = Seq("table scan table").toDF("s")
    val toks = df.select(Unigram.unigramTokens($"s", spec).as("t"))
      .as[Seq[String]].head()
    val ov = df.select(
      Unigram.unigramChunks($"s", spec, maxTokens = 2, overlap = 1).as("c"))
      .as[Seq[String]].head()
    val expected = (0 until math.max(1, toks.length - 1))
      .map(i => Bpe.decode(toks.slice(i, i + 2)))
    assert(ov == expected)
  }
}
