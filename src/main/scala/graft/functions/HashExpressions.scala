package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by the native hash expressions' interpreted
  * and codegen paths. All md5-derived values are bit-compatible with
  * the SQL formulations in the DuckDB oracles (md5 of the token's
  * UTF-8 bytes; hex-nibble arithmetic documented per function).
  */
object HashKernels {

  // One digest instance per task thread: `getInstance` does a
  // provider lookup per call, which dominates the hashing itself when
  // the kernel runs once per token (millions of calls per partition).
  private val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = localMd5.get()
    d.reset()
    d.digest(bytes)
  }

  /** SimHash signature over a token array: per token ONE md5; the
    * `bits`-wide feature hash is the integer value of the digest's
    * first bits/4 hex nibbles (big-endian); signature bit j is the
    * sign of the Σ(2·bit_j−1) vote. `bits` must be a multiple of 4,
    * ≤ 60 (fits a long; the DuckDB mirror addresses hex char
    * `bits/4 − j/4`, bit `j%4`).
    */
  def simHash(tokens: ArrayData, bits: Int): Long = {
    val nibs = bits / 4
    val votes = new Array[Int](bits)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      if (s != null) {
        val d = md5(s.getBytes)
        var tb = 0L
        var i = 0
        while (i < nibs) {
          val nib = if (i % 2 == 0) (d(i / 2) >> 4) & 0xf else d(i / 2) & 0xf
          tb = (tb << 4) | nib
          i += 1
        }
        var j = 0
        while (j < bits) { votes(j) += ((((tb >>> j) & 1L).toInt) * 2 - 1); j += 1 }
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** Chunk-minhash minima over a token array: ONE md5 per token;
    * hash function h is the 16-bit big-endian value of digest bytes
    * (2h, 2h+1) — i.e. hex chars [4h+1, 4h+4] — and the minimum is
    * returned as 4 lowercase hex chars (numeric min ≡ lexicographic
    * min at fixed width). Empty input → null minima, matching
    * `array_min([])`.
    */
  def chunkMins(tokens: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Int.MaxValue)
    val n = tokens.numElements()
    var any = false
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      if (s != null) {
        any = true
        val d = md5(s.getBytes)
        var h = 0
        while (h < numHashes) {
          val v = ((d(2 * h) & 0xff) << 8) | (d(2 * h + 1) & 0xff)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      t += 1
    }
    val out = new Array[Any](numHashes)
    if (any) {
      var h = 0
      while (h < numHashes) {
        out(h) = UTF8String.fromString(f"${mins(h)}%04x")
        h += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Jaccard of two DISTINCT string arrays:
    * |A∩B| / (|A|+|B|−|A∩B|) — the value of
    * `size(array_intersect)/size(array_union)` on distinct inputs.
    * Null on null elements (mirroring intersect's null handling is
    * unnecessary here: upstream shingle arrays contain no nulls).
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[UTF8String](math.max(16, na * 2))
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (set.contains(b.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Jaccard of two DISTINCT long arrays (hashed feature sets): sort
    * both and merge-count the intersection — no boxing, no hash set.
    * Same contract as [[jaccard]] over the hashed elements.
    */
  def jaccardLong(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0
    var j = 0
    var inter = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) == ys(j)) { inter += 1; i += 1; j += 1 }
      else if (xs(i) < ys(j)) i += 1
      else j += 1
    }
    inter.toDouble / (xs.length + ys.length - inter).toDouble
  }

  private val NGRAM_SPACE = UTF8String.fromString(" ")

  /** See [[TopNgramCharFrac]]: maxCount × (gram chars − separators) /
    * total token chars, NON-distinct grams, ties to the binary-smallest
    * gram. Fewer than n tokens or zero token chars → 0.0.
    */
  def topNgramCharFrac(tokens: ArrayData, n: Int): Double = {
    val nt = tokens.numElements()
    val toks = new Array[UTF8String](nt)
    var total = 0L
    var i = 0
    while (i < nt) {
      val t = tokens.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      total += toks(i).numChars()
      i += 1
    }
    if (nt < n || total == 0L) return 0.0
    val counts = new java.util.HashMap[UTF8String, Integer](nt * 2)
    var best: UTF8String = null
    var bestCount = 0
    i = 0
    while (i <= nt - n) {
      val slice = new Array[UTF8String](n)
      System.arraycopy(toks, i, slice, 0, n)
      val gram = UTF8String.concatWs(NGRAM_SPACE, slice: _*)
      val c = counts.merge(gram, Integer.valueOf(1), (a, b) => Integer.valueOf(a.intValue() + b.intValue())).intValue()
      if (c > bestCount || (c == bestCount && gram.compareTo(best) < 0)) {
        best = gram
        bestCount = c
      }
      i += 1
    }
    bestCount.toDouble * (best.numChars() - (n - 1)) / total.toDouble
  }

  /** See [[CharEntropy]]. Terms rounded to 6 dp HALF_UP via the
    * shortest-decimal BigDecimal (matching Spark's own `round` on
    * doubles and DuckDB's `round(x, 6)::DECIMAL`), summed exactly in
    * long micro-units — order-independent by construction.
    */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var n = 0
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      counts.computeIfAbsent(Integer.valueOf(cp), _ => new Array[Int](1))(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    val invLn2 = 1.0 / math.log(2.0)
    var micros = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      val term = -(p * (math.log(p) * invLn2))
      micros += java.math.BigDecimal.valueOf(term)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
    }
    micros / 1e6
  }

  /** ONE-pass per-script character counts — the native twin of the
    * remove-and-diff regex device in
    * [[TextAnalysis.scriptSignals]], bit-identical by construction:
    * [latin, cyrillic, arabic, han, hangul, digit, letters], each
    * matched code point contributing `Character.charCount` UTF-16
    * units (the script classes are BMP-only → always 1; `\p{L}`
    * matches astral letters → 2, exactly what the regex device's
    * `length − length(removed)` reports). The regex formulation runs
    * SEVEN full regexp_replace passes, each allocating a rebuilt
    * string — on payload-heavy rows that was the whole cost of
    * q_script_mismatch.
    */
  def scriptCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Long](7)
    val len = str.length
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= 0xC0 && cp <= 0xD6) || (cp >= 0xD8 && cp <= 0xF6) ||
          (cp >= 0xF8 && cp <= 0x24F)) out(0) += w
      else if (cp >= 0x400 && cp <= 0x4FF) out(1) += w
      else if (cp >= 0x600 && cp <= 0x6FF) out(2) += w
      else if (cp >= 0x4E00 && cp <= 0x9FFF) out(3) += w
      else if (cp >= 0xAC00 && cp <= 0xD7AF) out(4) += w
      else if (cp >= '0' && cp <= '9') out(5) += w
      if (Character.isLetter(cp)) out(6) += w
      i += w
    }
    new GenericArrayData(out.map(Long.box).toArray[Any])
  }

  /** See [[DeflateRatio]]. */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

/** Distinct character k-shingles of a string (code-point semantics,
  * matching `substring`/`length`); input shorter than k → the whole
  * string, matching `Dedup.charShingles`'s HOF formulation.
  */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharShingles.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  def shingles(s: UTF8String, k: Int): ArrayData = {
    val n = s.numChars()
    if (n < k) return new GenericArrayData(Array[Any](s))
    // UTF8String.substring(i, i + k) re-walks the char offsets from
    // byte 0 on EVERY call — O(chars²) per document, measured as the
    // dominant cost of the whole dedup signature pass. Walk the
    // offsets once, then emit zero-copy views over one immutable byte
    // buffer (getBytes copies unless it can return the full base
    // array; clone in that one case so a reused reader buffer can
    // never alias the output).
    val raw = s.getBytes
    val bytes = if (raw.asInstanceOf[AnyRef] eq s.getBaseObject) raw.clone() else raw
    val offs = new Array[Int](n + 1)
    var ci = 0
    var b = 0
    while (ci < n) {
      offs(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    offs(n) = bytes.length
    val seen = new java.util.LinkedHashSet[UTF8String](math.min(n * 2, 1 << 16))
    var i = 0
    while (i <= n - k) {
      seen.add(UTF8String.fromBytes(bytes, offs(i), offs(i + k) - offs(i)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct word n-grams over a PRE-SPLIT token array (space-joined),
  * matching `Dedup.wordShingles`'s HOF formulation: fewer tokens than
  * n → one shingle of all tokens joined.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNgrams.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val SPACE = UTF8String.fromString(" ")

  def ngrams(tokens: ArrayData, n: Int): ArrayData = {
    val nt = tokens.numElements()
    val toks = new Array[UTF8String](nt)
    var i = 0
    while (i < nt) { toks(i) = tokens.getUTF8String(i); i += 1 }
    if (nt < n) {
      return new GenericArrayData(
        Array[Any](UTF8String.concatWs(SPACE, toks: _*)))
    }
    val seen = new java.util.LinkedHashSet[UTF8String](nt * 2)
    i = 0
    while (i <= nt - n) {
      val slice = new Array[UTF8String](n)
      System.arraycopy(toks, i, slice, 0, n)
      seen.add(UTF8String.concatWs(SPACE, slice: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native SimHash — bit-identical to the HOF formulation mirrored by
  * the DuckDB oracle (see SparkEntry.simhashSql).
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 4 && bits <= 60 && bits % 4 == 0,
    "simHash bits must be a multiple of 4, between 4 and 60")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    HashKernels.simHash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simHash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Native chunk-minhash minima (array of `numHashes` 4-hex-char
  * strings) — one md5 per token for ALL hash functions.
  */
case class ChunkMinHash(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 8, "md5 has 8 16-bit chunks")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "chunk_minhash"

  override def nullSafeEval(input: Any): Any =
    HashKernels.chunkMins(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.chunkMins($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): ChunkMinHash =
    copy(child = newChild)
}

/** Native Jaccard similarity of two distinct string arrays. */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

/** Native Jaccard similarity of two distinct long arrays (hashed
  * feature sets — the `fast` family's verification payload).
  */
case class JaccardSimLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.jaccardLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.jaccardLong($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimLong =
    copy(left = newLeft, right = newRight)
}

/** All-languages stopword hit counts in ONE token pass — the codegen
  * replacement for per-language interpreted HOF `filter`s in
  * `TextAnalysis.languageId`/`qualityScore` (4 interpreted array
  * passes become one hash-probe loop). Output: array<int> of
  * occurrence counts, one per [[StopwordHitsAll.Langs]] entry, same
  * values as `size(filter(toks, array_contains(stopwords(lang), _)))`
  * per language (the documented, oracle-portable twin).
  */
case class StopwordHitsAll(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_hits_all"

  override def nullSafeEval(input: Any): Any =
    StopwordHitsAll.hits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StopwordHitsAll.hits($c)")

  override protected def withNewChildInternal(newChild: Expression): StopwordHitsAll =
    copy(child = newChild)
}

object StopwordHitsAll {
  /** Fixed language order of the output array. The first four
    * positions are load-bearing (qualityScore reads position 1 = en);
    * new languages append at the end.
    */
  val Langs: Seq[String] = Seq("en", "es", "fr", "de", "pt", "it", "nl", "ru")

  // token → bitmask of languages containing it (a word can be a
  // stopword in several languages, e.g. "de"/"la"/"que")
  private val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    Langs.zipWithIndex.foreach { case (l, i) =>
      TextAnalysis.stopwords(l).foreach { w =>
        val k = UTF8String.fromString(w)
        m.put(k, Integer.valueOf(m.getOrDefault(k, Integer.valueOf(0)).intValue() | (1 << i)))
      }
    }
    m
  }

  def hits(tokens: ArrayData): ArrayData = {
    val counts = new Array[Int](Langs.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val mask = masks.get(tokens.getUTF8String(i))
        if (mask != null) {
          var mv = mask.intValue()
          while (mv != 0) {
            counts(java.lang.Integer.numberOfTrailingZeros(mv)) += 1
            mv &= mv - 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }
}

/** Fraction of token characters covered by occurrences of the MOST
  * FREQUENT word `n`-gram (Rae et al. 2021's top-n-gram repetition
  * signal): maxCount × gramChars / totalTokenChars, over NON-distinct
  * grams. Ties break to the lexicographically (binary UTF-8 ==
  * codepoint) smallest gram so the DuckDB oracle's
  * `ORDER BY c DESC, g ASC` picks the identical winner. One pass, one
  * hash map — the declarative formulation needs an explode + two
  * aggregations per document.
  */
case class TopNgramCharFrac(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_ngram_char_frac"

  override def nullSafeEval(input: Any): Any =
    HashKernels.topNgramCharFrac(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.topNgramCharFrac($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TopNgramCharFrac =
    copy(child = newChild)
}

/** Shannon entropy (bits per character) over the per-document
  * code-point histogram — the cheap "too repetitive / binary junk"
  * quality proxy. Each histogram term `-p·log2(p)` is rounded to 6 dp
  * HALF_UP and summed EXACTLY in micro-units, so the result is
  * independent of iteration order and bit-replayable by the DuckDB
  * oracle's grouped-count + `DECIMAL(18,6)` term-sum formulation
  * (the same determinism device as the Naive-Bayes log-odds sums).
  * One pass, one hash map; the declarative formulation needs a
  * per-row explode + two aggregations.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    HashKernels.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** One-pass [latin, cyrillic, arabic, han, hangul, digit, letters]
  * character counts (see [[HashKernels.scriptCounts]]) — feeds
  * [[TextAnalysis.scriptSignals]]; deterministic, so Spark's
  * subexpression elimination evaluates it once per row however many
  * struct fields read from it.
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_counts"

  override def nullSafeEval(input: Any): Any =
    HashKernels.scriptCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) graft.functions.HashKernels.scriptCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

/** Deflate compression ratio (compressed bytes / original bytes,
  * zlib level 6, raw stream): the classic "compresses too well =
  * repetitive" signal. The exact ratio depends on the zlib encoder,
  * so this has no SQL-replayable oracle — ScalaTest-only by declared
  * design (SURVEY §4); empty input reports 1.0.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    HashKernels.deflateRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Occurrence count of caller-supplied blocklist words in a token
  * array — the C4 "bad words" gate's kernel (Raffel et al. 2020
  * §2.2 filter corpora on a public blocklist at TOKEN granularity —
  * exact token match, so "assess" never hits a 3-letter entry). The
  * word set ships inside the serialized plan (`addReferenceObj`) and
  * builds one per-JVM hash set; one probe loop under whole-stage
  * codegen, same shape as [[StopwordHitsAll]] but parameterized.
  */
case class WordlistHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  require(words.nonEmpty, "empty blocklist")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "wordlist_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def doEval(tokens: ArrayData): Int = {
    var hits = 0
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override def nullSafeEval(input: Any): Any =
    doEval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordlist", this, classOf[WordlistHits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.doEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordlistHits =
    copy(child = newChild)
}

/** Static kernel for the native Jaro–Winkler expression. */
object FuzzyKernels {

  /** Classic Jaro–Winkler similarity (Winkler 1990), matching
    * DuckDB's `jaro_winkler_similarity` semantics exactly: Jaro with
    * the ⌊max(|s|,|t|)/2⌋−1 matching window and half-transposition
    * count, boosted only when jaro > 0.7 by l·0.1·(1 − jaro) over
    * the ≤ 4-char common prefix; any empty side scores 0 (including
    * both-empty — VERIFIED against the oracle's DuckDB 1.0.0:
    * `jaro_winkler_similarity('','')` = 0.0 there, as are the
    * one-empty-side cases; newer rapidfuzz builds return 1.0 for
    * both-empty, so re-check this edge if the oracle engine is ever
    * upgraded). Operates on UTF-16 code
    * units of the decoded strings, identical to DuckDB over the
    * ASCII entity keys the pairs operator blocks on.
    */
  def jaroWinkler(av: UTF8String, bv: UTF8String): Double = {
    val s = av.toString
    val t = bv.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sM = new Array[Boolean](n)
    val tM = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && s.charAt(i) == t.charAt(j)) {
          sM(i) = true; tM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < n) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - trans / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n, m))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native Jaro–Winkler similarity — codegen'd; see
  * [[FuzzyKernels.jaroWinkler]] for the exact semantics contract.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzyKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FuzzyKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
