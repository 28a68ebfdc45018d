package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) subword tokenization — the OTHER
  * half of production tokenizer practice next to [[Bpe]] (Kudo 2018:
  * a vocabulary of independent pieces with log-probabilities, encode
  * = the max-likelihood segmentation, train = EM re-estimation over
  * segmentations followed by pruning to the target vocabulary).
  *
  * Text model: the SentencePiece convention — units are WHITESPACE
  * runs' complements (split on `\s+`, empties dropped), every unit
  * after the first carries the word-boundary marker (the space
  * symbol Ġ), and unit bytes map through [[Bpe.byteToChar]] so
  * pieces share [[Bpe]]'s 256-symbol alphabet and the two tokenizers
  * A/B directly on the same corpus. [[Bpe.decode]] inverts tokens up
  * to whitespace normalization (runs of whitespace read back as one
  * space — the standard SentencePiece lossiness).
  *
  * Everything is INTEGER-exact so training and encoding replay
  * bit-identically in the DuckDB oracle: piece scores are quantized
  * to micro-nats (`floor(1e6 · ln((count + 1) / (total + |V|)))` —
  * Laplace-smoothed log-probabilities), Viterbi compares integer
  * score sums with a deterministic per-cell tie-break (higher score,
  * then fewer pieces, then longer last piece), and EM counts are
  * exact integers.
  */
object Unigram {

  /** A trained tokenizer: `pieces(id) = (piece, score)` — scores in
    * micro-nats (see object doc). All 256 byte symbols must be
    * present, so encoding is total (no unknown token is ever needed).
    */
  case class Spec(pieces: Vector[(String, Int)]) {
    require(pieces.map(_._1).distinct.length == pieces.length,
      "duplicate pieces in spec")

    @transient lazy val scoreOf: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pieces.length * 2)
      pieces.foreach { case (p, s) => m.put(p, Integer.valueOf(s)) }
      m
    }
    @transient lazy val idOf: Map[String, Int] =
      pieces.map(_._1).zipWithIndex.toMap
    @transient lazy val maxPieceLen: Int =
      if (pieces.isEmpty) 0 else pieces.iterator.map(_._1.length).max
  }

  /** Parse a SentencePiece-style piece table (one `piece<TAB>score`
    * line per id, line order = id order) from a filesystem path or,
    * with a `classpath:` prefix, a resource. The byte→unicode symbol
    * mapping guarantees pieces never contain a literal tab/newline.
    */
  def loadPieces(path: String): Spec = {
    val lines =
      if (path.startsWith("classpath:")) {
        val res = path.stripPrefix("classpath:")
        val in = getClass.getClassLoader.getResourceAsStream(res)
        require(in != null, s"classpath resource not found: $res")
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      } else {
        val src = scala.io.Source.fromFile(path, "UTF-8")
        try src.getLines().toVector finally src.close()
      }
    Spec(lines.filter(_.nonEmpty).map { l =>
      val t = l.lastIndexOf('\t')
      require(t > 0, s"malformed piece line (want 'piece<TAB>score'): $l")
      (l.substring(0, t), l.substring(t + 1).toInt)
    })
  }

  /** Render a [[Spec]] back to the [[loadPieces]] format. */
  def renderPieces(spec: Spec): String =
    spec.pieces.map { case (p, s) => s"$p\t$s" }.mkString("", "\n", "\n")

  /** The authored test fixture shipped with the library (trained by
    * [[train]] on the bench corpus at sf0.01: 256 byte symbols + 16
    * learned multi-symbol pieces). Swap for a real published
    * SentencePiece vocabulary in production.
    */
  lazy val testFixture: Spec =
    loadPieces("classpath:graft/unigram/test_pieces.tsv")

  /** Whitespace pre-tokenization (see the object doc): byte-mapped
    * units of `text`, the word-boundary Ġ on every unit but the
    * first. Package-visible for the trainer's distributed count pass
    * and the encode expression.
    */
  private[graft] def unitStrings(
      text: String): scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val words = text.split("\\s+")
    var k = 0
    while (k < words.length) {
      val w = words(k)
      if (w.nonEmpty) {
        val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val sb = new StringBuilder(bytes.length + 1)
        if (out.nonEmpty) sb.append('Ġ') // Ġ = byteToChar(' ')
        bytes.foreach(b => sb.append(Bpe.byteToChar(b & 0xff)))
        out += sb.toString
      }
      k += 1
    }
    out
  }

  /** Byte-mapped whitespace UNITS of `c` (no segmentation) — the
    * corpus side of [[train]], the [[Bpe.preTokenUnits]] twin.
    */
  def units(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(UnigramEncode(
      org.apache.spark.sql.GraftSqlBridge.expression(c), Vector.empty, "units"))

  // ---- the deterministic Viterbi kernel --------------------------

  /** Max-likelihood segmentation of one byte-mapped unit under
    * integer piece scores. Per-cell decision: among all pieces of
    * length ≤ `maxPieceLen` ending at position i, pick the candidate
    * with (highest prefix score + piece score, then fewest pieces,
    * then longest piece) — each cell's choice is unique (two
    * candidates tying on all three have the same length and end, so
    * they ARE the same piece), which makes the whole segmentation
    * deterministic and engine-replayable. Always succeeds: every
    * single symbol is in the vocabulary by [[Spec]] contract.
    */
  private[graft] def viterbi(
      unit: String,
      scoreOf: java.util.HashMap[String, Integer],
      maxPieceLen: Int): Array[String] = {
    val n = unit.length
    if (n == 0) return Array.empty
    val bestScore = new Array[Long](n + 1)
    val bestNp = new Array[Int](n + 1)
    val bestL = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var chosenScore = Long.MinValue
      var chosenNp = Int.MaxValue
      var chosenL = 0
      var L = 1
      val maxL = math.min(i, maxPieceLen)
      while (L <= maxL) {
        val s = scoreOf.get(unit.substring(i - L, i))
        if (s != null) {
          val cs = bestScore(i - L) + s.intValue()
          val cn = bestNp(i - L) + 1
          if (cs > chosenScore || (cs == chosenScore && (cn < chosenNp ||
            (cn == chosenNp && L > chosenL)))) {
            chosenScore = cs; chosenNp = cn; chosenL = L
          }
        }
        L += 1
      }
      require(chosenL > 0,
        s"no piece covers position $i of unit — spec is missing a byte symbol")
      bestScore(i) = chosenScore; bestNp(i) = chosenNp; bestL(i) = chosenL
      i += 1
    }
    val out = new Array[String](bestNp(n))
    var pos = n
    var k = bestNp(n) - 1
    while (pos > 0) {
      out(k) = unit.substring(pos - bestL(pos), pos)
      pos -= bestL(pos)
      k -= 1
    }
    out
  }

  /** The quantized Laplace-smoothed log-probability (micro-nats):
    * `floor(1e6 · ln((count + 1) / (total + vocabSize)))`. Division
    * first (both operands integer-exact in double), one `ln`, one
    * multiply, one floor — the exact same op sequence the SQL replay
    * uses, so the two engines quantize identically.
    */
  private[graft] def microNatScore(count: Long, total: Long, vocabSize: Long): Int =
    math.floor(1e6 * math.log((count + 1).toDouble / (total + vocabSize))).toInt

  // ---- training ---------------------------------------------------

  /** TRAIN a unigram vocabulary from a corpus — the same two-phase
    * architecture as [[Bpe.train]]: the only corpus-scale pass is a
    * DISTRIBUTED pre-token count (map-side combined groupBy whose
    * output is VOCABULARY-bounded — distinct pre-tokens, not rows);
    * seeding, EM and pruning then run on the driver over that
    * (unit, count) table.
    *
    *  1. SEED: every substring of every unit up to `maxPieceLen`
    *     symbols, weighted by `count(unit) × occurrences` (plus the
    *     full 256-symbol alphabet), scored by [[microNatScore]].
    *  2. EM (`emRounds` hard-EM iterations): Viterbi-segment every
    *     unit under the current scores, re-count pieces from the
    *     segmentations (exact integers), drop multi-symbol pieces no
    *     segmentation used, re-score.
    *  3. PRUNE: keep all 256 symbols plus the top
    *     `numPieces − 256` multi-symbol pieces by (final count DESC,
    *     piece ASC); re-score over the pruned vocabulary.
    *
    * Units longer than `maxUnitLen` symbols are excluded from
    * TRAINING statistics (the SentencePiece max-piece-sentence
    * analog; encoding has no such limit) — this also bounds the
    * oracle replay's DP depth by contract. `maxUnits` /
    * `maxSeedPieces` are the driver-safety contract, mirroring
    * [[Bpe.train]]: fail fast rather than silently truncate.
    *
    * @return a [[Spec]]: the 256 byte symbols in lexicographic
    *         symbol order, then kept multi-symbol pieces in
    *         (count DESC, piece ASC) order.
    */
  def train(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      numPieces: Int,
      emRounds: Int = 2,
      maxPieceLen: Int = 6,
      maxUnitLen: Int = 16,
      maxUnits: Int = 1000000,
      maxSeedPieces: Int = 2000000): Spec = {
    require(numPieces > 256, "numPieces must exceed the 256 byte symbols")
    require(emRounds >= 1, "emRounds must be >= 1")
    require(maxPieceLen >= 2, "maxPieceLen must be >= 2")
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    val counted = graft.operators.Parallelism.spread(df)
      .select(explode(units(col(textCol))).as("__u"))
      .groupBy(col("__u")).agg(count(lit(1)).as("__c"))
    val rows = counted.limit(maxUnits + 1).collect()
    require(rows.length <= maxUnits,
      s"train: corpus has more than $maxUnits distinct pre-tokens — " +
        "raise maxUnits deliberately or pre-truncate the tail")
    val unitRows: Array[(String, Long)] = rows
      .map(r => (r.getString(0), r.getLong(1)))
      .filter(_._1.length <= maxUnitLen)
    val symbols: Array[String] = Bpe.byteToChar.map(_.toString).sorted

    // 1. seed: substring weights
    val seed = new java.util.HashMap[String, java.lang.Long]()
    unitRows.foreach { case (u, c) =>
      var st = 0
      while (st < u.length) {
        var L = 1
        val maxL = math.min(maxPieceLen, u.length - st)
        while (L <= maxL) {
          val p = u.substring(st, st + L)
          seed.put(p, java.lang.Long.valueOf(
            (if (seed.containsKey(p)) seed.get(p).longValue() else 0L) + c))
          L += 1
        }
        st += 1
      }
    }
    require(seed.size <= maxSeedPieces,
      s"train: more than $maxSeedPieces distinct seed substrings — " +
        "raise maxSeedPieces deliberately or lower maxPieceLen")

    def scoresFrom(counts: java.util.HashMap[String, java.lang.Long])
      : (java.util.HashMap[String, Integer], Vector[String]) = {
      val multis = {
        val b = Vector.newBuilder[String]
        counts.forEach((k, v) => if (k.length >= 2 && v.longValue() > 0) b += k)
        b.result()
      }
      // every stored count is > 0 (seed weights and EM counts only
      // ever accumulate), and absent vocabulary members contribute 0
      var total = 0L
      counts.forEach((_, v) => total += v.longValue())
      val vSize = 256L + multis.length
      val sc = new java.util.HashMap[String, Integer]((multis.length + 256) * 2)
      symbols.foreach { s =>
        val c = if (counts.containsKey(s)) counts.get(s).longValue() else 0L
        sc.put(s, Integer.valueOf(microNatScore(c, total, vSize)))
      }
      multis.foreach { p =>
        sc.put(p, Integer.valueOf(microNatScore(counts.get(p).longValue(), total, vSize)))
      }
      (sc, multis)
    }

    // 2. hard EM
    var (scores, _) = scoresFrom(seed)
    var lastCounts: java.util.HashMap[String, java.lang.Long] = seed
    (1 to emRounds).foreach { _ =>
      val counts = new java.util.HashMap[String, java.lang.Long]()
      unitRows.foreach { case (u, c) =>
        viterbi(u, scores, maxPieceLen).foreach { p =>
          counts.put(p, java.lang.Long.valueOf(
            (if (counts.containsKey(p)) counts.get(p).longValue() else 0L) + c))
        }
      }
      lastCounts = counts
      scores = scoresFrom(counts)._1
    }

    // 3. prune + final scores over the pruned vocabulary
    val keptMulti = {
      val b = Vector.newBuilder[(String, Long)]
      lastCounts.forEach((k, v) => if (k.length >= 2 && v.longValue() > 0)
        b += ((k, v.longValue())))
      b.result()
        .sortBy { case (p, c) => (-c, p) }
        .take(numPieces - 256)
    }
    val totalF = keptMulti.map(_._2).sum + symbols.map { s =>
      if (lastCounts.containsKey(s)) lastCounts.get(s).longValue() else 0L
    }.sum
    val vF = 256L + keptMulti.length
    val pieces =
      symbols.toVector.map { s =>
        val c = if (lastCounts.containsKey(s)) lastCounts.get(s).longValue() else 0L
        (s, microNatScore(c, totalF, vF))
      } ++ keptMulti.map { case (p, c) => (p, microNatScore(c, totalF, vF)) }
    Spec(pieces)
  }

  // ---- column API -------------------------------------------------

  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Unigram pieces (byte-unicode symbol strings) of `c`. */
  def unigramTokens(c: Column, spec: Spec): Column =
    column(UnigramEncode(expression(c), spec.pieces, "tokens"))

  /** Exact unigram piece count of `c`. */
  def unigramTokenCount(c: Column, spec: Spec): Column =
    column(UnigramEncode(expression(c), spec.pieces, "count"))

  /** Unigram piece ids of `c` (id = position in the spec). */
  def unigramTokenIds(c: Column, spec: Spec): Column =
    column(UnigramEncode(expression(c), spec.pieces, "ids"))

  /** Overlapping unigram-piece-window chunks decoded back to text —
    * the subword twin of [[TextAnalysis.chunkTokens]], same window
    * contract as [[Bpe.bpeChunks]].
    */
  def unigramChunks(c: Column, spec: Spec, maxTokens: Int, overlap: Int = 0): Column = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens, "0 <= overlap < maxTokens")
    column(UnigramEncode(expression(c), spec.pieces, "chunks", maxTokens, overlap))
  }
}

/** The unigram tokenizer expression (see [[Unigram]]). Same plan
  * shape as [[BpeEncode]]: the piece table ships inside the
  * serialized plan, per-JVM score map, LRU per-unit segmentation
  * cache, and a generated call into the bound instance keeps it
  * inside WholeStageCodegen. `mode`: "tokens" → array<string>,
  * "count" → int, "ids" → array<int>, "chunks" → array<string> of
  * decoded chunk texts.
  */
case class UnigramEncode(
    child: Expression,
    pieces: Vector[(String, Int)],
    mode: String,
    maxTokens: Int = 0,
    overlap: Int = 0) extends UnaryExpression {

  require(
    mode == "units" ||
      Bpe.byteToChar.forall(ch => pieces.exists(_._1 == ch.toString)),
    "unigram spec must contain all 256 byte symbols")

  override def dataType: DataType = mode match {
    case "count" => IntegerType
    case "ids" => ArrayType(IntegerType, containsNull = false)
    case _ => ArrayType(StringType, containsNull = false)
  }
  override def prettyName: String = s"unigram_$mode"

  @transient private lazy val scoreOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    pieces.foreach { case (p, s) => m.put(p, Integer.valueOf(s)) }
    m
  }
  @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    pieces.zipWithIndex.foreach { case ((p, _), i) => m.put(p, Integer.valueOf(i)) }
    m
  }
  @transient private lazy val maxPieceLen: Int =
    pieces.iterator.map(_._1.length).max

  // per-unit segmentation results — same Zipf argument and same
  // bounded access-order LRU as BpeEncode's cache
  private[graft] val CacheCap = 100000
  @transient private lazy val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Array[String]](1 << 14, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean =
          size() > CacheCap
      })

  private def segment(unit: String): Array[String] = {
    val hit = cache.get(unit)
    if (hit != null) return hit
    val seg = Unigram.viterbi(unit, scoreOf, maxPieceLen)
    cache.put(unit, seg)
    seg
  }

  private def encode(text: String): scala.collection.mutable.ArrayBuffer[String] = {
    val units = Unigram.unitStrings(text)
    if (mode == "units") return units
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    units.foreach(u => out ++= segment(u))
    out
  }

  /** Called from both interpreted eval and generated code. */
  def doEval(input: UTF8String): Any = {
    val toks = encode(input.toString)
    mode match {
      case "count" => toks.length
      case "ids" =>
        new GenericArrayData(toks.map(t => Int.box(idOf.get(t).intValue())).toArray[Any])
      case "chunks" =>
        val stride = maxTokens - overlap
        val n = math.max(1,
          math.ceil((toks.length - overlap).toDouble / stride).toInt)
        new GenericArrayData((0 until n).map(i =>
          UTF8String.fromString(
            Bpe.decode(toks.slice(i * stride, i * stride + maxTokens).toSeq)))
          .toArray[Any])
      case _ =>
        new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])
    }
  }

  override def nullSafeEval(input: Any): Any =
    doEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigram", this, classOf[UnigramEncode].getName)
    if (mode == "count")
      defineCodeGen(ctx, ev, c => s"((Integer) $ref.doEval($c)).intValue()")
    else
      defineCodeGen(ctx, ev,
        c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.doEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}
