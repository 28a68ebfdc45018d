package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE tokenization in the public GPT-2 file format
  * (`merges.txt` + `vocab.json`, the OpenAI gpt-2 `encoder.py`
  * algorithm): regex pre-tokenization, byte→unicode symbol mapping,
  * then iterated lowest-rank pair merges per pre-token. Training
  * pipelines size sequences in SUBWORD tokens — whitespace counts
  * under-estimate (and differ per tokenizer), so packing / chunking /
  * budget accounting take a [[Bpe.Spec]] and count exactly what the
  * trainer will see.
  *
  * The expression ships its merge table inside the serialized plan
  * (`addReferenceObj`), builds the rank map once per executor JVM,
  * caches per-pre-token merge results (Zipf-distributed corpora hit
  * the cache almost always), and stays inside WholeStageCodegen via a
  * generated call into the bound instance — no UDF, no broadcast
  * plumbing for the caller.
  */
object Bpe {

  /** The public GPT-2 byte→unicode mapping: printable latin-1 bytes
    * map to themselves, the rest shift to U+0100.. so every byte has
    * a visible, merge-safe symbol (0x20 → 'Ġ').
    */
  lazy val byteToChar: Array[Char] = {
    val visible = (('!'.toInt to '~'.toInt) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val out = new Array[Char](256)
    var shift = 0
    (0 until 256).foreach { b =>
      if (visible(b)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
    }
    out
  }

  lazy val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** GPT-2 pre-tokenizer (contractions, ` ?letters`, ` ?digits`,
    * ` ?other`, trailing/inner whitespace).
    */
  val PreTokenPattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** A loaded tokenizer: ordered merge pairs (rank = position) and an
    * optional token→id vocabulary (required only for id output).
    */
  case class Spec(merges: Seq[(String, String)], vocab: Map[String, Int] = Map.empty)

  /** Parse a GPT-2-format `merges.txt` (optional `#version` header,
    * one `first second` pair per line, rank = line order) from a
    * filesystem path or, with a `classpath:` prefix, a resource.
    */
  def loadMerges(path: String): Seq[(String, String)] = {
    val lines = readAll(path)
    lines.iterator
      .map(_.stripLineEnd)
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
          s"malformed merges line (want 'first second'): $l")
        (l.substring(0, sp), l.substring(sp + 1))
      }
      .toVector
  }

  /** Parse a GPT-2-format `vocab.json` ({"token": id, ...}) — flat
    * string→int object with standard JSON string escapes.
    */
  def loadVocab(path: String): Map[String, Int] = {
    val s = readAll(path).mkString("\n")
    val out = Map.newBuilder[String, Int]
    var i = s.indexOf('{') + 1
    require(i > 0, s"vocab file $path is not a JSON object")
    while ({ while (i < s.length && (s(i).isWhitespace || s(i) == ',')) i += 1
             i < s.length && s(i) == '"' }) {
      val (key, next) = parseJsonString(s, i)
      i = next
      while (i < s.length && (s(i).isWhitespace || s(i) == ':')) i += 1
      val numStart = i
      while (i < s.length && (s(i) == '-' || s(i).isDigit)) i += 1
      out += key -> s.substring(numStart, i).toInt
    }
    out.result()
  }

  private def parseJsonString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1 // past the opening quote
    while (s(i) != '"') {
      if (s(i) == '\\') {
        s(i + 1) match {
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s(i)); i += 1 }
    }
    (sb.toString, i + 1)
  }

  private def readAll(path: String): Seq[String] = {
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
  }

  /** The authored test fixture shipped with the library (GPT-2 file
    * format; 45 merges over the bench corpus's letter distribution).
    * Swap for a real published merges/vocab pair in production.
    */
  lazy val testFixture: Spec = Spec(
    loadMerges("classpath:graft/bpe/test_merges.txt"),
    loadVocab("classpath:graft/bpe/test_vocab.json"))

  /** Deterministic PRODUCTION-SCALE tokenizer (50,000 merges /
    * 50,256-token vocab — the GPT-2 shape) for stress-validating the
    * serialized merge-table plan size, the per-JVM rank-map build,
    * and the LRU pre-token cache at real vocab scale without any
    * network fetch. Merges are layered so every operand exists
    * before it is used and real lowercase text actually fires deep
    * ranks: Ġ+letter (26), letter bigrams (676), Ġ-bigrams (676),
    * left-heavy trigrams (17,576), Ġ-trigrams (17,576), then the
    * first 13,470 left-heavy 4-grams — 50,000 exactly. Vocab = the
    * 256 byte symbols + every merge output, ids in that order
    * (50,256 — coincidentally exactly GPT-2's vocab size).
    */
  lazy val productionScaleSpec: Spec = syntheticSpec(50000)

  /** See [[productionScaleSpec]]; `targetMerges` truncates the level
    * stream for smaller stress points.
    */
  def syntheticSpec(targetMerges: Int): Spec = {
    val letters = ('a' to 'z').map(_.toString)
    val levels: Iterator[(String, String)] =
      letters.iterator.map(l => ("Ġ", l)) ++
        (for { a <- letters.iterator; b <- letters } yield (a, b)) ++
        (for { a <- letters.iterator; b <- letters } yield ("Ġ" + a, b)) ++
        (for { a <- letters.iterator; b <- letters; c <- letters } yield (a + b, c)) ++
        (for { a <- letters.iterator; b <- letters; c <- letters } yield ("Ġ" + a + b, c)) ++
        (for { a <- letters.iterator; b <- letters; c <- letters; d <- letters } yield (a + b + c, d))
    val merges = levels.take(targetMerges).toVector
    val vocab = ((0 until 256).map(b => byteToChar(b).toString) ++
      merges.map { case (f, s) => f + s }).distinct.zipWithIndex.toMap
    Spec(merges, vocab)
  }

  /** Render a [[Spec]] back to GPT-2 file format —
    * (merges.txt content, vocab.json content) — so specs can
    * round-trip the production-size loaders without shipping a 50k
    * fixture file. The 256 base byte symbols include `"` and `\`,
    * which JSON-escape; everything else in a synthetic spec is
    * letters/Ġ and passes through raw (as real vocab.json files do).
    */
  def renderSpecFiles(spec: Spec): (String, String) = {
    val mergesTxt = ("#version: 0.2" +: spec.merges.map { case (f, s) => s"$f $s" })
      .mkString("", "\n", "\n")
    def esc(t: String): String =
      t.replace("\\", "\\\\").replace("\"", "\\\"")
    val vocabJson = spec.vocab.toSeq.sortBy(_._2)
      .map { case (t, i) => s""""${esc(t)}": $i""" }
      .mkString("{", ", ", "}")
    (mergesTxt, vocabJson)
  }

  // ---- column API -------------------------------------------------

  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** BPE tokens (byte-unicode symbol strings) of `c`. */
  def bpeTokens(c: Column, spec: Spec): Column =
    column(BpeEncode(expression(c), spec.merges, Map.empty, "tokens"))

  /** Exact BPE token count of `c` (what a trainer's tokenizer sees). */
  def bpeTokenCount(c: Column, spec: Spec): Column =
    column(BpeEncode(expression(c), spec.merges, Map.empty, "count"))

  /** BPE token ids of `c` per the spec's vocab. Unknown tokens (text
    * outside the vocab's closure) become -1 — fail loudly downstream
    * rather than silently skewing id streams.
    */
  def bpeTokenIds(c: Column, spec: Spec): Column = {
    require(spec.vocab.nonEmpty, "bpeTokenIds needs a vocab (vocab.json)")
    column(BpeEncode(expression(c), spec.merges, spec.vocab, "ids"))
  }

  /** Overlapping BPE-token-window chunks DECODED back to text — the
    * subword twin of [[TextAnalysis.chunkTokens]]: chunk i covers
    * tokens [i·stride, i·stride + maxTokens), stride = maxTokens −
    * overlap, final chunk may be short, blank text → one empty chunk.
    */
  def bpeChunks(c: Column, spec: Spec, maxTokens: Int, overlap: Int = 0): Column = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens, "0 <= overlap < maxTokens")
    column(BpeEncode(expression(c), spec.merges, Map.empty, "chunks",
      maxTokens, overlap))
  }

  /** Decode a sequence of byte-unicode symbol tokens back to text. */
  def decode(tokens: Seq[String]): String = {
    val bytes = tokens.flatMap(_.map(charToByte))
    new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Byte-mapped PRE-TOKEN units of `c` (no merging) — the corpus
    * side of [[train]].
    */
  def preTokenUnits(c: Column): Column =
    column(BpeEncode(expression(c), Nil, Map.empty, "units"))

  /** TRAIN a BPE merge list from a corpus — the standard two-phase
    * architecture every production tokenizer trainer uses: the only
    * corpus-scale pass is a DISTRIBUTED pre-token count (map-side
    * combined groupBy; at 100 TB this is one aggregation whose
    * output is VOCABULARY-bounded — distinct pre-tokens, not rows);
    * the merge loop then runs on the driver over that (unit, count)
    * table. Each step picks the adjacent symbol pair with the
    * highest weighted count (ties to the lexicographically smallest
    * pair; pairs already learned are excluded, so ranks stay unique
    * even when a later merge re-creates an old adjacency) and
    * rewrites all unit states left-to-right non-overlapping — the
    * exact inverse of [[BpeEncode]]'s encode loop, so
    * `encode(train(corpus))` round-trips frequent words to single
    * tokens.
    *
    * `maxUnits` is the driver-safety contract: training fails fast if
    * the corpus has more distinct pre-tokens (raise it deliberately,
    * or pre-truncate the corpus's long tail).
    *
    * @return a [[Spec]] with the learned merges and a GPT-2-shaped
    *         vocab (256 byte symbols in codepoint order, then merge
    *         products in rank order).
    */
  def train(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      numMerges: Int,
      maxUnits: Int = 1000000): Spec = {
    require(numMerges >= 1, "numMerges must be >= 1")
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    val counted = graft.operators.Parallelism.spread(df)
      .select(explode(preTokenUnits(col(textCol))).as("__u"))
      .groupBy(col("__u")).agg(count(lit(1)).as("__c"))
    val rows = counted.limit(maxUnits + 1).collect()
    require(rows.length <= maxUnits,
      s"train: corpus has more than $maxUnits distinct pre-tokens — " +
        "raise maxUnits deliberately or pre-truncate the tail")
    // Incremental trainer (the standard production-trainer shape):
    // pair counts update by DELTA on only the units containing the
    // merged pair, and selection pops a lazy max-heap — per step
    // O(affected units · their length · log P), not O(corpus). A
    // naive full rescan per step is O(units × symbols × numMerges),
    // which dies at a real 30k-merge vocabulary even on a
    // vocabulary-bounded table.
    val states: Array[Array[String]] =
      rows.map(r => r.getString(0).map(_.toString).toArray)
    val weights: Array[Long] = rows.map(_.getLong(1))
    val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairUnits = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.BitSet]
    // heap entries are (count, pair) snapshots; stale ones (count no
    // longer current) are discarded on pop. Order: count DESC, then
    // pair ASC — the exact tie-break of the documented algorithm.
    case class Entry(c: Long, f: String, s: String)
    val heap = new java.util.PriorityQueue[Entry](11,
      new java.util.Comparator[Entry] {
        def compare(a: Entry, b: Entry): Int = {
          if (a.c != b.c) java.lang.Long.compare(b.c, a.c)
          else {
            val cf = a.f.compareTo(b.f)
            if (cf != 0) cf else a.s.compareTo(b.s)
          }
        }
      })
    def bump(p: (String, String), delta: Long, unit: Int): Unit = {
      val nc = pairCounts.getOrElse(p, 0L) + delta
      if (nc <= 0L) pairCounts.remove(p) else pairCounts(p) = nc
      if (delta > 0 && unit >= 0)
        pairUnits.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += unit
      if (nc > 0L) heap.add(Entry(nc, p._1, p._2))
    }
    states.indices.foreach { u =>
      val st = states(u)
      var i = 0
      while (i < st.length - 1) {
        bump((st(i), st(i + 1)), weights(u), u); i += 1
      }
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val learned = scala.collection.mutable.HashSet.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      var best: (String, String) = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        val p = (e.f, e.s)
        // current, positive, and not yet learned → the true argmax
        if (!learned(p) && pairCounts.getOrElse(p, 0L) == e.c) best = p
      }
      if (best == null) exhausted = true
      else {
        merges += best
        learned += best
        val (f, s) = best
        pairUnits.getOrElse(best, scala.collection.mutable.BitSet.empty)
          .foreach { u =>
            val st = states(u)
            var contains = false
            var i = 0
            while (!contains && i < st.length - 1) {
              contains = st(i) == f && st(i + 1) == s; i += 1
            }
            if (contains) { // pairUnits sets are lazily stale
              val w = weights(u)
              i = 0
              while (i < st.length - 1) { bump((st(i), st(i + 1)), -w, -1); i += 1 }
              val out = new scala.collection.mutable.ArrayBuffer[String](st.length)
              i = 0
              while (i < st.length) {
                if (i < st.length - 1 && st(i) == f && st(i + 1) == s) {
                  out += f + s; i += 2
                } else { out += st(i); i += 1 }
              }
              states(u) = out.toArray
              val ns = states(u)
              i = 0
              while (i < ns.length - 1) { bump((ns(i), ns(i + 1)), w, u); i += 1 }
            }
          }
      }
    }
    val byteSyms = byteToChar.map(_.toString).sorted
    val vocab = byteSyms.zipWithIndex.toMap ++
      merges.zipWithIndex.map { case ((f, s), r) => (f + s) -> (256 + r) }
    Spec(merges.toVector, vocab)
  }
}

/** The tokenizer expression (see [[Bpe]]). `mode`: "tokens" →
  * array<string>, "count" → int, "ids" → array<int>, "chunks" →
  * array<string> of decoded chunk texts.
  */
case class BpeEncode(
    child: Expression,
    merges: Seq[(String, String)],
    vocab: Map[String, Int],
    mode: String,
    maxTokens: Int = 0,
    overlap: Int = 0) extends UnaryExpression {

  override def dataType: DataType = mode match {
    case "count" => IntegerType
    case "ids" => ArrayType(IntegerType, containsNull = false)
    case _ => ArrayType(StringType, containsNull = false)
  }
  override def prettyName: String = s"bpe_$mode"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((f, s), r) =>
      m.put(f + " " + s, Integer.valueOf(r))
    }
    m
  }

  // per-pre-token merge results; Zipfian corpora repeat pre-tokens
  // constantly, so this turns the merge loop into a hash probe. The
  // access-order LRU bound evicts one cold entry per insert once the
  // cap is hit, so a pathological corpus (all-unique words) can't
  // retain every entry AND the hot head is never thrown away (the
  // previous wholesale clear() dropped the Zipf head with it). The
  // synchronizedMap mutex also guards the access-order relink on get.
  private[graft] val CacheCap = 100000

  // test hook: the LRU bound is invisible from the outside otherwise
  private[graft] def cacheSize: Int = cache.size

  @transient private lazy val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Array[String]](1 << 14, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean =
          size() > CacheCap
      })

  private def bpeUnit(unit: String): Array[String] = {
    val hit = cache.get(unit)
    if (hit != null) return hit
    var word: Array[String] = unit.map(_.toString).toArray
    var done = word.length < 2
    while (!done) {
      var bestRank = Integer.MAX_VALUE
      var bf: String = null
      var bs: String = null
      var i = 0
      while (i < word.length - 1) {
        val r = ranks.get(word(i) + " " + word(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bf = word(i); bs = word(i + 1)
        }
        i += 1
      }
      if (bf == null) done = true
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
        var j = 0
        while (j < word.length) {
          if (j < word.length - 1 && word(j) == bf && word(j + 1) == bs) {
            out += bf + bs; j += 2
          } else { out += word(j); j += 1 }
        }
        word = out.toArray
        done = word.length < 2
      }
    }
    cache.put(unit, word)
    word
  }

  /** Full encode: pre-tokenize, byte-map, merge (or just the
    * byte-mapped units when `merge = false` — the trainer's corpus
    * pass).
    */
  private def encode(
      text: String,
      merge: Boolean = true): scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val m = Bpe.PreTokenPattern.matcher(text)
    while (m.find()) {
      val bytes = m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sb = new StringBuilder(bytes.length)
      bytes.foreach(b => sb.append(Bpe.byteToChar(b & 0xff)))
      if (merge) out ++= bpeUnit(sb.toString) else out += sb.toString
    }
    out
  }

  /** Called from both interpreted eval and generated code. */
  def doEval(input: UTF8String): Any = {
    val toks = encode(input.toString, merge = mode != "units")
    mode match {
      case "count" => toks.length
      case "ids" =>
        new GenericArrayData(toks.map(t =>
          Int.box(vocab.getOrElse(t, -1))).toArray[Any])
      case "chunks" =>
        val stride = maxTokens - overlap
        val n = math.max(1,
          math.ceil((toks.length - overlap).toDouble / stride).toInt)
        new GenericArrayData((0 until n).map(i =>
          UTF8String.fromString(
            Bpe.decode(toks.slice(i * stride, i * stride + maxTokens).toSeq)))
          .toArray[Any])
      case _ =>
        new GenericArrayData(toks.map(t =>
          UTF8String.fromString(t)).toArray[Any])
    }
  }

  override def nullSafeEval(input: Any): Any =
    doEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    if (mode == "count")
      defineCodeGen(ctx, ev, c => s"((Integer) $ref.doEval($c)).intValue()")
    else
      defineCodeGen(ctx, ev,
        c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.doEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
