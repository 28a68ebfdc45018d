package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All pure `functions._` compositions (codegen'd, no UDFs) so they
  * run inside WholeStageCodegen over 100 TB of documents.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased text. */
  def tokens(c: Column): Column =
    split(trim(lower(c)), "\\s+")

  /** Whitespace token count; empty/blank → 0. */
  def tokenCount(c: Column): Column =
    when(trim(c) === "" || c.isNull, 0).otherwise(size(tokens(c)))

  /** BPE-ish subword-ish token count: word pieces + standalone
    * punctuation, the usual pre-tokenizer regex.
    */
  def tokenCountRegex(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** REAL subword token count under a loaded BPE tokenizer (GPT-2
    * merges/vocab format — see [[Bpe]]): what the trainer's tokenizer
    * will actually see, for packing / budget accounting.
    */
  def tokenCount(c: Column, tokenizer: Bpe.Spec): Column =
    Bpe.bpeTokenCount(c, tokenizer)

  /** [[tokenCount]] under a unigram-LM (SentencePiece-style)
    * tokenizer (see [[Unigram]]) — the same budget-accounting
    * contract as the BPE overload, so the two vocabularies A/B
    * directly.
    */
  def tokenCount(c: Column, tokenizer: Unigram.Spec): Column =
    Unigram.unigramTokenCount(c, tokenizer)

  /** Tiny per-language stopword lists for the heuristics below (also
    * consumed by the oracle-SQL generator in SparkEntry).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "una", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "que"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "pt" -> Seq("o", "de", "que", "e", "do", "da", "em", "um", "para", "com"),
    "it" -> Seq("di", "che", "e", "il", "la", "per", "un", "in", "non", "una"),
    "nl" -> Seq("de", "het", "een", "van", "en", "in", "is", "dat", "op", "te"),
    "ru" -> Seq("и", "в", "не", "на", "я", "что", "он", "с", "как", "это"))

  /** HOF formulation of per-language stopword occurrence counts — the
    * documented, oracle-portable semantics. Interpreted (HOFs don't
    * codegen), so HOT paths use [[stopwordHitsAll]] instead; the two
    * are asserted exactly equal in TextAnalysisSpec.
    */
  private[graft] def stopwordHitsHof(toks: Column, lang: String): Column = {
    val litArr = array(stopwords(lang).map(lit): _*)
    size(filter(toks, t => array_contains(litArr, t)))
  }

  /** Native one-pass kernel: occurrence counts for ALL languages of
    * [[StopwordHitsAll.Langs]] as array<int> — one hash-probe loop
    * under whole-stage codegen where the HOF twin pays one
    * interpreted array pass per language.
    */
  private[graft] def stopwordHitsAll(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(StopwordHitsAll(GraftSqlBridge.expression(toks)))
  }

  /** Heuristic language ID: script detection for Japanese kana,
    * Korean Hangul, CJK ideographs and Arabic-script text, stopword
    * voting among the [[StopwordHitsAll.Langs]] alphabetic languages,
    * "und" (undetermined) when nothing scores. Kana outranks the CJK
    * check because Japanese text mixes kanji with kana — ideographs
    * alone (no kana) read as Chinese.
    */
  def languageId(c: Column): Column = langDecision(c)._1

  /** Calibrated language ID: the [[languageId]] label PLUS a posterior
    * confidence — the number CCNet-style pipelines gate on (keep a doc
    * only when the detector is sure; Wenzek et al. 2020 gate at 0.5).
    *
    * Model: a Dirichlet(α = 1/2)-smoothed categorical posterior over
    * 13 classes — the 4 script classes (ja/ko/zh/fa, signal = script
    * char count), the 8 stopword-voting languages of
    * [[StopwordHitsAll.Langs]] (signal = stopword hits) and "und"
    * (signal 0 by definition):
    *
    *   conf = (s_picked + α) / (Σ all signals + 13·α)
    *
    * Monotone in the picked language's share of the total evidence,
    * bounded in (0, 1), ~1/13 when there is no evidence at all, and
    * exactly engine-portable: numerator and denominator are
    * half-integers, one IEEE division, one final 6 dp round. The
    * LABEL is [[languageId]]'s, unchanged — a script override (e.g.
    * kana → ja) with heavy foreign stopword mass simply yields a LOW
    * confidence, which is precisely the mixed-language signal a
    * quantile gate (bucketByGroupQuantiles on this column) exploits.
    *
    * @return struct(lang string, conf double)
    */
  def languageIdScored(c: Column): Column = {
    val (pick, pickSignal, total) = langDecision(c)
    val conf = round(
      (pickSignal.cast("double") + lit(0.5)) /
        (total.cast("double") + lit(13 * 0.5)), 6)
    struct(pick.as("lang"), conf.as("conf"))
  }

  /** Shared decision kernel for [[languageId]] / [[languageIdScored]]:
    * (label, picked-class signal, total signal mass). Kana outranks
    * the CJK check because Japanese text mixes kanji with kana —
    * ideographs alone (no kana) read as Chinese.
    */
  private def langDecision(c: Column): (Column, Column, Column) = {
    val kana = size(regexp_extract_all(c, lit("[\\x{3040}-\\x{30ff}]"), lit(0)))
    val hangul = size(regexp_extract_all(
      c, lit("[\\x{ac00}-\\x{d7af}\\x{1100}-\\x{11ff}]"), lit(0)))
    val cjk = size(regexp_extract_all(c, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val arabicScript = size(regexp_extract_all(c, lit("[\\x{0600}-\\x{06ff}]"), lit(0)))
    val toks = tokens(c)
    // one native pass for all voting languages; the element_at
    // references share the kernel evaluation under codegen CSE
    val hitsAll = stopwordHitsAll(toks)
    val scores = StopwordHitsAll.Langs.zipWithIndex
      .map { case (l, i) => l -> element_at(hitsAll, i + 1) }
    val best = scores
      .map(_._2)
      .reduce((a, b) => greatest(a, b))
    val latinPick = scores.foldLeft(when(best <= 0, "und")) {
      case (acc, (l, s)) => acc.when(s === best, l)
    }
    val pick = when(kana > 0, "ja")
      .when(hangul > 0, "ko")
      .when(cjk > 0, "zh")
      .when(arabicScript > 0, "fa")
      .otherwise(latinPick.otherwise("und"))
    val pickSignal = when(kana > 0, kana)
      .when(hangul > 0, hangul)
      .when(cjk > 0, cjk)
      .when(arabicScript > 0, arabicScript)
      .otherwise(when(best <= 0, lit(0)).otherwise(best))
    // widen before summing: 12 int signals each bounded by the doc
    // length can overflow int on a pathological single doc
    val total = (Seq(kana, hangul, cjk, arabicScript) ++ scores.map(_._2))
      .map(_.cast("long")).reduce(_ + _)
    (pick, pickSignal, total)
  }

  /** Quality score in [0,1]: blend of length band, alphabetic ratio,
    * stopword presence and mean word length band — the standard cheap
    * pre-filter shape for web-scraped corpora.
    */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val toks = tokens(c)
    val nToks = size(toks).cast("double")
    val alpha = size(regexp_extract_all(c, lit("[A-Za-z]"), lit(0))).cast("double")
    val alphaRatio = when(nChars > 0, alpha / nChars).otherwise(lit(0.0))
    val stopHits = element_at(stopwordHitsAll(toks), 1).cast("double")
    val stopRatio = when(nToks > 0, stopHits / nToks).otherwise(lit(0.0))
    val meanWordLen = when(nToks > 0, (nChars - (nToks - 1)) / nToks).otherwise(lit(0.0))

    val lenScore =
      when(nChars >= 200 && nChars <= 10000, 1.0)
        .when(nChars >= 50, 0.5)
        .otherwise(0.0)
    val wordLenScore =
      when(meanWordLen >= 3 && meanWordLen <= 12, 1.0).otherwise(0.3)
    round(
      lit(0.3) * lenScore + lit(0.3) * alphaRatio +
        lit(0.2) * least(stopRatio * 5, lit(1.0)) + lit(0.2) * wordLenScore,
      4)
  }

  /** Canonical content fingerprint: lowercase, strip non-alnum, sort
    * distinct tokens, md5. Near-identical reorderings/punctuation
    * variants collide — the classic key-collision dedup key.
    */
  def fingerprint(c: Column): Column = {
    val cleaned = regexp_replace(lower(c), "[^a-z0-9]+", " ")
    val toks = array_sort(array_distinct(split(trim(cleaned), " ")))
    md5(array_join(toks, " "))
  }

  /** Top-k TF-IDF terms per document (corpus-level operator).
    *
    * tf = term count / document token count; idf = ln((N+1)/(df+1))+1
    * (smoothed, so corpus-universal terms still score). Deterministic
    * top-k: rank by (tfidf DESC, term ASC).
    *
    * Scale shape: one explode+groupBy for per-doc term counts
    * (map-side combined), one groupBy for document frequencies (df —
    * shuffles one row per distinct term, not per occurrence), one
    * shuffle-join on term, one window for top-k. The N scalar is a
    * separate tiny aggregate, not a driver collect of data rows.
    *
    * @return (idCol, term, tfidf, rank), rank 1..k.
    */
  def tfIdfTopK(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("term"))
    val tf = toks
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("__tc"))
      .withColumn("__dlen", sum(col("__tc")).over(Window.partitionBy(col("__id"))))
    val dfreq = toks.select("__id", "term").distinct()
      .groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    val n = df.select(countDistinct(col(idCol)).as("__n"))
    val scored = tf
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn(
        "tfidf",
        (col("__tc").cast("double") / col("__dlen")) *
          (log((col("__n") + 1).cast("double") / (col("__df") + 1)) + 1))
    val w = Window.partitionBy(col("__id")).orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__id").as(idCol), col("term"),
        round(col("tfidf"), 6).as("tfidf"), col("rank"))
  }

  /** Corpus-level PMI collocation mining — the top-k token bigrams
    * whose co-occurrence most exceeds independence, the classic
    * association-mining signal (Church & Hanks 1990) for tokenizer
    * vocab curation and template/boilerplate discovery.
    *
    * PMI(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) ) with bigram
    * probability from the corpus bigram total T and unigram
    * probabilities from the token total U. `minCount` gates rare
    * pairs (PMI is maximal for hapax pairs — ungated output is
    * noise).
    *
    * Scale shape: bigrams are built ROW-LOCALLY from each document's
    * token array (no self-join); both count tables are
    * map-side-combined groupBys; the totals are scalar aggregates
    * broadcast back; the final top-k compiles to
    * TakeOrderedAndProject (per-partition top-k, k-bounded merge) —
    * no global sort, no driver loop.
    *
    * @return ≤ k rows (w1, w2, n_pair, pmi), pmi 6 dp, ties broken
    *         on (w1, w2).
    */
  def pmiCollocations(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      minCount: Long = 5L,
      k: Int = 50): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(k >= 1, "k must be >= 1")
    val tk = graft.operators.Parallelism.spread(df)
      .select(tokens(col(textCol)).as("__w"))
    val uc = tk.select(explode(col("__w")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__cu"))
    val utot = uc.agg(sum(col("__cu")).as("__u"))
    val bc = tk
      .where(size(col("__w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__w) - 2), i -> struct(__w[i] AS w1, __w[i + 1] AS w2))")).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    val btot = bc.agg(sum(col("n_pair")).as("__t"))
    bc.where(col("n_pair") >= minCount)
      .join(uc.select(col("__t").as("w1"), col("__cu").as("__c1")), Seq("w1"))
      .join(uc.select(col("__t").as("w2"), col("__cu").as("__c2")), Seq("w2"))
      .crossJoin(broadcast(utot))
      .crossJoin(broadcast(btot))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log((col("n_pair").cast("double") / col("__t")) /
          ((col("__c1").cast("double") / col("__u")) *
            (col("__c2").cast("double") / col("__u")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Flesch-style readability proxy — the classic per-document
    * quality feature (Flesch 1948) on deterministic, engine-portable
    * counting rules: words = SINGLE-SPACE-delimited tokens (the
    * split is the literal `" "`, not `\s+` — tab/newline-delimited
    * words count as one token by declared proxy contract, and the
    * oracle mirrors the same split), sentences =
    * `[.!?]+` terminator runs floored at 1, syllables = `[aeiouy]+`
    * vowel groups over the lowercased text (runs cannot span
    * whitespace, so this equals the per-word sum; consonant-only
    * words contribute 0 by declared proxy contract). Score =
    * 206.835 − 1.015·(words/sentences) − 84.6·(vowelGroups/words),
    * 4 dp; null text or zero words → null score. Entirely row-local
    * (three regexp counts), zero shuffles; both patterns sit in the
    * Java∩RE2 subset so the oracle replays them verbatim.
    *
    * The 4 dp score is EXACT INTEGER arithmetic (the formula is
    * rational, so real documents land on exact half-boundaries — the
    * sf1 gate caught one at flesch = 91.01865, where Spark's
    * string-based round and a binary-double round disagree):
    * e4 = half-away-from-zero of 10·(206835·s·w − 1015·w² −
    * 84600·v·s) / (s·w) in longs, ONE identical double division by
    * 10000 at the boundary. Long-exact for documents up to ~10⁶
    * words (2·num10 < 2⁶³).
    */
  def readability(
      df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val words = size(filter(split(col(textCol), " "), w => w =!= ""))
    val sents = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))), lit(1))
    val vowels = size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
    val rn = graft.Cols.unique("__rn", df)
    val rd = graft.Cols.unique("__rd", df)
    df.withColumn("n_words", when(col(textCol).isNotNull, words.cast("long")))
      .withColumn("n_sents", when(col(textCol).isNotNull, sents.cast("long")))
      .withColumn("n_vowel_groups", when(col(textCol).isNotNull, vowels.cast("long")))
      .withColumn(rn,
        lit(2068350L) * col("n_sents") * col("n_words") -
          lit(10150L) * col("n_words") * col("n_words") -
          lit(846000L) * col("n_vowel_groups") * col("n_sents"))
      .withColumn(rd, col("n_sents") * col("n_words"))
      .withColumn("flesch", when(col(textCol).isNotNull && col("n_words") > 0,
        when(col(rn) >= 0,
          expr(s"($rn * 2 + $rd) div ($rd * 2)"))
          .otherwise(-expr(s"((-$rn) * 2 + $rd) div ($rd * 2)"))
          .cast("double") / lit(10000.0)))
      .drop(rn, rd)
  }

  /** Zipf rank-frequency fit — the corpus-health diagnostic behind
    * "is this crawl slice natural language or generated/boilerplate
    * spam": natural text follows count ∝ rank^s with s ≈ −1 (Zipf
    * 1949); template-heavy or synthetic corpora bend the log-log
    * line. One least-squares line through (ln rank, ln count) of the
    * top `topN` terms: counts map-side-combine, the top-N is a
    * distributed TakeOrderedAndProject (never a vocab-sized sort),
    * the rank window runs on the ≤ topN survivors (bounded single
    * partition by construction), and the moment sums follow the
    * decimal discipline — 6 dp-rounded ln values and products summed
    * in exact DECIMAL(18,6), ONE double solve at the boundary — so
    * the slope is order-independent and engine-replayable.
    *
    * @return one row: (n_terms, slope 6 dp, intercept 6 dp) — slope
    *         null when fewer than 2 terms survive.
    */
  def zipfFit(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      topN: Int = 1000,
      minCount: Long = 2L): org.apache.spark.sql.DataFrame = {
    // topN bounds the single-partition rank window below BY
    // CONSTRUCTION (limit(topN) precedes it); the cap turns the
    // documented report bound into a checked one — a caller asking
    // for a million-term "head" is not fitting a Zipf line any more.
    require(topN >= 2 && topN <= 100000,
      s"topN must be in [2, 100000] (a rank-frequency FIT, not a vocab dump), got $topN")
    require(minCount >= 1, "minCount must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val tk = graft.operators.Parallelism.spread(df)
      .select(tokens(col(textCol)).as("__w"))
    val top = tk.select(explode(col("__w")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .orderBy(col("__c").desc, col("__t").asc)
      .limit(topN)
    val w = Window.orderBy(col("__c").desc, col("__t").asc)
    val xy = top
      .withColumn("__r", row_number().over(w))
      .select(
        round(log(col("__r").cast("double")), 6).as("__x"),
        round(log(col("__c").cast("double")), 6).as("__y"))
    val s = xy.agg(
      count(lit(1)).as("n_terms"),
      sum(col("__x").cast("decimal(18,6)")).as("__sx"),
      sum(col("__y").cast("decimal(18,6)")).as("__sy"),
      sum(round(col("__x") * col("__x"), 6).cast("decimal(18,6)")).as("__sxx"),
      sum(round(col("__x") * col("__y"), 6).cast("decimal(18,6)")).as("__sxy"))
    val n = col("n_terms").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double")
    val sxy = col("__sxy").cast("double")
    val den = n * sxx - sx * sx
    s.withColumn("__slope_raw",
      when(col("n_terms") >= 2 && den =!= 0.0,
        (n * sxy - sx * sy) / den))
      .select(
        col("n_terms"),
        round(col("__slope_raw"), 6).as("slope"),
        round((sy - col("__slope_raw") * sx) / n, 6).as("intercept"))
  }

  /** Sentence segmentation — the unit-of-work change behind
    * sentence-level filtering, alignment, and dedup: each document
    * splits into terminator-delimited sentences ((.!?)-runs end a
    * sentence; the trailing un-terminated fragment is kept). The
    * pattern is deliberately in the Java∩RE2 regex subset (no
    * lookaround) so the DuckDB oracle replays it verbatim;
    * abbreviation-aware splitting is a model, not a regex, and out
    * of scope by design.
    *
    * Entirely ROW-LOCAL (one regexp_extract_all + posexplode — no
    * shuffle at all); docs with null/empty text yield no rows.
    *
    * @return (idCol, sent_idx, sentence) — sent_idx 0-based in
    *         document order, sentences trimmed, empties dropped.
    */
  def splitSentences(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val sents = expr(
      s"filter(transform(regexp_extract_all(`$textCol`, '[^.!?]+[.!?]*', 0), " +
        "s -> trim(s)), s -> s != '')")
    graft.operators.Parallelism.spread(df)
      .select(col(idCol), posexplode(sents).as(Seq("sent_idx", "sentence")))
  }

  /** Class-distinctive terms (the BERTopic c-TF-IDF shape): per
    * class label, the k terms whose within-class rate most exceeds
    * their corpus-wide availability — "what vocabulary makes this
    * source/language/cluster itself?".
    *
    * score(t, c) = tf_c(t)·ln(1 + A / f_t) with tf_c = class term
    * count / class token count, f_t = corpus count of t, A = mean
    * tokens per class. Rounded 6 dp, ties to the smaller term.
    *
    * Scale shape: one explode feeds both count tables
    * (map-side-combined groupBys); the per-class totals frame is
    * bounded by the class count and broadcast; ranking is a window
    * partitioned BY CLASS (parallel across classes — never a global
    * sort). The corpus term table joins on the term key (AQE handles
    * the skew; no broadcast assumption on a corpus-sized table).
    */
  def classTopTerms(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      classCol: String,
      k: Int = 10): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val tk = graft.operators.Parallelism.spread(df)
      .select(col(classCol).as("__cls"), explode(tokens(col(textCol))).as("__t"))
    val ct = tk.groupBy(col("__cls"), col("__t")).agg(count(lit(1)).as("__ct"))
    val clsTot = ct.groupBy(col("__cls")).agg(sum(col("__ct")).as("__n"))
    val avgTok = clsTot.agg((sum(col("__n")).cast("double") /
      count(lit(1))).as("__a"))
    val ft = ct.groupBy(col("__t")).agg(sum(col("__ct")).as("__ft"))
    val w = Window.partitionBy(col("__cls"))
      .orderBy(col("score").desc, col("__t").asc)
    ct.join(broadcast(clsTot), Seq("__cls"))
      .join(ft, Seq("__t"))
      .crossJoin(broadcast(avgTok))
      .withColumn("score",
        round((col("__ct").cast("double") / col("__n")) *
          log(lit(1.0) + col("__a") / col("__ft")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__cls").as(classCol), col("__t").as("term"),
        col("score"), col("rank"))
  }

  /** Per-document bigram language-model score (corpus-level
    * operator): the mean natural-log probability of each document's
    * token bigrams under an add-k-smoothed bigram model fitted on the
    * corpus itself — the KenLM-shaped quality signal (CCNet / Gopher
    * pipelines score documents by LM perplexity and filter the tails;
    * avg_logprob = −perplexity-per-token in nats, so MORE negative =
    * more surprising text).
    *
    * Model: vocabulary = the `topV` most frequent tokens (ties to the
    * lexicographically smaller, so the cut is deterministic);
    * everything else maps to `<unk>`. P(w₂|w₁) = (c(w₁w₂) + k) /
    * (c(w₁) + k·V) with V = |vocab| + 1 (the unk bucket).
    *
    * Scale shape: bigrams are built ROW-LOCALLY from each document's
    * token array (no self-join, no per-doc window shuffle); vocab
    * mapping is two broadcast joins against the (topV-bounded, by
    * contract driver-small) vocabulary; the mapped-bigram frame is
    * staged ONCE (`localCheckpoint`, the trick
    * [[graft.operators.Cumulative]] uses) so the bigram counts and
    * the scoring pass share a single computation of the
    * tokenize/explode/vocab-map lineage; the counts are a groupBy
    * with MAP-SIDE partial aggregation — one row per distinct mapped
    * bigram reaches the reducer, so the `(<unk>,<unk>)` bucket (which
    * can be 10–30 % of a web corpus's bigrams) never lands on a
    * single task the way a `count over (partition by m1,m2)` window
    * would; the join back on (m1,m2) is AQE-skew-splittable. Scoring
    * then joins the unigram counts (AQE broadcasts them when they
    * fit) and one groupBy(id) averages. The vocab cut compiles to
    * TakeOrderedAndProject (per-partition top-V, then a V-bounded
    * merge) — no global sort of the count table, no single-task
    * window anywhere in the plan.
    *
    * @return (idCol, n_bigrams, avg_logprob) — one row per input
    *         document; docs with < 2 tokens score (0, null);
    *         avg_logprob rounded to 4 dp.
    */
  def lmScore(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      topV: Int = 1000,
      addK: Double = 1.0): org.apache.spark.sql.DataFrame = {
    require(topV >= 1, "topV must be >= 1")
    require(addK > 0, "addK must be > 0")
    // spread(): an unsplittable small-file scan otherwise pins the
    // tokenize/explode kernels — and the checkpoint layout below,
    // which every downstream stage inherits — to 1-4 tasks. No-op on
    // an already-wide scan.
    // Stage the tokenized corpus ONCE: the count fit and the bigram
    // frame below both consume it, and re-tokenizing means a second
    // corpus scan + regex split per pass.
    val tk = graft.operators.Parallelism.spread(df)
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
      .localCheckpoint(true)
    // ONE token-count table serves both the vocab cut and the mapped
    // unigram counts: the old shape re-ran the corpus tokenize+explode
    // for c1 (a second full pass); summing the vocab-bounded distinct-
    // token counts gives the identical integers. Staged because two
    // consumers read it.
    val cntAll = tk.select(explode(col("__w")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val voc = cntAll
      .orderBy(col("__c").desc, col("__t").asc)
      .limit(topV)
      .select(col("__t"))
    val vsz = voc.select((count(lit(1)) + 1).cast("double").as("__v"))
    val c1 = cntAll
      .join(broadcast(voc.select(col("__t"), lit(1).as("__k"))), Seq("__t"), "left")
      .select(when(col("__k").isNotNull, col("__t")).otherwise(lit("<unk>")).as("__m"),
        col("__c"))
      .groupBy(col("__m")).agg(sum(col("__c")).as("__c1"))
      .withColumnRenamed("__m", "__m1")
    val bg = tk
      .where(size(col("__w")) >= 2)
      .select(col("__id"), explode(expr(
        "transform(sequence(0, size(__w) - 2), i -> struct(__w[i] AS w1, __w[i + 1] AS w2))")).as("__p"))
      .select(col("__id"), col("__p.w1").as("__w1"), col("__p.w2").as("__w2"))
      .join(broadcast(voc.select(col("__t").as("__w1"), lit(1).as("__k1"))), Seq("__w1"), "left")
      .join(broadcast(voc.select(col("__t").as("__w2"), lit(1).as("__k2"))), Seq("__w2"), "left")
      .select(col("__id"),
        when(col("__k1").isNotNull, col("__w1")).otherwise(lit("<unk>")).as("__m1"),
        when(col("__k2").isNotNull, col("__w2")).otherwise(lit("<unk>")).as("__m2"))
      // 128-bit bigram key (two xxhash64 longs): the count and the
      // join back run on fixed-width longs instead of string pairs —
      // same trick as dupNgramStats, measured 3× cheaper at sf1.
      .select(col("__id"), col("__m1"),
        xxhash64(col("__m1"), col("__m2")).as("__h1"),
        xxhash64(lit(1), col("__m1"), col("__m2")).as("__h2"))
    // Stage the mapped-bigram frame once: the counts and the scoring
    // pass both read the checkpointed blocks (one computation of the
    // tokenize/explode/vocab-map lineage) and the count is a groupBy
    // with map-side partial aggregation — never a window, whose
    // single-task-per-key partitions melt down on the (<unk>,<unk>)
    // bucket at corpus scale.
    val staged = bg.localCheckpoint(true)
    val c12 = staged
      .groupBy(col("__h1"), col("__h2")).agg(count(lit(1)).as("__c12"))
    val scored = staged
      .join(c12, Seq("__h1", "__h2"))
      .join(c1, Seq("__m1"))
      .crossJoin(broadcast(vsz))
      .withColumn("__lp",
        log((col("__c12") + addK) / (col("__c1") + lit(addK) * col("__v"))))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("__lp")), 4).as("avg_logprob"))
    df.select(col(idCol).as("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("avg_logprob"))
  }

  /** TRIGRAM-order twin of [[lmScore]]: per trigram position the
    * score is the INTERPOLATED probability
    * `λ·(c123+k)/(c12+k·V) + (1−λ)·(c23+k)/(c2+k·V)` (add-k trigram
    * backed off onto the add-k bigram — the standard Jelinek–Mercer
    * two-order mix), averaged in log space per document. Same
    * architecture as the bigram scorer: the only corpus-scale state
    * is vocab-bounded or n-gram-count tables keyed by 128-bit hashes
    * (two xxhash64 longs — fixed-width shuffle keys, no string
    * tuples); counts are map-side-combined groupBys, never windows,
    * so the (<unk>,<unk>,<unk>) bucket can't serialize a task. The
    * bigram/unigram tables are counted over ALL adjacent positions
    * (n−1 per doc), not just trigram contexts — the conventional
    * count tables a backoff LM shares across orders.
    */
  def lmScore3(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      topV: Int = 1000,
      addK: Double = 1.0,
      lambda: Double = 0.5): org.apache.spark.sql.DataFrame = {
    require(topV >= 1, "topV must be >= 1")
    require(addK > 0, "addK must be > 0")
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0, 1]")
    // Staged once: the count fit, the bigram counts and the trigram
    // frame all consume the tokenized corpus (three re-tokenizations
    // otherwise).
    val tk = graft.operators.Parallelism.spread(df)
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
      .localCheckpoint(true)
    // One staged token-count table for the vocab cut AND the mapped
    // unigram counts — same fused shape as [[lmScore]]: summing the
    // distinct-token counts is the identical integer arithmetic at a
    // full corpus pass less.
    val cntAll = tk.select(explode(col("__w")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val voc = cntAll
      .orderBy(col("__c").desc, col("__t").asc)
      .limit(topV)
      .select(col("__t"))
    val vsz = voc.select((count(lit(1)) + 1).cast("double").as("__v"))
    val vocB = broadcast(voc.select(col("__t"), lit(1).as("__k")))
    def mapped(c: Column, k: Column): Column =
      when(k.isNotNull, c).otherwise(lit("<unk>"))
    // unigram counts over mapped tokens
    val c1 = cntAll
      .join(vocB, Seq("__t"), "left")
      .select(mapped(col("__t"), col("__k")).as("__m"), col("__c"))
      .groupBy(col("__m")).agg(sum(col("__c")).as("__c1"))
    // bigram counts over ALL adjacent positions, 128-bit keys
    val bgm = tk
      .where(size(col("__w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__w) - 2), i -> struct(__w[i] AS w1, __w[i + 1] AS w2))")).as("__p"))
      .select(col("__p.w1").as("__w1"), col("__p.w2").as("__w2"))
      .join(broadcast(voc.select(col("__t").as("__w1"), lit(1).as("__k1"))), Seq("__w1"), "left")
      .join(broadcast(voc.select(col("__t").as("__w2"), lit(1).as("__k2"))), Seq("__w2"), "left")
      .select(
        mapped(col("__w1"), col("__k1")).as("__m1"),
        mapped(col("__w2"), col("__k2")).as("__m2"))
    val c12 = bgm
      .select(xxhash64(col("__m1"), col("__m2")).as("__ha"),
        xxhash64(lit(1), col("__m1"), col("__m2")).as("__hb"))
      .groupBy(col("__ha"), col("__hb")).agg(count(lit(1)).as("__cb"))
    // trigram positions, mapped, with the three lookup keys
    val tg = tk
      .where(size(col("__w")) >= 3)
      .select(col("__id"), explode(expr(
        "transform(sequence(0, size(__w) - 3), i -> struct(__w[i] AS w1, __w[i + 1] AS w2, __w[i + 2] AS w3))")).as("__p"))
      .select(col("__id"), col("__p.w1").as("__w1"), col("__p.w2").as("__w2"), col("__p.w3").as("__w3"))
      .join(broadcast(voc.select(col("__t").as("__w1"), lit(1).as("__k1"))), Seq("__w1"), "left")
      .join(broadcast(voc.select(col("__t").as("__w2"), lit(1).as("__k2"))), Seq("__w2"), "left")
      .join(broadcast(voc.select(col("__t").as("__w3"), lit(1).as("__k3"))), Seq("__w3"), "left")
      .select(col("__id"),
        mapped(col("__w1"), col("__k1")).as("__m1"),
        mapped(col("__w2"), col("__k2")).as("__m2"),
        mapped(col("__w3"), col("__k3")).as("__m3"))
      .select(col("__id"), col("__m2"),
        xxhash64(col("__m1"), col("__m2"), col("__m3")).as("__t1"),
        xxhash64(lit(1), col("__m1"), col("__m2"), col("__m3")).as("__t2"),
        xxhash64(col("__m1"), col("__m2")).as("__p1"),
        xxhash64(lit(1), col("__m1"), col("__m2")).as("__p2"),
        xxhash64(col("__m2"), col("__m3")).as("__s1"),
        xxhash64(lit(1), col("__m2"), col("__m3")).as("__s2"))
    // one computation of the tokenize/map lineage for both passes
    val staged = tg.localCheckpoint(true)
    val c123 = staged
      .groupBy(col("__t1"), col("__t2")).agg(count(lit(1)).as("__ct"))
    val scored = staged
      .join(c123, Seq("__t1", "__t2"))
      .join(c12.select(col("__ha").as("__p1"), col("__hb").as("__p2"),
        col("__cb").as("__c12")), Seq("__p1", "__p2"))
      .join(c12.select(col("__ha").as("__s1"), col("__hb").as("__s2"),
        col("__cb").as("__c23")), Seq("__s1", "__s2"))
      .join(c1.withColumnRenamed("__m", "__m2"), Seq("__m2"))
      .crossJoin(broadcast(vsz))
      .withColumn("__lp", log(
        lit(lambda) * (col("__ct") + addK) / (col("__c12") + lit(addK) * col("__v")) +
        lit(1 - lambda) * (col("__c23") + addK) / (col("__c1") + lit(addK) * col("__v"))))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_trigrams"), round(avg(col("__lp")), 4).as("avg_logprob"))
    df.select(col(idCol).as("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"), col("avg_logprob"))
  }

  /** Cross-document duplicated-n-gram statistics (corpus-level
    * operator): for each document, the fraction of its DISTINCT word
    * n-grams that occur in at least one other document — the
    * span-level near-dup signal of Lee et al. ("Deduplicating
    * Training Data Makes Language Models Better", ACL 2022), reduced
    * to a per-document score. High dup_ngram_frac = the document is
    * largely assembled from text that exists elsewhere in the corpus
    * (mirror sites, templated spam, wholesale quotation) even when no
    * single document is a near-duplicate of it.
    *
    * Scale shape: each document contributes its distinct n-grams ONCE,
    * keyed by a 128-bit hash (two independent xxhash64 values — 16
    * bytes of longs instead of gram text or a 32-char digest string;
    * measured 3.3× faster end-to-end than md5-hex keys at sf1, and
    * collision-safe at corpus scale: ~10¹² grams collide with
    * p ≈ 10⁻¹⁵); the gram frame is staged ONCE (`localCheckpoint`, as
    * [[graft.operators.Cumulative]] does) and all three downstream
    * passes share that single computation of the tokenize/explode/
    * hash lineage: (1) per-doc gram counts — groupBy(id) with
    * MAP-SIDE partial aggregation (explode keeps a doc's grams
    * task-adjacent, so partials collapse to ~docs-per-task rows);
    * (2) the SHARED-gram set — groupBy(gram key), map-side combined,
    * so a boilerplate 5-gram present in a million-doc template
    * cluster contributes one row per map task to the reducer, not a
    * million rows to one task the way a `count over (partition by
    * gram)` window would — then filtered to keys with ≥ 2 docs;
    * (3) shared hits — an INNER join of the staged frame against
    * that (usually small) shared set, which AQE broadcasts when it
    * fits and skew-splits when it doesn't, followed by one
    * groupBy(id). No window, no full-frame join against a
    * corpus-sized count table. Documents shorter than n tokens
    * contribute their whole token join as a single gram, mirroring
    * [[graft.operators.Dedup.ngramJaccardPairs]]'s convention.
    *
    * @return (idCol, n_grams, dup_ngram_frac) — distinct-gram count
    *         and the shared fraction, rounded to 4 dp.
    */
  def dupNgramStats(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be >= 1")
    // spread(): see lmScore — kernel + checkpoint-layout parallelism.
    val tk = graft.operators.Parallelism.spread(df)
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
    // Gram identity = the token TUPLE, hashed in place — tokens are
    // whitespace-split so tuple equality ≡ joined-string equality,
    // and hashing w[i..i+n) directly skips the per-gram string
    // allocation (array_join) plus string-array array_distinct that
    // dominated the kernel stage (~2× measured at sf1).
    val hashArgs = (0 until n).map(j => s"__w[i + $j]").mkString(", ")
    val grams = tk
      .select(col("__id"), explode(
        when(size(col("__w")) >= n, array_distinct(expr(
          s"transform(sequence(0, size(__w) - $n), " +
            s"i -> struct(xxhash64($hashArgs) AS h1, xxhash64(1, $hashArgs) AS h2))")))
          .otherwise(array(struct(
            xxhash64(array_join(col("__w"), " ")).as("h1"),
            xxhash64(lit(1), array_join(col("__w"), " ")).as("h2"))))).as("__g"))
      .select(col("__id"), col("__g.h1").as("__h1"), col("__g.h2").as("__h2"))
      // Staged once: all three passes below share one lineage
      // computation, and every count aggregates map-side — no
      // single-task hot-gram window partition.
      .localCheckpoint(true)
    val shared = grams
      .groupBy(col("__h1"), col("__h2")).agg(count(lit(1)).as("__docs"))
      .where(col("__docs") >= 2)
      .select(col("__h1"), col("__h2"), lit(1).as("__hit"))
    // ONE groupBy(id) for both counts (round-17): the old shape ran
    // separate per-doc aggregations for the total (all grams) and the
    // hits (inner join vs the shared set) and joined them back — a
    // second corpus-gram exchange plus a join. A LEFT join against
    // the (unique-keyed, AQE-broadcastable) shared set flags each
    // gram row in place and count(__hit) IS the hit count (count
    // skips nulls; 0 when none — exactly the old coalesce(dup, 0)).
    grams
      .join(shared, Seq("__h1", "__h2"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__n"), count(col("__hit")).as("__dup"))
      .select(
        col("__id").as(idCol),
        col("__n").as("n_grams"),
        round(col("__dup").cast("double") / col("__n"), 4)
          .as("dup_ngram_frac"))
  }

  /** Cross-document exact-substring span REMOVAL — the APPLY step for
    * [[dupNgramStats]]'s signal (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022, the word-n-gram
    * reduction): every word-n-gram span occurring in ≥ `minDocs`
    * documents is CUT from every document except the one with the
    * lowest id containing it (the canonical first occurrence, which
    * keeps all of its occurrences). A token is cut iff at least one
    * flagged span occurrence covers it, so overlapping shared spans
    * merge into one cut, exactly like substring dedup.
    *
    * Tokens are RAW whitespace tokens (no lowercasing — removal must
    * preserve the surviving text verbatim); a document with at least
    * one cut has its remaining tokens re-joined with single spaces,
    * an untouched document keeps its text byte-for-byte. Documents
    * shorter than n tokens are never cut. `textCol` is replaced in
    * place; all other columns survive (ids must be unique).
    *
    * Scale shape: span occurrences are keyed by a 128-bit xxhash64
    * pair computed over the token tuple in place (no gram-string
    * allocation — same kernel as [[dupNgramStats]]) and staged once
    * (`localCheckpoint`); the per-gram (distinct-doc count, keeper)
    * aggregation is map-side combined — never a window, so a
    * million-doc boilerplate span cannot serialize onto one task;
    * only SHARED occurrences survive the inner join against the
    * (usually small, AQE-broadcastable) flagged set; cut starts
    * collapse row-locally to one per-doc list (bounded by the doc's
    * own length) and the rebuild is one indexed-lambda filter.
    */
  def removeSharedSpans(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5,
      minDocs: Long = 2): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(minDocs >= 2, "minDocs must be >= 2")
    val idTmp = graft.Cols.unique("__id", df)
    val wCol = graft.Cols.unique("__w", df)
    val oCol = graft.Cols.unique("__o", df)
    val sCol = graft.Cols.unique("__s", df)
    val h1Col = graft.Cols.unique("__h1", df)
    val h2Col = graft.Cols.unique("__h2", df)
    val ndCol = graft.Cols.unique("__nd", df)
    val keepCol = graft.Cols.unique("__keep", df)
    val startsCol = graft.Cols.unique("__starts", df)
    // Raw tokens, empty strings dropped (an all-whitespace doc → [])
    def rawTokens(c: Column): Column =
      filter(split(trim(c), "\\s+"), t => t =!= "")
    val tk = graft.operators.Parallelism.spread(df)
      .select(col(idCol).as(idTmp), rawTokens(col(textCol)).as(wCol))
    val hashArgs = (0 until n).map(j => s"`$wCol`[i + $j]").mkString(", ")
    val occ = tk
      .where(size(col(wCol)) >= n)
      .select(col(idTmp), explode(expr(
        s"transform(sequence(0, size(`$wCol`) - $n), " +
          s"i -> struct(i AS s, xxhash64($hashArgs) AS h1, xxhash64(1, $hashArgs) AS h2))"))
        .as(oCol))
      .select(col(idTmp), col(s"$oCol.s").as(sCol),
        col(s"$oCol.h1").as(h1Col), col(s"$oCol.h2").as(h2Col))
      // Staged once: the gram stats and the flagged join-back share
      // one computation of the tokenize/explode/hash lineage.
      .localCheckpoint(true)
    val shared = occ
      .groupBy(col(h1Col), col(h2Col))
      .agg(countDistinct(col(idTmp)).as(ndCol), min(col(idTmp)).as(keepCol))
      .where(col(ndCol) >= minDocs)
      .select(col(h1Col), col(h2Col), col(keepCol))
    val starts = occ
      .join(shared, Seq(h1Col, h2Col))
      .where(col(idTmp) =!= col(keepCol))
      .groupBy(col(idTmp))
      .agg(collect_list(col(sCol)).as(startsCol))
    df
      .join(starts, col(idCol) === col(idTmp), "left")
      .withColumn(textCol,
        when(col(startsCol).isNull, col(textCol)).otherwise(expr(
          s"array_join(filter(filter(split(trim(`$textCol`), '\\\\s+'), t -> t != ''), " +
            s"(t, i) -> NOT exists(`$startsCol`, s -> i >= s AND i < s + $n)), ' ')")))
      .drop(idTmp, startsCol)
  }

  /** Polynomial rolling hash of the raw text (base 31, mod 2^61-1),
    * computed with the incremental aggregate lambda — the
    * order-sensitive cousin of [[fingerprint]].
    */
  def rollingHash(c: Column): Column = {
    val m = 2305843009213693951L // 2^61 - 1
    aggregate(
      split(c, ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)), lit(m)))
  }

  /** Scrub URLs, e-mail addresses, IPv4 addresses, and
    * separator-structured phone numbers — the standard PII pass a
    * corpus runs before training — replacing each with a typed
    * placeholder token so downstream token counts stay stable. Order
    * matters: URLs first (an address inside a URL must not leave a
    * dangling `<EMAIL>` stub), then emails, then IPs (so dotted quads
    * can't be half-eaten by the phone pass), then phones. The phone
    * class is deliberately conservative — NANP-shaped 3-3-4 with
    * separators, optional `+CC` prefix and parenthesized area code
    * (`\b` anchors only before a DIGIT area code; a `(` is its own
    * hard delimiter, and `\b` before `\+` or `(` would never match) —
    * so prose digit runs ("1995 to 2000") survive. Pure
    * `regexp_replace`: codegen'd, row-local; every pattern stays
    * inside the regex-dialect intersection of Java and RE2 (`\b`,
    * `\d`, bounded repeats — no lookaround) so the DuckDB oracle
    * replays the chain verbatim.
    */
  private[graft] val urlRe = "https?://[^\\s]+"
  private[graft] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val phoneRe =
    "(\\+\\d{1,2}[ .-]?)?(\\(\\d{3}\\)[ .-]?|\\b\\d{3}[ .-])\\d{3}[ .-]\\d{4}\\b"

  def redact(c: Column): Column = {
    val url = regexp_replace(c, urlRe, "<URL>")
    val email = regexp_replace(url, emailRe, "<EMAIL>")
    val ip = regexp_replace(email, ipRe, "<IP>")
    regexp_replace(ip, phoneRe, "<PHONE>")
  }

  /** Per-class PII/URL match counts — the prevalence report a
    * redaction decision (and its before/after audit) is made from.
    * Counts follow [[redact]]'s ladder exactly: URLs are counted on
    * the raw text, then each later class on the text with the
    * earlier classes already replaced, so a URL-embedded email or a
    * dotted quad inside a URL is attributed to ONE class — the same
    * one `redact` scrubs it as. Non-overlapping left-to-right
    * `regexp_count` in both engines; row-local, codegen'd.
    * @return struct (n_url, n_email, n_ip, n_phone, has_pii).
    */
  def piiCounts(c: Column): Column = {
    val nUrl = regexp_count(c, lit(urlRe))
    val t1 = regexp_replace(c, urlRe, "<URL>")
    val nEmail = regexp_count(t1, lit(emailRe))
    val t2 = regexp_replace(t1, emailRe, "<EMAIL>")
    val nIp = regexp_count(t2, lit(ipRe))
    val t3 = regexp_replace(t2, ipRe, "<IP>")
    val nPhone = regexp_count(t3, lit(phoneRe))
    struct(
      nUrl.cast("long").as("n_url"),
      nEmail.cast("long").as("n_email"),
      nIp.cast("long").as("n_ip"),
      nPhone.cast("long").as("n_phone"),
      (nUrl + nEmail + nIp + nPhone > 0).as("has_pii"))
  }

  /** Gopher-style document quality gates (Rae et al., "Scaling
    * Language Models: … Gopher", 2021 — the public heuristics):
    * word-count bounds, mean-word-length band, and a symbol-character
    * ratio cap, returned as a struct of the underlying stats plus the
    * per-rule booleans and the overall `pass`. Mean word length is
    * `length(concat of tokens) / n_words` — no interpreted
    * higher-order aggregate in the hot path.
    */
  def qualityFlags(
      c: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1): Column = {
    val toks = tokens(c)
    val nWords = when(trim(c) === "" || c.isNull, 0).otherwise(size(toks))
    val meanLen = when(nWords > 0,
      length(array_join(toks, "")).cast("double") / nWords)
    val symbolRatio = when(length(c) > 0,
      (length(c) - length(regexp_replace(c, "[#\\|\\{\\}\\[\\]<>]", "")))
        .cast("double") / length(c))
    val wordsOk = nWords.between(minWords, maxWords)
    val meanOk = meanLen.between(minMeanWordLen, maxMeanWordLen)
    val symbolOk = coalesce(symbolRatio <= maxSymbolRatio, lit(false))
    struct(
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbolRatio, 4).as("symbol_ratio"),
      wordsOk.as("words_ok"),
      coalesce(meanOk, lit(false)).as("mean_len_ok"),
      symbolOk.as("symbol_ok"),
      (wordsOk && coalesce(meanOk, lit(false)) && symbolOk).as("pass"))
  }

  /** C4-style blocklist gate (Raffel et al. 2020 §2.2 — drop any doc
    * containing a word from a public blocklist): occurrence count and
    * flag at TOKEN granularity (lowercased whitespace tokens, EXACT
    * match — "assess" never hits a 3-letter entry; substring variants
    * over-fire notoriously). One native probe-loop pass
    * ([[WordlistHits]], the parameterized [[stopwordHitsAll]] shape);
    * the blocklist ships inside the plan, so no broadcast plumbing.
    * Supply your compliance team's list — the default is empty on
    * purpose (raising beats silently gating on someone else's list).
    *
    * @return struct(n_blocked int, blocked boolean)
    */
  def blocklistSignals(c: Column, blocklist: Seq[String]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    require(blocklist.nonEmpty, "blocklistSignals needs a non-empty blocklist")
    require(blocklist.forall(w => w == w.toLowerCase && !w.exists(_.isWhitespace)),
      "blocklist entries must be lowercase single tokens (token-exact match)")
    val hits = GraftSqlBridge.column(
      WordlistHits(GraftSqlBridge.expression(tokens(c)), blocklist))
    struct(hits.as("n_blocked"), (hits > 0).as("blocked"))
  }

  /** Gopher-style WITHIN-document repetition signals (Rae et al.
    * 2021, table A1: duplicate-line fraction, duplicate-line
    * character fraction, top word-n-gram character fraction) as a
    * struct of three doubles. The line fractions are in [0,1]; the
    * top-n-gram fraction counts OVERLAPPING occurrences and can
    * exceed 1 on degenerate self-repeating text ("a a a a" → 1.5) —
    * gate on a threshold, not on "1.0 = fully repeated":
    *
    *  - `dup_line_frac`      = repeated line occurrences / lines
    *  - `dup_line_char_frac` = chars in repeat occurrences beyond the
    *                           first / all line chars
    *  - `top_ngram_char_frac`= chars covered by the most frequent
    *                           word n-gram / total token chars
    *                           (native one-pass kernel; ties to the
    *                           binary-smallest gram)
    *
    * Row-local, codegen'd end to end; the companion gate is
    * [[qualityFlags]] and the removal operator is [[dedupLines]].
    */
  def repetitionSignals(c: Column, sep: String = "\n", ngram: Int = 2): Column = {
    val q = java.util.regex.Pattern.quote(sep)
    val lines = split(c, q)
    val dLines = array_distinct(lines)
    val nL = size(lines).cast("double")
    val nD = size(dLines).cast("double")
    val allChars = length(array_join(lines, "")).cast("double")
    val dChars = length(array_join(dLines, "")).cast("double")
    val topFrac = {
      import org.apache.spark.sql.GraftSqlBridge
      GraftSqlBridge.column(
        TopNgramCharFrac(GraftSqlBridge.expression(tokens(c)), ngram))
    }
    struct(
      when(nL > 0, (nL - nD) / nL).otherwise(0.0).as("dup_line_frac"),
      when(allChars > 0, (allChars - dChars) / allChars).otherwise(0.0)
        .as("dup_line_char_frac"),
      topFrac.as("top_ngram_char_frac"))
  }

  /** Remove repeated lines WITHIN a document, keeping first-occurrence
    * order — the standard within-doc repetition-removal step of a
    * training-data pipeline (navigation bars, cookie banners and
    * boilerplate repeat inside one page). Pure `array_distinct` over
    * the split (first occurrences, in order), codegen'd, row-local —
    * scales trivially.
    */
  def dedupLines(c: Column, sep: String = "\n"): Column = {
    val q = java.util.regex.Pattern.quote(sep)
    array_join(array_distinct(split(c, q)), sep)
  }

  /** Overlapping token-window chunks — the document→passage step of
    * an embedding/RAG/training pipeline. Chunk i covers tokens
    * [i·stride, i·stride + maxTokens) with stride = maxTokens −
    * overlap; every token is covered and the final chunk may be
    * short. Row-local; explode the result to get one row per chunk.
    */
  def chunkTokens(c: Column, maxTokens: Int, overlap: Int = 0): Column = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens, "0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val w = tokens(c)
    val nChunks = greatest(
      ceil((size(w) - lit(overlap)).cast("double") / stride).cast("int"), lit(1))
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(w, i * stride + 1, lit(maxTokens)), " "))
  }

  /** [[chunkTokens]] on REAL subword boundaries: windows of BPE
    * tokens, decoded back to text (see [[Bpe.bpeChunks]]).
    */
  def chunkTokens(c: Column, maxTokens: Int, overlap: Int, tokenizer: Bpe.Spec): Column =
    Bpe.bpeChunks(c, tokenizer, maxTokens, overlap)

  /** [[chunkTokens]] on unigram-LM subword boundaries (see
    * [[Unigram.unigramChunks]]).
    */
  def chunkTokens(c: Column, maxTokens: Int, overlap: Int, tokenizer: Unigram.Spec): Column =
    Unigram.unigramChunks(c, tokenizer, maxTokens, overlap)

  /** CORPUS-level boilerplate lines: lines occurring (as a distinct
    * line) in at least `minDocs` documents — navigation, cookie
    * banners, footers repeated ACROSS pages, the complement of the
    * within-doc [[dedupLines]]. One explode + one count aggregation
    * (map-side combined; a line's count shuffles once per distinct
    * (doc, line)). Blank lines are excluded.
    *
    * @return (line, n_docs) for lines above the threshold.
    */
  def boilerplateLines(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      minDocs: Long,
      sep: String = "\n"): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2")
    val q = java.util.regex.Pattern.quote(sep)
    df.select(explode(array_distinct(split(col(textCol), q))).as("line"))
      .where(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
  }

  /** Remove the given boilerplate lines from every document, keeping
    * the remaining lines in order and REPLACING `textCol` in place —
    * all other columns survive, and a document whose every line is
    * boilerplate comes back with an empty string (never silently
    * dropped). `lines` is a one-column `line` frame (typically
    * [[boilerplateLines]] output) — broadcast by contract
    * (boilerplate sets are small); documents explode to
    * (id, pos, line), anti-join the boilerplate, re-assemble via one
    * groupBy(id), and join back on the id (ids must be unique).
    */
  def stripBoilerplate(
      df: org.apache.spark.sql.DataFrame,
      lines: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      sep: String = "\n"): org.apache.spark.sql.DataFrame = {
    val q = java.util.regex.Pattern.quote(sep)
    // Uniquified temp names: idCol (or another user column surviving
    // the final join) may itself be called __pos/__line/__cleaned.
    val posCol = graft.Cols.unique("__pos", df)
    val lineCol = graft.Cols.unique("__line", df, lines)
    val cleanCol = graft.Cols.unique("__cleaned", df)
    val exploded = df
      .select(col(idCol), posexplode(split(col(textCol), q)).as(Seq(posCol, lineCol)))
    val cleaned = exploded
      .join(broadcast(lines.select(col("line").as(lineCol))), Seq(lineCol), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(posCol), col(lineCol)))),
          s => s.getField(lineCol)),
        sep).as(cleanCol))
    df.drop(textCol)
      .join(cleaned, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(cleanCol), lit("")))
      .drop(cleanCol)
  }

  /** Benchmark-contamination hits: for every document sharing at
    * least one word `n`-gram with the benchmark set, the number of
    * distinct shared grams. n = 13 is the usual contamination window
    * (long enough that chance collisions vanish).
    *
    * `benchmark` is a one-column `gram` DataFrame. It is broadcast by
    * construction: evaluation sets are small and fixed — that bound
    * is the contract, not an optimizer guess — so the corpus is
    * scanned once with no shuffle of document n-grams; only the
    * (tiny) hit counts aggregate.
    */
  /** Per-slice corpus n-gram diversity (distinct-n) — the
    * mode-collapse detector for synthetic/generated training data:
    * distinct word n-grams ÷ total n-gram OCCURRENCES in the slice.
    * Human corpora hold the ratio as they grow; a sampler stuck in a
    * template regurgitates the same grams and the ratio collapses —
    * the [[noveltyScore]] question asked of a slice about itself
    * rather than doc-by-doc against a reference.
    *
    * Scale shape: total occurrences come row-locally from token
    * counts (max(tokens − n + 1, 1) — never materializing duplicate
    * grams); the distinct count moves only (group, 60-bit md5-prefix
    * hash) rows through one two-level grouped count. Null text counts
    * as an empty doc (one whole-text shingle, matching
    * [[graft.operators.Dedup.wordShingles]] short-doc semantics is
    * NOT applied to nulls — null text rows drop).
    *
    * @return one row per group: (groupCol, n_docs, total_ngrams,
    *         distinct_ngrams, distinct_ratio 6 dp).
    */
  def corpusDiversity(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      groupCol: String,
      n: Int = 3): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be positive")
    val base = df.where(col(textCol).isNotNull)
    val toks = size(split(trim(col(textCol)), "\\s+"))
    val occ = greatest(toks - lit(n - 1), lit(1)).cast("long")
    val totals = base
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(occ).as("total_ngrams"))
    val h = (g: org.apache.spark.sql.Column) =>
      conv(substring(md5(g), 1, 15), 16, 10).cast("long")
    val distinct = base
      .select(col(groupCol),
        explode(graft.operators.Dedup.wordShingles(col(textCol), n)).as("__g"))
      .groupBy(col(groupCol), h(col("__g")).as("__h"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("distinct_ngrams"))
    totals.join(distinct, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"), col("total_ngrams"),
        coalesce(col("distinct_ngrams"), lit(0L)).as("distinct_ngrams"),
        round(coalesce(col("distinct_ngrams"), lit(0L)).cast("double") /
          col("total_ngrams").cast("double"), 6).as("distinct_ratio"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus — the
    * memorization-risk / freshness score next to [[contaminationHits]]
    * (which flags overlap with a SMALL benchmark set; here the
    * reference is corpus-scale, e.g. the previous training snapshot):
    * novelty = 1 − (distinct word n-grams also in the reference) /
    * (distinct word n-grams). New-crawl batches scoring ≈ 0 are
    * re-scrapes; fine-tuning data scoring ≈ 0 against pretraining
    * data is memorized, not new signal.
    *
    * Scale shape: document text NEVER shuffles — both sides reduce to
    * 60-bit md5-prefix gram hashes (the cross-engine h16 idiom;
    * deterministic, and a 60-bit collision is ~1e-18 per pair), so
    * the equi-join moves only (id, 8-byte hash) rows against the
    * distinct reference hash set. [[Dedup.wordShingles]] emits
    * DISTINCT grams per doc (shorter-than-n docs → one whole-text
    * shingle), so plain counts are distinct-gram counts. Null-text
    * rows drop on BOTH sides (the [[corpusDiversity]] contract — a
    * null document has no grams to be novel about).
    *
    * @return one row per df document: (doc_id, n_grams, n_seen,
    *         novelty 6 dp).
    */
  def noveltyScore(
      df: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      refTextCol: String,
      n: Int = 8): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be positive")
    val h = (g: org.apache.spark.sql.Column) =>
      conv(substring(md5(g), 1, 15), 16, 10).cast("long")
    val grams = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(graft.operators.Dedup.wordShingles(col(textCol), n)).as("__g"))
      .select(col("doc_id"), h(col("__g")).as("__h"))
    val refH = reference.where(col(refTextCol).isNotNull)
      .select(explode(graft.operators.Dedup.wordShingles(col(refTextCol), n)).as("__g"))
      .select(h(col("__g")).as("__h"))
      .distinct()
    grams
      .join(refH.withColumn("__hit", lit(1L)), Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_seen"))
      .select(col("doc_id"), col("n_grams"), col("n_seen"),
        round(lit(1.0) - col("n_seen").cast("double") / col("n_grams"), 6)
          .as("novelty"))
  }

  def contaminationHits(
      df: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 13): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc_id"),
      explode(graft.operators.Dedup.wordShingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchmark.select(col("gram")).distinct()), Seq("gram"))
      // wordShingles emits DISTINCT grams per doc, so a plain count
      // is already the distinct-gram hit count (cheaper than
      // count_distinct's dedup state).
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))

  /** Decontamination APPLY: drop every document sharing at least
    * `maxHits` distinct word `n`-grams with the benchmark set — the
    * step that actually removes eval data from a training corpus.
    * The flagged-id set is tiny (contaminated docs are rare by
    * construction), so the anti-join broadcasts; the corpus text is
    * never shuffled.
    */
  def decontaminate(
      df: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 13,
      maxHits: Long = 1): org.apache.spark.sql.DataFrame = {
    require(maxHits >= 1, "maxHits must be >= 1")
    val flagged = contaminationHits(df, benchmark, textCol, idCol, n)
      .where(col("n_hits") >= maxHits)
      .select(col("doc_id").as(idCol))
    df.join(flagged, Seq(idCol), "left_anti")
  }

  /** [[contaminationHits]] with a Bloom-filter candidate pass — the
    * 100 TB configuration when the benchmark gram set is too large to
    * broadcast-JOIN (100 M grams ≈ GBs as a hash relation, ~tens of
    * MB as a Bloom filter): every corpus gram is probed row-locally
    * against the broadcast filter (no false negatives), and only the
    * surviving sliver of candidate (doc, gram) rows pays the exact
    * verification join that removes the false positives. The result
    * is IDENTICAL to the exact path — same oracle — at a fraction of
    * the shuffle. `fpp` trades filter size against candidate volume.
    */
  def contaminationHitsBloom(
      df: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 13,
      fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    val bench = benchmark.select(col("gram")).distinct()
    val grams = df.select(col(idCol).as("doc_id"),
      explode(graft.operators.Dedup.wordShingles(col(textCol), n)).as("gram"))
    Bloom.build(bench, "gram", math.max(bench.count(), 1L), fpp) match {
      case None => // empty benchmark: nothing can hit
        grams.select(col("doc_id"), lit(0L).as("n_hits")).where(lit(false))
      case Some(filter) =>
        grams.where(Bloom.mightContain(filter, col("gram")))
          .join(bench, Seq("gram"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
    }
  }

  /** [[decontaminate]] on the [[contaminationHitsBloom]] candidate
    * pass — same dropped set as the exact path, Bloom-sized instead
    * of benchmark-sized broadcast.
    */
  def decontaminateBloom(
      df: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 13,
      maxHits: Long = 1,
      fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    require(maxHits >= 1, "maxHits must be >= 1")
    val flagged = contaminationHitsBloom(df, benchmark, textCol, idCol, n, fpp)
      .where(col("n_hits") >= maxHits)
      .select(col("doc_id").as(idCol))
    df.join(flagged, Seq(idCol), "left_anti")
  }

  /** Every URL in a document, in order of appearance — the
    * link-extraction step of a crawl pipeline (outlink graphs,
    * domain statistics, URL-based filtering). Same pattern as
    * [[redact]], inside the Java∩RE2 regex dialect so the oracle
    * replays it verbatim; rows with no URL get an empty array.
    */
  def extractUrls(c: Column): Column =
    coalesce(
      regexp_extract_all(c, lit("https?://[^\\s]+"), lit(0)),
      array().cast("array<string>"))

  /** Host part of an http(s) URL (domain statistics, per-domain
    * caps, URL-based filtering). Same Java∩RE2-dialect regex idea as
    * [[extractUrls]] — NOT `parse_url`, so the oracle replays the
    * exact pattern. Non-URL input → empty string (regexp_extract's
    * no-match contract).
    */
  def urlHost(c: Column): Column =
    regexp_extract(c, "https?://([^/\\s:?#]+)", 1)

  /** Canonical URL form for URL-level dedup (the FIRST dedup stage of
    * a crawl pipeline — identical pages refetched under trackingly-
    * different URLs): drops the `#fragment`, strips tracking
    * parameters (utm_*, fbclid, gclid, mc_cid/mc_eid) with query-
    * string repair, lowercases scheme+host (paths stay case-
    * sensitive), and trims a trailing slash. Every step is one
    * `regexp_replace`/`regexp_extract` in the Java∩RE2 dialect, so
    * the oracle replays the exact chain; non-URL input passes through
    * the no-match contract mostly untouched. Row-local, codegen'd.
    */
  def normalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*", "")
    val noTrack = regexp_replace(noFrag,
      "[?&](utm_[A-Za-z0-9_]+|fbclid|gclid|mc_cid|mc_eid)=[^&]*", "")
    // if the '?' was stripped with the first param, promote the first
    // '&' (anchored: at most one match in any engine)
    val fixQ = regexp_replace(noTrack, "^([^?]*)&", "$1?")
    val noTail = regexp_replace(fixQ, "[?&]$", "")
    val head = lower(regexp_extract(noTail, "(?i)^(https?://[^/?#]+)", 1))
    val lowered = when(head =!= "",
      concat(head, regexp_replace(noTail, "(?i)^https?://[^/?#]+", "")))
      .otherwise(noTail)
    regexp_replace(lowered, "/$", "")
  }

  /** Aggressive content fold for FUZZY exact-dedup (the CCNet/Gopher
    * normalization step before hashing: near-identical pages differ
    * only in case, punctuation, digits, and whitespace): lowercase,
    * digits → `0`, every non-letter/digit run → one space, trim. Each
    * step is a Java∩RE2 regex (`\p{L}`/`\p{N}` are Unicode categories
    * in both), so the oracle replays the chain; dedup on
    * `md5(normalizeText(text))` catches the re-rendered duplicates a
    * raw-byte hash misses. Row-local, codegen'd, idempotent.
    */
  def normalizeText(c: Column): Column = {
    val lowered = lower(c)
    val digitsFolded = regexp_replace(lowered, "\\p{N}", "0")
    val punctFolded = regexp_replace(digitsFolded, "[^\\p{L}\\p{N}]+", " ")
    trim(punctFolded)
  }

  /** HTML→text extraction — the step a real crawl pipeline runs
    * before any of the text operators (the corpus model elsewhere in
    * this library starts at clean text; a crawl starts at markup):
    * drop `<script>`/`<style>` blocks WITH their content, drop
    * comments, strip remaining tags (each replaced by one space so
    * `</p><p>` never fuses words), decode the common named/numeric
    * entities (`&amp;` LAST, so `&amp;lt;` yields the literal
    * `&lt;`), and collapse whitespace. Every step is a
    * `regexp_replace` in the Java∩RE2 dialect intersection (inline
    * `(?is)` flags, non-greedy `.*?` — both engines) or a literal
    * `replace`, so the DuckDB oracle replays the exact chain.
    * Row-local, codegen'd; unclosed script/style blocks degrade to
    * tag-stripping (the non-greedy body match requires the closer).
    */
  /** The common Windows-1252 mojibake sequences (UTF-8 bytes of a
    * code point re-decoded as cp1252) and their repairs — shared with
    * the oracle-SQL generator so both engines run the identical
    * literal chain. Written as unicode escapes: several sequences
    * contain C1 controls (0x9D/0x9F have no cp1252 glyph) that an
    * editor would mangle. Three-char punctuation sequences first,
    * then the two-char Ã/Â letter pairs (disjoint lead chars, so
    * order only matters for double-encoded garbage — where the
    * sequential chain performs the standard iterative decode).
    */
  val mojibakePairs: Seq[(String, String)] = Seq(
    "â€“" -> "–", // – en dash
    "â€”" -> "—", // — em dash
    "â€™" -> "’", // ’ right single quote
    "â€˜" -> "‘", // ‘ left single quote
    "â€œ" -> "“", // “ left double quote
    "â€" -> "”", // ” right double quote
    "â€¦" -> "…", // … ellipsis
    "â€¢" -> "•", // • bullet
    "Ã©" -> "é", // é
    "Ã¨" -> "è", // è
    "Ã§" -> "ç", // ç
    "Ã±" -> "ñ", // ñ
    "Ã¼" -> "ü", // ü
    "Ã¶" -> "ö", // ö
    "Ã¤" -> "ä", // ä
    "Ã¡" -> "á", // á
    "Ã­" -> "í", // í
    "Ã³" -> "ó", // ó
    "Ãº" -> "ú", // ú
    "Ã¯" -> "ï", // ï
    "Ã" -> "ß", // ß
    "Ã " -> "à", // à
    "Â " -> " ", // nbsp
    "Â·" -> "·", // ·
    "Â«" -> "«", // «
    "Â»" -> "»", // »
    "Â°" -> "°") // °

  /** Control characters [[fixEncoding]] strips: C0 except tab/LF,
    * DEL, and the C1 block (U+0080–U+009F — never legitimate text;
    * the mojibake repairs that need 0x9D/0x9F run first). Identical
    * byte-for-byte in Java regex and RE2, so the DuckDB oracle
    * replays it verbatim.
    */
  val controlCharClass: String =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"

  /** Encoding repair — the ftfy-style first step of a crawl pipeline,
    * BEFORE [[stripHtml]]: (1) undo the common Windows-1252 mojibake
    * sequences ([[mojibakePairs]], a literal replace chain —
    * codegen'd, replayable); (2) normalize CRLF/CR line endings to
    * LF; (3) strip remaining control characters
    * ([[controlCharClass]]). Whitespace is NOT collapsed here — that
    * is [[stripHtml]]/cleaners' job downstream.
    */
  def fixEncoding(c: Column): Column = {
    val repaired = mojibakePairs.foldLeft(c) { case (acc, (k, v)) =>
      replace(acc, lit(k), lit(v))
    }
    val lf = replace(replace(repaired, lit("\r\n"), lit("\n")),
      lit("\r"), lit("\n"))
    regexp_replace(lf, controlCharClass, "")
  }

  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // `</?[A-Za-z!/]` anchors on real markup: "x < 3" survives
    val noTags = regexp_replace(noComment, "(?s)<[A-Za-z!/][^>]*>", " ")
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
      "&#39;" -> "'", "&#34;" -> "\"", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (acc, (k, v)) =>
      replace(acc, lit(k), lit(v))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Character-level quality signals — the cheapest repetition/junk
    * proxies, complementing [[qualityFlags]] (word-level) and
    * [[repetitionSignals]] (line/n-gram-level):
    *
    *  - `char_entropy`    Shannon entropy (bits/char) of the
    *                      code-point histogram ([[CharEntropy]]
    *                      native kernel; ~4.1–4.3 for English prose,
    *                      near 0 for degenerate repetition, high for
    *                      random bytes), 4 dp;
    *  - `printable_ratio` fraction of characters outside the C0/DEL
    *                      control range, 4 dp (empty → 1.0).
    *
    * Row-local, codegen'd; both fields replay in the oracle (grouped
    * char counts + exact DECIMAL term-sum for the entropy, one
    * Java∩RE2 `regexp_replace` for the ratio). The non-replayable
    * cousin is [[deflateRatio]].
    */
  def entropySignals(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    val ent = GraftSqlBridge.column(CharEntropy(GraftSqlBridge.expression(c)))
    val printable = when(c.isNull, lit(null).cast("double"))
      .when(length(c) > 0,
        length(regexp_replace(c, "[\\x00-\\x1f\\x7f]", "")).cast("double") / length(c))
      .otherwise(1.0)
    struct(
      round(ent, 4).as("char_entropy"),
      round(printable, 4).as("printable_ratio"))
  }

  /** Raw [[CharEntropy]] (unrounded micro-unit sum) — for exact
    * threshold gates where both engines must agree on ≥ comparisons.
    */
  def charEntropy(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(CharEntropy(GraftSqlBridge.expression(c)))
  }

  /** Deflate compression ratio (compressed/original bytes, zlib
    * level 6): repetitive or low-entropy text compresses far below
    * ~0.6, random text sits near 1. Encoder-dependent → ScalaTest-
    * only by declared design (no SQL oracle can replay zlib).
    */
  def deflateRatio(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(DeflateRatio(GraftSqlBridge.expression(c)))
  }

  /** The script classes [[scriptSignals]] counts, each an explicit
    * BMP code-point range class (NOT `\p{script=...}` — the two
    * engines ship different Unicode table versions, a literal range
    * cannot drift): Latin letters (ASCII + Latin-1/Extended-A/B,
    * excluding ×/÷), Cyrillic, Arabic, CJK Unified Ideographs,
    * Hangul syllables, ASCII digits. `\x{h..h}` escapes sit in the
    * Java∩RE2 intersection, so the oracle replays the classes
    * verbatim.
    */
  private[graft] val scriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\x{00C0}-\\x{00D6}\\x{00D8}-\\x{00F6}\\x{00F8}-\\x{024F}",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "han" -> "\\x{4E00}-\\x{9FFF}",
    "hangul" -> "\\x{AC00}-\\x{D7AF}",
    "digit" -> "0-9")

  /** Per-script character counts + dominant script — the signal that
    * catches what [[languageId]]'s stopword vote cannot: mixed-script
    * spam, wrong-script contamination inside a claimed-language
    * slice, and transliteration artifacts. Counts use the
    * remove-and-diff device (`length(c) − length(regexp_replace(c,
    * "[class]", ""))`): each removed BMP char shrinks BOTH engines'
    * length by exactly 1 (UTF-16 units vs code points only diverge
    * on astral chars, which no class matches), so every count —
    * hence the whole struct — replays verbatim in the oracle.
    * `n_letters` is the `\p{L}` count (same device); `latin_ratio` =
    * latin/letters, 4 dp. `dominant` is the first class in
    * [[scriptClasses]] order (digits excluded) whose count is ≥ all
    * later ones — a deterministic argmax both engines express as one
    * CASE chain; all-zero letter counts → null. Row-local,
    * codegen'd, null/empty degrade to null/zero fields.
    */
  def scriptSignals(c: Column): Column = {
    // ONE native pass over the string ([[ScriptCounts]]) instead of
    // seven regexp_replace passes each allocating a rebuilt string —
    // same counts by construction (the kernel replicates the
    // remove-and-diff device code point by code point), so the
    // regex-device oracle replays unchanged. Subexpression
    // elimination evaluates the array once per row.
    import org.apache.spark.sql.GraftSqlBridge
    val arr = GraftSqlBridge.column(ScriptCounts(GraftSqlBridge.expression(c)))
    val counts = scriptClasses.map(_._1).zipWithIndex
      .map { case (nm, i) => nm -> arr.getItem(i) }.toMap
    val letters = arr.getItem(scriptClasses.size)
    val scriptNames = scriptClasses.map(_._1).filterNot(_ == "digit")
    // First name whose count is >= every later name's count; the
    // CASE order itself is the tie-break.
    val dominant = scriptNames.zipWithIndex.foldLeft(
      when(letters === 0L, lit(null).cast("string"))) { case (acc, (nm, i)) =>
      val later = scriptNames.drop(i + 1)
      val isMax = later.foldLeft(counts(nm) > 0L) { (e, o) => e && counts(nm) >= counts(o) }
      acc.when(isMax, lit(nm))
    }.otherwise(lit(null).cast("string"))
    struct(
      (scriptClasses.map { case (nm, _) => counts(nm).as(s"n_$nm") } ++ Seq(
        letters.as("n_letters"),
        round(counts("latin").cast("double") / nullif(letters, lit(0L)), 4)
          .as("latin_ratio"),
        dominant.as("dominant"))): _*)
  }

  /** Concat-and-chunk packing assignment: lay documents out in
    * `orderCol` order, concatenate their tokens into one stream, and
    * cut fixed `seqLen`-token training sequences — sequence j holds
    * tokens [j·seqLen, (j+1)·seqLen). Emits per document its global
    * `start_offset` plus the `first_seq`/`last_seq` it lands in and
    * the `n_seqs` spanned — the bookkeeping a sequence packer needs
    * to build fixed-length examples. The offsets come from the
    * distributed prefix sum
    * ([[graft.operators.Cumulative.withCumulativeSum]]: range
    * partitioning + per-partition offset exchange), so there is no
    * global single-task window anywhere — this survives a 100 TB
    * corpus. Zero-token docs get null sequence bounds and n_seqs = 0.
    * `orderCol` must be unique (the usual determinism contract).
    */
  def packingAssignment(
      df: org.apache.spark.sql.DataFrame,
      tokens: Column,
      orderCol: Column,
      seqLen: Int): org.apache.spark.sql.DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val tokCol = graft.Cols.unique("__tok", df)
    val cumCol = graft.Cols.unique("__cum", df)
    val staged = df.withColumn(tokCol, tokens.cast("long"))
    graft.operators.Cumulative
      .withCumulativeSum(staged, col(tokCol), orderCol, cumCol)
      .withColumn("start_offset", col(cumCol) - col(tokCol))
      // integer `div`, not floor(double /): offsets are exact longs
      // at any corpus size
      .withColumn("first_seq",
        when(col(tokCol) > 0, expr(s"start_offset div $seqLen")))
      .withColumn("last_seq",
        when(col(tokCol) > 0, expr(s"(`$cumCol` - 1) div $seqLen")))
      .withColumn("n_seqs",
        coalesce(col("last_seq") - col("first_seq") + 1, lit(0L)))
      .drop(cumCol, tokCol)
  }

  /** [[packingAssignment]] sized in REAL subword tokens: counts come
    * from the loaded BPE tokenizer, so offsets are directly usable as
    * trainer sequence boundaries.
    */
  def packingAssignment(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      tokenizer: Bpe.Spec,
      orderCol: Column,
      seqLen: Int): org.apache.spark.sql.DataFrame =
    packingAssignment(df, Bpe.bpeTokenCount(col(textCol), tokenizer), orderCol, seqLen)

  /** MATERIALIZE the packed training sequences — the last pipeline
    * step: where [[packingAssignment]] only computes each document's
    * sequence bookkeeping, this emits the actual fixed-`seqLen`
    * examples `(seq_id, input_ids)` a trainer reads, with documents
    * split across sequence boundaries exactly as the assignment
    * dictates (token at global offset g lands in sequence
    * g div seqLen at position g mod seqLen; offsets from the same
    * distributed prefix sum).
    *
    * Scale shape: tokenization stays in-task; each document then
    * emits one FRAGMENT row per sequence it touches (`n_seqs` rows,
    * almost always 1-2 — never per-token rows), and one shuffle
    * keyed by dense `seq_id` assembles fragments into sequences.
    * Moving every token id across the wire once is the irreducible
    * cost of materialization; nothing here is quadratic, windowed, or
    * driver-side. The trailing partial sequence (fewer than `seqLen`
    * tokens) is dropped when `dropPartial` (trainer convention);
    * zero-token docs vanish in the assignment.
    *
    * Returns `(seq_id long, input_ids array<int>, n_tokens int)`.
    */
  def packToShards(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      tokenizer: Bpe.Spec,
      orderCol: Column,
      seqLen: Int,
      dropPartial: Boolean = true): org.apache.spark.sql.DataFrame =
    packToShardsIds(df, Bpe.bpeTokenIds(col(textCol), tokenizer),
      orderCol, seqLen, dropPartial)

  /** [[packToShards]] under a unigram-LM tokenizer — identical
    * packing contract, unigram piece ids in the sequences.
    */
  def packToShards(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      tokenizer: Unigram.Spec,
      orderCol: Column,
      seqLen: Int,
      dropPartial: Boolean): org.apache.spark.sql.DataFrame =
    packToShardsIds(df, Unigram.unigramTokenIds(col(textCol), tokenizer),
      orderCol, seqLen, dropPartial)

  def packToShards(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      tokenizer: Unigram.Spec,
      orderCol: Column,
      seqLen: Int): org.apache.spark.sql.DataFrame =
    packToShards(df, textCol, tokenizer, orderCol, seqLen, dropPartial = true)

  private def packToShardsIds(
      df: org.apache.spark.sql.DataFrame,
      idsExpr: Column,
      orderCol: Column,
      seqLen: Int,
      dropPartial: Boolean): org.apache.spark.sql.DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val idsCol = graft.Cols.unique("__ids", df)
    val staged = df.withColumn(idsCol, idsExpr)
    val assigned = packingAssignment(
      staged, size(col(idsCol)).cast("long"), orderCol, seqLen)
    val L = lit(seqLen.toLong)
    val frags = assigned
      .where(col("n_seqs") > 0)
      .select(col(idsCol), col("start_offset"),
        (col("start_offset") + size(col(idsCol)).cast("long")).as("__doc_end"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      // fragment = this doc's slice of [seq_id·L, (seq_id+1)·L)
      .select(col("seq_id"),
        struct(
          (greatest(col("start_offset"), col("seq_id") * L) - col("seq_id") * L)
            .cast("int").as("pos"),
          slice(col(idsCol),
            (greatest(col("start_offset"), col("seq_id") * L)
              - col("start_offset") + 1).cast("int"),
            (least(col("__doc_end"), (col("seq_id") + 1) * L)
              - greatest(col("start_offset"), col("seq_id") * L)).cast("int"))
            .as("frag")).as("f"))
    val seqs = frags
      .groupBy(col("seq_id"))
      // array_sort on array<struct> orders by the leading `pos` field,
      // so fragments reassemble in stream order
      .agg(flatten(transform(array_sort(collect_list(col("f"))),
        f => f.getField("frag"))).as("input_ids"))
      .withColumn("n_tokens", size(col("input_ids")))
    if (dropPartial) seqs.where(col("n_tokens") === seqLen) else seqs
  }

  /** BM25 ranked retrieval for a fixed query-term set (Robertson &
    * Walker's Okapi BM25, with the Lucene `ln(1 + (N−df+0.5)/(df+0.5))`
    * idf): the scoring half of the row-164 inverted-index story,
    * runnable directly over the corpus frame.
    *
    * Shuffle-free by construction: per-term tf comes from a
    * row-local HOF (`size(filter(tokens, = term))` — no explode, no
    * (doc, term) shuffle), corpus stats (N, Σlen, per-term df) are
    * ONE map-side-combined aggregation into ONE row broadcast back,
    * and the score is a fixed-order expression sum over the ≤ m
    * query terms — deterministic without decimal accumulators
    * because it is never a data-ordered aggregation. The only
    * distributed work beyond the scan is the global top-k
    * (TakeOrderedAndProject — per-partition k rows to the driver).
    *
    * Rounding contract: idf and each term contribution round to
    * 6 dp, the total to 4 dp — every value the oracle compares is
    * identically rounded. Ties break on id ascending.
    *
    * @return (idCol, bm25) — the top `k` scoring docs among those
    *         matching ≥ 1 term.
    */
  def bm25TopK(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      queryTerms: Seq[String],
      k: Int = 50,
      k1: Double = 1.2,
      b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(queryTerms.distinct.size == queryTerms.size, "duplicate query terms")
    val base = graft.operators.Parallelism.spread(df)
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .withColumn("__len", size(col("__w")))
    def tf(term: String): Column =
      size(filter(col("__w"), w => w === lit(term))).cast("double")
    val withTf = queryTerms.zipWithIndex.foldLeft(base) {
      case (acc, (term, j)) => acc.withColumn(s"__tf$j", tf(term))
    }
    val aggs = Seq(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__len").cast("long")).cast("double").as("__sl")) ++
      queryTerms.indices.map(j =>
        sum(when(col(s"__tf$j") > 0, 1L).otherwise(0L)).cast("double").as(s"__df$j"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
      .withColumn("__avgdl", col("__sl") / col("__n"))
    val contrib = queryTerms.indices.map { j =>
      val idf = round(log(lit(1.0) +
        (col("__n") - col(s"__df$j") + 0.5) / (col(s"__df$j") + 0.5)), 6)
      round(idf * col(s"__tf$j") * (k1 + 1) /
        (col(s"__tf$j") + lit(k1) * (lit(1 - b) + lit(b) * col("__len") / col("__avgdl"))), 6)
    }
    scored
      .withColumn("bm25", round(contrib.reduce(_ + _), 4))
      .where(col("bm25") > 0)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("bm25"))
  }

  /** Inverted-index export: token → sorted doc-id posting list —
    * the search/retrieval handoff ("which docs mention X?") and the
    * substrate of BM25-style scoring. Shape at 100 TB:
    *
    *  - document frequencies aggregate FIRST (map-side combined, one
    *    bounded row per vocab entry), and the `[minDf, maxDf]` gate
    *    prunes stopwords and hapaxes BEFORE any posting list exists —
    *    a stopword's corpus-sized posting list is never collected;
    *  - the gate is applied by an equi-join on the token (co-
    *    partitioned with the posting aggregation — one exchange
    *    feeds both), so the vocab table is never broadcast (it is
    *    vocabulary-sized, not small);
    *  - `maxPostings` ranks doc-ids per token BEFORE `collect_list`,
    *    so executor memory holds at most `maxPostings` entries per
    *    token even when `maxDf` is left open.
    *
    * Postings are ascending doc-ids (deterministic; the rank window
    * orders by doc-id), `df_count` counts ALL matching docs even
    * when the emitted list is capped.
    *
    * @return (token, df_count, n_postings, postings).
    */
  def postingLists(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      minDf: Long = 1L,
      maxDf: Long = Long.MaxValue,
      maxPostings: Int = 0): org.apache.spark.sql.DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, "need 1 <= minDf <= maxDf")
    val pairs = graft.operators.Parallelism.spread(df)
      .select(col(idCol).as("__id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .where(col("token") =!= "")
    val eligible = pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("df_count"))
      .where(col("df_count") >= minDf && col("df_count") <= maxDf)
    val ranked =
      if (maxPostings > 0) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("token")).orderBy(col("__id"))
        pairs.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= maxPostings)
      } else pairs
    ranked.join(eligible, Seq("token"))
      .groupBy(col("token"), col("df_count"))
      .agg(sort_array(collect_list(col("__id"))).as("postings"))
      .select(col("token"), col("df_count"),
        size(col("postings")).as("n_postings"), col("postings"))
  }

  /** Heaps'-law vocabulary-growth fit — "is the corpus still teaching
    * the tokenizer new words": distinct-vocabulary size V grows with
    * token count N as V ≈ K·N^β (Heaps 1978; β ≈ 0.4–0.6 for natural
    * language). A β collapsing toward 0 means the tail of the corpus
    * is re-treading known vocabulary (template/boilerplate mass); a
    * synthetic corpus bends the log-log line just like Zipf's. One
    * least-squares line through (ln N(d), ln V(d)) sampled at every
    * document boundary of the `idCol` order.
    *
    * Scale shape — never a sequential scan: each token's FIRST
    * document is one map-side-combined grouped min; per-doc
    * new-vocabulary counts are a second bounded-by-|docs| group; the
    * running (N, V) prefixes ride the
    * [[graft.operators.Cumulative]] distributed prefix sum (no
    * single-partition window); the fit follows the [[zipfFit]]
    * decimal discipline (6 dp ln points and products summed in exact
    * DECIMAL, one double solve). Null doc ids drop; blank docs
    * contribute zero tokens.
    *
    * @return one row: (n_docs, n_tokens, vocab, beta 6 dp, k 6 dp —
    *         the fitted K = e^intercept; beta/k null when fewer than
    *         2 distinct points survive).
    */
  def heapsLaw(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val tk = graft.operators.Parallelism.spread(df)
      .where(col(idCol).isNotNull)
      .select(col(idCol).as("__d"),
        filter(tokens(col(textCol)), t => t =!= "").as("__w"))
      .localCheckpoint() // one tokenize pass feeds counts AND firsts
    val tc = tk.select(col("__d"),
      coalesce(size(col("__w")), lit(0)).cast("long").as("__tc"))
    val nv = tk.select(col("__d"), explode(col("__w")).as("__t"))
      .groupBy(col("__t")).agg(min(col("__d")).as("__fd"))
      .groupBy(col("__fd").as("__d")).agg(count(lit(1)).as("__nv"))
    val perDoc = tc.join(nv, Seq("__d"), "left")
      .select(col("__d"), col("__tc"),
        coalesce(col("__nv"), lit(0L)).as("__nv"))
    val cum = graft.operators.Cumulative.withCumulativeSums(
      perDoc, Seq(col("__tc") -> "__N", col("__nv") -> "__V"), col("__d"))
    val pts = cum
      .where(col("__N") > 0 && col("__V") > 0)
      .select(
        round(log(col("__N").cast("double")), 6).as("__x"),
        round(log(col("__V").cast("double")), 6).as("__y"))
    val fit = pts.agg(
      count(lit(1)).as("__np"),
      sum(col("__x").cast("decimal(18,6)")).as("__sx"),
      sum(col("__y").cast("decimal(18,6)")).as("__sy"),
      sum(round(col("__x") * col("__x"), 6).cast("decimal(18,6)")).as("__sxx"),
      sum(round(col("__x") * col("__y"), 6).cast("decimal(18,6)")).as("__sxy"))
    val tot = perDoc.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("__tc")), lit(0L)).as("n_tokens"),
      coalesce(sum(col("__nv")), lit(0L)).as("vocab"))
    val np = col("__np").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double")
    val sxy = col("__sxy").cast("double")
    val den = np * sxx - sx * sx
    tot.crossJoin(broadcast(fit))
      .withColumn("__beta_raw",
        when(col("__np") >= 2 && den =!= 0.0, (np * sxy - sx * sy) / den))
      .select(
        col("n_docs"), col("n_tokens"), col("vocab"),
        round(col("__beta_raw"), 6).as("beta"),
        round(exp((sy - col("__beta_raw") * sx) / np), 6).as("k"))
  }
}
