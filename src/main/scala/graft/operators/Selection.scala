package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-light data selection for training corpora: DSIR importance
  * resampling (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023) and a multinomial
  * Naive-Bayes quality classifier (the closed-form cousin of the
  * fastText linear filter used by the GPT-3/CCNet pipelines).
  *
  * Both operate on HASHED n-gram bag features (word unigrams +
  * bigrams → md5 bucket), so the model side is bounded by
  * `numBuckets` regardless of corpus size:
  *
  *  - fitting is one counted aggregation per corpus (map-side
  *    combined; output ≤ numBuckets rows — never corpus-sized);
  *  - the fitted table broadcasts by construction (`numBuckets` ≤
  *    65536), so scoring is explode → broadcast join → one
  *    per-doc sum with map-side partial aggregation. The only
  *    shuffle carries (doc id, partial sum) pairs.
  *
  * Hashing is md5-based (first 16 bits) like every other graft
  * sampler, so the DuckDB oracle replays bucket assignment, fitted
  * log-ratios, and the final per-doc sums bit-for-bit (log-ratio
  * rounded at 6 dp before the sum, sums rounded at the query
  * boundary — the determinism discipline of SURVEY §4).
  */
object Selection {

  /** Word unigram + bigram occurrences (with multiplicity) of the
    * lowercased text — the DSIR paper's feature set. Row-local; empty
    * or null text yields an empty/null array, which downstream
    * explodes drop.
    */
  def unigramsAndBigrams(c: Column): Column = {
    val toks = filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    // sequence(1, 0) would DESCEND — guard the bigram branch.
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** Feature bucket of one gram: the first 16 bits of md5, mod
    * `numBuckets` — replayable in any engine with md5.
    */
  def gramBucket(gram: Column, numBuckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 4), 16, 10).cast("int"), lit(numBuckets))

  /** (doc, bucket) occurrence frame used by the scoring paths. */
  private def occurrences(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numBuckets: Int): DataFrame =
    df.select(col(idCol).as("__doc"),
      explode(unigramsAndBigrams(col(textCol))).as("__gram"))
      .select(col("__doc"), gramBucket(col("__gram"), numBuckets).as("bucket"))

  /** Bucket occurrences alone (fit paths — no doc id carried). */
  private def bucketsOnly(df: DataFrame, textCol: String, numBuckets: Int): DataFrame =
    df.select(explode(unigramsAndBigrams(col(textCol))).as("__gram"))
      .select(gramBucket(col("__gram"), numBuckets).as("bucket"))

  /** Smoothed per-bucket log importance ratio
    * `ln p_target(b) − ln p_raw(b)` fitted over the RAW-observed
    * buckets (add-`alpha` smoothing on both sides, so target-absent
    * buckets get the smoothing floor instead of −∞). Output ≤
    * `numBuckets` rows — bounded at any corpus size; rounded at 6 dp
    * so the ratio table is engine-portable.
    */
  def dsirLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      numBuckets: Int = 4096,
      alpha: Double = 1.0): DataFrame = {
    requireBuckets(numBuckets, alpha)
    val rawCounts = bucketsOnly(raw, textCol, numBuckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgtCounts = bucketsOnly(target, textCol, numBuckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    ratioTable(rawCounts, tgtCounts, numBuckets, alpha)
  }

  private def requireBuckets(numBuckets: Int, alpha: Double): Unit = {
    require(numBuckets > 0 && numBuckets <= 65536,
      "numBuckets must be in (0, 65536] (16-bit md5 bucket space)")
    require(alpha > 0, "alpha must be positive (zero-count buckets need mass)")
  }

  /** (bucket, log_ratio) from the two count frames. Grand totals are
    * one-row aggregates broadcast to the (bounded) bucket table — the
    * same scalar-broadcast shape as Cumulative.
    */
  private def ratioTable(
      rawCounts: DataFrame,
      tgtCounts: DataFrame,
      numBuckets: Int,
      alpha: Double): DataFrame = {
    val nr = rawCounts.agg(sum(col("cr")).as("nr"))
    val nt = tgtCounts.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    rawCounts
      .join(tgtCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(nr))
      .crossJoin(broadcast(nt))
      .select(col("bucket"),
        round(
          log((coalesce(col("ct"), lit(0L)) + alpha) / (col("nt") + alpha * numBuckets)) -
            log((col("cr") + alpha) / (col("nr") + alpha * numBuckets)),
          6).as("log_ratio"))
  }

  /** DSIR importance log-weight per document of `df`: the sum over
    * the doc's gram occurrences of the fitted bucket log-ratio. `df`
    * is BOTH the scored corpus and the raw-distribution source (the
    * DSIR setting: select from the raw pool toward `target`'s
    * distribution). Docs with no tokens weigh 0 (no evidence either
    * way). Output: (`idCol`, `dsir_logw` rounded 4 dp).
    *
    * Scale shape: the ratio table (≤ numBuckets rows) broadcasts;
    * the occurrence explode is row-local; the per-doc sum partial-
    * aggregates map-side, so the one shuffle carries a row per
    * (doc, mapper) — never a row per gram.
    */
  def dsirWeights(
      df: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      numBuckets: Int = 4096,
      alpha: Double = 1.0): DataFrame = {
    requireBuckets(numBuckets, alpha)
    // Stage the occurrence frame ONCE (spread first — checkpoint
    // blocks inherit the upstream layout): the raw-count fit and the
    // scoring sum below share one explode+md5 pass over the corpus
    // instead of two.
    val base = Parallelism.spread(df)
    val occ = occurrences(base, textCol, idCol, numBuckets).localCheckpoint(true)
    val rawCounts = occ.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgtCounts = bucketsOnly(target, textCol, numBuckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val ratios = ratioTable(rawCounts, tgtCounts, numBuckets, alpha)
    // The 6-dp ratios are summed as DECIMALs: a double sum is
    // order-dependent in its last ulp, which flips 4-dp rounding on
    // boundary values — decimal sums are exact under any partial-
    // aggregation order (and any engine).
    val sums = occ.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("__doc"))
      .agg(round(sum(col("log_ratio").cast("decimal(18,6)")), 4)
        .cast("double").as("dsir_logw"))
    base.select(col(idCol))
      .join(sums, base(idCol) === sums("__doc"), "left")
      .select(col(idCol), coalesce(col("dsir_logw"), lit(0.0)).as("dsir_logw"))
  }

  /** Deterministic Gumbel-top-`k` importance resample: keeps the `k`
    * docs maximizing `dsir_logw + G(id)`, where `G` is a Gumbel
    * variate derived from the row's 16-bit content hash — the
    * standard Gumbel-max trick for sampling WITHOUT replacement with
    * probability ∝ exp(logw), made reproducible under any
    * partitioning (and engine-replayable) by hashing instead of
    * drawing.
    *
    * `exactMergeLimit` picks the physical shape of the selection
    * tail (both shapes keep the IDENTICAL row set — spec-asserted):
    * see [[gumbelTopK]].
    */
  def dsirResample(
      df: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      numBuckets: Int = 4096,
      alpha: Double = 1.0,
      seed: Int = 0,
      exactMergeLimit: Int = defaultExactMergeLimit): DataFrame = {
    require(k > 0, "k must be positive")
    gumbelTopK(dsirWeights(df, target, textCol, idCol, numBuckets, alpha),
      idCol, "dsir_logw", k, seed, exactMergeLimit)
  }

  /** Largest `k` for which the single-task merge of a global
    * `limit(k)` is acceptable: `TakeOrderedAndProject` merges
    * numPartitions·k rows into ONE task, so at the default the merge
    * is a few hundred thousand skinny (id, weight, key) rows — cheap
    * — while a corpus-fraction k (DSIR's production regime: hundreds
    * of millions of rows at 100 TB) routes to the distributed
    * rank-filter path instead.
    */
  val defaultExactMergeLimit: Int = 10000

  /** Gumbel-top-k over a (`idCol`, `dsir_logw`) weight frame.
    * `(h + 0.5) / 65536` is uniform in (0,1), never 0 or 1 — both ln
    * calls stay finite.
    *
    * Two physical shapes behind one contract, switched on `k`:
    *
    *  - `k ≤ exactMergeLimit`: `orderBy(...).limit(k)` compiles to
    *    `TakeOrderedAndProject` — each task keeps k rows and the
    *    merge touches numPartitions·k rows. Right for "give me the
    *    top 10k docs".
    *  - larger k (selecting a corpus FRACTION — the realistic DSIR
    *    setting): that merge would be a single-task bottleneck
    *    exactly where scale matters, so instead each row's exact
    *    rank under the same (key desc, id asc) total order comes
    *    from the distributed prefix sum
    *    ([[Cumulative.withCumulativeSum]]: range partitioning by the
    *    order key + a per-partition offset exchange bounded by the
    *    cluster's partition count, never by n) and the selection is
    *    a FILTER `rank ≤ k` — no global sort, no single-partition
    *    merge anywhere in the plan.
    *
    * Both shapes select the same rows: the rank path's order key is
    * `struct(-key, id)` ascending = (key desc, id asc), the limit
    * path's explicit sort. Ranks are unique (id is the tie-break),
    * so `rank ≤ k` keeps exactly k rows when the corpus has them.
    */
  private def gumbelTopK(
      w: DataFrame,
      idCol: String,
      logwCol: String,
      k: Int,
      seed: Int,
      exactMergeLimit: Int = defaultExactMergeLimit): DataFrame = {
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 4), 16, 10)
      .cast("double")
    val gumbel = -log(-log((h + 0.5) / 65536.0))
    val keyCol = graft.Cols.unique("__key", w)
    val keyed = w.withColumn(keyCol, col(logwCol) + gumbel)
    if (k <= exactMergeLimit) {
      keyed.orderBy(col(keyCol).desc, col(idCol))
        .limit(k)
        .drop(keyCol)
    } else {
      // Negating the (finite by construction) double key turns the
      // desc order into the struct's natural asc lexicographic order.
      val ordCol = graft.Cols.unique("__ord", w)
      val rankCol = graft.Cols.unique("__rank", w)
      val staged = keyed.withColumn(ordCol,
        struct((-col(keyCol)).as("k"), col(idCol).as("i")))
      Cumulative.withCumulativeSum(staged, lit(1L), col(ordCol), rankCol)
        .where(col(rankCol) <= k)
        .drop(keyCol, ordCol, rankCol)
    }
  }

  /** [[dsirWeights]] for the target-is-a-slice setting (`targetFlag`
    * marks the target rows of `df` itself, e.g. a trusted source
    * column): the flagged occurrence frame is staged ONCE and both
    * count fits and the scoring sum read the staged blocks — one
    * explode+md5 pass over the corpus total, vs two when the target
    * is a separate frame. Null flags count as non-target (like a
    * `where`). Semantics are exactly
    * `dsirWeights(df, df.where(targetFlag), ...)`.
    */
  def dsirSelfWeights(
      df: DataFrame,
      textCol: String,
      targetFlag: Column,
      idCol: String,
      numBuckets: Int = 4096,
      alpha: Double = 1.0): DataFrame = {
    requireBuckets(numBuckets, alpha)
    val base = Parallelism.spread(df)
    val flagCol = graft.Cols.unique("__tgt", base)
    val occ = base
      .withColumn(flagCol, coalesce(targetFlag.cast("boolean"), lit(false)))
      .select(col(idCol).as("__doc"), col(flagCol),
        explode(unigramsAndBigrams(col(textCol))).as("__gram"))
      .select(col("__doc"), col(flagCol),
        gramBucket(col("__gram"), numBuckets).as("bucket"))
      .localCheckpoint(true)
    // ONE counted aggregation fits both distributions (raw = every
    // occurrence, target = the flagged ones — a conditional sum, the
    // same fused shape as [[oddsTable]]): the old rawCounts/tgtCounts
    // pair cost a second full pass over the staged grams plus a
    // bucket join to re-align the two count frames. Counts are
    // integers either way, so the 6-dp log ratios are bit-identical.
    val counts = occ.groupBy(col("bucket")).agg(
      count(lit(1)).as("cr"),
      sum(when(col(flagCol), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(
      sum(col("cr")).as("nr"),
      coalesce(sum(col("ct")), lit(0L)).as("nt"))
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((col("ct") + alpha) / (col("nt") + alpha * numBuckets)) -
            log((col("cr") + alpha) / (col("nr") + alpha * numBuckets)),
          6).as("log_ratio"))
    val sums = occ.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("__doc"))
      .agg(round(sum(col("log_ratio").cast("decimal(18,6)")), 4)
        .cast("double").as("dsir_logw"))
    base.select(col(idCol))
      .join(sums, base(idCol) === sums("__doc"), "left")
      .select(col(idCol), coalesce(col("dsir_logw"), lit(0.0)).as("dsir_logw"))
  }

  /** [[dsirResample]] over [[dsirSelfWeights]] — Gumbel-top-`k` with
    * the one-pass staged fit. `exactMergeLimit` switches the
    * selection tail exactly as in [[dsirResample]].
    */
  def dsirSelfResample(
      df: DataFrame,
      textCol: String,
      targetFlag: Column,
      idCol: String,
      k: Int,
      numBuckets: Int = 4096,
      alpha: Double = 1.0,
      seed: Int = 0,
      exactMergeLimit: Int = defaultExactMergeLimit): DataFrame = {
    require(k > 0, "k must be positive")
    gumbelTopK(
      dsirSelfWeights(df, textCol, targetFlag, idCol, numBuckets, alpha),
      idCol, "dsir_logw", k, seed, exactMergeLimit)
  }

  /** Weight-proportional WITHOUT-replacement top-k over ANY positive
    * weight column (a quality score, a fertility ratio, a dedup
    * cluster size — [[dsirResample]] is this with the DSIR weight):
    * the Gumbel-top-k identity (Efraimidis–Spirakis A-ES, reshaped
    * as log-weight + Gumbel noise) makes P(row selected) ∝ weight
    * with NO per-row RNG state — the noise is the same content-hash
    * uniform as every sampler here, so the pick is reproducible
    * under any partitioning and replayable in SQL. Log-weights are
    * rounded to 6 dp by contract (cross-engine `ln` drift dies at
    * the boundary, same discipline as the DSIR log-ratios). Rows
    * with null or non-positive weight carry zero mass and are
    * excluded. Same two physical shapes as [[dsirResample]]:
    * `TakeOrderedAndProject` for bounded k, the distributed
    * prefix-sum rank filter for corpus-fraction k.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Int = 0,
      exactMergeLimit: Int = defaultExactMergeLimit): DataFrame = {
    require(k > 0, "k must be positive")
    val lw = graft.Cols.unique("__logw", df)
    val w = df
      .where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn(lw, round(log(col(weightCol).cast("double")), 6))
    gumbelTopK(w, idCol, lw, k, seed, exactMergeLimit).drop(lw)
  }

  /** Multinomial Naive-Bayes quality model over hashed gram buckets:
    * per bucket `ln p(b|pos) − ln p(b|neg)` with add-`alpha`
    * smoothing, fitted from a labeled frame (`labelCol` boolean;
    * null labels are excluded from BOTH classes). The class prior is
    * deliberately omitted — it is a per-corpus constant absorbed by
    * the caller's decision threshold, and leaving it out keeps the
    * model a pure (bucket, log_odds) table that applies to any frame.
    * Output ≤ `numBuckets` rows, rounded 6 dp.
    *
    * This is the closed-form stand-in for the fastText linear quality
    * filter (GPT-3, CCNet): same hashed bag-of-ngrams features, same
    * linear per-doc score, but the weights come from one counted
    * aggregation instead of SGD — trainable in a single Spark job at
    * any corpus size.
    */
  def nbTrain(
      labeled: DataFrame,
      textCol: String,
      labelCol: Column,
      numBuckets: Int = 4096,
      alpha: Double = 1.0): DataFrame = {
    require(numBuckets > 0 && numBuckets <= 65536,
      "numBuckets must be in (0, 65536] (16-bit md5 bucket space)")
    require(alpha > 0, "alpha must be positive")
    val lblCol = graft.Cols.unique("__lbl", labeled)
    val occ = labeled
      .withColumn(lblCol, labelCol.cast("boolean"))
      .where(col(lblCol).isNotNull)
      .select(col(lblCol),
        explode(unigramsAndBigrams(col(textCol))).as("__gram"))
      .select(col(lblCol), gramBucket(col("__gram"), numBuckets).as("bucket"))
    oddsTable(occ, lblCol, numBuckets, alpha)
  }

  /** (bucket, log_odds) from a (label, bucket) occurrence frame: one
    * counted agg for both classes (conditional counts partial-
    * aggregate map-side; output bounded by numBuckets), totals as a
    * broadcast one-row aggregate.
    */
  private def oddsTable(
      occ: DataFrame,
      lblCol: String,
      numBuckets: Int,
      alpha: Double): DataFrame = {
    val counts = occ.where(col(lblCol).isNotNull)
      .groupBy(col("bucket")).agg(
        sum(when(col(lblCol), 1L).otherwise(0L)).as("cp"),
        sum(when(!col(lblCol), 1L).otherwise(0L)).as("cn"))
    val totals = counts.agg(
      coalesce(sum(col("cp")), lit(0L)).as("np"),
      coalesce(sum(col("cn")), lit(0L)).as("nn"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((col("cp") + alpha) / (col("np") + alpha * numBuckets)) -
            log((col("cn") + alpha) / (col("nn") + alpha * numBuckets)),
          6).as("log_odds"))
  }

  /** Score any frame under a fitted [[nbTrain]] model: per-doc sum of
    * bucket log-odds over gram occurrences (`nb_score`, rounded 4 dp;
    * higher = more positive-class-like) plus the occurrence count
    * (`n_grams` — callers often length-normalize or gate on it).
    * Docs with no tokens score 0 with 0 grams. Same broadcast-join +
    * map-side-combined sum shape as [[dsirWeights]]; grams absent
    * from the model (bucket never seen in training) contribute
    * nothing, matching the smoothed-equal-likelihood limit.
    */
  def nbScore(
      df: DataFrame,
      model: DataFrame,
      textCol: String,
      idCol: String,
      numBuckets: Int = 4096): DataFrame = {
    val occ = occurrences(df, textCol, idCol, numBuckets)
    // Decimal sum for the same order-independence reason as
    // [[dsirWeights]].
    val sums = occ.join(broadcast(model), Seq("bucket"))
      .groupBy(col("__doc"))
      .agg(round(sum(col("log_odds").cast("decimal(18,6)")), 4)
        .cast("double").as("nb_score"),
        count(lit(1)).as("n_grams"))
    df.select(col(idCol))
      .join(sums, df(idCol) === sums("__doc"), "left")
      .select(col(idCol),
        coalesce(col("nb_score"), lit(0.0)).as("nb_score"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"))
  }

  /** Collect a fitted [[nbTrain]] model to a driver map — BOUNDED by
    * contract (≤ `numBuckets` ≤ 65536 rows, never corpus-sized), the
    * precondition for the shuffle-free serving path below.
    */
  def collectNbModel(model: DataFrame): Map[Int, Double] =
    model.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

  /** Collect a fitted [[dsirLogRatios]] table — same bounded-by-
    * numBuckets contract as [[collectNbModel]].
    */
  def collectDsirRatios(ratios: DataFrame): Map[Int, Double] =
    ratios.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

  /** ROW-LOCAL DSIR importance log-weight from a collected ratio
    * table — the serving twin of [[dsirWeights]] (score a NEW crawl
    * batch or a live stream against ratios fitted offline): literal-
    * map lookup + in-row decimal sum, no explode, no join, no
    * shuffle. Same rounding as the join path; buckets absent from
    * the table (never seen in the raw fit) contribute nothing.
    */
  def dsirWeightColumn(
      ratios: Map[Int, Double],
      text: Column,
      numBuckets: Int = 4096): Column = {
    requireBuckets(numBuckets, 1.0)
    val lookup = typedLit(ratios)
    val matched = filter(
      transform(unigramsAndBigrams(text),
        g => element_at(lookup, gramBucket(g, numBuckets))),
      v => v.isNotNull)
    val zero = lit(new java.math.BigDecimal(0)).cast("decimal(38,6)")
    coalesce(
      round(aggregate(matched, zero, (acc, x) => acc + x.cast("decimal(38,6)")), 4)
        .cast("double"),
      lit(0.0))
  }

  /** ROW-LOCAL Naive-Bayes score: the model ships as a literal map in
    * the plan (like the BPE merge table), the gram walk is a HOF
    * chain, and the decimal sum happens inside the row — no explode,
    * no join, NO SHUFFLE. This is the serving shape: score a live
    * stream (stateless — see graft.streaming.StreamQuality) or a
    * batch frame at scan speed with a model trained elsewhere.
    * Returns a struct (nb_score, n_grams) identical to [[nbScore]]'s
    * columns (same rounding, same matched-gram count).
    */
  def nbScoreColumn(
      model: Map[Int, Double],
      text: Column,
      numBuckets: Int = 4096): Column = {
    requireBuckets(numBuckets, 1.0)
    val lookup = typedLit(model)
    val matched = filter(
      transform(unigramsAndBigrams(text),
        g => element_at(lookup, gramBucket(g, numBuckets))),
      v => v.isNotNull)
    val zero = lit(new java.math.BigDecimal(0)).cast("decimal(38,6)")
    val score = round(
      aggregate(matched, zero, (acc, x) => acc + x.cast("decimal(38,6)")), 4)
      .cast("double")
    struct(
      coalesce(score, lit(0.0)).as("nb_score"),
      coalesce(size(matched), lit(0)).cast("long").as("n_grams"))
  }

  /** [[nbScore]] via the row-local column — zero shuffles, identical
    * output (spec-asserted). Null texts score 0 with 0 grams, like
    * the join path.
    */
  def nbScoreLocal(
      df: DataFrame,
      model: Map[Int, Double],
      textCol: String,
      idCol: String,
      numBuckets: Int = 4096): DataFrame = {
    val sCol = graft.Cols.unique("__s", df)
    df.withColumn(sCol, nbScoreColumn(model, col(textCol), numBuckets))
      .select(col(idCol), col(s"$sCol.nb_score").as("nb_score"),
        col(s"$sCol.n_grams").as("n_grams"))
  }

  /** Train-and-score in one pass over ONE corpus — the seed-filter
    * shape (labels and scored docs from the same frame, e.g.
    * "known-good source vs rest"): the labeled occurrence frame is
    * staged once (spread first, per the checkpoint-layout rule) and
    * both the conditional counts and the per-doc sums read the staged
    * blocks, halving the explode+md5 work vs [[nbTrain]] +
    * [[nbScore]]. Semantics are exactly nbTrain→nbScore: null-label
    * docs are excluded from the fit but still scored.
    */
  def nbSelfScore(
      df: DataFrame,
      textCol: String,
      labelCol: Column,
      idCol: String,
      numBuckets: Int = 4096,
      alpha: Double = 1.0): DataFrame = {
    requireBuckets(numBuckets, alpha)
    val base = Parallelism.spread(df)
    val lblCol = graft.Cols.unique("__lbl", base)
    val occ = base
      .withColumn(lblCol, labelCol.cast("boolean"))
      .select(col(idCol).as("__doc"), col(lblCol),
        explode(unigramsAndBigrams(col(textCol))).as("__gram"))
      .select(col("__doc"), col(lblCol),
        gramBucket(col("__gram"), numBuckets).as("bucket"))
      .localCheckpoint(true)
    val model = oddsTable(occ, lblCol, numBuckets, alpha)
    val sums = occ.join(broadcast(model), Seq("bucket"))
      .groupBy(col("__doc"))
      .agg(round(sum(col("log_odds").cast("decimal(18,6)")), 4)
        .cast("double").as("nb_score"),
        count(lit(1)).as("n_grams"))
    base.select(col(idCol))
      .join(sums, base(idCol) === sums("__doc"), "left")
      .select(col(idCol),
        coalesce(col("nb_score"), lit(0.0)).as("nb_score"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"))
  }
}
