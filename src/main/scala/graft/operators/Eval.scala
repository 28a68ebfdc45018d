package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-evaluation statistics for quality-filter models (the
  * NB/DSIR gate scores of Selection.scala): tie-aware ROC AUC and
  * calibration bins — the two numbers that decide whether a trained
  * filter's threshold means what its score claims.
  *
  * Both are exact and order-independent: AUC accumulates the
  * Mann-Whitney numerator in DECIMAL over per-score counts (never a
  * per-row rank join), calibration sums scores in DECIMAL before the
  * one double division at the output boundary (SURVEY §4 rounding
  * discipline).
  */
object Eval {

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * — combine N rankings of the same query set (BM25 + dense ANN +
    * a rerank cascade…) without score calibration: each doc scores
    * Σᵢ 1/(c + rankᵢ) over the rankings that retrieved it, which
    * SIGIR 2009 showed beats individual rankers and learned fusion
    * on rank information alone — exactly the cheap ensembling a
    * retrieval stack with incomparable scores (BM25 floats vs
    * cosine) needs.
    *
    * Determinism/replay: per-ranking contributions round 8 dp into
    * exact DECIMAL(20,8) (order-independent across rankings), the
    * fused rank orders by (score desc, doc asc) and the top-k filter
    * compiles to WindowGroupLimit. Scale shape: one union + one
    * map-side-combined grouped sum + one pruned rank window.
    *
    * @param rankings frames shaped (queryCol, docCol, rankCol) —
    *                 ranks ≥ 1, unique per (query, doc) within a
    *                 ranking.
    * @return (queryCol, docCol, rrf_score 8 dp, rank 1..topK).
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      queryCol: String,
      docCol: String,
      rankCol: String,
      c: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "no rankings given")
    require(c >= 0, "c must be non-negative")
    require(topK >= 1, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    // a null query/doc/rank row is not a ranking entry: left in, it
    // would consume a fused output rank slot (shifting every real
    // doc below it) and null contributions would silently vanish
    // from the per-doc sum — the ndcgAtK null contract, same reason
    val parts = rankings.map(_
      .where(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(rankCol).isNotNull)
      .select(
        col(queryCol), col(docCol),
        round(lit(1.0) / (col(rankCol).cast("double") + c), 8)
          .cast("decimal(20,8)").as("__c")))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf_score").desc, col(docCol).asc)
    parts.reduce(_ unionByName _)
      .groupBy(col(queryCol), col(docCol))
      .agg(sum(col("__c")).as("__s"))
      .withColumn("rrf_score", col("__s").cast("double"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col(queryCol), col(docCol),
        round(col("rrf_score"), 8).as("rrf_score"), col("rank"))
  }

  /** nDCG@k (Järvelin & Kekäläinen, "Cumulated gain-based evaluation
    * of IR techniques", TOIS 2002) — the graded-relevance ranking
    * metric that scores a retrieval stack (BM25, ANN, rerank
    * cascades) against labeled judgments, per query:
    * DCG@k = Σ_{rank≤k} (2^rel − 1)/ln(rank+1)·ln2-free form — this
    * implementation uses the natural-log discount ln(rank+1)
    * CONSISTENTLY in DCG and IDCG, so the base cancels in the ratio
    * and both engines replay with plain `ln`.
    *
    * Determinism: ranks are the caller's (unique per query by
    * contract); per-position terms round to 8 dp and accumulate in
    * exact DECIMAL(20,8) (order-independent), one double division at
    * the boundary. Docs absent from `rels` count rel 0; queries with
    * no positive judgment get null ndcg (0/0 is "unmeasurable", not
    * perfect or zero).
    *
    * Scale shape: one (query, doc) equi-join, two map-side-combined
    * grouped sums, one per-query window over the JUDGED docs only
    * (WindowGroupLimit prunes to k per query map-side).
    *
    * @return one row per query appearing in either input:
    *         (queryCol, dcg 6 dp, idcg 6 dp, ndcg 6 dp).
    */
  def ndcgAtK(
      ranked: DataFrame,
      rels: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    def gain(r: org.apache.spark.sql.Column) =
      pow(lit(2.0), r.cast("double")) - lit(1.0)
    def term(r: org.apache.spark.sql.Column, rank: org.apache.spark.sql.Column) =
      round(gain(r) / log(rank.cast("double") + lit(1.0)), 8)
        .cast("decimal(20,8)")
    // null query/doc ids drop by contract: the dcg↔rels join and the
    // final full join both match on equality, so a null id would
    // fetch no relevance AND split into two half-rows (null ≠ null
    // in a full join) — silent wrong shape
    val ranked0 = ranked.where(col(queryCol).isNotNull && col(docCol).isNotNull)
    val rels0 = rels.where(col(queryCol).isNotNull && col(docCol).isNotNull)
    val dcg = ranked0
      .where(col(rankCol) <= k)
      .join(rels0.select(col(queryCol), col(docCol), col(relCol)),
        Seq(queryCol, docCol), "left")
      .groupBy(col(queryCol))
      .agg(sum(term(coalesce(col(relCol), lit(0)), col(rankCol))).as("__dcg"))
    val wIdeal = Window.partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(docCol).asc)
    val idcg = rels0
      .where(col(relCol) > 0)
      .withColumn("__ir", row_number().over(wIdeal))
      .where(col("__ir") <= k)
      .groupBy(col(queryCol))
      .agg(sum(term(col(relCol), col("__ir"))).as("__idcg"))
    dcg.join(idcg, Seq(queryCol), "full")
      .select(col(queryCol),
        round(coalesce(col("__dcg").cast("double"), lit(0.0)), 6).as("dcg"),
        round(col("__idcg").cast("double"), 6).as("idcg"),
        round(when(col("__idcg") > 0,
          coalesce(col("__dcg"), lit(0).cast("decimal(20,8)")).cast("double") /
            col("__idcg").cast("double")), 6).as("ndcg"))
  }

  /** Tie-aware ROC AUC (the Mann-Whitney U statistic, average-rank
    * convention) of a boolean `labelCol` against a numeric
    * `scoreCol`.
    *
    * Grouped formulation — never ranks rows: per distinct score s,
    * count positives p_s / negatives n_s (one map-side-combined
    * aggregation); with cn_s = cumulative negatives up to AND
    * including s (the [[Cumulative.withCumulativeSum]] distributed
    * prefix sum — no single-partition window), the doubled numerator
    * is Σ p_s·(2·cn_s − n_s), summed in DECIMAL(38,0) so the result
    * is exact integer arithmetic until ONE final double division.
    *
    * @return one row: (auc, positives, negatives); auc is NaN when
    *         either class is absent.
    */
  /** Cohen's kappa — chance-corrected inter-annotator agreement over
    * two categorical label columns (the QA number for human-labeled
    * quality/filter training sets: raw agreement flatters whenever
    * one label dominates). κ = (p_o − p_e) / (1 − p_e) with
    * p_o = Σ_k n_kk / n and p_e = Σ_k rowMarginal_k · colMarginal_k / n².
    *
    * Scale shape: ONE grouped count bounded by |labels|² (never a
    * per-item frame), marginals joined on that tiny frame. Exact and
    * order-independent: counts and the Σ rowM·colM numerator
    * accumulate in DECIMAL(38,0); the only doubles are the output
    * divisions, in a fixed order (each numerator / n, then / n). Rows
    * where either label is null drop (unlabeled items). κ is null
    * when p_e = 1 (both raters constant — chance correction
    * undefined).
    *
    * @return one row (n_items, n_agree, po 6 dp, pe 6 dp, kappa 6 dp).
    */
  def cohenKappa(df: DataFrame, raterACol: String, raterBCol: String): DataFrame = {
    val cells = df
      .where(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .groupBy(col(raterACol).as("__a"), col(raterBCol).as("__b"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__c"))
    val rowM = cells.groupBy(col("__a").as("__k")).agg(sum(col("__c")).as("__ra"))
    val colM = cells.groupBy(col("__b").as("__k")).agg(sum(col("__c")).as("__rb"))
    val eNum = rowM.join(colM, Seq("__k"), "full")
      .agg(coalesce(sum(
        coalesce(col("__ra"), lit(0)).cast("decimal(38,0)") *
          coalesce(col("__rb"), lit(0)).cast("decimal(38,0)")), lit(0))
        .cast("decimal(38,0)").as("__e"))
    val oNum = cells.agg(
      coalesce(sum(col("__c")), lit(0)).cast("decimal(38,0)").as("__n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__c"))), lit(0))
        .cast("decimal(38,0)").as("__agree"))
    oNum.crossJoin(broadcast(eNum))
      .select(
        col("__n").cast("long").as("n_items"),
        col("__agree").cast("long").as("n_agree"),
        when(col("__n") > 0,
          round(col("__agree").cast("double") / col("__n").cast("double"), 6))
          .as("po"),
        when(col("__n") > 0,
          round(col("__e").cast("double") / col("__n").cast("double")
            / col("__n").cast("double"), 6)).as("pe"),
        when(col("__n") > 0 &&
          col("__e").cast("double") / col("__n").cast("double")
            / col("__n").cast("double") < 1.0,
          round(
            (col("__agree").cast("double") / col("__n").cast("double") -
              col("__e").cast("double") / col("__n").cast("double")
                / col("__n").cast("double")) /
              (lit(1.0) - col("__e").cast("double") / col("__n").cast("double")
                / col("__n").cast("double")), 6)).as("kappa"))
  }

  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__n"))
    val c = Cumulative.withCumulativeSum(g, col("__n"), col("__s"), "__cn")
    c.agg(
        sum(col("__p")).as("__P"),
        sum(col("__n")).as("__N"),
        sum(col("__p").cast("decimal(38,0)") *
          (col("__cn") * 2 - col("__n"))).as("__num"))
      .select(
        // explicit NaN when a class is absent — ANSI mode would
        // otherwise fail the job on the zero divisor
        when(col("__P") > 0 && col("__N") > 0,
          round(col("__num").cast("double") /
            (col("__P").cast("double") * col("__N").cast("double") * lit(2.0)), 6))
          .otherwise(lit(Double.NaN)).as("auc"),
        col("__P").as("positives"),
        col("__N").as("negatives"))
  }

  /** Cumulative gains / lift table — "if we only keep the top 20%
    * by score, what fraction of the positives do we capture, and how
    * much better is that than random?": the decile report that turns
    * [[averagePrecision]]'s integral into the per-tranche numbers a
    * budget decision reads. NEVER a global ntile: distinct scores
    * group first (one map-side-combined pass), BOTH cumulative
    * positives and rows come from one multi-value distributed prefix
    * sum descending, and a score BLOCK lands in the bucket of its
    * END fraction (ceil(buckets·cumRows/N) — deterministic under
    * ties, documented: a tied block never splits across buckets, so
    * sparse score distributions may leave some buckets empty). The
    * final cumulative runs over the ≤ `buckets` aggregated rows.
    *
    * @return one row per non-empty bucket (ascending): (bucket,
    *         n_rows, n_pos, response_rate 6 dp, cum_rows, cum_pos,
    *         cum_gain 6 dp — fraction of ALL positives captured
    *         through this bucket, lift 6 dp — cumulative response
    *         over the base rate; null when the base rate is 0).
    */
  def gainsTable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val g = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        count(lit(1)).as("__t"))
      .localCheckpoint() // feeds the sweep AND the totals once
    val c = Cumulative.withCumulativeSums(
      g, Seq(col("__p") -> "__cp", col("__t") -> "__ct"),
      col("__s"), ascending = false)
    // case-insensitive resolution means __P/__T would collide with
    // the per-score __p/__t — distinct names throughout
    val tot = g.agg(
      coalesce(sum(col("__p")), lit(0L)).as("__totp"),
      coalesce(sum(col("__t")), lit(0L)).as("__tott"))
    val bucketed = c.crossJoin(broadcast(tot))
      // ceil(buckets·cumRows/N) in EXACT integer arithmetic —
      // (a + b − 1) div b — so a bucket boundary can never move by a
      // double ulp between engines
      .withColumn("bucket",
        least(expr(s"($buckets * __ct + __tott - 1) div __tott"), lit(buckets))
          .cast("int"))
      .groupBy(col("bucket"))
      .agg(sum(col("__t")).as("n_rows"), sum(col("__p")).as("n_pos"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("bucket"), lit(1))).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bucketed
      .withColumn("cum_rows", sum(col("n_rows")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n_rows").cast("double"), 6)
          .as("response_rate"),
        col("cum_rows"), col("cum_pos"),
        round(when(col("__totp") > 0,
          col("cum_pos").cast("double") / col("__totp").cast("double")), 6)
          .as("cum_gain"),
        round(when(col("__totp") > 0,
          (col("cum_pos").cast("double") / col("cum_rows").cast("double")) /
            (col("__totp").cast("double") / col("__tott").cast("double"))), 6)
          .as("lift"))
  }

  /** Two-proportion A/B summary — the experiment readout behind
    * "did the new quality gate change the keep rate?": per variant
    * conversions/exposures, absolute lift, and the pooled two-
    * proportion z statistic z = (p_b − p_a)/√(p̂(1−p̂)(1/n_a+1/n_b)),
    * read against the normal tail. ONE aggregation pass (four
    * conditional counts); all derived numbers come from the exact
    * counts on the single output row in a fixed formula order (the
    * oracle replays digit-for-digit). z is null when either arm is
    * empty or the pooled variance is 0 (all-converted / none-
    * converted — no evidence scale). Rows outside the two variants
    * and null conversions drop.
    *
    * @return one row: (n_a, conv_a, n_b, conv_b, rate_a 6 dp,
    *         rate_b 6 dp, lift 6 dp, z 6 dp).
    */
  def abTest(
      df: DataFrame,
      variantCol: String,
      convertedCol: String,
      variantA: String,
      variantB: String): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    val v = col(variantCol)
    val agg = df
      .where((v === variantA || v === variantB) && col(convertedCol).isNotNull)
      .agg(
        coalesce(sum(when(v === variantA, 1L)), lit(0L)).as("n_a"),
        coalesce(sum(when(v === variantA && col(convertedCol), 1L)), lit(0L))
          .as("conv_a"),
        coalesce(sum(when(v === variantB, 1L)), lit(0L)).as("n_b"),
        coalesce(sum(when(v === variantB && col(convertedCol), 1L)), lit(0L))
          .as("conv_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("conv_a").cast("double") / na
    val pb = col("conv_b").cast("double") / nb
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / na + lit(1.0) / nb))
    agg.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(when(col("n_a") > 0, pa), 6).as("rate_a"),
      round(when(col("n_b") > 0, pb), 6).as("rate_b"),
      round(when(col("n_a") > 0 && col("n_b") > 0, pb - pa), 6).as("lift"),
      round(when(col("n_a") > 0 && col("n_b") > 0 &&
        pooled > 0 && pooled < 1, (pb - pa) / se), 6).as("z"))
  }

  /** Regression-eval summary — MAE / RMSE / R² for a numeric
    * predictor (a quality-score regressor, a length estimator, a
    * reranker's calibration against graded labels), the continuous
    * counterpart of [[confusionStats]]. ONE aggregation pass: inputs
    * round to 6 dp into DECIMAL(18,6) — |values| AND |pred − label|
    * must stay under 1e12 (an error outside that bound fails the
    * job's decimal cast LOUDLY under ANSI rather than skewing sums
    * silently) — so errors, their squares (37 digits — under the 38
    * cap, no silent precision loss) and label moments are exact
    * order-independent sums; the three metrics derive on the single
    * output row with fixed-order double arithmetic. R² = 1 − SSE/SST
    * is null when the labels are constant (SST = 0 — "explained
    * variance" is undefined, not 0). Rows with a null on either side
    * drop.
    *
    * @return one row: (n_rows, mae 6 dp, rmse 6 dp, r2 6 dp).
    */
  def regressionStats(
      df: DataFrame,
      predCol: String,
      labelCol: String): DataFrame = {
    val p = round(col(predCol).cast("double"), 6).cast("decimal(18,6)")
    val y = round(col(labelCol).cast("double"), 6).cast("decimal(18,6)")
    val err = (p - y).cast("decimal(18,6)")
    val agg = df
      .where(col(predCol).isNotNull && col(labelCol).isNotNull)
      .agg(
        count(lit(1)).as("__n"),
        coalesce(sum(abs(err)), lit(0)).cast("decimal(38,6)").as("__sae"),
        coalesce(sum(err * err), lit(0)).cast("decimal(38,12)").as("__sse"),
        coalesce(sum(y), lit(0)).cast("decimal(38,6)").as("__sy"),
        coalesce(sum(y * y), lit(0)).cast("decimal(38,12)").as("__syy"))
    val n = col("__n").cast("double")
    val sst = col("__syy").cast("double") -
      col("__sy").cast("double") * col("__sy").cast("double") / n
    agg.select(
      col("__n").as("n_rows"),
      round(when(col("__n") > 0, col("__sae").cast("double") / n), 6).as("mae"),
      round(when(col("__n") > 0, sqrt(col("__sse").cast("double") / n)), 6)
        .as("rmse"),
      round(when(col("__n") > 0 && sst > 0,
        lit(1.0) - col("__sse").cast("double") / sst), 6).as("r2"))
  }

  /** McNemar's paired test — "is filter B actually better than filter
    * A?" asked the RIGHT way: on the SAME examples, only the
    * discordant pairs carry evidence (b = A right / B wrong, c = A
    * wrong / B right), and χ² = (b−c)²/(b+c) against χ²₁ calibrates
    * the answer where comparing two independent accuracy numbers
    * (what [[confusionStats]] alone would give) ignores the pairing
    * and overstates certainty.
    *
    * ONE aggregation pass over the four concordance cells; the
    * statistic derives from exact counts with one double division
    * (null when b + c = 0 — identical predictions carry no paired
    * evidence). Rows with a null prediction or label drop.
    *
    * @return one row: (n_pairs, both_correct, both_wrong, a_only,
    *         b_only, mcnemar 6 dp).
    */
  def mcnemarTest(
      df: DataFrame,
      predACol: String,
      predBCol: String,
      labelCol: String): DataFrame = {
    val aOk = col(predACol) === col(labelCol)
    val bOk = col(predBCol) === col(labelCol)
    df.where(col(predACol).isNotNull && col(predBCol).isNotNull &&
        col(labelCol).isNotNull)
      .agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(when(aOk && bOk, 1L)), lit(0L)).as("both_correct"),
        coalesce(sum(when(!aOk && !bOk, 1L)), lit(0L)).as("both_wrong"),
        coalesce(sum(when(aOk && !bOk, 1L)), lit(0L)).as("a_only"),
        coalesce(sum(when(!aOk && bOk, 1L)), lit(0L)).as("b_only"))
      .withColumn("mcnemar",
        when(col("a_only") + col("b_only") > 0,
          round((col("a_only") - col("b_only")).cast("double") *
            (col("a_only") - col("b_only")).cast("double") /
            (col("a_only") + col("b_only")).cast("double"), 6)))
  }

  /** Confusion-matrix statistics at a decision threshold — the
    * numbers that turn [[rocAuc]]/[[averagePrecision]] curve summaries
    * into an operating point ("gate at 0.7 keeps P=0.91 at R=0.78"):
    * predict positive when score ≥ threshold. ONE aggregation pass
    * (four conditional counts); accuracy/precision/recall/F1 derive
    * from the exact counts on the single output row with one double
    * division each, in a fixed formula order the oracle replays. Null
    * metric when its denominator is 0 (no predicted positives → no
    * precision; ANSI mode would otherwise fail the job).
    *
    * @return one row: (threshold, tp, fp, tn, fn, accuracy 6 dp,
    *         precision 6 dp, recall 6 dp, f1 6 dp).
    */
  def confusionStats(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      threshold: Double): DataFrame = {
    val pred = col(scoreCol) >= threshold
    val agg = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .agg(
        coalesce(sum(when(pred && col(labelCol), 1L)), lit(0L)).as("tp"),
        coalesce(sum(when(pred && !col(labelCol), 1L)), lit(0L)).as("fp"),
        coalesce(sum(when(!pred && !col(labelCol), 1L)), lit(0L)).as("tn"),
        coalesce(sum(when(!pred && col(labelCol), 1L)), lit(0L)).as("fn"))
    val n = (col("tp") + col("fp") + col("tn") + col("fn")).cast("double")
    val p = col("tp").cast("double") / (col("tp") + col("fp")).cast("double")
    val r = col("tp").cast("double") / (col("tp") + col("fn")).cast("double")
    agg.select(
      lit(threshold).as("threshold"),
      col("tp"), col("fp"), col("tn"), col("fn"),
      round(when(n > 0, (col("tp") + col("tn")).cast("double") / n), 6)
        .as("accuracy"),
      round(when(col("tp") + col("fp") > 0, p), 6).as("precision"),
      round(when(col("tp") + col("fn") > 0, r), 6).as("recall"),
      // tp = 0 with both classes predicted/present → F1 is 0 by
      // convention (p = r = 0), not an undefined 0/0
      round(when(col("tp") + col("fp") > 0 && col("tp") + col("fn") > 0,
        when(col("tp") > 0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0))), 6)
        .as("f1"))
  }

  /** Tie-aware average precision (area under the precision-recall
    * curve, step interpolation) — the metric that matters when the
    * positive class is rare (a contamination or PII detector at 0.1%
    * prevalence shows a flattering ROC AUC while its PR curve
    * collapses).
    *
    * Grouped formulation, never a per-row rank: per distinct score s
    * (descending sweep), cumP_s / cumT_s = cumulative positives /
    * rows down to and including the block, block precision
    * cumP_s/cumT_s, and AP = Σ_s p_s · prec_s / P — every positive in
    * a tied block scores the block-END precision (the pessimistic
    * step convention; optimistic-vs-pessimistic differ only within
    * tied blocks and this choice is documented and replayed by the
    * oracle). Cumulatives come from ONE multi-value distributed
    * prefix sum ([[Cumulative.withCumulativeSums]]); per-block terms
    * round to 10 dp and accumulate in exact DECIMAL(28,10), one
    * double division at the boundary.
    *
    * @return one row: (average_precision 6 dp, positives, negatives);
    *         NaN when no positives exist.
    */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        count(lit(1)).as("__t"))
    val c = Cumulative.withCumulativeSums(
      g, Seq(col("__p") -> "__cp", col("__t") -> "__ct"),
      col("__s"), ascending = false)
    c.agg(
        sum(col("__p")).as("__P"),
        sum(col("__t") - col("__p")).as("__N"),
        sum(round(col("__p") * col("__cp").cast("double") / col("__ct"), 10)
          .cast("decimal(28,10)")).as("__num"))
      .select(
        when(col("__P") > 0,
          round(col("__num").cast("double") / col("__P").cast("double"), 6))
          .otherwise(lit(Double.NaN)).as("average_precision"),
        coalesce(col("__P"), lit(0L)).as("positives"),
        coalesce(col("__N"), lit(0L)).as("negatives"))
  }

  /** Expected Calibration Error (Naeini et al., AAAI 2015; the
    * one-number summary of [[calibrationBins]]): ECE =
    * Σ_b (n_b/N)·|mean_score_b − pos_rate_b| over `bins` equal-width
    * bins. Per-bin means and rates use the calibrationBins rounding
    * (6 dp) so the two reports agree digit-for-digit; per-bin terms
    * round to 10 dp into DECIMAL(28,10) (order-independent across the
    * ≤ bins rows), one double division at the boundary.
    *
    * @return one row: (n_items, bins_used, ece 6 dp).
    */
  def expectedCalibrationError(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val s = col(scoreCol)
    val bin = least(greatest(floor(s * bins), lit(0L)), lit(bins - 1L))
    df.where(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(bin.as("__bin"))
      .agg(
        count(lit(1)).as("__n"),
        round(sum(s.cast("decimal(28,10)")).cast("double") / count(lit(1)), 6)
          .as("__ms"),
        round(sum(when(col(labelCol), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("__pr"))
      .agg(
        sum(col("__n")).as("__N"),
        count(lit(1)).as("__bins"),
        sum(round(col("__n") * abs(col("__ms") - col("__pr")), 10)
          .cast("decimal(28,10)")).as("__num"))
      .select(
        coalesce(col("__N"), lit(0L)).as("n_items"),
        col("__bins").cast("long").as("bins_used"),
        when(col("__N") > 0,
          round(col("__num").cast("double") / col("__N").cast("double"), 6))
          .as("ece"))
  }

  /** Reliability-diagram bins: scores bucketed into `bins` equal
    * [0,1) intervals (out-of-range scores clamp into the edge bins),
    * each bin reporting its size, exact mean score (DECIMAL-summed,
    * one double division), and empirical positive rate. A calibrated
    * model has mean_score ≈ pos_rate per bin.
    *
    * One aggregation pass, output bounded by `bins`.
    */
  def calibrationBins(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val s = col(scoreCol)
    val bin = least(greatest(floor(s * bins), lit(0L)), lit(bins - 1L))
    df.where(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(s.cast("decimal(28,10)")).cast("double") / count(lit(1)), 6)
          .as("mean_score"),
        round(sum(when(col(labelCol), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("pos_rate"))
  }

  /** Cumulative Poisson(1) inverse-CDF thresholds (10 dp literals —
    * BOTH engines compare against the same decimal constants; a
    * computed e^-1 would differ in the last ulp), weights capped at
    * 5 (P(X>5) ≈ 0.06%).
    */
  private val poissonCdf =
    Seq(0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431, 0.9963401532)

  /** DETERMINISTIC Poisson-bootstrap confidence interval for the
    * mean of `valueCol` — the error bar an eval report puts on
    * "mean quality score went from 0.62 to 0.64" before anyone acts
    * on it. Replicate b draws each row's weight from a truncated
    * Poisson(1) via the inverse CDF on u = md5(id, seed, b)/2⁶⁰ —
    * the [[graft.operators.Sampling]] hash-draw discipline: no
    * `rand()`, reproducible across retries and partitionings, and
    * the oracle replays every draw.
    *
    * Scale shape: ONE explode of the bounded replicate range (b× row
    * factor — b is a constant, 64 by default), one map-side-combined
    * (replicate) aggregation with exact DECIMAL sums, then the CI
    * percentiles over the b-row frame (bounded single aggregation).
    * Rows with null id or value drop.
    *
    * @return one row: (n_rows, n_replicates, mean 6 dp, ci_lo,
    *         ci_hi) — point estimate from the unweighted mean, CI
    *         from the [alpha/2, 1−alpha/2] replicate quantiles.
    */
  def bootstrapMeanCI(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      replicates: Int = 64,
      seed: Long = 0L,
      alpha: Double = 0.05): DataFrame = {
    require(replicates >= 8, "need at least 8 replicates")
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val b = graft.Cols.unique("__b", df)
    val u = conv(substring(md5(concat_ws(":",
      col(idCol).cast("string"), lit(seed.toString), col(b).cast("string"))),
      1, 15), 16, 10).cast("long").cast("double") / lit(1.152921504606846976e18)
    val w = poissonCdf.zipWithIndex.foldRight(lit(5): org.apache.spark.sql.Column) {
      case ((c, k), rest) => when(u < lit(c), lit(k)).otherwise(rest)
    }
    val base = df.where(col(idCol).isNotNull && col(valueCol).isNotNull)
    val reps = base
      .select(col(idCol), col(valueCol),
        explode(sequence(lit(0), lit(replicates - 1))).as(b))
      .select(col(b).as("__b"), (w * col(valueCol).cast("double")).as("__wx"),
        w.as("__w"))
      .groupBy(col("__b"))
      .agg(sum(col("__wx").cast("decimal(28,10)")).as("__sx"),
        sum(col("__w")).as("__n"))
      .select(when(col("__n") > 0,
        round(col("__sx").cast("double") / col("__n"), 6)).as("__m"))
    val ci = reps.agg(
      count(col("__m")).as("n_replicates"),
      round(percentile(col("__m"), lit(alpha / 2)), 6).as("ci_lo"),
      round(percentile(col("__m"), lit(1.0 - alpha / 2)), 6).as("ci_hi"))
    val point = base.agg(
      count(lit(1)).as("n_rows"),
      round(sum(col(valueCol).cast("decimal(28,10)")).cast("double") /
        count(lit(1)), 6).as("mean"))
    point.crossJoin(broadcast(ci))
      .select(col("n_rows"), col("n_replicates"), col("mean"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Benjamini–Hochberg FDR correction (JRSS-B 1995) — the
    * multiple-comparisons control the rest of this eval suite
    * creates a need for: run [[abTest]]/[[welchTTest]]/
    * [[mannWhitneyU]] over 100 slices and ~5 of them read
    * "significant" at α = 0.05 by chance alone; BH's step-up rule
    * bounds the FALSE DISCOVERY RATE at `q` instead (reject all
    * hypotheses ranked ≤ the largest i with p₍ᵢ₎ ≤ i·q/m).
    *
    * Scale shape: one grouped count per DISTINCT p (map-side
    * combined), ranks from the [[graft.operators.Cumulative]]
    * distributed prefix sum over the bounded distinct-p frame, the
    * step-up cutoff as ONE bounded aggregate broadcast back — never
    * a per-row sort. Ties: a tied block shares the block's LARGEST
    * rank (the most favorable index — the standard step-up reading;
    * any member passing there passes for all). The p ≤ i·q/m compare
    * runs on exact rationals spelled as `p·m ≤ i·q` in DECIMAL —
    * no division, no float boundary. Null p drops; p outside [0, 1]
    * raises in-plan.
    *
    * @return one row per DISTINCT p value: (p_value, n_tests,
    *         rank — the tie block's largest index, bh_critical 6 dp
    *         = rank·q/m, rejected — applies to every test in the
    *         block). Join back on p_value for a per-test frame.
    */
  def bhCorrection(
      df: DataFrame,
      pCol: String,
      q: Double): DataFrame = {
    require(q > 0 && q < 1, "q must be in (0, 1)")
    val pOk = when(col(pCol) < 0 || col(pCol) > 1,
      raise_error(lit(s"bhCorrection: $pCol outside [0, 1]"))
        .cast("double"))
      .otherwise(col(pCol).cast("double"))
    val cells = df
      .where(col(pCol).isNotNull)
      .select(pOk.as("__p"))
      .groupBy(col("__p"))
      .agg(count(lit(1)).as("__c"))
    val ranked = Cumulative.withCumulativeSum(
      cells, col("__c"), col("__p"), "__rank")
    val tot = cells.agg(coalesce(sum(col("__c")), lit(0L)).as("__m"))
    // exact-rational step-up test: p <= rank*q/m  <=>  p*m <= rank*q,
    // both sides exact DECIMAL (q to 6 dp by contract)
    val qDec = lit(BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .cast("decimal(12,6)")
    val flagged = ranked.crossJoin(broadcast(tot))
      .withColumn("__pass",
        col("__p").cast("decimal(18,10)") * col("__m") <=
          col("__rank").cast("decimal(18,6)") * qDec)
    val cut = flagged.agg(
      coalesce(max(when(col("__pass"), col("__rank"))), lit(0L)).as("__cut"))
    flagged.crossJoin(broadcast(cut))
      .select(
        col("__p").as("p_value"),
        col("__m").as("n_tests"),
        col("__rank").as("rank"),
        round(col("__rank").cast("double") * lit(q) / col("__m"), 6)
          .as("bh_critical"),
        (col("__rank") <= col("__cut")).as("rejected"))
  }

  /** Per-group (slice) ROC AUC — [[rocAuc]] computed independently
    * for every slice of `groupCol`: the eval a mixed corpus actually
    * needs, because a global AUC hides a filter that ranks perfectly
    * on English and randomly on Thai (Simpson's-paradox territory —
    * a model can beat another globally and lose on EVERY slice).
    *
    * Same tie-aware Mann–Whitney accumulation as [[rocAuc]], with
    * the cumulative-negative prefix running per group (a RANGE
    * window over the per-(group, score) aggregated frame — bounded
    * by distinct scores per group, parallel across groups; never a
    * window over raw rows). NaN for a group missing a class, same as
    * the global twin.
    *
    * @return one row per group: (groupCol, auc 6 dp — NaN when a
    *         class is absent, positives, negatives).
    */
  def rocAucByGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String): DataFrame = {
    val g = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        col(groupCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol).as("__s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__s"))
      .rangeBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    g.withColumn("__cn", sum(col("__n")).over(w))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__p")).as("__P"),
        sum(col("__n")).as("__N"),
        sum(col("__p").cast("decimal(38,0)") *
          (col("__cn") * 2 - col("__n"))).as("__num"))
      .select(col(groupCol),
        when(col("__P") > 0 && col("__N") > 0,
          round(col("__num").cast("double") /
            (col("__P").cast("double") * col("__N").cast("double") * lit(2.0)),
            6))
          .otherwise(lit(Double.NaN)).as("auc"),
        col("__P").as("positives"),
        col("__N").as("negatives"))
  }

  /** Welch's two-sample t-test (unequal variances) — the MEANS
    * counterpart of [[abTest]]'s proportions z: "did the new
    * filter / variant move the average session value", robust to the
    * two slices having different spreads AND sizes (the corpus-slice
    * norm; Student's pooled-variance t silently assumes equal
    * variance). t = (mean_b − mean_a) / √(s²a/na + s²b/nb), df by
    * Welch–Satterthwaite.
    *
    * ONE aggregation pass: values round 6 dp into DECIMAL(18,6) (the
    * [[regressionStats]] |value| < 1e12 bound contract — squares stay
    * under the 38-digit cap), so both sides' moment sums are exact
    * and order-independent; means round 6 dp BEFORE the variance
    * subtraction (the anomalies discipline) and everything after is
    * fixed-order double arithmetic on the single output row. Rows
    * with null value and other variants drop; t/df null unless both
    * sides have n ≥ 2 and the combined SE is positive.
    *
    * @return one row: (n_a, n_b, mean_a 6 dp, mean_b 6 dp, var_a
    *         6 dp, var_b 6 dp, t 6 dp, df 4 dp).
    */
  def welchTTest(
      df: DataFrame,
      variantCol: String,
      valueCol: String,
      variantA: String,
      variantB: String): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    val v = col(variantCol)
    val x = round(col(valueCol).cast("double"), 6).cast("decimal(18,6)")
    def side(cond: org.apache.spark.sql.Column, suffix: String) = Seq(
      coalesce(sum(when(cond, 1L)), lit(0L)).as("n_" + suffix),
      sum(when(cond, x)).as("__s" + suffix),
      sum(when(cond, (x * x).cast("decimal(38,12)"))).as("__q" + suffix))
    val agg = df
      .where(col(valueCol).isNotNull && (v === variantA || v === variantB))
      .agg(side(v === variantA, "a").head,
        (side(v === variantA, "a").tail ++ side(v === variantB, "b")): _*)
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ma = round(col("__sa").cast("double") / na, 6)
    val mb = round(col("__sb").cast("double") / nb, 6)
    // greatest(0, ·): the 6 dp-rounded mean makes qa − n·ma² a tiny
    // negative for a constant-valued arm; clamp so var is never
    // reported below zero (mirrored in the DuckDB oracle)
    val va = greatest(lit(0.0),
      col("__qa").cast("double") - na * col("__ma") * col("__ma")) /
      (na - lit(1.0))
    val vb = greatest(lit(0.0),
      col("__qb").cast("double") - nb * col("__mb") * col("__mb")) /
      (nb - lit(1.0))
    val sea = col("__va") / na
    val seb = col("__vb") / nb
    val se2 = sea + seb
    val okN = col("n_a") >= 2 && col("n_b") >= 2
    agg
      .withColumn("__ma", when(col("n_a") > 0, ma))
      .withColumn("__mb", when(col("n_b") > 0, mb))
      .withColumn("__va", when(okN, va))
      .withColumn("__vb", when(okN, vb))
      .select(
        col("n_a"), col("n_b"),
        col("__ma").as("mean_a"), col("__mb").as("mean_b"),
        round(col("__va"), 6).as("var_a"),
        round(col("__vb"), 6).as("var_b"),
        round(when(okN && se2 > 0,
          (col("__mb") - col("__ma")) / sqrt(se2)), 6).as("t"),
        round(when(okN && se2 > 0,
          se2 * se2 / (sea * sea / (na - lit(1.0)) +
            seb * seb / (nb - lit(1.0)))), 4).as("df"))
  }

  /** Mann–Whitney U test — the NONPARAMETRIC twin of [[welchTTest]]:
    * "does one slice's value distribution stochastically dominate the
    * other's", immune to the heavy tails and outliers that move a
    * mean (doc lengths, session values, latencies — most corpus
    * metrics). Tie-aware: U from tie-averaged ranks, the normal
    * approximation's variance carries the standard Σ(t³−t) tie
    * correction, plus the rank-biserial effect size
    * r = 2U_b/(n_a·n_b) − 1 ∈ [−1, 1] (the readable number once n
    * makes every z "significant"). No continuity correction
    * (documented; both engines identical).
    *
    * Scale shape: ONE grouped count per distinct value (map-side
    * combined — never a per-row rank), ranks from the
    * [[graft.operators.Cumulative]] distributed prefix sum over the
    * bounded distinct-value frame, doubled-rank arithmetic kept in
    * exact integers (2·rank_avg = 2·cum − t + 1) accumulated in
    * DECIMAL — order-independent; one fixed-order double z at the
    * boundary. Nulls and other variants drop; z null when every
    * value ties (zero variance).
    *
    * @return one row: (n_a, n_b, u_b 1 dp — U of variant B, z 6 dp,
    *         r_rank_biserial 6 dp).
    */
  def mannWhitneyU(
      df: DataFrame,
      variantCol: String,
      valueCol: String,
      variantA: String,
      variantB: String): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    val g = col(variantCol)
    val cells = df
      .where(col(valueCol).isNotNull && (g === variantA || g === variantB))
      .groupBy(col(valueCol).as("__v"))
      .agg(
        sum(when(g === variantA, 1L).otherwise(0L)).as("__ca"),
        sum(when(g === variantB, 1L).otherwise(0L)).as("__cb"))
    val t = col("__ca") + col("__cb")
    val withCum = Cumulative.withCumulativeSums(
      cells.withColumn("__t", t), Seq(col("__t") -> "__cum"), col("__v"))
    // 2·rank_avg of a tie block (size t, inclusive cum) = 2·cum − t + 1
    val rank2 = (lit(2) * col("__cum") - col("__t") + lit(1)).cast("decimal(38,0)")
    val s = withCum.agg(
      coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("__cb")), lit(0L)).as("n_b"),
      coalesce(sum(col("__cb").cast("decimal(38,0)") * rank2), lit(0))
        .cast("decimal(38,0)").as("__s2"),
      coalesce(sum((col("__t").cast("decimal(38,0)") * col("__t") * col("__t") -
        col("__t")).cast("decimal(38,0)")), lit(0))
        .cast("decimal(38,0)").as("__tt"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    // 2·U_b = Σ cb·2rank − nb·(nb+1), exact
    val twoU = col("__s2") -
      (col("n_b").cast("decimal(38,0)") *
        (col("n_b") + 1).cast("decimal(38,0)")).cast("decimal(38,0)")
    val varU = na * nb * ((n + lit(1.0)) -
      col("__tt").cast("double") / (n * (n - lit(1.0)))) / lit(12.0)
    val ok = col("n_a") > 0 && col("n_b") > 0
    s.withColumn("__2u", twoU.cast("double"))
      .withColumn("__varu", when(col("n_a") > 0 && col("n_b") > 0 && n > 1, varU))
      .select(
        col("n_a"), col("n_b"),
        round(when(ok, col("__2u") / lit(2.0)), 1).as("u_b"),
        round(when(col("__varu") > 0,
          (col("__2u") - na * nb) / (lit(2.0) * sqrt(col("__varu")))), 6).as("z"),
        round(when(ok, col("__2u") / (na * nb) - lit(1.0)), 6)
          .as("r_rank_biserial"))
  }

  /** Shared F-statistic core of [[anovaF]] and [[leveneTest]] over a
    * (group, value) frame: ONE grouped moment pass (exact DECIMAL
    * sums of the 6 dp-rounded values), then the bounded per-group
    * frame folds to SS terms. Order-independence discipline: every
    * per-group double term (n_g·(m_g−m)², the within-group q−n·m²)
    * rounds to 6 dp and accumulates in DECIMAL, so the cross-group
    * sums cannot drift with partitioning; the welch zero-clamp
    * applies to each within-group variance numerator.
    */
  private def fStat(df: DataFrame, g: Column, x0: Column): DataFrame = {
    val x = round(x0.cast("double"), 6).cast("decimal(18,6)")
    val perGroup = df
      .where(g.isNotNull && x0.isNotNull)
      .groupBy(g.as("__g"))
      .agg(
        count(lit(1)).as("__n"),
        sum(x).as("__s"),
        sum((x * x).cast("decimal(38,12)")).as("__q"))
      .withColumn("__m", round(col("__s").cast("double") /
        col("__n").cast("double"), 6))
      .withColumn("__w", greatest(lit(0.0),
        col("__q").cast("double") -
          col("__n").cast("double") * col("__m") * col("__m")))
      // bounded |groups| frame feeding BOTH the grand totals and the
      // SS-terms fold: stage it or the corpus moment pass runs twice
      .localCheckpoint()
    val grand = perGroup.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(col("__s")).as("__gs"))
      .withColumn("__gm", round(col("__gs").cast("double") /
        col("n_rows").cast("double"), 6))
    val terms = perGroup
      .crossJoin(broadcast(grand.select(col("__gm"))))
      .agg(
        coalesce(sum(round(col("__n").cast("double") *
          (col("__m") - col("__gm")) * (col("__m") - col("__gm")), 6)
          .cast("decimal(28,6)")), lit(0).cast("decimal(28,6)")).as("__ssb"),
        coalesce(sum(round(col("__w"), 6).cast("decimal(28,6)")),
          lit(0).cast("decimal(28,6)")).as("__ssw"))
    grand.crossJoin(broadcast(terms))
      .select(
        col("n_rows"), col("n_groups"),
        round(col("__ssb").cast("double"), 6).as("ss_between"),
        round(col("__ssw").cast("double"), 6).as("ss_within"),
        (col("n_groups") - 1).as("df1"),
        (col("n_rows") - col("n_groups")).as("df2"),
        round(when(col("n_groups") >= 2 &&
            col("n_rows") > col("n_groups") && col("__ssw") > 0,
          (col("__ssb").cast("double") / (col("n_groups") - 1)) /
            (col("__ssw").cast("double") /
              (col("n_rows") - col("n_groups")))), 6).as("f"))
  }

  /** One-way ANOVA F — "do the group means differ more than chance":
    * the k-arm generalization of [[welchTTest]] (equal-variance,
    * omnibus), the first readout of a k-way experiment or a
    * per-source quality comparison before pairwise drilling. F =
    * (SS_between/(k−1)) / (SS_within/(N−k)).
    *
    * Scale shape: one map-side-combined grouped moment pass; all
    * later arithmetic is on the bounded |groups| frame. Null groups
    * and null values drop (the test is over the labeled arms). F is
    * null when k < 2, N ≤ k, or SS_within = 0 (no residual variance
    * to test against).
    *
    * @return one row: (n_rows, n_groups, ss_between 6 dp, ss_within
    *         6 dp, df1, df2, f 6 dp).
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    fStat(df, col(groupCol), col(valueCol))

  /** Brown–Forsythe test (the robust Levene variant, Brown &
    * Forsythe 1974) — "do the group VARIANCES differ": the
    * [[anovaF]] statistic computed over |v − median_g| deviations.
    * The variance-equality pre-check behind pooled tests, and a
    * dispersion-drift alarm in its own right (a source whose length
    * SPREAD explodes is degrading even when its mean holds).
    * Median-based (not mean-based Levene): robust to the heavy tails
    * corpus metrics always have.
    *
    * Scale shape: one grouped exact-median pass (bounded per-group
    * frame, broadcast join-back — the [[Profile.robustScaleByGroup]]
    * shape), then the [[anovaF]] moment pass over deviations. Null
    * groups/values drop. Medians round 6 dp before the deviation so
    * both engines subtract identical constants.
    *
    * @return one row: (n_rows, n_groups, ss_between 6 dp, ss_within
    *         6 dp, df1, df2, f 6 dp) — F of the deviations.
    */
  def leveneTest(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val meds = df
      .where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__lg"))
      .agg(round(percentile(v, lit(0.5)), 6).as("__med"))
    val dev = df
      .where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .join(broadcast(meds), col(groupCol) === col("__lg"))
      .select(col(groupCol), abs(v - col("__med")).as("__dev"))
    fStat(dev, col(groupCol), col("__dev"))
  }

  /** Paired t-test — the within-subject twin of [[welchTTest]]: each
    * unit carries BOTH measurements (before/after, model A/model B on
    * the same doc), so the test runs on per-unit differences and the
    * between-unit variance cancels — far more sensitive than the
    * unpaired test on the same data. d = a − b per row; t = mean_d /
    * (sd_d/√n), df = n − 1.
    *
    * One aggregation pass over exact DECIMAL moments of the 6 dp
    * differences (the [[welchTTest]] discipline, zero-clamped
    * variance included). Rows with a null on either side drop. t/df
    * null when n < 2 or the differences are constant.
    *
    * @return one row: (n, mean_diff 6 dp, var_diff 6 dp, t 6 dp, df).
    */
  def pairedTTest(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d = round(col(aCol).cast("double") - col(bCol).cast("double"), 6)
      .cast("decimal(18,6)")
    val agg = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(d).as("__s"),
        sum((d * d).cast("decimal(38,12)")).as("__q"))
    val n = col("n").cast("double")
    val md = round(col("__s").cast("double") / n, 6)
    agg
      .withColumn("__md", when(col("n") > 0, md))
      .withColumn("__vd", when(col("n") >= 2,
        greatest(lit(0.0),
          col("__q").cast("double") - n * col("__md") * col("__md")) /
          (n - lit(1.0))))
      .select(
        col("n"),
        col("__md").as("mean_diff"),
        round(col("__vd"), 6).as("var_diff"),
        round(when(col("__vd") > 0,
          col("__md") / sqrt(col("__vd") / n)), 6).as("t"),
        (col("n") - 1).as("df"))
  }

  /** Per-group Wilson score interval — the error bar a RATE deserves
    * (conversion, defect, pass rate): unlike the normal ±z√(p̂q̂/n)
    * interval it never leaves [0,1] and stays honest at small n or
    * extreme p̂. center = (p̂ + z²/2n)/(1 + z²/n), half-width =
    * z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n).
    *
    * One map-side-combined grouped count pass; output bounded by
    * |groups|. A NULL group is a real slice (SQL GROUP BY — the
    * [[Profile.stageFunnelByGroup]] convention); null successes
    * drop. z is a caller literal (1.959964 ≈ 95%) so both engines
    * square the same constant; one 6 dp rounding per output column
    * in a fixed formula order.
    *
    * @return per group: (groupCol, n, successes, rate 6 dp, lo 6 dp,
    *         hi 6 dp).
    */
  def wilsonCI(
      df: DataFrame,
      groupCol: String,
      successCol: String,
      z: Double = 1.959964): DataFrame = {
    require(z > 0, "z must be positive")
    val agg = df
      .where(col(successCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col(successCol), 1L)), lit(0L)).as("successes"))
    val n = col("n").cast("double")
    val p = col("successes").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n)) / denom
    agg.select(
      col(groupCol), col("n"), col("successes"),
      round(p, 6).as("rate"),
      round(greatest(lit(0.0), center - half), 6).as("lo"),
      round(least(lit(1.0), center + half), 6).as("hi"))
  }

  /** Murphy (1973) Brier-score decomposition — the one-row calibration
    * verdict behind a [[calibrationBins]] reliability diagram:
    * brier = reliability − resolution + uncertainty over binned
    * forecasts. Reliability (lower better) is miscalibration —
    * Σ n_k(f̄_k − ō_k)²/N; resolution (higher better) is how far the
    * bins' outcome rates spread from the base rate — Σ n_k(ō_k −
    * ō)²/N; uncertainty ō(1−ō) is the data's irreducible floor.
    *
    * One grouped pass over the [[calibrationBins]] bin convention
    * (floor(s·bins) clamped into edge bins), plus the direct
    * brier = mean((p−y)²) from per-row 10 dp DECIMAL terms —
    * reported alongside so the binning approximation is visible.
    * Per-bin double terms round 6 dp into DECIMAL before the
    * cross-bin sum (the [[anovaF]] order-independence discipline).
    * Null scores/labels drop.
    *
    * @return one row: (n_rows, bins, brier 6 dp, reliability 6 dp,
    *         resolution 6 dp, uncertainty 6 dp).
    */
  def brierDecomposition(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val s = col(scoreCol)
    val y = when(col(labelCol), 1L).otherwise(0L)
    val bin = least(greatest(floor(s * bins), lit(0L)), lit(bins - 1L))
    val base = df.where(s.isNotNull && col(labelCol).isNotNull)
    val perBin = base
      .groupBy(bin.as("__bin"))
      .agg(
        count(lit(1)).as("__n"),
        sum(s.cast("decimal(28,10)")).as("__fs"),
        sum(y).as("__pos"),
        sum(((s - y) * (s - y)).cast("decimal(28,10)")).as("__sq"))
      .withColumn("__f", round(col("__fs").cast("double") /
        col("__n").cast("double"), 6))
      .withColumn("__o", round(col("__pos").cast("double") /
        col("__n").cast("double"), 6))
      // bounded |bins| frame, two consumers (totals + Murphy terms)
      .localCheckpoint()
    val tot = perBin.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
      coalesce(sum(col("__pos")), lit(0L)).as("__allpos"),
      sum(col("__sq")).as("__allsq"))
      .withColumn("__obar", round(col("__allpos").cast("double") /
        col("n_rows").cast("double"), 6))
    val terms = perBin
      .crossJoin(broadcast(tot.select(col("__obar"))))
      .agg(
        coalesce(sum(round(col("__n").cast("double") *
          (col("__f") - col("__o")) * (col("__f") - col("__o")), 6)
          .cast("decimal(28,6)")), lit(0).cast("decimal(28,6)")).as("__rel"),
        coalesce(sum(round(col("__n").cast("double") *
          (col("__o") - col("__obar")) * (col("__o") - col("__obar")), 6)
          .cast("decimal(28,6)")), lit(0).cast("decimal(28,6)")).as("__res"))
    tot.crossJoin(broadcast(terms))
      .select(
        col("n_rows"), lit(bins).as("bins"),
        round(col("__allsq").cast("double") / col("n_rows").cast("double"), 6)
          .as("brier"),
        round(col("__rel").cast("double") / col("n_rows").cast("double"), 6)
          .as("reliability"),
        round(col("__res").cast("double") / col("n_rows").cast("double"), 6)
          .as("resolution"),
        round(col("__obar") * (lit(1.0) - col("__obar")), 6).as("uncertainty"))
  }

  /** Isotonic (PAV) calibration of a classifier score to an
    * empirical probability — what a quality-filter threshold needs
    * before anyone reads the score AS a probability: [[calibrationBins]]
    * shows the miscalibration, this fits the standard monotone
    * correction (pool-adjacent-violators over score buckets).
    *
    * Scores bucket into `bins` equal [0,1) intervals (edge-clamped,
    * the [[expectedCalibrationError]] convention); PAV pools adjacent
    * buckets whose empirical positive rates decrease, with EXACT
    * rational mean comparisons (BigInt cross-multiplication — no
    * float pooling decisions), then publishes each bucket's pooled
    * rate at 6 dp. `block_bin` is the canonical block label: the
    * smallest bin of the maximal run of equal published values
    * (PAV's VALUES are unique; its block structure under exactly
    * equal adjacent means is not — the value-run canonicalization
    * makes the output engine-comparable).
    *
    * Scale shape: ONE map-side-combined aggregation bounded by
    * `bins`, then a driver PAV over ≤ `bins` rows (the bounded-by-
    * contract collect of the model-table operators — `bins` is
    * capped at 100k) broadcast back as a `bins`-row frame. Apply is
    * a broadcast join on the bucket of the incoming score.
    *
    * @return (bin, n, pos, block_bin, calibrated 6 dp), one row per
    *         NON-EMPTY bucket, monotone non-decreasing in bin.
    */
  def isotonicCalibration(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 100): DataFrame = {
    require(bins > 0 && bins <= 100000,
      "bins must be in [1, 100000] (driver-bounded model table)")
    val s = col(scoreCol)
    val bin = least(greatest(floor(s * bins), lit(0L)), lit(bins - 1L))
    val perBin = df.where(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"))
      .orderBy(col("bin"))
      .collect() // ≤ bins rows by construction
    // stack PAV: pool while the previous block's mean EXCEEDS the
    // next's (strict — equal means stay separate, canonicalized below)
    final case class Block(pos: BigInt, n: BigInt, members: List[(Long, Long, Long)])
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    perBin.foreach { r =>
      var b = Block(BigInt(r.getLong(2)), BigInt(r.getLong(1)),
        List((r.getLong(0), r.getLong(1), r.getLong(2))))
      while (stack.nonEmpty &&
        stack.last.pos * b.n > b.pos * stack.last.n) {
        val p = stack.remove(stack.length - 1)
        b = Block(p.pos + b.pos, p.n + b.n, p.members ++ b.members)
      }
      stack += b
    }
    val valued = stack.toList.map { b =>
      val cal = BigDecimal(b.pos.toDouble / b.n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (b.members, cal)
    }
    // canonical block label: min bin of the maximal equal-value run
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double)]
    var runStart = -1L
    var prev = Double.NaN
    valued.foreach { case (members, cal) =>
      if (runStart < 0 || cal != prev) { runStart = members.head._1; prev = cal }
      members.foreach { case (bn, n, pos) => out += ((bn, n, pos, runStart, cal)) }
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toSeq.toDF("bin", "n", "pos", "block_bin", "calibrated")
  }

  /** Collect a fitted [[isotonicCalibration]] table — bounded by
    * `bins` by construction (the [[graft.operators.Selection]]
    * collectNbModel contract).
    */
  def collectIsotonic(calibration: DataFrame): Seq[(Long, Double)] =
    calibration.select(col("bin"), col("calibrated"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq.sortBy(_._1)

  /** ROW-LOCAL calibrated probability for a score — the serving twin
    * of [[isotonicCalibration]] (score a live stream or a new batch
    * against a fit trained offline): the fitted step function ships
    * as a DENSE bins-sized literal array in the plan (empty buckets
    * fill forward from the nearest fitted bucket below; scores below
    * the first fitted bucket take its value; out-of-range scores
    * edge-clamp like the fit). No join, no shuffle — scan-speed
    * serving, the nbScoreColumn shape.
    */
  def isotonicColumn(
      table: Seq[(Long, Double)], score: Column, bins: Int): Column = {
    require(bins > 0 && bins <= 100000, "bins must be in [1, 100000]")
    require(table.nonEmpty, "isotonicColumn needs a non-empty fit table")
    val sorted = table.sortBy(_._1)
    require(sorted.head._1 >= 0 && sorted.last._1 < bins,
      s"fit table bins must lie in [0, $bins)")
    val fitted = sorted.toMap
    val dense = new Array[Double](bins)
    var cur = sorted.head._2
    (0 until bins).foreach { b =>
      cur = fitted.getOrElse(b.toLong, cur)
      dense(b) = cur
    }
    val arr = typedLit(dense.toSeq)
    val bin = least(greatest(floor(score * bins), lit(0L)), lit(bins - 1L))
    when(score.isNotNull, element_at(arr, (bin + 1).cast("int")))
  }

  /** Krippendorff's alpha (nominal) — chance-corrected agreement over
    * ANY number of raters with missing ratings, the annotation-QC
    * number [[cohenKappa]] cannot produce once a labeling pool stops
    * being two-complete (the usual case: N raters, each item rated by
    * whoever was assigned). Input is LONG format: one row per rating
    * (item, label); rater identity is irrelevant to nominal alpha.
    *
    * α = 1 − D_o/D_e over the coincidence matrix. Within an item
    * rated m_u ≥ 2 times with per-label counts m_uc, the disagreeing
    * ordered-pair mass is A_u = (m_u² − Σ_c m_uc²)/(m_u − 1); with
    * n = Σ m_u (pairable values) and n_c = Σ_u m_uc:
    * α = 1 − (n−1)·Σ_u A_u / (n² − Σ_c n_c²).
    *
    * Exact and order-independent (the [[cohenKappa]] discipline): all
    * counts accumulate in DECIMAL(38,0); the per-item 1/(m_u−1)
    * weights are folded EXACTLY by grouping items on m_u (the
    * distinct-m frame is bounded by the max ratings-per-item) and
    * multiplying through the common denominator D = Π(m−1) — integer
    * arithmetic end to end, with the only doubles being the output
    * divisions in a fixed order. D is guarded ≤ 1e15 via
    * `raise_error` (fail loud, never a silent decimal overflow):
    * real annotation pools have a handful of distinct per-item
    * rating counts.
    *
    * Scale shape: one (item,label) grouped count (map-side combined),
    * one item-level reduce, then everything is label- or
    * distinct-m-bounded; no per-rating joins or windows.
    *
    * @return one row (n_items, n_values, do_rate, de_rate, alpha
    *         6 dp; alpha null when n < 2 or D_e = 0 — a constant
    *         label pool has no chance disagreement to correct by).
    */
  /** Krippendorff's alpha with the INTERVAL metric — the
    * [[krippendorffAlpha]] for NUMERIC ratings (Likert quality
    * scores, 1-5 helpfulness grades): disagreement is squared
    * distance, so a 1-vs-2 split costs far less than 1-vs-5.
    * Same pool shape (long format, any rater count, missing ratings
    * fine; rows with null item or value drop).
    *
    * Within an item rated m ≥ 2 times, the ordered-pair disagreement
    * Σ(x−y)² = 2[m·Σx² − (Σx)²]; pooled the same way over all n
    * pairable values for the expectation:
    * α = 1 − (n−1)·Σ_u A_u/(m_u−1) / (n·Σx² − (Σx)²)·2 … with the
    * identical common-denominator folding as the nominal form.
    *
    * Exactness: values fix to 6 dp on entry and scale to INTEGERS
    * (v = x·10⁶ — 6 dp is the rating-scale contract, and |x| ≤ 1000
    * is guarded fail-loud so every moment below stays inside
    * DECIMAL(38,0)); all sums and products are integer-exact, the
    * per-item 1/(m−1) weights fold through D = Π(m−1) (guarded
    * ≤ 1e6 here — the v² unit inflation leaves less headroom than
    * the nominal form's 1e15), and the only doubles are the
    * fixed-order output divisions (do/de are reported in RATING²
    * units — the 10¹² v-unit factor divides out explicitly; it
    * cancels entirely in alpha).
    *
    * @return one row (n_items, n_values, do_rate, de_rate, alpha
    *         6 dp; alpha null when n < 2 or the pooled variance is 0).
    */
  def krippendorffAlphaInterval(
      df: DataFrame,
      itemCol: String,
      valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val xIn = col(valueCol).cast("decimal(18,6)")
    val v = when(abs(xIn) <= 1000, (xIn * 1000000).cast(d38))
      .otherwise(raise_error(concat(
        lit("krippendorffAlphaInterval: |value| must be <= 1000, got "),
        col(valueCol).cast("string"))))
    // One linear pipeline (round-17, guide §2.4): the pooled totals
    // (n, items, Σx, Σx²) fold into the SAME distinct-m frame the
    // by-m disagreement masses ride — per-m count and sums collected
    // alongside __S, totals recovered row-locally from the array —
    // so the separate `tot` aggregation over mu, its crossJoin
    // broadcast, and mu's 2-consumer localCheckpoint all disappear.
    // All folds are integer-exact decimal sums regrouped by m
    // (addition is associative; counts are integers), so every
    // output is bit-identical.
    val mu = df
      .where(col(itemCol).isNotNull && col(valueCol).isNotNull)
      .select(col(itemCol).as("__i"), v.as("__v"))
      .groupBy(col("__i"))
      .agg(count(lit(1)).cast(d38).as("__m"),
        sum(col("__v")).cast(d38).as("__s1"),
        sum((col("__v") * col("__v")).cast(d38)).cast(d38).as("__s2"))
      .where(col("__m") >= 2)
    val byM = mu.groupBy(col("__m"))
      .agg(sum(((col("__m") * col("__s2")).cast(d38) -
        (col("__s1") * col("__s1")).cast(d38)) * 2).cast(d38).as("__S"),
        count(lit(1)).as("__cm"),
        sum(col("__s1")).cast(d38).as("__t1m"),
        sum(col("__s2")).cast(d38).as("__t2m"))
    // array_sort orders by the struct's leading field m (unique per
    // row), so the fold below walks the same m-ascending sequence as
    // before regardless of the extra total fields.
    val ms = byM.agg(array_sort(collect_list(struct(
      col("__m").cast("long").as("m"), col("__S").as("s"),
      col("__cm").as("cm"), col("__t1m").as("t1m"),
      col("__t2m").as("t2m")))).as("__ms"))
    val dRaw = aggregate(col("__ms"), lit(1).cast(d38),
      (acc, xx) => (acc * (xx.getField("m") - 1).cast(d38)).cast(d38))
    val folded = ms.select(
      when(dRaw.isNull || dRaw > lit(1e6),
        raise_error(lit("krippendorffAlphaInterval: Π(m−1) over distinct " +
          "ratings-per-item exceeds 1e6 — pool has too many distinct " +
          "per-item rating counts for exact folding")))
        .otherwise(dRaw).as("__D"),
      col("__ms"))
    val num = folded.select(col("__D"),
      aggregate(col("__ms"), lit(0).cast(d38),
        (acc, xx) => (acc + (xx.getField("s") *
          (col("__D").cast("double") / (xx.getField("m") - 1).cast("double"))
            .cast(d38)).cast(d38)).cast(d38)).as("__num"),
      aggregate(col("__ms"), lit(0).cast(d38),
        (acc, xx) => (acc + (xx.getField("m").cast(d38) *
          xx.getField("cm").cast(d38)).cast(d38)).cast(d38)).as("__n"),
      aggregate(col("__ms"), lit(0L),
        (acc, xx) => acc + xx.getField("cm")).as("__items"),
      aggregate(col("__ms"), lit(0).cast(d38),
        (acc, xx) => (acc + xx.getField("t1m")).cast(d38)).as("__t1"),
      aggregate(col("__ms"), lit(0).cast(d38),
        (acc, xx) => (acc + xx.getField("t2m")).cast(d38)).as("__t2"))
    val y = ((col("__n") * col("__t2")).cast(d38) -
      (col("__t1") * col("__t1")).cast(d38)) * 2
    val unit = lit(1e12) // v = x·10⁶ → v² carries 10¹²
    num
      .select(
        col("__items").as("n_items"),
        col("__n").cast("long").as("n_values"),
        when(col("__n") >= 2, round(
          col("__num").cast("double") / col("__D").cast("double")
            / col("__n").cast("double") / unit, 6)).as("do_rate"),
        when(col("__n") >= 2, round(
          y.cast("double") / col("__n").cast("double")
            / (col("__n") - 1).cast("double") / unit, 6)).as("de_rate"),
        when(col("__n") >= 2 && y.cast("double") > 0.0,
          round(lit(1.0) -
            (col("__num").cast("double") * (col("__n") - 1).cast("double"))
              / (col("__D").cast("double") * y.cast("double")), 6))
          .as("alpha"))
  }

  def krippendorffAlpha(
      df: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val muc = df
      .where(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__l"))
      .agg(count(lit(1)).cast(d38).as("__c"))
      // 2 consumers (item reduce + label marginals) — stage once
      .localCheckpoint()
    // The pooled totals (n, items) fold into the distinct-m frame
    // exactly as in [[krippendorffAlphaInterval]] (round-17): per-m
    // item counts ride the byM aggregate and the totals are
    // recovered row-locally from the collected array — one fewer
    // aggregation pass over mu and one fewer broadcast; integer-
    // exact regrouping, bit-identical outputs. mu keeps its
    // checkpoint (still 2 consumers: byM + the marginal semi-join).
    val mu = muc.groupBy(col("__i"))
      .agg(sum(col("__c")).cast(d38).as("__m"),
        sum(col("__c") * col("__c")).cast(d38).as("__s2"))
      .where(col("__m") >= 2)
      .localCheckpoint() // 2 consumers: byM + marginal semi-join
    val byM = mu.groupBy(col("__m"))
      .agg(sum(col("__m") * col("__m") - col("__s2")).cast(d38).as("__S"),
        count(lit(1)).as("__cm"))
    val y = muc.join(mu.select(col("__i")), Seq("__i"), "left_semi")
      .groupBy(col("__l")).agg(sum(col("__c")).cast(d38).as("__nc"))
      .agg(coalesce(sum(col("__nc") * col("__nc")), lit(0)).cast(d38).as("__sc2"))
    // Fold the 1/(m−1) weights exactly: D = Π(m−1) over the bounded
    // distinct-m frame, num = Σ_m S_m · D/(m−1). D/(m−1) divides
    // exactly and D ≤ 1e15 < 2^53, so the double division inside the
    // fold is integer-exact; everything re-enters DECIMAL immediately.
    val ms = byM.agg(array_sort(collect_list(struct(
      col("__m").cast("long").as("m"), col("__S").as("s"),
      col("__cm").as("cm")))).as("__ms"))
    val dRaw = aggregate(col("__ms"), lit(1).cast(d38),
      (acc, x) => (acc * (x.getField("m") - 1).cast(d38)).cast(d38))
    val folded = ms.select(
      when(dRaw.isNull || dRaw > lit(1e15),
        raise_error(lit("krippendorffAlpha: Π(m−1) over distinct " +
          "ratings-per-item exceeds 1e15 — pool has too many distinct " +
          "per-item rating counts for exact folding")))
        .otherwise(dRaw).as("__D"),
      col("__ms"))
    val num = folded.select(col("__D"),
      aggregate(col("__ms"), lit(0).cast(d38),
        (acc, x) => (acc + x.getField("s") *
          (col("__D").cast("double") / (x.getField("m") - 1).cast("double"))
            .cast(d38)).cast(d38)).as("__num"),
      aggregate(col("__ms"), lit(0).cast(d38),
        (acc, x) => (acc + (x.getField("m").cast(d38) *
          x.getField("cm").cast(d38)).cast(d38)).cast(d38)).as("__n"),
      aggregate(col("__ms"), lit(0L),
        (acc, x) => acc + x.getField("cm")).as("__items"))
    num.crossJoin(broadcast(y))
      .select(
        col("__items").as("n_items"),
        col("__n").cast("long").as("n_values"),
        when(col("__n") >= 2, round(
          col("__num").cast("double") / col("__D").cast("double")
            / col("__n").cast("double"), 6)).as("do_rate"),
        when(col("__n") >= 2, round(
          (col("__n") * col("__n") - col("__sc2")).cast("double")
            / col("__n").cast("double")
            / (col("__n") - 1).cast("double"), 6)).as("de_rate"),
        when(col("__n") >= 2 &&
          (col("__n") * col("__n") - col("__sc2")).cast("double") > 0.0,
          round(lit(1.0) -
            (col("__num").cast("double") * (col("__n") - 1).cast("double"))
              / (col("__D").cast("double") *
                (col("__n") * col("__n") - col("__sc2")).cast("double")), 6))
          .as("alpha"))
  }
}
