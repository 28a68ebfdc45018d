package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise-preference analytics — the QC layer for RLHF / reward-
  * model comparison data: given judgments "a vs b → a | b | tie",
  * which items are actually stronger, and is the pool consistent
  * enough to train on?
  *
  *  - [[winRates]]: the canonical per-pair table (orientation
  *    normalized so (x,y) and (y,x) judgments pool together).
  *  - [[copelandScores]]: per-item majority-game score — robust,
  *    model-free ranking (1 per opponent beaten, ½ per tied
  *    majority), the first-look leaderboard.
  *  - [[bradleyTerry]]: fixed-iteration minorization-maximization fit
  *    of Bradley-Terry strengths — the standard preference-strength
  *    model (ties excluded, as in the classical formulation).
  *
  * Scale shape: everything reduces the judgment stream to frames
  * bounded by |items| or |item pairs| with ONE map-side-combined
  * grouped count; the BT iterations run entirely on those bounded
  * frames (per-iteration localCheckpoint keeps the plan flat). The
  * ranking windows are |items|-bounded by the `maxItems` guard, so
  * the single-partition sort is a few thousand rows, not data-sized.
  *
  * Determinism (SURVEY §4): winner values outside {a, b, tie} fail
  * the job via `raise_error` (a typo'd judgment must not silently
  * skew strengths); null items or winners drop as unjudged. BT
  * per-term and per-iteration values round into exact DECIMAL before
  * summing, so results are bit-identical under repartitioning and
  * engine-replayable.
  */
object Preference {

  /** Null-TRANSPARENT on purpose: null winners drop via the
    * `cleaned` filter, but Catalyst may push later predicates below
    * that filter and evaluate this expression on null rows first —
    * the guard must not fire there.
    */
  private def winnerGuard(winnerCol: String): Column =
    when(col(winnerCol).isNull || col(winnerCol).isin("a", "b", "tie"),
      col(winnerCol))
      .otherwise(raise_error(concat(
        lit("preference: winner must be 'a'|'b'|'tie', got "), col(winnerCol))))

  /** Both fail-loud guards (winner domain, self-comparison) are
    * folded into `__w`, which every downstream aggregate consumes —
    * no plan path can prune them away.
    */
  private def cleaned(
      df: DataFrame, aCol: String, bCol: String, winnerCol: String): DataFrame =
    df.where(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(winnerCol).isNotNull)
      .select(
        col(aCol).cast("string").as("__a"), col(bCol).cast("string").as("__b"),
        when(col(aCol) === col(bCol), raise_error(concat(
          lit("preference: self-comparison for item "), col(aCol).cast("string"))))
          .otherwise(winnerGuard(winnerCol)).as("__w"))

  /** Per-pair win/loss/tie table with orientation normalized to
    * (item_lo, item_hi) by string order, so (x,y) and (y,x)
    * judgments pool into one row.
    *
    * @return (item_lo, item_hi, n_games, wins_lo, wins_hi, ties,
    *         win_rate_lo 6 dp over decided games — null if all tied).
    */
  def winRates(
      df: DataFrame, aCol: String, bCol: String, winnerCol: String): DataFrame = {
    val c = cleaned(df, aCol, bCol, winnerCol)
    val aIsLo = col("__a") < col("__b")
    c.select(
      least(col("__a"), col("__b")).as("item_lo"),
      greatest(col("__a"), col("__b")).as("item_hi"),
      (when(col("__w") === "a", aIsLo).otherwise(!aIsLo) &&
        col("__w") =!= "tie").as("__lo_won"),
      (col("__w") === "tie").as("__tie"))
      .groupBy(col("item_lo"), col("item_hi"))
      .agg(
        count(lit(1)).as("n_games"),
        count(when(col("__lo_won") && !col("__tie"), 1)).as("wins_lo"),
        count(when(!col("__lo_won") && !col("__tie"), 1)).as("wins_hi"),
        count(when(col("__tie"), 1)).as("ties"))
      .withColumn("win_rate_lo",
        when(col("wins_lo") + col("wins_hi") > 0,
          round(col("wins_lo").cast("double") /
            (col("wins_lo") + col("wins_hi")).cast("double"), 6)))
  }

  /** Copeland leaderboard: 1 point per opponent beaten on decided-
    * game majority, ½ per tied majority (including equal win counts),
    * 0 per loss. Model-free and outlier-robust — the first-look
    * ranking before fitting [[bradleyTerry]] strengths.
    *
    * @return (item, n_opponents, maj_wins, maj_ties, maj_losses,
    *         copeland, rank dense by copeland desc).
    */
  def copelandScores(
      df: DataFrame, aCol: String, bCol: String, winnerCol: String): DataFrame = {
    val pairs = winRates(df, aCol, bCol, winnerCol)
    val lo = pairs.select(col("item_lo").as("item"),
      (col("wins_lo") > col("wins_hi")).as("__win"),
      (col("wins_lo") === col("wins_hi")).as("__tie"))
    val hi = pairs.select(col("item_hi").as("item"),
      (col("wins_hi") > col("wins_lo")).as("__win"),
      (col("wins_lo") === col("wins_hi")).as("__tie"))
    val scored = lo.unionByName(hi)
      .groupBy(col("item"))
      .agg(
        count(lit(1)).as("n_opponents"),
        count(when(col("__win"), 1)).as("maj_wins"),
        count(when(col("__tie"), 1)).as("maj_ties"),
        count(when(!col("__win") && !col("__tie"), 1)).as("maj_losses"))
      .withColumn("copeland",
        col("maj_wins").cast("double") + col("maj_ties").cast("double") / 2)
    // |items|-bounded frame: the global rank window is a few thousand
    // rows by construction, not data-sized
    scored.withColumn("rank",
      dense_rank().over(Window.orderBy(col("copeland").desc)))
  }

  /** Bradley-Terry strengths by `iters` minorization-maximization
    * updates from a uniform start (Hunter 2004 MM algorithm):
    * p_i ← W_i / Σ_j n_ij/(p_i + p_j), then normalized to mean 1.
    * Fixed-iteration by design — deterministic and engine-replayable,
    * not iterated-to-convergence (rank order stabilizes in a few
    * iterations; pass a larger `iters` for tighter strengths). Ties
    * are excluded, as in the classical model.
    *
    * Determinism: each denominator term rounds 12 dp into exact
    * DECIMAL(28,12) before the grouped sum; strengths round 9 dp
    * before the exact normalization sum, and the published strength
    * rounds 6 dp (a crushed item can publish 0.0 — both sides of
    * every denominator are floored at 1e-9, so terms stay finite
    * regardless).
    *
    * @param maxItems fail-loud bound on the item count (the per-
    *        iteration join is |pairs| ≤ |items|²; a runaway item
    *        domain must raise, not OOM) — folded transitively into
    *        the normalization constant, so no plan path skips it.
    * @return (item, wins, n_decided, strength 6 dp, rank dense by
    *         strength desc).
    */
  def bradleyTerry(
      df: DataFrame,
      aCol: String,
      bCol: String,
      winnerCol: String,
      iters: Int = 5,
      maxItems: Int = 10000): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val c = cleaned(df, aCol, bCol, winnerCol).where(col("__w") =!= "tie")
      .select(
        when(col("__w") === "a", col("__a")).otherwise(col("__b")).as("__win"),
        when(col("__w") === "a", col("__b")).otherwise(col("__a")).as("__lose"))
    // symmetric decided-game counts n_ij and per-item win totals W_i,
    // both |items|-bounded; 2 consumers each across iterations
    val games = c.select(col("__win").as("__i"), col("__lose").as("__j"))
      .unionByName(c.select(col("__lose").as("__i"), col("__win").as("__j")))
      .groupBy(col("__i"), col("__j")).agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val wins = c.groupBy(col("__win").as("__i")).agg(count(lit(1)).as("__wins"))
    val perItem = games.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__games"))
      .join(wins, Seq("__i"), "left")
      .select(col("__i"), coalesce(col("__wins"), lit(0L)).as("__wins"),
        col("__games"))
      .localCheckpoint()
    // fail-loud item-count guard, folded into the normalization
    // constant every iteration consumes (the gapFill discipline)
    val guard = perItem.agg(count(lit(1)).as("__k"))
      .select(when(col("__k") <= maxItems, col("__k"))
        .otherwise(raise_error(concat(lit(
          s"bradleyTerry: item count exceeds maxItems=$maxItems: "),
          col("__k").cast("string")))).as("__k"))
    var p = perItem.crossJoin(broadcast(guard))
      .select(col("__i"), lit(1.0).as("__p"), col("__k"))
    for (_ <- 1 to iters) {
      val denom = games
        .join(p.select(col("__i"), col("__p")), Seq("__i"))
        .join(p.select(col("__i").as("__j"), col("__p").as("__pj")), Seq("__j"))
        .select(col("__i"),
          // floor both strengths at 1e-9: published strengths round
          // 6 dp, so a crushed item can reach 0.0 — the floor keeps
          // the term finite (and the cast ANSI-safe) even if two
          // crushed items met
          round(col("__n").cast("double") /
            (greatest(col("__p"), lit(1e-9)) +
              greatest(col("__pj"), lit(1e-9))), 12)
            .cast("decimal(28,12)").as("__t"))
        .groupBy(col("__i")).agg(sum(col("__t")).as("__d"))
      val raw = perItem.join(denom, Seq("__i"))
        .select(col("__i"),
          round(col("__wins").cast("double") / col("__d").cast("double"), 9)
            .as("__p9"))
      // One normalization pass carries BOTH the strength sum and the
      // item count: raw is perItem ⋈ denom over the same item set
      // perItem was counted from, so count(raw) IS the guard's __k —
      // re-cross-joining the guard frame every round paid one
      // broadcast exchange per iteration to re-derive a constant.
      // The totals ride a single-partition WINDOW over the
      // |items|-bounded (≤ maxItems by the guard) raw frame
      // (round-17): the previous agg + crossJoin(broadcast) evaluated
      // `raw` — a games-sized join + aggregation — twice per round
      // and paid a broadcast-collect job each time (the same shape
      // fixed in Graph.hits). The fail-loud raise stays: it re-wraps
      // the count here and the checkpoint below materializes it
      // every round.
      val wAll = Window.partitionBy()
      val normS = sum(col("__p9").cast("decimal(28,9)")).over(wAll)
      val normK = count(lit(1)).over(wAll)
      val kGuarded = when(normK <= maxItems, normK)
        .otherwise(raise_error(concat(lit(
          s"bradleyTerry: item count exceeds maxItems=$maxItems: "),
          normK.cast("string"))))
      p = raw
        .select(col("__i"),
          round(col("__p9") * (kGuarded.cast("double") /
            normS.cast("double")), 6).as("__p"),
          kGuarded.as("__k"))
        .localCheckpoint()
    }
    p.join(perItem, Seq("__i"))
      .select(col("__i").as("item"), col("__wins").as("wins"),
        col("__games").as("n_decided"), col("__p").as("strength"))
      // |items|-bounded global rank window, same note as Copeland
      .withColumn("rank", dense_rank().over(Window.orderBy(col("strength").desc)))
  }
}
