package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines.
  *
  * `DataFrame.sample`/`sampleBy` are seeded per-partition: the result
  * changes under repartitioning, retries, or cluster resizing — fatal
  * for dataset reproducibility. These samplers decide per ROW from a
  * hash of a stable id, so the same row set comes back on any
  * cluster, any partitioning, any engine (md5-based — the DuckDB
  * oracle replays it exactly).
  */
object Sampling {

  /** Keep-decision column: the first 16 bits of md5(id:seed) form a
    * uniform value in [0, 65536); keep when < fraction·65536.
    */
  def keepFlag(idCol: Column, fraction: Double, seed: Int = 0): Column = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    // concat (not concat_ws): a null id must null-propagate so the
    // row is dropped, exactly like the oracle's `id::VARCHAR || ...`.
    conv(substring(md5(concat(idCol.cast("string"), lit(":" + seed))), 1, 4), 16, 10)
      .cast("int") < lit(math.floor(fraction * 65536).toInt)
  }

  /** Deterministic `fraction` sample keyed on `idCol`. */
  def deterministicSample(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      seed: Int = 0): DataFrame =
    df.where(keepFlag(col(idCol), fraction, seed))

  /** Largest deterministic subsample whose strata follow a TARGET
    * distribution — the corpus-rebalancing step of a training-data
    * pipeline (e.g. cap English at 50% of the mix). `targets` are
    * relative shares (normalized internally); strata not listed are
    * dropped, and targeted strata absent from the corpus are ignored
    * (the achieved mix covers the observed strata).
    *
    * The output size M is the largest achievable under the targets:
    * M = min_k n_k / share_k, giving per-stratum keep fractions
    * share_k·M / n_k (the binding stratum keeps everything). One tiny
    * aggregation (a row per stratum — never a data collect) feeds the
    * closed-form fractions; row decisions are then the same
    * content-hash keeps as [[stratifiedSample]], so the sample is
    * reproducible under any partitioning and DuckDB-replayable.
    * Expected counts are binomial around share_k·M, the usual hash-
    * sampling tolerance.
    */
  def rebalanceToDistribution(
      df: DataFrame,
      strataCol: String,
      targets: Map[String, Double],
      idCol: String,
      seed: Int = 0): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ >= 0) &&
      targets.values.sum > 0, "targets must be non-negative with a positive sum")
    val norm = targets.values.sum
    val shares = targets.map { case (k, v) => k -> v / norm }
    val counts = df
      .where(col(strataCol).isin(targets.keys.toSeq: _*))
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    // Strata ABSENT from the corpus are ignored (like the SQL
    // formulation's inner join on observed counts): the mix is
    // computed over the strata that exist. A present-but-empty
    // stratum cannot occur (count ≥ 1 by construction).
    val m = shares.foldLeft(Double.PositiveInfinity) { case (acc, (k, s)) =>
      if (s == 0 || !counts.contains(k)) acc
      else math.min(acc, counts(k) / s)
    }
    if (m.isInfinity || m <= 0) df.where(lit(false))
    else {
      val fractions = shares.collect {
        case (k, s) if s > 0 && counts.getOrElse(k, 0L) > 0 =>
          k -> math.min(1.0, s * m / counts(k))
      }
      stratifiedSample(df, strataCol, fractions, idCol, seed)
    }
  }

  /** Deterministic train/val/test assignment: adds `outCol` holding
    * the name of the split each row falls in. Weights are relative
    * shares (normalized internally); the row's 16-bit content-hash
    * value is matched against the cumulative thresholds, so splits
    * are disjoint, exhaustive, reproducible under any partitioning,
    * and STABLE UNDER RE-WEIGHTING of a prefix: growing `train` from
    * 0.8 to 0.9 only moves rows out of the later splits, never
    * shuffles rows between existing ones. Rows with a null id get a
    * null split (they have no stable identity to assign).
    */
  def splitByHash(
      df: DataFrame,
      weights: Seq[(String, Double)],
      idCol: String,
      seed: Int = 0,
      outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      weights.map(_._2).sum > 0, "weights must be non-negative with a positive sum")
    require(weights.map(_._1).distinct.size == weights.size, "duplicate split names")
    val norm = weights.map(_._2).sum
    // Integer thresholds in the 16-bit hash space; the LAST split's
    // threshold is forced to 65536 so rounding never leaves a gap.
    val cum = weights.map(_._2 / norm).scanLeft(0.0)(_ + _).tail
    val thresholds = cum.init.map(c => math.floor(c * 65536).toInt) :+ 65536
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 4), 16, 10)
      .cast("int")
    // Stage the hash as a real column: the when-chain references it
    // once per split, and HOF-free or not, md5-per-reference is waste.
    // A null hash (null id) falls through every `< t` predicate to
    // the null default — no explicit isNotNull needed.
    val hCol = graft.Cols.unique("__graft_h", df)
    val label = weights.map(_._1).zip(thresholds).foldRight(lit(null).cast("string")) {
      case ((name, t), rest) => when(col(hCol) < t, name).otherwise(rest)
    }
    df.withColumn(hCol, h)
      .withColumn(outCol, label)
      .drop(hCol)
  }

  /** Leakage-safe train/val/test assignment: like [[splitByHash]],
    * but every NEAR-DUPLICATE CLUSTER lands in exactly one split.
    * [[splitByHash]] hashes ids independently of the dedup machinery,
    * so two near-duplicate docs can straddle train and test — exactly
    * the contamination the dedup stack exists to stop. Here the hash
    * key is the duplicate-cluster label ([[Dedup.duplicateClusters]]
    * over `pairs`; docs in no pair form singleton clusters keyed by
    * their own id), so near-dups move between splits TOGETHER.
    *
    * Scale shape: the cluster frame is bounded by the ids appearing
    * in `pairs` (the duplicates — a small fraction of the corpus),
    * joined to the corpus on its id key; the split decision itself is
    * the same row-local 16-bit content hash as [[splitByHash]], so
    * the assignment stays reproducible under any partitioning and
    * engine-replayable. Rows with a null id get a null split.
    */
  def splitByCluster(
      df: DataFrame,
      pairs: DataFrame,
      weights: Seq[(String, Double)],
      idCol: String,
      seed: Int = 0,
      outCol: String = "split",
      idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val clusters = Dedup.duplicateClusters(pairs, idA, idB)
    val cidCol = graft.Cols.unique("__graft_cid", df)
    val ckCol = graft.Cols.unique("__graft_ck", df)
    val keyed = df
      .join(clusters.select(col("id").as(cidCol), col("label").as(ckCol)),
        df(idCol) === col(cidCol), "left")
      .drop(cidCol)
      .withColumn(ckCol, coalesce(col(ckCol), col(idCol)))
    splitByHash(keyed, weights, ckCol, seed, outCol).drop(ckCol)
  }

  /** Cap each stratum's contribution at `maxRows` rows (the
    * per-domain/per-source cap of a web-corpus pipeline): rows within
    * a stratum are ranked by a content hash of their id and the first
    * `maxRows` kept — a deterministic uniform subsample of every
    * oversized stratum, exact (not binomial) counts. The rank
    * filter compiles to `WindowGroupLimit`, so each task pre-prunes
    * to `maxRows` per stratum BEFORE the shuffle — a skewed domain
    * never lands on one executor at full size.
    */
  def capPerStratum(
      df: DataFrame,
      strataCol: String,
      maxRows: Long,
      idCol: String,
      seed: Int = 0): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    import org.apache.spark.sql.expressions.Window
    val hash = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    val w = Window.partitionBy(col(strataCol)).orderBy(hash, col(idCol))
    val rnCol = graft.Cols.unique("__graft_rn", df)
    df.withColumn(rnCol, row_number().over(w))
      .where(col(rnCol) <= maxRows)
      .drop(rnCol)
  }

  /** Epoch-weighted upsampling: emit each row `times` times with a
    * 0-based `outCol` repetition index (the mixture-weights step of a
    * training run — high-quality sources repeated more epochs).
    * `times ≤ 0` or null drops the row; the repetition index makes
    * the output deterministic and gives downstream shuffles distinct
    * keys (so repeated rows spread instead of clumping). The explode
    * is row-local — no shuffle, no driver involvement; a row fans out
    * inside its own task.
    */
  def upsample(df: DataFrame, times: Column, outCol: String = "rep"): DataFrame = {
    // explicit empty-array branch: sequence(0, -1) would DESCEND
    val reps = when(times > 0,
      sequence(lit(0L), times.cast("long") - 1)).otherwise(array().cast("array<bigint>"))
    df.withColumn(outCol, explode(reps))
  }

  /** Global deterministic training-order shuffle: adds `outCol`, a
    * contiguous 0-based order index assigned by content hash — the
    * "global shuffle" step before sequence packing / sharded export,
    * reproducible under any partitioning, any cluster size, any
    * engine (the oracle replays it as `ORDER BY md5(...)`).
    *
    * The rank comes from the distributed prefix sum
    * ([[Cumulative.withCumulativeSum]]: range partitioning by the
    * hash key + a per-partition offset exchange), so there is no
    * single-task global window at any corpus size. `idCol` must be
    * unique and non-null (the usual determinism contract); the md5
    * key carries the id as an explicit tie-break so even a hash
    * collision stays deterministic.
    */
  def shuffleForTraining(
      df: DataFrame,
      idCol: String,
      seed: Int = 0,
      outCol: String = "order_id"): DataFrame =
    rankByHash(df,
      concat(col(idCol).cast("string"), lit(":" + seed)),
      col(idCol).cast("string"), outCol)

  /** Deterministic corpus mixing: each `(frame, weight)` source
    * contributes ~`weight × |source|` rows — `floor(weight)` full
    * epochs (0-based `repCol` index, like [[upsample]]) plus a
    * deterministic `weight − floor(weight)` fractional sample at the
    * next epoch index — tagged with its 0-based `srcCol`, unioned,
    * and globally shuffled into a contiguous `outCol` training order
    * keyed on (source, id, rep). This is the mixture-weights step of
    * training-data prep (e.g. wiki ×2.4, web ×0.6) as ONE
    * reproducible operator: per-row hash decisions + the distributed
    * prefix-sum rank — no shuffle anywhere except the final range
    * partitioning, no randomness, engine-replayable.
    *
    * All sources must share a schema (`unionByName`); the fractional
    * sample of source `i` uses seed `seed * 131 + i` so sources draw
    * independently. `idCol` must be unique and non-null within each
    * source.
    */
  /** Proportional per-group budget allocation with LARGEST-REMAINDER
    * (Hamilton) rounding — the sampling PLAN behind "give me 10M
    * docs spread across sources proportionally": floor quotas from
    * exact integer arithmetic, then the leftover units go to the
    * groups with the largest remainders (ties to the smaller group
    * key), so Σ quota == target EXACTLY — naive per-group rounding
    * drifts by up to |groups|/2 units, which a downstream
    * exact-count contract (shard sizing, epoch budgeting) cannot
    * absorb. Feed the quotas to [[capPerStratum]] to materialize the
    * sample.
    *
    * All arithmetic is exact DECIMAL(38,0) integers (target·count ≤
    * 10³⁸ — overflow-free far past any real corpus), no doubles
    * anywhere. The remainder-rank window runs on the GROUPS frame —
    * bounded by contract, and `maxGroups` turns that bound into an
    * in-plan check (the survivalCurve guard pattern).
    *
    * @return one row per group: (groupCol, n_rows, quota);
    *         Σ quota = target (when target ≥ 0; groups may receive
    *         quotas above their own n_rows — the plan is
    *         proportional, capping is the materializer's call).
    *         Raises in-plan when the input has NO non-null group
    *         keys and target > 0 — the invariant is unmeetable and
    *         an empty frame would hide that from an exact-count
    *         consumer.
    */
  def allocateBudget(
      df: DataFrame,
      groupCol: String,
      target: Long,
      maxGroups: Int = 1000000): DataFrame = {
    require(target >= 0, "target must be non-negative")
    require(maxGroups >= 1, "maxGroups must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"))
    val tot = counts.agg(sum(col("__n")).as("__tot"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRem = Window.orderBy(col("__rem").desc, col(groupCol).asc)
    val t = lit(target).cast("decimal(38,0)")
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("__prod", t * col("__n"))
      // exact integer floor + remainder: prod = base·tot + rem
      .withColumn("__rem", expr("__prod % __tot"))
      .withColumn("__base", ((col("__prod") - col("__rem")) / col("__tot"))
        .cast("decimal(38,0)"))
      .withColumn("__rk",
        when(count(lit(1)).over(all) > maxGroups,
          raise_error(lit(s"allocateBudget: more than $maxGroups groups - " +
            "coarsen the group key or raise maxGroups explicitly")).cast("int"))
          .otherwise(row_number().over(wRem)))
      .withColumn("__left", t - sum(col("__base")).over(all))
      .select(col(groupCol), col("__n").cast("long").as("n_rows"),
        (col("__base") + when(col("__rk") <= col("__left"), 1).otherwise(0))
          .cast("long").as("quota"))
    // Σ quota == target is IMPOSSIBLE when there are no groups (empty
    // input, or every group key null) and target > 0 — and an empty
    // result would silently break a downstream exact-count consumer
    // (shard sizing). The guard rides a UNION branch, not the join's
    // build side: with an empty stream side the optimizer propagates
    // emptiness straight through the join and a build-side
    // raise_error never evaluates, but a global aggregate always
    // yields its one row, so this branch always runs its filter.
    val guard = tot
      .where(col("__tot").isNull && lit(target) > 0)
      .select(
        raise_error(lit("allocateBudget: empty input (no rows with a " +
          s"non-null group key) cannot meet target = $target"))
          .cast(df.schema(groupCol).dataType).as(groupCol),
        lit(null).cast("long").as("n_rows"),
        lit(null).cast("long").as("quota"))
    quotas.unionByName(guard)
  }

  def mixCorpora(
      sources: Seq[(DataFrame, Double)],
      idCol: String,
      seed: Int = 0,
      srcCol: String = "source_idx",
      repCol: String = "rep",
      outCol: String = "order_id"): DataFrame = {
    require(sources.nonEmpty, "no sources given")
    require(sources.forall(_._2 >= 0), "weights must be non-negative")
    require(sources.map(_._2).sum > 0, "at least one weight must be positive")
    val tagged = sources.zipWithIndex.flatMap { case ((src, weight), i) =>
      val fullEpochs = math.floor(weight).toLong
      val frac = weight - fullEpochs
      val epochs =
        if (fullEpochs > 0) Some(upsample(src, lit(fullEpochs), repCol)) else None
      val fractional =
        if (frac > 0)
          Some(deterministicSample(src, idCol, frac, seed * 131 + i)
            .withColumn(repCol, lit(fullEpochs)))
        else None
      (epochs.toSeq ++ fractional.toSeq).map(_.withColumn(srcCol, lit(i)))
    }
    val unioned = tagged.reduce(_.unionByName(_))
    rankByHash(unioned,
      concat_ws(":", col(srcCol).cast("string"), col(idCol).cast("string"),
        col(repCol).cast("string"), lit(seed.toString)),
      concat_ws(":", col(srcCol).cast("string"), col(idCol).cast("string"),
        col(repCol).cast("string")),
      outCol)
  }

  /** UniMax-style "temperature" source weighting: the per-source
    * sampling RATES that make source s contribute ∝ n_s^alpha of a
    * `totalRows` budget (default: the corpus size). alpha = 1 is the
    * natural mix, alpha = 0 uniform across sources; the usual LLM
    * training setting (≈ 0.3–0.7) upsamples low-resource sources
    * without letting any source dominate. Rate_s = p_s·total/n_s
    * with p_s = n_s^alpha / Σ n_t^alpha, rounded to 6 dp (the
    * cross-engine determinism discipline) — exactly the weight
    * [[mixCorpora]] expects (>1 → full epochs + fractional tail).
    *
    * One tiny per-source aggregation + a broadcast single-row total —
    * no data collect, no window; any corpus size.
    */
  def temperatureWeights(
      df: DataFrame,
      srcCol: String,
      alpha: Double,
      totalRows: Option[Long] = None): DataFrame = {
    require(alpha >= 0, "alpha must be non-negative")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(
      sum(pow(col("n_rows"), lit(alpha))).as("__ta"),
      sum(col("n_rows")).as("__tn"))
    val budget = totalRows.map(lit(_)).getOrElse(col("__tn"))
    counts.crossJoin(broadcast(totals))
      .withColumn("rate",
        round(pow(col("n_rows"), lit(alpha)) / col("__ta")
          * budget / col("n_rows"), 6))
      .drop("__ta", "__tn")
  }

  /** [[mixCorpora]] driven by [[temperatureWeights]]: splits the
    * corpus by `srcCol`, computes the temperature rates, and mixes —
    * the one-call "α-sample my sources into a training order" step.
    * The weight frame collect is bounded by the number of DISTINCT
    * SOURCES (the usual bounded-metadata contract, like
    * [[rebalanceToDistribution]]'s strata map — tens, not rows);
    * sources are indexed in value order so `source_idx` is stable.
    * Each source is a filter of `df`, so a corpus stored partitioned
    * by source prunes instead of rescanning.
    */
  def temperatureMix(
      df: DataFrame,
      srcCol: String,
      idCol: String,
      alpha: Double,
      seed: Int = 0): DataFrame = {
    val rates = temperatureWeights(df, srcCol, alpha)
      .select(col(srcCol), col("rate")).collect()
      .map(r => (r.get(0), r.getDouble(1)))
      .sortBy(r => String.valueOf(r._1))
    val sources = rates.map { case (src, rate) =>
      (df.where(col(srcCol) <=> lit(src)), rate)
    }
    mixCorpora(sources.toSeq, idCol, seed)
  }

  /** Contiguous 0-based rank by `md5(hashInput)` (tie-broken by
    * `tieBreak`, ASCII string order — identical across engines) via
    * the distributed prefix sum. Shared by [[shuffleForTraining]] and
    * [[mixCorpora]].
    */
  /** Deterministic uniform negative sampling — the contrastive-
    * training pair generator ("for every anchor, k random non-self
    * rows") WITHOUT a cross join and WITHOUT `rand()`: rows get the
    * deterministic global hash order of [[shuffleForTraining]]
    * (distributed prefix sum — no single-partition window), each
    * anchor derives k offsets from md5(id, seed, j), and the j-th
    * negative is the row at rank `(rank + 1 + offset_j) mod N` —
    * the `+1 … mod (N−1)` construction can never draw the anchor
    * itself. One rank equi-join fetches the negatives: everything is
    * linear in N·k, reproducible across retries/partitionings, and
    * engine-replayable (the oracle replays ranks with one window and
    * the same 60-bit md5 offsets).
    *
    * @return (idCol, j, negCol) — k rows per anchor, j = 0..k−1.
    */
  def negativeSample(
      df: DataFrame,
      idCol: String,
      k: Int,
      seed: Int = 0,
      negCol: String = "neg_id"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // staged: both the probe side and the rank join read this frame —
    // without the checkpoint the whole prefix-sum chain re-executes
    // per use (8 shuffles measured vs 4 staged)
    val ranked = shuffleForTraining(df.select(col(idCol)), idCol, seed, "__rk")
      .localCheckpoint()
    val n = ranked.agg(count(lit(1)).as("__n"))
    val probes = ranked.crossJoin(broadcast(n))
      .select(col(idCol), col("__rk"), col("__n"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("__off",
        pmod(conv(substring(md5(concat(col(idCol).cast("string"),
          lit(s":$seed:"), col("j"))), 1, 15), 16, 10).cast("long"),
          // N=1 would make the divisor 0: pmod yields null and the
          // operator silently returns zero rows, breaking the
          // k-rows-per-anchor contract — fail loudly instead (the
          // count is data-dependent, so the guard lives in-plan).
          when(col("__n") < 2,
            raise_error(lit("negativeSample: needs at least 2 rows " +
              "to draw a negative per anchor")).cast("long"))
            .otherwise(col("__n") - 1)))
      .select(col(idCol), col("j"),
        pmod(col("__rk") + 1 + col("__off"), col("__n")).as("__nrk"))
    probes.join(
      ranked.select(col("__rk").as("__nrk"), col(idCol).as(negCol)),
      Seq("__nrk"))
      .select(col(idCol), col("j"), col(negCol))
  }

  private def rankByHash(
      df: DataFrame,
      hashInput: Column,
      tieBreak: Column,
      outCol: String): DataFrame = {
    val keyCol = graft.Cols.unique("__graft_key", df)
    val staged = df.withColumn(keyCol, concat(md5(hashInput), lit(":"), tieBreak))
    Cumulative.withCumulativeSum(staged, lit(1L), col(keyCol), outCol)
      .withColumn(outCol, col(outCol) - 1)
      .drop(keyCol)
  }

  /** Per-stratum deterministic sampling: strata missing from
    * `fractions` are dropped (like `sampleBy`).
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      idCol: String,
      seed: Int = 0): DataFrame = {
    require(fractions.nonEmpty, "no strata fractions given")
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, frac)) =>
      acc || (col(strataCol) === stratum && keepFlag(col(idCol), frac, seed))
    }
    df.where(keep)
  }
}
