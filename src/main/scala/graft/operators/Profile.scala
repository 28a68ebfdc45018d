package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}

/** Data profiling: per-column stats for pipeline health checks.
  *
  * One aggregation job computes every column's row/null/distinct
  * counts; the single result row is exploded into one output row per
  * column. Exact `countDistinct` triggers Spark's expand-based
  * multi-distinct rewrite — fine for a handful of columns; pass
  * `approx = true` at 100 TB (HLL sketches, one pass, no expand).
  */
object Profile {

  /** @return one row per profiled column:
    *         (column, n_rows, n_nulls, n_distinct).
    */
  def profile(
      df: DataFrame,
      cols: Seq[String] = Nil,
      approx: Boolean = false): DataFrame = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    require(target.nonEmpty, "nothing to profile")
    val aggs = count(lit(1)).as("__n") +: target.flatMap { c =>
      val dist =
        if (approx) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        dist.as(s"__dist_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(
        explode(array(target.map(c =>
          struct(
            lit(c).as("column"),
            col("__n").as("n_rows"),
            col(s"__nulls_$c").as("n_nulls"),
            col(s"__dist_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.*")
  }

  /** Per-column distribution quantiles — the length/token/size
    * distribution look every curation decision starts from (where to
    * put the Gopher word-count gates, the chunking seqLen, the
    * per-domain caps).
    *
    * One aggregation job for ALL (column × prob) pairs, exploded to
    * one row each. `approx = false` uses exact `percentile`
    * (sort-based within the aggregation — fine to a few hundred
    * million rows per executor); at 100 TB pass `approx = true`:
    * `approx_percentile` t-digests merge map-side in one pass with
    * bounded memory at `accuracy`. Both paths interpolate on the
    * p·(n−1) convention, so the exact path replays in DuckDB as
    * `quantile_cont` and the approx path is spec-bounded against the
    * exact one.
    *
    * @return one row per (column, prob): (column, prob, quantile) —
    *         quantile rounded to 4 dp.
    */
  def quantiles(
      df: DataFrame,
      cols: Seq[String],
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "nothing to profile")
    require(probs.nonEmpty, "no probabilities given")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), "probs must be in [0, 1]")
    val probArr = array(probs.map(lit): _*)
    val aggs = cols.map { c =>
      (if (approx)
        approx_percentile(col(c).cast("double"), probArr, lit(accuracy))
      else
        percentile(col(c).cast("double"), probArr)).as(s"__q_$c")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(s"__q_$c").as("__qs"))): _*)).as("p"))
      .select(col("p.column").as("column"),
        posexplode(col("p.__qs")).as(Seq("__i", "__q")))
      .select(
        col("column"),
        element_at(typedLit(probs), col("__i") + 1).as("prob"),
        round(col("__q"), 4).as("quantile"))
  }

  /** [[quantiles]] per group — the per-domain/per-source distribution
    * look (where does THIS domain's length distribution sit?) that
    * per-stratum gates and caps are tuned from. Still ONE aggregation
    * job: the percentile (or t-digest, `approx = true`) states
    * partial-aggregate map-side per group, and the output is bounded
    * by |groups| × |cols| × |probs| — never corpus-sized.
    *
    * @return one row per (group, column, prob):
    *         (`groupCol`, column, prob, quantile rounded 4 dp).
    */
  def quantilesByGroup(
      df: DataFrame,
      groupCol: String,
      cols: Seq[String],
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "nothing to profile")
    require(probs.nonEmpty, "no probabilities given")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), "probs must be in [0, 1]")
    val probArr = array(probs.map(lit): _*)
    val aggs = cols.map { c =>
      (if (approx)
        approx_percentile(col(c).cast("double"), probArr, lit(accuracy))
      else
        percentile(col(c).cast("double"), probArr)).as(s"__q_$c")
    }
    df.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(s"__q_$c").as("__qs"))): _*)).as("p"))
      .select(col(groupCol), col("p.column").as("column"),
        posexplode(col("p.__qs")).as(Seq("__i", "__q")))
      .select(
        col(groupCol),
        col("column"),
        element_at(typedLit(probs), col("__i") + 1).as("prob"),
        round(col("__q"), 4).as("quantile"))
  }

  /** Null-safe (<=>) join-back of a bounded per-group frame onto the
    * corpus: `groupBy` keeps a NULL group as a real group (its
    * threshold/moments are computed), so a plain equality join-back
    * would silently drop or null-score exactly those rows — the
    * round-13 ADVICE defect class (cramersV/tCloseness). A null
    * group is a real slice ("language unknown"); it joins back like
    * any other.
    */
  private def joinBackByGroup(
      df: DataFrame,
      bounded: DataFrame,
      groupCol: String,
      joinType: String = "inner"): DataFrame = {
    val pk = "__jb_" + groupCol
    df.join(bounded.withColumnRenamed(groupCol, pk),
        col(groupCol) <=> col(pk), joinType)
      .drop(pk)
  }

  /** Per-group quantile GATE: drop every row whose `valueCol` falls
    * below its own group's `prob`-quantile — "keep each domain's top
    * 75 % by quality score", the relative-threshold filter that
    * absolute gates can't express when distributions differ per
    * domain. The per-group thresholds are one bounded aggregation
    * (≤ |groups| rows, AQE-broadcast on the join back); the
    * threshold is rounded to 6 dp so the kept set is engine-portable
    * (raw interpolated doubles differ in the last ulp across
    * engines). Rows in a group too small for interpolation still get
    * the exact percentile semantics; ties at the threshold are kept.
    * A NULL group is a real slice — gated against its own threshold
    * (null-safe join-back). `approx = true` switches the threshold
    * fit to t-digests for the 100 TB configuration.
    */
  def dropBelowGroupQuantile(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      prob: Double,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(prob >= 0.0 && prob <= 1.0, "prob must be in [0, 1]")
    val thrCol = graft.Cols.unique("__thr", df)
    val q =
      if (approx) approx_percentile(col(valueCol).cast("double"), lit(prob), lit(accuracy))
      else percentile(col(valueCol).cast("double"), lit(prob))
    val thresholds = df.groupBy(col(groupCol)).agg(round(q, 6).as(thrCol))
    joinBackByGroup(df, thresholds, groupCol)
      .where(col(valueCol).cast("double") >= col(thrCol))
      .drop(thrCol)
  }

  /** Per-group WINSORIZATION — clip `valueCol` into its own group's
    * [pLo, pHi] quantile range ("cap each language's length outliers
    * at its 5th/95th percentile"), the outlier treatment that keeps
    * the row (unlike [[dropBelowGroupQuantile]]) while bounding the
    * leverage a tail value has on downstream means/regressions.
    * Same scale shape as the gate: thresholds are ONE bounded
    * aggregation (≤ |groups| rows, AQE-broadcast on the join back),
    * the clip itself is a row-local least/greatest, and both
    * thresholds round to 6 dp so the clipped values are
    * engine-portable. Null values clip to null; null-group rows drop
    * (inner join, the gate's convention). Output = input columns +
    * `outCol` (the clipped double). `approx = true` switches the
    * threshold fit to one-pass sketches for the 100 TB configuration.
    */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95,
      outCol: String = null,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val out = Option(outCol).getOrElse(s"${valueCol}_w")
    val lo = graft.Cols.unique("__lo", df)
    val hi = graft.Cols.unique("__hi", df)
    def q(p: Double) =
      if (approx) approx_percentile(col(valueCol).cast("double"), lit(p), lit(accuracy))
      else percentile(col(valueCol).cast("double"), lit(p))
    val thresholds = df.groupBy(col(groupCol))
      .agg(round(q(pLo), 6).as(lo), round(q(pHi), 6).as(hi))
    joinBackByGroup(df, thresholds, groupCol)
      // least/greatest SKIP nulls (a null value would clip to the lo
      // bound) — gate the clip on non-null explicitly
      .withColumn(out, when(col(valueCol).isNotNull,
        least(greatest(col(valueCol).cast("double"), col(lo)), col(hi))))
      .drop(lo, hi)
  }

  /** Multi-granularity data card via ROLLUP — the release table that
    * answers "per (lang, source) cell, per-lang subtotal, grand
    * total" in ONE aggregation pass: Spark expands the grouping sets
    * with map-side partial aggregation, so the three granularities
    * cost one scan, not three. `level` = `grouping_id()` (leftmost
    * dim = MSB, the SQL-standard bit order both engines share)
    * disambiguates a rolled-up dimension from a genuinely-NULL
    * dimension value — without it the two are indistinguishable in
    * the output.
    *
    * Determinism: the sum accumulates in exact DECIMAL, then
    * converts ONCE at the output boundary — BIGINT when the input is
    * integral (the fraction is provably .000000), DOUBLE otherwise.
    * A raw wide DECIMAL output column would hash differently across
    * readers (arrow decimal128 vs HUGEINT-backed engines) despite
    * equal values.
    *
    * @return one row per grouping-set cell: (dims…, level, n_rows,
    *         sum_<value> BIGINT (integral input) or DOUBLE,
    *         avg_<value> 4 dp).
    */
  def rollupCard(
      df: DataFrame,
      dims: Seq[String],
      valueCol: String): DataFrame = {
    require(dims.nonEmpty && dims.size <= 8,
      s"dims must be 1..8 columns, got ${dims.size}")
    val integral = df.schema(valueCol).dataType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
    val dec = col(valueCol).cast("decimal(18,6)")
    val sumOut =
      if (integral) sum(dec).cast("bigint") else sum(dec).cast("double")
    df.rollup(dims.map(col): _*)
      .agg(
        grouping_id().as("level"),
        count(lit(1)).as("n_rows"),
        sumOut.as(s"sum_$valueCol"),
        round(sum(dec).cast("double") / count(lit(1)), 4).as(s"avg_$valueCol"))
      .select((dims.map(col) :+ col("level") :+ col("n_rows") :+
        col(s"sum_$valueCol") :+ col(s"avg_$valueCol")): _*)
  }

  /** Per-group ROBUST scaling — [[standardizeByGroup]]'s
    * outlier-resistant sibling: z_r = (x − median) / (1.4826·MAD)
    * (the normal-consistency constant makes MAD estimate σ), the
    * scaling a heavy-tailed signal (doc lengths, crawl latencies)
    * needs where one 10 GB outlier would stretch a mean/sd z into
    * uselessness.
    *
    * Scale shape: two grouped aggregations (exact `percentile`
    * median — sort-based within the aggregation, fine to hundreds of
    * millions of rows per executor; `approx = true` swaps in the
    * t-digest at corpus scale) + two broadcast-ranged join-backs.
    * Median and MAD round 6 dp, z 4 dp at the boundary; MAD 0 (over
    * half the group at one value) yields null z.
    */
  def robustScaleByGroup(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      outCol: String = null,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    val out = Option(outCol).getOrElse(s"${valueCol}_rz")
    val medCol = graft.Cols.unique("__med", df)
    val madCol = graft.Cols.unique("__mad", df)
    def med(c: Column) =
      if (approx) approx_percentile(c, lit(0.5), lit(accuracy))
      else percentile(c, lit(0.5))
    val nn = df.where(col(valueCol).isNotNull)
    val medians = nn.groupBy(col(groupCol))
      .agg(round(med(col(valueCol).cast("double")), 6).as(medCol))
    val mads = joinBackByGroup(nn, medians, groupCol)
      .groupBy(col(groupCol))
      .agg(round(med(abs(col(valueCol).cast("double") - col(medCol))), 6)
        .as(madCol))
    joinBackByGroup(joinBackByGroup(df, medians, groupCol, "left"),
        mads, groupCol, "left")
      .withColumn(out,
        when(col(valueCol).isNotNull && col(madCol) > 0,
          round((col(valueCol) - col(medCol)) /
            (lit(1.4826) * col(madCol)), 4)))
      .drop(medCol, madCol)
  }

  /** Per-group Z-SCORE standardization — the parametric sibling of
    * [[percentileRank]] ("this doc is 1.8 group-standard-deviations
    * above its language's mean length"): z = (x − mean) / sd with
    * per-group moments, making raw signals comparable across groups
    * while PRESERVING distance information rank normalization throws
    * away.
    *
    * Scale shape: one map-side-combined grouped aggregation for the
    * moments (never a window sort over the corpus), broadcast-ranged
    * join back (AQE sizes it). Determinism: exact DECIMAL(18,6) value
    * and DECIMAL(38,12) square sums, mean/sd rounded 6 dp, z rounded
    * 4 dp at the boundary — the [[graft.operators.Events.anomalies]]
    * moment discipline. A zero-spread or singleton group yields null
    * z (no information, not zero); null values pass through with
    * null z.
    */
  def standardizeByGroup(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      outCol: String = null): DataFrame = {
    val out = Option(outCol).getOrElse(s"${valueCol}_z")
    val mCol = graft.Cols.unique("__mean", df)
    val sCol = graft.Cols.unique("__sd", df)
    val dec = col(valueCol).cast("decimal(18,6)")
    val moments = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("__cnt"),
        sum(dec).as("__sv"),
        sum(dec * dec).as("__sq"))
      .withColumn(mCol, round(col("__sv").cast("double") / col("__cnt"), 6))
      .withColumn(sCol, round(sqrt(greatest(lit(0.0),
        col("__sq").cast("double") / col("__cnt") - col(mCol) * col(mCol))), 6))
      .select(col(groupCol), col(mCol), col(sCol))
    joinBackByGroup(df, moments, groupCol, "left")
      .withColumn(out,
        when(col(valueCol).isNotNull && col(sCol) > 0,
          round((col(valueCol) - col(mCol)) / col(sCol), 4)))
      .drop(mCol, sCol)
  }

  /** Per-group PERCENTILE-RANK normalization — replace a raw score
    * with its within-group rank position ("this doc is at the 93rd
    * percentile of its language's quality distribution"), the
    * calibration step that makes scores COMPARABLE across groups
    * whose raw distributions differ before any global gate applies.
    * `percent_rank` = (rank−1)/(n−1): tie rows share a rank (no
    * unique tiebreak needed — deterministic by value equality), a
    * group's minimum is 0 and maximum is 1, a singleton group is 0.
    * One window per group partitioning (parallel across groups, the
    * only shuffle); null scores drop (the gate convention — a null
    * has no rank). Rounded 6 dp for engine portability.
    */
  def percentileRank(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      outCol: String = null): DataFrame = {
    val out = Option(outCol).getOrElse(s"${valueCol}_pct")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol))
    df.where(col(valueCol).isNotNull)
      .withColumn(out, round(percent_rank().over(w), 6))
  }

  /** Per-group quantile BUCKETING — tag every row with which slice of
    * its own group's distribution it falls in ("head/middle/tail" per
    * language, the CCNet perplexity-bucket device of Wenzek et al.
    * 2020): `probs` ascending cut points → `labels` (one more label
    * than probs), row r gets the first label whose group-threshold is
    * ≥ its value. Same scale shape as [[dropBelowGroupQuantile]]: the
    * thresholds are ONE bounded aggregation (|groups| × |probs| —
    * AQE-broadcast on the join back), the tag itself is a row-local
    * CASE chain, and each threshold is rounded to 6 dp so the bucket
    * assignment is engine-portable. Null values tag null; rows with a
    * null group drop (inner join, as in the gate). `approx = true`
    * switches the threshold fit to one-pass sketches for 100 TB.
    */
  def bucketByGroupQuantiles(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      probs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      outCol: String = "bucket",
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted, "probs must be ascending")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), "probs must be in [0, 1]")
    require(labels.length == probs.length + 1,
      s"need ${probs.length + 1} labels for ${probs.length} cut points")
    val v = col(valueCol).cast("double")
    val thrCols = probs.indices.map(i => graft.Cols.unique(s"__thr$i", df))
    val aggs = probs.zip(thrCols).map { case (p, tc) =>
      val q =
        if (approx) approx_percentile(v, lit(p), lit(accuracy))
        else percentile(v, lit(p))
      round(q, 6).as(tc)
    }
    val thresholds = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val bucket = probs.indices.foldLeft(
      when(v.isNull, lit(null).cast("string"))) { (acc, i) =>
      acc.when(v <= col(thrCols(i)), lit(labels(i)))
    }.otherwise(lit(labels.last))
    joinBackByGroup(df, thresholds, groupCol)
      .withColumn(outCol, bucket)
      .drop(thrCols: _*)
  }

  /** Length-bucket padding audit — the numbers behind a bucketed-
    * batching decision (inference/training batches pad every row to
    * the batch max; bucketing by length is what keeps that waste
    * down): rows are assigned to the first ascending `boundaries`
    * cut ≥ their length (one overflow bucket above the last cut),
    * and each bucket reports rows, summed length, observed max, its
    * padding target `cap` (the boundary; the overflow bucket pads to
    * its own max) and `waste_ratio` = 1 − sum/(rows·cap) — the
    * fraction of padded positions that are padding. ONE map-side-
    * combined aggregation over one scan, output = |boundaries|+1
    * rows; null lengths drop. Pair with [[histogram]] to pick the
    * boundaries, then this to cost them.
    */
  def paddingStats(
      df: DataFrame,
      lenCol: String,
      boundaries: Seq[Int]): DataFrame = {
    require(boundaries.nonEmpty, "no boundaries given")
    require(boundaries == boundaries.sorted && boundaries.distinct == boundaries,
      "boundaries must be strictly ascending")
    require(boundaries.head > 0, "boundaries must be positive")
    val len = col(lenCol).cast("long")
    val idx = boundaries.zipWithIndex.foldLeft(
      when(len.isNull, lit(null).cast("int"))) { case (acc, (b, i)) =>
      acc.when(len <= b, lit(i))
    }.otherwise(lit(boundaries.length))
    val capArr = typedLit(boundaries.map(_.toLong))
    df.select(idx.as("bucket"), len.as("__l"))
      .where(col("bucket").isNotNull)
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__l")).as("sum_len"),
        max(col("__l")).as("max_len"))
      .select(
        col("bucket"),
        // in-range buckets pad to their boundary; overflow to its max
        when(col("bucket") < boundaries.length,
          element_at(capArr, col("bucket") + 1))
          .otherwise(col("max_len")).as("cap"),
        col("n_rows"), col("sum_len"), col("max_len"))
      .withColumn("waste_ratio",
        round(lit(1.0) - col("sum_len").cast("double") /
          (col("n_rows") * col("cap")), 6))
  }

  /** Key-skew diagnostic — the numbers a salting / AQE-skew-join
    * decision is made from: how many rows, how many distinct keys,
    * how big is the biggest key, how far above average is it
    * (`skew_factor`), and what share of all rows the `topK` hottest
    * keys hold (`top_share`). One map-side-combined count per key,
    * staged once (`localCheckpoint` — the overall stats and the
    * bounded top-k read the SAME materialized counts, not two scans
    * of the corpus); the top-k side is `TakeOrderedAndProject`, so
    * nothing key-count-sized ever sorts globally or reaches the
    * driver.
    *
    * @return one row: (total_rows, distinct_keys, max_count,
    *         avg_count 4 dp, skew_factor = max/avg 4 dp,
    *         top_share = topK rows / total 6 dp).
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be positive")
    // null keys drop: this report sizes the SHUFFLE a join/groupBy
    // on the key would pay, and equi-joins drop null keys anyway —
    // counting them would overstate total_rows and distinct_keys
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val overall = counts.agg(
      sum(col("__n")).as("total_rows"),
      count(lit(1)).as("distinct_keys"),
      max(col("__n")).as("max_count"))
    val top = counts.orderBy(col("__n").desc, col(keyCol).asc).limit(topK)
      .agg(coalesce(sum(col("__n")), lit(0L)).as("__top_n"))
    val avg = col("total_rows").cast("double") / col("distinct_keys")
    overall.crossJoin(broadcast(top))
      .select(
        col("total_rows"), col("distinct_keys"), col("max_count"),
        round(avg, 4).as("avg_count"),
        round(col("max_count") / avg, 4).as("skew_factor"),
        round(col("__top_n") / col("total_rows").cast("double"), 6).as("top_share"))
  }

  /** One-scan curation funnel: every quality gate's independent pass
    * count AND the cumulative survivor count (gate 1 ∧ … ∧ gate i) in
    * a SINGLE aggregation over a SINGLE scan — at 100 TB the naïve
    * "filter, count, filter, count" loop pays one full pass per gate;
    * this pays one total. All counts are map-side partial sums; the
    * result is |stages| rows, never corpus-sized.
    *
    * @param stages ordered (name, predicate) gates.
    * @return one row per stage, in order: (stage_idx, stage,
    *         pass_count — rows passing THIS gate alone,
    *         cum_count — rows passing every gate up to and including
    *         this one, cum_share of total rows, 6 dp).
    */
  def stageFunnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty && stages.size <= 1000,
      s"stages must be 1..1000 literal gates (the report frame is 2x|stages| agg columns), got ${stages.size}")
    val cums = stages.scanLeft(lit(true))((acc, s) => acc && s._2).tail
    val aggs = count(lit(1)).as("__total") +:
      stages.zipWithIndex.flatMap { case ((_, cond), i) =>
        Seq(
          coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(s"__pass_$i"),
          coalesce(sum(when(cums(i), 1L).otherwise(0L)), lit(0L)).as(s"__cum_$i"))
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(stages.zipWithIndex.map { case ((name, _), i) =>
        struct(
          lit(i).as("stage_idx"),
          lit(name).as("stage"),
          col(s"__pass_$i").as("pass_count"),
          col(s"__cum_$i").as("cum_count"),
          round(when(col("__total") > 0,
            col(s"__cum_$i") / col("__total").cast("double")), 6)
            .as("cum_share"))
      }: _*)).as("f"))
      .select("f.*")
  }

  /** Per-group [[stageFunnel]]: the same ordered gate funnel computed
    * for every group in ONE scan (pass/cumulative counts + share per
    * (group, stage)) — the per-source crawl-health view ("which
    * domain loses its documents at which gate"). Output rows =
    * groups × stages, grouped aggregation with map-side combine; any
    * corpus size. Null groups aggregate under a null group row (SQL
    * GROUP BY semantics).
    */
  def stageFunnelByGroup(
      df: DataFrame,
      groupCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty && stages.size <= 1000,
      s"stages must be 1..1000 literal gates (the report frame is 2x|stages| agg columns), got ${stages.size}")
    val cums = stages.scanLeft(lit(true))((acc, s) => acc && s._2).tail
    val aggs = count(lit(1)).as("__total") +:
      stages.zipWithIndex.flatMap { case ((_, cond), i) =>
        Seq(
          coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(s"__pass_$i"),
          coalesce(sum(when(cums(i), 1L).otherwise(0L)), lit(0L)).as(s"__cum_$i"))
      }
    df.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol),
        explode(array(stages.zipWithIndex.map { case ((name, _), i) =>
          struct(
            lit(i).as("stage_idx"),
            lit(name).as("stage"),
            col(s"__pass_$i").as("pass_count"),
            col(s"__cum_$i").as("cum_count"),
            round(when(col("__total") > 0,
              col(s"__cum_$i") / col("__total").cast("double")), 6)
              .as("cum_share"))
        }: _*)).as("f"))
      .select(col(groupCol), col("f.*"))
  }

  /** One-scan THRESHOLD SWEEP over a numeric signal — the tuning
    * view for picking a quality-gate cutoff ([[stageFunnel]] answers
    * "how many survive THESE gates"; this answers "how would the
    * pass rate move as the threshold slides"): for each candidate
    * threshold, the count and share of rows with value ≥ t, all from
    * ONE aggregation (thresholds are a handful of literals — the agg
    * row is bounded, nothing re-scans per candidate). Output rows =
    * |thresholds|.
    */
  def gateSweep(
      df: DataFrame,
      valueCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 1000,
      s"thresholds must be 1..1000 literals (one agg column each), got ${thresholds.size}")
    val v = col(valueCol).cast("double")
    val aggs = count(lit(1)).as("__total") +:
      thresholds.zipWithIndex.map { case (t, i) =>
        coalesce(sum(when(v >= t, 1L).otherwise(0L)), lit(0L)).as(s"__p_$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(thresholds.zipWithIndex.map { case (t, i) =>
        struct(
          lit(t).as("threshold"),
          col(s"__p_$i").as("pass_count"),
          round(when(col("__total") > 0,
            col(s"__p_$i") / col("__total").cast("double")), 6)
            .as("pass_share"))
      }: _*)).as("f"))
      .select("f.*")
  }

  /** Heavy hitters: the `k` most frequent values of a column (top
    * domains, top hosts, vocabulary head, …). One counted aggregation
    * (map-side combine) + `TakeOrderedAndProject` — each task keeps k
    * rows, no global sort, any corpus size. Ties break to the
    * smallest value so the result is deterministic and replayable.
    */
  def topValues(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.groupBy(col(valueCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(valueCol).asc)
      .limit(k)
  }

  /** [[topValues]] per group — "each language's top words", "each
    * source's top domains". The per-group rank compiles to
    * `WindowGroupLimit`, so every task pre-prunes to k rows per group
    * BEFORE the shuffle (the same skew guard as `capPerStratum`):
    * a group with a billion distinct values never lands whole on one
    * executor.
    */
  def topValuesByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val rnCol = graft.Cols.unique("__rn", df)
    val counts = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("n").desc, col(valueCol).asc)
    counts.withColumn(rnCol, row_number().over(w))
      .where(col(rnCol) <= k)
      .withColumnRenamed(rnCol, "rank")
  }

  /** Equi-width histogram of a numeric column — the mass-per-range
    * distribution view [[quantiles]] doesn't give (that is
    * range-per-mass): `bins` buckets over the observed [min, max],
    * the max closing into the last bin. Two aggregations, the 1-row
    * bounds frame broadcast back (no collect, no window); nulls
    * dropped; a constant column lands whole in bin 0; empty input →
    * empty output. The bin expression is plain left-associative
    * double arithmetic, identical in the oracle — same IEEE ops in
    * the same order, so edge values bucket identically. Output:
    * (bin, lo, hi — 4 dp, n_rows).
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int = 20): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val v = col(valueCol).cast("double")
    val mnCol = graft.Cols.unique("__mn", df)
    val mxCol = graft.Cols.unique("__mx", df)
    val bounds = df.where(v.isNotNull).agg(min(v).as(mnCol), max(v).as(mxCol))
    val mn = col(mnCol)
    val mx = col(mxCol)
    binCounts(df.where(v.isNotNull).crossJoin(broadcast(bounds)),
      v, mn, mx, bins, Nil)
  }

  /** EQUI-DEPTH histogram — [[histogram]]'s equal-MASS sibling: bin
    * edges are the i/bins quantiles, so every bucket holds ~the same
    * row count and the skewed tail gets resolution where equi-width
    * wastes 19 empty buckets on one outlier's range. The view that
    * makes per-bucket caps/budgets meaningful on heavy-tailed
    * signals.
    *
    * One quantile aggregation (exact `percentile`; `approx = true`
    * swaps in the t-digest at corpus scale) produces the bins−1
    * edges as a 1-row broadcast frame; bin assignment is `x > edge`
    * counts over that bounded array (edge values themselves round 6
    * dp, so both engines compare identically); one grouped count.
    * Ties AT an edge land in the lower bucket (strict >), so
    * duplicate-heavy data may still skew counts — that is the data,
    * not the binning.
    *
    * @return one row per non-empty bucket: (bin 0-based, lo, hi —
    *         6 dp edges, −/+infinity at the ends as nulls, n_rows).
    */
  def equiDepthHistogram(
      df: DataFrame,
      valueCol: String,
      bins: Int = 10,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val v = col(valueCol).cast("double")
    val edgesCol = graft.Cols.unique("__edges", df)
    val probs = (1 until bins).map(_.toDouble / bins)
    val probArr = array(probs.map(lit): _*)
    val q =
      if (approx) approx_percentile(v, probArr, lit(accuracy))
      else percentile(v, probArr)
    val edges = df.where(v.isNotNull)
      .agg(transform(q, e => round(e, 6)).as(edgesCol))
    df.where(v.isNotNull)
      .crossJoin(broadcast(edges))
      .select(v.as("__v"), col(edgesCol))
      .withColumn("bin",
        size(filter(col(edgesCol), e => col("__v") > e)))
      .groupBy(col("bin"), col(edgesCol))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("bin"),
        when(col("bin") > 0, element_at(col(edgesCol), col("bin"))).as("lo"),
        when(col("bin") < bins - 1,
          element_at(col(edgesCol), col("bin") + 1)).as("hi"),
        col("n_rows"))
  }

  /** Per-group [[histogram]]: each group gets `bins` buckets over ITS
    * observed [min, max] (the per-domain length-distribution view).
    * The bounds frame is one row per group — broadcast-joined back on
    * the group key (AQE; bounded by group cardinality like
    * [[quantilesByGroup]]), everything else identical to the global
    * histogram.
    */
  def histogramByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bins: Int = 20): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val v = col(valueCol).cast("double")
    val mnCol = graft.Cols.unique("__mn", df)
    val mxCol = graft.Cols.unique("__mx", df)
    val bounds = df.where(v.isNotNull)
      .groupBy(col(groupCol)).agg(min(v).as(mnCol), max(v).as(mxCol))
    binCounts(
      df.where(v.isNotNull).join(broadcast(bounds), groupCol),
      v, col(mnCol), col(mxCol), bins, Seq(col(groupCol)))
  }

  /** Shared bin/count/edge arithmetic of the two histograms: plain
    * left-associative double expressions, replicated verbatim in the
    * oracle so both engines bucket edge values identically.
    */
  private def binCounts(
      staged: DataFrame,
      v: Column,
      mn: Column,
      mx: Column,
      bins: Int,
      keys: Seq[Column]): DataFrame =
    staged
      .withColumn("bin",
        when(mx === mn, lit(0))
          .otherwise(least(lit(bins - 1), floor((v - mn) / (mx - mn) * bins)))
          .cast("int"))
      .groupBy(keys :+ col("bin") :+ mn :+ mx: _*)
      .agg(count(lit(1)).as("n_rows"))
      .select(keys ++ Seq(
        col("bin"),
        round(mn + col("bin") * (mx - mn) / bins, 4).as("lo"),
        round(mn + (col("bin") + 1) * (mx - mn) / bins, 4).as("hi"),
        col("n_rows")): _*)

  /** Pairwise Pearson correlation over numeric columns — the
    * feature-redundancy view a signal-selection decision (and a
    * quality-score design) is made from. ONE map-side-combined
    * aggregation computes every sum/square/cross-product moment
    * (k + k + k·(k+1)/2 accumulators over one scan, never a pass per
    * pair); the accumulators are exact DECIMAL(18,`scale`) sums —
    * order-independent, so the result is partition-deterministic —
    * and the Pearson formula runs once per pair on the single
    * bounded agg row (an `inline` over the pair structs, no second
    * scan, no checkpoint).
    *
    * Rows with a null in ANY of `cols` are dropped first (listwise
    * completion — one shared n keeps the moment matrix consistent).
    *
    * @param scale decimal accumulator scale; inputs must fit
    *              DECIMAL(18,scale) (defaults cover currency-style
    *              measures).
    * @return one row per unordered pair, in `cols` order:
    *         (col_x, col_y, n_rows, pearson 6 dp — null when either
    *         variance is zero).
    */
  def corrMatrix(
      df: DataFrame,
      cols: Seq[String],
      scale: Int = 4): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct == cols, "columns must be distinct")
    val proj = df
      .select(cols.map(c => col(c).cast(s"decimal(18,$scale)").as(c)): _*)
      .na.drop()
    val moments = count(lit(1)).as("__n") +:
      (cols.map(c => sum(col(c)).as(s"__s_$c")) ++
        (for {
          (ci, i) <- cols.zipWithIndex
          (cj, j) <- cols.zipWithIndex if j >= i
        } yield sum(col(ci) * col(cj)).as(s"__p_${i}_$j")))
    val n = col("__n").cast("double")
    def s(c: String) = col(s"__s_$c").cast("double")
    def p(i: Int, j: Int) = col(s"__p_${i}_$j").cast("double")
    val pairs = for {
      (ci, i) <- cols.zipWithIndex
      (cj, j) <- cols.zipWithIndex if j > i
    } yield {
      // (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²)·(n·Syy − Sy²)) — written
      // left-associatively and replicated verbatim in the oracle so
      // the one double rounding per term agrees across engines
      val den = sqrt((n * p(i, i) - s(ci) * s(ci)) *
        (n * p(j, j) - s(cj) * s(cj)))
      struct(
        lit(ci).as("col_x"),
        lit(cj).as("col_y"),
        col("__n").as("n_rows"),
        round(when(den > 0,
          (n * p(i, j) - s(ci) * s(cj)) / den), 6).as("pearson"))
    }
    proj.agg(moments.head, moments.tail: _*)
      .select(explode(array(pairs: _*)).as("c"))
      .select("c.*")
  }

  /** Spearman rank correlation of two numeric columns — the
    * monotone-association twin of [[corrMatrix]] for heavy-tailed
    * signals (doc length vs quality score, where one 10 GB outlier
    * drags Pearson to ~1 or ~0 but cannot move ranks).
    *
    * Scale-safe ranking: NEVER a per-row rank window. Each column's
    * average ranks (the standard tie convention) come from a grouped
    * value count + the [[Cumulative.withCumulativeSum]] distributed
    * prefix sum: for value v with count c and inclusive cumulative
    * count cum, 2·rank(v) = 2·cum − c + 1 — an exact integer, so all
    * moments accumulate in DECIMAL(38,0) (the 2× scale cancels in the
    * correlation). Ranks join back by value (two value-keyed
    * equi-joins). ρ = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy −
    * Sy²)) with each factor converted to double BEFORE the √ (fixed
    * order, replicated in the oracle).
    *
    * Rows with a null in either column drop first (ranking is over
    * the paired sample). Exact for n up to ~1e9 (the n·Sxx moment
    * reaches 4n⁴ ≤ 10³⁸).
    *
    * @return one row: (n_rows, spearman 6 dp — null when either
    *         column is constant).
    */
  def spearmanCorr(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // staged: three consumers (x-ranks, y-ranks, the pair probe) must
    // not re-run the input scan/filter three times
    val d = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
      .localCheckpoint()
    def ranks2x(c: String, out: String): DataFrame = {
      val g = d.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
      Cumulative.withCumulativeSum(g, col("__c"), col("__v"), "__cum")
        .select(col("__v"),
          (lit(2) * col("__cum") - col("__c") + lit(1))
            .cast("decimal(38,0)").as(out))
    }
    val rx = ranks2x("__x", "__rx")
    val ry = ranks2x("__y", "__ry")
    val paired = d
      .join(rx, d("__x") === rx("__v")).drop("__v")
      .join(ry, col("__y") === ry("__v")).drop("__v")
    val agg = paired.agg(
      count(lit(1)).cast("decimal(38,0)").as("__n"),
      coalesce(sum(col("__rx")), lit(0)).cast("decimal(38,0)").as("__sx"),
      coalesce(sum(col("__ry")), lit(0)).cast("decimal(38,0)").as("__sy"),
      coalesce(sum(col("__rx") * col("__rx")), lit(0)).cast("decimal(38,0)").as("__sxx"),
      coalesce(sum(col("__ry") * col("__ry")), lit(0)).cast("decimal(38,0)").as("__syy"),
      coalesce(sum(col("__rx") * col("__ry")), lit(0)).cast("decimal(38,0)").as("__sxy"))
    val a = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val b = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    agg.select(
      col("__n").cast("long").as("n_rows"),
      round(when(a > 0 && b > 0,
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
          (sqrt(a) * sqrt(b))), 6).as("spearman"))
  }

  /** Contingency table with χ²-of-independence contributions — the
    * confound check a corpus-mixing decision needs ("is source
    * independent of language, or does dropping a source silently
    * skew the language mix"). ONE corpus aggregation produces the
    * cell counts; marginals and the total derive from the STAGED
    * cell frame (bounded by |A|·|B| — categorical contract), so the
    * corpus is scanned once. `expected = rowTotal·colTotal/n` and
    * `contrib = (obs − expected)²/expected` are written
    * left-associatively and replicated verbatim in the oracle;
    * χ² = Σ contrib, dof = (|A|−1)(|B|−1) — both derivable from the
    * output, pinned in the spec.
    *
    * @return one row per observed cell: (colA, colB, n_obs,
    *         expected 6 dp, contrib 6 dp).
    */
  /** Cramér's V — the one-number EFFECT SIZE on top of [[crossTab]]'s
    * χ² cells: χ² alone grows with n (at corpus scale everything is
    * "significant"); V = √(χ²/(n·(min(r,c)−1))) ∈ [0,1] says whether
    * the source×language confound is cosmetic (≈ 0.1) or structural
    * (≳ 0.5) independent of corpus size — the number the mixing
    * decision actually needs.
    *
    * Same one-scan cell machinery as crossTab (staged cell frame,
    * DECIMAL-widened marginal products) — but unlike the per-OBSERVED-
    * cell report, χ² here runs over the FULL r×c marginal grid
    * (bounded by the categorical contract): a zero-observed cell
    * still contributes (0 − e)²/e, and omitting those would bias V
    * toward independence exactly when the association is strongest.
    * Per-cell contributions round 8 dp into exact DECIMAL(28,8) so χ²
    * is order-independent, then V derives with fixed-order double
    * arithmetic. Null V when min(r,c) = 1 (a 1×k table has no
    * association to measure). Null categories are excluded by
    * contract (the [[distributionDrift]] rule, and for the same
    * reason: the full-grid left join matches on equality, so a null
    * cell would count in the marginals but never match its observed
    * count — silently inflating χ²; a null category is missing data,
    * not a level of the variable).
    *
    * @return one row: (n_rows, n_a, n_b, dof, chi2 6 dp,
    *         cramers_v 6 dp).
    */
  def cramersV(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .where(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA), col(colB))
      .agg(count(lit(1)).as("n_obs"))
      .localCheckpoint()
    val ra = cells.groupBy(col(colA)).agg(sum(col("n_obs")).as("__ra"))
    val cb = cells.groupBy(col(colB)).agg(sum(col("n_obs")).as("__cb"))
    val nn = cells.agg(sum(col("n_obs")).cast("double").as("__nd"))
    val e = col("__ra").cast("decimal(19,0)") *
      col("__cb").cast("decimal(19,0)") / col("__nd")
    val o = coalesce(col("n_obs"), lit(0L))
    val chi = ra.crossJoin(cb) // the FULL bounded grid, zero cells included
      .join(cells, Seq(colA, colB), "left")
      .crossJoin(broadcast(nn))
      .agg(coalesce(sum(
        round((o - e) * (o - e) / e, 8)
          .cast("decimal(28,8)")), lit(0)).cast("decimal(28,8)").as("__chi"))
    val shape = cells.agg(
      coalesce(sum(col("n_obs")), lit(0L)).as("__n"),
      countDistinct(col(colA)).as("__r"),
      countDistinct(col(colB)).as("__c"))
    val minDim = least(col("__r"), col("__c"))
    shape.crossJoin(broadcast(chi))
      .select(
        col("__n").as("n_rows"),
        col("__r").as("n_a"),
        col("__c").as("n_b"),
        ((col("__r") - 1) * (col("__c") - 1)).as("dof"),
        round(col("__chi").cast("double"), 6).as("chi2"),
        round(when(col("__n") > 0 && minDim > 1,
          sqrt(col("__chi").cast("double") /
            (col("__n").cast("double") * (minDim - lit(1)).cast("double")))), 6)
          .as("cramers_v"))
  }

  /** Mutual information between two categorical columns — the
    * INFORMATION-theoretic reading next to [[cramersV]]'s effect
    * size: MI = Σ p(a,b)·ln(p(a,b)/(p(a)·p(b))) says how many nats
    * knowing the source tells you about the language; the normalized
    * form NMI = MI/√(H(A)·H(B)) ∈ [0,1] compares across column
    * pairs with different cardinalities (the feature-selection /
    * redundant-column scan).
    *
    * Same one-scan cell machinery as [[crossTab]]/[[cramersV]]
    * (staged bounded cell frame, marginals derived from it) — only
    * OBSERVED cells contribute (0·ln 0 = 0, so the zero cells of the
    * full grid add nothing — unlike χ²). Null categories excluded by
    * the shared contract. Determinism: per-cell/per-marginal ln
    * terms round 8 dp into exact DECIMAL(28,8) (order-independent;
    * the [[distributionDrift]] ln-boundary discipline), one
    * fixed-order double derivation at the boundary.
    *
    * @return one row: (n_rows, n_a, n_b, mi 6 dp, h_a 6 dp, h_b
    *         6 dp, nmi 6 dp — null when either entropy is 0).
    */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .where(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA), col(colB))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val ra = cells.groupBy(col(colA)).agg(sum(col("__c")).as("__ra"))
    val cb = cells.groupBy(col(colB)).agg(sum(col("__c")).as("__cb"))
    val nn = cells.agg(sum(col("__c")).cast("double").as("__n"),
      countDistinct(col(colA)).as("__na"),
      countDistinct(col(colB)).as("__nb"))
    def entropy(m: DataFrame, cnt: String) = m
      .crossJoin(broadcast(nn.select(col("__n"))))
      .agg(coalesce(sum(
        round(-(col(cnt) / col("__n")) * log(col(cnt) / col("__n")), 8)
          .cast("decimal(28,8)")), lit(0)).cast("decimal(28,8)"))
    val ha = entropy(ra, "__ra")
    val hb = entropy(cb, "__cb")
    val mi = cells
      .join(broadcast(ra), Seq(colA))
      .join(broadcast(cb), Seq(colB))
      .crossJoin(broadcast(nn.select(col("__n"))))
      .agg(coalesce(sum(
        round((col("__c") / col("__n")) *
          log(col("__c") * col("__n") /
            (col("__ra").cast("double") * col("__cb"))), 8)
          .cast("decimal(28,8)")), lit(0)).cast("decimal(28,8)"))
    nn.select(
      col("__n").cast("long").as("n_rows"),
      col("__na").as("n_a"), col("__nb").as("n_b"))
      .crossJoin(broadcast(mi.toDF("__mi")))
      .crossJoin(broadcast(ha.toDF("__ha")))
      .crossJoin(broadcast(hb.toDF("__hb")))
      .select(col("n_rows"), col("n_a"), col("n_b"),
        round(col("__mi").cast("double"), 6).as("mi"),
        round(col("__ha").cast("double"), 6).as("h_a"),
        round(col("__hb").cast("double"), 6).as("h_b"),
        round(when(col("__ha") > 0 && col("__hb") > 0,
          col("__mi").cast("double") /
            sqrt(col("__ha").cast("double") * col("__hb").cast("double"))), 6)
          .as("nmi"))
  }

  // Null categories excluded by the same contract as cramersV /
  // distributionDrift: the marginal joins match on equality, so a
  // null-category cell would inflate n and the marginals while its
  // own row silently vanishes from the per-cell report.
  def crossTab(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .where(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA), col(colB))
      .agg(count(lit(1)).as("n_obs"))
      .localCheckpoint()
    val ra = cells.groupBy(col(colA)).agg(sum(col("n_obs")).as("__ra"))
    val cb = cells.groupBy(col(colB)).agg(sum(col("n_obs")).as("__cb"))
    val nn = cells.agg(sum(col("n_obs")).cast("double").as("__n"))
    // the marginal product widens to DECIMAL(38,0) BEFORE multiplying
    // — long·long silently wraps (non-ANSI) once marginals pass ~3e9,
    // i.e. exactly the 100 TB regime; DuckDB's oracle widens the same
    // product to HUGEINT, so decimal keeps the two engines' expected/
    // contrib identical (the /n division then lands in double)
    val e = col("__ra").cast("decimal(19,0)") *
      col("__cb").cast("decimal(19,0)") / col("__n")
    cells
      .join(broadcast(ra), Seq(colA))
      .join(broadcast(cb), Seq(colB))
      .crossJoin(broadcast(nn))
      .select(col(colA), col(colB), col("n_obs"),
        round(e, 6).as("expected"),
        round((col("n_obs") - e) * (col("n_obs") - e) / e, 6).as("contrib"))
  }

  /** Distribution drift between two corpus slices: per-category
    * shares of `keyCol` in A and B, per-key KL contributions (both
    * directions) and Jensen-Shannon contributions — the corpus-mix
    * monitoring view ("what did this filter / new crawl / rebalance
    * do to the language mix"). Sum a column over the output for the
    * scalar divergence.
    *
    * Shares are Laplace-smoothed — p = (n + 1) / (N + K) with K the
    * union key count — so a key absent on one side stays finite
    * instead of sending KL to infinity. Cost shape: ONE aggregation
    * per input (two scans, two exchanges of (key, count) rows), a
    * bounded ≤ |keys| cell frame staged once, totals derived from it
    * (no second corpus scan), everything after row-local. Null keys
    * are excluded by contract (cross-engine null-join semantics
    * differ). Determinism: counts are exact longs; each share, each
    * log-ratio, and each product rounds to 6 dp (the
    * `weightedSample` ln-boundary discipline — cross-engine libm
    * drift dies at the rounding).
    *
    * @return per key: (key, n_a, n_b, p_a, p_b, kl_ab — p_a·ln(p_a/
    *         p_b), kl_ba, js — ½p_a·ln(p_a/m) + ½p_b·ln(p_b/m),
    *         m = (p_a+p_b)/2).
    */
  def distributionDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      keyCol: String): DataFrame = {
    val ca = dfA.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_a"))
    val cb = dfB.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_b"))
    val cells = ca.join(cb, Seq(keyCol), "full_outer")
      .select(col(keyCol), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .localCheckpoint()
    val tot = cells.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"),
      count(lit(1)).as("__k"))
    val pA = round((col("n_a") + 1).cast("double") / (col("__ta") + col("__k")), 6)
    val pB = round((col("n_b") + 1).cast("double") / (col("__tb") + col("__k")), 6)
    cells.crossJoin(broadcast(tot))
      .withColumn("p_a", pA)
      .withColumn("p_b", pB)
      .withColumn("__m", (col("p_a") + col("p_b")) / 2)
      .withColumn("__lab", round(log(col("p_a") / col("p_b")), 6))
      .withColumn("__lba", round(log(col("p_b") / col("p_a")), 6))
      .withColumn("__lam", round(log(col("p_a") / col("__m")), 6))
      .withColumn("__lbm", round(log(col("p_b") / col("__m")), 6))
      .select(col(keyCol), col("n_a"), col("n_b"), col("p_a"), col("p_b"),
        round(col("p_a") * col("__lab"), 6).as("kl_ab"),
        round(col("p_b") * col("__lba"), 6).as("kl_ba"),
        round(lit(0.5) * col("p_a") * col("__lam")
          + lit(0.5) * col("p_b") * col("__lbm"), 6).as("js"))
  }

  /** Robust per-group outlier profile: median + MAD (median absolute
    * deviation) per group, and how many rows sit more than
    * `k` MADs from their group's median — the outlier view that
    * mean/stddev gates get wrong on the heavy-tailed distributions
    * corpora actually have (one mega-doc drags a stddev gate wide
    * open; it moves a median by one rank).
    *
    * Cost shape: exact medians are rank statistics, so this is two
    * grouped `percentile` passes (value, then deviation) plus one
    * flag pass — three scans, inherent to exact MAD; `approx = true`
    * switches both levels to t-digest sketches (one pass each, no
    * sort) for the 100 TB configuration. Both per-group statistics
    * are bounded frames (≤ |groups| rows) broadcast back; the flag
    * count is one map-side-combined aggregation. Medians/MADs are
    * rounded to 6 dp before the comparison so the flagged set is
    * engine-portable.
    *
    * @return per group: (group, n_rows — non-null values, median,
    *         mad, n_outliers — |v − median| > k·mad, outlier_share
    *         6 dp).
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 3.0,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(k > 0, "k must be positive")
    val v = col(valueCol).cast("double")
    def med(c: Column) =
      if (approx) approx_percentile(c, lit(0.5), lit(accuracy))
      else percentile(c, lit(0.5))
    val base = df.where(v.isNotNull)
      .select(col(groupCol), v.as("__v"))
    val medians = base.groupBy(col(groupCol))
      .agg(round(med(col("__v")), 6).as("__med"))
    val devs = base.join(broadcast(medians), groupCol)
      .select(col(groupCol), col("__v"),
        abs(col("__v") - col("__med")).as("__dev"), col("__med"))
    val mads = devs.groupBy(col(groupCol))
      .agg(round(med(col("__dev")), 6).as("__mad"))
    devs.join(broadcast(mads), groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        first(col("__med")).as("median"),
        first(col("__mad")).as("mad"),
        coalesce(sum(when(col("__dev") > lit(k) * col("__mad"), 1L)
          .otherwise(0L)), lit(0L)).as("n_outliers"))
      .withColumn("outlier_share",
        round(col("n_outliers") / col("n_rows").cast("double"), 6))
  }

  /** Per-group distinct-count estimate from a KMV (k-minimum-values)
    * sketch — "distinct tokens per language", "unique URLs per
    * domain" — WITHOUT the exact-distinct shuffle: exact
    * `count(DISTINCT v)` moves every distinct value to its group's
    * reducer (the value set IS the shuffle payload — unbounded at
    * 100 TB), while the KMV buffer is ≤ 8·k bytes per group,
    * partial-aggregates map-side, and merges associatively
    * ([[graft.functions.KmvSketchAggregate]]).
    *
    * The value is hashed to the first 60 bits of md5 (the board's
    * engine-portable hash family — same contract as
    * [[Sampling.splitDeterministic]]), so the sketch state depends
    * only on the value SET: partitioning, insertion order, and merge
    * order are immaterial, and the DuckDB oracle replays the result
    * exactly with a window rank over the same hashes. Estimator
    * (Beyer et al., SIGMOD 2007): exact size while the buffer is not
    * full, else `(k−1)/U₍k₎` with `U₍k₎ = h₍k₎ / 2⁶⁰`; the division
    * is one IEEE double op, identical in the oracle.
    *
    * @return (groupCol, n_kept = min(k, distinct), est_distinct).
    */
  private val cmsWidths = Set(16, 256, 4096, 65536)

  /** Count-Min frequency sketch (Cormode & Muthukrishnan, J.
    * Algorithms 2005) as a BOUNDED (row, bucket, cnt) table — point
    * frequency estimates ("how often does this token/URL/domain
    * occur?") whose state is ≤ `d·w` rows at ANY corpus size, vs an
    * exact value-count table that grows with the vocabulary. Each
    * occurrence increments one bucket per hash row (`d` independent
    * 4-bit-aligned md5 buckets — the board's portable hash family);
    * the grouped count map-side-combines, so the shuffle carries at
    * most `d·w` rows per task, and sketches of different shards
    * union by summing counts (same hash family, no rescan).
    *
    * Estimates from [[cmsLookup]] are upper bounds (collisions only
    * ADD), within `2N/w` of truth with probability `1 − 2⁻ᵈ`.
    * `w` must be a whole number of md5 nibbles (16/256/4096/65536)
    * so the DuckDB oracle replays bucket ids exactly.
    */
  def cmsSketch(
      df: DataFrame,
      valueCol: String,
      d: Int = 4,
      w: Int = 4096): DataFrame = {
    require(d >= 1 && d <= 8, "d must be in [1, 8]")
    require(cmsWidths.contains(w), s"w must be one of $cmsWidths")
    val nib = Integer.numberOfTrailingZeros(w) / 4
    df.where(col(valueCol).isNotNull)
      .select(posexplode(array((0 until d).map(j =>
        conv(substring(md5(concat(col(valueCol).cast("string"), lit(s":$j"))),
          1, nib), 16, 10).cast("int")): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point lookups against a [[cmsSketch]]: each item's estimate is
    * the MIN of its `d` bucket counts (the count-min estimator). The
    * sketch is ≤ `d·w` rows — broadcast onto the item set, so a
    * lookup never shuffles the sketch or the items.
    *
    * @return (itemCol, est_count) — `est_count ≥` the item's true
    *         occurrence count, 0 for items never seen.
    */
  def cmsLookup(
      sketch: DataFrame,
      items: DataFrame,
      itemCol: String,
      d: Int = 4,
      w: Int = 4096): DataFrame = {
    require(d >= 1 && d <= 8, "d must be in [1, 8]")
    require(cmsWidths.contains(w), s"w must be one of $cmsWidths")
    val nib = Integer.numberOfTrailingZeros(w) / 4
    items
      .select(col(itemCol),
        posexplode(array((0 until d).map(j =>
          conv(substring(md5(concat(col(itemCol).cast("string"), lit(s":$j"))),
            1, nib), 16, 10).cast("int")): _*)).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Set-operation estimates between two corpus slices from KMV
    * sketches — "how many customers/tokens/URLs do slice A and B
    * share?" WITHOUT materializing either distinct set (the
    * theta-sketch intersection idea, Dasgupta et al., "Theta
    * sketches", 2016-style, on the KMV state of [[distinctKmv]]):
    * each slice reduces to its k smallest distinct 60-bit md5 hashes
    * (≤ 8·k bytes, map-side combined), and every output — per-slice
    * distinct estimates, union estimate, intersection estimate,
    * Jaccard — is arithmetic on the two bounded arrays. The exact
    * answer would shuffle both full distinct sets; this ships 2·k
    * longs regardless of corpus size.
    *
    * Soundness of the membership trick: the k smallest union hashes
    * are all ≤ each side's own kth minimum, so "h ∈ sketch(A)" is
    * exact for every union-sketch element — the intersection count
    * over the union sketch is an unbiased |A∩B|/|A∪B| sample.
    *
    * Determinism: outputs depend only on the two hash SETS (same
    * contract as [[distinctKmv]]), so the DuckDB oracle replays them
    * with window ranks. Estimates round once, at 4 dp (ratios 6 dp).
    *
    * @return one row: (n_a_kept, n_b_kept, n_union_kept, est_a,
    *         est_b, est_union, inter_kept, est_inter, jaccard_kmv).
    */
  def overlapKmv(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String,
      k: Int = 256): DataFrame = {
    require(k > 1, "k must be > 1 (the estimator needs k-1)")
    import org.apache.spark.sql.GraftSqlBridge
    def sketchOf(df: DataFrame, name: String): DataFrame = {
      val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
        .cast("long")
      val sk = GraftSqlBridge.column(
        graft.functions.KmvSketchAggregate(GraftSqlBridge.expression(h), k)
          .toAggregateExpression())
      df.where(col(valueCol).isNotNull).agg(sk.as(name))
    }
    val num = (k - 1).toDouble * 1152921504606846976.0
    def estOf(arr: Column): Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(round(lit(num) / element_at(arr, k), 4))
    // two 1-row frames; the cross join is a broadcast of one row
    val joined = sketchOf(dfA, "__a").crossJoin(broadcast(sketchOf(dfB, "__b")))
    // union sketch: k smallest of the merged hash SETS (each side is
    // already sorted+distinct; the merge is 2k elements)
    val u = slice(array_sort(array_distinct(concat(col("__a"), col("__b")))), 1, k)
    joined
      .withColumn("__u", u)
      .withColumn("__estu", estOf(col("__u")))
      .withColumn("__c",
        size(array_intersect(array_intersect(col("__u"), col("__a")), col("__b"))))
      .select(
        size(col("__a")).as("n_a_kept"),
        size(col("__b")).as("n_b_kept"),
        size(col("__u")).as("n_union_kept"),
        estOf(col("__a")).as("est_a"),
        estOf(col("__b")).as("est_b"),
        col("__estu").as("est_union"),
        col("__c").as("inter_kept"),
        when(size(col("__u")) === 0, lit(0.0))
          .otherwise(round(col("__c").cast("double") * col("__estu") / size(col("__u")), 4))
          .as("est_inter"),
        when(size(col("__u")) === 0, lit(0.0))
          .otherwise(round(col("__c").cast("double") / size(col("__u")), 6))
          .as("jaccard_kmv"))
  }

  /** Misra–Gries heavy-hitter candidates from a bounded sketch —
    * "the frequent tokens/domains/keys" WITHOUT a vocabulary-sized
    * count table: per-partition state is ≤ k (item, counter) pairs
    * (a `TypedImperativeAggregate`, map-side combined, merges by the
    * mergeable-summaries rule), and the output is the ≤ k surviving
    * candidates. THE GUARANTEE: every item whose true count exceeds
    * N/(k+1) is present; kept counters underestimate by ≤ N/(k+1).
    * Which OTHER items survive — and the counter values — are
    * arrival/merge-order-dependent, so downstream queries should
    * consume membership (e.g. [[topValues]]∩sketch, which the
    * oracle-checked board row does) or re-count the candidate set
    * exactly in a second cheap pass (the classic two-pass exact
    * heavy-hitters plan, candidates already in hand).
    *
    * @return (item, cnt) — at most k rows, the sketch's surviving
    *         candidates with their (lower-bound) counters.
    */
  def mgHeavyHitters(
      df: DataFrame,
      valueCol: String,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val sk = GraftSqlBridge.column(
      graft.functions.MgSketchAggregate(
        GraftSqlBridge.expression(col(valueCol).cast("string")), k)
        .toAggregateExpression())
    df.where(col(valueCol).isNotNull)
      .agg(sk.as("__mg"))
      .select(explode(col("__mg")).as("__e"))
      .select(col("__e.item").as("item"), col("__e.cnt").as("cnt"))
  }

  def distinctKmv(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 256): DataFrame = {
    require(k > 1, "k must be > 1 (the estimator needs k-1)")
    import org.apache.spark.sql.GraftSqlBridge
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val sketch = GraftSqlBridge.column(
      graft.functions.KmvSketchAggregate(GraftSqlBridge.expression(h), k)
        .toAggregateExpression())
    // (k−1)·2⁶⁰ is exact in double (2⁶⁰ is a power of two), so the
    // whole estimate is a single rounded IEEE division — replayable.
    val num = (k - 1).toDouble * 1152921504606846976.0
    df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sketch.as("__kmv"))
      .select(
        col(groupCol),
        size(col("__kmv")).as("n_kept"),
        when(size(col("__kmv")) < k, size(col("__kmv")).cast("double"))
          .otherwise(round(lit(num) / element_at(col("__kmv"), k), 4))
          .as("est_distinct"))
  }

  /** HyperLogLog distinct-count sketch per group (Flajolet, Fusy,
    * Gandouet & Meunier, AofA 2007) — the MERGEABLE complement of
    * [[distinctKmv]]: KMV ships the k smallest hashes (~2 KiB, best
    * absolute accuracy at small k), HLL ships m = 4096 six-bit
    * registers (~3 KiB) whose per-bucket MAX is associative — so
    * partial sketches from shards/days/partitions union by plain
    * `max` with no re-scan, the property a 100 TB rolling distinct
    * count actually needs (KMV merge needs a re-sort of the union).
    * Standard error ≈ 1.04/√m ≈ 1.6 %.
    *
    * Determinism/replay (no custom aggregate — the registers ARE a
    * grouped max): bucket = the first 3 md5 nibbles (12 bits,
    * m = 4096); rho = leading-zero count of the next 15 nibbles + 1,
    * computed by STRING inspection (count '0' chars, then a CASE on
    * the first nonzero nibble) — exact in both engines, no
    * float log2 at power-of-two boundaries. The register sum
    * Σ 2^(−r) accumulates as the exact INTEGER Σ 2^(61−r) in
    * DECIMAL(38,0) (each term a power of two ≤ 2^61, exact in double
    * and decimal; HUGEINT in the oracle), so it is order-independent;
    * the estimate is fixed-order double arithmetic on that sum —
    * α_m·m²·2⁶¹/S — with the small-range linear-counting branch
    * (E ≤ 2.5m and empty registers exist → m·ln(m/V)) taken
    * identically in both engines and one 4 dp boundary rounding.
    * Null values drop.
    *
    * @return one row per group: (groupCol, n_registers — occupied,
    *         of 4096, est_distinct 4 dp).
    */
  def distinctHll(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val m = 4096
    val hex = md5(col(valueCol).cast("string"))
    val wstr = substring(hex, 4, 15)
    val zeros = length(regexp_extract(wstr, "^0*", 0))
    val firstNz = substring(regexp_replace(wstr, "^0*", ""), 1, 1)
    val nibZeros = when(firstNz.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(firstNz.isin("4", "5", "6", "7"), 1)
      .when(firstNz.isin("2", "3"), 2)
      .otherwise(3)
    val rho = when(zeros === 15, lit(61))
      .otherwise(zeros * 4 + nibZeros + 1)
    val regs = df
      .where(col(valueCol).isNotNull)
      .select(col(groupCol),
        conv(substring(hex, 1, 3), 16, 10).cast("long").as("__b"),
        rho.as("__rho"))
      .groupBy(col(groupCol), col("__b"))
      .agg(max(col("__rho")).as("__r"))
    val summed = regs
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("__nb"),
        sum(pow(lit(2.0), lit(61) - col("__r")).cast("decimal(38,0)"))
          .as("__sp"))
    val sTot = col("__sp") +
      (lit(m.toLong) - col("__nb")).cast("decimal(38,0)") *
        lit(2305843009213693952L).cast("decimal(38,0)")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val v = lit(m.toLong) - col("__nb")
    summed
      .withColumn("__eraw",
        alpha * lit(m.toDouble) * lit(m.toDouble) *
          lit(2305843009213693952.0) / sTot.cast("double"))
      .select(col(groupCol),
        col("__nb").as("n_registers"),
        when(v > 0 && col("__eraw") <= lit(2.5 * m),
          round(lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")), 4))
          .otherwise(round(col("__eraw"), 4)).as("est_distinct"))
  }

  /** k-anonymity audit over a quasi-identifier tuple — the
    * re-identification-risk gate a dataset must clear before release
    * (Sweeney's k-anonymity: every quasi-identifier combination must
    * be shared by ≥ k rows). Nulls are their own quasi value (a null
    * ZIP is as linkable as a real one).
    *
    * One map-side-combined groupBy over the quasi tuple, then one
    * bounded aggregation of the group-size table — never a window
    * over the raw rows.
    *
    * @return one row: (k, n_rows, n_groups, n_small_groups,
    *         rows_at_risk, min_group_size) — rows_at_risk is the
    *         count of rows living in a group smaller than k.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "no quasi-identifier columns given")
    require(k >= 2, "k must be >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum(col("__n")).as("__rows"),
        count(lit(1)).as("__groups"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("__small"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("__at_risk"),
        min(col("__n")).as("__min"))
      .select(lit(k).as("k"),
        coalesce(col("__rows"), lit(0L)).as("n_rows"),
        col("__groups").as("n_groups"),
        coalesce(col("__small"), lit(0L)).as("n_small_groups"),
        coalesce(col("__at_risk"), lit(0L)).as("rows_at_risk"),
        col("__min").as("min_group_size"))
  }

  /** Per-group corpus DATA CARD — the one-frame release summary a
    * dataset card quotes per language/source slice: document count,
    * exact mean/median length, and the exact byte-identical
    * duplicate rate (1 − distinct fingerprints / docs — the row-27
    * exact-dedup measure as a rate). Output is bounded by |groups|.
    * Scale shape: ONE groupBy pass — mean from an exact DECIMAL sum
    * (order-independent), median from `percentile`, and the dup
    * rate from count(DISTINCT md5(text)), the same key shuffle the
    * exact-dedup pass itself pays (the KMV sketch row 153 is the
    * bounded-state estimate when exactness isn't required). Null
    * texts count as docs, contribute no fingerprint, and length
    * stats skip them.
    */
  def corpusCard(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col(textCol)).as("__nt"),
        sum(length(col(textCol)).cast("decimal(28,0)")).as("__chars"),
        round(percentile(length(col(textCol)).cast("double"), lit(0.5)), 4)
          .as("p50_chars"),
        countDistinct(md5(col(textCol))).as("__uniq"))
      .select(
        col(groupCol),
        col("n_docs"),
        round(col("__chars").cast("double") / col("__nt"), 4).as("mean_chars"),
        col("p50_chars"),
        when(col("__nt") > 0,
          round(lit(1.0) - col("__uniq").cast("double") / col("__nt"), 6))
          .otherwise(lit(null)).as("dup_rate"))

  /** l-diversity audit (Machanavajjhala et al., ICDE 2006) — the
    * refinement [[kAnonymity]] misses: a quasi-group can be large
    * (k-anonymous) yet reveal everyone's sensitive value because the
    * group holds only ONE of them (the homogeneity attack). Per
    * quasi-group, diversity = distinct non-null sensitive values;
    * the report counts groups (and their rows) below `l`. Null
    * sensitive values do not contribute diversity but their rows
    * still count as exposed. Same scale shape as the k-audit: one
    * map-side-combined groupBy over (quasi..., sensitive), one
    * bounded roll-up — no distinct-set state.
    */
  /** Population Stability Index over reference-quantile bins — the
    * ML-monitoring standard next to [[distributionDrift]] (KL/JS on
    * categorical keys) and [[ksTest]] (binless): bin edges come from
    * the REFERENCE side's deciles (so "the score distribution moved"
    * is measured against where the model was trained), PSI =
    * Σ_b (p_cur − p_ref)·ln(p_cur/p_ref) with the industry reading
    * < 0.1 stable / 0.1–0.25 drifting / > 0.25 broken.
    *
    * One quantile aggregation on the reference (t-digest via
    * `approx = true` at corpus scale) → a broadcast 1-row edge array
    * (6 dp, the [[equiDepthHistogram]] edge discipline) → one grouped
    * count per side. Laplace-smoothed shares ((n_b + 1)/(N + bins) —
    * an empty bin cannot produce ±∞), per-bin terms round 8 dp into
    * exact DECIMAL(28,8), one 6 dp boundary. Null values drop.
    *
    * @return one row per bin 0..bins-1 — the FULL grid, including
    *         bins empty on both sides (their smoothed psi_term is
    *         nonzero whenever the totals differ): (bin, lo, hi,
    *         n_ref, n_cur, p_ref 6 dp, p_cur 6 dp, psi_term 6 dp) —
    *         total PSI = Σ psi_term.
    */
  def psi(
      reference: DataFrame,
      current: DataFrame,
      valueCol: String,
      bins: Int = 10,
      approx: Boolean = false): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val refV = reference.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val curV = current.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val ps = (1 until bins).map(_.toDouble / bins)
    val edgeAgg =
      if (approx)
        refV.agg(percentile_approx(col("__v"),
          array(ps.map(lit): _*), lit(10000)).as("__e"))
      else refV.agg(percentile(col("__v"), array(ps.map(lit): _*)).as("__e"))
    // 1-row edge frame, staged: three consumers (two binning passes +
    // the final lo/hi select) must not re-run the reference quantile
    val edges = edgeAgg.select(transform(col("__e"), e => round(e, 6)).as("__e"))
      .localCheckpoint()
    def binOf = {
      // bin = #edges strictly below the value (strict-> tie rule —
      // the equiDepthHistogram discipline, identical in the oracle)
      aggregate(col("__e"),
        lit(0), (acc, e) => acc + when(col("__v") > e, 1).otherwise(0))
    }
    def counted(side: DataFrame, out: String) = side
      .crossJoin(broadcast(edges))
      .groupBy(binOf.as("bin"))
      .agg(count(lit(1)).as(out))
    // The COMPLETE 0..bins-1 grid, not just the observed bins: with
    // Laplace smoothing a bin empty on BOTH sides still carries a
    // nonzero psi_term whenever the ref and cur totals differ, so
    // dropping it would understate the summed PSI and truncate the
    // advertised per-bin report. Bounded by bins, staged for the
    // totals aggregate + final select.
    val grid = reference.sparkSession.range(bins)
      .select(col("id").cast("int").as("bin"))
    val cells = grid
      .join(counted(refV, "n_ref"), Seq("bin"), "left")
      .join(counted(curV, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .localCheckpoint()
    val tot = cells.agg(
      coalesce(sum(col("n_ref")), lit(0L)).as("__tr"),
      coalesce(sum(col("n_cur")), lit(0L)).as("__tc"))
    cells.crossJoin(broadcast(tot)).crossJoin(broadcast(edges))
      .select(col("bin"),
        when(col("bin") > 0, element_at(col("__e"), col("bin"))).as("lo"),
        when(col("bin") < bins - 1, element_at(col("__e"), col("bin") + 1)).as("hi"),
        col("n_ref"), col("n_cur"),
        round((col("n_ref") + 1).cast("double") / (col("__tr") + bins), 6)
          .as("p_ref"),
        round((col("n_cur") + 1).cast("double") / (col("__tc") + bins), 6)
          .as("p_cur"))
      .withColumn("psi_term",
        round(round((col("p_cur") - col("p_ref")) *
          log(col("p_cur") / col("p_ref")), 8), 6))
  }

  /** Top-k concentration headline — "what share of the corpus do the
    * k biggest sources/domains hold?" — the one-line answer behind
    * "are we one takedown away from losing half the data?" and the
    * k-at-a-glance complement of [[giniByGroup]]'s integral.
    *
    * Scale shape: one map-side-combined grouped count, then the top
    * max(ks) keys via TakeOrderedAndProject ((count desc, key asc) —
    * deterministic under count ties) — the ranked frame is bounded by
    * max(ks), never by key cardinality, and the cumulative share runs
    * on that bounded frame. Null keys drop.
    *
    * @return one row per k in `ks` (ascending): (k, top_rows,
    *         coverage 6 dp — null on an empty input).
    */
  def topKCoverage(
      df: DataFrame,
      keyCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "no ks given")
    require(ks.forall(_ >= 1), "every k must be positive")
    require(ks.distinct == ks, "ks must be distinct")
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // one grouped pass feeds both the top and the total
    val top = counts
      .orderBy(col("__c").desc, col("__k").asc)
      .limit(ks.max)
      .withColumn("__rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("__c"), lit(1)))
          .orderBy(col("__c").desc, col("__k").asc)))
    val tot = counts.agg(coalesce(sum(col("__c")), lit(0L)).as("__t"))
    val spark = df.sparkSession
    import spark.implicits._
    val grid = ks.sorted.toDF("k")
    grid
      .join(top, col("__rank") <= col("k"), "left")
      .groupBy(col("k"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("top_rows"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("top_rows"),
        when(col("__t") > 0,
          round(col("top_rows").cast("double") / col("__t").cast("double"), 6))
          .as("coverage"))
  }

  /** Join-cardinality pre-flight — "will this join explode?" answered
    * EXACTLY before paying for it: output rows = Σ_k cntA(k)·cntB(k)
    * over shared keys, computed from the two per-key count frames (a
    * grouped count per side — id-sized rows, never payloads — plus
    * one equi-join of the count frames). The report that tells you to
    * salt/pre-aggregate BEFORE the 100 TB shuffle, not after the
    * stage dies: `max_key_rows` is the single worst key's
    * contribution (the skew headline), `join_rows` the exact output
    * size. Null keys drop on both sides (equi-joins drop them
    * anyway).
    *
    * @return one row: (n_rows_a, n_rows_b, n_keys_a, n_keys_b,
    *         n_shared_keys, join_rows, max_key_rows).
    */
  def joinCardinality(
      dfA: DataFrame,
      keyA: String,
      dfB: DataFrame,
      keyB: String): DataFrame = {
    // per-key count frames (id + count, compact) staged: each feeds
    // both the shared-key join and its own totals aggregate, and the
    // input scans must run ONCE
    val ca = dfA.where(col(keyA).isNotNull)
      .groupBy(col(keyA).as("__k")).agg(count(lit(1)).as("__ca"))
      .localCheckpoint()
    val cb = dfB.where(col(keyB).isNotNull)
      .groupBy(col(keyB).as("__k")).agg(count(lit(1)).as("__cb"))
      .localCheckpoint()
    val shared = ca.join(cb, Seq("__k"))
      .select((col("__ca").cast("decimal(38,0)") *
        col("__cb").cast("decimal(38,0)")).as("__prod"))
      .agg(
        count(lit(1)).as("n_shared_keys"),
        coalesce(sum(col("__prod")), lit(0)).cast("decimal(38,0)").as("__rows"),
        max(col("__prod")).as("__max"))
    val ta = ca.agg(coalesce(sum(col("__ca")), lit(0L)).as("n_rows_a"),
      count(lit(1)).as("n_keys_a"))
    val tb = cb.agg(coalesce(sum(col("__cb")), lit(0L)).as("n_rows_b"),
      count(lit(1)).as("n_keys_b"))
    ta.crossJoin(broadcast(tb)).crossJoin(broadcast(shared))
      .select(col("n_rows_a"), col("n_rows_b"), col("n_keys_a"),
        col("n_keys_b"), col("n_shared_keys"),
        col("__rows").cast("long").as("join_rows"),
        coalesce(col("__max").cast("long"), lit(0L)).as("max_key_rows"))
  }

  /** Pairwise missingness profile — nulls are rarely independent
    * (the scraper that loses `title` usually loses `author` too), and
    * imputation/gating decisions differ completely between "5% random
    * nulls" and "5% of rows missing EVERYTHING". Per unordered column
    * pair: each side's null count and the BOTH-null count, plus their
    * Jaccard overlap both/(x+y−both) — 1.0 means one broken upstream
    * path, ≈ x·y/n² means independent noise.
    *
    * The [[corrMatrix]] shape: ONE aggregation pass collects every
    * cell (counts are exact longs, order-independent), the pair
    * algebra runs on the single bounded agg row via `inline` — no
    * second scan, no per-pair pass. Jaccard is null when neither side
    * has nulls (no overlap to measure).
    *
    * @return one row per unordered pair in `cols` order: (col_x,
    *         col_y, n_rows, x_null, y_null, both_null, jaccard 6 dp).
    */
  def missingnessProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct == cols, "columns must be distinct")
    val aggs = count(lit(1)).as("__n") +:
      (cols.map(c => coalesce(sum(when(col(c).isNull, 1L)), lit(0L)).as(s"__m_$c")) ++
        (for {
          (ci, i) <- cols.zipWithIndex
          (cj, j) <- cols.zipWithIndex if j > i
        } yield coalesce(sum(when(col(ci).isNull && col(cj).isNull, 1L)), lit(0L))
          .as(s"__b_${i}_$j")))
    val pairs = for {
      (ci, i) <- cols.zipWithIndex
      (cj, j) <- cols.zipWithIndex if j > i
    } yield {
      val union = col(s"__m_$ci") + col(s"__m_$cj") - col(s"__b_${i}_$j")
      struct(
        lit(ci).as("col_x"),
        lit(cj).as("col_y"),
        col("__n").as("n_rows"),
        col(s"__m_$ci").as("x_null"),
        col(s"__m_$cj").as("y_null"),
        col(s"__b_${i}_$j").as("both_null"),
        round(when(union > 0,
          col(s"__b_${i}_$j").cast("double") / union.cast("double")), 6)
          .as("jaccard"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs: _*)).as("c"))
      .select("c.*")
  }

  /** Two-sample Kolmogorov–Smirnov distance — the BINLESS drift test
    * next to the binned KL/JS drift row: D = max_v |F_A(v) − F_B(v)|
    * over the pooled empirical CDFs. KL/JS inherit their bin edges'
    * blind spots (a shift inside one bin is invisible); KS sees any
    * distributional move, and its null quantiles (D·√(n_a·n_b/(n_a+
    * n_b)) vs the Kolmogorov distribution) give a calibrated alarm.
    *
    * Scale shape: never a per-row rank — one map-side-combined
    * groupBy over distinct values with per-side conditional counts,
    * BOTH cumulatives from one multi-value distributed prefix sum
    * ([[Cumulative.withCumulativeSums]] — a single range exchange),
    * per-value gaps round to 10 dp (one fixed-order double division
    * per side) and a max aggregation (order-independent by nature).
    * Rows outside the two groups and null values drop; either side
    * empty → null D.
    *
    * @return one row: (n_a, n_b, ks 6 dp).
    */
  def ksTest(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    require(groupA != groupB, "the two samples must be different groups")
    val g = col(groupCol)
    val cells = df
      .where(col(valueCol).isNotNull && (g === groupA || g === groupB))
      .groupBy(col(valueCol).as("__v"))
      .agg(
        sum(when(g === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(g === groupB, 1L).otherwise(0L)).as("__cb"))
    val c = Cumulative.withCumulativeSums(
      cells, Seq(col("__ca") -> "__cuma", col("__cb") -> "__cumb"), col("__v"))
    val tot = cells.agg(
      coalesce(sum(col("__ca")), lit(0L)).as("__na"),
      coalesce(sum(col("__cb")), lit(0L)).as("__nb"))
    c.crossJoin(broadcast(tot))
      .select(col("__na"), col("__nb"),
        // guarded division — ANSI mode raises on a zero divisor, and
        // an empty side must read as null, not crash
        when(col("__na") > 0 && col("__nb") > 0,
          round(abs(col("__cuma").cast("double") / col("__na") -
            col("__cumb").cast("double") / col("__nb")), 10)).as("__gap"))
      .groupBy(col("__na"), col("__nb"))
      .agg(max(col("__gap")).as("__d"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        when(col("__na") > 0 && col("__nb") > 0,
          round(col("__d"), 6)).as("ks"))
  }

  /** Per-group Gini coefficient — the concentration number a corpus
    * data card needs next to row 189's counts: "how unequal are doc
    * lengths / domain shares / token budgets inside each slice?"
    * (G = 0 everyone equal, → 1 one doc holds everything).
    *
    * Grouped-tie formulation over DISTINCT values, never a per-row
    * rank: G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n with the rank-block sum
    * for value v (count c, inclusive cumulative count cum):
    * v·(c·(cum − c) + c·(c+1)/2) — exact integer rank arithmetic ×
    * DECIMAL(20,6) values accumulated in DECIMAL(38,6). The window
    * runs over the per-group distinct-value frame (bounded by value
    * granularity, not rows). Nulls drop; a NEGATIVE value raises
    * in-plan (Gini is undefined and silently corrupts the index);
    * all-zero groups yield null.
    *
    * @return one row per group: (groupCol, n_rows, total 6 dp,
    *         gini 6 dp).
    */
  def giniByGroup(
      df: DataFrame,
      valueCol: String,
      groupCol: String): DataFrame = {
    // DECIMAL(18,6) values × DECIMAL(19,0) rank sums multiply to
    // precision exactly 38 — no cap, no silent precision loss
    val v = when(col(valueCol) < 0,
      raise_error(lit(s"giniByGroup: negative '$valueCol' - Gini is " +
        "undefined on negative values; shift or filter first"))
        .cast("decimal(18,6)"))
      .otherwise(col(valueCol).cast("decimal(18,6)"))
    val cells = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__v"))
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ranked = cells
      .withColumn("__cum", sum(col("__c")).over(w))
      // Σ ranks in the tie block: c·cumBefore + c(c+1)/2 — always an
      // exact integer (c·(c+1) is even)
      .withColumn("__rsum",
        (col("__c") * (col("__cum") - col("__c")) +
          expr("__c * (__c + 1) div 2")).cast("decimal(19,0)"))
    ranked
      .groupBy(col(groupCol))
      .agg(
        sum(col("__c")).as("__n"),
        sum(col("__v") * col("__c").cast("decimal(19,0)"))
          .cast("decimal(38,6)").as("__sx"),
        sum(col("__v") * col("__rsum")).cast("decimal(38,6)").as("__s1"))
      .select(col(groupCol),
        col("__n").as("n_rows"),
        round(col("__sx").cast("double"), 6).as("total"),
        when(col("__sx") > 0,
          round(lit(2.0) * col("__s1").cast("double") /
            (col("__n").cast("double") * col("__sx").cast("double")) -
            (col("__n") + lit(1)).cast("double") / col("__n").cast("double"), 6))
          .as("gini"))
  }

  /** Benford first-significant-digit test — the classic fabricated /
    * truncated / unit-mixed numeric-column smell test: naturally
    * occurring multi-magnitude positives follow P(d) = log₁₀(1+1/d),
    * and a column that diverges hard (big χ²) was usually clipped,
    * defaulted, or synthesized. First digits extract via STRING
    * surgery (first [1-9] of the value's canonical repr — log₁₀ would
    * misbin values sitting one ulp under a power of ten); expected
    * shares are shared 10 dp literals (both engines compare the same
    * constants — they sum to exactly 1.0000000000). One groupBy pass,
    * ≤ 9 output rows. Values ≤ 0 and nulls drop (no first digit).
    *
    * @return per observed digit: (digit, n_obs, observed_p 6 dp,
    *         expected_p, chi2_term 6 dp) — χ² = Σ chi2_term vs the
    *         χ²₈ tail the caller cares about.
    */
  def benfordTest(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(
      regexp_replace(col(valueCol).cast("string"), "[^1-9]", ""), 1, 1)
      .cast("int")
    val expected = Profile.benfordP.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (p, i)) => when(col("digit") === (i + 1), lit(p)).otherwise(acc)
    }
    // ≤ 9-row grouped frame, staged so the total derives from it
    // without a second input scan
    val g = df.where(col(valueCol).isNotNull && col(valueCol) > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_obs"))
      .localCheckpoint()
    g.crossJoin(broadcast(g.agg(sum(col("n_obs")).as("__n"))))
      .withColumn("expected_p", expected)
      .withColumn("__diff",
        col("n_obs").cast("double") - col("__n") * col("expected_p"))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("__n"), 6).as("observed_p"),
        col("expected_p"),
        // spelled diff·diff (not pow) so both engines square identically
        round(col("__diff") * col("__diff") /
          (col("__n") * col("expected_p")), 6).as("chi2_term"))
  }

  /** log₁₀(1 + 1/d) for d = 1..9, rounded to 10 dp — they sum to
    * exactly 1.0000000000, and BOTH engines compare these literals
    * rather than each computing its own logs.
    */
  private[graft] val benfordP = Seq(
    0.3010299957, 0.1760912591, 0.1249387366, 0.0969100130, 0.0791812460,
    0.0669467896, 0.0579919470, 0.0511525224, 0.0457574906)

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    * the refinement [[lDiversity]] misses: a quasi-group can be
    * diverse yet SKEWED (19 of 20 values "broke" in a group where the
    * population is 50/50 reveals plenty). Per quasi-group, distance =
    * Earth Mover's Distance between the group's distribution over the
    * ORDERED sensitive values and the global one:
    * EMD = (1/(m−1)) · Σᵢ |cumP_g(vᵢ) − cumQ(vᵢ)| (the ordered-EMD
    * closed form from the paper).
    *
    * Scale shape: one map-side-combined groupBy over (quasi...,
    * sensitive) — no per-row state — then the (groups × m) grid from
    * a BROADCAST of the bounded value frame (m > maxValues raises
    * in-plan: the grid is the scale knob, and a high-cardinality
    * sensitive column should be banded first). Cumulative fractions
    * divide once per (group, value) in a fixed order; per-value terms
    * round to 10 dp into exact DECIMAL(28,10) so the per-group sum is
    * order-independent. Rows with a null sensitive value drop
    * (documented: they carry no distributional information), and so
    * do rows with a null QUASI value: the grid join-back matches on
    * equality, so a null-quasi group's observed counts would never
    * match (cumg stuck at 0 → a large spurious EMD and a false
    * breaches_t). A null quasi value is already suppressed — it
    * cannot re-identify anyone — so it has no place in the audit.
    * m = 1 yields EMD 0 (one value everywhere — nothing to leak).
    *
    * @return one row per quasi-group: (quasiCols…, n_rows, emd 6 dp,
    *         breaches_t).
    */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      t: Double,
      maxValues: Int = 1000): DataFrame = {
    require(quasiCols.nonEmpty, "no quasi-identifier columns given")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot be a quasi-identifier")
    require(t > 0 && t < 1, "t must be in (0, 1)")
    require(maxValues >= 2, "maxValues must be >= 2")
    val q = quasiCols.map(col)
    val cells = df
      .where(quasiCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(sensitiveCol).isNotNull)
      .groupBy(q :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = cells.groupBy(q: _*).agg(sum(col("__c")).as("__ng"))
    val vals = cells.groupBy(col("__v")).agg(sum(col("__c")).as("__cv"))
    val mN = vals.agg(
      count(lit(1)).as("__m"), sum(col("__cv")).as("__N"))
    // pmod(__m, 1) is constant-VALUED but not foldable, so the planner
    // keeps a real (single-group) partition spec (the prefixSum trick)
    val wGlob = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("__m"), lit(1))).orderBy(col("__v"))
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // the value frame is bounded (guarded below), so the constant-key
    // window is a bounded single partition by construction
    val glob = vals
      .crossJoin(broadcast(mN))
      .withColumn("__m",
        when(col("__m") > maxValues,
          raise_error(lit(s"tCloseness: more than $maxValues distinct " +
            s"'$sensitiveCol' values - band the sensitive column or raise " +
            "maxValues explicitly")).cast("long"))
          .otherwise(col("__m")))
      .withColumn("__cumv", sum(col("__cv")).over(wGlob))
      .select(col("__v"), col("__cumv"), col("__N"), col("__m"))
    val wGrp = org.apache.spark.sql.expressions.Window
      .partitionBy(q: _*).orderBy(col("__v"))
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val grid = groups
      .crossJoin(broadcast(glob))
      .join(cells, quasiCols :+ "__v", "left")
      .withColumn("__cumg",
        sum(coalesce(col("__c"), lit(0L))).over(wGrp))
      .withColumn("__term",
        round(abs(col("__cumg").cast("double") / col("__ng") -
          col("__cumv").cast("double") / col("__N")), 10)
          .cast("decimal(28,10)"))
    grid
      .groupBy(q :+ col("__ng") :+ col("__m"): _*)
      .agg(sum(col("__term")).as("__sum"))
      .select(q ++ Seq(
        col("__ng").as("n_rows"),
        when(col("__m") > 1,
          round(col("__sum").cast("double") / (col("__m") - lit(1)), 6))
          .otherwise(lit(0.0)).as("emd")): _*)
      .withColumn("breaches_t", col("emd") > t)
  }

  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "no quasi-identifier columns given")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot be a quasi-identifier")
    require(l >= 2, "l must be >= 2")
    df.groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(
        sum(col("__n")).as("__rows"),
        sum(when(col(sensitiveCol).isNotNull, 1L).otherwise(0L)).as("__div"))
      .agg(
        sum(col("__rows")).as("__all"),
        count(lit(1)).as("__groups"),
        sum(when(col("__div") < l, 1L).otherwise(0L)).as("__low"),
        sum(when(col("__div") < l, col("__rows")).otherwise(0L)).as("__at_risk"),
        min(col("__div")).as("__min"))
      .select(lit(l).as("l"),
        coalesce(col("__all"), lit(0L)).as("n_rows"),
        col("__groups").as("n_groups"),
        coalesce(col("__low"), lit(0L)).as("n_low_diversity_groups"),
        coalesce(col("__at_risk"), lit(0L)).as("rows_at_risk"),
        col("__min").as("min_diversity"))
  }

  /** Per-row twin of [[kAnonymity]]: the input plus its group's size
    * and an `at_risk` flag — the frame a suppression/generalization
    * step filters on. One window count over the quasi partitioning
    * (hash-partitioned by the tuple — parallel across groups).
    */
  def kAnonymityFlags(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "no quasi-identifier columns given")
    require(k >= 2, "k must be >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    df.withColumn("group_size", count(lit(1)).over(w))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** Functional-dependency discovery (the g₃ measure, Kivinen &
    * Mannila 1995) — "does column A determine column B": for every
    * ordered pair of `cols`, the minimum number of rows that must be
    * removed for A → B to hold exactly (per A value, everything but
    * its majority B) and the strength 1 − violations/n. The
    * data-profiling primitive behind schema inference, key
    * discovery, and denormalization checks ("is source derivable
    * from lang?").
    *
    * Scale shape: per pair, ONE map-side-combined (A, B) cell count
    * (bounded by the CATEGORICAL combination count — the crossTab
    * contract: these are category columns, never free strings), a
    * grouped max/sum over that bounded frame, one global fold. Rows
    * with a null on either side of a pair drop for that pair (the
    * cramersV null-category contract); a pair with NO surviving rows
    * emits no row. Output is ≤ |pairs| rows, ONE corpus scan total
    * (values melt to per-pair string tuples in-task).
    *
    * @return one row per ordered pair: (determinant, dependent,
    *         n_rows, n_det_values, n_violations, strength 6 dp —
    *         1.0 means the FD holds exactly).
    */
  def functionalDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct == cols, "columns must be distinct")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    // ONE corpus scan for ALL pairs: melt each row into its |pairs|
    // (det, dep, det_val, dep_val) tuples in-task (the explode is
    // row-local), drop null-sided tuples per pair, then every later
    // frame is bounded by the categorical cell counts. The naive
    // per-pair loop re-scans the corpus |pairs| times — the audit
    // caught it at 5 scans for 6 pairs.
    val melted = df
      .select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("determinant"), lit(b).as("dependent"),
          col(a).cast("string").as("__dv"), col(b).cast("string").as("__bv"))
      }: _*)).as("__p"))
      .select(col("__p.*"))
      .where(col("__dv").isNotNull && col("__bv").isNotNull)
    val cells = melted
      .groupBy(col("determinant"), col("dependent"), col("__dv"), col("__bv"))
      .agg(count(lit(1)).as("__c"))
    val perDet = cells
      .groupBy(col("determinant"), col("dependent"), col("__dv"))
      .agg(max(col("__c")).as("__mx"), sum(col("__c")).as("__tot"))
    perDet
      .groupBy(col("determinant"), col("dependent"))
      .agg(
        coalesce(sum(col("__tot")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_det_values"),
        coalesce(sum(col("__tot") - col("__mx")), lit(0L)).as("n_violations"))
      .select(
        col("determinant"), col("dependent"),
        col("n_rows"), col("n_det_values"), col("n_violations"),
        round(when(col("n_rows") > 0,
          lit(1.0) - col("n_violations").cast("double") /
            col("n_rows").cast("double")), 6).as("strength"))
  }
}
