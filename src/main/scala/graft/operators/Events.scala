package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics: ordered-step conversion funnels and
  * cohort retention over an event log (the `events` table shape:
  * one row per user action with a millisecond timestamp).
  *
  * Complements [[Profile.stageFunnel]] (which gates ROWS of one scan
  * on predicates): these operators reason about ORDER and TIME
  * across many rows of the same user, so their unit of shuffle is
  * the user key, never the raw event volume beyond one pass.
  *
  * Reference scope: kolang's `session_id` (column_functions.py:281)
  * is the only sequential-events device in the reference; funnels
  * and retention are the beyond-reference analytics a pipeline over
  * the same event log asks for next.
  */
object Events {

  /** Exact integer FLOOR division of the epoch-ms column by a
    * positive width — `a − pmod(a, b)` is the largest multiple of b
    * ≤ a, so the quotient floors for negative (pre-1970) epochs too:
    * a pre-epoch event lands in the window that COVERS it, where
    * truncation (Spark `div`, and DuckDB's integer `//` — both
    * truncate toward zero) would shift it one bucket late. This pins
    * every Events bucketing to floor explicitly; the DuckDB oracles
    * replay with `//` over the testdata's non-negative epochs, where
    * floor and truncation coincide — an oracle over pre-1970 data
    * would need the same spelled-out floor
    * (`(a - ((a % b + b) % b)) // b`).
    */
  private def floorDivMs(tsMsCol: String, widthMs: Long): Column =
    expr(s"(cast($tsMsCol as bigint) - pmod(cast($tsMsCol as bigint), ${widthMs}L)) div ${widthMs}L")

  /** Ordered-step conversion funnel with strict time progression:
    * a user REACHES step i when an event of type `steps(i)` exists
    * STRICTLY AFTER the (earliest-transition) time at which they
    * reached step i-1; step 0 is the user's earliest `steps(0)`
    * event. Greedy earliest-transition over the time-sorted stream
    * is optimal (each step's reach time is the minimum possible), so
    * the result is order-deterministic and engine-replayable.
    *
    * Scale shape: events are FILTERED to the step types at the scan
    * (predicate pushdown), only `(user, ts, step_idx)` triples
    * shuffle ONCE keyed by user, and the per-user funnel is a
    * row-local fold over that user's sorted step events (bounded by
    * events-per-user, the standard funnel assumption — never
    * corpus-sized). Output is |steps| rows from one bounded
    * aggregation.
    *
    * @param tsMsCol epoch-millisecond LONG column (integer
    *                comparisons are engine-portable; no timestamp
    *                arithmetic).
    * @return one row per step, in order: (step_idx, step, n_users —
    *         users reaching this step, share — of all users with ANY
    *         step-typed event, 6 dp).
    */
  def eventFunnel(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "no steps given")
    require(steps.distinct == steps, "steps must be distinct")
    val stepIdx = steps.tail.zipWithIndex.foldLeft(
      when(col(typeCol) === steps.head, lit(0))) { case (acc, (s, i)) =>
      acc.when(col(typeCol) === s, lit(i + 1))
    }
    // A null timestamp would sort first, be accepted as step 0 with
    // t0 = null, and poison every later `ts > null` comparison — the
    // user silently never converts while a min()-based replay skips
    // nulls. Exclude the row, keep the user's other events. A null
    // USER drops too: groupBy would meld every null-user event into
    // one phantom user that both converts (inflating step counts)
    // and inflates the share denominator.
    val perUser = df
      .where(col(typeCol).isin(steps: _*) && col(tsMsCol).isNotNull &&
        col(userCol).isNotNull)
      .select(
        col(userCol).as("__u"),
        col(tsMsCol).cast("long").as("__ts"),
        stepIdx.as("__i"))
      .groupBy(col("__u"))
      .agg(sort_array(collect_list(struct(col("__ts"), col("__i")))).as("__ev"))
      .select(
        aggregate(
          col("__ev"),
          struct(lit(0).as("r"), lit(0L).as("t")),
          (acc, e) =>
            when(
              e("__i") === acc("r") &&
                (acc("r") === 0 || e("__ts") > acc("t")),
              struct((acc("r") + 1).as("r"), e("__ts").as("t")))
              .otherwise(acc)).getField("r").as("__reached"))
    val aggs = count(lit(1)).as("__total") +:
      steps.indices.map(i =>
        coalesce(sum(when(col("__reached") >= i + 1, 1L).otherwise(0L)), lit(0L))
          .as(s"__c_$i"))
    perUser.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (name, i) =>
        struct(
          lit(i).as("step_idx"),
          lit(name).as("step"),
          col(s"__c_$i").as("n_users"),
          round(when(col("__total") > 0,
            col(s"__c_$i") / col("__total").cast("double")), 6)
            .as("share"))
      }: _*)).as("f"))
      .select("f.*")
  }

  /** Funnel TIME-TO-CONVERT distribution — the question a conversion
    * count can't answer ("half convert inside an hour, the rest take
    * a week" vs "everyone takes three days" demand different product
    * responses): for each user who completes EVERY step of the
    * [[eventFunnel]] (same greedy earliest-transition semantics, so
    * the two reports cannot disagree about who converted), duration
    * = reach(last step) − reach(step 0), and the output is the exact
    * quantile report over those durations via
    * [[Profile.quantiles]].
    *
    * Scale shape: identical to [[eventFunnel]] (one user-keyed
    * shuffle of step-typed triples, row-local fold) plus one
    * quantile aggregation over the |converts| durations.
    *
    * @return one row per prob: (column = "duration_ms", prob,
    *         quantile 4 dp) — empty when nobody converts.
    */
  def timeToConvert(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      typeCol: String,
      steps: Seq[String],
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): DataFrame = {
    require(steps.size >= 2, "time-to-convert needs at least 2 steps")
    require(steps.distinct == steps, "steps must be distinct")
    val stepIdx = steps.tail.zipWithIndex.foldLeft(
      when(col(typeCol) === steps.head, lit(0))) { case (acc, (s, i)) =>
      acc.when(col(typeCol) === s, lit(i + 1))
    }
    // Same null-timestamp and null-user exclusion as eventFunnel
    // (see there): a null __ts would enter the fold as step 0 and
    // nullify every later comparison; a null user is a phantom
    // converter.
    val durations = df
      .where(col(typeCol).isin(steps: _*) && col(tsMsCol).isNotNull &&
        col(userCol).isNotNull)
      .select(
        col(userCol).as("__u"),
        col(tsMsCol).cast("long").as("__ts"),
        stepIdx.as("__i"))
      .groupBy(col("__u"))
      .agg(sort_array(collect_list(struct(col("__ts"), col("__i")))).as("__ev"))
      .select(
        aggregate(
          col("__ev"),
          struct(lit(0).as("r"), lit(0L).as("t"), lit(0L).as("t0")),
          (acc, e) =>
            when(
              e("__i") === acc("r") &&
                (acc("r") === 0 || e("__ts") > acc("t")),
              struct((acc("r") + 1).as("r"), e("__ts").as("t"),
                when(acc("r") === 0, e("__ts")).otherwise(acc("t0")).as("t0")))
              .otherwise(acc)).as("__f"))
      .where(col("__f.r") === steps.size)
      .select((col("__f.t") - col("__f.t0")).as("duration_ms"))
    Profile.quantiles(durations, Seq("duration_ms"), probs)
  }

  /** Per-group [[eventFunnel]]: the same strict ordered-step funnel
    * computed for every segment (the "which cohort converts where"
    * view — typically composed with a broadcast dim join that tags
    * each event with its user's segment). The group is assumed
    * constant per user (a user attribute); it rides the user-keyed
    * shuffle as part of the key, so the plan shape is identical to
    * the global funnel plus one bounded grouped aggregation. Shares
    * are per group.
    *
    * @return groups × steps rows: (group, step_idx, step, n_users,
    *         share — of the GROUP's users with any step-typed event,
    *         6 dp).
    */
  def eventFunnelByGroup(
      df: DataFrame,
      groupCol: String,
      userCol: String,
      tsMsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "no steps given")
    require(steps.distinct == steps, "steps must be distinct")
    val stepIdx = steps.tail.zipWithIndex.foldLeft(
      when(col(typeCol) === steps.head, lit(0))) { case (acc, (s, i)) =>
      acc.when(col(typeCol) === s, lit(i + 1))
    }
    // same exclusions as eventFunnel: null ts poisons the fold,
    // null user melds into a phantom per-group converter
    val perUser = df
      .where(col(typeCol).isin(steps: _*) && col(tsMsCol).isNotNull &&
        col(userCol).isNotNull)
      .select(
        col(groupCol),
        col(userCol).as("__u"),
        col(tsMsCol).cast("long").as("__ts"),
        stepIdx.as("__i"))
      .groupBy(col(groupCol), col("__u"))
      .agg(sort_array(collect_list(struct(col("__ts"), col("__i")))).as("__ev"))
      .select(
        col(groupCol),
        aggregate(
          col("__ev"),
          struct(lit(0).as("r"), lit(0L).as("t")),
          (acc, e) =>
            when(
              e("__i") === acc("r") &&
                (acc("r") === 0 || e("__ts") > acc("t")),
              struct((acc("r") + 1).as("r"), e("__ts").as("t")))
              .otherwise(acc)).getField("r").as("__reached"))
    val aggs = count(lit(1)).as("__total") +:
      steps.indices.map(i =>
        coalesce(sum(when(col("__reached") >= i + 1, 1L).otherwise(0L)), lit(0L))
          .as(s"__c_$i"))
    perUser.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol),
        explode(array(steps.zipWithIndex.map { case (name, i) =>
          struct(
            lit(i).as("step_idx"),
            lit(name).as("step"),
            col(s"__c_$i").as("n_users"),
            round(when(col("__total") > 0,
              col(s"__c_$i") / col("__total").cast("double")), 6)
              .as("share"))
        }: _*)).as("f"))
      .select(col(groupCol), col("f.*"))
  }

  /** Cohort retention: users are cohorted by the epoch-aligned
    * period (`periodDays`, default weekly) of their FIRST activity,
    * and each (cohort, offset) cell counts the cohort's users active
    * `offset` periods later. Periods are pure integer arithmetic on
    * the epoch-millisecond column (floor `ts_ms // periodMs`, see
    * [[floorDivMs]]) — no calendar functions, so both engines bucket
    * identically, pre-1970 timestamps included.
    *
    * Scale shape: the corpus collapses to the DISTINCT
    * (user, period) activity set in the first exchange (map-side
    * partial dedup); everything after is bounded by users × periods,
    * and the final retention join is against the ≤|cohorts| offset-0
    * row set, broadcast. The cohort min rides the same user-keyed
    * partitioning as the distinct.
    *
    * @return (cohort_period — epoch period index BIGINT,
    *         period_offset 0..maxOffset, n_users, retention — share
    *         of the cohort's offset-0 users, 6 dp; offset 0 is 1.0
    *         by construction).
    */
  def retentionCohorts(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      maxOffset: Int = 8,
      periodDays: Int = 7): DataFrame = {
    require(maxOffset >= 0, "maxOffset must be non-negative")
    require(periodDays > 0, "periodDays must be positive")
    val periodMs = periodDays.toLong * 86400000L
    val act = df
      .select(
        col(userCol).as("__u"),
        floorDivMs(tsMsCol, periodMs).as("__p"))
      .distinct()
    val cohort = act.groupBy(col("__u")).agg(min(col("__p")).as("__c"))
    val cells = act.join(cohort, "__u")
      .select(
        col("__c").as("cohort_period"),
        (col("__p") - col("__c")).cast("int").as("period_offset"))
      .where(col("period_offset") <= maxOffset)
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
      .localCheckpoint()
    val base = cells.where(col("period_offset") === 0)
      .select(col("cohort_period"), col("n_users").as("__base"))
    cells.join(broadcast(base), "cohort_period")
      .select(
        col("cohort_period"),
        col("period_offset"),
        col("n_users"),
        round(col("n_users") / col("__base").cast("double"), 6)
          .as("retention"))
  }

  /** Markov transition matrix of the event stream: counts and
    * row-normalized probabilities of (previous type → type) within
    * each user's time-ordered stream — the "what do users do next"
    * view, and the input to funnel-step selection. One user-keyed
    * window (per-user sort bounded by events-per-user, never a
    * global sort) feeds one bounded grouped aggregation (output =
    * |types|²). `tieCol` breaks equal-timestamp order
    * deterministically (an event id); without a total order the lag
    * pairs would be partition-dependent.
    *
    * @return (from_type, to_type, n_transitions, prob — share of
    *         from_type's outgoing transitions, 6 dp).
    */
  def transitionMatrix(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsMsCol).asc, col(tieCol).asc)
    // null user would chain every null-user event into one phantom
    // sequence; null ts/tie make lag() order nondeterministic; a
    // null type is not a state — all four drop.
    val withPrev = df
      .where(col(userCol).isNotNull && col(tsMsCol).isNotNull &&
        col(typeCol).isNotNull && col(tieCol).isNotNull)
      .select(col(userCol), col(tsMsCol), col(tieCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    withPrev
      .withColumn("prob",
        round(col("n_transitions") /
          sum(col("n_transitions")).over(totals).cast("double"), 6))
  }

  /** Tumbling-window rollup: fixed-width aggregate buckets over the
    * epoch-millisecond column (`widthMs` FLOOR-divides the epoch via
    * [[floorDivMs]], so windows are engine-portable — negative
    * epochs included — and never overlap). The
    * per-window measures are one map-side-combined aggregation over
    * one scan; output is |windows| rows. The value sums ride an
    * exact DECIMAL(18,6) accumulator (order-independent — double
    * sums drift with partitioning), then convert once for the 4 dp
    * report.
    *
    * Rows with a null timestamp drop (they have no window); null
    * values count in n_events but not the sums; null users count in
    * n_events but not n_users (count_distinct skips them).
    *
    * @return (window_start_ms, n_events, n_users — distinct users in
    *         the window, sum_value/avg_value over `valueCol` 4 dp).
    */
  def tumblingRollup(
      df: DataFrame,
      tsMsCol: String,
      valueCol: String,
      userCol: String,
      widthMs: Long): DataFrame = {
    require(widthMs > 0, "widthMs must be positive")
    // a null timestamp has no window: the row would otherwise land
    // in a phantom NULL-bucket output row
    df.where(col(tsMsCol).isNotNull)
      .groupBy(
        (floorDivMs(tsMsCol, widthMs) * widthMs).as("window_start_ms"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col(userCol)).as("n_users"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__sv"),
        count(col(valueCol)).as("__nv"))
      .select(
        col("window_start_ms"), col("n_events"), col("n_users"),
        round(col("__sv").cast("double"), 4).as("sum_value"),
        round(col("__sv").cast("double") / col("__nv"), 4).as("avg_value"))
  }

  /** Hopping (sliding) window rollup: the overlapping-window twin of
    * [[tumblingRollup]] — every event lands in the `widthMs/slideMs`
    * windows covering it, so the rollup smooths bucket-boundary
    * artifacts a tumbling report shows (`widthMs` must be an integer
    * multiple of `slideMs`; equal width/slide degenerates to
    * tumbling). The covering window starts for an event are
    * `(ts floordiv slide − i) · slide, i ∈ [0, k)` — with FLOOR
    * division ([[floorDivMs]]) all k candidates lie in
    * `(ts − width, ts]` exactly for any sign of ts, so the explode
    * is a closed form with no range filter, engine-portable.
    *
    * Cost shape: ONE scan, a bounded k-way row multiplication
    * (`posexplode` of the offset array, k = width/slide is a small
    * constant), then the same single map-side-combined aggregation
    * as tumbling — no window function, no self-join, |windows| output
    * rows. Value sums ride the exact DECIMAL(18,6) accumulator.
    *
    * Null handling mirrors [[tumblingRollup]]: null-timestamp rows
    * drop, null values/users skip the sum/distinct.
    *
    * @return (window_start_ms, n_events, n_users, sum_value/avg_value
    *         4 dp) — one row per (window, data present).
    */
  def hoppingRollup(
      df: DataFrame,
      tsMsCol: String,
      valueCol: String,
      userCol: String,
      widthMs: Long,
      slideMs: Long): DataFrame = {
    require(slideMs > 0 && widthMs > 0, "width/slide must be positive")
    require(widthMs % slideMs == 0, "widthMs must be a multiple of slideMs")
    val k = widthMs / slideMs
    // null timestamps drop (no window), as in tumblingRollup
    df.where(col(tsMsCol).isNotNull)
      .select(col(tsMsCol), col(valueCol), col(userCol),
        explode(sequence(lit(0L), lit(k - 1))).as("__i"))
      .groupBy(
        ((floorDivMs(tsMsCol, slideMs) - col("__i"))
          * slideMs).as("window_start_ms"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col(userCol)).as("n_users"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__sv"),
        count(col(valueCol)).as("__nv"))
      .select(
        col("window_start_ms"), col("n_events"), col("n_users"),
        round(col("__sv").cast("double"), 4).as("sum_value"),
        round(col("__sv").cast("double") / col("__nv"), 4).as("avg_value"))
  }

  /** Per-key time-series gap fill with forward fill: bucket each
    * key's events into `stepMs` windows, materialize EVERY bucket in
    * the key's own [min, max] span (a dashboard/model-feature series
    * must show the silent days, not skip them), and carry the last
    * observed value into the gaps.
    *
    * Scale shape: the bucket rollup map-side-combines to one row per
    * (key, bucket); the spine is a closed-form `sequence` explode
    * bounded by span/step (never a calendar-table join); the fill is
    * one window per key over the ALREADY-AGGREGATED series — the
    * raw event volume never enters the window. Everything downstream
    * of the first aggregation is |keys × buckets|-sized, independent
    * of corpus row count. Value sums ride the exact DECIMAL(18,6)
    * accumulator (order-independent), rounded once at the edge.
    *
    * Forward fill is total: a key's first bucket is by construction
    * observed, so `value_filled` is never null.
    *
    * @return (keyCol, bucket_ms, value_filled, is_gap) — one row per
    *         key per step in the key's observed span.
    */
  /** Top event-type paths: each user's time-ordered event stream is
    * decomposed into its length-`n` sliding type sequences
    * ("view>click>purchase"), counted globally, top `topK` returned —
    * the sequence-mining report behind "what do users actually do
    * before converting?" (the n-gram special case of PrefixSpan-style
    * mining, which is what production funnels use).
    *
    * Scale shape: one window per user over (ts, type) — the stream is
    * consumed ONCE; the path count map-side-combines; the global
    * top-k ranks the DISTINCT path set (≤ |types|ⁿ, a small constant,
    * never corpus-sized). Ordering ties (same user, same timestamp)
    * break on the type string, so the paths are deterministic.
    *
    * @return (path, n, rank) — topK rows, rank 1-based by
    *         (count desc, path).
    */
  def topPaths(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      typeCol: String,
      n: Int = 3,
      topK: Int = 20): DataFrame = {
    require(n >= 2, "paths need at least 2 steps")
    // topK bounds the final single-partition rank frame: the
    // row_number() <= topK filter compiles to WindowGroupLimit, so
    // each task pre-prunes to topK paths before the shuffle — the
    // one sorted partition sees at most topK rows per upstream task.
    // The cap turns that documented bound into a checked one.
    require(topK >= 1 && topK <= 100000,
      s"topK must be in [1, 100000] (a top-paths REPORT, not a path dump), got $topK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsMsCol), col("__s0"))
    // null user melds unrelated events into one phantom path chain;
    // null ts makes lead() order nondeterministic; null types cannot
    // be path elements (the __s-not-null gate below would drop the
    // WINDOW rows but the null would still shift every lead()).
    val clean = df.where(col(userCol).isNotNull && col(tsMsCol).isNotNull &&
      col(typeCol).isNotNull)
    val steps = (1 until n).foldLeft(
      clean.select(col(userCol), col(tsMsCol), col(typeCol).as("__s0"))) {
      case (acc, i) => acc.withColumn(s"__s$i", lead(col("__s0"), i).over(w))
    }
    val counted = steps
      .where((0 until n).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .select(concat_ws(">", (0 until n).map(i => col(s"__s$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("path"))
    counted
      .withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= topK)
  }

  /** Rolling z-score anomaly flags over each key's gap-filled series:
    * [[gapFill]] first (so silent buckets participate — a crashed
    * pipeline's zero-filled day IS the anomaly), then each bucket's
    * value is scored against the TRAILING `trailing`-bucket window
    * (strictly before the current bucket — the score never sees the
    * value it judges). Mean/stddev come from exact DECIMAL window
    * sums of the 4 dp-rounded filled values, combined in double with
    * one rounding per output (6 dp moments, 4 dp z) — every boundary
    * compare is on identically-rounded values, engine-replayable.
    *
    * Scale shape: everything downstream of gapFill's first
    * aggregation is |keys × buckets|-sized; the two window passes
    * share one (key, bucket) sort.
    *
    * Null-timestamp rows drop (no bucket); a NULL key is a real
    * series (slice contract, inherited from [[gapFill]]).
    *
    * @return (keyCol, bucket_ms, value_filled, zscore, is_anomaly) —
    *         zscore null until a full trailing window with nonzero
    *         spread exists; is_anomaly = zscore > `z`.
    */
  def anomalies(
      df: DataFrame,
      tsMsCol: String,
      keyCol: String,
      valueCol: String,
      stepMs: Long,
      trailing: Int = 7,
      z: Double = 3.0,
      maxBuckets: Long = 10L * 1000 * 1000): DataFrame = {
    require(trailing >= 2, "trailing window must hold at least 2 buckets")
    val filled = gapFill(df, tsMsCol, keyCol, valueCol, stepMs, maxBuckets)
    val dec = col("value_filled").cast("decimal(18,4)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("bucket_ms"))
      .rowsBetween(-trailing, -1)
    val scored = filled
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sv", sum(dec).over(w))
      .withColumn("__sq", sum(dec * dec).over(w))
      .withColumn("__mean", round(col("__sv").cast("double") / col("__n"), 6))
      .withColumn("__sd", round(sqrt(greatest(lit(0.0),
        col("__sq").cast("double") / col("__n") - col("__mean") * col("__mean"))), 6))
      .withColumn("zscore",
        when(col("__n") >= trailing && col("__sd") > 0,
          round(abs(col("value_filled") - col("__mean")) / col("__sd"), 4)))
    scored.select(
      col(keyCol), col("bucket_ms"), col("value_filled"),
      col("zscore"),
      coalesce(col("zscore") > z, lit(false)).as("is_anomaly"))
  }

  /** Time-WEIGHTED average per key over irregularly sampled
    * observations — the "average price / sensor reading / queue
    * depth" where a plain mean over-weights bursts (ten readings in
    * one busy second must not outvote one reading that held for an
    * hour): each observation is weighted by how long it HELD (until
    * the key's next observation; the last observation holds zero by
    * the standard convention), so
    * twap = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first).
    *
    * Determinism: `tieCols` must make (ts, ties…) unique per key
    * (§4 window discipline — same-ms observations need a
    * deterministic order for their zero/nonzero hold assignment);
    * the weighted sum accumulates exact DECIMAL (value 6 dp ×
    * integer ms), ONE double division at the boundary. Null values
    * and null timestamps are dropped; a NULL key is a real series
    * (slice contract — it aggregates alone, like any other key). A
    * single-observation key (zero span) yields null twap.
    *
    * Scale shape: one (key, ts) window pass + one map-side-combined
    * grouped aggregation — bounded output, one row per key.
    */
  def twap(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      valueCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy((col(tsMsCol) +: tieCols.map(col)).map(_.asc): _*)
    df.where(col(valueCol).isNotNull && col(tsMsCol).isNotNull)
      .withColumn("__dt",
        coalesce(lead(col(tsMsCol).cast("long"), 1).over(w), col(tsMsCol).cast("long"))
          - col(tsMsCol).cast("long"))
      .groupBy(col(keyCol))
      .agg(
        min(col(tsMsCol).cast("long")).as("t_first"),
        max(col(tsMsCol).cast("long")).as("t_last"),
        count(lit(1)).as("n_obs"),
        sum(col(valueCol).cast("decimal(18,6)") * col("__dt")).as("__wv"))
      .select(col(keyCol), col("t_first"), col("t_last"), col("n_obs"),
        round(when(col("t_last") > col("t_first"),
          col("__wv").cast("double") / (col("t_last") - col("t_first"))), 6)
          .as("twap"))
  }

  /** Per-session engagement stats over inactivity-gap sessionization
    * — the report behind bounce rate / session duration dashboards,
    * sharing row 9's session rule (a session breaks when the gap
    * between consecutive events exceeds `gapMinutes`) so the two
    * surfaces can never disagree about what a session is.
    *
    * Determinism without a tiebreak column: same-timestamp events
    * always share a session (gap 0 can't break), so the frame first
    * collapses to distinct (user, ts) with counts — the session
    * window then orders by a UNIQUE key per user, and the per-session
    * stats (min/max/sum) are order-independent.
    *
    * Scale shape: one (user, ts) pre-aggregation with map-side
    * combine, one user-keyed window over the collapsed frame, one
    * grouped aggregation — all far smaller than the raw event scan.
    *
    * @return one row per session: (userCol, session_id
    *         "<user>#<n>", start_ms, end_ms, duration_ms, n_events,
    *         is_bounce = single-event session).
    */
  def sessionStats(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes >= 1, "gapMinutes must be positive")
    val gapMs = gapMinutes * 60000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("__ts"))
    val byTs = df
      .where(col(userCol).isNotNull && col(tsMsCol).isNotNull)
      .groupBy(col(userCol), col(tsMsCol).cast("long").as("__ts"))
      .agg(count(lit(1)).as("__n"))
    val prev = lag(col("__ts"), 1).over(w)
    byTs
      .withColumn("__start",
        (prev.isNull || (col("__ts") - prev > gapMs)).cast("long"))
      .withColumn("__sess", sum(col("__start")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("__sess"))
      .agg(
        min(col("__ts")).as("start_ms"),
        max(col("__ts")).as("end_ms"),
        sum(col("__n")).as("n_events"))
      .select(
        col(userCol),
        concat(col(userCol).cast("string"), lit("#"),
          col("__sess").cast("string")).as("session_id"),
        col("start_ms"), col("end_ms"),
        (col("end_ms") - col("start_ms")).as("duration_ms"),
        col("n_events"),
        (col("n_events") === 1).as("is_bounce"))
  }

  /** Exponentially-weighted moving average over each key's ordered
    * series — the standard trend-smoothing signal (the pandas
    * `ewm(adjust=True)` convention, truncated to a bounded window):
    * ewma_t = Σᵢ (1−α)^age·x / Σᵢ (1−α)^age over the trailing
    * `window` observations, so early rows normalize over what exists
    * instead of decaying toward a fake zero history.
    *
    * Determinism/replay contract: the weighted sums are SEQUENTIAL
    * left folds over the frame-ordered value list — both engines add
    * the same doubles in the same order, so no decimal staging is
    * needed; weights come from `pow(1−α, age)`, which is
    * bit-identical across engines when 1−α is dyadic (0.5, 0.75,
    * 0.25 — the recommended decays) and window ≤ 33 (3^age fits the
    * mantissa); ONE rounding at the output. `orderCols` must be a
    * unique key per partition (SURVEY §4 window discipline). Rows
    * with null `valueCol` are dropped (mirror of collect_list's null
    * skip — a silent weight misalignment otherwise); a NULL key is a
    * real series (slice contract).
    *
    * Scale shape: one window pass per key (the same (key, order)
    * sort every rolling signal pays); the fold is row-local over a
    * ≤ `window`-element list.
    */
  def withEwma(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double,
      window: Int = 20,
      outCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    require(window >= 1 && window <= 33,
      s"window must be in [1, 33] (dyadic-decay weights stay exact), got $window")
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), 0)
    val valsCol = graft.Cols.unique("__ewma_vals", df)
    val decay = lit(1.0 - alpha)
    val d = df
      .where(col(valueCol).isNotNull)
      .withColumn(valsCol, collect_list(col(valueCol).cast("double")).over(w))
    val n = size(col(valsCol))
    val terms = transform(col(valsCol),
      (v, i) => v * pow(decay, (n - lit(1) - i).cast("double")))
    val wts = transform(col(valsCol),
      (v, i) => pow(decay, (n - lit(1) - i).cast("double")))
    d.withColumn(outCol, round(
        aggregate(terms, lit(0.0), (a, b) => a + b) /
          aggregate(wts, lit(0.0), (a, b) => a + b), 6))
      .drop(valsCol)
  }

  def gapFill(
      df: DataFrame,
      tsMsCol: String,
      keyCol: String,
      valueCol: String,
      stepMs: Long,
      maxBuckets: Long = 10L * 1000 * 1000): DataFrame = {
    require(stepMs > 0, "stepMs must be positive")
    require(maxBuckets >= 1, "maxBuckets must be positive")
    // Spine discipline: a key's [min, max] bucket span is data-driven,
    // so a naive per-key `sequence` is an unbounded array in ONE row
    // (3 years at stepMs=1000 ≈ 95M elements → executor OOM, not a
    // slowdown). Two defenses, both in-plan so they hold per key at
    // runtime: (1) spans over `maxBuckets` raise a clear error from
    // the tiny per-key min/max agg — the caller coarsens stepMs or
    // raises the cap deliberately; (2) the spine explodes in two
    // levels (coarse 4096-bucket blocks, then ≤4096 fine buckets per
    // block), so no single row ever materializes more than
    // max(maxBuckets/4096, 4096) elements.
    val blk = 4096L
    val daily = df
      .groupBy(col(keyCol), floorDivMs(tsMsCol, stepMs).as("__d"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__sv"))
    // Floor-divide a (possibly negative) bucket id by blk: subtract
    // pmod first so the division is exact and truncation == floor.
    val floorBlk = (c: Column) => ((c - pmod(c, lit(blk))) / lit(blk)).cast("long")
    val spine = daily
      .groupBy(col(keyCol))
      .agg(min(col("__d")).as("__mn"), max(col("__d")).as("__mx"))
      .withColumn("__mn",
        when(col("__mx") - col("__mn") >= maxBuckets,
          raise_error(format_string(
            s"gapFill: a '$keyCol' key spans %s buckets at stepMs=$stepMs, over " +
              s"maxBuckets=$maxBuckets - coarsen stepMs or raise maxBuckets explicitly",
            col("__mx") - col("__mn") + lit(1L))).cast("long"))
          .otherwise(col("__mn")))
      .select(col(keyCol), col("__mn"), col("__mx"),
        explode(sequence(floorBlk(col("__mn")), floorBlk(col("__mx")))).as("__b"))
      .select(col(keyCol),
        explode(sequence(
          greatest(col("__mn"), col("__b") * lit(blk)),
          least(col("__mx"), (col("__b") + lit(1L)) * lit(blk) - lit(1L)))).as("__d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__d"))
      .rowsBetween(Long.MinValue, 0)
    // null-safe on the key: a NULL-key series is a real series (its
    // spine and daily sums both exist) — a plain equality join would
    // silently null out every one of its buckets
    spine.join(
        daily.withColumnRenamed(keyCol, "__gf_k")
          .withColumnRenamed("__d", "__gf_d"),
        col(keyCol) <=> col("__gf_k") && col("__d") === col("__gf_d"),
        "left")
      .drop("__gf_k", "__gf_d")
      .select(
        col(keyCol),
        (col("__d") * stepMs).as("bucket_ms"),
        round(last(col("__sv"), ignoreNulls = true).over(w).cast("double"), 4)
          .as("value_filled"),
        col("__sv").isNull.as("is_gap"))
  }

  /** DAU/MAU stickiness — the product-analytics engagement ratio
    * ("what fraction of the month's actives show up on a given
    * day"): per UTC calendar day, exact distinct actives; per
    * calendar month, exact distinct actives; stickiness = dau/mau.
    * Output bounded by the day count. The exact distincts are the
    * report contract (this is a bounded-bucket daily report, not a
    * per-key corpus scan); at sketch scale the row-153 KMV /
    * approx_count_distinct twins stand in.
    */
  def dauMau(df: DataFrame, tsMsCol: String, userCol: String): DataFrame = {
    val withDay = df
      .where(col(tsMsCol).isNotNull && col(userCol).isNotNull)
      .select(
        to_date(timestamp_millis(col(tsMsCol))).as("day"),
        trunc(to_date(timestamp_millis(col(tsMsCol))), "month").as("month"),
        col(userCol).as("__u"))
    val dau = withDay.groupBy(col("day"), col("month"))
      .agg(countDistinct(col("__u")).as("dau"))
    val mau = withDay.groupBy(col("month"))
      .agg(countDistinct(col("__u")).as("mau"))
    dau.join(mau, Seq("month"))
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
  }

  /** Kaplan–Meier survival curve (Kaplan & Meier 1958) — "what
    * fraction of users/documents/crawl sources survives past
    * duration t", with CENSORING done right: a subject still alive
    * at observation end contributes to the risk sets it was observed
    * through but is never counted as an event (naively dropping
    * censored rows biases survival down; counting them as events
    * biases it further).
    *
    * Input: one row per subject — (duration bucket ≥ 0, event flag:
    * true = the event happened at that duration, false = censored
    * there). Output: one row per OBSERVED duration (bounded by the
    * horizon, e.g. ≤ 365 day buckets) — (t, n_at_risk, n_events,
    * n_censored, hazard 6 dp, survival 6 dp).
    *
    * Scale shape: ONE map-side-combined groupBy collapses the
    * subject table to the bounded per-duration frame; everything
    * after (risk-set suffix counts, the cumulative-hazard prefix)
    * is windows over that bounded frame — the documented
    * single-partition-on-bounded-data exception (§5), same as the
    * funnel/topPaths report frames. Determinism: the hazard is
    * EXACT integer micro-units (half-away-from-zero of d·10⁶/n — a
    * double round hits true half-boundaries whenever n divides
    * 2·10⁶ but not 10⁶), survival = exp of the DECIMAL(18,6) prefix
    * sum of 6 dp-rounded ln(1−h) terms, one exp at the output
    * boundary; a hazard of exactly 1 zeroes survival from that
    * duration on (ln would be −∞).
    */
  def survivalCurve(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      maxDurations: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxDurations >= 1, "maxDurations must be positive")
    val byT = df
      .where(col(durationCol).isNotNull && col(durationCol) >= 0)
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        count(lit(1)).as("__n"),
        sum(when(col(eventCol), 1L).otherwise(0L)).as("n_events"))
    val ord = Window.orderBy(col("t"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val prefix = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byT
      // The single-partition windows below are the documented
      // bounded-report exception (§5): the frame is one row per
      // OBSERVED duration. That bound was a contract, not a check —
      // enforce it in-plan, fused into the `all` window the risk-set
      // total already pays for (zero extra shuffle): a duration
      // cardinality over `maxDurations` (raw event timestamps passed
      // as durations, say) errors instead of sorting an unbounded
      // frame on one task.
      .withColumn("n_at_risk",
        when(count(lit(1)).over(all) > maxDurations,
          raise_error(lit(s"survivalCurve: more than $maxDurations distinct " +
            "durations - bucket durations coarser (days, not ms) or raise " +
            "maxDurations explicitly")).cast("long"))
          .otherwise(
            sum(col("__n")).over(all) - coalesce(sum(col("__n")).over(before), lit(0L))))
      // exact micro-unit hazard: half-away-from-zero of d·10⁶ / n
      .withColumn("__h6",
        expr("(n_events * 2000000 + n_at_risk) div (n_at_risk * 2)"))
      .withColumn("hazard", col("__h6").cast("double") / lit(1e6))
      .withColumn("__ln",
        when(col("__h6") < 1000000L, round(log(lit(1.0) - col("hazard")), 6)))
      .withColumn("__dead",
        max(when(col("__h6") >= 1000000L, 1).otherwise(0)).over(prefix))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0)).otherwise(
          round(exp(sum(col("__ln").cast("decimal(18,6)")).over(prefix)
            .cast("double")), 6)))
      .select(col("t"), col("n_at_risk"), col("n_events"),
        (col("__n") - col("n_events")).as("n_censored"),
        col("hazard"), col("survival"))
  }

  /** Per-interval OHLC summary — open/high/low/close of a value
    * stream per (key, tumbling window): the standard compaction for
    * telemetry/metric streams (and prices) that keeps the shape a
    * dashboard needs at 1/1000th the rows. Open/close are
    * earliest/latest BY TIME, not min/max — `min_by`/`max_by` over
    * the (ts, ties…) struct gives the deterministic argmin/argmax
    * both engines share (§4 unique-order discipline: pass `tieCols`
    * when timestamps can collide).
    *
    * One map-side-combined groupBy — no window function at all.
    * Null ts/value rows drop; a NULL key is a real series (slice
    * contract).
    *
    * @return (keyCol, bucket_ms, n_obs, open, high, low, close).
    */
  def ohlc(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      valueCol: String,
      windowMs: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(windowMs >= 1, "windowMs must be positive")
    val ms = col(tsMsCol)
    val bucket = (ms - pmod(ms, lit(windowMs)))
    val ord = struct(col(tsMsCol) +: tieCols.map(col): _*)
    df.where(ms.isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), bucket.cast("long").as("bucket_ms"))
      .agg(
        count(lit(1)).as("n_obs"),
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"))
  }

  /** Longest active-day streak per key — the classic gaps-and-islands
    * engagement metric ("42-day streak") behind habit features and
    * churn-risk flags. Distinct active days collapse first (one
    * grouped dedup — the window never sees raw events), then island
    * id = day − row_number is constant exactly within a consecutive
    * run, and one more grouped count takes each key's longest and
    * current-best run. Pure epoch-day integers ([[activityHeatmap]]
    * arithmetic) — no calendar library.
    *
    * @return one row per key: (keyCol, n_active_days, longest_streak,
    *         longest_streak_start_day — epoch days, earliest such
    *         streak on ties).
    */
  def activeStreaks(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String): DataFrame = {
    val ms = col(tsMsCol)
    val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L)).cast("long")
    val days = df
      .where(col(keyCol).isNotNull && ms.isNotNull)
      .select(col(keyCol), day.as("__d"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__d"))
    val runs = days
      .withColumn("__isl", col("__d") - row_number().over(w))
      .groupBy(col(keyCol), col("__isl"))
      .agg(count(lit(1)).as("__len"), min(col("__d")).as("__start"))
    runs
      .groupBy(col(keyCol))
      .agg(
        sum(col("__len")).as("n_active_days"),
        max(col("__len")).as("longest_streak"),
        min_by(col("__start"), struct((lit(0) - col("__len")).as("l"),
          col("__start").as("s"))).as("longest_streak_start_day"))
  }

  /** Sliding-window rate-limit audit — "which keys would a limit of
    * `maxEvents` per `windowMs` have throttled, and how hard?": for
    * every event, the count of the key's events in the trailing
    * (t − windowMs, t] RANGE window; an event whose trailing count
    * exceeds the limit is a violation. The abuse-triage twin of
    * [[interArrival]] — cadence says "bot-shaped", this says "over
    * the contract, here's when".
    *
    * One per-key RANGE window pass (ties inside a millisecond share
    * the frame by RANGE semantics — deterministic without a tie
    * column) + one map-side-combined per-key rollup. Null key/ts
    * rows drop.
    *
    * @return one row per key with ≥ 1 event: (keyCol, n_events,
    *         n_violations, max_in_window, first_violation_ms —
    *         null when the key never violates).
    */
  def rateLimitAudit(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      maxEvents: Int,
      windowMs: Long): DataFrame = {
    require(maxEvents >= 1, "maxEvents must be positive")
    require(windowMs >= 1, "windowMs must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsMsCol))
      .rangeBetween(-(windowMs - 1), 0)
    df.where(col(keyCol).isNotNull && col(tsMsCol).isNotNull)
      .withColumn("__in_w", count(lit(1)).over(w))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        coalesce(sum(when(col("__in_w") > maxEvents, 1L)), lit(0L))
          .as("n_violations"),
        max(col("__in_w")).as("max_in_window"),
        min(when(col("__in_w") > maxEvents, col(tsMsCol)))
          .as("first_violation_ms"))
  }

  /** Day-of-week × hour activity heatmap — the seasonality readout
    * behind load shaping, crawl scheduling and bot-vs-human triage
    * (humans show a diurnal/weekly grid; farms run flat). Pure
    * integer epoch arithmetic on UTC millis — NO timezone/calendar
    * library: day index = floorDiv(ms, 86400000), dow =
    * floorMod(day + 4, 7) (1970-01-01 was a Thursday; 0 = Sunday),
    * hour = floorMod(floorDiv(ms, 3600000), 24) — so both engines
    * replay every cell from arithmetic alone. One map-side-combined
    * groupBy, output bounded at 168 rows (+ share of total, 6 dp).
    *
    * @return (dow 0–6 Sun-based, hour 0–23, n_events, share 6 dp).
    */
  def activityHeatmap(
      df: DataFrame,
      tsMsCol: String): DataFrame = {
    val ms = col(tsMsCol)
    // floorDiv(x, d) = (x − pmod(x, d))/d — the numerator is an exact
    // multiple below 2⁵³, so the double division is exact
    def floorDiv(x: org.apache.spark.sql.Column, d: Long) =
      ((x - pmod(x, lit(d))) / lit(d)).cast("long")
    val dow = pmod(floorDiv(ms, 86400000L) + lit(4), lit(7))
    val hour = pmod(floorDiv(ms, 3600000L), lit(24))
    // ≤ 168-row grid, staged so the share total derives from it
    // without re-running the input scan
    val counted = df
      .where(ms.isNotNull)
      .groupBy(dow.cast("int").as("dow"), hour.cast("int").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint()
    counted
      .crossJoin(broadcast(counted.agg(sum(col("n_events")).as("__t"))))
      .select(col("dow"), col("hour"), col("n_events"),
        round(col("n_events").cast("double") / col("__t"), 6).as("share"))
  }

  /** Per-key inter-arrival gap profile — the cadence question behind
    * rate limits, bot detection and churn models ("does this user
    * fire every 200 ms or once a week?"): consecutive-event gaps in
    * the (ts, ties…) order, summarized per key as count / min /
    * median / p90 / max. A bot reads a near-degenerate gap
    * distribution (median ≈ min); a human reads orders-of-magnitude
    * spread.
    *
    * One per-key ROWS window pass for the lag gaps (unique order per
    * the §4 tie discipline — pass `tieCols` when timestamps can
    * collide) + one map-side-combined aggregation with exact
    * percentiles (6 dp at the boundary). Single-event keys report
    * n_gaps = 0 with null gap stats. Null timestamps drop.
    *
    * @return one row per key: (keyCol, n_events, n_gaps, min_gap,
    *         median_gap 6 dp, p90_gap 6 dp, max_gap).
    */
  def interArrival(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsMsCol).asc +: tieCols.map(col(_).asc): _*)
    df.where(col(keyCol).isNotNull && col(tsMsCol).isNotNull)
      .withColumn("__gap", col(tsMsCol) - lag(col(tsMsCol), 1).over(w))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("__gap")).as("n_gaps"),
        min(col("__gap")).as("min_gap"),
        round(percentile(col("__gap"), lit(0.5)), 6).as("median_gap"),
        round(percentile(col("__gap"), lit(0.9)), 6).as("p90_gap"),
        max(col("__gap")).as("max_gap"))
  }

  /** Sweep-line interval concurrency — "how many shipments are in
    * transit / sessions open / GPUs leased at once", the capacity
    * question behind rate limits and shard sizing. Each interval
    * [start, end) melts into a +1/−1 boundary delta (closed-open: a
    * unit ending exactly when another starts never double-counts);
    * deltas aggregate per (group, boundary) — the frame is bounded by
    * DISTINCT boundary values, not rows — and a running sum turns
    * them into the concurrency level holding from each boundary until
    * the next.
    *
    * Scale shape: one union + one map-side-combined groupBy; the
    * running sum is the [[Cumulative.withCumulativeSum]] distributed
    * prefix sum when ungrouped, or a per-group RANGE window over the
    * aggregated boundary frame when grouped (bounded by time
    * granularity × groups, never by input rows). Null start/end rows
    * drop (open-ended intervals are a different question); an
    * inverted interval (end < start) raises in-plan — silent
    * tolerance would corrupt every level after it.
    *
    * @return (groupCols…, t, concurrent) — one row per distinct
    *         boundary instant per group; `concurrent` is the level in
    *         [t, next boundary).
    */
  def concurrency(
      df: DataFrame,
      startCol: String,
      endCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val base = df.where(col(startCol).isNotNull && col(endCol).isNotNull)
    val open = when(col(endCol) < col(startCol),
      raise_error(lit(s"concurrency: interval with $endCol < $startCol - " +
        "fix or filter inverted intervals")).cast("int"))
      .otherwise(lit(1))
    val g = groupCols.map(col)
    val deltas = base
      .select(g :+ col(startCol).as("t") :+ open.as("__delta"): _*)
      .unionByName(base
        .select(g :+ col(endCol).as("t") :+ lit(-1).as("__delta"): _*))
    val agg = deltas
      .groupBy(g :+ col("t"): _*)
      .agg(sum(col("__delta")).as("__d"))
    if (groupCols.isEmpty)
      Cumulative.withCumulativeSum(agg, col("__d"), col("t"), "concurrent")
        .withColumn("concurrent", col("concurrent").cast("long"))
        .drop("__d")
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(g: _*).orderBy(col("t"))
        .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      agg.withColumn("concurrent", sum(col("__d")).over(w).cast("long"))
        .drop("__d")
    }
  }

  /** CUSUM change-point detection (Page 1954) — the SMALL-SHIFT
    * complement of [[anomalies]]' z-score flags: a z-score catches
    * one big spike, CUSUM accumulates many small deviations until a
    * sustained LEVEL SHIFT (a new crawl source degrading quality, a
    * metric drifting 2% per day) crosses the decision interval.
    * Standard two-sided form: S⁺_t = max(0, S⁺_{t−1} + (x_t − target
    * − slack)), S⁻ the mirror; alarm when either exceeds `h`.
    *
    * Distributed shape: the recursive max-reset folds into prefix
    * algebra — S⁺_t = P_t − min(0, min_{j≤t} P_j) with P the running
    * sum of (x − target − slack) — so both sides come from ONE
    * per-key window sort (two running sums + two running mins over
    * the same ordering), never a sequential fold. Deviations round
    * 6 dp into exact DECIMAL so every prefix is order-independent
    * and replayable; |value| bounded by the DECIMAL(18,6) cast (the
    * regressionStats contract). Null values drop; a NULL key is a
    * real series (slice contract).
    *
    * @param orderCols a TOTAL order within the key (add a unique id
    *                  to break timestamp ties — the [[withEwma]]
    *                  convention).
    * @return input + (cusum_hi 6 dp, cusum_lo 6 dp, alarm).
    */
  def cusum(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      target: Double,
      slack: Double,
      h: Double): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(h > 0, s"h must be positive, got $h")
    val x = col(valueCol).cast("double")
    val dUp = round(x - target - slack, 6).cast("decimal(18,6)")
    val dDn = round(-(x - target) - slack, 6).cast("decimal(18,6)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val base = df.where(col(valueCol).isNotNull)
      .withColumn("__pu", sum(dUp).over(w))
      .withColumn("__pd", sum(dDn).over(w))
      .withColumn("__mu", least(lit(0).cast("decimal(18,6)"), min(col("__pu")).over(w)))
      .withColumn("__md", least(lit(0).cast("decimal(18,6)"), min(col("__pd")).over(w)))
    val hDec = lit(BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .cast("decimal(18,6)")
    base
      // the alarm compares in exact DECIMAL; the reported levels
      // convert ONCE at the output boundary (wide decimals
      // materialize asymmetrically across parquet readers — the
      // round-12 rollup lesson)
      .withColumn("alarm",
        col("__pu") - col("__mu") > hDec || col("__pd") - col("__md") > hDec)
      .withColumn("cusum_hi",
        round((col("__pu") - col("__mu")).cast("double"), 6))
      .withColumn("cusum_lo",
        round((col("__pd") - col("__md")).cast("double"), 6))
      .drop("__pu", "__pd", "__mu", "__md")
  }

  /** Item co-occurrence / association rules (support, confidence,
    * lift) — the market-basket view of an event log: "users who did A
    * also did B" for cross-sell, feature-adoption funnels, and
    * co-usage diagnostics. One row per ORDERED pair (a → b):
    * support = n_ab/N, confidence = n_ab/n_a, lift =
    * n_ab·N/(n_a·n_b) (> 1 means A users do B more than base rate).
    *
    * Scale shape: one distinct-items-per-basket aggregation
    * (collect_set — bounded by ITEM CARDINALITY, the categorical
    * contract; the item column is a type/category, never a free
    * string), then pairs by double explode of the bounded set — the
    * §5 bucket-grouped pattern, never a corpus self-join — and one
    * map-side-combined pair count. All outputs are exact-integer
    * ratios rounded 6 dp. Null baskets/items drop.
    *
    * @return (item_a, item_b, n_a, n_b, n_ab, support 6 dp,
    *         confidence 6 dp — P(b|a), lift 6 dp).
    */
  def coOccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String): DataFrame = {
    val baskets = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(basketCol))
      .agg(collect_set(col(itemCol)).as("__items"))
      .localCheckpoint() // one basket scan feeds totals, items, pairs
    val tot = baskets.agg(count(lit(1)).as("__nb"))
    val itemN = baskets
      .select(explode(col("__items")).as("__i"))
      .groupBy(col("__i"))
      .agg(count(lit(1)).as("__ni"))
    val pairN = baskets
      .select(explode(col("__items")).as("__a"), col("__items"))
      .select(col("__a"), explode(col("__items")).as("__b"))
      .where(col("__a") =!= col("__b"))
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("n_ab"))
    pairN
      .join(broadcast(itemN.select(col("__i").as("__a"), col("__ni").as("n_a"))),
        Seq("__a"))
      .join(broadcast(itemN.select(col("__i").as("__b"), col("__ni").as("n_b"))),
        Seq("__b"))
      .crossJoin(broadcast(tot))
      .select(
        col("__a").as("item_a"), col("__b").as("item_b"),
        col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("__nb"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        round(col("n_ab").cast("double") * col("__nb") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
  }

  /** Multi-touch attribution credits — "which channel gets credit
    * for each conversion": every conversion event looks back over the
    * user's touch events inside `(t_conv − windowMs, t_conv]` and
    * distributes one unit of credit by `model`:
    * `"linear"` — 1/n to each of its n in-window touches (the
    * position-agnostic default), `"first"` — all credit to the
    * earliest touch, `"last"` — all credit to the latest (the
    * marketing default). Conversions with NO in-window touch receive
    * no row (organic conversions are a different report — count them
    * as total conversions − Σ n_conversions).
    *
    * Scale shape — SWEEP, never a product: the naïve form is a
    * per-user range join whose candidate volume is touches ×
    * conversions inside the window, QUADRATIC in a single user's
    * event rate (a power user holding 10% of sf1 contributes ~80M
    * joined rows in one task; round-15 SkewProbe measured the join
    * form at 2.5× under that skew, and the exponent only grows with
    * scale). This implementation never materializes the product:
    *  - '''linear''' needs only the per-(conversion, channel)
    *    IN-WINDOW COUNT, which an interval sweep reads off a running
    *    prefix count: union each channel's touches (+1 each) with
    *    two zero-weight probes per conversion (at t_c and t_c −
    *    window), one (user, channel)-partitioned ordered window sum,
    *    then n_ch = cnt(t_c) − cnt(t_c − window). Rows: touches +
    *    2·|convs|·|channels| — linear in the user's rate.
    *  - '''first'''/'''last''' need one argmin/argmax touch per
    *    conversion: a running `last_value(ignoreNulls)` over the
    *    (user)-partitioned time order gives the latest touch ≤ t_c
    *    (validity: tt > t_c − window); the same sweep over the
    *    REVERSED order anchored at t_c − window gives the earliest
    *    in-window touch (validity: tt ≤ t_c). Rows: touches + convs.
    * Credits stay DECIMAL-exact and bit-identical to the join form:
    * linear multiplies the exact per-touch unit round(1/n, 10) —
    * decimal(11,10) — by the integer n_ch (product decimal(31,10),
    * exact; equal to summing n_ch per-touch copies); one 4 dp
    * boundary.
    *
    * @param idCol a UNIQUE event id — the tie-break that makes
    *              first/last deterministic under equal timestamps
    *              and the conversion identity for n_conversions.
    * @return one row per touch channel: (channel, n_conversions —
    *         distinct conversions the channel got any credit for,
    *         credit 4 dp — Σ of this channel's credit units).
    */
  def attributionCredits(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      idCol: String,
      typeCol: String,
      touchTypes: Seq[String],
      conversionType: String,
      windowMs: Long,
      model: String = "linear"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(Seq("linear", "first", "last").contains(model),
      s"model must be linear, first or last, got $model")
    require(touchTypes.nonEmpty, "no touch types given")
    require(!touchTypes.contains(conversionType),
      "the conversion type cannot also be a touch type")
    require(windowMs >= 1, "windowMs must be positive")
    // idCol is the conversion identity AND the first/last tie-break:
    // a null id would collapse every null-id conversion of a user
    // into one (__u, null) window partition (inflating __n) while
    // countDistinct silently excluded it — drop it like the other
    // two key columns instead of skewing both numbers.
    val base = df.where(col(userCol).isNotNull && col(tsMsCol).isNotNull &&
      col(idCol).isNotNull)
    val touches = base
      .where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(tsMsCol).cast("long").as("__tt"),
        col(idCol).as("__tid"), col(typeCol).as("channel"))
    val convs = base
      .where(col(typeCol) === conversionType)
      .select(col(userCol).as("__u"), col(tsMsCol).cast("long").as("__tc"),
        col(idCol).as("__cid"))
    val idType = base.schema(idCol).dataType

    def channelReport(credited: DataFrame): DataFrame = credited
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_conversions"),
        round(sum(col("__credit")).cast("double"), 4).as("credit"))

    if (model == "linear") {
      // counts sweep per (user, channel): touches carry +1; each
      // conversion plants two zero-weight probes whose running count
      // reads "touches with tt <= t". Tie order at equal t: touches
      // (k=0) before probes (k=1), so t_c is inclusive and the
      // t_c − window probe counts (and thereby excludes) touches AT
      // the window-open instant — exactly tt > t_c − windowMs.
      // Probes contribute 0, so order among equal keys cannot change
      // any probe's count.
      val chans = array(touchTypes.map(lit): _*)
      val touchRows = touches.select(
        col("__u"), col("channel"), col("__tt").as("__t"),
        lit(0).as("__k"), lit(1L).as("__c"),
        lit(null).cast(idType).as("__cid"), lit(0).as("__sgn"))
      val probeRows = convs
        .select(col("__u"), explode(chans).as("channel"),
          col("__tc"), col("__cid"))
        .select(col("__u"), col("channel"),
          explode(array(
            struct(col("__tc").as("__t"), lit(1).as("__sgn")),
            struct((col("__tc") - windowMs).as("__t"),
              lit(-1).as("__sgn")))).as("__p"),
          col("__cid"))
        .select(col("__u"), col("channel"), col("__p.__t").as("__t"),
          lit(1).as("__k"), lit(0L).as("__c"), col("__cid"),
          col("__p.__sgn").as("__sgn"))
      val wCnt = Window.partitionBy(col("__u"), col("channel"))
        .orderBy(col("__t").asc, col("__k").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perConvChannel = touchRows.unionByName(probeRows)
        .withColumn("__cnt", sum(col("__c")).over(wCnt))
        .where(col("__k") === 1)
        .groupBy(col("__cid"), col("channel"))
        .agg(sum(col("__sgn") * col("__cnt")).as("__nch"))
      val wConv = Window.partitionBy(col("__cid"))
      channelReport(perConvChannel
        .withColumn("__n", sum(col("__nch")).over(wConv))
        .where(col("__nch") > 0)
        // decimal(11,10) unit × decimal(19,0) count = decimal(31,10),
        // exact — identical to summing __nch per-touch copies of the
        // join form's round(1/n, 10) credit
        .withColumn("__credit",
          col("__nch").cast("decimal(19,0)") *
            round(lit(1.0) / col("__n"), 10).cast("decimal(11,10)")))
    } else {
      // argmin/argmax sweep per user: one running last_value over the
      // merged (touch, probe) time order. For `last` the probe sits
      // at t_c AFTER equal-t touches (inclusive upper bound); for
      // `first` the order reverses and the probe sits at
      // t_c − window BEFORE equal-t touches (exclusive lower bound).
      val touchRows = touches.select(
        col("__u"), col("__tt").as("__t"), lit(0).as("__k"),
        col("__tid"), col("channel"),
        lit(null).cast(idType).as("__cid"),
        lit(null).cast("long").as("__tc"))
      val (probeT, order, valid) = model match {
        case "last" => (
          col("__tc"),
          Seq(col("__t").asc, col("__k").asc, col("__tid").asc),
          (cand: Column, tc: Column) => cand("tt") > tc - windowMs)
        case "first" => (
          col("__tc") - windowMs,
          Seq(col("__t").desc, col("__k").desc, col("__tid").desc),
          (cand: Column, tc: Column) => cand("tt") <= tc)
      }
      // probe __k = 1 under BOTH orders: `last` sorts k ASC (equal-t
      // touches before the probe — t_c inclusive), `first` sorts k
      // DESC (the probe before equal-t touches — touches AT
      // t_c − window stay invisible, the strict lower bound)
      val probeRows = convs.select(
        col("__u"), probeT.as("__t"), lit(1).as("__k"),
        lit(null).cast(idType).as("__tid"),
        lit(null).cast("string").as("channel"),
        col("__cid"), col("__tc"))
      val wCand = Window.partitionBy(col("__u"))
        .orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cand = last(
        when(col("__k") === 0,
          struct(col("__t").as("tt"), col("__tid"), col("channel"))),
        ignoreNulls = true).over(wCand)
      channelReport(touchRows.unionByName(probeRows)
        .withColumn("__cand", cand)
        .where(col("__k") =!= 0 && col("__cand").isNotNull &&
          valid(col("__cand"), col("__tc")))
        .select(col("__cid"), col("__cand.channel").as("channel"),
          lit(1).cast("decimal(28,10)").as("__credit")))
    }
  }

  /** Per-group peak of [[concurrency]]: (groupCols…, peak,
    * peak_at = the EARLIEST boundary reaching it). Bounded output
    * (one row per group); two passes over the already-bounded
    * boundary frame.
    */
  def peakConcurrency(
      df: DataFrame,
      startCol: String,
      endCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    // the boundary frame is bounded by distinct instants; staging it
    // guarantees the corpus-sized melt/aggregate pipeline runs ONCE
    // for the peaks aggregate and the join probe
    val tl = concurrency(df, startCol, endCol, groupCols).localCheckpoint()
    val g = groupCols.map(col)
    val peaks =
      if (groupCols.isEmpty) tl.agg(max(col("concurrent")).as("peak"))
      else tl.groupBy(g: _*).agg(max(col("concurrent")).as("peak"))
    val joined =
      if (groupCols.isEmpty) tl.crossJoin(broadcast(peaks))
      else {
        // Null-safe (<=>) probe join: concurrency() emits null group
        // keys as real groups, and a plain equi-join would silently
        // drop them from the peak report.
        val pk = groupCols.foldLeft(peaks)(
          (d, c) => d.withColumnRenamed(c, "__pk_" + c))
        tl.join(pk, groupCols.map(c => col(c) <=> col("__pk_" + c))
            .reduce(_ && _))
          .drop(groupCols.map("__pk_" + _): _*)
      }
    joined
      .where(col("concurrent") === col("peak"))
      .groupBy(g :+ col("peak"): _*)
      .agg(min(col("t")).as("peak_at"))
      .select(g ++ Seq(col("peak"), col("peak_at")): _*)
  }

  /** RFM segmentation — the classic user-value triage (recency of
    * last activity, frequency of events, monetary value) with each
    * dimension scored 1..`buckets` by its own corpus quantiles, the
    * standard marketing-segmentation input and a fine per-user
    * quality prior for sampling weights.
    *
    * Scale shape: ONE grouped pass collapses events to the per-user
    * (recency, frequency, monetary) triple (map-side combined;
    * monetary sums ride exact DECIMAL); the 3×(buckets−1) quantile
    * edges come from one bounded aggregation over that frame and
    * broadcast back — never a global ntile window (a corpus-wide
    * sort at 100 TB). Bucketing is the [[graft.operators.Profile]]
    * psi convention: edges round 6 dp, assignment counts edges
    * STRICTLY below the value, so both engines bucket identically at
    * ulp-adjacent boundaries. Higher score = better: frequency and
    * monetary score bin+1; recency (smaller is fresher) scores
    * buckets−bin. Null users/timestamps drop; null values count into
    * frequency but not monetary.
    *
    * @param asOfMs the "now" anchor recency is measured from — a
    *               caller literal so reruns are reproducible.
    * @return one row per user: (userCol, recency_ms, frequency,
    *         monetary 6 dp, r_score, f_score, m_score, segment
    *         "RFM" digits).
    */
  def rfmSegments(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      valueCol: String,
      asOfMs: Long,
      buckets: Int = 5): DataFrame = {
    require(buckets >= 2 && buckets <= 10, "buckets must be in [2, 10]")
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val per = df
      .where(col(userCol).isNotNull && col(tsMsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(
        (lit(asOfMs) - max(col(tsMsCol).cast("long"))).as("recency_ms"),
        count(lit(1)).as("frequency"),
        round(coalesce(sum(round(col(valueCol), 6).cast("decimal(18,6)")),
          lit(0).cast("decimal(18,6)")).cast("double"), 6).as("monetary"))
      .localCheckpoint() // one event scan feeds the edges AND the scoring
    def edges(c: String) = (1 until buckets).map(i =>
      round(element_at(percentile(col(c).cast("double"),
        typedLit(probs)), i), 6).as(s"__e_${c}_$i"))
    val e = per.agg(
      (edges("recency_ms") ++ edges("frequency") ++ edges("monetary")).head,
      (edges("recency_ms") ++ edges("frequency") ++ edges("monetary")).tail: _*)
    def bin(c: String): Column = (1 until buckets)
      .map(i => when(col(c).cast("double") > col(s"__e_${c}_$i"), 1)
        .otherwise(0))
      .reduce(_ + _)
    per.crossJoin(broadcast(e))
      .withColumn("r_score", lit(buckets) - bin("recency_ms"))
      .withColumn("f_score", bin("frequency") + 1)
      .withColumn("m_score", bin("monetary") + 1)
      .select(col(userCol), col("recency_ms"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
  }

  /** Lead–lag cross-correlation of two event types' bucketed count
    * series — "do purchases follow clicks, and by how many days":
    * Pearson correlation of count_A[t] against count_B[t+lag] for
    * every lag in [−maxLag, +maxLag]. Positive-lag peaks mean A
    * leads B.
    *
    * Scale shape: the corpus collapses to per-bucket counts in ONE
    * map-side-combined aggregation; the dense spine (missing buckets
    * count 0 — a silent day is real data), the lag explode, and the
    * self-join are all over the bounded |buckets| frame, guarded by
    * `maxBuckets`. Counts are integers, so every moment sum is EXACT
    * (DECIMAL(38,0)) and the one double division per lag makes the
    * output partitioning-independent with no intermediate rounding.
    * Null timestamps drop. corr is null when either series is
    * constant over the overlap.
    *
    * @return one row per lag: (lag, n_buckets — overlap length,
    *         corr 6 dp).
    */
  def crossCorrelation(
      df: DataFrame,
      tsMsCol: String,
      typeCol: String,
      typeA: String,
      typeB: String,
      stepMs: Long,
      maxLag: Int,
      maxBuckets: Long = 1000000L): DataFrame = {
    require(stepMs > 0, "stepMs must be positive")
    require(maxLag >= 1, "maxLag must be positive")
    val counts = df
      .where(col(tsMsCol).isNotNull &&
        (col(typeCol) === typeA || col(typeCol) === typeB))
      .groupBy(floorDivMs(tsMsCol, stepMs).as("__b"))
      .agg(
        sum(when(col(typeCol) === typeA, 1L).otherwise(0L)).as("__na"),
        sum(when(col(typeCol) === typeB, 1L).otherwise(0L)).as("__nb"))
      .localCheckpoint() // bounded; feeds the spine bounds and both join sides
    val bounds = counts.agg(
      min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
    // the gapFill guard discipline: fold the cap check into a column
    // the plan NEEDS, so Catalyst cannot prune the raise_error away
    val spine = bounds
      .select(
        when(col("__hi") - col("__lo") + 1 > maxBuckets,
          raise_error(format_string(
            s"crossCorrelation: bucket spine spans %s buckets at " +
              s"stepMs=$stepMs, over maxBuckets=$maxBuckets - coarsen stepMs",
            col("__hi") - col("__lo") + lit(1L))).cast("long"))
          .otherwise(col("__lo")).as("__lo"),
        col("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__b"))
    val dense = spine.join(counts, Seq("__b"), "left")
      .select(col("__b"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
      .localCheckpoint() // bounded; reused as both sides of the lag join
    val x = dense.select(col("__b"), col("__na"),
      explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
    val y = dense.select(col("__b").as("__by"), col("__nb"))
    x.join(y, col("__by") === col("__b") + col("lag"))
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("__na").cast("decimal(38,0)")).as("__sx"),
        sum(col("__nb").cast("decimal(38,0)")).as("__sy"),
        sum((col("__na") * col("__nb")).cast("decimal(38,0)")).as("__sxy"),
        sum((col("__na") * col("__na")).cast("decimal(38,0)")).as("__sxx"),
        sum((col("__nb") * col("__nb")).cast("decimal(38,0)")).as("__syy"))
      .withColumn("__num", (col("n_buckets") * col("__sxy") -
        col("__sx") * col("__sy")).cast("double"))
      .withColumn("__dx", (col("n_buckets") * col("__sxx") -
        col("__sx") * col("__sx")).cast("double"))
      .withColumn("__dy", (col("n_buckets") * col("__syy") -
        col("__sy") * col("__sy")).cast("double"))
      .select(col("lag"), col("n_buckets"),
        round(when(col("__dx") > 0 && col("__dy") > 0,
          col("__num") / sqrt(col("__dx") * col("__dy"))), 6).as("corr"))
  }

  /** Theil–Sen robust trend — the slope estimate a single outlier
    * day cannot move (unlike [[graft.operators.TrendLine]]'s least
    * squares): median of all pairwise slopes over the bucketed
    * series, intercept = median(y − slope·x). The standard robust
    * "is this metric drifting" number for daily corpus health
    * series.
    *
    * Scale shape: the corpus collapses to per-bucket 6 dp sums in
    * ONE map-side-combined pass; the pair frame is |buckets|²/2 over
    * that BOUNDED series, guarded by `maxBuckets` (default 2000 →
    * ≤ 2M pair rows) — never a corpus self-join. Pair slopes round
    * 6 dp before the exact median, one 6 dp output rounding each.
    * Null timestamps drop; missing buckets are absent (not zero) —
    * gap-fill first if silence should count.
    *
    * @return one row: (n_buckets, n_pairs, slope 6 dp — per bucket
    *         step, intercept 6 dp).
    */
  def theilSenTrend(
      df: DataFrame,
      tsMsCol: String,
      valueCol: String,
      stepMs: Long,
      maxBuckets: Long = 2000L): DataFrame = {
    require(stepMs > 0, "stepMs must be positive")
    val series = df
      .where(col(tsMsCol).isNotNull)
      .groupBy(floorDivMs(tsMsCol, stepMs).as("__x"))
      .agg(round(coalesce(sum(round(col(valueCol), 6).cast("decimal(18,6)")),
        lit(0).cast("decimal(18,6)")).cast("double"), 6).as("__y"))
      .localCheckpoint() // bounded; feeds the guard, pairs and intercept
    // guard folded into the needed column (the gapFill discipline)
    val guard = series.agg(count(lit(1)).as("__nb"))
      .select(
        when(col("__nb") > maxBuckets,
          raise_error(format_string(
            s"theilSenTrend: series has %s buckets, over " +
              s"maxBuckets=$maxBuckets - coarsen stepMs",
            col("__nb"))).cast("long"))
          .otherwise(col("__nb")).as("__nb"))
    // The |buckets|²/2 pair join must TRANSITIVELY require the guard
    // (the crossCorrelation/gapFill shape): without the dependence,
    // Spark schedules the quadratic stages concurrently with the tiny
    // guard aggregate and an over-cap series burns the quadratic work
    // before the raise_error aborts. The always-true `__nb <=
    // maxBuckets` join term keeps `__nb` un-prunable, so the guard's
    // 1-row broadcast (which evaluates the cap check) gates the pair
    // stage.
    val a = series.crossJoin(broadcast(guard))
      .select(col("__x").as("__xi"), col("__y").as("__yi"), col("__nb"))
    val b = series.select(col("__x").as("__xj"), col("__y").as("__yj"))
    val slopes = a.join(b,
      col("__xj") > col("__xi") && col("__nb") <= lit(maxBuckets))
      .select(round((col("__yj") - col("__yi")) /
        (col("__xj") - col("__xi")).cast("double"), 6).as("__s"))
    val sl = slopes.agg(
      count(lit(1)).as("n_pairs"),
      round(percentile(col("__s"), lit(0.5)), 6).as("slope"))
    val ic = series.crossJoin(broadcast(sl.select(col("slope").as("__sl"))))
      .agg(round(percentile(
        col("__y") - col("__sl") * col("__x").cast("double"), lit(0.5)), 6)
        .as("intercept"))
    guard.select(col("__nb").as("n_buckets"))
      .crossJoin(broadcast(sl))
      .crossJoin(broadcast(ic))
      .select(col("n_buckets"), col("n_pairs"), col("slope"), col("intercept"))
  }
}
