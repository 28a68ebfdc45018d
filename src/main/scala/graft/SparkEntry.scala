package graft

import graft.functions.ColumnFunctions._
import graft.functions.TextFunctions._
import graft.implicits._
import graft.operators.{Cumulative, DataFrameOps, Dedup, Parallelism, Selection, Similarity, TrendLine}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 has a `queries` entry; every
  * SQL-expressible one has a bit-compatible DuckDB oracle in
  * `oracleSql`. Determinism rules (SURVEY.md §4): unique-key window
  * orders, md5-only hashing, doubles rounded at each query boundary.
  */
object SparkEntry {

  /** Read a test table. `events.ts` has changed physical type across
    * driver testdata generations, so normalize every shape to one
    * `ts_ms` epoch-millis column (matching DuckDB's `epoch_ms(ts)`):
    *  - nanos INT64 (no logical type) → read as long via
    *    `nanosAsLong`, floor-divide to millis;
    *  - micros `isAdjustedToUTC=false` → Spark `TIMESTAMP_NTZ`; the
    *    NTZ→LTZ cast is an identity epoch map because every session
    *    pins `spark.sql.session.timeZone=UTC` (Verify/Bench/specs),
    *    so `unix_millis(cast(..))` equals DuckDB's naive epoch;
    *  - tz-adjusted micros (tools/GenScale output) → plain
    *    `unix_millis(ts)`.
    */
  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/events.parquet")
      val tsMs = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
        case org.apache.spark.sql.types.TimestampNTZType =>
          expr("unix_millis(cast(ts as timestamp))")
        case _ => expr("unix_millis(ts)")
      }
      df.withColumn("ts_ms", tsMs)
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on sf=0.001: revenue per region — broadcast dim
    * joins, weighted avg discount, share-of-total percent.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        weightedAverage(col("l_discount"), col("l_quantity"), 4).as("wavg_discount"))
      .withColumn("revenue_pct", percent(col("revenue")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ pipelineQueries

  def oracleSql: Map[String, String] = coreOracle ++ pipelineOracle

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------- §2.1 column functions
    "q_percent" -> ((s, dir) => {
      // Scale-safe twin of ColumnFunctions.percent: broadcast total
      // instead of an empty-partition window (same values).
      Cumulative.withPercentOfTotal(
        t(s, dir, "nation")
          .groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("cnt")),
        col("cnt"), "pct")
    }),
    "q_median" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.ColumnFunctions.median(col("l_quantity")).as("med_qty"))
    }),
    "q_cumulative_sum" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_custkey"),
        round(
          cumulativeSum(col("o_totalprice"), col("o_orderkey"),
            partitionBy = Seq(col("o_custkey"))),
          2).as("cum_spend"))
    }),
    "q_cumulative_percent" -> ((s, dir) => {
      // Scale-safe twin of ColumnFunctions.cumulativePercent: range
      // prefix sum + broadcast total (same values, no global window).
      Cumulative.withCumulativePercent(
        t(s, dir, "customer")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("cnt")),
        col("cnt"), col("c_nationkey"), "cum_pct")
        .select(col("c_nationkey"), col("cnt"), col("cum_pct"))
    }),
    "q_bin" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(binCol(col("o_totalprice"), 1000).as("price_bin"))
        .agg(count(lit(1)).as("cnt"))
    }),
    "q_session_id" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        sessionId(col("user_id"), col("ts_ms"), 30).as("session_id"))
    }),
    "q_cond_count" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          condCount(col("l_quantity") > 25 && col("l_discount") > 0.05).as("n_hits"),
          count(lit(1)).as("n_rows"))
    }),
    "q_weighted_avg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(weightedAverage(col("l_extendedprice"), col("l_quantity"), 2).as("wavg_price"))
    }),
    "q_count_distinct_nulls" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("et", expr("nullif(event_type, 'error')"))
        .groupBy(expr("user_id % 10").as("user_bucket"))
        .agg(countDistinctWithNulls(col("et")).as("n_distinct"))
    }),
    "q_sum_columns" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        sumColumns(Seq(col("l_quantity"), col("l_tax"), col("l_discount"))).as("s3"))
    }),
    "q_array_contains_column" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(arrayContainsColumn(col("l_returnflag"), array(lit("A"), lit("F"))))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
    }),
    "q_str_array_to_array" -> ((s, dir) => {
      t(s, dir, "nation").select(
        col("n_nationkey"),
        explode(
          strArrayToArray(
            concat(lit("["), col("n_name"), lit(", "), reverse(col("n_name")), lit("]"))))
          .as("token"))
    }),
    "q_cube_percent" -> ((s, dir) => {
      // Scale-safe twin of ColumnFunctions.cubePercent: broadcast
      // leaf-level total instead of an empty-partition window.
      Cumulative.withCubePercent(
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(sum(col("o_totalprice")).as("rev")),
        col("rev"), Seq(col("o_orderstatus"), col("o_orderpriority")), "pct")
        .select(
          col("o_orderstatus"),
          col("o_orderpriority"),
          round(col("rev"), 2).as("rev_r"),
          col("pct"))
    }),
    "q_moving_avg" -> ((s, dir) => {
      // Scale-safe twin of ColumnFunctions.movingAverage: halo
      // exchange over range partitions (same values, no global sort).
      Cumulative.withMovingAverage(
        t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("date"))
          .agg(count(lit(1)).as("cnt")),
        col("cnt"), col("date"), "mavg7", 7, "center", 2)
        .select(col("date"), col("cnt"), col("mavg7"))
    }),
    // ------------------------------------------------- §2.1 text functions
    "q_number_normalizer" -> ((s, dir) => {
      // spread: translate-kernel chain over an unsplittable scan
      Parallelism.spread(t(s, dir, "orders")).select(
        col("o_orderkey"),
        numberNormalizer(persianNumber(col("o_orderkey"))).as("normal"))
    }),
    "q_persian_number" -> ((s, dir) => {
      Parallelism.spread(t(s, dir, "orders")).select(
        col("o_orderkey"),
        persianNumber(col("o_orderkey")).as("fa_num"))
    }),
    "q_text_cleaner" -> ((s, dir) => {
      // spread: per-row regex/translate kernels over an unsplittable
      // single-row-group scan would otherwise run on 1-2 cores
      Parallelism.spread(t(s, dir, "documents")).select(
        col("doc_id"),
        textCleaner(concat(col("text"), lit(" ۱۲۳!!abc❤"))).as("cleaned"))
    }),
    "q_jalali_date" -> ((s, dir) => {
      // Two-level aggregate: count per Gregorian date first (~2.4k
      // groups), THEN run the calendar conversion on the post-agg
      // cardinality — the expensive scalar runs 60× fewer times.
      t(s, dir, "orders")
        .groupBy(col("o_orderdate"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(jalaliDate(col("o_orderdate")).as("jdate"))
        .agg(sum(col("cnt")).as("cnt"))
    }),
    "q_jalali_inverse" -> ((s, dir) => {
      // Round trip against the oracle's FORWARD conversion: the
      // inverse must return exactly the Gregorian date each Jalali
      // string came from.
      t(s, dir, "orders")
        .select(to_date(col("o_orderdate")).as("gdate"))
        .distinct()
        .select(jalaliDate(col("gdate")).as("jdate"), col("gdate"))
        .withColumn("gdate", jalaliToGregorian(col("jdate")))
    }),
    // --------------------------------------------- §2.2 dataframe ops
    "q_is_null_or_in" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("et", expr("nullif(event_type, 'error')"))
        .where(col("et").isNullOrIn("click", "signup"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
    }),
    "q_unpivot" -> ((s, dir) => {
      val m = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_tax"), col("l_discount"))
      DataFrameOps
        .unpivot(m, Seq("l_quantity", "l_tax", "l_discount"), "measure", "value")
        .groupBy(col("measure"))
        .agg(round(sum(col("value")), 2).as("total"), count(lit(1)).as("cnt"))
    }),
    "q_union_all" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_totalprice").as("price"))
      val b = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      DataFrameOps.unionAll(Seq(a, b))
    }),
    "q_trend_line" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      TrendLine
        .addTrendLine(daily, Seq("cnt"), "date", predictionDay = 7, degree = 1)
        .select(col("date"), col("cnt"), round(col("cnt_trendline"), 2).as("trend"))
    }),
    "q_transpose" -> ((s, dir) => {
      // Output schema depends on data values in general, but here the
      // pivot keys are TPC-H region keys — static 0..4 at every SF —
      // so the oracle can pin the pivoted columns and full-hash check
      // (round-16 upgrade from rows-only).
      val byRegion = t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("n_regionkey"))
      DataFrameOps.transpose(byRegion, "n_regionkey")
    }))

  private def coreOracle: Map[String, String] = Map(
    "q_percent" ->
      """WITH g AS (SELECT n_regionkey, count(*) AS cnt FROM nation GROUP BY 1)
        |SELECT n_regionkey, cnt, round(100 * cnt / sum(cnt) OVER (), 2) AS pct FROM g""".stripMargin,
    "q_median" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_cumulative_sum" ->
      """SELECT o_orderkey, o_custkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
        |FROM orders""".stripMargin,
    "q_cumulative_percent" ->
      """WITH g AS (SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY 1)
        |SELECT c_nationkey, cnt,
        |  round(100 * sum(cnt) OVER (ORDER BY c_nationkey
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    / sum(cnt) OVER (), 2) AS cum_pct
        |FROM g""".stripMargin,
    "q_bin" ->
      """SELECT floor(o_totalprice / 1000) * 1000 AS price_bin, count(*) AS cnt
        |FROM orders GROUP BY 1""".stripMargin,
    "q_session_id" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
        |l AS (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS st FROM l)
        |SELECT event_id, user_id::VARCHAR || '#' ||
        |  (sum(st) OVER (PARTITION BY user_id ORDER BY ms
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::VARCHAR AS session_id
        |FROM f""".stripMargin,
    "q_cond_count" ->
      """SELECT l_linestatus,
        |  count(CASE WHEN l_quantity > 25 AND l_discount > 0.05 THEN TRUE END) AS n_hits,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_weighted_avg" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_count_distinct_nulls" ->
      """WITH e AS (SELECT user_id % 10 AS user_bucket,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et FROM events)
        |SELECT user_bucket,
        |  count(DISTINCT et) + count(DISTINCT CASE WHEN et IS NULL THEN TRUE END) AS n_distinct
        |FROM e GROUP BY 1""".stripMargin,
    "q_sum_columns" ->
      """SELECT l_orderkey, l_linenumber,
        |  0 + l_quantity + l_tax + l_discount AS s3
        |FROM lineitem""".stripMargin,
    "q_array_contains_column" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |WHERE l_returnflag IN ('A', 'F') GROUP BY 1""".stripMargin,
    "q_str_array_to_array" ->
      """SELECT n_nationkey,
        |  unnest(string_split(nullif(translate('[' || n_name || ', ' || reverse(n_name) || ']',
        |    '[]', ''), ''), ', ')) AS token
        |FROM nation""".stripMargin,
    "q_cube_percent" ->
      """WITH g AS (SELECT o_orderstatus, o_orderpriority, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority))
        |SELECT o_orderstatus, o_orderpriority, round(rev, 2) AS rev_r,
        |  round(100 * rev / sum(CASE WHEN o_orderstatus IS NOT NULL
        |    AND o_orderpriority IS NOT NULL THEN rev END) OVER (), 2) AS pct
        |FROM g""".stripMargin,
    "q_moving_avg" ->
      """WITH d AS (SELECT o_orderdate::DATE AS date, count(*) AS cnt FROM orders GROUP BY 1)
        |SELECT date, cnt, round(avg(cnt) OVER (ORDER BY date
        |  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 2) AS mavg7
        |FROM d""".stripMargin,
    "q_number_normalizer" ->
      """SELECT o_orderkey,
        |  translate(translate(translate(printf('%d', o_orderkey),
        |    '0123456789', '۰۱۲۳۴۵۶۷۸۹'),
        |    '٠١٢٣٤٥٦٧٨٩', '0123456789'),
        |    '۰۱۲۳۴۵۶۷۸۹', '0123456789') AS normal
        |FROM orders""".stripMargin,
    "q_persian_number" ->
      """SELECT o_orderkey,
        |  translate(printf('%d', o_orderkey), '0123456789', '۰۱۲۳۴۵۶۷۸۹') AS fa_num
        |FROM orders""".stripMargin,
    "q_text_cleaner" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    translate(translate(translate(text || ' ۱۲۳!!abc❤',
        |      '٠١٢٣٤٥٦٧٨٩', '0123456789'),
        |      '۰۱۲۳۴۵۶۷۸۹', '0123456789'),
        |      'كيأإؤةۀ', 'کیااوهه'),
        |    '[^a-zآ-یA-Z0-9 ]', ' ', 'g'), ' {2,}', ' ', 'g') AS cleaned
        |FROM documents""".stripMargin,
    "q_jalali_date" ->
      """WITH j AS (SELECT year(o_orderdate) - 1600 AS gy, dayofyear(o_orderdate) - 1 AS gdy FROM orders),
        |d AS (SELECT *, 365 * gy + floor((gy + 3) / 4) - floor((gy + 99) / 100)
        |  + floor((gy + 399) / 400) + gdy - 79 AS jdn0 FROM j),
        |e AS (SELECT *, floor(jdn0 / 12053) AS jnp, jdn0 % 12053 AS jdn1 FROM d),
        |f AS (SELECT *, 979 + 33 * jnp + 4 * floor(jdn1 / 1461) AS jy0, jdn1 % 1461 AS jdn2 FROM e),
        |g AS (SELECT *, CASE WHEN jdn2 >= 366 THEN jy0 + floor((jdn2 - 1) / 365) ELSE jy0 END AS jy,
        |  CASE WHEN jdn2 >= 366 THEN (jdn2 - 1) % 365 ELSE jdn2 END AS jdn FROM f),
        |h AS (SELECT *, CASE WHEN jdn < 31 THEN 1 WHEN jdn < 62 THEN 2 WHEN jdn < 93 THEN 3
        |  WHEN jdn < 124 THEN 4 WHEN jdn < 155 THEN 5 WHEN jdn < 186 THEN 6
        |  WHEN jdn < 216 THEN 7 WHEN jdn < 246 THEN 8 WHEN jdn < 276 THEN 9
        |  WHEN jdn < 306 THEN 10 WHEN jdn < 336 THEN 11 ELSE 12 END AS jm FROM g),
        |i AS (SELECT *, jdn - [0,31,62,93,124,155,186,216,246,276,306,336][jm] + 1 AS jd FROM h)
        |SELECT printf('%d-%02d-%02d', jy::BIGINT, jm::BIGINT, jd::BIGINT) AS jdate, count(*) AS cnt
        |FROM i GROUP BY 1""".stripMargin,
    // The oracle runs only the FORWARD conversion (carrying the source
    // date), so the compare proves the Spark inverse lands back on the
    // exact original date for every distinct order date.
    "q_jalali_inverse" ->
      """WITH dd AS (SELECT DISTINCT o_orderdate::DATE AS d FROM orders),
        |j AS (SELECT d, year(d) - 1600 AS gy, dayofyear(d) - 1 AS gdy FROM dd),
        |e AS (SELECT *, 365 * gy + floor((gy + 3) / 4) - floor((gy + 99) / 100)
        |  + floor((gy + 399) / 400) + gdy - 79 AS jdn0 FROM j),
        |f AS (SELECT *, floor(jdn0 / 12053) AS jnp, jdn0 % 12053 AS jdn1 FROM e),
        |g AS (SELECT *, 979 + 33 * jnp + 4 * floor(jdn1 / 1461) AS jy0, jdn1 % 1461 AS jdn2 FROM f),
        |h AS (SELECT *, CASE WHEN jdn2 >= 366 THEN jy0 + floor((jdn2 - 1) / 365) ELSE jy0 END AS jy,
        |  CASE WHEN jdn2 >= 366 THEN (jdn2 - 1) % 365 ELSE jdn2 END AS jdn FROM g),
        |i AS (SELECT *, CASE WHEN jdn < 31 THEN 1 WHEN jdn < 62 THEN 2 WHEN jdn < 93 THEN 3
        |  WHEN jdn < 124 THEN 4 WHEN jdn < 155 THEN 5 WHEN jdn < 186 THEN 6
        |  WHEN jdn < 216 THEN 7 WHEN jdn < 246 THEN 8 WHEN jdn < 276 THEN 9
        |  WHEN jdn < 306 THEN 10 WHEN jdn < 336 THEN 11 ELSE 12 END AS jm FROM h),
        |k AS (SELECT *, jdn - [0,31,62,93,124,155,186,216,246,276,306,336][jm] + 1 AS jd FROM i)
        |SELECT printf('%d-%02d-%02d', jy::BIGINT, jm::BIGINT, jd::BIGINT) AS jdate, d AS gdate
        |FROM k""".stripMargin,
    "q_is_null_or_in" ->
      """WITH e AS (SELECT event_type,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et FROM events)
        |SELECT event_type, count(*) AS cnt FROM e
        |WHERE et IS NULL OR et IN ('click', 'signup') GROUP BY 1""".stripMargin,
    "q_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
        |SELECT measure, round(sum(value), 2) AS total, count(*) AS cnt
        |FROM u WHERE value IS NOT NULL GROUP BY 1""".stripMargin,
    "q_union_all" ->
      """SELECT o_orderkey AS id, o_totalprice AS price, NULL::VARCHAR AS name FROM orders
        |UNION ALL
        |SELECT p_partkey, NULL::DOUBLE, p_name FROM part""".stripMargin,
    "q_trend_line" ->
      """WITH daily AS (SELECT o_orderdate::DATE AS date, count(*)::DOUBLE AS cnt FROM orders GROUP BY 1),
        |bounds AS (SELECT min(date) AS d0, max(date) AS d1 FROM daily),
        |fit AS (SELECT cnt AS y,
        |  date_diff('day', (SELECT d0 FROM bounds), date)::DOUBLE AS x FROM daily),
        |m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(x * x) AS sxx,
        |  sum(y) AS sy, sum(x * y) AS sxy FROM fit),
        |beta AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1,
        |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b0 FROM m),
        |spine AS (SELECT unnest(generate_series(d0, d1 + INTERVAL 7 DAY, INTERVAL 1 DAY))::DATE AS date FROM bounds)
        |SELECT s.date, d.cnt,
        |  round(b0 + b1 * date_diff('day', (SELECT d0 FROM bounds), s.date)::DOUBLE, 2) AS trend
        |FROM spine s LEFT JOIN daily d USING (date), beta""".stripMargin,
    // transpose's pivot keys are the TPC-H region keys (static 0..4 at
    // every SF), so the dynamic-schema operator replays as a pinned
    // pivot; every cell is stringified exactly as transpose does.
    "q_transpose" ->
      """WITH g AS (SELECT n_regionkey, count(*) AS cnt FROM nation GROUP BY 1)
        |SELECT 'cnt' AS "index",
        |  CAST(max(CASE WHEN n_regionkey = 0 THEN cnt END) AS VARCHAR) AS "0",
        |  CAST(max(CASE WHEN n_regionkey = 1 THEN cnt END) AS VARCHAR) AS "1",
        |  CAST(max(CASE WHEN n_regionkey = 2 THEN cnt END) AS VARCHAR) AS "2",
        |  CAST(max(CASE WHEN n_regionkey = 3 THEN cnt END) AS VARCHAR) AS "3",
        |  CAST(max(CASE WHEN n_regionkey = 4 THEN cnt END) AS VARCHAR) AS "4"
        |FROM g""".stripMargin)

  // ===================================================================
  // §2.3 LLM-pipeline operators: dedup, similarity, text, multimodal
  // ===================================================================

  /** Synthetic pairwise-preference judgments for the Preference keys:
    * item_a = the order's priority, item_b = a mod-keyed opponent
    * from the 5 TPC-H priorities, winner = lower priority digit wins
    * with a 1-in-4 upset and a 1-in-11 tie — deterministic, window-
    * free, and closed-form replayable.
    */
  private def prefJudgments(s: SparkSession, dir: String): DataFrame = {
    val pris = array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
      lit("4-NOT SPECIFIED"), lit("5-LOW"))
    val b = get(pris, pmod(col("o_orderkey"), lit(5)).cast("int"))
    val ra = substring(col("o_orderpriority"), 1, 1).cast("int")
    val rb = substring(b, 1, 1).cast("int")
    val upset = pmod(col("o_orderkey"), lit(4)) === 0
    val winner = when(pmod(col("o_orderkey"), lit(11)) === 0, lit("tie"))
      .when(ra < rb, when(upset, lit("b")).otherwise(lit("a")))
      .otherwise(when(upset, lit("a")).otherwise(lit("b")))
    t(s, dir, "orders")
      .select(col("o_orderpriority").as("item_a"), b.as("item_b"),
        winner.as("winner"))
      .where(col("item_a") =!= col("item_b"))
  }

  /** documents ∪ clones of every 100th doc (new ids) — guarantees the
    * near-dup operators have true positives to find on synthetic data.
    */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.unionByName(
      d.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
  }

  /** Build (or reuse) a per-(session, corpus) signature table for the
    * verify/bench board. The table name hashes the corpus dir; the
    * FULL dir is recorded as a table property and validated on reuse,
    * so a hashCode collision or a renamed warehouse can never hand a
    * query stale signatures — on mismatch the table is rebuilt from
    * the current corpus.
    */
  private def ensureSigTable(
      s: SparkSession,
      dir: String,
      prefix: String,
      corpus: => DataFrame,
      alwaysRebuild: Boolean = false): String = {
    val table = prefix + java.lang.Integer.toHexString(dir.hashCode)
    val srcKey = "graft.verify.srcDir"
    val current = !alwaysRebuild && s.catalog.tableExists(table) &&
      s.sql(s"SHOW TBLPROPERTIES `$table`").collect()
        .exists(r => r.getString(0) == srcKey && r.getString(1) == dir)
    if (!current) {
      Dedup.writeMinHashSignatures(corpus, "text", "doc_id", table,
        shingleK = 5, numHashes = 8, bands = 2)
      s.sql(s"ALTER TABLE `$table` SET TBLPROPERTIES ('$srcKey' = '$dir')")
    }
    table
  }

  /** Session-cached persisted PQ index over the dir's embeddings —
    * the [[ensureSigTable]] discipline: rebuilt only when the table
    * is absent or was built from a different sf dir.
    */
  private def ensurePqIndex(
      s: SparkSession,
      dir: String,
      prefix: String,
      corpus: => DataFrame): String = {
    val table = prefix + java.lang.Integer.toHexString(dir.hashCode)
    val srcKey = "graft.verify.srcDir"
    val current = s.catalog.tableExists(table) &&
      s.sql(s"SHOW TBLPROPERTIES `$table`").collect()
        .exists(r => r.getString(0) == srcKey && r.getString(1) == dir)
    if (!current) {
      graft.operators.Pq.writePqIndex(corpus, "embedding", "vec_id", table,
        dim = 64, m = 8, numCentroids = 64, fitSampleStride = 4)
      s.sql(s"ALTER TABLE `$table` SET TBLPROPERTIES ('$srcKey' = '$dir')")
    }
    table
  }

  private val docsWithDupsSql =
    """docs AS (SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 100 = 0)""".stripMargin

  private def embWithDups(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    e.select(col("vec_id"), col("embedding"))
      .unionByName(
        e.where(col("vec_id") % 100 === 0)
          .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
  }

  private val embWithDupsSql =
    """emb AS (SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id + 1000000, embedding
      |  FROM embeddings WHERE vec_id % 100 = 0)""".stripMargin

  // ---- DuckDB expression generators (mirror graft.functions exactly)

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE), (x, y) -> x + y)"

  private def normSql(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))"

  private def cosSql(a: String, b: String): String =
    s"(CASE WHEN ${normSql(a)} * ${normSql(b)} > 0 THEN ${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}) END)"

  private def l2Sql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE)), (x, y) -> x + y)"

  /** [[graft.operators.Pq]] replay, GENERATED from the same (m,
    * subDim, numCentroids) so the codebook fit (autoStride-bounded
    * stride init → argmin → 6 dp Lloyd means → argmin), the code
    * assignment, and the DECIMAL-summed ADC distances cannot drift
    * from the Spark side. The stride is the same scalar the Spark
    * side derives: ceil(non-null count / numCentroids) — integer
    * ceil-division equals autoStride's (n + k − 1) / k exactly.
    * Ends with `pqr` = (query_id, corpus_id, adist, rank).
    */
  private def pqCtes(
      m: Int, subDim: Int, numCentroids: Int, fitStride: Int = 1,
      corpusPred: String = "TRUE", qPred: String = "id < 5"): String =
    s"""sub AS (SELECT vec_id AS id, g.s::INT AS s,
       |  list_transform(embedding[(g.s*$subDim+1):((g.s+1)*$subDim)], x -> x::DOUBLE) AS v
       |  FROM embeddings, generate_series(0, ${m - 1}) AS g(s)
       |  WHERE embedding IS NOT NULL),
       |csub AS (SELECT * FROM sub WHERE $corpusPred),
       |st AS (SELECT CAST(ceil(count(*) / $numCentroids.0) AS BIGINT) AS stride
       |  FROM csub WHERE s = 0),
       |fsub AS (SELECT * FROM csub WHERE id % $fitStride = 0),
       |cen0 AS (SELECT s, id AS cid, v AS cv FROM csub, st WHERE id % stride = 0),
       |d1 AS (SELECT fsub.id, fsub.s, cen0.cid, round(${l2Sql("fsub.v", "cen0.cv")}, 6) AS d
       |  FROM fsub JOIN cen0 USING (s)),
       |a1 AS (SELECT id, s, cid FROM (SELECT id, s, cid,
       |    row_number() OVER (PARTITION BY id, s ORDER BY d, cid) AS rn FROM d1) WHERE rn = 1),
       |e1 AS (SELECT a1.s, a1.cid, g.i AS pos, fsub.v[g.i] AS x
       |  FROM a1 JOIN fsub USING (id, s), generate_series(1, $subDim) AS g(i)),
       |cm AS (SELECT s, cid, pos, round(avg(x), 6) AS mx FROM e1 GROUP BY 1, 2, 3),
       |cen1 AS (SELECT s, cid, list(mx ORDER BY pos) AS cv FROM cm GROUP BY 1, 2),
       |d2 AS (SELECT csub.id, csub.s, cen1.cid, round(${l2Sql("csub.v", "cen1.cv")}, 6) AS d
       |  FROM csub JOIN cen1 USING (s)),
       |codes AS (SELECT id, s, cid FROM (SELECT id, s, cid,
       |    row_number() OVER (PARTITION BY id, s ORDER BY d, cid) AS rn FROM d2) WHERE rn = 1),
       |qsub AS (SELECT id AS query_id, s, v FROM sub WHERE $qPred),
       |lut AS (SELECT q.query_id, c.s, c.cid, round(${l2Sql("q.v", "c.cv")}, 6)::DECIMAL(18,6) AS d
       |  FROM qsub q JOIN cen1 c ON q.s = c.s),
       |ad AS (SELECT l.query_id, codes.id AS corpus_id, (sum(l.d))::DOUBLE AS adist
       |  FROM codes JOIN lut l ON codes.s = l.s AND codes.cid = l.cid
       |  GROUP BY 1, 2),
       |pqr AS (SELECT query_id, corpus_id, adist,
       |  row_number() OVER (PARTITION BY query_id ORDER BY adist, corpus_id) AS rank FROM ad)""".stripMargin

  /** [[graft.operators.Profile.corrMatrix]] replay, GENERATED from
    * the same column list so the moment names and the
    * left-associative Pearson formula cannot drift from the Spark
    * side: exact DECIMAL(18,scale) sums, one double conversion per
    * moment, identical expression text per pair.
    */
  private def corrOracleSql(table: String, cs: Seq[String], scale: Int): String = {
    // DECIMAL(19,·): DuckDB only widens a decimal product when
    // p1+p2 ≤ 38 — 19+19 lands exactly on DECIMAL(38,2·scale),
    // matching Spark's auto-widened decimal(37,2·scale) values
    val sums = cs.zipWithIndex.map { case (c, i) =>
      s"sum($c::DECIMAL(19,$scale))::DOUBLE AS s$i" }
    val prods = for {
      (ci, i) <- cs.zipWithIndex
      (cj, j) <- cs.zipWithIndex if j >= i
    } yield s"sum($ci::DECIMAL(19,$scale) * $cj::DECIMAL(19,$scale))::DOUBLE AS p${i}_$j"
    val pairs = for {
      (ci, i) <- cs.zipWithIndex
      (cj, j) <- cs.zipWithIndex if j > i
    } yield {
      val den = s"sqrt((n * p${i}_$i - s$i * s$i) * (n * p${j}_$j - s$j * s$j))"
      s"SELECT '$ci' AS col_x, '$cj' AS col_y, n_rows, " +
        s"round(CASE WHEN $den > 0 THEN (n * p${i}_$j - s$i * s$j) / $den END, 6) AS pearson FROM m"
    }
    s"WITH m AS (SELECT count(*)::BIGINT AS n_rows, count(*)::DOUBLE AS n, " +
      (sums ++ prods).mkString(", ") +
      s" FROM $table WHERE ${cs.map(c => s"$c IS NOT NULL").mkString(" AND ")})\n" +
      pairs.mkString("\nUNION ALL ")
  }

  private def bucketSql(
      vecExpr: String, dim: Int, numPlanes: Int, planeOffset: Int = 0): String =
    graft.functions.VectorFunctions
      .planeSigns(dim, numPlanes, planeOffset)
      .zipWithIndex
      .map { case (signs, p) =>
        val litList = signs.map(s => s"$s.0").mkString("[", ", ", "]")
        s"(CASE WHEN ${dotSql(vecExpr, litList)} > 0 THEN ${1 << p} ELSE 0 END)"
      }
      .mkString("(", " + ", ")")

  /** Mirrors [[graft.functions.VectorFunctions.randomProject]]: each
    * component = left-to-right fold of vᵢ·(±1) (the same md5-parity
    * signs, baked as literals) times the single 1/√k multiply.
    */
  private def rpSql(vecExpr: String, dim: Int, outDim: Int): String = {
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    graft.functions.VectorFunctions.planeSigns(dim, outDim)
      .map { signs =>
        val litList = signs.map(s => s"$s.0").mkString("[", ", ", "]")
        s"${dotSql(vecExpr, litList)} * $inv"
      }.mkString("[", ", ", "]")
  }

  // Chunk minhash (mirrors Dedup.chunkMin): hash h of a shingle is
  // hex chars [4h+1, 4h+4] of its single md5.
  private def minhashSigSql(setExpr: String, numHashes: Int): String =
    (0 until numHashes)
      .map(h => s"list_min(list_transform($setExpr, x -> substr(md5(x), ${h * 4 + 1}, 4)))")
      .mkString("[", ", ", "]")

  // Mirrors Dedup.simHash: bit j of the bits-wide feature hash
  // (integer value of md5 hex chars 1..bits/4) lives in hex char
  // bits/4 - j/4, bit j%4.
  private def simhashSql(tkExpr: String, bits: Int): String =
    (0 until bits).map { j =>
      val nib = bits / 4 - j / 4
      val shift = j % 4
      s"(CASE WHEN list_sum(list_transform($tkExpr, t -> (((strpos('0123456789abcdef', substr(md5(t), $nib, 1)) - 1) >> $shift) & 1) * 2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def swListSql(lang: String): String =
    graft.functions.TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** Replay of [[graft.functions.TextAnalysis.languageIdScored]] (the
    * q_lang_id decision kernel + the 13-class smoothed posterior
    * confidence), optionally composed with the per-language tercile
    * bucket gate (bucketByGroupQuantiles, the q_ccnet_buckets shape).
    */
  private def langConfOracle(gate: Boolean): String = {
    val langs = graft.functions.StopwordHitsAll.Langs
    val scoreCols = langs.map(l =>
      s"  len(list_filter(tk, t -> list_contains(${swListSql(l)}, t))) AS s_$l")
      .mkString(",\n|")
    val gr = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val pick = langs.map(l => s"  WHEN s_$l = best THEN '$l'").mkString("\n|")
    val tot = langs.map(l => s"s_$l").mkString("kana + hangul + cjk + arab + ", " + ", "")
    val conf =
      s"""WITH s AS (SELECT doc_id,
         |  len(regexp_extract_all(text, '[\\x{3040}-\\x{30ff}]')) AS kana,
         |  len(regexp_extract_all(text, '[\\x{ac00}-\\x{d7af}\\x{1100}-\\x{11ff}]')) AS hangul,
         |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk,
         |  len(regexp_extract_all(text, '[\\x{0600}-\\x{06ff}]')) AS arab,
         |  regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM documents),
         |v AS (SELECT doc_id, kana, hangul, cjk, arab,
         |$scoreCols FROM s),
         |w AS (SELECT doc_id, kana, hangul, cjk, arab, ${langs.map(l => s"s_$l").mkString(", ")},
         |  $gr AS best, $tot AS tot FROM v),
         |c AS (SELECT doc_id,
         |  CASE WHEN kana > 0 THEN 'ja' WHEN hangul > 0 THEN 'ko'
         |    WHEN cjk > 0 THEN 'zh' WHEN arab > 0 THEN 'fa'
         |    WHEN best <= 0 THEN 'und'
         |$pick
         |    ELSE 'und' END AS lang_pred,
         |  round((CASE WHEN kana > 0 THEN kana WHEN hangul > 0 THEN hangul
         |    WHEN cjk > 0 THEN cjk WHEN arab > 0 THEN arab
         |    WHEN best <= 0 THEN 0 ELSE best END + 0.5) / (tot + 6.5), 6) AS lang_conf
         |  FROM w)""".stripMargin
    if (!gate) s"$conf\nSELECT doc_id, lang_pred, lang_conf FROM c"
    else
      s"""$conf,
         |thr AS (SELECT lang_pred,
         |  round(quantile_cont(lang_conf, 0.3333333333333333), 6) AS t1,
         |  round(quantile_cont(lang_conf, 0.6666666666666666), 6) AS t2
         |  FROM c GROUP BY 1)
         |SELECT c.doc_id, c.lang_pred, c.lang_conf,
         |  CASE WHEN c.lang_conf IS NULL THEN NULL
         |    WHEN c.lang_conf <= t1 THEN 'tail'
         |    WHEN c.lang_conf <= t2 THEN 'middle'
         |    ELSE 'head' END AS bucket
         |FROM c JOIN thr USING (lang_pred)""".stripMargin
  }

  /** Shared CTE chain ending in `mh(id_a, id_b, jac)` — the MinHash
    * LSH near-dup pairs over `docs` (mirrors Dedup.minHashLshPairs
    * with shingleK=5, numHashes=8, bands=2).
    */
  private lazy val minhashCtes: String = {
    val bands = 2
    val rows = 8 / bands
    val bandExprs = (0 until bands)
      .map(b => "md5(" + (0 until rows).map(r => s"sig[${b * rows + r + 1}]")
        .mkString(" || '|' || ") + ")")
      .mkString("[", ", ", "]")
    s"""$docsWithDupsSql,
       |sh AS (SELECT doc_id, CASE WHEN length(text) >= 5
       |  THEN list_distinct(list_transform(range(0, length(text) - 4), i -> substr(text, i + 1, 5)))
       |  ELSE [text] END AS s FROM docs),
       |sg AS (SELECT doc_id, s, ${minhashSigSql("s", 8)} AS sig FROM sh),
       |bd AS (SELECT doc_id, $bandExprs AS bands FROM sg),
       |ex AS (${(0 until bands).map(b => s"SELECT doc_id, $b AS bpos, bands[${b + 1}] AS bkey FROM bd").mkString(" UNION ALL ")}),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM ex a
       |  JOIN ex b ON a.bpos = b.bpos AND a.bkey = b.bkey WHERE a.doc_id < b.doc_id),
       |mh AS (SELECT id_a, id_b,
       |  len(list_intersect(sa.s, sb.s))::DOUBLE / len(list_distinct(sa.s || sb.s))::DOUBLE AS jac
       |  FROM cand JOIN sh sa ON sa.doc_id = cand.id_a JOIN sh sb ON sb.doc_id = cand.id_b)""".stripMargin
  }

  private def pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hits" -> ((s, dir) => {
      // Hubs vs authorities over the same injected domain graph as
      // q_pagerank: 5 weighted L1-normalized power iterations, every
      // score 6 dp, DECIMAL contribution sums — the oracle unrolls
      // the identical rounds.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .where(col("doc_id") % 5 =!= 4)
      graft.operators.Graph.hits(
        d.select(
          concat(lit("d"), (col("doc_id") % 50).cast("string"),
            lit(".ex.org")).as("src_host"),
          concat(lit("d"), ((col("doc_id") * 7 + 13) % 50).cast("string"),
            lit(".ex.org")).as("dst_host")),
        "src_host", "dst_host", iters = 5)
    }),
    "q_heaps" -> ((s, dir) => {
      // Vocabulary-growth fit over the corpus in doc_id order: is
      // the tail still adding new words, or re-treading boilerplate?
      graft.functions.TextAnalysis.heapsLaw(
        t(s, dir, "documents"), "text", "doc_id")
    }),
    // ------------------------------------- round 15: layout & state
    "q_partitioned_roundtrip" -> ((s, dir) => {
      // Hive-partitioned write + DIRECTORY-pruned read: the per-slice
      // report is computed off a scan whose PartitionFilters carry
      // the lang predicate (asserted in-plan — a regression to a
      // post-scan filter fails the query, not just a spec).
      // path derived from the sf dir: two concurrent harness runs on
      // one box (different sf dirs, or a dev gate racing the driver)
      // must not overwrite each other mid-read
      val out = sys.props("java.io.tmpdir") + "/graft_partitioned_rt_" +
        java.lang.Integer.toHexString(dir.hashCode)
      graft.sources.Partitioned.writePartitioned(
        Parallelism.spread(t(s, dir, "documents"))
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        out, Seq("lang"))
      val en = graft.sources.Partitioned.readPartitioned(s, out)
        .where(col("lang") === "en")
      graft.sources.Partitioned.assertPartitionPruned(en, "lang")
      en.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),
    "q_incremental_moments" -> ((s, dir) => {
      // Mergeable exact-moment state: per-parity batch states merged
      // by addition, report derived from the merged state — history
      // is never re-scanned. Merge(state(even), state(odd)) must
      // equal direct per-lang stats over the whole corpus.
      val docs = Parallelism.spread(t(s, dir, "documents"))
      val a = graft.operators.IncrementalStats.momentState(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), Seq("lang"), "n_chars")
      val b = graft.operators.IncrementalStats.momentState(
        docs.where(pmod(col("doc_id"), lit(2)) === 1), Seq("lang"), "n_chars")
      graft.operators.IncrementalStats.momentReport(
        graft.operators.IncrementalStats.mergeMomentStates(Seq(a, b), Seq("lang")),
        Seq("lang"))
    }),
    "q_fd" -> ((s, dir) => {
      // g3 functional-dependency profile over the categorical trio
      // (lang, source, lang_prefix): lang -> lang_prefix must hold
      // exactly (strength 1.0); the other directions measure real
      // violation mass.
      graft.operators.Profile.functionalDependencies(
        Parallelism.spread(t(s, dir, "documents"))
          .withColumn("lang_prefix", substring(col("lang"), 1, 1)),
        Seq("lang", "source", "lang_prefix"))
    }),
    // ------------------------------------------ round 15: events
    "q_rfm" -> ((s, dir) => {
      // Classic user-value triage scored by corpus quantiles — the
      // per-user quality prior; asOf anchor is a fixed literal
      // (2024-02-01) so reruns and both engines measure the same
      // recency.
      graft.operators.Events.rfmSegments(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "value", asOfMs = 1706745600000L, buckets = 5)
    }),
    "q_xcorr" -> ((s, dir) => {
      // Do purchases follow clicks, and by how many days? Lead-lag
      // Pearson over the dense daily count series, exact integer
      // moments.
      graft.operators.Events.crossCorrelation(
        Parallelism.spread(t(s, dir, "events")),
        "ts_ms", "event_type", "click", "purchase",
        stepMs = 86400000L, maxLag = 5)
    }),
    "q_theil_sen" -> ((s, dir) => {
      // Robust daily-value trend: median pairwise slope over the
      // bounded daily series (the outlier-immune TrendLine twin).
      graft.operators.Events.theilSenTrend(
        Parallelism.spread(t(s, dir, "events")),
        "ts_ms", "value", stepMs = 86400000L)
    }),
    // ------------------------------------------ round 15: eval stats
    "q_anova" -> ((s, dir) => {
      // k-arm means omnibus over the event-type slices: one grouped
      // moment pass, per-group 6 dp terms in exact DECIMAL.
      graft.operators.Eval.anovaF(
        Parallelism.spread(t(s, dir, "events")), "event_type", "value")
    }),
    "q_levene" -> ((s, dir) => {
      // Brown-Forsythe dispersion omnibus on the same slices: the
      // anovaF statistic over |v - median_g| deviations.
      graft.operators.Eval.leveneTest(
        Parallelism.spread(t(s, dir, "events")), "event_type", "value")
    }),
    "q_paired_t" -> ((s, dir) => {
      // Paired-by-user design: each user's exact click/view value
      // means (DECIMAL sums, one 6 dp division) are the paired
      // measurements; users lacking either arm carry a null mean and
      // drop inside pairedTTest by its null contract.
      val per = Parallelism.spread(t(s, dir, "events"))
        .where(col("event_type").isin("click", "view") &&
          col("value").isNotNull && col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          round(sum(when(col("event_type") === "click",
            round(col("value"), 6).cast("decimal(18,6)"))).cast("double") /
            sum(when(col("event_type") === "click", 1L)), 6).as("click_mean"),
          round(sum(when(col("event_type") === "view",
            round(col("value"), 6).cast("decimal(18,6)"))).cast("double") /
            sum(when(col("event_type") === "view", 1L)), 6).as("view_mean"))
      graft.operators.Eval.pairedTTest(per, "click_mean", "view_mean")
    }),
    "q_wilson" -> ((s, dir) => {
      // Per-slice rate with honest small-n error bars: hot = high-
      // value event; a null value nulls the flag and drops.
      graft.operators.Eval.wilsonCI(
        Parallelism.spread(t(s, dir, "events"))
          .select(col("event_type"), (col("value") >= 50.0).as("hot")),
        "event_type", "hot")
    }),
    "q_brier" -> ((s, dir) => {
      // Murphy decomposition of the q_calibration synthetic gate:
      // same score/label construction, one-row verdict.
      val label = pmod(col("doc_id"), lit(4)) === 0
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":auc"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select((noise / 1024.0 + when(label, 0.25).otherwise(0.0)).as("score"),
          label.as("label"))
      graft.operators.Eval.brierDecomposition(scored, "score", "label", bins = 10)
    }),
    "q_dsir" -> ((s, dir) => {
      // DSIR toward the English slice: raw pool = the whole corpus,
      // target = the lang='en' rows (one staged pass — the self/flag
      // shape); Gumbel-top-100 importance resample. numBuckets=64
      // forces real hash collisions on this vocabulary.
      Selection.dsirSelfResample(Parallelism.spread(t(s, dir, "documents")),
        "text", col("lang") === "en", "doc_id", k = 100, numBuckets = 64)
    }),
    "q_nb_quality" -> ((s, dir) => {
      // Naive-Bayes quality filter: train lang='en' vs rest on the
      // corpus itself, score every doc (the CCNet-style seed-filter
      // shape, one staged pass; held-out nbTrain→nbScore is covered
      // in SelectionSpec).
      Selection.nbSelfScore(Parallelism.spread(t(s, dir, "documents")),
        "text", col("lang") === "en", "doc_id", numBuckets = 64)
    }),
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactStats(t(s, dir, "documents"), Seq("text"), "doc_id")
    }),
    "q_dedup_keep_best" -> ((s, dir) => {
      // Same pair list as q_dedup_apply, but keep each cluster's
      // LONGEST doc (ties to the smaller id) instead of the smallest
      // id — the quality-ranked apply.
      val docs = docsWithDups(s, dir)
      val pairs = Dedup.minHashLshPairs(docs, "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2, jaccardThreshold = 0.5)
      Dedup.dropNearDuplicatesBy(docs, pairs, "doc_id", col("n_chars"))
        .select("doc_id", "lang", "source", "n_chars")
    }),
    "q_shards" -> ((s, dir) => {
      graft.sources.ShardExport.shardAssignment(
        Parallelism.spread(t(s, dir, "documents")).select(col("doc_id")),
        "doc_id", rowsPerShard = 64, seed = 3)
    }),
    "q_url_dedup" -> ((s, dir) => {
      // The corpus has no URLs — synthesize tracking-noisy mixed-case
      // variants (20 paths × 3 real ids, coprime moduli = 60
      // canonical URLs), then normalize + exact-dedup by canon form.
      val docs = Parallelism.spread(t(s, dir, "documents"))
        .withColumn("url", concat(
          lit("HTTPS://Example.COM/Path"), pmod(col("doc_id"), lit(20)).cast("string"),
          lit("/?utm_source=feed&id="), pmod(col("doc_id"), lit(3)).cast("string"),
          lit("&utm_campaign=x#sec"), col("doc_id").cast("string")))
      docs.select(col("doc_id"),
        graft.functions.TextAnalysis.normalizeUrl(col("url")).as("norm_url"))
        .groupBy(col("norm_url"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
    }),
    "q_top_values" -> ((s, dir) => {
      // vocabulary head: top-10 words of the corpus
      graft.operators.Profile.topValues(
        Parallelism.spread(t(s, dir, "documents"))
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
          .where(col("word") =!= ""),
        "word", 10)
    }),
    "q_top_values_by_group" -> ((s, dir) => {
      // each language's top-3 words (WindowGroupLimit pre-prune)
      graft.operators.Profile.topValuesByGroup(
        Parallelism.spread(t(s, dir, "documents"))
          .select(col("lang"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
          .where(col("word") =!= ""),
        "lang", "word", 3)
    }),
    "q_cms" -> ((s, dir) => {
      // Count-Min estimate next to the exact count for the corpus
      // top-10 words — the eval that shows the d=4 × w=4096 sketch
      // (bounded at 16,384 rows forever) answers head frequencies
      // with collision error ≤ 2N/w. est ≥ exact by construction.
      val words = Parallelism.spread(t(s, dir, "documents"))
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .where(col("word") =!= "")
      val sketch = graft.operators.Profile.cmsSketch(words, "word")
      val top = graft.operators.Profile.topValues(words, "word", 10)
      graft.operators.Profile.cmsLookup(sketch, top, "word")
        .join(top.withColumnRenamed("n", "n_exact"), Seq("word"))
        .select(col("word"), col("n_exact"), col("est_count"))
    }),
    "q_distinct_kmv" -> ((s, dir) => {
      // vocabulary size per language from a bounded KMV sketch:
      // exact count(DISTINCT word) shuffles the whole vocabulary to
      // each language's reducer; the sketch ships ≤ 2 KiB per
      // language regardless of corpus size and still answers within
      // ~1/√k. k = 256 never fills at sf0.01 (exact there) and
      // binds at sf0.1+ — both branches oracle-replayed.
      graft.operators.Profile.distinctKmv(
        Parallelism.spread(t(s, dir, "documents"))
          .select(col("lang"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
          .where(col("word") =!= ""),
        "lang", "word", k = 256)
    }),
    "q_distinct_hll" -> ((s, dir) => {
      // The MERGEABLE twin of q_distinct_kmv: per-language
      // vocabulary from 4096 six-bit HLL registers — shard/day
      // partial sketches union by plain per-bucket max, the rolling
      // 100 TB distinct-count shape. Registers are a grouped max
      // (no custom aggregate); exact-integer register sums; the
      // linear-counting branch binds at sf0.01, the raw estimator
      // at larger vocabularies — both replayed.
      graft.operators.Profile.distinctHll(
        Parallelism.spread(t(s, dir, "documents"))
          .select(col("lang"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
          .where(col("word") =!= ""),
        "lang", "word")
    }),
    "q_fuzzy_join" -> ((s, dir) => {
      // "Which entity names are one typo apart" — deletion-
      // neighborhood blocking (linear candidate generation, never an
      // all-pairs scan) over the customer-name key space; the
      // completeness guarantee means the oracle's blocked replay
      // finds exactly the same pairs.
      graft.operators.Fuzzy.editDistancePairs(
        t(s, dir, "customer"), "c_name",
        minLen = 4, maxLen = 64, maxBucket = 500)
    }),
    "q_fuzzy_jw" -> ((s, dir) => {
      // The GRADED matcher next to q_fuzzy_join's exact distance-1:
      // Jaro-Winkler over the same typo-noisy entity names, blocked
      // on the extracted numeric key (the blocking survives both the
      // suffix and the leading typo — first-letter blocking would
      // not); native codegen kernel, DuckDB-identical semantics.
      val m3 = pmod(expr("doc_id div 12"), lit(3))
      val base = concat(lit("company-"),
        (pmod(col("doc_id"), lit(12)) * 7919).cast("string"))
      val names = Parallelism.spread(t(s, dir, "documents"))
        .select(
          when(m3 === 0, concat(base, lit("x")))
            .when(m3 === 1, concat(lit("k"), substring(base, 2, 100)))
            .otherwise(base).as("name"))
        .withColumn("blk", regexp_extract(col("name"), "[0-9]+", 0))
      graft.operators.Fuzzy.jaroWinklerPairs(
        names, "name", Seq("blk"), threshold = 0.9)
    }),
    "q_entity_resolution" -> ((s, dir) => {
      // The full record-linkage composition over typo-noisy entity
      // names (12 companies × {base, suffix-typo, leading-typo}):
      // row-156 fuzzy pairs → row-41 connected components →
      // min-name canonical; singletons canonicalize to themselves.
      // Variant selector rides div 12 — INDEPENDENT of the company
      // residue, so every company emits all three forms.
      val m3 = pmod(expr("doc_id div 12"), lit(3))
      val base = concat(lit("company-"),
        (pmod(col("doc_id"), lit(12)) * 7919).cast("string"))
      val names = Parallelism.spread(t(s, dir, "documents"))
        .select(
          when(m3 === 0, concat(base, lit("x")))
            .when(m3 === 1, concat(lit("k"), substring(base, 2, 100)))
            .otherwise(base).as("name"))
        .distinct()
      val pairs = graft.operators.Fuzzy.editDistancePairs(names, "name")
        .select(col("a").as("id_a"), col("b").as("id_b"))
      val clusters = Dedup.duplicateClusters(pairs)
      names.join(clusters.withColumnRenamed("id", "name"), Seq("name"), "left")
        .select(col("name"), coalesce(col("label"), col("name")).as("canon"))
    }),
    "q_expectations" -> ((s, dir) => {
      // Ingest-gate contract audit over a deliberately corrupted
      // orders snapshot: m=3 nulls the fk, m=5 orphans it (+10M),
      // m=4 negates the price, m=7 lower-cases the status, m=6 rows
      // are re-emitted as exact duplicates. Five declarative rules,
      // one scan + one broadcast key-set join.
      import graft.operators.Expectations
      import graft.operators.Expectations._
      val m = pmod(col("o_orderkey"), lit(10))
      val corrupted = t(s, dir, "orders")
        .withColumn("o_custkey",
          when(m === 3, lit(null).cast("long"))
            .when(m === 5, col("o_custkey") + 10000000L)
            .otherwise(col("o_custkey")))
        .withColumn("o_totalprice",
          when(m === 4, -col("o_totalprice")).otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(m === 7, lower(col("o_orderstatus"))).otherwise(col("o_orderstatus")))
      val withDups = corrupted.unionByName(corrupted.where(m === 6))
      Expectations.validate(Parallelism.spread(withDups), Seq(
        NotNull("o_custkey"),
        InRange("o_totalprice", 0.0, 1000000.0),
        MatchesRegex("o_orderstatus", "^[A-Z]$"),
        Unique(Seq("o_orderkey")),
        RefIntegrity("o_custkey", t(s, dir, "customer"), "c_custkey")))
    }),
    "q_expectations_samples" -> ((s, dir) => {
      // validate's counts say WHAT failed; the gate operator needs
      // the "show me 5 bad rows" view. Same corrupted snapshot +
      // rules as q_expectations, capped 5 samples per rule by lowest
      // o_orderkey. o_totalprice rides as DECIMAL(18,2) so the
      // sampled value strings are engine-exact (double→string
      // formatting is not a portable contract).
      import graft.operators.Expectations
      import graft.operators.Expectations._
      val m = pmod(col("o_orderkey"), lit(10))
      val corrupted = t(s, dir, "orders")
        .withColumn("o_custkey",
          when(m === 3, lit(null).cast("long"))
            .when(m === 5, col("o_custkey") + 10000000L)
            .otherwise(col("o_custkey")))
        .withColumn("o_totalprice",
          when(m === 4, -col("o_totalprice")).otherwise(col("o_totalprice"))
            .cast("decimal(18,2)"))
        .withColumn("o_orderstatus",
          when(m === 7, lower(col("o_orderstatus"))).otherwise(col("o_orderstatus")))
      val withDups = corrupted.unionByName(corrupted.where(m === 6))
      Expectations.failingSamples(Parallelism.spread(withDups), Seq(
        NotNull("o_custkey"),
        InRange("o_totalprice", 0.0, 1000000.0),
        MatchesRegex("o_orderstatus", "^[A-Z]$"),
        Unique(Seq("o_orderkey")),
        RefIntegrity("o_custkey", t(s, dir, "customer"), "c_custkey")),
        orderCol = "o_orderkey", maxPerRule = 5)
    }),
    "q_auc" -> ((s, dir) => {
      // Tie-aware ROC AUC of a synthetic quality gate: label = every
      // 4th doc, score = 10-bit md5 noise (1024 dyadic levels — ties
      // guaranteed) shifted +0.25 for positives. Dyadic construction
      // is bit-exact in both engines: no rounding anywhere upstream
      // of the one output division.
      val label = pmod(col("doc_id"), lit(4)) === 0
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":auc"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select((noise / 1024.0 + when(label, 0.25).otherwise(0.0)).as("score"),
          label.as("label"))
      graft.operators.Eval.rocAuc(scored, "score", "label")
    }),
    "q_bh" -> ((s, dir) => {
      // FDR control over a battery of synthetic slice tests: null
      // p-values uniform dyadic, every 4th doc's test carries signal
      // (p/50) — BH at q=0.05 must reject the signal block and admit
      // ~5% of the nulls; exact-rational step-up compare.
      val h = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":bh"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val p = when(pmod(col("doc_id"), lit(4)) === 0, h / lit(51200.0))
        .otherwise(h / lit(1024.0))
      graft.operators.Eval.bhCorrection(
        Parallelism.spread(t(s, dir, "documents")).select(p.as("p")),
        "p", q = 0.05)
    }),
    "q_auc_by_group" -> ((s, dir) => {
      // The slice eval: the same synthetic gate scored PER LANGUAGE
      // — a global AUC hides a filter that ranks one language
      // randomly; per-group prefix sums over the bounded
      // (lang, score) frame.
      val label = pmod(col("doc_id"), lit(4)) === 0
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":auc"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select(col("lang"),
          (noise / 1024.0 + when(label, 0.25).otherwise(0.0)).as("score"),
          label.as("label"))
      graft.operators.Eval.rocAucByGroup(scored, "lang", "score", "label")
    }),
    "q_calibration" -> ((s, dir) => {
      // Reliability bins over the same synthetic gate: scores reach
      // 1.25 − ε, so the top bin's clamp is exercised on real rows.
      val label = pmod(col("doc_id"), lit(4)) === 0
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":auc"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select((noise / 1024.0 + when(label, 0.25).otherwise(0.0)).as("score"),
          label.as("label"))
      graft.operators.Eval.calibrationBins(scored, "score", "label", bins = 10)
    }),
    "q_gains" -> ((s, dir) => {
      // Decile gains/lift for the dyadic gate: distinct scores sweep
      // descending through one multi-value prefix sum; tied blocks
      // land whole in their end-fraction bucket.
      val label = pmod(col("doc_id"), lit(4)) === 0
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":auc"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select((noise / 1024.0 + when(label, 0.25).otherwise(0.0)).as("score"),
          label.as("label"))
      graft.operators.Eval.gainsTable(scored, "score", "label", buckets = 10)
    }),
    "q_welch" -> ((s, dir) => {
      // Means experiment readout: did clicks and views carry
      // different average values? Welch's unequal-variance t — one
      // aggregation pass, exact DECIMAL moments, the anomalies
      // mean-rounding discipline.
      graft.operators.Eval.welchTTest(
        Parallelism.spread(t(s, dir, "events")),
        "event_type", "value", "click", "view")
    }),
    "q_mannwhitney" -> ((s, dir) => {
      // The nonparametric twin on the same slice pair: tie-averaged
      // rank U + tie-corrected z + rank-biserial effect size, ranks
      // from one grouped count + one distributed prefix sum.
      graft.operators.Eval.mannWhitneyU(
        Parallelism.spread(t(s, dir, "events")),
        "event_type", "value", "click", "view")
    }),
    "q_cusum" -> ((s, dir) => {
      // Sustained-shift detection the z-score flags miss: two-sided
      // CUSUM per user over the value stream (target 50 = the
      // stream's design mean, slack 5, decision interval 100) — the
      // recursive max-reset folded into one per-key window sort via
      // the prefix-minus-running-min identity.
      graft.operators.Events.cusum(
        Parallelism.spread(t(s, dir, "events"))
          .select(col("user_id"), col("ts_ms"), col("event_id"), col("value")),
        "user_id", Seq("ts_ms", "event_id"), "value",
        target = 50.0, slack = 5.0, h = 100.0)
    }),
    "q_cooccurrence" -> ((s, dir) => {
      // "Users who did A also did B": ordered event-type pairs with
      // support/confidence/lift — baskets aggregated once, pairs by
      // double explode of the bounded per-user type set.
      graft.operators.Events.coOccurrence(
        Parallelism.spread(t(s, dir, "events")), "user_id", "event_type")
    }),
    "q_attribution_linear" -> ((s, dir) => {
      // Which channel drove purchases: every purchase splits one
      // credit unit equally across the user's click/view touches in
      // the trailing 3 days — per-user range join, one window sort
      // per conversion, exact DECIMAL credit sums.
      graft.operators.Events.attributionCredits(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "event_id", "event_type",
        Seq("click", "view"), "purchase", windowMs = 259200000L,
        model = "linear")
    }),
    "q_attribution_last" -> ((s, dir) => {
      // The marketing default on the same events: all credit to the
      // LATEST in-window touch (unique event-id tie-break).
      graft.operators.Events.attributionCredits(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "event_id", "event_type",
        Seq("click", "view"), "purchase", windowMs = 259200000L,
        model = "last")
    }),
    "q_ab_test" -> ((s, dir) => {
      // Two-proportion experiment readout: variants from the doc-id
      // parity, conversion = the dyadic score clearing 0.5 — arm B
      // gets a +0.15 nudge so the lift and z carry real signal.
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":ab"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val arm = when(pmod(col("doc_id"), lit(2)) === 0, "control")
        .otherwise("treat")
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select(arm.as("variant"),
          (noise / 1024.0 +
            when(pmod(col("doc_id"), lit(2)) === 1, 0.15).otherwise(0.0) >= 0.5)
            .as("converted"))
      graft.operators.Eval.abTest(scored, "variant", "converted",
        "control", "treat")
    }),
    "q_psi" -> ((s, dir) => {
      // Monitoring-standard drift: PSI of the n_chars >= 200
      // survivor slice against the full corpus's decile bins — the
      // q_drift gate read the industry way.
      val d = Parallelism.spread(t(s, dir, "documents"))
      graft.operators.Profile.psi(
        d, d.where(col("n_chars") >= 200), "n_chars", bins = 10)
    }),
    "q_mcnemar" -> ((s, dir) => {
      // Paired comparison of two gates over the SAME docs: A = the
      // dyadic score at 0.7, B = an independent second noise draw at
      // 0.7 — only the discordant cells carry evidence.
      val label = pmod(col("doc_id"), lit(4)) === 0
      def noise(salt: String) = pmod(conv(substring(md5(concat(
        col("doc_id").cast("string"), lit(salt))), 1, 4), 16, 10)
        .cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select(
          ((noise(":auc") / 1024.0 +
            when(label, 0.25).otherwise(0.0)) >= 0.7).as("pred_a"),
          ((noise(":auc2") / 1024.0 +
            when(label, 0.25).otherwise(0.0)) >= 0.7).as("pred_b"),
          label.as("label"))
      graft.operators.Eval.mcnemarTest(scored, "pred_a", "pred_b", "label")
    }),
    "q_ohlc" -> ((s, dir) => {
      // Telemetry compaction: per-user weekly OHLC of the value
      // stream — open/close by the unique (ts, event_id) order, one
      // grouped pass, no window function.
      graft.operators.Events.ohlc(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "value", windowMs = 604800000L,
        tieCols = Seq("event_id"))
    }),
    "q_streaks" -> ((s, dir) => {
      // Gaps-and-islands: longest active-day streak per user from
      // distinct epoch days — the window never sees raw events.
      graft.operators.Events.activeStreaks(
        Parallelism.spread(t(s, dir, "events")), "user_id", "ts_ms")
    }),
    "q_rate_limit" -> ((s, dir) => {
      // Who would a 2-events-per-sliding-day contract have throttled,
      // and when first: one per-user RANGE window + one rollup.
      graft.operators.Events.rateLimitAudit(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", maxEvents = 2, windowMs = 86400000L)
    }),
    "q_regression_eval" -> ((s, dir) => {
      // MAE/RMSE/R2 of a synthetic length regressor: label = doc
      // length, prediction = label + deterministic md5 noise in
      // [-10, 10] — R2 lands close to 1 with real residual mass.
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":reg"))), 1, 4), 16, 10).cast("long"), lit(21)) - 10
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select((col("n_chars") + noise).cast("double").as("pred"),
          col("n_chars").cast("double").as("label"))
      graft.operators.Eval.regressionStats(scored, "pred", "label")
    }),
    "q_reciprocity" -> ((s, dir) => {
      // Directed reciprocity of the injected host graph — the
      // symmetrization-bug detector; one id-pair semi join.
      val d = Parallelism.spread(t(s, dir, "documents"))
      val e1 = d.select(
        concat(lit("h"), (col("doc_id") % 40).cast("string")).as("s"),
        concat(lit("h"), ((col("doc_id") * 3 + 7) % 40).cast("string")).as("d"))
      val e2 = d.where(col("doc_id") % 2 === 0).select(
        concat(lit("h"), (col("doc_id") % 40).cast("string")).as("s"),
        concat(lit("h"), ((col("doc_id") * 7 + 11) % 40).cast("string")).as("d"))
      graft.operators.Graph.reciprocity(e1.unionByName(e2), "s", "d")
    }),
    "q_interarrival" -> ((s, dir) => {
      // Per-user cadence profile over the event stream: lag gaps in
      // the (ts, event_id) unique order, exact percentiles.
      graft.operators.Events.interArrival(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", tieCols = Seq("event_id"))
    }),
    "q_missingness" -> ((s, dir) => {
      // Co-missingness over a synthetically-holed frame: short docs
      // lose their length, en docs lose their lang — the length/lang
      // null masks overlap only where both rules fire.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          when(col("n_chars") < 150, lit(null)).otherwise(col("n_chars"))
            .as("len_opt"),
          when(col("lang") === "en", lit(null)).otherwise(col("lang"))
            .as("lang_opt"))
      graft.operators.Profile.missingnessProfile(
        d, Seq("doc_id", "len_opt", "lang_opt"))
    }),
    "q_confusion" -> ((s, dir) => {
      // Operating-point stats for the same dyadic gate at 0.7: a
      // threshold inside both classes' score ranges, so every
      // confusion cell is populated.
      val label = pmod(col("doc_id"), lit(4)) === 0
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":auc"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select((noise / 1024.0 + when(label, 0.25).otherwise(0.0)).as("score"),
          label.as("label"))
      graft.operators.Eval.confusionStats(scored, "score", "label",
        threshold = 0.7)
    }),
    "q_pr_auc" -> ((s, dir) => {
      // Average precision over the same dyadic synthetic gate as
      // q_auc: the rare-ish positive class (25%) plus guaranteed
      // score ties exercise the blockwise step convention.
      val label = pmod(col("doc_id"), lit(4)) === 0
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":auc"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select((noise / 1024.0 + when(label, 0.25).otherwise(0.0)).as("score"),
          label.as("label"))
      graft.operators.Eval.averagePrecision(scored, "score", "label")
    }),
    "q_ece" -> ((s, dir) => {
      // One-number calibration summary over the q_calibration bins —
      // same clamped binning, same 6 dp per-bin rounding.
      val label = pmod(col("doc_id"), lit(4)) === 0
      val noise = pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":auc"))), 1, 4), 16, 10).cast("long"), lit(1024))
      val scored = Parallelism.spread(t(s, dir, "documents"))
        .select((noise / 1024.0 + when(label, 0.25).otherwise(0.0)).as("score"),
          label.as("label"))
      graft.operators.Eval.expectedCalibrationError(scored, "score", "label",
        bins = 10)
    }),
    "q_kanon" -> ((s, dir) => {
      // Release-gate k-anonymity audit over (nation, segment) — at
      // k=10 a real mix of safe and at-risk groups (35/125 small at
      // sf0.01), so both branches of the audit carry weight.
      graft.operators.Profile.kAnonymity(
        t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10L)
    }),
    "q_corpus_card" -> ((s, dir) => {
      // Per-language release data card over the clone-injected
      // corpus (so dup_rate carries real signal): docs, exact
      // mean/median length, exact byte-dup rate — one groupBy pass.
      graft.operators.Profile.corpusCard(docsWithDups(s, dir), "lang", "text")
    }),
    "q_topk_coverage" -> ((s, dir) => {
      // Concentration headline: share of docs held by the top-1/5/10
      // sources — ranked frame bounded by max(k), never by key count.
      graft.operators.Profile.topKCoverage(
        Parallelism.spread(t(s, dir, "documents")), "source", Seq(1, 5, 10))
    }),
    "q_join_cardinality" -> ((s, dir) => {
      // Pre-flight for orders ⋈ lineitem on orderkey: exact output
      // size and the worst key's contribution from the two id-sized
      // count frames — the salt-or-not decision before the shuffle.
      graft.operators.Profile.joinCardinality(
        t(s, dir, "orders"), "o_orderkey",
        t(s, dir, "lineitem"), "l_orderkey")
    }),
    "q_heatmap" -> ((s, dir) => {
      // Weekly activity grid over the event stream: pure epoch
      // arithmetic (no calendar library), bounded 168-row output.
      graft.operators.Events.activityHeatmap(
        Parallelism.spread(t(s, dir, "events")), "ts_ms")
    }),
    "q_gini" -> ((s, dir) => {
      // Concentration number for the data card: how unequal are doc
      // lengths inside each language slice? Grouped-tie rank sums
      // over the distinct-length frame, exact decimal moments.
      graft.operators.Profile.giniByGroup(
        Parallelism.spread(t(s, dir, "documents")).select("lang", "n_chars"),
        "n_chars", "lang")
    }),
    "q_benford" -> ((s, dir) => {
      // First-digit smell test over order prices: string-surgery
      // digits (no log10 edge cases), shared 10 dp Benford literals,
      // one groupBy pass, <= 9 rows.
      graft.operators.Profile.benfordTest(
        t(s, dir, "lineitem"), "l_extendedprice")
    }),
    "q_ldiv" -> ((s, dir) => {
      // l-diversity refinement over the same quasi tuple: sensitive
      // = the account-balance band (6 bands), l=4 — k-anonymous
      // groups can still be homogeneous in the sensitive value.
      val c = t(s, dir, "customer")
        .withColumn("bal_band", floor(col("c_acctbal") / 2000.0).cast("long"))
      graft.operators.Profile.lDiversity(
        c, Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 4L)
    }),
    "q_tcloseness" -> ((s, dir) => {
      // t-closeness over the same quasi tuple and balance bands:
      // ordered-EMD per group vs the global band distribution —
      // diverse groups can still be skewed. t=0.2 splits the 125
      // groups into both branches at sf0.01.
      val c = t(s, dir, "customer")
        .withColumn("bal_band", floor(col("c_acctbal") / 2000.0).cast("long"))
      graft.operators.Profile.tCloseness(
        c, Seq("c_nationkey", "c_mktsegment"), "bal_band", t = 0.2)
    }),
    "q_kanon_flags" -> ((s, dir) => {
      // Per-row suppression frame for the same quasi tuple.
      graft.operators.Profile.kAnonymityFlags(
          t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10L)
        .select(col("c_custkey"), col("group_size"), col("at_risk"))
    }),
    "q_sentences" -> ((s, dir) => {
      // Row-local sentence segmentation — no shuffle anywhere. The
      // synthetic corpus has no terminators, so inject them
      // deterministically (both engines: plain literal replaces).
      val punct = t(s, dir, "documents").select(col("doc_id"),
        expr("replace(replace(text, 'e ', 'e. '), 'w ', 'w! ')").as("text"))
      graft.functions.TextAnalysis.splitSentences(punct, "text", "doc_id")
    }),
    "q_readability" -> ((s, dir) => {
      // Flesch proxy over the terminator-injected corpus (the
      // q_sentences literal replaces, so n_sents carries signal) —
      // three row-local regexp counts, zero shuffles.
      val punct = t(s, dir, "documents").select(col("doc_id"),
        expr("replace(replace(text, 'e ', 'e. '), 'w ', 'w! ')").as("text"))
      graft.functions.TextAnalysis.readability(punct, "text")
        .select("doc_id", "n_words", "n_sents", "n_vowel_groups", "flesch")
    }),
    "q_pmi" -> ((s, dir) => {
      // Top-50 PMI collocations over the doc corpus at min pair
      // count 5 — row-local bigrams, two map-side count tables, a
      // TakeOrderedAndProject top-k.
      graft.functions.TextAnalysis.pmiCollocations(
        t(s, dir, "documents"), "text", minCount = 5L, k = 50)
    }),
    "q_class_terms" -> ((s, dir) => {
      // Per-language distinctive vocabulary (c-TF-IDF shape): top-10
      // terms whose within-class rate most exceeds corpus
      // availability.
      graft.functions.TextAnalysis.classTopTerms(
        t(s, dir, "documents"), "text", "lang", k = 10)
    }),
    "q_scd2" -> ((s, dir) => {
      // Type-2 dimension history from a 3-version change log: m=4
      // docs edited at v2 (a third re-edited at v3), m=7 docs
      // re-asserted UNCHANGED at v2 — the no-op must collapse into
      // the open [1, null) interval, not split it.
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val m = pmod(col("doc_id"), lit(10))
      val m3 = pmod(col("doc_id"), lit(3))
      def v(df: DataFrame, text: org.apache.spark.sql.Column, ver: Long) =
        df.select(col("doc_id"), text.as("text"), col("lang"),
          lit(ver).as("version"))
      val changes = v(docs, col("text"), 1L)
        .unionByName(v(docs.where(m === 4), concat(col("text"), lit(" v2")), 2L))
        .unionByName(v(docs.where(m === 7), col("text"), 2L))
        .unionByName(v(docs.where(m === 4 && m3 === 0),
          concat(col("text"), lit(" v3")), 3L))
      graft.operators.Versioning.scd2History(
        Parallelism.spread(changes), "doc_id", "version", Seq("text", "lang"))
    }),
    "q_compaction_plan" -> ((s, dir) => {
      // Small-file compaction binning over a per-source "file"
      // listing (size = total chars): next-fit-decreasing bins at a
      // 100 KB target — the plan an automated table-maintenance job
      // executes one task per bin.
      graft.operators.Layout.compactionPlan(
        t(s, dir, "documents").groupBy(col("source").as("file"))
          .agg(sum(col("n_chars")).as("size_bytes")),
        "file", "size_bytes", targetBytes = 100000L)
    }),
    "q_zorder" -> ((s, dir) => {
      // The Morton key that drives layoutZOrder's clustered write:
      // doc length (clamped to 16 bits) interleaved with the 16-bit
      // source hash bucket — pure shift/and arithmetic, mirrored
      // term-for-term by the oracle.
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        graft.operators.Layout.zorderValue(
          Seq(least(col("n_chars"), lit(65535L)),
            conv(substring(md5(col("source")), 1, 4), 16, 10).cast("long")),
          bits = 16).as("z"))
    }),
    "q_kmv_overlap" -> ((s, dir) => {
      // "how many customers do the two order streams share" from two
      // bounded sketches — k=256 binds on both slices at sf0.01
      // already, so the estimator (not the exact fallback) is what
      // the oracle replays.
      val o = t(s, dir, "orders")
      graft.operators.Profile.overlapKmv(
        o.where(pmod(col("o_orderkey"), lit(2)) === 0),
        o.where(pmod(col("o_orderkey"), lit(2)) === 1),
        "o_custkey", k = 256)
    }),
    "q_quantiles_by_group" -> ((s, dir) => {
      graft.operators.Profile.quantilesByGroup(
        t(s, dir, "documents"), "lang", Seq("n_chars"), Seq(0.25, 0.5, 0.9))
    }),
    "q_quantile_gate" -> ((s, dir) => {
      // "keep each language's top 75% by length" — the per-domain
      // relative gate.
      graft.operators.Profile.dropBelowGroupQuantile(
        t(s, dir, "documents"), "n_chars", "lang", 0.25)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),
    "q_pct_rank" -> ((s, dir) => {
      // rank-normalize each doc's length within its language — the
      // cross-group score calibration step before a global gate.
      graft.operators.Profile.percentileRank(
        t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "n_chars", "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("n_chars_pct"))
    }),
    "q_zipf" -> ((s, dir) => {
      // corpus-health: the log-log rank-frequency slope of the top
      // 1000 terms (natural text ≈ −1).
      graft.functions.TextAnalysis.zipfFit(
        t(s, dir, "documents"), "text", topN = 1000, minCount = 2L)
    }),
    "q_winsorize" -> ((s, dir) => {
      // cap each language's length outliers at its own 5th/95th
      // percentile — the keep-the-row outlier treatment next to the
      // gate's drop-the-row.
      graft.operators.Profile.winsorize(
        t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "n_chars", "lang", pLo = 0.05, pHi = 0.95)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("n_chars_w"))
    }),
    "q_key_skew" -> ((s, dir) => {
      // the salting decision report over the language key
      graft.operators.Profile.keySkew(
        t(s, dir, "documents"), "lang", topK = 2)
    }),
    "q_funnel" -> ((s, dir) => {
      // five curation gates, every count from ONE scan; the entropy
      // gate compares the exact micro-unit sum (no rounding), so both
      // engines agree on the ≥ boundary.
      val text = trim(col("text"))
      graft.operators.Profile.stageFunnel(
        Parallelism.spread(t(s, dir, "documents")),
        Seq(
          "nonempty" -> (text =!= ""),
          "min_chars" -> (col("n_chars") >= 200),
          "known_lang" -> col("lang").isin("en", "fr", "de"),
          "min_tokens" -> (size(split(text, "\\s+")) >= 30),
          "min_entropy" ->
            (graft.functions.TextAnalysis.charEntropy(col("text")) >= 4.0)))
    }),
    "q_funnel_by_group" -> ((s, dir) => {
      // the per-source crawl-health view: three gates per lang
      val text = trim(col("text"))
      graft.operators.Profile.stageFunnelByGroup(
        Parallelism.spread(t(s, dir, "documents")), "lang",
        Seq(
          "nonempty" -> (text =!= ""),
          "min_chars" -> (col("n_chars") >= 200),
          "min_tokens" -> (size(split(text, "\\s+")) >= 30)))
    }),
    "q_entropy" -> ((s, dir) => {
      val sig = graft.functions.TextAnalysis.entropySignals(col("text"))
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), sig.as("e"))
        .select(col("doc_id"), col("e.char_entropy"), col("e.printable_ratio"))
    }),
    "q_script" -> ((s, dir) => {
      // Script-mix signal over a synthesized multi-script corpus:
      // the testdata text is ASCII-only, so each doc gets a repeated
      // snippet in a rotating script appended — counts, ratio, and
      // the dominant CASE chain all exercise every class.
      val snippet = expr(
        "repeat(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'Привет мир' " +
          "WHEN 1 THEN 'مرحبا بالعالم' WHEN 2 THEN '你好世界' " +
          "ELSE '안녕하세요' END, CAST(doc_id % 3 AS INT) + 1)")
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          graft.functions.TextAnalysis.scriptSignals(
            concat(col("text"), lit(" "), snippet)).as("sc"))
        .select(col("doc_id"), col("sc.*"))
    }),
    "q_script_mismatch" -> ((s, dir) => {
      // Wrong-script contamination detector — scriptSignals composed
      // into the flag a crawl-health pipeline acts on: docs whose
      // DOMINANT script contradicts their claimed (Latin-script)
      // language. doc_id % 7 == 0 rows are flooded with Cyrillic
      // prose sized ~1.5x the doc's own length, so dominance
      // provably flips regardless of the doc's length.
      val flood = expr("CASE WHEN doc_id % 7 = 0 THEN ' ' || " +
        "repeat('Пример текста на русском языке ', CAST(n_chars / 20 AS INT) + 40) " +
        "ELSE '' END")
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          graft.functions.TextAnalysis.scriptSignals(
            concat(col("text"), flood))("dominant").as("dominant"))
        .where(col("dominant").isNotNull && col("dominant") =!= "latin")
    }),
    "q_snapshot_diff" -> ((s, dir) => {
      // yesterday = documents; today = 10% removed, 10% edited, 10%
      // re-ingested under new ids — the daily-crawl diff shape.
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val m = pmod(col("doc_id"), lit(10))
      val today = docs.where(m =!= 3 && m =!= 4)
        .unionByName(docs.where(m === 4)
          .withColumn("text", concat(col("text"), lit(" v2"))))
        .unionByName(docs.where(m === 5)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            col("text"), col("lang")))
      graft.operators.Versioning.snapshotDiff(
        docs, today, "doc_id", Seq("text", "lang"))
    }),
    "q_norm_dedup" -> ((s, dir) => {
      // case/punct/digit-noisy clones of every 7th doc fold onto
      // their originals under the normalization hash.
      val base = Parallelism.spread(t(s, dir, "documents"))
        .select("doc_id", "text")
      val noisy = base.where(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + lit(20000000L)).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text"))
      base.unionByName(noisy)
        .select(col("doc_id"),
          md5(graft.functions.TextAnalysis.normalizeText(col("text")))
            .as("norm_hash"))
        .groupBy(col("norm_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
    }),
    "q_shuffle_order" -> ((s, dir) => {
      graft.operators.Sampling.shuffleForTraining(
        Parallelism.spread(t(s, dir, "documents")).select(col("doc_id")),
        "doc_id", seed = 3)
    }),
    "q_negatives" -> ((s, dir) => {
      // contrastive-training negatives: 4 deterministic uniform
      // non-self draws per anchor, no cross join, no rand().
      graft.operators.Sampling.negativeSample(
        Parallelism.spread(t(s, dir, "documents")), "doc_id", k = 4, seed = 5)
    }),
    "q_mix" -> ((s, dir) => {
      // wiki-×1.5 / web-×0.75-style mixing over the lang slices: one
      // full epoch + a 0.5 sample of 'en', a 0.75 sample of 'fr',
      // globally shuffled into a contiguous training order.
      val docs = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"))
      val en = docs.where(col("lang") === "en").drop("lang")
      val fr = docs.where(col("lang") === "fr").drop("lang")
      graft.operators.Sampling.mixCorpora(Seq((en, 1.5), (fr, 0.75)), "doc_id", seed = 2)
    }),
    "q_histogram" -> ((s, dir) => {
      graft.operators.Profile.histogram(t(s, dir, "lineitem"), "l_quantity", bins = 20)
    }),
    "q_padding" -> ((s, dir) => {
      // Bucketed-batching padding audit over whitespace token
      // counts: what fraction of padded positions each length bucket
      // wastes at these boundaries.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(graft.functions.TextAnalysis.tokenCount(col("text"))
          .cast("long").as("n_tok"))
      graft.operators.Profile.paddingStats(d, "n_tok", Seq(32, 64, 128, 256))
    }),
    "q_gate_sweep" -> ((s, dir) => {
      // Threshold tuning for the entropy gate: pass rate at five
      // candidate cutoffs from ONE scan. The comparisons ride the
      // exact micro-unit entropy sum, so both engines agree on ≥.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(graft.functions.TextAnalysis.charEntropy(col("text")).as("e"))
      graft.operators.Profile.gateSweep(d, "e", Seq(3.5, 3.8, 4.0, 4.2, 4.5))
    }),
    "q_bpe_fertility" -> ((s, dir) => {
      // Tokenizer-eval fertility (BPE tokens per whitespace word) by
      // language — the standard "how well does this vocab fit this
      // corpus slice" diagnostic; exact integer sums, one scan.
      val spec = graft.functions.Bpe.testFixture
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("lang"),
          graft.functions.TextAnalysis.tokenCount(col("text")).cast("long").as("w"),
          graft.functions.Bpe.bpeTokenCount(col("text"), spec).cast("long").as("tk"))
      d.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"),
        sum(col("tk")).as("n_tokens"),
        round(sum(col("tk")).cast("double") / sum(col("w")), 4).as("fertility"))
    }),
    "q_bpe_stress" -> ((s, dir) => {
      // PRODUCTION-SIZE tokenizer stress: a full 50,000-merge /
      // 50,256-token encode (Bpe.productionScaleSpec, GPT-2 scale)
      // over the corpus — the key that proves the serialized merge
      // table, the per-JVM rank-map build, and the LRU pre-token
      // cache hold at real vocab scale. Round-16 upgrade from
      // rows-only to CHECKED invariants (no SQL engine replays a
      // 50k-rank merge loop, but a correct encode has hashable
      // consequences):
      //   - content conservation: concat(tokens) == concat(pre-token
      //     units) per doc (merges only ever join symbols inside a
      //     unit), and Σ token symbol-lengths == octet_length(text)
      //     — the latter is recomputed INDEPENDENTLY by DuckDB
      //     (strlen = UTF-8 bytes; each byte maps to exactly one
      //     symbol char), so n_token_bytes anchors the whole encode
      //     to the raw corpus bytes cross-engine.
      //   - token-count conservation: n_words ≤ n_tokens ≤
      //     n_token_bytes per doc (each whitespace word is ≥ 1 unit,
      //     each unit ≥ 1 token, each token ≥ 1 byte).
      // An encode that drops/duplicates/reorders ANY byte at vocab
      // scale hashes red in the driver replay.
      val spec = graft.functions.Bpe.productionScaleSpec
      val toks = graft.functions.Bpe.bpeTokens(col("text"), spec)
      val units = graft.functions.Bpe.preTokenUnits(col("text"))
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("lang"),
          graft.functions.TextAnalysis.tokenCount(col("text")).cast("long").as("__w"),
          toks.as("__tk"), units.as("__un"),
          call_function("octet_length", col("text")).cast("long").as("__ob"))
        .select(col("lang"), col("__w"),
          when(col("__tk").isNull, lit(0L))
            .otherwise(size(col("__tk")).cast("long")).as("__ntk"),
          when(col("__tk").isNull, lit(0L))
            .otherwise(aggregate(transform(col("__tk"), t => length(t).cast("long")),
              lit(0L), (a, b) => a + b)).as("__tb"),
          when(col("__tk").isNull, lit(true))
            .otherwise(concat_ws("", col("__tk")) === concat_ws("", col("__un")) &&
              aggregate(transform(col("__tk"), t => length(t).cast("long")),
                lit(0L), (a, b) => a + b) === col("__ob")).as("__ok"))
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("__w")).as("n_words"),
          sum(when(col("__ok"), 1L).otherwise(0L)).as("n_content_ok"),
          sum(col("__tb")).as("n_token_bytes"),
          bool_and(col("__w") <= col("__ntk") && col("__ntk") <= col("__tb") ||
            col("__tb") === 0).as("tokens_bounded"))
    }),
    "q_funnel_histogram" -> ((s, dir) => {
      // Profiling rows COMPOSE: the q_funnel survivor set (all five
      // gates as one pushed filter) feeds the per-group histogram
      // directly — no materialization between the steps, the gates
      // ride along into the histogram's own scans.
      val text = trim(col("text"))
      val survivors = Parallelism.spread(t(s, dir, "documents"))
        .where(text =!= "" && col("n_chars") >= 200 &&
          col("lang").isin("en", "fr", "de") &&
          size(split(text, "\\s+")) >= 30 &&
          graft.functions.TextAnalysis.charEntropy(col("text")) >= 4.0)
      graft.operators.Profile.histogramByGroup(survivors, "lang", "n_chars", bins = 10)
    }),
    "q_histogram_by_group" -> ((s, dir) => {
      graft.operators.Profile.histogramByGroup(
        t(s, dir, "documents"), "lang", "n_chars", bins = 10)
    }),
    "q_temperature" -> ((s, dir) => {
      // UniMax alpha=0.5 rates over the lang sources: the weight
      // frame a user hands to mixCorpora (rates >1 = upsampled).
      graft.operators.Sampling.temperatureWeights(
        Parallelism.spread(t(s, dir, "documents")), "lang", 0.5)
    }),
    "q_dedup_minhash" -> ((s, dir) => {
      // bands=2 (rows of 4): this synthetic corpus has ~0.17 baseline
      // shingle Jaccard, so 2-row bands candidate-explode (E ∝ J²);
      // 4-row bands keep candidates ∝ J⁴ while exact clones are
      // always detected.
      Dedup.minHashLshPairs(docsWithDups(s, dir), "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2, jaccardThreshold = 0.5)
    }),
    "q_minhash_estimate" -> ((s, dir) => {
      // Banding-config eval: signature-estimated Jaccard next to the
      // exact one for every LSH candidate pair — the measured answer
      // to "is numHashes=8, bands=2 good enough for this corpus".
      Dedup.minHashEstimatePairs(docsWithDups(s, dir), "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2)
    }),
    "q_jsonl_roundtrip" -> ((s, dir) => {
      // JSON interchange round trip: serialize each doc to a JSONL
      // line and parse it back against the explicit schema with
      // quarantine capture — the oracle is the identity (a round
      // trip must preserve every value exactly, and nothing may
      // quarantine).
      val docs = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("text"))
      graft.sources.Jsonl.parseJsonLines(
        graft.sources.Jsonl.toJsonLines(docs), "json", docs.schema)
        .where(col(graft.sources.Jsonl.corruptCol).isNull)
        .drop(graft.sources.Jsonl.corruptCol)
    }),
    "q_warc_roundtrip" -> ((s, dir) => {
      // Crawl-archive interchange round trip: serialize each doc as
      // a WARC response record (codegen'd concat/encode — headers,
      // Content-Length in BYTES, record terminator), re-frame the
      // bytes through the quarantining parser, and reconstruct the
      // row. The oracle is the identity + the byte count; nothing
      // may quarantine.
      val docs = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("text"))
      val recs = graft.sources.Warc.toWarcRecords(
        docs.select(
          concat(lit("http://ex.test/"), col("doc_id")).as("uri"),
          encode(col("text"), "UTF-8").as("payload")),
        "uri", "payload")
      graft.sources.Warc.parseWarc(recs.select("warc"), "warc")
        .where(col(graft.sources.Warc.corruptCol).isNull)
        .select(
          regexp_extract(col("target_uri"), "([0-9]+)$", 1).cast("long")
            .as("doc_id"),
          decode(col("payload"), "UTF-8").as("text"),
          col("content_length").as("n_bytes"),
          col("warc_type"))
    }),
    "q_kappa" -> ((s, dir) => {
      // Inter-annotator agreement QA: rater A = lang, rater B = lang
      // with every 7th doc flipped to 'en' — a controlled
      // disagreement pattern; chance-corrected kappa over the
      // |labels|²-bounded contingency.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("lang").as("rater_a"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("en"))
            .otherwise(col("lang")).as("rater_b"))
      graft.operators.Eval.cohenKappa(d, "rater_a", "rater_b")
    }),
    "q_krippendorff" -> ((s, dir) => {
      // Multi-rater agreement with MISSING ratings (the pool shape
      // cohenKappa cannot handle): rater 1 labels every doc, rater 2
      // only even doc_ids (7th flipped 'en'), rater 3 only every 3rd
      // (11th flipped 'fr') — per-item rating counts m ∈ {1,2,3},
      // single-rating items drop as unpairable.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"))
      val r1 = d.select(col("doc_id").as("item"), col("lang").as("label"))
      val r2 = d.where(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id").as("item"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("en"))
            .otherwise(col("lang")).as("label"))
      val r3 = d.where(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id").as("item"),
          when(pmod(col("doc_id"), lit(11)) === 0, lit("fr"))
            .otherwise(col("lang")).as("label"))
      graft.operators.Eval.krippendorffAlpha(
        r1.unionByName(r2).unionByName(r3), "item", "label")
    }),
    "q_krippendorff_interval" -> ((s, dir) => {
      // Interval-metric agreement over synthetic 1..5 Likert grades:
      // rater 1 grades every doc, rater 2 (even ids) bumps every 7th
      // up one (clamped), rater 3 (every 3rd) drops every 11th by
      // two — near misses must cost less than far ones.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"))
      val base = (pmod(col("doc_id") * 13, lit(5)) + 1).cast("double")
      val r1 = d.select(col("doc_id").as("item"), base.as("v"))
      val r2 = d.where(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id").as("item"),
          least(base + when(pmod(col("doc_id"), lit(7)) === 0, 1).otherwise(0),
            lit(5.0)).as("v"))
      val r3 = d.where(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id").as("item"),
          greatest(base - when(pmod(col("doc_id"), lit(11)) === 0, 2).otherwise(0),
            lit(1.0)).as("v"))
      graft.operators.Eval.krippendorffAlphaInterval(
        r1.unionByName(r2).unionByName(r3), "item", "v")
    }),
    "q_dialog_flags" -> ((s, dir) => {
      // SFT structural QC over synthesized 4-turn conversations with
      // controlled defects: %5 empty last turn, %7 double-assistant,
      // %11 leading system turn, %13 copy-paste duplicate, %17
      // foreign role. The oracle derives every flag CLOSED-FORM from
      // the injection rules — an independent derivation, not a
      // replay of the array pipeline.
      val doc = col("doc_id")
      val s1 = substring(col("text"), 1, 50)
      val s2 = substring(col("text"), 51, 50)
      val c3 = when(pmod(doc, lit(13)) === 0, s2)
        .otherwise(substring(col("text"), 101, 50))
      val c4 = when(pmod(doc, lit(5)) === 0, lit(""))
        .otherwise(substring(col("text"), 151, 50))
      val r1 = when(pmod(doc, lit(17)) === 0, lit("tool")).otherwise(lit("user"))
      val r3 = when(pmod(doc, lit(7)) === 0, lit("assistant")).otherwise(lit("user"))
      val base = array(
        struct(r1.as("role"), s1.as("content")),
        struct(lit("assistant").as("role"), s2.as("content")),
        struct(r3.as("role"), c3.as("content")),
        struct(lit("assistant").as("role"), c4.as("content")))
      val turns = when(pmod(doc, lit(11)) === 0,
        concat(array(struct(lit("system").as("role"),
          lit("You are helpful.").as("content"))), base))
        .otherwise(base)
      // Materialize the synthesized turns array ONCE per row: the
      // flags struct references it ~15× through interpreted HOFs
      // (no codegen CSE there), and without the barrier
      // CollapseProject would inline the whole when/array/struct
      // construction into every reference.
      Parallelism.pushdownBarrier(
        Parallelism.spread(t(s, dir, "documents"))
          .select(doc, turns.as("__turns")))
        .select(col("doc_id"),
          graft.functions.Dialog.dialogFlags(col("__turns")).as("f"))
        .select(col("doc_id"), col("f.*"))
    }),
    "q_isotonic" -> ((s, dir) => {
      // PAV calibration of a synthetic quality score (deterministic
      // hash noise + a language-correlated bump) against the lang
      // label; 20 buckets force real violator pooling. The oracle
      // re-derives the fit INDEPENDENTLY via the minimax
      // characterization yhat_i = max_{l<=i} min_{r>=i} avg(l..r).
      val d = Parallelism.spread(t(s, dir, "documents"))
        .where(col("lang").isNotNull)
        .select(
          ((pmod(col("doc_id") * 37, lit(100)) +
            when(col("lang") === "en", lit(25)).otherwise(lit(0))) / lit(125.0))
            .as("score"),
          (col("lang") === "en").as("label"))
      graft.operators.Eval.isotonicCalibration(d, "score", "label", bins = 20)
    }),
    "q_isotonic_apply" -> ((s, dir) => {
      // Serving path: fit on the q_isotonic synth, serve SHIFTED
      // scores (×1.2 − 0.1) through the shuffle-free literal step
      // function — exercises edge clamping both ways; the oracle
      // replays the fit via minimax + an ASOF join lookup.
      val base = Parallelism.spread(t(s, dir, "documents"))
        .where(col("lang").isNotNull)
      val raw = (pmod(col("doc_id") * 37, lit(100)) +
        when(col("lang") === "en", lit(25)).otherwise(lit(0))) / lit(125.0)
      val fit = graft.operators.Eval.isotonicCalibration(
        base.select(raw.as("score"), (col("lang") === "en").as("label")),
        "score", "label", bins = 20)
      val table = graft.operators.Eval.collectIsotonic(fit)
      val s2 = raw * lit(1.2) - lit(0.1)
      base.select(col("doc_id"), round(s2, 6).as("score"),
        graft.operators.Eval.isotonicColumn(table, s2, bins = 20).as("calibrated"))
    }),
    "q_win_rates" -> ((s, dir) =>
      graft.operators.Preference.winRates(
        prefJudgments(s, dir), "item_a", "item_b", "winner")),
    "q_copeland" -> ((s, dir) =>
      graft.operators.Preference.copelandScores(
        prefJudgments(s, dir), "item_a", "item_b", "winner")),
    "q_bradley_terry" -> ((s, dir) =>
      graft.operators.Preference.bradleyTerry(
        prefJudgments(s, dir), "item_a", "item_b", "winner", iters = 3)),
    "q_blocklist" -> ((s, dir) => {
      // C4-style blocklist gate: token-exact occurrence count + flag
      // under a demo list (three corpus words) — one native
      // probe-loop pass, row-local.
      val sig = graft.functions.TextAnalysis.blocklistSignals(
        col("text"), Seq("slow", "big", "merge"))
      Parallelism.spread(t(s, dir, "documents")).select(
        col("doc_id"),
        sig.getField("n_blocked").as("n_blocked"),
        sig.getField("blocked").as("blocked"))
    }),
    "q_tar_roundtrip" -> ((s, dir) => {
      // WebDataset-style shard interchange round trip: docs → native
      // TarEntry members → 64-member shard blobs (ordered assembly +
      // two-zero-block terminator) → the quarantining block parser →
      // identity + byte counts; nothing may quarantine.
      val docs = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("text"))
      val entries = graft.sources.Tar.toTarEntries(
        docs.select(
          concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
          encode(col("text"), "UTF-8").as("payload"),
          col("doc_id")),
        "name", "payload")
      val shards = entries
        .groupBy(expr("doc_id div 64").as("__shard"))
        .agg(graft.sources.Tar.shardBytes(
          transform(
            array_sort(collect_list(struct(col("doc_id").as("k"),
              col("tar_entry").as("e")))),
            m => m.getField("e"))).as("bytes"))
      graft.sources.Tar.parseTar(shards.select("bytes"), "bytes")
        .where(col(graft.sources.Tar.corruptCol).isNull)
        .select(
          regexp_extract(col("name"), "^([0-9]+)", 1).cast("long").as("doc_id"),
          decode(col("payload"), "UTF-8").as("text"),
          col("entry_size").as("n_bytes"))
    }),
    "q_weighted_sample" -> ((s, dir) => {
      // Weight-proportional selection: P(doc) ∝ n_chars via the
      // Gumbel-top-k identity on the content-hash uniform — no RNG
      // state, reproducible under any partitioning.
      graft.operators.Selection.weightedSample(
        Parallelism.spread(t(s, dir, "documents"))
          .select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "n_chars", k = 100, seed = 11)
    }),
    "q_csv_roundtrip" -> ((s, dir) => {
      // CSV interchange round trip under the pinned null/empty
      // contract; the oracle is the identity — every value preserved,
      // nothing quarantined (doc text carries newlines/quotes, so
      // this exercises the full quoting path).
      val docs = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("text"))
      graft.sources.Csv.parseCsvLines(
        graft.sources.Csv.toCsvLines(docs), "csv", docs.schema)
        .where(col(graft.sources.Csv.corruptCol).isNull)
        .drop(graft.sources.Csv.corruptCol)
    }),
    "q_dau_mau" -> ((s, dir) => {
      // Daily engagement report: exact distinct actives per UTC day
      // vs their calendar month — the stickiness ratio.
      graft.operators.Events.dauMau(
        Parallelism.spread(t(s, dir, "events")), "ts_ms", "user_id")
    }),
    "q_bootstrap_ci" -> ((s, dir) => {
      // Error bars on a corpus statistic: deterministic Poisson-
      // bootstrap 95% CI for mean document length — 64 replicates
      // from md5 draws, so the WHOLE resampling replays in the
      // oracle.
      graft.operators.Eval.bootstrapMeanCI(
        Parallelism.spread(t(s, dir, "documents").select("doc_id", "n_chars")),
        "doc_id", "n_chars", replicates = 64, seed = 0L, alpha = 0.05)
    }),
    "q_survival" -> ((s, dir) => {
      // Kaplan–Meier purchase-lifetime curve: per user the span
      // from first to last purchase (day buckets); users whose last
      // purchase is > 7 days before corpus end count as churn
      // EVENTS, the rest are CENSORED (still alive at observation
      // end) — 8/150 real events at sf0.01, so both branches carry
      // weight.
      val ev = t(s, dir, "events").where(col("event_type") === "purchase")
      val mx = ev.agg(max(col("ts_ms")).as("__mx"))
      val subj = ev.groupBy(col("user_id"))
        .agg(min(col("ts_ms")).as("__first"), max(col("ts_ms")).as("__last"))
        .crossJoin(broadcast(mx))
        .select(
          expr("(__last - __first) div 86400000").as("dur_days"),
          (col("__last") < col("__mx") - lit(7L * 86400000L)).as("churned"))
      graft.operators.Events.survivalCurve(subj, "dur_days", "churned")
    }),
    "q_attribution" -> ((s, dir) => {
      // Interval-join attribution (the batch replay of the
      // StreamJoin stream-stream operator — same body, watermarks
      // are no-ops on batch): every click within 4 h after a view
      // by the same user. Both sides shuffle once on user_id.
      val ev = t(s, dir, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          timestamp_millis(col("ts_ms")).as("view_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          timestamp_millis(col("ts_ms")).as("click_ts"))
      graft.streaming.StreamJoin.intervalJoin(
        Parallelism.spread(views), clicks, "user_id",
        "view_ts", "click_ts",
        maxDelay = "4 hours", watermarkDelay = "1 hour")
        .select(col("user_id"), col("view_id"), col("click_id"),
          unix_millis(col("view_ts")).as("view_ts_ms"),
          unix_millis(col("click_ts")).as("click_ts_ms"))
    }),
    "q_event_funnel" -> ((s, dir) => {
      // Ordered-step conversion funnel (view → click → purchase) with
      // strict time progression: greedy earliest-transition per user,
      // one user-keyed shuffle of (user, ts, step) triples only.
      graft.operators.Events.eventFunnel(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "event_type",
        Seq("view", "click", "purchase"))
    }),
    "q_event_funnel_seg" -> ((s, dir) => {
      // The same funnel per market segment: a broadcast dim join
      // tags each event with its user's segment, which then rides
      // the user-keyed shuffle as part of the key.
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      val ev = Parallelism.spread(t(s, dir, "events"))
        .join(broadcast(seg), "user_id")
      graft.operators.Events.eventFunnelByGroup(ev, "segment",
        "user_id", "ts_ms", "event_type", Seq("view", "click", "purchase"))
    }),
    "q_session_stats" -> ((s, dir) => {
      // Per-session engagement report sharing row 9's 30-min gap
      // rule: (user, ts) pre-collapse makes the session window's
      // order key unique, so no tiebreak column is needed.
      graft.operators.Events.sessionStats(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", gapMinutes = 30)
    }),
    "q_budget" -> ((s, dir) => {
      // Proportional sampling plan: 1000 units across languages by
      // doc count, largest-remainder rounding so the quotas sum to
      // the target EXACTLY — all DECIMAL(38,0) integer arithmetic.
      graft.operators.Sampling.allocateBudget(
        Parallelism.spread(t(s, dir, "documents")), "lang", target = 1000)
    }),
    "q_hist_depth" -> ((s, dir) => {
      // Equal-MASS histogram of doc length: edges at the i/10
      // quantiles, so the heavy tail gets resolution where
      // q_histogram's equi-width bins would waste buckets on one
      // outlier's range.
      graft.operators.Profile.equiDepthHistogram(
        Parallelism.spread(t(s, dir, "documents")), "n_chars", bins = 10)
        .select("bin", "lo", "hi", "n_rows")
    }),
    "q_twap" -> ((s, dir) => {
      // Time-weighted average of each user's value stream: hold-time
      // weights from the next-observation lead, exact DECIMAL
      // weighted sums, one division at the boundary.
      graft.operators.Events.twap(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "value", tieCols = Seq("event_id"))
    }),
    "q_concurrency" -> ((s, dir) => {
      // Sweep-line: order lines OPEN (placed, not yet shipped) per
      // priority over time — each valid [orderdate, shipdate) melts
      // into +1/−1 boundary deltas, aggregated per (priority, date)
      // then prefix-summed; the window runs over the bounded
      // boundary frame, never raw rows.
      val iv = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") >= col("o_orderdate"))
        .select("o_orderpriority", "o_orderdate", "l_shipdate")
      graft.operators.Events.concurrency(
        iv, "o_orderdate", "l_shipdate", groupCols = Seq("o_orderpriority"))
    }),
    "q_peak_concurrency" -> ((s, dir) => {
      // The capacity headline: each priority's peak open-lines level
      // and the earliest date reaching it (one row per priority).
      val iv = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") >= col("o_orderdate"))
        .select("o_orderpriority", "o_orderdate", "l_shipdate")
      graft.operators.Events.peakConcurrency(
        iv, "o_orderdate", "l_shipdate", groupCols = Seq("o_orderpriority"))
    }),
    "q_robust_scale" -> ((s, dir) => {
      // Outlier-resistant per-language length scaling: exact median
      // + MAD (6 dp), z_r = (x − med)/(1.4826·MAD) 4 dp — the
      // scaling q_standardize's mean/sd would let one giant doc
      // distort.
      graft.operators.Profile.robustScaleByGroup(
        Parallelism.spread(t(s, dir, "documents"))
          .select("doc_id", "lang", "n_chars"),
        "n_chars", "lang")
        .select("doc_id", "lang", "n_chars", "n_chars_rz")
    }),
    "q_rollup_card" -> ((s, dir) => {
      // Three granularities (cell, per-lang subtotal, grand total)
      // from ONE grouping-sets aggregation; `level` = grouping_id()
      // separates rolled-up dims from genuinely-null values.
      graft.operators.Profile.rollupCard(
        Parallelism.spread(t(s, dir, "documents")),
        Seq("lang", "source"), "n_chars")
    }),
    "q_standardize" -> ((s, dir) => {
      // Per-language z-score of doc length: one grouped moment agg
      // (exact DECIMAL sums), broadcast-ranged join back — the
      // parametric sibling of q_pct_rank.
      graft.operators.Profile.standardizeByGroup(
        Parallelism.spread(t(s, dir, "documents"))
          .select("doc_id", "lang", "n_chars"),
        "n_chars", "lang")
        .select("doc_id", "lang", "n_chars", "n_chars_z")
    }),
    "q_ewma" -> ((s, dir) => {
      // Trend smoothing: pandas-convention (adjust=true) EWMA over a
      // 20-observation trailing window per user, α=0.25 so the decay
      // 0.75^age is bit-identical across engines; the weighted sums
      // are sequential left folds in frame order (same IEEE adds on
      // both sides), one rounding at the output.
      graft.operators.Events.withEwma(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", Seq("ts_ms", "event_id"), "value",
        alpha = 0.25, window = 20)
        .select("user_id", "event_id", "value", "ewma")
    }),
    "q_funnel_time" -> ((s, dir) => {
      // Time-to-convert quantiles over the SAME greedy funnel
      // semantics as q_event_funnel (the two reports cannot disagree
      // about who converted): converting users' reach(purchase) −
      // reach(view), exact p25/p50/p75/p90.
      graft.operators.Events.timeToConvert(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "event_type", Seq("view", "click", "purchase"))
    }),
    "q_retention" -> ((s, dir) => {
      // Weekly cohort retention over epoch-aligned integer periods:
      // the corpus collapses to the distinct (user, week) set in the
      // first exchange; cells are bounded by cohorts × offsets.
      graft.operators.Events.retentionCohorts(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", maxOffset = 8)
    }),
    "q_transitions" -> ((s, dir) => {
      // Markov (prev → next) transition matrix: one user-keyed
      // window with an event-id tiebreak, one bounded aggregation.
      graft.operators.Events.transitionMatrix(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "event_type", "event_id")
    }),
    "q_tumbling" -> ((s, dir) => {
      // Daily tumbling rollup: integer-divided epoch windows, exact
      // DECIMAL value sums (order-independent), one aggregation.
      graft.operators.Events.tumblingRollup(
        Parallelism.spread(t(s, dir, "events")),
        "ts_ms", "value", "user_id", widthMs = 86400000L)
    }),
    "q_hopping" -> ((s, dir) => {
      // 24h windows sliding every 8h: each event explodes into its 3
      // covering windows (closed-form starts, no range filter), then
      // the same one map-side-combined aggregation as tumbling.
      graft.operators.Events.hoppingRollup(
        Parallelism.spread(t(s, dir, "events")),
        "ts_ms", "value", "user_id",
        widthMs = 86400000L, slideMs = 28800000L)
    }),
    "q_bm25" -> ((s, dir) => {
      // Ranked retrieval over the corpus frame: Okapi BM25 for a
      // 4-term query, shuffle-free scoring (HOF term counts + one
      // broadcast stats row), global top-50.
      graft.functions.TextAnalysis.bm25TopK(
        t(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "data", "query", "window"), k = 50)
    }),
    "q_rrf" -> ((s, dir) => {
      // Rank fusion of two retrievers with incomparable scores: the
      // q_bm25 ranking and a second BM25 over a different term set,
      // fused by RRF (1/(60+rank) contributions in exact DECIMAL) —
      // no score calibration anywhere.
      import org.apache.spark.sql.expressions.Window
      def ranked(terms: Seq[String]) =
        graft.functions.TextAnalysis.bm25TopK(
          t(s, dir, "documents"), "text", "doc_id", terms, k = 50)
          .withColumn("query_id", lit(0L))
          .withColumn("rank",
            row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
          .select("query_id", "doc_id", "rank")
      graft.operators.Eval.rrfFuse(
        Seq(ranked(Seq("spark", "data", "query", "window")),
          ranked(Seq("join", "hash", "stream", "merge"))),
        "query_id", "doc_id", "rank", c = 60, topK = 10)
    }),
    "q_ndcg" -> ((s, dir) => {
      // Retrieval-quality eval end to end: the q_bm25 ranking scored
      // against synthetic graded judgments (rel = doc_id % 4), nDCG
      // at 10. Natural-log discounts cancel in the ratio; per-term
      // 8 dp rounding + DECIMAL accumulation keeps both sums
      // order-independent.
      import org.apache.spark.sql.expressions.Window
      val ranked = graft.functions.TextAnalysis.bm25TopK(
        t(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "data", "query", "window"), k = 50)
        .withColumn("query_id", lit(0L))
        .withColumn("rank",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      val rels = t(s, dir, "documents").select(
        lit(0L).as("query_id"), col("doc_id"),
        pmod(col("doc_id"), lit(4)).cast("int").as("rel"))
      graft.operators.Eval.ndcgAtK(ranked, rels,
        "query_id", "doc_id", "rank", "rel", k = 10)
    }),
    "q_orc_roundtrip" -> ((s, dir) => {
      // Columnar interchange: write the doc slice as zstd ORC, read
      // it back under the explicit schema — identity oracle, newline/
      // null-bearing text exercises the value path end to end.
      val docs = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_orc_" +
        java.lang.Integer.toHexString(dir.hashCode)
      graft.sources.Orc.writeOrc(docs, path)
      graft.sources.Orc.readOrc(s, path, docs.schema)
    }),
    "q_heavy_mg" -> ((s, dir) => {
      // The MG presence GUARANTEE is the oracle contract: every
      // exact top-10 word's count far exceeds N/(k+1) at k=64 (the
      // vocab is ~31 near-uniform words), so in_sketch is
      // deterministically true however partitions merged — while the
      // sketch itself stayed ≤ 64 entries.
      val words = Parallelism.spread(t(s, dir, "documents"))
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .where(col("word") =!= "")
      val sketch = graft.operators.Profile.mgHeavyHitters(words, "word", k = 64)
      graft.operators.Profile.topValues(words, "word", 10)
        .withColumnRenamed("n", "n_exact")
        .join(sketch.select(col("item").as("word"), lit(true).as("in_sketch")),
          Seq("word"), "left")
        .select(col("word"), col("n_exact"),
          coalesce(col("in_sketch"), lit(false)).as("in_sketch"))
    }),
    "q_inverted_index" -> ((s, dir) => {
      // search/retrieval handoff: token → capped ascending posting
      // list; df gates prune hapaxes BEFORE any list is built.
      // Arrays don't hash in the driver compare → postings
      // space-joined (the q_pack_shards convention).
      graft.functions.TextAnalysis.postingLists(
        t(s, dir, "documents"), "text", "doc_id",
        minDf = 2L, maxPostings = 100)
        .select(col("token"), col("df_count"), col("n_postings"),
          array_join(col("postings").cast("array<string>"), " ")
            .as("postings_joined"))
    }),
    "q_event_paths" -> ((s, dir) => {
      // "what do users actually do, in order?" — top 20 type
      // trigrams over the time-ordered per-user streams.
      graft.operators.Events.topPaths(
        Parallelism.spread(t(s, dir, "events")),
        "user_id", "ts_ms", "event_type", n = 3, topK = 20)
    }),
    "q_anomaly" -> ((s, dir) => {
      // Rolling z-score over each sparse user's gap-filled daily
      // series: the silent-day-aware alerting shape. z = 2.5 so the
      // synthetic series actually trips flags.
      graft.operators.Events.anomalies(
        Parallelism.spread(t(s, dir, "events"))
          .where(pmod(col("user_id"), lit(23)) === 0),
        "ts_ms", "user_id", "value", stepMs = 86400000L,
        trailing = 7, z = 2.5)
    }),
    "q_upsert" -> ((s, dir) => {
      // CDC apply over two change versions: v1 deletes m=3, edits
      // m=4, inserts m=5 under +10M ids; v2 re-edits a third of the
      // m=4 edits and deletes a third of the inserts — latest-wins
      // must pick v2 where present.
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val m = pmod(col("doc_id"), lit(10))
      val m3 = pmod(col("doc_id"), lit(3))
      def ch(df: DataFrame, text: org.apache.spark.sql.Column,
          id: org.apache.spark.sql.Column, v: Long, op: String) =
        df.select(id.as("doc_id"), text.as("text"), col("lang"),
          lit(v).as("version"), lit(op).as("op"))
      val changes = ch(docs.where(m === 3), col("text"), col("doc_id"), 1L, "delete")
        .unionByName(ch(docs.where(m === 4),
          concat(col("text"), lit(" v2")), col("doc_id"), 1L, "upsert"))
        .unionByName(ch(docs.where(m === 5),
          col("text"), col("doc_id") + 10000000L, 1L, "upsert"))
        .unionByName(ch(docs.where(m === 4 && m3 === 0),
          concat(col("text"), lit(" v3")), col("doc_id"), 2L, "upsert"))
        .unionByName(ch(docs.where(m === 5 && m3 === 0),
          col("text"), col("doc_id") + 10000000L, 2L, "delete"))
      graft.operators.Versioning.applyChanges(
        docs, changes, "doc_id", "version", "op")
    }),
    "q_gapfill" -> ((s, dir) => {
      // Per-user daily series with the silent days materialized and
      // forward-filled: the model-feature / dashboard series shape.
      // Sparse users (id % 37 = 0) guarantee real gaps to fill.
      graft.operators.Events.gapFill(
        Parallelism.spread(t(s, dir, "events"))
          .where(pmod(col("user_id"), lit(37)) === 0),
        "ts_ms", "user_id", "value", stepMs = 86400000L)
    }),
    "q_corr" -> ((s, dir) => {
      // Pairwise Pearson over the lineitem measures: every moment
      // from ONE exact-decimal aggregation, formula on the bounded
      // agg row — never a pass per pair.
      graft.operators.Profile.corrMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    }),
    "q_spearman" -> ((s, dir) => {
      // Monotone association between quantity (50 distinct values —
      // the tie convention carries real weight) and extendedprice;
      // ranks from grouped counts + a distributed prefix sum, never
      // a per-row rank window.
      graft.operators.Profile.spearmanCorr(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice")
    }),
    "q_crosstab" -> ((s, dir) => {
      // source × lang independence check: one corpus aggregation,
      // marginals derived from the staged bounded cell frame.
      graft.operators.Profile.crossTab(
        Parallelism.spread(t(s, dir, "documents")), "source", "lang")
    }),
    "q_cramers_v" -> ((s, dir) => {
      // The q_crosstab confound as an effect size: is source×lang
      // association cosmetic or structural, independent of n.
      graft.operators.Profile.cramersV(
        Parallelism.spread(t(s, dir, "documents")), "source", "lang")
    }),
    "q_mutual_info" -> ((s, dir) => {
      // The information-theoretic reading of the same confound: how
      // many nats does the source tell you about the language, and
      // the cardinality-normalized NMI for cross-pair comparison.
      graft.operators.Profile.mutualInformation(
        Parallelism.spread(t(s, dir, "documents")), "source", "lang")
    }),
    "q_drift" -> ((s, dir) => {
      // What the length gate did to the language mix: per-lang
      // KL/JS contributions between the full corpus and the
      // n_chars >= 200 survivor slice (Laplace-smoothed shares, one
      // aggregation per side, 6 dp ln-boundary rounding).
      val d = Parallelism.spread(t(s, dir, "documents"))
      graft.operators.Profile.distributionDrift(
        d, d.where(col("n_chars") >= 200), "lang")
    }),
    "q_ks" -> ((s, dir) => {
      // Binless drift: KS distance between the en and de doc-length
      // distributions — both cumulative CDFs from ONE multi-value
      // prefix sum over the pooled distinct lengths.
      graft.operators.Profile.ksTest(
        Parallelism.spread(t(s, dir, "documents")),
        "n_chars", "lang", "en", "de")
    }),
    "q_mad" -> ((s, dir) => {
      // Robust per-language length outliers: median + MAD (two rank
      // passes) and the > 3-MAD flag count; thresholds rounded 6 dp
      // so the flagged set is engine-portable.
      graft.operators.Profile.madOutliers(
        Parallelism.spread(t(s, dir, "documents")), "lang", "n_chars")
    }),
    "q_cov" -> ((s, dir) => {
      // Embedding covariance from ONE exact-decimal moment scan
      // (order-independent sums; the reshape joins run on the
      // bounded 4161-row moment frame).
      graft.operators.Pca.covarianceMatrix(
        t(s, dir, "embeddings"), "embedding", dim = 64)
    }),
    "q_pca" -> ((s, dir) => {
      // FULL-HASH invariant oracle for the eigendecomposition (the
      // round-15 upgrade from rows-only): no SQL engine replays
      // Jacobi, but every CONSEQUENCE of a correct fit is hashable.
      //   - 'trace' (cross-engine): Σ all 64 eigenvalues == trace of
      //     the covariance — DuckDB recomputes the trace from the
      //     q_cov moment replay, so the spectrum is anchored to the
      //     data, not to Spark's own output.
      //   - 'norm2_sum' (cross-engine): Σ over vectors of
      //     ||x − μ||² (round-6 → exact DECIMAL sum) — anchors the
      //     fitted mean to DuckDB's independently-replayed mean.
      //   - 'proj_norm_diff' (per vector): projecting onto the FULL
      //     k=64 basis preserves each vector's centered norm —
      //     nonzero anywhere means the basis is not orthonormal or
      //     the projection is wrong; DuckDB emits the expected zeros
      //     per vec_id.
      //   - per component: eigen residual |S'v − λv| (S' = the
      //     oracle-green q_cov matrix), pairwise orthonormality
      //     error, sign convention, descending order, PSD — all
      //     exact 0/1 after rounding (residual bound ~4e-6 from the
      //     6 dp S'; the 4 dp round has 12× headroom).
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val d = 64
      val m = graft.operators.Pca.fit(e, "embedding", dim = d, k = d)
      val sPrime = graft.operators.Pca.covarianceMatrix(e, "embedding", dim = d)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      def r4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val checks = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()
      checks += (("trace", -1L, r4(m.eigenvalues.sum)))
      for (c <- 0 until d) {
        val v = m.components(c)
        val residual = (0 until d).map { i =>
          math.abs((0 until d).map(j => sPrime((i, j)) * v(j)).sum -
            m.eigenvalues(c) * v(i))
        }.max
        checks += (("eigen_residual", c.toLong, r4(residual)))
        val ortho = (0 until d).map { b =>
          val dot = (0 until d).map(i => v(i) * m.components(b)(i)).sum
          math.abs(dot - (if (b == c) 1.0 else 0.0))
        }.max
        checks += (("ortho", c.toLong, r4(ortho)))
        val mx = v.indices.maxBy(i => (math.abs(v(i)), -i))
        checks += (("sign", c.toLong, if (v(mx) >= 0) 1.0 else 0.0))
        checks += (("psd", c.toLong, if (m.eigenvalues(c) >= -1e-9) 1.0 else 0.0))
        if (c < d - 1)
          checks += (("order", c.toLong,
            if (m.eigenvalues(c) >= m.eigenvalues(c + 1) - 1e-12) 1.0 else 0.0))
      }
      val centered = graft.functions.VectorFunctions
        .subtractMean(col("embedding"), m.mean.toSeq)
      val withC = e.where(col("embedding").isNotNull)
        .select(col("vec_id").cast("long").as("id"), centered.as("__cg"))
      val projN = m.components.toSeq.map { cp =>
        val dt = graft.functions.VectorFunctions
          .dotProduct(col("__cg"), array(cp.toSeq.map(lit): _*))
        dt * dt
      }.reduce(_ + _)
      val directN = graft.functions.VectorFunctions
        .dotProduct(col("__cg"), col("__cg"))
      val staged = withC
        .select(col("id"), projN.as("__pn"), directN.as("__dn"))
        .localCheckpoint() // feeds both the per-vector rows and the sum
      val perVec = staged.select(lit("proj_norm_diff").as("chk"), col("id"),
        abs(round(col("__pn") - col("__dn"), 4)).as("value"))
      val sumRow = staged
        .select(round(col("__dn"), 6).cast("decimal(18,6)").as("__n2"))
        .agg(round(sum(col("__n2")).cast("double"), 4).as("value"))
        .select(lit("norm2_sum").as("chk"), lit(-1L).as("id"), col("value"))
      checks.toSeq.toDF("chk", "id", "value")
        .unionAll(perVec).unionAll(sumRow)
    }),
    "q_ann_pq" -> ((s, dir) => {
      // Product-quantized ADC top-k, DEFAULT configuration = the
      // persisted index (codebooks BOUNDED at 64 centroids per 8-dim
      // subspace via autoStride, 2 Lloyd passes, stride-4 fit
      // sample): the corpus floats were read once at BUILD time and
      // a query batch pays only LUT-build + code-join. The oracle
      // replays the whole fit+encode+search recipe from scratch, so
      // this key also proves the persisted codebooks/codes equal a
      // from-scratch build; the per-call-fit baseline is
      // q_ann_pq_fit.
      val e = t(s, dir, "embeddings")
      val table = ensurePqIndex(s, dir, "graft_pq_idx_s4_", e)
      graft.operators.Pq.pqTopKFromIndex(s, table,
        e.where(col("vec_id") < 5), "embedding", "vec_id", k = 10)
    }),
    "q_ann_pq_index" -> ((s, dir) => {
      // A SECOND query batch against the same persisted index: the
      // amortization claim made concrete — two batches, one build,
      // zero refits (the ensure is srcDir-cached, so this key and
      // q_ann_pq share the tables). Geometry rides the table
      // properties; a mismatched assumption fails fast.
      val e = t(s, dir, "embeddings")
      // prefix versioned with the fit recipe: a pre-round-12 index in
      // the warehouse was fit on the full corpus and must not be
      // reused against the sampled-fit oracle
      val table = ensurePqIndex(s, dir, "graft_pq_idx_s4_", e)
      graft.operators.Pq.pqTopKFromIndex(s, table,
        e.where(col("vec_id") >= 5 && col("vec_id") < 10),
        "embedding", "vec_id", k = 10)
    }),
    "q_ann_pq_rerank" -> ((s, dir) => {
      // The production serve cascade: PQ/ADC shortlist (5× over-
      // fetch from the persisted index) → exact float rerank of the
      // survivors. Closes the quantization recall gap (SURVEY §6b
      // frontier: 0.823 raw ADC → 0.975 recall@10 at sf1) while the
      // exact kernel touches |queries|×50 rows, never the corpus.
      val e = t(s, dir, "embeddings")
      val table = ensurePqIndex(s, dir, "graft_pq_idx_s4_", e)
      Similarity.rerankTopK(e, e.where(col("vec_id") < 5),
        graft.operators.Pq.pqTopKFromIndex(s, table,
          e.where(col("vec_id") < 5), "embedding", "vec_id", k = 50),
        "embedding", "vec_id", "vec_id", k = 10)
    }),
    "q_ann_pq_fit" -> ((s, dir) => {
      // LABELED fit-inclusive baseline: what refusing to persist
      // costs PER QUERY BATCH — fit + encode + search from scratch
      // on every call. Run over the deterministic quarter corpus
      // (vec_id % 4 = 0, nested stride-16 fit sample) so the
      // calibration row stays affordable at every sf; the full-corpus
      // build lives in the index q_ann_pq serves from, paid once.
      val e = t(s, dir, "embeddings")
      graft.operators.Pq.pqTopK(
        e.where(pmod(col("vec_id"), lit(4)) === 0),
        e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10, dim = 64, m = 8,
        numCentroids = 64, fitSampleStride = 16)
    }),
    "q_pq_recall" -> ((s, dir) => {
      // The PQ-quality eval, SAMPLED: recall@10 on a deterministic
      // ~16-query stride subsample (the kmeans-init pattern — any
      // engine regenerates it), ADC side served from the persisted
      // index, exact side metric-matched squared L2 (cosine would
      // conflate metric disagreement on these non-unit-norm vectors
      // with quantization loss). Per-query recalls feed a Poisson-
      // bootstrap 95% CI, so the subsample's uncertainty is REPORTED
      // instead of hidden — the eval costs one bounded brute ranking
      // + one index probe, never two full exact rankings.
      val e = t(s, dir, "embeddings")
      val n = e.where(col("embedding").isNotNull).count()
      val qstride = Similarity.autoStride(n, 16)
      val q = e.where(col("embedding").isNotNull &&
        pmod(col("vec_id"), lit(qstride)) === 0)
      val table = ensurePqIndex(s, dir, "graft_pq_idx_s4_", e)
      graft.operators.Eval.bootstrapMeanCI(
        Similarity.annRecallByQuery(
          graft.operators.Pq.pqTopKFromIndex(s, table, q,
            "embedding", "vec_id", k = 10),
          Similarity.bruteForceTopKL2(e, q, "embedding", "vec_id",
            "vec_id", k = 10)),
        "query_id", "recall", replicates = 64, seed = 0L, alpha = 0.05)
    }),
    "q_ann_matryoshka" -> ((s, dir) => {
      // Top-k over the 16-dim matryoshka prefix: 4× less vector
      // payload per corpus scan; cosine is scale-invariant so the
      // slice needs no renorm.
      val e = t(s, dir, "embeddings").select(col("vec_id"),
        graft.functions.VectorFunctions.truncate(col("embedding"), 16)
          .as("embedding"))
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10)
    }),
    "q_matryoshka_recall" -> ((s, dir) => {
      // The truncation-quality eval: recall@10 of the 16-dim prefix
      // against the full 64-dim ranking — both sides replayable, so
      // the metric itself is oracle-checked.
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val te = e.select(col("vec_id"),
        graft.functions.VectorFunctions.truncate(col("embedding"), 16)
          .as("embedding"))
      val tq = te.where(col("vec_id") < 5)
      Similarity.annRecall(
        Similarity.bruteForceTopK(te, tq, "embedding", "vec_id", "vec_id", k = 10),
        Similarity.bruteForceTopK(e, q, "embedding", "vec_id", "vec_id", k = 10))
    }),
    "q_ann_rp" -> ((s, dir) => {
      // Top-k over the 16-dim Johnson–Lindenstrauss projection: like
      // the matryoshka prefix but model-free — the ±1/√k Rademacher
      // matrix comes from the deterministic md5 generator, so it
      // works on embeddings that were never trained nested.
      val e = t(s, dir, "embeddings").select(col("vec_id"),
        graft.functions.VectorFunctions.randomProject(col("embedding"), 64, 16)
          .as("embedding"))
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10)
    }),
    "q_rp_recall" -> ((s, dir) => {
      // The projection-quality eval: recall@10 of the 16-dim JL
      // space against the full 64-dim ranking — the matryoshka
      // eval's model-free twin.
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val pe = e.select(col("vec_id"),
        graft.functions.VectorFunctions.randomProject(col("embedding"), 64, 16)
          .as("embedding"))
      val pq = pe.where(col("vec_id") < 5)
      Similarity.annRecall(
        Similarity.bruteForceTopK(pe, pq, "embedding", "vec_id", "vec_id", k = 10),
        Similarity.bruteForceTopK(e, q, "embedding", "vec_id", "vec_id", k = 10))
    }),
    "q_dedup_simhash" -> ((s, dir) => {
      // Library DEFAULTS (bits=48, maxBucket=1000): the oracle models
      // the 48-bit signature exactly; the 1000-cap never binds on
      // this corpus (24-bit chunk keys, ≤ dozens of clones per key).
      Dedup.simHashPairs(docsWithDups(s, dir), "text", "doc_id",
        maxHamming = 1, ngram = 2)
    }),
    "q_dedup_apply" -> ((s, dir) => {
      val docs = docsWithDups(s, dir)
      val pairs = Dedup.minHashLshPairs(docs, "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2, jaccardThreshold = 0.5)
      Dedup.dropNearDuplicates(docs, pairs, "doc_id")
        .select("doc_id", "lang", "source", "n_chars")
    }),
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minHashLshPairs(docsWithDups(s, dir), "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2, jaccardThreshold = 0.5)
      Dedup.duplicateClusters(pairs)
    }),
    "q_dedup_clusters_star" -> ((s, dir) => {
      // Alternating large-star/small-star components — same contract
      // as q_dedup_clusters, so the same recursive-CTE oracle applies.
      val pairs = Dedup.minHashLshPairs(docsWithDups(s, dir), "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2, jaccardThreshold = 0.5)
      Dedup.duplicateClustersStar(pairs)
    }),
    "q_ngram_jaccard" -> ((s, dir) => {
      // maxBlock = 500 bounds the coarse (lang, len_bin) blocks:
      // each surviving block emits ≤ 500² carried-set pairs, so the
      // row stays scale-linear (blocks that outgrow the cap are
      // dropped whole — the oracle mirrors the cap via a block-count
      // CTE). Uncapped, block sizes grow with the corpus and the K²
      // pair volume measured 30.7× wall for 10× data at sf1; this is
      // a calibration baseline for q_dedup_minhash, not a row that
      // may go quadratic. The cap never binds below sf1 (max block
      // 458 at sf0.1), so small-SF output is unchanged.
      Dedup.ngramJaccardPairs(
        docsWithDups(s, dir)
          .withColumn("len_bin", floor(length(col("text")) / 100)),
        "text", "doc_id", n = 3, threshold = 0.5,
        blockBy = Seq("lang", "len_bin"), maxBlock = 500)
    }),
    "q_containment" -> ((s, dir) => {
      // Quote/subset detection via prefix filtering: every 100th doc
      // re-appears as a half-length "quote" (first ⌈tokens/2⌉ tokens,
      // so its shingle set is a strict subset — containment exactly
      // 1.0 where Jaccard would sit near 0.5 and length-binned
      // blocking would separate the pair entirely). Candidates come
      // from each doc's rarest shingles (global df order), not K²
      // blocks.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select("doc_id", "text")
      val toks = split(trim(col("text")), "\\s+")
      val half = greatest(ceil(size(toks) / lit(2.0)).cast("int"), lit(3))
      val quotes = d.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat_ws(" ", slice(toks, lit(1), half)).as("text"))
      Dedup.containmentPairs(d.unionByName(quotes), "text", "doc_id",
        n = 3, threshold = 0.9, maxShingleDocs = 10000)
    }),
    "q_embedding_neardup" -> ((s, dir) => {
      // Exercises the banded multi-table path (2 tables × 8 planes) —
      // the 100 TB shape — with the oracle mirroring both tables.
      Similarity.nearDupPairs(embWithDups(s, dir), "embedding", "vec_id",
        dim = 64, threshold = 0.9, numPlanes = 8, numTables = 2)
    }),
    "q_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10)
    }),
    "q_centroid_sim" -> ((s, dir) => {
      // Which languages live in the same embedding region: per-lang
      // centroid (one scan, exact decimal position sums) then cosine
      // over the bounded lang-pair grid — the slice-geometry view
      // that scopes cross-source semantic dedup.
      val e = t(s, dir, "embeddings")
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      Similarity.centroidSimilarity(
        e.join(d, col("vec_id") === col("doc_id")), "embedding", "lang")
    }),
    "q_bitext_margin" -> ((s, dir) => {
      // margin-normalized best-pair mining (LASER objective): a
      // BOUNDED source batch (vec_id < 300 — "mine this batch of new
      // sentences against the corpus") against the rest; raw cosine
      // is hub-corrected by both endpoints' k=8 neighborhood
      // average. The batch bound is the scale contract: both
      // brute-force passes are |batch|×N, i.e. linear in the corpus
      // (the round-11 sf1 gate measured the earlier %17 fraction
      // source side at 70× for 10× data — a corpus-fraction batch
      // makes brute-force mining quadratic by construction; at full
      // corpus-vs-corpus scale the same algebra runs over the
      // IVF/PQ top-k instead).
      val e = t(s, dir, "embeddings")
      Similarity.marginMine(
        e.where(col("vec_id") < 300),
        e.where(col("vec_id") >= 300),
        "embedding", "vec_id", "vec_id", k = 8, minMargin = 1.0)
    }),
    "q_bitext_ivf" -> ((s, dir) => {
      // Corpus-vs-corpus mining: BOTH sides are corpus HALVES — the
      // shape q_bitext_margin's bounded-batch contract cannot take.
      // Candidates come from a per-direction IVF (deterministic
      // stride=100 centroids, nprobe=2) so each pass scores
      // ~|side|·nprobe/nlist instead of |X|×|Y|; the margin algebra
      // on top is bit-identical to q_bitext_margin. The half-split
      // literal is a 1-row agg read (bounded driver state) replayed
      // by the oracle as a scalar subquery.
      val e = t(s, dir, "embeddings")
      val mid = e.agg(max(col("vec_id"))).head.getLong(0) / 2
      Similarity.marginMineTopK(
        e.where(col("vec_id") < mid),
        e.where(col("vec_id") >= mid),
        "embedding", "vec_id", "vec_id", k = 8, minMargin = 1.0,
        stride = 100, nprobe = 2)
    }),
    "q_hard_negatives" -> ((s, dir) => {
      // DPR-style hard-negative mining: per anchor, the 10 most
      // similar corpus vectors that are NOT positives — positives
      // here are every same-label row (the in-batch-positive shape),
      // plus the anchor itself. IVF fetches 30 candidates (the
      // positive-density budget), one anti-join, one
      // WindowGroupLimit re-rank.
      val e = t(s, dir, "embeddings")
      val anchors = e.where(col("vec_id") < 5)
      val positives = anchors.select(col("vec_id").as("anchor_id"), col("label"))
        .join(e.select(col("vec_id").as("pos_id"), col("label")), "label")
        .select("anchor_id", "pos_id")
      Similarity.hardNegatives(e, anchors, positives,
        "embedding", "vec_id", "vec_id", "anchor_id", "pos_id",
        k = 10, fetchK = 30, stride = 100, nprobe = 2)
    }),
    "q_ann_filtered" -> ((s, dir) => {
      // Attribute-FILTERED exact top-k: neighbours restricted to the
      // query's own `label` (the multi-tenant / category-scoped
      // search shape). The filter is the join key, so selectivity
      // prunes the score product BEFORE ranking — post-filtering a
      // global top-k would silently under-fill selective queries.
      val e = t(s, dir, "embeddings")
      Similarity.filteredTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10, matchCols = Seq("label"))
    }),
    "q_ann_int8" -> ((s, dir) => {
      // int8-quantized exact top-k: 4× less corpus payload per scan;
      // the oracle recomputes the identical integer codes + cosine.
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopKInt8(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10)
    }),
    "q_ann_recall" -> ((s, dir) => {
      // recall@10 of the int8 tier against the float path — both
      // sides DuckDB-replayable, so the METRIC itself is oracle-
      // checked end to end.
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      Similarity.annRecall(
        Similarity.bruteForceTopKInt8(e, q, "embedding", "vec_id", "vec_id", k = 10),
        Similarity.bruteForceTopK(e, q, "embedding", "vec_id", "vec_id", k = 10))
    }),
    "q_ann_hamming" -> ((s, dir) => {
      // Sign-bit codes: 64-dim → ONE bigint word per vector; the
      // oracle replays the pack with a bit_or over unnested signs.
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopKHamming(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10)
    }),
    "q_ann_cascade" -> ((s, dir) => {
      // Full rerank cascade (Hamming shortlist → int8 rerank → float
      // verify) in one call; all three kernels are oracle-expressed
      // (rows 62/63/69), so the composition replays end-to-end.
      val e = t(s, dir, "embeddings")
      Similarity.cascadeTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10, shortlist = 50, rerank = 20)
    }),
    "q_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10, dim = 64, numPlanes = 6)
    }),
    "q_kmeans" -> ((s, dir) => {
      // Spherical k-means, 2 Lloyd passes, k BOUNDED at 200 via
      // autoStride (stride = ceil(n/200), which the oracle replays as
      // a scalar subquery) — the at-scale configuration, not the
      // fixed-stride one whose assignment cost turns quadratic.
      // Centroid means round to 6 dp at each update (see
      // kmeansAssignments), so the SQL replay's argmax sees
      // bit-identical centroids.
      Similarity.kmeansAssignments(
        t(s, dir, "embeddings"), "embedding", "vec_id", iters = 2,
        numCentroids = 200)
        .select(col("id").as("vec_id"), col("cluster"), col("cosine"))
    }),
    "q_ann_cluster_routed" -> ((s, dir) => {
      // Cluster-routed exact ANN (the round-15 frontier-gap closure):
      // queries route to their nprobe=4 nearest Lloyd-refined
      // centroids (the q_kmeans 2-pass / numCentroids=200 fit shape,
      // but with SCRAMBLED seed selection — `id % stride` seeding
      // collides with id-periodic structure; see kmeansFit), exact
      // cosine within the probed clusters only. The only
      // approximation is the routing — razor-margin siblings inside
      // a cluster rank exactly.
      val e = t(s, dir, "embeddings")
      Similarity.clusterRoutedTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10, nprobe = 4, iters = 2,
        numCentroids = 200)
    }),
    "q_ann_kmeans_index" -> ((s, dir) => {
      // The persisted-fit serve path must reproduce clusterRoutedTopK
      // exactly (same Lloyd fit, zero fit cost per batch), so the
      // q_ann_cluster_routed oracle applies verbatim. Write-once per
      // (session, corpus), like the IVF/PQ index keys.
      val e = t(s, dir, "embeddings")
      val kmTable = "graft_km_verify_" +
        java.lang.Integer.toHexString(dir.hashCode)
      if (!s.catalog.tableExists(kmTable))
        Similarity.writeKmeansIndex(e, "embedding", "vec_id", kmTable,
          iters = 2, numCentroids = 200)
      Similarity.clusterRoutedTopKFromIndex(s, kmTable,
        e.where(col("vec_id") < 5), "embedding", "vec_id", k = 10, nprobe = 4)
    }),
    "q_ann_kmeans_append" -> ((s, dir) => {
      // Incremental growth with a FROZEN Lloyd fit: build over most
      // of the corpus, append the rest against the build-time
      // centroids, search the combined index. The batch slice
      // (vec_id % 300 = 0) is seed-eligible on purpose — an
      // implementation that re-fits or lets appended rows join the
      // centroid set hashes differently and fails the oracle (the
      // q_ann_ivf_append discipline).
      val e = t(s, dir, "embeddings")
      val kmTable = "graft_km_app_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Similarity.writeKmeansIndex(e.where(col("vec_id") % 300 =!= 0),
        "embedding", "vec_id", kmTable, iters = 2, numCentroids = 200)
      Similarity.appendKmeansIndex(e.where(col("vec_id") % 300 === 0),
        "embedding", "vec_id", kmTable)
      Similarity.clusterRoutedTopKFromIndex(s, kmTable,
        e.where(col("vec_id") < 5), "embedding", "vec_id", k = 10, nprobe = 4)
    }),
    "q_semdedup" -> ((s, dir) => {
      // Cluster-scoped near-dup (SemDeDup shape): one assignment
      // pass, pairs only within a cluster, exact-cosine verify. The
      // cloned corpus guarantees a true near-dup population.
      Similarity.semanticNearDupPairs(embWithDups(s, dir),
        "embedding", "vec_id", threshold = 0.9, stride = 100, iters = 1)
    }),
    "q_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.where(col("vec_id") < 5),
        "embedding", "vec_id", "vec_id", k = 10, stride = 100, nprobe = 2)
    }),
    "q_ann_ivf_index" -> ((s, dir) => {
      // The persisted-index path must reproduce ivfTopK exactly, so
      // the q_ann_ivf oracle applies verbatim. Write-once per
      // (session, corpus), like the minhash signature table.
      val e = t(s, dir, "embeddings")
      val ivfTable = "graft_ivf_verify_" +
        java.lang.Integer.toHexString(dir.hashCode)
      if (!s.catalog.tableExists(ivfTable))
        Similarity.writeIvfIndex(e, "embedding", "vec_id", ivfTable, stride = 100)
      // No stride argument: the read path takes it from the index's
      // own table properties (self-describing — see writeIvfIndex).
      Similarity.ivfTopKFromIndex(s, ivfTable, e.where(col("vec_id") < 5),
        "embedding", "vec_id", k = 10, nprobe = 2)
    }),
    "q_ann_filtered_ivf" -> ((s, dir) => {
      // The SCALE path for q_ann_filtered: candidates must match both
      // the probed centroid bucket AND the query's label, so a hot
      // label costs bucket∩label, not the label's full partition. One
      // index serves filtered and unfiltered search (label is carried
      // payload) — built once per (session, corpus) like the others.
      val e = t(s, dir, "embeddings")
      val ivfTable = "graft_ivff_verify_" +
        java.lang.Integer.toHexString(dir.hashCode)
      if (!s.catalog.tableExists(ivfTable))
        Similarity.writeIvfIndex(e, "embedding", "vec_id", ivfTable,
          stride = 100, matchCols = Seq("label"))
      Similarity.filteredTopKFromIndex(s, ivfTable, e.where(col("vec_id") < 5),
        "embedding", "vec_id", k = 10, matchCols = Seq("label"), nprobe = 2)
    }),
    "q_ann_ivf_append" -> ((s, dir) => {
      // Incremental growth: build over most of the corpus, append the
      // rest against the FROZEN build-time centroid set, search the
      // combined index. The batch slice (vec_id % 300 = 0) is chosen
      // centroid-ELIGIBLE on purpose: every batch id satisfies the
      // stride filter, so any implementation that re-derives centroids
      // from the appended table (instead of honoring the __cen
      // marker) hashes differently and fails the oracle.
      val e = t(s, dir, "embeddings")
      val ivfTable = "graft_ivf_app_" +
        java.lang.Integer.toHexString(dir.hashCode)
      Similarity.writeIvfIndex(e.where(col("vec_id") % 300 =!= 0),
        "embedding", "vec_id", ivfTable, stride = 100)
      Similarity.appendIvfIndex(e.where(col("vec_id") % 300 === 0),
        "embedding", "vec_id", ivfTable)
      Similarity.ivfTopKFromIndex(s, ivfTable, e.where(col("vec_id") < 5),
        "embedding", "vec_id", k = 10, nprobe = 2)
    }),
    "q_lang_id" -> ((s, dir) => {
      Parallelism.spread(t(s, dir, "documents")).select(
        col("doc_id"),
        graft.functions.TextAnalysis.languageId(col("text")).as("lang_pred"))
    }),
    "q_lang_conf" -> ((s, dir) => {
      // Calibrated language ID: the q_lang_id label plus the smoothed
      // posterior confidence (signal share over all 13 classes) a
      // CCNet-style pipeline gates on. Label identical to q_lang_id
      // by construction (shared decision kernel).
      val sc = graft.functions.TextAnalysis.languageIdScored(col("text"))
      Parallelism.spread(t(s, dir, "documents")).select(
        col("doc_id"),
        sc.getField("lang").as("lang_pred"),
        sc.getField("conf").as("lang_conf"))
    }),
    "q_lang_conf_gate" -> ((s, dir) => {
      // The CCNet-style confidence gate COMPOSITION: tag every doc
      // head/middle/tail by its own predicted-language's confidence
      // terciles — rows 35 (languageId) + 126 (bucketByGroupQuantiles)
      // composed the way a real filtering pipeline uses them.
      val sc = graft.functions.TextAnalysis.languageIdScored(col("text"))
      val scored = Parallelism.spread(t(s, dir, "documents")).select(
        col("doc_id"),
        sc.getField("lang").as("lang_pred"),
        sc.getField("conf").as("lang_conf"))
      graft.operators.Profile.bucketByGroupQuantiles(
        scored, "lang_conf", "lang_pred",
        labels = Seq("tail", "middle", "head"))
    }),
    "q_quality_score" -> ((s, dir) => {
      Parallelism.spread(t(s, dir, "documents")).select(
        col("doc_id"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("quality"))
    }),
    "q_token_count" -> ((s, dir) => {
      Parallelism.spread(t(s, dir, "documents")).select(
        col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("n_ws"),
        graft.functions.TextAnalysis.tokenCountRegex(col("text")).as("n_bpe"))
    }),
    "q_fingerprint" -> ((s, dir) => {
      Parallelism.spread(t(s, dir, "documents")).select(
        col("doc_id"),
        graft.functions.TextAnalysis.fingerprint(col("text")).as("fp"))
    }),
    "q_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedSample(
        t(s, dir, "documents"), "lang",
        Map("en" -> 0.5, "fr" -> 0.25, "zh" -> 1.0), "doc_id", seed = 7)
        .select("doc_id", "lang")
    }),
    "q_quantize" -> ((s, dir) => {
      // int8 embedding quantization, exploded to relational rows so
      // the driver's hash compare sees scalars (arrays don't hash).
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          graft.functions.VectorFunctions.quantize8(col("embedding")).as("qs"))
        .select(col("vec_id"), col("qs.scale").as("scale"),
          posexplode(col("qs.q")).as(Seq("pos", "qv")))
    }),
    "q_rebalance" -> ((s, dir) => {
      // Rebalance the corpus language mix to en:es:fr = 2:1:1 (zh/de
      // dropped). Shares are binary-exact (0.5/0.25/0.25) so the
      // oracle's double arithmetic reproduces the same thresholds.
      graft.operators.Sampling.rebalanceToDistribution(
        t(s, dir, "documents"), "lang",
        Map("en" -> 2.0, "es" -> 1.0, "fr" -> 1.0), "doc_id")
        .select("doc_id", "lang")
    }),
    "q_split" -> ((s, dir) => {
      // Binary-exact weights (0.75/0.125/0.125): the cumulative
      // thresholds are exact in both engines' double arithmetic.
      graft.operators.Sampling.splitByHash(
        t(s, dir, "documents"),
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "doc_id", seed = 7)
        .select("doc_id", "split")
    }),
    "q_split_cluster" -> ((s, dir) => {
      // Leakage-safe split: near-dup clusters (the q_dedup_minhash
      // pair graph) assigned to ONE split by hashing the cluster
      // label; singletons hash their own id — so the assignment
      // degrades to q_split exactly where no duplicate exists.
      val docs = docsWithDups(s, dir)
      val pairs = Dedup.minHashLshPairs(docs, "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2, jaccardThreshold = 0.5)
      graft.operators.Sampling.splitByCluster(docs, pairs,
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "doc_id", seed = 7)
        .select("doc_id", "split")
    }),
    "q_cap_stratum" -> ((s, dir) => {
      // Per-language cap at 60 docs — the per-domain-cap shape of a
      // web-corpus pipeline (compiles to WindowGroupLimit).
      graft.operators.Sampling.capPerStratum(
        t(s, dir, "documents"), "lang", maxRows = 60, "doc_id")
        .select("doc_id", "lang")
    }),
    "q_profile" -> ((s, dir) => {
      graft.operators.Profile.profile(
        t(s, dir, "events").withColumn("et", expr("nullif(event_type, 'error')")),
        Seq("user_id", "et", "value"))
    }),
    "q_quantiles" -> ((s, dir) => {
      // Exact path (percentile = DuckDB quantile_cont, both on the
      // p·(n−1) interpolation); the approx sketch twin is
      // spec-bounded against this.
      graft.operators.Profile.quantiles(
        t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
    }),
    "q_quantiles_approx" -> ((s, dir) => {
      // The 100 TB configuration: one-pass mergeable quantile
      // sketches with bounded memory. Sketch outputs pick actual
      // data elements (no interpolation), so their VALUES have no
      // exact SQL replay — but their declared ≤1% rank-error bound
      // does (the round-15 upgrade from rows-only): a second scan
      // computes the EXACT ranks of each sketch output (count <, and
      // count ≤, as integers — the broadcast sketch frame is 12
      // rows) and the tie-aware bound
      //   100·|{x < q̂}| ≤ (100p+1)·n  ∧  100·|{x ≤ q̂}| ≥ (100p−1)·n
      // is checked in EXACT integer arithmetic (100p is a whole
      // number for every declared prob). The oracle emits the
      // expected all-true grid, so a sketch drifting out of bound
      // hashes red in the driver replay, not just in ScalaTest.
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val sk = graft.operators.Profile
        .quantiles(li, cols, approx = true)
        .localCheckpoint() // 12 rows; feeds the rank join below
      val melted = li.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("double").as("__x"))): _*))
        .as("m")).select(col("m.column").as("column"), col("m.__x"))
      melted
        .join(broadcast(sk), Seq("column"))
        .groupBy(col("column"), col("prob"))
        .agg(
          sum(when(col("__x") < col("quantile"), 1L).otherwise(0L)).as("__lt"),
          sum(when(col("__x") <= col("quantile"), 1L).otherwise(0L)).as("__le"),
          count(lit(1)).as("__n"))
        .select(col("column"), col("prob"),
          (col("__lt") * 100 <= (round(col("prob") * 100) + 1).cast("long") * col("__n") &&
            col("__le") * 100 >= (round(col("prob") * 100) - 1).cast("long") * col("__n"))
            .as("within_bound"))
    }),
    "q_tfidf" -> ((s, dir) => {
      graft.functions.TextAnalysis.tfIdfTopK(
        t(s, dir, "documents"), "text", "doc_id", k = 5)
    }),
    "q_lm_score" -> ((s, dir) => {
      // topV=20 on a ~31-token synthetic vocabulary, so the <unk>
      // (OOV) path is genuinely exercised.
      graft.functions.TextAnalysis.lmScore(
        Parallelism.spread(t(s, dir, "documents")), "text", "doc_id", topV = 20)
    }),
    "q_lm_score3" -> ((s, dir) => {
      // Trigram order with bigram backoff (λ=0.5), same topV=20
      // vocab — the sharper quality signal at the same table shapes.
      graft.functions.TextAnalysis.lmScore3(
        Parallelism.spread(t(s, dir, "documents")), "text", "doc_id", topV = 20)
    }),
    "q_ccnet_buckets" -> ((s, dir) => {
      // CCNet perplexity buckets (Wenzek et al. 2020): LM-score every
      // doc, then tag head/middle/tail PER LANGUAGE by that lang's
      // own score terciles — high avg_logprob (low perplexity) =
      // head. Composes rows 81 (lmScore) and 126
      // (bucketByGroupQuantiles) in the canonical configuration.
      val docs = Parallelism.spread(t(s, dir, "documents"))
      val scored = graft.functions.TextAnalysis
        .lmScore(docs, "text", "doc_id", topV = 20)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("avg_logprob"))
      graft.operators.Profile.bucketByGroupQuantiles(
        scored, "avg_logprob", "lang",
        labels = Seq("tail", "middle", "head"))
    }),
    "q_dup_ngrams" -> ((s, dir) => {
      graft.functions.TextAnalysis.dupNgramStats(
        docsWithDups(s, dir), "text", "doc_id", n = 5)
    }),
    "q_remove_spans" -> ((s, dir) => {
      // The APPLY step of the dup-n-gram signal: clones lose every
      // span their original (lower id) already carries; base docs
      // lose cross-doc template spans.
      graft.functions.TextAnalysis.removeSharedSpans(
        docsWithDups(s, dir), "text", "doc_id", n = 5, minDocs = 2)
        .select(col("doc_id"), col("text"))
    }),
    "q_dedup_lines" -> ((s, dir) => {
      // Synthesize within-doc repetition (the raw corpus has no
      // newlines): doc = text + clone line + a prefix line.
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          concat_ws("\n", col("text"), col("text"),
            substring(col("text"), 1, 50)).as("t2"))
        .select(
          col("doc_id"),
          md5(graft.functions.TextAnalysis.dedupLines(col("t2"))).as("cleaned_md5"),
          (size(split(col("t2"), "\n")) -
            size(array_distinct(split(col("t2"), "\n")))).cast("long").as("n_dropped"))
    }),
    "q_redact" -> ((s, dir) => {
      // The synthetic corpus has no URLs/addresses/phones/IPs —
      // inject one of each class so the scrub is exercised per row.
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          concat(col("text"),
            lit(" contact team-a@example.org or https://ex.org/p?q=1"),
            lit(" call +1 555-123-4567 or (415) 555.0100 from 10.0.0.1 now"))
            .as("t2"))
        .select(
          col("doc_id"),
          md5(graft.functions.TextAnalysis.redact(col("t2"))).as("redacted_md5"),
          size(regexp_extract_all(col("t2"), lit("https?://[^\\s]+"), lit(0)))
            .cast("long").as("n_urls"))
    }),
    "q_redact_stats" -> ((s, dir) => {
      // PII prevalence report over a variably-injected corpus:
      // doc_id % 3 copies of a snippet holding one of each class, so
      // counts differ per row and % 3 == 0 rows exercise has_pii =
      // false. Counts follow redact's ladder (URL first, then
      // email/IP/phone on the already-replaced text).
      val snip = expr("repeat(' ping admin@ex.org or https://ex.org/d?x=2 " +
        "from 10.1.2.3 call (415) 555.0100', CAST(doc_id % 3 AS INT))")
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), concat(col("text"), snip).as("t2"))
        .select(col("doc_id"),
          graft.functions.TextAnalysis.piiCounts(col("t2")).as("p"))
        .select(col("doc_id"), col("p.*"))
    }),
    "q_html_text" -> ((s, dir) => {
      // Wrap every doc in crawl-style HTML noise (head/script/style,
      // a comment, entity-encoded punctuation) and assert extraction
      // recovers the text: md5 + length of the full cleaned string.
      val cleaned = graft.functions.TextAnalysis.stripHtml(col("html"))
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          concat(
            lit("<!DOCTYPE html><html><head><style>p{color:red}</style>"),
            lit("<script>var x = 1 < 2 && 3 > 2;</script></head><body><h1>T&amp;C "),
            col("doc_id").cast("string"),
            lit("</h1><!-- hidden --><p>"),
            col("text"),
            lit(" &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</p></body></html>"))
            .as("html"))
        .select(col("doc_id"),
          md5(cleaned).as("text_md5"),
          length(cleaned).cast("long").as("n_chars"))
    }),
    "q_fix_encoding" -> ((s, dir) => {
      // Corpus text is clean ASCII — append the crafted crawl damage
      // (every mojibake key once, CRLF, stray C0/DEL controls; built
      // from mojibakePairs so injection and repair can't drift) and
      // assert the repair: md5 + length of the fixed string.
      val fixed = graft.functions.TextAnalysis.fixEncoding(
        concat(col("text"), lit(dirtySuffix)))
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), md5(fixed).as("text_md5"),
          length(fixed).cast("long").as("n_chars"))
    }),
    "q_crawl_clean" -> ((s, dir) => {
      // The crawl entry chain in PIPELINE ORDER: encoding repair
      // FIRST, then HTML extraction — one composed expression, one
      // scan, fully codegen'd.
      val html = concat(
        lit("<html><head><script>if (1 < 2) x();</script></head><body><p>"),
        col("text"), lit(dirtySuffix),
        lit(" &amp; <!-- c --> tail</p></body></html>"))
      val cleaned = graft.functions.TextAnalysis.stripHtml(
        graft.functions.TextAnalysis.fixEncoding(html))
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), md5(cleaned).as("text_md5"),
          length(cleaned).cast("long").as("n_chars"))
    }),
    "q_quality_flags" -> ((s, dir) => {
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          graft.functions.TextAnalysis.qualityFlags(col("text"), minWords = 20).as("q"))
        .select(col("doc_id"), col("q.n_words"), col("q.mean_word_len"),
          col("q.symbol_ratio"), col("q.pass"))
    }),
    "q_curation_e2e" -> ((s, dir) => {
      // The curation ENTRY CHAIN composed end to end — the
      // integration a user actually runs, not another kernel:
      // encoding repair → HTML extraction (the q_crawl_clean wrapper
      // verbatim) → Gopher gate → exact dedup on the cleaned text
      // (keep the smallest id per md5) → survivor report. Every
      // stage is an oracle-checked row on its own; this key checks
      // that they COMPOSE (one scan through the codegen'd text
      // chain, one WindowGroupLimit dedup shuffle).
      import org.apache.spark.sql.expressions.Window
      val html = concat(
        lit("<html><head><script>if (1 < 2) x();</script></head><body><p>"),
        col("text"), lit(dirtySuffix),
        lit(" &amp; <!-- c --> tail</p></body></html>"))
      val cleaned = graft.functions.TextAnalysis.stripHtml(
        graft.functions.TextAnalysis.fixEncoding(html))
      // Barriers stage the expensive per-row chains ONCE: without
      // them CollapseProject + filter pushdown inline the whole
      // fixEncoding→stripHtml regex chain into every reference (the
      // plan held 151 regexp_replace nodes — ~25 evaluations of the
      // 6-regex chain per row).
      val staged = Parallelism.pushdownBarrier(
        Parallelism.spread(t(s, dir, "documents"))
          .select(col("doc_id"), cleaned.as("__t")))
      val gated = Parallelism.pushdownBarrier(
        staged.withColumn("__q",
          graft.functions.TextAnalysis.qualityFlags(col("__t"), minWords = 20)))
        .where(col("__q.pass"))
      val w = Window.partitionBy(col("text_md5")).orderBy(col("doc_id"))
      gated
        .select(col("doc_id"), md5(col("__t")).as("text_md5"),
          col("__q.n_words").as("n_words"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select("doc_id", "text_md5", "n_words")
    }),
    "q_diversity" -> ((s, dir) => {
      // Distinct-3 diversity per language — the mode-collapse number
      // for a corpus slice; totals come from token counts row-locally,
      // only (lang, hash) rows move for the distinct count.
      graft.functions.TextAnalysis.corpusDiversity(
        Parallelism.spread(t(s, dir, "documents")), "text", "lang", n = 3)
    }),
    "q_novelty" -> ((s, dir) => {
      // 8-gram novelty of the whole corpus against the even-id half
      // as the reference snapshot: even docs read exactly 0 (they ARE
      // the reference), odd docs read high — both branches carry
      // weight. Only (id, 60-bit hash) rows move.
      val docs = Parallelism.spread(t(s, dir, "documents"))
      graft.functions.TextAnalysis.noveltyScore(
        docs, docs.where(pmod(col("doc_id"), lit(2)) === 0),
        "text", "doc_id", "text", n = 8)
    }),
    "q_contamination" -> ((s, dir) => {
      // Benchmark = the 13-gram sets of the original %100 docs; the
      // injected clones (ids ≥ 1e6) must all be flagged.
      val d = docsWithDups(s, dir)
      val bench = d.where(col("doc_id") % 100 === 0 && col("doc_id") < 1000000)
        .select(explode(Dedup.wordShingles(col("text"), 13)).as("gram"))
      graft.functions.TextAnalysis.contaminationHits(
        d.where(col("doc_id") >= 1000000), bench, "text", "doc_id", 13)
    }),
    "q_contamination_bloom" -> ((s, dir) => {
      // the Bloom-prefiltered scale path — IDENTICAL output (and
      // oracle) to q_contamination: the filter has no false
      // negatives and the verify join kills the false positives.
      val d = docsWithDups(s, dir)
      val bench = d.where(col("doc_id") % 100 === 0 && col("doc_id") < 1000000)
        .select(explode(Dedup.wordShingles(col("text"), 13)).as("gram"))
      graft.functions.TextAnalysis.contaminationHitsBloom(
        d.where(col("doc_id") >= 1000000), bench, "text", "doc_id", 13)
    }),
    "q_decontaminate" -> ((s, dir) => {
      // The APPLY step: the whole corpus (originals + clones) minus
      // every doc sharing a 13-gram with the eval set — the %100
      // originals flag themselves, their clones flag too.
      val d = docsWithDups(s, dir)
      val bench = d.where(col("doc_id") % 100 === 0 && col("doc_id") < 1000000)
        .select(explode(Dedup.wordShingles(col("text"), 13)).as("gram"))
      graft.functions.TextAnalysis.decontaminate(d, bench, "text", "doc_id", 13)
        .select("doc_id", "lang", "source", "n_chars")
    }),
    "q_extract_urls" -> ((s, dir) => {
      // The corpus has no URLs — inject a per-doc outlink pattern
      // (two URLs on %3 docs, none on %5==4 docs) so extraction,
      // multi-match, and the empty-array path are all exercised.
      val injected = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 4, col("text"))
            .otherwise(concat(
              col("text"), lit(" see https://ex.org/d/"), col("doc_id").cast("string"),
              when(col("doc_id") % 3 === 0,
                concat(lit(" and http://a.io/p?id="), col("doc_id").cast("string"), lit("&x=1")))
                .otherwise(lit("")),
              lit(" end"))).as("t2"))
      injected
        .select(col("doc_id"),
          graft.functions.TextAnalysis.extractUrls(col("t2")).as("urls"))
        .select(col("doc_id"),
          size(col("urls")).cast("long").as("n_urls"),
          array_join(col("urls"), "|").as("urls_joined"))
    }),
    "q_pagerank" -> ((s, dir) => {
      // Domain-authority PageRank: doc i contributes the link
      // d{i%50}.ex.org → d{(7i+13)%50}.ex.org (%5==4 docs link
      // nothing), a 50-node multigraph with skewed in-degrees. The
      // corpus-sized edge list aggregates once; 5 fixed iterations
      // run on the bounded weighted graph, every update rounded 6 dp
      // with DECIMAL-exact contribution sums — the oracle unrolls
      // the identical 5 iterations.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .where(col("doc_id") % 5 =!= 4)
      val edges = d.select(
        concat(lit("d"), (col("doc_id") % 50).cast("string"),
          lit(".ex.org")).as("src_host"),
        concat(lit("d"), ((col("doc_id") * 7 + 13) % 50).cast("string"),
          lit(".ex.org")).as("dst_host"))
      graft.operators.Graph.pageRank(edges, "src_host", "dst_host", iters = 5)
    }),
    "q_label_propagate" -> ((s, dir) => {
      // Semi-supervised label spread over a 120-node link graph: doc
      // i contributes the undirected edge n{i%120} — n{(3i+7)%120}
      // (%7==6 docs link nothing); every 10th doc seeds its node
      // with one of 3 labels (consistent per node — the conflicting-
      // seed collapse is spec-covered). 3 clamped-seed iterations,
      // majority vote, ties to the smaller label — the oracle
      // unrolls the identical 3 rounds.
      val d = Parallelism.spread(t(s, dir, "documents"))
      val edges = d.where(col("doc_id") % 7 =!= 6).select(
        concat(lit("n"), (col("doc_id") % 120).cast("string")).as("s"),
        concat(lit("n"), ((col("doc_id") * 3 + 7) % 120).cast("string")).as("d"))
      val seeds = d.where(col("doc_id") % 10 === 0).select(
        concat(lit("n"), (col("doc_id") % 120).cast("string")).as("node_id"),
        concat(lit("l"), (expr("(doc_id % 120) div 10") % 3).cast("string"))
          .as("label"))
      graft.operators.Graph.labelPropagate(
        edges, "s", "d", seeds, "node_id", "label", iters = 3)
    }),
    "q_triangles" -> ((s, dir) => {
      // Graph-health diagnostic over an injected 40-node host graph
      // with TWO modular edge generators (one family alone closes no
      // triangles): degree-ordered orientation bounds the wedge
      // join's fan-out at O(√m) per node (Suri–Vassilvitskii), each
      // triangle counted once at its unique two-out-edge root. All
      // integer counts; the clustering ratio rounds at the boundary.
      val d = Parallelism.spread(t(s, dir, "documents"))
      val e1 = d.select(
        concat(lit("h"), (col("doc_id") % 40).cast("string")).as("s"),
        concat(lit("h"), ((col("doc_id") * 3 + 7) % 40).cast("string")).as("d"))
      val e2 = d.where(col("doc_id") % 2 === 0).select(
        concat(lit("h"), (col("doc_id") % 40).cast("string")).as("s"),
        concat(lit("h"), ((col("doc_id") * 7 + 11) % 40).cast("string")).as("d"))
      graft.operators.Graph.triangleStats(e1.unionByName(e2), "s", "d")
    }),
    "q_assortativity" -> ((s, dir) => {
      // Wiring diagnostic over the same injected host graph: does
      // the corpus link hubs to hubs or hubs to leaves? Pearson over
      // endpoint degrees, both orientations, exact DECIMAL moments.
      val d = Parallelism.spread(t(s, dir, "documents"))
      val e1 = d.select(
        concat(lit("h"), (col("doc_id") % 40).cast("string")).as("s"),
        concat(lit("h"), ((col("doc_id") * 3 + 7) % 40).cast("string")).as("d"))
      val e2 = d.where(col("doc_id") % 2 === 0).select(
        concat(lit("h"), (col("doc_id") % 40).cast("string")).as("s"),
        concat(lit("h"), ((col("doc_id") * 7 + 11) % 40).cast("string")).as("d"))
      graft.operators.Graph.degreeAssortativity(e1.unionByName(e2), "s", "d")
    }),
    "q_snapshot_asof" -> ((s, dir) => {
      // Point-in-time reconstruction: the q_scd2 3-version change
      // log builds the SCD2 history, then snapshotAsOf(2) filters to
      // the intervals covering version 2 — the v3 re-edit must NOT
      // leak in, the v2 no-op re-assertions must resolve to their
      // still-open v1 interval.
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val m = pmod(col("doc_id"), lit(10))
      val m3 = pmod(col("doc_id"), lit(3))
      def v(df: DataFrame, text: org.apache.spark.sql.Column, ver: Long) =
        df.select(col("doc_id"), text.as("text"), col("lang"),
          lit(ver).as("version"))
      val changes = v(docs, col("text"), 1L)
        .unionByName(v(docs.where(m === 4), concat(col("text"), lit(" v2")), 2L))
        .unionByName(v(docs.where(m === 7), col("text"), 2L))
        .unionByName(v(docs.where(m === 4 && m3 === 0),
          concat(col("text"), lit(" v3")), 3L))
      val hist = graft.operators.Versioning.scd2History(
        Parallelism.spread(changes), "doc_id", "version", Seq("text", "lang"))
      graft.operators.Versioning.snapshotAsOf(hist, asOf = 2L)
    }),
    "q_domain_stats" -> ((s, dir) => {
      // Inject a 50-host outlink population (d<k>.ex.org) so the
      // extract→host→aggregate chain sees real cardinality; %5==4
      // docs contribute nothing (the empty-array path).
      val injected = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 4, col("text"))
            .otherwise(concat(
              col("text"), lit(" via https://d"), (col("doc_id") % 50).cast("string"),
              lit(".ex.org/p/"), col("doc_id").cast("string"), lit(" end"))).as("t2"))
      injected
        .select(col("doc_id"),
          explode(graft.functions.TextAnalysis.extractUrls(col("t2"))).as("url"))
        .select(col("doc_id"),
          graft.functions.TextAnalysis.urlHost(col("url")).as("host"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_urls"),
          count_distinct(col("doc_id")).as("n_docs"))
    }),
    "q_pack" -> ((s, dir) => {
      // Fixed 512-token training sequences over the doc_id-ordered
      // corpus: global offsets via the distributed prefix sum.
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          graft.functions.TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"))
      graft.functions.TextAnalysis.packingAssignment(d, col("tokens"), col("doc_id"), 512)
        .select("doc_id", "tokens", "start_offset", "first_seq", "last_seq", "n_seqs")
    }),
    "q_chunk_bpe" -> ((s, dir) => {
      // Subword chunking end-to-end: 8-token BPE windows decoded back
      // to text. The oracle rebuilds each doc's full token stream
      // from the per-unit merge replay and re-decodes the windows.
      graft.operators.Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), posexplode(graft.functions.Bpe.bpeChunks(
          col("text"), graft.functions.Bpe.testFixture, maxTokens = 8))
          .as(Seq("chunk_idx", "chunk_text")))
    }),
    "q_bpe_train" -> ((s, dir) => {
      // Learn 16 merges from the corpus: one distributed unit-count
      // aggregation, then the driver merge loop over the
      // vocabulary-bounded table. The oracle replays the training
      // loop itself (16 unrolled weighted-argmax steps).
      val spec = graft.functions.Bpe.train(
        t(s, dir, "documents"), "text", numMerges = 16)
      s.createDataFrame(spec.merges.zipWithIndex.map {
        case ((f, sec), r) => (r, f, sec)
      }).toDF("merge_rank", "lhs", "rhs")
    }),
    "q_unigram_train" -> ((s, dir) => {
      // Learn a unigram-LM vocabulary (the SentencePiece algorithm
      // family): one distributed unit-count aggregation, then
      // substring seeding + 2 hard-EM rounds + prune on the driver
      // over the vocabulary-bounded table. The oracle replays the
      // whole trainer — seeding, both Viterbi-DP E-steps, the exact
      // integer re-counts, the prune, and the final re-score.
      val spec = graft.functions.Unigram.train(
        t(s, dir, "documents"), "text", numPieces = 272,
        emRounds = 2, maxPieceLen = 6, maxUnitLen = 16)
      s.createDataFrame(spec.pieces.drop(256).zipWithIndex.map {
        case ((p, sc), r) => (r, p, sc)
      }).toDF("piece_rank", "piece", "score")
    }),
    "q_unigram_fertility" -> ((s, dir) => {
      // The two-tokenizer fertility A/B the unigram twin exists for:
      // BPE fixture vs unigram fixture tokens-per-word by language,
      // exact integer sums, one scan, both tokenizers codegen'd.
      val bspec = graft.functions.Bpe.testFixture
      val uspec = graft.functions.Unigram.testFixture
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("lang"),
          graft.functions.TextAnalysis.tokenCount(col("text")).cast("long").as("w"),
          graft.functions.Bpe.bpeTokenCount(col("text"), bspec).cast("long").as("tb"),
          graft.functions.TextAnalysis.tokenCount(col("text"), uspec)
            .cast("long").as("tu"))
      d.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"),
        sum(col("tb")).as("n_tokens_bpe"),
        sum(col("tu")).as("n_tokens_unigram"),
        round(sum(col("tb")).cast("double") / sum(col("w")), 4).as("fertility_bpe"),
        round(sum(col("tu")).cast("double") / sum(col("w")), 4).as("fertility_unigram"))
    }),
    "q_unigram_chunk" -> ((s, dir) => {
      // Subword chunking under the unigram tokenizer: 8-piece
      // windows decoded back to text — the q_chunk_bpe twin. The
      // oracle rebuilds each doc's piece stream from the per-unit
      // Viterbi-DP segmentations and re-decodes the windows.
      graft.operators.Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"), posexplode(graft.functions.Unigram.unigramChunks(
          col("text"), graft.functions.Unigram.testFixture, maxTokens = 8))
          .as(Seq("chunk_idx", "chunk_text")))
    }),
    "q_pack_unigram" -> ((s, dir) => {
      // q_pack_bpe's packing-assignment twin under the unigram
      // tokenizer: sequence sizing on REAL unigram piece counts via
      // the tokenCount(_, Unigram.Spec) overload.
      val uspec = graft.functions.Unigram.testFixture
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          graft.functions.TextAnalysis.tokenCount(col("text"), uspec)
            .cast("long").as("tokens"))
      graft.functions.TextAnalysis.packingAssignment(d, col("tokens"), col("doc_id"), 512)
        .select("doc_id", "tokens", "start_offset", "first_seq", "last_seq", "n_seqs")
    }),
    "q_pack_bpe" -> ((s, dir) => {
      // q_pack on REAL subword counts: the shipped BPE fixture
      // (GPT-2 merges format) sizes every document exactly as a
      // trainer's tokenizer would.
      val spec = graft.functions.Bpe.testFixture
      val d = Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          graft.functions.Bpe.bpeTokenCount(col("text"), spec)
            .cast("long").as("tokens"))
      graft.functions.TextAnalysis.packingAssignment(d, col("tokens"), col("doc_id"), 512)
        .select("doc_id", "tokens", "start_offset", "first_seq", "last_seq", "n_seqs")
    }),
    "q_pack_shards" -> ((s, dir) => {
      // The MATERIALIZED final pipeline step: actual 512-token
      // `input_ids` sequences under the shipped BPE fixture, docs
      // split across boundaries exactly as packingAssignment
      // dictates, trailing partial dropped, shard = seq_id div 64.
      // Arrays don't hash in the driver compare → ids space-joined.
      val seqs = graft.functions.TextAnalysis.packToShards(
        Parallelism.spread(t(s, dir, "documents")),
        "text", graft.functions.Bpe.testFixture, col("doc_id"), seqLen = 512)
      seqs.select(col("seq_id"),
        expr("seq_id div 64").as("shard"),
        col("n_tokens").cast("long").as("n_tokens"),
        array_join(col("input_ids").cast("array<string>"), " ").as("ids_joined"))
    }),
    "q_upsample" -> ((s, dir) => {
      // Epoch weights 0..3 from the id: %4==0 docs drop entirely
      // (the zero-repetition path), the rest fan out in-task.
      graft.operators.Sampling.upsample(
        t(s, dir, "documents"), col("doc_id") % 4)
        .select("doc_id", "lang", "rep")
    }),
    "q_center" -> ((s, dir) => {
      // Transform side of mean-centering with a FIXED mean (exact
      // 1/64 multiples — bit-identical literals in both engines);
      // the fit (Similarity.meanVector) is spec-tested: a cross-row
      // float sum has no deterministic bit pattern to hash. Exploded
      // to (vec_id, pos, cv) scalars like q_quantize — arrays don't
      // hash in the driver compare.
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          graft.functions.VectorFunctions.subtractMean(
            col("embedding"), centerMeans).as("centered"))
        .select(col("vec_id"), posexplode(col("centered")).as(Seq("pos", "cv")))
    }),
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts_ms", "value")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ms"), col("value").as("pvalue"))
      graft.operators.TemporalJoin
        .asOf(clicks, purchases, "ts_ms", "ts_ms", Seq("user_id"),
          Seq("pvalue"), prefix = "purchase_")
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("purchase_ts"), col("purchase_pvalue").as("purchase_value"))
    }),
    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val windows = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ms").as("w_start"),
          (col("ts_ms") + 3600000L).as("w_end"))
      graft.operators.TemporalJoin
        .rangeJoin(views, windows, "ts_ms", "w_start", "w_end",
          Seq("user_id"), bucketWidth = 3600000L)
        .select("event_id", "user_id", "ts_ms", "w_start")
    }),
    "q_boilerplate" -> ((s, dir) => {
      // Synthesize cross-doc boilerplate: every doc gets a shared
      // footer; clones (doc_id % 100 == 0) double some body lines.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws("\n", col("text"), lit("(c) example corp - all rights reserved"),
            substring(col("text"), 1, 40)).as("t2"))
      graft.functions.TextAnalysis
        .boilerplateLines(docs, "t2", "doc_id", minDocs = 50)
        .select(md5(col("line")).as("line_md5"), col("n_docs"))
    }),
    "q_strip_boilerplate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws("\n", col("text"), lit("(c) example corp - all rights reserved"),
            substring(col("text"), 1, 40)).as("t2"))
      val boiler = graft.functions.TextAnalysis
        .boilerplateLines(docs, "t2", "doc_id", minDocs = 50)
      graft.functions.TextAnalysis
        .stripBoilerplate(docs, boiler, "t2", "doc_id")
        .select(col("doc_id"), md5(col("t2")).as("cleaned_md5"))
    }),
    "q_boilerplate_para" -> ((s, dir) => {
      // PARAGRAPH granularity (RefinedWeb-style): sep = "\n\n", and
      // the shared footer is a MULTI-LINE paragraph — line mode
      // would split it, paragraph mode detects and strips it whole.
      // Same operators, different separator: zero new code.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws("\n\n", col("text"),
            lit("legal notice\n(c) example corp"),
            substring(col("text"), 1, 40)).as("t2"))
      val boiler = graft.functions.TextAnalysis
        .boilerplateLines(docs, "t2", "doc_id", minDocs = 50, sep = "\n\n")
      graft.functions.TextAnalysis
        .stripBoilerplate(docs, boiler, "t2", "doc_id", sep = "\n\n")
        .select(col("doc_id"), md5(col("t2")).as("cleaned_md5"))
    }),
    "q_chunk" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.functions.TextAnalysis.chunkTokens(col("text"), 40, 8))
            .as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("chunk_md5"))
    }),
    "q_repetition" -> ((s, dir) => {
      // Synthesize within-doc repetition as in q_dedup_lines (the raw
      // corpus has no newlines): doc = text + clone line + prefix.
      Parallelism.spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          concat_ws("\n", col("text"), col("text"),
            substring(col("text"), 1, 50)).as("t2"))
        .withColumn("r", graft.functions.TextAnalysis.repetitionSignals(col("t2")))
        .select(
          col("doc_id"),
          round(col("r.dup_line_frac"), 4).as("dup_line_frac"),
          round(col("r.dup_line_char_frac"), 4).as("dup_line_char_frac"),
          round(col("r.top_ngram_char_frac"), 4).as("top_ngram_char_frac"))
    }),
    "q_salted_join" -> ((s, dir) => {
      // Salted equi-join (Skew.saltedJoin) must be value-identical to
      // the plain join — the oracle IS the plain join.
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey").as("suppkey"), col("l_quantity"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      graft.operators.Skew.saltedJoin(li, sup, Seq("suppkey"), saltFactor = 8)
        .select("l_orderkey", "l_linenumber", "suppkey", "s_name")
    }),
    "q_dedup_from_signatures" -> ((s, dir) => {
      // Same output contract as q_dedup_minhash, but candidates come
      // from the persisted bucketed signature table — so the
      // q_dedup_minhash oracle applies verbatim. This entry REBUILDS
      // the table every call: it benches the one-time build+dedup
      // path, which its _read twin amortizes away (the two bench rows
      // together are the amortization claim, made measurable).
      val docs = docsWithDups(s, dir)
      // Measures the BUILD + dedup path: always rebuilds.
      val sigTable = ensureSigTable(s, dir, "graft_sigs_verify_", docs,
        alwaysRebuild = true)
      Dedup.minHashLshPairsFromSignatures(docs, sigTable, "text",
        "doc_id", shingleK = 5, jaccardThreshold = 0.5)
    }),
    "q_dedup_from_signatures_read" -> ((s, dir) => {
      // The amortized path: dedup against an ALREADY-BUILT signature
      // table (built at most once per (session, corpus) — in a bench
      // run the alphabetically-earlier build twin has always built
      // it; ensureSigTable validates the recorded corpus dir before
      // reusing). Candidates regenerate shuffle-free from the
      // bucketed scan; only verification touches the corpus text.
      val docs = docsWithDups(s, dir)
      val sigTable = ensureSigTable(s, dir, "graft_sigs_verify_", docs)
      Dedup.minHashLshPairsFromSignatures(docs, sigTable, "text",
        "doc_id", shingleK = 5, jaccardThreshold = 0.5)
    }),
    "q_dedup_incremental" -> ((s, dir) => {
      // New-batch-vs-history dedup: history = plain documents,
      // signed once per (session, corpus); the new batch is the
      // clone slice under fresh ids, so every batch doc has a known
      // jaccard-1.0 partner in the history. Only the batch pays a
      // signature pass; the history side reads its bucketed table.
      val hist = t(s, dir, "documents")
      val batch = hist.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val sigTable = ensureSigTable(s, dir, "graft_sigs_hist_", hist)
      Dedup.minHashLshPairsIncremental(batch, hist, sigTable, "text",
        "doc_id", jaccardThreshold = 0.5)
    }),
    "q_incremental_refresh" -> ((s, dir) => {
      // The weekly-recrawl COMPOSITION: snapshotDiff isolates the
      // new crawl's added/changed slice, the quality gate trims it,
      // and only that gated delta pays a signature pass against the
      // persisted history signature table — the history side reads
      // its bucketed clustering shuffle-free (spec-asserted in
      // DedupSpec), so a 100 TB history costs zero data movement per
      // weekly refresh. Output = near-dup pairs (history id, delta
      // id) the refresh must reconcile before ingesting.
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val m = pmod(col("doc_id"), lit(10))
      val today = docs.where(m =!= 3 && m =!= 4)
        .unionByName(docs.where(m === 4)
          .withColumn("text", concat(col("text"), lit(" v2"))))
        .unionByName(docs.where(m === 5)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            col("text"), col("lang")))
      val delta = graft.operators.Versioning
        .snapshotDiff(docs, today, "doc_id", Seq("text", "lang"))
        .where(col("status").isin("added", "changed"))
        .select("doc_id")
        .join(today.select("doc_id", "text"), "doc_id")
      val gated = delta.where(
        graft.functions.TextAnalysis.tokenCount(col("text")) >= 5 &&
          length(col("text")) <= 20000)
      val hist = t(s, dir, "documents")
      val sigTable = ensureSigTable(s, dir, "graft_sigs_hist_", hist)
      Dedup.minHashLshPairsIncremental(gated, hist, sigTable, "text",
        "doc_id", jaccardThreshold = 0.5)
    }),
    "q_multimodal_meta" -> ((s, dir) => {
      graft.multimodal.Multimodal
        .attachBinary(t(s, dir, "documents"), "text")
        .select(
          col("doc_id"),
          col("media_meta.kind").as("kind"),
          col("media_meta.size_bytes").as("size_bytes"),
          col("media_meta.checksum").as("checksum"))
    }),
    "q_multimodal_decode" -> ((s, dir) => {
      // REAL decode: synthesize PNG bytes (ImageIO encoder) from the
      // doc_id, decode them back with ImageIO, emit geometry + exact
      // channel means. The pixel pattern is wrap-free affine, so the
      // oracle recomputes the identical doubles arithmetically.
      val imgs = graft.multimodal.Multimodal
        .synthesizePng(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      graft.multimodal.Multimodal
        .decodeImage(imgs, "payload")
        .select(
          col("doc_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
    }),
    "q_image_luma" -> ((s, dir) => {
      // Flat-image filter over the real decode: exact integer luma
      // sums, variance numerator n·Q − S² in exact longs, so the
      // 6 dp roundings sit on power-of-small-int denominators and
      // can never hit a half boundary.
      val imgs = graft.multimodal.Multimodal
        .synthesizePng(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      graft.multimodal.Multimodal
        .lumaStats(imgs, "payload", flatVar = 10.0)
        .select("doc_id", "width", "height", "mean_luma", "var_luma", "is_flat")
    }),
    "q_multimodal_resize" -> ((s, dir) => {
      // Full real-codec chain: synthesize PNG → decode → NN-resample
      // to 8×8 → re-encode PNG → decode again. The NN mapping
      // dst(x,y)=src(⌊x·w/8⌋,⌊y·h/8⌋) over the wrap-free pattern
      // keeps the channel means closed-form for the oracle.
      val imgs = graft.multimodal.Multimodal
        .synthesizePng(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val resized = graft.multimodal.Multimodal
        .resizeImage(imgs, "payload", targetW = 8, targetH = 8)
        .select("doc_id", "resized")
      graft.multimodal.Multimodal
        .decodeImage(resized, "resized")
        .select(
          col("doc_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
    }),
    "q_multimodal_dhash" -> ((s, dir) => {
      // Full real-codec perceptual-hash chain: synthesize PNG →
      // ImageIO decode → 9×8 floor-NN luma grid → 64 gradient bits
      // as hex. Every bit is closed-form over the affine pixel
      // pattern, so the oracle rebuilds the identical code.
      val imgs = graft.multimodal.Multimodal
        .synthesizePng(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      graft.multimodal.Multimodal.dHash(imgs, "payload")
        .select("doc_id", "dhash")
    }),
    "q_multimodal_dhash_pairs" -> ((s, dir) => {
      // End-to-end image near-dup over the DIVERSE synthesis:
      // near-dup groups of 3 byte-identical PNGs (pair population
      // linear in corpus size) with LCG-striped content (hash
      // diversity grows with the corpus, chunk buckets stay under
      // the cap at sf1) → real decode → dHash → chunk-blocked
      // Hamming pairing. The smooth-gradient corpus (q_multimodal_
      // dhash) and the DedupSpec flood case keep the cap covered.
      val imgs = graft.multimodal.Multimodal
        .synthesizePngDiverse(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val codes = graft.multimodal.Multimodal.dHash(imgs, "payload")
        .select("doc_id", "dhash")
      Dedup.hammingPairs64(codes, "dhash", "doc_id", maxHamming = 2)
    }),
    "q_video_meta" -> ((s, dir) => {
      // Video container audit: synthesize GVID (real PNG frames
      // inside) → full-directory-walk decode. n_frames comes from
      // the WALK (every declared frame must fit), not a header
      // echo; the oracle replays the deterministic synthesis
      // arithmetic.
      val vids = graft.multimodal.Multimodal.synthesizeVideo(
        Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      graft.multimodal.Multimodal.decodeVideoMeta(vids, "payload")
        .select(col("doc_id"), col("n_frames"), col("fps"))
    }),
    "q_video_frames" -> ((s, dir) => {
      // Frame-sampling handoff to the real image path: GVID → every
      // 2nd frame exploded to its PNG bytes → the UNCHANGED ImageIO
      // decodeImage → per-frame geometry + exact channel means. The
      // per-frame affine pattern keeps every mean closed-form.
      val vids = graft.multimodal.Multimodal.synthesizeVideo(
        Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val frames = graft.multimodal.Multimodal.sampleFrames(
        vids, "payload", every = 2).drop("payload")
      graft.multimodal.Multimodal.decodeImage(frames, "frame")
        .select(
          col("doc_id"), col("frame_idx"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
    }),
    "q_video_scenes" -> ((s, dir) => {
      // Shot-boundary detection end-to-end: all frames → real decode
      // → Rec.601 luma per frame → per-video lag window → |Δluma| >
      // 40 cuts (the synthetic per-frame base advance wraps its
      // channel modulus at deterministic frames — those wraps ARE
      // the scene cuts; min margin to the threshold ≈ 7 luma units,
      // so double-rounding can never flip a flag). Bounded output:
      // one row per video.
      val vids = graft.multimodal.Multimodal.synthesizeVideo(
        Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val frames = graft.multimodal.Multimodal.sampleFrames(
        vids, "payload", every = 1).drop("payload")
      val stats = graft.multimodal.Multimodal.decodeImage(frames, "frame")
      graft.multimodal.Multimodal.sceneCuts(stats, "doc_id")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("is_cut"), 1L).otherwise(0L)).as("n_cuts"))
    }),
    "q_video_dhash_pairs" -> ((s, dir) => {
      // End-to-end VIDEO near-dup: DIVERSE GVID synthesis (byte-
      // identical groups of 3, per-(group, frame) unique codes) →
      // real frame decode → per-frame dHash → position-aligned
      // signature pairing. The composition point: video dedup is the
      // image path plus ONE positioned pairing operator.
      val vids = graft.multimodal.Multimodal.synthesizeVideoDiverse(
        Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val frames = graft.multimodal.Multimodal.sampleFrames(
        vids, "payload", every = 1).drop("payload")
      val codes = graft.multimodal.Multimodal.dHash(frames, "frame")
        .select(col("doc_id"), col("frame_idx"), col("dhash"))
      Dedup.alignedSignaturePairs(
        codes, "doc_id", "frame_idx", "dhash", minMatchFrac = 0.5)
    }),
    "q_video_dedup_apply" -> ((s, dir) => {
      // The full video dedup pipeline: detect (row 184's aligned
      // pairing) AND apply (row 40's keep-smallest anti-join) — the
      // corpus that ships. One surviving video per 3-clone group.
      val docs = t(s, dir, "documents")
      val vids = graft.multimodal.Multimodal.synthesizeVideoDiverse(
        Parallelism.spread(docs.select("doc_id")), "doc_id")
      val frames = graft.multimodal.Multimodal.sampleFrames(
        vids, "payload", every = 1).drop("payload")
      val codes = graft.multimodal.Multimodal.dHash(frames, "frame")
        .select(col("doc_id"), col("frame_idx"), col("dhash"))
      val pairs = Dedup.alignedSignaturePairs(
        codes, "doc_id", "frame_idx", "dhash", minMatchFrac = 0.5)
      Dedup.dropNearDuplicates(
        docs.select("doc_id", "lang", "source"), pairs, "doc_id")
    }),
    "q_audio_hash" -> ((s, dir) => {
      // Audio perceptual hash end-to-end: synthesize WAV → real
      // javax.sound decode → 64 window-energy threshold bits as hex.
      // The integer-exact bit rule makes every bit closed-form over
      // the periodic sample pattern.
      val wavs = graft.multimodal.Multimodal
        .synthesizeWav(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      graft.multimodal.Multimodal.aHash(wavs, "payload")
        .select("doc_id", "ahash")
    }),
    "q_audio_hash_pairs" -> ((s, dir) => {
      // Audio near-dup: aHash codes through the UNCHANGED 64-bit
      // Hamming pairing — the same chunk-blocked join images use.
      val wavs = graft.multimodal.Multimodal
        .synthesizeWav(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val codes = graft.multimodal.Multimodal.aHash(wavs, "payload")
        .select("doc_id", "ahash")
      Dedup.hammingPairs64(codes, "ahash", "doc_id", maxHamming = 2)
    }),
    "q_audio_resample" -> ((s, dir) => {
      // Audio transform step 1: REAL WAV → 8 kHz → 12 kHz linear
      // resample in exact integer arithmetic → REAL WAV → decode.
      // Every output sample is the closed form
      // s(i0) + ⌊(s(i1)−s(i0))·frac/12000⌋ over the periodic synth
      // pattern, so the oracle replays the full resampled stream.
      val wavs = graft.multimodal.Multimodal
        .synthesizeWav(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val rs = graft.multimodal.Multimodal
        .resampleWav(wavs, "payload", targetRate = 12000)
      graft.multimodal.Multimodal
        .decodeWav(rs, "resampled")
        .select(
          col("doc_id"), col("n_samples"),
          col("sample_rate").cast("long").as("sample_rate"),
          round(col("mean_amp"), 6).as("mean_amp"))
    }),
    "q_audio_normalize" -> ((s, dir) => {
      // Audio transform step 2: REAL WAV → peak-normalize to ±30000
      // via exact floor division → REAL WAV → decode. peak has a
      // closed form over the synth pattern (max(|base|, |base+120|)),
      // so every scaled sample — and the decoded mean — replays.
      val wavs = graft.multimodal.Multimodal
        .synthesizeWav(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val nz = graft.multimodal.Multimodal
        .peakNormalizeWav(wavs, "payload", targetPeak = 30000)
      graft.multimodal.Multimodal
        .decodeWav(nz, "normalized")
        .select(
          col("doc_id"), col("n_samples"),
          col("sample_rate").cast("long").as("sample_rate"),
          round(col("mean_amp"), 6).as("mean_amp"))
    }),
    "q_audio_pipeline" -> ((s, dir) => {
      // The full audio prep COMPOSITION: synthesize → resample to
      // the model rate → peak-normalize → perceptual aHash — the
      // chain a multimodal corpus prep actually runs before
      // near-dup pairing/training, every stage the REAL codec path.
      // Each intermediate is integer-exact, so the oracle replays
      // resampled samples → per-doc peak → scaled samples → all 64
      // window-energy bits → the hex code, end to end.
      val wavs = graft.multimodal.Multimodal
        .synthesizeWav(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      val rs = graft.multimodal.Multimodal
        .resampleWav(wavs, "payload", targetRate = 12000)
      val nz = graft.multimodal.Multimodal
        .peakNormalizeWav(rs, "resampled", targetPeak = 30000)
      graft.multimodal.Multimodal.aHash(nz, "normalized")
        .select("doc_id", "ahash")
    }),
    "q_audio_stats" -> ((s, dir) => {
      // Silence/clipping gate over the real decoder: thresholds
      // placed inside the synthetic amplitude range (|s| ≤ 32 silent,
      // ≥ 500 "hot") so both branches count real samples.
      val wavs = graft.multimodal.Multimodal
        .synthesizeWav(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      graft.multimodal.Multimodal
        .audioStats(wavs, "payload", silenceThreshold = 32, clipThreshold = 500)
        .select("doc_id", "n_samples", "peak", "silence_ratio", "clip_ratio", "rms")
    }),
    "q_multimodal_audio" -> ((s, dir) => {
      // REAL WAV round trip via javax.sound.sampled; same closed-form
      // oracle idea as q_multimodal_decode.
      val wavs = graft.multimodal.Multimodal
        .synthesizeWav(
          Parallelism.spread(t(s, dir, "documents").select("doc_id")), "doc_id")
      graft.multimodal.Multimodal
        .decodeWav(wavs, "payload")
        .select(
          col("doc_id"), col("n_samples"),
          col("sample_rate").cast("long").as("sample_rate"),
          round(col("mean_amp"), 4).as("mean_amp"))
    }))

  /** Fixed centering mean for q_center: exact 1/64 multiples, so the
    * decimal literals parse to bit-identical doubles in both engines.
    */
  private val centerMeans: Seq[Double] =
    (0 until 64).map(i => (i % 7 - 3) / 64.0)

  /** Shared component-labeling CTE chain (threshold pairs →
    * bidirectional edges → recursive reach → min-label `lab`), used
    * by both the clusters oracles and the cluster-split oracle so
    * the two replays of the dedup contract can never drift.
    */
  private lazy val clusterLabelCtes: String =
    """pairs AS (SELECT id_a, id_b FROM mh WHERE jac >= 0.5),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
      |lab AS (SELECT id, min(r) AS label FROM reach GROUP BY 1)""".stripMargin

  /** Shared dHash replay: closed-form floor-NN luma over the affine
    * synthesized pixels → 64 gradient bits → two 32-bit halves
    * `agg(doc_id, hi, lo)`. Used by `q_multimodal_dhash` (hex code)
    * and `q_multimodal_dhash_pairs` (chunk-blocked Hamming join).
    */
  private lazy val dhashCtes: String =
    """g AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h
      |  FROM documents),
      |l AS (SELECT doc_id, x, y,
      |    (299*(doc_id % 128 + 3*((x*w)//9) + 5*((y*h)//8)) +
      |     587*((3*doc_id) % 100 + 2*((x*w)//9) + 4*((y*h)//8)) +
      |     114*((5*doc_id) % 150 + ((x*w)//9) + ((y*h)//8))) // 1000 AS lum
      |  FROM g, range(0, 8) ty(y), range(0, 9) tx(x)),
      |d AS (SELECT a.doc_id, (a.y*8 + a.x)::INT AS i,
      |    CASE WHEN b.lum > a.lum THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM l a JOIN l b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
      |  WHERE a.x < 8),
      |agg AS (SELECT doc_id,
      |    sum(CASE WHEN i >= 32 THEN bit << (i - 32) ELSE 0 END)::BIGINT AS hi,
      |    sum(CASE WHEN i < 32 THEN bit << i ELSE 0 END)::BIGINT AS lo
      |  FROM d GROUP BY 1)""".stripMargin

  /** Frame-level DIVERSE dHash replay (q_video_dhash_pairs):
    * [[dhashDiverseCtes]] with the per-frame base advances and the
    * g·7+f stripe re-seed, one (doc_id, f) hash row per frame →
    * `hx(doc_id, f, sig)` + `nf(doc_id, nf)`.
    */
  private lazy val videoDhashDiverseCtes: String =
    """gs AS (SELECT doc_id, doc_id // 3 AS g FROM documents),
      |gf AS (SELECT doc_id, g, unnest(range(0, 3 + g % 4)) AS f FROM gs),
      |gg0 AS (SELECT doc_id, g, f, 8 + g % 9 AS w, 8 + (g // 9) % 9 AS h,
      |    ((g * 7 + f) * 1103515245 + 12345) % 2147483648 AS h0 FROM gf),
      |gg AS (SELECT doc_id, g, f, w, h, xor(h0, h0 >> 16) AS hh FROM gg0),
      |l AS (SELECT doc_id, f, x, y,
      |    (299*((g + 17*f) % 96 + 3*((x*w)//9) + 5*((y*h)//8) + 40*((hh >> ((((x*w)//9) + ((y*h)//8)) % 31)) & 1)) +
      |     587*((3*g + 29*f) % 100 + 2*((x*w)//9) + 4*((y*h)//8)) +
      |     114*((5*g + 31*f) % 150 + ((x*w)//9) + ((y*h)//8))) // 1000 AS lum
      |  FROM gg, range(0, 8) ty(y), range(0, 9) tx(x)),
      |d AS (SELECT a.doc_id, a.f, (a.y*8 + a.x)::INT AS i,
      |    CASE WHEN b.lum > a.lum THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM l a JOIN l b ON b.doc_id = a.doc_id AND b.f = a.f
      |    AND b.y = a.y AND b.x = a.x + 1
      |  WHERE a.x < 8),
      |agg AS (SELECT doc_id, f,
      |    sum(CASE WHEN i >= 32 THEN bit << (i - 32) ELSE 0 END)::BIGINT AS hi,
      |    sum(CASE WHEN i < 32 THEN bit << i ELSE 0 END)::BIGINT AS lo
      |  FROM d GROUP BY 1, 2),
      |hx AS (SELECT doc_id, f, printf('%08x%08x', hi, lo) AS sig FROM agg),
      |nf AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY 1)""".stripMargin

  /** Shared aHash replay: the periodic WAV sample pattern is
    * closed-form, so window-energy sums are exact integer aggregates
    * and the bit rule (sum_j·n > S·cnt_j) replays verbatim →
    * `agg(doc_id, hi, lo)`, same two-half packing as [[dhashCtes]].
    */
  private lazy val ahashCtes: String =
    """ac AS (SELECT doc_id, 160 + 16 * (doc_id % 5) AS n,
      |    4 * (doc_id % 256) AS base FROM documents),
      |sm AS (SELECT doc_id, n, (i * 64) // n AS w,
      |    abs(base + 8 * (i % 16) - 512) AS a
      |  FROM ac, range(0, 224) t(i) WHERE i < n),
      |wn AS (SELECT doc_id, n, w, sum(a) AS sw, count(*) AS cw
      |  FROM sm GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, sum(sw) AS s FROM wn GROUP BY 1),
      |bits AS (SELECT wn.doc_id, w::INT AS i,
      |    CASE WHEN sw * n > s * cw THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM wn JOIN tot USING (doc_id)),
      |agg AS (SELECT doc_id,
      |    sum(CASE WHEN i >= 32 THEN bit << (i - 32) ELSE 0 END)::BIGINT AS hi,
      |    sum(CASE WHEN i < 32 THEN bit << i ELSE 0 END)::BIGINT AS lo
      |  FROM bits GROUP BY 1)""".stripMargin

  /** Shared DIVERSE-pattern dHash replay (q_multimodal_dhash_pairs):
    * group seed g = doc_id div 3, LCG stripe bit per pixel column on
    * the R channel, same floor-NN luma sampling and two-half packing
    * as [[dhashCtes]].
    */
  private lazy val dhashDiverseCtes: String =
    """gs AS (
      |  SELECT doc_id, doc_id // 3 AS g FROM documents),
      |gg0 AS (SELECT doc_id, g, 8 + g % 9 AS w, 8 + (g // 9) % 9 AS h,
      |    (g * 1103515245 + 12345) % 2147483648 AS h0 FROM gs),
      |gg AS (SELECT doc_id, g, w, h, xor(h0, h0 >> 16) AS hh FROM gg0),
      |l AS (SELECT doc_id, x, y,
      |    (299*(g % 96 + 3*((x*w)//9) + 5*((y*h)//8) + 40*((hh >> ((((x*w)//9) + ((y*h)//8)) % 31)) & 1)) +
      |     587*((3*g) % 100 + 2*((x*w)//9) + 4*((y*h)//8)) +
      |     114*((5*g) % 150 + ((x*w)//9) + ((y*h)//8))) // 1000 AS lum
      |  FROM gg, range(0, 8) ty(y), range(0, 9) tx(x)),
      |d AS (SELECT a.doc_id, (a.y*8 + a.x)::INT AS i,
      |    CASE WHEN b.lum > a.lum THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM l a JOIN l b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
      |  WHERE a.x < 8),
      |agg AS (SELECT doc_id,
      |    sum(CASE WHEN i >= 32 THEN bit << (i - 32) ELSE 0 END)::BIGINT AS hi,
      |    sum(CASE WHEN i < 32 THEN bit << i ELSE 0 END)::BIGINT AS lo
      |  FROM d GROUP BY 1)""".stripMargin

  /** hammingPairs64 replay over any `agg(doc_id, hi, lo)` CTE chain:
    * 4×16-bit chunk blocking with the 2..1000 bucket-size keep
    * window, candidates verified by exact two-half Hamming — the
    * same arithmetic as Dedup.hammingPairs64. Shared by the image
    * (dHash) and audio (aHash) pairing oracles.
    */
  private def hamming64PairsSql(ctes: String): String =
    s"""WITH $ctes,
       |ch AS (SELECT doc_id, hi, lo, p.pos AS bpos,
       |    CASE p.pos WHEN 0 THEN lo & 65535
       |         WHEN 1 THEN (lo >> 16) & 65535
       |         WHEN 2 THEN hi & 65535
       |         ELSE (hi >> 16) & 65535 END AS bkey
       |  FROM agg, range(0, 4) p(pos)),
       |kept AS (SELECT bpos, bkey FROM ch GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND 1000),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
       |  FROM ch a
       |  JOIN kept k ON a.bpos = k.bpos AND a.bkey = k.bkey
       |  JOIN ch b ON b.bpos = a.bpos AND b.bkey = a.bkey
       |  WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  (bit_count(xor(ha, hb)) + bit_count(xor(la, lb)))::INT AS hamming
       |FROM cand
       |WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 2""".stripMargin

  private lazy val clustersOracleSql: String =
    s"""WITH RECURSIVE $minhashCtes,
       |$clusterLabelCtes
       |SELECT id, label FROM lab""".stripMargin

  /** IVF search oracle with a parameterized centroid predicate:
    * `q_ann_ivf`/`q_ann_ivf_index` sample the full corpus; the append
    * twin freezes the centroid set to the BUILD slice (appended rows
    * are searchable but never centroids — the `__cen` marker).
    */
  private def ivfOracle(cenWhere: String, matchCols: Seq[String] = Nil): String = {
    // matchCols replay filteredTopKFromIndex: the attribute columns
    // ride the assignment/query rows as payload and join as EXTRA
    // equality keys on the candidate join — probes stay global.
    val mc = matchCols.map(c => s", $c").mkString
    val using = ("cid" +: matchCols).mkString(", ")
    s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE $cenWhere),
       |ca AS (SELECT vec_id AS corpus_id, embedding AS cv, cid$mc,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
       |  FROM embeddings, cen),
       |caf AS (SELECT corpus_id, cv, cid$mc FROM ca WHERE rn = 1),
       |qa AS (SELECT vec_id AS query_id, embedding AS qv, cid$mc,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
       |  FROM embeddings, cen WHERE vec_id < 5),
       |qaf AS (SELECT query_id, qv, cid$mc FROM qa WHERE rn <= 2),
       |s AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine
       |  FROM caf JOIN qaf USING ($using)),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s)
       |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM r WHERE rank <= 10""".stripMargin
  }

  private lazy val ivfOracleSql: String = ivfOracle("vec_id % 100 = 0")

  /** The cluster-routed replay (q_kmeans Lloyd chain with SCRAMBLED
    * seed selection → final member assignment → probe ranking on
    * unrounded cosine → exact within-cluster rank on the rounded
    * cosine — the ivfSearch ordering contract). `basePred` scopes the
    * FIT to a corpus slice; `batchPred` (optional) assigns an
    * appended slice to the frozen fitted centroids WITHOUT letting it
    * seed or update them — the q_ann_kmeans_append replay.
    */
  private def clusterRoutedOracle(
      basePred: String = "TRUE", batchPred: String = ""): String = {
    val batchCtes =
      if (batchPred.isEmpty) "all_m AS (SELECT corpus_id, cv, cid FROM a2f),"
      else
        s"""bat AS (SELECT vec_id, embedding FROM embeddings WHERE $batchPred),
           |ab AS (SELECT vec_id AS corpus_id, embedding AS cv, cid,
           |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
           |  FROM bat, c1),
           |abf AS (SELECT corpus_id, cv, cid FROM ab WHERE rn = 1),
           |all_m AS (SELECT corpus_id, cv, cid FROM a2f
           |  UNION ALL SELECT corpus_id, cv, cid FROM abf),""".stripMargin
    s"""WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE $basePred),
       |st AS (SELECT CAST(ceil(count(*) / 200.0) AS BIGINT) AS stride FROM base),
       |c0 AS (SELECT vec_id AS cid, embedding AS cvec FROM base, st
       |  WHERE (((vec_id % 1000003) * 2654435761) % 1000003) % stride = 0),
       |a1 AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
       |  FROM base, c0),
       |a1f AS (SELECT vec_id, embedding, cid FROM a1 WHERE rn = 1),
       |px AS (SELECT cid, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS pos FROM a1f),
       |pm AS (SELECT cid, pos, round(avg(x::DOUBLE), 6) AS m FROM px GROUP BY 1, 2),
       |c1 AS (SELECT cid, list(m ORDER BY pos) AS cvec FROM pm GROUP BY 1),
       |a2 AS (SELECT vec_id AS corpus_id, embedding AS cv, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
       |  FROM base, c1),
       |a2f AS (SELECT corpus_id, cv, cid FROM a2 WHERE rn = 1),
       |$batchCtes
       |pr AS (SELECT vec_id AS query_id, embedding AS qv, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
       |  FROM embeddings, c1 WHERE vec_id < 5),
       |prf AS (SELECT query_id, qv, cid FROM pr WHERE rn <= 4),
       |sc AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine
       |  FROM all_m JOIN prf USING (cid)),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM sc)
       |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM rk WHERE rank <= 10""".stripMargin
  }

  /** ALGORITHMIC byte-level BPE replay for the oracle: per distinct
    * (word, space-prefixed?) unit, 12 unrolled lowest-rank merge
    * steps over the fixture's merge table (enough for the corpus's
    * ≤ 11-symbol units — each step merges at least one pair or the
    * unit is final). The single-space corpus contract (validated: no
    * doubled/leading/trailing whitespace) makes the pre-tokenizer
    * exactly "first word bare, later words Ġ-prefixed", and the
    * fixture contains no self-pair merges, so one merge step is the
    * independent-position rewrite below (a self-pair would need the
    * left-to-right scan GPT-2 defines — covered in BpeSpec, excluded
    * from the fixture by construction).
    */
  private lazy val bpeOracleCtes: String = {
    val merges = graft.functions.Bpe.testFixture.merges
    def esc(s: String) = s.replace("'", "''")
    val values = merges.zipWithIndex.map { case ((f, s), r) =>
      s"($r, '${esc(f)}', '${esc(s)}', '${esc(f + " " + s)}')"
    }.mkString(", ")
    val steps = (1 to 12).map { k =>
      s"""s$k AS (SELECT unit, CASE WHEN b.mf IS NULL THEN q.l ELSE
         |  list_filter(list_transform(range(1, len(q.l) + 1), i ->
         |    CASE WHEN i < len(q.l) AND q.l[i] = b.mf AND q.l[i + 1] = b.ms THEN b.mf || b.ms
         |         WHEN i > 1 AND q.l[i - 1] = b.mf AND q.l[i] = b.ms THEN NULL
         |         ELSE q.l[i] END), x -> x IS NOT NULL) END AS l
         |  FROM (SELECT unit, l, (SELECT min(m.rnk) FROM bpe_merges m
         |    WHERE list_contains(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1]), m.pair)) AS r
         |    FROM s${k - 1}) q LEFT JOIN bpe_merges b ON b.rnk = q.r)""".stripMargin
    }.mkString(",\n")
    s"""bpe_merges(rnk, mf, ms, pair) AS (VALUES $values),
       |btk AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents),
       |bpos AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS i, ws FROM btk),
       |bu AS (SELECT DISTINCT CASE WHEN i = 1 THEN ws[i] ELSE 'Ġ' || ws[i] END AS unit FROM bpos),
       |s0 AS (SELECT unit, list_transform(range(1, length(unit) + 1), i -> unit[i]) AS l FROM bu),
       |$steps,
       |bucnt AS (SELECT unit, len(l) AS n FROM s12),
       |bdtok AS (SELECT p.doc_id, sum(c.n) AS tokens FROM bpos p JOIN bucnt c
       |  ON c.unit = CASE WHEN p.i = 1 THEN p.ws[p.i] ELSE 'Ġ' || p.ws[p.i] END GROUP BY 1)""".stripMargin
  }

  /** Crafted crawl damage for q_fix_encoding / q_crawl_clean: every
    * mojibake key once (space-separated), a CRLF, and stray C0/DEL
    * controls. Derived from [[graft.functions.TextAnalysis
    * .mojibakePairs]] so the injection and the repair chain can never
    * drift apart.
    */
  private lazy val dirtySuffix: String =
    " " + graft.functions.TextAnalysis.mojibakePairs.map(_._1).mkString(" ") +
      "\r\n\u0001mid\u0007line\u007f end"

  private def sqlQ(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB replay of [[graft.functions.TextAnalysis.fixEncoding]]:
    * the identical literal replace chain (generated from the same
    * pair list), CRLF fold, and control-class strip.
    */
  private def fixEncodingSqlChain(inner: String): String = {
    val chain = graft.functions.TextAnalysis.mojibakePairs.foldLeft(inner) {
      case (acc, (k, v)) => s"replace($acc, ${sqlQ(k)}, ${sqlQ(v)})"
    }
    val lf = s"replace(replace($chain, chr(13) || chr(10), chr(10)), chr(13), chr(10))"
    s"regexp_replace($lf, '${graft.functions.TextAnalysis.controlCharClass}', '', 'g')"
  }

  /** DuckDB replay of [[graft.functions.TextAnalysis.stripHtml]] —
    * the q_html_text chain as a composable helper (tag strip, entity
    * decode in the exact Scala order, whitespace collapse).
    */
  private def stripHtmlSqlChain(inner: String): String = {
    val t1 = s"regexp_replace(regexp_replace(regexp_replace(regexp_replace($inner, " +
      "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
      "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
      "'(?s)<!--.*?-->', ' ', 'g'), " +
      "'(?s)<[A-Za-z!/][^>]*>', ' ', 'g')"
    val t2 = s"replace(replace(replace(replace(replace(replace(replace(replace($t1, " +
      "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&apos;', ''''), " +
      "'&#39;', ''''), '&#34;', '\"'), '&nbsp;', ' '), '&amp;', '&')"
    s"trim(regexp_replace($t2, '\\s+', ' ', 'g'))"
  }

  /** The fixture vocab as a VALUES table for the [[bpeOracleCtes]]
    * consumers that need token IDS (q_pack_shards): symbol → id,
    * the same mapping [[graft.functions.Bpe.bpeTokenIds]] applies.
    */
  private lazy val bpeVocabCte: String = {
    val vocab = graft.functions.Bpe.testFixture.vocab
    def esc(s: String) = s.replace("'", "''")
    val values = vocab.toSeq.sortBy(_._2)
      .map { case (sym, id) => s"('${esc(sym)}', $id)" }.mkString(", ")
    s"bpe_vocab(sym, id) AS (VALUES $values)"
  }

  /** Unrolled Viterbi DP chain for the unigram oracles: per position
    * i = 1..`unroll`, extend every best prefix state j = i − L
    * (L ≤ `maxPieceLen`) with a vocabulary piece and keep the
    * per-unit argmax under the documented tie-break (score DESC,
    * pieces ASC, last-piece length DESC) — the exact
    * [[graft.functions.Unigram.viterbi]] cell rule. `ns` prefixes
    * the CTE names (`ub$ns$i` accumulator / `us$ns$i` step); the
    * chain ends in `uf$ns(unit [, c], np [, seg])` — final states at
    * j = unit length. Accumulators are MATERIALIZED: each level is
    * referenced twice (step i+1 and the next accumulator) and would
    * otherwise inline 2^unroll times.
    */
  private def unigramDpChain(
      ns: String,
      unitsCte: String,
      scoresCte: String,
      unroll: Int,
      maxPieceLen: Int,
      withCount: Boolean,
      withSeg: Boolean): String = {
    val cCol = if (withCount) ", c" else ""
    val segCol = if (withSeg) ", seg" else ""
    val cols = s"unit$cCol, n, j, sc, np$segCol"
    val base =
      s"""ub${ns}0 AS (SELECT unit$cCol, length(unit) AS n, 0 AS j,
         |  0::BIGINT AS sc, 0 AS np${if (withSeg) ", []::VARCHAR[] AS seg" else ""}
         |  FROM $unitsCte)""".stripMargin
    val steps = (1 to unroll).map { i =>
      val segSel = if (withSeg) ", list_append(b.seg, v.piece) AS seg" else ""
      s"""us$ns$i AS (SELECT $cols FROM (
         |  SELECT b.unit${if (withCount) ", b.c" else ""}, b.n, $i AS j,
         |    b.sc + v.s AS sc, b.np + 1 AS np$segSel,
         |    row_number() OVER (PARTITION BY b.unit
         |      ORDER BY b.sc + v.s DESC, b.np + 1 ASC, length(v.piece) DESC) AS rn
         |  FROM ub$ns${i - 1} b JOIN $scoresCte v
         |    ON b.n >= $i AND $i - b.j BETWEEN 1 AND $maxPieceLen
         |    AND v.piece = substr(b.unit, b.j + 1, $i - b.j)
         |) WHERE rn = 1),
         |ub$ns$i AS MATERIALIZED (SELECT $cols FROM ub$ns${i - 1}
         |  UNION ALL SELECT $cols FROM us$ns$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$steps,
       |uf$ns AS (SELECT unit$cCol, np$segCol FROM ub$ns$unroll WHERE j = n)""".stripMargin
  }

  /** ALGORITHMIC replay of the UNIGRAM TRAINER
    * ([[graft.functions.Unigram.train]]): substring seeding with
    * Laplace-smoothed micro-nat scores, `emRounds` unrolled hard-EM
    * rounds (Viterbi DP chain → exact integer re-counts → re-score,
    * zero-count symbols re-entering at the +1-smoothed floor), then
    * the (count DESC, piece ASC) prune and the final re-score over
    * the pruned vocabulary. Output = the learned multi-symbol pieces
    * (rank, piece, score).
    */
  private def unigramTrainOracle(
      numMulti: Int,
      emRounds: Int,
      maxPieceLen: Int,
      maxUnitLen: Int): String = {
    // references t/v from whichever tv-CTE is cross-joined in scope
    val scoreSql = (w: String) =>
      s"floor(1e6 * ln(($w + 1)::DOUBLE / (t + v)::DOUBLE))"
    val rounds = (1 to emRounds).map { r =>
      val dp = unigramDpChain(s"r$r", "uc", s"sc${r - 1}", maxUnitLen,
        maxPieceLen, withCount = true, withSeg = true)
      s"""$dp,
         |cn$r AS MATERIALIZED (SELECT p AS piece, sum(c) AS w FROM
         |  (SELECT c, unnest(seg) AS p FROM ufr$r) GROUP BY 1),
         |tv$r AS (SELECT (SELECT sum(w) FROM cn$r) AS t,
         |  256 + (SELECT count(*) FROM cn$r WHERE length(piece) >= 2) AS v),
         |sc$r AS MATERIALIZED (
         |  SELECT piece, ${scoreSql("w")}::BIGINT AS s FROM cn$r, tv$r
         |  UNION ALL
         |  SELECT sy.piece, ${scoreSql("0")}::BIGINT FROM syms sy, tv$r
         |  WHERE sy.piece NOT IN (SELECT piece FROM cn$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH tk AS (SELECT list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws FROM documents),
       |pos AS (SELECT unnest(range(1, len(ws) + 1)) AS i, ws FROM tk),
       |uc0 AS (SELECT CASE WHEN i = 1 THEN ws[i] ELSE 'Ġ' || ws[i] END AS unit, count(*) AS c FROM pos GROUP BY 1),
       |uc AS MATERIALIZED (SELECT unit, c FROM uc0 WHERE length(unit) <= $maxUnitLen),
       |sub AS (SELECT unit, c, unnest(range(1, length(unit) + 1)) AS st FROM uc),
       |sd AS MATERIALIZED (SELECT substr(unit, st::INT, L::INT) AS piece, sum(c) AS w
       |  FROM sub, (SELECT unnest(range(1, ${maxPieceLen + 1})) AS L) ls
       |  WHERE st + L - 1 <= length(unit) GROUP BY 1),
       |syms AS (SELECT DISTINCT piece FROM sd WHERE length(piece) = 1),
       |tv0 AS (SELECT (SELECT sum(w) FROM sd) AS t,
       |  256 + (SELECT count(*) FROM sd WHERE length(piece) >= 2) AS v),
       |sc0 AS MATERIALIZED (SELECT piece, ${scoreSql("w")}::BIGINT AS s FROM sd, tv0),
       |$rounds,
       |kept AS (SELECT piece, w FROM cn$emRounds WHERE length(piece) >= 2
       |  ORDER BY w DESC, piece LIMIT $numMulti),
       |tvf AS (SELECT ((SELECT sum(w) FROM kept)
       |    + (SELECT coalesce(sum(w), 0) FROM cn$emRounds WHERE length(piece) = 1)) AS t,
       |  256 + (SELECT count(*) FROM kept) AS v)
       |SELECT (row_number() OVER (ORDER BY w DESC, piece) - 1)::INT AS piece_rank,
       |  piece, ${scoreSql("w")}::INT AS score
       |FROM kept, tvf""".stripMargin
  }

  /** Shared CTE chain ending in `eucnt(unit, np, seg)` (per-unit
    * Viterbi piece count + segmentation) and `udtok(doc_id, tokens)`
    * (per-doc unigram piece counts) under the shipped
    * [[graft.functions.Unigram.testFixture]] (fixture pieces as a
    * VALUES table, Viterbi DP over DISTINCT units, join-back by
    * word position — the [[bpeOracleCtes]] shape). `echk` raises if
    * any unit exceeds the DP unroll, so a corpus change can never
    * silently under-count.
    */
  private lazy val unigramEncodeCtes: String = {
    val spec = graft.functions.Unigram.testFixture
    def esc(s: String) = s.replace("'", "''")
    val values = spec.pieces
      .map { case (p, sc) => s"('${esc(p)}', ${sc}::BIGINT)" }.mkString(", ")
    val unroll = 24
    val dp = unigramDpChain("e", "eu", "upieces", unroll,
      spec.maxPieceLen, withCount = false, withSeg = true)
    s"""upieces(piece, s) AS (VALUES $values),
       |etk AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws FROM documents),
       |epos AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS i, ws FROM etk),
       |eu AS MATERIALIZED (SELECT DISTINCT CASE WHEN i = 1 THEN ws[i] ELSE 'Ġ' || ws[i] END AS unit FROM epos),
       |echk AS (SELECT CASE WHEN coalesce(max(length(unit)), 0) > $unroll
       |  THEN error('unigram oracle: unit exceeds the DP unroll') ELSE 1 END AS ok FROM eu),
       |$dp,
       |eucnt AS (SELECT unit, np, seg FROM ufe, echk),
       |udtok AS (SELECT p.doc_id, sum(c.np) AS tokens FROM epos p JOIN eucnt c
       |  ON c.unit = CASE WHEN p.i = 1 THEN p.ws[p.i] ELSE 'Ġ' || p.ws[p.i] END GROUP BY 1)""".stripMargin
  }

  /** ALGORITHMIC replay of the BPE TRAINER for the oracle: `k`
    * unrolled steps, each aggregating weighted adjacent-pair counts
    * over the evolving unit states, picking the max (ties to the
    * byte-lexicographically smallest pair — identical to Scala's
    * UTF-16 ordering below U+10000), excluding already-learned pairs,
    * and rewriting states with the independent-position formula (the
    * corpus never elects a self-pair — validated at every SF; the
    * left-to-right scan a self-pair needs is spec'd in BpeSpec).
    */
  private def bpeTrainOracle(k: Int): String = {
    val steps = (1 to k).map { n =>
      // symbols never contain a raw space (0x20 maps to Ġ), so the
      // space-joined pair key is collision-free
      val excl =
        if (n == 1) ""
        else "WHERE f2 || ' ' || s2 NOT IN (" +
          (1 until n).map(j => s"SELECT f2 || ' ' || s2 FROM p$j").mkString(" UNION ALL ") + ")"
      // MATERIALIZED: each step reads its predecessor twice (pair
      // counts + rewrite); default CTE inlining would expand the
      // 16-step chain exponentially
      s"""pr$n AS (SELECT l[i] AS f2, l[i + 1] AS s2, sum(c) AS pc
         |  FROM (SELECT c, l, unnest(range(1, len(l))) AS i FROM t${n - 1})
         |  GROUP BY 1, 2),
         |p$n AS MATERIALIZED (SELECT f2, s2 FROM pr$n $excl ORDER BY pc DESC, f2, s2 LIMIT 1),
         |t$n AS MATERIALIZED (SELECT unit, c, CASE WHEN b.f2 IS NULL THEN q.l ELSE
         |  list_filter(list_transform(range(1, len(q.l) + 1), i ->
         |    CASE WHEN i < len(q.l) AND q.l[i] = b.f2 AND q.l[i + 1] = b.s2 THEN b.f2 || b.s2
         |         WHEN i > 1 AND q.l[i - 1] = b.f2 AND q.l[i] = b.s2 THEN NULL
         |         ELSE q.l[i] END), x -> x IS NOT NULL) END AS l
         |  FROM t${n - 1} q LEFT JOIN p$n b ON TRUE)""".stripMargin
    }.mkString(",\n")
    val winners = (1 to k)
      .map(n => s"SELECT ${n - 1} AS merge_rank, f2 AS lhs, s2 AS rhs FROM p$n")
      .mkString("\nUNION ALL ")
    s"""WITH tk AS (SELECT list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents),
       |pos AS (SELECT unnest(range(1, len(ws) + 1)) AS i, ws FROM tk),
       |uc AS (SELECT CASE WHEN i = 1 THEN ws[i] ELSE 'Ġ' || ws[i] END AS unit, count(*) AS c
       |  FROM pos GROUP BY 1),
       |t0 AS (SELECT unit, c, list_transform(range(1, length(unit) + 1), i -> unit[i]) AS l FROM uc),
       |$steps
       |$winners""".stripMargin
  }

  /** ALGORITHMIC replay of [[graft.operators.Graph.pageRank]] over
    * the q_pagerank injected host graph: `iters` unrolled
    * iterations, each computing 6 dp-rounded per-edge contributions
    * summed in exact DECIMAL(18,6), the DECIMAL-exact dangling mass,
    * and the damped update with the teleport term spelled as a
    * DOUBLE subtraction (`1.0::DOUBLE - 0.85::DOUBLE`) so DuckDB
    * reproduces the JVM's 0.0030000000000000005 bit pattern —
    * DECIMAL literals would subtract exactly and could flip a rank
    * sitting on a 6 dp rounding boundary.
    */
  /** ALGORITHMIC replay of [[graft.operators.Graph.hits]] over the
    * q_pagerank domain graph: `iters` unrolled weighted
    * L1-normalized rounds — h ← normalize(Σ_out w·a) then
    * a ← normalize(Σ_in w·h) — every score 6 dp, DECIMAL
    * contribution sums, identical coalesce/normalize order.
    */
  private def hitsOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""hr$k AS (SELECT ew.src AS node,
         |    sum(round(ew.w * a.authority, 6)::DECIMAL(18,6)) AS s
         |  FROM ew JOIN a${k - 1} a ON a.node = ew.dst GROUP BY 1),
         |ht$k AS (SELECT sum(s) AS t FROM hr$k),
         |h$k AS MATERIALIZED (SELECT nodes.node,
         |    round(coalesce(s, 0::DECIMAL(18,6))::DOUBLE / t::DOUBLE, 6)
         |      AS hub
         |  FROM nodes LEFT JOIN hr$k ON nodes.node = hr$k.node, ht$k),
         |ar$k AS (SELECT ew.dst AS node,
         |    sum(round(ew.w * h.hub, 6)::DECIMAL(18,6)) AS s
         |  FROM ew JOIN h$k h ON h.node = ew.src GROUP BY 1),
         |at$k AS (SELECT sum(s) AS t FROM ar$k),
         |a$k AS MATERIALIZED (SELECT nodes.node,
         |    round(coalesce(s, 0::DECIMAL(18,6))::DOUBLE / t::DOUBLE, 6)
         |      AS authority
         |  FROM nodes LEFT JOIN ar$k ON nodes.node = ar$k.node, at$k)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT 'd' || (doc_id % 50)::VARCHAR || '.ex.org' AS src,
       |    'd' || ((doc_id * 7 + 13) % 50)::VARCHAR || '.ex.org' AS dst
       |  FROM documents WHERE doc_id % 5 <> 4),
       |ew AS (SELECT src, dst, count(*)::DOUBLE AS w FROM e GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM ew UNION ALL SELECT dst FROM ew)),
       |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
       |a0 AS (SELECT node, round(1.0 / n, 6) AS authority FROM nodes, nn),
       |$steps
       |SELECT h$iters.node, hub, authority
       |FROM h$iters JOIN a$iters ON h$iters.node = a$iters.node"""
      .stripMargin
  }

  private def pageRankOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""c$k AS (SELECT ew.dst AS node,
         |    sum(round(r.rank * ew.w / ow.ow, 6)::DECIMAL(18,6)) AS cs
         |  FROM ew JOIN r${k - 1} r ON r.node = ew.src
         |  JOIN ow ON ow.src = ew.src GROUP BY 1),
         |d$k AS (SELECT coalesce(sum(r.rank::DECIMAL(18,6)), 0::DECIMAL(18,6)) AS dang
         |  FROM r${k - 1} r WHERE r.node NOT IN (SELECT src FROM ow)),
         |r$k AS MATERIALIZED (SELECT nodes.node,
         |    round((1.0::DOUBLE - 0.85::DOUBLE) / n + 0.85 * (coalesce(cs::DOUBLE, 0) + dang::DOUBLE / n), 6) AS rank
         |  FROM nodes LEFT JOIN c$k ON nodes.node = c$k.node, d$k, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT 'd' || (doc_id % 50)::VARCHAR || '.ex.org' AS src,
       |    'd' || ((doc_id * 7 + 13) % 50)::VARCHAR || '.ex.org' AS dst
       |  FROM documents WHERE doc_id % 5 <> 4),
       |ew AS (SELECT src, dst, count(*)::DOUBLE AS w FROM e GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM ew UNION ALL SELECT dst FROM ew)),
       |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
       |ow AS (SELECT src, sum(w) AS ow FROM ew GROUP BY 1),
       |r0 AS (SELECT node, round(1.0 / n, 6) AS rank FROM nodes, nn),
       |$steps
       |SELECT node, rank FROM r$iters""".stripMargin
  }

  /** ALGORITHMIC replay of [[graft.operators.Graph.labelPropagate]]
    * over the q_label_propagate injected graph: `iters` unrolled
    * clamped-seed rounds, each a vote count over the distinct
    * undirected edge set joined to the previous label frame, argmax
    * by (count desc, label asc), seeds always winning.
    */
  private def labelPropOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""v$k AS (SELECT und.d AS id, l.lab, count(*) AS c
         |  FROM und JOIN l${k - 1} l ON l.id = und.s GROUP BY 1, 2),
         |b$k AS (SELECT id, lab FROM (SELECT id, lab, row_number() OVER
         |    (PARTITION BY id ORDER BY c DESC, lab ASC) AS rn FROM v$k)
         |  WHERE rn = 1),
         |l$k AS MATERIALIZED (SELECT id, lab FROM seed UNION ALL
         |  SELECT b.id, b.lab FROM b$k b
         |  WHERE b.id NOT IN (SELECT id FROM seed))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT 'n' || (doc_id % 120)::VARCHAR AS s,
       |    'n' || ((doc_id * 3 + 7) % 120)::VARCHAR AS d
       |  FROM documents WHERE doc_id % 7 <> 6),
       |und AS (SELECT DISTINCT s, d FROM
       |  (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0)),
       |seed AS (SELECT 'n' || (doc_id % 120)::VARCHAR AS id,
       |    min('l' || (((doc_id % 120) // 10) % 3)::VARCHAR) AS lab
       |  FROM documents WHERE doc_id % 10 = 0 GROUP BY 1),
       |l0 AS (SELECT id, lab FROM seed),
       |$steps
       |SELECT l.id AS node_id, l.lab AS label,
       |  (s.id IS NOT NULL) AS seeded
       |FROM l$iters l LEFT JOIN seed s ON s.id = l.id""".stripMargin
  }

  /** Incremental (new-batch-vs-history) minhash pairs, GENERATED
    * from the SQL defining the new batch: history = plain
    * `documents`, batch = `newdocsSql`'s (doc_id, text) rows.
    * Mirrors Dedup.minHashLshPairsIncremental with the table-recorded
    * build parameters (shingleK=5, numHashes=8, bands=2). The
    * candidate join excludes same-id pairs (the Spark side's
    * id_a =!= id_b — a changed doc is not a near-dup of its own
    * previous version); the size prune is NOT replayed, it only
    * discards pairs whose jaccard bound is already < threshold.
    */
  private def incrementalCtesFor(newdocsSql: String): String = {
    val bands = 2
    val rows = 8 / bands
    val bandExprs = (0 until bands)
      .map(b => "md5(" + (0 until rows).map(r => s"sig[${b * rows + r + 1}]")
        .mkString(" || '|' || ") + ")")
      .mkString("[", ", ", "]")
    def shingleCase(src: String) =
      s"""SELECT doc_id, CASE WHEN length(text) >= 5
         |  THEN list_distinct(list_transform(range(0, length(text) - 4), i -> substr(text, i + 1, 5)))
         |  ELSE [text] END AS s FROM $src""".stripMargin
    s"""newdocs AS ($newdocsSql),
       |sho AS (${shingleCase("documents")}),
       |shn AS (${shingleCase("newdocs")}),
       |sgo AS (SELECT doc_id, ${minhashSigSql("s", 8)} AS sig FROM sho),
       |sgn AS (SELECT doc_id, ${minhashSigSql("s", 8)} AS sig FROM shn),
       |bdo AS (SELECT doc_id, $bandExprs AS bands FROM sgo),
       |bdn AS (SELECT doc_id, $bandExprs AS bands FROM sgn),
       |exo AS (${(0 until bands).map(b => s"SELECT doc_id, $b AS bpos, bands[${b + 1}] AS bkey FROM bdo").mkString(" UNION ALL ")}),
       |exn AS (${(0 until bands).map(b => s"SELECT doc_id, $b AS bpos, bands[${b + 1}] AS bkey FROM bdn").mkString(" UNION ALL ")}),
       |cand AS (SELECT DISTINCT o.doc_id AS id_a, n.doc_id AS id_b
       |  FROM exo o JOIN exn n ON o.bpos = n.bpos AND o.bkey = n.bkey AND o.doc_id <> n.doc_id),
       |mh AS (SELECT id_a, id_b,
       |  len(list_intersect(sa.s, sb.s))::DOUBLE / len(list_distinct(sa.s || sb.s))::DOUBLE AS jac
       |  FROM cand JOIN sho sa ON sa.doc_id = cand.id_a JOIN shn sb ON sb.doc_id = cand.id_b)""".stripMargin
  }

  private lazy val incrementalCtes: String = incrementalCtesFor(
    "SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 100 = 0")

  /** The weekly-recrawl delta for q_incremental_refresh: the
    * snapshotDiff added/changed slice of the q_snapshot_diff "today"
    * construction (m=5 re-ingests under +10M ids → added; m=4 " v2"
    * edits → changed), then the quality gate (≥5 whitespace tokens,
    * ≤20000 chars — the q_token_count replica).
    */
  private lazy val refreshDeltaSql: String =
    """SELECT doc_id, text FROM (
      |  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 5
      |  UNION ALL SELECT doc_id, text || ' v2' AS text FROM documents WHERE doc_id % 10 = 4)
      |WHERE (CASE WHEN text IS NULL OR trim(text) = '' THEN 0
      |    ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END) >= 5
      |  AND length(text) <= 20000""".stripMargin

  /** 16-bit integer from the first four md5 nibbles of `e` — the
    * DuckDB replay of graft's md5 hash bucket/keep-flag convention.
    */
  private def h16Sql(e: String): String =
    s"((strpos('0123456789abcdef', substr(md5($e), 1, 1)) - 1) * 4096 + " +
      s"(strpos('0123456789abcdef', substr(md5($e), 2, 1)) - 1) * 256 + " +
      s"(strpos('0123456789abcdef', substr(md5($e), 3, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr(md5($e), 4, 1)) - 1))"

  /** Integer from the first `nibbles` md5 hex digits of `e` — the
    * DuckDB replay of graft's `conv(substring(md5(v), 1, n), 16, 10)`
    * hash convention at any nibble width.
    */
  private def hNibSql(e: String, nibbles: Int): String =
    (0 until nibbles).map { i =>
      val pow = java.math.BigInteger.valueOf(16L).pow(nibbles - 1 - i)
      s"(strpos('0123456789abcdef', substr(md5($e), ${i + 1}, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")

  /** 60-bit variant of [[hNibSql]] — the KMV sketch's hash
    * (Profile.distinctKmv's `conv(substring(md5(v), 1, 15), 16, 10)`).
    */
  private def h60Sql(e: String): String = hNibSql(e, 15)

  /** Morton/Z-value of the (already-quantized) expressions `xs` —
    * the DuckDB replay of [[graft.operators.Layout.zorderValue]]:
    * the identical shift/mask/shift terms, summed.
    */
  private def zorderSql(xs: Seq[String], bits: Int): String =
    (for { b <- 0 until bits; (x, j) <- xs.zipWithIndex }
      yield s"(((($x) >> $b) & 1) << ${b * xs.size + j})")
      .mkString("(", " + ", ")")

  /** Shared feature CTEs for the Selection oracles: word unigram +
    * bigram occurrences of each document, hashed to 64 md5 buckets
    * (mirrors Selection.unigramsAndBigrams + gramBucket exactly).
    */
  private lazy val gramBucketCtes: String =
    s"""tk AS (SELECT doc_id, lang,
       |  list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '') AS w
       |  FROM documents),
       |oc AS (SELECT doc_id, lang, unnest(w) AS g FROM tk
       |  UNION ALL
       |  SELECT doc_id, lang, w[i + 1] || ' ' || w[i + 2] AS g
       |  FROM (SELECT doc_id, lang, unnest(range(0, len(w) - 1)) AS i, w FROM tk
       |        WHERE len(w) >= 2)),
       |ob AS (SELECT doc_id, lang, ${h16Sql("g")} % 64 AS b FROM oc)""".stripMargin

  /** Shared CTE replaying [[prefJudgments]] for the three Preference
    * oracles (list indexing is 1-based in DuckDB; the winner rule is
    * the closed form of the Spark when-chain).
    */
  private val prefSynthSql: String =
    """c0 AS (SELECT o_orderpriority AS ia,
      |  (['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'])
      |    [(o_orderkey % 5)::INT + 1] AS ib,
      |  o_orderkey % 4 = 0 AS upset, o_orderkey % 11 = 0 AS tied FROM orders),
      |c AS (SELECT ia, ib,
      |  CASE WHEN tied THEN 'tie'
      |       WHEN (substr(ia, 1, 1)::INT < substr(ib, 1, 1)::INT) <> upset
      |         THEN 'a'
      |       ELSE 'b' END AS w
      |  FROM c0 WHERE ia <> ib)""".stripMargin

  /** Shared CTE chain deriving the q_isotonic fit INDEPENDENTLY via
    * the minimax characterization yhat_i = max_{l≤i} min_{r≥i}
    * avg(l..r) over dense bucket prefix sums; ends in
    * `fit(bin, n, pos, block_bin, calibrated)`.
    */
  private val isoFitSql: String =
    """d AS (SELECT
      |  ((doc_id * 37) % 100 + CASE WHEN lang = 'en' THEN 25 ELSE 0 END)
      |    / 125.0 AS s,
      |  lang = 'en' AS y FROM documents WHERE lang IS NOT NULL),
      |b AS (SELECT least(greatest(floor(s * 20), 0), 19)::BIGINT AS bin,
      |  count(*)::BIGINT AS n,
      |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS pos FROM d GROUP BY 1),
      |o AS (SELECT bin, n, pos, row_number() OVER (ORDER BY bin) AS idx FROM b),
      |pre AS (SELECT idx, bin, n, pos, sum(pos) OVER (ORDER BY idx) AS cp,
      |  sum(n) OVER (ORDER BY idx) AS cn FROM o),
      |pairs AS (SELECT l.idx AS li, r.idx AS ri,
      |  (r.cp - coalesce(lp.cp, 0))::DOUBLE
      |    / (r.cn - coalesce(lp.cn, 0))::DOUBLE AS a
      |  FROM pre l JOIN pre r ON r.idx >= l.idx
      |  LEFT JOIN pre lp ON lp.idx = l.idx - 1),
      |inn AS (SELECT p.li, i.idx AS ii, min(p.a) AS mn
      |  FROM pairs p JOIN o i ON p.li <= i.idx AND i.idx <= p.ri
      |  GROUP BY 1, 2),
      |yh AS (SELECT ii, round(max(mn), 6) AS calibrated FROM inn GROUP BY 1),
      |runs AS (SELECT o.bin, o.n, o.pos, o.idx, yh.calibrated,
      |  CASE WHEN lag(yh.calibrated) OVER (ORDER BY o.idx) = yh.calibrated
      |    THEN 0 ELSE 1 END AS brk
      |  FROM o JOIN yh ON o.idx = yh.ii),
      |grp AS (SELECT bin, n, pos, calibrated, idx,
      |  sum(brk) OVER (ORDER BY idx) AS g FROM runs),
      |fit AS (SELECT bin, n, pos,
      |  min(bin) OVER (PARTITION BY g) AS block_bin, calibrated FROM grp)""".stripMargin

  private def pipelineOracle: Map[String, String] = Map(
    // same tokenization (lower/trim/\s+/non-empty), grouped first-doc
    // mins, window prefix sums in doc order, 6 dp ln points, DECIMAL
    // moment sums, one double solve
    "q_heaps" ->
      """WITH tk AS (SELECT doc_id AS d,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      t -> t <> '') AS w
        |  FROM documents WHERE doc_id IS NOT NULL),
        |tc AS (SELECT d, coalesce(len(w), 0)::BIGINT AS tcnt FROM tk),
        |fi AS (SELECT t, min(d) AS fd
        |  FROM (SELECT d, unnest(w) AS t FROM tk) GROUP BY 1),
        |nv AS (SELECT fd AS d, count(*)::BIGINT AS nvv FROM fi GROUP BY 1),
        |pd AS (SELECT tc.d, tcnt, coalesce(nvv, 0) AS nvv
        |  FROM tc LEFT JOIN nv ON tc.d = nv.d),
        |cm AS (SELECT d, sum(tcnt) OVER (ORDER BY d) AS nn,
        |    sum(nvv) OVER (ORDER BY d) AS vv FROM pd),
        |pts AS (SELECT round(ln(nn::DOUBLE), 6) AS x,
        |    round(ln(vv::DOUBLE), 6) AS y FROM cm WHERE nn > 0 AND vv > 0),
        |f AS (SELECT count(*)::BIGINT AS np,
        |    sum(x::DECIMAL(18,6)) AS sx, sum(y::DECIMAL(18,6)) AS sy,
        |    sum(round(x * x, 6)::DECIMAL(18,6)) AS sxx,
        |    sum(round(x * y, 6)::DECIMAL(18,6)) AS sxy FROM pts),
        |tt AS (SELECT count(*)::BIGINT AS n_docs,
        |    coalesce(sum(tcnt), 0)::BIGINT AS n_tokens,
        |    coalesce(sum(nvv), 0)::BIGINT AS vocab FROM pd),
        |b AS (SELECT *, CASE WHEN np >= 2
        |      AND np::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE <> 0.0
        |    THEN (np::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (np::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |  END AS beta_raw FROM f)
        |SELECT n_docs, n_tokens, vocab, round(beta_raw, 6) AS beta,
        |  round(exp((sy::DOUBLE - beta_raw * sx::DOUBLE) / np::DOUBLE), 6) AS k
        |FROM tt, b""".stripMargin,
    // identical per-slice aggregate over the pruned partition — the
    // values cannot tell pruned from unpruned; the Spark side
    // asserts the PLAN, this replay asserts the VALUES
    "q_partitioned_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars
        |FROM documents WHERE lang = 'en' GROUP BY 1""".stripMargin,
    // direct per-group moments replicate state-build -> merge ->
    // report exactly (the merge is rounding-free by construction)
    "q_incremental_moments" ->
      """WITH d AS (SELECT lang, round(n_chars, 6)::DECIMAL(18,6) AS x
        |  FROM documents WHERE n_chars IS NOT NULL),
        |a AS (SELECT lang, count(*)::BIGINT AS n_rows, sum(x) AS s,
        |    sum((x * x)::DECIMAL(38,12)) AS q FROM d GROUP BY 1),
        |m AS (SELECT *, CASE WHEN n_rows > 0
        |    THEN round(s::DOUBLE / n_rows::DOUBLE, 6) END AS mean FROM a),
        |v AS (SELECT *, CASE WHEN n_rows >= 2 THEN
        |    greatest(0.0, q::DOUBLE - n_rows::DOUBLE * mean * mean)
        |      / (n_rows::DOUBLE - 1.0) END AS vr FROM m)
        |SELECT lang, n_rows, mean, round(vr, 6) AS variance,
        |  round(sqrt(vr), 6) AS stddev
        |FROM v""".stripMargin,
    // per-pair g3: bounded (det, dep) cells, per-det majority mass
    "q_fd" ->
      """WITH dd AS (SELECT lang, source, substr(lang, 1, 1) AS lang_prefix
        |  FROM documents)
        |SELECT 'lang' AS determinant, 'source' AS dependent,
        |  coalesce(sum(tot), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_det_values,
        |  coalesce(sum(tot - mx), 0)::BIGINT AS n_violations,
        |  round(CASE WHEN coalesce(sum(tot), 0) > 0 THEN
        |    1.0 - coalesce(sum(tot - mx), 0)::DOUBLE / sum(tot)::DOUBLE
        |  END, 6) AS strength
        |FROM (SELECT a, max(c) AS mx, sum(c) AS tot FROM
        |  (SELECT lang AS a, source AS b, count(*)::BIGINT AS c FROM dd
        |   WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1)
        |UNION ALL
        |SELECT 'lang' AS determinant, 'lang_prefix' AS dependent,
        |  coalesce(sum(tot), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_det_values,
        |  coalesce(sum(tot - mx), 0)::BIGINT AS n_violations,
        |  round(CASE WHEN coalesce(sum(tot), 0) > 0 THEN
        |    1.0 - coalesce(sum(tot - mx), 0)::DOUBLE / sum(tot)::DOUBLE
        |  END, 6) AS strength
        |FROM (SELECT a, max(c) AS mx, sum(c) AS tot FROM
        |  (SELECT lang AS a, lang_prefix AS b, count(*)::BIGINT AS c FROM dd
        |   WHERE lang IS NOT NULL AND lang_prefix IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1)
        |UNION ALL
        |SELECT 'source' AS determinant, 'lang' AS dependent,
        |  coalesce(sum(tot), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_det_values,
        |  coalesce(sum(tot - mx), 0)::BIGINT AS n_violations,
        |  round(CASE WHEN coalesce(sum(tot), 0) > 0 THEN
        |    1.0 - coalesce(sum(tot - mx), 0)::DOUBLE / sum(tot)::DOUBLE
        |  END, 6) AS strength
        |FROM (SELECT a, max(c) AS mx, sum(c) AS tot FROM
        |  (SELECT source AS a, lang AS b, count(*)::BIGINT AS c FROM dd
        |   WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1)
        |UNION ALL
        |SELECT 'source' AS determinant, 'lang_prefix' AS dependent,
        |  coalesce(sum(tot), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_det_values,
        |  coalesce(sum(tot - mx), 0)::BIGINT AS n_violations,
        |  round(CASE WHEN coalesce(sum(tot), 0) > 0 THEN
        |    1.0 - coalesce(sum(tot - mx), 0)::DOUBLE / sum(tot)::DOUBLE
        |  END, 6) AS strength
        |FROM (SELECT a, max(c) AS mx, sum(c) AS tot FROM
        |  (SELECT source AS a, lang_prefix AS b, count(*)::BIGINT AS c FROM dd
        |   WHERE source IS NOT NULL AND lang_prefix IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1)
        |UNION ALL
        |SELECT 'lang_prefix' AS determinant, 'lang' AS dependent,
        |  coalesce(sum(tot), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_det_values,
        |  coalesce(sum(tot - mx), 0)::BIGINT AS n_violations,
        |  round(CASE WHEN coalesce(sum(tot), 0) > 0 THEN
        |    1.0 - coalesce(sum(tot - mx), 0)::DOUBLE / sum(tot)::DOUBLE
        |  END, 6) AS strength
        |FROM (SELECT a, max(c) AS mx, sum(c) AS tot FROM
        |  (SELECT lang_prefix AS a, lang AS b, count(*)::BIGINT AS c FROM dd
        |   WHERE lang_prefix IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1)
        |UNION ALL
        |SELECT 'lang_prefix' AS determinant, 'source' AS dependent,
        |  coalesce(sum(tot), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_det_values,
        |  coalesce(sum(tot - mx), 0)::BIGINT AS n_violations,
        |  round(CASE WHEN coalesce(sum(tot), 0) > 0 THEN
        |    1.0 - coalesce(sum(tot - mx), 0)::DOUBLE / sum(tot)::DOUBLE
        |  END, 6) AS strength
        |FROM (SELECT a, max(c) AS mx, sum(c) AS tot FROM
        |  (SELECT lang_prefix AS a, source AS b, count(*)::BIGINT AS c FROM dd
        |   WHERE lang_prefix IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1)""".stripMargin,
    // same per-user triple (DECIMAL monetary sums), 6 dp
    // quantile_cont edges, strictly-greater bucketing (the psi
    // ulp-safe convention), higher-is-better score orientation
    "q_rfm" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms,
        |    round(value, 6)::DECIMAL(18,6) AS v
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |per AS (SELECT user_id,
        |    1706745600000 - max(ms) AS recency_ms,
        |    count(*)::BIGINT AS frequency,
        |    round(coalesce(sum(v), 0)::DOUBLE, 6) AS monetary
        |  FROM e GROUP BY 1),
        |ed AS (SELECT
        |    list_transform(quantile_cont(recency_ms::DOUBLE,
        |      [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS er,
        |    list_transform(quantile_cont(frequency::DOUBLE,
        |      [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS ef,
        |    list_transform(quantile_cont(monetary,
        |      [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS em
        |  FROM per),
        |sc AS (SELECT user_id, recency_ms, frequency, monetary,
        |    5 - len(list_filter(er, x -> recency_ms::DOUBLE > x)) AS r_score,
        |    len(list_filter(ef, x -> frequency::DOUBLE > x)) + 1 AS f_score,
        |    len(list_filter(em, x -> monetary > x)) + 1 AS m_score
        |  FROM per, ed)
        |SELECT user_id, recency_ms, frequency, monetary,
        |  r_score, f_score, m_score,
        |  r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS segment
        |FROM sc""".stripMargin,
    // same dense daily spine (missing days count 0), exact HUGEINT
    // moment sums per lag, one double division
    "q_xcorr" ->
      """WITH e AS (SELECT epoch_ms(ts) // 86400000 AS b, event_type
        |  FROM events WHERE ts IS NOT NULL
        |    AND event_type IN ('click', 'purchase')),
        |c AS (SELECT b,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS na,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |      AS nb
        |  FROM e GROUP BY 1),
        |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS b FROM bounds),
        |d AS (SELECT spine.b, coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM spine LEFT JOIN c ON spine.b = c.b),
        |lg AS (SELECT unnest(range(-5, 6)) AS lag),
        |j AS (SELECT lg.lag, x.na, y.nb
        |  FROM lg, d x JOIN d y ON y.b = x.b + lg.lag),
        |a AS (SELECT lag, count(*)::BIGINT AS n_buckets,
        |    sum(na::HUGEINT) AS sx, sum(nb::HUGEINT) AS sy,
        |    sum((na * nb)::HUGEINT) AS sxy,
        |    sum((na * na)::HUGEINT) AS sxx,
        |    sum((nb * nb)::HUGEINT) AS syy
        |  FROM j GROUP BY 1),
        |f AS (SELECT lag, n_buckets,
        |    (n_buckets * sxy - sx * sy)::DOUBLE AS num,
        |    (n_buckets * sxx - sx * sx)::DOUBLE AS dx,
        |    (n_buckets * syy - sy * sy)::DOUBLE AS dy
        |  FROM a)
        |SELECT lag, n_buckets,
        |  round(CASE WHEN dx > 0 AND dy > 0
        |    THEN num / sqrt(dx * dy) END, 6) AS corr
        |FROM f""".stripMargin,
    // same 6 dp daily sums, 6 dp pair slopes, exact medians
    "q_theil_sen" ->
      """WITH e AS (SELECT epoch_ms(ts) // 86400000 AS x,
        |    round(value, 6)::DECIMAL(18,6) AS v
        |  FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT x, round(coalesce(sum(v), 0)::DOUBLE, 6) AS y
        |  FROM e GROUP BY 1),
        |p AS (SELECT round((b.y - a.y) / (b.x - a.x)::DOUBLE, 6) AS sl
        |  FROM s a JOIN s b ON b.x > a.x),
        |m AS (SELECT count(*)::BIGINT AS n_pairs,
        |    round(quantile_cont(sl, 0.5), 6) AS slope FROM p),
        |i AS (SELECT round(quantile_cont(y - slope * x::DOUBLE, 0.5), 6)
        |    AS intercept FROM s, m)
        |SELECT (SELECT count(*)::BIGINT FROM s) AS n_buckets,
        |  n_pairs, slope, intercept
        |FROM m, i""".stripMargin,
    // identical per-group DECIMAL moments, 6 dp means, zero-clamped
    // within-variance, per-group 6 dp SS terms summed in DECIMAL
    "q_anova" ->
      """WITH d AS (SELECT event_type AS g, round(value, 6)::DECIMAL(18,6) AS x
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |pg AS (SELECT g, count(*)::BIGINT AS n, sum(x) AS s,
        |    sum((x * x)::DECIMAL(38,12)) AS q FROM d GROUP BY 1),
        |pm AS (SELECT *, round(s::DOUBLE / n::DOUBLE, 6) AS m FROM pg),
        |pw AS (SELECT *, greatest(0.0, q::DOUBLE - n::DOUBLE * m * m) AS w
        |  FROM pm),
        |g AS (SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_groups,
        |    sum(s) AS gs FROM pw),
        |gm AS (SELECT *, round(gs::DOUBLE / n_rows::DOUBLE, 6) AS gmean FROM g),
        |tt AS (SELECT
        |    sum(round(n::DOUBLE * (m - gmean) * (m - gmean), 6)
        |      ::DECIMAL(28,6)) AS ssb,
        |    sum(round(w, 6)::DECIMAL(28,6)) AS ssw
        |  FROM pw, gm)
        |SELECT n_rows, n_groups,
        |  round(ssb::DOUBLE, 6) AS ss_between, round(ssw::DOUBLE, 6) AS ss_within,
        |  (n_groups - 1)::BIGINT AS df1, (n_rows - n_groups)::BIGINT AS df2,
        |  round(CASE WHEN n_groups >= 2 AND n_rows > n_groups AND ssw > 0
        |    THEN (ssb::DOUBLE / (n_groups - 1))
        |      / (ssw::DOUBLE / (n_rows - n_groups)) END, 6) AS f
        |FROM gm, tt""".stripMargin,
    // 6 dp per-group exact medians first, then the identical F chain
    // over the 6 dp |v - median| deviations
    "q_levene" ->
      """WITH raw AS (SELECT event_type AS g, value::DOUBLE AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |md AS (SELECT g, round(quantile_cont(v, 0.5), 6) AS med
        |  FROM raw GROUP BY 1),
        |d AS (SELECT raw.g, round(abs(v - med), 6)::DECIMAL(18,6) AS x
        |  FROM raw JOIN md ON raw.g = md.g),
        |pg AS (SELECT g, count(*)::BIGINT AS n, sum(x) AS s,
        |    sum((x * x)::DECIMAL(38,12)) AS q FROM d GROUP BY 1),
        |pm AS (SELECT *, round(s::DOUBLE / n::DOUBLE, 6) AS m FROM pg),
        |pw AS (SELECT *, greatest(0.0, q::DOUBLE - n::DOUBLE * m * m) AS w
        |  FROM pm),
        |g AS (SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_groups,
        |    sum(s) AS gs FROM pw),
        |gm AS (SELECT *, round(gs::DOUBLE / n_rows::DOUBLE, 6) AS gmean FROM g),
        |tt AS (SELECT
        |    sum(round(n::DOUBLE * (m - gmean) * (m - gmean), 6)
        |      ::DECIMAL(28,6)) AS ssb,
        |    sum(round(w, 6)::DECIMAL(28,6)) AS ssw
        |  FROM pw, gm)
        |SELECT n_rows, n_groups,
        |  round(ssb::DOUBLE, 6) AS ss_between, round(ssw::DOUBLE, 6) AS ss_within,
        |  (n_groups - 1)::BIGINT AS df1, (n_rows - n_groups)::BIGINT AS df2,
        |  round(CASE WHEN n_groups >= 2 AND n_rows > n_groups AND ssw > 0
        |    THEN (ssb::DOUBLE / (n_groups - 1))
        |      / (ssw::DOUBLE / (n_rows - n_groups)) END, 6) AS f
        |FROM gm, tt""".stripMargin,
    // same per-user paired means (DECIMAL sums, 6 dp), 6 dp DECIMAL
    // differences, zero-clamped variance, identical t/df order
    "q_paired_t" ->
      """WITH e AS (SELECT user_id, event_type,
        |    round(value, 6)::DECIMAL(18,6) AS v
        |  FROM events WHERE event_type IN ('click', 'view')
        |    AND value IS NOT NULL AND user_id IS NOT NULL),
        |pu AS (SELECT user_id,
        |    round(sum(CASE WHEN event_type = 'click' THEN v END)::DOUBLE
        |      / sum(CASE WHEN event_type = 'click' THEN 1 END), 6) AS cm,
        |    round(sum(CASE WHEN event_type = 'view' THEN v END)::DOUBLE
        |      / sum(CASE WHEN event_type = 'view' THEN 1 END), 6) AS vm
        |  FROM e GROUP BY 1),
        |d AS (SELECT round(cm - vm, 6)::DECIMAL(18,6) AS dd FROM pu
        |  WHERE cm IS NOT NULL AND vm IS NOT NULL),
        |a AS (SELECT count(*)::BIGINT AS n, sum(dd) AS s,
        |    sum((dd * dd)::DECIMAL(38,12)) AS q FROM d),
        |m AS (SELECT *, CASE WHEN n > 0
        |    THEN round(s::DOUBLE / n::DOUBLE, 6) END AS md FROM a),
        |v AS (SELECT *, CASE WHEN n >= 2 THEN
        |    greatest(0.0, q::DOUBLE - n::DOUBLE * md * md) / (n::DOUBLE - 1.0)
        |  END AS vd FROM m)
        |SELECT n, md AS mean_diff, round(vd, 6) AS var_diff,
        |  round(CASE WHEN vd > 0 THEN md / sqrt(vd / n::DOUBLE) END, 6) AS t,
        |  (n - 1)::BIGINT AS df
        |FROM v""".stripMargin,
    // identical Wilson closed form in a fixed double order; the z²
    // constant is the same IEEE product on both engines
    "q_wilson" ->
      """WITH d AS (SELECT event_type, (value >= 50.0) AS hot FROM events
        |  WHERE value IS NOT NULL),
        |a AS (SELECT event_type, count(*)::BIGINT AS n,
        |    coalesce(sum(CASE WHEN hot THEN 1 END), 0)::BIGINT AS successes
        |  FROM d GROUP BY 1),
        |w AS (SELECT *, successes::DOUBLE / n::DOUBLE AS p,
        |    1.959964 * 1.959964 AS z2, n::DOUBLE AS nd FROM a),
        |c AS (SELECT *, 1.0 + z2 / nd AS den,
        |    (p + z2 / (2.0 * nd)) / (1.0 + z2 / nd) AS center,
        |    1.959964 * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
        |      / (1.0 + z2 / nd) AS half
        |  FROM w)
        |SELECT event_type, n, successes, round(p, 6) AS rate,
        |  round(greatest(0.0, center - half), 6) AS lo,
        |  round(least(1.0, center + half), 6) AS hi
        |FROM c""".stripMargin,
    // the q_calibration synthetic gate; per-bin 6 dp means, per-bin
    // 6 dp Murphy terms summed in DECIMAL, direct MSE from 10 dp
    // DECIMAL squares
    "q_brier" ->
      s"""WITH d AS (SELECT (doc_id % 4 = 0) AS label,
        |    (${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END AS score
        |  FROM documents),
        |b AS (SELECT least(greatest(floor(score * 10), 0), 9)::BIGINT AS bin,
        |    CASE WHEN label THEN 1 ELSE 0 END AS y, score FROM d),
        |pb AS (SELECT bin, count(*)::BIGINT AS n,
        |    sum(score::DECIMAL(28,10)) AS fs, sum(y)::BIGINT AS pos,
        |    sum(((score - y) * (score - y))::DECIMAL(28,10)) AS sq
        |  FROM b GROUP BY 1),
        |pm AS (SELECT *, round(fs::DOUBLE / n::DOUBLE, 6) AS f,
        |    round(pos::DOUBLE / n::DOUBLE, 6) AS o FROM pb),
        |tot AS (SELECT sum(n)::BIGINT AS n_rows, sum(pos)::BIGINT AS allpos,
        |    sum(sq) AS allsq FROM pm),
        |ob AS (SELECT *, round(allpos::DOUBLE / n_rows::DOUBLE, 6) AS obar
        |  FROM tot),
        |tt AS (SELECT
        |    sum(round(n::DOUBLE * (f - o) * (f - o), 6)
        |      ::DECIMAL(28,6)) AS rel,
        |    sum(round(n::DOUBLE * (o - obar) * (o - obar), 6)
        |      ::DECIMAL(28,6)) AS res
        |  FROM pm, ob)
        |SELECT n_rows, 10 AS bins,
        |  round(allsq::DOUBLE / n_rows::DOUBLE, 6) AS brier,
        |  round(rel::DOUBLE / n_rows::DOUBLE, 6) AS reliability,
        |  round(res::DOUBLE / n_rows::DOUBLE, 6) AS resolution,
        |  round(obar * (1.0 - obar), 6) AS uncertainty
        |FROM ob, tt""".stripMargin,
    // DSIR replay: smoothed bucket log-ratios (6 dp) -> per-doc sums
    // (4 dp) -> hash-Gumbel top-100. alpha=1, B=64 => the +64.0 terms.
    "q_dsir" ->
      s"""WITH $gramBucketCtes,
         |cr AS (SELECT b, count(*) AS rc FROM ob GROUP BY 1),
         |ct AS (SELECT b, count(*) AS tc FROM ob WHERE lang = 'en' GROUP BY 1),
         |nr AS (SELECT sum(rc)::DOUBLE AS nr FROM cr),
         |nt AS (SELECT coalesce(sum(tc), 0)::DOUBLE AS nt FROM ct),
         |rt AS (SELECT b, round(ln((coalesce(ct.tc, 0) + 1.0) / (nt.nt + 64.0)) -
         |    ln((cr.rc + 1.0) / (nr.nr + 64.0)), 6) AS lr
         |  FROM cr LEFT JOIN ct USING (b), nr, nt),
         |wsum AS (SELECT doc_id, round(sum(lr::DECIMAL(18,6)), 4)::DOUBLE AS lw
         |  FROM ob JOIN rt USING (b) GROUP BY 1),
         |ww AS (SELECT d.doc_id, coalesce(w.lw, 0.0) AS dsir_logw
         |  FROM documents d LEFT JOIN wsum w USING (doc_id)),
         |ky AS (SELECT doc_id, dsir_logw, dsir_logw +
         |  (-ln(-ln((${h16Sql("doc_id::VARCHAR || ':0'")} + 0.5) / 65536.0))) AS k FROM ww)
         |SELECT doc_id, dsir_logw FROM ky ORDER BY k DESC, doc_id LIMIT 100""".stripMargin,
    // generic Gumbel-top-k: 6 dp log-weight + the same hash-Gumbel
    // noise as q_dsir
    "q_weighted_sample" ->
      (s"""WITH w AS (SELECT doc_id, lang, n_chars, round(ln(n_chars::DOUBLE), 6) AS lw
          |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
          |ky AS (SELECT doc_id, lang, n_chars,
          |  lw + (-ln(-ln((${h16Sql("doc_id::VARCHAR || ':11'")} + 0.5) / 65536.0))) AS k FROM w)
          |SELECT doc_id, lang, n_chars FROM ky ORDER BY k DESC, doc_id LIMIT 100""".stripMargin),
    // Keep-best apply: clusters via the same recursive-CTE reach as
    // q_dedup_clusters, singletons self-clustered, argmax(n_chars,
    // min doc_id) per cluster.
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashCtes,
         |prs AS (SELECT id_a, id_b FROM mh WHERE jac >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
         |  UNION ALL SELECT id_b, id_a FROM prs),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |lab AS (SELECT id, min(r) AS label FROM reach GROUP BY 1),
         |m AS (SELECT d.doc_id, d.lang, d.source, d.n_chars,
         |  coalesce(l.label, d.doc_id) AS ck
         |  FROM docs d LEFT JOIN lab l ON d.doc_id = l.id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY ck
         |  ORDER BY n_chars DESC, doc_id) AS rn FROM m)
         |SELECT doc_id, lang, source, n_chars FROM rk WHERE rn = 1""".stripMargin,
    "q_shards" ->
      """WITH r AS (SELECT doc_id, row_number() OVER (ORDER BY
        |  md5(doc_id::VARCHAR || ':3') || ':' || doc_id::VARCHAR) - 1 AS order_id
        |  FROM documents)
        |SELECT doc_id, order_id, order_id // 64 AS shard, order_id % 64 AS shard_pos
        |FROM r""".stripMargin,
    // normalizeUrl replay: the exact regex chain, DuckDB's RE2 ('g'
    // everywhere Spark's always-global replace could multi-match;
    // backrefs are \1 in DuckDB vs $1 in Spark).
    "q_url_dedup" ->
      """WITH u AS (SELECT doc_id,
        |  'HTTPS://Example.COM/Path' || (doc_id % 20) || '/?utm_source=feed&id=' ||
        |    (doc_id % 3) || '&utm_campaign=x#sec' || doc_id AS url FROM documents),
        |n1 AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS u FROM u),
        |n2 AS (SELECT doc_id, regexp_replace(u,
        |  '[?&](utm_[A-Za-z0-9_]+|fbclid|gclid|mc_cid|mc_eid)=[^&]*', '', 'g') AS u FROM n1),
        |n3 AS (SELECT doc_id, regexp_replace(u, '^([^?]*)&', '\1?') AS u FROM n2),
        |n4 AS (SELECT doc_id, regexp_replace(u, '[?&]$', '', 'g') AS u FROM n3),
        |n5 AS (SELECT doc_id, CASE WHEN regexp_extract(u, '(?i)^(https?://[^/?#]+)', 1) <> ''
        |    THEN lower(regexp_extract(u, '(?i)^(https?://[^/?#]+)', 1)) ||
        |      regexp_replace(u, '(?i)^https?://[^/?#]+', '')
        |    ELSE u END AS u FROM n4),
        |n6 AS (SELECT doc_id, regexp_replace(u, '/$', '', 'g') AS u FROM n5)
        |SELECT u AS norm_url, min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM n6 GROUP BY 1""".stripMargin,
    "q_top_values" ->
      """WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS n FROM w WHERE word <> ''
        |GROUP BY 1 ORDER BY n DESC, word LIMIT 10""".stripMargin,
    "q_top_values_by_group" ->
      """WITH w AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |  FROM documents),
        |c AS (SELECT lang, word, count(*) AS n FROM w WHERE word <> '' GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |  ORDER BY n DESC, word) AS rank FROM c)
        |SELECT lang, word, n, rank::INT AS rank FROM r WHERE rank <= 3""".stripMargin,
    "q_cms" ->
      // mirrors cmsSketch + cmsLookup: bucket ids are the same
      // 3-nibble md5 values, sketch counts sum occurrences (not
      // distinct words), the estimate is the min over d=4 rows
      s"""WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        |  FROM documents),
        |c AS (SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY 1),
        |top AS (SELECT word, n FROM c ORDER BY n DESC, word LIMIT 10),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |g AS (SELECT js.j AS rj, ${hNibSql("c.word || ':' || js.j::VARCHAR", 3)} AS bucket,
        |    sum(c.n)::BIGINT AS cnt
        |  FROM c, js GROUP BY 1, 2),
        |l AS (SELECT t.word, t.n AS n_exact, js.j AS rj,
        |    ${hNibSql("t.word || ':' || js.j::VARCHAR", 3)} AS bucket
        |  FROM top t, js)
        |SELECT l.word, l.n_exact, min(coalesce(g.cnt, 0))::BIGINT AS est_count
        |FROM l LEFT JOIN g ON g.rj = l.rj AND g.bucket = l.bucket
        |GROUP BY 1, 2""".stripMargin,
    "q_distinct_kmv" ->
      // The sketch state is the k smallest distinct 60-bit md5
      // hashes per group — replayed exactly by a window rank over
      // the same hashes; (k−1)·2⁶⁰ is exact in double, so the
      // estimate is one identically-rounded IEEE division.
      s"""WITH w AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        |  FROM documents),
        |t AS (SELECT DISTINCT lang, ${h60Sql("word")} AS h FROM w WHERE word <> ''),
        |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM t),
        |g AS (SELECT lang, count(*) AS nd FROM t GROUP BY 1),
        |kv AS (SELECT lang, h AS hk FROM r WHERE rn = 256)
        |SELECT g.lang, LEAST(g.nd, 256)::INT AS n_kept,
        |  CASE WHEN g.nd < 256 THEN g.nd::DOUBLE
        |       ELSE round(255.0 * 1152921504606846976.0 / kv.hk, 4) END AS est_distinct
        |FROM g LEFT JOIN kv ON g.lang = kv.lang""".stripMargin,
    // the HLL registers are a grouped max over string-inspected
    // leading-zero runs of the same md5; exact HUGEINT register sums
    // mirror Spark's DECIMAL(38,0), the estimate is the identical
    // fixed-order double expression, both branches 4 dp
    "q_distinct_hll" ->
      (s"""WITH w AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
          |  FROM documents),
          |t AS (SELECT lang, word FROM w WHERE word <> ''),
          |h AS (SELECT lang, ${hNibSql("word", 3)} AS bk,
          |    substr(md5(word), 4, 15) AS ws FROM t),
          |z AS (SELECT lang, bk,
          |    length(regexp_extract(ws, '^0*')) AS nz,
          |    substr(regexp_replace(ws, '^0*', ''), 1, 1) AS fc FROM h),
          |r AS (SELECT lang, bk, max(CASE WHEN nz = 15 THEN 61 ELSE nz * 4 +
          |    (CASE WHEN fc IN ('8','9','a','b','c','d','e','f') THEN 0
          |          WHEN fc IN ('4','5','6','7') THEN 1
          |          WHEN fc IN ('2','3') THEN 2 ELSE 3 END) + 1 END) AS rr
          |  FROM z GROUP BY 1, 2),
          |g AS (SELECT lang, count(*)::BIGINT AS nb,
          |    sum(power(2, 61 - rr)::HUGEINT) AS sp FROM r GROUP BY 1),
          |e AS (SELECT lang, nb,
          |    sp + (4096 - nb)::HUGEINT * 2305843009213693952::HUGEINT AS st,
          |    (4096 - nb) AS v FROM g),
          |f AS (SELECT lang, nb,
          |    0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0 *
          |      2305843009213693952.0 / st::DOUBLE AS eraw, v FROM e)
          |SELECT lang, nb AS n_registers,
          |  CASE WHEN v > 0 AND eraw <= 10240.0
          |    THEN round(4096.0 * ln(4096.0 / v::DOUBLE), 4)
          |    ELSE round(eraw, 4) END AS est_distinct
          |FROM f""".stripMargin),
    // the two slice sketches + the union sketch replayed as window
    // ranks over the same 60-bit hashes; est_union is rounded FIRST
    // (4 dp), then est_inter multiplies the rounded value — the
    // identical IEEE op order as overlapKmv's column graph
    "q_kmv_overlap" ->
      s"""WITH ea AS (SELECT DISTINCT ${h60Sql("o_custkey::VARCHAR")} AS h
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_custkey IS NOT NULL),
        |eb AS (SELECT DISTINCT ${h60Sql("o_custkey::VARCHAR")} AS h
        |  FROM orders WHERE o_orderkey % 2 = 1 AND o_custkey IS NOT NULL),
        |ka AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ea) WHERE rn <= 256),
        |kb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM eb) WHERE rn <= 256),
        |ku AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
        |  FROM (SELECT h FROM ka UNION SELECT h FROM kb)) WHERE rn <= 256),
        |s AS (SELECT
        |  (SELECT count(*) FROM ka) AS na, (SELECT count(*) FROM kb) AS nb,
        |  (SELECT count(*) FROM ku) AS nu,
        |  (SELECT max(h) FROM ka) AS ma, (SELECT max(h) FROM kb) AS mb,
        |  (SELECT max(h) FROM ku) AS mu,
        |  (SELECT count(*) FROM ku JOIN ka USING (h) JOIN kb USING (h)) AS c),
        |e AS (SELECT *,
        |  CASE WHEN na < 256 THEN na::DOUBLE ELSE round(255.0 * 1152921504606846976.0 / ma, 4) END AS ea_,
        |  CASE WHEN nb < 256 THEN nb::DOUBLE ELSE round(255.0 * 1152921504606846976.0 / mb, 4) END AS eb_,
        |  CASE WHEN nu < 256 THEN nu::DOUBLE ELSE round(255.0 * 1152921504606846976.0 / mu, 4) END AS eu_
        |  FROM s)
        |SELECT na::INT AS n_a_kept, nb::INT AS n_b_kept, nu::INT AS n_union_kept,
        |  ea_ AS est_a, eb_ AS est_b, eu_ AS est_union, c::INT AS inter_kept,
        |  CASE WHEN nu = 0 THEN 0.0 ELSE round(c::DOUBLE * eu_ / nu, 4) END AS est_inter,
        |  CASE WHEN nu = 0 THEN 0.0 ELSE round(c::DOUBLE / nu, 6) END AS jaccard_kmv
        |FROM e""".stripMargin,
    // the native kernel implements DuckDB's jaro_winkler_similarity
    // semantics verbatim (0.7 boost threshold, prefix cap 4,
    // half-transposition count, empty sides 0) — the oracle IS the
    // reference implementation; 6 dp boundary both sides
    "q_fuzzy_jw" ->
      """WITH n AS (SELECT
        |    CASE WHEN (doc_id // 12) % 3 = 0
        |      THEN 'company-' || ((doc_id % 12) * 7919)::VARCHAR || 'x'
        |    WHEN (doc_id // 12) % 3 = 1
        |      THEN 'k' || substr('company-' || ((doc_id % 12) * 7919)::VARCHAR, 2)
        |    ELSE 'company-' || ((doc_id % 12) * 7919)::VARCHAR END AS name
        |  FROM documents),
        |b AS (SELECT DISTINCT regexp_extract(name, '[0-9]+') AS blk, name FROM n),
        |p AS (SELECT DISTINCT a.name AS value_a, b2.name AS value_b
        |  FROM b a JOIN b b2 ON a.blk = b2.blk AND a.name < b2.name)
        |SELECT value_a, value_b,
        |  round(jaro_winkler_similarity(value_a, value_b), 6) AS jw
        |FROM p
        |WHERE round(jaro_winkler_similarity(value_a, value_b), 6) >= 0.9""".stripMargin,
    // deletion-neighborhood blocking replayed exactly: {v} ∪ the
    // single-char deletions, the same HAVING <= 500 bucket cap, the
    // same levenshtein verify — completeness makes blocked == exact
    "q_fuzzy_join" ->
      """WITH v AS (SELECT DISTINCT c_name AS v FROM customer
        |  WHERE length(c_name) BETWEEN 4 AND 64),
        |k0 AS (
        |  SELECT v, v AS key FROM v
        |  UNION ALL
        |  SELECT v, substr(v, 1, i) || substr(v, i + 2) AS key
        |  FROM (SELECT v, unnest(range(0, length(v))) AS i FROM v)),
        |kc AS (SELECT key FROM k0 GROUP BY key HAVING count(*) <= 500),
        |k AS (SELECT k0.v, k0.key FROM k0 JOIN kc USING (key)),
        |p AS (SELECT DISTINCT a.v AS a, b.v AS b
        |  FROM k a JOIN k b USING (key) WHERE a.v < b.v)
        |SELECT a, b, levenshtein(a, b)::INT AS dist FROM p
        |WHERE levenshtein(a, b) <= 1""".stripMargin,
    // the fuzzy-pair CTE (deletion blocking + levenshtein verify)
    // feeds the same recursive reachability closure as the dedup
    // cluster oracles; singletons canonicalize to themselves
    "q_entity_resolution" ->
      """WITH RECURSIVE nm AS (SELECT DISTINCT
        |    CASE WHEN (doc_id // 12) % 3 = 0 THEN 'company-' || (doc_id % 12 * 7919)::VARCHAR || 'x'
        |         WHEN (doc_id // 12) % 3 = 1 THEN 'k' || substr('company-' || (doc_id % 12 * 7919)::VARCHAR, 2)
        |         ELSE 'company-' || (doc_id % 12 * 7919)::VARCHAR END AS name
        |  FROM documents),
        |k0 AS (SELECT name AS v, name AS key FROM nm
        |  UNION ALL SELECT name, substr(name, 1, i) || substr(name, i + 2)
        |  FROM (SELECT name, unnest(range(0, length(name))) AS i FROM nm)),
        |p AS (SELECT DISTINCT a.v AS id_a, b.v AS id_b FROM k0 a JOIN k0 b USING (key)
        |  WHERE a.v < b.v AND levenshtein(a.v, b.v) <= 1),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |lab AS (SELECT id, min(r) AS label FROM reach GROUP BY 1)
        |SELECT nm.name, coalesce(lab.label, nm.name) AS canon
        |FROM nm LEFT JOIN lab ON nm.name = lab.id""".stripMargin,
    // same corrupted snapshot; each rule is a CASE-indicator sum over
    // it, uniqueness a count-minus-distinct, ref-integrity an
    // anti-join count — all mirrored per rule row
    "q_expectations" ->
      """WITH tt0 AS (SELECT
        |    CASE WHEN o_orderkey % 10 = 3 THEN NULL
        |         WHEN o_orderkey % 10 = 5 THEN o_custkey + 10000000
        |         ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 10 = 4 THEN -o_totalprice
        |         ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 10 = 7 THEN lower(o_orderstatus)
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    o_orderkey
        |  FROM orders),
        |tt AS (SELECT * FROM tt0
        |  UNION ALL SELECT * FROM tt0 WHERE o_orderkey % 10 = 6),
        |m AS (SELECT count(*)::BIGINT AS total,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_null,
        |    sum(CASE WHEN o_totalprice IS NOT NULL
        |          AND (o_totalprice < 0 OR o_totalprice > 1000000)
        |        THEN 1 ELSE 0 END)::BIGINT AS v_range,
        |    sum(CASE WHEN o_orderstatus IS NOT NULL
        |          AND NOT regexp_matches(o_orderstatus, '^[A-Z]$')
        |        THEN 1 ELSE 0 END)::BIGINT AS v_regex,
        |    (count(*) - count(DISTINCT coalesce(o_orderkey::VARCHAR, chr(0))))::BIGINT AS v_uniq,
        |    sum(CASE WHEN o_custkey IS NOT NULL
        |          AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |        THEN 1 ELSE 0 END)::BIGINT AS v_ref
        |  FROM tt)
        |SELECT 'not_null' AS rule, 'o_custkey' AS target,
        |  v_null AS violations, total, v_null = 0 AS pass FROM m
        |UNION ALL SELECT 'in_range', 'o_totalprice', v_range, total, v_range = 0 FROM m
        |UNION ALL SELECT 'regex', 'o_orderstatus', v_regex, total, v_regex = 0 FROM m
        |UNION ALL SELECT 'unique', 'o_orderkey', v_uniq, total, v_uniq = 0 FROM m
        |UNION ALL SELECT 'ref_integrity', 'o_custkey', v_ref, total, v_ref = 0 FROM m""".stripMargin,
    // the same corrupted snapshot, but per-rule offending-row samples:
    // 5 lowest keys per rule; duplicate copies are interchangeable
    // under the cap so key ties cannot change the result set
    "q_expectations_samples" ->
      """WITH tt0 AS (SELECT
        |    CASE WHEN o_orderkey % 10 = 3 THEN NULL
        |         WHEN o_orderkey % 10 = 5 THEN o_custkey + 10000000
        |         ELSE o_custkey END AS o_custkey,
        |    (CASE WHEN o_orderkey % 10 = 4 THEN -o_totalprice
        |         ELSE o_totalprice END)::DECIMAL(18,2) AS o_totalprice,
        |    CASE WHEN o_orderkey % 10 = 7 THEN lower(o_orderstatus)
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    o_orderkey
        |  FROM orders),
        |tt AS (SELECT * FROM tt0
        |  UNION ALL SELECT * FROM tt0 WHERE o_orderkey % 10 = 6),
        |uc AS (SELECT *, count(*) OVER (
        |    PARTITION BY md5(coalesce(o_orderkey::VARCHAR, chr(0)))) AS ucnt FROM tt),
        |e AS (
        |  SELECT 'not_null' AS rule, 'o_custkey' AS target,
        |      o_orderkey AS sample_id, o_custkey::VARCHAR AS value
        |    FROM uc WHERE o_custkey IS NULL
        |  UNION ALL SELECT 'in_range', 'o_totalprice', o_orderkey, o_totalprice::VARCHAR
        |    FROM uc WHERE o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0 OR o_totalprice > 1000000)
        |  UNION ALL SELECT 'regex', 'o_orderstatus', o_orderkey, o_orderstatus
        |    FROM uc WHERE o_orderstatus IS NOT NULL
        |      AND NOT regexp_matches(o_orderstatus, '^[A-Z]$')
        |  UNION ALL SELECT 'unique', 'o_orderkey', o_orderkey,
        |      md5(coalesce(o_orderkey::VARCHAR, chr(0)))
        |    FROM uc WHERE ucnt > 1
        |  UNION ALL SELECT 'ref_integrity', 'o_custkey', o_orderkey, o_custkey::VARCHAR
        |    FROM uc WHERE o_custkey IS NOT NULL
        |      AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY rule, target ORDER BY sample_id) AS sample_rank FROM e)
        |SELECT rule, target, sample_rank::INT AS sample_rank, sample_id, value
        |FROM r WHERE sample_rank <= 5""".stripMargin,
    // same dyadic score; grouped Mann-Whitney with the identical
    // doubled-numerator integer arithmetic, one double division
    "q_auc" ->
      s"""WITH d AS (SELECT (doc_id % 4 = 0) AS label,
        |    (${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END AS score
        |  FROM documents),
        |g AS (SELECT score AS s,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS p,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS n
        |  FROM d GROUP BY 1),
        |c AS (SELECT *, sum(n) OVER (ORDER BY s) AS cn FROM g),
        |t AS (SELECT sum(p)::BIGINT AS pp, sum(n)::BIGINT AS nn FROM g)
        |SELECT round(sum(p * (2 * cn - n))::DOUBLE
        |    / (pp::DOUBLE * nn::DOUBLE * 2.0), 6) AS auc,
        |  pp AS positives, nn AS negatives
        |FROM c, t GROUP BY pp, nn""".stripMargin,
    // identical dyadic p synthesis, the same no-division DECIMAL
    // step-up compare (p*m <= rank*q), cutoff as one bounded max
    "q_bh" ->
      (s"""WITH d AS (SELECT CASE WHEN doc_id % 4 = 0
          |    THEN (${h16Sql("doc_id::VARCHAR || ':bh'")} % 1024) / 51200.0
          |    ELSE (${h16Sql("doc_id::VARCHAR || ':bh'")} % 1024) / 1024.0
          |  END AS p FROM documents),
          |c AS (SELECT p, count(*)::BIGINT AS cnt FROM d GROUP BY 1),
          |r AS (SELECT *, sum(cnt) OVER (ORDER BY p) AS rnk FROM c),
          |m AS (SELECT sum(cnt)::BIGINT AS m FROM c),
          |f AS (SELECT p, rnk, m,
          |    (p::DECIMAL(18,10) * m <=
          |      rnk::DECIMAL(18,6) * 0.050000::DECIMAL(12,6)) AS pass
          |  FROM r, m),
          |k AS (SELECT coalesce(max(CASE WHEN pass THEN rnk END), 0) AS cut FROM f)
          |SELECT p AS p_value, m AS n_tests, rnk::BIGINT AS rank,
          |  round(rnk::DOUBLE * 0.05 / m, 6) AS bh_critical,
          |  rnk <= cut AS rejected
          |FROM f, k""".stripMargin),
    // the same Mann-Whitney accumulation with the negative prefix
    // and totals both per language
    "q_auc_by_group" ->
      s"""WITH d AS (SELECT lang, (doc_id % 4 = 0) AS label,
        |    (${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END AS score
        |  FROM documents WHERE lang IS NOT NULL),
        |g AS (SELECT lang, score AS s,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS p,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS n
        |  FROM d GROUP BY 1, 2),
        |c AS (SELECT *, sum(n) OVER (PARTITION BY lang ORDER BY s) AS cn FROM g)
        |SELECT lang,
        |  CASE WHEN sum(p) > 0 AND sum(n) > 0
        |    THEN round(sum(p * (2 * cn - n))::DOUBLE
        |      / (sum(p)::DOUBLE * sum(n)::DOUBLE * 2.0), 6)
        |    ELSE 'NaN'::DOUBLE END AS auc,
        |  sum(p)::BIGINT AS positives, sum(n)::BIGINT AS negatives
        |FROM c GROUP BY 1""".stripMargin,
    // same desc sweep, the exact-integer (a+b-1)//b bucket ceil, and
    // cumulative rollup over the bounded bucket frame
    "q_gains" ->
      s"""WITH d AS (SELECT (doc_id % 4 = 0) AS label,
        |    (${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END AS score
        |  FROM documents),
        |g AS (SELECT score AS s,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS p,
        |    count(*)::BIGINT AS t FROM d GROUP BY 1),
        |c AS (SELECT *, sum(p) OVER (ORDER BY s DESC) AS cp,
        |    sum(t) OVER (ORDER BY s DESC) AS ct FROM g),
        |tt AS (SELECT sum(p)::BIGINT AS pp, sum(t)::BIGINT AS nn FROM g),
        |b AS (SELECT least((10 * ct + nn - 1) // nn, 10)::INT AS bucket,
        |    sum(t)::BIGINT AS n_rows, sum(p)::BIGINT AS n_pos
        |  FROM c, tt GROUP BY 1),
        |cum AS (SELECT *, sum(n_rows) OVER (ORDER BY bucket) AS cum_rows,
        |    sum(n_pos) OVER (ORDER BY bucket) AS cum_pos FROM b)
        |SELECT bucket, n_rows, n_pos,
        |  round(n_pos::DOUBLE / n_rows::DOUBLE, 6) AS response_rate,
        |  cum_rows::BIGINT AS cum_rows, cum_pos::BIGINT AS cum_pos,
        |  CASE WHEN pp > 0
        |    THEN round(cum_pos::DOUBLE / pp::DOUBLE, 6) END AS cum_gain,
        |  CASE WHEN pp > 0 THEN round(
        |    (cum_pos::DOUBLE / cum_rows::DOUBLE) / (pp::DOUBLE / nn::DOUBLE), 6)
        |  END AS lift
        |FROM cum, tt""".stripMargin,
    // same parity arms and nudged dyadic conversion; pooled-variance
    // z in the identical formula order
    "q_ab_test" ->
      s"""WITH d AS (SELECT
        |    CASE WHEN doc_id % 2 = 0 THEN 'control' ELSE 'treat' END AS variant,
        |    ((${h16Sql("doc_id::VARCHAR || ':ab'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 2 = 1 THEN 0.15 ELSE 0 END) >= 0.5 AS conv
        |  FROM documents),
        |m AS (SELECT
        |    sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN variant = 'control' AND conv THEN 1 ELSE 0 END)::BIGINT
        |      AS conv_a,
        |    sum(CASE WHEN variant = 'treat' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN variant = 'treat' AND conv THEN 1 ELSE 0 END)::BIGINT
        |      AS conv_b
        |  FROM d)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  round(conv_a::DOUBLE / n_a::DOUBLE, 6) AS rate_a,
        |  round(conv_b::DOUBLE / n_b::DOUBLE, 6) AS rate_b,
        |  round(conv_b::DOUBLE / n_b::DOUBLE - conv_a::DOUBLE / n_a::DOUBLE, 6)
        |    AS lift,
        |  round((conv_b::DOUBLE / n_b::DOUBLE - conv_a::DOUBLE / n_a::DOUBLE)
        |    / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b)::DOUBLE)
        |      * (1.0::DOUBLE - (conv_a + conv_b)::DOUBLE / (n_a + n_b)::DOUBLE)
        |      * (1.0::DOUBLE / n_a::DOUBLE + 1.0::DOUBLE / n_b::DOUBLE)), 6) AS z
        |FROM m""".stripMargin,
    // exact DECIMAL moment sums, means rounded 6 dp BEFORE the
    // variance subtraction, identical fixed-order double t and
    // Welch-Satterthwaite df
    "q_welch" ->
      """WITH d AS (SELECT event_type AS g, round(value, 6)::DECIMAL(18,6) AS x
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |a AS (SELECT
        |    sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN g = 'click' THEN x END) AS sa,
        |    sum(CASE WHEN g = 'click' THEN (x * x)::DECIMAL(38,12) END) AS qa,
        |    sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN g = 'view' THEN x END) AS sb,
        |    sum(CASE WHEN g = 'view' THEN (x * x)::DECIMAL(38,12) END) AS qb
        |  FROM d),
        |m AS (SELECT *, round(sa::DOUBLE / n_a::DOUBLE, 6) AS ma,
        |    round(sb::DOUBLE / n_b::DOUBLE, 6) AS mb FROM a),
        |v AS (SELECT *,
        |    greatest(0.0, qa::DOUBLE - n_a::DOUBLE * ma * ma)
        |      / (n_a::DOUBLE - 1.0) AS va,
        |    greatest(0.0, qb::DOUBLE - n_b::DOUBLE * mb * mb)
        |      / (n_b::DOUBLE - 1.0) AS vb
        |  FROM m)
        |SELECT n_a, n_b, ma AS mean_a, mb AS mean_b,
        |  round(va, 6) AS var_a, round(vb, 6) AS var_b,
        |  round((mb - ma) / sqrt(va / n_a::DOUBLE + vb / n_b::DOUBLE), 6) AS t,
        |  round((va / n_a::DOUBLE + vb / n_b::DOUBLE)
        |      * (va / n_a::DOUBLE + vb / n_b::DOUBLE)
        |    / ((va / n_a::DOUBLE) * (va / n_a::DOUBLE) / (n_a::DOUBLE - 1.0)
        |      + (vb / n_b::DOUBLE) * (vb / n_b::DOUBLE) / (n_b::DOUBLE - 1.0)),
        |    4) AS df
        |FROM v""".stripMargin,
    // one grouped count per distinct value, tie-averaged ranks via
    // the window prefix sum (2rank = 2cum - t + 1 exact), HUGEINT
    // rank/tie sums mirroring Spark's DECIMAL, fixed-order double z
    "q_mannwhitney" ->
      """WITH d AS (SELECT value AS v, event_type AS g FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |c AS (SELECT v,
        |    sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)::BIGINT AS cb
        |  FROM d GROUP BY 1),
        |w AS (SELECT *, ca + cb AS t,
        |    sum(ca + cb) OVER (ORDER BY v) AS cum FROM c),
        |s AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
        |    sum(cb::HUGEINT * (2 * cum - t + 1)::HUGEINT) AS s2,
        |    sum((t::HUGEINT * t * t - t)::HUGEINT) AS tt FROM w),
        |e AS (SELECT n_a, n_b,
        |    (s2 - n_b::HUGEINT * (n_b + 1)::HUGEINT)::DOUBLE AS twou,
        |    n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
        |    (n_a + n_b)::DOUBLE AS n, tt::DOUBLE AS ttd FROM s)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN round(twou / 2.0, 1) END AS u_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND n > 1
        |      AND na * nb * ((n + 1.0) - ttd / (n * (n - 1.0))) / 12.0 > 0
        |    THEN round((twou - na * nb)
        |      / (2.0 * sqrt(na * nb * ((n + 1.0) - ttd / (n * (n - 1.0))) / 12.0)),
        |      6) END AS z,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN round(twou / (na * nb) - 1.0, 6) END AS r_rank_biserial
        |FROM e""".stripMargin,
    // the same prefix-minus-running-min identity over identical
    // 6 dp DECIMAL deviations; alarm compares in DECIMAL, levels
    // convert once at the boundary
    "q_cusum" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value
        |  FROM events WHERE value IS NOT NULL),
        |p AS (SELECT *,
        |    sum(round(value - 50.0 - 5.0, 6)::DECIMAL(18,6)) OVER w AS pu,
        |    sum(round(-(value - 50.0) - 5.0, 6)::DECIMAL(18,6)) OVER w AS pd
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        |    ROWS UNBOUNDED PRECEDING)),
        |m AS (SELECT *, least(0, min(pu) OVER w2) AS mu,
        |    least(0, min(pd) OVER w2) AS md
        |  FROM p WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, ts_ms, event_id, value,
        |  (pu - mu > 100.000000::DECIMAL(18,6)
        |    OR pd - md > 100.000000::DECIMAL(18,6)) AS alarm,
        |  round((pu - mu)::DOUBLE, 6) AS cusum_hi,
        |  round((pd - md)::DOUBLE, 6) AS cusum_lo
        |FROM m""".stripMargin,
    // exact-integer basket/pair counts both sides; the three ratios
    // are identically-ordered double divisions rounded 6 dp
    "q_cooccurrence" ->
      """WITH d AS (SELECT DISTINCT user_id, event_type FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |nb AS (SELECT count(DISTINCT user_id)::BIGINT AS n FROM d),
        |i AS (SELECT event_type AS it, count(*)::BIGINT AS ni FROM d GROUP BY 1),
        |p AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
        |    count(*)::BIGINT AS n_ab
        |  FROM d a JOIN d b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, ia.ni AS n_a, ib.ni AS n_b, n_ab,
        |  round(n_ab::DOUBLE / n, 6) AS support,
        |  round(n_ab::DOUBLE / ia.ni, 6) AS confidence,
        |  round(n_ab::DOUBLE * n / (ia.ni::DOUBLE * ib.ni), 6) AS lift
        |FROM p JOIN i ia ON item_a = ia.it JOIN i ib ON item_b = ib.it, nb""".stripMargin,
    // identical per-user range join + window; linear credits are
    // round(1/n, 10) DECIMAL both sides, last = rn == n over the
    // same (tt, event_id) total order
    "q_attribution_linear" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL),
        |t AS (SELECT user_id, ms AS tt, event_id AS tid, event_type AS channel
        |  FROM e WHERE event_type IN ('click', 'view')),
        |c AS (SELECT user_id, ms AS tc, event_id AS cid FROM e
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT t.channel, t.user_id, c.cid, t.tt, t.tid
        |  FROM t JOIN c USING (user_id)
        |  WHERE t.tt <= c.tc AND t.tt > c.tc - 259200000),
        |w AS (SELECT *, count(*) OVER (PARTITION BY user_id, cid) AS n FROM j)
        |SELECT channel, count(DISTINCT cid)::BIGINT AS n_conversions,
        |  round(sum(round(1.0 / n, 10)::DECIMAL(28,10))::DOUBLE, 4) AS credit
        |FROM w GROUP BY 1""".stripMargin,
    "q_attribution_last" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_id IS NOT NULL),
        |t AS (SELECT user_id, ms AS tt, event_id AS tid, event_type AS channel
        |  FROM e WHERE event_type IN ('click', 'view')),
        |c AS (SELECT user_id, ms AS tc, event_id AS cid FROM e
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT t.channel, t.user_id, c.cid, t.tt, t.tid
        |  FROM t JOIN c USING (user_id)
        |  WHERE t.tt <= c.tc AND t.tt > c.tc - 259200000),
        |w AS (SELECT *, count(*) OVER (PARTITION BY user_id, cid) AS n,
        |    row_number() OVER (PARTITION BY user_id, cid
        |      ORDER BY tt, tid) AS rn FROM j)
        |SELECT channel, count(DISTINCT cid)::BIGINT AS n_conversions,
        |  round(sum(1::DECIMAL(28,10))::DOUBLE, 4) AS credit
        |FROM w WHERE rn = n GROUP BY 1""".stripMargin,
    // same 6 dp reference-decile edges (quantile_cont = Spark's exact
    // percentile), strict-> binning, Laplace shares, double-rounded
    // ln terms
    "q_psi" ->
      """WITH ref AS (SELECT n_chars::DOUBLE AS v FROM documents
        |  WHERE n_chars IS NOT NULL),
        |cur AS (SELECT n_chars::DOUBLE AS v FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars >= 200),
        |e AS (SELECT list_transform(
        |    quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |    x -> round(x, 6)) AS ed FROM ref),
        |rb AS (SELECT len(list_filter(ed, x -> v > x)) AS bin FROM ref, e),
        |cb AS (SELECT len(list_filter(ed, x -> v > x)) AS bin FROM cur, e),
        |cr AS (SELECT bin, count(*)::BIGINT AS n_ref FROM rb GROUP BY 1),
        |cc AS (SELECT bin, count(*)::BIGINT AS n_cur FROM cb GROUP BY 1),
        |bg AS (SELECT unnest(range(0, 10)) AS bin),
        |cells AS (SELECT bg.bin,
        |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM bg LEFT JOIN cr ON cr.bin = bg.bin
        |  LEFT JOIN cc ON cc.bin = bg.bin),
        |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM cells),
        |p AS (SELECT bin,
        |    CASE WHEN bin > 0 THEN ed[bin] END AS lo,
        |    CASE WHEN bin < 9 THEN ed[bin + 1] END AS hi,
        |    n_ref, n_cur,
        |    round((n_ref + 1)::DOUBLE / (tr + 10), 6) AS p_ref,
        |    round((n_cur + 1)::DOUBLE / (tc + 10), 6) AS p_cur
        |  FROM cells, t, e)
        |SELECT bin::INT AS bin, lo, hi, n_ref, n_cur, p_ref, p_cur,
        |  round(round((p_cur - p_ref) * ln(p_cur / p_ref), 8), 6) AS psi_term
        |FROM p""".stripMargin,
    // same two salted dyadic gates; concordance cells exact, one
    // double division for the statistic
    "q_mcnemar" ->
      s"""WITH d AS (SELECT (doc_id % 4 = 0) AS label,
        |    ((${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END) >= 0.7 AS pa,
        |    ((${h16Sql("doc_id::VARCHAR || ':auc2'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END) >= 0.7 AS pb
        |  FROM documents),
        |m AS (SELECT count(*)::BIGINT AS n_pairs,
        |    sum(CASE WHEN pa = label AND pb = label THEN 1 ELSE 0 END)::BIGINT
        |      AS both_correct,
        |    sum(CASE WHEN pa <> label AND pb <> label THEN 1 ELSE 0 END)::BIGINT
        |      AS both_wrong,
        |    sum(CASE WHEN pa = label AND pb <> label THEN 1 ELSE 0 END)::BIGINT
        |      AS a_only,
        |    sum(CASE WHEN pa <> label AND pb = label THEN 1 ELSE 0 END)::BIGINT
        |      AS b_only
        |  FROM d)
        |SELECT *, CASE WHEN a_only + b_only > 0 THEN
        |    round((a_only - b_only)::DOUBLE * (a_only - b_only)::DOUBLE
        |      / (a_only + b_only)::DOUBLE, 6) END AS mcnemar
        |FROM m""".stripMargin,
    // same tumbling bucket; open/close via row_number over the
    // identical unique (ms, event_id) order
    "q_ohlc" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, value FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL),
        |b AS (SELECT user_id,
        |    (ms - ((ms % 604800000 + 604800000) % 604800000))::BIGINT AS bucket_ms,
        |    ms, event_id, value FROM e),
        |w AS (SELECT *, row_number() OVER (PARTITION BY user_id, bucket_ms
        |      ORDER BY ms, event_id) AS ra,
        |    row_number() OVER (PARTITION BY user_id, bucket_ms
        |      ORDER BY ms DESC, event_id DESC) AS rd FROM b)
        |SELECT user_id, bucket_ms, count(*)::BIGINT AS n_obs,
        |  max(CASE WHEN ra = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rd = 1 THEN value END) AS close
        |FROM w GROUP BY 1, 2""".stripMargin,
    // same distinct epoch days and day − row_number island ids;
    // longest-run pick = (len desc, start asc) via the equality join
    "q_streaks" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |d AS (SELECT DISTINCT user_id,
        |    ((ms - ((ms % 86400000 + 86400000) % 86400000)) // 86400000)::BIGINT
        |      AS day FROM e),
        |r AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS isl
        |  FROM d),
        |runs AS (SELECT user_id, isl, count(*)::BIGINT AS len,
        |    min(day)::BIGINT AS strt FROM r GROUP BY 1, 2),
        |agg AS (SELECT user_id, sum(len)::BIGINT AS n_active_days,
        |    max(len)::BIGINT AS longest FROM runs GROUP BY 1),
        |pick AS (SELECT runs.user_id, min(strt)::BIGINT AS start FROM runs
        |  JOIN agg ON runs.user_id = agg.user_id AND runs.len = agg.longest
        |  GROUP BY 1)
        |SELECT agg.user_id, n_active_days, longest AS longest_streak,
        |  start AS longest_streak_start_day
        |FROM agg JOIN pick ON agg.user_id = pick.user_id""".stripMargin,
    // same RANGE trailing-window count (ties share the frame by
    // RANGE semantics in both engines); exact counts
    "q_rate_limit" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |w AS (SELECT user_id, ms, count(*) OVER (PARTITION BY user_id ORDER BY ms
        |    RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW) AS c FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(CASE WHEN c > 2 THEN 1 ELSE 0 END)::BIGINT AS n_violations,
        |  max(c)::BIGINT AS max_in_window,
        |  min(CASE WHEN c > 2 THEN ms END)::BIGINT AS first_violation_ms
        |FROM w GROUP BY 1""".stripMargin,
    // same 6 dp DECIMAL(18,6) moments; fixed-order divisions, one
    // sqrt, R2 null on constant labels
    "q_regression_eval" ->
      s"""WITH d AS (SELECT
        |    (n_chars + (${h16Sql("doc_id::VARCHAR || ':reg'")} % 21) - 10)
        |      ::DOUBLE AS pred,
        |    n_chars::DOUBLE AS label
        |  FROM documents),
        |c AS (SELECT round(pred, 6)::DECIMAL(18,6) AS p,
        |    round(label, 6)::DECIMAL(18,6) AS y FROM d
        |  WHERE pred IS NOT NULL AND label IS NOT NULL),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    coalesce(sum(abs((p - y)::DECIMAL(18,6))), 0)::DECIMAL(38,6) AS sae,
        |    coalesce(sum((p - y)::DECIMAL(18,6) * (p - y)::DECIMAL(18,6)), 0)
        |      ::DECIMAL(38,12) AS sse,
        |    coalesce(sum(y), 0)::DECIMAL(38,6) AS sy,
        |    coalesce(sum(y * y), 0)::DECIMAL(38,12) AS syy
        |  FROM c)
        |SELECT n AS n_rows,
        |  CASE WHEN n > 0 THEN round(sae::DOUBLE / n::DOUBLE, 6) END AS mae,
        |  CASE WHEN n > 0 THEN round(sqrt(sse::DOUBLE / n::DOUBLE), 6) END AS rmse,
        |  CASE WHEN n > 0 AND (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE) > 0
        |    THEN round(1.0::DOUBLE - sse::DOUBLE
        |      / (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE), 6)
        |  END AS r2
        |FROM m""".stripMargin,
    // same normalized distinct edge set; EXISTS = the semi join
    "q_reciprocity" ->
      """WITH raw AS (
        |  SELECT 'h' || (doc_id % 40)::VARCHAR AS s,
        |         'h' || ((doc_id * 3 + 7) % 40)::VARCHAR AS d FROM documents
        |  UNION ALL
        |  SELECT 'h' || (doc_id % 40)::VARCHAR,
        |         'h' || ((doc_id * 7 + 11) % 40)::VARCHAR
        |  FROM documents WHERE doc_id % 2 = 0),
        |e AS (SELECT DISTINCT s, d FROM raw
        |  WHERE s <> d AND s IS NOT NULL AND d IS NOT NULL),
        |r AS (SELECT count(*)::BIGINT AS n_reciprocal FROM e
        |  WHERE EXISTS (SELECT 1 FROM e e2 WHERE e2.s = e.d AND e2.d = e.s)),
        |t AS (SELECT count(*)::BIGINT AS n_edges FROM e)
        |SELECT n_edges, n_reciprocal,
        |  CASE WHEN n_edges > 0
        |    THEN round(n_reciprocal::DOUBLE / n_edges::DOUBLE, 6) END AS reciprocity
        |FROM t, r""".stripMargin,
    // same unique (ms, event_id) lag order; quantile_cont matches
    // Spark's exact percentile interpolation
    "q_interarrival" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT user_id, ms - lag(ms) OVER (
        |    PARTITION BY user_id ORDER BY ms, event_id) AS gap FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  count(gap)::BIGINT AS n_gaps, min(gap)::BIGINT AS min_gap,
        |  round(quantile_cont(gap::DOUBLE, 0.5), 6) AS median_gap,
        |  round(quantile_cont(gap::DOUBLE, 0.9), 6) AS p90_gap,
        |  max(gap)::BIGINT AS max_gap
        |FROM g GROUP BY 1""".stripMargin,
    // same hole rules; exact cell counts, one double division per pair
    "q_missingness" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN n_chars < 150 THEN NULL ELSE n_chars END AS len_opt,
        |    CASE WHEN lang = 'en' THEN NULL ELSE lang END AS lang_opt
        |  FROM documents),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS m0,
        |    sum(CASE WHEN len_opt IS NULL THEN 1 ELSE 0 END)::BIGINT AS m1,
        |    sum(CASE WHEN lang_opt IS NULL THEN 1 ELSE 0 END)::BIGINT AS m2,
        |    sum(CASE WHEN doc_id IS NULL AND len_opt IS NULL THEN 1 ELSE 0 END)::BIGINT AS b01,
        |    sum(CASE WHEN doc_id IS NULL AND lang_opt IS NULL THEN 1 ELSE 0 END)::BIGINT AS b02,
        |    sum(CASE WHEN len_opt IS NULL AND lang_opt IS NULL THEN 1 ELSE 0 END)::BIGINT AS b12
        |  FROM d)
        |SELECT 'doc_id' AS col_x, 'len_opt' AS col_y, n AS n_rows, m0 AS x_null,
        |  m1 AS y_null, b01 AS both_null,
        |  CASE WHEN m0 + m1 - b01 > 0
        |    THEN round(b01::DOUBLE / (m0 + m1 - b01)::DOUBLE, 6) END AS jaccard
        |FROM m
        |UNION ALL SELECT 'doc_id', 'lang_opt', n, m0, m2, b02,
        |  CASE WHEN m0 + m2 - b02 > 0
        |    THEN round(b02::DOUBLE / (m0 + m2 - b02)::DOUBLE, 6) END FROM m
        |UNION ALL SELECT 'len_opt', 'lang_opt', n, m1, m2, b12,
        |  CASE WHEN m1 + m2 - b12 > 0
        |    THEN round(b12::DOUBLE / (m1 + m2 - b12)::DOUBLE, 6) END FROM m""".stripMargin,
    // same dyadic score and >= threshold; exact counts, one double
    // division per metric in the same formula order
    "q_confusion" ->
      s"""WITH d AS (SELECT (doc_id % 4 = 0) AS label,
        |    (${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END AS score
        |  FROM documents),
        |m AS (SELECT
        |    sum(CASE WHEN score >= 0.7 AND label THEN 1 ELSE 0 END)::BIGINT AS tp,
        |    sum(CASE WHEN score >= 0.7 AND NOT label THEN 1 ELSE 0 END)::BIGINT AS fp,
        |    sum(CASE WHEN score < 0.7 AND NOT label THEN 1 ELSE 0 END)::BIGINT AS tn,
        |    sum(CASE WHEN score < 0.7 AND label THEN 1 ELSE 0 END)::BIGINT AS fn
        |  FROM d)
        |SELECT 0.7::DOUBLE AS threshold, tp, fp, tn, fn,
        |  round((tp + tn)::DOUBLE / (tp + fp + tn + fn)::DOUBLE, 6) AS accuracy,
        |  CASE WHEN tp + fp > 0
        |    THEN round(tp::DOUBLE / (tp + fp)::DOUBLE, 6) END AS precision,
        |  CASE WHEN tp + fn > 0
        |    THEN round(tp::DOUBLE / (tp + fn)::DOUBLE, 6) END AS recall,
        |  CASE WHEN tp + fp > 0 AND tp + fn > 0 THEN
        |    CASE WHEN tp > 0 THEN round(
        |      2.0::DOUBLE * (tp::DOUBLE / (tp + fp)::DOUBLE)
        |        * (tp::DOUBLE / (tp + fn)::DOUBLE)
        |        / (tp::DOUBLE / (tp + fp)::DOUBLE + tp::DOUBLE / (tp + fn)::DOUBLE), 6)
        |    ELSE 0.0 END END AS f1
        |FROM m""".stripMargin,
    // same dyadic score; blockwise descending sweep with the
    // pessimistic (block-end) precision convention, 10 dp per-block
    // terms into exact DECIMAL, one double division
    "q_pr_auc" ->
      s"""WITH d AS (SELECT (doc_id % 4 = 0) AS label,
        |    (${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END AS score
        |  FROM documents),
        |g AS (SELECT score AS s,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS p,
        |    count(*)::BIGINT AS t
        |  FROM d GROUP BY 1),
        |c AS (SELECT *, sum(p) OVER (ORDER BY s DESC) AS cp,
        |    sum(t) OVER (ORDER BY s DESC) AS ct FROM g)
        |SELECT round(sum(round(p * cp::DOUBLE / ct, 10)::DECIMAL(28,10))::DOUBLE
        |    / sum(p)::DOUBLE, 6) AS average_precision,
        |  sum(p)::BIGINT AS positives,
        |  sum(t - p)::BIGINT AS negatives
        |FROM c""".stripMargin,
    // same clamped binning and 6 dp per-bin rounding as
    // q_calibration; 10 dp per-bin terms into exact DECIMAL
    "q_ece" ->
      s"""WITH d AS (SELECT (doc_id % 4 = 0) AS label,
        |    (${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END AS score
        |  FROM documents),
        |b AS (SELECT least(greatest(floor(score * 10), 0), 9)::BIGINT AS bin,
        |    count(*)::BIGINT AS n,
        |    round(sum(score::DECIMAL(28,10))::DOUBLE / count(*), 6) AS ms,
        |    round(sum(CASE WHEN label THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
        |      AS pr
        |  FROM d GROUP BY 1)
        |SELECT sum(n)::BIGINT AS n_items, count(*)::BIGINT AS bins_used,
        |  round(sum(round(n * abs(ms - pr), 10)::DECIMAL(28,10))::DOUBLE
        |    / sum(n)::DOUBLE, 6) AS ece
        |FROM b""".stripMargin,
    // identical clamped binning; mean over the exact 10-digit decimal
    // sum (the dyadic 1/1024 scores are exactly DECIMAL(28,10))
    "q_calibration" ->
      s"""WITH d AS (SELECT (doc_id % 4 = 0) AS label,
        |    (${h16Sql("doc_id::VARCHAR || ':auc'")} % 1024) / 1024.0
        |      + CASE WHEN doc_id % 4 = 0 THEN 0.25 ELSE 0 END AS score
        |  FROM documents)
        |SELECT least(greatest(floor(score * 10), 0), 9)::BIGINT AS bin,
        |  count(*)::BIGINT AS n,
        |  round(sum(score::DECIMAL(28,10))::DOUBLE / count(*), 6) AS mean_score,
        |  round(sum(CASE WHEN label THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
        |    AS pos_rate
        |FROM d GROUP BY 1""".stripMargin,
    // same quasi grouping (floor-binned balance), bounded stats over
    // the group-size table
    "q_kanon" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    count(*)::BIGINT AS n FROM customer GROUP BY 1, 2)
        |SELECT 10::BIGINT AS k, sum(n)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_groups,
        |  sum(CASE WHEN n < 10 THEN 1 ELSE 0 END)::BIGINT AS n_small_groups,
        |  sum(CASE WHEN n < 10 THEN n ELSE 0 END)::BIGINT AS rows_at_risk,
        |  min(n)::BIGINT AS min_group_size
        |FROM g""".stripMargin,
    "q_corpus_card" ->
      (s"""WITH $docsWithDupsSql
          |SELECT lang, count(*)::BIGINT AS n_docs,
          |  round(sum(length(text)::DECIMAL(28,0))::DOUBLE / count(text), 4) AS mean_chars,
          |  round(median(length(text)::DOUBLE), 4) AS p50_chars,
          |  round(1.0 - count(DISTINCT md5(text))::DOUBLE / count(text), 6) AS dup_rate
          |FROM docs GROUP BY 1""".stripMargin),
    // same (count desc, key asc) rank and bounded cumulative shares
    "q_topk_coverage" ->
      """WITH c AS (SELECT source AS k, count(*)::BIGINT AS c FROM documents
        |  WHERE source IS NOT NULL GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, k ASC) AS rnk FROM c),
        |t AS (SELECT sum(c)::BIGINT AS tot FROM c),
        |g AS (SELECT unnest([1, 5, 10]) AS k)
        |SELECT g.k::INT AS k, coalesce(sum(r.c), 0)::BIGINT AS top_rows,
        |  CASE WHEN tot > 0 THEN
        |    round(coalesce(sum(r.c), 0)::DOUBLE / tot::DOUBLE, 6) END AS coverage
        |FROM g LEFT JOIN r ON r.rnk <= g.k, t GROUP BY g.k, tot""".stripMargin,
    // same two count frames joined on the key; HUGEINT products
    "q_join_cardinality" ->
      """WITH ca AS (SELECT o_orderkey AS k, count(*)::BIGINT AS c FROM orders
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1),
        |cb AS (SELECT l_orderkey AS k, count(*)::BIGINT AS c FROM lineitem
        |  WHERE l_orderkey IS NOT NULL GROUP BY 1),
        |sh AS (SELECT count(*)::BIGINT AS n_shared_keys,
        |    coalesce(sum(ca.c::HUGEINT * cb.c::HUGEINT), 0)::BIGINT AS join_rows,
        |    coalesce(max(ca.c::HUGEINT * cb.c::HUGEINT), 0)::BIGINT AS max_key_rows
        |  FROM ca JOIN cb USING (k)),
        |ta AS (SELECT coalesce(sum(c), 0)::BIGINT AS n_rows_a,
        |    count(*)::BIGINT AS n_keys_a FROM ca),
        |tb AS (SELECT coalesce(sum(c), 0)::BIGINT AS n_rows_b,
        |    count(*)::BIGINT AS n_keys_b FROM cb)
        |SELECT n_rows_a, n_rows_b, n_keys_a, n_keys_b, n_shared_keys,
        |  join_rows, max_key_rows
        |FROM ta, tb, sh""".stripMargin,
    // same floor-div epoch arithmetic (1970-01-01 = Thursday, dow 0 =
    // Sunday); one grouped count, share divided once
    "q_heatmap" ->
      """WITH e AS (SELECT epoch_ms(ts) AS ms FROM events WHERE ts IS NOT NULL),
        |c AS (SELECT (((ms - ((ms % 86400000 + 86400000) % 86400000)) // 86400000
        |      + 4) % 7 + 7) % 7 AS dow,
        |    (((ms - ((ms % 3600000 + 3600000) % 3600000)) // 3600000) % 24 + 24)
        |      % 24 AS hour,
        |    count(*)::BIGINT AS n_events
        |  FROM e GROUP BY 1, 2),
        |t AS (SELECT sum(n_events) AS tot FROM c)
        |SELECT dow::INT AS dow, hour::INT AS hour, n_events,
        |  round(n_events::DOUBLE / tot::DOUBLE, 6) AS share
        |FROM c, t""".stripMargin,
    // same grouped-tie rank sums (c·cumBefore + c(c+1)/2 exact
    // integers), DECIMAL(18,6)×DECIMAL(19,0) products, one boundary
    // rounding per output column
    "q_gini" ->
      """WITH d AS (SELECT lang, CAST(n_chars AS DECIMAL(18,6)) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |cells AS (SELECT lang, v, count(*)::BIGINT AS c FROM d GROUP BY 1, 2),
        |r AS (SELECT lang, v, c,
        |    sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum FROM cells),
        |g AS (SELECT lang, sum(c)::BIGINT AS n,
        |    sum(v * c::DECIMAL(19,0))::DECIMAL(38,6) AS sx,
        |    sum(v * (c*(cum - c) + c*(c+1)//2)::DECIMAL(19,0))::DECIMAL(38,6) AS s1
        |  FROM r GROUP BY 1)
        |SELECT lang, n AS n_rows, round(sx::DOUBLE, 6) AS total,
        |  CASE WHEN sx > 0 THEN
        |    round(2.0::DOUBLE * s1::DOUBLE / (n::DOUBLE * sx::DOUBLE)
        |      - (n+1)::DOUBLE / n::DOUBLE, 6) END AS gini
        |FROM g""".stripMargin,
    // same string-surgery digit (global-flag regexp), the shared
    // ::DOUBLE Benford literals, diff·diff squaring
    "q_benford" ->
      """WITH d AS (SELECT substring(
        |      regexp_replace(l_extendedprice::VARCHAR, '[^1-9]', '', 'g'), 1, 1
        |    )::INT AS digit
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
        |g AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d GROUP BY 1),
        |t AS (SELECT sum(n_obs)::BIGINT AS n FROM g),
        |e AS (SELECT digit, n_obs, n,
        |    CASE digit WHEN 1 THEN 0.3010299957::DOUBLE
        |      WHEN 2 THEN 0.1760912591::DOUBLE WHEN 3 THEN 0.1249387366::DOUBLE
        |      WHEN 4 THEN 0.0969100130::DOUBLE WHEN 5 THEN 0.0791812460::DOUBLE
        |      WHEN 6 THEN 0.0669467896::DOUBLE WHEN 7 THEN 0.0579919470::DOUBLE
        |      WHEN 8 THEN 0.0511525224::DOUBLE WHEN 9 THEN 0.0457574906::DOUBLE
        |    END AS expected_p
        |  FROM g, t)
        |SELECT digit, n_obs, round(n_obs::DOUBLE / n, 6) AS observed_p,
        |  expected_p,
        |  round((n_obs::DOUBLE - n * expected_p) * (n_obs::DOUBLE - n * expected_p)
        |    / (n * expected_p), 6) AS chi2_term
        |FROM e""".stripMargin,
    "q_ldiv" ->
      """WITH s AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band,
        |    count(*)::BIGINT AS n
        |  FROM customer GROUP BY 1, 2, 3),
        |g AS (SELECT c_nationkey, c_mktsegment, sum(n)::BIGINT AS rows_,
        |    sum(CASE WHEN band IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS div
        |  FROM s GROUP BY 1, 2)
        |SELECT 4::BIGINT AS l, sum(rows_)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_groups,
        |  sum(CASE WHEN div < 4 THEN 1 ELSE 0 END)::BIGINT AS n_low_diversity_groups,
        |  sum(CASE WHEN div < 4 THEN rows_ ELSE 0 END)::BIGINT AS rows_at_risk,
        |  min(div)::BIGINT AS min_diversity
        |FROM g""".stripMargin,
    // same grid: bounded band frame cross-joined to groups, cumulative
    // fractions divided once per (group, band) in a fixed order,
    // 10 dp terms into exact DECIMAL, one division by (m-1)
    "q_tcloseness" ->
      """WITH d AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL
        |    AND c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL),
        |cells AS (SELECT c_nationkey, c_mktsegment, v, count(*)::BIGINT AS c
        |  FROM d GROUP BY 1, 2, 3),
        |grp AS (SELECT c_nationkey, c_mktsegment, sum(c)::BIGINT AS ng
        |  FROM cells GROUP BY 1, 2),
        |vals AS (SELECT v, sum(c)::BIGINT AS cv FROM cells GROUP BY 1),
        |gcum AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cumv,
        |    (SELECT sum(cv) FROM vals) AS n, (SELECT count(*) FROM vals) AS m
        |  FROM vals),
        |grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.ng, gl.v, gl.cumv,
        |    gl.n, gl.m, coalesce(c.c, 0) AS c
        |  FROM grp g CROSS JOIN gcum gl
        |  LEFT JOIN cells c ON c.c_nationkey = g.c_nationkey
        |    AND c.c_mktsegment = g.c_mktsegment AND c.v = gl.v),
        |cum AS (SELECT *, sum(c) OVER (
        |    PARTITION BY c_nationkey, c_mktsegment ORDER BY v) AS cumg FROM grid),
        |e AS (SELECT c_nationkey, c_mktsegment, ng, m,
        |    sum(round(abs(cumg::DOUBLE / ng - cumv::DOUBLE / n), 10)
        |      ::DECIMAL(28,10)) AS s
        |  FROM cum GROUP BY 1, 2, 3, 4)
        |SELECT c_nationkey, c_mktsegment, ng AS n_rows,
        |  CASE WHEN m > 1 THEN round(s::DOUBLE / (m - 1), 6) ELSE 0.0 END AS emd,
        |  (CASE WHEN m > 1 THEN round(s::DOUBLE / (m - 1), 6) ELSE 0.0 END) > 0.2
        |    AS breaches_t
        |FROM e""".stripMargin,
    "q_kanon_flags" ->
      """SELECT c_custkey,
        |  (count(*) OVER (PARTITION BY c_nationkey, c_mktsegment))::BIGINT
        |    AS group_size,
        |  (count(*) OVER (PARTITION BY c_nationkey, c_mktsegment)) < 10
        |    AS at_risk
        |FROM customer""".stripMargin,
    // identical Java∩RE2 pattern over the same literal-replace
    // punctuation injection, trim+drop-empty, zipped unnest
    // ordinality for the 0-based index
    "q_sentences" ->
      """WITH l AS (SELECT doc_id,
        |    list_filter(list_transform(regexp_extract_all(
        |      replace(replace(text, 'e ', 'e. '), 'w ', 'w! '),
        |      '[^.!?]+[.!?]*'),
        |      s -> trim(s)), s -> s <> '') AS sents
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(sents) AS sentence,
        |    unnest(range(0, len(sents))) AS sent_idx FROM l)
        |SELECT doc_id, sent_idx::INT AS sent_idx, sentence FROM u""".stripMargin,
    // identical three regexp counts + the same double formula order
    "q_readability" ->
      """WITH p AS (SELECT doc_id,
        |    replace(replace(text, 'e ', 'e. '), 'w ', 'w! ') AS t2
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    len(list_filter(string_split(t2, ' '), w -> w <> ''))::BIGINT AS n_words,
        |    greatest(len(regexp_extract_all(t2, '[.!?]+')), 1)::BIGINT AS n_sents,
        |    len(regexp_extract_all(lower(t2), '[aeiouy]+'))::BIGINT AS n_vowel_groups
        |  FROM p),
        |c2 AS (SELECT *,
        |    2068350 * n_sents * n_words - 10150 * n_words * n_words
        |      - 846000 * n_vowel_groups * n_sents AS rn,
        |    n_sents * n_words AS rd
        |  FROM c)
        |SELECT doc_id, n_words, n_sents, n_vowel_groups,
        |  CASE WHEN n_words > 0 THEN
        |    (CASE WHEN rn >= 0 THEN (rn * 2 + rd) // (rd * 2)
        |      ELSE -(((-rn) * 2 + rd) // (rd * 2)) END)::DOUBLE / 10000.0
        |  END AS flesch
        |FROM c2""".stripMargin,
    // same row-local bigrams (the q_lm_score list_transform shape),
    // identical probability-ratio arithmetic order, 6 dp before the
    // ordered top-50 cut
    "q_pmi" ->
      """WITH tk AS (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |un AS (SELECT unnest(w) AS t FROM tk),
        |uc AS (SELECT t, count(*)::BIGINT AS cu FROM un GROUP BY 1),
        |ut AS (SELECT sum(cu)::BIGINT AS u FROM uc),
        |bgx AS (SELECT unnest(list_transform(range(0, len(w) - 1),
        |    i -> {'a': w[i + 1], 'b': w[i + 2]})) AS p FROM tk WHERE len(w) >= 2),
        |bc AS (SELECT p.a AS w1, p.b AS w2, count(*)::BIGINT AS n_pair
        |  FROM bgx GROUP BY 1, 2),
        |bt AS (SELECT sum(n_pair)::BIGINT AS bto FROM bc)
        |SELECT w1, w2, n_pair,
        |  round(ln((n_pair::DOUBLE / bto) / ((c1.cu::DOUBLE / u) * (c2.cu::DOUBLE / u))), 6) AS pmi
        |FROM bc JOIN uc c1 ON bc.w1 = c1.t JOIN uc c2 ON bc.w2 = c2.t, ut, bt
        |WHERE n_pair >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    // same two count tables; score ranks on the ROUNDED value in
    // both engines, ties to the smaller term
    "q_class_terms" ->
      """WITH tk AS (SELECT lang AS cls,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |ct AS (SELECT cls, t, count(*)::BIGINT AS ctc FROM tk GROUP BY 1, 2),
        |cn AS (SELECT cls, sum(ctc)::BIGINT AS n FROM ct GROUP BY 1),
        |a AS (SELECT sum(n)::DOUBLE / count(*) AS av FROM cn),
        |ft AS (SELECT t, sum(ctc)::BIGINT AS ftc FROM ct GROUP BY 1),
        |sc AS (SELECT cls, t,
        |    round((ctc::DOUBLE / n) * ln(1.0 + av / ftc), 6) AS score
        |  FROM ct JOIN cn USING (cls) JOIN ft USING (t), a),
        |r AS (SELECT *, row_number() OVER (PARTITION BY cls
        |    ORDER BY score DESC, t) AS rank FROM sc)
        |SELECT cls AS lang, t AS term, score, rank::INT AS rank
        |FROM r WHERE rank <= 10""".stripMargin,
    // identical dedup/collapse rule: fingerprint equality over the
    // (doc_id, version) order, intervals from lead()
    "q_scd2" ->
      """WITH ch AS (
        |  SELECT doc_id, text, lang, 1::BIGINT AS version FROM documents
        |  UNION ALL SELECT doc_id, text || ' v2', lang, 2 FROM documents
        |    WHERE doc_id % 10 = 4
        |  UNION ALL SELECT doc_id, text, lang, 2 FROM documents
        |    WHERE doc_id % 10 = 7
        |  UNION ALL SELECT doc_id, text || ' v3', lang, 3 FROM documents
        |    WHERE doc_id % 10 = 4 AND doc_id % 3 = 0),
        |f AS (SELECT *, md5(concat_ws(chr(1), coalesce(text, chr(0)),
        |    coalesce(lang, chr(0)))) AS fp FROM ch),
        |k AS (SELECT * FROM (SELECT f.*, lag(fp) OVER
        |    (PARTITION BY doc_id ORDER BY version) AS pfp FROM f)
        |  WHERE pfp IS NULL OR pfp <> fp)
        |SELECT doc_id, text, lang, version AS valid_from,
        |  lead(version) OVER (PARTITION BY doc_id ORDER BY version) AS valid_to,
        |  lead(version) OVER (PARTITION BY doc_id ORDER BY version) IS NULL AS is_current
        |FROM k""".stripMargin,
    // identical next-fit-decreasing rule: cum-before window over the
    // same (size DESC, file) order, integer floor division
    "q_compaction_plan" ->
      """WITH f AS (SELECT source AS file, sum(n_chars)::BIGINT AS size_bytes
        |  FROM documents GROUP BY 1),
        |c AS (SELECT file, size_bytes,
        |  coalesce(sum(size_bytes) OVER (ORDER BY size_bytes DESC, file
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM f)
        |SELECT file, size_bytes, (cb // 100000)::INT AS bin FROM c""".stripMargin,
    "q_zorder" ->
      s"""SELECT doc_id, ${zorderSql(
        Seq("least(n_chars, 65535)", hNibSql("source", 4)), 16)}::BIGINT AS z
        |FROM documents""".stripMargin,
    // percent_rank shares the (rank-1)/(n-1) definition and the
    // tie-sharing rule in both engines; one 6 dp round
    "q_pct_rank" ->
      """SELECT doc_id, lang, n_chars,
        |  round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars), 6) AS n_chars_pct
        |FROM documents""".stripMargin,
    // identical decimal-moment least squares: 6 dp ln values and
    // products, DECIMAL(18,6) sums, one double solve, same rounding
    "q_zipf" ->
      """WITH tk AS (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS t FROM documents),
        |c0 AS (SELECT t, count(*) AS c FROM tk GROUP BY 1 HAVING count(*) >= 2),
        |top AS (SELECT t, c FROM c0 ORDER BY c DESC, t LIMIT 1000),
        |xy AS (SELECT round(ln(row_number() OVER (ORDER BY c DESC, t)::DOUBLE), 6) AS x,
        |    round(ln(c::DOUBLE), 6) AS y FROM top),
        |s AS (SELECT count(*)::BIGINT AS n_terms,
        |    sum(x::DECIMAL(18,6)) AS sx, sum(y::DECIMAL(18,6)) AS sy,
        |    sum(round(x*x, 6)::DECIMAL(18,6)) AS sxx,
        |    sum(round(x*y, 6)::DECIMAL(18,6)) AS sxy FROM xy),
        |d AS (SELECT n_terms, n_terms::DOUBLE AS n, sx::DOUBLE AS sxd,
        |    sy::DOUBLE AS syd, sxx::DOUBLE AS sxxd, sxy::DOUBLE AS sxyd FROM s),
        |e AS (SELECT n_terms, n, sxd, syd,
        |    CASE WHEN n_terms >= 2 AND n*sxxd - sxd*sxd <> 0
        |      THEN (n*sxyd - sxd*syd) / (n*sxxd - sxd*sxd) END AS sl FROM d)
        |SELECT n_terms, round(sl, 6) AS slope,
        |  round((syd - sl*sxd) / n, 6) AS intercept FROM e""".stripMargin,
    // same 6 dp-rounded thresholds as the gate; the clip itself is
    // exact double least/greatest in both engines
    "q_winsorize" ->
      """WITH thr AS (SELECT lang,
        |    round(quantile_cont(n_chars::DOUBLE, 0.05), 6) AS lo,
        |    round(quantile_cont(n_chars::DOUBLE, 0.95), 6) AS hi
        |  FROM documents GROUP BY 1)
        |SELECT doc_id, lang, n_chars,
        |  least(greatest(n_chars::DOUBLE, lo), hi) AS n_chars_w
        |FROM documents JOIN thr USING (lang)""".stripMargin,
    "q_quantiles_by_group" ->
      """SELECT lang, 'n_chars' AS "column", unnest([0.25, 0.5, 0.9]::DOUBLE[]) AS prob,
        |  round(unnest(quantile_cont(n_chars::DOUBLE, [0.25, 0.5, 0.9])), 4) AS quantile
        |FROM documents GROUP BY lang""".stripMargin,
    "q_quantile_gate" ->
      """WITH thr AS (SELECT lang, round(quantile_cont(n_chars::DOUBLE, 0.25), 6) AS t
        |  FROM documents GROUP BY 1)
        |SELECT doc_id, lang, n_chars FROM documents JOIN thr USING (lang)
        |WHERE n_chars::DOUBLE >= t""".stripMargin,
    "q_key_skew" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |o AS (SELECT sum(n)::BIGINT AS total_rows, count(*) AS distinct_keys,
        |  max(n) AS max_count FROM c),
        |t AS (SELECT coalesce(sum(n), 0)::BIGINT AS top_n
        |  FROM (SELECT n FROM c ORDER BY n DESC, lang LIMIT 2))
        |SELECT total_rows, distinct_keys, max_count,
        |  round(total_rows::DOUBLE / distinct_keys, 4) AS avg_count,
        |  round(max_count / (total_rows::DOUBLE / distinct_keys), 4) AS skew_factor,
        |  round(top_n / total_rows::DOUBLE, 6) AS top_share
        |FROM o, t""".stripMargin,
    "q_funnel" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY 1),
        |ent AS (SELECT doc_id, sum(round(-(n/t) * log2(n/t), 6)::DECIMAL(18,6)) AS e
        |  FROM cnt JOIN tot USING (doc_id) GROUP BY doc_id),
        |a AS (SELECT count(*) AS total,
        |  sum(CASE WHEN trim(text) <> '' THEN 1 ELSE 0 END)::BIGINT AS p0,
        |  sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)::BIGINT AS p1,
        |  sum(CASE WHEN lang IN ('en','fr','de') THEN 1 ELSE 0 END)::BIGINT AS p2,
        |  sum(CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 30
        |    THEN 1 ELSE 0 END)::BIGINT AS p3,
        |  sum(CASE WHEN coalesce(e, 0) >= 4.0 THEN 1 ELSE 0 END)::BIGINT AS p4,
        |  sum(CASE WHEN trim(text) <> '' THEN 1 ELSE 0 END)::BIGINT AS c0,
        |  sum(CASE WHEN trim(text) <> '' AND n_chars >= 200
        |    THEN 1 ELSE 0 END)::BIGINT AS c1,
        |  sum(CASE WHEN trim(text) <> '' AND n_chars >= 200
        |    AND lang IN ('en','fr','de') THEN 1 ELSE 0 END)::BIGINT AS c2,
        |  sum(CASE WHEN trim(text) <> '' AND n_chars >= 200
        |    AND lang IN ('en','fr','de')
        |    AND len(string_split_regex(trim(text), '\s+')) >= 30
        |    THEN 1 ELSE 0 END)::BIGINT AS c3,
        |  sum(CASE WHEN trim(text) <> '' AND n_chars >= 200
        |    AND lang IN ('en','fr','de')
        |    AND len(string_split_regex(trim(text), '\s+')) >= 30
        |    AND coalesce(e, 0) >= 4.0 THEN 1 ELSE 0 END)::BIGINT AS c4
        |  FROM documents LEFT JOIN ent USING (doc_id))
        |SELECT 0 AS stage_idx, 'nonempty' AS stage, p0 AS pass_count,
        |  c0 AS cum_count, round(c0 / total::DOUBLE, 6) AS cum_share FROM a
        |UNION ALL SELECT 1, 'min_chars', p1, c1, round(c1 / total::DOUBLE, 6) FROM a
        |UNION ALL SELECT 2, 'known_lang', p2, c2, round(c2 / total::DOUBLE, 6) FROM a
        |UNION ALL SELECT 3, 'min_tokens', p3, c3, round(c3 / total::DOUBLE, 6) FROM a
        |UNION ALL SELECT 4, 'min_entropy', p4, c4, round(c4 / total::DOUBLE, 6) FROM a""".stripMargin,
    "q_funnel_by_group" ->
      """WITH a AS (SELECT lang, count(*) AS total,
        |  sum(CASE WHEN trim(text) <> '' THEN 1 ELSE 0 END)::BIGINT AS p0,
        |  sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)::BIGINT AS p1,
        |  sum(CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 30
        |    THEN 1 ELSE 0 END)::BIGINT AS p2,
        |  sum(CASE WHEN trim(text) <> '' THEN 1 ELSE 0 END)::BIGINT AS c0,
        |  sum(CASE WHEN trim(text) <> '' AND n_chars >= 200
        |    THEN 1 ELSE 0 END)::BIGINT AS c1,
        |  sum(CASE WHEN trim(text) <> '' AND n_chars >= 200
        |    AND len(string_split_regex(trim(text), '\s+')) >= 30
        |    THEN 1 ELSE 0 END)::BIGINT AS c2
        |  FROM documents GROUP BY lang)
        |SELECT lang, 0 AS stage_idx, 'nonempty' AS stage, p0 AS pass_count,
        |  c0 AS cum_count, round(c0 / total::DOUBLE, 6) AS cum_share FROM a
        |UNION ALL SELECT lang, 1, 'min_chars', p1, c1, round(c1 / total::DOUBLE, 6) FROM a
        |UNION ALL SELECT lang, 2, 'min_tokens', p2, c2, round(c2 / total::DOUBLE, 6) FROM a""".stripMargin,
    // Entropy replay: grouped code-point counts → 6 dp HALF_UP terms
    // → exact DECIMAL sum (the kernel's micro-unit sum), 4 dp out.
    "q_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY 1),
        |ent AS (SELECT doc_id, round(sum(round(-(n/t) * log2(n/t), 6)::DECIMAL(18,6)), 4)::DOUBLE AS e
        |  FROM cnt JOIN tot USING (doc_id) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN text IS NULL THEN NULL
        |    ELSE coalesce(ent.e, 0.0) END AS char_entropy,
        |  CASE WHEN text IS NULL THEN NULL
        |    WHEN length(text) > 0
        |    THEN round(length(regexp_replace(text, '[\x00-\x1f\x7f]', '', 'g'))::DOUBLE / length(text), 4)
        |    ELSE 1.0 END AS printable_ratio
        |FROM documents d LEFT JOIN ent USING (doc_id)""".stripMargin,
    // Script-signal replay: same synthesized multi-script text, same
    // remove-and-diff range-class counts, same argmax CASE chain.
    "q_script" ->
      """WITH a AS (SELECT doc_id,
        |  text || ' ' || repeat(CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'Привет мир' WHEN 1 THEN 'مرحبا بالعالم'
        |    WHEN 2 THEN '你好世界' ELSE '안녕하세요' END,
        |    CAST(doc_id % 3 AS INT) + 1) AS t FROM documents),
        |c AS (SELECT doc_id,
        |  length(t) - length(regexp_replace(t, '[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]', '', 'g')) AS n_latin,
        |  length(t) - length(regexp_replace(t, '[\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
        |  length(t) - length(regexp_replace(t, '[\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic,
        |  length(t) - length(regexp_replace(t, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS n_han,
        |  length(t) - length(regexp_replace(t, '[\x{AC00}-\x{D7AF}]', '', 'g')) AS n_hangul,
        |  length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS n_digit,
        |  length(t) - length(regexp_replace(t, '[\p{L}]', '', 'g')) AS n_letters
        |  FROM a)
        |SELECT doc_id, n_latin::BIGINT AS n_latin, n_cyrillic::BIGINT AS n_cyrillic,
        |  n_arabic::BIGINT AS n_arabic, n_han::BIGINT AS n_han,
        |  n_hangul::BIGINT AS n_hangul, n_digit::BIGINT AS n_digit,
        |  n_letters::BIGINT AS n_letters,
        |  round(n_latin::DOUBLE / nullif(n_letters, 0), 4) AS latin_ratio,
        |  CASE WHEN n_letters = 0 THEN NULL
        |    WHEN n_latin > 0 AND n_latin >= n_cyrillic AND n_latin >= n_arabic
        |      AND n_latin >= n_han AND n_latin >= n_hangul THEN 'latin'
        |    WHEN n_cyrillic > 0 AND n_cyrillic >= n_arabic
        |      AND n_cyrillic >= n_han AND n_cyrillic >= n_hangul THEN 'cyrillic'
        |    WHEN n_arabic > 0 AND n_arabic >= n_han AND n_arabic >= n_hangul THEN 'arabic'
        |    WHEN n_han > 0 AND n_han >= n_hangul THEN 'han'
        |    WHEN n_hangul > 0 THEN 'hangul'
        |    ELSE NULL END AS dominant
        |FROM c""".stripMargin,
    // mismatch replay: same Cyrillic flood, same count exprs, same
    // argmax CASE — filtered to the non-latin dominants
    "q_script_mismatch" ->
      """WITH a AS (SELECT doc_id, lang,
        |  text || CASE WHEN doc_id % 7 = 0 THEN ' ' ||
        |    repeat('Пример текста на русском языке ', CAST(n_chars / 20 AS INT) + 40)
        |    ELSE '' END AS t FROM documents),
        |c AS (SELECT doc_id, lang,
        |  length(t) - length(regexp_replace(t, '[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]', '', 'g')) AS n_latin,
        |  length(t) - length(regexp_replace(t, '[\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
        |  length(t) - length(regexp_replace(t, '[\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic,
        |  length(t) - length(regexp_replace(t, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS n_han,
        |  length(t) - length(regexp_replace(t, '[\x{AC00}-\x{D7AF}]', '', 'g')) AS n_hangul,
        |  length(t) - length(regexp_replace(t, '[\p{L}]', '', 'g')) AS n_letters
        |  FROM a),
        |d AS (SELECT doc_id, lang,
        |  CASE WHEN n_letters = 0 THEN NULL
        |    WHEN n_latin > 0 AND n_latin >= n_cyrillic AND n_latin >= n_arabic
        |      AND n_latin >= n_han AND n_latin >= n_hangul THEN 'latin'
        |    WHEN n_cyrillic > 0 AND n_cyrillic >= n_arabic
        |      AND n_cyrillic >= n_han AND n_cyrillic >= n_hangul THEN 'cyrillic'
        |    WHEN n_arabic > 0 AND n_arabic >= n_han AND n_arabic >= n_hangul THEN 'arabic'
        |    WHEN n_han > 0 AND n_han >= n_hangul THEN 'han'
        |    WHEN n_hangul > 0 THEN 'hangul'
        |    ELSE NULL END AS dominant FROM c)
        |SELECT doc_id, lang, dominant FROM d
        |WHERE dominant IS NOT NULL AND dominant <> 'latin'""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(concat_ws(chr(1), coalesce(text, chr(0)),
        |    coalesce(lang, chr(0)))) AS fp FROM documents),
        |n0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 10 NOT IN (3, 4)
        |  UNION ALL SELECT doc_id, text || ' v2', lang FROM documents WHERE doc_id % 10 = 4
        |  UNION ALL SELECT doc_id + 10000000, text, lang FROM documents WHERE doc_id % 10 = 5),
        |n AS (SELECT doc_id, md5(concat_ws(chr(1), coalesce(text, chr(0)),
        |    coalesce(lang, chr(0)))) AS fp FROM n0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp <> n.fp THEN 'changed' ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    "q_norm_dedup" ->
      """WITH a AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 20000000, upper(text) || ' !!'
        |  FROM documents WHERE doc_id % 7 = 0),
        |n AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text),
        |  '\p{N}', '0', 'g'), '[^\p{L}\p{N}]+', ' ', 'g'))) AS norm_hash FROM a)
        |SELECT norm_hash, min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM n GROUP BY 1""".stripMargin,
    // Global shuffle replay: the distributed prefix-sum rank equals
    // ROW_NUMBER over the md5 key (id tie-break concatenated).
    "q_shuffle_order" ->
      """SELECT doc_id, row_number() OVER (ORDER BY
        |  md5(doc_id::VARCHAR || ':3') || ':' || doc_id::VARCHAR) - 1 AS order_id
        |FROM documents""".stripMargin,
    // same md5-order ranks (one window), same 60-bit offsets, same
    // (rank+1+off) mod N probe — the rank join replays as a self-join
    "q_negatives" ->
      s"""WITH r AS (SELECT doc_id, row_number() OVER (ORDER BY
        |    md5(doc_id::VARCHAR || ':5') || ':' || doc_id::VARCHAR) - 1 AS rk
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM r),
        |p AS (SELECT r.doc_id, g.j,
        |    (r.rk + 1 + (${h60Sql("r.doc_id::VARCHAR || ':5:' || g.j::VARCHAR")} % (n.n - 1))) % n.n AS nrk
        |  FROM r, n, generate_series(0, 3) AS g(j))
        |SELECT p.doc_id, p.j::INT AS j, r2.doc_id AS neg_id
        |FROM p JOIN r r2 ON p.nrk = r2.rk""".stripMargin,
    // Corpus-mix replay: epoch union + per-source keep-flag samples
    // (derived seeds 2*131+i), then the same md5-key global order.
    "q_mix" ->
      s"""WITH s AS (
         |  SELECT 0::INTEGER AS source_idx, doc_id, 0::BIGINT AS rep
         |  FROM documents WHERE lang = 'en'
         |  UNION ALL
         |  SELECT 0::INTEGER, doc_id, 1::BIGINT FROM documents
         |  WHERE lang = 'en' AND ${h16Sql("doc_id::VARCHAR || ':262'")} < 32768
         |  UNION ALL
         |  SELECT 1::INTEGER, doc_id, 0::BIGINT FROM documents
         |  WHERE lang = 'fr' AND ${h16Sql("doc_id::VARCHAR || ':263'")} < 49152)
         |SELECT source_idx, doc_id, rep, row_number() OVER (ORDER BY
         |  md5(source_idx::VARCHAR || ':' || doc_id::VARCHAR || ':' || rep::VARCHAR || ':2')
         |    || ':' || source_idx::VARCHAR || ':' || doc_id::VARCHAR || ':' || rep::VARCHAR) - 1
         |  AS order_id
         |FROM s""".stripMargin,
    // Histogram replay: same left-associative double arithmetic →
    // identical IEEE results → identical bucketing at bin edges.
    "q_histogram" ->
      """WITH b AS (SELECT min(l_quantity::DOUBLE) AS mn, max(l_quantity::DOUBLE) AS mx
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |x AS (SELECT CASE WHEN mx = mn THEN 0
        |    ELSE least(19, floor((l_quantity::DOUBLE - mn) / (mx - mn) * 20))::INT END AS bin,
        |    mn, mx
        |  FROM lineitem, b WHERE l_quantity IS NOT NULL)
        |SELECT bin, round(mn + bin * (mx - mn) / 20, 4) AS lo,
        |  round(mn + (bin + 1) * (mx - mn) / 20, 4) AS hi,
        |  count(*)::BIGINT AS n_rows
        |FROM x GROUP BY bin, mn, mx""".stripMargin,
    "q_histogram_by_group" ->
      """WITH b AS (SELECT lang, min(n_chars::DOUBLE) AS mn, max(n_chars::DOUBLE) AS mx
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |x AS (SELECT d.lang, CASE WHEN mx = mn THEN 0
        |    ELSE least(9, floor((n_chars::DOUBLE - mn) / (mx - mn) * 10))::INT END AS bin,
        |    mn, mx
        |  FROM documents d JOIN b ON d.lang = b.lang WHERE n_chars IS NOT NULL)
        |SELECT lang, bin, round(mn + bin * (mx - mn) / 10, 4) AS lo,
        |  round(mn + (bin + 1) * (mx - mn) / 10, 4) AS hi,
        |  count(*)::BIGINT AS n_rows
        |FROM x GROUP BY lang, bin, mn, mx""".stripMargin,
    // padding audit replay: same CASE bucket assignment, grouped
    // integer sums, cap = boundary (overflow pads to its own max)
    "q_padding" ->
      """WITH tk AS (SELECT CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS l FROM documents),
        |b AS (SELECT CASE WHEN l <= 32 THEN 0 WHEN l <= 64 THEN 1
        |    WHEN l <= 128 THEN 2 WHEN l <= 256 THEN 3 ELSE 4 END AS bucket, l FROM tk),
        |g AS (SELECT bucket, count(*) AS n_rows, sum(l) AS sum_len, max(l) AS max_len
        |  FROM b GROUP BY 1),
        |c AS (SELECT bucket, CASE bucket WHEN 0 THEN 32 WHEN 1 THEN 64
        |    WHEN 2 THEN 128 WHEN 3 THEN 256 ELSE max_len END::BIGINT AS cap,
        |  n_rows, sum_len::BIGINT AS sum_len, max_len::BIGINT AS max_len FROM g)
        |SELECT bucket, cap, n_rows, sum_len, max_len,
        |  round(1 - sum_len::DOUBLE / (n_rows * cap), 6) AS waste_ratio
        |FROM c""".stripMargin,
    // the funnel's exact micro-unit entropy feeding five CASE-sum
    // counters in one aggregate
    "q_gate_sweep" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY 1),
        |ent AS (SELECT doc_id, sum(round(-(n/t) * log2(n/t), 6)::DECIMAL(18,6)) AS e
        |  FROM cnt JOIN tot USING (doc_id) GROUP BY doc_id),
        |base AS (SELECT coalesce(ent.e, 0) AS e
        |  FROM documents d LEFT JOIN ent USING (doc_id)),
        |a AS (SELECT count(*) AS total,
        |  sum(CASE WHEN e >= 3.5 THEN 1 ELSE 0 END)::BIGINT AS p0,
        |  sum(CASE WHEN e >= 3.8 THEN 1 ELSE 0 END)::BIGINT AS p1,
        |  sum(CASE WHEN e >= 4.0 THEN 1 ELSE 0 END)::BIGINT AS p2,
        |  sum(CASE WHEN e >= 4.2 THEN 1 ELSE 0 END)::BIGINT AS p3,
        |  sum(CASE WHEN e >= 4.5 THEN 1 ELSE 0 END)::BIGINT AS p4
        |  FROM base)
        |SELECT 3.5::DOUBLE AS threshold, p0 AS pass_count,
        |  round(p0 / total::DOUBLE, 6) AS pass_share FROM a
        |UNION ALL SELECT 3.8::DOUBLE, p1, round(p1 / total::DOUBLE, 6) FROM a
        |UNION ALL SELECT 4.0::DOUBLE, p2, round(p2 / total::DOUBLE, 6) FROM a
        |UNION ALL SELECT 4.2::DOUBLE, p3, round(p3 / total::DOUBLE, 6) FROM a
        |UNION ALL SELECT 4.5::DOUBLE, p4, round(p4 / total::DOUBLE, 6) FROM a""".stripMargin,
    // whitespace word counts vs the BPE replay's per-doc token
    // counts, aggregated per language with exact integer sums
    "q_bpe_fertility" ->
      s"""WITH $bpeOracleCtes,
         |wt AS (SELECT doc_id, lang, CASE WHEN text IS NULL OR trim(text) = '' THEN 0
         |  ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS w
         |  FROM documents),
         |j AS (SELECT wt.lang, wt.w, coalesce(k.tokens, 0) AS tk
         |  FROM wt LEFT JOIN bdtok k USING (doc_id))
         |SELECT lang, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS n_words,
         |  sum(tk)::BIGINT AS n_tokens,
         |  round(sum(tk)::DOUBLE / sum(w), 4) AS fertility
         |FROM j GROUP BY 1""".stripMargin,
    // production-scale encode invariants: n_token_bytes is DuckDB's
    // own independent byte count (strlen = UTF-8 bytes; byte-level
    // BPE maps each byte to exactly one symbol char), content/bound
    // flags replay as their expected all-green values
    "q_bpe_stress" ->
      """WITH wt AS (SELECT lang, CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |  ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS w,
        |  CASE WHEN text IS NULL THEN 0 ELSE strlen(text) END AS tb
        |  FROM documents)
        |SELECT lang, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS n_words,
        |  count(*)::BIGINT AS n_content_ok, sum(tb)::BIGINT AS n_token_bytes,
        |  true AS tokens_bounded
        |FROM wt GROUP BY 1""".stripMargin,
    // the q_funnel gate conjunction as the survivor filter, then the
    // q_histogram_by_group arithmetic over the survivors
    "q_funnel_histogram" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY 1),
        |ent AS (SELECT doc_id, sum(round(-(n/t) * log2(n/t), 6)::DECIMAL(18,6)) AS e
        |  FROM cnt JOIN tot USING (doc_id) GROUP BY doc_id),
        |sv AS (SELECT d.lang, d.n_chars
        |  FROM documents d LEFT JOIN ent USING (doc_id)
        |  WHERE trim(text) <> '' AND n_chars >= 200
        |    AND lang IN ('en','fr','de')
        |    AND len(string_split_regex(trim(text), '\s+')) >= 30
        |    AND coalesce(e, 0) >= 4.0),
        |b AS (SELECT lang, min(n_chars::DOUBLE) AS mn, max(n_chars::DOUBLE) AS mx
        |  FROM sv WHERE n_chars IS NOT NULL GROUP BY 1),
        |x AS (SELECT s.lang, CASE WHEN mx = mn THEN 0
        |    ELSE least(9, floor((n_chars::DOUBLE - mn) / (mx - mn) * 10))::INT END AS bin,
        |    mn, mx
        |  FROM sv s JOIN b ON s.lang = b.lang WHERE n_chars IS NOT NULL)
        |SELECT lang, bin, round(mn + bin * (mx - mn) / 10, 4) AS lo,
        |  round(mn + (bin + 1) * (mx - mn) / 10, 4) AS hi,
        |  count(*)::BIGINT AS n_rows
        |FROM x GROUP BY lang, bin, mn, mx""".stripMargin,
    // Temperature-weighting replay: per-source counts → n^alpha
    // shares → rates, 6 dp (pow/round double parity, the standing
    // discipline).
    "q_temperature" ->
      """WITH c AS (SELECT lang, count(*)::BIGINT AS n_rows FROM documents GROUP BY 1),
        |t AS (SELECT sum(pow(n_rows, 0.5)) AS ta, sum(n_rows)::BIGINT AS total FROM c)
        |SELECT lang, n_rows,
        |  round(pow(n_rows, 0.5) / ta * total / n_rows, 6) AS rate
        |FROM c, t""".stripMargin,
    // Naive-Bayes replay: conditional bucket counts -> smoothed
    // log-odds (6 dp) -> per-doc sums (4 dp) over all documents.
    "q_nb_quality" ->
      s"""WITH $gramBucketCtes,
         |cc AS (SELECT b, sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
         |  sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS cn
         |  FROM ob WHERE lang IS NOT NULL GROUP BY 1),
         |tot AS (SELECT sum(cp)::DOUBLE AS np, sum(cn)::DOUBLE AS nn FROM cc),
         |md AS (SELECT b, round(ln((cp + 1.0) / (np + 64.0)) -
         |  ln((cn + 1.0) / (nn + 64.0)), 6) AS lo FROM cc, tot),
         |sc AS (SELECT doc_id, round(sum(lo::DECIMAL(18,6)), 4)::DOUBLE AS nb_score,
         |  count(*) AS n_grams
         |  FROM ob JOIN md USING (b) GROUP BY 1)
         |SELECT d.doc_id, coalesce(sc.nb_score, 0.0) AS nb_score,
         |  coalesce(sc.n_grams, 0)::BIGINT AS n_grams
         |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin,
    "q_dedup_incremental" ->
      s"""WITH $incrementalCtes
         |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM mh WHERE jac >= 0.5""".stripMargin,
    // the same incremental replay over the snapshotDiff added/changed
    // delta (diff replayed closed-form: m=5 → added under +10M ids,
    // m=4 " v2" → changed) behind the q_token_count-replica gate
    "q_incremental_refresh" ->
      s"""WITH ${incrementalCtesFor(refreshDeltaSql)}
         |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM mh WHERE jac >= 0.5""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_key, min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $minhashCtes
         |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM mh WHERE jac >= 0.5""".stripMargin,
    // estimate eval replay: matching-component fraction over the
    // replayed signatures next to the exact shingle jaccard, for the
    // SAME band-bucket candidate set (no threshold, no size prune)
    "q_minhash_estimate" ->
      s"""WITH $minhashCtes,
         |est AS (SELECT id_a, id_b,
         |  len(list_filter(range(1, 9), i -> ga.sig[i] = gb.sig[i]))::DOUBLE / 8 AS e
         |  FROM cand JOIN sg ga ON ga.doc_id = cand.id_a
         |  JOIN sg gb ON gb.doc_id = cand.id_b)
         |SELECT est.id_a, est.id_b, round(est.e, 4) AS est_jaccard,
         |  round(mh.jac, 4) AS jaccard,
         |  round(abs(est.e - round(mh.jac, 4)), 4) AS abs_err
         |FROM est JOIN mh ON est.id_a = mh.id_a AND est.id_b = mh.id_b""".stripMargin,
    // round trip is the contract: parsed output must equal the input
    "q_jsonl_roundtrip" ->
      "SELECT doc_id, lang, text FROM documents",
    // identity + Content-Length = payload OCTETS (multi-byte text
    // counts bytes, not chars); warc_type fixed by the writer
    "q_warc_roundtrip" ->
      """SELECT doc_id, text,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  'response' AS warc_type
        |FROM documents""".stripMargin,
    "q_tar_roundtrip" ->
      """SELECT doc_id, text,
        |  octet_length(encode(text))::BIGINT AS n_bytes
        |FROM documents""".stripMargin,
    "q_kappa" ->
      """WITH l AS (SELECT lang AS a,
        |    CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END AS b
        |  FROM documents WHERE lang IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS c FROM l GROUP BY 1, 2),
        |ra AS (SELECT a AS k, sum(c) AS ra FROM cells GROUP BY 1),
        |rb AS (SELECT b AS k, sum(c) AS rb FROM cells GROUP BY 1),
        |e AS (SELECT coalesce(sum(coalesce(ra, 0) * coalesce(rb, 0)), 0) AS e
        |  FROM ra FULL JOIN rb USING (k)),
        |o AS (SELECT coalesce(sum(c), 0) AS n,
        |  coalesce(sum(CASE WHEN a = b THEN c END), 0) AS agree FROM cells)
        |SELECT n::BIGINT AS n_items, agree::BIGINT AS n_agree,
        |  CASE WHEN n > 0 THEN round(agree::DOUBLE / n::DOUBLE, 6) END AS po,
        |  CASE WHEN n > 0 THEN round(e::DOUBLE / n::DOUBLE / n::DOUBLE, 6) END AS pe,
        |  CASE WHEN n > 0 AND e::DOUBLE / n::DOUBLE / n::DOUBLE < 1.0 THEN
        |    round((agree::DOUBLE / n::DOUBLE - e::DOUBLE / n::DOUBLE / n::DOUBLE)
        |      / (1.0 - e::DOUBLE / n::DOUBLE / n::DOUBLE), 6) END AS kappa
        |FROM o, e""".stripMargin,
    // Krippendorff nominal alpha: coincidence-matrix algebra with the
    // per-item 1/(m−1) weights folded through the common denominator
    // D = Π(m−1) over distinct m — integer-exact in both engines at
    // gate scale (m ∈ {1,2,3} → D = 2; every folded term < 2^53).
    "q_krippendorff" ->
      """WITH r AS (
        |  SELECT doc_id AS i, lang AS l FROM documents WHERE lang IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END
        |  FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN 'fr' ELSE lang END
        |  FROM documents WHERE doc_id % 3 = 0 AND lang IS NOT NULL),
        |muc AS (SELECT i, l, count(*)::HUGEINT AS c FROM r GROUP BY 1, 2),
        |mu AS (SELECT i, sum(c) AS m, sum(c * c) AS s2 FROM muc GROUP BY 1
        |  HAVING sum(c) >= 2),
        |bym AS (SELECT m, sum(m * m - s2) AS sdis FROM mu GROUP BY 1),
        |tot AS (SELECT sum(m) AS n, count(*) AS items FROM mu),
        |ncs AS (SELECT l, sum(c) AS nc FROM muc
        |  WHERE i IN (SELECT i FROM mu) GROUP BY 1),
        |y AS (SELECT coalesce(sum(nc * nc), 0) AS sc2 FROM ncs),
        |d AS (SELECT product(m - 1) AS dd FROM bym),
        |num AS (SELECT sum(sdis::DOUBLE * (dd / (m - 1)::DOUBLE)) AS nm
        |  FROM bym, d)
        |SELECT items::BIGINT AS n_items, n::BIGINT AS n_values,
        |  CASE WHEN n >= 2 THEN
        |    round(nm / dd / n::DOUBLE, 6) END AS do_rate,
        |  CASE WHEN n >= 2 THEN
        |    round((n * n - sc2)::DOUBLE / n::DOUBLE / (n - 1)::DOUBLE, 6)
        |  END AS de_rate,
        |  CASE WHEN n >= 2 AND (n * n - sc2)::DOUBLE > 0.0 THEN
        |    round(1.0 - (nm * (n - 1)::DOUBLE)
        |      / (dd * (n * n - sc2)::DOUBLE), 6) END AS alpha
        |FROM tot, y, d, num""".stripMargin,
    // Interval alpha: same common-denominator folding as the nominal
    // form, over INTEGER-SCALED values (v = x·10⁶) — every moment is
    // HUGEINT-exact, the D_over products come from tiny correlated
    // product() subqueries (exact doubles → HUGEINT), and the final
    // double casts match Spark's decimal→double rounding bit-for-bit.
    "q_krippendorff_interval" ->
      """WITH base AS (SELECT doc_id, ((doc_id * 13) % 5 + 1)::DOUBLE AS b
        |  FROM documents),
        |r AS (
        |  SELECT doc_id AS i, b AS x FROM base
        |  UNION ALL
        |  SELECT doc_id, least(b + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END,
        |    5.0) FROM base WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, greatest(b - CASE WHEN doc_id % 11 = 0 THEN 2 ELSE 0
        |    END, 1.0) FROM base WHERE doc_id % 3 = 0),
        |vv AS (SELECT i, (x * 1000000)::HUGEINT AS v FROM r WHERE x IS NOT NULL),
        |mu AS (SELECT i, count(*)::HUGEINT AS m, sum(v) AS s1,
        |  sum(v * v) AS s2 FROM vv GROUP BY 1 HAVING count(*) >= 2),
        |bym AS (SELECT m, sum((m * s2 - s1 * s1) * 2) AS sdis FROM mu GROUP BY 1),
        |tot AS (SELECT sum(m) AS n, count(*) AS items, sum(s1) AS t1,
        |  sum(s2) AS t2 FROM mu),
        |d AS (SELECT product(m - 1) AS dd FROM bym),
        |num AS (SELECT sum(sdis * (SELECT coalesce(product(b2.m - 1), 1)
        |    FROM bym b2 WHERE b2.m <> bym.m)::HUGEINT) AS nm FROM bym),
        |y AS (SELECT ((n * t2 - t1 * t1) * 2) AS yy FROM tot)
        |SELECT items::BIGINT AS n_items, n::BIGINT AS n_values,
        |  CASE WHEN n >= 2 THEN
        |    round(nm::DOUBLE / dd / n::DOUBLE / 1e12, 6) END AS do_rate,
        |  CASE WHEN n >= 2 THEN
        |    round(yy::DOUBLE / n::DOUBLE / (n - 1)::DOUBLE / 1e12, 6)
        |  END AS de_rate,
        |  CASE WHEN n >= 2 AND yy::DOUBLE > 0.0 THEN
        |    round(1.0 - (nm::DOUBLE * (n - 1)::DOUBLE)
        |      / (dd * yy::DOUBLE), 6) END AS alpha
        |FROM tot, y, d, num""".stripMargin,
    // Closed-form flag derivation from the q_dialog_flags injection
    // rules (body roles are [r1,'assistant',r3,'assistant'], so e.g.
    // adjacent-equal exists iff r1 or r3 is 'assistant') — an
    // independent oracle, not a list-pipeline replay.
    "q_dialog_flags" ->
      """WITH d AS (SELECT doc_id,
        |  substr(text, 1, 50) AS s1, substr(text, 51, 50) AS s2,
        |  CASE WHEN doc_id % 13 = 0 THEN substr(text, 51, 50)
        |       ELSE substr(text, 101, 50) END AS c3,
        |  CASE WHEN doc_id % 5 = 0 THEN ''
        |       ELSE substr(text, 151, 50) END AS c4,
        |  CASE WHEN doc_id % 17 = 0 THEN 'tool' ELSE 'user' END AS r1,
        |  CASE WHEN doc_id % 7 = 0 THEN 'assistant' ELSE 'user' END AS r3,
        |  doc_id % 11 = 0 AS sys
        |  FROM documents)
        |SELECT doc_id,
        |  (CASE WHEN sys THEN 5 ELSE 4 END)::INT AS n_turns,
        |  sys AS has_system,
        |  r1 = 'user' AS starts_user,
        |  TRUE AS ends_assistant,
        |  r1 IN ('user', 'assistant') AND r3 IN ('user', 'assistant') AS roles_ok,
        |  NOT (r1 = 'assistant' OR r3 = 'assistant') AS alternates,
        |  trim(s1) = '' OR trim(s2) = '' OR trim(c3) = '' OR trim(c4) = ''
        |    AS has_empty,
        |  ((sys AND s1 = 'You are helpful.') OR
        |   (s1 = s2 AND trim(s1) <> '') OR (s2 = c3 AND trim(s2) <> '') OR
        |   (c3 = c4 AND trim(c3) <> '')) AS dup_turn,
        |  ((CASE WHEN r1 = 'user' THEN length(s1) ELSE 0 END) +
        |   (CASE WHEN r3 = 'user' THEN length(c3) ELSE 0 END))::INT AS user_chars,
        |  (length(s2) + length(c4) +
        |   (CASE WHEN r3 = 'assistant' THEN length(c3) ELSE 0 END))::INT
        |    AS assistant_chars,
        |  (r1 = 'user' AND r3 IN ('user', 'assistant') AND
        |   NOT (r1 = 'assistant' OR r3 = 'assistant') AND
        |   NOT (trim(s1) = '' OR trim(s2) = '' OR trim(c3) = '' OR trim(c4) = '')
        |   AND NOT ((sys AND s1 = 'You are helpful.') OR
        |     (s1 = s2 AND trim(s1) <> '') OR (s2 = c3 AND trim(s2) <> '') OR
        |     (c3 = c4 AND trim(c3) <> ''))) AS valid
        |FROM d""".stripMargin,
    // PAV replayed via the minimax characterization over dense bucket
    // prefix sums — an independent derivation of the isotonic fit
    // (the Spark side pools violators with an exact-rational stack).
    "q_isotonic" ->
      s"""WITH $isoFitSql
        |SELECT bin, n, pos, block_bin, calibrated FROM fit""".stripMargin,
    "q_isotonic_apply" ->
      s"""WITH $isoFitSql,
        |srv AS (SELECT doc_id,
        |  ((doc_id * 37) % 100 + CASE WHEN lang = 'en' THEN 25 ELSE 0 END)
        |    / 125.0 * 1.2 - 0.1 AS s2
        |  FROM documents WHERE lang IS NOT NULL),
        |sb AS (SELECT doc_id, round(s2, 6) AS score,
        |  least(greatest(floor(s2 * 20), 0), 19)::BIGINT AS bin2 FROM srv),
        |c0 AS (SELECT calibrated AS v0 FROM fit ORDER BY bin LIMIT 1)
        |SELECT sb.doc_id, sb.score, coalesce(f.calibrated, c0.v0) AS calibrated
        |FROM sb ASOF LEFT JOIN fit f ON sb.bin2 >= f.bin, c0""".stripMargin,
    "q_win_rates" ->
      s"""WITH $prefSynthSql,
        |n AS (SELECT least(ia, ib) AS item_lo, greatest(ia, ib) AS item_hi,
        |  w = 'tie' AS tied,
        |  (w = 'a' AND ia < ib) OR (w = 'b' AND ib < ia) AS lo_won FROM c)
        |SELECT item_lo, item_hi, count(*) AS n_games,
        |  count(CASE WHEN NOT tied AND lo_won THEN 1 END) AS wins_lo,
        |  count(CASE WHEN NOT tied AND NOT lo_won THEN 1 END) AS wins_hi,
        |  count(CASE WHEN tied THEN 1 END) AS ties,
        |  CASE WHEN count(CASE WHEN NOT tied THEN 1 END) > 0 THEN
        |    round(count(CASE WHEN NOT tied AND lo_won THEN 1 END)::DOUBLE /
        |      count(CASE WHEN NOT tied THEN 1 END)::DOUBLE, 6)
        |  END AS win_rate_lo
        |FROM n GROUP BY 1, 2""".stripMargin,
    "q_copeland" ->
      s"""WITH $prefSynthSql,
        |n AS (SELECT least(ia, ib) AS item_lo, greatest(ia, ib) AS item_hi,
        |  w = 'tie' AS tied,
        |  (w = 'a' AND ia < ib) OR (w = 'b' AND ib < ia) AS lo_won FROM c),
        |pairs AS (SELECT item_lo, item_hi,
        |  count(CASE WHEN NOT tied AND lo_won THEN 1 END) AS wl,
        |  count(CASE WHEN NOT tied AND NOT lo_won THEN 1 END) AS wh
        |  FROM n GROUP BY 1, 2),
        |sides AS (
        |  SELECT item_lo AS item, wl > wh AS win, wl = wh AS tie FROM pairs
        |  UNION ALL
        |  SELECT item_hi, wh > wl, wl = wh FROM pairs),
        |scored AS (SELECT item, count(*) AS n_opponents,
        |  count(CASE WHEN win THEN 1 END) AS maj_wins,
        |  count(CASE WHEN tie THEN 1 END) AS maj_ties,
        |  count(CASE WHEN NOT win AND NOT tie THEN 1 END) AS maj_losses,
        |  count(CASE WHEN win THEN 1 END)::DOUBLE +
        |    count(CASE WHEN tie THEN 1 END)::DOUBLE / 2 AS copeland
        |  FROM sides GROUP BY 1)
        |SELECT item, n_opponents, maj_wins, maj_ties, maj_losses, copeland,
        |  dense_rank() OVER (ORDER BY copeland DESC)::INT AS rank
        |FROM scored""".stripMargin,
    // Bradley-Terry MM replay, 3 iterations unrolled: per-term round
    // 12 dp into DECIMAL before the grouped sum, strength round 9 dp,
    // mean-1 normalization, publish 6 dp — the operator's exact
    // discipline, independently re-derived in SQL.
    "q_bradley_terry" ->
      s"""WITH $prefSynthSql,
        |dec AS (SELECT CASE WHEN w = 'a' THEN ia ELSE ib END AS wi,
        |  CASE WHEN w = 'a' THEN ib ELSE ia END AS li FROM c WHERE w <> 'tie'),
        |games AS (SELECT i, j, count(*) AS n FROM (
        |  SELECT wi AS i, li AS j FROM dec
        |  UNION ALL SELECT li, wi FROM dec) GROUP BY 1, 2),
        |per AS (SELECT i, sum(n)::BIGINT AS games FROM games GROUP BY 1),
        |wn AS (SELECT wi AS i, count(*) AS w FROM dec GROUP BY 1),
        |item AS (SELECT per.i, coalesce(wn.w, 0)::BIGINT AS wins, per.games
        |  FROM per LEFT JOIN wn USING (i)),
        |kk AS (SELECT count(*)::BIGINT AS k FROM item),
        |p0 AS (SELECT i, 1.0::DOUBLE AS p FROM item),
        |d1 AS (SELECT g.i, sum(round(g.n::DOUBLE /
        |    (greatest(pi.p, 1e-9) + greatest(pj.p, 1e-9)), 12)::DECIMAL(28,12)) AS d
        |  FROM games g JOIN p0 pi ON g.i = pi.i JOIN p0 pj ON g.j = pj.i
        |  GROUP BY 1),
        |r1 AS (SELECT item.i, round(item.wins::DOUBLE / d1.d::DOUBLE, 9) AS p9
        |  FROM item JOIN d1 ON item.i = d1.i),
        |s1 AS (SELECT sum(p9::DECIMAL(28,9)) AS s FROM r1),
        |p1 AS (SELECT i, round(p9 * ((SELECT k FROM kk)::DOUBLE
        |  / (SELECT s FROM s1)::DOUBLE), 6) AS p FROM r1),
        |d2 AS (SELECT g.i, sum(round(g.n::DOUBLE /
        |    (greatest(pi.p, 1e-9) + greatest(pj.p, 1e-9)), 12)::DECIMAL(28,12)) AS d
        |  FROM games g JOIN p1 pi ON g.i = pi.i JOIN p1 pj ON g.j = pj.i
        |  GROUP BY 1),
        |r2 AS (SELECT item.i, round(item.wins::DOUBLE / d2.d::DOUBLE, 9) AS p9
        |  FROM item JOIN d2 ON item.i = d2.i),
        |s2 AS (SELECT sum(p9::DECIMAL(28,9)) AS s FROM r2),
        |p2 AS (SELECT i, round(p9 * ((SELECT k FROM kk)::DOUBLE
        |  / (SELECT s FROM s2)::DOUBLE), 6) AS p FROM r2),
        |d3 AS (SELECT g.i, sum(round(g.n::DOUBLE /
        |    (greatest(pi.p, 1e-9) + greatest(pj.p, 1e-9)), 12)::DECIMAL(28,12)) AS d
        |  FROM games g JOIN p2 pi ON g.i = pi.i JOIN p2 pj ON g.j = pj.i
        |  GROUP BY 1),
        |r3 AS (SELECT item.i, round(item.wins::DOUBLE / d3.d::DOUBLE, 9) AS p9
        |  FROM item JOIN d3 ON item.i = d3.i),
        |s3 AS (SELECT sum(p9::DECIMAL(28,9)) AS s FROM r3),
        |p3 AS (SELECT i, round(p9 * ((SELECT k FROM kk)::DOUBLE
        |  / (SELECT s FROM s3)::DOUBLE), 6) AS p FROM r3)
        |SELECT item.i AS item, item.wins AS wins, item.games AS n_decided,
        |  p3.p AS strength,
        |  dense_rank() OVER (ORDER BY p3.p DESC)::INT AS rank
        |FROM item JOIN p3 ON item.i = p3.i""".stripMargin,
    "q_blocklist" ->
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |    t -> list_contains(['slow', 'big', 'merge'], t)))::INT AS n_blocked,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |    t -> list_contains(['slow', 'big', 'merge'], t))) > 0 AS blocked
        |FROM documents""".stripMargin,
    "q_csv_roundtrip" ->
      "SELECT doc_id, lang, text FROM documents",
    // greedy earliest-transition funnel = chained conditional minima:
    // t_i = min ts of step i STRICTLY AFTER t_{i-1}; share is over
    // all users with any step-typed event
    "q_dau_mau" ->
      """WITH e AS (SELECT ts::DATE AS day,
        |    date_trunc('month', ts::DATE)::DATE AS month, user_id
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |d AS (SELECT day, month, count(DISTINCT user_id)::BIGINT AS dau
        |  FROM e GROUP BY 1, 2),
        |m AS (SELECT month, count(DISTINCT user_id)::BIGINT AS mau
        |  FROM e GROUP BY 1)
        |SELECT day, dau, mau, round(dau::DOUBLE / mau, 6) AS stickiness
        |FROM d JOIN m USING (month)""".stripMargin,
    // every Poisson draw replayed from the same 60-bit md5 uniform
    // and the same 10 dp CDF literals; decimal replicate sums
    "q_bootstrap_ci" ->
      (s"""WITH r AS (SELECT doc_id, n_chars, unnest(range(0, 64)) AS b FROM documents),
          |u AS (SELECT b, n_chars,
          |    ${h60Sql("doc_id::VARCHAR || ':0:' || b::VARCHAR")}::DOUBLE
          |      / 1152921504606846976.0 AS uu FROM r),
          |w AS (SELECT b, n_chars, CASE WHEN uu < 0.3678794412 THEN 0
          |    WHEN uu < 0.7357588823 THEN 1 WHEN uu < 0.9196986029 THEN 2
          |    WHEN uu < 0.9810118431 THEN 3 WHEN uu < 0.9963401532 THEN 4
          |    ELSE 5 END AS w FROM u),
          |m AS (SELECT b, CASE WHEN sum(w) > 0 THEN
          |    round(sum((w * n_chars::DOUBLE)::DECIMAL(28,10))::DOUBLE / sum(w), 6)
          |  END AS m FROM w GROUP BY 1),
          |ci AS (SELECT count(m)::BIGINT AS n_replicates,
          |    round(quantile_cont(m, 0.025), 6) AS ci_lo,
          |    round(quantile_cont(m, 0.975), 6) AS ci_hi FROM m),
          |p AS (SELECT count(*)::BIGINT AS n_rows,
          |    round(sum(n_chars::DECIMAL(28,10))::DOUBLE / count(*), 6) AS mean
          |  FROM documents)
          |SELECT n_rows, n_replicates, mean, ci_lo, ci_hi FROM p, ci""".stripMargin),
    // KM replay: same integer micro-unit hazard (the double round
    // hits true half-boundaries when n divides 2e6 but not 1e6),
    // same DECIMAL prefix of 6 dp ln terms, one exp at the boundary
    "q_survival" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events
        |  WHERE event_type = 'purchase'),
        |mx AS (SELECT max(ms) AS m FROM e),
        |subj AS (SELECT (max(ms) - min(ms)) // 86400000 AS t0,
        |    max(ms) < m - 604800000 AS ev
        |  FROM e, mx GROUP BY user_id, m),
        |byT AS (SELECT t0 AS t, count(*)::BIGINT AS n,
        |    sum(CASE WHEN ev THEN 1 ELSE 0 END)::BIGINT AS n_events
        |  FROM subj GROUP BY 1),
        |w AS (SELECT *, sum(n) OVER () - coalesce(sum(n) OVER
        |    (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
        |  FROM byT),
        |h AS (SELECT *, (n_events * 2000000 + n_at_risk) // (n_at_risk * 2) AS h6 FROM w),
        |l AS (SELECT *, h6::DOUBLE / 1e6 AS hazard,
        |    CASE WHEN h6 < 1000000 THEN round(ln(1 - h6::DOUBLE / 1e6), 6) END AS lnt,
        |    max(CASE WHEN h6 >= 1000000 THEN 1 ELSE 0 END) OVER
        |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        |  FROM h)
        |SELECT t, n_at_risk::BIGINT AS n_at_risk, n_events,
        |  (n - n_events)::BIGINT AS n_censored, hazard,
        |  CASE WHEN dead = 1 THEN 0.0 ELSE round(exp((sum(lnt::DECIMAL(18,6)) OVER
        |    (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE), 6)
        |  END AS survival
        |FROM l""".stripMargin,
    // interval semantics replayed literally: every (view, click)
    // pair per user with click in [view, view + 4h]
    "q_attribution" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, epoch_ms(ts) AS vm
        |    FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, epoch_ms(ts) AS cm
        |    FROM events WHERE event_type = 'click')
        |SELECT v.user_id, view_id, click_id, vm AS view_ts_ms, cm AS click_ts_ms
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND cm >= vm AND cm <= vm + 14400000""".stripMargin,
    "q_event_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |tot AS (SELECT count(DISTINCT user_id) AS n FROM e),
        |s0 AS (SELECT user_id, min(ms) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(ms) AS t1 FROM e JOIN s0 USING (user_id)
        |  WHERE event_type = 'click' AND ms > t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'purchase' AND ms > t1 GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s0) AS c0,
        |  (SELECT count(*) FROM s1) AS c1,
        |  (SELECT count(*) FROM s2) AS c2, n FROM tot)
        |SELECT 0 AS step_idx, 'view' AS step, c0::BIGINT AS n_users,
        |  round(c0 / n::DOUBLE, 6) AS share FROM c
        |UNION ALL SELECT 1, 'click', c1::BIGINT, round(c1 / n::DOUBLE, 6) FROM c
        |UNION ALL SELECT 2, 'purchase', c2::BIGINT, round(c2 / n::DOUBLE, 6) FROM c""".stripMargin,
    // the (user, ts) pre-collapse makes the session window's order
    // key unique; same start-flag running count as the row-9 rule
    "q_session_stats" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts, count(*)::BIGINT AS n FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > 1800000
        |    THEN 1 ELSE 0 END AS st FROM e),
        |g AS (SELECT *, sum(st) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM f)
        |SELECT user_id, user_id::VARCHAR || '#' || sess::VARCHAR AS session_id,
        |  min(ts) AS start_ms, max(ts) AS end_ms,
        |  max(ts) - min(ts) AS duration_ms,
        |  sum(n)::BIGINT AS n_events, sum(n) = 1 AS is_bounce
        |FROM g GROUP BY user_id, sess""".stripMargin,
    // exact integer Hamilton rounding: HUGEINT product/floor/mod in
    // DuckDB mirrors Spark's DECIMAL(38,0) arithmetic
    "q_budget" ->
      """WITH c AS (SELECT lang, count(*)::HUGEINT AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1),
        |t AS (SELECT sum(n) AS tot FROM c),
        |p AS (SELECT lang, n, 1000::HUGEINT * n AS prod, tot FROM c, t),
        |b AS (SELECT lang, n, prod // tot AS base, prod % tot AS rem FROM p),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rk,
        |  (SELECT 1000 - sum(base) FROM b) AS leftover FROM b)
        |SELECT lang, n::BIGINT AS n_rows,
        |  (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS quota
        |FROM r""".stripMargin,
    // quantile edges rounded 6 dp before the strict-> comparisons, so
    // both engines bucket edge ties identically
    "q_hist_depth" ->
      """WITH e AS (SELECT list_transform(
        |    quantile_cont(n_chars::DOUBLE, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    x -> round(x, 6)) AS edges
        |  FROM documents WHERE n_chars IS NOT NULL),
        |b AS (SELECT len(list_filter(edges, x -> n_chars::DOUBLE > x)) AS bin, edges
        |  FROM documents, e WHERE n_chars IS NOT NULL),
        |c AS (SELECT bin, edges, count(*)::BIGINT AS n_rows FROM b GROUP BY 1, 2)
        |SELECT bin::INT AS bin,
        |  CASE WHEN bin > 0 THEN edges[bin] END AS lo,
        |  CASE WHEN bin < 9 THEN edges[bin + 1] END AS hi,
        |  n_rows FROM c""".stripMargin,
    // the lead() hold-time weights and exact DECIMAL weighted sums,
    // one division at the boundary; (ts, event_id) is the unique
    // per-key order both engines share
    "q_twap" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, value FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL),
        |d AS (SELECT user_id, ms, value,
        |  coalesce(lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id), ms) - ms AS dt
        |  FROM e),
        |g AS (SELECT user_id, min(ms) AS t_first, max(ms) AS t_last,
        |  count(*)::BIGINT AS n_obs,
        |  sum(value::DECIMAL(18,6) * dt) AS wv FROM d GROUP BY 1)
        |SELECT user_id, t_first, t_last, n_obs,
        |  round(CASE WHEN t_last > t_first
        |    THEN wv::DOUBLE / (t_last - t_first) END, 6) AS twap
        |FROM g""".stripMargin,
    // same closed-open +1/−1 melt and per-(mode, date) aggregation;
    // the window prefix sum replays the running level exactly
    "q_concurrency" ->
      """WITH d AS (SELECT o_orderpriority AS g, o_orderdate AS s, l_shipdate AS e
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate >= o_orderdate),
        |x AS (SELECT g, s AS t, 1 AS dlt FROM d
        |  UNION ALL SELECT g, e AS t, -1 FROM d),
        |a AS (SELECT g, t, sum(dlt)::BIGINT AS dd FROM x GROUP BY 1, 2)
        |SELECT g AS o_orderpriority, t,
        |  (sum(dd) OVER (PARTITION BY g ORDER BY t))::BIGINT AS concurrent
        |FROM a""".stripMargin,
    "q_peak_concurrency" ->
      """WITH d AS (SELECT o_orderpriority AS g, o_orderdate AS s, l_shipdate AS e
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate >= o_orderdate),
        |x AS (SELECT g, s AS t, 1 AS dlt FROM d
        |  UNION ALL SELECT g, e AS t, -1 FROM d),
        |a AS (SELECT g, t, sum(dlt)::BIGINT AS dd FROM x GROUP BY 1, 2),
        |c AS (SELECT g, t,
        |  (sum(dd) OVER (PARTITION BY g ORDER BY t))::BIGINT AS concurrent FROM a),
        |p AS (SELECT g, max(concurrent)::BIGINT AS peak FROM c GROUP BY 1)
        |SELECT c.g AS o_orderpriority, p.peak, min(c.t) AS peak_at
        |FROM c JOIN p ON c.g IS NOT DISTINCT FROM p.g
        |  AND c.concurrent = p.peak
        |GROUP BY 1, 2""".stripMargin,
    // quantile_cont matches Spark's exact percentile (p·(n−1)
    // interpolation); 1.4826 spelled ::DOUBLE so DuckDB's DECIMAL
    // literal cannot scale differently
    "q_robust_scale" ->
      """WITH nn AS (SELECT lang, doc_id, n_chars FROM documents WHERE n_chars IS NOT NULL),
        |med AS (SELECT lang, round(quantile_cont(n_chars::DOUBLE, 0.5), 6) AS m FROM nn GROUP BY 1),
        |mad AS (SELECT nn.lang, round(quantile_cont(abs(nn.n_chars::DOUBLE - m), 0.5), 6) AS d
        |  FROM nn JOIN med USING (lang) GROUP BY 1),
        |j AS (SELECT doc_id, documents.lang, n_chars, m, d
        |  FROM documents LEFT JOIN med USING (lang) LEFT JOIN mad USING (lang))
        |SELECT doc_id, lang, n_chars,
        |  CASE WHEN n_chars IS NOT NULL AND d > 0
        |    THEN round((n_chars - m) / (1.4826::DOUBLE * d), 4) END AS n_chars_rz
        |FROM j""".stripMargin,
    // ROLLUP + grouping_id: same SQL-standard bit order (leftmost
    // dim = MSB) in both engines; exact DECIMAL accumulation, ONE
    // cast at the boundary (BIGINT — integral input; a raw wide
    // DECIMAL output materializes differently across readers)
    "q_rollup_card" ->
      """SELECT lang, source, grouping_id(lang, source) AS level,
        |  count(*)::BIGINT AS n_rows,
        |  sum(n_chars::DECIMAL(18,6))::BIGINT AS sum_n_chars,
        |  round(sum(n_chars::DECIMAL(18,6))::DOUBLE / count(*), 4) AS avg_n_chars
        |FROM documents GROUP BY ROLLUP(lang, source)""".stripMargin,
    // exact DECIMAL moment sums, mean rounded 6 dp BEFORE the
    // variance subtraction (the anomalies discipline), z 4 dp
    "q_standardize" ->
      """WITH m0 AS (SELECT lang, count(*)::BIGINT AS cnt,
        |    sum(n_chars::DECIMAL(18,6)) AS sv,
        |    sum(n_chars::DECIMAL(18,6) * n_chars::DECIMAL(18,6)) AS sq
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |m AS (SELECT lang, round(sv::DOUBLE / cnt, 6) AS mean,
        |  round(sqrt(greatest(0.0::DOUBLE,
        |    sq::DOUBLE / cnt - round(sv::DOUBLE / cnt, 6) * round(sv::DOUBLE / cnt, 6))), 6) AS sd
        |  FROM m0)
        |SELECT doc_id, lang, n_chars,
        |  CASE WHEN n_chars IS NOT NULL AND sd > 0
        |    THEN round((n_chars - mean) / sd, 4) END AS n_chars_z
        |FROM documents LEFT JOIN m USING (lang)""".stripMargin,
    // sequential left folds over the same frame-ordered list; 1-based
    // lambda index (len - i = age, newest age 0); dyadic 0.75^age is
    // pow-exact on both engines
    "q_ewma" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, value
        |  FROM events WHERE value IS NOT NULL),
        |l AS (SELECT user_id, event_id, value,
        |  list(value::DOUBLE) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vs FROM e)
        |SELECT user_id, event_id, value,
        |  round(list_reduce(list_transform(vs, (x, i) -> x * pow(0.75, len(vs) - i)), (a, b) -> a + b) /
        |        list_reduce(list_transform(vs, (x, i) -> pow(0.75, len(vs) - i)), (a, b) -> a + b), 6) AS ewma
        |FROM l""".stripMargin,
    // the q_event_funnel chained minima, then per-convert durations
    // (t2 - t0) through the q_quantiles quantile_cont replay
    "q_funnel_time" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |s0 AS (SELECT user_id, min(ms) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(ms) AS t1 FROM e JOIN s0 USING (user_id)
        |  WHERE event_type = 'click' AND ms > t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'purchase' AND ms > t1 GROUP BY 1),
        |d AS (SELECT (s2.t2 - s0.t0)::DOUBLE AS dur FROM s2 JOIN s0 USING (user_id))
        |SELECT 'duration_ms' AS "column", unnest([0.25, 0.5, 0.75, 0.9]::DOUBLE[]) AS prob,
        |  round(unnest(quantile_cont(dur, [0.25, 0.5, 0.75, 0.9])), 4) AS quantile FROM d""".stripMargin,
    // the same chained minima carried per segment; shares are per
    // group
    "q_event_funnel_seg" ->
      """WITH e AS (SELECT user_id, c_mktsegment AS segment, epoch_ms(ts) AS ms, event_type
        |  FROM events JOIN customer ON user_id = c_custkey
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |tot AS (SELECT segment, count(DISTINCT user_id) AS n FROM e GROUP BY 1),
        |s0 AS (SELECT user_id, segment, min(ms) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1, 2),
        |s1 AS (SELECT e.user_id, e.segment, min(ms) AS t1 FROM e JOIN s0 USING (user_id)
        |  WHERE event_type = 'click' AND ms > t0 GROUP BY 1, 2),
        |s2 AS (SELECT e.user_id, e.segment, min(ms) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'purchase' AND ms > t1 GROUP BY 1, 2),
        |c0 AS (SELECT segment, count(*)::BIGINT AS c FROM s0 GROUP BY 1),
        |c1 AS (SELECT segment, count(*)::BIGINT AS c FROM s1 GROUP BY 1),
        |c2 AS (SELECT segment, count(*)::BIGINT AS c FROM s2 GROUP BY 1)
        |SELECT t.segment, 0 AS step_idx, 'view' AS step, coalesce(c0.c, 0) AS n_users,
        |  round(coalesce(c0.c, 0) / n::DOUBLE, 6) AS share
        |FROM tot t LEFT JOIN c0 ON t.segment = c0.segment
        |UNION ALL SELECT t.segment, 1, 'click', coalesce(c1.c, 0),
        |  round(coalesce(c1.c, 0) / n::DOUBLE, 6)
        |FROM tot t LEFT JOIN c1 ON t.segment = c1.segment
        |UNION ALL SELECT t.segment, 2, 'purchase', coalesce(c2.c, 0),
        |  round(coalesce(c2.c, 0) / n::DOUBLE, 6)
        |FROM tot t LEFT JOIN c2 ON t.segment = c2.segment""".stripMargin,
    // epoch-aligned integer weeks (ms div 7·86400000) — no calendar
    // functions on either side
    "q_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS p FROM events),
        |coh AS (SELECT user_id, min(p) AS c FROM act GROUP BY 1),
        |cells AS (SELECT c AS cohort_period, (p - c)::INT AS period_offset,
        |    count(*)::BIGINT AS n_users
        |  FROM act JOIN coh USING (user_id) WHERE p - c <= 8 GROUP BY 1, 2),
        |base AS (SELECT cohort_period, n_users AS b FROM cells WHERE period_offset = 0)
        |SELECT cohort_period, period_offset, n_users,
        |  round(n_users / b::DOUBLE, 6) AS retention
        |FROM cells JOIN base USING (cohort_period)""".stripMargin,
    // the same lag over the same (ts, event_id) total order
    "q_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events),
        |l AS (SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS from_type
        |  FROM e),
        |c AS (SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
        |  FROM l WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |  round(n_transitions / (sum(n_transitions) OVER (PARTITION BY from_type))::DOUBLE, 6) AS prob
        |FROM c""".stripMargin,
    // integer-divided daily windows; the value sum rides an exact
    // DECIMAL(18,6) accumulator on both sides
    "q_tumbling" ->
      """SELECT (epoch_ms(ts) // 86400000) * 86400000 AS window_start_ms,
        |  count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  round((sum(value::DECIMAL(18,6)))::DOUBLE, 4) AS sum_value,
        |  round((sum(value::DECIMAL(18,6)))::DOUBLE / count(value), 4) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,
    // identical closed-form covering-window starts (integer div on
    // non-negative epoch ms), same DECIMAL sum + one 4 dp rounding
    "q_hopping" ->
      """SELECT ((epoch_ms(ts) // 28800000) - g.i) * 28800000 AS window_start_ms,
        |  count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  round((sum(value::DECIMAL(18,6)))::DOUBLE, 4) AS sum_value,
        |  round((sum(value::DECIMAL(18,6)))::DOUBLE / count(value), 4) AS avg_value
        |FROM events, generate_series(0, 2) AS g(i) GROUP BY 1""".stripMargin,
    // identical fixed-order contribution sum (never a data-ordered
    // aggregation), idf/contribution 6 dp, total 4 dp
    "q_bm25" -> {
      val terms = Seq("spark", "data", "query", "window")
      val tfCols = terms.zipWithIndex.map { case (t, j) =>
        s"len(list_filter(w, x -> x = '$t'))::DOUBLE AS tf$j"
      }.mkString(",\n        |  ")
      val dfCols = terms.indices.map(j =>
        s"sum(CASE WHEN tf$j > 0 THEN 1 ELSE 0 END)::DOUBLE AS df$j")
        .mkString(", ")
      val contribs = terms.indices.map(j =>
        s"round(round(ln(1.0 + (n - df$j + 0.5) / (df$j + 0.5)), 6) * tf$j * 2.2" +
          s" / (tf$j + 1.2 * (0.25 + 0.75 * l / (sl / n))), 6)")
        .mkString(" + ")
      s"""WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
        |  FROM documents),
        |base AS (SELECT doc_id, len(w) AS l,
        |  $tfCols
        |  FROM tk),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(l)::DOUBLE AS sl, $dfCols FROM base),
        |sc AS (SELECT doc_id, round($contribs, 4) AS bm25 FROM base, s)
        |SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin
    },
    // two q_bm25 CTE stacks (different term sets, shared tokenizer),
    // each ranked, fused by 8 dp 1/(60+rank) DECIMAL contributions —
    // denominators ≤ 110 can never make an 8 dp half boundary
    "q_rrf" -> {
      def stack(pfx: String, terms: Seq[String]): String = {
        val tfCols = terms.zipWithIndex.map { case (t, j) =>
          s"len(list_filter(w, x -> x = '$t'))::DOUBLE AS tf$j"
        }.mkString(", ")
        val dfCols = terms.indices.map(j =>
          s"sum(CASE WHEN tf$j > 0 THEN 1 ELSE 0 END)::DOUBLE AS df$j")
          .mkString(", ")
        val contribs = terms.indices.map(j =>
          s"round(round(ln(1.0 + (n - df$j + 0.5) / (df$j + 0.5)), 6) * tf$j * 2.2" +
            s" / (tf$j + 1.2 * (0.25 + 0.75 * l / (sl / n))), 6)")
          .mkString(" + ")
        s"${pfx}base AS (SELECT doc_id, len(w) AS l, $tfCols FROM tk),\n" +
          s"${pfx}st AS (SELECT count(*)::DOUBLE AS n, sum(l)::DOUBLE AS sl, $dfCols FROM ${pfx}base),\n" +
          s"${pfx}sc AS (SELECT doc_id, round($contribs, 4) AS bm25 FROM ${pfx}base, ${pfx}st),\n" +
          s"${pfx}top AS (SELECT doc_id, bm25 FROM ${pfx}sc WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT 50),\n" +
          s"${pfx}r AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM ${pfx}top)"
      }
      s"""WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
        |  FROM documents),
        |${stack("xa", Seq("spark", "data", "query", "window"))},
        |${stack("xb", Seq("join", "hash", "stream", "merge"))},
        |u AS (SELECT doc_id, round(1.0::DOUBLE / (rank + 60), 8)::DECIMAL(20,8) AS c FROM xar
        |  UNION ALL
        |  SELECT doc_id, round(1.0::DOUBLE / (rank + 60), 8)::DECIMAL(20,8) FROM xbr),
        |g AS (SELECT doc_id, sum(c) AS s FROM u GROUP BY 1),
        |rr AS (SELECT doc_id, s::DOUBLE AS sc,
        |  row_number() OVER (ORDER BY s::DOUBLE DESC, doc_id) AS rank FROM g)
        |SELECT 0::BIGINT AS query_id, doc_id, round(sc, 8) AS rrf_score,
        |  rank::INT AS rank FROM rr WHERE rank <= 10""".stripMargin
    },
    // the q_bm25 ranking CTEs + the nDCG algebra: natural-log
    // discounts in both sums (base cancels), 8 dp terms in
    // DECIMAL(20,8), one division at the boundary
    "q_ndcg" -> {
      val terms = Seq("spark", "data", "query", "window")
      val tfCols = terms.zipWithIndex.map { case (t, j) =>
        s"len(list_filter(w, x -> x = '$t'))::DOUBLE AS tf$j"
      }.mkString(",\n        |  ")
      val dfCols = terms.indices.map(j =>
        s"sum(CASE WHEN tf$j > 0 THEN 1 ELSE 0 END)::DOUBLE AS df$j")
        .mkString(", ")
      val contribs = terms.indices.map(j =>
        s"round(round(ln(1.0 + (n - df$j + 0.5) / (df$j + 0.5)), 6) * tf$j * 2.2" +
          s" / (tf$j + 1.2 * (0.25 + 0.75 * l / (sl / n))), 6)")
        .mkString(" + ")
      s"""WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
        |  FROM documents),
        |base AS (SELECT doc_id, len(w) AS l,
        |  $tfCols
        |  FROM tk),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(l)::DOUBLE AS sl, $dfCols FROM base),
        |sc AS (SELECT doc_id, round($contribs, 4) AS bm25 FROM base, s),
        |top AS (SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
        |  ORDER BY bm25 DESC, doc_id LIMIT 50),
        |rankd AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM top),
        |rels AS (SELECT doc_id, (doc_id % 4)::INT AS rel FROM documents),
        |d AS (SELECT sum(round((pow(2.0, coalesce(rel, 0)::DOUBLE) - 1.0)
        |    / ln(rank + 1.0), 8)::DECIMAL(20,8)) AS dcg
        |  FROM rankd LEFT JOIN rels USING (doc_id) WHERE rank <= 10),
        |ideal AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS ir
        |  FROM rels WHERE rel > 0),
        |i AS (SELECT sum(round((pow(2.0, rel::DOUBLE) - 1.0)
        |    / ln(ir + 1.0), 8)::DECIMAL(20,8)) AS idcg
        |  FROM ideal WHERE ir <= 10)
        |SELECT 0::BIGINT AS query_id, round(coalesce(dcg::DOUBLE, 0.0), 6) AS dcg,
        |  round(idcg::DOUBLE, 6) AS idcg,
        |  round(CASE WHEN idcg > 0
        |    THEN coalesce(dcg, 0::DECIMAL(20,8))::DOUBLE / idcg::DOUBLE END, 6) AS ndcg
        |FROM d, i""".stripMargin
    },
    "q_orc_roundtrip" ->
      "SELECT doc_id, lang, text, n_chars FROM documents",
    // the MG presence guarantee makes in_sketch a deterministic
    // TRUE for every top-10 word (counts >> N/(k+1)); the oracle is
    // the exact top-10 with the guaranteed flag
    "q_heavy_mg" ->
      """WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |  FROM documents),
        |c AS (SELECT word, count(*) AS n_exact FROM w WHERE word <> '' GROUP BY 1)
        |SELECT word, n_exact, true AS in_sketch
        |FROM c ORDER BY n_exact DESC, word LIMIT 10""".stripMargin,
    // identical (doc, token) distinct pairs; the cap is the same
    // rank-before-collect, df_count counts ALL docs
    "q_inverted_index" ->
      """WITH p AS (SELECT DISTINCT doc_id AS id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |p2 AS (SELECT * FROM p WHERE token <> ''),
        |e AS (SELECT token, count(*) AS df_count FROM p2
        |  GROUP BY 1 HAVING count(*) >= 2),
        |r AS (SELECT token, id,
        |  row_number() OVER (PARTITION BY token ORDER BY id) AS rn FROM p2),
        |x AS (SELECT token, list(id ORDER BY id) AS postings
        |  FROM r WHERE rn <= 100 GROUP BY token)
        |SELECT e.token, e.df_count, len(x.postings)::INT AS n_postings,
        |  array_to_string(x.postings, ' ') AS postings_joined
        |FROM x JOIN e USING (token)""".stripMargin,
    // identical per-user (ts, type) lead windows; the global rank
    // runs over the bounded distinct-path set
    "q_event_paths" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
        |s AS (SELECT user_id, event_type AS s0,
        |  lead(event_type, 1) OVER pw AS s1,
        |  lead(event_type, 2) OVER pw AS s2
        |  FROM e WINDOW pw AS (PARTITION BY user_id ORDER BY ts_ms, event_type)),
        |c AS (SELECT s0 || '>' || s1 || '>' || s2 AS path, count(*) AS n
        |  FROM s WHERE s0 IS NOT NULL AND s1 IS NOT NULL AND s2 IS NOT NULL
        |  GROUP BY 1)
        |SELECT path, n, rank::INT AS rank
        |FROM (SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rank FROM c)
        |WHERE rank <= 20""".stripMargin,
    // the q_gapfill pipeline + two trailing-window DECIMAL moment
    // sums; mean/sd/z each round once, so every boundary compare is
    // on identically-rounded doubles
    "q_anomaly" ->
      """WITH dd AS (SELECT user_id, epoch_ms(ts) // 86400000 AS d,
        |    sum(value::DECIMAL(18,6)) AS sv
        |  FROM events WHERE user_id % 23 = 0 GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(d) AS mn, max(d) AS mx FROM dd GROUP BY 1),
        |s AS (SELECT user_id, unnest(range(mn, mx + 1)) AS d FROM sp),
        |j AS (SELECT s.user_id, s.d, dd.sv FROM s LEFT JOIN dd USING (user_id, d)),
        |g AS (SELECT user_id, d * 86400000 AS bucket_ms,
        |  round((last_value(sv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE, 4) AS vf
        |  FROM j),
        |wnd AS (SELECT user_id, bucket_ms, vf,
        |  count(*) OVER tw AS n,
        |  sum(vf::DECIMAL(18,4)) OVER tw AS wsv,
        |  sum(vf::DECIMAL(18,4) * vf::DECIMAL(18,4)) OVER tw AS wsq
        |  FROM g WINDOW tw AS (PARTITION BY user_id ORDER BY bucket_ms
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT *, round(wsv::DOUBLE / n, 6) AS mean FROM wnd),
        |sd AS (SELECT *, round(sqrt(greatest(0.0, wsq::DOUBLE / n - mean * mean)), 6) AS sdev FROM m),
        |zz AS (SELECT *, CASE WHEN n >= 7 AND sdev > 0
        |    THEN round(abs(vf - mean) / sdev, 4) END AS zscore FROM sd)
        |SELECT user_id, bucket_ms, vf AS value_filled, zscore,
        |  coalesce(zscore > 2.5, false) AS is_anomaly
        |FROM zz""".stripMargin,
    // latest-wins replayed with the same (version desc, op desc)
    // window; the base is an anti-join + union, exactly the operator
    "q_upsert" ->
      """WITH base AS (SELECT doc_id, text, lang FROM documents),
        |ch AS (
        |  SELECT doc_id, text, lang, 1 AS version, 'delete' AS op
        |    FROM documents WHERE doc_id % 10 = 3
        |  UNION ALL SELECT doc_id, text || ' v2', lang, 1, 'upsert'
        |    FROM documents WHERE doc_id % 10 = 4
        |  UNION ALL SELECT doc_id + 10000000, text, lang, 1, 'upsert'
        |    FROM documents WHERE doc_id % 10 = 5
        |  UNION ALL SELECT doc_id, text || ' v3', lang, 2, 'upsert'
        |    FROM documents WHERE doc_id % 10 = 4 AND doc_id % 3 = 0
        |  UNION ALL SELECT doc_id + 10000000, text, lang, 2, 'delete'
        |    FROM documents WHERE doc_id % 10 = 5 AND doc_id % 3 = 0),
        |latest AS (SELECT doc_id, text, lang, op FROM (
        |  SELECT ch.*, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY version DESC, op DESC) AS rn FROM ch) WHERE rn = 1)
        |SELECT b.doc_id, b.text, b.lang FROM base b
        |  LEFT JOIN latest l ON b.doc_id = l.doc_id WHERE l.doc_id IS NULL
        |UNION ALL
        |SELECT doc_id, text, lang FROM latest WHERE op <> 'delete'""".stripMargin,
    // same DECIMAL bucket sums as the rollups; the spine is
    // range(min, max+1), the fill one IGNORE NULLS window — post-1970
    // epochs, so `//` == floor like q_tumbling
    "q_gapfill" ->
      """WITH dd AS (SELECT user_id, epoch_ms(ts) // 86400000 AS d,
        |    sum(value::DECIMAL(18,6)) AS sv
        |  FROM events WHERE user_id % 37 = 0 GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(d) AS mn, max(d) AS mx FROM dd GROUP BY 1),
        |s AS (SELECT user_id, unnest(range(mn, mx + 1)) AS d FROM sp),
        |j AS (SELECT s.user_id, s.d, dd.sv FROM s LEFT JOIN dd USING (user_id, d))
        |SELECT user_id, d * 86400000 AS bucket_ms,
        |  round((last_value(sv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE, 4) AS value_filled,
        |  sv IS NULL AS is_gap
        |FROM j""".stripMargin,
    "q_corr" -> corrOracleSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), 4),
    // same doubled average ranks (2·cum − c + 1, exact integers) via
    // window prefix sums; each √ factor converted to DOUBLE before
    // the root, fixed multiply order, one rounding at the boundary
    "q_spearman" ->
      """WITH d AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |gx AS (SELECT x AS v, count(*)::BIGINT AS c FROM d GROUP BY 1),
        |cx AS (SELECT v, (2*sum(c) OVER (ORDER BY v) - c + 1)::HUGEINT AS rx FROM gx),
        |gy AS (SELECT y AS v, count(*)::BIGINT AS c FROM d GROUP BY 1),
        |cy AS (SELECT v, (2*sum(c) OVER (ORDER BY v) - c + 1)::HUGEINT AS ry FROM gy),
        |p AS (SELECT rx, ry FROM d JOIN cx ON d.x = cx.v JOIN cy ON d.y = cy.v),
        |m AS (SELECT count(*)::HUGEINT AS n, sum(rx)::HUGEINT AS sx,
        |    sum(ry)::HUGEINT AS sy, sum(rx*rx)::HUGEINT AS sxx,
        |    sum(ry*ry)::HUGEINT AS syy, sum(rx*ry)::HUGEINT AS sxy FROM p)
        |SELECT n::BIGINT AS n_rows,
        |  CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
        |    round((n*sxy - sx*sy)::DOUBLE /
        |      (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)), 6)
        |  END AS spearman
        |FROM m""".stripMargin,
    // same HUGEINT-widened marginal products and 8 dp DECIMAL χ²
    // terms; V derives with the identical fixed-order doubles
    "q_cramers_v" ->
      """WITH c AS (SELECT source, lang, count(*)::BIGINT AS n_obs
        |  FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
        |ra AS (SELECT source, sum(n_obs) AS r FROM c GROUP BY 1),
        |cb AS (SELECT lang, sum(n_obs) AS cl FROM c GROUP BY 1),
        |nn AS (SELECT sum(n_obs)::DOUBLE AS nd FROM c),
        |grid AS (SELECT ra.source, cb.lang, ra.r, cb.cl,
        |    coalesce(c.n_obs, 0) AS o
        |  FROM ra CROSS JOIN cb
        |  LEFT JOIN c ON c.source = ra.source AND c.lang = cb.lang),
        |x AS (SELECT round(sum(round(
        |      (o - r::HUGEINT * cl::HUGEINT / nd)
        |        * (o - r::HUGEINT * cl::HUGEINT / nd)
        |        / (r::HUGEINT * cl::HUGEINT / nd), 8)::DECIMAL(28,8)), 8)
        |    AS chi
        |  FROM grid, nn),
        |s AS (SELECT sum(n_obs)::BIGINT AS n,
        |    count(DISTINCT source)::BIGINT AS nr,
        |    count(DISTINCT lang)::BIGINT AS nc FROM c)
        |SELECT n AS n_rows, nr AS n_a, nc AS n_b,
        |  ((nr - 1) * (nc - 1))::BIGINT AS dof,
        |  round(chi::DOUBLE, 6) AS chi2,
        |  CASE WHEN n > 0 AND least(nr, nc) > 1 THEN
        |    round(sqrt(chi::DOUBLE / (n::DOUBLE * (least(nr, nc) - 1)::DOUBLE)), 6)
        |  END AS cramers_v
        |FROM s, x""".stripMargin,
    // identical 8 dp DECIMAL ln terms (the distributionDrift
    // ln-boundary discipline) for MI and both entropies; NMI is one
    // fixed-order double at the boundary
    "q_mutual_info" ->
      """WITH c AS (SELECT source, lang, count(*)::BIGINT AS c FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
        |ra AS (SELECT source, sum(c)::BIGINT AS ra FROM c GROUP BY 1),
        |cb AS (SELECT lang, sum(c)::BIGINT AS cl FROM c GROUP BY 1),
        |nn AS (SELECT sum(c)::DOUBLE AS n, count(DISTINCT source)::BIGINT AS na,
        |    count(DISTINCT lang)::BIGINT AS nb FROM c),
        |mi AS (SELECT coalesce(sum(round((c / n) * ln(c * n / (ra::DOUBLE * cl)), 8)
        |    ::DECIMAL(28,8)), 0) AS m
        |  FROM c JOIN ra USING (source) JOIN cb USING (lang), nn),
        |ha AS (SELECT coalesce(sum(round(-(ra / n) * ln(ra / n), 8)
        |    ::DECIMAL(28,8)), 0) AS h FROM ra, nn),
        |hb AS (SELECT coalesce(sum(round(-(cl / n) * ln(cl / n), 8)
        |    ::DECIMAL(28,8)), 0) AS h FROM cb, nn)
        |SELECT n::BIGINT AS n_rows, na AS n_a, nb AS n_b,
        |  round(m::DOUBLE, 6) AS mi,
        |  round(ha.h::DOUBLE, 6) AS h_a, round(hb.h::DOUBLE, 6) AS h_b,
        |  CASE WHEN ha.h > 0 AND hb.h > 0
        |    THEN round(m::DOUBLE / sqrt(ha.h::DOUBLE * hb.h::DOUBLE), 6)
        |  END AS nmi
        |FROM nn, mi, ha, hb""".stripMargin,
    // identical marginal products and the left-associative
    // (o−e)²/e — counts are exact longs, one double rounding per term
    "q_crosstab" ->
      """WITH c AS (SELECT source, lang, count(*)::BIGINT AS n_obs FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
        |ra AS (SELECT source, sum(n_obs) AS r FROM c GROUP BY 1),
        |cb AS (SELECT lang, sum(n_obs) AS cl FROM c GROUP BY 1),
        |nn AS (SELECT sum(n_obs)::DOUBLE AS n FROM c)
        |SELECT source, lang, n_obs,
        |  round(r * cl / n, 6) AS expected,
        |  round((n_obs - r * cl / n) * (n_obs - r * cl / n) / (r * cl / n), 6) AS contrib
        |FROM c JOIN ra USING (source) JOIN cb USING (lang), nn""".stripMargin,
    // Laplace-smoothed shares (exact-long counts, one double division
    // each), every ln rounded 6 dp before its product (the
    // weightedSample ln-boundary discipline), identical
    // left-associative products
    "q_drift" ->
      """WITH ca AS (SELECT lang, count(*)::BIGINT AS n_a FROM documents WHERE lang IS NOT NULL GROUP BY 1),
        |cb AS (SELECT lang, count(*)::BIGINT AS n_b FROM documents WHERE lang IS NOT NULL AND n_chars >= 200 GROUP BY 1),
        |cells AS (SELECT lang, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |  FROM ca FULL OUTER JOIN cb USING (lang)),
        |tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS k FROM cells),
        |p AS (SELECT lang, n_a, n_b,
        |  round((n_a + 1)::DOUBLE / (ta + k), 6) AS p_a,
        |  round((n_b + 1)::DOUBLE / (tb + k), 6) AS p_b FROM cells, tot),
        |l AS (SELECT *, round(ln(p_a / p_b), 6) AS lab, round(ln(p_b / p_a), 6) AS lba,
        |  round(ln(p_a / ((p_a + p_b) / 2)), 6) AS lam,
        |  round(ln(p_b / ((p_a + p_b) / 2)), 6) AS lbm FROM p)
        |SELECT lang, n_a, n_b, p_a, p_b,
        |  round(p_a * lab, 6) AS kl_ab, round(p_b * lba, 6) AS kl_ba,
        |  round(0.5 * p_a * lam + 0.5 * p_b * lbm, 6) AS js FROM l""".stripMargin,
    // same pooled distinct-value cells and RANGE-semantics window
    // cumulatives; 10 dp per-value gaps, max, one 6 dp boundary
    "q_ks" ->
      """WITH d AS (SELECT n_chars AS v, lang FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IN ('en', 'de')),
        |cells AS (SELECT v,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS cb
        |  FROM d GROUP BY 1),
        |c AS (SELECT *, sum(ca) OVER (ORDER BY v) AS cuma,
        |    sum(cb) OVER (ORDER BY v) AS cumb FROM cells),
        |tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM cells)
        |SELECT na AS n_a, nb AS n_b,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    round(max(round(abs(cuma::DOUBLE / na - cumb::DOUBLE / nb), 10)), 6)
        |  END AS ks
        |FROM c, tot GROUP BY na, nb""".stripMargin,
    // exact grouped medians interpolate half-integers on integer
    // lengths — both engines land on the same doubles; thresholds
    // rounded 6 dp before the strict > compare
    "q_mad" ->
      """WITH base AS (SELECT lang, n_chars::DOUBLE AS v FROM documents WHERE n_chars IS NOT NULL),
        |med AS (SELECT lang, round(quantile_cont(v, 0.5), 6) AS median FROM base GROUP BY 1),
        |dev AS (SELECT b.lang, abs(v - median) AS dev, median FROM base b JOIN med USING (lang)),
        |mad AS (SELECT lang, round(quantile_cont(dev, 0.5), 6) AS mad FROM dev GROUP BY 1)
        |SELECT d.lang, median, mad, count(*)::BIGINT AS n_rows,
        |  sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        |  round(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6) AS outlier_share
        |FROM dev d JOIN mad USING (lang) GROUP BY 1, 2, 3""".stripMargin,
    // exact DECIMAL(19,6) moment sums (matching the compact-decimal
    // scale-6 contract; 19: DuckDB only widens a product when
    // p1+p2 <= 38; the float cast routes through DOUBLE — DuckDB's
    // direct float->decimal keeps only float precision), then the
    // identical double formula
    "q_cov" ->
      """WITH u AS (SELECT vec_id, g.i::INT - 1 AS i, embedding[g.i]::DOUBLE::DECIMAL(19,6) AS a
        |  FROM embeddings, generate_series(1, 64) AS g(i)
        |  WHERE embedding IS NOT NULL),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM embeddings WHERE embedding IS NOT NULL),
        |s AS (SELECT i, sum(a)::DOUBLE AS s FROM u GROUP BY 1),
        |p AS (SELECT u1.i AS i, u2.i AS j, sum(u1.a * u2.a)::DOUBLE AS pp
        |  FROM u u1 JOIN u u2 USING (vec_id) GROUP BY 1, 2)
        |SELECT p.i, p.j, round((pp - s1.s * s2.s / n) / (n - 1), 6) + 0 AS cov
        |FROM p JOIN s s1 ON p.i = s1.i JOIN s s2 ON p.j = s2.i, nn""".stripMargin,
    // PCA invariant oracle (round-16 upgrade from rows-only): the
    // trace and norm2_sum rows are recomputed INDEPENDENTLY from the
    // q_cov moment replay (cross-engine anchors for the spectrum and
    // the fitted mean); the algebraic-consequence rows (projection
    // preserves centered norms, eigen residual vs the replayed S',
    // orthonormality, sign/order/PSD conventions) have known exact
    // values, so any fit defect hashes red. Per-vector centered
    // norms use the RAW ::DOUBLE elements minus the decimal-moment
    // mean — bit-identical to Spark's subtractMean/dotProduct fold
    // (same operands, same left-fold order).
    "q_pca" ->
      """WITH u AS (SELECT vec_id, g.i::INT - 1 AS i, embedding[g.i]::DOUBLE::DECIMAL(19,6) AS a
        |  FROM embeddings, generate_series(1, 64) AS g(i)
        |  WHERE embedding IS NOT NULL),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM embeddings WHERE embedding IS NOT NULL),
        |s AS (SELECT i, sum(a)::DOUBLE AS sx FROM u GROUP BY 1),
        |dg AS (SELECT i, sum(a * a)::DOUBLE AS pp FROM u GROUP BY 1),
        |tr AS (SELECT round(sum((pp - sx * sx / n) / (n - 1)), 4) AS v
        |  FROM dg JOIN s USING (i), nn),
        |mus AS (SELECT list(sx / n ORDER BY i) AS ml FROM s, nn),
        |cn AS (SELECT vec_id, round(list_reduce(list_transform(range(1, 65),
        |    i -> (embedding[i]::DOUBLE - ml[i]) * (embedding[i]::DOUBLE - ml[i])),
        |    (x, y) -> x + y), 6) AS n2
        |  FROM embeddings, mus WHERE embedding IS NOT NULL)
        |SELECT 'trace' AS chk, -1::BIGINT AS id, v AS value FROM tr
        |UNION ALL SELECT 'norm2_sum', -1::BIGINT, round(sum(n2::DECIMAL(18,6))::DOUBLE, 4) FROM cn
        |UNION ALL SELECT 'proj_norm_diff', vec_id::BIGINT, 0.0::DOUBLE FROM cn
        |UNION ALL SELECT 'eigen_residual', g.c::BIGINT, 0.0::DOUBLE FROM generate_series(0, 63) AS g(c)
        |UNION ALL SELECT 'ortho', g.c::BIGINT, 0.0::DOUBLE FROM generate_series(0, 63) AS g(c)
        |UNION ALL SELECT 'sign', g.c::BIGINT, 1.0::DOUBLE FROM generate_series(0, 63) AS g(c)
        |UNION ALL SELECT 'psd', g.c::BIGINT, 1.0::DOUBLE FROM generate_series(0, 63) AS g(c)
        |UNION ALL SELECT 'order', g.c::BIGINT, 1.0::DOUBLE FROM generate_series(0, 62) AS g(c)""".stripMargin,
    // the full fit+encode+search recipe replayed from scratch — so a
    // green row ALSO proves the persisted codebooks/codes this key
    // serves from equal a from-scratch build
    "q_ann_pq" ->
      (s"""WITH ${pqCtes(m = 8, subDim = 8, numCentroids = 64, fitStride = 4)}
          |SELECT query_id, corpus_id, adist, rank::INT AS rank FROM pqr WHERE rank <= 10""".stripMargin),
    // second query batch, same index — same replay, different qPred
    "q_ann_pq_index" ->
      (s"""WITH ${pqCtes(m = 8, subDim = 8, numCentroids = 64, fitStride = 4,
             qPred = "id >= 5 AND id < 10")}
          |SELECT query_id, corpus_id, adist, rank::INT AS rank FROM pqr WHERE rank <= 10""".stripMargin),
    // same ADC replay fetched at 50, then the exact-cosine rerank
    // window over the shortlist — the cascade in SQL
    "q_ann_pq_rerank" ->
      (s"""WITH ${pqCtes(m = 8, subDim = 8, numCentroids = 64, fitStride = 4)},
          |sl AS (SELECT query_id, corpus_id FROM pqr WHERE rank <= 50),
          |cvt AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
          |qvt AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
          |sc AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine
          |  FROM sl JOIN cvt USING (corpus_id) JOIN qvt USING (query_id)),
          |rr AS (SELECT *, row_number() OVER (
          |    PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM sc)
          |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM rr WHERE rank <= 10""".stripMargin),
    // the fit-inclusive baseline: quarter corpus (id % 4 = 0),
    // nested stride-16 fit sample, queries unchanged
    "q_ann_pq_fit" ->
      (s"""WITH ${pqCtes(m = 8, subDim = 8, numCentroids = 64, fitStride = 16,
             corpusPred = "id % 4 = 0")}
          |SELECT query_id, corpus_id, adist, rank::INT AS rank FROM pqr WHERE rank <= 10""".stripMargin),
    // the ADC ranking CTEs on the ~32-query stride subsample + the
    // metric-matched exact-L2 CTEs (cosine here would grade metric
    // disagreement, not quantization loss) + per-query recall + the
    // q_bootstrap_ci Poisson replay (same 60-bit md5 uniform, same
    // 10 dp CDF literals, decimal replicate sums)
    "q_pq_recall" ->
      (s"""WITH qst AS (SELECT CAST(ceil(count(*) / 16.0) AS BIGINT) AS qstride
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |${pqCtes(m = 8, subDim = 8, numCentroids = 64, fitStride = 4,
             qPred = "id % (SELECT qstride FROM qst) = 0")},
          |fq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          |  WHERE embedding IS NOT NULL AND vec_id % (SELECT qstride FROM qst) = 0),
          |fc AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
          |fs AS (SELECT query_id, corpus_id, round(${l2Sql("cv", "qv")}, 6) AS dist FROM fc, fq),
          |fr AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, corpus_id) AS rank FROM fs),
          |exact AS (SELECT query_id, corpus_id FROM fr WHERE rank <= 10),
          |approx AS (SELECT query_id, corpus_id FROM pqr WHERE rank <= 10),
          |rq AS (SELECT e.query_id,
          |    round(sum(CASE WHEN a.corpus_id IS NOT NULL THEN 1 ELSE 0 END)
          |      / count(*)::DOUBLE, 6) AS recall
          |  FROM exact e LEFT JOIN approx a USING (query_id, corpus_id) GROUP BY 1),
          |rr AS (SELECT query_id, recall, unnest(range(0, 64)) AS b FROM rq),
          |uu AS (SELECT b, recall,
          |    ${h60Sql("query_id::VARCHAR || ':0:' || b::VARCHAR")}::DOUBLE
          |      / 1152921504606846976.0 AS u FROM rr),
          |ww AS (SELECT b, recall, CASE WHEN u < 0.3678794412 THEN 0
          |    WHEN u < 0.7357588823 THEN 1 WHEN u < 0.9196986029 THEN 2
          |    WHEN u < 0.9810118431 THEN 3 WHEN u < 0.9963401532 THEN 4
          |    ELSE 5 END AS w FROM uu),
          |mm AS (SELECT b, CASE WHEN sum(w) > 0 THEN
          |    round(sum((w * recall::DOUBLE)::DECIMAL(28,10))::DOUBLE / sum(w), 6)
          |  END AS m FROM ww GROUP BY 1),
          |ci AS (SELECT count(m)::BIGINT AS n_replicates,
          |    round(quantile_cont(m, 0.025), 6) AS ci_lo,
          |    round(quantile_cont(m, 0.975), 6) AS ci_hi FROM mm),
          |p AS (SELECT count(*)::BIGINT AS n_rows,
          |    round(sum(recall::DECIMAL(28,10))::DOUBLE / count(*), 6) AS mean
          |  FROM rq)
          |SELECT n_rows, n_replicates, mean, ci_lo, ci_hi FROM p, ci""".stripMargin),
    // the 16-dim prefix slice, then the shared cosine replay
    "q_ann_matryoshka" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding[1:16] AS qv FROM embeddings WHERE vec_id < 5),
          |c AS (SELECT vec_id AS corpus_id, embedding[1:16] AS cv FROM embeddings),
          |s AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM c, q),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s)
          |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM r WHERE rank <= 10""".stripMargin),
    // full-dim exact set vs the 16-dim prefix set, recall metric
    // replayed end to end
    "q_matryoshka_recall" ->
      (s"""WITH fq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
          |fc AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
          |fs AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM fc, fq),
          |fr AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM fs),
          |exact AS (SELECT query_id, corpus_id FROM fr WHERE rank <= 10),
          |mq AS (SELECT vec_id AS query_id, embedding[1:16] AS qv FROM embeddings WHERE vec_id < 5),
          |mc AS (SELECT vec_id AS corpus_id, embedding[1:16] AS cv FROM embeddings),
          |ms AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM mc, mq),
          |mr AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM ms),
          |approx AS (SELECT query_id, corpus_id FROM mr WHERE rank <= 10),
          |tot AS (SELECT count(DISTINCT query_id) AS n_queries, count(*)::BIGINT AS n_exact FROM exact),
          |mt AS (SELECT count(*)::BIGINT AS n_matched FROM exact JOIN approx USING (query_id, corpus_id))
          |SELECT n_queries, n_exact, n_matched,
          |  round(n_matched / n_exact::DOUBLE, 6) AS recall FROM tot, mt""".stripMargin),
    // JL twin of q_ann_matryoshka: qv/cv are the replayed 16-dim
    // Rademacher projections (literal sign lists, same fold order)
    "q_ann_rp" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, ${rpSql("embedding", 64, 16)} AS qv FROM embeddings WHERE vec_id < 5),
          |c AS (SELECT vec_id AS corpus_id, ${rpSql("embedding", 64, 16)} AS cv FROM embeddings),
          |s AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM c, q),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s)
          |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM r WHERE rank <= 10""".stripMargin),
    "q_rp_recall" ->
      (s"""WITH fq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
          |fc AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
          |fs AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM fc, fq),
          |fr AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM fs),
          |exact AS (SELECT query_id, corpus_id FROM fr WHERE rank <= 10),
          |mq AS (SELECT vec_id AS query_id, ${rpSql("embedding", 64, 16)} AS qv FROM embeddings WHERE vec_id < 5),
          |mc AS (SELECT vec_id AS corpus_id, ${rpSql("embedding", 64, 16)} AS cv FROM embeddings),
          |ms AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM mc, mq),
          |mr AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM ms),
          |approx AS (SELECT query_id, corpus_id FROM mr WHERE rank <= 10),
          |tot AS (SELECT count(DISTINCT query_id) AS n_queries, count(*)::BIGINT AS n_exact FROM exact),
          |mt AS (SELECT count(*)::BIGINT AS n_matched FROM exact JOIN approx USING (query_id, corpus_id))
          |SELECT n_queries, n_exact, n_matched,
          |  round(n_matched / n_exact::DOUBLE, 6) AS recall FROM tot, mt""".stripMargin),
    // identical contract to q_dedup_minhash — the signature-table path
    // must reproduce the direct path's pairs exactly
    "q_dedup_from_signatures" ->
      s"""WITH $minhashCtes
         |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM mh WHERE jac >= 0.5""".stripMargin,
    "q_dedup_from_signatures_read" ->
      s"""WITH $minhashCtes
         |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM mh WHERE jac >= 0.5""".stripMargin,
    "q_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey AS suppkey, s_name
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,
    "q_boilerplate" ->
      """WITH t AS (SELECT doc_id,
        |  text || chr(10) || '(c) example corp - all rights reserved' || chr(10) || substr(text, 1, 40) AS t2
        |  FROM documents),
        |l AS (SELECT doc_id, unnest(list_distinct(string_split(t2, chr(10)))) AS line FROM t)
        |SELECT md5(line) AS line_md5, count(*)::BIGINT AS n_docs
        |FROM l WHERE trim(line) <> '' GROUP BY 1 HAVING count(*) >= 50""".stripMargin,
    "q_strip_boilerplate" ->
      """WITH t AS (SELECT doc_id,
        |  text || chr(10) || '(c) example corp - all rights reserved' || chr(10) || substr(text, 1, 40) AS t2
        |  FROM documents),
        |ld AS (SELECT doc_id, unnest(list_distinct(string_split(t2, chr(10)))) AS line FROM t),
        |boiler AS (SELECT line FROM ld WHERE trim(line) <> '' GROUP BY 1 HAVING count(*) >= 50),
        |ex AS (SELECT doc_id, unnest(string_split(t2, chr(10))) AS line,
        |  generate_subscripts(string_split(t2, chr(10)), 1) AS pos FROM t),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS c
        |  FROM ex WHERE line NOT IN (SELECT line FROM boiler) GROUP BY 1)
        |SELECT t.doc_id, md5(coalesce(agg.c, '')) AS cleaned_md5
        |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin,
    // paragraph mode: split on the blank-line separator; the
    // two-line footer paragraph survives as ONE strip unit
    "q_boilerplate_para" ->
      """WITH t AS (SELECT doc_id,
        |  text || chr(10) || chr(10) || 'legal notice' || chr(10) || '(c) example corp'
        |    || chr(10) || chr(10) || substr(text, 1, 40) AS t2
        |  FROM documents),
        |ld AS (SELECT doc_id, unnest(list_distinct(string_split(t2, chr(10) || chr(10)))) AS line FROM t),
        |boiler AS (SELECT line FROM ld WHERE trim(line) <> '' GROUP BY 1 HAVING count(*) >= 50),
        |ex AS (SELECT doc_id, unnest(string_split(t2, chr(10) || chr(10))) AS line,
        |  generate_subscripts(string_split(t2, chr(10) || chr(10)), 1) AS pos FROM t),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) || chr(10) ORDER BY pos) AS c
        |  FROM ex WHERE line NOT IN (SELECT line FROM boiler) GROUP BY 1)
        |SELECT t.doc_id, md5(coalesce(agg.c, '')) AS cleaned_md5
        |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin,
    // mirrors TextAnalysis.chunkTokens: stride 32 (= 40 − 8),
    // nchunks = max(1, ceil((n − 8)/32)), slices clamp at the tail
    "q_chunk" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |c AS (SELECT doc_id,
        |  list_transform(range(0, greatest(ceil((len(w) - 8)::DOUBLE / 32)::INT, 1)),
        |    i -> array_to_string(w[(i * 32 + 1):(i * 32 + 40)], ' ')) AS chunks
        |  FROM tk)
        |SELECT doc_id, (generate_subscripts(chunks, 1) - 1)::INT AS chunk_idx,
        |  md5(unnest(chunks)) AS chunk_md5 FROM c""".stripMargin,
    // mirrors TextAnalysis.repetitionSignals: line fractions over the
    // synthesized 3-line doc; top-bigram fraction over lowercased
    // whitespace tokens, ties broken to the binary-smallest gram
    "q_repetition" ->
      """WITH t AS (SELECT doc_id,
        |  text || chr(10) || text || chr(10) || substr(text, 1, 50) AS t2 FROM documents),
        |s AS (SELECT doc_id, string_split(t2, chr(10)) AS lines FROM t),
        |lm AS (SELECT doc_id,
        |  (len(lines) - len(list_distinct(lines)))::DOUBLE / len(lines) AS dlf,
        |  CASE WHEN length(array_to_string(lines, '')) = 0 THEN 0.0
        |    ELSE (length(array_to_string(lines, '')) - length(array_to_string(list_distinct(lines), '')))::DOUBLE
        |      / length(array_to_string(lines, '')) END AS dlcf
        |  FROM s),
        |tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(t2)), '\s+') AS w FROM t),
        |tg AS (SELECT doc_id, unnest(list_transform(range(0, len(w) - 1), i -> w[i + 1] || ' ' || w[i + 2])) AS g
        |  FROM tk WHERE len(w) >= 2),
        |gc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
        |top1 AS (SELECT doc_id, g, c FROM (SELECT doc_id, g, c,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn FROM gc)
        |  WHERE rn = 1),
        |tot AS (SELECT doc_id, length(array_to_string(w, '')) AS totchars FROM tk)
        |SELECT lm.doc_id,
        |  round(dlf, 4) AS dup_line_frac,
        |  round(dlcf, 4) AS dup_line_char_frac,
        |  round(CASE WHEN totchars = 0 THEN 0.0
        |    ELSE coalesce(c * (length(g) - 1), 0)::DOUBLE / totchars END, 4) AS top_ngram_char_frac
        |FROM lm JOIN tot USING (doc_id) LEFT JOIN top1 USING (doc_id)""".stripMargin,
    "q_dedup_apply" ->
      s"""WITH $minhashCtes,
         |pairs AS (SELECT id_a, id_b FROM mh WHERE jac >= 0.5)
         |SELECT doc_id, lang, source, n_chars FROM docs
         |WHERE doc_id NOT IN (SELECT id_b FROM pairs)""".stripMargin,
    "q_dedup_clusters" -> clustersOracleSql,
    // Same contract (component-min labels over the same pair list):
    // the star-CC variant must agree with the min-label one exactly.
    "q_dedup_clusters_star" -> clustersOracleSql,
    "q_dedup_simhash" ->
      (s"""WITH $docsWithDupsSql,
          |tk0 AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM docs),
          |tk AS (SELECT doc_id, CASE WHEN len(w) >= 2
          |  THEN list_distinct(list_transform(range(0, len(w) - 1), i -> w[i + 1] || ' ' || w[i + 2]))
          |  ELSE [array_to_string(w, ' ')] END AS tks FROM tk0),
          |sg AS (SELECT doc_id, ${simhashSql("tks", 48)} AS sig FROM tk),
          |ex AS (${(0 until 2).map(c => s"SELECT doc_id, sig, $c AS cpos, (sig >> ${c * 24}) & 16777215 AS ckey FROM sg").mkString(" UNION ALL ")}),
          |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
          |  FROM ex a JOIN ex b ON a.cpos = b.cpos AND a.ckey = b.ckey WHERE a.doc_id < b.doc_id)
          |SELECT id_a, id_b, bit_count(xor(sig_a::BIGINT, sig_b::BIGINT))::INT AS hamming FROM cand
          |WHERE bit_count(xor(sig_a::BIGINT, sig_b::BIGINT)) <= 1""".stripMargin),
    "q_ngram_jaccard" ->
      (s"""WITH $docsWithDupsSql,
          |tk AS (SELECT doc_id, lang, floor(length(text) / 100) AS len_bin,
          |  regexp_split_to_array(trim(text), '\\s+') AS tks FROM docs),
          |sh AS (SELECT doc_id, lang, len_bin, CASE WHEN len(tks) >= 3
          |  THEN list_distinct(list_transform(range(0, len(tks) - 2),
          |    i -> tks[i + 1] || ' ' || tks[i + 2] || ' ' || tks[i + 3]))
          |  ELSE [array_to_string(tks, ' ')] END AS s FROM tk),
          |bc AS (SELECT lang, len_bin FROM sh GROUP BY 1, 2
          |  HAVING count(*) BETWEEN 2 AND 500),
          |shc AS (SELECT sh.* FROM sh JOIN bc USING (lang, len_bin)),
          |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |  len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s))::DOUBLE AS jac
          |  FROM shc a JOIN shc b ON a.lang = b.lang AND a.len_bin = b.len_bin
          |  WHERE a.doc_id < b.doc_id)
          |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM p WHERE jac >= 0.5""".stripMargin),
    // prefix-filter replay: same global (df, shingle) rarity order,
    // same ceil(0.9::DOUBLE * sz) prefix length (spelled ::DOUBLE so
    // DuckDB's DECIMAL 0.9 cannot ceil differently at exact tenths),
    // same cap, same verification intersection
    "q_containment" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |q0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tks
        |  FROM base WHERE doc_id % 100 = 0),
        |quotes AS (SELECT doc_id + 1000000 AS doc_id,
        |  array_to_string(tks[1:greatest(ceil(len(tks) / 2.0), 3)::INT], ' ') AS text FROM q0),
        |alld AS (SELECT * FROM base UNION ALL SELECT * FROM quotes),
        |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tks FROM alld),
        |sh AS (SELECT doc_id, CASE WHEN len(tks) >= 3
        |  THEN list_distinct(list_transform(range(0, len(tks) - 2),
        |    i -> tks[i + 1] || ' ' || tks[i + 2] || ' ' || tks[i + 3]))
        |  ELSE [array_to_string(tks, ' ')] END AS s FROM tk),
        |shf AS (SELECT * FROM sh WHERE len(s) > 0),
        |r AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM shf),
        |freq AS (SELECT sg, count(*)::BIGINT AS df FROM r GROUP BY 1
        |  HAVING count(*) <= 10000),
        |ix AS (SELECT r.doc_id, r.sz, r.sg, df FROM r JOIN freq USING (sg)),
        |pre AS (SELECT * FROM (SELECT *, row_number()
        |    OVER (PARTITION BY doc_id ORDER BY df, sg) AS rk FROM ix)
        |  WHERE rk <= sz - ceil(0.9::DOUBLE * sz) + 1),
        |cand AS (SELECT DISTINCT least(p.doc_id, q.doc_id) AS id_a,
        |    greatest(p.doc_id, q.doc_id) AS id_b
        |  FROM pre p JOIN ix q USING (sg) WHERE p.doc_id <> q.doc_id),
        |v AS (SELECT id_a, id_b, a.s AS sa, b.s AS sb FROM cand
        |  JOIN shf a ON a.doc_id = id_a JOIN shf b ON b.doc_id = id_b),
        |c AS (SELECT id_a, id_b,
        |  round(len(list_intersect(sa, sb))::DOUBLE / least(len(sa), len(sb)), 4) AS containment,
        |  CASE WHEN len(sa) < len(sb) THEN id_a
        |       WHEN len(sb) < len(sa) THEN id_b
        |       ELSE least(id_a, id_b) END AS contained_id FROM v)
        |SELECT id_a, id_b, containment, contained_id FROM c
        |WHERE containment >= 0.9""".stripMargin,
    "q_embedding_neardup" ->
      (s"""WITH $embWithDupsSql,
          |b AS (SELECT vec_id, embedding, 0 AS tbl, ${bucketSql("embedding", 64, 8, 0)} AS bucket FROM emb
          |  UNION ALL
          |  SELECT vec_id, embedding, 1, ${bucketSql("embedding", 64, 8, 8)} FROM emb),
          |p AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b,
          |  round(${cosSql("a.embedding", "b2.embedding")}, 6) AS cosine
          |  FROM b a JOIN b b2 USING (tbl, bucket) WHERE a.vec_id < b2.vec_id)
          |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.9""".stripMargin),
    // the same cosine ranking with the label equi-join replayed —
    // candidates exist only inside the query's own label partition
    "q_ann_filtered" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label FROM embeddings WHERE vec_id < 5),
          |c AS (SELECT vec_id AS corpus_id, embedding AS cv, label FROM embeddings),
          |s AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM c JOIN q USING (label)),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s)
          |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM r WHERE rank <= 10""".stripMargin),
    "q_ann_topk" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
          |c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
          |s AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM c, q),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s)
          |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM r WHERE rank <= 10""".stripMargin),
    // q_cov's float->DECIMAL(19,6) discipline for the position sums,
    // 6 dp means into DECIMAL(18,6), exact DECIMAL(38,12) dot/norm
    // sums, one identical fixed-order double cosine
    "q_centroid_sim" ->
      """WITH u AS (SELECT d.lang AS g, gg.i::INT - 1 AS p,
        |    e.embedding[gg.i]::DOUBLE::DECIMAL(19,6) AS x
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id,
        |    generate_series(1, 64) AS gg(i)
        |  WHERE e.embedding IS NOT NULL AND d.lang IS NOT NULL),
        |c AS (SELECT g, p,
        |    round(sum(x)::DOUBLE / count(*), 6)::DECIMAL(18,6) AS v
        |  FROM u GROUP BY 1, 2),
        |j AS (SELECT a.g AS group_a, b.g AS group_b,
        |    sum((a.v * b.v)::DECIMAL(38,12)) AS dot,
        |    sum((a.v * a.v)::DECIMAL(38,12)) AS na,
        |    sum((b.v * b.v)::DECIMAL(38,12)) AS nb
        |  FROM c a JOIN c b ON a.p = b.p AND a.g < b.g GROUP BY 1, 2)
        |SELECT group_a, group_b,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    round(dot::DOUBLE / (sqrt(na::DOUBLE) * sqrt(nb::DOUBLE)), 6)
        |  END AS cosine
        |FROM j""".stripMargin,
    // mirrors marginMine: neighborhood sums of the 6-dp-rounded
    // cosines accumulate as exact DECIMAL (order-independent), the
    // margin is one double expression on those sums in both engines
    "q_bitext_margin" ->
      (s"""WITH x AS (SELECT vec_id AS src_id, embedding AS xv FROM embeddings WHERE vec_id < 300),
          |y AS (SELECT vec_id AS tgt_id, embedding AS yv FROM embeddings WHERE vec_id >= 300),
          |f0 AS (SELECT src_id, tgt_id, round(${cosSql("yv", "xv")}, 6) AS cosine FROM y, x),
          |fr AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, tgt_id) AS rank FROM f0),
          |fwd AS (SELECT src_id, tgt_id, cosine FROM fr WHERE rank <= 8),
          |b0 AS (SELECT tgt_id, src_id, round(${cosSql("xv", "yv")}, 6) AS cosine FROM x, y),
          |br AS (SELECT *, row_number() OVER (PARTITION BY tgt_id ORDER BY cosine DESC, src_id) AS rank FROM b0),
          |bwd AS (SELECT tgt_id, cosine FROM br WHERE rank <= 8),
          |sn AS (SELECT src_id, sum(cosine::DECIMAL(10,6)) AS ssum, count(*) AS nx FROM fwd GROUP BY 1),
          |tn AS (SELECT tgt_id, sum(cosine::DECIMAL(10,6)) AS tsum, count(*) AS ny FROM bwd GROUP BY 1),
          |m AS (SELECT f.src_id, f.tgt_id, f.cosine,
          |  round(f.cosine / ((sn.ssum::DOUBLE / nx + tn.tsum::DOUBLE / ny) / 2.0), 6) AS margin
          |  FROM fwd f JOIN sn USING (src_id) JOIN tn USING (tgt_id)),
          |r AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rank FROM m)
          |SELECT src_id, tgt_id, cosine, margin FROM r WHERE rank = 1 AND margin >= 1.0""".stripMargin),
    // q_bitext_margin's margin algebra verbatim, but each direction's
    // candidate set is the q_ann_ivf replay (stride-100 centroids per
    // side, raw-cosine argmax assignment, nprobe=2, k=8); the
    // half-split is the same scalar subquery both engines floor-divide
    "q_bitext_ivf" ->
      (s"""WITH x AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < (SELECT max(vec_id) // 2 FROM embeddings)),
          |y AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= (SELECT max(vec_id) // 2 FROM embeddings)),
          |ycen AS (SELECT vec_id AS cid, embedding AS cvec FROM y WHERE vec_id % 100 = 0),
          |yca AS (SELECT vec_id AS corpus_id, embedding AS cv, cid,
          |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn FROM y, ycen),
          |ycaf AS (SELECT corpus_id, cv, cid FROM yca WHERE rn = 1),
          |xqa AS (SELECT vec_id AS query_id, embedding AS qv, cid,
          |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn FROM x, ycen),
          |xqaf AS (SELECT query_id, qv, cid FROM xqa WHERE rn <= 2),
          |fs AS (SELECT query_id AS src_id, corpus_id AS tgt_id, round(${cosSql("cv", "qv")}, 6) AS cosine
          |  FROM ycaf JOIN xqaf USING (cid)),
          |fr AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, tgt_id) AS rank FROM fs),
          |fwd AS (SELECT src_id, tgt_id, cosine FROM fr WHERE rank <= 8),
          |xcen AS (SELECT vec_id AS cid, embedding AS cvec FROM x WHERE vec_id % 100 = 0),
          |xca AS (SELECT vec_id AS corpus_id, embedding AS cv, cid,
          |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn FROM x, xcen),
          |xcaf AS (SELECT corpus_id, cv, cid FROM xca WHERE rn = 1),
          |yqa AS (SELECT vec_id AS query_id, embedding AS qv, cid,
          |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn FROM y, xcen),
          |yqaf AS (SELECT query_id, qv, cid FROM yqa WHERE rn <= 2),
          |bs AS (SELECT query_id AS tgt_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine
          |  FROM xcaf JOIN yqaf USING (cid)),
          |br AS (SELECT *, row_number() OVER (PARTITION BY tgt_id ORDER BY cosine DESC, corpus_id) AS rank FROM bs),
          |bwd AS (SELECT tgt_id, cosine FROM br WHERE rank <= 8),
          |sn AS (SELECT src_id, sum(cosine::DECIMAL(10,6)) AS ssum, count(*) AS nx FROM fwd GROUP BY 1),
          |tn AS (SELECT tgt_id, sum(cosine::DECIMAL(10,6)) AS tsum, count(*) AS ny FROM bwd GROUP BY 1),
          |m AS (SELECT f.src_id, f.tgt_id, f.cosine,
          |  round(f.cosine / ((sn.ssum::DOUBLE / nx + tn.tsum::DOUBLE / ny) / 2.0), 6) AS margin
          |  FROM fwd f JOIN sn USING (src_id) JOIN tn USING (tgt_id)),
          |r AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rank FROM m)
          |SELECT src_id, tgt_id, cosine, margin FROM r WHERE rank = 1 AND margin >= 1.0""".stripMargin),
    // mirrors bruteForceTopKInt8: same integer codes as q_quantize,
    // integer dot/norms are exact in doubles (≤ 127²·64 ≪ 2⁵³)
    "q_ann_int8" ->
      """WITH z AS (SELECT vec_id,
        |  list_max(list_transform(embedding, x -> abs(x))) AS scale, embedding FROM embeddings),
        |qz AS (SELECT vec_id, CASE WHEN scale = 0
        |    THEN list_transform(embedding, x -> 0.0::DOUBLE)
        |    ELSE list_transform(embedding, x -> round(x::DOUBLE * 127 / scale::DOUBLE)) END AS qv
        |  FROM z),
        |q AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, qv AS cq FROM qz),
        |s AS (SELECT query_id, corpus_id,
        |  CASE WHEN list_dot_product(cq, cq) = 0 OR list_dot_product(qq, qq) = 0 THEN NULL
        |    ELSE round(list_dot_product(cq, qq) /
        |      (sqrt(list_dot_product(cq, cq)) * sqrt(list_dot_product(qq, qq))), 6) END AS cosine
        |  FROM c, q),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s)
        |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM r WHERE rank <= 10""".stripMargin,
    // both tiers' CTEs composed, then the recall metric itself
    "q_ann_recall" ->
      (s"""WITH fq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
          |fc AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
          |fs AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM fc, fq),
          |fr AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM fs),
          |exact AS (SELECT query_id, corpus_id FROM fr WHERE rank <= 10),
          |z AS (SELECT vec_id,
          |  list_max(list_transform(embedding, x -> abs(x))) AS scale, embedding FROM embeddings),
          |qz AS (SELECT vec_id, CASE WHEN scale = 0
          |    THEN list_transform(embedding, x -> 0.0::DOUBLE)
          |    ELSE list_transform(embedding, x -> round(x::DOUBLE * 127 / scale::DOUBLE)) END AS qv
          |  FROM z),
          |iq AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 5),
          |ic AS (SELECT vec_id AS corpus_id, qv AS cq FROM qz),
          |s8 AS (SELECT query_id, corpus_id,
          |  CASE WHEN list_dot_product(cq, cq) = 0 OR list_dot_product(qq, qq) = 0 THEN NULL
          |    ELSE round(list_dot_product(cq, qq) /
          |      (sqrt(list_dot_product(cq, cq)) * sqrt(list_dot_product(qq, qq))), 6) END AS cosine
          |  FROM ic, iq),
          |r8 AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s8),
          |approx AS (SELECT query_id, corpus_id FROM r8 WHERE rank <= 10),
          |tot AS (SELECT count(DISTINCT query_id) AS n_queries, count(*)::BIGINT AS n_exact FROM exact),
          |mt AS (SELECT count(*)::BIGINT AS n_matched FROM exact JOIN approx USING (query_id, corpus_id))
          |SELECT n_queries, n_exact, n_matched,
          |  round(n_matched / n_exact::DOUBLE, 6) AS recall FROM tot, mt""".stripMargin),
    // mirrors packSignBits: bit i set iff element i > 0 (bit 63 needs
    // the MinValue literal — DuckDB parses -9223372036854775808 as
    // HUGEINT-then-negate, and 1::BIGINT << 63 overflows)
    "q_ann_hamming" ->
      """WITH codes AS (SELECT vec_id,
        |  bit_or(CASE WHEN x > 0 THEN
        |    (CASE WHEN i - 1 = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |     ELSE 1::BIGINT << (i - 1) END)
        |    ELSE 0 END) AS code
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |        generate_subscripts(embedding, 1) AS i FROM embeddings)
        |  GROUP BY 1),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |  bit_count(xor(c.code, q.code))::INT AS hamming
        |  FROM codes c, (SELECT * FROM codes WHERE vec_id < 5) q),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming, corpus_id) AS rank FROM s)
        |SELECT query_id, corpus_id, hamming, rank::INT AS rank FROM r WHERE rank <= 10""".stripMargin,
    // mirrors cascadeTopK: the q_ann_hamming codes CTE shortlists 50,
    // the q_ann_int8 codes CTE reranks to 20, float cosine ranks the
    // final 10 — each tier's kernel is bit-identical to its
    // stand-alone oracle (rows 62/63/69)
    "q_ann_cascade" ->
      (s"""WITH codes AS (SELECT vec_id,
          |  bit_or(CASE WHEN x > 0 THEN
          |    (CASE WHEN i - 1 = 63 THEN (-9223372036854775807 - 1)::BIGINT
          |     ELSE 1::BIGINT << (i - 1) END)
          |    ELSE 0 END) AS code
          |  FROM (SELECT vec_id, unnest(embedding) AS x,
          |        generate_subscripts(embedding, 1) AS i FROM embeddings)
          |  GROUP BY 1),
          |hs AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
          |  bit_count(xor(c.code, q.code))::INT AS hamming
          |  FROM codes c, (SELECT * FROM codes WHERE vec_id < 5) q),
          |hr AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY hamming, corpus_id) AS r FROM hs),
          |short AS (SELECT query_id, corpus_id FROM hr WHERE r <= 50),
          |z AS (SELECT vec_id,
          |  list_max(list_transform(embedding, x -> abs(x))) AS scale, embedding FROM embeddings),
          |qz AS (SELECT vec_id, CASE WHEN scale = 0
          |    THEN list_transform(embedding, x -> 0.0::DOUBLE)
          |    ELSE list_transform(embedding, x -> round(x::DOUBLE * 127 / scale::DOUBLE)) END AS qv
          |  FROM z),
          |i8 AS (SELECT s.query_id, s.corpus_id,
          |  CASE WHEN list_dot_product(c.qv, c.qv) = 0 OR list_dot_product(q.qv, q.qv) = 0 THEN NULL
          |    ELSE round(list_dot_product(c.qv, q.qv) /
          |      (sqrt(list_dot_product(c.qv, c.qv)) * sqrt(list_dot_product(q.qv, q.qv))), 6) END AS cos8
          |  FROM short s JOIN qz c ON c.vec_id = s.corpus_id JOIN qz q ON q.vec_id = s.query_id),
          |ir AS (SELECT query_id, corpus_id,
          |  row_number() OVER (PARTITION BY query_id ORDER BY cos8 DESC, corpus_id) AS r FROM i8),
          |keep AS (SELECT query_id, corpus_id FROM ir WHERE r <= 20),
          |fv AS (SELECT s.query_id, s.corpus_id, c.embedding AS cv, q.embedding AS qv2
          |  FROM keep s JOIN embeddings c ON c.vec_id = s.corpus_id
          |  JOIN embeddings q ON q.vec_id = s.query_id),
          |fs AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv2")}, 6) AS cosine FROM fv),
          |fr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM fs)
          |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM fr WHERE rank <= 10""".stripMargin),
    "q_ann_lsh" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, ${bucketSql("embedding", 64, 6)} AS bucket
          |  FROM embeddings WHERE vec_id < 5),
          |c AS (SELECT vec_id AS corpus_id, embedding AS cv, ${bucketSql("embedding", 64, 6)} AS bucket FROM embeddings),
          |s AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine FROM c JOIN q USING (bucket)),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s)
          |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM r WHERE rank <= 10""".stripMargin),
    "q_ann_ivf" -> ivfOracleSql,
    // the q_ann_ivf replay at fetchK=30, then the DPR exclusion:
    // self + same-label pairs anti-joined out, re-ranked to 10
    "q_hard_negatives" ->
      (s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 100 = 0),
          |ca AS (SELECT vec_id AS corpus_id, embedding AS cv, cid,
          |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
          |  FROM embeddings, cen),
          |caf AS (SELECT corpus_id, cv, cid FROM ca WHERE rn = 1),
          |qa AS (SELECT vec_id AS query_id, embedding AS qv, cid,
          |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
          |  FROM embeddings, cen WHERE vec_id < 5),
          |qaf AS (SELECT query_id, qv, cid FROM qa WHERE rn <= 2),
          |s AS (SELECT query_id, corpus_id, round(${cosSql("cv", "qv")}, 6) AS cosine
          |  FROM caf JOIN qaf USING (cid)),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM s),
          |cand AS (SELECT query_id, corpus_id, cosine FROM r WHERE rank <= 30),
          |pos AS (SELECT DISTINCT a.vec_id AS query_id, c.vec_id AS corpus_id
          |  FROM embeddings a JOIN embeddings c ON a.label = c.label
          |  WHERE a.vec_id < 5),
          |neg AS (SELECT query_id, corpus_id, cosine FROM cand
          |  WHERE query_id <> corpus_id
          |    AND NOT EXISTS (SELECT 1 FROM pos
          |      WHERE pos.query_id = cand.query_id AND pos.corpus_id = cand.corpus_id)),
          |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank FROM neg)
          |SELECT query_id, corpus_id, cosine, rank::INT AS rank FROM rr WHERE rank <= 10""".stripMargin),
    // identical contract: the persisted-index path must reproduce
    // ivfTopK exactly
    "q_ann_ivf_index" -> ivfOracleSql,
    "q_ann_filtered_ivf" -> ivfOracle("vec_id % 100 = 0", Seq("label")),
    // centroids frozen to the build slice: appended (vec_id % 300 = 0)
    // rows are searchable but never centroids
    "q_ann_ivf_append" -> ivfOracle("vec_id % 100 = 0 AND vec_id % 300 <> 0"),
    "q_lang_id" ->
      {
        // mirror of languageId: kana > hangul > cjk > arabic script,
        // then the StopwordHitsAll.Langs vote in declaration order
        val langs = graft.functions.StopwordHitsAll.Langs
        val scoreCols = langs.map(l =>
          s"  len(list_filter(tk, t -> list_contains(${swListSql(l)}, t))) AS s_$l")
          .mkString(",\n|")
        val gr = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val pick = langs.map(l => s"  WHEN s_$l = $gr THEN '$l'").mkString("\n|")
        s"""WITH s AS (SELECT doc_id,
           |  len(regexp_extract_all(text, '[\\x{3040}-\\x{30ff}]')) AS kana,
           |  len(regexp_extract_all(text, '[\\x{ac00}-\\x{d7af}\\x{1100}-\\x{11ff}]')) AS hangul,
           |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk,
           |  len(regexp_extract_all(text, '[\\x{0600}-\\x{06ff}]')) AS arab,
           |  regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM documents),
           |v AS (SELECT doc_id, kana, hangul, cjk, arab,
           |$scoreCols FROM s)
           |SELECT doc_id, CASE WHEN kana > 0 THEN 'ja' WHEN hangul > 0 THEN 'ko'
           |  WHEN cjk > 0 THEN 'zh' WHEN arab > 0 THEN 'fa'
           |  WHEN $gr <= 0 THEN 'und'
           |$pick
           |  ELSE 'und' END AS lang_pred FROM v""".stripMargin
      },
    "q_lang_conf" -> langConfOracle(gate = false),
    "q_lang_conf_gate" -> langConfOracle(gate = true),
    "q_quality_score" ->
      (s"""WITH s AS (SELECT doc_id, length(text)::DOUBLE AS nc,
          |  regexp_split_to_array(trim(lower(text)), '\\s+') AS tk,
          |  len(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE AS alpha FROM documents),
          |v AS (SELECT doc_id, nc, alpha, len(tk)::DOUBLE AS nt,
          |  len(list_filter(tk, t -> list_contains(${swListSql("en")}, t)))::DOUBLE AS sh FROM s),
          |w AS (SELECT doc_id,
          |  CASE WHEN nc >= 200 AND nc <= 10000 THEN 1.0 WHEN nc >= 50 THEN 0.5 ELSE 0.0 END AS len_score,
          |  CASE WHEN nc > 0 THEN alpha / nc ELSE 0.0 END AS alpha_ratio,
          |  CASE WHEN nt > 0 THEN sh / nt ELSE 0.0 END AS stop_ratio,
          |  CASE WHEN nt > 0 THEN (nc - (nt - 1)) / nt ELSE 0.0 END AS mwl FROM v)
          |SELECT doc_id, round(0.3 * len_score + 0.3 * alpha_ratio
          |  + 0.2 * least(stop_ratio * 5, 1.0)
          |  + 0.2 * (CASE WHEN mwl >= 3 AND mwl <= 12 THEN 1.0 ELSE 0.3 END), 4) AS quality
          |FROM w""".stripMargin),
    "q_token_count" ->
      """SELECT doc_id,
        |  (CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |    ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END)::INT AS n_ws,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))::INT AS n_bpe
        |FROM documents""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '))), ' ')) AS fp
        |FROM documents""".stripMargin,
    "q_sample" -> {
      def keep(frac: Double) =
        s"(strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':7'), 1, 1)) - 1) * 4096 + " +
          s"(strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':7'), 2, 1)) - 1) * 256 + " +
          s"(strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':7'), 3, 1)) - 1) * 16 + " +
          s"(strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':7'), 4, 1)) - 1) < ${math.floor(frac * 65536).toInt}"
      s"""SELECT doc_id, lang FROM documents
         |WHERE (lang = 'en' AND ${keep(0.5)})
         |   OR (lang = 'fr' AND ${keep(0.25)})
         |   OR (lang = 'zh' AND ${keep(1.0)})""".stripMargin
    },
    // mirrors VectorFunctions.quantize8: float max-abs scale, then
    // round-half-away(127·v/scale) per component, same op order
    "q_quantize" ->
      """WITH m AS (SELECT vec_id,
        |  list_max(list_transform(embedding, x -> abs(x))) AS scale, embedding
        |  FROM embeddings),
        |e AS (SELECT vec_id, scale,
        |  unnest(embedding) AS v, generate_subscripts(embedding, 1) - 1 AS pos FROM m)
        |SELECT vec_id, scale, pos::INT AS pos,
        |  (CASE WHEN scale = 0 THEN 0
        |    ELSE round(v::DOUBLE * 127 / scale::DOUBLE) END)::TINYINT AS qv
        |FROM e""".stripMargin,
    // mirrors Sampling.rebalanceToDistribution: fractions computed IN
    // SQL from the same counts, same expression order (n/s, then
    // least(1, s·m/n), then floor(·65536)) for bit-identical doubles
    "q_rebalance" -> {
      val hex = "strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':0'), %d, 1)) - 1"
      val keepVal = s"(${hex.format(1)}) * 4096 + (${hex.format(2)}) * 256 + " +
        s"(${hex.format(3)}) * 16 + (${hex.format(4)})"
      s"""WITH sh(lang, s) AS (SELECT * FROM (VALUES
         |    ('en', 0.5::DOUBLE), ('es', 0.25::DOUBLE), ('fr', 0.25::DOUBLE))),
         |c AS (SELECT lang, count(*)::BIGINT AS n FROM documents
         |  WHERE lang IN ('en', 'es', 'fr') GROUP BY 1),
         |j AS (SELECT sh.lang, sh.s, c.n FROM sh JOIN c USING (lang)),
         |m AS (SELECT min(n / s) AS m FROM j),
         |f AS (SELECT lang,
         |  floor(least(1.0::DOUBLE, s * (SELECT m FROM m) / n) * 65536)::INT AS thr FROM j)
         |SELECT doc_id, lang FROM documents JOIN f USING (lang)
         |WHERE $keepVal < thr""".stripMargin
    },
    "q_split" -> {
      // 0.75/0.125/0.125 → exact cumulative thresholds 49152/57344.
      val hex = "strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || ':7'), %d, 1)) - 1"
      val h = s"(${hex.format(1)}) * 4096 + (${hex.format(2)}) * 256 + " +
        s"(${hex.format(3)}) * 16 + (${hex.format(4)})"
      s"""SELECT doc_id,
         |  CASE WHEN $h < 49152 THEN 'train'
         |       WHEN $h < 57344 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },
    "q_split_cluster" -> {
      // Clusters via the SHARED clusterLabelCtes chain (identical to
      // q_dedup_clusters, singletons self-keyed), then the q_split
      // hash thresholds applied to the CLUSTER label, not the doc id.
      val h = h16Sql("ck::VARCHAR || ':7'")
      s"""WITH RECURSIVE $minhashCtes,
         |$clusterLabelCtes,
         |m AS (SELECT d.doc_id, coalesce(l.label, d.doc_id) AS ck
         |  FROM docs d LEFT JOIN lab l ON d.doc_id = l.id)
         |SELECT doc_id,
         |  CASE WHEN $h < 49152 THEN 'train'
         |       WHEN $h < 57344 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM m""".stripMargin
    },
    "q_cap_stratum" ->
      """WITH r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(doc_id::VARCHAR || ':0'), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 60""".stripMargin,
    "q_quantiles" ->
      """SELECT 'l_quantity' AS "column", unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]) AS prob,
        |  round(unnest(quantile_cont(l_quantity::DOUBLE, [0.25, 0.5, 0.75, 0.95])), 4) AS quantile FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]),
        |  round(unnest(quantile_cont(l_extendedprice::DOUBLE, [0.25, 0.5, 0.75, 0.95])), 4) FROM lineitem
        |UNION ALL SELECT 'l_discount', unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]),
        |  round(unnest(quantile_cont(l_discount::DOUBLE, [0.25, 0.5, 0.75, 0.95])), 4) FROM lineitem""".stripMargin,
    // the sketch key's CHECKED ≤1% rank-error bound (round-16 upgrade
    // from rows-only): the Spark side computes exact integer ranks of
    // its own sketch outputs; the oracle pins the expected all-true
    // grid, so an out-of-bound sketch hashes red in the driver replay
    "q_quantiles_approx" ->
      """SELECT 'l_quantity' AS "column", unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]) AS prob, true AS within_bound
        |UNION ALL SELECT 'l_extendedprice', unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]), true
        |UNION ALL SELECT 'l_discount', unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]), true""".stripMargin,
    "q_profile" ->
      """WITH e AS (SELECT user_id, nullif(event_type, 'error') AS et, value FROM events)
        |SELECT 'user_id' AS "column", count(*)::BIGINT AS n_rows,
        |  sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
        |  count(DISTINCT user_id)::BIGINT AS n_distinct FROM e
        |UNION ALL SELECT 'et', count(*)::BIGINT,
        |  sum(CASE WHEN et IS NULL THEN 1 ELSE 0 END)::BIGINT, count(DISTINCT et)::BIGINT FROM e
        |UNION ALL SELECT 'value', count(*)::BIGINT,
        |  sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT, count(DISTINCT value)::BIGINT FROM e""".stripMargin,
    // 2 Lloyd passes: assign to stride-sampled centroids, re-mean
    // each cluster per position (rounded 6 dp, matching
    // kmeansAssignments' update), re-assign. Argmax ties break to the
    // lowest centroid id on both sides.
    "q_kmeans" ->
      s"""WITH st AS (SELECT CAST(ceil(count(*) / 200.0) AS BIGINT) AS stride FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings, st WHERE vec_id % stride = 0),
         |a1 AS (SELECT vec_id, embedding, cid,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
         |  FROM embeddings, c0),
         |a1f AS (SELECT vec_id, embedding, cid FROM a1 WHERE rn = 1),
         |px AS (SELECT cid, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS pos FROM a1f),
         |pm AS (SELECT cid, pos, round(avg(x::DOUBLE), 6) AS m FROM px GROUP BY 1, 2),
         |c1 AS (SELECT cid, list(m ORDER BY pos) AS cvec FROM pm GROUP BY 1),
         |a2 AS (SELECT vec_id, cid, round(${cosSql("embedding", "cvec")}, 6) AS cosine,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
         |  FROM embeddings, c1)
         |SELECT vec_id, cid AS cluster, cosine FROM a2 WHERE rn = 1""".stripMargin,
    // The q_kmeans fit chain with scrambled seeds → final member
    // assignment → probe ranking on UNROUNDED cosine (top nprobe=4) →
    // exact within-cluster rank on the ROUNDED cosine (see
    // clusterRoutedOracle).
    "q_ann_cluster_routed" -> clusterRoutedOracle(),
    // the persisted fit must equal the from-scratch call exactly
    "q_ann_kmeans_index" -> clusterRoutedOracle(),
    // fit on the base slice only; the batch assigns to the FROZEN
    // fitted centroids (never seeds, never updates them)
    "q_ann_kmeans_append" -> clusterRoutedOracle(
      basePred = "vec_id % 300 <> 0", batchPred = "vec_id % 300 = 0"),
    "q_semdedup" ->
      s"""WITH $embWithDupsSql,
         |cen AS (SELECT vec_id AS cid, embedding AS cvec FROM emb WHERE vec_id % 100 = 0),
         |a AS (SELECT vec_id, embedding, cid,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "cvec")} DESC, cid) AS rn
         |  FROM emb, cen),
         |af AS (SELECT vec_id, embedding, cid FROM a WHERE rn = 1),
         |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |  round(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
         |  FROM af x JOIN af y USING (cid) WHERE x.vec_id < y.vec_id)
         |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.9""".stripMargin,
    // Mirrors TextAnalysis.lmScore (topV=20, addK=1): vocab cut by
    // (count DESC, token ASC), OOV → '<unk>', V = |vocab| + 1.
    "q_lm_score" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |un AS (SELECT unnest(w) AS t FROM tk),
        |uc AS (SELECT t, count(*) AS c FROM un GROUP BY 1),
        |voc AS (SELECT t FROM uc ORDER BY c DESC, t LIMIT 20),
        |vsz AS (SELECT (count(*) + 1)::DOUBLE AS v FROM voc),
        |mu AS (SELECT CASE WHEN t IN (SELECT t FROM voc) THEN t ELSE '<unk>' END AS m1 FROM un),
        |c1 AS (SELECT m1, count(*) AS cu FROM mu GROUP BY 1),
        |bgx AS (SELECT doc_id, unnest(list_transform(range(0, len(w) - 1),
        |    i -> {'a': w[i + 1], 'b': w[i + 2]})) AS p FROM tk WHERE len(w) >= 2),
        |bg AS (SELECT doc_id,
        |  CASE WHEN p.a IN (SELECT t FROM voc) THEN p.a ELSE '<unk>' END AS m1,
        |  CASE WHEN p.b IN (SELECT t FROM voc) THEN p.b ELSE '<unk>' END AS m2 FROM bgx),
        |c12 AS (SELECT m1, m2, count(*) AS cb FROM bg GROUP BY 1, 2),
        |sc AS (SELECT doc_id, ln((cb + 1.0) / (cu + 1.0 * v)) AS lp
        |  FROM bg JOIN c12 USING (m1, m2) JOIN c1 USING (m1), vsz),
        |ag AS (SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 4) AS avg_logprob
        |  FROM sc GROUP BY 1)
        |SELECT d.doc_id, coalesce(ag.n_bigrams, 0)::BIGINT AS n_bigrams, ag.avg_logprob
        |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin,
    // CCNet bucket replay: the q_lm_score chain, then per-lang
    // tercile thresholds (6 dp) and the same ascending CASE chain.
    // Cut-point literals are the exact Scala doubles 1.0/3 and 2.0/3.
    "q_ccnet_buckets" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |un AS (SELECT unnest(w) AS t FROM tk),
        |uc AS (SELECT t, count(*) AS c FROM un GROUP BY 1),
        |voc AS (SELECT t FROM uc ORDER BY c DESC, t LIMIT 20),
        |vsz AS (SELECT (count(*) + 1)::DOUBLE AS v FROM voc),
        |mu AS (SELECT CASE WHEN t IN (SELECT t FROM voc) THEN t ELSE '<unk>' END AS m1 FROM un),
        |c1 AS (SELECT m1, count(*) AS cu FROM mu GROUP BY 1),
        |bgx AS (SELECT doc_id, unnest(list_transform(range(0, len(w) - 1),
        |    i -> {'a': w[i + 1], 'b': w[i + 2]})) AS p FROM tk WHERE len(w) >= 2),
        |bg AS (SELECT doc_id,
        |  CASE WHEN p.a IN (SELECT t FROM voc) THEN p.a ELSE '<unk>' END AS m1,
        |  CASE WHEN p.b IN (SELECT t FROM voc) THEN p.b ELSE '<unk>' END AS m2 FROM bgx),
        |c12 AS (SELECT m1, m2, count(*) AS cb FROM bg GROUP BY 1, 2),
        |sc AS (SELECT doc_id, ln((cb + 1.0) / (cu + 1.0 * v)) AS lp
        |  FROM bg JOIN c12 USING (m1, m2) JOIN c1 USING (m1), vsz),
        |ag AS (SELECT doc_id, round(avg(lp), 4) AS avg_logprob FROM sc GROUP BY 1),
        |s AS (SELECT d.doc_id, d.lang, ag.avg_logprob AS lp
        |  FROM documents d LEFT JOIN ag USING (doc_id)),
        |thr AS (SELECT lang,
        |  round(quantile_cont(lp, 0.3333333333333333), 6) AS t1,
        |  round(quantile_cont(lp, 0.6666666666666666), 6) AS t2
        |  FROM s GROUP BY 1)
        |SELECT s.doc_id, s.lang, s.lp AS avg_logprob,
        |  CASE WHEN s.lp IS NULL THEN NULL
        |    WHEN s.lp <= t1 THEN 'tail'
        |    WHEN s.lp <= t2 THEN 'middle'
        |    ELSE 'head' END AS bucket
        |FROM s JOIN thr USING (lang)""".stripMargin,
    // trigram twin: same vocab/count tables, interpolated
    // λ·P3 + (1−λ)·P2 per trigram position, λ = 0.5
    "q_lm_score3" ->
      """WITH tk AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |un AS (SELECT unnest(w) AS t FROM tk),
        |uc AS (SELECT t, count(*) AS c FROM un GROUP BY 1),
        |voc AS MATERIALIZED (SELECT t FROM uc ORDER BY c DESC, t LIMIT 20),
        |vsz AS (SELECT (count(*) + 1)::DOUBLE AS v FROM voc),
        |mu AS (SELECT CASE WHEN t IN (SELECT t FROM voc) THEN t ELSE '<unk>' END AS m1 FROM un),
        |c1 AS MATERIALIZED (SELECT m1, count(*) AS cu FROM mu GROUP BY 1),
        |bgx AS (SELECT unnest(list_transform(range(0, len(w) - 1),
        |    i -> {'a': w[i + 1], 'b': w[i + 2]})) AS p FROM tk WHERE len(w) >= 2),
        |bg AS (SELECT
        |  CASE WHEN p.a IN (SELECT t FROM voc) THEN p.a ELSE '<unk>' END AS m1,
        |  CASE WHEN p.b IN (SELECT t FROM voc) THEN p.b ELSE '<unk>' END AS m2 FROM bgx),
        |c12 AS MATERIALIZED (SELECT m1, m2, count(*) AS cb FROM bg GROUP BY 1, 2),
        |tgx AS (SELECT doc_id, unnest(list_transform(range(0, len(w) - 2),
        |    i -> {'a': w[i + 1], 'b': w[i + 2], 'c': w[i + 3]})) AS p FROM tk WHERE len(w) >= 3),
        |tg AS MATERIALIZED (SELECT doc_id,
        |  CASE WHEN p.a IN (SELECT t FROM voc) THEN p.a ELSE '<unk>' END AS m1,
        |  CASE WHEN p.b IN (SELECT t FROM voc) THEN p.b ELSE '<unk>' END AS m2,
        |  CASE WHEN p.c IN (SELECT t FROM voc) THEN p.c ELSE '<unk>' END AS m3 FROM tgx),
        |c123 AS MATERIALIZED (SELECT m1, m2, m3, count(*) AS ct FROM tg GROUP BY 1, 2, 3),
        |sc AS (SELECT tg.doc_id,
        |    ln(0.5 * (ct + 1.0) / (b12.cb + 1.0 * v) +
        |       0.5 * (b23.cb + 1.0) / (c1.cu + 1.0 * v)) AS lp
        |  FROM tg JOIN c123 USING (m1, m2, m3)
        |  JOIN c12 b12 ON b12.m1 = tg.m1 AND b12.m2 = tg.m2
        |  JOIN c12 b23 ON b23.m1 = tg.m2 AND b23.m2 = tg.m3
        |  JOIN c1 ON c1.m1 = tg.m2, vsz),
        |ag AS (SELECT doc_id, count(*) AS n_trigrams, round(avg(lp), 4) AS avg_logprob
        |  FROM sc GROUP BY 1)
        |SELECT d.doc_id, coalesce(ag.n_trigrams, 0)::BIGINT AS n_trigrams, ag.avg_logprob
        |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin,
    "q_dup_ngrams" ->
      s"""WITH $docsWithDupsSql,
         |tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM docs),
         |gr AS (SELECT doc_id, md5(unnest(CASE WHEN len(w) >= 5
         |  THEN list_distinct(list_transform(range(0, len(w) - 4),
         |    i -> array_to_string(w[(i + 1):(i + 5)], ' ')))
         |  ELSE [array_to_string(w, ' ')] END)) AS g FROM tk),
         |gc AS (SELECT g, count(*) AS ndocs FROM gr GROUP BY 1)
         |SELECT doc_id, count(*) AS n_grams,
         |  round(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS dup_ngram_frac
         |FROM gr JOIN gc USING (g) GROUP BY 1""".stripMargin,
    // Span-removal apply: RAW (case-preserving) tokens; a token is cut
    // iff covered by a shared-gram occurrence whose keeper (min doc
    // id) is another document; untouched docs keep text verbatim.
    "q_remove_spans" ->
      s"""WITH $docsWithDupsSql,
         |tk AS (SELECT doc_id, text,
         |  list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS w FROM docs),
         |oc AS (SELECT doc_id, unnest(range(0, len(w) - 4)) AS s, w FROM tk WHERE len(w) >= 5),
         |occ AS (SELECT doc_id, s, array_to_string(w[(s + 1):(s + 5)], ' ') AS g FROM oc),
         |st AS (SELECT g, count(DISTINCT doc_id) AS nd, min(doc_id) AS keeper FROM occ GROUP BY 1),
         |cuts AS (SELECT o.doc_id, o.s FROM occ o JOIN st USING (g)
         |  WHERE st.nd >= 2 AND o.doc_id <> st.keeper),
         |cd AS (SELECT DISTINCT doc_id FROM cuts),
         |tok AS (SELECT doc_id, unnest(range(0, len(w))) AS i, w FROM tk
         |  WHERE doc_id IN (SELECT doc_id FROM cd)),
         |kept AS (SELECT t.doc_id, t.i, t.w[t.i + 1] AS tkn FROM tok t
         |  WHERE NOT EXISTS (SELECT 1 FROM cuts c
         |    WHERE c.doc_id = t.doc_id AND t.i >= c.s AND t.i < c.s + 5)),
         |reb AS (SELECT doc_id, string_agg(tkn, ' ' ORDER BY i) AS text FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN cd.doc_id IS NOT NULL THEN coalesce(r.text, '') ELSE d.text END AS text
         |FROM docs d LEFT JOIN cd ON d.doc_id = cd.doc_id
         |LEFT JOIN reb r ON d.doc_id = r.doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tc FROM tk GROUP BY 1, 2),
        |tfl AS (SELECT *, sum(tc) OVER (PARTITION BY doc_id) AS dlen FROM tf),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS dfc FROM tk GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
        |s AS (SELECT doc_id, term,
        |  (tc::DOUBLE / dlen) * (ln((nd + 1)::DOUBLE / (dfc + 1)) + 1) AS tfidf
        |  FROM tfl JOIN dfq USING (term), n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank FROM s)
        |SELECT doc_id, term, round(tfidf, 6) AS tfidf, rank::INT AS rank FROM r WHERE rank <= 5""".stripMargin,
    "q_redact" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact team-a@example.org or https://ex.org/p?q=1' ||
        |  ' call +1 555-123-4567 or (415) 555.0100 from 10.0.0.1 now' AS t2 FROM documents)
        |SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t2,
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '(\+\d{1,2}[ .-]?)?(\(\d{3}\)[ .-]?|\b\d{3}[ .-])\d{3}[ .-]\d{4}\b', '<PHONE>', 'g'))
        |    AS redacted_md5,
        |  len(regexp_extract_all(t2, 'https?://[^\s]+'))::BIGINT AS n_urls
        |FROM t""".stripMargin,
    // Exact stripHtml chain replay: same RE2∩Java regexes, same
    // literal entity replaces in the same order (&amp; last).
    "q_html_text" ->
      """WITH h AS (SELECT doc_id,
        |  '<!DOCTYPE html><html><head><style>p{color:red}</style>' ||
        |  '<script>var x = 1 < 2 && 3 > 2;</script></head><body><h1>T&amp;C ' ||
        |  doc_id::VARCHAR || '</h1><!-- hidden --><p>' || text ||
        |  ' &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</p></body></html>' AS html
        |  FROM documents),
        |x AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |  '(?s)<!--.*?-->', ' ', 'g'),
        |  '(?s)<[A-Za-z!/][^>]*>', ' ', 'g') AS t1 FROM h),
        |e AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(
        |  replace(replace(t1, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |  '&apos;', ''''), '&#39;', ''''), '&#34;', '"'), '&nbsp;', ' '),
        |  '&amp;', '&') AS t2 FROM x),
        |c AS (SELECT doc_id, trim(regexp_replace(t2, '\s+', ' ', 'g')) AS t3 FROM e)
        |SELECT doc_id, md5(t3) AS text_md5, length(t3)::BIGINT AS n_chars
        |FROM c""".stripMargin,
    // PII-count replay: same injected snippet, same redact ladder —
    // count each class with regexp_extract_all on the text with the
    // earlier classes already replaced.
    "q_redact_stats" ->
      """WITH a AS (SELECT doc_id, text || repeat(' ping admin@ex.org or https://ex.org/d?x=2 from 10.1.2.3 call (415) 555.0100', CAST(doc_id % 3 AS INT)) AS t FROM documents),
        |r0 AS (SELECT doc_id, len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_url,
        |  regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS t1 FROM a),
        |r1 AS (SELECT doc_id, n_url, len(regexp_extract_all(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  regexp_replace(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t2 FROM r0),
        |r2 AS (SELECT doc_id, n_url, n_email, len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |  regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t3 FROM r1),
        |r3 AS (SELECT doc_id, n_url, n_email, n_ip,
        |  len(regexp_extract_all(t3, '(\+\d{1,2}[ .-]?)?(\(\d{3}\)[ .-]?|\b\d{3}[ .-])\d{3}[ .-]\d{4}\b')) AS n_phone FROM r2)
        |SELECT doc_id, n_url::BIGINT AS n_url, n_email::BIGINT AS n_email,
        |  n_ip::BIGINT AS n_ip, n_phone::BIGINT AS n_phone,
        |  (n_url + n_email + n_ip + n_phone) > 0 AS has_pii
        |FROM r3""".stripMargin,
    "q_fix_encoding" -> {
      val fixed = fixEncodingSqlChain(s"text || ${sqlQ(dirtySuffix)}")
      s"""WITH f AS (SELECT doc_id, $fixed AS t FROM documents)
         |SELECT doc_id, md5(t) AS text_md5, length(t)::BIGINT AS n_chars
         |FROM f""".stripMargin
    },
    "q_crawl_clean" -> {
      val html = "'<html><head><script>if (1 < 2) x();</script></head><body><p>' || " +
        s"text || ${sqlQ(dirtySuffix)} || ' &amp; <!-- c --> tail</p></body></html>'"
      val cleaned = stripHtmlSqlChain(fixEncodingSqlChain(html))
      s"""WITH f AS (SELECT doc_id, $cleaned AS t FROM documents)
         |SELECT doc_id, md5(t) AS text_md5, length(t)::BIGINT AS n_chars
         |FROM f""".stripMargin
    },
    // the q_crawl_clean chain → the q_quality_flags algebra over the
    // CLEANED text → keep-min-id exact dedup — each fragment verbatim
    // from its stand-alone oracle
    "q_curation_e2e" -> {
      val html = "'<html><head><script>if (1 < 2) x();</script></head><body><p>' || " +
        s"text || ${sqlQ(dirtySuffix)} || ' &amp; <!-- c --> tail</p></body></html>'"
      val cleaned = stripHtmlSqlChain(fixEncodingSqlChain(html))
      s"""WITH f AS (SELECT doc_id, $cleaned AS t FROM documents),
         |tk AS (SELECT doc_id, t,
         |  regexp_split_to_array(trim(lower(t)), '\\s+') AS tks FROM f),
         |s AS (SELECT doc_id, t,
         |  CASE WHEN trim(t) = '' THEN 0 ELSE len(tks) END AS n_words,
         |  length(array_to_string(tks, '')) AS alpha_len,
         |  (length(t) - length(regexp_replace(t, '[#|{}\\[\\]<>]', '', 'g')))::DOUBLE
         |    / length(t) AS sr FROM tk),
         |m AS (SELECT doc_id, t, n_words,
         |  CASE WHEN n_words > 0 THEN alpha_len::DOUBLE / n_words END AS ml, sr FROM s),
         |gate AS (SELECT doc_id, t, n_words FROM m
         |  WHERE n_words BETWEEN 20 AND 100000 AND ml BETWEEN 3.0 AND 10.0 AND sr <= 0.1),
         |d AS (SELECT doc_id, md5(t) AS text_md5, n_words,
         |  row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn FROM gate)
         |SELECT doc_id, text_md5, n_words::INT AS n_words FROM d WHERE rn = 1""".stripMargin
    },
    "q_quality_flags" ->
      """WITH tk AS (SELECT doc_id, text,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS tks FROM documents),
        |s AS (SELECT doc_id, text,
        |  CASE WHEN trim(text) = '' THEN 0 ELSE len(tks) END AS n_words,
        |  length(array_to_string(tks, '')) AS alpha_len,
        |  (length(text) - length(regexp_replace(text, '[#|{}\[\]<>]', '', 'g')))::DOUBLE
        |    / length(text) AS sr FROM tk),
        |m AS (SELECT doc_id, n_words,
        |  CASE WHEN n_words > 0 THEN alpha_len::DOUBLE / n_words END AS ml, sr FROM s)
        |SELECT doc_id, n_words::INT AS n_words, round(ml, 4) AS mean_word_len,
        |  round(sr, 4) AS symbol_ratio,
        |  (n_words BETWEEN 20 AND 100000 AND ml BETWEEN 3.0 AND 10.0 AND sr <= 0.1) AS pass
        |FROM m""".stripMargin,
    // list_filter((x, i) -> list_position(lines, x) = i) keeps first
    // occurrences in order — exactly Spark's array_distinct.
    "q_dedup_lines" ->
      """WITH t AS (SELECT doc_id,
        |  text || chr(10) || text || chr(10) || substr(text, 1, 50) AS t2 FROM documents),
        |s AS (SELECT doc_id, string_split(t2, chr(10)) AS lines FROM t)
        |SELECT doc_id,
        |  md5(array_to_string(list_filter(lines, (x, i) -> list_position(lines, x) = i), chr(10))) AS cleaned_md5,
        |  (len(lines) - len(list_distinct(lines)))::BIGINT AS n_dropped
        |FROM s""".stripMargin,
    // same token-count totals (max(len-2, 1) — duplicates counted)
    // and h60-hashed distinct grams, one double division
    "q_diversity" ->
      (s"""WITH tk AS (SELECT lang, regexp_split_to_array(trim(text), '\\s+') AS tks
          |  FROM documents WHERE text IS NOT NULL),
          |tot AS (SELECT lang, count(*)::BIGINT AS n_docs,
          |    sum(greatest(len(tks) - 2, 1))::BIGINT AS total_ngrams FROM tk GROUP BY 1),
          |sh AS (SELECT lang, CASE WHEN len(tks) >= 3
          |  THEN list_distinct(list_transform(range(0, len(tks) - 2),
          |    i -> ${(1 to 3).map(j => s"tks[i + $j]").mkString(" || ' ' || ")}))
          |  ELSE [array_to_string(tks, ' ')] END AS s FROM tk),
          |d AS (SELECT lang, unnest(s) AS gram FROM sh),
          |dd AS (SELECT lang, count(DISTINCT ${h60Sql("gram")})::BIGINT AS distinct_ngrams
          |  FROM d GROUP BY 1)
          |SELECT lang, n_docs, total_ngrams,
          |  coalesce(distinct_ngrams, 0) AS distinct_ngrams,
          |  round(coalesce(distinct_ngrams, 0)::DOUBLE / total_ngrams::DOUBLE, 6)
          |    AS distinct_ratio
          |FROM tot LEFT JOIN dd USING (lang)""".stripMargin),
    // same 8-gram shingles and the h60 gram hashes on BOTH sides —
    // a (vanishingly unlikely) 60-bit collision would replay
    // identically in both engines
    "q_novelty" ->
      (s"""WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tks
          |  FROM documents WHERE text IS NOT NULL),
          |sh AS (SELECT doc_id, CASE WHEN len(tks) >= 8
          |  THEN list_distinct(list_transform(range(0, len(tks) - 7),
          |    i -> ${(1 to 8).map(j => s"tks[i + $j]").mkString(" || ' ' || ")}))
          |  ELSE [array_to_string(tks, ' ')] END AS s FROM tk),
          |d AS (SELECT doc_id, unnest(s) AS gram FROM sh),
          |dh AS (SELECT doc_id, ${h60Sql("gram")} AS h FROM d),
          |r AS (SELECT DISTINCT ${h60Sql("gram")} AS h FROM
          |  (SELECT unnest(s) AS gram FROM sh WHERE doc_id % 2 = 0) rr)
          |SELECT doc_id, count(*)::BIGINT AS n_grams,
          |  sum(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_seen,
          |  round(1.0::DOUBLE - sum(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
          |    / count(*)::DOUBLE, 6) AS novelty
          |FROM dh LEFT JOIN r USING (h) GROUP BY 1""".stripMargin),
    "q_contamination" ->
      (s"""WITH $docsWithDupsSql,
          |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tks FROM docs),
          |sh AS (SELECT doc_id, CASE WHEN len(tks) >= 13
          |  THEN list_distinct(list_transform(range(0, len(tks) - 12),
          |    i -> ${(1 to 13).map(j => s"tks[i + $j]").mkString(" || ' ' || ")}))
          |  ELSE [array_to_string(tks, ' ')] END AS s FROM tk),
          |b AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 100 = 0 AND doc_id < 1000000),
          |d AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id >= 1000000)
          |SELECT d.doc_id, count(*)::BIGINT AS n_hits FROM d JOIN b USING (gram) GROUP BY 1""".stripMargin),
    "q_contamination_bloom" ->
      (s"""WITH $docsWithDupsSql,
          |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tks FROM docs),
          |sh AS (SELECT doc_id, CASE WHEN len(tks) >= 13
          |  THEN list_distinct(list_transform(range(0, len(tks) - 12),
          |    i -> ${(1 to 13).map(j => s"tks[i + $j]").mkString(" || ' ' || ")}))
          |  ELSE [array_to_string(tks, ' ')] END AS s FROM tk),
          |b AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 100 = 0 AND doc_id < 1000000),
          |d AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id >= 1000000)
          |SELECT d.doc_id, count(*)::BIGINT AS n_hits FROM d JOIN b USING (gram) GROUP BY 1""".stripMargin),
    "q_decontaminate" ->
      (s"""WITH $docsWithDupsSql,
          |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tks FROM docs),
          |sh AS (SELECT doc_id, CASE WHEN len(tks) >= 13
          |  THEN list_distinct(list_transform(range(0, len(tks) - 12),
          |    i -> ${(1 to 13).map(j => s"tks[i + $j]").mkString(" || ' ' || ")}))
          |  ELSE [array_to_string(tks, ' ')] END AS s FROM tk),
          |b AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 100 = 0 AND doc_id < 1000000),
          |hits AS (SELECT d.doc_id FROM (SELECT doc_id, unnest(s) AS gram FROM sh) d
          |  JOIN b USING (gram) GROUP BY 1 HAVING count(*) >= 1)
          |SELECT doc_id, lang, source, n_chars FROM docs
          |WHERE doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin),
    "q_extract_urls" ->
      """WITH t AS (SELECT doc_id, CASE WHEN doc_id % 5 = 4 THEN text
        |  ELSE text || ' see https://ex.org/d/' || doc_id::VARCHAR ||
        |    (CASE WHEN doc_id % 3 = 0
        |      THEN ' and http://a.io/p?id=' || doc_id::VARCHAR || '&x=1' ELSE '' END) ||
        |    ' end' END AS t2 FROM documents),
        |u AS (SELECT doc_id, regexp_extract_all(t2, 'https?://[^\s]+') AS urls FROM t)
        |SELECT doc_id, len(urls)::BIGINT AS n_urls,
        |  coalesce(array_to_string(urls, '|'), '') AS urls_joined FROM u""".stripMargin,
    // the identical 5 unrolled PageRank iterations: 6 dp-rounded
    // per-edge contributions summed in DECIMAL(18,6), uniform
    // dangling redistribution, (1.0 − 0.85) spelled as the SAME
    // double subtraction Scala computes (a 0.15 literal parses to a
    // different ulp)
    "q_pagerank" -> pageRankOracle(iters = 5),
    "q_hits" -> hitsOracle(iters = 5),
    // triangleStats replay: same canonical edges, same (degree, id)
    // row-value orientation, same root-wedge closure; row comparisons
    // are the struct order both engines share
    "q_triangles" ->
      """WITH raw AS (
        |  SELECT 'h' || (doc_id % 40)::VARCHAR AS s,
        |         'h' || ((doc_id * 3 + 7) % 40)::VARCHAR AS d FROM documents
        |  UNION ALL
        |  SELECT 'h' || (doc_id % 40)::VARCHAR,
        |         'h' || ((doc_id * 7 + 11) % 40)::VARCHAR
        |  FROM documents WHERE doc_id % 2 = 0),
        |und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        |  FROM raw WHERE s <> d AND s IS NOT NULL AND d IS NOT NULL),
        |deg AS (SELECT n, count(*)::BIGINT AS dg FROM (
        |    SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |wd AS (SELECT und.a, und.b, da.dg AS da, db.dg AS db
        |  FROM und JOIN deg da ON da.n = und.a JOIN deg db ON db.n = und.b),
        |ori AS (SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS u,
        |               CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS v FROM wd),
        |tri AS (SELECT count(*)::BIGINT AS n_triangles FROM (
        |    SELECT least(e1.v, e2.v) AS a, greatest(e1.v, e2.v) AS b
        |    FROM ori e1 JOIN ori e2 ON e1.u = e2.u AND e1.v < e2.v) w
        |  JOIN und USING (a, b)),
        |base AS (SELECT count(*)::BIGINT AS n_edges FROM und),
        |nn AS (SELECT count(*)::BIGINT AS n_nodes,
        |  coalesce(sum(dg * (dg - 1) // 2), 0)::BIGINT AS n_wedges FROM deg)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  round(CASE WHEN n_wedges > 0
        |    THEN 3.0::DOUBLE * n_triangles / n_wedges END, 6) AS global_clustering
        |FROM nn, base, tri""".stripMargin,
    // same normalization + both-orientation degree join; HUGEINT
    // moments, each sqrt factor to DOUBLE before the root
    "q_assortativity" ->
      """WITH raw AS (
        |  SELECT 'h' || (doc_id % 40)::VARCHAR AS s,
        |         'h' || ((doc_id * 3 + 7) % 40)::VARCHAR AS d FROM documents
        |  UNION ALL
        |  SELECT 'h' || (doc_id % 40)::VARCHAR,
        |         'h' || ((doc_id * 7 + 11) % 40)::VARCHAR
        |  FROM documents WHERE doc_id % 2 = 0),
        |und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        |  FROM raw WHERE s <> d AND s IS NOT NULL AND d IS NOT NULL),
        |deg AS (SELECT n, count(*)::HUGEINT AS dg FROM (
        |    SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |bo AS (SELECT u, v FROM (
        |    SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und)),
        |j AS (SELECT du.dg AS du, dv.dg AS dv
        |  FROM bo JOIN deg du ON du.n = bo.u JOIN deg dv ON dv.n = bo.v),
        |m AS (SELECT count(*)::HUGEINT AS k, sum(du)::HUGEINT AS sx,
        |    sum(dv)::HUGEINT AS sy, sum(du*du)::HUGEINT AS sxx,
        |    sum(dv*dv)::HUGEINT AS syy, sum(du*dv)::HUGEINT AS sxy FROM j),
        |nn AS (SELECT count(*)::BIGINT AS n_nodes FROM deg),
        |base AS (SELECT count(*)::BIGINT AS n_edges FROM und)
        |SELECT n_nodes, n_edges,
        |  CASE WHEN (k*sxx - sx*sx) > 0 AND (k*syy - sy*sy) > 0 THEN
        |    round((k*sxy - sx*sy)::DOUBLE /
        |      (sqrt((k*sxx - sx*sx)::DOUBLE) * sqrt((k*syy - sy*sy)::DOUBLE)), 6)
        |  END AS assortativity
        |FROM m, nn, base""".stripMargin,
    "q_label_propagate" -> labelPropOracle(iters = 3),
    // the q_scd2 history CTEs + the covering-interval filter at v2
    "q_snapshot_asof" ->
      """WITH ch AS (
        |  SELECT doc_id, text, lang, 1::BIGINT AS version FROM documents
        |  UNION ALL SELECT doc_id, text || ' v2', lang, 2 FROM documents
        |    WHERE doc_id % 10 = 4
        |  UNION ALL SELECT doc_id, text, lang, 2 FROM documents
        |    WHERE doc_id % 10 = 7
        |  UNION ALL SELECT doc_id, text || ' v3', lang, 3 FROM documents
        |    WHERE doc_id % 10 = 4 AND doc_id % 3 = 0),
        |f AS (SELECT *, md5(concat_ws(chr(1), coalesce(text, chr(0)),
        |    coalesce(lang, chr(0)))) AS fp FROM ch),
        |k AS (SELECT * FROM (SELECT f.*, lag(fp) OVER
        |    (PARTITION BY doc_id ORDER BY version) AS pfp FROM f)
        |  WHERE pfp IS NULL OR pfp <> fp),
        |h AS (SELECT doc_id, text, lang, version AS valid_from,
        |    lead(version) OVER (PARTITION BY doc_id ORDER BY version) AS valid_to
        |  FROM k)
        |SELECT doc_id, text, lang FROM h
        |WHERE valid_from <= 2 AND (valid_to IS NULL OR valid_to > 2)""".stripMargin,
    "q_domain_stats" ->
      """WITH t AS (SELECT doc_id, CASE WHEN doc_id % 5 = 4 THEN text
        |  ELSE text || ' via https://d' || (doc_id % 50)::VARCHAR ||
        |    '.ex.org/p/' || doc_id::VARCHAR || ' end' END AS t2 FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(t2, 'https?://[^\s]+')) AS url FROM t),
        |h AS (SELECT doc_id, regexp_extract(url, 'https?://([^/\s:?#]+)', 1) AS host FROM u)
        |SELECT host, count(*)::BIGINT AS n_urls,
        |  count(DISTINCT doc_id)::BIGINT AS n_docs FROM h GROUP BY 1""".stripMargin,
    "q_pack" ->
      """WITH t AS (SELECT doc_id,
        |  CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |    ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS tokens
        |  FROM documents),
        |c AS (SELECT doc_id, tokens::BIGINT AS tokens,
        |  sum(tokens) OVER (ORDER BY doc_id) AS cum FROM t)
        |SELECT doc_id, tokens, (cum - tokens)::BIGINT AS start_offset,
        |  (CASE WHEN tokens > 0 THEN (cum - tokens) // 512 END)::BIGINT AS first_seq,
        |  (CASE WHEN tokens > 0 THEN (cum - 1) // 512 END)::BIGINT AS last_seq,
        |  coalesce(CASE WHEN tokens > 0
        |    THEN (cum - 1) // 512 - (cum - tokens) // 512 + 1 END, 0)::BIGINT AS n_seqs
        |FROM c""".stripMargin,
    "q_bpe_train" -> bpeTrainOracle(16),
    // chunk text decode: symbols are identity on this ASCII corpus
    // except Ġ (the byte-level space marker)
    "q_chunk_bpe" ->
      s"""WITH $bpeOracleCtes,
         |btoks AS (SELECT p.doc_id, flatten(list(c.l ORDER BY p.i)) AS toks
         |  FROM bpos p JOIN s12 c
         |  ON c.unit = CASE WHEN p.i = 1 THEN p.ws[p.i] ELSE 'Ġ' || p.ws[p.i] END
         |  GROUP BY 1),
         |bch AS (SELECT doc_id, toks,
         |  unnest(range(0, greatest(1, ceil(len(toks) / 8.0)::INT))) AS chunk_idx FROM btoks)
         |SELECT doc_id, chunk_idx::INT AS chunk_idx,
         |  replace(array_to_string(toks[(chunk_idx * 8 + 1):(chunk_idx * 8 + 8)], ''), 'Ġ', ' ') AS chunk_text
         |FROM bch""".stripMargin,
    "q_unigram_train" -> unigramTrainOracle(
      numMulti = 16, emRounds = 2, maxPieceLen = 6, maxUnitLen = 16),
    // whitespace words vs BOTH subword replays (BPE merge loop +
    // unigram Viterbi DP), per language, exact integer sums
    "q_unigram_fertility" ->
      s"""WITH $bpeOracleCtes,
         |$unigramEncodeCtes,
         |wt AS (SELECT doc_id, lang, CASE WHEN text IS NULL OR trim(text) = '' THEN 0
         |  ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS w
         |  FROM documents),
         |j AS (SELECT wt.lang, wt.w, coalesce(b.tokens, 0) AS tb, coalesce(u.tokens, 0) AS tu
         |  FROM wt LEFT JOIN bdtok b USING (doc_id) LEFT JOIN udtok u USING (doc_id))
         |SELECT lang, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS n_words,
         |  sum(tb)::BIGINT AS n_tokens_bpe, sum(tu)::BIGINT AS n_tokens_unigram,
         |  round(sum(tb)::DOUBLE / sum(w), 4) AS fertility_bpe,
         |  round(sum(tu)::DOUBLE / sum(w), 4) AS fertility_unigram
         |FROM j GROUP BY 1""".stripMargin,
    // q_chunk_bpe's window replay over the unigram DP segmentations
    "q_unigram_chunk" ->
      s"""WITH $unigramEncodeCtes,
         |utoks AS (SELECT p.doc_id, flatten(list(c.seg ORDER BY p.i)) AS toks
         |  FROM epos p JOIN eucnt c
         |  ON c.unit = CASE WHEN p.i = 1 THEN p.ws[p.i] ELSE 'Ġ' || p.ws[p.i] END
         |  GROUP BY 1),
         |uch AS (SELECT doc_id, toks,
         |  unnest(range(0, greatest(1, ceil(len(toks) / 8.0)::INT))) AS chunk_idx FROM utoks)
         |SELECT doc_id, chunk_idx::INT AS chunk_idx,
         |  replace(array_to_string(toks[(chunk_idx * 8 + 1):(chunk_idx * 8 + 8)], ''), 'Ġ', ' ') AS chunk_text
         |FROM uch""".stripMargin,
    // q_pack_bpe's prefix-sum replay over the unigram DP counts
    "q_pack_unigram" ->
      s"""WITH $unigramEncodeCtes,
         |t AS (SELECT d.doc_id, coalesce(k.tokens, 0)::BIGINT AS tokens
         |  FROM documents d LEFT JOIN udtok k USING (doc_id)),
         |c AS (SELECT doc_id, tokens, sum(tokens) OVER (ORDER BY doc_id) AS cum FROM t)
         |SELECT doc_id, tokens, (cum - tokens)::BIGINT AS start_offset,
         |  (CASE WHEN tokens > 0 THEN (cum - tokens) // 512 END)::BIGINT AS first_seq,
         |  (CASE WHEN tokens > 0 THEN (cum - 1) // 512 END)::BIGINT AS last_seq,
         |  coalesce(CASE WHEN tokens > 0
         |    THEN (cum - 1) // 512 - (cum - tokens) // 512 + 1 END, 0)::BIGINT AS n_seqs
         |FROM c""".stripMargin,
    "q_pack_bpe" ->
      s"""WITH $bpeOracleCtes,
         |t AS (SELECT d.doc_id, coalesce(k.tokens, 0)::BIGINT AS tokens
         |  FROM documents d LEFT JOIN bdtok k USING (doc_id)),
         |c AS (SELECT doc_id, tokens, sum(tokens) OVER (ORDER BY doc_id) AS cum FROM t)
         |SELECT doc_id, tokens, (cum - tokens)::BIGINT AS start_offset,
         |  (CASE WHEN tokens > 0 THEN (cum - tokens) // 512 END)::BIGINT AS first_seq,
         |  (CASE WHEN tokens > 0 THEN (cum - 1) // 512 END)::BIGINT AS last_seq,
         |  coalesce(CASE WHEN tokens > 0
         |    THEN (cum - 1) // 512 - (cum - tokens) // 512 + 1 END, 0)::BIGINT AS n_seqs
         |FROM c""".stripMargin,
    // full id-stream replay: symbols → vocab ids per doc in order,
    // cumulative offsets over doc_id order, tokens regrouped by
    // global-offset // 512, partial tail dropped — div/mod rebuild
    "q_pack_shards" ->
      s"""WITH $bpeOracleCtes,
         |$bpeVocabCte,
         |dtoks AS (SELECT p.doc_id, p.i, c.l FROM bpos p JOIN s12 c
         |  ON c.unit = CASE WHEN p.i = 1 THEN p.ws[p.i] ELSE 'Ġ' || p.ws[p.i] END),
         |dsym AS (SELECT doc_id, i, unnest(l) AS sym, generate_subscripts(l, 1) AS j FROM dtoks),
         |dids AS (SELECT doc_id, list(coalesce(v.id, -1) ORDER BY i, j) AS ids
         |  FROM dsym LEFT JOIN bpe_vocab v ON v.sym = dsym.sym GROUP BY 1),
         |c AS (SELECT doc_id, ids, len(ids)::BIGINT AS tokens,
         |  sum(len(ids)) OVER (ORDER BY doc_id) AS cum FROM dids),
         |g AS (SELECT cum - tokens + generate_subscripts(ids, 1) - 1 AS goff,
         |  unnest(ids) AS tid FROM c),
         |sq AS (SELECT (goff // 512)::BIGINT AS seq_id, list(tid ORDER BY goff) AS tids FROM g GROUP BY 1)
         |SELECT seq_id, (seq_id // 64)::BIGINT AS shard, len(tids)::BIGINT AS n_tokens,
         |  array_to_string(list_transform(tids, x -> x::VARCHAR), ' ') AS ids_joined
         |FROM sq WHERE len(tids) = 512""".stripMargin,
    "q_upsample" ->
      """SELECT doc_id, lang,
        |  unnest(generate_series(0, (doc_id % 4)::BIGINT - 1)) AS rep
        |FROM documents WHERE doc_id % 4 > 0""".stripMargin,
    "q_center" -> {
      val meanList = centerMeans.mkString(", ")
      s"""WITH u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS x,
         |  generate_subscripts(embedding, 1) - 1 AS pos FROM embeddings),
         |mm AS (SELECT unnest([$meanList])::DOUBLE AS m,
         |  generate_subscripts([$meanList], 1) - 1 AS pos)
         |SELECT vec_id, pos::INT AS pos, x - m AS cv
         |FROM u JOIN mm USING (pos)""".stripMargin
    },
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type, value FROM events),
        |c AS (SELECT event_id, user_id, ms, value FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ms, value FROM e WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ms AS ts_ms,
        |  p.ms AS purchase_ts, p.value AS purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ms >= p.ms""".stripMargin,
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type FROM events),
        |v AS (SELECT event_id, user_id, ms FROM e WHERE event_type = 'view'),
        |w AS (SELECT user_id, ms AS w_start, ms + 3600000 AS w_end FROM e WHERE event_type = 'purchase')
        |SELECT v.event_id, v.user_id, v.ms AS ts_ms, w.w_start
        |FROM v JOIN w ON v.user_id = w.user_id AND v.ms BETWEEN w.w_start AND w.w_end""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, 'image' AS kind, octet_length(encode(text))::BIGINT AS size_bytes,
        |  md5(text) AS checksum
        |FROM documents""".stripMargin,
    // Closed-form twin of the ImageIO round trip (Multimodal.scala:
    // wrap-free affine pixels → exact integer channel sums):
    //   sum_ch = W·H·base + a·H·W(W−1)/2 + b·W·H(H−1)/2
    "q_multimodal_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h
        |  FROM documents)
        |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
        |  round((w*h*(doc_id % 128) + 3*h*(w*(w-1)//2) + 5*w*(h*(h-1)//2)) / (w*h)::DOUBLE, 4) AS mean_r,
        |  round((w*h*((3*doc_id) % 100) + 2*h*(w*(w-1)//2) + 4*w*(h*(h-1)//2)) / (w*h)::DOUBLE, 4) AS mean_g,
        |  round((w*h*((5*doc_id) % 150) + 1*h*(w*(w-1)//2) + 1*w*(h*(h-1)//2)) / (w*h)::DOUBLE, 4) AS mean_b
        |FROM d""".stripMargin,
    // per-pixel unnest replay (floor-luma is not closed-form): the
    // same affine channels, the same integer floor luma, exact
    // BIGINT S/Q sums and the identical n/n^2 divisions
    "q_image_luma" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h, x.x AS x, y.y AS y
        |  FROM d, LATERAL (SELECT unnest(range(0, w)) AS x) x,
        |          LATERAL (SELECT unnest(range(0, h)) AS y) y),
        |lm AS (SELECT doc_id, w, h,
        |  (299 * (doc_id % 128 + 3*x + 5*y) + 587 * ((3*doc_id) % 100 + 2*x + 4*y)
        |    + 114 * ((5*doc_id) % 150 + x + y)) // 1000 AS lum FROM px),
        |ag AS (SELECT doc_id, w, h, w*h AS n,
        |  sum(lum)::BIGINT AS s, sum(lum*lum)::BIGINT AS q
        |  FROM lm GROUP BY 1, 2, 3),
        |fin AS (SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
        |  round(s / n::DOUBLE, 6) AS mean_luma,
        |  round((n*q - s*s) / (n::DOUBLE * n), 6) AS var_luma FROM ag)
        |SELECT doc_id, width, height, mean_luma, var_luma,
        |  var_luma < 10.0::DOUBLE AS is_flat FROM fin""".stripMargin,
    // GVID directory-walk twin: the synthesis arithmetic is the
    // contract (a walk that miscounts or a header echo of a
    // truncated file goes red)
    "q_video_meta" ->
      """SELECT doc_id, (3 + doc_id % 4)::BIGINT AS n_frames,
        |  (2 + doc_id % 29)::BIGINT AS fps FROM documents""".stripMargin,
    // per-frame twin of q_multimodal_decode: the channel bases
    // advance inside their modulus per frame (wrap-free pixels), so
    // each sampled frame's exact mean is the same closed form with
    // the f-offset base
    "q_video_frames" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h,
        |    3 + doc_id % 4 AS nf FROM documents),
        |fr AS (SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS f FROM d)
        |SELECT doc_id, f::BIGINT AS frame_idx, w::BIGINT AS width, h::BIGINT AS height,
        |  round((w*h*((doc_id + 17*f) % 128) + 3*h*(w*(w-1)//2) + 5*w*(h*(h-1)//2)) / (w*h)::DOUBLE, 4) AS mean_r,
        |  round((w*h*((3*doc_id + 29*f) % 100) + 2*h*(w*(w-1)//2) + 4*w*(h*(h-1)//2)) / (w*h)::DOUBLE, 4) AS mean_g,
        |  round((w*h*((5*doc_id + 31*f) % 150) + 1*h*(w*(w-1)//2) + 1*w*(h*(h-1)//2)) / (w*h)::DOUBLE, 4) AS mean_b
        |FROM fr""".stripMargin,
    // scene-cut twin in EXACT integer milli-luma: the gradient terms
    // cancel in the frame-to-frame delta, leaving only the modular
    // base advances; |delta| lands in {8.5..33.1} (no cut) or
    // {50.2..88.3} (cut) — ≥ 7 luma units from the 40 threshold, so
    // the Spark side's double luma diff can never disagree
    "q_video_scenes" ->
      """WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf FROM documents),
        |fr AS (SELECT doc_id, unnest(range(1, nf)) AS f FROM d),
        |del AS (SELECT doc_id,
        |    299*(((doc_id + 17*f) % 128) - ((doc_id + 17*(f-1)) % 128))
        |  + 587*(((3*doc_id + 29*f) % 100) - ((3*doc_id + 29*(f-1)) % 100))
        |  + 114*(((5*doc_id + 31*f) % 150) - ((5*doc_id + 31*(f-1)) % 150)) AS dmilli
        |  FROM fr)
        |SELECT d.doc_id, d.nf::BIGINT AS n_frames,
        |  coalesce(sum(CASE WHEN abs(dmilli) > 40000 THEN 1 ELSE 0 END), 0)::BIGINT AS n_cuts
        |FROM d LEFT JOIN del ON d.doc_id = del.doc_id
        |GROUP BY 1, 2""".stripMargin,
    // the pairing CTEs + the keep-smallest anti-join
    "q_video_dedup_apply" ->
      (s"""WITH $videoDhashDiverseCtes,
          |bk AS (SELECT f, sig FROM hx GROUP BY 1, 2
          |  HAVING count(*) BETWEEN 2 AND 1000),
          |hk AS (SELECT hx.* FROM hx JOIN bk USING (f, sig)),
          |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS matched
          |  FROM hk a JOIN hk b ON a.f = b.f AND a.sig = b.sig
          |    AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |p AS (SELECT id_b FROM m
          |  JOIN nf na ON na.doc_id = id_a JOIN nf nb ON nb.doc_id = id_b
          |  WHERE round(matched / greatest(na.n, nb.n)::DOUBLE, 4) >= 0.5)
          |SELECT doc_id, lang, source FROM documents
          |WHERE doc_id NOT IN (SELECT id_b FROM p)""".stripMargin),
    // dHash twin: per (y, x) grid cell the floor-NN luma is
    // closed-form over the affine pixels; adjacent-cell compare gives
    // bit i = y·8+x, summed into two 32-bit halves → hex. Identical
    // integer arithmetic to Multimodal.dHash. (Shared CTE chain:
    // dhashCtes, also the base of q_multimodal_dhash_pairs.)
    "q_multimodal_dhash" ->
      s"""WITH $dhashCtes
         |SELECT doc_id, printf('%08x%08x', hi, lo) AS dhash FROM agg""".stripMargin,
    // hammingPairs64 twin: 4×16-bit chunk blocking with the 2..1000
    // bucket-size keep window, pairs verified by exact two-half
    // Hamming — the same arithmetic as Dedup.hammingPairs64.
    "q_multimodal_dhash_pairs" -> hamming64PairsSql(dhashDiverseCtes),
    // aligned-pairing replay over the frame-level diverse hashes:
    // one row per matched (position, sig), counted per pair
    "q_video_dhash_pairs" ->
      (s"""WITH $videoDhashDiverseCtes,
          |bk AS (SELECT f, sig FROM hx GROUP BY 1, 2
          |  HAVING count(*) BETWEEN 2 AND 1000),
          |hk AS (SELECT hx.* FROM hx JOIN bk USING (f, sig)),
          |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS matched
          |  FROM hk a JOIN hk b ON a.f = b.f AND a.sig = b.sig
          |    AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT id_a, id_b, na.n AS n_a, nb.n AS n_b, matched,
          |  round(matched / greatest(na.n, nb.n)::DOUBLE, 4) AS match_frac
          |FROM m JOIN nf na ON na.doc_id = id_a JOIN nf nb ON nb.doc_id = id_b
          |WHERE round(matched / greatest(na.n, nb.n)::DOUBLE, 4) >= 0.5""".stripMargin),
    "q_audio_hash" ->
      s"""WITH $ahashCtes
         |SELECT doc_id, printf('%08x%08x', hi, lo) AS ahash FROM agg""".stripMargin,
    "q_audio_hash_pairs" -> hamming64PairsSql(ahashCtes),
    // NN-resample twin: dst(x,y) = src(⌊x·w/8⌋, ⌊y·h/8⌋) over the
    // wrap-free affine pattern; exact integer sums over the 8×8 grid
    "q_multimodal_resize" ->
      """WITH d AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h
        |  FROM documents),
        |g AS (SELECT doc_id,
        |  (doc_id % 128) + 3 * ((x * w) // 8) + 5 * ((y * h) // 8) AS r,
        |  ((3 * doc_id) % 100) + 2 * ((x * w) // 8) + 4 * ((y * h) // 8) AS gg,
        |  ((5 * doc_id) % 150) + ((x * w) // 8) + ((y * h) // 8) AS b
        |  FROM d, range(8) xs(x), range(8) ys(y))
        |SELECT doc_id, 8::BIGINT AS width, 8::BIGINT AS height,
        |  round(avg(r), 4) AS mean_r, round(avg(gg), 4) AS mean_g,
        |  round(avg(b), 4) AS mean_b
        |FROM g GROUP BY 1""".stripMargin,
    // full resampled-stream replay: m = ⌈n·12000/8000⌉ output
    // samples, each the integer linear interpolation
    // s(i0) + ⌊8·((i1%16)−(i0%16))·frac/12000⌋ with i0 = ⌊j·8000/
    // 12000⌋ and i1 clamped to n−1. DuckDB integer `//` TRUNCATES
    // toward zero (−7//2 = −3), so Math.floorDiv is spelled out as
    // (num − pmod(num, den)) // den on the possibly-negative term
    "q_audio_resample" ->
      """WITH par AS (SELECT doc_id, 4*(doc_id % 256) - 512 AS base,
        |    160 + 16*(doc_id % 5) AS n FROM documents),
        |idx AS (SELECT doc_id, base, n, (n * 12000 + 7999) // 8000 AS m FROM par),
        |js AS (SELECT doc_id, base, n, m, unnest(generate_series(0, m - 1)) AS j FROM idx),
        |p AS (SELECT doc_id, base, n, m, (j*8000) // 12000 AS i0, (j*8000) % 12000 AS fr FROM js),
        |nm AS (SELECT doc_id, base, m, i0,
        |    8*((least(i0 + 1, n - 1) % 16) - (i0 % 16)) * fr AS num FROM p),
        |v AS (SELECT doc_id, m,
        |    base + 8*(i0 % 16) + (num - ((num % 12000 + 12000) % 12000)) // 12000 AS val
        |  FROM nm)
        |SELECT doc_id, m::BIGINT AS n_samples, 12000::BIGINT AS sample_rate,
        |  round(sum(val)::DOUBLE / m, 6) AS mean_amp
        |FROM v GROUP BY doc_id, m""".stripMargin,
    // peak = max(|base|, |base+120|) in closed form; each of the 16
    // sample residues scales by ⌊s·30000/peak⌋ and appears n/16
    // times — the 16-row replay is exact. Same spelled-out floor
    // division (DuckDB `//` truncates on negatives)
    "q_audio_normalize" ->
      """WITH par AS (SELECT doc_id, 4*(doc_id % 256) - 512 AS base,
        |    160 + 16*(doc_id % 5) AS n FROM documents),
        |pk AS (SELECT doc_id, base, n,
        |    greatest(abs(base), abs(base + 120)) AS peak FROM par),
        |r AS (SELECT doc_id, base, n, peak, unnest(generate_series(0, 15)) AS rr FROM pk),
        |nm AS (SELECT doc_id, n, peak, (base + 8*rr) * 30000 AS num FROM r),
        |v AS (SELECT doc_id, n, (num - ((num % peak + peak) % peak)) // peak AS val FROM nm)
        |SELECT doc_id, n::BIGINT AS n_samples, 8000::BIGINT AS sample_rate,
        |  round((sum(val) * (n // 16))::DOUBLE / n, 6) AS mean_amp
        |FROM v GROUP BY doc_id, n""".stripMargin,
    // the resample replay chained through per-doc peak → spelled-out
    // floor-div scaling → the aHash window-energy bit rule over the
    // m resampled frames → the same two-half hex packing
    "q_audio_pipeline" ->
      """WITH par AS (SELECT doc_id, 4*(doc_id % 256) - 512 AS base,
        |    160 + 16*(doc_id % 5) AS n FROM documents),
        |idx AS (SELECT doc_id, base, n, (n * 12000 + 7999) // 8000 AS m FROM par),
        |js AS (SELECT doc_id, base, n, m, unnest(generate_series(0, m - 1)) AS j FROM idx),
        |p AS (SELECT doc_id, base, n, m, j, (j*8000) // 12000 AS i0, (j*8000) % 12000 AS fr FROM js),
        |nm AS (SELECT doc_id, base, m, j, i0,
        |    8*((least(i0 + 1, n - 1) % 16) - (i0 % 16)) * fr AS num FROM p),
        |rv AS (SELECT doc_id, m, j,
        |    base + 8*(i0 % 16) + (num - ((num % 12000 + 12000) % 12000)) // 12000 AS val
        |  FROM nm),
        |pk AS (SELECT doc_id, max(abs(val)) AS peak FROM rv GROUP BY 1),
        |nz AS (SELECT rv.doc_id, m, j,
        |    (val * 30000 - (((val * 30000) % peak + peak) % peak)) // peak AS val
        |  FROM rv JOIN pk USING (doc_id)),
        |sm AS (SELECT doc_id, m, (j * 64) // m AS w, abs(val) AS a FROM nz),
        |wn AS (SELECT doc_id, m, w, sum(a) AS sw, count(*) AS cw FROM sm GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, sum(sw) AS s FROM wn GROUP BY 1),
        |bits AS (SELECT wn.doc_id, w::INT AS i,
        |    CASE WHEN sw * m > s * cw THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM wn JOIN tot USING (doc_id)),
        |agg AS (SELECT doc_id,
        |    sum(CASE WHEN i >= 32 THEN bit << (i - 32) ELSE 0 END)::BIGINT AS hi,
        |    sum(CASE WHEN i < 32 THEN bit << i ELSE 0 END)::BIGINT AS lo
        |  FROM bits GROUP BY 1)
        |SELECT doc_id, printf('%08x%08x', hi, lo) AS ahash FROM agg""".stripMargin,
    // WAV twin: s(i) = 4·(id%256) + 8·(i mod 16) − 512 over a
    // multiple-of-16 sample count → mean = 4·(id%256) + 60 − 512.
    // the 16-residue sample model collapsed: every residue occurs
    // n/16 times, so counts/sums scale by n//16; same double
    // divisions and one sqrt at the boundary
    "q_audio_stats" ->
      """WITH par AS (SELECT doc_id, 4*(doc_id % 256) - 512 AS base,
        |    160 + 16*(doc_id % 5) AS n FROM documents),
        |r AS (SELECT doc_id, base, n, unnest(generate_series(0, 15)) AS rr FROM par),
        |v AS (SELECT doc_id, n, abs(base + 8*rr) AS a FROM r),
        |g AS (SELECT doc_id, n, max(a) AS peak,
        |    sum(CASE WHEN a <= 32 THEN 1 ELSE 0 END) AS sil,
        |    sum(CASE WHEN a >= 500 THEN 1 ELSE 0 END) AS clip,
        |    sum(a*a) AS q FROM v GROUP BY 1, 2)
        |SELECT doc_id, n::BIGINT AS n_samples, peak::BIGINT AS peak,
        |  round((sil * (n // 16))::DOUBLE / n, 6) AS silence_ratio,
        |  round((clip * (n // 16))::DOUBLE / n, 6) AS clip_ratio,
        |  round(sqrt((q * (n // 16))::DOUBLE / n), 6) AS rms
        |FROM g""".stripMargin,
    "q_multimodal_audio" ->
      """SELECT doc_id,
        |  (160 + 16*(doc_id % 5))::BIGINT AS n_samples,
        |  8000::BIGINT AS sample_rate,
        |  round((4*(doc_id % 256) + 60 - 512)::DOUBLE, 4) AS mean_amp
        |FROM documents""".stripMargin)
}
