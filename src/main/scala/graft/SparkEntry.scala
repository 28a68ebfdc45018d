package graft

import graft.functions.ColumnFunctions._
import graft.functions.TextFunctions._
import graft.implicits._
import graft.operators.{DataFrameOps, Dedup, Similarity, TrendLine}
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

  /** Read a test table. `events.ts` is a nanosecond parquet timestamp
    * (unsupported natively) — read as long nanos and exposed as
    * `ts_ms` (epoch millis, matching DuckDB's `epoch_ms(ts)`).
    */
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/events.parquet")
        .withColumn("ts_ms", expr("ts div 1000000"))
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------- §2.1 column functions
    "q_percent" -> ((s, dir) => {
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("pct", percent(col("cnt")))
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
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          col("c_nationkey"),
          col("cnt"),
          cumulativePercent(col("cnt"), col("c_nationkey")).as("cum_pct"))
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
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("rev"))
        .select(
          col("o_orderstatus"),
          col("o_orderpriority"),
          round(col("rev"), 2).as("rev_r"),
          cubePercent(col("rev"), Seq(col("o_orderstatus"), col("o_orderpriority"))).as("pct"))
    }),
    "q_moving_avg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          col("date"),
          col("cnt"),
          movingAverage(col("cnt"), col("date"), 7, "center", 2).as("mavg7"))
    }),
    // ------------------------------------------------- §2.1 text functions
    "q_number_normalizer" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        numberNormalizer(persianNumber(col("o_orderkey"))).as("normal"))
    }),
    "q_persian_number" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        persianNumber(col("o_orderkey")).as("fa_num"))
    }),
    "q_text_cleaner" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        textCleaner(concat(col("text"), lit(" ۱۲۳!!abc❤"))).as("cleaned"))
    }),
    "q_jalali_date" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(jalaliDate(col("o_orderdate")).as("jdate"))
        .agg(count(lit(1)).as("cnt"))
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
      // rows-only check: output schema depends on data values
      val byRegion = t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("n_regionkey"))
      DataFrameOps.transpose(byRegion, "n_regionkey")
    }))

  def oracleSql: Map[String, String] = Map(
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
        |spine AS (SELECT unnest(generate_series(d0, d1 + INTERVAL 7 DAY, INTERVAL 1 DAY))::DATE AS date FROM bounds),
        |fit AS (SELECT s.date, coalesce(daily.cnt, 0) AS y,
        |  date_diff('day', (SELECT d0 FROM bounds), s.date)::DOUBLE AS x
        |  FROM spine s LEFT JOIN daily USING (date)),
        |m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(x * x) AS sxx,
        |  sum(y) AS sy, sum(x * y) AS sxy FROM fit),
        |beta AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1,
        |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b0 FROM m)
        |SELECT f.date, d.cnt, round(b0 + b1 * f.x, 2) AS trend
        |FROM fit f LEFT JOIN daily d USING (date), beta""".stripMargin)
}
