package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sufficient-statistics tables — incremental aggregation
  * without re-scanning history: each batch collapses to a bounded
  * per-group state row (n, Σv, Σv²) and states MERGE by plain
  * addition, so a daily 100 TB pipeline keeps yesterday's state
  * table (|groups| rows) and touches only today's bytes. The same
  * contract as the KMV/HLL/Misra–Gries sketch states ships for the
  * EXACT moments: count / mean / variance / stddev.
  *
  * Exactness and closure: values round 6 dp into DECIMAL(18,6) at
  * state build; Σv is carried as DECIMAL(38,6) and Σv² as
  * DECIMAL(38,12), so a merge of any number of states has the SAME
  * schema and the SAME exact value as one state built over the
  * concatenated inputs (a spec property) — merging is associative,
  * commutative, and rounding-free. Reports derive means 6 dp and
  * zero-clamped sample variance (the Eval.welchTTest discipline),
  * the only doubles in the path.
  *
  * Null contract: null values drop at state build (they carry no
  * moment); a NULL group is a real slice (SQL GROUP BY).
  */
object IncrementalStats {

  private val stateCols = Seq("n", "sum_v", "sum_sq")

  /** Collapse a batch to its per-group moment state:
    * (groupCols…, n, sum_v DECIMAL(38,6), sum_sq DECIMAL(38,12)).
    * One map-side-combined pass; output bounded by |groups|.
    */
  def momentState(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "no group columns given")
    val x = round(col(valueCol), 6).cast("decimal(18,6)")
    df.where(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("decimal(38,6)").as("sum_v"),
        sum((x * x).cast("decimal(38,12)")).cast("decimal(38,12)").as("sum_sq"))
  }

  /** Merge any number of state tables (all built with the same
    * groupCols) into one state of the identical schema: exact
    * addition, no rounding anywhere — state(a ∪ b) ≡
    * merge(state(a), state(b)) bit-for-bit.
    */
  def mergeMomentStates(
      states: Seq[DataFrame],
      groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "no states given")
    states.foreach(s => require(
      stateCols.forall(s.columns.contains),
      s"not a moment state: ${s.columns.mkString(", ")}"))
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum(col("n")), lit(0L)).as("n"),
        sum(col("sum_v")).cast("decimal(38,6)").as("sum_v"),
        sum(col("sum_sq")).cast("decimal(38,12)").as("sum_sq"))
  }

  /** Derive the readable report from a state: (groupCols…, n_rows,
    * mean 6 dp, variance 6 dp — sample, zero-clamped, null when
    * n < 2, stddev 6 dp). Pure per-row arithmetic over the bounded
    * state.
    */
  def momentReport(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    val n = col("n").cast("double")
    val mean = round(col("sum_v").cast("double") / n, 6)
    state
      .withColumn("__m", when(col("n") > 0, mean))
      .withColumn("__var", when(col("n") >= 2,
        greatest(lit(0.0),
          col("sum_sq").cast("double") - n * col("__m") * col("__m")) /
          (n - lit(1.0))))
      .select(groupCols.map(col) ++ Seq(
        col("n").as("n_rows"),
        col("__m").as("mean"),
        round(col("__var"), 6).as("variance"),
        round(sqrt(col("__var")), 6).as("stddev")): _*)
  }
}
