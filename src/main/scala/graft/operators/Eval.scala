package graft.operators

import org.apache.spark.sql.DataFrame
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
}
