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
