package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the "what changed since the last crawl?"
  * primitive behind every incremental pipeline decision (re-embed
  * only changed docs, re-dedup only added ones, audit a vendor
  * refresh before swapping it in).
  *
  * Rows are compared by a content fingerprint (md5 over the chosen
  * columns, null-tagged so NULL ≠ '' — SURVEY §4 md5-only hashing),
  * so the diff never ships row payloads across the join: each side
  * reduces to (id, 32-char fingerprint) before the full-outer join
  * on the id. That join is the only shuffle, it carries two narrow
  * columns, and AQE broadcasts it whenever one snapshot is small
  * (the usual daily-delta case).
  */
object Versioning {

  /** Null-tagged md5 fingerprint over `cols`, identical to the DuckDB
    * replay `md5(concat_ws(chr(1), coalesce(c::VARCHAR, chr(0)), …))`.
    * Callers hashing double columns should pre-round them — engines
    * disagree on float-to-string rendering, not on strings/ints.
    */
  private[operators] def fingerprint(cols: Seq[String]) =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  /** Per-row diff of two snapshots keyed by `idCol`.
    *
    * @param compareCols columns whose values define "changed"
    *                    (order-sensitive, same list for both sides).
    * @return one row per id present in either snapshot:
    *         (`idCol`, status ∈ added | removed | changed | unchanged).
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "no compare columns given")
    val fp = fingerprint(compareCols)
    val o = oldDf.select(col(idCol), fp.as("__fp_old"))
    val n = newDf.select(col(idCol), fp.as("__fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Bounded summary of [[snapshotDiff]]: one row per status with its
    * count — the 4-row health report an ingest gate alerts on.
    */
  def snapshotDiffStats(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      compareCols: Seq[String]): DataFrame =
    snapshotDiff(oldDf, newDf, idCol, compareCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** Apply a CDC change stream to a base snapshot — the MERGE /
    * upsert-apply primitive behind incremental table maintenance:
    * `changes` carries base-shaped payload rows plus a version and an
    * op (`"upsert"` or `"delete"`; anything else fails the job via
    * `raise_error` — silent tolerance of a typo'd op corrupts the
    * table). Per key, the LATEST change wins (version desc; ties
    * break on op desc then payload fingerprint desc, so the result
    * is deterministic even on degenerate duplicate versions); a
    * winning upsert replaces the base row, a winning delete removes
    * it, keys without changes pass through untouched.
    *
    * Scale shape: the latest-wins window shuffles only the CHANGE
    * stream (delta-sized, not table-sized); the base is touched by
    * ONE left-anti join on the key (AQE broadcasts the delta's key
    * set in the usual small-delta case) plus a union — the base is
    * never windowed, fingerprinted, or re-sorted. Output schema =
    * base schema.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      idCol: String,
      versionCol: String,
      opCol: String): DataFrame = {
    val baseCols = base.columns.toSeq
    require(baseCols.contains(idCol), s"base must carry $idCol")
    require(!baseCols.contains(versionCol) && !baseCols.contains(opCol),
      "base must not carry the version/op bookkeeping columns")
    val payload = baseCols.filterNot(_ == idCol)
    require(payload.forall(changes.columns.contains),
      s"changes must carry the base payload columns $payload")
    val opGuard = when(col(opCol).isin("upsert", "delete"), col(opCol))
      .otherwise(raise_error(concat(lit("applyChanges: unknown op "), col(opCol))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col(versionCol).desc, col(opCol).desc,
        fingerprint(payload).desc)
    val latest = changes
      .withColumn(opCol, opGuard)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val untouched = base.join(latest.select(col(idCol)), Seq(idCol), "left_anti")
    val upserted = latest.where(col(opCol) === "upsert")
      .select(baseCols.map(col): _*)
    untouched.unionByName(upserted)
  }
}
