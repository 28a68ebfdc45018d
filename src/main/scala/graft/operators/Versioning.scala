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
  /** Build a type-2 slowly-changing-dimension history from a change
    * log — the "what did this record look like at version v?"
    * primitive behind point-in-time training-data reconstruction and
    * dimension auditing.
    *
    * Each input row asserts the record's payload as of `versionCol`.
    * Per key: duplicate versions collapse deterministically (payload
    * fingerprint desc — the [[applyChanges]] discipline), consecutive
    * no-op re-assertions of the SAME payload collapse into the open
    * interval (a crawler re-emitting an unchanged doc must not split
    * its validity), and each surviving change opens an interval
    * [valid_from, valid_to) closed by the next REAL change
    * (valid_to null + is_current on the last).
    *
    * Scale shape: everything is windows over ONE hash partitioning on
    * the key (Spark reuses the exchange across the three window
    * specs; the sorts share the (key, version) order) — no joins, no
    * driver state, output ≤ input rows.
    */
  def scd2History(
      changes: DataFrame,
      idCol: String,
      versionCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "no payload columns given")
    import org.apache.spark.sql.expressions.Window
    val fp = fingerprint(payloadCols)
    val order = Window.partitionBy(col(idCol)).orderBy(col(versionCol))
    // Same-version dedup WITHOUT a second partitioning: ordered by
    // (version, fp desc), the first row of each version run is the
    // deterministic winner — lag(version) detects the run boundary on
    // the same (key)-hash exchange every later window reuses.
    val dedupOrder = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol), col("__fp").desc)
    val one = changes
      .withColumn("__fp", fp)
      .withColumn("__pv", lag(col(versionCol), 1).over(dedupOrder))
      .where(col("__pv").isNull || col("__pv") =!= col(versionCol))
    val kept = one
      .withColumn("__pfp", lag(col("__fp"), 1).over(order))
      .where(col("__pfp").isNull || col("__pfp") =!= col("__fp"))
    kept
      .withColumn("valid_to", lead(col(versionCol), 1).over(order))
      .select((Seq(col(idCol)) ++ payloadCols.map(col) ++ Seq(
        col(versionCol).as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"))): _*)
  }

  /** Point-in-time snapshot from a [[scd2History]] frame: the table
    * as of version `asOf` — rows whose interval covers it
    * (`valid_from <= asOf < valid_to`, open intervals included),
    * interval bookkeeping dropped. Inserted-later keys are simply
    * absent; a key whose first change is later than `asOf` did not
    * exist yet.
    *
    * Scale shape: a pure row-local filter + projection over the
    * history scan — zero shuffles, and both predicates push down to
    * the (typically partitioned/bucketed) history store.
    */
  def snapshotAsOf(history: DataFrame, asOf: Long): DataFrame = {
    val cols = history.columns.toSeq
    require(Seq("valid_from", "valid_to", "is_current").forall(cols.contains),
      "snapshotAsOf expects an scd2History frame (valid_from/valid_to/is_current)")
    history
      .where(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .drop("valid_from", "valid_to", "is_current")
  }

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
