package graft

import org.apache.spark.sql.Dataset

/** Temp-column name hygiene for operators that add working columns to
  * USER frames (splitByHash's hash, moving-average's partition tags,
  * …): a fixed `__x` name silently clobbers — or worse, later drops —
  * a user column that happens to share it. `unique` picks the first
  * `base`, `base_1`, `base_2`, … free in every given frame, so the
  * operator's internal names can never collide with user data.
  * Deterministic (same frames → same name), so plans stay stable
  * across retries and cache lookups.
  */
private[graft] object Cols {
  def unique(base: String, dfs: Dataset[_]*): String = {
    val taken = dfs.iterator.flatMap(_.columns).toSet
    if (!taken.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i").find(!taken.contains(_)).get
  }
}
