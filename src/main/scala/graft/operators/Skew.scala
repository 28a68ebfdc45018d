package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins.
  *
  * When a handful of join keys carry a disproportionate share of rows
  * (the classic power-law key at 100 TB), a plain shuffle join puts
  * an entire hot key in ONE task. Salting splits each hot key into
  * `saltFactor` sub-keys: the large side gets a deterministic salt
  * derived from its full row (uniform, reproducible across retries —
  * never `rand()`, which breaks task retry idempotency), the small
  * side is replicated once per salt value, and the join key becomes
  * (keys, salt).
  *
  * AQE's skew-join handles moderate skew automatically; explicit
  * salting is for the extreme keys AQE can't split (e.g. a single key
  * larger than executor memory).
  */
object Skew {

  /** Equi-join `large` with `small` on `keys`, salted `saltFactor`
    * ways. Supports "inner" and "left" (the replicated side is
    * `small`, so its rows stay unique per (key, salt) match).
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      "salted join supports inner/left joins (the small side is replicated)")
    val saltCol = graft.Cols.unique("__salt", large, small)
    val salted = large.withColumn(
      saltCol,
      pmod(xxhash64(large.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn(
      saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
