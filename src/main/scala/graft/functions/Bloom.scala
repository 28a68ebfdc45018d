package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Spark's native Bloom-filter sketch (the engine's own runtime-
  * row-filter machinery, `BloomFilterAggregate` /
  * `BloomFilterMightContain`) exposed as columns — the broadcastable
  * set-membership primitive for "is this gram/id/url in the reference
  * set?" when the reference set is too large to broadcast-join
  * (100 M benchmark n-grams ≈ GBs as a join side, ~tens of MB as a
  * Bloom filter at 10 bits/item) but a small false-positive rate is
  * acceptable or verified away downstream.
  *
  * Values are hashed with `xxhash64` (seed 42, the same hash Spark's
  * own injected runtime filters use), so build and probe sides agree
  * on any input type.
  */
object Bloom {

  /** Aggregate a column into one Bloom-filter binary. `items` is the
    * expected distinct count; `fpp` the target false-positive rate.
    * Both are clamped to the session's runtime-filter creation caps
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/
    * `maxNumBits`) — a clamped filter just gets more false positives,
    * never false negatives.
    */
  def bloomAgg(c: Column, items: Long, fpp: Double = 0.01): Column = {
    require(items > 0, "items must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxItems =
      conf.getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits =
      conf.getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    val est = math.min(items, maxItems)
    val bits = math.min(
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(est, fpp),
      maxBits)
    GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(xxhash64(c)),
        Literal(est), Literal(bits)).toAggregateExpression())
  }

  /** Build a Bloom filter over `df.col(valueCol)` and return its
    * serialized bytes (driver-side, bounded by the bit budget — NOT
    * by the data). Returns None for an empty frame.
    */
  def build(
      df: DataFrame,
      valueCol: String,
      items: Long,
      fpp: Double = 0.01): Option[Array[Byte]] =
    Option(df.where(col(valueCol).isNotNull)
      .select(bloomAgg(col(valueCol), items, fpp).as("bf"))
      .head.get(0)).map(_.asInstanceOf[Array[Byte]])

  /** Membership probe against a built filter: true if the value MIGHT
    * be in the set (no false negatives), null for null input. The
    * filter ships in the plan as a literal — a row-local codegen'd
    * predicate, no join, no shuffle.
    */
  def mightContain(filter: Array[Byte], c: Column): Column = {
    // xxhash64(null) degrades to the seed, which would make every
    // null probe (and build row) alias one phantom value — guard
    // explicitly instead ([[build]] drops null rows for the same
    // reason).
    val probe = GraftSqlBridge.column(
      BloomFilterMightContain(
        Literal(filter, BinaryType),
        GraftSqlBridge.expression(xxhash64(c))))
    when(c.isNull, lit(null).cast("boolean")).otherwise(probe)
  }
}
