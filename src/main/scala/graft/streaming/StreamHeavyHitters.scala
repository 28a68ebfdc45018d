package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One sharded input item. */
case class MgShardItem(shard: Int, item: String)

/** Per-shard sketch state: bounded at k counters + an emission
  * generation (so a consumer can select each shard's LATEST report).
  */
case class MgShardState(gen: Long, items: List[String], cnts: List[Long])

/** One emitted candidate row. */
case class MgCandidate(shard: Int, gen: Long, item: String, cnt: Long)

/** Streaming Misra–Gries heavy hitters — the continuous twin of
  * `Profile.mgHeavyHitters` (row 163): "what are the frequent
  * tokens/domains RIGHT NOW" over an unbounded stream, with state
  * bounded at shards × k counters regardless of stream length or
  * vocabulary size (the thing a streaming exact count table cannot
  * promise).
  *
  * Sharding preserves the MG guarantee under parallelism: items
  * shard by hash, so item spaces are DISJOINT across shards and a
  * per-shard guarantee (count > shardN/(k+1) ⇒ survives) implies
  * the global one (count > N/(k+1) ≥ shardN/(k+1) for the item's
  * own shard). Each trigger the shard re-emits its current
  * candidates under a bumped `gen`; consumers keep each shard's max
  * gen (Update output mode — a heavy hitter must be REPLACEABLE,
  * not append-only).
  *
  * Counters carry the standard MG semantics: lower bounds
  * underestimating by ≤ shardN/(k+1); which NON-heavy items survive
  * is arrival-order-dependent — consume membership, or re-count the
  * candidate set exactly in a second pass (the classic two-pass
  * plan).
  */
object StreamHeavyHitters {

  def heavyHittersContinuous(
      stream: DataFrame,
      valueCol: String,
      k: Int = 64,
      shards: Int = 8): Dataset[MgCandidate] = {
    require(k >= 1, "k must be positive")
    require(shards >= 1, "shards must be positive")
    val spark = stream.sparkSession
    import spark.implicits._

    def update(
        shard: Int,
        rows: Iterator[MgShardItem],
        state: GroupState[MgShardState]): Iterator[MgCandidate] = {
      val prev = state.getOption.getOrElse(MgShardState(0L, Nil, Nil))
      val counters = scala.collection.mutable.LinkedHashMap.from(
        prev.items.zip(prev.cnts))
      rows.foreach { r =>
        counters.get(r.item) match {
          case Some(c) => counters(r.item) = c + 1
          case None if counters.size < k => counters(r.item) = 1L
          case None =>
            // classic MG: a miss on a full sketch decrements every
            // counter; zeros drop out
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.filterInPlace((_, c) => c > 0)
        }
      }
      val gen = prev.gen + 1
      state.update(MgShardState(gen, counters.keys.toList,
        counters.values.toList))
      counters.iterator
        .map { case (item, c) => MgCandidate(shard, gen, item, c) }
        .toList.iterator
    }

    stream
      .where(col(valueCol).isNotNull)
      .select(
        pmod(xxhash64(col(valueCol).cast("string")), lit(shards))
          .cast("int").as("shard"),
        col(valueCol).cast("string").as("item"))
      .as[MgShardItem]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update)
  }
}
