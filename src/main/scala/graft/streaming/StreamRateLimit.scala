package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One decided event: the trailing in-window count INCLUDING this
  * event (saturating at maxEvents + 1 — see the state bound), and the
  * verdict.
  */
case class RateDecision(
    key: String,
    ts_ms: Long,
    in_window: Int,
    violation: Boolean)

/** Per-key state: the most recent ≤ maxEvents event timestamps, newest
  * last. Enough to DECIDE every future event exactly (an event is a
  * violation iff more than maxEvents − 1 kept timestamps are still
  * inside its trailing window), while bounding state at
  * maxEvents × |keys| regardless of stream length or abuse volume —
  * the property a limiter under attack needs most.
  */
case class RateState(recent: List[Long])

/** Streaming twin of [[graft.operators.Events.rateLimitAudit]]:
  * continuous sliding-window rate-limit DECISIONS on a live stream —
  * the batch operator audits yesterday, this one throttles right now.
  *
  * `flatMapGroupsWithState` keyed by key, update mode: each arriving
  * event purges timestamps older than (t − windowMs], counts the
  * survivors + itself as its trailing occupancy, emits the verdict,
  * and appends itself to the kept list (trimmed to maxEvents).
  *
  * Declared differences from the batch twin, both inherent:
  *   - `in_window` saturates at maxEvents + 1 (the state keeps only
  *     maxEvents timestamps — exactly enough to decide the flag; the
  *     batch audit reports the full trailing count);
  *   - decision order is micro-batch arrival, ts-sorted within a
  *     batch per key; a LATE event counts only surviving state
  *     timestamps inside ITS OWN trailing window (t − window, t] —
  *     never its future — but timestamps older than its window may
  *     already have been evicted by the maxEvents trim, so a
  *     sufficiently late event can under-count (the batch audit is
  *     the exact retrospective).
  *
  * State never times out: a key's list is already bounded at
  * maxEvents timestamps, so idle keys cost a few dozen bytes each —
  * acceptable up to very large key cardinalities, and the decision
  * semantics stay exact for a key that goes quiet and returns.
  */
object StreamRateLimit {

  def decisions(
      stream: DataFrame,
      keyCol: String,
      tsMsCol: String,
      maxEvents: Int,
      windowMs: Long): Dataset[RateDecision] = {
    require(maxEvents >= 1, "maxEvents must be positive")
    require(windowMs >= 1, "windowMs must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream
      .where(col(keyCol).isNotNull && col(tsMsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        col(tsMsCol).cast("long").as("ts_ms"))
      .as[(String, Long)]

    def decide(
        key: String,
        rows: Iterator[(String, Long)],
        state: GroupState[RateState]): Iterator[RateDecision] = {
      var recent = state.getOption.map(_.recent).getOrElse(Nil)
      val out = rows.map(_._2).toSeq.sorted.map { t =>
        recent = recent.filter(_ > t - windowMs)
        // Occupancy counts only timestamps in (t − window, t]: a LATE
        // event's trailing window must not count state timestamps
        // from its future (events that happened after it) — those
        // stay in state (they decide LATER events) but are invisible
        // to this one's own sliding window.
        val occupancy =
          math.min(recent.count(_ <= t) + 1, maxEvents + 1)
        val violation = occupancy > maxEvents
        // sort before trimming: a LATE arrival lands out of order at
        // the tail, and an unsorted takeRight would evict the newest
        // timestamp instead of the oldest — corrupting decisions for
        // every later in-order event, not just the late one
        recent = (recent :+ t).sorted.takeRight(maxEvents)
        RateDecision(key, t, occupancy, violation)
      }
      state.update(RateState(recent))
      out.iterator
    }

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(decide)
  }
}
