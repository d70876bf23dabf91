package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed upsert record arriving on the stream. */
final case class UpsertEvent(
    user_id: Long, ts: Timestamp, event_id: Long, event_type: String, value: Double)

/** The retained latest row per key — the materialized-view cell. The
  * original Timestamp is stored as-is (never reconstructed from a
  * truncated long), alongside its microsecond value for ordering.
  */
final case class LatestState(
    ts: Timestamp, tsUs: Long, event_id: Long, event_type: String, value: Double)

/** One emitted state transition (the CDC changelog row). */
final case class StateChange(
    user_id: Long,
    op: String,
    ts: Timestamp,
    event_id: Long,
    event_type: String,
    value: Double)

/** Streaming CDC upsert — the streaming twin of the batch
  * [[graft.operators.TopKOps.cdcMerge]]: a continuously-materialized
  * latest-state store that emits one changelog row per key per
  * micro-batch, classified exactly like the batch op (`insert` first
  * sighting, `update` when the batch advances the key, `stale_update`
  * when every arriving row is older than the retained state — emitted
  * with the RETAINED row, so out-of-order delivery is observable, never
  * silently applied).
  *
  * Scale notes: state per key is ONE [[LatestState]] (a timestamp, an
  * id, and the payload) — O(distinct keys) total, the floor for any
  * materialized latest-state view; a micro-batch's rows fold into their
  * (ts, event_id) maximum in one O(1)-space pass over the iterator (no
  * per-key buffering, so a hot key costs comparisons, not memory), then
  * one comparison against state and one emitted row per touched key.
  * Ordering compares (tsUs, event_id) at MICROSECOND precision — the
  * same `ts_us` grain as the batch twin, so sub-millisecond orderings
  * classify identically in both; (ts, event_id) is unique per event, so
  * the payload never decides a winner. `NoTimeout` is deliberate: a
  * latest-state store retains every live key by definition; keys with a
  * retention contract would instead use an event-time timeout against
  * the watermark.
  */
object StreamingUpsert {

  /** Microseconds since epoch of a Timestamp — the batch twin's `ts_us`
    * grain (getTime truncates the sub-ms component; nanos restores it).
    */
  def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Fold one key's incoming maximum into the retained state: returns
    * the changelog row to emit and the new state.
    */
  def mergeOne(
      userId: Long,
      best: UpsertEvent,
      prior: Option[LatestState]): (StateChange, LatestState) = {
    val incoming =
      LatestState(best.ts, micros(best.ts), best.event_id, best.event_type, best.value)
    prior match {
      case None =>
        (StateChange(userId, "insert", best.ts, best.event_id, best.event_type, best.value),
          incoming)
      case Some(p)
          if Ordering[(Long, Long)].gt(
            (incoming.tsUs, incoming.event_id), (p.tsUs, p.event_id)) =>
        (StateChange(userId, "update", best.ts, best.event_id, best.event_type, best.value),
          incoming)
      case Some(p) =>
        (StateChange(userId, "stale_update",
          p.ts, p.event_id, p.event_type, p.value), p)
    }
  }

  /** Convenience over a materialized batch (unit tests). */
  def mergeBatch(
      userId: Long,
      events: Seq[UpsertEvent],
      prior: Option[LatestState]): (StateChange, LatestState) =
    mergeOne(userId, events.maxBy(e => (micros(e.ts), e.event_id)), prior)

  /** The continuous changelog of a keyed latest-state store over an
    * unbounded upsert stream.
    */
  def changelog(
      s: SparkSession,
      events: Dataset[UpsertEvent]): Dataset[StateChange] = {
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestState, StateChange](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[UpsertEvent], state: GroupState[LatestState]) =>
          if (it.isEmpty) Iterator.empty
          else {
            // O(1)-space fold to the batch maximum — never buffer the batch.
            val best = it.reduce { (a, b) =>
              if (Ordering[(Long, Long)].gt(
                (micros(b.ts), b.event_id), (micros(a.ts), a.event_id))) b else a
            }
            val (change, next) = mergeOne(userId, best, state.getOption)
            state.update(next)
            Iterator.single(change)
          }
      }
  }
}
