package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed upsert record arriving on the stream. */
final case class UpsertEvent(
    user_id: Long, ts: Timestamp, event_id: Long, event_type: String, value: Double)

/** The retained latest row per key — the materialized-view cell. */
final case class LatestState(tsMs: Long, event_id: Long, event_type: String, value: Double)

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
  * materialized latest-state view; arriving rows fold into it by
  * (ts, event_id) max, so a micro-batch contributes one comparison per
  * row and one emitted row per touched key regardless of batch size.
  * Ordering compares (tsMs, event_id) — unique per event — so the
  * payload never decides a winner, matching the batch twin's contract.
  * `NoTimeout` is deliberate: a latest-state store retains every live
  * key by definition; keys with a retention contract would instead use
  * an event-time timeout against the watermark.
  */
object StreamingUpsert {

  /** Fold a batch of events for one key into the retained state:
    * returns the changelog row to emit and the new state. Visible for
    * unit testing.
    */
  def mergeBatch(
      userId: Long,
      events: Seq[UpsertEvent],
      prior: Option[LatestState]): (StateChange, LatestState) = {
    val best = events.maxBy(e => (e.ts.getTime, e.event_id))
    val incoming = LatestState(best.ts.getTime, best.event_id, best.event_type, best.value)
    prior match {
      case None =>
        (StateChange(userId, "insert", best.ts, best.event_id, best.event_type, best.value),
          incoming)
      case Some(p)
          if Ordering[(Long, Long)].gt(
            (incoming.tsMs, incoming.event_id), (p.tsMs, p.event_id)) =>
        (StateChange(userId, "update", best.ts, best.event_id, best.event_type, best.value),
          incoming)
      case Some(p) =>
        (StateChange(userId, "stale_update",
          new Timestamp(p.tsMs), p.event_id, p.event_type, p.value), p)
    }
  }

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
          val batch = it.toSeq
          if (batch.isEmpty) Iterator.empty
          else {
            val (change, next) = mergeBatch(userId, batch, state.getOption)
            state.update(next)
            Iterator.single(change)
          }
      }
  }
}
