package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for the custom-state sessionizer. */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Open-session state kept per user between micro-batches. */
final case class OpenSession(startMs: Long, lastMs: Long, events: Long, valueSum: Double)

/** A closed session emitted downstream. */
final case class ClosedSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    events: Long,
    value_sum: Double)

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state tier below `session_window`, for session semantics the
  * built-in operator can't express (here: emit a session the moment a
  * later event proves it closed, carrying custom per-session aggregates).
  *
  * State per user is a single [[OpenSession]] — O(users) state total,
  * merged incrementally each micro-batch. Events inside a batch are
  * sorted per user before merging, so results are deterministic for a
  * given batch decomposition. The still-open session stays in state and
  * is only emitted once a later event (or, in production, an event-time
  * timeout against the watermark) closes it.
  */
object StatefulSessions {

  val DefaultGapMs: Long = 1800 * 1000L

  /** Merge a user's new events into state, returning sessions that the
    * new events closed. Visible for unit testing.
    */
  def mergeEvents(
      userId: Long,
      sorted: Seq[SessionEvent],
      open: Option[OpenSession],
      gapMs: Long): (Seq[ClosedSession], Option[OpenSession]) = {
    var closed = Vector.empty[ClosedSession]
    var cur = open
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastMs < gapMs =>
          cur = Some(s.copy(lastMs = t, events = s.events + 1, valueSum = s.valueSum + e.value))
        case Some(s) =>
          closed :+= ClosedSession(
            userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.events, s.valueSum)
          cur = Some(OpenSession(t, t, 1L, e.value))
        case None =>
          cur = Some(OpenSession(t, t, 1L, e.value))
      }
    }
    (closed, cur)
  }

  def sessions(
      s: SparkSession,
      events: Dataset[SessionEvent],
      gapMs: Long = DefaultGapMs): Dataset[ClosedSession] = {
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
          val (closed, open) =
            mergeEvents(userId, sorted, state.getOption, gapMs)
          open match {
            case Some(o) => state.update(o)
            case None => state.remove()
          }
          closed.iterator
      }
  }
}
