package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for the per-type volume anomaly detector. */
final case class TypedEvent(event_type: String, ts: Timestamp)

/** Per-type detector state: the open tumbling windows (start-ms →
  * count) plus the integer moment history of every CLOSED window —
  * `k` windows seen, `sum` of their counts, `sumSq` of their squares.
  * Bounded: open windows are capped by watermark lag / window length,
  * history is three longs.
  */
final case class AnomalyState(
    open: Map[Long, Long], k: Long, sum: Long, sumSq: Long)

/** A closed window's volume readout with its anomaly verdict. */
final case class WindowVerdict(
    event_type: String,
    window_start: Timestamp,
    count: Long,
    windows_seen: Long,
    anomaly: Boolean)

/** Streaming per-type volume anomaly detection — the operational alert
  * the batch drift family ([[graft.operators.TemporalOps.driftCusum]],
  * k-sigma outliers) answers retrospectively, here evaluated the moment
  * a tumbling window closes against the type's OWN history.
  *
  * The z-test runs in PURE INTEGERS: a closed window with count `c`
  * against history `(k, S, SS)` is anomalous iff
  * `(c·k − S)² > τ²·(k·SS − S²)·k` — the |c − S/k| > τ·σ inequality
  * multiplied through by k², so no float ever enters state or verdict
  * (bit-stable across any batch decomposition, which the spec pins by
  * replaying the same events in different chunkings).
  *
  * flatMapGroupsWithState keyed by event_type: state is
  * [[AnomalyState]] — O(open windows) per type no matter the event
  * rate, with closed-window history collapsed to three integer moments.
  * Windows close against the group-state watermark (event-time), are
  * verdicted against the history BEFORE folding in (an anomaly is "vs
  * the past", not "vs itself"), and fold oldest-first so the moment
  * stream is deterministic.
  */
object StreamingAnomaly {

  val DefaultWindowMs: Long = 60 * 1000L

  /** τ = 3 (classic three-sigma), squared for the integer inequality. */
  val TauSq: Long = 9L

  /** Warm-up: no verdicts before this many closed windows of history. */
  val MinHistory: Long = 5L

  /** Pure verdict from integer moments — visible for unit tests.
    * `(c·k − S)² > τ²·(k·SS − S²)` is exactly |c − S/k| > τ·σ with both
    * sides multiplied by k² (σ² = (k·SS − S²)/k²).
    */
  def isAnomalous(c: Long, k: Long, sum: Long, sumSq: Long): Boolean = {
    if (k < MinHistory) false
    else {
      val lhs = (c * k - sum) * (c * k - sum)
      val rhs = TauSq * (k * sumSq - sum * sum)
      lhs > rhs
    }
  }

  /** Merge a batch of event timestamps into state; close every window
    * whose END is at or before the watermark; verdict then fold each
    * closed window oldest-first. Visible for unit tests.
    */
  def advance(
      eventType: String,
      tsMs: Seq[Long],
      st: AnomalyState,
      watermarkMs: Long,
      windowMs: Long): (Seq[WindowVerdict], AnomalyState) = {
    var open = st.open
    tsMs.foreach { t =>
      val w = (t / windowMs) * windowMs
      // Drop watermark-late rows outright: a timestamp whose window end
      // is already at or before the watermark belongs to a CLOSED window
      // — folding it in would resurrect that window, which would then
      // re-close in this same call and emit a duplicate (partial-count)
      // verdict while double-folding the window into the moment history.
      if (w + windowMs > watermarkMs)
        open = open.updated(w, open.getOrElse(w, 0L) + 1L)
    }
    val (toClose, stillOpen) = open.partition {
      case (w, _) => w + windowMs <= watermarkMs
    }
    var (k, sum, sumSq) = (st.k, st.sum, st.sumSq)
    val verdicts = toClose.toSeq.sortBy(_._1).map { case (w, c) =>
      val v = WindowVerdict(
        eventType, new Timestamp(w), c, k, isAnomalous(c, k, sum, sumSq))
      k += 1; sum += c; sumSq += c * c
      v
    }
    (verdicts, AnomalyState(stillOpen, k, sum, sumSq))
  }

  def verdicts(
      s: SparkSession,
      events: Dataset[TypedEvent],
      windowMs: Long = DefaultWindowMs,
      watermarkDelay: String = "2 minutes"): Dataset[WindowVerdict] = {
    import s.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, WindowVerdict](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (t: String, it: Iterator[TypedEvent], state: GroupState[AnomalyState]) =>
          val st = state.getOption.getOrElse(
            AnomalyState(Map.empty, 0L, 0L, 0L))
          val wm = state.getCurrentWatermarkMs()
          val (out, next) =
            advance(t, it.map(_.ts.getTime).toSeq, st, wm, windowMs)
          state.update(next)
          // Event-time timeout at the earliest open window's end: a key
          // that receives no further data still closes its windows when
          // the watermark passes them (this invocation then arrives with
          // an empty iterator and the same advance() path drains them).
          if (next.open.nonEmpty) {
            val due = next.open.keys.min + windowMs
            state.setTimeoutTimestamp(math.max(due, wm + 1))
          }
          out.iterator
      }
  }
}
