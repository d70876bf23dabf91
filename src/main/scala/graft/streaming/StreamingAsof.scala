package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One tagged input row: `is_left` marks the probe side (the side being
  * matched), left=false rows are the reference side carried forward.
  */
final case class AsofInput(user_id: Long, ts: Timestamp, event_id: Long, is_left: Boolean)

/** Per-key state: the folded best reference row at or below the frontier
  * (only the maximum matters for all future probes), plus the pending
  * rows above it. State is O(events inside the watermark window) per key,
  * never unbounded history.
  */
final case class AsofBuf(
    bestTs: Option[Long],
    bestId: Option[Long],
    rights: List[(Long, Long)],
    lefts: List[(Long, Long)])

final case class AsofOut(
    user_id: Long,
    event_id: Long,
    ts: Timestamp,
    matched_id: Option[Long],
    matched_ts: Option[Timestamp])

/** Streaming twin of [[graft.operators.AsofJoinOps]]: per key, match each
  * probe (left) row to the latest reference (right) row at or before its
  * event time — with out-of-order arrivals handled by finalizing a probe
  * only once the watermark passes its timestamp (no earlier reference row
  * can still arrive; later-than-watermark stragglers are dropped by the
  * watermark, same contract as every stateful op here).
  *
  * Identical tie semantics to the batch operator: a reference row AT the
  * probe's timestamp matches, and among equal timestamps the larger id
  * wins. Quiet keys are flushed by an event-time timeout set to the
  * earliest pending probe's timestamp: when the watermark passes it the
  * group fires with no input rows and the same `advance` step emits every
  * probe the watermark has finalized — output completeness does not
  * depend on the key ever receiving another row.
  */
object StreamingAsof {

  /** ~100 years in ms: the "no pending work" timeout horizon. */
  private val FarHorizonMs: Long = 100L * 365 * 24 * 3600 * 1000

  /** Pure per-key step: merge new rows, finalize every probe at or below
    * the watermark `wmMs` in (ts, id) order, fold consumed reference rows
    * into the single best-so-far. Visible for unit testing.
    */
  def advance(
      buf: AsofBuf,
      newRights: Seq[(Long, Long)],
      newLefts: Seq[(Long, Long)],
      wmMs: Long): (Seq[(Long, Long, Option[(Long, Long)])], AsofBuf) = {
    val rights = (buf.rights ++ newRights).sorted
    val lefts = (buf.lefts ++ newLefts).sorted
    val (doneLefts, pendLefts) = lefts.partition(_._1 <= wmMs)
    var best: Option[(Long, Long)] =
      for (t <- buf.bestTs; i <- buf.bestId) yield (t, i)
    var remaining = rights
    val out = doneLefts.map { case (lts, lid) =>
      val (fold, rest) = remaining.partition(_._1 <= lts)
      if (fold.nonEmpty) best = Some((best.toList ++ fold).max)
      remaining = rest
      (lts, lid, best)
    }
    // Reference rows at or below the watermark can never be out-ranked
    // for any future probe (those all have ts > wm): keep only the max.
    val (foldAll, keepRights) = remaining.partition(_._1 <= wmMs)
    if (foldAll.nonEmpty) best = Some((best.toList ++ foldAll).max)
    (out, AsofBuf(best.map(_._1), best.map(_._2), keepRights, pendLefts))
  }

  def matches(
      s: SparkSession,
      events: Dataset[AsofInput],
      watermarkDelay: String = "30 minutes"): Dataset[AsofOut] = {
    import s.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofBuf, AsofOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[AsofInput], state: GroupState[AsofBuf]) =>
          // On timeout the iterator is empty and the same step below
          // flushes every probe at or below the new watermark — one code
          // path for data-driven and timeout-driven emission.
          val evs = it.toVector
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.getOrElse(AsofBuf(None, None, Nil, Nil))
          val (outs, next) = advance(
            buf,
            evs.filter(!_.is_left).map(e => (e.ts.getTime, e.event_id)),
            evs.filter(_.is_left).map(e => (e.ts.getTime, e.event_id)),
            wm)
          state.update(next)
          // Earliest pending probe: strictly above the watermark (all
          // others were just flushed), so the timestamp is always valid,
          // and the group re-fires as soon as that probe finalizes.
          // With nothing pending, push the timeout to a far horizon
          // instead of leaving the old (already-passed) timestamp in
          // place — Spark does not clear a fired timeout, so a stale
          // timestamp would re-fire every quiet key on every micro-batch
          // forever (no output, but O(quiet keys) wasted state reads).
          if (next.lefts.nonEmpty)
            state.setTimeoutTimestamp(next.lefts.map(_._1).min)
          else if (state.exists)
            state.setTimeoutTimestamp(math.max(wm, 0L) + FarHorizonMs)
          outs.iterator.map { case (lts, lid, m) =>
            AsofOut(uid, lid, new Timestamp(lts),
              m.map(_._2), m.map(p => new Timestamp(p._1)))
          }
      }
  }
}
