package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class FunnelInput(user_id: Long, ts: Timestamp, event_type: String)

/** Per-key funnel state: first-event timestamps of the stages reached so
  * far plus the buffered events still above the watermark. Bounded like
  * every stateful op here: three optional longs + O(events inside the
  * watermark window).
  */
final case class FunnelBuf(
    t1: Option[Long],
    t2: Option[Long],
    t3: Option[Long],
    pending: List[(Long, Int)])

final case class FunnelStageOut(user_id: Long, stage: Long, ts: Timestamp)

/** Streaming twin of [[graft.operators.FunnelOps.funnel]]: emit a row the
  * moment a user FIRST reaches each funnel stage (view → click →
  * purchase, strictly increasing event time — identical semantics to the
  * batch join ladder).
  *
  * Correctness under out-of-order arrival is the same discipline as
  * [[StreamingAsof]]: an event only FOLDS into the stage state once the
  * watermark passes its timestamp (nothing earlier can still arrive),
  * buffered until then and replayed in event-time order — so a click
  * that arrives before the earlier view it depends on still counts, and
  * a click whose event time precedes the first view never does. Quiet
  * keys flush via event-time timeout on the earliest pending event.
  */
object StreamingFunnel {

  private val FarHorizonMs: Long = 100L * 365 * 24 * 3600 * 1000

  val StageOf: Map[String, Int] = Map("view" -> 1, "click" -> 2, "purchase" -> 3)

  /** Pure per-key step: merge, finalize everything at or below `wmMs` in
    * (ts, stage) order, emit newly reached stages. Visible for unit tests.
    */
  def advance(
      buf: FunnelBuf,
      newEvents: Seq[(Long, Int)],
      wmMs: Long): (Seq[(Long, Long)], FunnelBuf) = {
    val all = (buf.pending ++ newEvents).sorted
    val (done, pend) = all.partition(_._1 <= wmMs)
    var (t1, t2, t3) = (buf.t1, buf.t2, buf.t3)
    val out = Vector.newBuilder[(Long, Long)]
    done.foreach { case (ts, stage) =>
      stage match {
        case 1 if t1.isEmpty =>
          t1 = Some(ts); out += ((1L, ts))
        case 2 if t2.isEmpty && t1.exists(ts > _) =>
          t2 = Some(ts); out += ((2L, ts))
        case 3 if t3.isEmpty && t2.exists(ts > _) =>
          t3 = Some(ts); out += ((3L, ts))
        case _ => ()
      }
    }
    (out.result(), FunnelBuf(t1, t2, t3, pend))
  }

  def stages(
      s: SparkSession,
      events: Dataset[FunnelInput],
      watermarkDelay: String = "30 minutes"): Dataset[FunnelStageOut] = {
    import s.implicits._
    events
      .filter(e => StageOf.contains(e.event_type))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelStageOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[FunnelInput], state: GroupState[FunnelBuf]) =>
          val evs = it.toVector
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.getOrElse(FunnelBuf(None, None, None, Nil))
          val (outs, next) = advance(
            buf,
            evs.map(e => (e.ts.getTime, StageOf(e.event_type))),
            wm)
          state.update(next)
          if (next.pending.nonEmpty)
            state.setTimeoutTimestamp(next.pending.map(_._1).min)
          else if (state.exists)
            state.setTimeoutTimestamp(math.max(wm, 0L) + FarHorizonMs)
          outs.iterator.map { case (stage, ts) =>
            FunnelStageOut(uid, stage, new Timestamp(ts))
          }
      }
  }
}
