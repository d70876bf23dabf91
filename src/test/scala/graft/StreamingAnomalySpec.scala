package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AnomalyState, StreamingAnomaly, TypedEvent}

/** The streaming volume-anomaly detector: integer z-test semantics, a
  * planted spike caught against the type's own history, and batch-
  * decomposition invariance (the same events chopped differently must
  * close the same windows with the same verdicts).
  */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("integer z-test flags a spike and respects the warm-up floor") {
    // Below MinHistory: never anomalous, however extreme.
    assert(!StreamingAnomaly.isAnomalous(1000L, 2L, 10L, 52L))
    // Stable history 10,10,10,10,10 → k=5, S=50, SS=500, σ=0.
    assert(!StreamingAnomaly.isAnomalous(10L, 5L, 50L, 500L))
    // Any deviation from a zero-variance history is anomalous.
    assert(StreamingAnomaly.isAnomalous(11L, 5L, 50L, 500L))
    // History 8,9,10,11,12 → S=50, SS=510, σ²=2: 3σ ≈ 4.24 → 14 ok, 15 flags.
    assert(!StreamingAnomaly.isAnomalous(14L, 5L, 50L, 510L))
    assert(StreamingAnomaly.isAnomalous(15L, 5L, 50L, 510L))
  }

  test("advance closes windows oldest-first and is chunking-invariant") {
    val windowMs = 60000L
    val t0 = 1700000000000L - (1700000000000L % 60000L)
    // 7 one-minute windows: six stable (count 4), then a 20-event spike.
    val events = (0 until 6).flatMap(w =>
      (0 until 4).map(i => t0 + w * windowMs + i * 1000L)) ++
      (0 until 20).map(i => t0 + 6 * windowMs + i * 1000L)
    def run(chunks: Seq[Seq[Long]]): Seq[(Long, Long, Boolean)] = {
      var st = AnomalyState(Map.empty, 0L, 0L, 0L)
      var out = Vector.empty[(Long, Long, Boolean)]
      var maxSeen = Long.MinValue
      chunks.foreach { c =>
        // Spark's getCurrentWatermarkMs during batch N reflects batch
        // N-1's data, so the simulated watermark must LAG one chunk —
        // a batch's own events are never late against it.
        val wm = if (maxSeen == Long.MinValue) Long.MinValue
                 else maxSeen - windowMs
        maxSeen = math.max(maxSeen, c.max)
        val (vs, next) = StreamingAnomaly.advance("t", c, st, wm, windowMs)
        out ++= vs.map(v => (v.window_start.getTime, v.count, v.anomaly))
        st = next
      }
      // Flush everything left with a far-future watermark.
      val (vs, _) = StreamingAnomaly.advance(
        "t", Seq.empty, st, Long.MaxValue / 2, windowMs)
      out ++ vs.map(v => (v.window_start.getTime, v.count, v.anomaly))
    }
    val oneShot = run(Seq(events))
    val perWindow = run(events.grouped(4).toSeq)
    assert(oneShot == perWindow, "verdicts depend on batch decomposition")
    assert(oneShot.length == 7)
    // First five windows are warm-up, sixth matches history exactly,
    // the spike window is the only anomaly.
    assert(oneShot.count(_._3) == 1)
    assert(oneShot.last._2 == 20L && oneShot.last._3)
  }

  test("watermark-late rows are dropped, never resurrecting a closed window") {
    val windowMs = 60000L
    val t0 = 1700000000000L - (1700000000000L % 60000L)
    // Fold windows 0..5 (counts 4 each) in with a low watermark, then
    // close them all with an empty batch once the watermark passes.
    val st = AnomalyState(Map.empty, 0L, 0L, 0L)
    val events = (0 until 6).flatMap(w =>
      (0 until 4).map(i => t0 + w * windowMs + i * 1000L))
    val (v0, st0) = StreamingAnomaly.advance(
      "t", events, st, Long.MinValue, windowMs)
    assert(v0.isEmpty)
    val (v1, st1) = StreamingAnomaly.advance(
      "t", Seq.empty, st0, t0 + 6 * windowMs, windowMs)
    assert(v1.length == 6 && st1.k == 6L && st1.sum == 24L)
    // A straggler for ALREADY-CLOSED window 2 arrives after the watermark
    // passed it: it must be dropped — no duplicate verdict, no state fold.
    val (v2, st2) = StreamingAnomaly.advance(
      "t", Seq(t0 + 2 * windowMs + 30000L), st1, t0 + 6 * windowMs, windowMs)
    assert(v2.isEmpty, s"late row re-emitted a closed window: $v2")
    assert(st2 == st1, "late row mutated detector state")
  }

  test("end-to-end over MemoryStream: spike flagged once windows close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val windowMs = StreamingAnomaly.DefaultWindowMs
    val t0 = 1700000000000L - (1700000000000L % windowMs)
    def ev(w: Int, i: Int) =
      TypedEvent("click", new Timestamp(t0 + w * windowMs + i * 1000L))
    val stable = (0 until 6).flatMap(w => (0 until 4).map(ev(w, _)))
    val spike = (0 until 20).map(ev(6, _))

    val query = StreamingAnomaly.verdicts(spark, input.toDS())
      .writeStream.format("memory").queryName("anomaly_test")
      .outputMode("append").start()
    try {
      input.addData(stable: _*)
      query.processAllAvailable()
      input.addData(spike: _*)
      query.processAllAvailable()
      // Advance the watermark far past the spike so window 6 closes.
      input.addData(TypedEvent("click",
        new Timestamp(t0 + 20 * windowMs)))
      query.processAllAvailable()
      val rows = spark.table("anomaly_test").collect()
        .map(r => (r.getTimestamp(1).getTime, r.getLong(2), r.getBoolean(4)))
        .sortBy(_._1)
      assert(rows.length == 7, s"expected 7 closed windows, got ${rows.toSeq}")
      assert(rows.count(_._3) == 1)
      assert(rows.last._2 == 20L && rows.last._3)
    } finally query.stop()
  }
}
