package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._

class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val t0 = 1700000000000L
  private def ts(sec: Long) = new Timestamp(t0 + sec * 1000)
  private def ev(u: Long, sec: Long, id: Long, tpe: String = "view", v: Double = 1.0) =
    UpsertEvent(u, ts(sec), id, tpe, v)

  test("mergeBatch classifies insert / update / stale and retains the winner") {
    val (ins, s1) = StreamingUpsert.mergeBatch(1L, Seq(ev(1L, 10, 5)), None)
    assert(ins.op == "insert" && s1.event_id == 5L)

    val (upd, s2) = StreamingUpsert.mergeBatch(1L, Seq(ev(1L, 20, 7, "click", 2.0)), Some(s1))
    assert(upd.op == "update" && upd.event_id == 7L && s2.event_type == "click")

    // An exclusively-older batch must NOT regress state; the emitted row
    // carries the retained (newer) payload.
    val (stale, s3) = StreamingUpsert.mergeBatch(1L, Seq(ev(1L, 5, 3)), Some(s2))
    assert(stale.op == "stale_update" && stale.event_id == 7L && s3 == s2)

    // Same timestamp, higher event_id wins (the batch twin's tie-break).
    val (tie, s4) = StreamingUpsert.mergeBatch(1L, Seq(ev(1L, 20, 9)), Some(s2))
    assert(tie.op == "update" && s4.event_id == 9L)
  }

  test("mergeBatch folds an unordered batch to its (ts, id) maximum") {
    val batch = Seq(ev(1L, 30, 2), ev(1L, 10, 9), ev(1L, 30, 4))
    val (c, s) = StreamingUpsert.mergeBatch(1L, batch, None)
    assert(c.op == "insert" && s.event_id == 4L && s.tsUs == ts(30).getTime * 1000L)
  }

  test("ordering is microsecond-precise, matching the batch twin's ts_us grain") {
    // Two events in the same millisecond: 1500µs then 1200µs after t0
    // (t0 is on an exact second, so the whole fraction lives in nanos).
    def tsUs(us: Long) = {
      val t = new Timestamp(t0)
      t.setNanos((us * 1000).toInt)
      t
    }
    val a = UpsertEvent(1L, tsUs(1500), 1L, "view", 1.0)
    val b = UpsertEvent(1L, tsUs(1200), 2L, "view", 1.0)
    assert(StreamingUpsert.micros(a.ts) == StreamingUpsert.micros(b.ts) + 300)
    val (_, s1) = StreamingUpsert.mergeBatch(1L, Seq(a), None)
    // b is µs-older despite the higher event_id and equal millisecond:
    // a ms-grain comparison would classify it 'update' and regress state.
    val (c, s2) = StreamingUpsert.mergeBatch(1L, Seq(b), Some(s1))
    assert(c.op == "stale_update" && s2 == s1)
    // The retained row's emitted timestamp is the ORIGINAL (no µs loss).
    assert(c.ts == a.ts)
  }

  test("changelog emits one classified row per touched key per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UpsertEvent]
    val query = StreamingUpsert.changelog(spark, input.toDS())
      .writeStream.format("memory").queryName("upsert_changelog")
      .outputMode("append").start()
    try {
      input.addData(ev(1L, 10, 1), ev(2L, 10, 2))
      query.processAllAvailable()
      val b1 = spark.table("upsert_changelog").as[StateChange].collect()
      assert(b1.length == 2 && b1.forall(_.op == "insert"))

      // user 1 advances, user 2 gets only an older row, user 3 is new
      input.addData(ev(1L, 50, 8), ev(2L, 5, 0), ev(3L, 20, 6))
      query.processAllAvailable()
      val b2 = spark.table("upsert_changelog").as[StateChange].collect()
        .filterNot(c => b1.exists(p => p.user_id == c.user_id && p.event_id == c.event_id && p.op == c.op))
      val byUser = b2.map(c => c.user_id -> c).toMap
      assert(byUser(1L).op == "update" && byUser(1L).event_id == 8L)
      assert(byUser(2L).op == "stale_update" && byUser(2L).event_id == 2L)
      assert(byUser(3L).op == "insert")
    } finally query.stop()
  }
}
