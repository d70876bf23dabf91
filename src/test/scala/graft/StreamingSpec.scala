package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSessionize

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("session_window splits on the inactivity gap like the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")

    val t0 = 1700000000000L // fixed epoch millis
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    input.addData(
      (1L, ts(0), 1.0),
      (1L, ts(600), 2.0),   // 10 min gap -> same session
      (1L, ts(2401), 3.0),  // > 1800s after previous -> NEW session
      (2L, ts(0), 5.0))

    val query = StreamingSessionize.sessions(events)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("sessions_test").collect()
      val u1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getTimestamp(1).getTime)
      assert(u1.length == 2, s"expected 2 sessions for user 1, got ${u1.length}")
      assert(u1(0).getLong(3) == 2L) // first session: 2 events
      assert(u1(1).getLong(3) == 1L) // second session: 1 event
      val u2 = rows.filter(_.getLong(0) == 2L)
      assert(u2.length == 1 && u2.head.getLong(3) == 1L)
    } finally query.stop()
  }

  test("streaming dedup keeps the first copy of each text within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    input.addData(
      (1L, ts(0), "alpha beta"),
      (2L, ts(10), "alpha beta"),   // duplicate text, later arrival -> dropped
      (3L, ts(20), "gamma delta"),
      (4L, ts(30), "gamma  delta")) // different whitespace -> distinct digest

    val query = graft.streaming.StreamingDedup.firstSeen(docs)
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val ids = spark.table("dedup_test").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 3L, 4L), s"survivors=${ids.toSeq}")
    } finally query.stop()
  }

  test("stream-stream join matches follow-up events inside the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

    val joined = graft.streaming.StreamJoins.followedWithin(
      clicks.toDF().toDF("user_id", "ts", "value"),
      buys.toDF().toDF("user_id", "ts", "value"))
    val query = joined.writeStream.format("memory")
      .queryName("stream_join_test").outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), 1.0), (2L, ts(0), 2.0))
      buys.addData(
        (1L, ts(300), 10.0),  // within 600s -> match
        (2L, ts(700), 20.0))  // outside -> no match
      query.processAllAvailable()
      val rows = spark.table("stream_join_test").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 1L && rows.head.getDouble(4) == 10.0)
    } finally query.stop()
  }

  test("tumbling-window aggregation groups events into fixed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val events = input.toDF().toDF("event_type", "ts", "value")

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    input.addData(
      ("click", ts(0), 1.0),
      ("click", ts(30), 2.0),   // same 10-min window
      ("click", ts(700), 4.0),  // next window
      ("view", ts(10), 8.0))

    val query = graft.streaming.StreamingAggregates.windowedTypeCounts(events)
      .writeStream.format("memory").queryName("winagg_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("winagg_test").collect()
      val clicks = rows.filter(_.getString(0) == "click")
        .sortBy(_.getTimestamp(1).getTime)
      assert(clicks.length == 2)
      assert(clicks(0).getLong(2) == 2L && clicks(0).getDouble(3) == 3.0)
      assert(clicks(1).getLong(2) == 1L && clicks(1).getDouble(3) == 4.0)
      assert(rows.count(_.getString(0) == "view") == 1)
    } finally query.stop()
  }
}
