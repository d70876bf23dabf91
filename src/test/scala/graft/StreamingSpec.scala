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
}
