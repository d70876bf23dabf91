package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._

class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val t0 = 1700000000000L
  private def ts(sec: Long) = new Timestamp(t0 + sec * 1000)

  test("mergeEvents closes a session when the gap is exceeded") {
    val events = Seq(
      SessionEvent(1L, ts(0), 1.0),
      SessionEvent(1L, ts(600), 2.0),
      SessionEvent(1L, ts(3000), 4.0))
    val (closed, open) = StatefulSessions.mergeEvents(1L, events, None, 1800 * 1000L)
    assert(closed.length == 1)
    assert(closed.head.events == 2L && closed.head.value_sum == 3.0)
    assert(closed.head.session_end == ts(600))
    assert(open.exists(o => o.events == 1L && o.valueSum == 4.0))
  }

  test("flatMapGroupsWithState emits sessions closed across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val query = StatefulSessions.sessions(spark, input.toDS())
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode("append").start()
    try {
      input.addData(SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(600), 2.0))
      query.processAllAvailable()
      assert(spark.table("stateful_sessions").count() == 0) // still open

      input.addData(SessionEvent(1L, ts(4000), 8.0)) // closes the first
      query.processAllAvailable()
      val rows = spark.table("stateful_sessions").as[ClosedSession].collect()
      assert(rows.length == 1)
      assert(rows.head.user_id == 1L && rows.head.events == 2L && rows.head.value_sum == 3.0)
    } finally query.stop()
  }
}
