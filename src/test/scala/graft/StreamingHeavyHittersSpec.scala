package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingHeavyHitters

/** The streaming Misra–Gries summary must honor the classical sketch
  * contract per window: every key with true frequency > n/(capacity+1)
  * is present, and every reported count is a lower bound within
  * n/(capacity+1) of the true count — regardless of how the stream is
  * chopped into addData batches (the state-store merge path).
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("per-window counters honor the Misra-Gries guarantee across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")

    val t0 = 1700000000000L
    def ts(minute: Long) = new Timestamp(t0 + minute * 60000)
    val cap = 4
    // Window 1: user 1 dominates (12 of 24), user 2 is heavy (6), the
    // rest is a spread of singletons. Window 2: two heavies.
    val w1 = Seq.fill(12)(1L) ++ Seq.fill(6)(2L) ++ (100L to 105L)
    val w2 = Seq.fill(5)(42L) ++ Seq.fill(4)(43L) ++ Seq(200L, 201L)
    input.addData(w1.take(9).map(u => (ts(0), u)): _*)
    input.addData(w1.drop(9).map(u => (ts(4), u)): _*)
    input.addData(w2.map(u => (ts(12), u)): _*)

    val query = StreamingHeavyHitters
      .windowedHeavyHitters(events, capacity = cap)
      .writeStream.format("memory").queryName("mg_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("mg_test").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
      val byWindow = rows.groupBy(_._1).view
        .mapValues(_.map(x => x._2 -> x._3).toMap).toMap
      assert(byWindow.size == 2)
      val Seq(s1, s2) = byWindow.keys.toSeq.sorted

      def check(got: Map[Long, Long], truth: Seq[Long]): Unit = {
        val n = truth.size.toLong
        val err = n / (cap + 1)
        val exact = truth.groupBy(identity).view.mapValues(_.size.toLong)
        // Guaranteed presence above the threshold…
        exact.filter(_._2 > err).foreach { case (k, c) =>
          assert(got.contains(k), s"key $k (count $c) must survive")
        }
        // …and every reported count is a sound lower bound within err.
        got.foreach { case (k, lb) =>
          val c = exact.getOrElse(k, 0L)
          assert(lb <= c && lb >= c - err, s"key $k: lb $lb vs true $c")
        }
        assert(got.size <= cap)
      }
      check(byWindow(s1), w1)
      check(byWindow(s2), w2)
      // The dominators are not just present but top-ranked by count.
      assert(byWindow(s1).maxBy(_._2)._1 == 1L)
      assert(byWindow(s2).maxBy(_._2)._1 == 42L)
    } finally query.stop()
  }
}
