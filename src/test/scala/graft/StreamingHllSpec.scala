package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HllOps
import graft.streaming.StreamingHll

/** The streaming HLL twin must emit BIT-IDENTICAL estimates to the
  * batch register algebra over the same rows — mergeability means the
  * state-store max-merge path and a single-pass fold land on the same
  * registers no matter how the stream is chopped into batches.
  */
class StreamingHllSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def batchEstimate(userIds: Seq[Long]): Long = {
    val regs = Array.fill(HllOps.Buckets.toInt)(0L)
    userIds.foreach { u =>
      val (i, low) = HllOps.registerOf(u)
      if (low > regs(i)) regs(i) = low
    }
    HllOps.estimateRegisters(regs)
  }

  test("windowed estimates equal the single-pass register fold per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")

    val t0 = 1700000000000L // epoch millis, aligned far from window edges
    def ts(minute: Long) = new Timestamp(t0 + minute * 60000)
    // Two 10-minute windows; user 7 repeats within and across windows,
    // and the data arrives across MULTIPLE addData batches so the
    // state-store merge path actually runs.
    val w1 = Seq(1L, 2L, 3L, 7L, 7L, 11L, 13L)
    val w2 = Seq(7L, 99L, 100L, 101L)
    input.addData(w1.take(3).map(u => (ts(0), u)): _*)
    input.addData(w1.drop(3).map(u => (ts(5), u)): _*)
    input.addData(w2.map(u => (ts(12), u)): _*)

    val query = StreamingHll.windowedDistinctUsers(events)
      .writeStream.format("memory").queryName("hll_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("hll_test").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      assert(rows.size == 2)
      val starts = rows.keys.toSeq.sorted
      assert(rows(starts.head) == batchEstimate(w1))
      assert(rows(starts.last) == batchEstimate(w2))
      // Small-cardinality windows sit in the linear-counting branch and
      // should be near-exact there (m=64 >> n).
      assert(math.abs(rows(starts.head) - 6L) <= 2L)
      assert(math.abs(rows(starts.last) - 4L) <= 2L)
    } finally query.stop()
  }

  test("estimator cross-checks the batch SQL pipeline at sf0.001") {
    import org.apache.spark.sql.functions._
    val sf = TestSession.sf
    val est = batchEstimate(Tables.events(spark, sf)
      .select(col("user_id")).collect().map(_.getLong(0)).toSeq)
    val sqlEst = HllOps.hllDistinctUsers(spark, sf)
      .collect()(0).getLong(1)
    assert(est == sqlEst,
      "Scala estimator diverges from the SQL register pipeline")
  }
}
