package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.operators.HllOps

/** Streaming distinct-user estimation — the streaming twin of the batch
  * [[graft.operators.HllOps]] pipeline: one 64-register fixed-point HLL
  * per tumbling window, held as the aggregation state itself.
  *
  * Why an Aggregator: Structured Streaming allows ONE aggregation per
  * query, so the batch shape (groupBy register → groupBy window) can't
  * be chained. The typed Aggregator collapses both levels — its buffer
  * IS the register array, reduced map-side per partition and max-merged
  * in the state store, exactly the algebra HLL's mergeability
  * guarantees. State per (window) key is a fixed 64-long array no
  * matter how many events the window sees, and the watermark evicts
  * closed windows — O(active windows) state, unbounded stream.
  *
  * The finish step runs [[HllOps.estimateRegisters]] — the SAME integer
  * estimator the batch SQL emits — so a streaming window's estimate is
  * bit-identical to the batch pipeline over the same rows (pinned by
  * the spec).
  */
object StreamingHll {

  /** Register buffer as a product type so the encoder stays tungsten. */
  final case class HllRegs(regs: Array[Long])

  /** user_id → windowed HLL registers → fixed-point estimate. */
  final class HllDistinct extends Aggregator[Long, HllRegs, Long] {
    override def zero: HllRegs = HllRegs(Array.fill(HllOps.Buckets.toInt)(0L))
    override def reduce(b: HllRegs, userId: Long): HllRegs = {
      val (idx, low) = HllOps.registerOf(userId)
      if (low > b.regs(idx)) b.regs(idx) = low
      b
    }
    override def merge(a: HllRegs, b: HllRegs): HllRegs = {
      var i = 0
      while (i < a.regs.length) {
        if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
        i += 1
      }
      a
    }
    override def finish(r: HllRegs): Long = HllOps.estimateRegisters(r.regs)
    override def bufferEncoder: Encoder[HllRegs] = Encoders.product[HllRegs]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Tumbling-window distinct-user estimates over a streaming events
    * frame (needs `ts` timestamp + `user_id`).
    */
  def windowedDistinctUsers(
      events: DataFrame,
      windowLength: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val hll = udaf(new HllDistinct, Encoders.scalaLong)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength))
      .agg(hll(col("user_id")).as("est_distinct"))
      .select(col("window.start").as("window_start"), col("est_distinct"))
  }
}
