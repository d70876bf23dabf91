package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Streaming heavy hitters per tumbling window — a Misra–Gries
  * (space-saving) summary held AS the aggregation state, the bounded
  * answer to "top talkers right now" that an exact groupBy(key) cannot
  * give on an unbounded key domain (its state would grow with distinct
  * keys; this state is a fixed `capacity` counters per window, full
  * stop).
  *
  * Same single-aggregation discipline as [[StreamingHll]]: the typed
  * Aggregator's buffer is the sketch, reduced map-side and merged in
  * the state store. Misra–Gries algebra: inserting a key not among the
  * `capacity` tracked counters decrements ALL counters (dropping
  * zeros) — the classical guarantee survives merging (counter sums
  * minus the (capacity+1)-largest overflow), so any key with true
  * frequency > n/(capacity+1) is guaranteed present, and every reported
  * count is a lower bound within n/(capacity+1) of truth. The spec pins
  * exactly that contract against exact per-window counts.
  */
object StreamingHeavyHitters {

  /** Fixed-capacity counter table as parallel arrays (tungsten-friendly
    * product encoder; a Map buffer would fall back to kryo).
    */
  final case class MgState(keys: Array[Long], counts: Array[Long])

  /** Finished summary as parallel arrays (product-encodable — a tuple
    * array would need a kryo-encoded binary column that `explode` can't
    * open).
    */
  final case class MgOut(users: Array[Long], counts: Array[Long])

  final class MisraGries(capacity: Int)
      extends Aggregator[Long, MgState, MgOut] {

    override def zero: MgState =
      MgState(Array.empty[Long], Array.empty[Long])

    private def insert(s: MgState, key: Long, inc: Long): MgState = {
      val i = s.keys.indexOf(key)
      if (i >= 0) { s.counts(i) += inc; s }
      else if (s.keys.length < capacity)
        MgState(s.keys :+ key, s.counts :+ inc)
      else {
        // Decrement-all by the smallest of (inc, current min counter):
        // the batched form of Misra–Gries's unit decrements.
        val dec = math.min(inc, s.counts.min)
        val kept = s.keys.zip(s.counts.map(_ - dec)).filter(_._2 > 0L)
        val rem = inc - dec
        if (rem > 0L && kept.length < capacity)
          MgState(kept.map(_._1) :+ key, kept.map(_._2) :+ rem)
        else MgState(kept.map(_._1), kept.map(_._2))
      }
    }

    override def reduce(b: MgState, key: Long): MgState = insert(b, key, 1L)

    override def merge(a: MgState, b: MgState): MgState = {
      var s = a
      var i = 0
      while (i < b.keys.length) { s = insert(s, b.keys(i), b.counts(i)); i += 1 }
      s
    }

    /** Surviving counters, largest first (key ascending on ties) — each
      * count is the MG lower bound.
      */
    override def finish(s: MgState): MgOut = {
      val sorted = s.keys.zip(s.counts).sortBy { case (k, c) => (-c, k) }
      MgOut(sorted.map(_._1), sorted.map(_._2))
    }

    override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
    override def outputEncoder: Encoder[MgOut] = Encoders.product[MgOut]
  }

  /** Tumbling-window heavy-hitter users over a streaming events frame
    * (needs `ts` timestamp + `user_id`). Emits one row per surviving
    * counter: (window_start, user_id, count_lb).
    */
  def windowedHeavyHitters(
      events: DataFrame,
      capacity: Int = 8,
      windowLength: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val mg = udaf(new MisraGries(capacity), Encoders.scalaLong)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength))
      .agg(mg(col("user_id")).as("hitters"))
      .select(col("window.start").as("window_start"),
        explode(arrays_zip(col("hitters.users"), col("hitters.counts")))
          .as("h"))
      .select(col("window_start"),
        col("h.users").as("user_id"), col("h.counts").as("count_lb"))
  }
}
