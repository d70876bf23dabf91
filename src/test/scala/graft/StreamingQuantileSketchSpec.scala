package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingQuantileSketch

/** Differential contract: the streamed sketch over any batch
  * decomposition equals the batch sketch over the union — grid counts
  * merge by addition, so the state-store path IS the batch fold.
  */
class StreamingQuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("streamed sketch equals the batch sketch over the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
      .collect()
    assert(events.length >= 100)

    val input = MemoryStream[(String, Double)]
    val frame = input.toDF().toDF("event_type", "value")
    input.addData(events.take(13): _*)
    input.addData(events.slice(13, 500): _*)
    input.addData(events.drop(500): _*)

    val query = StreamingQuantileSketch.sketch(frame)
      .writeStream.format("memory").queryName("qsketch_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("qsketch_test").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = StreamingQuantileSketch.sketch(
        Tables.events(spark, sf).select(col("event_type"), col("value")))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      // Grid bound: the sketch never holds more rows than the
      // full-resolution value set it coarsens (width 250 => >= 4:1
      // collapse per occupied milli-range at corpus scale; at test SF
      // the spread-out values make the ratio modest but the bound holds).
      val fullRes = events.map { case (t, v) =>
        (t, math.floor(v * 1000 + 0.5).toLong)
      }.distinct.length
      assert(streamed.size <= fullRes, s"${streamed.size} > $fullRes")
    } finally query.stop()
  }
}
