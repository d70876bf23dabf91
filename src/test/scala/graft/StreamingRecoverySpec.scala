package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingAggregates

/** State-store recovery contract: a STATEFUL windowed aggregation is
  * stopped mid-stream and restarted from its checkpoint; the restarted
  * query must carry the first run's partial window counts (the boundary
  * window spans both runs), finalize every real window once the
  * watermark passes, and land append-exactly-once on the batch answer.
  * This is the recovery half of the streaming story — the exactly-once
  * test in StreamingSpec covers a stateless ingest; this one proves the
  * state store itself survives the restart.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("stateful windowed agg resumes from checkpoint and matches batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-recovery")
    val landing = tmp.resolve("landing").toString
    val out = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt").toString

    val ev = Tables.events(spark, sf)
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("event_type"), col("value"))
    val Array(t0, t1) = ev
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().headOption.map(r => Array(r.getLong(0), r.getLong(1))).get
    val cut = t0 + (t1 - t0) * 6 / 10
    val chunk1 = ev.filter(col("ts") < expr(s"timestamp_micros(${cut}L)"))
    val chunk2 = ev.filter(col("ts") >= expr(s"timestamp_micros(${cut}L)"))
    assert(chunk1.count() > 0 && chunk2.count() > 0)

    // Run 1: first 60% of event time, then STOP (windows at the cut
    // boundary hold partial counts in the state store).
    chunk1.write.mode("append").parquet(landing)
    def start() = {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2).parquet(landing)
      StreamingAggregates.windowedTypeCounts(stream, "1 hour", "1 second")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // Land the rest plus a far-future sentinel that pushes the watermark
    // past every real window so append mode finalizes them all.
    val sentinel = spark.range(1).select(
      lit(-1L).as("event_id"),
      expr(s"timestamp_micros(${t1 + 86400L * 1000000L}L)").as("ts"),
      lit("zz_sentinel").as("event_type"),
      lit(0.0).as("value"))
    chunk2.union(sentinel).write.mode("append").parquet(landing)

    // Run 2: SAME checkpoint — the restarted query must restore the
    // boundary window's partial state, not recount from zero.
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val streamed = spark.read.parquet(out)
      .filter(col("event_type") =!= "zz_sentinel")
      .select(col("event_type"), col("window_start"), col("events"),
        round(col("value_sum"), 4).as("vs"))
      .collect().map(_.toSeq).toSet
    val batch = StreamingAggregates.windowedTypeCounts(ev, "1 hour", "1 second")
      .select(col("event_type"), col("window_start"), col("events"),
        round(col("value_sum"), 4).as("vs"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
  }
}
