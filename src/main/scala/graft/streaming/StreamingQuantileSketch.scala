package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the fixed-grid quantile sketch
  * ([[graft.operators.StatsOps.quantileSketchAudit]]'s sketch tier): the
  * state IS the sketch — per (event_type, bucket) counts on the same
  * signed data-independent grid, revised as micro-batches land. Because
  * the grid needs no min/max pre-pass, counts merge by plain addition,
  * so Structured Streaming's state-store merge is exactly the batch
  * fold: a stream chopped into ANY batch decomposition lands on the
  * batch sketch (pinned by the differential spec), and quantile
  * estimates read off the live table are within one bucket width of
  * exact — the SAME bound the batch audit hash-gates.
  *
  * Scale/state shape: O(types × value-range/width) state rows no matter
  * how many events stream through; no watermark needed (the grid is the
  * eviction policy — it does not grow with rows).
  */
object StreamingQuantileSketch {

  /** Live (event_type, bucket, c) sketch over a streaming events frame
    * (needs `event_type`, `value`). Run with outputMode "update" or
    * "complete"; estimates are read from the result table with the batch
    * probe logic.
    */
  def sketch(events: DataFrame, widthMilli: Int = 250): DataFrame =
    events
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000 + 0.5).cast("long").as("vm"))
      .select(col("event_type"),
        floor(col("vm").cast("double") / widthMilli).cast("long").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("c"))
}
