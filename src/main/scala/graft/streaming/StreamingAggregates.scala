package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregations over a streaming events frame —
  * the streaming counterpart of the batch `etl_summary_stats` /
  * `window_funcs` family.
  *
  * Scale notes: tumbling windows keep exactly one state row per
  * (event_type, window) pair; the watermark bounds how long closed
  * windows linger before eviction, so state size is O(active windows),
  * independent of stream length. Partial aggregation happens map-side
  * before the state-store shuffle, same as the batch hash aggregate.
  */
object StreamingAggregates {

  /** Tumbling-window count/sum per event type. */
  def windowedTypeCounts(
      events: DataFrame,
      windowLength: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("event_type"), window(col("ts"), windowLength))
      .agg(count(lit(1)).as("events"), sum("value").as("value_sum"))
      .select(
        col("event_type"),
        col("window.start").as("window_start"),
        col("events"),
        col("value_sum"))
}
