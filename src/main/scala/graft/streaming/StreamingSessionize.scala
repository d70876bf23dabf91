package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming sessionization: the streaming twin of
  * `graft.operators.WindowOps.sessionize`. One boundary tick differs:
  * `session_window` merges an event landing exactly at the previous
  * window's end, so a session closes only after STRICTLY MORE than
  * `gapSeconds` of inactivity, where the batch operator's `gap_us >= gap`
  * convention already closes at exactly `gapSeconds`.
  *
  * Built on `session_window` + watermark, so state is bounded: sessions
  * older than the watermark delay are finalized and evicted. Grouping is
  * `(user_id, session_window)` — state partitions by user exactly like the
  * batch window's single `user_id` exchange.
  *
  * Scale notes (continuous 100 TB/day shape): per-key state is O(open
  * sessions), not O(events), because session_window stores merged window
  * bounds + running aggregates. Skewed users produce hot state partitions;
  * the mitigation is the same salting/AQE story as batch, or a shorter
  * watermark delay to bound retained state.
  */
object StreamingSessionize {

  /** Per-session aggregate over a (possibly streaming) events frame with a
    * proper timestamp `ts` column: one output row per closed session.
    */
  def sessions(
      events: DataFrame,
      gapSeconds: Long = 1800L,
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("events"), sum("value").as("value_sum"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("events"),
        col("value_sum"))
}
