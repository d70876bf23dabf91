package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state.
  *
  * Scale notes: both sides buffer only rows newer than their watermark;
  * the range condition lets Spark evict a row as soon as no future match
  * can arrive, so state is O(rows inside the join window), independent of
  * stream length. The join key partitions both state stores identically —
  * the streaming analogue of a co-located batch join.
  */
object StreamJoins {

  /** Join two event streams per user where the right event follows the
    * left within `windowSeconds` — e.g. "click followed by purchase".
    */
  def followedWithin(
      left: DataFrame,
      right: DataFrame,
      windowSeconds: Long = 600L,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(
      r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("l_ts"), col("r_ts"), col("l_value"), col("r_value"))
  }
}
