package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of the batch
  * `dedup_exact` operator: keep the first document per text digest,
  * drop later copies.
  *
  * Scale notes: `dropDuplicatesWithinWatermark` keys state on the
  * 64-byte sha256 digest only (never the document body) and evicts a
  * digest once its event time falls behind the watermark — so state is
  * O(documents per watermark window), independent of stream length.
  * Unbounded-history dedup on an infinite stream is impossible by
  * construction; the watermark IS the contract for how far apart two
  * copies may arrive and still dedup, and at 100 TB/day that bound is
  * what keeps the state store finite.
  */
object StreamingDedup {

  /** First-seen documents from a streaming (doc_id, ts, text) frame;
    * duplicates of a digest arriving within `watermarkDelay` are dropped.
    */
  def firstSeen(
      docs: DataFrame,
      watermarkDelay: String = "30 minutes"): DataFrame =
    docs
      .withColumn("text_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
      .select(col("doc_id"), col("ts"), col("text_hash"))
}
