package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{PiiOps, TextOps}

/** End-to-end streaming curation: the batch `curation_pipeline`'s
  * streaming twin — quality-filter → PII-scrub → first-seen dedup in ONE
  * continuous query over a streaming (doc_id, ts, text) frame.
  *
  * Composability is the point: [[TextOps.qualityFlags]] and
  * [[PiiOps.redact]] are stateless narrow Column algebra, so they bolt
  * onto an unbounded stream unchanged — no new operator code, no extra
  * state. The ONLY stateful stage is the final watermark-bounded digest
  * dedup ([[StreamingDedup]]'s contract: state is O(docs per watermark
  * window), keyed on 64-byte digests of the CLEANED text, so two copies
  * differing only in scrubbed PII still collapse).
  *
  * Stage order matters and is part of the contract: redact BEFORE
  * digesting (PII variants dedup together, and no raw PII ever enters
  * the state store), filter BEFORE both (dropped docs cost no scrub or
  * state at all).
  */
object StreamingCuration {

  /** Surviving documents: quality-kept, scrubbed, first-seen per cleaned
    * digest within the watermark. Emits (doc_id, ts, clean_text,
    * clean_hash).
    */
  def curate(docs: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    TextOps.qualityFlags(docs)
      .filter(col("keep") === 1)
      .select(col("doc_id"), col("ts"),
        PiiOps.redact(col("text")).as("clean_text"))
      .withColumn("clean_hash", sha2(col("clean_text"), 256))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("clean_hash")
      .select("doc_id", "ts", "clean_text", "clean_hash")
}
