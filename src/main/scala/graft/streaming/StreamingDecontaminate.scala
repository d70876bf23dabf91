package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.TextOps.decontaminate]]: a
  * STREAM–STATIC anti-join — continuously ingested training documents are
  * dropped the moment their exact text digest matches the (static) eval
  * set. This is the shape a live ingest pipeline needs: the benchmark
  * corpus is fixed at deploy time, the training stream is not.
  *
  * Scale notes: the static side collapses to a distinct 64-byte digest
  * column before the join, so Spark broadcasts it to every task and the
  * stream side is filtered in-flight — stateless (no watermark, no state
  * store), because a static right side makes the anti-join decidable
  * per-row. Digest computation on the stream side is codegen'd sha2 over
  * each micro-batch.
  */
object StreamingDecontaminate {

  /** Surviving stream rows: `docs` (streaming, with a `text` column)
    * minus rows whose digest appears in static `evalDocs`.
    */
  def clean(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val digests = evalDocs
      .select(sha2(col("text"), 256).as("__eval_digest"))
      .distinct()
    docs
      .withColumn("text_hash", sha2(col("text"), 256))
      .join(digests, col("text_hash") === col("__eval_digest"), "left_anti")
  }
}
