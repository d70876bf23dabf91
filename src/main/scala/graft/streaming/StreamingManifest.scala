package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.SampleOps

/** Streaming twin of the content-addressed shard manifest
  * ([[SampleOps.shardManifest]]): as document micro-batches land, keep a
  * live per-shard manifest (doc count, byte mass, id range, running
  * content digest) so a publisher can seal and ship a shard the moment
  * its ingest window closes — without a batch re-read of what streamed
  * in.
  *
  * The whole twin is the batch operator's OWN aggregation
  * ([[SampleOps.manifestAgg]] — shared expressions, not a re-derivation):
  * every aggregate in it is a commutative monoid (count, sums, min/max),
  * so Structured Streaming's state-store merge is exactly the batch
  * fold, and a stream chopped into ANY batch decomposition lands on the
  * digest the batch pass computes over the union (pinned by the
  * differential spec). The one non-obvious piece is the digest: Σ fp mod
  * prime commutes with partial sums because the mod is applied at emit,
  * not in state — state carries the exact decimal(38,0) running sum.
  *
  * Scale/state shape: state is ONE row per shard (nShards rows total,
  * constant width) no matter how many documents stream through —
  * unbounded stream, O(nShards) state, no watermark needed.
  */
object StreamingManifest {

  /** Live per-shard manifests over a streaming documents frame (needs
    * `doc_id`, `text`, `n_chars`). Run with outputMode("complete") or
    * "update" — every incoming doc revises exactly one shard row.
    */
  def manifests(docs: DataFrame, nShards: Int = 16): DataFrame =
    SampleOps.manifestAgg(docs, nShards)
}
