package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.LloydOps

/** Streaming IVF index ingest — the live half of ANN index maintenance:
  * as embedding micro-batches land, each vector is filed into its
  * nearest FROZEN Lloyd list (centroids are a plan literal from the
  * existing index artifact — assignment is stateless Column algebra, no
  * join, no shuffle of vectors) and a per-list ingest manifest is kept
  * live, so the index maintainer knows each list's arrival count, id
  * range, and content digest without a batch re-read — the
  * [[StreamingManifest]] pattern pointed at the ANN tier.
  *
  * The whole twin is the batch operator's OWN expressions
  * ([[LloydOps.listAssignment]] + [[LloydOps.ivfManifestAgg]], shared,
  * not re-derived): every manifest aggregate is a commutative monoid
  * (count, min/max, exact decimal digest sum with the mod applied at
  * emit), so any batch decomposition of the stream lands on the batch
  * manifest — pinned by the differential spec against the registered
  * `ivf_ingest_manifest` entry's frame.
  *
  * Scale/state shape: state is ONE constant-width row per list (≈ √n
  * lists for an index at the [[LloydOps.listsFor]] operating point),
  * regardless of ingest volume — unbounded stream, bounded state, no
  * watermark needed. Re-centering (periodically re-running Lloyd and
  * re-freezing) is an offline index rebuild by design, exactly as in a
  * production IVF system: ingest never mutates centroids.
  */
object StreamingIvfIngest {

  /** Live per-list manifests over a streaming embeddings frame (needs
    * `vec_id`, `embedding`). Run with outputMode("complete") or
    * "update" — every incoming vector revises exactly one list row.
    */
  def manifests(vecs: DataFrame, cents: Array[Array[Long]]): DataFrame =
    LloydOps.ivfManifestAgg(LloydOps.listAssignment(vecs, cents))
}
