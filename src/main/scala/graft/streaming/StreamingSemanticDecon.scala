package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.AnnOps

/** Streaming twin of semantic decontamination
  * ([[AnnOps.decontaminationSemantic]]): arriving vectors are flagged
  * against the frozen eval cohort AT INGEST, so contaminated documents
  * never enter the training store instead of being swept by a later
  * batch audit — the embedding-space analogue of
  * [[StreamingDecontaminate]].
  *
  * The flag runs the batch operator's OWN per-row projection
  * ([[AnnOps.semanticFlags]] — shared expressions over the same
  * broadcast eval literal, not a re-derivation): with the eval cohort
  * frozen, flagging is stateless per vector, so there is no state store,
  * no watermark, and no batch-decomposition sensitivity. The
  * differential spec pins streamed flags == batch flags row-for-row.
  *
  * Scale shape: a map-only continuous query; per-row work is a constant
  * evalN cosine folds against literal vectors (no join, no shuffle) —
  * ingest throughput is the scan rate.
  */
object StreamingSemanticDecon {

  /** Flag rows over a streaming embeddings frame (needs `vec_id`,
    * `embedding`, `label`). Append mode; `evalVecs` is the frozen eval
    * cohort (collect it once from the batch side via
    * [[AnnOps.evalCohort]]).
    */
  def flags(
      vecs: DataFrame,
      evalVecs: Seq[Seq[Float]],
      tauMilli: Int = AnnOps.SemanticTauMilli): DataFrame =
    AnnOps.semanticFlags(vecs, evalVecs, tauMilli)
      .select("vec_id", "label", "max_cos_milli", "flagged")
}
