package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.TextOps

/** Streaming twin of RAG document chunking
  * ([[TextOps.chunkDocuments]]): chunk documents as they land so a live
  * retrieval index ingests chunk rows (offsets + content digests)
  * continuously instead of waiting for a batch re-chunk.
  *
  * The whole twin IS the batch operator's projection
  * ([[TextOps.chunksOf]] — shared expressions, not a re-derivation):
  * chunking is stateless per document, so there is no state store, no
  * watermark, and no batch-decomposition sensitivity — the differential
  * spec pins streamed chunks == batch chunks row-for-row. Scale shape:
  * a map-only continuous query whose cost is the scan itself.
  */
object StreamingChunks {

  /** Chunk rows over a streaming documents frame (needs `doc_id`,
    * `text`). Append mode.
    */
  def chunks(
      docs: DataFrame,
      chunkSize: Int = TextOps.ChunkTokens,
      overlap: Int = TextOps.ChunkOverlap): DataFrame =
    TextOps.chunksOf(docs, chunkSize, overlap)
}
