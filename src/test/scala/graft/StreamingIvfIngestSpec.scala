package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LloydOps
import graft.streaming.StreamingIvfIngest

/** Differential contract: streaming IVF ingest over ANY batch
  * decomposition of a vector stream equals the batch assignment +
  * manifest over its union — frozen centroids make assignment stateless
  * and the manifest aggregates are monoids, so the equality is exact.
  */
class StreamingIvfIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("streaming list manifests equal the batch manifests over the same vectors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val emb = Tables.embeddings(spark, sf)
    // Freeze the index: centroids from the existing batch corpus.
    val (cents, _) =
      LloydOps.run(emb, LloydOps.listsFor(emb.count()), LloydOps.Iters)

    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    assert(vecs.length >= 100)

    val input = MemoryStream[(Long, Array[Float])]
    val frame = input.toDF().toDF("vec_id", "embedding")
    // Three uneven micro-batches so the state-store merge path runs.
    input.addData(vecs.take(13): _*)
    input.addData(vecs.slice(13, 200): _*)
    input.addData(vecs.drop(200): _*)

    val query = StreamingIvfIngest.manifests(frame, cents)
      .writeStream.format("memory").queryName("ivf_ingest_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("ivf_ingest_test").collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val batch = LloydOps
        .ivfManifestAgg(LloydOps.listAssignment(emb, cents))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(streamed == batch)
      // Every vector is filed exactly once.
      assert(streamed.values.map(_.head.asInstanceOf[Long]).sum
        == vecs.length.toLong)
    } finally query.stop()
  }

  test("the registered batch entry carries the same manifests") {
    val viaEntry = LloydOps.ivfIngestManifest(spark, sf).collect()
    assert(viaEntry.nonEmpty)
    // Digests are in range and id bounds are ordered.
    viaEntry.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) < LloydOps.IngestFpPrime)
      assert(r.getLong(2) <= r.getLong(3))
    }
  }
}
