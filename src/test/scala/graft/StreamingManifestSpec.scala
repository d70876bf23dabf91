package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SampleOps
import graft.streaming.StreamingManifest

/** Differential contract: the streaming manifest over ANY batch
  * decomposition of a corpus equals the batch manifest over its union —
  * the mergeable-monoid property the digest design exists to guarantee.
  */
class StreamingManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("streaming manifests equal the batch manifest over the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)]
      .collect()
    assert(docs.length >= 100)

    val input = MemoryStream[(Long, String, Long)]
    val frame = input.toDF().toDF("doc_id", "text", "n_chars")
    // Three uneven micro-batches so the state-store merge path runs.
    input.addData(docs.take(7): _*)
    input.addData(docs.slice(7, 80): _*)
    input.addData(docs.drop(80): _*)

    val query = StreamingManifest.manifests(frame)
      .writeStream.format("memory").queryName("manifest_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("manifest_test").collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val batch = SampleOps.shardManifest(Tables.documents(spark, sf))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(streamed == batch)
    } finally query.stop()
  }
}
