package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps
import graft.streaming.StreamingChunks

/** Differential contract: streamed chunks equal the batch chunking over
  * the same documents — chunking is stateless per doc, so any batch
  * decomposition yields identical rows.
  */
class StreamingChunksSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("streamed chunks equal the batch chunking row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.length >= 100)

    val input = MemoryStream[(Long, String)]
    val frame = input.toDF().toDF("doc_id", "text")
    input.addData(docs.take(31): _*)
    input.addData(docs.drop(31): _*)

    val query = StreamingChunks.chunks(frame)
      .writeStream.format("memory").queryName("chunks_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("chunks_test").collect()
        .map(_.toSeq).toSet
      val batch = TextOps.chunkDocuments(spark, sf).collect()
        .map(_.toSeq).toSet
      assert(streamed == batch)
    } finally query.stop()
  }
}
