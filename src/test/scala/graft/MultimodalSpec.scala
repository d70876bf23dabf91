package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  private lazy val payloads =
    MultimodalOps.withPayload(Tables.documents(spark, sf).limit(20))

  test("payload byte length matches the metadata frame accounting") {
    val rows = payloads
      .select(col("doc_id"), octet_length(col("payload")).as("len"), col("meta.n_frames"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(2) == r.getInt(1) / MultimodalOps.FrameBytes + 1)
    }
  }

  test("mapPartitions feature extraction matches codegen'd digests") {
    // The stubbed decoder's head hash must equal Spark's native md5 of the
    // same prefix — pins the imperative path to the declarative one.
    val expected = payloads
      .select(col("doc_id"),
        md5(col("payload").substr(lit(1), lit(MultimodalOps.FrameBytes))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val feats = MultimodalOps.extractFeatures(spark, payloads).collect()
    assert(feats.length == expected.size)
    feats.foreach { f =>
      assert(f.head_hash == expected(f.doc_id))
      assert(f.byte_len > 0)
      assert(f.bytes_mean_milli >= 0 && f.bytes_mean_milli <= 255000)
    }
  }

  test("frame sampling emits every 4th fixed-size frame") {
    val frames = MultimodalOps.sampleFrames(payloads).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getInt(1) % 4 == 0)
      val frame = r.getAs[Array[Byte]]("frame")
      assert(frame.length <= MultimodalOps.FrameBytes && frame.nonEmpty)
    }
    // frame 0 is the payload prefix
    val byDoc = payloads.select(col("doc_id"), col("payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    frames.filter(_.getInt(1) == 0).foreach { r =>
      val frame = r.getAs[Array[Byte]]("frame")
      assert(frame.sameElements(byDoc(r.getLong(0)).take(frame.length)))
    }
  }
}
