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

  test("CDC chunking: shifted duplicates collide, boundaries are content-local") {
    import spark.implicits._
    // A long shared body embedded at DIFFERENT offsets in two documents:
    // the fixed frame grid sees disjoint frames, but CDC boundaries are a
    // pure content predicate, so every interior chunk of the shared body
    // must collide by digest.
    val shared = (1 to 40).map(k => s"sharedword$k").mkString(" ")
    val docs = Seq(
      (1L, s"prefix one two three $shared"),
      (2L, s"a completely different and much longer leading text $shared"),
      (3L, "nothing in common with the others at all here"))
      .toDF("doc_id", "text")
    val chunks = MultimodalOps.cdcChunks(
      docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // Chunk lengths of each doc must sum to its text length.
    val byDoc = chunks.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    docs.collect().foreach { r =>
      assert(byDoc(r.getLong(0)) == r.getString(1).length.toLong)
    }
    // The shared body produces >= 2 digest collisions across docs 1 and 2.
    val d1 = chunks.filter(_._1 == 1L).map(_._2).toSet
    val d2 = chunks.filter(_._1 == 2L).map(_._2).toSet
    assert((d1 & d2).size >= 2,
      s"shifted shared body must collide (got ${(d1 & d2).size} shared chunks)")
    // The unrelated doc shares nothing.
    val d3 = chunks.filter(_._1 == 3L).map(_._2).toSet
    assert((d3 & (d1 | d2)).isEmpty)
  }

  test("CDC chunk rollup is consistent on the sf corpus") {
    val row = MultimodalOps.mediaCdcDedup(spark, sf).collect().head
    val total = row.getAs[Long]("total_chunks")
    val distinct = row.getAs[Long]("distinct_chunks")
    val dedupable = row.getAs[Long]("dedupable_chunks")
    assert(total > 0 && distinct > 0)
    assert(distinct + dedupable == total)
    assert(row.getAs[Long]("dedupable_bytes") <= row.getAs[Long]("total_bytes"))
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
