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

  test("clamped CDC chunker: tiling, clamp bounds, and cut provenance") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val byDoc = docs.as[(Long, Array[Byte])].collect().toMap
    val chunks = MultimodalOps.cdcChunksClamped(spark, docs).collect()
      .groupBy(_.doc_id)
    // Pure-predicate cut positions per doc (the gated variant's cuts).
    val pureCuts = MultimodalOps.cdcChunks(docs)
      .collect() // (doc_id, hash, clen) — rebuild positions by prefix sum
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).scanLeft(0L)(_ + _).toSet).toMap
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.chunk_idx)
      val len = byDoc(id).length.toLong
      // Tiling: contiguous, exactly covering the payload.
      assert(sorted.head.cstart == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.cstart == a.cstart + a.clen)
        case _ =>
      }
      assert(sorted.map(_.clen).sum == len)
      // Clamp bounds: every chunk <= max; every non-tail chunk >= min.
      sorted.foreach(c => assert(c.clen <= MultimodalOps.CdcMaxLen))
      sorted.dropRight(1).foreach(c =>
        assert(c.clen >= MultimodalOps.CdcMinLen))
      // Provenance: every interior cut is a pure-predicate boundary or
      // closes a forced max-length chunk.
      sorted.dropRight(1).foreach { c =>
        val cutPos = c.cstart + c.clen - 1
        assert(
          pureCuts(id).contains(cutPos) || c.clen == MultimodalOps.CdcMaxLen,
          s"doc $id cut at $cutPos is neither content boundary nor max-cut")
      }
    }
  }

  test("clamped CDC chunker: shifted duplicates still collide") {
    import spark.implicits._
    val shared = (1 to 60).map(k => s"sw$k").mkString(" ")
    val docs = Seq(
      (1L, s"p1 p2 p3 $shared"),
      (2L, s"q1 q2 q3 q4 q5 q6 q7 q8 q9 $shared"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val cs = MultimodalOps.cdcChunksClamped(spark, docs).collect()
    val d1 = cs.filter(_.doc_id == 1L).map(_.chunk_hash).toSet
    val d2 = cs.filter(_.doc_id == 2L).map(_.chunk_hash).toSet
    assert((d1 & d2).nonEmpty,
      "shifted shared region must re-sync to at least one common chunk")
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
