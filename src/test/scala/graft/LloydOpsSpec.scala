package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LloydOps

class LloydOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("two planted blobs converge to the exact integer blob means") {
    val d = emb(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.2f, 0.0f), 3L -> Seq(0.0f, 0.2f),
      4L -> Seq(10.0f, 10.0f), 5L -> Seq(10.2f, 10.0f), 6L -> Seq(10.0f, 10.2f))
    val (cents, sizes) = LloydOps.run(d, 2, 4)
    // Init is the two lowest ids — BOTH in blob A — so convergence to
    // one-centroid-per-blob exercises real reassignment, not just init.
    assert(sizes.toSeq == Seq(3L, 3L))
    // Integer means: blob A (0+200000+0)/3 = 66666 per dim; blob B
    // (10000000+10200000+10000000)/3 = 10066666 per dim.
    assert(cents(0).toSeq == Seq(66666L, 66666L))
    assert(cents(1).toSeq == Seq(10066666L, 10066666L))
  }

  test("an emptied cluster keeps its previous centroid; ties go to the lowest cluster") {
    // Points 1 and 3 are identical, so init centroids c0 and c2 coincide:
    // every point tied between them must choose c0 (lowest cluster id),
    // leaving c2 empty — which must carry its centroid, not divide by 0.
    val d = emb(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(5.0f, 5.0f), 3L -> Seq(0.0f, 0.0f))
    val (cents, sizes) = LloydOps.run(d, 3, 3)
    assert(sizes.toSeq == Seq(2L, 1L, 0L))
    assert(cents(2).toSeq == Seq(0L, 0L)) // carried init value
    assert(cents(0).toSeq == Seq(0L, 0L))
    assert(cents(1).toSeq == Seq(5000000L, 5000000L))
  }

  test("registered query: k×dims rows, sizes conserve the corpus, deterministic") {
    val out = LloydOps.kmeansLloyd(spark, TestSession.sf).collect()
    assert(out.length == LloydOps.K * LloydOps.Dims)
    val sizes = out.filter(_.getLong(1) == 0L).map(r => r.getLong(0) -> r.getLong(3))
    val total = Tables.embeddings(spark, TestSession.sf).count()
    assert(sizes.map(_._2).sum == total)
    val again = LloydOps.kmeansLloyd(spark, TestSession.sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
