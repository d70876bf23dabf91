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

  test("silhouette: well-separated planted blobs score near 1000, exact values") {
    val d = emb(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.2f, 0.0f), 3L -> Seq(0.0f, 0.2f),
      4L -> Seq(10.0f, 10.0f), 5L -> Seq(10.2f, 10.0f), 6L -> Seq(10.0f, 10.2f))
    val out = LloydOps.silhouetteOf(d, 2, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._2).sum == 6L, "every point scored exactly once")
    // Converged centroids (from the blob-means test): (66666, 66666) and
    // (10066666, 10066666). Per point a = dist^2 to own mean ~ 2*66666^2
    // scale, b ~ 2*10e6^2 scale -> s_milli = ((b-a)*1000) div b ~ 999.
    out.foreach { case (cl, n, s, intra) =>
      assert(n == 3L, s"cluster $cl size")
      assert(s >= 990L && s <= 1000L, s"cluster $cl mean_s_milli=$s")
      assert(intra >= 0L, s"cluster $cl intra=$intra")
    }
  }

  test("silhouette registered query: bounds, conservation, determinism") {
    val out = LloydOps.kmeansSilhouette(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.embeddings(spark, TestSession.sf).count()
    assert(out.map(_._2).sum == total, "cluster sizes conserve the corpus")
    out.foreach { case (cl, _, s, intra) =>
      assert(cl >= 0L && cl < LloydOps.K)
      // Simplified silhouette is (b-a)/max(a,b) with b >= a >= 0.
      assert(s >= 0L && s <= 1000L, s"cluster $cl mean_s_milli=$s")
      assert(intra >= 0L)
    }
    // NOTE: sizes here come from re-assignment under the FINAL centroids
    // (post-round-4 update); kmeans_lloyd's n is the round-4 entering
    // assignment — equal only at convergence, so not cross-asserted.
    val again = LloydOps.kmeansSilhouette(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq, "deterministic across runs")
  }

  test("purity: label-aligned planted blobs are pure; mixed blob splits majority") {
    import spark.implicits._
    // Blob A = label 7 (pure); blob B mixes labels 3 (x2) and 9 (x1):
    // majority must be 3 with purity 666.
    val d = Seq(
      (1L, Seq(0.0f, 0.0f), 7), (2L, Seq(0.2f, 0.0f), 7), (3L, Seq(0.0f, 0.2f), 7),
      (4L, Seq(10.0f, 10.0f), 3), (5L, Seq(10.2f, 10.0f), 3), (6L, Seq(10.0f, 10.2f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = LloydOps.purityOf(d, 2, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._2).sum == 6L)
    val byCluster = out.map(t => t._1 -> t).toMap
    val pure = out.find(_._4 == 7L).get
    assert(pure._2 == 3L && pure._3 == 1L && pure._5 == 1000L)
    val mixed = out.find(_._4 == 3L).get
    assert(mixed._2 == 3L && mixed._3 == 2L && mixed._5 == 666L)
    assert(byCluster.size == 2)
  }

  test("knn_graph_ivf: planted blobs recover their own-blob neighbors exactly") {
    import spark.implicits._
    // Four tight angular blobs of 8 at orthogonal/opposed directions
    // (cross-blob cosine <= 0), ids INTERLEAVED (i % 4 = blob) so the
    // first-k Lloyd init seeds every blob. Whatever lists Lloyd settles
    // on, a vector's probed lists hold its blob mates first — so every
    // top-3 neighbor must come from the same blob.
    val d = (0 until 32).map { i =>
      val blob = i % 4
      val theta = blob * math.Pi / 2 + 0.01 * (i / 4)
      (i.toLong, Seq(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }.toDF("vec_id", "embedding")
    val out = LloydOps.knnGraphIvfOf(spark, d, k = 3, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byQ = out.groupBy(_._1)
    byQ.foreach { case (q, nbrs) =>
      nbrs.foreach { case (_, c) =>
        assert(c % 4 == q % 4, s"vec $q got cross-blob neighbor $c")
      }
      assert(nbrs.length == 3, s"vec $q has ${nbrs.length} neighbors")
    }
    assert(byQ.size == 32, "every vector gets ranked neighbors")
  }

  test("knn_graph_ivf registered query: schema, rank bounds, recall beats SimHash floor") {
    val g = LloydOps.knnGraphIvf(spark, TestSession.sf).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 3L)
      assert(math.abs(r.getDouble(3)) <= 1.000001)
    }
    // Per-query: at most k neighbors, ranks dense from 1.
    g.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val ranks = rows.map(_.getLong(2)).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"q=$q ranks=$ranks")
    }
    val rec = LloydOps.knnRecallIvf(spark, TestSession.sf).collect()
    assert(rec.nonEmpty)
    val mean = rec.map(_.getLong(3)).sum / rec.length
    // The SimHash graph measured 143 milli on this cohort; the IVF
    // operating point must hold a clear margin above it.
    assert(mean >= 300L, s"mean recall $mean milli")
  }

  test("knn_label_agreement_ivf: planted mislabel surfaces through the IVF graph") {
    import spark.implicits._
    // Two blobs of 8 identical orthogonal vectors (ids interleaved so
    // Lloyd's first-k init seeds both; identical vectors keep each blob
    // in one list). Vec 0 sits in blob 0 but carries label 1: its IVF
    // neighbors are all blob-0 (label 0), so it must be label 1's one
    // sub-500-milli suspect, while blob-0 queries that pick vec 0 as a
    // tie-break neighbor stay at 666 milli — above the suspect line.
    val a = Seq.fill(64)(1.0f)
    val b = Array.tabulate(64)(dd => if (dd % 2 == 0) 1.0f else -1.0f).toSeq
    val d = (0 until 16).map { i =>
      val blob = i % 2
      (i.toLong, if (i == 0) 1 else blob, if (blob == 0) a else b)
    }.toDF("vec_id", "label", "embedding")
    val g = LloydOps.knnGraphIvfOf(spark, d.select("vec_id", "embedding"),
      k = 3, nprobe = 2)
    val rows = graft.operators.AnnOps.labelAgreementRollup(g, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(3) == 1L, "the planted flip is label 1's suspect")
    assert(rows(1L).getLong(2) < 1000L, "the flip drags label 1's mean down")
    assert(rows(0L).getLong(3) == 0L, "no blob-0 vector dips below 500 milli")
  }

  test("knn_label_agreement_ivf registered query: milli bounds and suspect counts") {
    val rows = LloydOps.knnLabelAgreementIvf(spark, TestSession.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vectors, mean, suspects) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(vectors >= 1)
      assert(mean >= 0 && mean <= 1000, s"mean=$mean")
      assert(suspects >= 0 && suspects <= vectors)
    }
  }

  test("listsFor: sqrt operating point with floor and cap") {
    assert(LloydOps.listsFor(10) == 8)
    assert(LloydOps.listsFor(500) == 22)
    assert(LloydOps.listsFor(2000) == 44)
    assert(LloydOps.listsFor(1L << 50) == 4096)
  }

  test("purity registered query: conservation, bounds, labels valid") {
    val out = LloydOps.kmeansPurity(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val emb = Tables.embeddings(spark, TestSession.sf)
    assert(out.map(_._2).sum == emb.count())
    val labels = emb.select("label").distinct().collect()
      .map(_.getInt(0).toLong).toSet
    out.foreach { case (cl, n, nLabels, maj, purity) =>
      assert(labels.contains(maj), s"cluster $cl majority $maj")
      assert(nLabels >= 1L && nLabels <= labels.size.toLong)
      // Majority share is at least an even split and at most everything.
      assert(purity >= 1000L / nLabels && purity <= 1000L,
        s"cluster $cl purity $purity of $nLabels labels")
      assert(n >= 1L)
    }
  }
}
