package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AnnOps

class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  private lazy val exact = AnnOps.annTopK(spark, sf).collect()
  private lazy val lsh = AnnOps.annLshTopK(spark, sf).collect()

  test("LSH scores agree with exact scores for every returned pair") {
    val exactScores = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // LSH re-ranks exactly, so any pair also present in the exact top-k
    // must carry an identical rounded cosine.
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactScores.get(key).foreach(s => assert(s == r.getDouble(3), s"pair $key"))
    }
  }

  test("LSH candidates recall a nontrivial share of the exact top-10") {
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshSet = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactSet & lshSet).size.toDouble / exactSet.size
    assert(recall > 0.2, s"recall=$recall")
  }

  test("bitsFor grows with the corpus so bucket occupancy stays flat") {
    // ~log2(n/targetBucket), floored at 8, capped at 40 — the dial that
    // keeps bucketed candidate volume linear in N instead of N²/2^bits.
    assert(AnnOps.bitsFor(500) == 8)        // floor
    assert(AnnOps.bitsFor(1000000) == 16)   // 1e6/16 ≈ 2^16
    assert(AnnOps.bitsFor(1000000000) == 26)
    assert(AnnOps.bitsFor(Long.MaxValue / 2) == 40) // cap
    val sfSizes = Seq(500L, 5000L, 50000L, 500000L).map(AnnOps.bitsFor(_))
    assert(sfSizes == sfSizes.sorted, s"not monotone: $sfSizes")
  }

  test("auto-sized LSH equals the manually sized run at the derived width") {
    val n = Tables.embeddings(spark, sf).count()
    val auto = AnnOps.annLshTopKAuto(spark, sf).collect()
    val manual = AnnOps.annLshTopK(spark, sf, bits = AnnOps.bitsFor(n)).collect()
    assert(auto.toSeq == manual.toSeq)
  }

  test("auto-sized embed near-dup equals the manually sized run") {
    val n = Tables.embeddings(spark, sf).count()
    val auto = AnnOps.embedNearDupStatsAuto(spark, sf).collect()
    val manual = AnnOps.embedNearDupStats(spark, sf, bits = AnnOps.bitsFor(n)).collect()
    assert(auto.toSeq == manual.toSeq)
  }

  test("IVF probes return exact scores and bounded per-query results") {
    val ivf = AnnOps.annIvfTopK(spark, sf).collect()
    assert(ivf.nonEmpty)
    val exactScores = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      exactScores.get((r.getLong(0), r.getLong(1)))
        .foreach(s => assert(s == r.getDouble(3)))
    }
    ivf.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.length <= 10)
      val ranks = g.map(_.getLong(2)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1 })
    }
    // clustered embeddings: probing 3/10 cells should recall well
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactSet & ivf.map(r => (r.getLong(0), r.getLong(1))).toSet).size.toDouble / exactSet.size
    assert(recall > 0.2, s"recall=$recall")
  }

  test("recall audits emit one bounded integer row per query") {
    // The registered audits (ann_recall_lsh oracle-gated, ann_recall_ivf
    // rows-only): one row per query id, hits <= k, recall_milli on the
    // exact integer grid, and a floor that catches a recall collapse.
    for (audit <- Seq(AnnOps.annRecallLsh _, AnnOps.annRecallIvf _)) {
      val rows = audit(spark, sf).collect()
      assert(rows.map(_.getLong(0)).toSeq == (0L until 5L))
      rows.foreach { r =>
        val (k, hits, milli) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(k == 10L && hits >= 0L && hits <= k)
        assert(milli == hits * 1000L / k)
      }
      val mean = rows.map(_.getLong(3)).sum / rows.length
      assert(mean >= 200L, s"mean recall collapsed: $mean")
    }
  }

  test("LSH output is deterministic and rank-consistent") {
    val again = AnnOps.annLshTopK(spark, sf).collect()
    assert(lsh.toSeq == again.toSeq)
    lsh.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val ranks = g.map(_.getLong(2)).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == i + 1 })
    }
  }

  test("hard negatives: cross-label only, complement of the filtered path") {
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val negs = AnnOps.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // Exactly k per query (500 vectors across several labels always
    // leave >= 10 cross-label candidates).
    assert(negs.map(_._1).distinct.length == 5)
    assert(negs.length == 50)
    negs.foreach { case (q, c, _, _) =>
      assert(labels(q) != labels(c), s"($q,$c) shares a label")
    }
    // Ranks are 1..k with non-increasing cosine per query.
    negs.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to 10L))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-(_: Double)).toSeq)
    }
    // Disjoint from the same-label filtered results by construction.
    val filtered = AnnOps.annTopKFiltered(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(negs.forall { case (q, c, _, _) => !filtered.contains((q, c)) })
    // Every hard negative scores <= the exact unrestricted neighbor at
    // the same rank (the exact set optimizes over a superset).
    val exactByRank = exact.map(r =>
      (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    negs.foreach { case (q, _, rk, cos) =>
      assert(cos <= exactByRank((q, rk)) + 1e-9, s"q=$q rank=$rk")
    }
  }

  test("embedding PCA satisfies the eigen identities on the exact covariance") {
    import graft.operators.PcaOps
    val rows = PcaOps.embeddingPca(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 2 * PcaOps.Dims)
    val v1 = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3 / 1e6)
    val v2 = rows.filter(_._1 == 2L).sortBy(_._2).map(_._3 / 1e6)
    val l1 = rows.find(_._1 == 1L).get._4.toDouble
    val l2 = rows.find(_._1 == 2L).get._4.toDouble
    // Unit vectors, dominant first, near-orthogonal.
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-3)
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-3)
    assert(l1 >= l2 && l2 >= 0.0)
    assert(math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) < 1e-2)
    // Serial covariance replay: C v1 ≈ λ1 v1 (relative residual small).
    val vecs = Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(f =>
        math.floor(f.toDouble * 1e6 + 0.5)))
    val n = vecs.length.toDouble
    val d = PcaOps.Dims
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
    }
    val cv = Array.tabulate(d)(i =>
      (0 until d).map(j => cov(i)(j) * v1(j)).sum)
    val resid = math.sqrt(cv.zip(v1).map { case (a, b) =>
      val e = a - l1 * b; e * e
    }.sum) / l1
    assert(resid < 0.05, s"eigen residual $resid")
    // Determinism across runs.
    val again = PcaOps.embeddingPca(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("PCA moment cells survive Long-overflowing product sums (128-bit)") {
    import graft.operators.PcaOps
    val agg = new PcaOps.MomentAggregator
    // Coordinate 3000.0 → 3e9 fixed-point; ONE row's product is ~9e18 ≈
    // Long.MaxValue, so three rows push every Σx·xᵀ cell out of 64-bit
    // range — exactly the silent-overflow scenario the old addExact
    // guard could only turn into a crash. Mixed signs exercise the
    // signed-carry path; the merge exercises the 128+128 combine.
    val pos = Seq.tabulate(PcaOps.Dims)(i => if (i == 1) -3000.0f else 3000.0f)
    var m = agg.reduce(agg.zero, pos)
    m = agg.merge(m, agg.reduce(agg.zero, pos))
    m = agg.reduce(m, pos)
    val p = BigInt(3000000000L)
    assert(PcaOps.productCell(m, 0, 0) == 3 * p * p)
    assert(PcaOps.productCell(m, 0, 1) == -3 * p * p)
    assert(PcaOps.productCell(m, 1, 1) == 3 * p * p)
    assert(3 * p * p > BigInt(Long.MaxValue)) // genuinely past 64-bit
  }

  test("embedding norm and per-dim audits match a serial replay") {
    import graft.operators.StatsOps
    val vecs = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Float](1).toArray))
    // Norm audit: per-row left-to-right double fold, e6-quantized.
    val normsByLabel = vecs.groupBy(_._1).view.mapValues { xs =>
      xs.map { case (_, v) =>
        var s = 0.0
        v.foreach(x => s += x.toDouble * x.toDouble)
        math.floor(math.sqrt(s) * 1e6 + 0.5).toLong
      }
    }.toMap
    StatsOps.embeddingNorms(spark, sf).collect().foreach { r =>
      val ns = normsByLabel(r.getLong(0))
      assert(r.getLong(1) == ns.length.toLong)
      assert(r.getLong(2) == ns.min && r.getLong(3) == ns.max)
      assert(r.getLong(4) == ns.sum / ns.length)
      assert(r.getLong(5) == ns.count(_ == 0L).toLong)
    }
    // Dim audit: exact integer variance identity over e6 fixed-point.
    val byDim = vecs.flatMap { case (_, v) =>
      v.zipWithIndex.map { case (x, d) =>
        d.toLong -> math.floor(x.toDouble * 1e6 + 0.5).toLong
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    StatsOps.embeddingDimStats(spark, sf).collect().foreach { r =>
      val xs = byDim(r.getLong(0))
      val n = xs.length.toLong
      val sx = BigInt(xs.sum)
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      assert(r.getLong(1) == n)
      assert(BigInt(r.getLong(2)) == sx / n)
      assert(BigInt(r.getLong(3)) == (n * sxx - sx * sx) / (n * n))
    }
  }
}
