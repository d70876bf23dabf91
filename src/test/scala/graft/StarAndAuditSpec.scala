package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AnnOps, LayoutOps, StarOps, TextOps}

/** Behavioral invariants for the late-r9 additions — the tier below the
  * DuckDB oracle gate: properties that must hold on ANY corpus, so a
  * future data or code change that silently breaks semantics fails here
  * even if it happens to keep hash-matching its oracle.
  */
class StarAndAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("zonemap audit conserves rows and never reads fewer rows than match") {
    val rows = LayoutOps.zoneMapAudit(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("ingest", "datesort"))
    val totals = rows.map(_.getLong(3)).toSet
    assert(totals.size == 1, s"layouts disagree on rows_total: $totals")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "files_read > files_total")
      assert(r.getLong(4) <= r.getLong(3), "rows_read > rows_total")
      assert(r.getLong(4) >= r.getLong(5), "pruning dropped matching rows")
      assert(r.getLong(6) >= 10000 || r.getLong(5) == 0L,
        "read amplification below 1x with matches present")
    }
    // The point of the audit: sorting by the filter column prunes at
    // least as well as arrival order.
    val byLayout = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(byLayout("datesort") <= byLayout("ingest"))
  }

  test("token lift ranks at most k in-support tokens per source, lift positive") {
    val rows = TextOps.tokenLiftProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.length <= 3, s"$src has ${rs.length} ranked tokens")
      assert(rs.map(_.getLong(4)).sorted.sameElements(1L to rs.length), src)
    }
    rows.foreach { r =>
      assert(r.getLong(2) >= 10, "support floor violated")
      assert(r.getLong(3) > 0, "non-positive lift ranked")
    }
  }

  test("vocab OOV shares are valid basis points") {
    val rows = TextOps.vocabOovAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "oov_tokens > tokens")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000, "oov_bp out of range")
    }
  }

  test("filtered ANN returns only same-label neighbors") {
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = AnnOps.annTopKFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"query ${r.getLong(0)} matched cross-label candidate ${r.getLong(1)}")
    }
  }

  test("promo share is a valid fraction of total revenue") {
    val rows = StarOps.promoShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(3),
        "promo revenue outside [0, total]")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000, "share_bp out of range")
    }
  }

  test("hits: both score frames L1-normalize to ~HitsScale and stay positive") {
    import graft.operators.GraphOps
    val rows = GraphOps.hits(spark, sf, iters = 3).collect()
    assert(rows.nonEmpty)
    val byKind = rows.groupBy(_.getString(0))
    assert(byKind.keySet == Set("hub", "authority"))
    byKind.foreach { case (kind, rs) =>
      rs.foreach(r => assert(r.getLong(2) >= 0, s"negative $kind score"))
      val sum = rs.map(_.getLong(2)).sum
      // Integer floor-div normalization loses < 1 unit per node.
      assert(sum <= GraphOps.HitsScale && sum >= GraphOps.HitsScale - rs.length,
        s"$kind scores sum to $sum (n=${rs.length})")
    }
  }

  test("knn graph ranks are dense, per-vector bounded, and score-monotone") {
    val rows = graft.operators.AnnOps.knnGraph(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.length <= 3, s"vec $q has ${sorted.length} neighbors")
      assert(sorted.map(_.getLong(2)).sameElements(1L to sorted.length),
        s"vec $q ranks not dense")
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"vec $q scores not descending")
      rs.foreach(r => assert(r.getLong(1) != q, s"vec $q is its own neighbor"))
    }
  }

  test("source overlap emits each unordered pair once") {
    val rows = TextOps.sourceNgramOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.forall { case (a, b) => a < b }, "unordered pair emitted")
    assert(pairs.distinct.length == pairs.length, "duplicate pair")
    rows.foreach(r => assert(r.getLong(2) > 0))
  }

  test("hilbert index is a bijection whose consecutive cells are neighbors") {
    import spark.implicits._
    val bits = 3
    val n = 1 << bits
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("xb", "yb")
    val cells = LayoutOps.withHilbertIndex(grid, "xb", "yb", bits)
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    // Bijection onto 0 .. n²−1.
    assert(cells.map(_._1).toSeq == (0L until (n.toLong * n)))
    // THE Hilbert property: every step of the walk moves to a Manhattan-
    // distance-1 neighbor (z-order interleave fails this at quadrant
    // jumps — this is what distinguishes the two layouts).
    cells.zip(cells.tail).foreach { case ((_, x1, y1), (d, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"jump at d=$d: ($x1,$y1)→($x2,$y2)")
    }
  }

  test("weekly revenue growth: dense spine, cents conserved, ppm exact") {
    val rows = StarOps.weeklyRevenueGrowth(spark, sf).collect()
    val weeks = rows.map(_.getLong(0))
    assert(weeks.zip(weeks.tail).forall { case (a, b) => b == a + 1 })
    val totalCents = Tables.orders(spark, sf)
      .select(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_.getLong(1)).sum == totalCents)
    rows.foreach { r =>
      if (!r.isNullAt(2) && r.getLong(2) > 0L)
        assert(r.getLong(3) ==
          (r.getLong(1) - r.getLong(2)) * 1000000L / r.getLong(2))
    }
  }

  test("hilbert file plan conserves rows and covers the same keys as zorder") {
    val h = LayoutOps.hilbertPlan(spark, sf).collect()
    val z = LayoutOps.zorderPlan(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(h.map(_.getLong(1)).sum == total)
    assert(z.map(_.getLong(1)).sum == total)
    // Same global key envelope either way.
    assert(h.map(_.getLong(2)).min == z.map(_.getLong(2)).min)
    assert(h.map(_.getLong(3)).max == z.map(_.getLong(3)).max)
  }
}
