package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 second-wave specs: DP release mechanics, the EWMA integer
  * recurrence, and the curve-layout pruning comparison.
  */
class R16bOpsSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf

  test("DP release: suppression floor holds and noise stays within the binomial bound") {
    import org.apache.spark.sql.functions._
    import graft.operators.PiiOps
    val truth = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val released = PiiOps.dpReleaseCounts(spark, sf).collect()
    // Exactly the cells at/above the floor are released, each within the
    // additive noise envelope popcount(30-bit) - 15 in [-15, 15].
    val expectKeys = truth.filter(_._2 >= PiiOps.DpSuppressK).keySet
    assert(released.map(r => (r.getString(0), r.getLong(1))).toSet == expectKeys)
    released.foreach { r =>
      val n = truth((r.getString(0), r.getLong(1)))
      val d = r.getLong(2) - n
      assert(d >= -15 && d <= 15, s"noise $d out of the binomial envelope")
    }
    // The draw is hash-keyed, so not every cell gets the same offset.
    assert(released.map(r => r.getLong(2) - truth((r.getString(0), r.getLong(1))))
      .distinct.length > 1)
  }

  test("EWMA trace equals the Scala recomputation of the integer recurrence") {
    import org.apache.spark.sql.functions._
    import graft.operators.TemporalOps
    val got = TemporalOps.ewmaDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byType = got.groupBy(_._1)
    assert(byType.nonEmpty)
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // Zero-filled: the day spine is dense.
      assert(sorted.map(_._2).toSeq ==
        (sorted.head._2 to sorted.last._2).toSeq)
      var s = -1L
      sorted.foreach { case (_, _, n, ewma) =>
        s = if (s < 0) 1000 * n else (7 * s + 1000 * n) / 8
        assert(ewma == s)
      }
    }
  }

  test("k-center seeds: farthest-point order on planted geometry") {
    import spark.implicits._
    import graft.operators.AnnOps
    // 2-D directions (padded) at angles 0, 90, 45, 30 degrees (ids
    // 0..3). From seed 0: farthest is 90 (dist 1000), then 45 (min-dist
    // to {0, 90} = 1000 - cos45 = 293), then 30 (min-dist to {0, 90, 45}
    // = 1000 - cos15 = 34).
    val v = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(0f, 1f)),
      (2L, Seq(0.7071068f, 0.7071068f)),
      (3L, Seq(0.8660254f, 0.5f))).toDF("vec_id", "embedding")
    val out = AnnOps.kCenterSeedsOf(spark, v, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 1000L),
      (3L, 2L, 293L), (4L, 3L, 34L)))
  }

  test("markov top-1: rates bounded and hits equal the modal transition count") {
    import graft.operators.FunnelOps
    val acc = FunnelOps.markovTop1Accuracy(spark, sf).collect()
    val trans = FunnelOps.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    acc.foreach { r =>
      val from = r.getString(0)
      val rows = trans.filter(_._1 == from)
      val maxC = rows.map(_._3).max
      // Modal count and the lexicographic tie-break.
      assert(r.getLong(3) == maxC)
      assert(r.getString(1) == rows.filter(_._3 == maxC).map(_._2).min)
      assert(r.getLong(2) == rows.map(_._3).sum)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000)
    }
  }

  test("distance histogram pools exactly the harmonic frame's reached pairs") {
    import graft.operators.GraphOps
    val hist = GraphOps.graphDistanceHistogram(spark, sf).collect()
    assert(hist.nonEmpty && hist.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 4))
    // Cumulative column is a strict prefix sum ending at 1000000 ppm.
    var cum = 0L
    hist.foreach { r =>
      cum += r.getLong(1)
      assert(r.getLong(2) == cum)
    }
    assert(hist.last.getLong(3) == 1000000L)
    val totalReached = GraphOps.harmonicCentrality(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(cum == totalReached)
  }

  test("percolation: removing hubs never grows the giant or shrinks the component count") {
    import graft.operators.GraphOps
    val rows = GraphOps.percolationAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    val (fn, fe, fc, fg) = rows("full")
    val (pn, pe, pc, pg) = rows("percolated")
    assert(pn <= fn && pe < fe)
    assert(pg <= fg)
    assert(fc >= 1 && pc >= 1)
  }

  test("tpch trio: q6 filters reach the scan; q1 groups the full domain") {
    import graft.operators.TpchOps
    val plan = TpchOps.q6(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("IsNotNull(l_shipdate)"))
    val q1 = TpchOps.q1(spark, sf).collect()
    assert(q1.length == 6) // 3 returnflags x 2 linestatuses
    q1.foreach { r =>
      // charge >= discounted e2 >= base e4 once unit-aligned, all positive.
      assert(r.getLong(3) > 0 &&
        r.getLong(4) >= r.getLong(3) * 90 &&
        r.getLong(5) >= r.getLong(4) * 100)
    }
    val q6 = TpchOps.q6(spark, sf).collect()
    assert(q6.head.getLong(0) > 0 && q6.head.getDouble(1) > 0)
  }

  test("streaming curation replay keeps exactly the batch clean-digest set mass") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingReplay
    import graft.operators.{PiiOps, TextOps}
    val batchSet = TextOps.qualityFlags(
        Tables.documents(spark, sf)
          .withColumn("text", PiiOps.plantedPii))
      .filter(col("keep") === 1)
      .select(sha2(PiiOps.redact(col("text")), 256).as("h"))
      .distinct().count()
    val streamed = StreamingReplay.curationReplay(spark, sf).collect()
    assert(streamed.map(_.getLong(1)).sum == batchSet)
  }

  test("whitening audit: consistent with the dim-stats diagonal and internally coherent") {
    import graft.operators.PcaOps
    val st = PcaOps.embeddingWhiteningAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st("trace_fp2") > 0 && st("diag_min_fp2") <= st("diag_max_fp2"))
    assert(st("max_offdiag_abs_fp2") <= st("offdiag_abs_fp2"))
    assert(st("offdiag_trace_ppm") ==
      BigInt(st("offdiag_abs_fp2")) * 1000000 / BigInt(st("trace_fp2")))
    val (i, j) = (st("max_offdiag_i"), st("max_offdiag_j"))
    assert(i >= 0 && i < j && j < PcaOps.Dims)
  }

  test("U-shaped attribution conserves exactly 1e6 micro credit per purchase") {
    import org.apache.spark.sql.functions._
    import graft.operators.TemporalOps
    val rows = TemporalOps.attributionUShaped(spark, sf).collect()
    val totalCredit = rows.map(_.getLong(2)).sum
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(totalCredit == 1000000L * purchases)
    // Split exercised: some touch got a non-terminal (middle) share.
    assert(rows.filter(r => r.getString(0) != "none").map(_.getLong(2)).sum
      != rows.filter(_.getString(0) != "none").map(_.getLong(1)).sum * 1000000L)
  }

  test("RAKE: multi-word phrases rank and scores are deg/freq sums") {
    import graft.operators.TfIdfOps
    val top = TfIdfOps.rakeKeyphrases(spark, sf).collect()
    assert(top.length == TfIdfOps.RakeTopK)
    // Descending (score, phrase asc) order and the cap respected.
    top.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) > b.getLong(3) ||
          (a.getLong(3) == b.getLong(3) && a.getString(0) < b.getString(0)))
      case _ =>
    }
    top.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= TfIdfOps.RakeMaxPhrase)
      val nWords = r.getString(0).split(" ").length
      assert(nWords == r.getLong(1))
      // RAKE favors multi-word candidates: the top should not be all unigrams.
    }
    assert(top.exists(_.getLong(1) > 1))
  }

  test("windowed funnel is dominated stage-wise by the unbounded funnel") {
    import graft.operators.FunnelOps
    val un = FunnelOps.funnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val wi = FunnelOps.funnelWindowed(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // Stage 1 shares the anchor; budgets only remove users downstream.
    assert(wi(1L) == un(1L))
    assert(wi(2L) <= un(2L) && wi(3L) <= un(3L))
    assert(wi(3L) <= wi(2L) && wi(2L) <= wi(1L))
  }

  test("stream-stream join replay equals the batch interval join rollup") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingReplay
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("lus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts_us").as("rus"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("rus") >= col("lus") && col("rus") <= col("lus") + 14400000000L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("pairs"), sum("lus").as("l_us_mass"),
        sum("rus").as("r_us_mass"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val streamed = StreamingReplay.joinReplay(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("quantile transform table: monotone, tie-consistent, spanning [0, 1e6]") {
    import graft.operators.StatsOps
    val rows = StatsOps.quantileTransformTable(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, ts) =>
      val sorted = ts.sortBy(_._2)
      assert(sorted.head._4 == 0L)
      // Strictly increasing q over strictly increasing distinct values.
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2 < b._2 && a._4 < b._4)
        case _ =>
      }
      // Max value maps to exactly 1e6: cum - n_rows over the last row is
      // n - n_rows_last, and (1e6 * (n-1)) div (n-1) when n_rows_last=1;
      // with ties at the top it is still (1e6 * rank_min-1) div (n-1).
      val n = ts.map(_._3).sum
      val last = sorted.last
      assert(last._4 == 1000000L * (n - last._3) / math.max(n - 1, 1))
    }
  }

  test("fano factor flags the planted bursty series and clears the regular one") {
    import graft.operators.StatsOps
    val rows = StatsOps.burstinessFano(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(3) >= 0)
      // Differential recomputation in Scala over the collected grid.
    }
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .groupBy(expr("ts_us div 86400000000").as("day"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val span = (daily.map(_._2).min to daily.map(_._2).max)
    val byType = daily.groupBy(_._1)
    rows.foreach { r =>
      val cs = {
        val m = byType(r.getString(0)).map(x => x._2 -> x._3).toMap
        span.map(d => m.getOrElse(d, 0L))
      }
      val (n, s1, s2) = (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == (1000 * s1) / n)
      assert(r.getLong(3) == (1000 * (n * s2 - s1 * s1)) / (n * s1))
    }
  }

  test("curve layout audit: hilbert prunes at least as well as zorder, both beat xsort") {
    import graft.operators.LayoutOps
    val rows = LayoutOps.curveLayoutAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(5), r.getLong(6))).toMap
    assert(rows.keySet == Set("hilbert", "xsort", "zorder"))
    val (hRead, hMatch, hAmp) = rows("hilbert")
    val (xRead, xMatch, xAmp) = rows("xsort")
    val (zRead, zMatch, zAmp) = rows("zorder")
    // Same predicate → identical matching mass under every layout.
    assert(hMatch == xMatch && zMatch == xMatch)
    assert(hRead <= zRead && zRead <= xRead)
    assert(hAmp <= zAmp && zAmp <= xAmp)
  }
}
