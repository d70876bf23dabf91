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
