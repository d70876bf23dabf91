package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ReconOps

/** Differential checks for reconciliation, TWAP, and bounce rate at
  * sf0.001 against naive recomputes.
  */
class ReconSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("reconciliation matches naive cents accounting") {
    def cents(x: Double) = math.floor(x * 100 + 0.5).toLong
    val hdr = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> cents(r.getDouble(1))).toMap
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = hdr.toSeq.map { case (k, h) =>
      lines.get(k) match {
        case None => ("no_lines", h)
        case Some(l) if l == h => ("matched", 0L)
        case Some(l) => ("mismatched", math.abs(h - l))
      }
    }.groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val got = ReconOps.reconciliationAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == hdr.size.toLong)
  }

  test("twap matches the naive interval-weighted mean") {
    val ev = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        math.floor(r.getDouble(4) * 1000 + 0.5).toLong))
    val ivs = ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val o = xs.sortBy(e => (e._2, e._3))
      o.zip(o.drop(1)).map { case (a, b) => (a._4, a._5, b._2 - a._2) }
    }.filter(_._3 > 0)
    val got = ReconOps.twapByType(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    ivs.groupBy(_._1).foreach { case (t, xs) =>
      val vd = xs.map(x => BigInt(x._2) * x._3).sum
      val dd = xs.map(x => BigInt(x._3)).sum
      assert(got(t) == ((xs.size.toLong, dd.toLong, (vd / dd).toLong)),
        s"type $t")
    }
  }

  test("bounce rate matches naive sessionization") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 1800L * 1000000L
    val sessions = ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val o = xs.sortBy(e => (e._2, e._3))
      val ids = o.scanLeft((0L, Option.empty[Long])) { case ((sid, prev), e) =>
        (if (prev.forall(p => e._2 - p >= gap)) sid + 1 else sid, Some(e._2))
      }.drop(1).map(_._1)
      o.zip(ids).groupBy(_._2).values.map { g =>
        val sorted = g.map(_._1).sortBy(e => (e._2, e._3))
        (sorted.head._4, g.size)
      }
    }
    val want = sessions.groupBy(_._1).view.mapValues { xs =>
      val b = xs.count(_._2 == 1).toLong
      (xs.size.toLong, b, 1000L * b / xs.size)
    }.toMap
    val got = ReconOps.bounceRate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
  }
}
