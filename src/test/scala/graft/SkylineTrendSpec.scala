package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{SkylineOps, StatsOps}

/** Differential checks for the skyline, trend, and histogram operators
  * at sf0.001 — each against a naive driver-side recomputation.
  */
class SkylineTrendSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("skyline matches the naive quadratic dominance filter") {
    val got = SkylineOps.skylineParts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pts = Tables.part(spark, sf)
      .select(col("p_partkey"),
        expr("cast(floor(p_retailprice * 1000 + 0.5) as long)"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pts.filter { a =>
      !pts.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("per-type trend slope matches a naive normal-equation recompute") {
    val got = StatsOps.trendByType(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts_us"),
        expr("cast(floor(value * 1000 + 0.5) as long)").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mn = ev.map(_._2).min
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.map(r => (r._2 - mn) / 3600000000L)
      val ys = rows.map(_._3)
      val n = BigInt(rows.length)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      val slope = math.floor(10000.0 *
        ((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble) + 0.5).toLong
      assert(got(t) == ((rows.length.toLong, slope)), s"type $t")
    }
  }

  test("value histogram partitions the corpus into in-range buckets") {
    val rows = StatsOps.valueHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (b, cnt, pct) =>
      assert(b >= 0L && b <= 19L)
      assert(pct == 1000L * cnt / total)
    }
    // Buckets arrive sorted and unique.
    val bs = rows.map(_._1)
    assert(bs.toSeq == bs.distinct.sorted.toSeq)
  }
}
