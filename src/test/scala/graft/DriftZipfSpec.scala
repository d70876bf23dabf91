package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{SkewOps, StatsOps, TextOps}

/** Differential checks for key-Gini, TV drift, Zipf slope, and source
  * cosine similarity at sf0.001 against naive recomputes.
  */
class DriftZipfSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("key gini matches the naive rank formula and brackets in [0,1)") {
    val counts = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1)).sorted
    val n = counts.length.toLong
    val sx = counts.map(BigInt(_)).sum
    val swx = counts.zipWithIndex
      .map { case (x, i) => BigInt(2L * (i + 1) - 1) * x }.sum
    val want = ((BigInt(1000000) * (swx - n * sx)) / (n * sx)).toLong
    val Array(row) = SkewOps.keyGini(spark, sf).collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((n, sx.toLong, want)))
    assert(want >= 0L && want < 1000000L)
  }

  test("tv drift matches a naive two-arm histogram compare") {
    val day = 86400000000L
    val ev = Tables.events(spark, sf)
      .select("value", "ts_us").filter(col("value").isNotNull)
      .collect().map(r => (r.getDouble(0), r.getLong(1) / day))
    val (mn, mx) = (ev.map(_._1).min, ev.map(_._1).max)
    val (d0, d1) = (ev.map(_._2).min, ev.map(_._2).max)
    def bucket(v: Double) =
      if (mx == mn) 0L
      else math.min(19L, math.floor(20.0 * (v - mn) / (mx - mn)).toLong)
    val (a, b) = ev.partition(_._2 <= (d0 + d1) / 2)
    val ca = a.groupBy(e => bucket(e._1)).view.mapValues(_.size.toLong)
    val cb = b.groupBy(e => bucket(e._1)).view.mapValues(_.size.toLong)
    val tv = (0L until 20L).map { k =>
      math.abs(1000000L * ca.getOrElse(k, 0L) / math.max(a.length, 1) -
        1000000L * cb.getOrElse(k, 0L) / math.max(b.length, 1))
    }.sum / 2
    val Array(row) = StatsOps.driftTv(spark, sf).collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((a.length.toLong, b.length.toLong, tv)))
  }

  test("zipf slope matches a naive bitlen regression and is negative") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => "\\S+".r.findAllIn(r.getString(0)))
    // Mirror the operator's exact tie order (freq, token): a run of
    // equal frequencies can straddle a power of two, where bitlen(rank)
    // depends on which tied token got which rank.
    val byTok = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, f) => (f, t) }
    val v = byTok.length.toLong
    val n = BigInt(byTok.length)
    val terms = byTok.zipWithIndex.map { case ((_, f), i) =>
      val rank = byTok.length - (i + 1) + 1
      (BigInt(BigInt(rank).bitLength - 1), BigInt(BigInt(f).bitLength - 1))
    }
    val sx = terms.map(_._1).sum; val sy = terms.map(_._2).sum
    val sxy = terms.map(t => t._1 * t._2).sum
    val sxx = terms.map(t => t._1 * t._1).sum
    val slope = math.floor(10000.0 *
      ((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble) + 0.5).toLong
    val Array(row) = TextOps.zipfAudit(spark, sf).collect()
    assert((row.getLong(0), row.getLong(1)) == ((v, slope)))
    assert(slope < 0L, "a natural-ish corpus must slope downward")
  }

  test("source similarity matches naive cosine and brackets in (0,1e6]") {
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), "\\S+".r.findAllIn(r.getString(1)).toSeq))
    val vecs = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    val got = TextOps.sourceSimilarity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val srcs = vecs.keys.toSeq.sorted
    for (a <- srcs; b <- srcs if a < b) {
      val va = vecs(a); val vb = vecs(b)
      val dot = va.keySet.intersect(vb.keySet).toSeq
        .map(t => BigInt(va(t)) * vb(t)).sum
      val na = math.sqrt(va.values.toSeq.map(x => BigInt(x) * x).sum.toDouble)
      val nb = math.sqrt(vb.values.toSeq.map(x => BigInt(x) * x).sum.toDouble)
      val want = math.floor(1000000.0 * (dot.toDouble / (na * nb)) + 0.5).toLong
      assert(got((a, b)) == want, s"pair $a/$b")
      assert(want > 0L && want <= 1000000L)
    }
  }
}
