package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AudienceOps, TextOps}

/** Differential checks for vocabulary growth, audience overlap, and
  * recency scoring at sf0.001 against naive driver-side recomputes.
  */
class AudienceGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  private lazy val events = Tables.events(spark, sf)
    .select("user_id", "event_type", "ts_us").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("vocab growth matches naive first-seen batching") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0) / 50, "\\S+".r.findAllIn(r.getString(1)).toSeq))
    val perBatch = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2))
    val firstSeen = docs.flatMap { case (b, ts) => ts.map(_ -> b) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min)
    val got = TextOps.vocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    var cum = 0L
    val want = perBatch.toSeq.sortBy(_._1).map { case (b, toks) =>
      val nw = firstSeen.count(_._2 == b).toLong
      cum += nw
      (b, toks.size.toLong, toks.distinct.size.toLong, nw, cum)
    }
    assert(got.toSeq == want)
    assert(got.last._5 == firstSeen.size.toLong)
  }

  test("audience overlap matches naive set intersections") {
    val byType = events.map(e => (e._2, e._1)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = AudienceOps.audienceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    for (a <- byType.keys; b <- byType.keys if a <= b) {
      val i = (byType(a) & byType(b)).size.toLong
      val u = byType(a).size + byType(b).size - i
      assert(got((a, b)) == ((i, 1000000L * i / u)), s"pair $a/$b")
    }
    // Diagonal rows are each audience with itself: Jaccard exactly 1.
    byType.keys.foreach(t => assert(got((t, t))._2 == 1000000L))
  }

  test("recency scores match the naive shift-decay sum") {
    val day = 86400000000L
    val mx = events.map(_._3 / day).max
    val want = events.groupBy(_._1).map { case (u, es) =>
      u -> (es.size.toLong,
        es.map(e => 1000000L >> math.min(mx - e._3 / day, 40L).toInt).sum)
    }
    val got = AudienceOps.recencyScores(spark, sf, k = 1000000).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }
}
