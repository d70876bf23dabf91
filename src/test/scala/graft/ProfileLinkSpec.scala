package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, LinkOps, ProfileOps}

/** Differential checks for the profiling, survival, and node-local graph
  * operators at sf0.001 — each against an independent naive recompute.
  */
class ProfileLinkSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("column profile matches independent per-column aggregates") {
    val got = ProfileOps.profileColumns(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    for (c <- Seq("event_id", "ts_us", "user_id", "event_type", "value", "props")) {
      val nn = ev.filter(col(c).isNotNull).count()
      val nd = ev.select(c).filter(col(c).isNotNull).distinct().count()
      assert(got(c) == ((nn, total - nn, nd)), s"column $c")
    }
    assert(got.values.map(_._1).max == total, "some column is fully non-null")
  }

  test("survival curve is a monotone tail sum anchored at the cohort") {
    val rows = ProfileOps.survivalCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.head._1 == 0L && rows.head._3 == users)
    assert(rows.map(_._2).distinct.toSeq == Seq(users))
    // surviving is non-increasing in days_active and ends positive.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 == a._1 + 1 && b._3 <= a._3)
    }
    assert(rows.last._3 >= 1)
    rows.foreach(r => assert(r._4 == 1000000L * r._3 / r._2))
  }

  test("clustering coefficients match a naive per-node triangle count") {
    val got = LinkOps.clusteringCoeff(spark, sf, k = 1000000).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val es = GraphOps.edges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (es ++ es.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val edgeSet = es.map(e => if (e._1 < e._2) e else e.swap).toSet
    for ((n, nbrs) <- adj if nbrs.size >= 2) {
      val pairs = nbrs.toSeq.sorted.combinations(2)
        .count { case Seq(a, b) => edgeSet.contains((a, b)) }
      val d = nbrs.size.toLong
      val want = (d, pairs.toLong, 1000000L * 2 * pairs / (d * (d - 1)))
      assert(got(n) == want, s"node $n")
    }
  }

  test("link prediction scores match naive capped wedge enumeration") {
    val cap = 256
    val got = LinkOps.linkPrediction(spark, sf, k = 50, degCap = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
    val es = GraphOps.edges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (es ++ es.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val edgeSet = es.map(e => if (e._1 < e._2) e else e.swap).toSet
    val scores = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((u, nbrs) <- adj if nbrs.size <= cap;
         Seq(a, b) <- nbrs.toSeq.sorted.combinations(2)
         if !edgeSet.contains((a, b))) {
      val (cn, ra) = scores.getOrElse((a, b), (0L, 0L))
      scores((a, b)) = (cn + 1, ra + 1000000L / nbrs.size)
    }
    val want = scores.toSeq
      .sortBy { case ((a, b), (cn, ra)) => (-ra, -cn, a, b) }.take(50)
      .map { case (k, v) => k -> v }
    assert(got.toSeq == want)
  }
}
