package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{FunnelOps, GraphOps, JoinOps}

/** Differential checks for PPR, the Markov stationary distribution, and
  * the join-cardinality audit at sf0.001 against naive recomputes.
  */
class MarkovPprSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("seeded PPR matches a naive fixed-point iteration") {
    val es = GraphOps.edges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adjOut = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2) }
    val nodes = adjOut.keys.toSeq.sorted
    val seeds = nodes.filter(_ % 97 == 0)
    assert(seeds.nonEmpty)
    val scale = GraphOps.Scale
    val tp = (15L * scale) / (100L * seeds.length)
    var v = nodes.map(n =>
      n -> (if (n % 97 == 0) scale / seeds.length else 0L)).toMap
    for (_ <- 1 to 8) {
      val contrib = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (n <- nodes; d = adjOut(n).length; m <- adjOut(n))
        contrib(m) += (85L * v(n)) / (100L * d)
      v = nodes.map(n =>
        n -> ((if (n % 97 == 0) tp else 0L) + contrib(n))).toMap
    }
    val got = GraphOps.pprSeeded(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == v.filter(_._2 > 0L))
    // Teleport bias is real: mean seed score exceeds mean non-seed score.
    val (sv, nv) = (seeds.map(v), nodes.filterNot(_ % 97 == 0).map(v))
    assert(sv.sum / sv.length > nv.sum / nv.length)
  }

  test("markov stationary matches a naive power iteration") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._2, e._3)).map(_._4)
      o.zip(o.drop(1))
    }.toSeq
    val p = pairs.groupBy(_._1).flatMap { case (a, xs) =>
      xs.groupBy(_._2).map { case (b, ys) =>
        (a, b) -> 1000000L * ys.size / xs.size
      }
    }
    val types = p.keys.map(_._1).toSeq.distinct.sorted
    var v = types.map(t => t -> 1000000L / types.length).toMap
    for (_ <- 1 to 12) {
      val nv = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for (((a, b), pp) <- p) nv(b) += (v(a) * pp) / 1000000L
      v = types.map(t => t -> nv(t)).toMap
    }
    val got = FunnelOps.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == v)
  }

  test("join cardinality audit: true sizes match materialized joins") {
    val got = JoinOps.joinCardinalityAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6)))
      .toMap
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val c = Tables.customer(spark, sf)
    val p = Tables.part(spark, sf)
    val cases = Seq(
      ("orders*lineitem",
        o.join(li, col("o_orderkey") === col("l_orderkey")).count(), o.count(), li.count()),
      ("customer*orders",
        c.join(o, col("c_custkey") === col("o_custkey")).count(), c.count(), o.count()),
      ("part*lineitem",
        p.join(li, col("p_partkey") === col("l_partkey")).count(), p.count(), li.count()))
    for ((pair, actual, nl, nr) <- cases) {
      val (rl, rr, est, act) = got(pair)
      assert((rl, rr) == ((nl, nr)), s"$pair row counts")
      assert(act == actual, s"$pair true cardinality")
      assert(est > 0L, s"$pair estimate")
    }
  }
}
