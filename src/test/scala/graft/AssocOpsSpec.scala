package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AssocOps, SampleOps}

/** Differential + invariant checks for association mining, fuzzy
  * linkage, and the weighted/Pareto sampling additions at sf0.001.
  */
class AssocOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("basket rules match a naive driver-side recomputation") {
    val rows = AssocOps.basketRules(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 100)
    // Naive reference over the collected item table.
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).map { case (o, v) => o -> v.map(_._2).sorted }
    val supp = items.groupBy(_._2).map { case (p, v) => p -> v.length.toLong }
    val nOrders = byOrder.size.toLong
    val pairCnt = collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairCnt((ps(i), ps(j))) = pairCnt.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    rows.foreach { case (a, b, sp, conf, lift) =>
      val key = if (a < b) (a, b) else (b, a)
      assert(pairCnt(key) == sp, s"support mismatch for $a->$b")
      assert(conf == 1000L * sp / supp(a))
      assert(lift == (1000L * sp / supp(a)) * nOrders / supp(b))
      assert(conf <= 1000L)
    }
    // Descending support ordering.
    rows.zip(rows.tail).foreach { case (x, y) => assert(x._3 >= y._3) }
  }

  test("item neighbors: exact Jaccard, per-item descending, k-bounded") {
    val rows = AssocOps.itemNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val supp = items.groupBy(_._2).map { case (p, v) => p -> v.length.toLong }
    val orders = items.groupBy(_._2).map { case (p, v) => p -> v.map(_._1).toSet }
    rows.groupBy(_._1).foreach { case (_, nbrs) =>
      assert(nbrs.length <= 5)
      assert(nbrs.map(_._2).sorted.sameElements(1L to nbrs.length.toLong))
      // milli-Jaccard descends down each neighbor list.
      val byRn = nbrs.sortBy(_._2)
      byRn.zip(byRn.tail).foreach { case (x, y) => assert(x._5 >= y._5) }
    }
    rows.foreach { case (a, _, b, co, jac) =>
      val inter = (orders(a) intersect orders(b)).size.toLong
      assert(co == inter, s"intersection mismatch $a/$b")
      assert(jac == 1000L * inter / (supp(a) + supp(b) - inter))
    }
  }

  test("independence audit: cells partition the corpus, ppm shares close") {
    val rows = AssocOps.independenceAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum == total)
    // obs_ppm sums to 1e6 up to per-cell floor rounding.
    val s3 = rows.map(_._4).sum
    assert(s3 <= 1000000L && s3 >= 1000000L - rows.length)
    rows.foreach { case (_, _, obs, obsPpm, expPpm, dev) =>
      assert(obsPpm == 1000000L * obs / total)
      assert(dev == math.abs(obsPpm - expPpm))
    }
  }

  test("fuzzy linkage matches a naive windowed edit-distance recomputation") {
    val rows = AssocOps.fuzzyLinkParts(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_type", "p_size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    // Naive replay of the contract: exact C(sz,2) candidate mass, then
    // distances over the sorted-neighborhood window only.
    val naive = parts.groupBy(p => (p._3, p._4)).flatMap { case (blk, ps) =>
      if (ps.length < 2) None
      else {
        val ordered = ps.sortBy(p => (p._2, p._1))
        val ds = for {
          i <- ordered.indices
          j <- (i + 1) until math.min(i + 1 + AssocOps.EntityWindow, ordered.length)
        } yield lev(ordered(i)._2, ordered(j)._2)
        val sz = ps.length.toLong
        Some(blk -> (sz * (sz - 1) / 2, ds.length.toLong,
          ds.count(_ <= 4).toLong, ds.min.toLong, 1000L * ds.sum / ds.length))
      }
    }
    assert(rows.keySet == naive.keySet)
    naive.foreach { case (blk, expect) =>
      assert(rows(blk) == expect, s"block $blk: ${rows(blk)} vs $expect")
    }
  }

  test("weighted systematic sample: pick mass telescopes to total div step") {
    val rows = SampleOps.sampleWeighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    val step = math.max(1L, total / 100L)
    assert(rows.map(_._4).sum == total / step,
      "sum of picks must equal the number of step boundaries crossed")
    rows.foreach { case (_, w, cum, picks) =>
      assert(picks >= 1L)
      assert(cum / step - (cum - w) / step == picks)
    }
    // cum strictly increases with doc_id (weights are positive).
    rows.map(_._3).toSeq.sliding(2).foreach { case Seq(a, b) => assert(a < b) case _ => }
  }

  test("pareto cut: minimal covering prefix crosses 80% exactly once") {
    val rows = SampleOps.paretoSources(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    assert(rows.last._3 == total)
    // Flags are a prefix: 1...1 0...0, and the last core row crosses 80%.
    val flags = rows.map(_._4)
    assert(flags.toSeq.sliding(2).forall { case Seq(a, b) => a >= b case _ => true })
    val core = rows.filter(_._4 == 1L)
    assert(core.last._3 * 100 >= total * 80)
    if (core.length < rows.length)
      assert((core.last._3 - core.last._2) * 100 < total * 80)
  }
}
