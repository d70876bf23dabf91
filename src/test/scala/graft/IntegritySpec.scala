package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{JoinOps, StatsOps}

/** Differential checks for KS source drift, the id-gap audit, and the
  * percent-of-parent report at sf0.001 against naive recomputes.
  */
class IntegritySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("ks drift matches a naive CDF comparison") {
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val values = docs.map(_._2).distinct.sorted
    val nAll = docs.length.toLong
    def cdf(xs: Seq[Long], n: Long): Map[Long, Long] = {
      var cum = 0L
      values.map { v =>
        cum += xs.count(_ == v)
        v -> 1000000L * cum / n
      }.toMap
    }
    val global = cdf(docs.map(_._2).toSeq, nAll)
    val got = StatsOps.ksSourceDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val own = cdf(xs.map(_._2).toSeq, xs.length.toLong)
      val ks = values.map(v => math.abs(own(v) - global(v))).max
      assert(got(src) == ((xs.length.toLong, ks)), s"source $src")
    }
  }

  test("id gap audit finds planted holes across bucket boundaries") {
    import spark.implicits._
    // 0..9999 with two holes: one inside a bucket, one spanning a
    // bucket boundary (bucket=100 → boundary at 4200).
    val holes = (500L to 520L).toSet ++ (4180L to 4230L).toSet
    val ids = (0L until 10000L).filterNot(holes).toDF("event_id")
    val rows = StatsOps.idGapsOf(ids, bucket = 100L, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = rows.find(_._1 == "total").get
    assert(total._3 == holes.size.toLong)
    val gaps = rows.filter(_._1 == "gap").map(g => (g._2, g._3)).toSet
    assert(gaps.contains((500L, 21L)))
    assert(gaps.contains((4180L, 51L)))
    // Dense production ids → the real table reports zero missing.
    val Array(prod) = StatsOps.idGapAudit(spark, sf).collect()
      .filter(_.getString(0) == "total")
    assert(prod.getLong(2) == 0L)
  }

  test("share of parent matches naive cents rollup") {
    val got = JoinOps.shareOfParent(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val li = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "l_extendedprice", "l_discount").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        math.floor(r.getDouble(2) * (1.0 - r.getDouble(3)) * 100 + 0.5).toLong))
    val byNation = li.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byRegion = byNation.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val total = byRegion.values.sum
    byNation.foreach { case (k @ (r, _), cents) =>
      val want = (cents, 1000000L * cents / byRegion(r),
        1000000L * byRegion(r) / total)
      assert(got(k) == want, s"nation $k")
    }
    // Shares within each region sum to ~1e6 (floor loss < nations).
    got.groupBy(_._1._1).foreach { case (_, xs) =>
      val s = xs.values.map(_._2).sum
      assert(s > 1000000L - xs.size && s <= 1000000L)
    }
  }

  test("benford audit matches a naive digit recount") {
    val prices = Tables.lineitem(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    val want = prices
      .map(p => math.floor(p).toLong.toString.take(1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = prices.length.toLong
    val rows = StatsOps.benfordAudit(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == total)
    val benford = Map("1" -> 301L, "2" -> 176L, "3" -> 125L, "4" -> 97L,
      "5" -> 79L, "6" -> 67L, "7" -> 58L, "8" -> 51L, "9" -> 46L)
    rows.foreach { r =>
      val (d, cnt, obs, exp, dev) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cnt == want(d), s"digit $d count")
      assert(obs == 1000L * cnt / total)
      assert(exp == benford(d))
      assert(dev == math.abs(obs - exp))
    }
  }

  test("decile lift matches a serial NTILE replay") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) 0L else math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val users = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.map(_._3).sum, xs.count(_._2 == "purchase").toLong)
    }.toSeq.sortBy(t => (t._2, t._1))
    val tu = users.size
    val tb = users.count(_._3 > 0).toLong
    // SQL NTILE contract: first (tu % 10) tiles get the extra row.
    val base = tu / 10; val extra = tu % 10
    val decileOf = (idx: Int) =>
      if (idx < (base + 1) * extra) idx / (base + 1) + 1
      else extra + (idx - (base + 1) * extra) / base + 1
    val want = users.zipWithIndex
      .groupBy { case (_, i) => decileOf(i).toLong }
      .map { case (d, xs) =>
        val buyers = xs.count(_._1._3 > 0).toLong
        val n = xs.size.toLong
        d -> (n, xs.map(_._1._2).sum, buyers,
          1000L * buyers / n, 1000L * buyers * tu / (n * tb))
      }
    val got = operators.RfmOps.decileLift(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
  }

  test("ship latency quantiles are ordered and conserve lineitems") {
    val rows = operators.ReconOps.shipLatencyQuantiles(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p50 <= p90 && p90 <= p99, s"${r.getString(0)} quantile order")
      // The average sits inside the observed day range.
      assert(r.getLong(2) <= p99)
    }
  }

  test("winsorized means are pulled toward the center and clip ≤ tails+ties") {
    val rows = operators.StatsOps.winsorizedValueStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, raw, wins, lo, hi) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      // P5/P95 rank bounds: at most 5% of rows sit strictly outside each
      // clip bound (the bound value itself is inside by construction).
      assert(lo <= n * 5 / 100, s"${r.getString(0)} low clips $lo of $n")
      assert(hi <= n * 5 / 100 + 1, s"${r.getString(0)} high clips $hi of $n")
      // Clipping both tails of this near-symmetric load moves the mean
      // by less than the clip span itself — sanity, not exactness.
      assert(math.abs(wins - raw) <= math.abs(raw) + 1000000L)
    }
  }

  test("heavy user share matches a serial top-1% replay") {
    val counts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val users = counts.length.toLong
    val events = counts.map(_._2).sum
    val k = math.max(users / 100, 1L)
    val top = counts.sortBy { case (u, c) => (c, u) }.takeRight(k.toInt)
    val r = operators.StatsOps.heavyUserShare(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (users, events, k, top.map(_._2).sum))
    assert(r.getLong(4) == 1000000L * top.map(_._2).sum / events)
  }

  test("dedup source matrix conserves the exact pair count") {
    val pairs = operators.MinHashOps.dedupNgram(spark, sf).count()
    val rows = operators.MinHashOps.dedupSourceMatrix(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == pairs)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1)) // canonical orientation
      assert(r.getLong(3) >= 600L && r.getLong(3) <= 1000L)
    }
  }

  test("session length quantiles are ordered and conserve events") {
    val r = operators.ReconOps.sessionLengthQuantiles(spark, sf)
      .collect().head
    val nEvents = Tables.events(spark, sf).count()
    assert(r.getLong(1) == nEvents)
    assert(r.getLong(0) >= 1L && r.getLong(0) <= nEvents)
    assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    assert(r.getLong(5) <= r.getLong(6) && r.getLong(6) <= r.getLong(7))
  }

  test("charset profile conserves characters and shares sum to ~1000") {
    val rows = operators.TextOps.charsetProfile(spark, sf).collect()
    val docTotals = Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("docs"),
        sum(length(col("text"))).as("chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      assert((r.getLong(1), r.getLong(2)) == docTotals(src), s"totals $src")
      val shares = Seq(3, 4, 5, 6).map(r.getLong)
      assert(shares.forall(s => s >= 0L && s <= 1000L))
      // Four floors of an exact partition of chars: loss < 4 per-mille.
      val sum = shares.sum
      assert(sum > 996L && sum <= 1000L, s"$src permille sum $sum")
    }
  }
}
