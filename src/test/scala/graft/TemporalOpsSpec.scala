package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TemporalOps

/** Invariant checks for the temporal/sequence operators at sf0.001 —
  * conservation laws and accuracy bounds that hold for ANY event corpus,
  * independent of the DuckDB oracle gate.
  */
class TemporalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  private lazy val events = Tables.events(spark, sf).cache()
  private lazy val nEvents = events.count()
  private lazy val nUsers = events.select("user_id").distinct().count()

  test("rolling week uniques: dense spine, truth dominates single day, HLL tracks truth") {
    val rows = TemporalOps.rollingWeekUniques(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Dense day spine: consecutive days, no gaps.
    val days = rows.map(_._1)
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
    // The trailing-7 truth can never be below that single day's distinct.
    val single = events
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (day, est, truth) =>
      assert(truth >= single.getOrElse(day, 0L), s"day $day window < single day")
      // m=64 HLL: relative standard error 1.04/8 = 13%; allow 3.5 sigma.
      assert(math.abs(est - truth) <= math.max(8L, (truth * 45) / 100),
        s"day $day est $est vs truth $truth outside HLL error budget")
    }
    // Rolling-7 truth is also monotone vs the window's max single day.
    assert(rows.map(_._3).max >= single.values.max)
  }

  test("time in state: interval count conservation (events minus users)") {
    val rows = TemporalOps.timeInState(spark, sf).collect()
    val totalIntervals = rows.map(_.getLong(1)).sum
    // Every user with n events contributes exactly n-1 closed intervals.
    assert(totalIntervals == nEvents - nUsers,
      s"intervals $totalIntervals != events $nEvents - users $nUsers")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L)                    // total_us
      assert(r.getLong(3) <= r.getLong(4))          // avg <= max
      assert(r.getLong(3) == r.getLong(2) / r.getLong(1)) // integer-div mean
    }
  }

  test("path trigrams: descending counts, deterministic tie order, bounded mass") {
    val rows = TemporalOps.pathTrigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a._4 > b._4 ||
        (a._4 == b._4 && (a._1, a._2, a._3).toString <= (b._1, b._2, b._3).toString))
    }
    // A user with n events yields n-2 trigrams; total mass is bounded by
    // events - 2*users (exact when every user has >= 2 events).
    assert(rows.map(_._4).sum <= nEvents)
  }

  test("interarrival stats: gap conservation and ordering") {
    val rows = TemporalOps.interarrivalStats(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == nEvents - nUsers)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L)                    // min_us
      assert(r.getLong(2) <= r.getLong(4) && r.getLong(4) <= r.getLong(3))
    }
  }

  test("attribution conserves purchases; seasonal grid partitions the corpus") {
    val attr = TemporalOps.attributionLastTouch(spark, sf).collect()
    val purchases = events.filter(col("event_type") === "purchase").count()
    assert(attr.map(_.getLong(1)).sum == purchases)
    assert(attr.map(_.getString(0)).forall(Set("view", "click", "none")))

    val grid = TemporalOps.seasonalProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(grid.map(_._3).sum == nEvents)
    grid.foreach { case (dow, hour, cnt, ppm) =>
      assert(dow >= 0L && dow <= 6L && hour >= 0L && hour <= 23L)
      assert(ppm == 1000000L * cnt / nEvents)
    }
  }

  test("assortativity is a bounded correlation over an even edge count") {
    val r = graft.operators.GraphOps.assortativity(spark, sf).collect()(0)
    assert(r.getLong(0) % 2 == 0L, "symmetric directed list must be even")
    assert(math.abs(r.getLong(1)) <= 1000001L, "correlation must be in [-1, 1]")
  }

  test("drift cusum: final value closes the telescoping sum exactly") {
    val rows = TemporalOps.driftCusum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val ndays = rows.length.toLong
    assert(total == nEvents)
    // CUSUM telescopes: final = 1000*total - ndays*((1000*total) div ndays).
    val mu = (1000L * total) / ndays
    assert(rows.last._3 == 1000L * total - ndays * mu)
    rows.foreach { case (_, _, _, flag) => assert(flag == 0L || flag == 1L) }
  }

  test("gap quantiles match a serial rank-select replay") {
    val evs = events.select("user_id", "event_type", "ts_us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gapsByType = evs.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case ((_, t), xs) =>
        val ts = xs.sortBy(e => (e._3, e._4)).map(_._3)
        ts.zip(ts.tail).map { case (a, b) => t -> (b - a) / 1000000L }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def q(sorted: Seq[Long], p: Int): Long = {
      val cnt = sorted.length.toLong
      val rank = math.max((p * cnt + 999) / 1000, 1L)
      sorted((rank - 1).toInt)
    }
    val got = TemporalOps.gapQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == gapsByType.keySet)
    gapsByType.foreach { case (t, sorted) =>
      val want = (sorted.length.toLong, q(sorted, 500), q(sorted, 900), q(sorted, 990))
      assert(got(t) == want, s"type $t: ${got(t)} vs $want")
      val (_, p50, p90, p99) = got(t)
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("rolling 7-day median matches a serial replay") {
    val byDay = events.groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val days = (byDay.keys.min to byDay.keys.max).toSeq
    val want = days.map { d =>
      val win = days.filter(b => b >= d - 6 && b <= d)
        .map(b => byDay.getOrElse(b, 0L)).sorted
      d -> (win.length.toLong, win((win.length + 1) / 2 - 1))
    }.toMap
    val got = TemporalOps.rollingMedian7d(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("duplicate-event audit conserves events and flags planted dup") {
    val rows = TemporalOps.duplicateEventAudit(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == nEvents)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == 1000L * r.getLong(2) / r.getLong(1))
    }
    // Differential on a tiny synthetic frame with one planted duplicate
    // (same user/type/value 0.5 s apart) and one near-miss (value differs).
    import spark.implicits._
    val t0 = 1700000000000000L
    val df = Seq(
      (1L, t0, 7L, "click", Some(1.5)),
      (2L, t0 + 500000L, 7L, "click", Some(1.5)),      // dup suspect
      (3L, t0 + 1000000L, 7L, "click", Some(2.0)),     // value differs
      (4L, t0 + 600000000L, 7L, "click", Some(1.5)))   // too far apart
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    val suspects = df
      .withColumn("prev_ts", lag("ts_us", 1).over(w))
      .withColumn("prev_v", lag("value", 1).over(w))
      .filter(col("prev_ts").isNotNull &&
        col("ts_us") - col("prev_ts") <= 1000000L &&
        col("value") <=> col("prev_v"))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(suspects == Seq(2L))
  }

  test("anomaly_days verdicts equal the streaming isAnomalous algebra") {
    val rows = TemporalOps.anomalyDays(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var (k, s_, ss) = (0L, 0L, 0L)
    rows.sortBy(_._1).foreach { case (day, c, seen, flag) =>
      assert(seen == k, s"day $day history count")
      val want = graft.streaming.StreamingAnomaly.isAnomalous(c, k, s_, ss)
      assert(flag == (if (want) 1L else 0L),
        s"day $day batch verdict diverges from streaming algebra")
      k += 1; s_ += c; ss += c * c
    }
  }

  test("keyword search: conjunctive semantics and contiguous ranks") {
    val byDoc = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split("\\s+").filter(_.nonEmpty).toSet).toMap
    val rows = graft.operators.TfIdfOps.keywordSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val terms = graft.operators.TfIdfOps.QuerySet.toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length))
      g.foreach { case (_, _, doc, score) =>
        assert(terms(qid).forall(byDoc(doc).contains),
          s"doc $doc missing a term of query $qid")
        assert(score > 0L)
      }
      // Scores are non-increasing with rank.
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("acf daily matches a serial replay and is bounded by 1") {
    val rows = TemporalOps.acfDaily(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    // Serial replay from the dense daily series.
    val byDay = events.groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val days = byDay.keys.min to byDay.keys.max
    val xs = days.map(d => byDay.getOrElse(d, 0L)).toArray
    val n = xs.length
    val mean = xs.sum.toDouble / n
    val den = xs.map(x => (x - mean) * (x - mean)).sum
    rows.foreach { case (lag, m, acf) =>
      assert(m == n - lag, s"lag $lag pair count")
      val k = lag.toInt
      val num = (0 until n - k).map(i => (xs(i) - mean) * (xs(i + k) - mean)).sum
      val want = num / den
      assert(math.abs(acf - want) <= 5e-4, s"lag $lag acf $acf vs $want")
      assert(math.abs(acf) <= 1.0 + 1e-9)
    }
  }
}
