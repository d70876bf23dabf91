package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{TextOps, WindowOps}

/** Behavioral checks for the r6 analytics additions, each cross-checked
  * against an independently computed (driver-side, naive) reference at
  * sf0.001 — the local tier below the DuckDB oracle gate.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("grouped quantiles are monotone and match a naive sorted-rank check") {
    val rows = WindowOps.quantilesDensityByFlag(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val qs = (1 to 4).map(r.getLong)
      assert(qs == qs.sorted, s"non-monotone quantiles for ${r.getString(0)}: $qs")
    }
    // Naive reference: collect densities, sort, take rank ceil(p*n).
    val dens = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") / (col("l_quantity") + lit(1)) * 1000 + 0.5)
          .cast("long").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    rows.foreach { r =>
      val sorted = dens(r.getString(0))
      WindowOps.QuantilesPermille.zipWithIndex.foreach { case (p, i) =>
        val rank = math.max(1, (p * sorted.length + 999) / 1000)
        assert(r.getLong(i + 1) == sorted(rank - 1),
          s"${r.getString(0)} p$p: got ${r.getLong(i + 1)}, want ${sorted(rank - 1)}")
      }
    }
  }

  test("retention matrix: full offset-0 retention, bounded cells, conserved users") {
    val rows = graft.operators.FunnelOps.retentionMatrix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val sizes = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (cohort, off, active, permille) =>
      if (off == 0L) assert(permille == 1000L)
      assert(active <= sizes(cohort), s"cohort $cohort offset $off overflows")
      assert(permille == 1000L * active / sizes(cohort))
      assert(off >= 0L)
    }
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(sizes.values.sum == totalUsers, "cohort sizes must partition users")
  }

  test("conversion quantiles are monotone and count funnel converters") {
    val r = graft.operators.FunnelOps.conversionTimeQuantiles(spark, sf).collect().head
    val (n, p25, p50, p75) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(p25 <= p50 && p50 <= p75, s"non-monotone: $p25 $p50 $p75")
    val stage3 = graft.operators.FunnelOps.funnel(spark, sf).collect()
      .find(_.getLong(0) == 3L).get.getLong(2)
    assert(n == stage3, s"converted $n != funnel stage-3 $stage3")
  }

  test("trailing hour stats equal a naive per-user range count") {
    val out = WindowOps.trailingHourStats(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    val evs = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts_us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val byUser = evs.groupBy(_._2)
    evs.foreach { case (id, uid, ts, _) =>
      val in = byUser(uid).filter(e => e._3 >= ts - 3600000000L && e._3 <= ts)
      val expSum = BigDecimal(in.flatMap(_._4).map(BigDecimal(_)).sum
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(out(id)._1 == in.length, s"event $id count")
      assert(math.abs(out(id)._2 - expSum.toDouble) < 1e-9, s"event $id sum")
    }
  }

  test("decontaminate removes exactly the eval-digest matches") {
    val docs = Tables.documents(spark, sf)
    val evalSet = docs.filter(
      graft.functions.GraftFunctions.poly_hash(col("text"), 31, 1000000007L) % 10 === 0)
    val evalDigests = evalSet.select(sha2(col("text"), 256).as("d"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(evalDigests.nonEmpty, "eval carve must be non-empty")
    val survivors = TextOps.decontaminate(docs, evalSet)
      .select(sha2(col("text"), 256).as("d")).collect().map(_.getString(0))
    assert(survivors.forall(d => !evalDigests.contains(d)))
    val removed = docs.count() - survivors.length
    assert(removed >= evalSet.count(), "every eval member must be removed")
  }

  test("top bigrams match a naive occurrence count with tie-break") {
    val out = TextOps.topBigrams(spark, sf, k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val naive = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
      .flatMap { t =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        toks.iterator.zip(toks.iterator.drop(1)).map { case (a, b) => s"$a $b" }
      }
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      .toSeq.sortBy { case (b, c) => (-c, b) }.take(20)
    assert(out.toSeq == naive)
  }

  test("multi-suite decontamination equals K independent single-suite passes") {
    import graft.operators.TextOps
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val multi = TextOps.decontaminationNgramMulti(spark, sf).collect()
    assert(multi.nonEmpty)
    // Rebuild the registered carve and run the single-suite operator per
    // suite — the one-pass tagged-broadcast fold must be indistinguishable.
    val docs = Tables.documents(spark, sf)
    val fp = graft.functions.GraftFunctions.poly_hash(col("text"), 31, 1000000007L)
    val carve = docs.withColumn("fp", fp)
      .orderBy(col("fp"), col("doc_id")).limit(3 * TextOps.EvalCarveDocs)
      .withColumn("rn", row_number().over(Window.orderBy(col("fp"), col("doc_id"))))
      .withColumn("suite_id", expr(s"cast((rn - 1) div ${TextOps.EvalCarveDocs} as int)"))
    val train = docs.join(broadcast(carve.select("doc_id")), Seq("doc_id"), "left_anti")
    (0 until 3).foreach { k =>
      val single = TextOps.decontaminateNgram(
        train, carve.filter(col("suite_id") === k).drop("fp", "rn", "suite_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      multi.foreach { r =>
        assert(r.getLong(1 + k) == single(r.getLong(0)),
          s"doc ${r.getLong(0)} suite $k")
      }
    }
    multi.foreach { r =>
      val any = (1 to 3).map(r.getLong).sum > 0
      assert(r.getLong(4) == (if (any) 1L else 0L), s"doc ${r.getLong(0)}")
    }
  }

  test("cdc merge resolves to the global latest state with consistent ops") {
    import graft.operators.TopKOps
    val merged = TopKOps.cdcMerge(spark, sf).collect()
    // Latest-wins over (snapshot ∪ batch) must equal latest over the whole
    // log — latestEventPerUser is the independent oracle for the payload.
    val latest = TopKOps.latestEventPerUser(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged.length == latest.size)
    merged.foreach { r =>
      assert(latest(r.getLong(0)) == (r.getLong(2), r.getLong(3)), s"user ${r.getLong(0)}")
    }
    // Op classification agrees with which carve each user appears in.
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val inSnap = ev.filter(_._2 % 10 < 8).map(_._1).toSet
    val inUpd = ev.filter(_._2 % 10 >= 8).map(_._1).toSet
    merged.foreach { r =>
      val (u, op) = (r.getLong(0), r.getString(1))
      assert(Set("insert", "update", "stale_update", "carry")(op), op)
      if (op == "insert") assert(!inSnap(u) && inUpd(u), s"user $u")
      if (op == "carry") assert(inSnap(u) && !inUpd(u), s"user $u")
      if (op == "update" || op == "stale_update") assert(inSnap(u) && inUpd(u), s"user $u")
      // An update wins exactly when the global latest row is a batch row.
      if (inSnap(u) && inUpd(u)) {
        val latestIsBatch = latest(u)._2 % 10 >= 8
        assert((op == "update") == latestIsBatch, s"user $u op $op")
      }
    }
  }

  test("median/MAD outliers flag the extreme value a dragged mean would mask") {
    import spark.implicits._
    // 20 tight values + one extreme: the extreme drags the mean toward
    // itself and inflates sigma (classic masking); the median and MAD
    // barely move, so the robust test must flag exactly the one row.
    val vals = (Seq.fill(10)(100.0) ++ Seq.fill(10)(102.0) :+ 10000.0)
      .map(("a", _))
    val r = graft.operators.StatsOps
      .robustOutliers(vals.toDF("event_type", "value"), k = 3)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 21L) // n
    assert(row.getLong(2) == 102000L) // median_milli: the 11th of 21 sorted values
    assert(row.getLong(3) == 2000L) // mad_milli: deviations are {0 x10, 2000 x10, big}
    assert(row.getLong(4) == 1L, s"expected exactly the planted extreme flagged: $row")
  }

  test("int8 audit: errors bounded by half a quantization step, amax dim saturates") {
    val audit = graft.operators.StatsOps.embeddingInt8Audit(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(audit.nonEmpty)
    // Per-label half-step bound: err <= scale/2 = amax/254 for every
    // vector, so the label's worst error is bounded by its worst amax.
    val bounds = graft.Tables.embeddings(spark, sf)
      .select(col("label").cast("long").as("label"),
        expr("array_max(transform(embedding, x -> abs(cast(x as double))))")
          .as("amax"))
      .groupBy("label").agg(max("amax").as("amax"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    audit.foreach { case (label, (vectors, maxErr, avgErr, sat)) =>
      val bound = math.floor(bounds(label) / 254.0 * 1e9).toLong + 1
      assert(maxErr <= bound, s"label $label maxErr=$maxErr > bound=$bound")
      assert(avgErr <= maxErr, s"label $label avg above max")
      // The dimension achieving amax quantizes to exactly +-127.
      assert(sat >= vectors, s"label $label saturated=$sat < vectors=$vectors")
    }
  }
}
