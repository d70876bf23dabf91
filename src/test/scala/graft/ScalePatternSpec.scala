package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{LayoutOps, SketchOps, SkewOps}

/** Behavioral checks for the scale-pattern trio: salted join, z-order
  * layout planning, and the Bloom pre-filter audit.
  */
class ScalePatternSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("salted join equals the plain join at any salt count") {
    import spark.implicits._
    val probe = Seq((1L, 10L), (1L, 20L), (2L, 30L), (3L, 40L), (9L, 50L))
      .toDF("k", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    for (salts <- Seq(1, 4, 16)) {
      val salted = SkewOps.saltedJoin(probe, dim, "k", col("v"), salts)
        .orderBy("k", "v").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val plain = probe.join(dim, "k")
        .orderBy("k", "v").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(salted.toSeq == plain.toSeq, s"salts=$salts")
    }
    // Reserved-name guard fires instead of silently mis-joining.
    val bad = probe.withColumn("__salt", lit(0))
    assertThrows[IllegalArgumentException] {
      SkewOps.saltedJoin(bad, dim, "k", col("v"))
    }
  }

  test("salted join keeps probe rows whose salt column is NULL") {
    import spark.implicits._
    val probe = Seq((1L, Some(10L)), (1L, None), (2L, Some(30L)))
      .toDF("k", "v") // v is nullable; used as the salt source
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val salted = SkewOps.saltedJoin(probe, dim, "k", col("v"), 4)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(salted.toSeq == Seq(1L, 1L, 2L),
      s"NULL-salt row dropped: ${salted.toSeq}")
  }

  test("mixture plan skips unlisted languages instead of dividing by zero") {
    import spark.implicits._
    val docs = (0 until 30).map(i => (i.toLong, Seq("en", "es", "it")(i % 3)))
      .toDF("doc_id", "lang") // 'it' has no target share
    val rows = graft.operators.SampleOps.mixturePlanFor(docs).collect()
    val langs = rows.map(_.getString(0)).toSet
    assert(langs == Set("en", "es"), s"unlisted language not skipped: $langs")
    rows.foreach(r => assert(r.getLong(3) > 0)) // every target_permille > 0
  }

  test("zorder plan: every file's span on BOTH dims is a fraction of full range") {
    val plan = LayoutOps.zorderPlan(spark, sf).collect()
    assert(plan.nonEmpty && plan.length <= LayoutOps.DefaultFiles)
    val xFull = plan.map(_.getLong(3)).max - plan.map(_.getLong(2)).min
    val yFull = plan.map(_.getLong(5)).max - plan.map(_.getLong(4)).min
    // bits=8, 64 files => each file is one aligned 32x32 tile of the
    // 256x256 bucket grid: per-file bucket span <= 32/256 = 1/8 of the
    // range (+1 bucket width of slack for the scale-down rounding).
    plan.foreach { r =>
      val xs = r.getLong(3) - r.getLong(2)
      val ys = r.getLong(5) - r.getLong(4)
      assert(xs <= xFull / 8 + xFull / 256 + 1,
        s"file ${r.getLong(0)}: x span $xs vs full $xFull")
      assert(ys <= yFull / 8 + yFull / 256 + 1,
        s"file ${r.getLong(0)}: y span $ys vs full $yFull")
    }
    // All rows accounted for.
    val total = plan.map(_.getLong(1)).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("bloom audit: no false negatives, and a planted cross-carve dup is an exact match") {
    import spark.implicits._
    // fp values chosen directly (the audit takes any (doc_id, lang, fp)):
    // doc 10 is eval (doc_id % 10 == 0); doc 11 shares its fp => exact
    // match; doc 12 has a different fp.
    val frame = Seq(
      (10L, "en", 777777L),
      (11L, "en", 777777L),
      (12L, "en", 123456789L),
      (20L, "de", 555L),
      (21L, "de", 99999999L)
    ).toDF("doc_id", "lang", "fp")
    val out = SketchOps.bloomAudit(frame).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (enTotal, enBloom, enExact, _) = out("en")
    assert(enTotal == 2)
    assert(enExact == 1, s"planted dup not matched: ${out("en")}")
    // Bloom admits every exact match (no false negatives).
    assert(enBloom >= enExact)
    out.values.foreach { case (_, bp, ex, fps) =>
      assert(bp >= ex && fps == bp - ex)
    }
  }

  test("cms estimates match a naive driver-side sketch and never undercount") {
    val out = SketchOps.cmsUserCounts(spark, sf, k = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (u, t, est, over) =>
      assert(est >= t, s"user $u undercounted: est $est < true $t")
      assert(over == est - t)
    }
    // Independent naive recompute of the whole sketch.
    val users = Tables.events(spark, sf).select("user_id").collect().map(_.getLong(0))
    val counters = Array.fill(SketchOps.CmsD, SketchOps.CmsW.toInt)(0L)
    def pos(k: Long, d: Int) = (((k % SketchOps.P) * SketchOps.CmsK(d)) % SketchOps.P % SketchOps.CmsW).toInt
    users.foreach(u => (0 until SketchOps.CmsD).foreach(d => counters(d)(pos(u, d)) += 1))
    val truth = users.groupBy(identity).map { case (u, v) => u -> v.length.toLong }
    out.foreach { case (u, t, est, _) =>
      assert(t == truth(u))
      val naive = (0 until SketchOps.CmsD).map(d => counters(d)(pos(u, d))).min
      assert(est == naive, s"user $u: spark est $est vs naive $naive")
    }
  }

  test("registered bloom audit invariants hold on the corpus") {
    val rows = SketchOps.bloomDecontaminationStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3)) // bloom_positive >= exact_matches
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
      assert(r.getLong(1) >= r.getLong(2))
    }
  }

  test("sequence packing equals a serial replay and is bucket-size invariant") {
    val rows = LayoutOps.packSequences(spark, sf).collect()
    assert(rows.nonEmpty)
    // Serial driver-side replay of the token prefix sum — the hierarchical
    // two-level sum must be indistinguishable from concatenating in doc_id
    // order.
    var off = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) == off / LayoutOps.DefaultSeqLen, s"doc ${r.getLong(0)} seq_id")
      assert(r.getLong(3) == off % LayoutOps.DefaultSeqLen, s"doc ${r.getLong(0)} offset")
      val straddles =
        off / LayoutOps.DefaultSeqLen != (off + math.max(n, 1) - 1) / LayoutOps.DefaultSeqLen
      assert(r.getLong(4) == (if (straddles) 1L else 0L), s"doc ${r.getLong(0)} straddle")
      off += n
    }
    // The carry-bucket width is a pure parallelism knob, not a semantic one.
    val other = LayoutOps.packSequences(spark, sf, bucket = 17L).collect()
    assert(rows.map(_.toString).toSeq == other.map(_.toString).toSeq)
  }
}
