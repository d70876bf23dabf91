package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnOps, BinaryAnnOps, LayoutOps, SampleOps}
import graft.streaming.StreamingSemanticDecon

/** r15 second wave: binary-quantization ANN, the Matryoshka recall
  * ladder, semantic decontamination (+ streaming twin), compaction
  * planning, and leave-one-source-out ablation.
  */
class BinaryAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("signCodes packs sign bits into the documented word/bit positions") {
    import spark.implicits._
    // dim 0 and dim 33 positive -> w0 bit 0, w1 bit 1; all else <= 0.
    val v = Array.fill(64)(-1.0f)
    v(0) = 0.5f; v(33) = 2.0f
    val df = Seq((7L, v.toSeq)).toDF("vec_id", "embedding")
    val r = BinaryAnnOps.signCodes(df).collect().head
    assert(r.getLong(1) == 1L, s"w0 = ${r.getLong(1)}")
    assert(r.getLong(2) == 2L, s"w1 = ${r.getLong(2)}")
  }

  test("ann_binary_topk emits the ann_topk contract and recovers neighbors") {
    val rows = BinaryAnnOps.annBinaryTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(2)).sorted
      assert(ranks.sameElements(1L to ranks.length))
      val scores = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // Shortlist (100) covers half the sf0.001 corpus: recall must be
    // comfortably above chance for at least one query.
    val rec = BinaryAnnOps.annRecallBinary(spark, sf).collect()
    assert(rec.length == 5)
    assert(rec.forall { r =>
      val m = r.getLong(3); m >= 0 && m <= 1000
    })
    assert(rec.exists(_.getLong(3) >= 500),
      s"recalls = ${rec.map(_.getLong(3)).mkString(",")}")
  }

  test("matryoshka ladder: both widths audited, recall in range") {
    val rows = BinaryAnnOps.annMatryoshkaRecall(spark, sf).collect()
    val dims = rows.map(_.getLong(0)).distinct.sorted
    assert(dims.sameElements(Seq(16L, 32L)))
    assert(rows.length == 10) // 2 widths x 5 queries
    assert(rows.forall { r =>
      val m = r.getLong(4); m >= 0 && m <= 1000
    })
  }

  test("semantic decon flags a corpus vector identical to an eval vector") {
    import spark.implicits._
    val a = (0 until 64).map(i => (i + 1).toFloat)
    val b = (0 until 64).map(i => (64 - i).toFloat)
    val eval = Seq(a)
    val corpus = Seq((10L, a, 1), (11L, b, 2)).toDF("vec_id", "embedding", "label")
    val out = AnnOps.semanticFlags(corpus, eval).orderBy("vec_id").collect()
    assert(out.head.getAs[Long]("max_cos_milli") == 1000L)
    assert(out.head.getAs[Long]("flagged") == 1L)
    assert(out.last.getAs[Long]("max_cos_milli") < 1000L)
  }

  test("streamed semantic flags equal the batch flags row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val evalVecs = AnnOps.evalCohort(emb, AnnOps.SemanticEvalN)
    val corpus = emb.filter(col("vec_id") >= AnnOps.SemanticEvalN)
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect()

    val input = MemoryStream[(Long, Seq[Float], Int)]
    val frame = input.toDF().toDF("vec_id", "embedding", "label")
    input.addData(corpus.take(17): _*)
    input.addData(corpus.drop(17): _*)
    val query = StreamingSemanticDecon.flags(frame, evalVecs)
      .writeStream.format("memory").queryName("semdecon_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("semdecon_test").collect().map(_.toSeq).toSet
      val batch = AnnOps
        .semanticFlags(emb.filter(col("vec_id") >= AnnOps.SemanticEvalN), evalVecs)
        .select("vec_id", "label", "max_cos_milli", "flagged")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("compaction plan: groups partition the corpus and respect bin edges") {
    val docsTotal = Tables.documents(spark, sf).count()
    val plan = LayoutOps.compactionPlan(spark, sf).collect()
    assert(plan.map(_.getAs[Long]("n_docs")).sum == docsTotal)
    val t = LayoutOps.CompactionTargetBytes
    plan.groupBy(_.getString(0)).foreach { case (_, gs) =>
      val ordered = gs.sortBy(_.getAs[Long]("merge_group"))
      // File ranges strictly advance (no overlap between groups).
      ordered.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("file_hi") < y.getAs[Long]("file_lo"))
        case _ =>
      }
      // Start-offset binning: the cumulative mass through each non-final
      // group crosses that group's upper bin edge; each group starts
      // inside its own bin.
      var cum = 0L
      ordered.zipWithIndex.foreach { case (g, i) =>
        val grp = g.getAs[Long]("merge_group")
        assert(cum >= grp * t && cum < (grp + 1) * t,
          s"group $grp starts at $cum")
        cum += g.getAs[Long]("bytes")
        if (i < ordered.length - 1)
          assert(cum >= (grp + 1) * t, s"non-final group $grp ends at $cum")
      }
    }
  }

  test("NN-descent refinement never loses recall vs the base IVF graph") {
    import graft.operators.LloydOps
    // The refined candidate set is a superset of the base edges (direct
    // branch), scored identically — per-cohort total hits are monotone.
    val base = LloydOps.knnRecallIvf(spark, sf).collect()
      .map(_.getAs[Long]("hits")).sum
    val refined = LloydOps.knnRecallRefined(spark, sf).collect()
      .map(_.getAs[Long]("hits")).sum
    assert(refined >= base, s"refined $refined < base $base")
    // Contract: ranks dense from 1, scores non-increasing per query.
    val g = LloydOps.knnGraphRefined(spark, sf).collect()
    assert(g.nonEmpty)
    g.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(2)).sorted
      assert(ranks.sameElements(1L to ranks.length))
    }
  }

  test("harmonic centrality: bounded terms, deterministic across runs") {
    import graft.operators.GraphOps
    val a = GraphOps.harmonicCentrality(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val reached = r.getAs[Long]("n_reached")
      val h = r.getAs[Long]("harmonic_micro")
      assert(reached >= 1L && reached <= 8L)
      // Each reached seed contributes (0, 1e6] micro.
      assert(h > 0L && h <= reached * 1000000L)
    }
    val b = GraphOps.harmonicCentrality(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("entity clusters: a transitive 3-chain collapses to one entity") {
    import spark.implicits._
    import graft.operators.AssocOps
    // aaaa~aaab (dist 1), aaab~aabb (dist 1), but aaaa~aabb dist 2: with
    // maxDist 1 only the chain links match — transitivity must merge all
    // three. 'zzzz' shares the block but matches nothing.
    val recs = Seq(
      (1L, "aaaa", "t", 1), (2L, "aaab", "t", 1),
      (3L, "aabb", "t", 1), (9L, "zzzz", "t", 1))
      .toDF("key", "p_name", "p_type", "p_size")
    val out = AssocOps.entityClustersOf(spark, recs, maxDist = 1, rounds = 4)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("entity") == 1L)
    assert(out.head.getAs[Long]("n_members") == 3L)
    assert(out.head.getAs[Long]("key_lo") == 1L)
    assert(out.head.getAs[Long]("key_hi") == 3L)
  }

  test("l-diversity audit: ladder rows present, suppression monotone in l") {
    import graft.operators.PiiOps
    val rows = PiiOps.lDiversityAudit(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("l")).toSeq == Seq(2L, 3L, 5L))
    val supp = rows.map(_.getAs[Long]("suppress_ppm"))
    assert(supp.zip(supp.tail).forall { case (a, b) => a <= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("classes_below") <= r.getAs[Long]("n_classes"))
    }
  }

  test("lang kappa: po matches the confusion diagonal, kappa in range") {
    import graft.operators.TextOps
    val k = TextOps.langKappa(spark, sf).collect().head
    val n = k.getAs[Long]("n_docs")
    val agree = k.getAs[Long]("agree_docs")
    val diag = TextOps.langConfusion(spark, sf).collect()
      .filter(r => r.getString(0) == r.getString(1))
      .map(_.getAs[Long]("docs")).sum
    assert(agree == diag)
    assert(k.getAs[Long]("po_ppm") == 1000000L * agree / n)
    val km = k.getAs[Long]("kappa_milli")
    assert(km >= -1000L && km <= 1000L)
  }

  test("temporal embargo split: ordered time boxes, train carryover total") {
    import graft.operators.SplitOps
    val rows = SplitOps.splitTemporalEmbargo(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("train", "embargo", "test"))
    val tr = rows("train"); val em = rows("embargo"); val te = rows("test")
    // Train ends strictly before the embargo band, which ends strictly
    // before test begins.
    assert(tr.getAs[Long]("ts_hi") < em.getAs[Long]("ts_lo"))
    assert(em.getAs[Long]("ts_hi") < te.getAs[Long]("ts_lo"))
    assert(tr.getAs[Long]("users_in_train") == tr.getAs[Long]("n_users"))
    val total = rows.values.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("selection scores: per-source cut is exact and waterline-consistent") {
    import graft.operators.SampleOps
    val rows = SampleOps.selectionScores(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val sel = r.getAs[Long]("n_selected")
      // Exact per-source cut: floor(600 * n / 1000) docs admitted.
      assert(sel == (SampleOps.SelectMilli * n) / 1000,
        s"source ${r.getString(0)}: $sel of $n")
      val wl = r.getAs[Long]("waterline_score")
      assert(wl >= 0L && wl <= 1000L)
      assert(r.getAs[Long]("sel_keep") <= sel)
    }
  }

  test("dedup consensus: planted verdicts land in the right contingency cells") {
    import spark.implicits._
    import graft.operators.DedupClusterOps
    val base = (1 to 30).map(k => s"w${k}a w${k}b w${k}c").mkString(" ")
    val docs = Seq(
      // Exact pair: identical texts (also normalized- and near-dups).
      (1L, base), (2L, base),
      // Normalized-only pair: own vocabulary, differ by case/punct only
      // (shingles are case-sensitive, so they never near-dup pair).
      (3L, (1 to 40).map(k => s"n${k}p n${k}q").mkString(" ")),
      (4L, (1 to 40).map(k => s"N${k}P N${k}Q").mkString(" ") + "."),
      // Near-only pair: one word of ~90 changed.
      (5L, s"$base uniq5 end"), (6L, s"$base uniq6 end"),
      // Unique doc: shares nothing.
      (9L, (1 to 40).map(k => s"z${k}x z${k}y").mkString(" ")))
      .toDF("doc_id", "text")
    val cells = DedupClusterOps.dedupConsensusOf(docs, 600)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(cells((1L, 1L, 1L)) == 2L, s"exact pair: $cells")      // 1,2
    assert(cells((0L, 1L, 0L)) == 2L, s"norm-only pair: $cells")  // 3,4
    assert(cells((0L, 0L, 1L)) == 2L, s"near-only pair: $cells")  // 5,6
    assert(cells((0L, 0L, 0L)) == 1L, s"unique doc: $cells")      // 9
  }

  test("source ablation: totals reconcile and ablating the worst source helps") {
    val rows = SampleOps.sourceAblation(spark, sf).collect()
    assert(rows.length >= 2)
    val full = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("docs")).sum == full)
    val worst = rows.minBy(_.getAs[Long]("kept_ppm"))
    assert(worst.getAs[Long]("delta_ppm") >= 0L)
    val best = rows.maxBy(_.getAs[Long]("kept_ppm"))
    assert(best.getAs[Long]("delta_ppm") <= 0L)
  }
}
