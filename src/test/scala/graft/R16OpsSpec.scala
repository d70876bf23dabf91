package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 operator specs: entity-resolution convergence twin, the
  * semantic-decontamination tau seam, and the CSV sink schema derivation.
  */
class R16OpsSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf

  test("entity clusters converged: a 7-chain merges where 4 fixed rounds fragment") {
    import spark.implicits._
    import graft.operators.AssocOps
    // Adjacent names are Levenshtein-1 apart; non-adjacent are >1. With
    // maxDist 1 the match graph is a 7-node path whose min label needs 6
    // propagation hops — beyond the production form's 4 rounds.
    val names = Seq("aaaa", "aaab", "aabb", "abbb", "bbbb", "bbbc", "bbcc")
    val recs = names.zipWithIndex
      .map { case (n, i) => ((i + 1).toLong, n, "t", 1) }
      .toDF("key", "p_name", "p_type", "p_size")
    val fixed = AssocOps.entityClustersOf(spark, recs, maxDist = 1, rounds = 4)
      .collect()
    // The documented fixed-round contract: the chain fragments.
    assert(fixed.length == 3)
    val (iters, convDf) =
      AssocOps.entityClustersConvergedOf(spark, recs, maxDist = 1, maxIters = 50)
    val conv = convDf.collect()
    assert(conv.length == 1)
    assert(conv.head.getAs[Long]("entity") == 1L)
    assert(conv.head.getAs[Long]("n_members") == 7L)
    assert(conv.head.getAs[Long]("key_lo") == 1L)
    assert(conv.head.getAs[Long]("key_hi") == 7L)
    // Plain min-label would need 6 propagation rounds + 1 no-change
    // round; the r17 fused pointer jump (lab ← min(neighbor-min,
    // prev-round lab(lab))) shortcuts the chain to ~log rounds —
    // measured 4. Sub-chain-length convergence IS the property pinned:
    // a regression that drops the jump fails the upper bound.
    assert(iters >= 2 && iters < 6, s"iters=$iters")
  }

  test("entity clusters converged matches fixed form on the real table when 4 rounds suffice") {
    import graft.operators.AssocOps
    // At sf0.001 every chain is short; the two forms must agree exactly.
    val fixed = AssocOps.entityClusters(spark, sf).collect().map(_.toSeq).toSeq
    val conv = AssocOps.entityClustersConverged(spark, sf)._2
      .collect().map(_.toSeq).toSeq
    assert(fixed == conv)
  }

  test("SCC: planted two-cycle digraph peels in two outer rounds") {
    import spark.implicits._
    import graft.operators.GraphOps
    // Cycle A {1,2,3} → cycle B {4,5}; 6→7→1 feeder chain, 5→8 sink.
    // Round 1: trim kills 6,7,8; FW gives f≡1 on {1..5}; BW marks only
    // {1,2,3} (4,5 cannot reach 1). Round 2 peels {4,5}.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L),
      (3L, 4L), (6L, 7L), (7L, 1L), (5L, 8L)).toDF("src", "dst")
    val out = GraphOps.sccOf(spark, edges, maxOuter = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 3L), (4L, 2L, 4L, 5L),
      (6L, 1L, 6L, 6L), (7L, 1L, 7L, 7L), (8L, 1L, 8L, 8L)))
  }

  test("SCC summary is consistent: members partition the node set") {
    import graft.operators.GraphOps
    val rows = GraphOps.sccComponents(spark, sf).collect()
    val nodes = GraphOps.sccEdges(spark, sf)
      .select("src").union(GraphOps.sccEdges(spark, sf).select("dst"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nodes)
    rows.foreach { r =>
      assert(r.getAs[Long]("key_lo") == r.getAs[Long]("scc")) // min member IS the id
      assert(r.getAs[Long]("key_hi") >= r.getAs[Long]("key_lo"))
    }
  }

  test("t-closeness: ladder monotone, suppression bounded, rows conserved") {
    import graft.operators.PiiOps
    val rows = PiiOps.tClosenessAudit(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("t_ppm")).toSeq == PiiOps.ClosenessTsPpm)
    val above = rows.map(_.getAs[Long]("classes_above"))
    // Raising t can only shrink the violating set.
    assert(above.zip(above.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("classes_above") <= r.getAs[Long]("n_classes"))
      val supp = r.getAs[Long]("suppress_ppm")
      assert(supp >= 0L && supp <= 1000000L)
    }
  }

  test("cluster-balanced sampling: equal-share cap, conservation, waterline sanity") {
    import graft.operators.LloydOps
    val rows = LloydOps.sampleClusterBalanced(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    val quota = total / LloydOps.K
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_kept"))
      assert(kept == math.min(n, quota)) // exact equal-share cut
      assert(r.getAs[Long]("labels_kept") >= 1L)
      assert(r.getAs[Long]("waterline_h") >= 0L)
    }
  }

  test("SQ8 ANN: near-lossless recall and exact-cosine output contract") {
    import graft.operators.{AnnOps, BinaryAnnOps}
    val rec = BinaryAnnOps.annRecallSq8(spark, sf).collect()
    assert(rec.nonEmpty)
    // int8 symmetric quantization barely perturbs ranking: recall@10
    // measured 1000 milli at every gated SF; pin a generous floor.
    rec.foreach(r => assert(r.getAs[Long]("recall_milli") >= 900L))
    // The re-rank emits EXACT cosines: top-1 per query must equal the
    // exact path's top-1 score.
    val exact = AnnOps.annTopK(spark, sf).filter("rank = 1").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    BinaryAnnOps.annSq8TopK(spark, sf).filter("rank = 1").collect()
      .foreach(r => assert(r.getDouble(3) == exact(r.getLong(0))))
  }

  test("phash near-dup: planted re-encoded frame pairs at the expected Hamming") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.MultimodalOps
    // Build a corpus by hand: doc 1 and doc 2 share a 64-char frame with
    // ONE character brightness-shifted (a re-encode artifact) — distinct
    // md5, perceptually adjacent. Doc 3 is unrelated noise.
    val base = ("ab" * 32).take(64)
    val near = "zb" + base.drop(2) // 1 char differs ('a'->'z' flips its bit)
    val noise = (0 until 64).map(i => ('A' + (i * 7) % 26).toChar).mkString
    val docs = Seq(
      (1L, base, "en", "s0", 64L),
      (2L, near, "en", "s0", 64L),
      (3L, noise, "en", "s0", 64L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = MultimodalOps.sampleFrames(MultimodalOps.withPayload(docs))
      .filter(octet_length(col("frame")) === MultimodalOps.FrameBytes)
    assert(frames.count() == 3)
    // Run the full pipeline via a temp parquet dir shaped like a table.
    val out = {
      val dir = java.nio.file.Files.createTempDirectory("phash-docs").toString
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      MultimodalOps.mediaPhashDedup(spark, dir).collect()
    }
    val histo = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Exactly one near pair within the Hamming budget, zero dropped buckets.
    assert(histo.getOrElse(-1L, 0L) == 0L)
    assert(histo.filter(_._1 >= 0).values.sum == 1L)
  }

  test("streaming manifest replay snapshot equals the batch shard manifest") {
    import graft.operators.SampleOps
    import graft.streaming.StreamingReplay
    val batch = SampleOps.shardManifestQuery(spark, sf).collect().map(_.toSeq).toSeq
    val streamed = StreamingReplay.manifestReplay(spark, sf).collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("streaming dedup replay keeps exactly the distinct digest set (incl. epoch edge)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingReplay
    val nDistinct = Tables.documents(spark, sf)
      .select(sha2(col("text"), 256)).distinct().count()
    val buckets = StreamingReplay.dedupReplay(spark, sf).collect()
    // Row for doc_id 0 must survive: a synthesized event time equal to
    // the initial watermark was silently late-dropped before the +1day
    // clock base (the regression this pins).
    assert(buckets.map(_.getAs[Long]("n_docs")).sum == nDistinct)
  }

  test("streaming chunks / semantic-decon / IVF-ingest replays equal their batch twins") {
    import graft.streaming.StreamingReplay
    import graft.operators.{AnnOps, LloydOps, TextOps}
    val chunksB = TextOps.chunkDocuments(spark, sf).collect().map(_.toSeq).toSeq
    val chunksS = StreamingReplay.chunksReplay(spark, sf).collect().map(_.toSeq).toSeq
    assert(chunksS == chunksB)
    val semB = AnnOps.decontaminationSemantic(spark, sf).collect().map(_.toSeq).toSeq
    val semS = StreamingReplay.semanticDeconReplay(spark, sf).collect().map(_.toSeq).toSeq
    assert(semS == semB)
    val ivfB = LloydOps.ivfIngestManifest(spark, sf).collect().map(_.toSeq).toSeq
    val ivfS = StreamingReplay.ivfIngestReplay(spark, sf).collect().map(_.toSeq).toSeq
    assert(ivfS == ivfB)
  }

  test("Theil-Sen slope equals the Scala recomputation (daily collapse, lower median)") {
    import org.apache.spark.sql.functions._
    import graft.operators.StatsOps
    val daily = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(sum(expr("cast(floor(value * 1000 + 0.5) as long)")).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = daily.map { case (t, rows) =>
      val pts = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield math.floor(10000.0 * ((pts(j)._2 - pts(i)._2).toDouble /
        (pts(j)._1 - pts(i)._1).toDouble) + 0.5).toLong).sorted
      t -> (pts.length.toLong, slopes.length.toLong,
        slopes((slopes.length + 1) / 2 - 1))
    }
    val got = StatsOps.theilSenTrend(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("nDCG audit: bounded, exactly-normalized, and non-trivial on this corpus") {
    import graft.operators.TfIdfOps
    val rows = TfIdfOps.ndcgAudit(spark, sf).collect()
    assert(rows.length == TfIdfOps.QuerySet.length)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dcg > 0 && dcg <= idcg)
      assert(ndcg == (1000000L * dcg) / idcg)
    }
    // The tf-mass grade is deliberately not what BM25 optimizes: if every
    // query read 1.000 the audit would be degenerate (the term-coverage
    // grade's failure mode this replaced).
    assert(rows.exists(_.getLong(4) < 1000000L))
  }

  test("landmark betweenness: exact Brandes values on a planted path") {
    import spark.implicits._
    import graft.operators.GraphOps
    // Undirected path 1-2-3-4-5, all 5 nodes are landmarks (nSeeds=8):
    // Σ_s δ_s(v) = 2·bc(v); bc(2)=bc(4)=3, bc(3)=4 → 6e6 / 8e6 micro.
    // Endpoints have bc 0 and are filtered out.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val sym = und.union(und.select($"dst".as("src"), $"src".as("dst")))
    val out = GraphOps.betweennessOf(spark, sym, rounds = 4, nSeeds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 6000000L), (3L, 8000000L), (4L, 6000000L)))
  }

  test("fixed-point PCA twin tracks the double eigensolve") {
    import graft.operators.PcaOps
    val dbl = PcaOps.embeddingPca(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val fp = PcaOps.embeddingPcaFp(spark, sf).collect()
    assert(fp.length == 2 * PcaOps.Dims)
    // Both solves are fully converged (500 double rounds / 12 exact
    // squarings against λ2/λ1 ≈ 0.93), so they must agree up to
    // fixed-point truncation: eigenvalues to 0.2%, vectors to cosine
    // ≥ 0.9999.
    fp.foreach { r =>
      val (_, de) = dbl((r.getLong(0), r.getLong(1)))
      assert(math.abs(r.getLong(3) - de) <= math.max(de.abs / 500, 1000),
        s"eigenvalue drift: ${r.getLong(3)} vs $de")
    }
    Seq(1L, 2L).foreach { c =>
      val a = (0 until PcaOps.Dims).map(d => dbl((c, d.toLong))._1.toDouble)
      val b = fp.filter(_.getLong(0) == c).sortBy(_.getLong(1))
        .map(_.getLong(2).toDouble)
      val cos = a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(cos >= 0.9999, s"component $c cosine $cos")
    }
    // Unit-norm on the e6 grid: |Σv² − 1e12| small.
    Seq(1L, 2L).foreach { c =>
      val nrm2 = fp.filter(_.getLong(0) == c)
        .map(r => BigInt(r.getLong(2)) * BigInt(r.getLong(2))).sum
      assert((nrm2 - BigInt("1000000000000")).abs < BigInt(4000000L * PcaOps.Dims))
    }
  }

  test("isqrt is the exact floor sqrt across magnitudes") {
    import graft.operators.PcaOps
    val xs = Seq[BigInt](0, 1, 2, 3, 4, 99, 100,
      BigInt("999999999999999999"), BigInt("1000000000000000000"),
      BigInt(10).pow(24), BigInt(10).pow(24) - 1, BigInt(10).pow(30) + 12345)
    xs.foreach { x =>
      val s = PcaOps.isqrt(x)
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"isqrt($x) = $s")
    }
  }

  test("semantic decontamination forwards a custom tau to the flag threshold") {
    import graft.operators.AnnOps
    // A tau of 0 flags everything; the default 450 flags a strict subset.
    val strict = AnnOps.decontaminationSemantic(spark, sf).collect()
    val loose = AnnOps.decontaminationSemantic(spark, sf, tauMilli = 0).collect()
    val nStrict = strict.map(_.getAs[Long]("n_flagged")).sum
    val nLoose = loose.map(_.getAs[Long]("n_flagged")).sum
    val nCorpus = loose.map(_.getAs[Long]("n_corpus")).sum
    assert(nLoose == nCorpus) // tau=0 flags every corpus vector
    assert(nStrict < nLoose)  // the custom tau actually reached the flag
  }
}
