package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnOps, DedupClusterOps, MinHashOps, TextOps}

/** r13 wave: CCNet perplexity buckets, kNN label agreement, the LSH
  * false-negative audit, and the quality-aware survivor policy.
  */
class R13OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("ccnet_buckets: terciles are ordered, exhaustive, and balanced per language") {
    val rows = TextOps.ccnetBuckets(spark, sf).collect()
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      val byName = rs.map(r => r.getString(1) -> r).toMap
      assert(byName.keySet == Set("head", "middle", "tail"), s"lang=$lang")
      val (h, m, t) = (byName("head"), byName("middle"), byName("tail"))
      // NTILE balance: bucket doc counts differ by at most 1.
      val docs = rs.map(_.getLong(2))
      assert(docs.max - docs.min <= 1, s"lang=$lang docs=${docs.toSeq}")
      // Score ranges are ordered: every head score <= every middle score
      // <= every tail score (cut on sorted order).
      assert(h.getLong(6) <= m.getLong(5), s"lang=$lang head.max>middle.min")
      assert(m.getLong(6) <= t.getLong(5), s"lang=$lang middle.max>tail.min")
      // Token shares are milli fractions of the language total.
      val share = rs.map(_.getLong(4)).sum
      assert(share >= 997 && share <= 1000, s"lang=$lang share=$share")
    }
  }

  test("knn_label_agreement: milli bounds and suspect counts hold") {
    val rows = AnnOps.knnLabelAgreement(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vectors, mean, suspects) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(vectors >= 1)
      assert(mean >= 0 && mean <= 1000, s"mean=$mean")
      assert(suspects >= 0 && suspects <= vectors)
    }
  }

  test("knn_label_agreement: planted mislabel shows up as a suspect") {
    // Two tight clusters of identical vectors; vec 5 sits in cluster A
    // (label 0) but carries label 1 — its top-k neighbors all disagree,
    // so it must surface as label 1's one suspect.
    import spark.implicits._
    val a = Seq.fill(64)(1.0f)
    val b = Array.tabulate(64)(d => if (d % 2 == 0) 1.0f else -1.0f).toSeq
    val emb = ((0L to 5L).map(i => (i, if (i == 5L) 1 else 0, a)) ++
      (6L to 11L).map(i => (i, 1, b)))
      .toDF("vec_id", "label", "embedding")
    val rows = AnnOps.labelAgreementOf(spark, emb, k = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getLong(3) == 0L, "label 0 has no suspects")
    assert(rows(0L).getLong(2) == 1000L, "label 0 agrees unanimously")
    assert(rows(1L).getLong(3) == 1L, "the planted mislabel is the suspect")
    assert(rows(1L).getLong(2) < 1000L, "the flip drags label 1's mean down")
  }

  test("lsh_miss_audit: zero measured misses and sub-ppm modeled margin") {
    val rows = MinHashOps.lshMissAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucket, pairs, found, missed, ppmSum, ppmMax) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      assert(bucket >= 600 && bucket <= 1000)
      assert(missed == 0L, s"LSH missed $missed exact pairs in bucket $bucket")
      assert(found == pairs)
      // At J >= 0.6 with 32x2 banding the modeled miss is sub-ppm —
      // the margin that makes zero measured misses a contract, not luck.
      assert(ppmMax <= 1L, s"ppmMax=$ppmMax")
      assert(ppmSum <= pairs)
    }
  }

  test("lsh_miss_audit: integer chain matches the closed form at the threshold") {
    // acc <- acc*(1e6 - 600^2) div 1e6, 32 steps from 1e6: exact
    // truncated 0.64^32 * 1e6, which floors to 0.
    var acc = 1000000L
    (1 to 32).foreach(_ => acc = acc * (1000000L - 600L * 600L) / 1000000L)
    assert(acc == 0L)
  }

  test("lsh_band_curve: catch probability is monotone in band count and exact at J=1000") {
    val rows = MinHashOps.lshBandCurve(spark, sf).collect()
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getLong(1))
    byBucket.foreach { case (bucket, rs) =>
      val catchMin = rs.map(r => r.getString(0) -> r.getLong(3)).toMap
      // Same 64 hashes split finer (more bands x fewer rows) can only
      // raise the per-pair catch probability.
      for (Seq(hi, lo) <- Seq("64x1", "32x2", "16x4", "8x8").sliding(2))
        assert(catchMin(hi) >= catchMin(lo),
          s"bucket=$bucket $hi=${catchMin(hi)} < $lo=${catchMin(lo)}")
      // All configs share the pair count within a bucket.
      assert(rs.map(_.getLong(2)).distinct.length == 1)
      if (bucket == 1000L)
        assert(rs.forall(_.getLong(3) == 1000000L), "J=1 pairs always caught")
    }
  }

  test("quality_ablation: solo counts are bounded by flagged counts per rule") {
    val rows = TextOps.qualityAblation(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("r_few_tokens", "r_no_stopwords", "r_punct_heavy", "r_token_len"))
    rows.foreach { r =>
      val (flagged, solo, fTok, sTok) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(solo >= 0 && solo <= flagged)
      assert(sTok >= 0 && sTok <= fTok)
    }
  }

  test("dedup_cluster_sizes: histogram is consistent with the cluster frame") {
    val rows = DedupClusterOps.clusterSizes(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (clusters, docs, removable, chars) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(clusters >= 1)
      assert(removable == docs - clusters, "one survivor per cluster")
      assert(chars >= 0)
    }
    // Every cluster has >= 2 members, so no '1' bucket exists.
    assert(!rows.map(_.getString(0)).contains("1"))
  }

  test("ann_bucket_occupancy: bands partition the corpus and count exact pair work") {
    val rows = AnnOps.bucketOccupancy(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val emb = Tables.embeddings(spark, sf).count()
    assert(total == emb, s"vectors $total != corpus $emb")
    rows.foreach { r =>
      val (buckets, vectors, maxOcc, pairs) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(buckets >= 1 && vectors >= buckets)
      assert(maxOcc * buckets >= vectors)
      if (r.getString(0) == "1") assert(pairs == 0L)
    }
  }

  test("adaptive width: low bits of the 40-bit SimHash code ARE the w-bit code") {
    // The oracle computes 40-bit codes and masks to w; the Spark side
    // builds at w directly. Equality of the two is the contract that
    // keeps both engines on the same buckets — if vec_simhash ever
    // seeded projections per WIDTH instead of per BIT, this breaks.
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf).limit(50)
    Seq(8, 9, 12).foreach { w =>
      val rows = emb.select(
        AnnOps.simhashCode(col("embedding"), w).as("cw"),
        (AnnOps.simhashCode(col("embedding"), 40)
          % (1L << w)).as("masked")).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"w=$w"))
    }
  }

  test("bitsFor widths match the oracle's bitlen-of-buckets recipe") {
    // Same integer recipe both sides: min(40, max(8, bitlen(max(1, n/16)-1))).
    def sqlBits(n: Long): Int = {
      val buckets = math.max(1L, n / 16L)
      // bin(0) = "0" has length 1 in both engines; max(8, ·) absorbs it.
      math.min(40, math.max(8,
        java.lang.Long.toBinaryString(buckets - 1).length))
    }
    Seq(1L, 100L, 500L, 5000L, 50000L, 500000L, 5000000L, 1L << 50).foreach { n =>
      assert(AnnOps.bitsFor(n) == sqlBits(n), s"n=$n")
    }
  }

  test("dedup_survivor_quality: policy dominance and change semantics") {
    val rows = DedupClusterOps.survivorQuality(spark, sf).collect()
    rows.foreach { r =>
      val (cluster, members, minidSurv, minidKeep, qSurv, qKeep, changed) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))
      assert(members >= 2, s"cluster=$cluster members=$members")
      assert(minidSurv == cluster, "min-id survivor IS the cluster label")
      // The quality policy never does worse than keep-min-id...
      assert(qKeep >= minidKeep)
      // ...and only moves off the min-id pick when that pick fails the
      // filter and some other member passes it.
      assert(changed == (if (qSurv != minidSurv) 1L else 0L))
      if (minidKeep == 1L) assert(changed == 0L)
      if (changed == 1L) assert(minidKeep == 0L && qKeep == 1L)
    }
  }
}
