package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MinHashOps

class MinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact duplicates pair at Jaccard 1000, unrelated docs do not pair") {
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val d = docs(
      1L -> base,
      2L -> base,
      3L -> "completely different words about spark shuffles joins and partitions everywhere")
    val pairs = MinHashOps.nearDupPairs(d).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getLong(2) == 1000L)
  }

  test("near-duplicate with one word changed is found below 1000") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
    val nearDup = base.replace("theta", "thorn")
    val d = docs(1L -> base, 2L -> nearDup,
      3L -> "unrelated corpus text with entirely distinct vocabulary tokens")
    val pairs = MinHashOps.nearDupPairs(d).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    val j = pairs.head.getLong(2)
    assert(j >= 600 && j < 1000, s"jaccard_milli=$j")
  }

  test("short documents (<3 tokens) collapse to a whole-text shingle") {
    val d = docs(1L -> "tiny doc", 2L -> "tiny doc", 3L -> "tiny")
    val pairs = MinHashOps.nearDupPairs(d).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(2) == 1000L)
  }

  test("df cap collapses boilerplate candidate volume") {
    import spark.implicits._
    // 30 otherwise-unrelated docs sharing one boilerplate 3-gram
    // ("boiler plate text"): uncapped, that single stop-shingle alone
    // manufactures C(30,2) candidate pairs.
    val docs = (1 to 30)
      .map(i => (i.toLong, s"unique$i token$i payload$i boiler plate text"))
      .toDF("doc_id", "text")
    assert(MinHashOps.ngramCandidates(docs).count() == 435L)
    assert(MinHashOps.ngramCandidates(docs, dfCap = Some(5L)).count() == 0L)
    // ...and the capped pair pipeline still runs end-to-end (no pairs
    // survive the threshold either way on this corpus).
    assert(MinHashOps.ngramJaccardPairs(docs, dfCap = Some(5L)).count() == 0L)
  }

  test("default df cap prunes candidates but keeps exact Jaccard values") {
    import spark.implicits._
    // 40 docs all share a boilerplate 3-gram; docs 1 and 2 are a true
    // near-dup pair with plenty of df=2 shingles. defaultDfCap(40) = 16,
    // so the boilerplate shingle (df = 40) leaves the candidate index —
    // its C(40,2) = 780 pairs vanish — while the planted pair survives
    // through its unique shingles AND its Jaccard still counts the
    // boilerplate shingle (verification runs over the full index).
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((1 to 40).map {
      case 1 => (1L, s"$dup boiler plate text")
      case 2 => (2L, s"$dup extra boiler plate text")
      case i => (i.toLong, s"unique$i token$i payload$i boiler plate text")
    }).toDF("doc_id", "text")
    val cap = MinHashOps.defaultDfCap(40L)
    assert(cap == 16L)
    assert(MinHashOps.ngramCandidates(docs, dfCap = Some(cap)).count() < 780L)
    val capped = MinHashOps.ngramJaccardPairs(docs, dfCap = Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val uncapped = MinHashOps.ngramJaccardPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq == uncapped.toSeq, "cap changed emitted pair values")
    assert(capped.exists { case (a, b, _) => a == 1L && b == 2L })
  }

  test("LSH and exact inverted-index dedup agree on the whole corpus") {
    // dedup_minhash (probabilistic candidates + exact verify) must equal
    // dedup_ngram (exhaustive candidates + exact verify) on the real
    // corpus: at 32 bands × 2 rows a ≥0.6-Jaccard pair escapes with
    // probability ~6e-7, and both verify exactly — so any difference is
    // a bug, not bad luck.
    val lsh = MinHashOps.dedupMinhash(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = MinHashOps.dedupNgram(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(lsh == exact, s"LSH pairs ${lsh.length} vs exact ${exact.length}")
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
  }

  test("incremental near-dup probe equals the full pair set restricted to the batch") {
    // The O(batch) probe must find exactly the dedup_ngram pairs with at
    // least one batch member (doc_id % 10 >= 8) — no duplicate emissions
    // from the two-sided orientation, no missed corpus partners, correct
    // class labels.
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val cap = MinHashOps.defaultDfCap(docs.count())
    val probe = MinHashOps.incrementalNearDups(docs, 600, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val full = MinHashOps.ngramJaccardPairs(docs, 600, Some(cap)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => a % 10 >= 8 || b % 10 >= 8 }
      .map { case (a, b, j) =>
        (a, b, j, if (a % 10 >= 8 && b % 10 >= 8) "batch_batch" else "corpus_batch")
      }.toSeq
    assert(probe == full, s"probe ${probe.length} vs restricted full ${full.length}")
    assert(probe.nonEmpty, "planted near-dups should straddle the batch split")
  }

  test("mass-duplicated docs collapse to one LSH representative and still pair fully") {
    import spark.implicits._
    // 200 identical copies + 1 near-dup: pre-collapse this corpus put
    // 200 rows in EVERY band bucket (C(200,2)·32 candidate rows); with
    // set-identity collapse the LSH stage sees 2 representatives, and
    // the expansion must still emit every member pair.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = ((1L to 200L).map(i => (i, base)) :+ (201L, base + " extra"))
      .toDF("doc_id", "text")
    val pairs = MinHashOps.nearDupPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.count(_._3 == 1000L) == 200 * 199 / 2) // within-group
    val nd = pairs.filter(p => p._1 == 201L || p._2 == 201L)
    assert(nd.length == 200, s"near-dup expansion gave ${nd.length} pairs")
    assert(nd.forall(p => p._3 >= 600L && p._3 < 1000L))

    // Band-bucket ceiling semantics: with cap 1 every shared (2-rep)
    // bucket is dropped, so ONLY the identical-set pairs survive — the
    // cap bounds template mass without ever touching exact duplicates.
    val capped = MinHashOps.nearDupPairs(d, bucketCap = Some(1)).collect()
    assert(capped.length == 200 * 199 / 2)
    assert(capped.forall(_.getLong(2) == 1000L))
  }

  test("pipeline is deterministic across runs") {
    val d = graft.Tables.documents(spark, TestSession.sf)
    val a = MinHashOps.nearDupPairs(d).collect().toSeq
    val b = MinHashOps.nearDupPairs(d).collect().toSeq
    assert(a == b)
  }

  test("containment flags an embedded short doc that Jaccard misses") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val extra = (1 to 30).map(i => s"filler$i").mkString(" ")
    val d = Seq(
      (1L, short),
      (2L, short + " " + extra),
      (3L, "unrelated words entirely about other topics and things"))
      .toDF("doc_id", "text")
    val cont = MinHashOps.containmentPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val hit = cont.find { case (a, b, _, _) => a == 1L && b == 2L }
    assert(hit.isDefined, "embedded doc should reach containment 1000")
    assert(hit.get._3 == 1000L) // every shingle of the short doc is in the long
    assert(hit.get._4 < 600L)   // …while Jaccard stays below the dedup bar
    assert(MinHashOps.ngramJaccardPairs(d).collect().isEmpty)
    // Emitted containment always dominates Jaccard.
    cont.foreach { case (_, _, c, j) => assert(c >= j) }
  }

  test("sorted neighborhood is a subset of exact pairs and finds shared-prefix dups") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val d = Seq(
      (1L, base, "en"),
      (2L, base + " omicron", "en"),                 // same prefix, near-dup
      (3L, "zzz totally unrelated words about shuffles and joins", "en"),
      (4L, base, "fr"))                              // same text, other lang block
      .toDF("doc_id", "text", "lang")
    val pairs = MinHashOps.sortedNeighborhoodPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (1,2) share the normalized 24-char prefix → adjacent → found.
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j >= 600L })
    // Cross-language pairs never form, even for identical text.
    assert(!pairs.exists { case (a, b, _) => Set(a, b) == Set(1L, 4L) })

    // On the real corpus: blocking can only MISS pairs the exhaustive
    // index finds, never invent them, and the survivors carry identical
    // exact-Jaccard values.
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val sn = MinHashOps.sortedNeighborhoodPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = MinHashOps.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sn.keySet.subsetOf(exact.keySet))
    sn.foreach { case (k, j) => assert(exact(k) == j, s"pair $k") }
    assert(sn.nonEmpty, "planted near-dups share normalized prefixes")
  }

  test("source novelty: each distinct shingle is novel exactly once corpus-wide") {
    val rows = MinHashOps.sourceNovelty(spark, TestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, docs, sh, novel, milli) =>
      assert(novel <= sh, s"$src novel=$novel > shingles=$sh")
      assert(docs > 0 && milli >= 0 && milli <= 1000)
    }
    // First-occurrence attribution conserves the vocabulary: summing the
    // novel counts over sources must equal the distinct-shingle count.
    val distinctShingles = MinHashOps
      .shingleSets(graft.Tables.documents(spark, TestSession.sf))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("shingles")).as("s"))
      .distinct().count()
    assert(rows.map(_._4).sum == distinctShingles)
    assert(rows.map(_._2).sum ==
      graft.Tables.documents(spark, TestSession.sf).count())
  }

  test("dedup savings reconcile with the converged cluster non-survivors") {
    import graft.operators.DedupClusterOps
    val sv = DedupClusterOps.dedupSavings(spark, TestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(sv.nonEmpty)
    sv.foreach { case (src, docs, chars, dupDocs, dupChars, milli) =>
      assert(dupDocs <= docs, s"$src dup_docs=$dupDocs > docs=$docs")
      assert(dupChars <= chars && milli >= 0 && milli <= 1000, s"$src")
    }
    val nonSurvivors = DedupClusterOps.dedupClusters(spark, TestSession.sf)
      .filter("is_survivor = 0").count()
    assert(sv.map(_._4).sum == nonSurvivors,
      "per-source dup docs must sum to the cluster non-survivor count")
    assert(nonSurvivors > 0, "corpus should contain planted near-dups")
  }

  test("threshold curve: cumulative counts reconcile with the exact pair set") {
    val curve = MinHashOps.dedupThresholdCurve(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(curve.nonEmpty, "corpus should have pairs at or above 0.3 Jaccard")
    // Buckets are 100-milli multiples in [300, 1000].
    curve.foreach { case (lo, inB, _) =>
      assert(lo % 100 == 0 && lo >= 300 && lo <= 1000, s"bucket_lo=$lo")
      assert(inB > 0, "empty buckets must not be emitted")
    }
    // pairs_at_or_above is strictly the suffix-sum of pairs_in_bucket, so it
    // is non-increasing in threshold and its minimum bucket holds the total.
    val sorted = curve.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, _, cumLo), (_, _, cumHi)) => assert(cumLo >= cumHi)
      case _ =>
    }
    assert(sorted.head._3 == sorted.map(_._2).sum)
    // The lowest cumulative equals the exact pair volume at the same bar
    // (same dfCap), tying the curve to the dedup machinery it tunes.
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val all = MinHashOps.ngramJaccardPairs(docs, thresholdMilli = 300,
      dfCap = Some(MinHashOps.defaultDfCap(docs.count()))).count()
    assert(sorted.head._3 == all)
  }
}
