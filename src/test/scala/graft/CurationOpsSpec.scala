package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{LloydOps, PiiOps, TextOps, TfIdfOps}

/** Behavioral checks for the curation additions (PII scrub, n-gram
  * decontamination, normalized dedup, TF-IDF) on crafted frames where the
  * right answer is knowable by eye — the tier below the oracle gate.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("pii redact scrubs email, phone, and ip with typed placeholders") {
    import spark.implicits._
    val df = Seq(
      (0L, "mail a.user+x@sub.example.org then call 555-0142 from 10.1.2.3 ok"),
      (1L, "no pii here at all"),
      (2L, "two mails a@b.co c@d.io and 999.255.0.1")
    ).toDF("doc_id", "text")
    val out = PiiOps.piiAudit(df, col("text"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 1 && out(0).getLong(3) == 1)
    assert(out(1).getLong(1) == 0 && out(1).getLong(2) == 0 && out(1).getLong(3) == 0)
    assert(out(2).getLong(1) == 2 && out(2).getLong(3) == 1)
    val cleaned = df.select(col("doc_id"), PiiOps.redact(col("text")).as("c"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(cleaned(0) == "mail [EMAIL] then call [PHONE] from [IP] ok")
    assert(cleaned(1) == "no pii here at all")
    assert(cleaned(2) == "two mails [EMAIL] [EMAIL] and [IP]")
  }

  test("ngram decontamination flags exactly the docs sharing a 5-gram") {
    import spark.implicits._
    val evalDocs = Seq((100L, "the quick brown fox jumps over a lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      // shares exactly one 5-gram: "the quick brown fox jumps"
      (0L, "he said the quick brown fox jumps again today"),
      (1L, "quick brown fox jumped over nothing at all"),    // no shared 5-gram
      (2L, "tiny doc")                                        // < 5 tokens
    ).toDF("doc_id", "text")
    val out = TextOps.decontaminateNgram(train, evalDocs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == ((1L, 1L)), s"doc 0: ${out(0L)}")
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((0L, 0L)))
  }

  test("normalized dedup merges case/punct/whitespace variants") {
    import spark.implicits._
    val df = Seq(
      (0L, "Hello,  World!"),
      (1L, "hello world"),
      (2L, "HELLO   world."),
      (3L, "hello there world")
    ).toDF("doc_id", "text")
    val groups = df
      .select(sha2(TextOps.normalizeText(col("text")), 256).as("h"), col("doc_id"))
      .groupBy("h").agg(count(lit(1)).as("c"), min("doc_id").as("survivor"))
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(groups(0L) == 3L, s"variants not merged: $groups")
    assert(groups(3L) == 1L)
  }

  test("tfidf ranks a unique token above a ubiquitous one") {
    val out = TfIdfOps.tfidfTopTerms(spark, sf, k = 3)
    val rows = out.collect()
    // Contract: exactly k rows per doc that has >= k distinct tokens,
    // ranks 1..k, scores non-increasing within each doc.
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getLong(5)).toSeq
      assert(scores == scores.sorted.reverse, s"doc $doc scores not sorted: $scores")
    }
    // A token present in every document has idf N/df = 1; its score can
    // never exceed one with df = 1 at equal tf share. Spot-check against
    // a naive driver-side recompute for one document.
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    val n = docs.length.toLong
    val dfMap = docs.flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty).distinct)
      .groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val first = docs.minBy(_.getLong(0))
    val toks = first.getString(1).split("\\s+").filter(_.nonEmpty)
    val tf = toks.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val naive = tf.map { case (t, f) =>
      (t, 1000L * f * n / (dfMap(t) * toks.length)) }
      .toSeq.sortBy { case (t, s) => (-s, t) }.take(3)
    val got = byDoc(first.getLong(0)).sortBy(_.getLong(1))
      .map(r => (r.getString(2), r.getLong(5))).toSeq
    assert(got == naive, s"got $got want $naive")
  }

  test("cluster-aware split covers every document and leaks no near-dup pair") {
    val assign = graft.operators.SplitOps.splitAssignments(spark, sf)
      .persist()
    assert(assign.count() == 500L) // every sf0.001 document assigned exactly once
    assert(assign.select("doc_id").distinct().count() == 500L)
    // The leakage invariant: both ends of every near-dup pair carry the
    // same split (they share a cluster, and split is a function of the
    // cluster representative).
    val pairs = graft.operators.MinHashOps
      .ngramJaccardPairs(Tables.documents(spark, sf),
        graft.operators.DedupClusterOps.Threshold)
      .select(col("doc_a"), col("doc_b"))
    val leaked = pairs
      .join(assign.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(assign.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(leaked == 0L, s"$leaked near-dup pairs straddle a split boundary")
    assign.unpersist()
  }

  test("split leakage audit: cluster row reads zero, naive recompute matches") {
    import graft.operators.{SplitOps, MinHashOps, DedupClusterOps}
    val out = SplitOps.splitLeakageAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set("naive", "cluster"))
    // The invariant the operator exists to measure: cluster-aware
    // splitting leaks NOTHING.
    assert(out("cluster")._2 == 0L, "cluster-aware split must not cross pairs")
    assert(out("cluster")._3 == 0L)
    // Both strategies audit the same pair set.
    assert(out("naive")._1 == out("cluster")._1)
    // Naive recompute of the naive strategy from the raw pair set.
    val docs = Tables.documents(spark, sf)
    val cap = MinHashOps.defaultDfCap(docs.count())
    val pairs = MinHashOps
      .ngramJaccardPairs(docs, DedupClusterOps.Threshold, Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def bucket(id: Long) =
      ((id % graft.operators.SketchOps.P) * graft.operators.SketchOps.K %
        graft.operators.SketchOps.P) % 1000
    def split(id: Long) =
      if (bucket(id) < SplitOps.TrainMilli) "train"
      else if (bucket(id) < SplitOps.ValMilli) "val" else "test"
    val crossing = pairs.filter { case (a, b) => split(a) != split(b) }
    val leakedDocs = crossing.flatMap { case (a, b) =>
      Seq(a, b).filter(split(_) != "train")
        .filter(_ => split(a) == "train" || split(b) == "train")
    }.distinct
    assert(out("naive")._1 == pairs.length.toLong)
    assert(out("naive")._2 == crossing.length.toLong)
    assert(out("naive")._3 == leakedDocs.length.toLong)
    // The audit only means something if the naive strategy actually
    // leaks on this corpus.
    assert(out("naive")._2 > 0L, "corpus should exhibit naive-split leakage")
  }

  test("epoch schedule: exact staged recompute, budget conservation, tempering") {
    import graft.operators.SampleOps
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => r.getString(0) ->
        "\\S+".r.findAllIn(r.getString(1)).length.toLong)
    val bySrc = docs.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val totalTok = bySrc.values.map(_._2).sum
    val wFp = bySrc.map { case (s, (_, t)) =>
      s -> math.floor(math.sqrt(t.toDouble) * 1000000.0).toLong
    }
    val totalW = wFp.values.sum
    val budget = SampleOps.BudgetX * totalTok
    val got = SampleOps.epochSchedule(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (s, (nd, nt)) =>
      val share = 1000000L * wFp(s) / totalW
      val target = share * (budget / 1000000L) +
        share * (budget % 1000000L) / 1000000L
      assert(got(s) == ((nd, nt, share, target, target / nt,
        1000L * (target % nt) / nt)), s"source $s")
    }
    // Conservation: targets sum to the budget within |sources| ppm-floor
    // truncations of it.
    val sumTarget = got.values.map(_._4).sum
    assert(sumTarget <= budget &&
      budget - sumTarget <= budget / 1000000L * got.size + got.size.toLong,
      s"sum=$sumTarget budget=$budget")
    // Tempering direction: the SMALLEST source must be upsampled relative
    // to its raw share more than the largest is.
    val smallest = bySrc.minBy(_._2._2)._1
    val largest = bySrc.maxBy(_._2._2)._1
    def amplify(s: String) = got(s)._4.toDouble / (SampleOps.BudgetX *
      bySrc(s)._2)
    assert(amplify(smallest) > amplify(largest),
      "sqrt tempering must boost small sources relative to large ones")
  }

  test("hll estimate is shard-merge-exact and lands near the true cardinality") {
    val r = graft.operators.HllOps.hllDistinctUsers(spark, sf).collect().head
    val (est, merged, truth) = (r.getLong(1), r.getLong(2), r.getLong(3))
    // Register max-merge is associative: the sharded path must agree
    // EXACTLY, not approximately — that is the property the query proves.
    assert(est == merged, s"merged sketch diverged: $est != $merged")
    // m=64 raw harmonic estimator: ~13% rel. stddev; allow 3 sigma plus
    // small-range slack at the sf0.001 cardinality (~200 users).
    assert(est > 0 && math.abs(est - truth) <= (truth * 2) / 5,
      s"estimate $est too far from truth $truth")
  }

  test("forward-fill carries the last observed value and only across gaps") {
    val rows = graft.operators.WindowOps.gapfillForwardFill(spark, sf).collect()
    rows.groupBy(_.getString(1)).foreach { case (tpe, g) =>
      val ordered = g.sortBy(_.getLong(0))
      var carried = -1L
      ordered.foreach { r =>
        val (observed, filled) = (r.getLong(2), r.getLong(3))
        if (observed == 1L) carried = filled // observed day defines the new carry
        else assert(filled == carried,
          s"$tpe day ${r.getLong(0)}: gap filled $filled != carried $carried")
      }
    }
  }

  test("per-type hll estimates land near each type's true cardinality") {
    val rows = graft.operators.HllOps.hllDistinctByType(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tpe, est, truth) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est > 0 && math.abs(est - truth) <= (truth * 2) / 5,
        s"$tpe: estimate $est too far from truth $truth")
    }
  }

  test("gapfill emits a dense day-by-type grid whose counts sum to the corpus") {
    val rows = graft.operators.WindowOps.gapfillDaily(spark, sf).collect()
    val days = rows.map(_.getLong(0)).distinct.sorted
    val types = rows.map(_.getString(1)).distinct
    // Dense: every (day, type) cell present exactly once, days contiguous.
    assert(rows.length == days.length * types.length)
    assert(days.last - days.head + 1 == days.length, "day spine has holes")
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.events(spark, sf).count(),
      "gap-filled counts lost or invented events")
  }

  test("phrase search counts overlapping adjacencies positionally") {
    import spark.implicits._
    // "hash join" twice in doc 1; "hash hash join" yields ONE adjacency
    // for (hash, join); the repeated-token case "merge sort" in
    // "merge sort merge sort" yields two.
    val d = Seq(
      (1L, "x hash join y hash join z"),
      (2L, "hash hash join"),
      (3L, "merge sort merge sort"),
      (4L, "table but no phrase scan here"))
      .toDF("doc_id", "text")
    val docsLike = d // phraseSearch reads documents(dir); test the index path
    val toks = docsLike.select(col("doc_id"),
      posexplode(expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .as(Seq("pos", "tok")))
    def occ(t1: String, t2: String): Map[Long, Long] = {
      val f = toks.filter(col("tok") === t1)
        .select(col("doc_id"), col("pos"))
      val g = toks.filter(col("tok") === t2)
        .select(col("doc_id").as("d"), (col("pos") - 1).as("p"))
      f.join(g, f("doc_id") === g("d") && f("pos") === g("p"))
        .groupBy(f("doc_id")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(occ("hash", "join") == Map(1L -> 2L, 2L -> 1L))
    assert(occ("merge", "sort") == Map(3L -> 2L))
    // The registered query over the corpus: occurrences ≥ matching docs,
    // and every fixed phrase actually occurs in the synthetic corpus.
    val rows = TfIdfOps.phraseSearch(spark, sf).collect()
    assert(rows.length == TfIdfOps.PhraseSet.length)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(2) >= r.getLong(1))
    }
  }

  test("char entropy ranks repetitive text below diverse text") {
    import spark.implicits._
    val rep = "ababababababababababababababab"             // 2 distinct bigrams
    val div = "the quick brown fox jumps over a lazy dog"   // mostly unique
    val out = TextOps.docCharEntropy(spark, sf).collect()
    // Registered entry: one row per document, positive slot counts,
    // entropy bounded by n·log2(n) (every bigram unique).
    assert(out.length == 500)
    out.foreach { r =>
      val (n, bits) = (r.getLong(1), r.getLong(2))
      assert(n > 0 && bits >= 0)
      assert(bits <= n * (64 - java.lang.Long.numberOfLeadingZeros(n)))
    }
    // Crafted pair: repetition scores strictly fewer mean bits.
    val crafted = Seq((0L, rep), (1L, div)).toDF("doc_id", "text")
    // Reuse the operator body shape via a local registry-free run: write
    // through a temp view is overkill — just compare the corpus-free
    // computation by swapping the documents source.
    val byDoc = TextOps.docCharEntropyOf(crafted).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byDoc(0L) < byDoc(1L),
      s"repetitive ${byDoc(0L)} should score below diverse ${byDoc(1L)}")
  }

  test("ngram repetition: hand-computed duplicate-phrase shares") {
    import spark.implicits._
    // "a b a b a b": bigrams [ab, ba, ab, ba, ab] → 5 total, 2 distinct,
    // top "a b" ×3; trigrams [aba, bab, aba, bab] → 4 total, 2 distinct.
    // "x y z w": all bigrams/trigrams unique. "solo": no n-grams at all.
    val crafted = Seq(
      (0L, "a b a b a b"), (1L, "x y z w"), (2L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.ngramRepetitionOf(crafted).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rep = out(0L)
    assert(rep.getLong(1) == 5L && rep.getLong(2) == 2L,
      s"bigram totals: $rep")
    assert(rep.getLong(3) == 1000L * 3 / 5, s"dup2_milli: $rep")
    assert(rep.getLong(4) == 1000L * 3 / 5, s"top2_milli: $rep")
    assert(rep.getLong(5) == 4L && rep.getLong(6) == 2L &&
      rep.getLong(7) == 500L, s"trigram totals: $rep")
    val uniq = out(1L)
    assert(uniq.getLong(3) == 0L && uniq.getLong(7) == 0L &&
      uniq.getLong(4) == 333L, s"unique doc: $uniq")
    val solo = out(2L)
    (1 to 7).foreach(i => assert(solo.getLong(i) == 0L, s"solo: $solo"))
    // Corpus invariants at sf: one row per doc; distinct <= total;
    // top-share >= ceil-free uniform floor 1/total.
    val corpus = TextOps.ngramRepetition(spark, sf).collect()
    assert(corpus.length == 500)
    corpus.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(6) <= r.getLong(5))
      assert(r.getLong(3) + 1000L * r.getLong(2) / math.max(r.getLong(1), 1L)
        <= 1000L)
    }
  }

  test("temperature mixture flattens the source distribution") {
    val m = operators.SampleOps.mixtureTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(m.nonEmpty)
    val corpus = graft.Tables.documents(spark, sf).count()
    assert(m.map(_._2).sum == corpus, "source counts must conserve corpus")
    // sqrt-weighting moves every extreme toward the middle: the biggest
    // source loses share, the smallest gains (±1 milli floor rounding).
    val biggest = m.maxBy(_._2)
    val smallest = m.minBy(_._2)
    if (biggest._2 > smallest._2) {
      assert(biggest._4 <= biggest._3 + 1,
        s"big source tempered ${biggest._4} vs raw ${biggest._3}")
      assert(smallest._4 + 1 >= smallest._3,
        s"small source tempered ${smallest._4} vs raw ${smallest._3}")
    }
    // Shares are a distribution (floor division loses < |sources| milli).
    val t = m.map(_._4).sum
    assert(t > 1000L - m.length && t <= 1000L, s"tempered shares sum $t")
  }

  test("token fertility: pieces dominate words, docs conserved") {
    val f = TextOps.tokenFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(f.nonEmpty)
    assert(f.map(_._2).sum == graft.Tables.documents(spark, sf).count())
    // Every whitespace word is at least one BPE piece (and inter-word
    // whitespace adds more), so fertility is always >= 1000 milli.
    f.foreach { case (lang, _, ws, pieces, fert) =>
      assert(pieces >= ws, s"$lang pieces=$pieces < words=$ws")
      assert(fert >= 1000L, s"$lang fertility=$fert")
    }
  }

  test("boilerplate prefixes finds a planted template header") {
    import spark.implicits._
    val crafted = Seq(
      ("feedA", "LICENSE NOTICE all rights reserved body one"),
      ("feedA", "LICENSE NOTICE all rights reserved body two"),
      ("feedA", "organic document without any template stamp"),
      ("feedB", "alpha beta gamma"),
      ("feedB", "delta epsilon zeta")).toDF("source", "text")
    val p = TextOps.boilerplatePrefixesOf(crafted).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(p("feedA") == (("LICENSE NOTICE", 2L, 3L, 666L)))
    // All-unique prefixes tie at count 1; lexicographic break wins.
    assert(p("feedB") == (("alpha beta", 1L, 2L, 500L)))
    // And on the real corpus: one winner row per source, shares in range.
    val real = TextOps.boilerplatePrefixes(spark, sf).collect()
    val srcs = graft.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(real.length == srcs, "exactly one winner row per source")
    real.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(3))
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000L)
    }
  }

  test("vocab by source: hapax <= types <= tokens, corpus conserved") {
    val v = TextOps.vocabBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(v.nonEmpty)
    v.foreach { case (src, toks, types, hapax, ttr, hm) =>
      assert(hapax <= types && types <= toks, s"$src $hapax/$types/$toks")
      assert(ttr >= 0 && ttr <= 1000 && hm >= 0 && hm <= 1000, s"$src")
    }
    val corpusTokens = graft.Tables.documents(spark, sf)
      .select(sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)"))))
      .collect()(0).getLong(0)
    assert(v.map(_._2).sum == corpusTokens,
      "per-source token counts must conserve the corpus token total")
  }

  test("lang confusion conserves documents and row shares") {
    val m = TextOps.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val total = m.map(_._3).sum
    assert(total == 500L, s"cells must conserve the corpus, got $total")
    // Per declared language the milli shares sum to ~1000 (floor-division
    // loses at most cells-1 milli units).
    m.groupBy(_._1).foreach { case (lang, cells) =>
      val s = cells.map(_._4).sum
      assert(s > 1000L - cells.length && s <= 1000L, s"$lang shares=$s")
    }
  }

  test("bm25: full matches outrank partials, scores positive, ranks dense") {
    val rows = TfIdfOps.bm25Search(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == TfIdfOps.QuerySet.map(_._1).toSet)
    byQ.foreach { case (qid, rs) =>
      val nTerms = TfIdfOps.QuerySet.toMap.apply(qid).length.toLong
      // Ranks dense 1..k, scores nonincreasing, every score positive
      // (the odds-ratio idf never floors to zero like a bitlen log2).
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length))
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._5).sliding(2).forall(p => p.head >= p.last))
      assert(rs.forall(_._5 > 0L), s"qid=$qid zero score")
      assert(rs.forall(r => r._4 >= 1L && r._4 <= nTerms))
      // Disjunctive retrieval reaches at least the conjunctive set.
      assert(rs.head._6 >= rs.length)
    }
  }

  test("ivf_list_occupancy: bands partition the corpus, exact pair work") {
    val rows = LloydOps.ivfListOccupancy(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val emb = graft.Tables.embeddings(spark, sf)
    assert(rows.map(_._3).sum == emb.count(), "vectors partitioned")
    assert(rows.map(_._2).sum <= LloydOps.listsFor(emb.count()).toLong)
    rows.foreach { case (band, lists, vectors, maxOcc, pairs) =>
      assert(lists >= 1L && vectors >= lists)
      assert(maxOcc * lists >= vectors, s"$band max*lists < vectors")
      // Pair work bounded by putting every vector in the worst list.
      assert(pairs <= lists * (maxOcc * (maxOcc - 1)) / 2, s"$band pairs")
    }
  }
}
