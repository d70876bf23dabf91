package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{BucketIds, BucketMembers, StreamingNearDup}
import graft.operators.MinHashOps

class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
  private val nearDup = base.replace("theta", "thorn")
  private val other =
    "unrelated corpus text with entirely distinct vocabulary tokens spread over many words here"

  test("streaming near-dup finds cross-batch and exact pairs, agrees with batch LSH") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

    val query = StreamingNearDup.pairs(spark, docs)
      .writeStream.format("memory").queryName("near_dup_test")
      .outputMode("append").start()
    try {
      // Batch 1: the base doc and an unrelated one.
      input.addData((1L, ts(0), base), (3L, ts(1), other))
      query.processAllAvailable()
      assert(spark.table("near_dup_test").isEmpty, "no pairs within batch 1")

      // Batch 2: a near-dup of doc 1 (CROSS-batch state hit) and an
      // exact copy of doc 3.
      input.addData((2L, ts(60), nearDup), (4L, ts(61), other))
      query.processAllAvailable()

      val hits = spark.table("near_dup_test").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val pairs = hits.map { case (a, b, _) => (a, b) }.distinct.sorted
      assert(pairs.toSeq == Seq((1L, 2L), (3L, 4L)), s"pairs=${pairs.toSeq}")
      // The exact copy agrees on every signature element...
      assert(hits.filter(h => (h._1, h._2) == ((3L, 4L))).forall(_._3 == 1000L))
      // ...and the near-dup estimate clears the threshold in every
      // agreeing bucket (per-bucket rows, consumers dedup on the pair).
      assert(hits.filter(h => (h._1, h._2) == ((1L, 2L))).forall(_._3 >= 600L))

      // Differential vs the batch operator on the same corpus: identical
      // blocking expressions => identical pair set.
      val static = Seq((1L, base), (2L, nearDup), (3L, other), (4L, other))
        .toDF("doc_id", "text")
      val batchPairs = MinHashOps.nearDupPairs(static).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(batchPairs.toSeq == pairs.toSeq)
    } finally query.stop()
  }

  test("mergeBucket caps stored members but still compares against them") {
    val sigA = Seq.fill(64)(1L)
    val sigB = Seq.fill(64)(1L)
    val sigC = Seq.fill(64)(2L)
    // cap=1: A stored; B compared (hit) but not stored; C compared
    // against A only.
    val (h1, st1) = StreamingNearDup.mergeBucket(
      7L, Seq(10L -> sigA), BucketMembers(Nil, Nil), 600, 1)
    assert(h1.isEmpty && st1.ids == List(10L))
    val (h2, st2) = StreamingNearDup.mergeBucket(
      7L, Seq(20L -> sigB), st1, 600, 1)
    assert(h2.map(h => (h.doc_a, h.doc_b, h.est_jaccard_milli)) ==
      Seq((10L, 20L, 1000L)))
    assert(st2.ids == List(10L), "over-cap member not stored")
    val (h3, _) = StreamingNearDup.mergeBucket(
      7L, Seq(30L -> sigC), st2, 600, 1)
    assert(h3.isEmpty, "disagreeing signature emits nothing")
  }

  test("mergeBucket pairs documents arriving in the same batch") {
    val sig = Seq.tabulate(64)(_.toLong)
    val (hits, st) = StreamingNearDup.mergeBucket(
      1L, Seq(5L -> sig, 6L -> sig), BucketMembers(Nil, Nil), 600, 512)
    assert(hits.map(h => (h.doc_a, h.doc_b)) == Seq((5L, 6L)))
    assert(st.ids.toSet == Set(5L, 6L))
  }

  test("digest-only candidates cover every estimating hit, batch-split invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def ts(o: Long) = new Timestamp(t0 + o * 1000)
    val corpus = Seq((1L, ts(0), base), (3L, ts(1), other),
      (2L, ts(60), nearDup), (4L, ts(61), other))

    // Run the SAME corpus through the digest tier under two different
    // batch decompositions; collect (bucket, a, b) candidate sets.
    def run(batches: Seq[Seq[(Long, Timestamp, String)]], name: String) = {
      val in = MemoryStream[(Long, Timestamp, String)]
      val q = StreamingNearDup.candidates(
          spark, in.toDF().toDF("doc_id", "ts", "text"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      } finally q.stop()
    }
    val split = run(Seq(corpus.take(2), corpus.drop(2)), "nd_cand_split")
    val oneBatch = run(Seq(corpus), "nd_cand_one")
    assert(split == oneBatch, "candidate set is batch-decomposition invariant")

    // Every hit the estimating tier emits requires a band collision, so
    // its (bucket, a, b) keys must be a subset of the candidate keys.
    val in2 = MemoryStream[(Long, Timestamp, String)]
    val q2 = StreamingNearDup.pairs(spark, in2.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("nd_pairs_ref")
      .outputMode("append").start()
    val hitKeys = try {
      in2.addData(corpus: _*); q2.processAllAvailable()
      spark.table("nd_pairs_ref").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally q2.stop()
    assert(hitKeys.nonEmpty && hitKeys.subsetOf(oneBatch),
      s"hits=${hitKeys.size} candidates=${oneBatch.size}")
  }

  test("mergeBucketIds mirrors mergeBucket's redelivery and cap semantics") {
    val (_, st1) = StreamingNearDup.mergeBucketIds(5L, Seq(10L), BucketIds(Nil), 1)
    val (h2, st2) = StreamingNearDup.mergeBucketIds(5L, Seq(10L), st1, 1)
    assert(h2.isEmpty && st2.ids == List(10L), "redelivery stored once")
    // At cap: same-batch over-cap arrivals pair with stored AND each other.
    val (h3, st3) = StreamingNearDup.mergeBucketIds(5L, Seq(20L, 21L), st2, 1)
    assert(h3.map(c => (c.doc_a, c.doc_b)).sorted ==
      Seq((10L, 20L), (10L, 21L), (20L, 21L)))
    assert(st3.ids == List(10L))
  }

  test("mergeBucket stores a redelivered doc_id exactly once") {
    val sig = Seq.fill(64)(3L)
    val (_, st1) = StreamingNearDup.mergeBucket(
      2L, Seq(10L -> sig), BucketMembers(Nil, Nil), 600, 512)
    // Same doc again (at-least-once redelivery / colliding band keys):
    // no self-hit, and the member still occupies one slot — a later
    // arrival therefore emits its hit once, not once per duplicate slot.
    val (h2, st2) = StreamingNearDup.mergeBucket(
      2L, Seq(10L -> sig), st1, 600, 512)
    assert(h2.isEmpty && st2.ids == List(10L))
    val (h3, _) = StreamingNearDup.mergeBucket(
      2L, Seq(11L -> sig), st2, 600, 512)
    assert(h3.map(h => (h.doc_a, h.doc_b)) == Seq((10L, 11L)))
  }

  test("mergeBucket pairs over-cap arrivals landing in the same batch") {
    val sigOld = Seq.fill(64)(9L)
    val sig = Seq.fill(64)(4L)
    val (_, full) = StreamingNearDup.mergeBucket(
      3L, Seq(1L -> sigOld), BucketMembers(Nil, Nil), 600, 1)
    // Bucket is at cap: 20 and 21 are never stored, but they are still
    // compared against each other within the batch.
    val (hits, st) = StreamingNearDup.mergeBucket(
      3L, Seq(20L -> sig, 21L -> sig), full, 600, 1)
    assert(hits.map(h => (h.doc_a, h.doc_b)) == Seq((20L, 21L)))
    assert(st.ids == List(1L), "post-cap arrivals stay unstored")
  }
}
