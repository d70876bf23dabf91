package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{StatsOps, TextOps}

/** Differential checks for the correlation matrix and unigram-surprise
  * operators at sf0.001 against naive driver-side recomputes.
  */
class CorrSurpriseSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("correlation matrix matches a naive BigInt moment recompute") {
    val got = StatsOps.corrMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val names = Seq("quantity", "extprice", "discount", "tax")
    val rows = Tables.lineitem(spark, sf)
      .select(cols.map(c => expr(s"cast(floor($c * 1000 + 0.5) as long)")): _*)
      .collect().map(r => Array.tabulate(4)(i => BigInt(r.getLong(i))))
    val n = BigInt(rows.length)
    def s1(i: Int) = rows.map(_(i)).sum
    def s2(i: Int, j: Int) = rows.map(r => r(i) * r(j)).sum
    for (Seq(i, j) <- (0 until 4).combinations(2)) {
      val num = (n * s2(i, j) - s1(i) * s1(j)).toDouble
      val den = math.sqrt((n * s2(i, i) - s1(i) * s1(i)).toDouble) *
        math.sqrt((n * s2(j, j) - s1(j) * s1(j)).toDouble)
      val want = math.floor(1000000.0 * (num / den) + 0.5).toLong
      assert(got((names(i), names(j))) == ((rows.length.toLong, want)),
        s"pair ${names(i)}/${names(j)}")
    }
    // Pearson r is bounded: every quantized value stays inside ±1e6.
    got.values.foreach { case (_, r) => assert(math.abs(r) <= 1000000L) }
  }

  test("lm surprise equals the naive integer bit-length scoring") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> "\\S+".r.findAllIn(r.getString(1)).toSeq)
    val vocab = docs.flatMap(_._2).groupBy(identity).map {
      case (t, xs) => t -> xs.length.toLong
    }
    val total = vocab.values.sum
    def bits(t: String) = BigInt(total / vocab(t)).bitLength - 1L
    val got = TextOps.lmSurprise(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == docs.count(_._2.nonEmpty))
    docs.filter(_._2.nonEmpty).foreach { case (id, toks) =>
      val sb = toks.map(bits).sum
      assert(got(id) == ((toks.length.toLong, sb, 1000L * sb / toks.length)),
        s"doc $id")
    }
    // The corpus must actually discriminate: not all docs score alike.
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("dsir weights equal the naive smoothed two-LM recompute; target scores higher") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        "\\S+".r.findAllIn(r.getString(2)).toSeq))
    val raw = docs.flatMap(_._3).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val tgt = docs.filter(_._2 == "src0").flatMap(_._3).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val tRaw = raw.values.sum
    val tTgt = tgt.values.sum
    val vSize = raw.size.toLong
    def rawB(t: String) = BigInt(tRaw / raw(t)).bitLength - 1L
    def tgtB(t: String) =
      BigInt((tTgt + vSize) / (tgt.getOrElse(t, 0L) + 1L)).bitLength - 1L
    val got = TextOps.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.size == docs.count(_._3.nonEmpty))
    docs.filter(_._3.nonEmpty).foreach { case (id, src, toks) =>
      val rb = toks.map(rawB).sum
      val tb = toks.map(tgtB).sum
      val n = toks.length.toLong
      assert(got(id) == ((src, n, rb, tb, 1000L * rb / n - 1000L * tb / n)),
        s"doc $id")
    }
    // DSIR's point: docs FROM the target domain must score higher on
    // average than the rest (they define the target LM).
    val (inT, outT) = got.values.partition(_._1 == "src0")
    def mean(xs: Iterable[Long]) = xs.sum.toDouble / xs.size
    assert(mean(inT.map(_._5)) > mean(outT.map(_._5)),
      "target-source docs should out-score the corpus on the DSIR signal")
  }

  test("truncation loss: exact recompute and monotonicity across window lengths") {
    val lens = Tables.documents(spark, sf).select("text").collect()
      .map(r => "\\S+".r.findAllIn(r.getString(0)).length.toLong)
    val corpus = lens.sum
    val got = TextOps.truncationLoss(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == Seq(64L, 128L, 256L, 512L))
    got.foreach { case (w, (nDocs, truncated, lost, shareBp, headroom)) =>
      assert(nDocs == lens.length.toLong)
      assert(truncated == lens.count(_ > w).toLong, s"w=$w truncated")
      assert(lost == lens.map(l => math.max(l - w, 0L)).sum, s"w=$w lost")
      assert(shareBp == 10000L * lost / corpus, s"w=$w share")
      assert(headroom == lens.filter(_ <= w).map(w - _).sum, s"w=$w headroom")
    }
    // Doubling the window can only reduce loss and grow headroom.
    got.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b._3 <= a._3 && b._2 <= a._2 && b._5 >= a._5)
    }
  }
}
