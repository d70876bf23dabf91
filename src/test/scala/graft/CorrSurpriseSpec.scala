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
}
