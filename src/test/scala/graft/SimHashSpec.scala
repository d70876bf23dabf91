package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Tables
import graft.operators.SimHashOps

/** Band-space behavior of the 60-bit SimHash: the whole point of 12-bit
  * band keys is that candidate volume stays far below all-pairs.
  */
class SimHashSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("band candidates are a small fraction of C(N,2)") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val allPairs = n * (n - 1) / 2
    val cand = SimHashOps.bandCandidates(docs).count()
    // With 5 bands × 4096 bucket values, random codes would give
    // ~5·N²/(2·4096) ≈ 1.5% of all pairs; real codes cluster, so allow
    // 10% — still an order of magnitude under all-pairs (the old 6-bit
    // bands sat at ~N²/64 ≈ 8% per band, 40% total).
    assert(cand < allPairs / 10, s"candidates=$cand allPairs=$allPairs")
    // ...and recall is not vacuous: every emitted near-dup pair is a candidate.
    val pairs = SimHashOps.nearDupPairs(docs).count()
    assert(pairs > 0 && pairs <= cand)
  }
}
