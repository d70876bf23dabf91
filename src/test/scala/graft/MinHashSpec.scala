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

  test("pipeline is deterministic across runs") {
    val d = graft.Tables.documents(spark, TestSession.sf)
    val a = MinHashOps.nearDupPairs(d).collect().toSeq
    val b = MinHashOps.nearDupPairs(d).collect().toSeq
    assert(a == b)
  }
}
