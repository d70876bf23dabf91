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
    // Path needs 6 propagation rounds + 1 no-change round to detect.
    assert(iters >= 6 && iters <= 8)
  }

  test("entity clusters converged matches fixed form on the real table when 4 rounds suffice") {
    import graft.operators.AssocOps
    // At sf0.001 every chain is short; the two forms must agree exactly.
    val fixed = AssocOps.entityClusters(spark, sf).collect().map(_.toSeq).toSeq
    val conv = AssocOps.entityClustersConverged(spark, sf)._2
      .collect().map(_.toSeq).toSeq
    assert(fixed == conv)
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
