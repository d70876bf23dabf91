package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AnnOps, LloydOps, TextOps}

/** r15 wave: the auto-selecting knn graph, the fixed recall cohort, and
  * variable-length exact-substring dedup.
  */
class R15OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("dedup_substring: a planted shifted substring is recovered exactly") {
    import spark.implicits._
    // 20 shared tokens embedded at different offsets; all other tokens
    // are unique per doc, so the ONLY seed matches are inside the plant.
    val shared = (1 to 20).map(k => s"shared$k").mkString(" ")
    def filler(doc: Int, m: Int) =
      (1 to m).map(k => s"d${doc}f$k").mkString(" ")
    val docs = Seq(
      (1L, s"${filler(1, 5)} $shared ${filler(1, 30).replace("f", "g")}"),
      (2L, s"${filler(2, 17)} $shared ${filler(2, 9).replace("f", "g")}"),
      (3L, filler(3, 40)))
      .toDF("doc_id", "text")
    val out = TextOps.substringDedupOf(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 20L, s"longest_tokens = ${r.getLong(2)}, want 20")
    // 20-token run at 8-token seeds = 13 matching seed positions.
    assert(r.getLong(3) == 13L)
  }

  test("dedup_substring: below-threshold overlaps are not reported") {
    import spark.implicits._
    // 10 shared tokens < SubstringMinTokens(12): pair must not appear.
    val shared = (1 to 10).map(k => s"common$k").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $shared z1 z2"),
      (2L, s"b1 b2 $shared y1 y2 y3"))
      .toDF("doc_id", "text")
    assert(TextOps.substringDedupOf(docs).collect().isEmpty)
  }

  test("knn_graph auto-select picks a machine and emits the graph contract") {
    val g = LloydOps.knnGraphSelect(spark, sf).collect()
    assert(g.nonEmpty)
    // Per query: ranks are 1..k without gaps, scores non-increasing.
    g.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(2))
      assert(byRank.map(_.getLong(2)).toSeq == (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getDouble(3)).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knn_graph auto-select agrees with the machine its meter picks") {
    val emb = Tables.embeddings(spark, sf)
    val bits = AnnOps.bitsFor(emb.count())
    val maxOcc = emb
      .select(graft.functions.GraftFunctions
        .vec_simhash(col("embedding"), bits).as("code"))
      .groupBy("code").count().agg(max("count")).head().getLong(0)
    val expected =
      if (maxOcc > LloydOps.KnnOccCapFactor * 16L)
        LloydOps.knnGraphIvf(spark, sf)
      else AnnOps.knnGraph(spark, sf, 3, bits)
    val got = LloydOps.knnGraphSelect(spark, sf)
    assert(got.collect().toSeq == expected.collect().toSeq)
  }

  test("streaming replay equals the batch aggregation over the same file") {
    val streamed = graft.streaming.StreamingReplay
      .hourlyTypeCounts(spark, sf).collect().toSeq
    val batch = Tables.events(spark, sf)
      .withColumn("hour_bucket", expr("ts_us div 3600000000"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("events"),
        min("ts_us").as("first_us"), max("ts_us").as("last_us"))
      .orderBy("hour_bucket", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("knn recall audit cohort is fixed-size and deterministic") {
    val r = LloydOps.knnRecallIvf(spark, sf).collect()
    assert(r.length <= LloydOps.KnnProbeCohort)
    // Cohort = the lowest vec_ids present in the corpus.
    val lowest = Tables.embeddings(spark, sf)
      .select(col("vec_id")).orderBy("vec_id")
      .limit(LloydOps.KnnProbeCohort).collect().map(_.getLong(0)).toSet
    assert(r.map(_.getLong(0)).forall(lowest.contains))
  }
}
