package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DedupClusterOps, MinHashOps, SampleOps, TextOps}

class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val pairs = MinHashOps.ngramJaccardPairs(docs)
    .select("doc_a", "doc_b").collect()
    .map(r => (r.getLong(0), r.getLong(1)))
  private lazy val clustered = DedupClusterOps.clusters(spark, docs).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("cluster labels equal the transitive closure of the pair graph") {
    // Driver-side union-find over the (small) pair list as an independent
    // re-derivation of what min-label propagation should produce.
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(d => d -> find(d)).toMap
    // find() roots at the minimum because unions always point max -> min.
    assert(clustered.nonEmpty)
    assert(clustered.map(c => c._1 -> c._2).toMap == expected)
  }

  test("converged clustering equals the fixed-iteration mode") {
    val (rounds, converged) = DedupClusterOps.clustersConverged(spark, docs)
    assert(rounds > 0 && rounds < 50)
    assert(converged.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == clustered.toSeq)
  }

  test("converged clustering merges a chain a fixed round count cannot") {
    import spark.implicits._
    // 12 docs of 30 tokens sliding by 3: adjacent Jaccard ≈ 0.8, two hops
    // apart ≈ 0.45 — a chain with diameter 11, the adversarial shape for
    // fixed-iteration label propagation.
    val words = (0 until 70).map(i => s"w$i")
    val chain = (0 until 12)
      .map(i => (i.toLong, words.slice(3 * i, 3 * i + 30).mkString(" ")))
      .toDF("doc_id", "text")
    val fixed = DedupClusterOps.clusters(spark, chain, iters = 2)
      .select("cluster").distinct().count()
    val (rounds, conv) = DedupClusterOps.clustersConverged(spark, chain)
    assert(conv.select("cluster").distinct().count() == 1L)
    assert(rounds > 2, s"rounds=$rounds")
    assert(fixed > 1L, s"fixed-2 should under-merge, got $fixed clusters")
  }

  test("exactly one survivor per cluster, and it is the minimum member") {
    val byCluster = clustered.groupBy(_._2)
    byCluster.foreach { case (cluster, members) =>
      val survivors = members.filter(_._3 == 1L)
      assert(survivors.length == 1, s"cluster $cluster")
      assert(survivors.head._1 == members.map(_._1).min, s"cluster $cluster")
      assert(cluster == members.map(_._1).min, s"cluster $cluster")
    }
  }

  test("stratified sample keeps exactly the rows under their stratum rate") {
    val sample = SampleOps.sampleStratified(spark, sf).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val rate = SampleOps.DefaultRates.getOrElse(r.getString(1), SampleOps.DefaultRate)
      assert(r.getLong(2) < rate, s"doc ${r.getLong(0)}")
    }
    // Deterministic: a second run selects the identical rows.
    val again = SampleOps.sampleStratified(spark, sf).collect()
    assert(sample.toSeq == again.toSeq)
  }

  test("sampling rebalances the language mix (en share drops)") {
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = SampleOps.sampleStratified(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enBefore = total("en").toDouble / total.values.sum
    val enAfter = sampled.getOrElse("en", 0L).toDouble / sampled.values.sum
    assert(enAfter < enBefore, s"before=$enBefore after=$enAfter")
    // And the realized keep-rate should be near the configured permille.
    val enRate = sampled.getOrElse("en", 0L).toDouble / total("en")
    assert(enRate > 0.1 && enRate < 0.45, s"enRate=$enRate")
  }

  test("curation pipeline equals the composition of its three stages") {
    val plan = SampleOps.curationPipeline(spark, sf).collect()
    val kept = TextOps.qualityFilter(spark, sf).collect()
      .filter(_.getLong(5) == 1L).map(_.getLong(0)).toSet
    val sampled = SampleOps.sampleStratified(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(plan.map(_.getLong(1)).sum == (kept & sampled).size)
    assert(plan.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16))
  }

  test("fixed per-stratum sample takes exactly min(n, stratum size) each") {
    val n = 50
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = SampleOps.fixedPerStratum(spark, sf, n).collect()
    val byLang = sampled.groupBy(_.getString(1))
    assert(byLang.keySet == sizes.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(n.toLong, sizes(lang)), s"lang=$lang")
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // Deterministic across runs.
    val again = SampleOps.fixedPerStratum(spark, sf, n).collect()
    assert(sampled.toSeq == again.toSeq)
  }

  test("KMV sketch: exact below k, within the estimator's error band above") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
    // Below k distinct keys the sketch holds everything: exact.
    val small = events.limit(200)
    val rSmall = graft.operators.SketchOps.kmvDistinct(small, "user_id", k = 1024)
      .head()
    assert(rSmall.getLong(2) == rSmall.getLong(3))
    // Above k: KMV rel. stddev is ~1/sqrt(k-2); 5 sigma at k=64 is ~64%.
    val r = graft.operators.SketchOps.kmvDistinctUsers(spark, sf).head()
    val (est, truth) = (r.getLong(2).toDouble, r.getLong(3).toDouble)
    assert(est > truth * 0.36 && est < truth * 1.64, s"est=$est true=$truth")
    // Deterministic: a synthetic disjoint corpus reproduces exactly.
    val synth = (1L to 5000L).toDF("user_id")
    val a = graft.operators.SketchOps.kmvDistinct(synth, "user_id").head()
    val b = graft.operators.SketchOps.kmvDistinct(synth, "user_id").head()
    assert(a == b)
  }

  test("quality filter keeps the majority and every flag implies a drop") {
    val rows = graft.operators.TextOps.qualityFilter(spark, sf).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val flags = (1 to 4).map(r.getLong)
      assert(flags.forall(f => f == 0L || f == 1L))
      assert(r.getLong(5) == (if (flags.sum == 0) 1L else 0L), s"doc ${r.getLong(0)}")
    }
    val kept = rows.count(_.getLong(5) == 1L)
    assert(kept > rows.length / 2 && kept < rows.length, s"kept=$kept")
  }

  test("shard plan covers every document exactly once with bounded shards") {
    val plan = SampleOps.shardPlanQuery(spark, sf).collect()
    assert(plan.map(_.getLong(1)).sum == docs.count())
    assert(plan.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16))
    val chars = docs.agg(sum("n_chars")).head().getLong(0)
    assert(plan.map(_.getLong(2)).sum == chars)
  }

  test("incremental dedup: statuses partition the batch; admitted = new hashes") {
    val rows = TextOps.dedupIncremental(spark, sf).collect()
    assert(rows.nonEmpty)
    // Every batch row lands in exactly one bucket.
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"lang ${r.getString(0)}")
    }
    // Totals agree with the carve itself.
    assert(rows.map(_.getLong(1)).sum == docs.filter(col("doc_id") % 10 >= 8).count())
    // Independent re-derivation of 'admitted': distinct batch hashes that
    // are absent from the corpus's distinct-hash index.
    val hashed = docs.select(col("doc_id"),
      sha2(TextOps.normalizeText(col("text")), 256).as("h"))
    val fresh = hashed.filter(col("doc_id") % 10 >= 8).select("h").distinct()
      .except(hashed.filter(col("doc_id") % 10 < 8).select("h").distinct())
      .count()
    assert(rows.map(_.getLong(4)).sum == fresh)
  }
}
