package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Leakage-safe train/val/test split assignment — the step that turns a
  * curated corpus into model-ready partitions without contaminating
  * held-out sets.
  *
  * Splitting by a per-document hash is the classic mistake: two
  * near-duplicate documents land in different splits and the eval set
  * leaks into training. The correct unit of assignment is the NEAR-DUP
  * CLUSTER: every document inherits its cluster representative (the
  * propagated minimum doc_id from [[DedupClusterOps.clustersConverged]];
  * unpaired documents are their own singleton cluster), and the split is
  * a deterministic hash of that representative — so a cluster moves as a
  * block and no near-dup pair can ever straddle a split boundary (pinned
  * by CurationOpsSpec as an invariant; the oracle pins the cluster
  * assignment itself through an independent recursive-fixpoint
  * computation, so an under-merged cluster fails the gate, not just the
  * audit).
  *
  * Ratios are milli-fixed-point on the shared [[SketchOps.P]]/
  * [[SketchOps.K]] hash family: bucket = hash(cluster) mod 1000, train
  * < 800, val < 900, else test — integer arithmetic, bit-identical in
  * any engine, stable under corpus growth (a document's split never
  * changes when unrelated documents arrive, the property that keeps
  * incremental ingest from reshuffling history).
  *
  * Scale shape (100 TB): the cluster frame holds only documents that
  * appear in >= 1 near-dup pair (a small fraction of the corpus) and is
  * broadcast into a map-side left join against the full document set —
  * the corpus never shuffles for the assignment; the final stats are one
  * 3-key aggregation.
  */
object SplitOps {

  import SketchOps.{K, P}

  val TrainMilli = 800L
  val ValMilli = 900L

  /** Per-document `(doc_id, cluster, split)` assignment. Labels come
    * from the materialized store ([[DedupClusterOps.convergedLabels]]) —
    * the r14→r15 adjudication found the direct `clustersConverged` call
    * re-paid the full pair-detection + propagation cost per invocation
    * (r13's lower bench number was the warm-up's caches being re-found
    * by the timed reps, not cheaper code), while every OTHER report of
    * the same clustering already read the step-output parquet.
    */
  def splitAssignments(s: SparkSession, dir: String): DataFrame = {
    val clustered = DedupClusterOps.convergedLabels(s, dir)
      .select(col("doc_id"), col("cluster"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(broadcast(clustered), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .withColumn("bucket", expr(s"((cluster % $P) * $K % $P) % 1000"))
      .withColumn("split",
        when(col("bucket") < TrainMilli, "train")
          .when(col("bucket") < ValMilli, "val")
          .otherwise("test"))
  }

  /** Registered entry: per-split document and cluster counts. */
  def splitStats(s: SparkSession, dir: String): DataFrame =
    splitAssignments(s, dir)
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("cluster")).as("n_clusters"))
      .orderBy("split")

  /** DuckDB oracle: clusters from the INDEPENDENT recursive-reachability
    * fixpoint (the [[DedupClusterOps.convergedOracleSql]] algorithm),
    * then the identical hash-bucket split math.
    */
  private def splitOf(bucket: org.apache.spark.sql.Column) =
    when(bucket < TrainMilli, "train")
      .when(bucket < ValMilli, "val")
      .otherwise("test")

  /** Split-leakage audit — the number that justifies cluster-aware
    * splitting: for the NAIVE per-document hash split and the
    * cluster-aware split side by side, how many near-dup pairs straddle
    * a split boundary and how many eval (val/test) documents have a
    * training-set near-duplicate (i.e. are contaminated). The
    * cluster-aware row must read 0 crossing pairs BY CONSTRUCTION —
    * this query measures the invariant instead of asserting it, and
    * prices what the naive split would have leaked on the same corpus.
    *
    * Scale shape: the pair set is the df-capped inverted-index pass
    * (bounded candidates); assignments are one broadcast left join; the
    * pair-side audit joins the pair list (small) against the doc-keyed
    * assignment frame twice, then everything collapses to two 1-row
    * aggregates unioned — no corpus-sized shuffle beyond the pair stage
    * itself.
    */
  def splitLeakageAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = MinHashOps.frozenPairs(s, dir)
      .filter(col("jaccard_milli") >= DedupClusterOps.Threshold)
      .select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The clustering consumes the SAME materialized pair set — the
    // inverted-index stage (this query's dominant cost) runs once.
    val clustered = DedupClusterOps
      .clustersConverged(s, docs, pairsIn = Some(pairs))._2
      .select(col("doc_id"), col("cluster"))
    val asg = docs.select(col("doc_id"))
      .join(broadcast(clustered), Seq("doc_id"), "left")
      .select(col("doc_id"),
        splitOf(expr(s"((doc_id % $P) * $K % $P) % 1000")).as("s_naive"),
        splitOf(expr(
          s"((coalesce(cluster, doc_id) % $P) * $K % $P) % 1000"))
          .as("s_cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val px = pairs
      .join(asg.select(col("doc_id").as("doc_a"), col("s_naive").as("na"),
        col("s_cluster").as("ca")), "doc_a")
      .join(asg.select(col("doc_id").as("doc_b"), col("s_naive").as("nb"),
        col("s_cluster").as("cb")), "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairAgg(a: String, b: String, strategy: String) = px.agg(
      count(lit(1)).as("n_pairs"),
      sum((col(a) =!= col(b)).cast("long")).as("cross_pairs"),
      count_distinct(expr(
        s"""CASE WHEN $a = 'train' AND $b <> 'train' THEN doc_b
           | WHEN $b = 'train' AND $a <> 'train' THEN doc_a END""".stripMargin))
        .as("leaked_eval_docs"))
      .withColumn("strategy", lit(strategy))
    def evalAgg(c: String, strategy: String) = asg.agg(
      sum((col(c) =!= lit("train")).cast("long")).as("n_eval_docs"))
      .withColumn("strategy", lit(strategy))
    pairAgg("na", "nb", "naive").union(pairAgg("ca", "cb", "cluster"))
      .join(evalAgg("s_naive", "naive").union(evalAgg("s_cluster", "cluster")),
        "strategy")
      .select(col("strategy"), col("n_pairs"), col("cross_pairs"),
        col("leaked_eval_docs"), col("n_eval_docs"))
      .orderBy("strategy")
  }

  /** Oracle: independent recursive-fixpoint clusters (as
    * [[oracleSql]]), both split assignments from the identical bucket
    * math, and the same pair-crossing aggregation.
    */
  def leakageOracleSql(thresholdMilli: Int = DedupClusterOps.Threshold): String =
    s"""WITH RECURSIVE${DedupClusterOps.pairGraphSql(thresholdMilli)},
       |reach AS (
       | SELECT doc_id, doc_id AS r FROM n0
       | UNION
       | SELECT re.doc_id, e.dst AS r FROM reach re JOIN sym e ON re.r = e.src),
       |cl AS (SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id),
       |asg AS (
       | SELECT d.doc_id,
       |  CASE WHEN ((d.doc_id % $P) * $K % $P) % 1000 < $TrainMilli THEN 'train'
       |   WHEN ((d.doc_id % $P) * $K % $P) % 1000 < $ValMilli THEN 'val'
       |   ELSE 'test' END AS s_naive,
       |  CASE WHEN ((coalesce(cl.cluster, d.doc_id) % $P) * $K % $P) % 1000
       |    < $TrainMilli THEN 'train'
       |   WHEN ((coalesce(cl.cluster, d.doc_id) % $P) * $K % $P) % 1000
       |    < $ValMilli THEN 'val'
       |   ELSE 'test' END AS s_cluster
       | FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
       |px AS (
       | SELECT p.doc_a, p.doc_b, xa.s_naive AS na, xb.s_naive AS nb,
       |  xa.s_cluster AS ca, xb.s_cluster AS cb
       | FROM pairs p JOIN asg xa ON p.doc_a = xa.doc_id
       |  JOIN asg xb ON p.doc_b = xb.doc_id),
       |pagg AS (
       | SELECT 'naive' AS strategy, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT) AS cross_pairs,
       |  CAST(count(DISTINCT CASE WHEN na = 'train' AND nb <> 'train' THEN doc_b
       |   WHEN nb = 'train' AND na <> 'train' THEN doc_a END) AS BIGINT)
       |   AS leaked_eval_docs
       | FROM px
       | UNION ALL
       | SELECT 'cluster', CAST(count(*) AS BIGINT),
       |  CAST(sum(CASE WHEN ca <> cb THEN 1 ELSE 0 END) AS BIGINT),
       |  CAST(count(DISTINCT CASE WHEN ca = 'train' AND cb <> 'train' THEN doc_b
       |   WHEN cb = 'train' AND ca <> 'train' THEN doc_a END) AS BIGINT)
       | FROM px),
       |sagg AS (
       | SELECT 'naive' AS strategy,
       |  CAST(sum(CASE WHEN s_naive <> 'train' THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_eval_docs
       | FROM asg
       | UNION ALL
       | SELECT 'cluster',
       |  CAST(sum(CASE WHEN s_cluster <> 'train' THEN 1 ELSE 0 END) AS BIGINT)
       | FROM asg)
       |SELECT p.strategy, p.n_pairs, p.cross_pairs, p.leaked_eval_docs,
       | s.n_eval_docs
       |FROM pagg p JOIN sagg s ON p.strategy = s.strategy
       |ORDER BY p.strategy""".stripMargin

  def oracleSql(thresholdMilli: Int = DedupClusterOps.Threshold): String =
    s"""WITH RECURSIVE${DedupClusterOps.pairGraphSql(thresholdMilli)},
       |reach AS (
       | SELECT doc_id, doc_id AS r FROM n0
       | UNION
       | SELECT re.doc_id, e.dst AS r FROM reach re JOIN sym e ON re.r = e.src),
       |cl AS (SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id),
       |a AS (
       | SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
       | FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
       |b AS (
       | SELECT doc_id, cluster,
       |  ((cluster % $P) * $K % $P) % 1000 AS bucket FROM a)
       |SELECT CASE WHEN bucket < $TrainMilli THEN 'train'
       |  WHEN bucket < $ValMilli THEN 'val' ELSE 'test' END AS split,
       | count(*) AS n_docs, count(DISTINCT cluster) AS n_clusters
       |FROM b GROUP BY 1 ORDER BY split""".stripMargin

  /** Train-span and embargo-span widths in milli of the event-time
    * range: train = first 700‰, embargo = next 50‰ (discarded), test =
    * the rest.
    */
  val TemporalTrainMilli = 700L
  val TemporalEmbargoMilli = 50L

  /** Temporal train/test split with an embargo gap — the time-series
    * leakage guard [[splitAssignments]]'s hash split cannot give:
    * training must END strictly before evaluation STARTS, and the
    * embargo band between them absorbs windowed features (trailing
    * aggregates computed at test time would otherwise read training-era
    * rows right at the boundary — López de Prado's purge/embargo rule).
    * Cutoffs are fixed fractions of the event-time RANGE (exact integer
    * micros off one min/max scan), so the split is a pure function of
    * the table. Per split: volume, distinct users, the time box, and
    * the count of users already seen in train — the carryover a
    * population-shift eval watches.
    *
    * Scale shape: one min/max scan broadcast back, one per-(user, split)
    * map-side-combined rollup (state bounded by users×3), then a
    * users-sized reduction to the 3-row report.
    */
  def splitTemporalEmbargo(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts_us"))
    val box = ev.agg(min("ts_us").as("t0"), max("ts_us").as("t1"))
    val cut = ev.crossJoin(broadcast(box))
      .withColumn("span", col("t1") - col("t0"))
      .withColumn("split",
        when(col("ts_us") < col("t0") + expr(s"(span * $TemporalTrainMilli) div 1000"),
          lit("train"))
          .when(col("ts_us") < col("t0") +
            expr(s"(span * ${TemporalTrainMilli + TemporalEmbargoMilli}) div 1000"),
            lit("embargo"))
          .otherwise(lit("test")))
    val perUserSplit = cut.groupBy("user_id", "split")
      .agg(count(lit(1)).as("n"), min("ts_us").as("lo"), max("ts_us").as("hi"))
    val trainUsers = perUserSplit.filter(col("split") === "train")
      .select(col("user_id").as("tu"))
    perUserSplit
      .join(broadcast(trainUsers), col("user_id") === col("tu"), "left")
      .groupBy("split")
      .agg(
        sum("n").as("n_events"),
        count(lit(1)).as("n_users"),
        sum(when(col("tu").isNotNull, 1L).otherwise(0L)).as("users_in_train"),
        min("lo").as("ts_lo"),
        max("hi").as("ts_hi"))
      .orderBy("split")
  }

  /** DuckDB oracle for [[splitTemporalEmbargo]]. */
  val TemporalEmbargoOracleSql: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
       |box AS (SELECT min(ts_us) AS t0, max(ts_us) AS t1 FROM ev),
       |cut AS (
       | SELECT user_id, ts_us,
       |  CASE WHEN ts_us < t0 + ((t1 - t0) * $TemporalTrainMilli) // 1000 THEN 'train'
       |   WHEN ts_us < t0 + ((t1 - t0) * ${TemporalTrainMilli + TemporalEmbargoMilli}) // 1000 THEN 'embargo'
       |   ELSE 'test' END AS split
       | FROM ev, box),
       |pus AS (
       | SELECT user_id, split, count(*) AS n, min(ts_us) AS lo, max(ts_us) AS hi
       | FROM cut GROUP BY 1, 2),
       |tu AS (SELECT DISTINCT user_id FROM pus WHERE split = 'train')
       |SELECT split, CAST(sum(n) AS BIGINT) AS n_events,
       | count(*) AS n_users,
       | CAST(sum(CASE WHEN tu.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS users_in_train,
       | min(lo) AS ts_lo, max(hi) AS ts_hi
       |FROM pus LEFT JOIN tu ON pus.user_id = tu.user_id
       |GROUP BY split ORDER BY split""".stripMargin
}
