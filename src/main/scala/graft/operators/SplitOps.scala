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

  /** Per-document `(doc_id, cluster, split)` assignment. */
  def splitAssignments(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val clustered = DedupClusterOps.clustersConverged(s, docs)._2
      .select(col("doc_id"), col("cluster"))
    docs.select(col("doc_id"))
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
}
