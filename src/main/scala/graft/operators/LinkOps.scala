package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Node-local graph structure over the co-purchase graph: per-node
  * clustering coefficients (triangle density around each node) and
  * common-neighbor link prediction (resource-allocation score) — the two
  * staples of a production graph-feature pipeline.
  *
  * Scale shape shared with [[GraphOps.triangleCount]]: triangle work is
  * bounded by degree-ordered orientation (O(m^1.5) wedges total instead
  * of deg² at every hub); link-prediction wedge fan-out is bounded by an
  * explicit, oracle-mirrored hub cap — a resource-allocation score
  * divides by the center's degree, so capped-out hubs are exactly the
  * wedges whose score contribution is negligible-by-construction.
  */
object LinkOps {

  /** Per-node local clustering coefficient, top `k` nodes by coefficient
    * (ppm): `2·tri(n) div (deg(n)·(deg(n)−1))`. Triangles enumerate once
    * through the degree-oriented wedge join (each triangle emits its 3
    * corners — the corner explode is 3 rows per triangle, then a
    * map-side-combined count per node), so the hot path is identical in
    * cost to [[GraphOps.triangleCount]] plus one |triangles|-row
    * aggregate. The oracle enumerates triangles by ID order instead of
    * degree order — an independent orientation, so corner attribution is
    * cross-checked, not replayed.
    */
  def clusteringCoeff(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val und = GraphOps.edges(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
    val undCount = und.count() // scalar: sizes the closing-join broadcast
    val deg = und.select(col("src").as("node"))
      .union(und.select(col("dst").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("degree"))
    val withDeg = und
      .join(deg.select(col("node").as("src"), col("degree").as("ds")), "src")
      .join(deg.select(col("node").as("dst"), col("degree").as("dd")), "dst")
    val srcFirst = col("ds") < col("dd") ||
      (col("ds") === col("dd") && col("src") < col("dst"))
    val oriented = withDeg
      .select(
        when(srcFirst, col("src")).otherwise(col("dst")).as("u"),
        when(srcFirst, col("dst")).otherwise(col("src")).as("v"))
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Size-guarded broadcast of the closing edge list (same guard as
    // triangleCount): without it the wedge frame — the BIG side —
    // shuffles for a sort-merge join and dominates the query.
    val closing = und.select(
      least(col("src"), col("dst")).as("b"),
      greatest(col("src"), col("dst")).as("c"))
    val triangles = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .join(if (undCount <= GraphOps.BroadcastEdgeLimit) broadcast(closing)
            // Shuffled-hash above the ceiling: build the edge list, stream
            // the wedge set — never sort the big side (see triangleCount).
            else closing.hint("shuffle_hash"),
        Seq("b", "c"))
    val perNode = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .filter(col("degree") >= 2)
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("coeff_ppm",
        expr("(1000000 * 2 * triangles) div (degree * (degree - 1))"))
      .orderBy(desc("coeff_ppm"), desc("degree"), col("node"))
      .limit(k)
  }

  def clusteringCoeffOracleSql(k: Int = 100): String =
    s"""WITH und AS MATERIALIZED (
       | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       | FROM lineitem a JOIN lineitem b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |deg AS MATERIALIZED (
       | SELECT node, count(*) AS degree FROM (
       |  SELECT src AS node FROM und UNION ALL SELECT dst FROM und)
       | GROUP BY node),
       |tri AS (
       | SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
       | FROM und e1 JOIN und e2 ON e2.src = e1.dst
       |  JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |corners AS (
       | SELECT x AS node FROM tri UNION ALL
       | SELECT y FROM tri UNION ALL SELECT z FROM tri),
       |pn AS (SELECT node, count(*) AS triangles FROM corners GROUP BY node)
       |SELECT d.node, d.degree, coalesce(pn.triangles, 0) AS triangles,
       | (1000000 * 2 * coalesce(pn.triangles, 0)) //
       |  (d.degree * (d.degree - 1)) AS coeff_ppm
       |FROM deg d LEFT JOIN pn USING (node)
       |WHERE d.degree >= 2
       |ORDER BY coeff_ppm DESC, degree DESC, node LIMIT $k""".stripMargin

  /** Resource-allocation link prediction: for the top `k` NON-adjacent
    * part pairs, the RA score `Σ_u 1e6 div deg(u)` over shared neighbors
    * `u` (plus the raw common-neighbor count). Wedge enumeration runs at
    * centers with `deg ≤ degCap` only — the cap bounds the deg² fan-out
    * at hubs AND is semantically honest for RA (a hub's per-wedge
    * contribution is ≤ 1e6/degCap, the score's noise floor); the oracle
    * applies the identical cap, so results match exactly. Candidate
    * pairs anti-join the edge list to keep only unlinked pairs — the
    * recommendation set, one exchange on the canonical pair key.
    *
    * The cap is ALSO the cost dial: wedge volume is ≤ degCap·Σdeg =
    * 2·degCap·&#124;E&#124;, linear in edges for a fixed cap. 64 keeps the
    * sf0.1 shuffle near 1e8 rows (256 measured 4× that and dominated
    * the whole bench suite).
    */
  def linkPrediction(
      s: SparkSession,
      dir: String,
      k: Int = 50,
      degCap: Int = 64): DataFrame = {
    val und = GraphOps.edges(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
    val sym = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val centers = sym
      .join(deg.filter(col("deg") <= degCap)
          .select(col("node").as("src"), col("deg")), "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = centers.as("l")
      .join(centers.as("r"),
        col("l.src") === col("r.src") && col("l.dst") < col("r.dst"))
      .select(col("l.dst").as("a"), col("r.dst").as("b"),
        expr("1000000 div l.deg").as("w"))
    wedges
      .join(und.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
      .groupBy("a", "b")
      .agg(count(lit(1)).as("common_neighbors"), sum("w").as("ra_score_e6"))
      .orderBy(desc("ra_score_e6"), desc("common_neighbors"), col("a"), col("b"))
      .limit(k)
  }

  def linkPredictionOracleSql(k: Int = 50, degCap: Int = 64): String =
    s"""WITH und AS MATERIALIZED (
       | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       | FROM lineitem a JOIN lineitem b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |sym AS MATERIALIZED (
       | SELECT src, dst FROM und
       | UNION ALL SELECT dst AS src, src AS dst FROM und),
       |deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY src),
       |ctr AS MATERIALIZED (
       | SELECT s.src, s.dst, d.deg FROM sym s
       |  JOIN deg d ON d.node = s.src AND d.deg <= $degCap),
       |wedge AS (
       | SELECT l.dst AS a, r.dst AS b, 1000000 // l.deg AS w
       | FROM ctr l JOIN ctr r ON l.src = r.src AND l.dst < r.dst),
       |cand AS (
       | SELECT w.a, w.b, w.w FROM wedge w
       | WHERE NOT EXISTS (
       |  SELECT 1 FROM und e WHERE e.src = w.a AND e.dst = w.b))
       |SELECT a, b, count(*) AS common_neighbors,
       | CAST(sum(w) AS BIGINT) AS ra_score_e6
       |FROM cand GROUP BY a, b
       |ORDER BY ra_score_e6 DESC, common_neighbors DESC, a, b LIMIT $k""".stripMargin
}
