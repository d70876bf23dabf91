package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Fixed-point Lloyd's K-Means — the ORACLE-CLOSED twin of the MLlib
  * entries (`kmeans_sizes`/`kmeans_centroids`/`kmeans_assign`, which are
  * rows-only by declared contract because MLlib's k-means|| init and
  * float tree-aggregation are not SQL-expressible). This one is:
  * deterministic init (the k lowest-id vectors), a FIXED iteration
  * count, and every arithmetic step in e6 fixed-point integers, so a
  * DuckDB oracle can replay the algorithm exactly, round for round
  * (semantics mirrored: kmeans_spark.py:140-162's Lloyd loop).
  *
  * Determinism contract, engine by engine:
  *  - coordinates quantize once to e6 (`floor(x·1e6 + 0.5)` — pure IEEE,
  *    bit-identical both sides), so distances are exact BIGINT sums;
  *  - assignment is argmin over exact integers with ties broken toward
  *    the LOWEST cluster id (Spark: first `array_position` match over
  *    the distance array; oracle: `row_number() ORDER BY dist, cluster`);
  *  - centroid update is integer mean `sum div count` (both engines
  *    truncate toward zero) — each round re-synchronizes to the integer
  *    grid, so no cross-engine drift can accumulate;
  *  - a cluster that loses all members KEEPS its previous centroid.
  *
  * Scale notes (100 TB): the corpus-sized work per round is one
  * assignment pass (centroids enter as a k×64 LITERAL array — a plan
  * constant, nothing is broadcast or joined) and one k×64-cell partial
  * aggregation (posexplode combines map-side, the exchange carries
  * k·dims cells regardless of corpus size). The only driver state is
  * the k×64 integer centroid table per round — the same constant-size
  * judgment call as PageRank's convergence scalar or PCA's moment
  * matrix. Iteration count is fixed (the oracle-replayable contract);
  * production convergence-mode would add the one-scalar-per-round
  * changed-count check of [[GraphOps.connectedComponentsConverged]].
  */
object LloydOps {

  val K = 8
  val Iters = 4
  val Dims: Int = StatsOps.EmbedDims

  /** e6-quantized coordinate arrays: (vec_id, xq Array[Long]). */
  private def quantized(embeddings: DataFrame): DataFrame =
    Tables.parallelized(embeddings)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000 + 0.5) as long))")
          .as("xq"))

  /** Points with their argmin cluster for the given centroid table.
    *
    * The centroids enter as ONE typed literal array-of-arrays and the
    * distances as zip_with/aggregate lambdas — deliberately, instead of
    * unrolling k×dims (diff·diff) literal terms: the unrolled form
    * generates DIFFERENT codegen source every round (fresh literals) and
    * was measured paying ~1.5 s of recompilation per iteration, while
    * the lambda form keeps an identical plan shape across rounds (the
    * constants live in the expression's references) and its interpreted
    * per-row cost is k·dims integer ops — noise next to the scan.
    */
  private def assign(pts: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    val dists = transform(centsLit, c =>
      aggregate(zip_with(col("xq"), c, (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v))
    pts.select(col("vec_id"), col("xq"),
      (array_position(dists, array_min(dists)) - 1L).as("cluster"))
  }

  /** Runs `iters` fixed-point Lloyd rounds; returns (final centroids,
    * last-assignment sizes). Exposed for the spec's convergence checks.
    */
  private[graft] def run(
      embeddings: DataFrame, k: Int, iters: Int)
      : (Array[Array[Long]], Array[Long]) = {
    val pts = quantized(embeddings).persist(StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Long]] = pts.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    require(cents.length == k, s"corpus smaller than k=$k")
    val sizes = new Array[Long](k)
    for (_ <- 1 to iters) {
      val cells = assign(pts, cents)
        .select(col("cluster"), posexplode(col("xq")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect() // k×64 cells — constant-size driver state per round
      java.util.Arrays.fill(sizes, 0L)
      val next = cents.map(_.clone())
      cells.foreach { r =>
        val cl = r.getLong(0).toInt
        val dim = r.getInt(1)
        next(cl)(dim) = r.getLong(2) / r.getLong(3) // JVM /: trunc-to-zero, = div
        sizes(cl) = r.getLong(3)
      }
      cents = next
    }
    pts.unpersist(false)
    (cents, sizes)
  }

  /** Registered query: (cluster, dim, centroid_fp, n) after [[Iters]]
    * rounds — k×64 rows, built on the driver from the constant-size
    * centroid table.
    */
  def kmeansLloyd(s: SparkSession, dir: String): DataFrame = {
    val (cents, sizes) = run(Tables.embeddings(s, dir), K, Iters)
    val rows = for {
      cl <- 0 until K
      d <- 0 until Dims
    } yield Row(cl.toLong, d.toLong, cents(cl)(d), sizes(cl))
    val schema = StructType(Seq(
      StructField("cluster", LongType, nullable = false),
      StructField("dim", LongType, nullable = false),
      StructField("centroid_fp", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    s.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      .orderBy("cluster", "dim")
  }

  /** DuckDB oracle: the IDENTICAL unrolled algorithm — quantize, init
    * from the k lowest ids, then per round an argmin assignment
    * (`row_number() ORDER BY dist, cluster` = lowest-cluster tie-break)
    * and an integer-mean update with empty-cluster carry, all in BIGINT.
    */
  /** Shared WITH-chain: quantize → init → `iters` unrolled rounds,
    * ending with centroid table `c<iters>` and assignment `a<iters>`.
    */
  private def oracleChain(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH x AS MATERIALIZED (
         | SELECT vec_id, t.i - 1 AS dim,
         |  CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
         | FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${Dims + 1})) AS i) t),
         |ids AS (
         | SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
         | FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)),
         |c0 AS MATERIALIZED (
         | SELECT ids.cluster, x.dim, x.xq AS c FROM ids JOIN x USING (vec_id))""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
         |d$i AS MATERIALIZED (
         | SELECT x.vec_id, c.cluster, sum((x.xq - c.c) * (x.xq - c.c)) AS dist
         | FROM x JOIN c${i - 1} c ON x.dim = c.dim GROUP BY 1, 2),
         |a$i AS MATERIALIZED (
         | SELECT vec_id, cluster FROM (
         |  SELECT vec_id, cluster,
         |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
         |  FROM d$i) WHERE rn = 1),
         |m$i AS MATERIALIZED (
         | SELECT a.cluster, x.dim, sum(x.xq) // count(*) AS c
         | FROM a$i a JOIN x USING (vec_id) GROUP BY 1, 2),
         |c$i AS MATERIALIZED (
         | SELECT p.cluster, p.dim, coalesce(m.c, p.c) AS c
         | FROM c${i - 1} p LEFT JOIN m$i m ON p.cluster = m.cluster AND p.dim = m.dim)""".stripMargin)
    }
    sb.toString
  }

  def oracleSql(k: Int = K, iters: Int = Iters): String =
    oracleChain(k, iters) + s"""
       |SELECT CAST(c.cluster AS BIGINT) AS cluster, CAST(c.dim AS BIGINT) AS dim,
       | CAST(c.c AS BIGINT) AS centroid_fp, CAST(coalesce(sz.n, 0) AS BIGINT) AS n
       |FROM c$iters c LEFT JOIN (
       | SELECT cluster, count(*) AS n FROM a$iters GROUP BY 1) sz
       | ON c.cluster = sz.cluster
       |ORDER BY cluster, dim""".stripMargin

  /** Simplified-silhouette clustering-quality audit over the Lloyd twin's
    * FINAL centroids — the go/no-go a curation pipeline reads before
    * trusting cluster-balanced sampling or cluster-aware splits: per
    * cluster, size, the mean simplified silhouette
    * `s = (b − a) / max(a, b)` (a = squared distance to own centroid,
    * b = to the nearest OTHER centroid; milli fixed-point, integer div)
    * and the mean intra-cluster squared distance (compactness). Mean
    * s_milli near 0 ⇒ the cluster bleeds into a neighbor; near 1000 ⇒
    * well-separated. Centroid-based silhouette is the standard
    * O(n·k) surrogate for the O(n²) pairwise definition — the only one
    * that exists at corpus scale.
    *
    * Determinism: a and b are the 1st/2nd elements of the
    * struct-sorted (dist, cluster) array — ties break to the LOWEST
    * cluster id, exactly the oracle's `row_number() ORDER BY dist,
    * cluster`; all ratios are nonnegative-integer `div`.
    *
    * Scale shape: one assignment-style pass over the quantized corpus
    * (centroids are a k×dims plan literal), one k-row aggregate. The
    * Lloyd rounds it replays are the fixed [[Iters]]; everything else is
    * a single scan.
    */
  def kmeansSilhouette(s: SparkSession, dir: String): DataFrame =
    silhouetteOf(Tables.embeddings(s, dir), K, Iters)

  private[graft] def silhouetteOf(
      emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val (cents, _) = run(emb, k, iters)
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    val dists = transform(centsLit, c =>
      aggregate(zip_with(col("xq"), c, (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v))
    quantized(emb)
      .select(dists.as("ds"))
      // one sorted (dist, cluster) struct array; [0] = own cluster
      .select(expr(
        "array_sort(transform(ds, (d, i) -> struct(d AS dist, i AS cluster)))")
        .as("z"))
      .select(col("z")(0).getField("cluster").cast("long").as("cluster"),
        col("z")(0).getField("dist").as("a"),
        col("z")(1).getField("dist").as("b"))
      .withColumn("s_milli",
        expr("((b - a) * 1000) div greatest(greatest(a, b), 1L)"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        sum("s_milli").as("sum_s"), sum("a").as("sum_a"))
      .select(col("cluster"), col("n"),
        expr("sum_s div n").as("mean_s_milli"),
        expr("sum_a div n").as("mean_intra_dist"))
      .orderBy("cluster")
  }

  /** External-validation twin of [[kmeansSilhouette]]: cluster PURITY
    * against the corpus's ground-truth `label` column — per cluster,
    * size, number of distinct labels present, the majority label (ties
    * to the lowest label id) and its milli share. Silhouette says the
    * geometry is tight; purity says the geometry agrees with the
    * labels — a curation pipeline wants both before trusting
    * cluster-balanced sampling to preserve class structure.
    *
    * Scale shape: one final-centroid assignment pass (k×dims literal),
    * one (cluster, label) aggregate — cells bounded by k·|labels|
    * regardless of corpus size — then a k-row ranking.
    */
  def kmeansPurity(s: SparkSession, dir: String): DataFrame =
    purityOf(Tables.embeddings(s, dir), K, Iters)

  private[graft] def purityOf(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val (cents, _) = run(emb, k, iters)
    val assigned = assign(quantized(emb), cents)
    val cells = Tables.parallelized(emb)
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .join(assigned.select(col("vec_id"), col("cluster")), "vec_id")
      .groupBy("cluster", "label").agg(count(lit(1)).as("c"))
    import org.apache.spark.sql.expressions.Window
    cells
      .withColumn("rk", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(col("c").desc, col("label"))))
      .groupBy("cluster")
      .agg(sum("c").as("n"),
        count(lit(1)).as("n_labels"),
        max(when(col("rk") === 1, col("label"))).as("majority_label"),
        max(when(col("rk") === 1, col("c"))).as("maj_c"))
      .select(col("cluster"), col("n"), col("n_labels"),
        col("majority_label"),
        expr("(1000 * maj_c) div n").as("purity_milli"))
      .orderBy("cluster")
  }

  /** Oracle: shared Lloyd chain → final assignment → the identical
    * (cluster, label) contingency and majority ranking.
    */
  def purityOracleSql(k: Int = K, iters: Int = Iters): String =
    oracleChain(k, iters) + s""",
       |df AS (
       | SELECT x.vec_id, c.cluster, sum((x.xq - c.c) * (x.xq - c.c)) AS dist
       | FROM x JOIN c$iters c ON x.dim = c.dim GROUP BY 1, 2),
       |fa AS (
       | SELECT vec_id, cluster FROM (
       |  SELECT vec_id, cluster,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |  FROM df) WHERE rn = 1),
       |cells AS (
       | SELECT fa.cluster, CAST(e.label AS BIGINT) AS label, count(*) AS c
       | FROM fa JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
       |rk AS (
       | SELECT *, row_number() OVER (PARTITION BY cluster
       |   ORDER BY c DESC, label) AS r
       | FROM cells)
       |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(sum(c) AS BIGINT) AS n,
       | count(*) AS n_labels,
       | CAST(max(CASE WHEN r = 1 THEN label END) AS BIGINT) AS majority_label,
       | CAST((1000 * max(CASE WHEN r = 1 THEN c END)) // sum(c) AS BIGINT)
       |  AS purity_milli
       |FROM rk GROUP BY cluster ORDER BY cluster""".stripMargin

  /** Oracle: the shared Lloyd chain, then the same 1st/2nd-nearest
    * ranking off the final centroid table.
    */
  def silhouetteOracleSql(k: Int = K, iters: Int = Iters): String =
    oracleChain(k, iters) + s""",
       |df AS (
       | SELECT x.vec_id, c.cluster, sum((x.xq - c.c) * (x.xq - c.c)) AS dist
       | FROM x JOIN c$iters c ON x.dim = c.dim GROUP BY 1, 2),
       |rk AS (
       | SELECT vec_id, cluster, dist,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       | FROM df),
       |ab AS (
       | SELECT vec_id,
       |  max(CASE WHEN rn = 1 THEN cluster END) AS cluster,
       |  max(CASE WHEN rn = 1 THEN dist END) AS a,
       |  max(CASE WHEN rn = 2 THEN dist END) AS b
       | FROM rk WHERE rn <= 2 GROUP BY 1),
       |sm AS (
       | SELECT cluster, a,
       |  ((b - a) * 1000) // greatest(greatest(a, b), 1) AS s_milli
       | FROM ab)
       |SELECT CAST(cluster AS BIGINT) AS cluster, count(*) AS n,
       | CAST(sum(s_milli) // count(*) AS BIGINT) AS mean_s_milli,
       | CAST(sum(a) // count(*) AS BIGINT) AS mean_intra_dist
       |FROM sm GROUP BY cluster ORDER BY cluster""".stripMargin
}
