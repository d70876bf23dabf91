package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (`embedding`:
  * Array[Float], 64-dim).
  *
  * Two paths:
  *  - [[annTopK]]: exact brute-force cosine top-k for a small, broadcast
  *    query set — the correctness baseline. The scan side streams once
  *    through a broadcast nested-loop join; per-pair math is a codegen'd
  *    `zip_with`/`aggregate` fold in doubles (no UDF, no collect).
  *  - [[annLshTopK]]: the 100 TB path — SimHash (random-hyperplane) bucket
  *    codes built from seeded `xxhash64` pseudo-hyperplanes, candidates
  *    drawn only from the query's bucket and its Hamming-1 neighbors
  *    (multi-probe), exact cosine re-rank within candidates. Work scales
  *    with bucket occupancy (~N/2^bits per probe), not with N×Q.
  *
  * Scores are rounded to 6 decimals before ranking so both engines rank
  * identical keys (ties broken by candidate id).
  */
object AnnOps {

  /** Sum of element products in doubles, index order — the native
    * [[graft.functions.FloatVecDot]] expression (fused codegen loop; same
    * accumulation sequence as a `zip_with`+`aggregate` fold, so results
    * are bit-identical to the declarative form).
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vec_dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Exact top-k nearest neighbors (cosine) of the first `nQueries`
    * vectors against the whole table, self-matches excluded.
    */
  def annTopK(s: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val cand = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    cand
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine_r6"))
      .withColumn("rank",
        row_number()
          .over(Window.partitionBy("q_id").orderBy(desc("cosine_r6"), col("c_id")))
          .cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "rank", "cosine_r6")
      .orderBy("q_id", "rank")
  }

  /** Embedding-cosine near-duplicate summary: total vectors + count of
    * pairs with rounded cosine >= `tauMilli`/1000. Candidates come from
    * SimHash buckets probed to Hamming<=1 per vector (covering all pairs
    * within code distance 2 — P≈0.96 for a true 0.95-cosine pair at 8
    * bits), then exact verification; never an N² product. One summary
    * row so the result is meaningful even on corpora with no embedding
    * near-dups (like this one — max pair cosine is 0.60 at sf0.1).
    */
  def embedNearDupStats(
      s: SparkSession,
      dir: String,
      tauMilli: Int = 950,
      bits: Int = 8): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        simhashCode(col("embedding"), bits).as("code"))
    val masks: Seq[Long] = Seq(0L) ++ (0 until bits).map(1L << _)
    val buckets = emb.select(col("vec_id"), col("embedding"),
      explode(array(masks.map(m => col("code").bitwiseXOR(lit(m))): _*)).as("probe"))
    val pairs = buckets.as("x")
      .join(
        buckets.as("y"),
        col("x.probe") === col("y.probe") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        col("x.embedding").as("va"), col("y.embedding").as("vb"))
      .distinct()
      .filter(cosine(col("va"), col("vb")) >= tauMilli / 1000.0)
      .select(col("a"), col("b"))
    val total = Tables.embeddings(s, dir).select(col("vec_id"))
    total.agg(count(lit(1)).as("total_vecs"))
      .crossJoin(pairs.agg(count(lit(1)).as("dup_pairs")))
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * assigns every vector to a cell; each query probes only its `nProbe`
    * closest cells and re-ranks exactly within them. The centroid table
    * is k×64 floats — broadcast-size at any corpus scale — and per-query
    * work is ~nProbe/k of brute force. The IVF twin of [[annLshTopK]];
    * pick IVF when the corpus clusters well, LSH when it doesn't.
    */
  def annIvfTopK(
      s: SparkSession,
      dir: String,
      k: Int = 10,
      nQueries: Int = 5,
      nProbe: Int = 3,
      cells: Int = 10): DataFrame = {
    import s.implicits._
    val (model, preds) = KMeansOps.fit(s, dir, k = cells)
    val assignments = preds.select(col("vec_id"), col("cluster"))
    val emb = Tables.embeddings(s, dir).join(assignments, "vec_id")

    // k x 64 floats from the fitted model: legitimately driver-side tiny.
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toDF("cluster", "centroid")

    val probed = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .crossJoin(broadcast(centroids))
      // cosine to the centroid; rounded ranking + cluster-id tie-break
      .withColumn("cell_score", cosine(col("q_vec"), col("centroid")))
      .withColumn("cell_rank",
        row_number().over(
          Window.partitionBy("q_id").orderBy(desc("cell_score"), col("cluster")))
          .cast("long"))
      .filter(col("cell_rank") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cluster"))

    probed
      .join(emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
        col("cluster")), "cluster")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine_r6"))
      .distinct()
      .withColumn("rank",
        row_number()
          .over(Window.partitionBy("q_id").orderBy(desc("cosine_r6"), col("c_id")))
          .cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "rank", "cosine_r6")
      .orderBy("q_id", "rank")
  }

  /** Deterministic pseudo-hyperplane component h[d] in [-1, 1): seeded
    * integer hash scaled — reproducible on any cluster, no RNG state.
    */
  private def hyperplaneAt(h: Int, d: Column): Column =
    (pmod(xxhash64(lit(h), d), lit(2000001L)).cast("double") - 1000000.0) / 1000000.0

  /** SimHash bucket code (`bits` sign bits) for an embedding column. */
  def simhashCode(vec: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { h =>
      val proj = aggregate(
        zip_with(
          vec,
          sequence(lit(0), lit(63)),
          (x, d) => x.cast("double") * hyperplaneAt(h, d)),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, lit(1L) * (1L << h)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates share the query's SimHash
    * bucket up to Hamming distance 2 (multi-probe), then exact cosine
    * re-rank. Returns the same schema as [[annTopK]]. With 8 bits the
    * probes cover 37/256 of code space, so candidate work is ~1/7th of
    * brute force while staying recall-heavy on clustered data; the
    * bits/probe-radius pair is the recall-vs-cost dial at scale.
    */
  def annLshTopK(
      s: SparkSession,
      dir: String,
      k: Int = 10,
      nQueries: Int = 5,
      bits: Int = 8): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        simhashCode(col("embedding"), bits).as("code"))

    // Probe masks: the query's own code plus all Hamming-1 and Hamming-2
    // neighbor codes (fixed literal mask set, built once).
    val masks: Seq[Long] =
      Seq(0L) ++
        (0 until bits).map(1L << _) ++
        (for { i <- 0 until bits; j <- i + 1 until bits }
          yield (1L << i) | (1L << j))
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        explode(array(masks.map(m => col("code").bitwiseXOR(lit(m))): _*)).as("probe"))

    probes
      .join(emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
        col("code").as("c_code")), col("probe") === col("c_code"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine_r6"))
      .distinct()
      .withColumn("rank",
        row_number()
          .over(Window.partitionBy("q_id").orderBy(desc("cosine_r6"), col("c_id")))
          .cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "rank", "cosine_r6")
      .orderBy("q_id", "rank")
  }
}
