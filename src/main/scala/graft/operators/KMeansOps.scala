package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** K-Means clustering over the 64-dim `embeddings` vectors
  * (reference: analysis/kmeans_spark.py:104-162: VectorAssembler + MLlib
  * KMeans, seed 42, k-means|| init, tolerance 1e-4 — the same
  * configuration, with `array_to_vector` replacing VectorAssembler since
  * the features already arrive as one array column).
  *
  * Scale notes: MLlib KMeans is the distributed Lloyd's implementation —
  * centroids broadcast each iteration, assignments computed map-side,
  * centroid updates via treeAggregate. No driver-side data movement
  * beyond the k×64 centroid matrix. Cluster ids are arbitrary, so the
  * registered query emits the size distribution (rank × size), which is
  * stable across label permutations.
  */
object KMeansOps {

  /** Registered-query default: train the quantizer on the deterministic
    * 1-in-4 carve, assign the FULL corpus — the only KMeans shape that
    * exists at 100 TB (see [[fitOnSample]]). The full-corpus fit stays
    * available as [[fitFull]] for the sampled-vs-full pinning spec.
    */
  def fit(
      s: SparkSession,
      dir: String,
      k: Int = 10,
      maxIter: Int = 20,
      seed: Long = 42L): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) =
    fitOnSample(s, dir, k, trainMod = 4, maxIter, seed)

  /** Exact full-corpus fit (every row trains). Not registered: at 100 TB
    * the training pass over every vector buys nothing once each centroid
    * has tens of thousands of training samples — kept for tests that pin
    * how far the sampled quantizer drifts from the exact one.
    */
  def fitFull(
      s: SparkSession,
      dir: String,
      k: Int = 10,
      maxIter: Int = 20,
      seed: Long = 42L): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) =
    fitOnSample(s, dir, k, trainMod = 1, maxIter, seed) // mod 1 = every row

  def fitPredictions(
      s: SparkSession,
      dir: String,
      k: Int = 10,
      maxIter: Int = 20,
      seed: Long = 42L): DataFrame = fit(s, dir, k, maxIter, seed)._2

  /** Quantizer-training fit: train on a deterministic 1-in-`trainMod`
    * id carve, then assign the FULL corpus with the fitted model. At
    * 100 TB an exact KMeans over every vector is neither possible nor
    * needed — coarse-quantizer quality saturates at tens of thousands
    * of samples per centroid (standard IVF practice), so the training
    * side stays bounded while assignment remains one broadcast-model
    * map pass. The id-modulus carve is deterministic under ANY
    * partitioning or file layout, unlike `DataFrame.sample`, so the
    * fitted centroids are reproducible run to run.
    */
  def fitOnSample(
      s: SparkSession,
      dir: String,
      k: Int = 10,
      trainMod: Int = 4,
      maxIter: Int = 20,
      seed: Long = 42L): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        array_to_vector(col("embedding")).as("features"))
    val km = new KMeans()
      .setK(k)
      .setMaxIter(maxIter)
      .setSeed(seed)
      .setInitMode("k-means||")
      .setTol(1e-4)
      .setFeaturesCol("features")
      .setPredictionCol("cluster")
    val model = km.fit(emb.filter(col("vec_id") % trainMod === 0))
    (model, model.transform(emb))
  }

  /** Cluster-size distribution: (rank, size), largest first
    * (reference: analysis/kmeans_spark.py:162 cluster distribution).
    */
  def kmeansSizes(s: SparkSession, dir: String): DataFrame =
    rankBySize(fitPredictions(s, dir)
        .groupBy("cluster").agg(count(lit(1)).as("size")))
      .select("rank", "size")
      .orderBy("rank")

  /** Rank a (cluster, size) frame largest-first by counting strictly-
    * ahead rows in a k×k self join instead of an unpartitioned window:
    * same deterministic (size desc, cluster) order, but no single-
    * partition WindowExec (the global-window warning fires even when
    * the frame is k=10 rows, and a constant partition key gets folded
    * away).
    */
  private def rankBySize(sizes: DataFrame): DataFrame = {
    val other = sizes.select(
      col("cluster").as("o_cluster"), col("size").as("o_size"))
    sizes
      .crossJoin(other)
      .groupBy("cluster", "size")
      .agg((sum(
        when(
          col("o_size") > col("size") ||
            (col("o_size") === col("size") && col("o_cluster") < col("cluster")),
          1L).otherwise(0L)) + 1L).cast("long").as("rank"))
  }

  /** Row-level assignment sample — the `features -> cluster` rows the
    * reference prints after the fit (reference: analysis/kmeans_spark.py:
    * 25-33). The raw cluster id is permutation-arbitrary, so each sampled
    * row reports its cluster's SIZE-RANK (the [[kmeansSizes]] key) and
    * size instead — stable across label permutations, like the other
    * kmeans artifacts. The sample is the lowest `sample` vec_ids: a
    * deterministic carve under any partitioning, and a broadcast-size
    * output at any corpus scale.
    */
  def kmeansAssign(s: SparkSession, dir: String, sample: Int = 20): DataFrame = {
    val preds = fitPredictions(s, dir)
    val ranked = rankBySize(
      preds.groupBy("cluster").agg(count(lit(1)).as("size")))
    preds.filter(col("vec_id") < sample)
      .join(broadcast(ranked), "cluster")
      .select(col("vec_id"), col("label"),
        col("rank").as("cluster_rank"), col("size").as("cluster_size"))
      .orderBy("vec_id")
  }

  /** Centroid report matching the reference's display artifact
    * (reference: analysis/kmeans_spark.py:25-31, 158-159 shows centroids
    * and sample assignments). Cluster ids are permutation-arbitrary, so
    * rows are keyed by size rank (ties by centroid norm); per-centroid
    * values are the L2 norm and first coordinate, rounded — enough to
    * audit the fit without depending on label order.
    */
  def kmeansCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (model, preds) = fit(s, dir)
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) =>
        (i, math.sqrt(c.toArray.map(x => x * x).sum), c(0))
      }
      .toDF("cluster", "centroid_norm", "centroid_c0")
    preds.groupBy("cluster").agg(count(lit(1)).as("size"))
      .join(centroids, "cluster")
      .select(col("size"), round(col("centroid_norm"), 4).as("centroid_norm_r4"),
        round(col("centroid_c0"), 4).as("centroid_c0_r4"))
      .orderBy(desc("size"), col("centroid_norm_r4"))
  }
}
