package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distinct-count sketching with a KMV (k-minimum-values) estimator.
  *
  * The classic cardinality sketches (HLL, theta) are approximate AND
  * engine-specific — `approx_count_distinct` can never hash-match an
  * oracle. KMV gives the same O(k) sketch-size / one-pass properties
  * while staying bit-deterministic: hash every key with a fixed
  * multiplicative hash into [0, P), keep the k smallest distinct hash
  * values, and estimate N ≈ (k-1)·P / h_k from the k-th minimum (the
  * uniform-order-statistics estimator, rel. stddev ≈ 1/√(k−2)). Every
  * step is integer arithmetic on a fixed hash family, so Spark and the
  * DuckDB oracle agree exactly — the sketch itself is checkable, not just
  * its error bound.
  *
  * Scale notes (100 TB): the plan is `distinct` over hash values (partial
  * map-side dedup, shuffle bounded by the number of DISTINCT keys, never
  * row count) followed by `orderBy(h).limit(k)` — a TakeOrdered: each
  * task keeps a k-item bound, the driver merges k·partitions candidates.
  * The global distinct IS required: TakeOrdered alone would let the same
  * hash from two partitions occupy two of the k slots and bias the
  * estimate low. When n_distinct < k the sketch holds every value and the
  * count is exact — reported as such.
  */
object SketchOps {

  /** 2^31 - 1 (Mersenne prime): hash range and modulus. */
  val P: Long = 2147483647L

  /** Knuth's multiplicative constant; (P-1)·K < 2^63 so the product never
    * overflows a Long (Spark 4 ANSI mode throws on overflow).
    */
  val K: Long = 2654435761L

  val DefaultK: Int = 64

  /** One-row sketch report: k, the k-th minimum hash, the KMV estimate
    * and the true distinct count (exact in both engines) for comparison.
    */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = DefaultK): DataFrame = {
    val h = (col(keyCol) % P) * K % P
    val mins = df.select(h.as("h")).distinct().orderBy("h").limit(k)
    val sketch = mins.agg(count(lit(1)).as("n_min"), max("h").as("kth_min"))
    val truth = df.agg(countDistinct(col(keyCol)).as("true_distinct"))
    sketch.crossJoin(truth).select(
      lit(k.toLong).as("k"),
      col("kth_min"),
      // (k-1)·P precomputed: as two int literals the product would
      // overflow INT32 parsing in DuckDB and trip ANSI checks here.
      when(col("n_min") < k, col("n_min"))
        .otherwise(expr(s"${(k - 1).toLong * P} div kth_min"))
        .cast("long").as("est_distinct"),
      col("true_distinct"))
  }

  def kmvDistinctUsers(s: SparkSession, dir: String): DataFrame =
    kmvDistinct(Tables.events(s, dir), "user_id")

  def oracleSql(k: Int = DefaultK): String =
    s"""WITH h AS (
       | SELECT DISTINCT ((user_id % $P) * $K) % $P AS h FROM events),
       |m AS (SELECT h FROM h ORDER BY h LIMIT $k),
       |sk AS (SELECT count(*) AS n_min, max(h) AS kth_min FROM m),
       |t AS (SELECT count(DISTINCT user_id) AS true_distinct FROM events)
       |SELECT CAST($k AS BIGINT) AS k, sk.kth_min,
       | CAST(CASE WHEN sk.n_min < $k THEN sk.n_min
       |  ELSE ${(k - 1).toLong * P} // sk.kth_min END AS BIGINT) AS est_distinct,
       | t.true_distinct
       |FROM sk, t""".stripMargin
}
