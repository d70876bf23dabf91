package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Skyline (Pareto-frontier) computation — the multi-criteria "best
  * trade-offs" operator: parts minimizing price while maximizing size,
  * i.e. rows no other row dominates (≤ price, ≥ size, one strict).
  *
  * Scale shape: the textbook sort-filter skyline walks the whole table
  * through one ordered scan — a single-partition window at 100 TB. Here
  * the dominance test decomposes into prefix maxima, computed
  * HIERARCHICALLY (the [[RankOps]] pattern): per-price-bucket maxima
  * collapse map-side, a bucket-domain window prefixes them, and the
  * in-bucket strictly-cheaper maximum runs per bucket partition with a
  * RANGE frame (ties excluded by value, so equal prices never dominate
  * each other through the frame). A row survives iff it beats every
  * strictly-cheaper row's size and is its own price group's maximum —
  * pure Column algebra, no self-join. The ORACLE is the independent
  * quadratic NOT EXISTS formulation, so the prefix-max decomposition is
  * cross-checked against the definition itself.
  */
object SkylineOps {

  def skylineParts(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"),
      expr("cast(floor(p_retailprice * 1000 + 0.5) as long)").as("price_milli"),
      col("p_size").cast("long").as("p_size"))
    val b = p.withColumn("bk", expr("price_milli div 100000"))
    val carry = b.groupBy("bk").agg(max("p_size").as("bmax"))
      .withColumn("carry", coalesce(
        max("bmax").over(Window.orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(-1L)))
      .select("bk", "carry")
    b.join(carry, Seq("bk"))
      .withColumn("inb", coalesce(
        max("p_size").over(Window.partitionBy("bk").orderBy("price_milli")
          .rangeBetween(Window.unboundedPreceding, -1)), lit(-1L)))
      .withColumn("cheaper_max", greatest(col("carry"), col("inb")))
      .withColumn("same_max",
        max("p_size").over(Window.partitionBy("price_milli")))
      .filter(col("p_size") > col("cheaper_max") &&
        col("p_size") === col("same_max"))
      .select("p_partkey", "price_milli", "p_size")
      .orderBy("p_partkey")
  }

  /** The definition itself: dominated iff a (≤ price, ≥ size, one
    * strict) witness exists — an algorithm the Spark side never runs.
    */
  def skylineOracleSql(): String =
    """WITH p AS (
      | SELECT p_partkey,
      |  CAST(floor(p_retailprice * 1000 + 0.5) AS BIGINT) AS price_milli,
      |  CAST(p_size AS BIGINT) AS p_size
      | FROM part)
      |SELECT p_partkey, price_milli, p_size FROM p a
      |WHERE NOT EXISTS (
      | SELECT 1 FROM p b
      | WHERE b.price_milli <= a.price_milli AND b.p_size >= a.p_size
      |  AND (b.price_milli < a.price_milli OR b.p_size > a.p_size))
      |ORDER BY p_partkey""".stripMargin
}
