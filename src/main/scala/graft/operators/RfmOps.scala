package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RFM (recency / frequency / monetary) customer segmentation — the
  * classic marketing-analytics cube: quartile each customer on days
  * since last order, order count, and lifetime spend, then report
  * segment sizes and spend. Exact-integer end to end: recency in whole
  * epoch days against the corpus max, spend in milli fixed-point, and
  * every quartile is the exact NTILE(4) contract.
  *
  * Scale shape: the per-customer reduction is one map-side-combined
  * aggregation of orders; each of the three quartile assignments is a
  * [[RankOps.withHierarchicalRank]] pass (global rank with NO
  * single-partition window — the serial step touches only the value-
  * bucket domain), and the final cube is ≤ 4³ rows. The oracle runs
  * three native NTILEs — an independent algorithm for all three ranks.
  */
object RfmOps {

  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("c"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("d"),
      col("o_totalprice"))
    val maxd = o.agg(max("d").as("maxd"))
    val cust = o.groupBy("c")
      .agg(
        max("d").as("last_d"),
        count(lit(1)).as("frequency"),
        floor(sum(col("o_totalprice").cast("decimal(25,10)")) * 1000)
          .cast("long").as("monetary_milli"))
      .crossJoin(broadcast(maxd))
      .withColumn("recency_days", col("maxd") - col("last_d"))
      .select("c", "recency_days", "frequency", "monetary_milli")
    val cnt = cust.agg(count(lit(1)).as("cnt"))
    val ranked = Seq(
      ("recency_days", "recency_days div 30", "r_rk"),
      ("frequency", "frequency div 4", "f_rk"),
      ("monetary_milli", "monetary_milli div 16777216", "m_rk"))
      .foldLeft(cust) { case (df, (v, b, rk)) =>
        RankOps.withHierarchicalRank(df, Seq.empty, v, "c", b, rk)
      }
      .crossJoin(broadcast(cnt))
    ranked
      .withColumn("r_q", RankOps.ntileOf("r_rk", "cnt", 4).cast("long"))
      .withColumn("f_q", RankOps.ntileOf("f_rk", "cnt", 4).cast("long"))
      .withColumn("m_q", RankOps.ntileOf("m_rk", "cnt", 4).cast("long"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(
        count(lit(1)).as("customers"),
        sum("monetary_milli").as("monetary_milli"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Three native NTILEs — independent of the hierarchical ranks. */
  val RfmOracleSql: String =
    """WITH o AS (
      | SELECT o_custkey AS c, epoch_us(o_orderdate) // 86400000000 AS d,
      |  o_totalprice
      | FROM orders),
      |mx AS (SELECT max(d) AS maxd FROM o),
      |cust AS (
      | SELECT c, (SELECT maxd FROM mx) - max(d) AS recency_days,
      |  count(*) AS frequency,
      |  CAST(floor(sum(CAST(o_totalprice AS DECIMAL(25,10))) * 1000) AS BIGINT) AS monetary_milli
      | FROM o GROUP BY c),
      |q AS (
      | SELECT c, monetary_milli,
      |  CAST(NTILE(4) OVER (ORDER BY recency_days, c) AS BIGINT) AS r_q,
      |  CAST(NTILE(4) OVER (ORDER BY frequency, c) AS BIGINT) AS f_q,
      |  CAST(NTILE(4) OVER (ORDER BY monetary_milli, c) AS BIGINT) AS m_q
      | FROM cust)
      |SELECT r_q, f_q, m_q, count(*) AS customers,
      | CAST(sum(monetary_milli) AS BIGINT) AS monetary_milli
      |FROM q GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin

  /** Decile lift table — the campaign-targeting readout: users ranked
    * into exact value deciles (total event value in cents), each decile's
    * purchase-conversion rate, and its lift over the corpus base rate.
    * The decile is the exact NTILE(10) contract via
    * [[RankOps.withHierarchicalRank]] (bucket-parallel, no
    * single-partition window); value is exact integer cents
    * (`floor(v*100+0.5)` — pure IEEE, bit-identical cross-engine); lift
    * is `(buyers/users)/(total_buyers/total_users)` cleared to one
    * integer division in milli. One user-keyed aggregate, one rank pass,
    * a 10-row rollup.
    */
  def decileLift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val users = ev.groupBy("user_id").agg(
      sum(coalesce(expr("cast(floor(value * 100 + 0.5) as bigint)"), lit(0L)))
        .as("value_cents"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("purchases"))
    val totals = users.agg(
      count(lit(1)).as("total_users"),
      sum(when(col("purchases") > 0, 1L).otherwise(0L)).as("total_buyers"))
    val ranked = RankOps.withHierarchicalRank(
        users, Seq.empty, "value_cents", "user_id",
        "value_cents div 16384", "rk")
      .crossJoin(broadcast(totals))
      .withColumn("decile", RankOps.ntileOf("rk", "total_users", 10).cast("long"))
    ranked
      .groupBy("decile")
      .agg(
        count(lit(1)).as("users"),
        sum("value_cents").as("value_cents"),
        sum(when(col("purchases") > 0, 1L).otherwise(0L)).as("buyers"),
        first("total_users").as("tu"),
        first("total_buyers").as("tb"))
      .select(
        col("decile"), col("users"), col("value_cents"), col("buyers"),
        expr("(1000 * buyers) div users").as("conv_permille"),
        // Guarded: a corpus with zero purchases makes tb = 0 — Spark's
        // div would yield NULL while DuckDB's // raises, so both sides
        // spell the degenerate case out as an explicit NULL.
        expr("case when tb > 0 then (1000 * buyers * tu) div (users * tb) end")
          .as("lift_milli"))
      .orderBy("decile")
  }

  /** Native NTILE(10) — independent of the hierarchical rank. */
  val DecileLiftOracleSql: String =
    """WITH u AS (
      | SELECT user_id,
      |  sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)) AS value_cents,
      |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
      | FROM events GROUP BY user_id),
      |t AS (SELECT count(*) AS tu,
      | sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS tb FROM u),
      |d AS (
      | SELECT value_cents, purchases,
      |  CAST(NTILE(10) OVER (ORDER BY value_cents, user_id) AS BIGINT) AS decile
      | FROM u)
      |SELECT decile, count(*) AS users,
      | CAST(sum(value_cents) AS BIGINT) AS value_cents,
      | CAST(sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS BIGINT) AS buyers,
      | CAST((1000 * sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END)) // count(*)
      |  AS BIGINT) AS conv_permille,
      | CAST(CASE WHEN (SELECT tb FROM t) > 0 THEN
      |  (1000 * sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END)
      |   * (SELECT tu FROM t))
      |  // (count(*) * (SELECT tb FROM t)) END AS BIGINT) AS lift_milli
      |FROM d GROUP BY decile ORDER BY decile""".stripMargin
}
