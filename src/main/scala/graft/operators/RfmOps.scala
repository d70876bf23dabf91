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
}
