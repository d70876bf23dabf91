package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-table join workloads over the star schema — the "complex joins"
  * the reference lists among its pipeline operations
  * (reference: analysis/etl_spark.py:52).
  *
  * Scale notes: the dimension chain (region→nation→customer) is tiny
  * relative to the fact tables, so Catalyst broadcasts it and the only
  * real shuffle is the orders⋈lineitem fact join on the orderkey plus
  * the final aggregation. Money math is decimal end-to-end (exact,
  * partition-order independent); the rounded double appears only in the
  * final projection.
  */
object JoinOps {

  /** Revenue by nation: customer→orders→lineitem star join with
    * broadcast dims, decimal revenue, counts per nation.
    */
  def nationRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(25,10)") *
          (lit(1).cast("decimal(25,10)") - col("l_discount").cast("decimal(25,10)")))
          .as("rev"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("line_items"),
        round(sum(col("rev")).cast("double"), 2).as("revenue"))
      .orderBy("n_name")

  /** Rollup aggregate over order status × priority: subtotals and a
    * grand total in one pass (`ROLLUP` both engines).
    */
  def ordersRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("orders"),
        round(sum(col("o_totalprice").cast("decimal(25,10)")).cast("double"), 2)
          .as("total_price"))
      .orderBy(
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** CUBE aggregate over return-flag × line-status: all four grouping
    * sets (detail, each single-axis subtotal, grand total) from ONE scan.
    * `grouping_id` disambiguates subtotal rows from genuine NULL keys and
    * makes (gid, flag, status) a unique deterministic sort key; both
    * engines use first-listed-column-as-MSB bitmask semantics.
    *
    * Shape: Spark's native `.cube` runs Expand BEFORE the partial
    * aggregate, so every input row is materialized ×4 through the hash
    * aggregate. Here the detail aggregate (count + decimal sum per
    * (flag, status)) runs FIRST — the full scan flows through a plain
    * partial agg — and the grouping-sets expand applies to the collapsed
    * per-pair frame (~|flag|×|status| rows, dozens at any scale). Counts
    * re-sum and decimal sums re-add exactly, so results are identical to
    * the direct cube; the ×N expand multiplier now touches a frame whose
    * size is key-cardinality-bounded, not row-bounded.
    */
  def lineitemCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("li"),
        sum(col("l_extendedprice").cast("decimal(25,10)")).as("tp"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(col("li")).as("line_items"),
        round(sum(col("tp")).cast("double"), 2).as("total_price"))
      .select(
        col("gid"), col("l_returnflag"), col("l_linestatus"),
        col("line_items"), col("total_price"))
      .orderBy(
        col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val CubeOracleSql: String =
    """SELECT CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      | l_returnflag, l_linestatus, count(*) AS line_items,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,10))) AS DOUBLE), 2) AS total_price
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Semi/anti join census: per market segment, customers with and
    * without any order — `left_semi` and `left_anti` against the fact
    * table (both shuffle only the key column).
    */
  def customerOrderCensus(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    val orderKeys = Tables.orders(s, dir).select(col("o_custkey"))
    val withOrders = cust
      .join(orderKeys, cust("c_custkey") === orderKeys("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("with_orders"))
    val withoutOrders = cust
      .join(orderKeys, cust("c_custkey") === orderKeys("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("without_orders"))
    withOrders
      .join(withoutOrders, Seq("c_mktsegment"), "full_outer")
      .select(
        col("c_mktsegment"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
      .orderBy("c_mktsegment")
  }
}
