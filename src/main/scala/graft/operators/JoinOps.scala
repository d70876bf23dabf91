package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Referential-integrity audit across the star: orphan counts for the
    * five foreign-key relationships (lineitem→orders/part/supplier,
    * orders→customer, customer→nation) — the data-contract check an
    * ingest pipeline runs before publishing a snapshot.
    *
    * Scale shape: ONE pass per fact table, not one per relationship —
    * lineitem resolves all three of its lookups in a single plan
    * (orders by shuffle key join at scale, part/supplier marked
    * existence joins), and each check is a null-count aggregate, so the
    * shuffle carries keys only. The dimension existence sides carry one
    * key column each. Output is one row per relationship — fixed.
    */
  def riAudit(s: SparkSession, dir: String): DataFrame = {
    def exists(df: DataFrame, key: String, flag: String): DataFrame =
      df.select(col(key)).distinct().withColumn(flag, lit(1))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(exists(Tables.orders(s, dir), "o_orderkey", "has_o"),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(broadcast(exists(Tables.part(s, dir), "p_partkey", "has_p")),
        col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(exists(Tables.supplier(s, dir), "s_suppkey", "has_s")),
        col("l_suppkey") === col("s_suppkey"), "left")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("has_o").isNull, 1L).otherwise(0L)).as("orph_o"),
        sum(when(col("has_p").isNull, 1L).otherwise(0L)).as("orph_p"),
        sum(when(col("has_s").isNull, 1L).otherwise(0L)).as("orph_s"))
      .selectExpr(
        """stack(3,
          | 'lineitem->orders',   n, orph_o,
          | 'lineitem->part',     n, orph_p,
          | 'lineitem->supplier', n, orph_s) as (relationship, fact_rows, orphans)""".stripMargin)
    val ord = Tables.orders(s, dir).select(col("o_custkey"))
      .join(exists(Tables.customer(s, dir), "c_custkey", "has_c"),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("fact_rows"),
        sum(when(col("has_c").isNull, 1L).otherwise(0L)).as("orphans"))
      .select(lit("orders->customer").as("relationship"),
        col("fact_rows"), col("orphans"))
    val cust = Tables.customer(s, dir).select(col("c_nationkey"))
      .join(broadcast(exists(Tables.nation(s, dir), "n_nationkey", "has_n")),
        col("c_nationkey") === col("n_nationkey"), "left")
      .agg(count(lit(1)).as("fact_rows"),
        sum(when(col("has_n").isNull, 1L).otherwise(0L)).as("orphans"))
      .select(lit("customer->nation").as("relationship"),
        col("fact_rows"), col("orphans"))
    li.union(ord).union(cust).orderBy("relationship")
  }

  val RiAuditOracleSql: String =
    """SELECT * FROM (
      | SELECT 'lineitem->orders' AS relationship, count(*) AS fact_rows,
      |  CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM orders) THEN 0 ELSE 1 END) AS BIGINT) AS orphans
      | FROM lineitem
      | UNION ALL
      | SELECT 'lineitem->part', count(*),
      |  CAST(sum(CASE WHEN l_partkey IN (SELECT p_partkey FROM part) THEN 0 ELSE 1 END) AS BIGINT)
      | FROM lineitem
      | UNION ALL
      | SELECT 'lineitem->supplier', count(*),
      |  CAST(sum(CASE WHEN l_suppkey IN (SELECT s_suppkey FROM supplier) THEN 0 ELSE 1 END) AS BIGINT)
      | FROM lineitem
      | UNION ALL
      | SELECT 'orders->customer', count(*),
      |  CAST(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer) THEN 0 ELSE 1 END) AS BIGINT)
      | FROM orders
      | UNION ALL
      | SELECT 'customer->nation', count(*),
      |  CAST(sum(CASE WHEN c_nationkey IN (SELECT n_nationkey FROM nation) THEN 0 ELSE 1 END) AS BIGINT)
      | FROM customer)
      |ORDER BY relationship""".stripMargin

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

  /** Join-cardinality estimation audit — the optimizer's-eye view of the
    * three fact/dimension joins: per pair, row counts, key NDVs, the
    * textbook independence estimate `|L|·|R| div max(ndv)`, the TRUE
    * join cardinality, and the estimate's error in ppm. The true size is
    * `Σ_k cnt_L(k)·cnt_R(k)` over per-key count frames — the join is
    * never materialized, so the audit costs two aggregates plus a
    * key-count-sized join per pair regardless of how explosive the join
    * itself would be (exactly why an optimizer wants this number).
    */
  def joinCardinalityAudit(s: SparkSession, dir: String): DataFrame = {
    def audit(pair: String, l: DataFrame, lk: String, r: DataFrame, rk: String) = {
      val lc = l.groupBy(col(lk).as("k")).agg(count(lit(1)).as("cl"))
      val rc = r.groupBy(col(rk).as("k")).agg(count(lit(1)).as("cr"))
      val actual = lc.join(rc, "k")
        .agg(coalesce(sum(col("cl") * col("cr")), lit(0L)).as("actual_rows"))
      val stats = lc.agg(sum("cl").as("rows_l"), count(lit(1)).as("ndv_l"))
        .crossJoin(rc.agg(sum("cr").as("rows_r"), count(lit(1)).as("ndv_r")))
      stats.crossJoin(actual).select(
        lit(pair).as("join_pair"),
        col("rows_l"), col("rows_r"), col("ndv_l"), col("ndv_r"),
        expr("(rows_l * rows_r) div greatest(ndv_l, ndv_r)").as("est_rows"),
        col("actual_rows"),
        expr("""(1000000 * abs((rows_l * rows_r) div greatest(ndv_l, ndv_r)
          | - actual_rows)) div actual_rows""".stripMargin).as("err_ppm"))
    }
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    audit("orders*lineitem", o, "o_orderkey", li, "l_orderkey")
      .unionAll(audit("customer*orders",
        Tables.customer(s, dir), "c_custkey", o, "o_custkey"))
      .unionAll(audit("part*lineitem",
        Tables.part(s, dir), "p_partkey", li, "l_partkey"))
      .orderBy("join_pair")
  }

  /** Percent-of-parent hierarchical revenue report: each nation's share
    * of its region's revenue and each region's share of the global
    * total, in ppm — the classic drill-down readout every OLAP layer
    * renders. Revenue quantizes to exact integer cents BEFORE any share
    * arithmetic (one fact-side aggregate after the broadcast dimension
    * chain); both window levels then run over the ≤&#124;nations&#124;-row
    * rollup — metadata, never fact rows.
    */
  def shareOfParent(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(expr(
        "cast(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) as bigint)"))
        .as("cents"))
    rev
      .withColumn("region_cents",
        sum("cents").over(Window.partitionBy("r_name")))
      .withColumn("total_cents", sum("cents").over(Window.partitionBy()))
      .select(col("r_name"), col("n_name"), col("cents").as("nation_cents"),
        expr("(1000000 * cents) div region_cents").as("share_of_region_ppm"),
        expr("(1000000 * region_cents) div total_cents")
          .as("region_share_ppm"))
      .orderBy("r_name", "n_name")
  }

  val ShareOfParentOracleSql: String =
    """WITH rev AS (
      | SELECT r.r_name, n.n_name,
      |  sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5)
      |   AS BIGINT)) AS cents
      | FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      | GROUP BY 1, 2)
      |SELECT r_name, n_name, CAST(cents AS BIGINT) AS nation_cents,
      | CAST((1000000 * cents) // sum(cents) OVER (PARTITION BY r_name)
      |  AS BIGINT) AS share_of_region_ppm,
      | CAST((1000000 * sum(cents) OVER (PARTITION BY r_name))
      |  // sum(cents) OVER () AS BIGINT) AS region_share_ppm
      |FROM rev ORDER BY r_name, n_name""".stripMargin

  val JoinCardinalityOracleSql: String = {
    def one(pair: String, lt: String, lk: String, rt: String, rk: String) =
      s"""SELECT '$pair' AS join_pair, rows_l, rows_r, ndv_l, ndv_r,
         | (rows_l * rows_r) // greatest(ndv_l, ndv_r) AS est_rows,
         | actual_rows,
         | (1000000 * abs((rows_l * rows_r) // greatest(ndv_l, ndv_r)
         |  - actual_rows)) // actual_rows AS err_ppm
         |FROM (
         | SELECT
         |  (SELECT count(*) FROM $lt) AS rows_l,
         |  (SELECT count(*) FROM $rt) AS rows_r,
         |  (SELECT count(DISTINCT $lk) FROM $lt) AS ndv_l,
         |  (SELECT count(DISTINCT $rk) FROM $rt) AS ndv_r,
         |  (SELECT coalesce(sum(lc.c * rc.c), 0) FROM
         |    (SELECT $lk AS k, count(*) AS c FROM $lt GROUP BY 1) lc
         |    JOIN (SELECT $rk AS k, count(*) AS c FROM $rt GROUP BY 1) rc
         |    USING (k)) AS actual_rows)""".stripMargin
    Seq(
      one("orders*lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
      one("customer*orders", "customer", "c_custkey", "orders", "o_custkey"),
      one("part*lineitem", "part", "p_partkey", "lineitem", "l_partkey"))
      .map(q => s"SELECT CAST(rows_l AS BIGINT) AS rows_l, CAST(rows_r AS BIGINT) AS rows_r, CAST(ndv_l AS BIGINT) AS ndv_l, CAST(ndv_r AS BIGINT) AS ndv_r, CAST(est_rows AS BIGINT) AS est_rows, CAST(actual_rows AS BIGINT) AS actual_rows, CAST(err_ppm AS BIGINT) AS err_ppm, join_pair FROM ($q)")
      .mkString("", "\nUNION ALL\n", "\nORDER BY join_pair")
  }
}
