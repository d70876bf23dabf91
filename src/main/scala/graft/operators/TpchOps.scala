package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Canonical TPC-H queries over the driver's TPC-H-ish tables — the
  * classic OLAP completeness check beside the repo's purpose-built
  * analytics: Q1 (pricing summary), Q5 (local-supplier volume), Q6
  * (forecast revenue change). Q3's shape is already registered as
  * `star_ship_priority` (StarOps). Predicates are the canon's, placed
  * inside this corpus's 1995–2001 date span; where TPC-H sorts by an
  * aggregate, the gate sorts by the group key instead (revenue ties
  * would make the canonical order non-unique under hashing).
  *
  * Scale shapes are the classic ones: Q1 is one scan + one
  * map-side-combined aggregate over the 6-cell (flag, status) domain
  * with the shipdate filter pushed to the parquet footer; Q5 is a star
  * join whose dimension legs (customer, supplier, nation, region)
  * broadcast and whose only big exchange is lineitem→orders; Q6 is a
  * scan-only filter-aggregate, the purest predicate-pushdown probe.
  * Money math follows the repo's decimal contract: DECIMAL(25,10)
  * accumulation (exact, partition-order-proof), one double round at
  * the very end.
  */
object TpchOps {

  // The parquet dates are TIMESTAMP_NTZ in Spark 4 (see StarOps): NTZ
  // literals keep column-side comparisons cast-free so they push down.
  private def ntz(d: String) = lit(d).cast("timestamp_ntz")

  private val dec = "DECIMAL(25,10)"

  /** Q1: pricing summary report — per (returnflag, linestatus) the sums
    * of quantity / base / discounted / charged price, means, and the
    * line count, over everything shipped by 1998-09-02. Money rides the
    * CENTS grid (prices/discounts/taxes are 2dp; `floor(x·100 + 0.5)` is
    * the engine-portable quantization), so the discounted sum is exact
    * e4 dollars and the charge sum exact e6 — the triple DECIMAL(25,10)
    * product the canon implies overflowed DuckDB's HUGEINT accumulator
    * at sf0.01 (38-digit ceiling), while the integer grid sums stay
    * ~2.4e18 at sf1 inside DECIMAL(38,0)/HUGEINT with headroom. Means
    * are truncating integer divisions on the same grids.
    */
  def q1(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= ntz("1998-09-02"))
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("cast(floor(l_quantity + 0.5) as long)").as("qty"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as long)").as("pc"),
        expr("cast(floor(l_discount * 100 + 0.5) as long)").as("dc"),
        expr("cast(floor(l_tax * 100 + 0.5) as long)").as("tc"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("qty").as("sum_qty"),
        sum(col("pc").cast("decimal(38,0)")).as("sum_base_cents"),
        sum(expr("cast(pc as decimal(38,0)) * (100 - dc)")).as("sum_disc_e4"),
        sum(expr("cast(pc as decimal(38,0)) * (100 - dc) * (100 + tc)"))
          .as("sum_charge_e6"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"),
        col("sum_base_cents").cast("long").as("sum_base_cents"),
        col("sum_disc_e4").cast("long").as("sum_disc_e4"),
        col("sum_charge_e6").cast("long").as("sum_charge_e6"),
        expr("(1000 * sum_qty) div count_order").as("avg_qty_milli"),
        expr("cast(sum_base_cents div count_order as long)").as("avg_price_cents"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val Q1OracleSql: String =
    """WITH l AS (
      | SELECT l_returnflag, l_linestatus,
      |  CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
      |  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
      |  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
      |  CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tc
      | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
      |SELECT l_returnflag, l_linestatus,
      | CAST(sum(qty) AS BIGINT) AS sum_qty,
      | CAST(sum(pc) AS BIGINT) AS sum_base_cents,
      | CAST(sum(pc * (100 - dc)) AS BIGINT) AS sum_disc_e4,
      | CAST(sum(pc * (100 - dc) * (100 + tc)) AS BIGINT) AS sum_charge_e6,
      | CAST((1000 * sum(qty)) // count(*) AS BIGINT) AS avg_qty_milli,
      | CAST(sum(pc) // count(*) AS BIGINT) AS avg_price_cents,
      | count(*) AS count_order
      |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q5: local-supplier volume — revenue per nation where the customer
    * and the line's supplier share that nation, region ASIA, orders
    * placed in 1996.
    */
  def q5(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(s, dir)
      .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ntz("1996-01-01") &&
            col("o_orderdate") < ntz("1997-01-01"))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(expr(s"""round(cast(sum(cast(l_extendedprice as $dec)
          * (cast(1 as $dec) - cast(l_discount as $dec))) as double), 2)""")
        .as("revenue"))
      .orderBy("n_name")
  }

  val Q5OracleSql: String =
    """SELECT n_name,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,10))
      |   * (CAST(1 AS DECIMAL(25,10)) - CAST(l_discount AS DECIMAL(25,10)))) AS DOUBLE), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      | AND r_name = 'ASIA'
      | AND o_orderdate >= TIMESTAMP '1996-01-01'
      | AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Q6: forecast revenue change — one scan-only filter-aggregate. */
  def q6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ntz("1996-01-01") &&
        col("l_shipdate") < ntz("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        count(lit(1)).as("lines"),
        expr(s"""round(cast(sum(cast(l_extendedprice as $dec)
            * cast(l_discount as $dec)) as double), 2)""").as("revenue"))

  val Q6OracleSql: String =
    """SELECT count(*) AS lines,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,10))
      |   * CAST(l_discount AS DECIMAL(25,10))) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      | AND l_shipdate < TIMESTAMP '1997-01-01'
      | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Q18: large-volume customers — orders whose total quantity exceeds
    * 300 (the canon's threshold; quantities ride the integer grid), top
    * 100 by quantity, with customer and order detail. The classic
    * group-HAVING-semi-join shape, planned the cheap way: the per-order
    * quantity rollup (ONE map-side-combined shuffle on l_orderkey) IS
    * both the HAVING filter and the output aggregate — the canon's
    * second lineitem read is redundant and skipped — and the surviving
    * order set (~0.1% of orders at any SF) broadcasts into orders, whose
    * result then broadcasts into customer: zero large exchanges past the
    * rollup. Rank ties break on o_orderkey so the top-100 carve is
    * deterministic; money exported as exact cents.
    */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        expr("cast(floor(l_quantity + 0.5) as long)").as("qty"))
      .groupBy("l_orderkey")
      .agg(sum("qty").as("sum_qty"))
      .filter(col("sum_qty") > 300L)
    val picked = Tables.orders(s, dir)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(100)
    picked
      .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as long)")
          .as("o_total_cents"),
        col("sum_qty"))
      .orderBy("o_orderkey")
  }

  val Q18OracleSql: String =
    """WITH q AS (
      | SELECT l_orderkey, CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
      | FROM lineitem GROUP BY 1 HAVING sum_qty > 300),
      |t AS (
      | SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, sum_qty
      | FROM orders JOIN q ON o_orderkey = l_orderkey
      | ORDER BY sum_qty DESC, o_orderkey LIMIT 100)
      |SELECT c_custkey, c_name, o_orderkey,
      | epoch_us(o_orderdate) AS o_date_us,
      | CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_total_cents,
      | sum_qty
      |FROM t JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** Q2-shaped correlated minimum: for every STANDARD-type part, the
    * EUROPE-based supplier(s) whose cheapest observed line price for
    * that part is the part's regional minimum — partsupp doesn't exist
    * in this corpus, so the "supply cost" is the minimum line price in
    * exact cents (the same correlated-min-over-a-dimension-subtree plan
    * as the canon). Shape: the part subtree (type filter pushed to the
    * footer) and the supplier⋈nation⋈region subtree both BROADCAST into
    * lineitem; one shuffle groups (part, supplier) offers; the
    * correlated min re-reads nothing — a per-part window min replaces
    * the canon's correlated subquery. All ties at the minimum are kept
    * (the canon's semantics) and the sort is unique on
    * (p_partkey, s_suppkey).
    */
  def q2(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_brand"))
    val euroSupp = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as long)").as("cents"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
      .agg(min("cents").as("cost_cents"))
    offers
      .withColumn("min_cents",
        min("cost_cents").over(
          org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")))
      .filter(col("cost_cents") === col("min_cents"))
      .select(
        col("p_partkey"), col("p_brand"), col("s_suppkey"), col("s_name"),
        expr("cast(floor(s_acctbal * 100 + 0.5) as long)").as("s_acctbal_cents"),
        col("n_name"), col("cost_cents"))
      .orderBy("p_partkey", "s_suppkey")
  }

  val Q2OracleSql: String =
    """WITH es AS (
      | SELECT s_suppkey, s_name, s_acctbal, n_name
      | FROM supplier, nation, region
      | WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'),
      |o AS (
      | SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
      |  min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cost_cents
      | FROM lineitem
      | JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
      | JOIN es ON l_suppkey = s_suppkey
      | GROUP BY 1, 2, 3, 4, 5, 6)
      |SELECT p_partkey, p_brand, s_suppkey, s_name,
      | CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_cents,
      | n_name, cost_cents
      |FROM o
      |WHERE cost_cents = (
      | SELECT min(cost_cents) FROM o o2 WHERE o2.p_partkey = o.p_partkey)
      |ORDER BY p_partkey, s_suppkey""".stripMargin
}
