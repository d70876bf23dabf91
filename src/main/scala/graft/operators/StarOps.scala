package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Full star-schema analytics over the previously-unused `part` and
  * `supplier` dimensions (reference: analysis/etl_spark.py:52 "complex
  * joins" — the reference joins only its Reddit frames; these close the
  * TPC-H-shaped half of the star the synthetic schema carries).
  *
  * Scale notes: `nation` (25 rows, fixed) and `supplier` (O(sf), always
  * ≪ fact) get explicit `broadcast` hints — their size is bounded by the
  * schema, not the data. `part` is LEFT TO CATALYST: at bench SF it
  * auto-broadcasts under the 10 MB threshold; at 100 TB it exceeds the
  * threshold and AQE picks a shuffle join on `l_partkey`, which is the
  * right plan there — hard-coding `broadcast(part)` would OOM executors
  * at scale. Money math is decimal end-to-end; ordering keys are exact
  * integers (milli fixed-point / epoch-day), never raw doubles.
  */
object StarOps {

  private def revExpr =
    (col("l_extendedprice").cast("decimal(25,10)") *
      (lit(1).cast("decimal(25,10)") - col("l_discount").cast("decimal(25,10)")))

  /** Brand × supplier-nation margin: lineitem against BOTH star arms at
    * once — `part` for the brand + retail cost, `supplier→nation` for
    * the selling nation. Margin = discounted revenue − retail cost of
    * the quantity moved. Output is |nation|×|brand| rows (hundreds at
    * any scale factor — key-cardinality-bounded, not row-bounded).
    */
  def brandNationMargin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        revExpr.as("rev"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"),
        col("p_retailprice")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("cost", col("p_retailprice").cast("decimal(25,10)") *
        col("l_quantity").cast("decimal(25,10)"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(
        count(lit(1)).as("line_items"),
        // Milli fixed-point, never round-on-double: the 4dp decimal sums
        // land on exact half-ties (x.xx50) often enough that casting to
        // double and rounding diverges between engines (seen live at
        // sf0.01). floor on the exact decimal is pure integer math.
        floor(sum(col("rev")) * 1000).cast("long").as("revenue_milli"),
        floor(sum(col("cost")) * 1000).cast("long").as("retail_cost_milli"),
        floor((sum(col("rev")) - sum(col("cost"))) * 1000).cast("long")
          .as("margin_milli"))
      .orderBy("n_name", "p_brand")

  val BrandNationMarginOracleSql: String =
    """SELECT n_name, p_brand, count(*) AS line_items,
      | CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(25,10)) * (CAST(1 AS DECIMAL(25,10)) - CAST(l_discount AS DECIMAL(25,10)))) * 1000) AS BIGINT) AS revenue_milli,
      | CAST(floor(sum(CAST(p_retailprice AS DECIMAL(25,10)) * CAST(l_quantity AS DECIMAL(25,10))) * 1000) AS BIGINT) AS retail_cost_milli,
      | CAST(floor((sum(CAST(l_extendedprice AS DECIMAL(25,10)) * (CAST(1 AS DECIMAL(25,10)) - CAST(l_discount AS DECIMAL(25,10)))) - sum(CAST(p_retailprice AS DECIMAL(25,10)) * CAST(l_quantity AS DECIMAL(25,10)))) * 1000) AS BIGINT) AS margin_milli
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name, p_brand ORDER BY n_name, p_brand""".stripMargin

  /** TPC-H Q3-shaped shipping priority: segment-filtered customers,
    * orders placed before a cutoff, lines shipped after it; top 10
    * open orders by outstanding revenue. Both date predicates reach the
    * parquet scans as pushed filters; the ordering key is the EXACT
    * milli fixed-point revenue (BIGINT) with the order key as
    * tie-break, so the top-10 cut is bit-deterministic — never a
    * rounded-double sort.
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    // The parquet dates are TIMESTAMP_NTZ in Spark 4; an NTZ literal keeps
    // the comparison cast-free on the COLUMN side so it pushes to the scan.
    val cutoff = lit("1998-01-01").cast("timestamp_ntz")
    Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .join(Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"), revExpr.as("rev")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"),
        // NTZ→LTZ cast under the UTC session tz is the identity on the
        // wall clock, matching DuckDB's epoch_us on the same NTZ value.
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("order_epoch_day"),
        col("o_orderpriority"))
      .agg(floor(sum(col("rev")) * 1000).cast("long").as("revenue_milli"))
      .orderBy(col("revenue_milli").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue_milli"), col("order_epoch_day"),
        col("o_orderpriority"))
  }

  val ShippingPriorityOracleSql: String =
    """SELECT l_orderkey,
      | CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(25,10)) * (CAST(1 AS DECIMAL(25,10)) - CAST(l_discount AS DECIMAL(25,10)))) * 1000) AS BIGINT) AS revenue_milli,
      | epoch_us(o_orderdate) // 86400000000 AS order_epoch_day,
      | o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, order_epoch_day, o_orderpriority
      |ORDER BY revenue_milli DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q14-shaped promo revenue share per ship month: what fraction
    * of each month's discounted revenue came from PROMO-type parts.
    * The share is integer basis points — milli-revenue of the promo
    * slice `div` milli-revenue of the whole month — so no raw double
    * division reaches the output. One fact scan; `part` contributes two
    * columns through the join. Overflow headroom: the bp numerator is
    * monthly-milli-revenue × 10⁴, which stays inside BIGINT until a
    * single month clears ~9×10¹⁴ currency units — not a 100 TB concern
    * because the month grouping bounds the summand.
    */
  def promoShare(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_shipdate"), revExpr.as("rev"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("ship_ym"))
      .agg(
        count(lit(1)).as("line_items"),
        floor(sum(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(lit(0).cast("decimal(25,10)"))) * 1000)
          .cast("long").as("promo_rev_milli"),
        floor(sum(col("rev")) * 1000).cast("long").as("total_rev_milli"))
      .select(col("ship_ym"), col("line_items"),
        col("promo_rev_milli"), col("total_rev_milli"),
        expr("(promo_rev_milli * 10000) div total_rev_milli")
          .as("promo_share_bp"))
      .orderBy("ship_ym")

  val PromoShareOracleSql: String =
    """WITH m AS (
      | SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ship_ym,
      |  count(*) AS line_items,
      |  CAST(floor(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(25,10)) * (CAST(1 AS DECIMAL(25,10)) - CAST(l_discount AS DECIMAL(25,10))) ELSE CAST(0 AS DECIMAL(25,10)) END) * 1000) AS BIGINT) AS promo_rev_milli,
      |  CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(25,10)) * (CAST(1 AS DECIMAL(25,10)) - CAST(l_discount AS DECIMAL(25,10)))) * 1000) AS BIGINT) AS total_rev_milli
      | FROM lineitem JOIN part ON l_partkey = p_partkey
      | GROUP BY ship_ym)
      |SELECT ship_ym, line_items, promo_rev_milli, total_rev_milli,
      | (promo_rev_milli * 10000) // total_rev_milli AS promo_share_bp
      |FROM m ORDER BY ship_ym""".stripMargin

  private val WeekUs = 604800000000L

  /** Week-over-week revenue growth — the trend line a finance dashboard
    * leads with: orders collapse to exact integer cents per epoch week
    * (dense spine, gap weeks are zero-revenue rows, not holes), and the
    * growth ratio is one integer division in ppm against the previous
    * week. The lag window walks the metadata-sized week grid only.
    */
  def weeklyRevenueGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir).select(
      expr(s"unix_micros(cast(o_orderdate as timestamp)) div $WeekUs")
        .as("week"),
      expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
    val weekly = o.groupBy("week").agg(sum("cents").as("revenue_cents"))
    val spine = weekly.agg(min("week").as("mn"), max("week").as("mx"))
      .select(explode(expr("sequence(mn, mx)")).as("week"))
    spine.join(weekly, Seq("week"), "left")
      .select(col("week"),
        coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"))
      .withColumn("prev_cents", lag("revenue_cents", 1).over(
        Window.orderBy("week")))
      .withColumn("growth_ppm",
        expr("""CASE WHEN prev_cents > 0
               | THEN ((revenue_cents - prev_cents) * 1000000) div prev_cents
               |END""".stripMargin))
      .orderBy("week")
  }

  val WeeklyRevenueGrowthOracleSql: String =
    s"""WITH o AS (
       | SELECT epoch_us(o_orderdate) // $WeekUs AS week,
       |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
       | FROM orders),
       |w AS (SELECT week, sum(cents) AS revenue_cents FROM o GROUP BY week),
       |spine AS (
       | SELECT unnest(generate_series(mn, mx)) AS week
       | FROM (SELECT min(week) AS mn, max(week) AS mx FROM w)),
       |x AS (
       | SELECT s.week, coalesce(w.revenue_cents, 0) AS revenue_cents
       | FROM spine s LEFT JOIN w USING (week)),
       |g AS (
       | SELECT week, revenue_cents,
       |  lag(revenue_cents) OVER (ORDER BY week) AS prev_cents
       | FROM x)
       |SELECT CAST(week AS BIGINT) AS week,
       | CAST(revenue_cents AS BIGINT) AS revenue_cents,
       | CAST(prev_cents AS BIGINT) AS prev_cents,
       | CAST(CASE WHEN prev_cents > 0
       |  THEN ((revenue_cents - prev_cents) * 1000000) // prev_cents
       |  END AS BIGINT) AS growth_ppm
       |FROM g ORDER BY week""".stripMargin
}
