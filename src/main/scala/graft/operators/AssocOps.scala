package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Association mining and record linkage — the two classic "pairs within
  * a bounded scope" operators, both shaped so the pair space is generated
  * from small per-group fan-outs (basket items, blocking keys), never an
  * all-pairs cross join.
  */
object AssocOps {

  /** Market-basket association rules over order baskets: for every
    * co-purchased part pair, support, confidence and lift in milli
    * fixed-point, both rule directions, top `k` by support.
    *
    * Scale shape: the pair generator is a self-join of the DISTINCT
    * (order, part) item table on the order key — fan-out is bounded by
    * basket size squared (TPC-H ≈ 4 items/order ⇒ ≤ ~6 unordered pairs),
    * so pair volume is O(orders), not O(parts²). Supports and pair
    * counts are map-side-combined aggregates; the two support joins
    * shuffle on part keys only. Lift is computed STAGED —
    * `((1000·suppAB) div suppA · N) div suppB` — so no intermediate
    * exceeds ~10³·N and the arithmetic stays inside BIGINT at any corpus
    * size (the naive `1000·N·suppAB` monomial overflows once orders pass
    * ~10⁸); the oracle stages identically, and the staged confidence is
    * exactly the milli confidence it reports.
    */
  def basketRules(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val supp = items.groupBy(col("p")).agg(count(lit(1)).as("supp"))
    val nOrders = items.select("o").distinct().count()

    val pairs = items.as("x").join(items.as("y"), Seq("o"))
      .filter(col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("supp_pair"))

    // Both rule directions from the unordered pair counts.
    val rules = pairs.select(col("a"), col("b"), col("supp_pair"))
      .union(pairs.select(col("b").as("a"), col("a").as("b"), col("supp_pair")))
      .join(supp.withColumnRenamed("p", "a").withColumnRenamed("supp", "supp_a"), "a")
      .join(supp.withColumnRenamed("p", "b").withColumnRenamed("supp", "supp_b"), "b")
      .withColumn("conf_milli", expr("(1000 * supp_pair) div supp_a"))
      .withColumn("lift_milli", expr(s"(conf_milli * $nOrders) div supp_b"))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("supp_pair"), col("conf_milli"), col("lift_milli"))
    rules
      .orderBy(desc("supp_pair"), desc("conf_milli"),
        col("antecedent"), col("consequent"))
      .limit(k)
  }

  def basketRulesOracleSql(k: Int = 100): String =
    s"""WITH items AS (
       | SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |supp AS (SELECT p, count(*) AS supp FROM items GROUP BY p),
       |n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
       |pairs AS (
       | SELECT x.p AS a, y.p AS b, count(*) AS supp_pair
       | FROM items x JOIN items y ON x.o = y.o AND x.p < y.p
       | GROUP BY x.p, y.p),
       |dirs AS (
       | SELECT a, b, supp_pair FROM pairs
       | UNION ALL
       | SELECT b AS a, a AS b, supp_pair FROM pairs),
       |r AS (
       | SELECT dirs.a AS antecedent, dirs.b AS consequent, supp_pair,
       |  (1000 * supp_pair) // sa.supp AS conf_milli,
       |  (((1000 * supp_pair) // sa.supp) * n.n_orders) // sb.supp AS lift_milli
       | FROM dirs
       |  JOIN supp sa ON sa.p = dirs.a
       |  JOIN supp sb ON sb.p = dirs.b, n)
       |SELECT antecedent, consequent, CAST(supp_pair AS BIGINT) AS supp_pair,
       | CAST(conf_milli AS BIGINT) AS conf_milli,
       | CAST(lift_milli AS BIGINT) AS lift_milli
       |FROM r
       |ORDER BY supp_pair DESC, conf_milli DESC, antecedent, consequent
       |LIMIT $k""".stripMargin

  /** Blocked fuzzy record linkage over part names: candidate pairs form
    * ONLY within a (p_type, p_size) block, each verified by Levenshtein
    * edit distance; per-block audit of candidate volume, match count
    * (dist ≤ `maxDist`) and distance distribution.
    *
    * This is the standard blocking+verify shape of entity resolution at
    * scale: the quadratic step is confined to blocks (pair volume
    * Σ|block|², tunable by key choice — add a secondary key or salt if a
    * block outgrows an executor), the verifier is a codegen'd built-in,
    * and nothing ever compares across blocks. Both engines implement
    * textbook unit-cost edit distance, so `dist` is engine-portable.
    */
  def fuzzyLinkParts(s: SparkSession, dir: String, maxDist: Int = 4): DataFrame = {
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
    p.as("l").join(p.as("r"), Seq("p_type", "p_size"))
      .filter(col("l.p_partkey") < col("r.p_partkey"))
      .select(col("p_type"), col("p_size"),
        levenshtein(col("l.p_name"), col("r.p_name")).as("dist"))
      .groupBy("p_type", "p_size")
      .agg(
        count(lit(1)).as("cand_pairs"),
        sum(when(col("dist") <= maxDist, 1L).otherwise(0L)).as("matches"),
        min("dist").cast("long").as("min_dist"),
        expr("(1000 * sum(dist)) div count(*)").as("avg_dist_milli"))
      .orderBy("p_type", "p_size")
  }

  def fuzzyLinkOracleSql(maxDist: Int = 4): String =
    s"""SELECT l.p_type, l.p_size, count(*) AS cand_pairs,
       | CAST(sum(CASE WHEN levenshtein(l.p_name, r.p_name) <= $maxDist
       |  THEN 1 ELSE 0 END) AS BIGINT) AS matches,
       | CAST(min(levenshtein(l.p_name, r.p_name)) AS BIGINT) AS min_dist,
       | CAST((1000 * sum(levenshtein(l.p_name, r.p_name))) // count(*)
       |  AS BIGINT) AS avg_dist_milli
       |FROM part l JOIN part r
       | ON l.p_type = r.p_type AND l.p_size = r.p_size
       |  AND l.p_partkey < r.p_partkey
       |GROUP BY l.p_type, l.p_size
       |ORDER BY l.p_type, l.p_size""".stripMargin
}
