package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Explicit skew mitigation: two-phase salted aggregation.
  *
  * A power-law key (one user producing a large share of events) turns a
  * plain `groupBy(key)` into a single hot reducer. The salted form first
  * aggregates on `(key, salt)` — spreading a hot key over `salts`
  * reducers — then merges the partials per key. Both phases are hash
  * aggregates with map-side partial combine; the result is bit-identical
  * to the unsalted aggregate because the merged measures (counts and
  * decimal sums) are associative and order-independent.
  *
  * AQE's skew-join splitting handles skewed JOINS automatically, but
  * skewed AGGREGATIONS still need this shape when a single key's
  * partial-aggregate state is itself too hot — the registered query
  * proves the equivalence against the plain-SQL oracle.
  */
object SkewOps {

  /** Per-user event count + exact value sum via salted two-phase
    * aggregation; salt = event_id mod `salts` (any uniform row-level
    * value works — the salt only has to spread rows, not be random).
    */
  def saltedUserStats(s: SparkSession, dir: String, salts: Int = 16): DataFrame =
    Tables.events(s, dir)
      .select(
        col("user_id"),
        pmod(col("event_id"), lit(salts)).as("salt"),
        col("value"))
      .groupBy("user_id", "salt")
      .agg(
        count(lit(1)).as("partial_cnt"),
        sum(col("value").cast("decimal(25,10)")).as("partial_sum"))
      .groupBy("user_id")
      .agg(
        sum("partial_cnt").cast("long").as("events"),
        round(sum("partial_sum").cast("double"), 4).as("value_sum"))
      .orderBy("user_id")

  /** Salted shuffle JOIN: the manual fix for a hot probe key when the dim
    * side is too large to broadcast and AQE's skew splitting isn't
    * available (e.g. the join feeds a co-partitioned downstream op).
    * The dim side is replicated `salts`× (explode over the salt range);
    * each probe row routes to one replica by a uniform row-level salt, so
    * a hot key's probe rows spread over `salts` reducers instead of one.
    * Replication multiplies the dim shuffle by `salts` — the knob trades
    * dim duplication for hot-reducer fan-in, exactly like salted
    * aggregation trades a second exchange. Inner-join semantics are
    * unchanged (every probe row still meets every matching dim row
    * exactly once), which the plain-join oracle proves.
    */
  def saltedJoin(
      probe: DataFrame,
      dim: DataFrame,
      key: String,
      probeSalt: Column,
      salts: Int = 8): DataFrame = {
    require(!probe.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val saltedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    // A NULL salt would never equal any dim replica's salt and would
    // silently DROP a probe row whose key does match — breaking the
    // "inner-join semantics unchanged" contract. Any fixed fallback
    // bucket preserves semantics (the salt only spreads rows).
    probe.withColumn(
      "__salt", coalesce(pmod(probeSalt.cast("long"), lit(salts.toLong)), lit(0L)))
      .join(saltedDim.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Registered query: events joined to customer over the salted shape,
    * aggregated per market segment. The oracle is the PLAIN join+agg —
    * the salt must be semantically invisible, like salted aggregation.
    */
  def saltedJoinSegments(s: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id").as("c_custkey"), col("event_id"), col("value"))
    val cust = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
    saltedJoin(ev, cust, "c_custkey", col("event_id"), salts)
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("events"),
        round(sum(col("value").cast("decimal(25,10)")).cast("double"), 4)
          .as("value_sum"))
      .orderBy("c_mktsegment")
  }

  val SaltedJoinOracleSql: String =
    """SELECT c_mktsegment, count(*) AS events,
      | round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE), 4) AS value_sum
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Key-skew profile — the PRE-FLIGHT diagnostic for choosing a
    * mitigation (salting, AQE thresholds, broadcast): the top-k heaviest
    * join keys with their row share, plus how many times heavier each is
    * than the mean key. A pipeline reads this before deciding whether
    * [[saltedJoin]]/[[saltedUserStats]] are needed at all.
    *
    * Scale shape: one partial-aggregated groupBy (shuffle bounded by
    * distinct keys), a one-row global stats frame broadcast back, and a
    * TakeOrdered for the top-k — no global sort.
    */
  def skewProfile(
      s: SparkSession,
      dir: String,
      k: Int = 10): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("rows"))
    val tot = counts.agg(
      sum("rows").cast("long").as("total_rows"),
      count(lit(1)).as("distinct_keys"))
    counts.crossJoin(broadcast(tot))
      .select(
        col("user_id"), col("rows"),
        expr("(1000 * rows) div total_rows").as("share_permille"),
        expr("(1000 * rows * distinct_keys) div total_rows")
          .as("vs_mean_permille"))
      .orderBy(desc("rows"), col("user_id"))
      .limit(k)
  }

  def skewProfileOracleSql(k: Int = 10): String =
    s"""WITH c AS (SELECT user_id, count(*) AS rows FROM events GROUP BY 1),
       |t AS (
       | SELECT CAST(sum(rows) AS BIGINT) AS total_rows, count(*) AS distinct_keys
       | FROM c)
       |SELECT user_id, rows,
       | (1000 * rows) // total_rows AS share_permille,
       | (1000 * rows * distinct_keys) // total_rows AS vs_mean_permille
       |FROM c CROSS JOIN t ORDER BY rows DESC, user_id LIMIT $k""".stripMargin

  /** Gini coefficient of the per-user row-count distribution — the
    * single-number skew summary next to [[skewProfile]]'s top-k view
    * (0 = perfectly even keys, →1 = all rows on one key; the number a
    * partitioner reads before choosing a salting factor). Exact rank
    * formula `G = Σ(2i−n−1)·x_i / (n·Σx)` over ascending counts, with
    * the global rank from [[RankOps.withHierarchicalRank]] (value-bucket
    * carry window, no single-task sort) and DECIMAL(38,0) sums so the
    * rank-weighted terms never overflow at billion-key scale; only the
    * final ratio quantizes (ppm, floor).
    */
  def keyGini(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("rows"))
    RankOps.withHierarchicalRank(counts, Seq(), "rows", "user_id",
        "rows div 4", "rk")
      .select(col("rows").cast("decimal(38,0)").as("x"),
        col("rk").cast("decimal(38,0)").as("i"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("x").as("sx"),
        sum(expr("(2 * i - 1) * x")).as("swx"))
      .select(
        col("n").cast("long").as("distinct_keys"),
        col("sx").cast("long").as("total_rows"),
        // Σ(2i−n−1)x = Σ(2i−1)x − n·Σx
        expr("cast((1000000 * (swx - n * sx)) div (n * sx) as long)")
          .as("gini_ppm"))
  }

  val KeyGiniOracleSql: String =
    """WITH c AS (SELECT user_id, count(*) AS rows FROM events GROUP BY 1),
      |r AS (
      | SELECT CAST(rows AS HUGEINT) AS x,
      |  CAST(row_number() OVER (ORDER BY rows, user_id) AS HUGEINT) AS i
      | FROM c),
      |g AS (
      | SELECT count(*)::HUGEINT AS n, sum(x) AS sx,
      |  sum((2 * i - 1) * x) AS swx
      | FROM r)
      |SELECT CAST(n AS BIGINT) AS distinct_keys,
      | CAST(sx AS BIGINT) AS total_rows,
      | CAST((1000000 * (swx - n * sx)) // (n * sx) AS BIGINT) AS gini_ppm
      |FROM g""".stripMargin
}
