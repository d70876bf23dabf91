package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function operators over the `events` stream table
  * (reference: analysis/etl_spark.py:52 claims "Complex joins and window
  * functions" in its pipeline op list; the rebuild makes them concrete).
  *
  * Scale notes: both windows partition by `user_id`, so the single shuffle
  * is an exchange on the natural key; all per-user work then happens inside
  * one partition with no further shuffles. Timestamps are compared in
  * integral microseconds (`unix_micros`) so batch, streaming and the DuckDB
  * oracle agree bit-for-bit (no float time arithmetic).
  */
object WindowOps {

  private val byUserTime = Window.partitionBy("user_id").orderBy("ts_us", "event_id")

  /** Calendar-time aggregation (reference: analysis/etl_spark.py:51
    * "Time-based data aggregations"): daily event volume and value
    * stats. Days are integral epoch-day numbers (`ts_us div 86.4e9`) so
    * the bucketing is bit-identical in any engine and timezone-free.
    */
  def dailyStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("epoch_day", expr("ts_us div 86400000000"))
      .groupBy("epoch_day")
      .agg(
        count(lit(1)).as("events"),
        countDistinct(col("user_id")).as("active_users"),
        round(sum(col("value").cast("decimal(25,10)")).cast("double") / count(col("value")), 4)
          .as("avg_value"))
      .orderBy("epoch_day")

  /** Zero-filled daily time series per event type — the gap-fill / spine
    * join every dashboard and forecasting feed needs: a day with no
    * events of a type must emit an explicit 0 row, not be silently
    * absent (downstream rate math and charting both break on gaps).
    *
    * Shape: the dense (day × type) spine is generated from two scalar
    * aggregates (`sequence(min_day, max_day)` exploded, cross-joined
    * with the distinct type set) — both sides are bounded (days by
    * calendar span, types by the enum), so the cross join is a
    * broadcast of metadata-sized frames no matter the corpus size. The
    * fact aggregation shuffles once on the bounded (day, type) key
    * space; the spine join is a broadcast left join onto it. Value sums
    * run in decimal then round on the exact result (the [[dailyStats]]
    * discipline), so gap rows are exactly 0.0 in both engines.
    */
  def gapfillDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(expr("ts_us div 86400000000").as("epoch_day"),
        col("event_type"), col("value"))
    val spine = ev.agg(min("epoch_day").as("d0"), max("epoch_day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("epoch_day"))
    val grid = spine.crossJoin(ev.select("event_type").distinct())
    val counts = ev.groupBy("epoch_day", "event_type")
      .agg(
        count(lit(1)).as("events"),
        round(sum(col("value").cast("decimal(25,10)")).cast("double"), 3)
          .as("value_sum"))
    // Broadcast the BUILD (right) side: hinting the stream side of a left
    // outer join is unsupported and silently degrades to a shuffle. Both
    // frames are bounded (days × types), so either could broadcast; the
    // aggregated counts frame is the legal one.
    grid.join(broadcast(counts), Seq("epoch_day", "event_type"), "left")
      .select(
        col("epoch_day"), col("event_type"),
        coalesce(col("events"), lit(0L)).as("events"),
        coalesce(col("value_sum"), lit(0.0)).as("value_sum"))
      .orderBy("epoch_day", "event_type")
  }

  /** Forward-fill (last observation carried forward) over the gap-filled
    * daily grid: gap days inherit the most recent observed day's average
    * value instead of an empty cell — the standard imputation for
    * metrics/forecasting feeds where "no events" means "unchanged", not
    * "zero". Built as `last(..., ignoreNulls)` over an UNBOUNDED
    * PRECEDING row frame per event type — one pass, no self-join chain.
    * The window partitions by event type over the METADATA-SIZED spine
    * (days × types), so the single-partition-per-type frame is bounded
    * by calendar span, never corpus size. Days before the first
    * observation have nothing to carry and report -1 (an explicit
    * sentinel both engines render identically; NULL would be fill-order
    * ambiguous in the driver's stringified compare). The carried value
    * is the day average in 1e-4 fixed point via `floor(x·10⁴ + 0.5)` —
    * `round()` on the raw double division hit a half-tie the engines
    * resolved differently (measured at sf0.001, day 19740 signup),
    * exactly the boundary the floor form is bit-stable across.
    */
  def gapfillForwardFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(expr("ts_us div 86400000000").as("epoch_day"),
        col("event_type"), col("value"))
    val spine = ev.agg(min("epoch_day").as("d0"), max("epoch_day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("epoch_day"))
    val grid = spine.crossJoin(ev.select("event_type").distinct())
    val daily = ev.groupBy("epoch_day", "event_type")
      .agg(expr(
        """CAST(floor(
          | CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / count(1)
          |  * 10000 + 0.5) AS BIGINT)""".stripMargin)
        .as("avg_e4"))
    val locf = Window.partitionBy("event_type").orderBy("epoch_day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(broadcast(daily), Seq("epoch_day", "event_type"), "left")
      .withColumn("filled_avg_e4",
        coalesce(last(col("avg_e4"), ignoreNulls = true).over(locf), lit(-1L)))
      .select(col("epoch_day"), col("event_type"),
        (col("avg_e4").isNotNull).cast("long").as("observed"),
        col("filled_avg_e4"))
      .orderBy("epoch_day", "event_type")
  }

  def gapfillForwardFillOracleSql: String =
    """WITH b AS (
      | SELECT min(epoch_us(ts) // 86400000000) AS d0,
      |  max(epoch_us(ts) // 86400000000) AS d1 FROM events),
      |spine AS (SELECT unnest(generate_series(d0, d1)) AS epoch_day FROM b),
      |t AS (SELECT DISTINCT event_type FROM events),
      |c AS (
      | SELECT epoch_us(ts) // 86400000000 AS epoch_day, event_type,
      |  CAST(floor(
      |   CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / count(*)
      |    * 10000 + 0.5) AS BIGINT) AS avg_e4
      | FROM events GROUP BY 1, 2),
      |g AS (
      | SELECT s.epoch_day, t.event_type, c.avg_e4
      | FROM spine s CROSS JOIN t
      | LEFT JOIN c ON c.epoch_day = s.epoch_day AND c.event_type = t.event_type)
      |SELECT epoch_day, event_type,
      | CAST(avg_e4 IS NOT NULL AS BIGINT) AS observed,
      | coalesce(last_value(avg_e4 IGNORE NULLS) OVER (
      |  PARTITION BY event_type ORDER BY epoch_day
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS filled_avg_e4
      |FROM g ORDER BY epoch_day, event_type""".stripMargin

  def gapfillDailyOracleSql: String =
    """WITH b AS (
      | SELECT min(epoch_us(ts) // 86400000000) AS d0,
      |  max(epoch_us(ts) // 86400000000) AS d1 FROM events),
      |spine AS (SELECT unnest(generate_series(d0, d1)) AS epoch_day FROM b),
      |t AS (SELECT DISTINCT event_type FROM events),
      |c AS (
      | SELECT epoch_us(ts) // 86400000000 AS epoch_day, event_type,
      |  count(*) AS events,
      |  round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE), 3) AS value_sum
      | FROM events GROUP BY 1, 2)
      |SELECT s.epoch_day, t.event_type,
      | CAST(coalesce(c.events, 0) AS BIGINT) AS events,
      | coalesce(c.value_sum, 0.0) AS value_sum
      |FROM spine s CROSS JOIN t
      |LEFT JOIN c ON c.epoch_day = s.epoch_day AND c.event_type = t.event_type
      |ORDER BY s.epoch_day, t.event_type""".stripMargin

  /** Exact median (and quartile-free percentile machinery) over an
    * integral measure, per group: rank rows, select the middle one or
    * two, average them in integer arithmetic. No float interpolation —
    * `percentile`/`quantile_cont` interpolate in engine-specific ways,
    * but rank selection + `(a+b) div 2` is bit-identical everywhere.
    * One window pass + one aggregate; both shuffle only on the group key.
    */
  def medianDensityByFlag(s: SparkSession, dir: String): DataFrame = {
    val density = Tables.lineitem(s, dir)
      .select(
        col("l_returnflag"),
        floor(col("l_extendedprice") / (col("l_quantity") + lit(1)) * 1000 + 0.5)
          .cast("long").as("density_milli"))
    // Rank-select on the VALUE HISTOGRAM, not the rows: a row-level
    // row_number() window partitioned by a 3-value flag funnels each
    // flag's entire table through one task's sort at 100 TB. Collapsing
    // to per-(flag, value) counts first makes the remaining window's
    // partition size the distinct value domain (bounded by the
    // fixed-point grid), independent of row count; the distributed
    // groupBy does all row-volume work. The k-th smallest is then the
    // first histogram value whose cumulative count reaches k — identical
    // output, including duplicate-median corpora.
    val hist = density
      .groupBy("l_returnflag", "density_milli")
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("density_milli")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("cnt", sum("c").over(Window.partitionBy("l_returnflag")))
    // Lower and upper middle ranks (equal when cnt is odd) in ONE
    // aggregate pass: `min(when(cond, v))` over the cumulative histogram
    // is exactly `filter(cond) → min(v)` — the previous two-branch
    // filter/agg/join shape re-computed the whole histogram+window
    // subtree once per branch (measured ~2× the query).
    cum.groupBy("l_returnflag")
      .agg(
        min(when(expr("cum >= (cnt + 1) div 2"), col("density_milli")))
          .as("v_lo"),
        min(when(expr("cum >= cnt div 2 + 1"), col("density_milli")))
          .as("v_hi"))
      .select(col("l_returnflag"),
        expr("(v_lo + v_hi) div 2").as("median_density_milli"))
      .orderBy("l_returnflag")
  }

  /** Quantile probes in permille for [[quantilesDensityByFlag]]. */
  val QuantilesPermille: Seq[Int] = Seq(250, 500, 750, 950)

  /** Exact multi-quantile per group (p25/p50/p75/p95) — the
    * [[medianDensityByFlag]] histogram rank-select generalized to any
    * probe set IN ONE PASS: all probes share the same per-(group, value)
    * histogram and cumulative window; each probe is the type-1 (inverse
    * empirical CDF) quantile, rank `ceil(p·n)` computed in integer
    * arithmetic — no float interpolation, so both engines agree bitwise.
    * Work after the distributed row-count groupBy is bounded by the
    * distinct value domain × |probes|, independent of row count.
    */
  def quantilesDensityByFlag(s: SparkSession, dir: String): DataFrame = {
    val density = Tables.lineitem(s, dir)
      .select(
        col("l_returnflag"),
        floor(col("l_extendedprice") / (col("l_quantity") + lit(1)) * 1000 + 0.5)
          .cast("long").as("density_milli"))
    val hist = density
      .groupBy("l_returnflag", "density_milli")
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("density_milli")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("cnt", sum("c").over(Window.partitionBy("l_returnflag")))
    // All probes in ONE aggregate pass: per probe p, `min(when(cum >=
    // rank_p, v))` is exactly the explode→filter→pivot chain's value
    // (the type-1 quantile: first histogram value whose cumulative count
    // reaches rank_p), without multiplying the cumulative frame ×|probes|
    // or paying the pivot's two-phase aggregation.
    val probeCols = QuantilesPermille.map(p =>
      min(when(
        col("cum") >= expr(s"greatest(($p * cnt + 999) div 1000, 1)"),
        col("density_milli"))).as(s"p${p}_milli"))
    cum.groupBy("l_returnflag")
      .agg(probeCols.head, probeCols.tail: _*)
      .orderBy("l_returnflag")
  }

  val QuantilesOracleSql: String = {
    val values = QuantilesPermille.map(p => s"($p)").mkString(", ")
    val cols = QuantilesPermille
      .map(p => s"max(CASE WHEN p = $p THEN q END) AS p${p}_milli")
      .mkString(",\n ")
    s"""WITH d AS (
       | SELECT l_returnflag,
       |  CAST(floor(l_extendedprice / (l_quantity + 1) * 1000 + 0.5) AS BIGINT) AS density_milli
       | FROM lineitem),
       |h AS (SELECT l_returnflag, density_milli, count(*) AS c FROM d GROUP BY 1, 2),
       |cm AS (
       | SELECT l_returnflag, density_milli,
       |  sum(c) OVER (PARTITION BY l_returnflag ORDER BY density_milli) AS cum,
       |  sum(c) OVER (PARTITION BY l_returnflag) AS cnt
       | FROM h),
       |q AS (
       | SELECT l_returnflag, p, min(density_milli) AS q
       | FROM cm CROSS JOIN (VALUES $values) pr(p)
       | WHERE cum >= greatest((p * cnt + 999) // 1000, 1)
       | GROUP BY 1, 2)
       |SELECT l_returnflag,
       | $cols
       |FROM q GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** Per-event sequence number, gap to previous event (whole seconds) and
    * running value sum within each user's timeline.
    */
  def windowFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("seq", row_number().over(byUserTime).cast("long"))
      .withColumn("gap_s",
        floor((col("ts_us") - lag(col("ts_us"), 1).over(byUserTime)) / 1000000L))
      .withColumn("cum_value",
        round(sum("value").over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 3))
      .select("event_id", "user_id", "seq", "gap_s", "cum_value")
      .orderBy("event_id")

  /** Trailing one-hour activity per event — a RANGE frame over integral
    * microseconds: for every event, how many events (and how much value)
    * the same user produced in the inclusive [ts-1h, ts] window. RANGE
    * (unlike ROWS) includes ALL rows tied on the order key, so the result
    * is deterministic under any tie order; the value sum runs in decimal,
    * so partition order can't perturb the rounded output. One exchange on
    * `user_id`, then a single sorted pass per partition with an O(1)
    * sliding frame — no self-join fan-out for the time window.
    */
  def trailingHourStats(s: SparkSession, dir: String, windowUs: Long = 3600000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-windowUs, 0)
    Tables.events(s, dir)
      .withColumn("trailing_events", count(lit(1)).over(w))
      .withColumn("trailing_value",
        round(sum(col("value").cast("decimal(25,10)")).over(w).cast("double"), 4))
      .select("event_id", "user_id", "ts_us", "trailing_events", "trailing_value")
      .orderBy("event_id")
  }

  val TrailingOracleSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      | count(*) OVER w AS trailing_events,
      | round(CAST(sum(CAST(value AS DECIMAL(25,10))) OVER w AS DOUBLE), 4) AS trailing_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      | RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Gap-based sessionization: a new session starts after >= `gapSeconds`
    * of inactivity; emits per-user session and event counts. The streaming
    * twin with the same gap semantics is
    * [[graft.streaming.StreamingSessionize.sessions]] (session_window +
    * watermark).
    */
  def sessionize(s: SparkSession, dir: String, gapSeconds: Long = 1800L): DataFrame =
    Tables.events(s, dir)
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(byUserTime))
      .withColumn("new_session",
        when(col("gap_us").isNull || col("gap_us") >= gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(
        max("session_id").cast("long").as("sessions"),
        count(lit(1)).as("events"))
      .orderBy("user_id")

  private val DayUs = 86400000000L
  private val HourUs = 3600000000L

  /** Peak concurrency per day — the classic sweep line (+1 at each
    * activity-window start, −1 at its end, running sum, take the max),
    * with each event opening a 30-minute window clipped at midnight
    * (cross-day tails attribute to the start day; an exact integer
    * contract both engines share).
    *
    * Scale shape: HIERARCHICAL prefix sums, the pattern that keeps
    * sweep lines parallel at 100 TB. A flat per-day running sum — which
    * the ORACLE runs, an independent algorithm — serializes an entire
    * day's boundaries through one task; here hour buckets aggregate
    * their deltas first (map-side combined), a 25-row-per-day window
    * computes each hour's carry-in, and the intra-hour running sum runs
    * per (day, hour) partition — 24× the parallelism, and the bucketing
    * generalizes to minutes if an hour is still too hot. Tie order
    * (t, delta) closes windows before opening new ones at the same
    * microsecond, and the per-day max is permutation-invariant across
    * equal rows, so the result is deterministic.
    */
  def peakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("ts_us").as("t"))
    val starts = ev.select(
      expr(s"t div $DayUs").as("day"), col("t"), lit(1L).as("delta"))
    val ends = ev.select(
      expr(s"t div $DayUs").as("day"),
      expr(s"least(t + 1800000000, (t div $DayUs + 1) * $DayUs)").as("t"),
      lit(-1L).as("delta"))
    val b = starts.union(ends)
      .withColumn("hour", expr(s"(t - day * $DayUs) div $HourUs"))
    val carry = b.groupBy("day", "hour")
      .agg(sum("delta").as("hsum"))
      .withColumn("carry_in",
        coalesce(
          sum("hsum").over(Window.partitionBy("day").orderBy("hour")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("day", "hour", "carry_in")
    b.join(carry, Seq("day", "hour"))
      .withColumn("run",
        col("carry_in") + sum("delta").over(
          Window.partitionBy("day", "hour").orderBy("t", "delta")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("day")
      .agg(max("run").cast("long").as("peak_concurrent"))
      .select(col("day").as("epoch_day"), col("peak_concurrent"))
      .orderBy("epoch_day")
  }

  /** Flat single-level sweep per day — an independent algorithm. */
  val PeakConcurrencyOracleSql: String =
    s"""WITH e AS (SELECT epoch_us(ts) AS t FROM events),
       |b AS (
       | SELECT t // $DayUs AS day, t, 1 AS delta FROM e
       | UNION ALL
       | SELECT t // $DayUs AS day,
       |  least(t + 1800000000, (t // $DayUs + 1) * $DayUs) AS t, -1 AS delta
       | FROM e),
       |r AS (
       | SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY t, delta
       |  ROWS UNBOUNDED PRECEDING) AS run
       | FROM b)
       |SELECT CAST(day AS BIGINT) AS epoch_day,
       | CAST(max(run) AS BIGINT) AS peak_concurrent
       |FROM r GROUP BY day ORDER BY epoch_day""".stripMargin

  /** Exact NTILE(4) length-quartile binning per language — which length
    * band each document falls in, with NTILE's exact bucket-size
    * contract (first `cnt % 4` buckets get the extra row), summarized
    * per (lang, quartile).
    *
    * Scale shape: a naive `ntile(4) over (partition by lang order by …)`
    * sorts each language through ONE task — the single-partition-window
    * trap at 100 TB. Here the global per-lang rank is HIERARCHICAL
    * (same pattern as [[peakConcurrency]]): value-bucket counts
    * (map-side combined) → a langs×buckets-row carry-in window → per
    * (lang, bucket) row_number, so no task ever sorts a whole language.
    * The quartile then falls out of the NTILE arithmetic on (rank,
    * per-lang count) — pure integer CASE, broadcast totals. The ORACLE
    * runs native NTILE — an independent algorithm, so this is a true
    * cross-check of the rank math.
    */
  def lengthQuartiles(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("lang"), col("n_chars"), col("doc_id"))
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
    RankOps.withHierarchicalRank(docs, Seq("lang"), "n_chars", "doc_id",
        "n_chars div 16", "rk")
      .join(broadcast(totals), Seq("lang"))
      .withColumn("quartile", RankOps.ntileOf("rk", "cnt", 4).cast("long"))
      .groupBy("lang", "quartile")
      .agg(
        count(lit(1)).as("docs"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      .orderBy("lang", "quartile")
  }

  /** Native NTILE — independent of the hierarchical rank formulation. */
  val LengthQuartilesOracleSql: String =
    """WITH q AS (
      | SELECT lang, n_chars,
      |  NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS quartile
      | FROM documents)
      |SELECT lang, CAST(quartile AS BIGINT) AS quartile, count(*) AS docs,
      | min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM q GROUP BY 1, 2 ORDER BY lang, quartile""".stripMargin
}
