package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Temporal / sequence analytics over the events stream table: rolling
  * distinct-user windows via mergeable HLL registers, SCD2-style state
  * intervals, inter-arrival statistics, ordered path mining, and
  * change-point (CUSUM) drift detection over the daily spine.
  *
  * Shared scale discipline: every operator either (a) aggregates the
  * corpus down to a METADATA-sized grid (days × registers, days × types)
  * before any window/serial step runs, or (b) windows per user after one
  * user-keyed exchange — no whole-corpus single-partition window anywhere.
  */
object TemporalOps {

  import SketchOps.{K, P}
  import HllOps.{Buckets, ZeroSentinel, HarmonicOne}

  private val DayUs = 86400000000L
  private val HourUs = 3600000000L

  /** Dense day spine from the observed [min, max] event days — two scalar
    * aggregates exploded into one row per day; never a corpus shuffle.
    */
  private def daySpine(ev: DataFrame): DataFrame =
    ev.agg(
        expr(s"min(ts_us div $DayUs)").as("mn"),
        expr(s"max(ts_us div $DayUs)").as("mx"))
      .select(explode(expr("sequence(mn, mx)")).as("day"))

  /** Rolling 7-day distinct users per day — THE showcase of HLL register
    * mergeability ([[HllOps]]): per-day 64-register sketches collapse the
    * corpus once (shuffle ≤ days·64 rows of two longs), then every day's
    * 7-day estimate is a register-wise `max` over the trailing window of
    * the days×64 grid — the window never touches event rows, so a year
    * of 100 TB days rolls up in a metadata-sized window pass. The exact
    * rolling distinct (from day-user pairs range-joined to the broadcast
    * spine) rides along as `true_rolling7` for error context; the oracle
    * recomputes the merge by a range JOIN over day registers — an
    * independent formulation of the same merge algebra, so window-frame
    * semantics are cross-checked engine to engine.
    */
  def rollingWeekUniques(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val dayed = ev.select(
      expr(s"ts_us div $DayUs").as("day"),
      ((col("user_id") % P) * K % P).as("h"))
    // Per-(day, register) max of the geometric observable (see HllOps).
    val regs = dayed
      .select(col("day"), (col("h") % Buckets).as("b"),
        expr(s"h div $Buckets").as("v"))
      .select(col("day"), col("b"),
        when(col("v") === 0L, ZeroSentinel).otherwise(expr("v & -v")).as("low"))
      .groupBy("day", "b").agg(max("low").as("maxlow"))

    // Dense (day × register) grid so a register observed only earlier in
    // the window still reaches days where it has no fresh row.
    val grid = daySpine(ev)
      .select(col("day"), explode(expr(s"sequence(0L, ${Buckets - 1}L)")).as("b"))
    val merged = grid.join(regs, Seq("day", "b"), "left")
      .withColumn("mlow",
        max("maxlow").over(Window.partitionBy("b").orderBy("day")
          .rangeBetween(-6, 0)))
    val est = merged.groupBy("day")
      .agg(
        count(col("mlow")).as("np"),
        coalesce(sum(expr(s"$HarmonicOne div (2 * mlow)")), lit(0L)).as("sp"))
      .select(col("day"),
        expr(HllOps.estSql("div")).cast("long").as("est_rolling7"))

    val dayUsers = Tables.events(s, dir)
      .select(expr(s"ts_us div $DayUs").as("uday"), col("user_id")).distinct()
    val truth = dayUsers
      .join(broadcast(daySpine(ev)),
        col("uday").between(col("day") - 6, col("day")))
      .groupBy("day").agg(countDistinct("user_id").as("true_rolling7"))

    est.join(truth, Seq("day"), "left")
      .select(col("day").as("epoch_day"), col("est_rolling7"),
        coalesce(col("true_rolling7"), lit(0L)).as("true_rolling7"))
      .orderBy("epoch_day")
  }

  def rollingWeekOracleSql(): String =
    s"""WITH e AS (SELECT epoch_us(ts) // $DayUs AS day,
       |  ((user_id % $P) * $K) % $P AS h, user_id FROM events),
       |regs AS (
       | SELECT day, h % $Buckets AS b,
       |  max(CASE WHEN h // $Buckets = 0 THEN $ZeroSentinel
       |   ELSE (h // $Buckets) & -(h // $Buckets) END) AS maxlow
       | FROM e GROUP BY day, h % $Buckets),
       |spine AS (
       | SELECT unnest(generate_series(mn, mx)) AS day
       | FROM (SELECT min(day) AS mn, max(day) AS mx FROM e)),
       |m AS (
       | SELECT s.day, r.b, max(r.maxlow) AS mlow
       | FROM spine s JOIN regs r ON r.day BETWEEN s.day - 6 AND s.day
       | GROUP BY s.day, r.b),
       |gs AS (
       | SELECT day, count(*) AS np,
       |  coalesce(sum($HarmonicOne // (2 * mlow)), 0) AS sp
       | FROM m GROUP BY day),
       |est AS (
       | SELECT s.day, coalesce(CAST(${HllOps.estSql("//")} AS BIGINT), 0) AS est_rolling7
       | FROM spine s LEFT JOIN gs USING (day)),
       |t AS (
       | SELECT s.day, count(DISTINCT e.user_id) AS true_rolling7
       | FROM spine s JOIN e ON e.day BETWEEN s.day - 6 AND s.day
       | GROUP BY s.day)
       |SELECT est.day AS epoch_day, est.est_rolling7,
       | coalesce(t.true_rolling7, 0) AS true_rolling7
       |FROM est LEFT JOIN t ON est.day = t.day
       |ORDER BY epoch_day""".stripMargin

  /** SCD2-style state intervals + time-in-state rollup: each event opens
    * a validity interval `[ts_us, next event's ts_us)` for its user
    * (deterministic tie order `(ts_us, event_id)`; the user's last event
    * closes at their final timestamp, contributing 0), then total /
    * mean dwell time aggregates per state. This is the
    * slowly-changing-dimension interval build — the batch twin of a CDC
    * history table — expressed as one user-keyed exchange, a per-user
    * `lead`, and a map-side-combined aggregate.
    */
  def timeInState(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .withColumn("dwell_us", lead("ts_us", 1).over(w) - col("ts_us"))
      .filter(col("dwell_us").isNotNull)
      .groupBy(col("event_type").as("state"))
      .agg(
        count(lit(1)).as("intervals"),
        sum("dwell_us").as("total_us"),
        expr("sum(dwell_us) div count(*)").as("avg_us"),
        max("dwell_us").as("max_us"))
      .orderBy("state")
  }

  def timeInStateOracleSql(): String =
    """WITH iv AS (
      | SELECT event_type AS state,
      |  lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |   ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dwell_us
      | FROM events)
      |SELECT state, count(*) AS intervals,
      | CAST(sum(dwell_us) AS BIGINT) AS total_us,
      | CAST(sum(dwell_us) // count(*) AS BIGINT) AS avg_us,
      | CAST(max(dwell_us) AS BIGINT) AS max_us
      |FROM iv WHERE dwell_us IS NOT NULL
      |GROUP BY state ORDER BY state""".stripMargin

  /** Ordered path mining: the most frequent 3-step event-type journeys
    * (per-user consecutive trigrams under `(ts_us, event_id)` order),
    * global count per path, top 20. The sequence step is a per-user
    * double `lead` after ONE user-keyed exchange; the path space is
    * |types|³-bounded so the count aggregate collapses map-side and the
    * top-k is a TakeOrdered, not a global sort.
    */
  def pathTrigrams(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("s1"),
        lead("event_type", 1).over(w).as("s2"),
        lead("event_type", 2).over(w).as("s3"))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy("s1", "s2", "s3")
      .agg(count(lit(1)).as("journeys"))
      .orderBy(desc("journeys"), col("s1"), col("s2"), col("s3"))
      .limit(k)
  }

  def pathTrigramsOracleSql(k: Int = 20): String =
    s"""WITH t AS (
       | SELECT event_type AS s1,
       |  lead(event_type, 1) OVER w AS s2,
       |  lead(event_type, 2) OVER w AS s3
       | FROM events
       | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
       |SELECT s1, s2, s3, count(*) AS journeys
       |FROM t WHERE s2 IS NOT NULL AND s3 IS NOT NULL
       |GROUP BY s1, s2, s3
       |ORDER BY journeys DESC, s1, s2, s3 LIMIT $k""".stripMargin

  /** Inter-arrival gap statistics per event type: the gap between each
    * event and its user's previous event (any type), attributed to the
    * LATER event's type — the latency signal a pipeline watches per
    * event class. Integer-exact (`div` mean); one user exchange, one
    * bounded aggregate.
    */
  def interarrivalStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("gaps"),
        min("gap_us").as("min_us"),
        max("gap_us").as("max_us"),
        expr("sum(gap_us) div count(*)").as("avg_us"))
      .orderBy("event_type")
  }

  def interarrivalOracleSql(): String =
    """WITH g AS (
      | SELECT event_type,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |   ORDER BY epoch_us(ts), event_id) AS gap_us
      | FROM events)
      |SELECT event_type, count(*) AS gaps,
      | CAST(min(gap_us) AS BIGINT) AS min_us,
      | CAST(max(gap_us) AS BIGINT) AS max_us,
      | CAST(sum(gap_us) // count(*) AS BIGINT) AS avg_us
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val GapQuantilesPermille: Seq[Int] = Seq(500, 900, 990)

  /** P50/P90/P99 inter-arrival gap (whole seconds) per event type — the
    * latency-style tail readout [[interarrivalStats]]'s min/avg/max
    * hides. Gaps are between consecutive events of the SAME type within
    * each user's timeline (one user-keyed window exchange); quantiles
    * come from the histogram rank-select form shared with
    * [[WindowOps.quantilesDensityByFlag]] — the corpus collapses to the
    * (type × gap-second) grid first and the cumulative walk runs over
    * that metadata, so no per-group sort ever funnels through one task.
    */
  def gapQuantiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts_us", "event_id")
    val gaps = Tables.events(s, dir)
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("event_type"),
        expr("(ts_us - prev_us) div 1000000").as("gap_s"))
    val hist = gaps.groupBy("event_type", "gap_s").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("event_type").orderBy("gap_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("cnt", sum("c").over(Window.partitionBy("event_type")))
      .withColumn("p", explode(array(GapQuantilesPermille.map(lit): _*)))
      .filter(col("cum") >= expr("greatest((p * cnt + 999) div 1000, 1)"))
      .groupBy(col("event_type"), col("cnt").as("gaps"))
      .pivot("p", GapQuantilesPermille.map(_.toString))
      .agg(min("gap_s"))
      .select(col("event_type") +: col("gaps") +:
        GapQuantilesPermille.map(p => col(p.toString).as(s"p${p}_s")): _*)
      .orderBy("event_type")
  }

  def gapQuantilesOracleSql(): String = {
    val values = GapQuantilesPermille.map(p => s"($p)").mkString(", ")
    val cols = GapQuantilesPermille
      .map(p => s"CAST(max(CASE WHEN p = $p THEN q END) AS BIGINT) AS p${p}_s")
      .mkString(",\n ")
    s"""WITH g AS (
       | SELECT event_type,
       |  (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
       |   ORDER BY epoch_us(ts), event_id)) // 1000000 AS gap_s
       | FROM events),
       |h AS (
       | SELECT event_type, gap_s, count(*) AS c
       | FROM g WHERE gap_s IS NOT NULL GROUP BY 1, 2),
       |cm AS (
       | SELECT event_type, gap_s,
       |  sum(c) OVER (PARTITION BY event_type ORDER BY gap_s) AS cum,
       |  sum(c) OVER (PARTITION BY event_type) AS cnt
       | FROM h),
       |q AS (
       | SELECT event_type, cnt, p, min(gap_s) AS q
       | FROM cm CROSS JOIN (VALUES $values) pr(p)
       | WHERE cum >= greatest((p * cnt + 999) // 1000, 1)
       | GROUP BY 1, 2, 3)
       |SELECT event_type, CAST(cnt AS BIGINT) AS gaps,
       | $cols
       |FROM q GROUP BY event_type, cnt ORDER BY event_type""".stripMargin
  }

  /** Trailing 7-day rolling median of the daily event count — the
    * spike-resistant volume trend (a single flash-crowd day drags a
    * rolling MEAN for a week; the median shrugs). The corpus collapses
    * once to the dense day spine; each day then joins its trailing ≤7
    * spine rows and takes the LOWER median by sorted-list index — the
    * collected list is bounded at 7 elements by construction, so this
    * is metadata work end to end, never an event-row shuffle.
    */
  def rollingMedian7d(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = daySpine(ev)
      .join(ev.groupBy(expr(s"ts_us div $DayUs").as("day"))
          .agg(count(lit(1)).as("x")),
        Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = daily.select(col("day"))
    val b = daily.select(col("day").as("db"), col("x"))
    a.join(b, col("db").between(col("day") - 6, col("day")))
      .groupBy("day")
      .agg(count(lit(1)).as("window_days"),
        sort_array(collect_list("x")).as("xs"))
      .select(col("day").as("epoch_day"), col("window_days"),
        element_at(col("xs"),
          expr("cast((window_days + 1) div 2 as int)")).as("median7"))
      .orderBy("epoch_day")
  }

  def rollingMedian7dOracleSql(): String =
    s"""WITH e AS (SELECT epoch_us(ts) // $DayUs AS day FROM events),
       |spine AS (
       | SELECT unnest(generate_series(mn, mx)) AS day
       | FROM (SELECT min(day) AS mn, max(day) AS mx FROM e)),
       |xs AS (
       | SELECT s.day, coalesce(c.x, 0) AS x
       | FROM spine s LEFT JOIN (
       |  SELECT day, count(*) AS x FROM e GROUP BY day) c USING (day)),
       |p AS (
       | SELECT a.day AS day, b.x AS x
       | FROM xs a JOIN xs b ON b.day BETWEEN a.day - 6 AND a.day)
       |SELECT CAST(day AS BIGINT) AS epoch_day, count(*) AS window_days,
       | CAST(list_sort(list(x))[CAST((count(*) + 1) // 2 AS INT)] AS BIGINT)
       |  AS median7
       |FROM p GROUP BY day ORDER BY epoch_day""".stripMargin

  /** Duplicate-event audit — the at-least-once-delivery smell test: an
    * event is a duplicate SUSPECT when the same user emits the same type
    * with the IDENTICAL value within one second of the previous one
    * (null-safe value equality, so null-valued repeats count too). One
    * user/type-keyed window pass, |types| output rows.
    */
  def duplicateEventAudit(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts_us", 1).over(w))
      .withColumn("prev_v", lag("value", 1).over(w))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("events"),
        sum(when(col("prev_ts").isNotNull &&
            col("ts_us") - col("prev_ts") <= 1000000L &&
            col("value") <=> col("prev_v"), 1L).otherwise(0L))
          .as("dup_suspects"))
      .select(col("event_type"), col("events"), col("dup_suspects"),
        expr("(1000 * dup_suspects) div events").as("dup_permille"))
      .orderBy("event_type")
  }

  def duplicateEventOracleSql(): String =
    """WITH g AS (
      | SELECT event_type, value, epoch_us(ts) AS t,
      |  lag(epoch_us(ts)) OVER w AS prev_t,
      |  lag(value) OVER w AS prev_v
      | FROM events
      | WINDOW w AS (PARTITION BY user_id, event_type
      |  ORDER BY epoch_us(ts), event_id))
      |SELECT event_type, count(*) AS events,
      | CAST(sum(CASE WHEN prev_t IS NOT NULL AND t - prev_t <= 1000000
      |  AND value IS NOT DISTINCT FROM prev_v THEN 1 ELSE 0 END) AS BIGINT)
      |  AS dup_suspects,
      | CAST((1000 * sum(CASE WHEN prev_t IS NOT NULL AND t - prev_t <= 1000000
      |  AND value IS NOT DISTINCT FROM prev_v THEN 1 ELSE 0 END)) // count(*)
      |  AS BIGINT) AS dup_permille
      |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Per-day volume anomaly verdicts — the BATCH twin of
    * [[graft.streaming.StreamingAnomaly]], byte-for-byte the same
    * integer z-test: day `d` with count `c` is anomalous against the
    * moments of STRICTLY PRIOR days `(k, S, SS)` iff `k ≥ 5` and
    * `(c·k − S)² > 9·(k·SS − S²)`. The running moments are expanding
    * window sums over the dense day spine (metadata-sized, the
    * [[driftCusum]] precedent); all products run in DECIMAL(38,0) so
    * 1e9-event days stay exact. The spec replays the SAME
    * `StreamingAnomaly.isAnomalous` over the day sequence — batch and
    * streaming verdicts are pinned identical, not merely similar.
    */
  def anomalyDays(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = daySpine(ev)
      .join(ev.groupBy(expr(s"ts_us div $DayUs").as("day"))
          .agg(count(lit(1)).as("x")),
        Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
    val prior = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("k", coalesce(count("x").over(prior), lit(0L)))
      .withColumn("s", coalesce(
        sum(col("x").cast("decimal(38,0)")).over(prior),
        lit(0L).cast("decimal(38,0)")))
      .withColumn("ss", coalesce(
        sum((col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)"))
          .over(prior),
        lit(0L).cast("decimal(38,0)")))
      .select(col("day").as("epoch_day"), col("x").as("cnt"),
        col("k").as("windows_seen"),
        when(col("k") >= 5L &&
          (col("x") * col("k") - col("s")) * (col("x") * col("k") - col("s"))
            > lit(9L) * (col("k") * col("ss") - col("s") * col("s")),
          1L).otherwise(0L).as("anomaly"))
      .orderBy("epoch_day")
  }

  def anomalyDaysOracleSql(): String =
    s"""WITH e AS (SELECT epoch_us(ts) // $DayUs AS day FROM events),
       |spine AS (
       | SELECT unnest(generate_series(mn, mx)) AS day
       | FROM (SELECT min(day) AS mn, max(day) AS mx FROM e)),
       |xs AS (
       | SELECT s.day, coalesce(c.x, 0) AS x
       | FROM spine s LEFT JOIN (
       |  SELECT day, count(*) AS x FROM e GROUP BY day) c USING (day)),
       |m AS (
       | SELECT day, x,
       |  coalesce(count(x) OVER w, 0) AS k,
       |  coalesce(sum(x) OVER w, 0) AS s,
       |  coalesce(sum(x * x) OVER w, 0) AS ss
       | FROM xs WINDOW w AS (ORDER BY day
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT CAST(day AS BIGINT) AS epoch_day, CAST(x AS BIGINT) AS cnt,
       | CAST(k AS BIGINT) AS windows_seen,
       | CAST(CASE WHEN k >= 5 AND (x*k - s) * (x*k - s) > 9 * (k*ss - s*s)
       |  THEN 1 ELSE 0 END AS BIGINT) AS anomaly
       |FROM m ORDER BY epoch_day""".stripMargin

  /** Change-point (two-sided CUSUM) drift detection over the zero-filled
    * daily event-count spine: cumulative milli-deviations from the global
    * daily mean, flagging days where |CUSUM| exceeds 5% of total event
    * mass — the "did volume drift" audit a feed monitor runs. The corpus
    * collapses to per-day counts FIRST (one map-side-combined aggregate);
    * the running sum then walks the metadata-sized spine (days, bounded
    * by calendar time — ~4k rows a decade), so the serial window is over
    * metadata, never data. All arithmetic is integer fixed-point
    * (milli-counts), bit-identical in both engines.
    */
  def driftCusum(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = daySpine(ev)
      .join(ev.groupBy(expr(s"ts_us div $DayUs").as("day"))
          .agg(count(lit(1)).as("cnt")),
        Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val totals = daily.agg(
      sum("cnt").as("total"), count(lit(1)).as("ndays"))
    daily.crossJoin(broadcast(totals))
      .withColumn("dev_milli",
        col("cnt") * 1000L - expr("(1000 * total) div ndays"))
      .withColumn("cusum_milli",
        sum("dev_milli").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("drift_flag",
        (abs(col("cusum_milli")) > expr("(1000 * total) div 20")).cast("int"))
      .select(col("day").as("epoch_day"), col("cnt"), col("cusum_milli"),
        col("drift_flag").cast("long").as("drift_flag"))
      .orderBy("epoch_day")
  }

  /** Last-touch marketing attribution: each purchase credits the LATEST
    * preceding view/click by the same user within `windowUs` (1 h), or
    * 'none'. Built on the generic [[AsofJoinOps.asOfJoin]] composition —
    * ONE key exchange + a running-frame carry, never the |purchases|×
    * |touches| fan-out join — then a |touch-types|-row aggregate. The
    * oracle states the semantics directly as a correlated latest-touch
    * subquery (an independent formulation).
    */
  def attributionLastTouch(
      s: SparkSession,
      dir: String,
      windowUs: Long = 3600000000L): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    AsofJoinOps.asOfJoin(purchases, touches, "user_id", "ts_us", "event_id")
      .select(
        when(col("matched").isNull ||
            col("matched.ts_us") < col("ts_us") - windowUs, lit("none"))
          .otherwise(col("matched.event_type")).as("attribution"))
      .groupBy("attribution")
      .agg(count(lit(1)).as("purchases"))
      .orderBy("attribution")
  }

  def attributionOracleSql(windowUs: Long = 3600000000L): String =
    s"""WITH p AS (
       | SELECT event_id, user_id, epoch_us(ts) AS t FROM events
       | WHERE event_type = 'purchase'),
       |tch AS (
       | SELECT user_id, epoch_us(ts) AS t, event_id, event_type FROM events
       | WHERE event_type IN ('view', 'click')),
       |m AS (
       | SELECT p.event_id,
       |  (SELECT tch.event_type FROM tch
       |   WHERE tch.user_id = p.user_id AND tch.t <= p.t
       |    AND tch.t >= p.t - $windowUs
       |   ORDER BY tch.t DESC, tch.event_id DESC LIMIT 1) AS attribution
       | FROM p)
       |SELECT coalesce(attribution, 'none') AS attribution,
       | count(*) AS purchases
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  /** U-shaped (position-based) multi-touch attribution — the standard
    * multi-touch model beside [[attributionLastTouch]]: per purchase,
    * every view/click inside the lookback window shares one exact
    * 10⁶-micro credit — first touch 40%, last 40%, middles split the
    * 20% — with the integer remainders pinned deterministically (n = 1:
    * all to the one touch; n = 2: 500k/500k; n ≥ 3: middles get
    * `200000 div (n−2)` each and the remainder rides the FIRST touch),
    * so Σcredit = 10⁶ × purchases exactly and the 'none' row carries
    * untouched purchases' full credit — the mass-conservation audit is
    * in the output. Touch order is (ts_us, event_id) — unique, so
    * first/last are well-defined at any tie. The lookback is 3 days —
    * at 1 hour every touched conversion had exactly ONE touch and the
    * split never exercised (sf0.01 multiplicity at 3 days: 395 single /
    * 470 pairs / 909 with middles).
    *
    * Scale shape: one purchases×touches window-bounded join (per-user
    * activity inside the lookback, the as-of family's cost), one
    * per-conversion min/max-struct reduction joined back broadcast, one
    * |types|-row rollup. No per-conversion sorts — position comes from
    * the struct extremes, not a row_number.
    */
  def attributionUShaped(
      s: SparkSession,
      dir: String,
      windowUs: Long = 259200000000L): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("pt"),
        col("event_id").as("conv_id"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts_us").as("tt"),
        col("event_id").as("touch_id"), col("event_type"))
    val inWin = purchases.join(touches, Seq("user_id"))
      .filter(col("tt") <= col("pt") && col("tt") >= col("pt") - windowUs)
      .select(col("conv_id"), col("touch_id"), col("tt"), col("event_type"))
    val perConv = inWin.groupBy("conv_id")
      .agg(count(lit(1)).as("n"),
        min(struct(col("tt"), col("touch_id"))).as("first"),
        max(struct(col("tt"), col("touch_id"))).as("last"))
    val credited = inWin.join(perConv, Seq("conv_id"))
      .select(col("event_type"),
        expr("""case
          | when n = 1 then 1000000L
          | when n = 2 then 500000L
          | when touch_id = first.touch_id
          |  then 400000L + 200000L % (n - 2)
          | when touch_id = last.touch_id then 400000L
          | else 200000L div (n - 2) end""".stripMargin).as("credit"))
      .groupBy(col("event_type").as("attribution"))
      .agg(count(lit(1)).as("n_touches"),
        sum("credit").as("credit_micro"))
    val none = purchases
      .join(inWin.select(col("conv_id")).distinct(), Seq("conv_id"), "left_anti")
      .agg(count(lit(1)).as("n_touches"))
      .select(lit("none").as("attribution"), col("n_touches"),
        (col("n_touches") * 1000000L).as("credit_micro"))
      .filter(col("n_touches") > 0)
    credited.union(none).orderBy("attribution")
  }

  def attributionUShapedOracleSql(windowUs: Long = 259200000000L): String =
    s"""WITH p AS (
       | SELECT event_id AS conv_id, user_id, epoch_us(ts) AS pt FROM events
       | WHERE event_type = 'purchase'),
       |tch AS (
       | SELECT user_id, epoch_us(ts) AS tt, event_id AS touch_id, event_type
       | FROM events WHERE event_type IN ('view', 'click')),
       |w AS (
       | SELECT p.conv_id, tch.touch_id, tch.tt, tch.event_type
       | FROM p JOIN tch ON p.user_id = tch.user_id
       |  AND tch.tt <= p.pt AND tch.tt >= p.pt - $windowUs),
       |g AS (
       | SELECT conv_id, count(*) AS n,
       |  min(ROW(tt, touch_id)) AS frst, max(ROW(tt, touch_id)) AS lst
       | FROM w GROUP BY conv_id),
       |cr AS (
       | SELECT w.event_type,
       |  CASE
       |   WHEN g.n = 1 THEN 1000000
       |   WHEN g.n = 2 THEN 500000
       |   WHEN w.touch_id = g.frst[2] THEN 400000 + 200000 % (g.n - 2)
       |   WHEN w.touch_id = g.lst[2] THEN 400000
       |   ELSE 200000 // (g.n - 2) END AS credit
       | FROM w JOIN g ON w.conv_id = g.conv_id),
       |agg AS (
       | SELECT event_type AS attribution, count(*) AS n_touches,
       |  CAST(sum(credit) AS BIGINT) AS credit_micro
       | FROM cr GROUP BY 1),
       |nn AS (
       | SELECT 'none' AS attribution, count(*) AS n_touches,
       |  CAST(count(*) * 1000000 AS BIGINT) AS credit_micro
       | FROM p WHERE conv_id NOT IN (SELECT DISTINCT conv_id FROM w))
       |SELECT * FROM agg
       |UNION ALL SELECT * FROM nn WHERE n_touches > 0
       |ORDER BY attribution""".stripMargin

  /** Hour-of-day × day-of-week activity profile in ppm — the seasonal
    * heat-map a capacity planner reads. The corpus collapses to the
    * ≤ 168-cell grid in one map-side-combined aggregate; the total rides
    * a broadcast scalar.
    */
  def seasonalProfile(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val total = ev.agg(count(lit(1)).as("total"))
    ev.select(
        expr(s"((ts_us div $DayUs) + 4) % 7").as("dow"),
        expr(s"(ts_us % $DayUs) div $HourUs").as("hour"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(col("dow"), col("hour"), col("cnt"),
        expr("(1000000 * cnt) div total").as("ppm"))
      .orderBy("dow", "hour")
  }

  def seasonalProfileOracleSql(): String =
    s"""WITH e AS (SELECT epoch_us(ts) AS t FROM events),
       |t AS (SELECT count(*) AS total FROM e)
       |SELECT ((t // $DayUs) + 4) % 7 AS dow,
       | (t % $DayUs) // $HourUs AS hour,
       | count(*) AS cnt,
       | (1000000 * count(*)) // (SELECT total FROM t) AS ppm
       |FROM e GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin

  /** Sample autocorrelation of the daily event-count series at lags
    * 1..`maxLag` — the seasonality detector that tells a forecaster
    * whether weekly structure exists before fitting anything. The corpus
    * collapses ONCE to the dense day spine (gap days count 0), and all
    * lag algebra runs on that metadata-sized series: the lagged pairing
    * is a day-range self-join of a days-long frame, never an event-row
    * shuffle. Exactness discipline: the ACF ratio
    * `sum((x_t-mean)(x_{t+k}-mean)) / sum((x_t-mean)^2)` is cleared of
    * the rational mean by multiplying both sides by n^2 —
    * `num = n^2*sxy - n*sx*(sa+sb) + m*sx^2`,
    * `den = n^2*sxx - n*sx^2` — all DECIMAL(38,0) integer sums (a year
    * of 1e9-event days stays ~1e20, far inside 38 digits), so the only
    * IEEE step is the final one-division round shared with the oracle.
    */
  def acfDaily(s: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = daySpine(ev)
      .join(ev.groupBy(expr(s"ts_us div $DayUs").as("day"))
          .agg(count(lit(1)).as("x")),
        Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val totals = daily.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
    val a = daily.select(col("day").as("da"), col("x").as("xa"))
    val b = daily.select(col("day").as("db"), col("x").as("xb"))
    val byLag = a
      .join(b, (col("db") - col("da")).between(lit(1), lit(maxLag)))
      .withColumn("lag", col("db") - col("da"))
      .groupBy("lag")
      .agg(
        sum((col("xa") * col("xb")).cast("decimal(38,0)")).as("sxy"),
        sum(col("xa").cast("decimal(38,0)")).as("sa"),
        sum(col("xb").cast("decimal(38,0)")).as("sb"),
        count(lit(1)).as("m"))
    byLag.crossJoin(broadcast(totals))
      .select(col("lag"), col("m"),
        round(
          (col("n") * col("n") * col("sxy")
            - col("n") * col("sx") * (col("sa") + col("sb"))
            + col("m") * col("sx") * col("sx")).cast("double")
            / (col("n") * col("n") * col("sxx")
              - col("n") * col("sx") * col("sx")).cast("double"),
          4).as("acf"))
      .orderBy("lag")
  }

  def acfDailyOracleSql(maxLag: Int = 7): String =
    s"""WITH e AS (SELECT epoch_us(ts) // $DayUs AS day FROM events),
       |spine AS (
       | SELECT unnest(generate_series(mn, mx)) AS day
       | FROM (SELECT min(day) AS mn, max(day) AS mx FROM e)),
       |xs AS (
       | SELECT s.day, coalesce(c.x, 0) AS x
       | FROM spine s LEFT JOIN (
       |  SELECT day, count(*) AS x FROM e GROUP BY day) c USING (day)),
       |t AS (SELECT count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx FROM xs),
       |p AS (
       | SELECT b.day - a.day AS lag, sum(a.x * b.x) AS sxy,
       |  sum(a.x) AS sa, sum(b.x) AS sb, count(*) AS m
       | FROM xs a JOIN xs b ON b.day - a.day BETWEEN 1 AND $maxLag
       | GROUP BY 1)
       |SELECT CAST(lag AS BIGINT) AS lag, CAST(m AS BIGINT) AS m,
       | round(CAST(n*n*sxy - n*sx*(sa+sb) + m*sx*sx AS DOUBLE)
       |  / CAST(n*n*sxx - n*sx*sx AS DOUBLE), 4) AS acf
       |FROM p, t ORDER BY lag""".stripMargin

  def driftCusumOracleSql(): String =
    s"""WITH e AS (SELECT epoch_us(ts) // $DayUs AS day FROM events),
       |spine AS (
       | SELECT unnest(generate_series(mn, mx)) AS day
       | FROM (SELECT min(day) AS mn, max(day) AS mx FROM e)),
       |daily AS (
       | SELECT s.day, coalesce(c.cnt, 0) AS cnt
       | FROM spine s LEFT JOIN (
       |  SELECT day, count(*) AS cnt FROM e GROUP BY day) c USING (day)),
       |t AS (SELECT sum(cnt) AS total, count(*) AS ndays FROM daily),
       |r AS (
       | SELECT day, cnt,
       |  sum(cnt * 1000 - (1000 * t.total) // t.ndays)
       |   OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cusum_milli,
       |  (1000 * t.total) // 20 AS thr
       | FROM daily, t)
       |SELECT CAST(day AS BIGINT) AS epoch_day, cnt,
       | CAST(cusum_milli AS BIGINT) AS cusum_milli,
       | CAST(CASE WHEN abs(cusum_milli) > thr THEN 1 ELSE 0 END AS BIGINT)
       |  AS drift_flag
       |FROM r ORDER BY epoch_day""".stripMargin

  /** EWMA smoothing of daily per-type volume, α = 1/8, in exact milli
    * fixed-point: `s₁ = 1000·n₁`, `sₜ = (7·sₜ₋₁ + 1000·nₜ) div 8` over
    * the ZERO-FILLED day grid — every operand non-negative, so Spark's
    * truncating `div` and DuckDB's floor `//` agree, and no float ever
    * crosses the oracle. A linear recurrence with truncation is
    * GENUINELY sequential (no window-function form), so each type's
    * bounded day series collapses to one sorted array and the trace is
    * one higher-order `aggregate` fold — per-type state is |days| rows
    * (the time-span domain: ~1000 at three 100 TB years), never event
    * rows; the corpus is touched exactly once by the counting aggregate.
    * The smoothing every volume-anomaly monitor keeps beside the raw
    * series ([[StreamingAnomaly]]'s batch-side reference curve).
    */
  def ewmaDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val counts = ev
      .groupBy(expr(s"ts_us div $DayUs").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val grid = daySpine(ev)
      .crossJoin(ev.select("event_type").distinct())
      .join(broadcast(counts), Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
    grid.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("xs"))
      .select(col("event_type"), explode(expr(
        """aggregate(xs,
          |  cast(array() as array<struct<day:bigint, n:bigint, s:bigint>>),
          |  (acc, x) -> array_append(acc, named_struct(
          |    'day', x.day, 'n', x.n,
          |    's', case when size(acc) = 0 then 1000 * x.n
          |         else (7 * element_at(acc, -1).s + 1000 * x.n) div 8
          |         end)))""".stripMargin)).as("t"))
      .select(col("event_type"), col("t.day").as("epoch_day"),
        col("t.n").as("events"), col("t.s").as("ewma_milli"))
      .orderBy("event_type", "epoch_day")
  }

  /** DuckDB oracle for [[ewmaDaily]]: the identical integer recurrence
    * as a day-indexed recursive CTE over the zero-filled grid.
    */
  def ewmaDailyOracleSql(): String =
    """WITH RECURSIVE b AS (
      | SELECT min(epoch_us(ts) // 86400000000) AS d0,
      |  max(epoch_us(ts) // 86400000000) AS d1 FROM events),
      |spine AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b),
      |t AS (SELECT DISTINCT event_type FROM events),
      |c AS (
      | SELECT epoch_us(ts) // 86400000000 AS day, event_type, count(*) AS n
      | FROM events GROUP BY 1, 2),
      |g AS (
      | SELECT s.day, t.event_type, coalesce(c.n, 0) AS n,
      |  row_number() OVER (PARTITION BY t.event_type ORDER BY s.day) AS i
      | FROM spine s CROSS JOIN t
      | LEFT JOIN c ON c.day = s.day AND c.event_type = t.event_type),
      |r AS (
      | SELECT event_type, i, day, n, 1000 * n AS s FROM g WHERE i = 1
      | UNION ALL
      | SELECT g.event_type, g.i, g.day, g.n, (7 * r.s + 1000 * g.n) // 8
      | FROM g JOIN r ON g.event_type = r.event_type AND g.i = r.i + 1)
      |SELECT event_type, CAST(day AS BIGINT) AS epoch_day,
      | CAST(n AS BIGINT) AS events, CAST(s AS BIGINT) AS ewma_milli
      |FROM r ORDER BY event_type, epoch_day""".stripMargin
}
