package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Cross-table reconciliation and time-weighted aggregation — the
  * finance-grade audits: does the order header total agree with the sum
  * of its lines, and what is the dwell-weighted (not event-weighted)
  * average state of the stream.
  */
object ReconOps {

  /** Financial reconciliation of `orders.o_totalprice` against
    * `Σ lineitem.l_extendedprice` per order, in exact integer cents
    * (`floor(x·100 + 0.5)` — pure IEEE, identical both engines). One
    * order-keyed aggregate of lineitem, one join, and a 3-row rollup:
    * matched orders, mismatched orders, orders with no lines at all,
    * each with its total absolute discrepancy — the daily close every
    * billing pipeline runs. The synthetic generator draws the two
    * columns independently, so "mismatch" dominates; the audit's job is
    * the exact discrepancy accounting, not a green checkmark.
    */
  def reconciliationAudit(s: SparkSession, dir: String): DataFrame = {
    val lines = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum(expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
        .as("line_cents"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("hdr_cents"))
      .join(lines, Seq("o_orderkey"), "left")
      .select(
        when(col("line_cents").isNull, lit("no_lines"))
          .when(col("line_cents") === col("hdr_cents"), lit("matched"))
          .otherwise(lit("mismatched")).as("status"),
        coalesce(abs(col("hdr_cents") - col("line_cents")),
          col("hdr_cents")).as("abs_diff_cents"))
      .groupBy("status")
      .agg(count(lit(1)).as("orders"),
        sum("abs_diff_cents").as("total_abs_diff_cents"))
      .orderBy("status")
  }

  val ReconciliationOracleSql: String =
    """WITH l AS (
      | SELECT l_orderkey AS o_orderkey,
      |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS line_cents
      | FROM lineitem GROUP BY 1),
      |j AS (
      | SELECT CASE WHEN l.line_cents IS NULL THEN 'no_lines'
      |   WHEN l.line_cents = CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
      |    THEN 'matched' ELSE 'mismatched' END AS status,
      |  coalesce(abs(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
      |    - l.line_cents),
      |   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS abs_diff_cents
      | FROM orders o LEFT JOIN l USING (o_orderkey))
      |SELECT status, count(*) AS orders,
      | CAST(sum(abs_diff_cents) AS BIGINT) AS total_abs_diff_cents
      |FROM j GROUP BY status ORDER BY status""".stripMargin

  /** Time-weighted average value per event type (TWAP): each event's
    * value holds until the same user's next event (the [[TemporalOps
    * .timeInState]] interval build), and the average weighs by dwell
    * time, not event count — the metric that doesn't let a burst of
    * short-lived readings swamp the signal. Value quantizes to milli;
    * the value×dwell products accumulate in DECIMAL(38,0) (micros ×
    * milli-value × corpus exceeds BIGINT), and the final division emits
    * an exact milli TWAP.
    */
  def twapByType(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .withColumn("dwell_us", lead("ts_us", 1).over(w) - col("ts_us"))
      .filter(col("dwell_us").isNotNull && col("dwell_us") > 0L)
      .select(col("event_type"),
        expr("cast(floor(value * 1000 + 0.5) as decimal(38,0))").as("v"),
        col("dwell_us").cast("decimal(38,0)").as("d"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("intervals"),
        sum(expr("v * d")).as("vd"), sum("d").as("dd"))
      .select(col("event_type"), col("intervals"),
        col("dd").cast("long").as("total_dwell_us"),
        expr("cast(vd div dd as long)").as("twap_milli"))
      .orderBy("event_type")
  }

  val TwapOracleSql: String =
    """WITH iv AS (
      | SELECT event_type,
      |  CAST(floor(value * 1000 + 0.5) AS HUGEINT) AS v,
      |  CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS HUGEINT) AS d
      | FROM events WHERE value IS NOT NULL)
      |SELECT event_type, count(*) AS intervals,
      | CAST(sum(d) AS BIGINT) AS total_dwell_us,
      | CAST(sum(v * d) // sum(d) AS BIGINT) AS twap_milli
      |FROM iv WHERE d IS NOT NULL AND d > 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Session bounce rate by entry event type: sessionize per user with
    * the 30-minute gap rule (same contract as [[WindowOps.sessionize]]),
    * attribute each session to its FIRST event's type, and report how
    * many sessions ended after that single event. One user-keyed
    * exchange carries the lag/gap, session-id prefix sum, and first-
    * event attribution; the rollup is &#124;types&#124;-bounded.
    */
  def bounceRate(
      s: SparkSession,
      dir: String,
      gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sessions = Tables.events(s, dir)
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(byUser))
      .withColumn("new_session",
        when(col("gap_us").isNull ||
          col("gap_us") >= gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min_by(col("event_type"), struct(col("ts_us"), col("event_id")))
          .as("entry_type"))
    sessions.groupBy("entry_type")
      .agg(count(lit(1)).as("sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("bounces"))
      .select(col("entry_type"), col("sessions"), col("bounces"),
        expr("(1000 * bounces) div sessions").as("bounce_milli"))
      .orderBy("entry_type")
  }

  def bounceRateOracleSql(gapSeconds: Long = 1800L): String =
    s"""WITH e AS (
       | SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
       |g AS (
       | SELECT *, CASE WHEN t - lag(t) OVER w IS NULL
       |   OR t - lag(t) OVER w >= ${gapSeconds * 1000000L} THEN 1 ELSE 0 END
       |  AS new_session
       | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       |sid AS (
       | SELECT *, sum(new_session) OVER (PARTITION BY user_id
       |  ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS session_id
       | FROM g),
       |cnt AS (
       | SELECT user_id, session_id, count(*) AS n_events
       | FROM sid GROUP BY 1, 2),
       |fe AS (
       | SELECT user_id, session_id, event_type AS entry_type FROM (
       |  SELECT user_id, session_id, event_type,
       |   row_number() OVER (PARTITION BY user_id, session_id
       |    ORDER BY t, event_id) AS rn
       |  FROM sid) WHERE rn = 1),
       |ses AS (
       | SELECT c.user_id, c.session_id, c.n_events, f.entry_type
       | FROM cnt c JOIN fe f USING (user_id, session_id))
       |SELECT entry_type, count(*) AS sessions,
       | CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
       | CAST((1000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)) // count(*)
       |  AS BIGINT) AS bounce_milli
       |FROM ses GROUP BY entry_type ORDER BY entry_type""".stripMargin

  /** Session-length distribution under the same 30-minute-gap rule as
    * [[bounceRate]]: P50/P90/P99 of session duration (whole seconds)
    * and of events-per-session, via the histogram rank-select grid —
    * sessions collapse to (duration-second × count) cells, so the
    * quantile walk is metadata-sized however many sessions exist. One
    * user-keyed window exchange, one summary row.
    */
  def sessionLengthQuantiles(
      s: SparkSession,
      dir: String,
      gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sessions = Tables.events(s, dir)
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(byUser))
      .withColumn("new_session",
        when(col("gap_us").isNull ||
          col("gap_us") >= gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        expr("(max(ts_us) - min(ts_us)) div 1000000").as("dur_s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def quantileOf(measure: String): DataFrame = {
      val hist = sessions.groupBy(col(measure).as("v"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // The partition-less windows here run over the collapsed value
      // grid (distinct durations / distinct event counts), not sessions.
      hist
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("cnt", sum("c").over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .withColumn("p", explode(array(lit(500), lit(900), lit(990))))
        .filter(col("cum") >= expr("greatest((p * cnt + 999) div 1000, 1)"))
        .groupBy(lit(1).as("k"))
        .pivot("p", Seq("500", "900", "990"))
        .agg(min("v"))
    }
    val totals = sessions.agg(count(lit(1)).as("sessions"),
      sum("n_events").as("events"))
    val dq = quantileOf("dur_s")
      .select(col("k"), col("500").as("p500_dur_s"),
        col("900").as("p900_dur_s"), col("990").as("p990_dur_s"))
    val eq = quantileOf("n_events")
      .select(col("k"), col("500").as("p500_events"),
        col("900").as("p900_events"), col("990").as("p990_events"))
    totals.crossJoin(broadcast(dq)).crossJoin(broadcast(eq))
      .select(col("sessions"), col("events"),
        col("p500_dur_s"), col("p900_dur_s"), col("p990_dur_s"),
        col("p500_events"), col("p900_events"), col("p990_events"))
  }

  def sessionLengthOracleSql(gapSeconds: Long = 1800L): String = {
    def qArm(measure: String, out: String): String =
      s"""(SELECT
         | max(CASE WHEN p = 500 THEN q END) AS p500_$out,
         | max(CASE WHEN p = 900 THEN q END) AS p900_$out,
         | max(CASE WHEN p = 990 THEN q END) AS p990_$out
         |FROM (
         | SELECT p, min(v) AS q FROM (
         |  SELECT $measure AS v,
         |   sum(count(*)) OVER (ORDER BY $measure) AS cum,
         |   sum(count(*)) OVER () AS cnt
         |  FROM ses GROUP BY $measure) g
         | CROSS JOIN (VALUES (500), (900), (990)) pr(p)
         | WHERE cum >= greatest((p * cnt + 999) // 1000, 1)
         | GROUP BY p))""".stripMargin
    s"""WITH e AS (
       | SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
       |g AS (
       | SELECT *, CASE WHEN t - lag(t) OVER w IS NULL
       |   OR t - lag(t) OVER w >= ${gapSeconds * 1000000L} THEN 1 ELSE 0 END
       |  AS new_session
       | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       |sid AS (
       | SELECT *, sum(new_session) OVER (PARTITION BY user_id
       |  ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS session_id
       | FROM g),
       |ses AS (
       | SELECT user_id, session_id, count(*) AS n_events,
       |  (max(t) - min(t)) // 1000000 AS dur_s
       | FROM sid GROUP BY 1, 2),
       |t AS (SELECT count(*) AS sessions, sum(n_events) AS events FROM ses)
       |SELECT CAST(sessions AS BIGINT) AS sessions,
       | CAST(events AS BIGINT) AS events,
       | CAST(p500_dur AS BIGINT) AS p500_dur_s,
       | CAST(p900_dur AS BIGINT) AS p900_dur_s,
       | CAST(p990_dur AS BIGINT) AS p990_dur_s,
       | CAST(p500_ev AS BIGINT) AS p500_events,
       | CAST(p900_ev AS BIGINT) AS p900_events,
       | CAST(p990_ev AS BIGINT) AS p990_events
       |FROM t, ${qArm("dur_s", "dur")} dq, ${qArm("n_events", "ev")} eq""".stripMargin
  }

  val LatencyQuantilesPermille: Seq[Int] = Seq(500, 900, 990)

  /** Fulfillment-latency SLA per order priority: whole-day ship lag
    * (`l_shipdate − o_orderdate`) rolled to count/avg/P50/P90/P99. The
    * lineitem→orders equi-join is the one real exchange (at 100 TB
    * neither side broadcasts — an honest fact-to-fact shuffle on the
    * order key); the corpus then collapses to the priority×day grid and
    * the quantiles are the same histogram rank-select walk as
    * [[TemporalOps.gapQuantiles]] — metadata-sized, no per-group sort.
    */
  def shipLatencyQuantiles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
      expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
        .as("ship_d"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("order_d"),
      col("o_orderpriority").as("priority"))
    val lat = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("priority"), (col("ship_d") - col("order_d")).as("days"))
    val hist = lat.groupBy("priority", "days").agg(count(lit(1)).as("c"),
      sum("days").as("dsum"))
    val wCum = Window.partitionBy("priority").orderBy("days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("cnt", sum("c").over(Window.partitionBy("priority")))
      .withColumn("tot_days",
        sum("dsum").over(Window.partitionBy("priority")))
      .withColumn("p",
        explode(array(LatencyQuantilesPermille.map(lit): _*)))
      .filter(col("cum") >= expr("greatest((p * cnt + 999) div 1000, 1)"))
      .groupBy(col("priority"), col("cnt").as("lineitems"),
        expr("tot_days div cnt").as("avg_days"))
      .pivot("p", LatencyQuantilesPermille.map(_.toString))
      .agg(min("days"))
      .select(col("priority") +: col("lineitems") +: col("avg_days") +:
        LatencyQuantilesPermille.map(p => col(p.toString).as(s"p${p}_d")): _*)
      .orderBy("priority")
  }

  def shipLatencyOracleSql(): String = {
    val values = LatencyQuantilesPermille.map(p => s"($p)").mkString(", ")
    val cols = LatencyQuantilesPermille
      .map(p => s"CAST(max(CASE WHEN p = $p THEN q END) AS BIGINT) AS p${p}_d")
      .mkString(",\n ")
    s"""WITH lat AS (
       | SELECT o.o_orderpriority AS priority,
       |  epoch_us(l.l_shipdate) // 86400000000
       |   - epoch_us(o.o_orderdate) // 86400000000 AS days
       | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |h AS (SELECT priority, days, count(*) AS c, sum(days) AS dsum
       |      FROM lat GROUP BY 1, 2),
       |cm AS (
       | SELECT priority, days,
       |  sum(c) OVER (PARTITION BY priority ORDER BY days) AS cum,
       |  sum(c) OVER (PARTITION BY priority) AS cnt,
       |  sum(dsum) OVER (PARTITION BY priority) AS tot_days
       | FROM h),
       |q AS (
       | SELECT priority, cnt, tot_days, p, min(days) AS q
       | FROM cm CROSS JOIN (VALUES $values) pr(p)
       | WHERE cum >= greatest((p * cnt + 999) // 1000, 1)
       | GROUP BY 1, 2, 3, 4)
       |SELECT priority, CAST(cnt AS BIGINT) AS lineitems,
       | CAST(tot_days // cnt AS BIGINT) AS avg_days,
       | $cols
       |FROM q GROUP BY priority, cnt, tot_days ORDER BY priority""".stripMargin
  }
}
