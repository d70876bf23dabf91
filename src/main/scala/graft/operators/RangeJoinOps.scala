package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Range (interval) join without an equi-key, made shuffle-joinable by
  * interval bucketing — the second of the brief's named custom operators
  * (as-of join, range join, sketch).
  *
  * The naive plan for `L join R ON r.t BETWEEN l.t AND l.t + W` with no
  * equality column is a broadcast-nested-loop over |L|×|R| — a
  * scale-killer. The standard fix: quantize time into buckets of width
  * exactly W. Every right row lands in one bucket; every left interval
  * `[t, t+W]` overlaps AT MOST TWO buckets (floor(t/W) and the next), so
  * exploding the left side to those two bucket keys turns the range join
  * into an equi-join on the bucket + a residual range filter. Work is
  * Σ_b |L_b|·|R_b| — bounded by per-bucket density, not |L|×|R| — and the
  * bucket key shuffles like any other join key (AQE skew-splits a hot
  * bucket). Bucket width = interval width is optimal: wider buckets raise
  * per-bucket density, narrower ones need more probe keys per interval.
  */
object RangeJoinOps {

  /** Per-purchase count of `view` events (any user) within the hour after
    * the purchase — a global temporal co-occurrence query with no shared
    * key. `windowUs` is both the interval and the bucket width. Counts
    * include the purchase instant and exclude the boundary end
    * (`[t, t+W)` half-open, so each view matches a deterministic set of
    * purchases).
    */
  def purchaseViewsWithin(
      s: SparkSession,
      dir: String,
      windowUs: Long = 3600000000L): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_us"),
        explode(array(
          expr(s"ts_us div ${windowUs}L"),
          expr(s"ts_us div ${windowUs}L + 1L"))).as("bucket"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("ts_us").as("v_ts"), expr(s"ts_us div ${windowUs}L").as("bucket"))
    purchases
      .join(views, "bucket")
      .filter(col("v_ts") >= col("ts_us") && col("v_ts") < col("ts_us") + windowUs)
      .groupBy("event_id")
      .agg(count(lit(1)).as("views_within"))
      // Left-join back so purchases with zero matching views still appear
      // (a bare inner-join aggregate would silently drop them).
      .join(ev.filter(col("event_type") === "purchase").select("event_id"),
        Seq("event_id"), "right")
      .select(col("event_id"),
        coalesce(col("views_within"), lit(0L)).as("views_within"))
      .orderBy("event_id")
  }

  def oracleSql(windowUs: Long = 3600000000L): String =
    s"""WITH p AS (
       | SELECT event_id, epoch_us(ts) AS ts_us FROM events
       | WHERE event_type = 'purchase'),
       |v AS (SELECT epoch_us(ts) AS v_ts FROM events WHERE event_type = 'view'),
       |c AS (
       | SELECT p.event_id, count(*) AS views_within
       | FROM p JOIN v ON v.v_ts >= p.ts_us AND v.v_ts < p.ts_us + $windowUs
       | GROUP BY p.event_id)
       |SELECT p.event_id, coalesce(c.views_within, 0) AS views_within
       |FROM p LEFT JOIN c ON p.event_id = c.event_id
       |ORDER BY p.event_id""".stripMargin
}
