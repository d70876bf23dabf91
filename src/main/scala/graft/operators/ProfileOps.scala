package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dataset profiling: the per-column statistics export a catalog / data
  * registry publishes for every table version, and the user-lifetime
  * survival curve a cohort dashboard draws. Both collapse the corpus to
  * metadata-sized results in one declarative aggregate.
  */
object ProfileOps {

  private val DayUs = 86400000000L

  /** Per-column profile of the `events` table — one row per column with
    * non-null / null / exact-distinct counts and typed min/max (numeric
    * columns in `min_num`/`max_num`, string columns in `min_s`/`max_s`;
    * doubles rounded to 4 so the IEEE text of the stored value, not a
    * re-parse, decides the hash). The six exact `count(distinct)`s ride
    * ONE scan via Catalyst's Expand (×cols row blow-up before the
    * partial aggregate — the documented cost of exactness; at 100 TB a
    * catalog would swap these for the mergeable HLL registers of
    * [[HllOps]] per column, same output shape, and keep the rest of the
    * row unchanged). The single result row fans out to per-column rows
    * with `stack`, so nothing is re-scanned per column.
    */
  def profileColumns(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("ts_us"), col("user_id"), col("event_type"),
      col("value"), col("props"))
    def prof(c: String) = Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"))
    val aggd = ev.agg(
      count(lit(1)).as("total"),
      (Seq("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .flatMap(prof) ++ Seq(
        min("event_id").as("mn_event_id"), max("event_id").as("mx_event_id"),
        min("ts_us").as("mn_ts_us"), max("ts_us").as("mx_ts_us"),
        min("user_id").as("mn_user_id"), max("user_id").as("mx_user_id"),
        expr("round(min(value), 4)").as("mn_value"),
        expr("round(max(value), 4)").as("mx_value"),
        min("event_type").as("mn_event_type"),
        max("event_type").as("mx_event_type"),
        min("props").as("mn_props"), max("props").as("mx_props"))): _*)
    def numRow(c: String) =
      s"'$c', nn_$c, total - nn_$c, nd_$c, cast(mn_$c as double), cast(mx_$c as double), cast(null as string), cast(null as string)"
    def strRow(c: String) =
      s"'$c', nn_$c, total - nn_$c, nd_$c, cast(null as double), cast(null as double), mn_$c, mx_$c"
    aggd.select(expr(
      s"""stack(6,
         | ${numRow("event_id")},
         | ${numRow("ts_us")},
         | ${numRow("user_id")},
         | ${strRow("event_type")},
         | ${numRow("value")},
         | ${strRow("props")}
         |) AS (col_name, n_nonnull, n_null, n_distinct, min_num, max_num, min_s, max_s)""".stripMargin))
      .orderBy("col_name")
  }

  /** Same statistics as independent per-column scans — a genuinely
    * different plan, so the Expand/stack fusion is cross-checked.
    */
  val ProfileColumnsOracleSql: String = {
    // Distinct counts run over the RAW value; only the exported min/max
    // round (monotonic, so round(min) == min(round)).
    def num(c: String, v: String, mm: String => String = identity) =
      s"""SELECT '$c' AS col_name, count($v) AS n_nonnull,
         | count(*) - count($v) AS n_null,
         | count(DISTINCT $v) AS n_distinct,
         | CAST(${mm(s"min($v)")} AS DOUBLE) AS min_num,
         | CAST(${mm(s"max($v)")} AS DOUBLE) AS max_num,
         | CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
         |FROM events""".stripMargin
    def str(c: String) =
      s"""SELECT '$c', count($c), count(*) - count($c), count(DISTINCT $c),
         | CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min($c), max($c)
         |FROM events""".stripMargin
    Seq(
      num("event_id", "event_id"),
      num("ts_us", "epoch_us(ts)"),
      num("user_id", "user_id"),
      str("event_type"),
      num("value", "value", x => s"round($x, 4)"),
      str("props")).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** User-lifetime survival curve: for every day offset k on the dense
    * `0..max-lifetime` spine, how many users were still active ≥ k days
    * after their first event (lifetime = last-day − first-day), as a
    * count and ppm of the cohort. The corpus collapses to one row per
    * user (map-side combined), then to one row per observed lifetime;
    * the survival prefix is a descending running sum over the
    * metadata-sized day spine — calendar-bounded, never data-bounded.
    */
  def survivalCurve(s: SparkSession, dir: String): DataFrame = {
    val life = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(expr(s"max(ts_us div $DayUs) - min(ts_us div $DayUs)").as("lifetime"))
    val byLife = life.groupBy("lifetime").agg(count(lit(1)).as("cnt"))
    val bounds = byLife.agg(
      max("lifetime").as("mx"), sum("cnt").as("cohort"))
    val spine = bounds
      .select(explode(expr("sequence(0L, mx)")).as("days_active"),
        col("cohort"))
    spine
      .join(byLife.withColumnRenamed("lifetime", "days_active"),
        Seq("days_active"), "left")
      .withColumn("surviving",
        sum(coalesce(col("cnt"), lit(0L)))
          .over(Window.orderBy(desc("days_active"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("days_active"), col("cohort"), col("surviving"),
        expr("(1000000 * surviving) div cohort").as("surviving_ppm"))
      .orderBy("days_active")
  }

  val SurvivalCurveOracleSql: String =
    s"""WITH life AS (
       | SELECT user_id,
       |  max(epoch_us(ts) // $DayUs) - min(epoch_us(ts) // $DayUs) AS lifetime
       | FROM events GROUP BY user_id),
       |byl AS (SELECT lifetime, count(*) AS cnt FROM life GROUP BY lifetime),
       |b AS (SELECT max(lifetime) AS mx, sum(cnt) AS cohort FROM byl),
       |spine AS (
       | SELECT unnest(generate_series(0, mx)) AS days_active, cohort FROM b),
       |s AS (
       | SELECT sp.days_active, sp.cohort,
       |  sum(coalesce(byl.cnt, 0)) OVER (ORDER BY sp.days_active DESC
       |   ROWS UNBOUNDED PRECEDING) AS surviving
       | FROM spine sp LEFT JOIN byl ON byl.lifetime = sp.days_active)
       |SELECT days_active, CAST(cohort AS BIGINT) AS cohort,
       | CAST(surviving AS BIGINT) AS surviving,
       | CAST((1000000 * surviving) // cohort AS BIGINT) AS surviving_ppm
       |FROM s ORDER BY days_active""".stripMargin
}
