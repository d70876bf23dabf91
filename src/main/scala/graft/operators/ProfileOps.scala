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

  /** Dataset card — the one-page data sheet a corpus release ships
    * (Datasheets for Datasets, Gebru et al. 2018): corpus volumes,
    * language/source diversity, exact-dup mass, quality-filter survival,
    * and the eval-decontamination removal, as (stat, value) rows. A
    * capstone COMPOSITION readout: each line reuses a gated family's
    * expressions verbatim (dedup_exact's digest distinct, quality_filter's
    * rules, decontamination_stats' fingerprint carve), so the card can
    * never drift from the pipelines it summarizes.
    *
    * Scale shape: three scans (volumes + digest distinct, quality rules,
    * decon anti-join) each collapsing to one row, crossJoined to the
    * 11-row stat stack — the anti-join's eval side is the broadcast
    * digest set, exactly the decontaminate plan.
    */
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.tokens).cast("long")).as("n_tokens"),
      sum("n_chars").as("n_chars"),
      countDistinct("lang").as("n_langs"),
      countDistinct("source").as("n_sources"),
      countDistinct(sha2(col("text"), 256)).as("n_distinct"))
    val qual = TextOps.qualityFlags(docs)
      .agg(sum("keep").as("quality_kept"))
    val evalSet = docs.filter(
      graft.functions.GraftFunctions.poly_hash(
        col("text"), 31, 1000000007L) % 10 === 0)
    val deconKept = TextOps.decontaminate(docs, evalSet)
      .agg(count(lit(1)).as("kept_decon"))
    base.crossJoin(qual).crossJoin(deconKept)
      .selectExpr(
        """stack(11,
          | 'decon_removed', n_docs - kept_decon,
          | 'exact_dup_docs', n_docs - n_distinct,
          | 'exact_dup_ppm', (1000000 * (n_docs - n_distinct)) div n_docs,
          | 'mean_doc_tokens_milli', (1000 * n_tokens) div n_docs,
          | 'n_chars', n_chars,
          | 'n_docs', n_docs,
          | 'n_langs', n_langs,
          | 'n_sources', n_sources,
          | 'n_tokens', n_tokens,
          | 'quality_kept', quality_kept,
          | 'quality_kept_ppm', (1000000 * quality_kept) div n_docs
          |) as (stat, value)""".stripMargin)
      .orderBy("stat")
  }

  /** DuckDB oracle for [[datasetCard]]: identical volumes, digest
    * distinct, quality rules, and fingerprint carve.
    */
  val DatasetCardOracleSql: String =
    """WITH base AS (
      | SELECT count(*) AS n_docs,
      |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT source) AS n_sources,
      |  count(DISTINCT sha256(text)) AS n_distinct
      | FROM documents),
      |qual AS (
      | SELECT CAST(sum(CASE WHEN n_tokens >= 20
      |   AND (1000 * n_chars_nows) // greatest(n_tokens, 1) BETWEEN 3000 AND 5000
      |   AND n_stopwords > 0
      |   AND (1000 * n_punct) // greatest(n_tokens, 1) <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS quality_kept
      | FROM (
      |  SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |   CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars_nows,
      |   CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
      |   CAST(len(regexp_extract_all(text, '\b(the|and|is|of|to|in|it|a)\b')) AS BIGINT) AS n_stopwords
      |  FROM documents)),
      |ev AS (
      | SELECT DISTINCT sha256(text) AS d FROM documents
      | WHERE list_reduce(list_prepend(0::BIGINT,
      |   list_transform(regexp_extract_all(text, '(?s).'), c -> unicode(c)::BIGINT)),
      |  (acc, x) -> (acc * 31 + x) % 1000000007) % 10 = 0),
      |dec AS (
      | SELECT CAST(count(*) AS BIGINT) AS kept_decon FROM documents
      | WHERE sha256(text) NOT IN (SELECT d FROM ev))
      |SELECT stat, CAST(value AS BIGINT) AS value FROM (
      | SELECT 'decon_removed' AS stat, (SELECT n_docs FROM base) - kept_decon AS value FROM dec
      | UNION ALL SELECT 'exact_dup_docs', n_docs - n_distinct FROM base
      | UNION ALL SELECT 'exact_dup_ppm', (1000000 * (n_docs - n_distinct)) // n_docs FROM base
      | UNION ALL SELECT 'mean_doc_tokens_milli', (1000 * n_tokens) // n_docs FROM base
      | UNION ALL SELECT 'n_chars', n_chars FROM base
      | UNION ALL SELECT 'n_docs', n_docs FROM base
      | UNION ALL SELECT 'n_langs', n_langs FROM base
      | UNION ALL SELECT 'n_sources', n_sources FROM base
      | UNION ALL SELECT 'n_tokens', n_tokens FROM base
      | UNION ALL SELECT 'quality_kept', quality_kept FROM qual
      | UNION ALL SELECT 'quality_kept_ppm', (1000000 * quality_kept) // (SELECT n_docs FROM base) FROM qual)
      |ORDER BY stat""".stripMargin
}
