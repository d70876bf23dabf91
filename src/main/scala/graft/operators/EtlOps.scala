package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ETL pipeline operators, re-expressed Spark-first.
  *
  * Semantics mirror the reference ETL workload
  * (reference: analysis/etl_spark.py:119-259): data-quality assessment,
  * `when/otherwise` categorical bucketing, single- and multi-key groupBy
  * aggregation, range-validation cleansing, composite feature scores and the
  * summary export aggregate — mapped onto the driver's synthetic tables
  * (`events`, `documents`, `lineitem`).
  *
  * Scale notes (100 TB): every operator here is a single declarative plan —
  * scans push filters/projections into parquet, aggregations are hash
  * aggregates with partial (map-side) combine, and nothing ever collects to
  * the driver. Doubles that cross the oracle boundary are rounded; money
  * sums use decimals so results are bit-stable under any partition order.
  */
object EtlOps {

  /** Partition-order-stable rounded mean of a double column: sum on an
    * exact decimal basis (order-independent), one double division, one
    * round. A straight `round(avg(double))` can flip its last digit with
    * partition count because IEEE summation is order-dependent — this form
    * hash-matches the oracle at any parallelism.
    */
  private[operators] def stableAvg(c: Column, scale: Int): Column =
    round(sum(c.cast("decimal(25,10)")).cast("double") / count(c), scale)

  /** Same for integral columns, where `sum` is already exact. */
  private[operators] def stableAvgLong(c: Column, scale: Int): Column =
    round(sum(c).cast("double") / count(c), scale)

  /** Data-quality assessment (reference: analysis/etl_spark.py:119-129):
    * row count, null counts, invalid-range count, avg/max/min. One-row
    * output; a single partial-aggregate pass over the table.
    */
  def qualityStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      count(lit(1)).as("total_rows"),
      sum(when(col("value").isNull, 1).otherwise(0)).cast("long").as("null_value"),
      sum(when(col("props").isNull, 1).otherwise(0)).cast("long").as("null_props"),
      sum(when(col("value") < 0, 1).otherwise(0)).cast("long").as("invalid_value"),
      stableAvg(col("value"), 4).as("avg_value"),
      round(max("value"), 2).as("max_value"),
      round(min("value"), 2).as("min_value"))

  /** Categorical bucketing columns for `documents`
    * (reference: analysis/etl_spark.py:143-159 word_length_category /
    * readability_level / sentiment_category buckets). Pure `when/otherwise`
    * column expressions — fully codegen'd, no shuffle.
    */
  def docBuckets(df: DataFrame): DataFrame =
    df.withColumn("length_category",
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 350, "medium")
          .otherwise("long"))
      .withColumn("lang_group",
        when(col("lang") === "en", "english")
          .when(col("lang").isin("es", "fr", "de"), "european")
          .otherwise("other"))
      .withColumn("source_bucket",
        when(col("source").isin("src0", "src1", "src2", "src3", "src4"), "head")
          .otherwise("tail"))

  /** Per-document bucketized projection, deterministic order. */
  def bucketize(s: SparkSession, dir: String): DataFrame =
    docBuckets(Tables.documents(s, dir))
      .select("doc_id", "length_category", "lang_group", "source_bucket")
      .orderBy("doc_id")

  /** Single-key groupBy aggregation ordered by count desc
    * (reference: analysis/etl_spark.py:163-168 sentiment aggregation).
    * Also exercises regex field extraction from the JSON props payload —
    * a native `regexp_extract`, not a UDF, so it stays in codegen.
    */
  def eventTypeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        stableAvg(col("value"), 4).as("avg_value"),
        stableAvgLong(col("k"), 4).as("avg_k"))
      .orderBy(desc("cnt"), col("event_type"))

  /** Multi-key groupBy aggregation
    * (reference: analysis/etl_spark.py:179-183 readability × word-length).
    */
  def langLengthAgg(s: SparkSession, dir: String): DataFrame =
    docBuckets(Tables.documents(s, dir))
      .groupBy("lang", "length_category")
      .agg(
        count(lit(1)).as("cnt"),
        stableAvgLong(col("n_chars"), 4).as("avg_chars"))
      .orderBy(col("lang"), desc("cnt"), col("length_category"))

  /** Validation filter for events
    * (reference: analysis/etl_spark.py:194-199 cleansing ranges). */
  def cleanFilter: Column =
    col("value").between(0, 10000) && col("user_id") >= 0 &&
      col("props").isNotNull && col("ts").isNotNull

  /** Cleansing summary: rows kept vs removed
    * (reference: analysis/etl_spark.py:201-203). One aggregate pass —
    * counts both sides in a single scan instead of the reference's two
    * `count()` actions.
    */
  def cleanCount(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      sum(when(cleanFilter, 1).otherwise(0)).cast("long").as("clean_rows"),
      sum(when(cleanFilter, 0).otherwise(1)).cast("long").as("removed_rows"))

  /** Composite arithmetic feature scores on lineitem
    * (reference: analysis/etl_spark.py:207-212 engagement/complexity/quality
    * scores). Rounding happens at each value's natural decimal grid (price
    * and rates carry 2 decimals, so products live on 1e-4 / 1e-6 grids) —
    * coarser rounding would sit on exact half-boundaries where engines'
    * double-rounding rules diverge. The division has no decimal grid, so it
    * is fixed-pointed with pure IEEE ops (`floor(x*1000 + 0.5)`) that every
    * engine computes bit-identically.
    */
  def compositeScores(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6)
          .as("charged_price"),
        floor(col("l_extendedprice") / (col("l_quantity") + lit(1)) * 1000 + 0.5)
          .cast("long").as("value_density_milli"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
      // (sf0.01 carries ~12k duplicate pairs with distinct payloads), so
      // the output sort must be total over every emitted column — engines
      // ordered duplicate keys identically at sf0.01 only by luck, and the
      // sf1 rehearsal (where Tables.parallelized reshuffles the scan)
      // exposed the tie. Residual ties are now bit-identical rows.
      .orderBy("l_orderkey", "l_linenumber", "net_price", "charged_price",
        "value_density_milli")

  /** Schema'd JSON payload parsing (the production path for the `props`
    * column — `from_json` with a declared schema stays in codegen and
    * yields typed fields; the regexp extraction in [[eventTypeAgg]] is
    * the schemaless fallback). Integer aggregates keep it engine-exact.
    */
  def jsonPropsStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("k_count"),
        sum(col("k")).cast("long").as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy("event_type")

  /** Global final metrics over the scored rows
    * (reference: analysis/etl_spark.py:216-224: one-row count/avg/max
    * aggregate of the composite scores). Averages are decimal-basis so
    * the one-row output is partition-order stable; maxima are exact.
    */
  def finalMetrics(s: SparkSession, dir: String): DataFrame =
    compositeScores(s, dir).agg(
      count(lit(1)).as("final_row_count"),
      stableAvg(col("net_price"), 4).as("avg_net_price"),
      stableAvg(col("charged_price"), 4).as("avg_charged_price"),
      stableAvgLong(col("value_density_milli"), 4).as("avg_value_density_milli"),
      max("net_price").as("max_net_price"),
      max("charged_price").as("max_charged_price"),
      max("value_density_milli").as("max_value_density_milli"))

  /** Summary-export aggregate (reference: analysis/etl_spark.py:253-259
    * summary_stats groupBy two categoricals + avg scores): events bucketed
    * by type × value band.
    */
  def summaryStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("value_band",
        when(col("value") < 25, "low")
          .when(col("value") < 75, "mid")
          .otherwise("high"))
      .groupBy("event_type", "value_band")
      .agg(
        count(lit(1)).as("cnt"),
        stableAvg(col("value"), 4).as("avg_value"))
      .orderBy("event_type", "value_band")

  /** Known language strata for the pivot — passed EXPLICITLY so the pivot
    * compiles to one conditional-aggregation pass. (Omitting the value
    * list makes Spark first run a distinct scan and collect the values to
    * the driver — an extra full pass a 100 TB pipeline must not pay.)
    */
  val PivotLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Wide corpus-mix report: documents per (source, language) pivoted to
    * one row per source with a column per language. One scan, one
    * aggregation exchange — the pivot is pure conditional aggregation.
    */
  def langPivot(s: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.documents(s, dir)
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
    pivoted
      .select(
        col("source") +:
          PivotLangs.map(l => coalesce(col(l), lit(0L)).as(s"${l}_docs")): _*)
      .orderBy("source")
  }

  val PivotOracleSql: String = {
    val cols = PivotLangs
      .map(l =>
        s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS ${l}_docs")
      .mkString(",\n ")
    s"""SELECT source,
       | $cols
       |FROM documents GROUP BY source ORDER BY source""".stripMargin
  }

  /** Shard-merge aggregation: compute per-(day, type) partial aggregates
    * on two disjoint event shards, union the partials, and re-aggregate —
    * the incremental-maintenance shape of every 100 TB metrics pipeline
    * (yesterday's compacted partials + today's increment re-aggregate
    * instead of rescanning history). The ORACLE computes the aggregate
    * DIRECTLY over the unsharded table, so the gate proves the merge is
    * exactly associative: counts re-sum and decimal sums re-add with no
    * drift (the property that fails if someone "optimizes" the partial
    * to a rounded double).
    *
    * Scale shape: each shard's partial agg is map-side combined and
    * keyed on (day, type); the merge re-aggregates frames whose size is
    * key-cardinality-bounded, not row-bounded.
    */
  def shardMergeAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      expr("ts_us div 86400000000").as("epoch_day"),
      col("event_type"), col("event_id"), col("value"))
    val shards = (0L to 1L).map { k =>
      ev.filter(col("event_id") % 2 === k)
        .groupBy("epoch_day", "event_type")
        .agg(
          count(lit(1)).as("c"),
          sum(col("value").cast("decimal(25,10)")).as("v"))
    }
    shards.reduce(_ union _)
      .groupBy("epoch_day", "event_type")
      .agg(
        sum("c").as("events"),
        floor(coalesce(sum("v"), lit(0).cast("decimal(25,10)")) * 1000)
          .cast("long").as("value_milli"))
      .orderBy("epoch_day", "event_type")
  }

  /** Direct unsharded aggregate — the independent formulation. */
  val ShardMergeOracleSql: String =
    """SELECT epoch_us(ts) // 86400000000 AS epoch_day, event_type,
      | count(*) AS events,
      | CAST(floor(coalesce(sum(CAST(value AS DECIMAL(25,10))), 0) * 1000) AS BIGINT) AS value_milli
      |FROM events GROUP BY 1, 2 ORDER BY epoch_day, event_type""".stripMargin
}
