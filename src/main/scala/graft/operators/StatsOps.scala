package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution statistics: deterministic σ-threshold outlier detection
  * and per-label embedding centroids — the profiling passes a pipeline
  * runs before setting quality thresholds or seeding coarse quantizers.
  *
  * Numerical design: no standard deviation is ever materialized. The
  * k-sigma test `|v − μ| > kσ` is squared into pure integer arithmetic
  * on milli-scaled values — `(n·v − S)² > k²·(n·SS − S²)` with S = Σv,
  * SS = Σv² — so the decision is bit-identical in any engine (the
  * products exceed Int64 range and run in decimal/hugeint). Centroid
  * sums go NEGATIVE — the sign case integer division must be checked on,
  * and where this repo verified empirically that Spark's `div` and
  * DuckDB's `//` both truncate toward zero, so they agree on every sign.
  */
object StatsOps {

  /** Per-type 2σ outlier audit over `events.value` (milli fixed-point).
    * Two-pass shape (the textbook distributed variance pattern): one
    * map-side-combined aggregation for (n, S, SS) per type — a
    * HANDFUL of rows, broadcast back — then one more scan counting rows
    * beyond the threshold. At 100 TB both passes are scan-bound with no
    * corpus-sized shuffle.
    */
  def outlierEvents(s: SparkSession, dir: String, k: Int = 2): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(floor(value * 1000 + 0.5) as long)").as("v"))
    val stats = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,0)")).as("s"),
      sum((col("v").cast("decimal(38,0)") * col("v").cast("decimal(38,0)")))
        .as("ss"))
    ev.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("n"), col("s"), col("ss"),
        ((col("n").cast("decimal(38,0)") * col("v") - col("s")) *
          (col("n").cast("decimal(38,0)") * col("v") - col("s")) >
          lit(k * k) * (col("n").cast("decimal(38,0)") * col("ss") -
            col("s") * col("s"))).cast("long").as("is_outlier"))
      .groupBy("event_type")
      .agg(
        max("n").as("n"),
        sum("is_outlier").cast("long").as("outliers"),
        max(expr("cast(s div n as long)")).as("mean_milli"))
      .orderBy("event_type")
  }

  def outlierOracleSql(k: Int = 2): String =
    s"""WITH e AS (
       | SELECT event_type,
       |  CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
       | FROM events WHERE value IS NOT NULL),
       |st AS (
       | SELECT event_type, count(*) AS n,
       |  CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
       |  CAST(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS HUGEINT) AS ss
       | FROM e GROUP BY 1),
       |fl AS (
       | SELECT e.event_type, st.n, st.s, st.ss,
       |  CAST((CAST(st.n AS HUGEINT) * e.v - st.s) * (CAST(st.n AS HUGEINT) * e.v - st.s)
       |   > ${k * k} * (CAST(st.n AS HUGEINT) * st.ss - st.s * st.s) AS BIGINT) AS is_outlier
       | FROM e JOIN st ON e.event_type = st.event_type)
       |SELECT event_type, max(n) AS n,
       | CAST(sum(is_outlier) AS BIGINT) AS outliers,
       | CAST(max(s // n) AS BIGINT) AS mean_milli
       |FROM fl GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Embedding dimensionality of the `embeddings` table (TESTDATA.md:
    * FLOAT[64]); the oracle's dim-explode shares the constant.
    */
  val EmbedDims = 64

  /** Per-label centroid of the embedding vectors in micro fixed-point:
    * (label, dim, n, sum_fp, mean_fp). posexplode → groupBy(label, dim)
    * partial-aggregates to label×dim cells on the map side, so the
    * exchange carries ≤ |labels|·dims rows per task regardless of corpus
    * size. The LSH/IVF quantizer seeds read straight off this frame.
    */
  def embeddingCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        expr("cast(floor(cast(x as double) * 1000000 + 0.5) as long)").as("x_fp"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum("x_fp").as("sum_fp"))
      // Negative sums: verified empirically that DuckDB's `//` truncates
      // toward zero exactly like Spark's `div` (-465865 // 50 = -9317),
      // so the plain operators agree on every sign.
      .select(col("label"), col("dim"), col("n"), col("sum_fp"),
        expr("sum_fp div n").as("mean_fp"))
      .orderBy("label", "dim")

  val CentroidsOracleSql: String =
    s"""WITH x AS (
       | SELECT label, t.i - 1 AS dim,
       |  CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x_fp
       | FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${EmbedDims + 1})) AS i) t),
       |g AS (
       | SELECT label, dim, count(*) AS n, CAST(sum(x_fp) AS BIGINT) AS sum_fp
       | FROM x GROUP BY 1, 2)
       |SELECT label, CAST(dim AS BIGINT) AS dim, n, sum_fp,
       | CAST(sum_fp // n AS BIGINT) AS mean_fp
       |FROM g ORDER BY label, dim""".stripMargin
}
