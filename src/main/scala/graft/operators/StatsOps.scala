package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Per-group exact median of an integral column via histogram
    * rank-select (the [[WindowOps.medianDensityByFlag]] machinery,
    * generalized): collapse to per-(group, value) counts first, so the
    * cumulative window's partition is the bounded value domain — never
    * row count — and the k-th smallest falls out of the first histogram
    * cell whose cumulative count reaches k. `(lo + hi) div 2` averages
    * the two middle values on even counts, all in integers.
    */
  private def histMedian(df: DataFrame, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("cnt", sum("c").over(Window.partitionBy("event_type")))
    val lo = cum.filter(expr("cum >= (cnt + 1) div 2"))
      .groupBy("event_type").agg(min("v").as("v_lo"))
    val hi = cum.filter(expr("cum >= cnt div 2 + 1"))
      .groupBy("event_type").agg(min("v").as("v_hi"))
    lo.join(hi, "event_type")
      .select(col("event_type"), expr("(v_lo + v_hi) div 2").as(out))
  }

  /** Robust per-type outlier audit: median/MAD instead of mean/σ — the
    * estimator a heavy-tailed `value` distribution needs, since a single
    * extreme deliverable drags μ and σ toward itself (masking) while the
    * median and the median-absolute-deviation have a 50% breakdown
    * point. Flags rows with `|v − median| > k·MAD` in milli fixed point;
    * every comparison is integer arithmetic on the histogram medians.
    *
    * Scale shape: three scan passes (value median, deviation median,
    * flag count), each collapsing into a bounded (type × value-domain)
    * histogram shuffle; the two one-row-per-type stat frames ride
    * broadcasts. No corpus-sized shuffle, no per-row window.
    */
  def outlierEventsRobust(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    robustOutliers(
      Tables.events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), col("value")),
      k)

  /** Core of [[outlierEventsRobust]] over any (event_type, value) frame
    * — split out so the masking property (robust flags what k-sigma
    * misses under a dragged mean) is testable on planted data.
    */
  def robustOutliers(typedValues: DataFrame, k: Int): DataFrame = {
    val ev = typedValues.select(col("event_type"),
      expr("cast(floor(value * 1000 + 0.5) as long)").as("v"))
    val med = histMedian(ev, "median_milli")
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"),
        abs(col("v") - col("median_milli")).as("d"))
    val mad = histMedian(dev.select(col("event_type"), col("d").as("v")), "mad_milli")
    ev.join(broadcast(med.join(mad, "event_type")), "event_type")
      .select(col("event_type"), col("median_milli"), col("mad_milli"),
        (abs(col("v") - col("median_milli")) > lit(k.toLong) * col("mad_milli"))
          .cast("long").as("is_outlier"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        max("median_milli").as("median_milli"),
        max("mad_milli").as("mad_milli"),
        sum("is_outlier").cast("long").as("outliers"))
      .orderBy("event_type")
  }

  def robustOracleSql(k: Int = 3): String = {
    def medianCte(src: String, tag: String, out: String): String =
      s"""h$tag AS (SELECT event_type, v, count(*) AS c FROM $src GROUP BY 1, 2),
         |c$tag AS (
         | SELECT event_type, v,
         |  sum(c) OVER (PARTITION BY event_type ORDER BY v
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(c) OVER (PARTITION BY event_type) AS cnt
         | FROM h$tag),
         |lo$tag AS (
         | SELECT event_type, min(v) AS v_lo FROM c$tag
         | WHERE cum >= (cnt + 1) // 2 GROUP BY 1),
         |hi$tag AS (
         | SELECT event_type, min(v) AS v_hi FROM c$tag
         | WHERE cum >= cnt // 2 + 1 GROUP BY 1),
         |$out AS (
         | SELECT event_type, (v_lo + v_hi) // 2 AS m
         | FROM lo$tag JOIN hi$tag USING (event_type))""".stripMargin
    s"""WITH e AS (
       | SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
       | FROM events WHERE value IS NOT NULL),
       |${medianCte("e", "1", "med")},
       |d AS (
       | SELECT e.event_type, abs(e.v - med.m) AS v
       | FROM e JOIN med USING (event_type)),
       |${medianCte("d", "2", "mad")}
       |SELECT e.event_type, count(*) AS n,
       | max(med.m) AS median_milli, max(mad.m) AS mad_milli,
       | CAST(sum(CAST(abs(e.v - med.m) > $k * mad.m AS BIGINT)) AS BIGINT)
       |  AS outliers
       |FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
       |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin
  }

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

  /** Per-label embedding L2-norm audit — the vector-quality gate an
    * embedding feed runs before indexing (un-normalized or zeroed
    * vectors poison cosine ANN silently). The per-row norm is the
    * codegen [[graft.functions.FloatVecDot]] self-dot (left-to-right
    * double fold, the SAME order as the oracle's list_sum — the
    * equivalence the whole ANN suite already hash-proves) quantized to
    * e6 fixed-point BEFORE any cross-row step, so the label rollup is
    * pure integer aggregation: one scan, |labels| output rows.
    */
  def embeddingNorms(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        expr("cast(floor(sqrt(vec_dot(embedding, embedding)) * 1000000 + 0.5) as long)")
          .as("norm_e6"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("vectors"),
        min("norm_e6").as("min_norm_e6"),
        max("norm_e6").as("max_norm_e6"),
        expr("sum(norm_e6) div count(*)").as("avg_norm_e6"),
        sum(when(col("norm_e6") === 0L, 1L).otherwise(0L)).as("zero_vectors"))
      .orderBy("label")

  val EmbeddingNormsOracleSql: String =
    """WITH n AS (
      | SELECT label,
      |  CAST(floor(sqrt(list_sum(list_transform(embedding,
      |    a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)))) * 1000000 + 0.5)
      |   AS BIGINT) AS norm_e6
      | FROM embeddings)
      |SELECT CAST(label AS BIGINT) AS label, count(*) AS vectors,
      | min(norm_e6) AS min_norm_e6, max(norm_e6) AS max_norm_e6,
      | CAST(sum(norm_e6) // count(*) AS BIGINT) AS avg_norm_e6,
      | CAST(sum(CASE WHEN norm_e6 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |  AS zero_vectors
      |FROM n GROUP BY label ORDER BY label""".stripMargin

  /** Per-dimension mean/variance of the embedding space — the collapsed-
    * dimension detector (a dim with ~zero variance carries no signal and
    * flags a truncated or constant feature). Values quantize to e6
    * fixed-point per element; the variance identity `(n·Σx²−(Σx)²)/n²`
    * then runs entirely in DECIMAL(38,0) integers (n is cast into the
    * decimal domain so n² never overflows BIGINT at 10¹² rows/dim), so
    * the output is bit-identical cross-engine. posexplode partial-
    * aggregates map-side to the 64-cell grid — the exchange is dims-
    * sized regardless of corpus.
    */
  def embeddingDimStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        expr("cast(floor(cast(x as double) * 1000000 + 0.5) as long)").as("x_fp"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x_fp").cast("decimal(38,0)")).as("sx"),
        sum((col("x_fp").cast("decimal(38,0)")
          * col("x_fp").cast("decimal(38,0)"))).as("sxx"))
      .select(col("dim"), col("n"),
        expr("cast(sx div n as long)").as("mean_fp"),
        expr("cast((n * sxx - sx * sx) div (cast(n as decimal(38,0)) * n) as long)")
          .as("var_fp2"))
      .orderBy("dim")

  def embeddingDimStatsOracleSql(): String =
    s"""WITH x AS (
       | SELECT t.i - 1 AS dim,
       |  CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x_fp
       | FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${EmbedDims + 1})) AS i) t),
       |g AS (
       | SELECT dim, count(*) AS n, sum(x_fp) AS sx, sum(x_fp * x_fp) AS sxx
       | FROM x GROUP BY dim)
       |SELECT CAST(dim AS BIGINT) AS dim, n,
       | CAST(sx // n AS BIGINT) AS mean_fp,
       | CAST((n * sxx - sx * sx) // (n * n) AS BIGINT) AS var_fp2
       |FROM g ORDER BY dim""".stripMargin

  /** Int8 quantization-error audit over the embedding table: simulate
    * symmetric per-vector int8 quantization (`scale = max|x|/127`,
    * `q = clamp(floor(x/scale + 0.5), ±127)` — half-up, i.e. negative
    * half-steps round toward +inf; NOT banker's or away-from-zero
    * rounding) and report, per label, the worst and average
    * reconstruction error plus the saturated-dimension count. A
    * dimension is "saturated" when its pre-clamp magnitude REACHES the
    * ±127 rail — by that definition each vector's own amax dimension
    * always counts, so `saturated_dims >= vectors` by construction and
    * the column reads as "rail-touching dims", an upper bound on actual
    * clipping (strictly-beyond-rail clipping is impossible under
    * per-vector scaling; under a SHARED scale this same census would
    * count true clips). The go/no-go readout before shipping a
    * 4×-compressed ANN index (compare `ann_pq_topk`'s 32×). Every
    * per-element step is a single
    * IEEE-754 double op (both engines compute them bit-identically),
    * frozen to e9 fixed point per VECTOR via the order-independent
    * `array_max` BEFORE the integer group aggregate — no
    * float-summation-order hazard anywhere. One narrow pass, |labels|
    * output rows.
    */
  def embeddingInt8Audit(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"), col("embedding"))
      .withColumn("amax",
        expr("array_max(transform(embedding, x -> abs(cast(x as double))))"))
      .withColumn("scale", col("amax") / lit(127.0d))
      .withColumn("err_fp", expr(
        """cast(floor(CASE WHEN amax > 0D THEN
          |  array_max(transform(embedding, x ->
          |    abs(cast(x as double) -
          |        greatest(least(floor(cast(x as double) / scale + 0.5D),
          |                       127.0D), -127.0D) * scale)))
          |  ELSE 0D END * 1000000000.0D) as long)"""
          .stripMargin.replace("\n", " ")))
      .withColumn("n_sat", expr(
        """CASE WHEN amax > 0D THEN
          |  cast(size(filter(embedding, x ->
          |    floor(abs(cast(x as double)) / scale + 0.5D) >= 127.0D))
          |   as long)
          |ELSE 0L END""".stripMargin.replace("\n", " ")))
      .groupBy("label")
      .agg(
        count(lit(1)).as("vectors"),
        max("err_fp").as("max_err_e9"),
        expr("sum(err_fp) div count(*)").as("avg_err_e9"),
        sum("n_sat").as("saturated_dims"))
      .orderBy("label")

  val EmbeddingInt8AuditOracleSql: String =
    """WITH v AS (
      | SELECT label, embedding,
      |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
      |   AS amax
      | FROM embeddings),
      |w AS (
      | SELECT label,
      |  CASE WHEN amax > 0 THEN CAST(floor(list_max(list_transform(embedding,
      |    x -> abs(CAST(x AS DOUBLE) -
      |      greatest(least(floor(CAST(x AS DOUBLE) / (amax / CAST(127.0 AS DOUBLE)) + CAST(0.5 AS DOUBLE)),
      |                     CAST(127.0 AS DOUBLE)), CAST(-127.0 AS DOUBLE))
      |      * (amax / CAST(127.0 AS DOUBLE)))))
      |    * CAST(1000000000.0 AS DOUBLE)) AS BIGINT) ELSE 0 END AS err_fp,
      |  CASE WHEN amax > 0 THEN CAST(len(list_filter(embedding,
      |    x -> floor(abs(CAST(x AS DOUBLE)) / (amax / CAST(127.0 AS DOUBLE)) + CAST(0.5 AS DOUBLE))
      |         >= CAST(127.0 AS DOUBLE))) AS BIGINT) ELSE 0 END AS n_sat
      | FROM v)
      |SELECT CAST(label AS BIGINT) AS label, count(*) AS vectors,
      | max(err_fp) AS max_err_e9,
      | CAST(sum(err_fp) // count(*) AS BIGINT) AS avg_err_e9,
      | CAST(sum(n_sat) AS BIGINT) AS saturated_dims
      |FROM w GROUP BY label ORDER BY label""".stripMargin

  /** Heavy-user concentration — "what share of traffic do the top 1% of
    * users generate", the one-line skew summary next to `key_gini`'s
    * full curve. Top-k membership is EXACT: users rank by (count,
    * user_id) through [[RankOps.withHierarchicalRank]] (bucket-parallel,
    * no single-partition window), k = max(users/100, 1), and the rollup
    * is one integer aggregate against the broadcast totals row.
    */
  def heavyUserShare(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(s, dir).groupBy("user_id")
      .agg(count(lit(1)).as("cnt"))
    val totals = u.agg(count(lit(1)).as("users"), sum("cnt").as("events"))
    RankOps.withHierarchicalRank(u, Seq.empty, "cnt", "user_id",
        "cnt div 16", "rk")
      .crossJoin(broadcast(totals))
      .withColumn("k", expr("greatest(users div 100, 1)"))
      .agg(
        max("users").as("users"),
        max("events").as("events"),
        max("k").as("top_users"),
        sum(when(col("rk") > col("users") - col("k"), col("cnt"))
          .otherwise(0L)).as("top_events"))
      .select(col("users"), col("events"), col("top_users"),
        col("top_events"),
        expr("(1000000 * top_events) div events").as("top_share_ppm"))
  }

  val HeavyUserShareOracleSql: String =
    """WITH u AS (
      | SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
      |t AS (
      | SELECT count(*) AS users, sum(cnt) AS events,
      |  greatest(count(*) // 100, 1) AS k
      | FROM u),
      |r AS (
      | SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rk FROM u)
      |SELECT (SELECT users FROM t) AS users,
      | CAST((SELECT events FROM t) AS BIGINT) AS events,
      | CAST((SELECT k FROM t) AS BIGINT) AS top_users,
      | CAST(sum(CASE WHEN rk > (SELECT users FROM t) - (SELECT k FROM t)
      |  THEN cnt ELSE 0 END) AS BIGINT) AS top_events,
      | CAST((1000000 * sum(CASE WHEN rk > (SELECT users FROM t) -
      |  (SELECT k FROM t) THEN cnt ELSE 0 END))
      |  // (SELECT events FROM t) AS BIGINT) AS top_share_ppm
      |FROM r""".stripMargin

  /** Winsorized per-type value statistics — the robust mean a metrics
    * pipeline reports when raw means are hostage to tail spikes: each
    * type's values clip to its own exact [P5, P95] (cents fixed-point,
    * histogram rank-select bounds — no per-group sort), then aggregate.
    * Two passes over events (bounds grid, then the clipped rollup with
    * the |types|-row bounds broadcast); output is pure integers: n,
    * raw/winsorized mean cents, and how many rows clipped at each side.
    */
  def winsorizedValueStats(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
    val hist = ev.groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("cnt", sum("c").over(Window.partitionBy("event_type")))
      .withColumn("p", explode(array(lit(50), lit(950))))
      .filter(col("cum") >= expr("greatest((p * cnt + 999) div 1000, 1)"))
      .groupBy("event_type")
      .pivot("p", Seq("50", "950"))
      .agg(min("cents"))
      .select(col("event_type"), col("50").as("lo"), col("950").as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_type"), col("cents"), col("lo"), col("hi"),
        least(greatest(col("cents"), col("lo")), col("hi")).as("clipped"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        expr("sum(cents) div count(*)").as("raw_mean_cents"),
        expr("sum(clipped) div count(*)").as("wins_mean_cents"),
        sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("clipped_low"),
        sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("clipped_high"))
      .orderBy("event_type")
  }

  def winsorizedOracleSql(): String =
    """WITH e AS (
      | SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      | FROM events WHERE value IS NOT NULL),
      |h AS (SELECT event_type, cents, count(*) AS c FROM e GROUP BY 1, 2),
      |cm AS (
      | SELECT event_type, cents,
      |  sum(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
      |  sum(c) OVER (PARTITION BY event_type) AS cnt
      | FROM h),
      |b AS (
      | SELECT event_type,
      |  max(CASE WHEN p = 50 THEN q END) AS lo,
      |  max(CASE WHEN p = 950 THEN q END) AS hi
      | FROM (
      |  SELECT event_type, p, min(cents) AS q
      |  FROM cm CROSS JOIN (VALUES (50), (950)) pr(p)
      |  WHERE cum >= greatest((p * cnt + 999) // 1000, 1)
      |  GROUP BY 1, 2)
      | GROUP BY event_type)
      |SELECT e.event_type, count(*) AS n,
      | CAST(sum(cents) // count(*) AS BIGINT) AS raw_mean_cents,
      | CAST(sum(least(greatest(cents, lo), hi)) // count(*) AS BIGINT)
      |  AS wins_mean_cents,
      | CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
      |  AS clipped_low,
      | CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
      |  AS clipped_high
      |FROM e JOIN b USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Per-type OLS trend of `value` against time — is each event class's
    * value drifting, and how fast. The normal-equation terms
    * `n·Σxy − Σx·Σy` and `n·Σx² − (Σx)²` accumulate EXACTLY in
    * DECIMAL(38,0) over hour-granular centered time (x ≤ corpus span in
    * hours, so the products stay far inside 38 digits even at 10¹² rows);
    * only the final slope division runs in doubles, quantized by the
    * engine-portable `floor(x·10⁴ + 0.5)` — both conversions and the
    * division are IEEE-deterministic, so the output is bit-identical.
    * One map-side-combined aggregate per type after a broadcast of the
    * global min-timestamp scalar; no shuffle beyond the |types| rows.
    */
  def trendByType(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
    val origin = ev.agg(min("ts_us").as("mn"))
    val xy = ev.crossJoin(broadcast(origin))
      .select(col("event_type"),
        expr("(ts_us - mn) div 3600000000").as("x"),
        expr("cast(floor(value * 1000 + 0.5) as long)").as("y"))
    xy.groupBy("event_type")
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      .select(col("event_type"), col("n").cast("long").as("n"),
        expr("""cast(floor(10000.0 *
            (cast(n * sxy - sx * sy as double) /
             cast(n * sxx - sx * sx as double)) + 0.5) as long)""")
          .as("slope_e4"))
      .orderBy("event_type")
  }

  def trendOracleSql(): String =
    """WITH o AS (SELECT min(epoch_us(ts)) AS mn FROM events),
      |xy AS (
      | SELECT event_type,
      |  (epoch_us(ts) - o.mn) // 3600000000 AS x,
      |  CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y
      | FROM events, o WHERE value IS NOT NULL),
      |g AS (
      | SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |  sum(x * y) AS sxy, sum(x * x) AS sxx
      | FROM xy GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      | CAST(floor(10000.0 *
      |  (CAST(n * sxy - sx * sy AS DOUBLE) /
      |   CAST(n * sxx - sx * sx AS DOUBLE)) + 0.5) AS BIGINT) AS slope_e4
      |FROM g ORDER BY event_type""".stripMargin

  /** Per-type Theil–Sen (median-of-pairwise-slopes) trend — the robust
    * twin of [[trendByType]]: one wild day cannot move the estimate the
    * way it drags OLS. The series is first collapsed to the DAILY grain
    * (exact milli sums), so the pair stage is quadratic in DAYS — the
    * time-span domain, not the row count: at 100 TB a three-year corpus
    * is ~1000 days ⇒ ≤ 500k pairs per type, regardless of per-day row
    * volume, and the daily frame itself is |types|·|days| rows after one
    * map-side-combined aggregate. Each pair slope quantizes by the
    * engine-portable `floor(x·10⁴ + 0.5)` IEEE chain; the median is the
    * exact lower-median rank select (the histogram-cum machinery, ties
    * collapsed before the window so the sort domain is distinct slopes).
    */
  def theilSenTrend(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
    val daily = ev
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(sum(expr("cast(floor(value * 1000 + 0.5) as long)"))
        .cast("decimal(38,0)").as("y"))
    val nDays = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        expr("""cast(floor(10000.0 *
            (cast(b.y - a.y as double) / cast(b.day - a.day as double))
            + 0.5) as long)""").as("slope_e4"))
    val counts = pairs.groupBy("event_type", "slope_e4")
      .agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum",
        sum("c").over(Window.partitionBy("event_type").orderBy("slope_e4")))
      .withColumn("n_pairs",
        sum("c").over(Window.partitionBy("event_type")))
    cum.filter(col("cum") >= expr("(n_pairs + 1) div 2"))
      .groupBy("event_type")
      .agg(min("slope_e4").as("sen_slope_e4"), max("n_pairs").as("n_pairs"))
      .join(nDays, Seq("event_type"))
      .select("event_type", "n_days", "n_pairs", "sen_slope_e4")
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[theilSenTrend]]: identical daily collapse, pair
    * slopes, and lower-median rank select.
    */
  def theilSenOracleSql(): String =
    """WITH d AS (
      | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS y
      | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |nd AS (SELECT event_type, count(*) AS n_days FROM d GROUP BY 1),
      |p AS (
      | SELECT a.event_type,
      |  CAST(floor(10000.0 *
      |   (CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE))
      |   + 0.5) AS BIGINT) AS slope_e4
      | FROM d a JOIN d b
      |  ON a.event_type = b.event_type AND a.day < b.day),
      |h AS (SELECT event_type, slope_e4, count(*) AS c FROM p GROUP BY 1, 2),
      |cm AS (
      | SELECT event_type, slope_e4,
      |  sum(c) OVER (PARTITION BY event_type ORDER BY slope_e4) AS cum,
      |  sum(c) OVER (PARTITION BY event_type) AS n_pairs
      | FROM h),
      |sen AS (
      | SELECT event_type, min(slope_e4) AS sen_slope_e4,
      |  CAST(max(n_pairs) AS BIGINT) AS n_pairs
      | FROM cm WHERE cum >= (n_pairs + 1) // 2 GROUP BY event_type)
      |SELECT s.event_type, nd.n_days, s.n_pairs, s.sen_slope_e4
      |FROM sen s JOIN nd USING (event_type)
      |ORDER BY s.event_type""".stripMargin

  /** Quantile-transform lookup table — the rank-based feature
    * normalization (sklearn QuantileTransformer shape) a training
    * pipeline applies to heavy-tailed numerics: per event type, each
    * DISTINCT milli-quantized value maps to its min-rank quantile in
    * ppm, `q_ppm = 10⁶·(rank_min − 1) div (n − 1)` (min value → 0, max
    * → 10⁶; ties share the row, so equal values always transform
    * equally). Emitting the TABLE rather than transformed rows is the
    * 100 TB shape: output is |types × distinct milli values| (the
    * value-domain bound, same trick as the exact-median machinery), and
    * the pipeline broadcast-joins it back wherever needed. One corpus
    * collapse + a distinct-value-domain window.
    */
  def quantileTransformTable(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(floor(value * 1000 + 0.5) as long)").as("value_milli"))
    ev.groupBy("event_type", "value_milli").agg(count(lit(1)).as("n_rows"))
      .withColumn("cum",
        sum("n_rows").over(Window.partitionBy("event_type")
          .orderBy("value_milli")))
      .withColumn("n",
        sum("n_rows").over(Window.partitionBy("event_type")))
      .select(col("event_type"), col("value_milli"), col("n_rows"),
        expr("(1000000 * (cum - n_rows)) div greatest(n - 1, 1)")
          .as("q_ppm"))
      .orderBy("event_type", "value_milli")
  }

  def quantileTransformOracleSql(): String =
    """WITH v AS (
      | SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS value_milli
      | FROM events WHERE value IS NOT NULL),
      |g AS (
      | SELECT event_type, value_milli, count(*) AS n_rows
      | FROM v GROUP BY 1, 2),
      |c AS (
      | SELECT event_type, value_milli, n_rows,
      |  sum(n_rows) OVER (PARTITION BY event_type ORDER BY value_milli) AS cum,
      |  sum(n_rows) OVER (PARTITION BY event_type) AS n
      | FROM g)
      |SELECT event_type, value_milli, CAST(n_rows AS BIGINT) AS n_rows,
      | CAST((1000000 * (cum - n_rows)) // greatest(n - 1, 1) AS BIGINT) AS q_ppm
      |FROM c ORDER BY event_type, value_milli""".stripMargin

  /** Fano-factor burstiness per event type over the zero-filled daily
    * volume grid: `F = Var/mean` of daily counts — F ≈ 1000 milli is
    * Poisson-like arrivals, above is bursty, below regular. Exact
    * integers end to end via the normal-equation identity
    * `n²·Var = n·Σc² − (Σc)²` and one truncating division:
    * `fano_milli = 1000·(n·Σc² − S1²) div (n·S1)`. One
    * map-side-combined daily aggregate + a |types|-row rollup; the day
    * spine zero-fills so silent days count as variance, not absence.
    */
  def burstinessFano(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"))
    val spine = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val counts = ev.groupBy("day", "event_type").agg(count(lit(1)).as("c"))
    spine.crossJoin(ev.select("event_type").distinct())
      .join(broadcast(counts), Seq("day", "event_type"), "left")
      .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum("c").as("s1"),
        sum(expr("c * c")).as("s2"))
      .select(col("event_type"), col("n_days"),
        expr("(1000 * s1) div n_days").as("mean_milli"),
        expr("(1000 * (n_days * s2 - s1 * s1)) div (n_days * s1)")
          .as("fano_milli"))
      .orderBy("event_type")
  }

  def burstinessFanoOracleSql(): String =
    """WITH e AS (
      | SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
      |spine AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b),
      |t AS (SELECT DISTINCT event_type FROM e),
      |c AS (SELECT day, event_type, count(*) AS c FROM e GROUP BY 1, 2),
      |g AS (
      | SELECT s.day, t.event_type, coalesce(c.c, 0) AS c
      | FROM spine s CROSS JOIN t
      | LEFT JOIN c ON c.day = s.day AND c.event_type = t.event_type),
      |a AS (
      | SELECT event_type, count(*) AS n_days, sum(c) AS s1, sum(c * c) AS s2
      | FROM g GROUP BY event_type)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      | CAST((1000 * s1) // n_days AS BIGINT) AS mean_milli,
      | CAST((1000 * (n_days * s2 - s1 * s1)) // (n_days * s1) AS BIGINT)
      |  AS fano_milli
      |FROM a ORDER BY event_type""".stripMargin

  /** Equi-width 20-bucket histogram of `events.value` — the distribution
    * export a profiler draws. Bucket edges derive from the global
    * min/max scalar pair (broadcast); the bucket index arithmetic is a
    * fixed IEEE expression shared with the oracle, and the output is
    * pure integers. One scan + a 20-key map-side-combined aggregate.
    */
  def valueHistogram(s: SparkSession, dir: String, buckets: Int = 20): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
    val bounds = ev.agg(min("value").as("mn"), max("value").as("mx"),
      count(lit(1)).as("total"))
    ev.crossJoin(broadcast(bounds))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(buckets - 1L),
            expr(s"cast(floor(($buckets.0 * (value - mn)) / (mx - mn)) as long)")))
          .as("bucket"),
        col("total"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), first("total").as("total"))
      .select(col("bucket"), col("cnt"),
        expr("(1000 * cnt) div total").as("pct_milli"))
      .orderBy("bucket")
  }

  def valueHistogramOracleSql(buckets: Int = 20): String =
    s"""WITH b AS (SELECT min(value) AS mn, max(value) AS mx, count(*) AS total
       |          FROM events WHERE value IS NOT NULL),
       |h AS (
       | SELECT CASE WHEN b.mx = b.mn THEN 0
       |  ELSE least(${buckets - 1},
       |   CAST(floor(($buckets.0 * (value - b.mn)) / (b.mx - b.mn)) AS BIGINT))
       |  END AS bucket
       | FROM events, b WHERE value IS NOT NULL)
       |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS cnt,
       | (1000 * count(*)) // (SELECT total FROM b) AS pct_milli
       |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Total-variation drift between the first and second half of the
    * observation window: events split at the midpoint day (scalar
    * min/max broadcast), each arm's `value` distribution buckets into
    * the shared 20-bin equi-width grid (same binning contract as
    * [[valueHistogram]]), and the drift is `TV = Σ&#124;p_A − p_B&#124; / 2` in
    * ppm — the log-free sibling of PSI, exact in integers, reporting
    * "how much did the value distribution move" next to
    * [[graft.operators.TemporalOps.driftCusum]]'s "did volume move".
    * Two scans (bounds, then bucket counts) and a 20-row collapse.
    */
  def driftTv(s: SparkSession, dir: String, buckets: Int = 20): DataFrame = {
    val DayUs = 86400000000L
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
    val bounds = ev.agg(
      min("value").as("mn"), max("value").as("mx"),
      expr(s"min(ts_us div $DayUs)").as("d0"),
      expr(s"max(ts_us div $DayUs)").as("d1"))
    val arms = ev.crossJoin(broadcast(bounds))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(buckets - 1L),
            expr(s"cast(floor(($buckets.0 * (value - mn)) / (mx - mn)) as long)")))
          .as("bucket"),
        (expr(s"ts_us div $DayUs") <= expr("(d0 + d1) div 2")).as("early"))
      .groupBy("bucket")
      .agg(
        sum(when(col("early"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("cb"))
    val tot = arms.agg(sum("ca").as("na"), sum("cb").as("nb"))
    arms.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        abs(expr("(1000000 * ca) div greatest(na, 1)") -
          expr("(1000000 * cb) div greatest(nb, 1)")).as("d"))
      .groupBy("na", "nb") // single group: both are constants
      .agg(expr("sum(d) div 2").as("tv_ppm"))
      .select(col("na").as("events_a"), col("nb").as("events_b"),
        col("tv_ppm"))
  }

  val DriftTvOracleSql: String = {
    val buckets = 20
    val dayUs = 86400000000L
    s"""WITH e AS (
       | SELECT value, epoch_us(ts) // $dayUs AS day FROM events
       | WHERE value IS NOT NULL),
       |b AS (SELECT min(value) AS mn, max(value) AS mx,
       |  min(day) AS d0, max(day) AS d1 FROM e),
       |h AS (
       | SELECT CASE WHEN b.mx = b.mn THEN 0
       |  ELSE least(${buckets - 1},
       |   CAST(floor(($buckets.0 * (value - b.mn)) / (b.mx - b.mn)) AS BIGINT))
       |  END AS bucket,
       |  day <= (b.d0 + b.d1) // 2 AS early
       | FROM e, b),
       |arms AS (
       | SELECT bucket,
       |  sum(CASE WHEN early THEN 1 ELSE 0 END) AS ca,
       |  sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS cb
       | FROM h GROUP BY bucket),
       |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM arms)
       |SELECT CAST(t.na AS BIGINT) AS events_a, CAST(t.nb AS BIGINT) AS events_b,
       | CAST(sum(abs((1000000 * ca) // greatest(t.na, 1)
       |  - (1000000 * cb) // greatest(t.nb, 1))) // 2 AS BIGINT) AS tv_ppm
       |FROM arms, t GROUP BY t.na, t.nb""".stripMargin
  }

  /** Kolmogorov–Smirnov distance of each source's doc-length
    * distribution from the corpus distribution, in ppm — "which source
    * is length-shaped unlike the rest", the distributional companion of
    * the mixture audits. Exact-integer CDFs: per-(source, n_chars)
    * counts collapse map-side; cumulative sums run over the
    * (source × distinct-values) grid — value-domain-bounded metadata,
    * never doc rows; the global CDF broadcast-joins in; KS is the max
    * |cdf_src − cdf_all| per source. No sampling, no doubles.
    */
  def ksSourceDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bySrcVal = docs.groupBy("source", "n_chars")
      .agg(count(lit(1)).as("c"))
    val srcTot = bySrcVal.groupBy("source").agg(sum("c").as("n_src"))
    val byVal = bySrcVal.groupBy("n_chars").agg(sum("c").as("cg"))
    val globTot = byVal.agg(sum("cg").as("n_all"))
    val globCdf = byVal
      .withColumn("cum_g", sum("cg").over(Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(globTot))
      .select(col("n_chars"),
        expr("(1000000 * cum_g) div n_all").as("cdf_all_ppm"))
    // Every source must evaluate its CDF at EVERY observed value (a
    // source with no docs at value v still has a CDF step there), so the
    // grid is (source × value) with a per-source running sum.
    val grid = srcTot.crossJoin(byVal.select("n_chars"))
    val srcCdf = grid
      .join(bySrcVal, Seq("source", "n_chars"), "left")
      .withColumn("cum_s",
        sum(coalesce(col("c"), lit(0L)))
          .over(Window.partitionBy("source").orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("source"), col("n_chars"), col("n_src"),
        expr("(1000000 * cum_s) div n_src").as("cdf_src_ppm"))
    srcCdf.join(broadcast(globCdf), Seq("n_chars"))
      .groupBy("source")
      .agg(first("n_src").as("docs"),
        max(abs(col("cdf_src_ppm") - col("cdf_all_ppm"))).as("ks_ppm"))
      .orderBy("source")
  }

  val KsSourceDriftOracleSql: String =
    """WITH bv AS (
      | SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
      |st AS (SELECT source, sum(c) AS n_src FROM bv GROUP BY source),
      |gv AS (SELECT n_chars, sum(c) AS cg FROM bv GROUP BY n_chars),
      |gt AS (SELECT sum(cg) AS n_all FROM gv),
      |gc AS (
      | SELECT n_chars,
      |  (1000000 * sum(cg) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING))
      |   // (SELECT n_all FROM gt) AS cdf_all_ppm
      | FROM gv),
      |grid AS (SELECT st.source, st.n_src, gv.n_chars FROM st CROSS JOIN gv),
      |sc AS (
      | SELECT g.source, g.n_chars, g.n_src,
      |  (1000000 * sum(coalesce(bv.c, 0)) OVER (PARTITION BY g.source
      |    ORDER BY g.n_chars ROWS UNBOUNDED PRECEDING)) // g.n_src
      |   AS cdf_src_ppm
      | FROM grid g LEFT JOIN bv ON bv.source = g.source
      |  AND bv.n_chars = g.n_chars)
      |SELECT sc.source, CAST(any_value(sc.n_src) AS BIGINT) AS docs,
      | CAST(max(abs(sc.cdf_src_ppm - gc.cdf_all_ppm)) AS BIGINT) AS ks_ppm
      |FROM sc JOIN gc USING (n_chars)
      |GROUP BY sc.source ORDER BY source""".stripMargin

  /** Sequence-integrity audit of `event_id`: how many ids are missing
    * from the observed [min, max] range, and the widest gaps (the "did
    * ingestion drop a batch" check). Scale shape: per-bucket (id div B)
    * min/max/count collapse map-side; interior missing counts are pure
    * per-bucket arithmetic, boundary gaps stitch with ONE lag over the
    * bucket grid (metadata-sized), so no corpus-wide window ever runs.
    * Top-k widest gaps ride a TakeOrdered.
    */
  def idGapAudit(
      s: SparkSession,
      dir: String,
      bucket: Long = 4096L,
      k: Int = 10): DataFrame =
    idGapsOf(Tables.events(s, dir).select(col("event_id")), bucket, k)

  /** Same audit over any single-column `event_id` frame — the spec
    * drives this with synthetic hole-filled sequences (the production
    * table is dense, which exercises only the no-gap path).
    */
  def idGapsOf(ids: DataFrame, bucket: Long = 4096L, k: Int = 10): DataFrame = {
    val buckets = ids.groupBy(expr(s"event_id div $bucket").as("bk"))
      .agg(count(lit(1)).as("c"), min("event_id").as("mn"),
        max("event_id").as("mx"))
    val w = Window.orderBy("bk")
    buckets
      .withColumn("prev_mx", lag("mx", 1).over(w))
      .select(
        // Missing inside the bucket's own [mn, mx] span…
        (col("mx") - col("mn") + 1L - col("c")).as("interior"),
        // …plus the hole between this bucket and the previous one.
        when(col("prev_mx").isNull, lit(0L))
          .otherwise(col("mn") - col("prev_mx") - 1L).as("boundary"))
      .agg(sum(expr("interior + boundary")).as("missing_ids"))
      .select(lit("total").as("kind"), lit(0L).as("gap_start"),
        col("missing_ids").as("width"))
      .unionAll(
        buckets.withColumn("prev_mx", lag("mx", 1).over(w))
          .filter(col("prev_mx").isNotNull &&
            col("mn") - col("prev_mx") > 1L)
          .select(lit("gap").as("kind"), (col("prev_mx") + 1L).as("gap_start"),
            (col("mn") - col("prev_mx") - 1L).as("width"))
          .orderBy(desc("width"), col("gap_start")).limit(k))
      .orderBy(col("kind"), desc("width"), col("gap_start"))
  }

  def idGapAuditOracleSql(bucket: Long = 4096L, k: Int = 10): String =
    s"""WITH b AS (
       | SELECT event_id // $bucket AS bk, count(*) AS c,
       |  min(event_id) AS mn, max(event_id) AS mx
       | FROM events GROUP BY 1),
       |lagd AS (
       | SELECT *, lag(mx) OVER (ORDER BY bk) AS prev_mx FROM b),
       |total AS (
       | SELECT 'total' AS kind, 0::BIGINT AS gap_start,
       |  CAST(sum((mx - mn + 1 - c) +
       |   CASE WHEN prev_mx IS NULL THEN 0 ELSE mn - prev_mx - 1 END)
       |   AS BIGINT) AS width
       | FROM lagd),
       |gaps AS (
       | SELECT 'gap' AS kind, prev_mx + 1 AS gap_start,
       |  mn - prev_mx - 1 AS width
       | FROM lagd WHERE prev_mx IS NOT NULL AND mn - prev_mx > 1
       | ORDER BY width DESC, gap_start LIMIT $k)
       |SELECT kind, CAST(gap_start AS BIGINT) AS gap_start,
       | CAST(width AS BIGINT) AS width FROM (
       | SELECT * FROM total UNION ALL SELECT * FROM gaps)
       |ORDER BY kind, width DESC, gap_start""".stripMargin

  private val CorrCols = Seq("quantity", "extprice", "discount", "tax")
  private val CorrSrc = Map(
    "quantity" -> "l_quantity", "extprice" -> "l_extendedprice",
    "discount" -> "l_discount", "tax" -> "l_tax")

  /** Pairwise Pearson correlation matrix over the four lineitem measures
    * — the feature-screening export an ML pipeline runs before training.
    * Values quantize to milli fixed point (`floor(x·1000 + 0.5)`, pure
    * IEEE, bit-identical in both engines); all 15 moment sums (4 sums, 4
    * squares, 6 cross products, 1 count) ride ONE scan in exact
    * DECIMAL(38,0), and each pair's r is a single double expression over
    * those exact integers, floor-quantized to e6 — so the only floating
    * step is the final well-conditioned ratio. The 6 output rows fan out
    * of the one-row aggregate via `stack`. At far larger row counts the
    * uncentered squares approach DECIMAL(38,0)'s range; the production
    * form subtracts a broadcast integer pre-mean first (same shape, one
    * extra scalar pass) — documented here, not needed at bench scale.
    */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(CorrCols.map(c =>
      expr(s"cast(floor(${CorrSrc(c)} * 1000 + 0.5) as decimal(38,0))")
        .as(c)): _*)
    val pairs = CorrCols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val sums =
      Seq(count(lit(1)).cast("decimal(38,0)").as("n")) ++
        CorrCols.map(c => sum(col(c)).as(s"s_$c")) ++
        CorrCols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    val aggd = li.agg(sums.head, sums.tail: _*)
    val rows = pairs.map { case (a, b) =>
      s"""'$a', '$b', cast(n as long),
         | cast(floor(1000000.0 *
         |  (cast(n * sp_${a}_$b - s_$a * s_$b as double) /
         |   (sqrt(cast(n * ss_$a - s_$a * s_$a as double)) *
         |    sqrt(cast(n * ss_$b - s_$b * s_$b as double)))) + 0.5) as long)""".stripMargin
    }
    aggd.select(expr(
      s"stack(${pairs.size}, ${rows.mkString(", ")}) AS (col_x, col_y, n, corr_e6)"))
      .orderBy("col_x", "col_y")
  }

  val CorrMatrixOracleSql: String = {
    val cols = CorrCols
    val q = cols.map(c =>
      s"CAST(floor(${CorrSrc(c)} * 1000 + 0.5) AS HUGEINT) AS $c").mkString(", ")
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val moments =
      Seq("count(*) AS n") ++
        cols.map(c => s"sum($c) AS s_$c") ++
        cols.map(c => s"sum($c * $c) AS ss_$c") ++
        pairs.map { case (a, b) => s"sum($a * $b) AS sp_${a}_$b" }
    val rows = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n,
         | CAST(floor(1000000.0 *
         |  (CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE) /
         |   (sqrt(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE)) *
         |    sqrt(CAST(n * ss_$b - s_$b * s_$b AS DOUBLE)))) + 0.5) AS BIGINT)
         |  AS corr_e6
         |FROM g""".stripMargin
    }
    s"""WITH v AS (SELECT $q FROM lineitem),
       |g AS (SELECT ${moments.mkString(", ")} FROM v)
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** Benford first-digit conformance audit over `lineitem.
    * l_extendedprice` — the classic fraud/synthetic-data smell test: a
    * naturally-grown price population follows `P(d) = log10(1+1/d)`;
    * fabricated or truncated feeds don't. The first digit comes from
    * the decimal string of `floor(price)` (prices are ≥ 1 here) — NO
    * `log10` anywhere, because float logs are engine-variant while
    * integer→string is not (the same discipline as [[TextOps]]'
    * bit-length surprise). Expected shares are the Benford per-mille
    * constants as literals, identical in both engines; the output is
    * pure integers (counts, observed/expected per-mille, absolute
    * deviation), so the hash oracle is exact. One scan, a 9-key
    * map-side-combined aggregate, one broadcast scalar total.
    */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val total = li.agg(count(lit(1)).as("total"))
    li.select(
        substring(expr("cast(cast(floor(l_extendedprice) as bigint) as string)"),
          1, 1).as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(
        col("digit"), col("cnt"),
        expr("(1000 * cnt) div total").as("obs_permille"),
        expr(BenfordCase).as("benford_permille"))
      .withColumn("abs_dev_permille",
        abs(col("obs_permille") - col("benford_permille")))
      .orderBy("digit")
  }

  /** round(1000*log10(1+1/d)) for d = 1..9, as shared literals. */
  private val BenfordMilli =
    Seq(1 -> 301, 2 -> 176, 3 -> 125, 4 -> 97, 5 -> 79, 6 -> 67,
      7 -> 58, 8 -> 51, 9 -> 46)
  private val BenfordCase: String =
    "CASE digit " +
      BenfordMilli.map { case (d, m) => s"WHEN '$d' THEN ${m}L" }
        .mkString(" ") + " END"

  def benfordOracleSql(): String = {
    val cases = "CASE digit " +
      BenfordMilli.map { case (d, m) => s"WHEN '$d' THEN $m" }
        .mkString(" ") + " END"
    s"""WITH d AS (
       | SELECT substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
       |  1, 1) AS digit
       | FROM lineitem),
       |t AS (SELECT count(*) AS total FROM d),
       |g AS (SELECT digit, count(*) AS cnt FROM d GROUP BY digit)
       |SELECT digit, cnt,
       | (1000 * cnt) // (SELECT total FROM t) AS obs_permille,
       | CAST($cases AS BIGINT) AS benford_permille,
       | abs((1000 * cnt) // (SELECT total FROM t)
       |  - CAST($cases AS BIGINT)) AS abs_dev_permille
       |FROM g ORDER BY digit""".stripMargin
  }

  /** The permille probes the quantile-sketch audit reports. */
  val SketchQuantiles: Seq[Int] = Seq(500, 900, 990)

  /** Mergeable histogram-quantile sketch with an exact error audit —
    * the deterministic stand-in for a KLL/t-digest at 100 TB, where the
    * exact path (a per-type full-resolution value histogram) is what you
    * CANNOT afford per dashboard refresh: the sketch is a fixed-grid
    * (type, bucket = floor(v_milli / width)) count — ONE map-side-
    * combined aggregation whose state is bounded by types × range/width
    * regardless of row count, mergeable across shards/streams by plain
    * addition — and its estimate (the probed bucket's LOWER edge) is
    * wrong by construction by less than one bucket width. This query
    * runs BOTH paths and emits the realized error next to that bound,
    * per event type × {p50, p90, p99}: est ≤ exact < est + width, so
    * `err_milli ∈ [0, width)` is a hash-gated contract, not a hope.
    *
    * The grid is data-independent (no min/max pre-pass): bucket ids are
    * signed floor-division of the milli value, so negative values land
    * in negative buckets and two sketches built on different corpora
    * still merge. Rank convention: smallest value whose cumulative count
    * reaches ceil(q·n/1000) (the same type-1 convention as the exact
    * quantile family). The per-type windows run over value-domain-
    * bounded histogram frames — the [[WindowOps]] argument: their size
    * is the GRID, not the corpus.
    */
  def quantileSketchAudit(
      s: SparkSession, dir: String, widthMilli: Int = 250): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000 + 0.5).cast("long").as("vm"))
    // floor of a double division — IEEE-pure and bit-identical in both
    // engines (|vm| << 2^53), unlike integral `div` whose
    // truncation-toward-zero would fold negative values into bucket 0.
    val bucketed = ev.withColumn("bucket",
      floor(col("vm").cast("double") / widthMilli).cast("long"))
    val qs = array(SketchQuantiles.map(lit): _*)
    def probes(hist: DataFrame, valueCol: String, outCol: String): DataFrame = {
      val wCum = Window.partitionBy("event_type").orderBy(valueCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
        .withColumn("q", explode(qs))
        .filter(col("cum") >= expr("greatest((q * n + 999) div 1000, 1)"))
        .groupBy("event_type", "q")
        .agg(min(valueCol).as(outCol), max("n").as(s"n_$outCol"))
    }
    val sketch = probes(
      bucketed.groupBy("event_type", "bucket").agg(count(lit(1)).as("c")),
      "bucket", "bkt")
    val exact = probes(
      ev.groupBy("event_type", "vm").agg(count(lit(1)).as("c")),
      "vm", "exact_milli")
    sketch.join(exact, Seq("event_type", "q"))
      .select(col("event_type"), col("q").cast("long").as("q_milli"),
        col("n_bkt").as("n"),
        (col("bkt") * widthMilli).as("est_milli"),
        col("exact_milli"),
        (col("exact_milli") - col("bkt") * widthMilli).as("err_milli"))
      .orderBy("event_type", "q_milli")
  }

  /** DuckDB oracle for [[quantileSketchAudit]]. */
  def quantileSketchOracleSql(widthMilli: Int = 250): String = {
    val values = SketchQuantiles.map(q => s"($q)").mkString(", ")
    s"""WITH v AS (
       | SELECT event_type,
       |  CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
       | FROM events WHERE value IS NOT NULL),
       |b AS (SELECT event_type, CAST(floor(CAST(vm AS DOUBLE) / $widthMilli) AS BIGINT) AS bucket FROM v),
       |hs AS (SELECT event_type, bucket, count(*) AS c FROM b GROUP BY 1, 2),
       |cs AS (
       | SELECT event_type, bucket,
       |  sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
       |  sum(c) OVER (PARTITION BY event_type) AS n
       | FROM hs),
       |es AS (
       | SELECT event_type, q, min(bucket) AS bkt, CAST(max(n) AS BIGINT) AS n
       | FROM cs CROSS JOIN (VALUES $values) pr(q)
       | WHERE cum >= greatest((q * n + 999) // 1000, 1) GROUP BY 1, 2),
       |hx AS (SELECT event_type, vm, count(*) AS c FROM v GROUP BY 1, 2),
       |cx AS (
       | SELECT event_type, vm,
       |  sum(c) OVER (PARTITION BY event_type ORDER BY vm) AS cum,
       |  sum(c) OVER (PARTITION BY event_type) AS n
       | FROM hx),
       |ex AS (
       | SELECT event_type, q, min(vm) AS exact_milli
       | FROM cx CROSS JOIN (VALUES $values) pr(q)
       | WHERE cum >= greatest((q * n + 999) // 1000, 1) GROUP BY 1, 2)
       |SELECT es.event_type, CAST(es.q AS BIGINT) AS q_milli, es.n,
       | es.bkt * $widthMilli AS est_milli, ex.exact_milli,
       | ex.exact_milli - es.bkt * $widthMilli AS err_milli
       |FROM es JOIN ex ON es.event_type = ex.event_type AND es.q = ex.q
       |ORDER BY es.event_type, q_milli""".stripMargin
  }
}
