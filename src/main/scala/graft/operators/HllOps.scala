package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic fixed-point HyperLogLog — the register-merge sketch the
  * KMV family ([[SketchOps]]) deliberately avoided, made oracle-checkable.
  *
  * Spark's own `approx_count_distinct` IS HLL++, but its binary registers
  * and float harmonic mean can never hash-match a DuckDB oracle. This
  * implementation keeps the full HLL shape — m=64 registers, per-register
  * max of a geometric observable, harmonic-mean estimate — while making
  * every step exact integer arithmetic on the shared [[SketchOps.P]]/
  * [[SketchOps.K]] multiplicative hash family:
  *
  *  - register index: `h % 64`; register value `v = h div 64` (25 bits).
  *  - geometric observable: `lowbit(v) = v & -v` (2^(trailing zeros)) —
  *    monotone in the classic rank ρ, so the per-register `max(lowbit)`
  *    IS the rank register without ever computing a logarithm. `v = 0`
  *    (probability 2^-25) maps to the sentinel 2^25, the "all zeros" rank.
  *  - harmonic sum in base-2^38 fixed point: each register contributes
  *    `2^38 div (2·maxlow)` — an EXACT power-of-two division (2·maxlow ≤
  *    2^26), so the sum is bit-identical in any engine; empty registers
  *    contribute 2^38 (rank 0).
  *  - estimate: `(709 · 64² · 2^38) div (1000 · S)` — α₆₄ = 0.709 in
  *    milli fixed point; the numerator is ~8.5e17, safely inside Int64.
  *
  * Small-range correction (the classic linear-counting branch, active
  * when any register is empty and the raw estimate is under 2.5·m) needs
  * `ln(m/V)` — transcendental, NOT bit-portable across engines. But V
  * (the empty-register count) only takes values 1..m, so `1000·ln(m/V)`
  * is PRECOMPUTED in Scala for all 64 cases and embedded as integer
  * literals in both the Spark plan and the oracle SQL — the correction
  * becomes a table lookup, deterministic everywhere, and the estimator
  * keeps HLL's published accuracy down to single-digit cardinalities.
  *
  * Scale shape (100 TB): one map-side-combinable `groupBy(register)` over
  * 64 keys — the shuffle carries at most 64·partitions rows of two longs,
  * regardless of corpus size. The merge entry computes per-shard partial
  * registers first and max-merges them, proving the property that makes
  * HLL the sketch of choice for incremental / federated counting: merged
  * registers are IDENTICAL to single-pass registers (max is associative
  * and commutative), asserted by emitting both estimates side by side.
  */
object HllOps {

  import SketchOps.{K, P}

  /** Register count m = 2^6. */
  val Buckets = 64L

  /** Sentinel lowbit for v = 0: 2^25 (v has 25 usable bits). */
  val ZeroSentinel = 33554432L

  /** Fixed-point base for the harmonic sum: 2^38. */
  val HarmonicOne = 274877906944L

  /** α₆₄ · 10³ (Flajolet et al. 2007's bias constant for m = 64). */
  val AlphaMilli = 709L

  /** Raw-estimate ceiling below which linear counting takes over: 2.5·m
    * (the published small-range threshold).
    */
  val SmallRangeCeil: Long = 5L * Buckets / 2L

  /** `round(1000·ln(m/V))` for every possible empty-register count V —
    * computed ONCE here and embedded as literals in both engines' plans,
    * so the transcendental never crosses an engine boundary.
    */
  private val LnMilli: Map[Long, Long] =
    (1L to Buckets).map(v =>
      v -> math.round(1000.0 * math.log(Buckets.toDouble / v))).toMap

  /** The estimator over a one-row (np = non-empty registers, sp = their
    * harmonic sum) frame, as SQL text shared verbatim by the Spark plan
    * and the DuckDB oracle; `idiv` is the engine's integer-divide token
    * (`div` / `//`). Raw harmonic mean, with the linear-counting branch
    * when registers are empty and the raw estimate is small.
    */
  private[operators] def estSql(idiv: String): String = {
    val raw = s"(${AlphaMilli * Buckets * Buckets} * $HarmonicOne) $idiv " +
      s"(1000 * (sp + ($Buckets - np) * $HarmonicOne))"
    val lnCase = (1L to Buckets)
      .map(v => s"WHEN $v THEN ${LnMilli(v)}")
      .mkString(s"CASE ($Buckets - np) ", " ", " ELSE 0 END")
    s"CASE WHEN np < $Buckets AND $raw <= $SmallRangeCeil " +
      s"THEN ($Buckets * ($lnCase)) $idiv 1000 ELSE $raw END"
  }

  /** DuckDB oracle for the streaming windowed-HLL replay gate
    * ([[graft.streaming.StreamingReplay.hllReplay]]): the per-type chain
    * re-keyed by tumbling window start in epoch micros — the estimator
    * expression is the identical integer chain the streaming
    * Aggregator's [[estimateRegisters]] finish step runs.
    */
  def windowedOracleSql(windowUs: Long = 600000000L): String =
    s"""WITH h AS (
       | SELECT (epoch_us(ts) // $windowUs) * $windowUs AS window_us,
       |  ((user_id % $P) * $K) % $P AS h FROM events),
       |low AS (
       | SELECT window_us, h % $Buckets AS b,
       |  CASE WHEN h // $Buckets = 0 THEN $ZeroSentinel
       |   ELSE (h // $Buckets) & -(h // $Buckets) END AS low
       | FROM h),
       |g AS (SELECT window_us, b, max(low) AS maxlow FROM low GROUP BY 1, 2),
       |gs AS (SELECT window_us, count(*) AS np,
       |  sum($HarmonicOne // (2 * maxlow)) AS sp FROM g GROUP BY window_us)
       |SELECT window_us, CAST(${estSql("//")} AS BIGINT) AS est_distinct
       |FROM gs ORDER BY window_us""".stripMargin

  /** The identical estimator as driver/executor-side Scala over a raw
    * register array (index = bucket, value = max lowbit, 0 = empty) —
    * used by the streaming twin's typed Aggregator
    * ([[graft.streaming.StreamingHll]]) so streaming windows emit
    * BIT-IDENTICAL estimates to the batch SQL pipeline (Long division
    * truncates toward zero exactly like `div`/`//` on these
    * non-negative operands).
    */
  def estimateRegisters(regs: Array[Long]): Long = {
    val np = regs.count(_ > 0L)
    val sp = regs.iterator.filter(_ > 0L).map(r => HarmonicOne / (2L * r)).sum
    val raw = (AlphaMilli * Buckets * Buckets * HarmonicOne) /
      (1000L * (sp + (Buckets - np) * HarmonicOne))
    if (np < Buckets && raw <= SmallRangeCeil)
      (Buckets * LnMilli(Buckets - np)) / 1000L
    else raw
  }

  /** Register update for one hashed key (shared hash family). */
  def registerOf(userId: Long): (Int, Long) = {
    val h = ((userId % P) * K) % P
    val v = h / Buckets
    ((h % Buckets).toInt, if (v == 0L) ZeroSentinel else v & -v)
  }

  /** One-row report: the single-pass estimate, the shard-merged estimate
    * (must agree exactly — register max-merge is associative), and the
    * exact distinct count for error context.
    */
  def hllDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val keyed = ev.select(((col("user_id") % P) * K % P).as("h"))
      .select(
        (col("h") % Buckets).as("b"),
        expr(s"h div $Buckets").as("v"),
        col("h"))
      .select(col("b"),
        when(col("v") === 0L, ZeroSentinel)
          .otherwise(expr("v & -v")).as("low"))

    // Single-pass registers: one 64-key map-side-combined aggregation.
    val global = keyed.groupBy("b").agg(max("low").as("maxlow"))

    // Shard-merged registers: per-event_type partials (the "one sketch per
    // ingest shard" shape), max-merged. Identical algebra, different
    // grouping tree — the estimates must match bit for bit.
    val evTyped = ev.select(col("event_type"),
        ((col("user_id") % P) * K % P).as("h"))
      .select(col("event_type"), (col("h") % Buckets).as("b"),
        expr(s"h div $Buckets").as("v"))
      .select(col("event_type"), col("b"),
        when(col("v") === 0L, ZeroSentinel).otherwise(expr("v & -v")).as("low"))
    val merged = evTyped
      .groupBy("event_type", "b").agg(max("low").as("plow"))
      .groupBy("b").agg(max("plow").as("maxlow"))

    def est(regs: DataFrame, name: String): DataFrame =
      regs.agg(
        count(lit(1)).as("np"),
        sum(expr(s"$HarmonicOne div (2 * maxlow)")).as("sp"))
        .select(expr(estSql("div")).cast("long").as(name))

    val truth = ev.agg(countDistinct(col("user_id")).as("true_distinct"))
    est(global, "est_distinct")
      .crossJoin(est(merged, "est_merged"))
      .crossJoin(truth)
      .select(lit(Buckets).as("m"), col("est_distinct"), col("est_merged"),
        col("true_distinct"))
  }

  /** Per-group sketching — one bounded 64-register HLL per event type
    * (the GROUP BY twin of [[hllDistinctUsers]], the shape a metrics
    * pipeline runs per tenant / source / day). The register aggregation
    * shuffles at most |groups|·64 rows of three longs regardless of
    * corpus size; the exact truth column rides along per group.
    */
  def hllDistinctByType(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val keyed = ev.select(col("event_type"),
        ((col("user_id") % P) * K % P).as("h"))
      .select(col("event_type"), (col("h") % Buckets).as("b"),
        expr(s"h div $Buckets").as("v"))
      .select(col("event_type"), col("b"),
        when(col("v") === 0L, ZeroSentinel).otherwise(expr("v & -v")).as("low"))
    val stats = keyed
      .groupBy("event_type", "b").agg(max("low").as("maxlow"))
      .groupBy("event_type").agg(
        count(lit(1)).as("np"),
        sum(expr(s"$HarmonicOne div (2 * maxlow)")).as("sp"))
    val truth = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("true_distinct"))
    stats
      .select(col("event_type"), expr(estSql("div")).cast("long").as("est_distinct"))
      .join(truth, Seq("event_type"))
      .orderBy("event_type")
  }

  def byTypeOracleSql(): String =
    s"""WITH h AS (
       | SELECT event_type, ((user_id % $P) * $K) % $P AS h FROM events),
       |low AS (
       | SELECT event_type, h % $Buckets AS b,
       |  CASE WHEN h // $Buckets = 0 THEN $ZeroSentinel
       |   ELSE (h // $Buckets) & -(h // $Buckets) END AS low
       | FROM h),
       |g AS (
       | SELECT event_type, b, max(low) AS maxlow FROM low GROUP BY event_type, b),
       |gs AS (
       | SELECT event_type, count(*) AS np,
       |  sum($HarmonicOne // (2 * maxlow)) AS sp
       | FROM g GROUP BY event_type),
       |e AS (
       | SELECT event_type, CAST(${estSql("//")} AS BIGINT) AS est_distinct FROM gs),
       |t AS (
       | SELECT event_type, count(DISTINCT user_id) AS true_distinct
       | FROM events GROUP BY event_type)
       |SELECT e.event_type, e.est_distinct, t.true_distinct
       |FROM e JOIN t ON e.event_type = t.event_type
       |ORDER BY e.event_type""".stripMargin

  /** DuckDB oracle: the identical integer pipeline. */
  def oracleSql(): String =
    s"""WITH h AS (
       | SELECT ((user_id % $P) * $K) % $P AS h FROM events),
       |low AS (
       | SELECT h % $Buckets AS b,
       |  CASE WHEN h // $Buckets = 0 THEN $ZeroSentinel
       |   ELSE (h // $Buckets) & -(h // $Buckets) END AS low
       | FROM h),
       |g AS (SELECT b, max(low) AS maxlow FROM low GROUP BY b),
       |gs AS (
       | SELECT count(*) AS np, sum($HarmonicOne // (2 * maxlow)) AS sp FROM g),
       |ge AS (SELECT CAST(${estSql("//")} AS BIGINT) AS est_distinct FROM gs),
       |lowt AS (
       | SELECT event_type, ((user_id % $P) * $K) % $P AS h FROM events),
       |lowt2 AS (
       | SELECT event_type, h % $Buckets AS b,
       |  CASE WHEN h // $Buckets = 0 THEN $ZeroSentinel
       |   ELSE (h // $Buckets) & -(h // $Buckets) END AS low
       | FROM lowt),
       |p AS (SELECT event_type, b, max(low) AS plow FROM lowt2 GROUP BY event_type, b),
       |m AS (SELECT b, max(plow) AS maxlow FROM p GROUP BY b),
       |ms AS (
       | SELECT count(*) AS np, sum($HarmonicOne // (2 * maxlow)) AS sp FROM m),
       |me AS (SELECT CAST(${estSql("//")} AS BIGINT) AS est_merged FROM ms),
       |t AS (SELECT count(DISTINCT user_id) AS true_distinct FROM events)
       |SELECT CAST($Buckets AS BIGINT) AS m, ge.est_distinct, me.est_merged,
       | t.true_distinct
       |FROM ge, me, t""".stripMargin
}
