package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton-curve) data-layout planning — the write-path
  * optimization that makes multi-dimensional predicate pruning work at
  * 100 TB: rows sorted by interleaved-bit z-values land in files whose
  * min/max ranges are NARROW on every participating dimension, so a scan
  * filtering on either column can skip most files on footer stats alone
  * (a single-column sort gives pruning on that column only).
  *
  * The plan here assigns each row its z-value and z-range file, then
  * reports per-file row counts and per-dimension min/max — exactly the
  * footer stats a writer would produce — making the locality claim
  * checkable: with `bits = 8` and 64 files, each file is one aligned
  * 32×32 tile of the bucket grid, so each dimension's bucket span per
  * file is ≤ 1/8 of its full range.
  *
  * Everything is integer Column algebra (scale-to-bucket by exact integer
  * division, bit interleave as an unrolled sum of div/mod terms) — fully
  * codegen'd, one scan + one dim-stats cross-join (broadcast single row)
  * + one aggregation exchange. The same arithmetic strings generate the
  * DuckDB oracle, so Spark and oracle share one formula by construction.
  */
object LayoutOps {

  /** Bit-interleave two `bits`-wide bucket ids: x in even positions, y in
    * odd. `idiv` is the engine's integer-division operator ("div" for
    * Spark SQL, "//" for DuckDB).
    */
  private def interleave(xb: String, yb: String, bits: Int, idiv: String): String =
    (0 until bits).map { i =>
      s"((($xb) $idiv ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((($yb) $idiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  val DefaultBits = 8
  val DefaultFiles = 64

  /** Z-order file plan for lineitem over (l_partkey, l_suppkey). */
  def zorderPlan(
      s: SparkSession,
      dir: String,
      bits: Int = DefaultBits,
      files: Int = DefaultFiles): DataFrame = {
    val m = (1L << bits) - 1
    val li = Tables.lineitem(s, dir).select(
      col("l_partkey").cast("long").as("x"),
      col("l_suppkey").cast("long").as("y"))
    // One-row dim-stats frame, broadcast into the scan: keeps the whole
    // plan declarative (no driver-side action for the ranges).
    val stats = li.agg(
      min("x").as("xmin"), max("x").as("xmax"),
      min("y").as("ymin"), max("y").as("ymax"))
    li.crossJoin(broadcast(stats))
      .select(
        col("x"), col("y"),
        expr(s"((x - xmin) * $m) div greatest(xmax - xmin, 1)").as("xb"),
        expr(s"((y - ymin) * $m) div greatest(ymax - ymin, 1)").as("yb"))
      .withColumn("z", expr(interleave("xb", "yb", bits, "div")))
      .withColumn("file_id", expr(s"z * $files div ${1L << (2 * bits)}"))
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .orderBy("file_id")
  }

  def oracleSql(bits: Int = DefaultBits, files: Int = DefaultFiles): String = {
    val m = (1L << bits) - 1
    s"""WITH d AS (
       | SELECT CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y
       | FROM lineitem),
       |st AS (
       | SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
       | FROM d),
       |b AS (
       | SELECT x, y,
       |  ((x - xmin) * $m) // greatest(xmax - xmin, 1) AS xb,
       |  ((y - ymin) * $m) // greatest(ymax - ymin, 1) AS yb
       | FROM d CROSS JOIN st),
       |z AS (
       | SELECT x, y, (${interleave("xb", "yb", bits, "//")}) AS z FROM b)
       |SELECT CAST(z * $files // ${1L << (2 * bits)} AS BIGINT) AS file_id,
       | count(*) AS rows, min(x) AS x_min, max(x) AS x_max,
       | min(y) AS y_min, max(y) AS y_max
       |FROM z GROUP BY 1 ORDER BY file_id""".stripMargin
  }

  /** Adds `hd` = Hilbert-curve distance of (`xCol`, `yCol`) on the
    * 2^bits × 2^bits grid — the classic per-bit-level fold (mask the
    * level bit, accumulate `s²·((3·rx) xor ry)`, reflect-and-swap when
    * ry = 0), unrolled as `bits` Column-expression steps so the whole
    * transform stays inside whole-stage codegen. Pure integer ops —
    * bit-identical in any engine; the oracle unrolls the SAME levels as
    * chained CTEs, and the SPEC carries the independent proof: on the
    * full small grid the index is a bijection whose consecutive cells
    * are Manhattan-distance-1 neighbors — the locality property
    * z-order's interleave does NOT have (its jumps are what Hilbert
    * layout fixes).
    */
  def withHilbertIndex(
      df: DataFrame, xCol: String, yCol: String, bits: Int): DataFrame = {
    val n = 1L << bits
    var out = df.withColumn("hx", col(xCol)).withColumn("hy", col(yCol))
      .withColumn("hd", lit(0L))
    var s = n / 2
    while (s > 0) {
      out = out
        .withColumn("rx", expr(s"CASE WHEN (hx & ${s}L) > 0 THEN 1L ELSE 0L END"))
        .withColumn("ry", expr(s"CASE WHEN (hy & ${s}L) > 0 THEN 1L ELSE 0L END"))
        .withColumn("hd", expr(s"hd + ${s * s}L * ((3L * rx) ^ ry)"))
        .withColumn("nhx", expr(
          s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1}L - hy ELSE hy END) ELSE hx END"))
        .withColumn("nhy", expr(
          s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1}L - hx ELSE hx END) ELSE hy END"))
        .drop("hx", "hy", "rx", "ry")
        .withColumnRenamed("nhx", "hx")
        .withColumnRenamed("nhy", "hy")
      s /= 2
    }
    out.drop("hx", "hy")
  }

  /** Hilbert-curve file plan — the locality-preserving sibling of
    * [[zorderPlan]] over the same (l_partkey, l_suppkey) grid: same
    * range-normalized bucketing, same equal-width file cut, but cells
    * assigned along the Hilbert walk, whose consecutive cells are
    * always grid neighbors (no Z jumps), so per-file min/max boxes are
    * tighter and zone-map pruning sharper. Emitted per file: row count
    * and both key ranges — directly comparable row-for-row with the
    * z-order plan's output.
    */
  def hilbertPlan(
      s: SparkSession,
      dir: String,
      bits: Int = DefaultBits,
      files: Int = DefaultFiles): DataFrame = {
    val m = (1L << bits) - 1
    val li = Tables.lineitem(s, dir).select(
      col("l_partkey").cast("long").as("x"),
      col("l_suppkey").cast("long").as("y"))
    val stats = li.agg(
      min("x").as("xmin"), max("x").as("xmax"),
      min("y").as("ymin"), max("y").as("ymax"))
    val bucketed = li.crossJoin(broadcast(stats))
      .select(
        col("x"), col("y"),
        expr(s"((x - xmin) * $m) div greatest(xmax - xmin, 1)").as("xb"),
        expr(s"((y - ymin) * $m) div greatest(ymax - ymin, 1)").as("yb"))
    withHilbertIndex(bucketed, "xb", "yb", bits)
      .withColumn("file_id", expr(s"hd * $files div ${1L << (2 * bits)}"))
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .orderBy("file_id")
  }

  def hilbertOracleSql(
      bits: Int = DefaultBits, files: Int = DefaultFiles): String = {
    val m = (1L << bits) - 1
    val n = 1L << bits
    val levels = Iterator.iterate(n / 2)(_ / 2).takeWhile(_ > 0).toSeq
    val ctes = levels.zipWithIndex.map { case (s, i) =>
      s"""h${i + 1} AS (
         | SELECT x, y, hd + ${s * s} * xor(3 * rx, ry) AS hd,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - hy ELSE hy END)
         |   ELSE hx END AS hx,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - hx ELSE hx END)
         |   ELSE hy END AS hy
         | FROM (
         |  SELECT *, CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |   CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM h$i) t)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (
       | SELECT CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y
       | FROM lineitem),
       |st AS (
       | SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
       | FROM d),
       |h0 AS (
       | SELECT x, y, CAST(0 AS BIGINT) AS hd,
       |  ((x - xmin) * $m) // greatest(xmax - xmin, 1) AS hx,
       |  ((y - ymin) * $m) // greatest(ymax - ymin, 1) AS hy
       | FROM d CROSS JOIN st),
       |$ctes
       |SELECT CAST(hd * $files // ${1L << (2 * bits)} AS BIGINT) AS file_id,
       | count(*) AS rows, min(x) AS x_min, max(x) AS x_max,
       | min(y) AS y_min, max(y) AS y_max
       |FROM h${levels.length} GROUP BY 1 ORDER BY file_id""".stripMargin
  }

  /** The fixed 2-D probe box for [[curveLayoutAudit]]: `[64, 96)²` on
    * the 256-bucket grid — a 1/8 × 1/8 box, the selective two-column
    * predicate space-filling-curve layouts exist to serve.
    */
  val CurveBoxLo = 64L
  val CurveBoxHi = 96L

  /** File count for [[curveLayoutAudit]]: deliberately NOT a divisor of
    * the quadtree cell count — at 64 files every file is one aligned
    * 32×32 quad and BOTH curves prune identically (measured: 1 file
    * each); at 48 the cuts straddle quad boundaries and the walks
    * separate (measured at sf0.01: hilbert 1 file / zorder 2 / xsort 6
    * — the Hilbert-beats-Z headline the plans exist to earn).
    */
  val CurveFiles = 48

  /** Layout DECISION readout for the curve family: simulated zone-map
    * pruning of one 2-D box predicate under the three write layouts the
    * repo plans — `xsort` (1-D sort on x: perfect x pruning, none on y),
    * `zorder` ([[zorderPlan]]'s interleave), `hilbert` ([[hilbertPlan]]'s
    * walk). Same file-cut width for all three; a file is read iff its
    * (x, y) bucket min/max box intersects the probe — parquet footer
    * skipping, simulated. `read_amp_bp` (rows read per row matched, in
    * bp) is the number a platform team reads to pick the layout: rows
    * 69/187 PLAN the layouts, this row prices them against each other —
    * Hilbert's neighbor-only walk should post the tightest boxes.
    *
    * Scale shape: one fact scan through the shared normalize/curve
    * Column algebra, `stack` emits the three assignments (3× narrow
    * intermediate, still one scan), then two bounded aggregations
    * (3·files keys, then 3). Nothing row-bounded after the first agg.
    */
  def curveLayoutAudit(
      s: SparkSession,
      dir: String,
      bits: Int = DefaultBits,
      files: Int = CurveFiles): DataFrame = {
    val m = (1L << bits) - 1
    val cells = 1L << (2 * bits)
    val li = Tables.lineitem(s, dir).select(
      col("l_partkey").cast("long").as("x"),
      col("l_suppkey").cast("long").as("y"))
    val stats = li.agg(
      min("x").as("xmin"), max("x").as("xmax"),
      min("y").as("ymin"), max("y").as("ymax"))
    val bucketed = li.crossJoin(broadcast(stats))
      .select(
        expr(s"((x - xmin) * $m) div greatest(xmax - xmin, 1)").as("xb"),
        expr(s"((y - ymin) * $m) div greatest(ymax - ymin, 1)").as("yb"))
    val indexed = withHilbertIndex(bucketed, "xb", "yb", bits)
      .withColumn("z", expr(interleave("xb", "yb", bits, "div")))
    indexed.selectExpr(
        s"stack(3, 'hilbert', hd * $files div $cells, " +
          s"'xsort', (xb * $files) div ${m + 1}, " +
          s"'zorder', z * $files div $cells) as (layout, file_id)",
        "xb", "yb")
      .groupBy(col("layout"), col("file_id"))
      .agg(
        count(lit(1)).as("rows"),
        min("xb").as("x_min"), max("xb").as("x_max"),
        min("yb").as("y_min"), max("yb").as("y_max"),
        sum(when(
          col("xb") >= CurveBoxLo && col("xb") < CurveBoxHi &&
            col("yb") >= CurveBoxLo && col("yb") < CurveBoxHi, 1L)
          .otherwise(0L)).as("match_rows"))
      .withColumn("is_read",
        (col("x_min") < CurveBoxHi && col("x_max") >= CurveBoxLo &&
          col("y_min") < CurveBoxHi && col("y_max") >= CurveBoxLo)
          .cast("long"))
      .groupBy(col("layout"))
      .agg(
        count(lit(1)).as("files_total"),
        sum(col("is_read")).as("files_read"),
        sum(col("rows")).as("rows_total"),
        sum(col("is_read") * col("rows")).as("rows_read"),
        sum(col("match_rows")).as("rows_match"))
      .withColumn("read_amp_bp",
        expr("(rows_read * 10000) div greatest(rows_match, 1)"))
      .orderBy("layout")
  }

  /** DuckDB oracle for [[curveLayoutAudit]]: the [[hilbertOracleSql]]
    * level chain carrying (xb, yb), the interleave inline, then the
    * identical per-file / per-layout rollup.
    */
  def curveLayoutOracleSql(
      bits: Int = DefaultBits, files: Int = CurveFiles): String = {
    val m = (1L << bits) - 1
    val n = 1L << bits
    val cells = 1L << (2 * bits)
    val levels = Iterator.iterate(n / 2)(_ / 2).takeWhile(_ > 0).toSeq
    val ctes = levels.zipWithIndex.map { case (s, i) =>
      s"""h${i + 1} AS (
         | SELECT xb, yb, hd + ${s * s} * xor(3 * rx, ry) AS hd,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - hy ELSE hy END)
         |   ELSE hx END AS hx,
         |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - hx ELSE hx END)
         |   ELSE hy END AS hy
         | FROM (
         |  SELECT *, CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |   CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM h$i) t)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (
       | SELECT CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y
       | FROM lineitem),
       |st AS (
       | SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
       | FROM d),
       |h0 AS (
       | SELECT
       |  ((x - xmin) * $m) // greatest(xmax - xmin, 1) AS xb,
       |  ((y - ymin) * $m) // greatest(ymax - ymin, 1) AS yb,
       |  CAST(0 AS BIGINT) AS hd, xb AS hx, yb AS hy
       | FROM d CROSS JOIN st),
       |$ctes,
       |assigned AS (
       | SELECT 'hilbert' AS layout, hd * $files // $cells AS file_id, xb, yb
       | FROM h${levels.length}
       | UNION ALL
       | SELECT 'xsort', (xb * $files) // ${m + 1}, xb, yb FROM h0
       | UNION ALL
       | SELECT 'zorder', (${interleave("xb", "yb", bits, "//")}) * $files // $cells,
       |  xb, yb FROM h0),
       |perfile AS (
       | SELECT layout, file_id, count(*) AS rows,
       |  min(xb) AS x_min, max(xb) AS x_max,
       |  min(yb) AS y_min, max(yb) AS y_max,
       |  CAST(sum(CASE WHEN xb >= $CurveBoxLo AND xb < $CurveBoxHi
       |    AND yb >= $CurveBoxLo AND yb < $CurveBoxHi THEN 1 ELSE 0 END) AS BIGINT)
       |   AS match_rows
       | FROM assigned GROUP BY layout, file_id),
       |flags AS (
       | SELECT *, CAST(x_min < $CurveBoxHi AND x_max >= $CurveBoxLo
       |   AND y_min < $CurveBoxHi AND y_max >= $CurveBoxLo AS BIGINT) AS is_read
       | FROM perfile)
       |SELECT layout,
       | count(*) AS files_total,
       | CAST(sum(is_read) AS BIGINT) AS files_read,
       | CAST(sum(rows) AS BIGINT) AS rows_total,
       | CAST(sum(is_read * rows) AS BIGINT) AS rows_read,
       | CAST(sum(match_rows) AS BIGINT) AS rows_match,
       | CAST((sum(is_read * rows) * 10000) // greatest(sum(match_rows), 1) AS BIGINT)
       |  AS read_amp_bp
       |FROM flags GROUP BY layout ORDER BY layout""".stripMargin
  }

  /** Default context length for [[packSequences]] (tokens per training
    * sequence) and the carry-bucket width (docs per prefix-sum bucket).
    */
  val DefaultSeqLen = 2048L
  val DefaultPackBucket = 64L

  /** Sequence-packing plan: concatenate documents in a deterministic
    * global order (doc_id) and cut the token stream every `seqLen`
    * tokens — the standard LLM-pretraining packing step. Emits, per
    * document, the training sequence its first token lands in, its
    * offset inside that sequence, and whether it straddles a sequence
    * boundary (the rows a masking-aware loader needs).
    *
    * Scale shape: the global token prefix sum runs HIERARCHICALLY, the
    * same pattern as [[WindowOps.peakConcurrency]] — but THREE levels
    * deep (r9): per-bucket token sums (map-side combined) roll up again
    * into superbuckets of `bucket` buckets, the only partition-less
    * serial window runs over the N/bucket² superbucket rows, each
    * bucket's carry-in is windowed WITHIN its superbucket, and the
    * per-document running sum is windowed within its bucket — so the
    * serial tail shrinks from N/bucket to N/bucket² (64 → 4096× at the
    * default width), and a fourth level slots in the same way. The
    * bucket→document carry join is NOT hint-broadcast: the carry frame
    * is O(N/bucket) rows, so AQE broadcasts it while it is small and
    * keeps the shuffle join once it isn't — the decision that scales.
    * The flat single-window oracle is the independent serial algorithm.
    * All integer arithmetic.
    */
  def packSequences(
      s: SparkSession,
      dir: String,
      seqLen: Long = DefaultSeqLen,
      bucket: Long = DefaultPackBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("n_tokens"))
      .withColumn("b", expr(s"doc_id div $bucket"))
    val bsums = t.groupBy("b").agg(sum("n_tokens").as("bsum"))
      .withColumn("sb", expr(s"b div $bucket"))
    val sbCarry = bsums.groupBy("sb").agg(sum("bsum").as("sbsum"))
      .withColumn("sb_carry",
        coalesce(
          sum("sbsum").over(Window.orderBy("sb")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("sb", "sb_carry")
    val carry = bsums.join(sbCarry, Seq("sb"))
      .withColumn("carry_in",
        col("sb_carry") + coalesce(
          sum("bsum").over(Window.partitionBy("sb").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("b", "carry_in")
    t.join(carry, Seq("b"))
      .withColumn("off",
        col("carry_in") + coalesce(
          sum("n_tokens").over(Window.partitionBy("b").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(
        col("doc_id"), col("n_tokens"),
        expr(s"off div $seqLen").as("seq_id"),
        expr(s"off % $seqLen").as("seq_offset"),
        expr(s"cast((off div $seqLen) <> ((off + greatest(n_tokens, 1) - 1) div $seqLen) as bigint)")
          .as("straddles"))
      .orderBy("doc_id")
  }

  /** Flat single-window serial packing — an independent algorithm. */
  def packSequencesOracleSql(seqLen: Long = DefaultSeqLen): String =
    s"""WITH t AS (
       | SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
       | FROM documents),
       |r AS (
       | SELECT doc_id, n_tokens,
       |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       | FROM t)
       |SELECT doc_id, n_tokens,
       | CAST(off // $seqLen AS BIGINT) AS seq_id,
       | CAST(off % $seqLen AS BIGINT) AS seq_offset,
       | CAST((off // $seqLen) <> ((off + greatest(n_tokens, 1) - 1) // $seqLen) AS BIGINT) AS straddles
       |FROM r ORDER BY doc_id""".stripMargin

  /** Equi-depth range-partition boundary export: the B row-count-balanced
    * split points of the event stream's time axis — what
    * `repartitionByRange` / a time-range table layout needs planned
    * AHEAD of a 100 TB write (Spark's own range partitioner samples;
    * this is the exact, reproducible version). A row is a boundary iff
    * its global rank crosses an i·N/B threshold; emitted per boundary:
    * its ordinal, timestamp, and exact rank.
    *
    * Scale shape: the global rank is [[RankOps.withHierarchicalRank]]
    * over per-day value buckets — bucket counts collapse map-side, the
    * serial carry window touches only the day domain, and row ranks are
    * per-(day)-windowed. The boundary filter is a codegen predicate on
    * (rank, broadcast total). Output is exactly B rows. The oracle runs
    * a native flat row_number — independent algorithm.
    */
  val RangeBuckets = 32L

  def rangeBoundaries(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("ts_us"), col("event_id"))
    val cnt = ev.agg(count(lit(1)).as("cnt"))
    RankOps.withHierarchicalRank(ev, Seq.empty, "ts_us", "event_id",
        "ts_us div 86400000000", "rk")
      .crossJoin(broadcast(cnt))
      .filter(expr(
        s"(rk * $RangeBuckets) div cnt > ((rk - 1) * $RangeBuckets) div cnt"))
      .select(
        expr(s"(rk * $RangeBuckets) div cnt").as("boundary_id"),
        col("ts_us").as("boundary_ts_us"), col("rk").as("rank"))
      .orderBy("boundary_id")
  }

  val RangeBoundariesOracleSql: String =
    s"""WITH e AS (
       | SELECT epoch_us(ts) AS ts_us, event_id,
       |  CAST(row_number() OVER (ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rk
       | FROM events),
       |n AS (SELECT count(*) AS cnt FROM e)
       |SELECT (rk * $RangeBuckets) // cnt AS boundary_id,
       | ts_us AS boundary_ts_us, rk AS rank
       |FROM e CROSS JOIN n
       |WHERE (rk * $RangeBuckets) // cnt > ((rk - 1) * $RangeBuckets) // cnt
       |ORDER BY boundary_id""".stripMargin

  /** Zone-map pruning audit defaults: simulated rows-per-file for the
    * ingest-ordered layout, days-per-file for the date-sorted layout,
    * and the one-month probe predicate (integral epoch days for
    * [1998-06-01, 1998-07-01) — pure integer arithmetic end to end).
    */
  val ZoneRowsPerFile = 2048L
  val ZoneDaysPerFile = 30L
  val ZoneDayLo = 10378L
  val ZoneDayHi = 10408L

  /** Zone-map (file min/max) pruning audit: how many simulated files a
    * one-month date predicate must read under two write layouts —
    * `ingest` (files cut every [[ZoneRowsPerFile]] rows of arrival
    * order, i.e. o_orderkey ranges) vs `datesort` (files cut by
    * [[ZoneDaysPerFile]]-day ranges of the filter column, the layout a
    * date-sorted writer produces). A file is read iff its [min, max]
    * day range intersects the predicate — exactly the footer-stats
    * skipping a parquet/ORC reader does. `read_amp_bp` is rows-read
    * over rows-matching in basis points: ~10000 means the layout is
    * perfectly aligned with the predicate; ingest order pays whatever
    * date-vs-arrival correlation the data happens to have.
    *
    * Scale shape: one fact scan; `stack` emits both layout assignments
    * per row (2× narrow intermediate, no second scan), then two
    * key-cardinality-bounded aggregations (per-file, then per-layout).
    * Nothing driver-side, nothing row-bounded after the first agg.
    */
  def zoneMapAudit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("d"))
      .selectExpr(
        s"stack(2, 'ingest', o_orderkey div $ZoneRowsPerFile, " +
          s"'datesort', d div $ZoneDaysPerFile) as (layout, file_id)",
        "d")
      .groupBy(col("layout"), col("file_id"))
      .agg(
        count(lit(1)).as("rows"),
        min("d").as("d_min"), max("d").as("d_max"),
        sum(when(col("d") >= ZoneDayLo && col("d") < ZoneDayHi, 1L)
          .otherwise(0L)).as("match_rows"))
      .withColumn("is_read",
        (col("d_min") < ZoneDayHi && col("d_max") >= ZoneDayLo)
          .cast("long"))
      .groupBy(col("layout"))
      .agg(
        count(lit(1)).as("files_total"),
        sum(col("is_read")).as("files_read"),
        sum(col("rows")).as("rows_total"),
        sum(col("is_read") * col("rows")).as("rows_read"),
        sum(col("match_rows")).as("rows_match"))
      .withColumn("read_amp_bp",
        expr("(rows_read * 10000) div greatest(rows_match, 1)"))
      .orderBy("layout")

  val ZoneMapOracleSql: String =
    s"""WITH d AS (
       | SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000 AS d
       | FROM orders),
       |assigned AS (
       | SELECT 'ingest' AS layout, o_orderkey // $ZoneRowsPerFile AS file_id, d FROM d
       | UNION ALL
       | SELECT 'datesort' AS layout, d // $ZoneDaysPerFile AS file_id, d FROM d),
       |perfile AS (
       | SELECT layout, file_id, count(*) AS rows,
       |  min(d) AS d_min, max(d) AS d_max,
       |  CAST(sum(CASE WHEN d >= $ZoneDayLo AND d < $ZoneDayHi THEN 1 ELSE 0 END) AS BIGINT) AS match_rows,
       |  CAST(min(d) < $ZoneDayHi AND max(d) >= $ZoneDayLo AS BIGINT) AS is_read
       | FROM assigned GROUP BY layout, file_id)
       |SELECT layout, count(*) AS files_total,
       | CAST(sum(is_read) AS BIGINT) AS files_read,
       | CAST(sum(rows) AS BIGINT) AS rows_total,
       | CAST(sum(is_read * rows) AS BIGINT) AS rows_read,
       | CAST(sum(match_rows) AS BIGINT) AS rows_match,
       | (CAST(sum(is_read * rows) AS BIGINT) * 10000) // greatest(CAST(sum(match_rows) AS BIGINT), 1) AS read_amp_bp
       |FROM perfile GROUP BY layout ORDER BY layout""".stripMargin

  // -------------------------------------------------------------------
  // Small-files compaction planning
  // -------------------------------------------------------------------

  /** Docs per synthetic input file (a deliberately fragmented layout —
    * the small-files problem the plan exists to fix).
    */
  val CompactionDocsPerFile = 4

  /** Target merged-file size in bytes (n_chars standing in for bytes). */
  val CompactionTargetBytes = 4096L

  /** Small-files compaction plan — the lakehouse `OPTIMIZE` planning
    * step: given a per-file listing (source, file_id, bytes), assign
    * files in id order to merge groups by start-offset binning
    * (`(cum_bytes - bytes) div target`), so every group's total lands in
    * [target, target + max_file) and the assignment is a pure function
    * of the listing — re-runs produce the same plan with no coordination.
    *
    * Scale shape: the INPUT of a real compaction planner is the file
    * manifest (one row per file — millions of rows at 100 TB, not
    * billions); here the manifest is derived from the documents table by
    * a map-side-combined groupBy, and the plan itself is a per-source
    * window cumsum over that small frame. Partitioned by source so no
    * global sort exists; sources are the table's natural write
    * partitions.
    */
  def compactionPlan(
      s: SparkSession, dir: String,
      docsPerFile: Int = CompactionDocsPerFile,
      targetBytes: Long = CompactionTargetBytes): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.documents(s, dir)
      .select(col("source"),
        expr(s"doc_id div $docsPerFile").as("file_id"), col("n_chars"))
      .groupBy("source", "file_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("bytes"))
    val w = Window.partitionBy("source").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum", sum("bytes").over(w))
      .withColumn("merge_group", expr(s"(cum - bytes) div $targetBytes"))
      .groupBy("source", "merge_group")
      .agg(
        count(lit(1)).as("n_files"),
        sum("n_docs").as("n_docs"),
        sum("bytes").as("bytes"),
        min("file_id").as("file_lo"),
        max("file_id").as("file_hi"))
      .orderBy("source", "merge_group")
  }

  /** DuckDB oracle for [[compactionPlan]]. */
  def compactionPlanOracleSql(
      docsPerFile: Int = CompactionDocsPerFile,
      targetBytes: Long = CompactionTargetBytes): String =
    s"""WITH f AS (
       | SELECT source, doc_id // $docsPerFile AS file_id,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bytes
       | FROM documents GROUP BY source, doc_id // $docsPerFile),
       |c AS (
       | SELECT source, file_id, n_docs, bytes,
       |  sum(bytes) OVER (PARTITION BY source ORDER BY file_id
       |   ROWS UNBOUNDED PRECEDING) AS cum
       | FROM f)
       |SELECT source, CAST((cum - bytes) // $targetBytes AS BIGINT) AS merge_group,
       | count(*) AS n_files, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       | CAST(sum(bytes) AS BIGINT) AS bytes,
       | min(file_id) AS file_lo, max(file_id) AS file_hi
       |FROM c GROUP BY source, (cum - bytes) // $targetBytes
       |ORDER BY source, merge_group""".stripMargin
}
