package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII detection + redaction — the scrub pass every training-data pipeline
  * runs before a corpus ships (emails, phone numbers, IP addresses →
  * typed placeholder tokens, with per-document counts for audit).
  *
  * All patterns are RE2-safe (no lookahead/backreferences, explicit ASCII
  * classes) so Java regex and the DuckDB oracle match identical spans, and
  * the whole operator is native `regexp_replace`/`regexp_count` Column
  * algebra: one scan, zero shuffle, fully inside whole-stage codegen —
  * at 100 TB this is a map-only pass whose cost is the scan itself.
  *
  * The driver corpus is digit-free word soup, so the registered query
  * plants deterministic PII derived from `doc_id` (every doc an email,
  * every 3rd a phone, every 7th an IPv4) — the same self-contained-probe
  * pattern `decontamination_stats` uses for its eval carve. A real
  * pipeline calls [[redact]] on its own text column.
  */
object PiiOps {

  /** username@host.tld — conservative ASCII form. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American 555 exchange (the reserved fiction prefix the synth
    * data uses); word-bounded so digit runs inside longer numbers don't
    * half-match.
    */
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** Dotted-quad IPv4, word-bounded. Octet ranges are not validated —
    * redaction wants recall; '999.1.1.1' is still worth scrubbing.
    */
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact a text column: emails → [EMAIL], then phones → [PHONE], then
    * IPs → [IP]. Replacement order matters (an email's host could contain
    * a dotted quad) and is part of the contract — the oracle replays it.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      IpRe, "[IP]")

  /** Per-document PII audit of an arbitrary frame: typed counts plus the
    * redacted text digest/length (the digest, not the cleaned body, is
    * what a 100 TB audit table stores).
    */
  def piiAudit(docs: DataFrame, text: Column): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(text, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(text, lit(IpRe)).cast("long").as("n_ips"),
      sha2(redact(text), 256).as("clean_hash"),
      length(redact(text)).cast("long").as("clean_len"))

  /** The deterministic PII-bearing text the registered query audits:
    * corpus text + planted contact lines keyed off doc_id.
    */
  private[graft] def plantedPii: Column = concat(
    col("text"),
    lit(" Contact user"), col("doc_id").cast("string"), lit("@example.com"),
    when(col("doc_id") % 3 === 0,
      concat(lit(" call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(lit("")),
    when(col("doc_id") % 7 === 0,
      concat(lit(" node 10."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") / 256).cast("long") % 256).cast("string"),
        lit("."), ((col("doc_id") / 65536).cast("long") % 256).cast("string")))
      .otherwise(lit("")))

  /** Registered query: audit the planted-PII corpus. */
  def piiRedact(s: SparkSession, dir: String): DataFrame =
    piiAudit(Tables.documents(s, dir), plantedPii).orderBy("doc_id")

  /** Oracle: identical planting + the same three ordered replacements
    * (RE2 needs the explicit 'g' flag Spark applies implicitly).
    */
  val OracleSql: String = {
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val phone = """\b555-[0-9]{4}\b"""
    val ip = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""
    s"""WITH p AS (
       | SELECT doc_id, text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |  || CASE WHEN doc_id % 3 = 0
       |      THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |  || CASE WHEN doc_id % 7 = 0
       |      THEN ' node 10.' || CAST(doc_id % 256 AS VARCHAR)
       |       || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
       |       || '.' || CAST((doc_id // 65536) % 256 AS VARCHAR) ELSE '' END AS pii_text
       | FROM documents),
       |r AS (
       | SELECT doc_id, pii_text,
       |  regexp_replace(regexp_replace(regexp_replace(pii_text,
       |   '$email', '[EMAIL]', 'g'),
       |   '$phone', '[PHONE]', 'g'),
       |   '$ip', '[IP]', 'g') AS clean
       | FROM p)
       |SELECT doc_id,
       | CAST(len(regexp_extract_all(pii_text, '$email')) AS BIGINT) AS n_emails,
       | CAST(len(regexp_extract_all(pii_text, '$phone')) AS BIGINT) AS n_phones,
       | CAST(len(regexp_extract_all(pii_text, '$ip')) AS BIGINT) AS n_ips,
       | sha256(clean) AS clean_hash,
       | CAST(length(clean) AS BIGINT) AS clean_len
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** The k thresholds the anonymity audit reports against. */
  val AnonymityKs: Seq[Int] = Seq(2, 5, 10, 25)

  /** k-anonymity audit over the customer quasi-identifiers
    * (nation, market segment, account-balance thousand-bucket): for each
    * k threshold, how many equivalence classes fall below k and what ppm
    * of rows they hold — the release gate a privacy review runs BEFORE a
    * dataset ships, the structural complement of the regex scrub above
    * ([[piiRedact]] removes direct identifiers; this measures whether the
    * remaining quasi-identifiers still single people out).
    *
    * Scale shape: ONE shuffle — the QI groupBy (map-side combined); the
    * class-size frame is bounded by the QI domain product (nations ×
    * segments × balance buckets, ~3k rows at any corpus size), so the
    * per-k rollup is a broadcast-cross over a constant-size frame. The
    * bucket edge uses floor(x/1000) — a pure IEEE double op both engines
    * compute bit-identically (no round-half-tie exposure).
    */
  def kAnonymityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .groupBy(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("sz"))
    val ks = AnonymityKs.toDF("k").select(col("k").cast("long").as("k"))
    classes
      .join(broadcast(ks))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L)).as("classes_below"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L)).as("rows_below"),
        sum(col("sz")).as("n_rows"))
      .select(col("k"), col("n_classes"), col("classes_below"),
        col("rows_below"),
        expr("(1000000 * rows_below) div n_rows").as("suppress_ppm"))
      .orderBy("k")
  }

  /** DuckDB oracle for [[kAnonymityAudit]]. */
  val KAnonymityOracleSql: String =
    s"""WITH cls AS (
       | SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
       |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
       |  count(*) AS sz
       | FROM customer GROUP BY 1, 2, 3),
       |ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES ${AnonymityKs.map(k => s"($k)").mkString(", ")}) t(k))
       |SELECT k,
       | count(*) AS n_classes,
       | CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
       | CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT) AS rows_below,
       | CAST((1000000 * sum(CASE WHEN sz < k THEN sz ELSE 0 END)) // sum(sz) AS BIGINT) AS suppress_ppm
       |FROM cls, ks GROUP BY k ORDER BY k""".stripMargin

  /** The l ladder audited by [[lDiversityAudit]]. */
  val DiversityLs: Seq[Int] = Seq(2, 3, 5)

  /** l-diversity release audit — [[kAnonymityAudit]]'s companion: k
    * bounds RE-IDENTIFICATION (class size), l bounds ATTRIBUTE
    * disclosure — a class of 50 people is 50-anonymous yet leaks
    * everyone's balance if all 50 share one balance bucket. Quasi-
    * identifiers here are (nation, segment); the sensitive attribute is
    * the account-balance bucket. Per l in the ladder: classes whose
    * distinct-sensitive count falls below l, the rows inside them, and
    * the suppression fraction a release at that l would pay.
    *
    * Scale shape: one map-side-combined groupBy to (QI-class, sensitive)
    * pairs, a second to classes (both bounded by the QI domain), then a
    * broadcast ladder join — no row-level shuffle survives the first
    * partial aggregate.
    */
  def lDiversityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .groupBy(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("sz"),
        countDistinct(floor(col("c_acctbal") / 1000.0).cast("long"))
          .as("d_sensitive"))
    val ls = DiversityLs.toDF("l").select(col("l").cast("long").as("l"))
    classes
      .join(broadcast(ls))
      .groupBy("l")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("d_sensitive") < col("l"), 1L).otherwise(0L))
          .as("classes_below"),
        sum(when(col("d_sensitive") < col("l"), col("sz")).otherwise(0L))
          .as("rows_below"),
        sum(col("sz")).as("n_rows"))
      .select(col("l"), col("n_classes"), col("classes_below"),
        col("rows_below"),
        expr("(1000000 * rows_below) div n_rows").as("suppress_ppm"))
      .orderBy("l")
  }

  /** The t ladder (ppm) audited by [[tClosenessAudit]]. */
  val ClosenessTsPpm: Seq[Long] = Seq(50000L, 100000L, 200000L)

  /** t-closeness release audit — the third rung of the privacy triad
    * (k bounds re-identification, l bounds bare attribute VARIETY,
    * t bounds attribute DISTRIBUTION shift: a class can be 50-anonymous
    * and 3-diverse yet still reveal "these people are overwhelmingly
    * high-balance" if its balance distribution sits far from the
    * corpus's). Per QI class (nation, segment), the Earth-Mover's
    * Distance of its ordered balance-bucket distribution from the
    * GLOBAL one (Li et al. 2007's ordered-attribute EMD:
    * `Σ|cumulative p−q| / (m−1)`), computed EXACTLY over the common
    * denominator — cum_i = Σ_{j≤i} (class_cnt_j·N − global_cnt_j·sz) in
    * DECIMAL(38,0) (cnt·N passes 2⁶³ around a billion rows) — then the
    * ppm ladder readout: per t, classes above, rows inside them,
    * suppression ppm a release at that t pays.
    *
    * Scale shape: cell counts are (|QI classes| × |buckets|)-bounded
    * map-side-combined aggregates; the cumulative window runs over the
    * ≤12-row bucket domain per class, never the corpus; the ladder is a
    * broadcast of 3 literals.
    */
  def tClosenessAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.customer(s, dir)
      .select(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("b"))
    val global = rows.groupBy("b").agg(count(lit(1)).as("gc"))
    val cells = rows.groupBy("nation", "segment", "b")
      .agg(count(lit(1)).as("cc"))
    val sizes = rows.groupBy("nation", "segment").agg(count(lit(1)).as("sz"))
    // Dense (class x bucket) grid: every class sees the FULL ordered
    // bucket domain (missing cells are zero mass on that side).
    val grid = sizes.crossJoin(broadcast(global))
      .join(cells, Seq("nation", "segment", "b"), "left")
      .na.fill(0L, Seq("cc"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("nation", "segment").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = grid
      .withColumn("nTot", sum("gc").over(
        Window.partitionBy("nation", "segment")))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy("nation", "segment")))
      .withColumn("cum",
        sum(expr("CAST(cc AS DECIMAL(38,0)) * nTot - CAST(gc AS DECIMAL(38,0)) * sz"))
          .over(w))
      .groupBy("nation", "segment")
      .agg(
        max("sz").as("sz"),
        max("nTot").as("nTot"),
        max("m").as("m"),
        sum(abs(col("cum"))).as("sum_abs_cum"))
      .select(col("nation"), col("segment"), col("sz"),
        expr("""CAST((1000000 * sum_abs_cum)
               | div ((m - 1) * CAST(sz AS DECIMAL(38,0)) * nTot) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("emd_ppm"))
    val ts = ClosenessTsPpm.toDF("t_ppm")
      .select(col("t_ppm").cast("long").as("t_ppm"))
    totals
      .join(broadcast(ts))
      .groupBy("t_ppm")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("emd_ppm") > col("t_ppm"), 1L).otherwise(0L))
          .as("classes_above"),
        sum(when(col("emd_ppm") > col("t_ppm"), col("sz")).otherwise(0L))
          .as("rows_above"),
        sum(col("sz")).as("n_rows"))
      .select(col("t_ppm"), col("n_classes"), col("classes_above"),
        col("rows_above"),
        expr("(1000000 * rows_above) div n_rows").as("suppress_ppm"))
      .orderBy("t_ppm")
  }

  /** DuckDB oracle for [[tClosenessAudit]]. */
  val TClosenessOracleSql: String =
    s"""WITH r0 AS (
       | SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
       |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b
       | FROM customer),
       |g AS (SELECT b, CAST(count(*) AS HUGEINT) AS gc FROM r0 GROUP BY b),
       |cl AS (SELECT nation, segment, count(*) AS sz FROM r0 GROUP BY 1, 2),
       |ce AS (SELECT nation, segment, b, CAST(count(*) AS HUGEINT) AS cc
       |       FROM r0 GROUP BY 1, 2, 3),
       |grid AS (
       | SELECT cl.nation, cl.segment, cl.sz, g.b, g.gc, coalesce(ce.cc, 0) AS cc
       | FROM cl CROSS JOIN g
       | LEFT JOIN ce ON ce.nation = cl.nation AND ce.segment = cl.segment AND ce.b = g.b),
       |cum AS (
       | SELECT nation, segment, sz,
       |  sum(gc) OVER (PARTITION BY nation, segment) AS nTot,
       |  count(*) OVER (PARTITION BY nation, segment) AS m,
       |  sum(cc * (SELECT CAST(count(*) AS HUGEINT) FROM r0)
       |      - gc * CAST(sz AS HUGEINT))
       |   OVER (PARTITION BY nation, segment ORDER BY b
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
       | FROM grid),
       |emd AS (
       | SELECT nation, segment, max(sz) AS sz,
       |  CAST((1000000 * sum(abs(c)))
       |   // ((max(m) - 1) * CAST(max(sz) AS HUGEINT) * max(nTot)) AS BIGINT) AS emd_ppm
       | FROM cum GROUP BY 1, 2),
       |ts AS (SELECT CAST(t AS BIGINT) AS t_ppm FROM (VALUES ${ClosenessTsPpm.map(t => s"($t)").mkString(", ")}) t(t))
       |SELECT t_ppm,
       | count(*) AS n_classes,
       | CAST(sum(CASE WHEN emd_ppm > t_ppm THEN 1 ELSE 0 END) AS BIGINT) AS classes_above,
       | CAST(sum(CASE WHEN emd_ppm > t_ppm THEN sz ELSE 0 END) AS BIGINT) AS rows_above,
       | CAST((1000000 * sum(CASE WHEN emd_ppm > t_ppm THEN sz ELSE 0 END)) // sum(sz) AS BIGINT) AS suppress_ppm
       |FROM emd, ts GROUP BY t_ppm ORDER BY t_ppm""".stripMargin

  /** Release-policy small-cell floor and the binomial noise half-width
    * (bits in the hash window; noise = popcount − Bits/2 ∈ [−15, 15]).
    */
  val DpSuppressK = 10L
  private val DpBits = 30

  /** Differentially-private-STYLE noisy count release — the privacy
    * family's fourth rung: rows 234/263/281 AUDIT a release, this one
    * PERFORMS it. Per (event_type, day) cell: cells under the
    * [[DpSuppressK]] floor are suppressed outright (the small-cell rule
    * every statistical agency applies before noise), surviving counts
    * get additive binomial noise `popcount(h) − 15` where h is the
    * engine-portable PolyHash of the cell key — the BINOMIAL MECHANISM
    * (Dwork et al. 2006) with n=30, p=½ (σ ≈ 2.74), DERANDOMIZED: a real
    * deployment draws the noise from a DP sampler; here the draw is a
    * deterministic hash so the whole release replays bit-exactly in the
    * oracle (the same trade every gated sketch in this repo makes —
    * SEEDED noise, honest mechanics). True counts never appear in the
    * output. Scale shape: one map-side-combined aggregate over the
    * bounded (type × day) cell domain, then per-cell constant hash work.
    */
  def dpReleaseCounts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= DpSuppressK)
      .withColumn("h", graft.functions.GraftFunctions.poly_hash(
        concat(col("event_type"), lit(":"), col("day").cast("string"),
          lit(":dp1")),
        31, 1000000007L))
      .select(col("event_type"), col("day"),
        greatest(lit(0L),
          col("n") + expr(s"cast(bit_count(h) as bigint) - ${DpBits / 2}"))
          .as("n_released"))
      .orderBy("event_type", "day")
  }

  /** DuckDB oracle for [[dpReleaseCounts]]: identical cell fold, floor,
    * PolyHash draw, and popcount noise.
    */
  val DpReleaseOracleSql: String =
    s"""WITH c AS (
       | SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
       | FROM events GROUP BY 1, 2),
       |h AS (
       | SELECT event_type, day, n,
       |  list_reduce(
       |   list_prepend(0::BIGINT,
       |    list_transform(
       |     regexp_extract_all(event_type || ':' || CAST(day AS VARCHAR) || ':dp1', '(?s).'),
       |     ch -> unicode(ch)::BIGINT)),
       |   (acc, x) -> (acc * 31 + x) % 1000000007) AS h
       | FROM c WHERE n >= $DpSuppressK)
       |SELECT event_type, day,
       | CAST(greatest(0, n + (CAST(bit_count(h) AS BIGINT) - ${DpBits / 2})) AS BIGINT)
       |  AS n_released
       |FROM h ORDER BY event_type, day""".stripMargin

  /** DuckDB oracle for [[lDiversityAudit]]. */
  val LDiversityOracleSql: String =
    s"""WITH cls AS (
       | SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
       |  count(*) AS sz,
       |  count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS d_sensitive
       | FROM customer GROUP BY 1, 2),
       |ls AS (SELECT CAST(l AS BIGINT) AS l FROM (VALUES ${DiversityLs.map(l => s"($l)").mkString(", ")}) t(l))
       |SELECT l,
       | count(*) AS n_classes,
       | CAST(sum(CASE WHEN d_sensitive < l THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
       | CAST(sum(CASE WHEN d_sensitive < l THEN sz ELSE 0 END) AS BIGINT) AS rows_below,
       | CAST((1000000 * sum(CASE WHEN d_sensitive < l THEN sz ELSE 0 END)) // sum(sz) AS BIGINT) AS suppress_ppm
       |FROM cls, ls GROUP BY l ORDER BY l""".stripMargin
}
