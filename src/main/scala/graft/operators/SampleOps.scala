package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Deterministic sampling + output sharding for training-data curation.
  *
  * A 100 TB corpus is never used whole: pipelines rebalance language (or
  * domain) mix by downsampling head strata, and they write the survivors
  * into a fixed number of size-balanced shards. Both decisions must be
  * DETERMINISTIC — a function of the document alone — so that re-runs,
  * retries, and incremental ingests select the same rows without any
  * coordination state. Random `sample()` fails that bar (partition-order
  * dependent); hashing the document body does not.
  *
  * The selector is the [[graft.functions.PolyHash]] fingerprint
  * (base 31, mod 1e9+7 — the same codegen expression `doc_fingerprint`
  * oracle-checks) reduced mod 1000 to a permille bucket: a document is
  * kept iff its bucket falls under its stratum's keep-rate. Everything is
  * integer Column algebra inside whole-stage codegen — one scan, no
  * shuffle at all for the sample itself (the ORDER BY in the registered
  * query is presentation only).
  */
object SampleOps {

  /** Keep-rates in permille per language stratum: English is the head
    * stratum (~44% of the corpus) and is downsampled 2.8×; the tail
    * languages keep 700‰. The rates are data, not logic — callers pass
    * their own mix.
    */
  val DefaultRates: Map[String, Int] = Map(
    "en" -> 250, "es" -> 700, "fr" -> 700, "de" -> 700, "zh" -> 700)
  val DefaultRate: Int = 500

  private def bucket: Column =
    GraftFunctions.poly_hash(col("text"), 31, 1000000007L) % 1000

  private def rateFor(rates: Map[String, Int], default: Int): Column =
    rates.foldLeft(lit(default)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, lit(r)).otherwise(acc)
    }

  /** The sampled slice: every kept document with its stratum and permille
    * bucket, so the selection itself is auditable (bucket < rate holds on
    * every output row).
    */
  def stratifiedSample(
      docs: DataFrame,
      rates: Map[String, Int] = DefaultRates,
      default: Int = DefaultRate): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), bucket.as("hash_bucket"))
      .filter(col("hash_bucket") < rateFor(rates, default))
      .orderBy("doc_id")

  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(s, dir))

  /** Shard assignment plan: route each document to one of `nShards`
    * output shards by fingerprint, and report per-shard document and
    * character totals — the balance check a pipeline runs BEFORE the
    * (expensive) partitioned write. The fingerprint is uniform mod the
    * shard count, so shards stay byte-balanced without a global sort;
    * the write itself is `ParquetSink` partitioned by `shard`.
    */
  def shardPlan(docs: DataFrame, nShards: Int = 16): DataFrame =
    docs
      .select(
        (GraftFunctions.poly_hash(col("text"), 31, 1000000007L) % nShards)
          .as("shard"),
        col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("total_chars"))
      .orderBy("shard")

  def shardPlanQuery(s: SparkSession, dir: String): DataFrame =
    shardPlan(Tables.documents(s, dir))

  /** Content-addressed shard manifest — the step-output record a pipeline
    * publishes beside each written shard so a downstream run (or a
    * re-run) can diff datasets WITHOUT re-reading payload bytes: per
    * shard, the doc count, byte mass, id range, and an order-independent
    * content digest (sum of per-doc PolyHash fingerprints mod the same
    * prime — commutative, so any partitioning/task order yields the
    * identical digest; two manifests agree iff the shard contents agree
    * up to hash collision). Extends [[shardPlan]] from a balance check to
    * a provenance artifact.
    *
    * Scale shape: one map-side-combined groupBy over nShards keys; every
    * aggregate is a bounded integer fold, so the manifest costs exactly
    * one scan at any corpus size.
    */
  def shardManifest(docs: DataFrame, nShards: Int = 16): DataFrame =
    manifestAgg(docs, nShards).orderBy("shard")

  /** Reshard-movement audit: when the shard count grows `nFrom` →
    * `nFrom + 1`, what fraction of keys MOVE under plain mod-N routing
    * versus rendezvous (highest-random-weight) hashing — the ops
    * question behind every shard-split at 100 TB, where "move" means
    * re-copying payload bytes. Mod-N moves ~N/(N+1) of everything (the
    * reshuffle that makes naive splits unaffordable); rendezvous moves
    * exactly the keys the NEW shard wins, ~1/(N+1) — the minimal-
    * disruption property (Thaler–Ravishankar 1998), quantified here on
    * the corpus's own keys.
    *
    * Scale shape: ZERO shuffles before the 2-row output — per row the
    * (N+1) per-shard ranks are an `array_max` over a generated literal
    * array (each rank `(poly_hash(key#shard)² mod p)·64 + shard`,
    * unique by construction so the argmax is deterministic without
    * ties), and the whole audit is one map-side-combined global
    * aggregate; the 2-row readout explodes from the single aggregate
    * row rather than re-scanning per scheme.
    *
    * The SQUARING is load-bearing: a polynomial hash is AFFINE in any
    * single changed character — `poly_hash(key#16)` and
    * `poly_hash(key#15)` differ by a constant, so the raw hash is
    * monotone in the shard digit and the highest shard wins EVERY key
    * (measured: 100% movement — the differential spec caught it).
    * `h² mod p` makes the difference depend on the key
    * ((x+c)² − x² = 2xc + c²), restoring the per-key pseudo-random
    * ordering rendezvous requires; measured movement ≈ 1/(N+1).
    */
  def reshardAudit(docs: DataFrame, nFrom: Int = 16): DataFrame = {
    val nTo = nFrom + 1
    val key = col("doc_id").cast("string")
    def rank(i: Int) = {
      val h = GraftFunctions.poly_hash(
        concat(key, lit("#"), lit(i.toString)), 31, 1000000007L)
      (h * h % 1000000007L) * 64L + i
    }
    val fromShard = array_max(array((0 until nFrom).map(rank): _*)) % 64
    val toShard = array_max(array((0 until nTo).map(rank): _*)) % 64
    docs
      .select(
        (col("doc_id") % nFrom =!= col("doc_id") % nTo)
          .cast("long").as("mod_moved"),
        (fromShard =!= toShard).cast("long").as("hrw_moved"))
      .agg(count(lit(1)).as("docs"),
        sum("mod_moved").as("mod_m"), sum("hrw_moved").as("hrw_m"))
      .select(explode(array(
        struct(lit("mod").as("scheme"), col("docs"),
          col("mod_m").as("moved"),
          expr("(1000000 * mod_m) div docs").as("moved_ppm")),
        struct(lit("rendezvous").as("scheme"), col("docs"),
          col("hrw_m").as("moved"),
          expr("(1000000 * hrw_m) div docs").as("moved_ppm")))).as("r"))
      .select(col("r.scheme").as("scheme"), col("r.docs").as("docs"),
        col("r.moved").as("moved"), col("r.moved_ppm").as("moved_ppm"))
      .orderBy("scheme")
  }

  def reshardAuditQuery(s: SparkSession, dir: String): DataFrame =
    reshardAudit(Tables.documents(s, dir))

  /** DuckDB oracle for [[reshardAudit]]: the identical squared
    * poly-hash ranks via the repo's established list_reduce formulation
    * (the square as an explicit `h * h` product — DuckDB's `^` is a
    * DOUBLE power, inexact past 2⁵³), list_max over a list
    * comprehension per shard count.
    */
  def reshardAuditOracleSql(nFrom: Int = 16): String = {
    val nTo = nFrom + 1
    def ph(expr: String) =
      s"""list_reduce(list_prepend(0::BIGINT,
         |   list_transform(regexp_extract_all($expr, '(?s).'),
         |    c -> unicode(c)::BIGINT)),
         |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin
    def best(n: Int) = {
      val h = ph("ks || '#' || CAST(sh AS VARCHAR)")
      s"""list_max(list_transform(range($n),
         |  sh -> (($h) * ($h) % 1000000007) * 64 + sh)) % 64""".stripMargin
    }
    s"""WITH k AS (
       | SELECT doc_id, CAST(doc_id AS VARCHAR) AS ks FROM documents),
       |f AS (
       | SELECT
       |  CASE WHEN doc_id % $nFrom <> doc_id % $nTo THEN 1 ELSE 0 END
       |   AS mod_moved,
       |  CASE WHEN ${best(nFrom)} <> ${best(nTo)} THEN 1 ELSE 0 END
       |   AS hrw_moved
       | FROM k),
       |a AS (
       | SELECT count(*) AS docs,
       |  CAST(sum(mod_moved) AS BIGINT) AS mod_m,
       |  CAST(sum(hrw_moved) AS BIGINT) AS hrw_m
       | FROM f)
       |SELECT 'mod' AS scheme, docs, mod_m AS moved,
       | (1000000 * mod_m) // docs AS moved_ppm FROM a
       |UNION ALL
       |SELECT 'rendezvous', docs, hrw_m,
       | (1000000 * hrw_m) // docs FROM a
       |ORDER BY scheme""".stripMargin
  }

  /** The manifest aggregation without the final sort — every aggregate
    * here is mergeable (count/sum/min/max in a commutative monoid), which
    * is what lets [[graft.streaming.StreamingManifest]] run the IDENTICAL
    * expressions as an incremental streaming state and land on the same
    * digests the batch pass computes (pinned by the differential spec).
    */
  private[graft] def manifestAgg(docs: DataFrame, nShards: Int): DataFrame = {
    val fp = GraftFunctions.poly_hash(col("text"), 31, 1000000007L)
    docs
      .select((fp % nShards).as("shard"), fp.as("fp"),
        col("doc_id"), col("n_chars"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("total_chars"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"),
        // decimal(38,0) accumulator: a long sum of ~2^30 fingerprints
        // wraps silently past ~10^9 rows; DuckDB's hugeint sum does not.
        (sum(col("fp").cast("decimal(38,0)")) % 1000000007L)
          .cast("long").as("content_digest"))
  }

  def shardManifestQuery(s: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.documents(s, dir))

  /** Per-shard release drift between the raw corpus and its
    * quality-curated cut ([[TextOps.qualityFlags]] keep rules) — the diff
    * a publisher reads before shipping: per shard, raw/curated doc and
    * byte mass, what curation removed, and BOTH content digests with a
    * changed flag, so an unchanged shard (digest equal) can skip
    * re-publication entirely.
    *
    * ONE scan, one shuffle: instead of manifesting the raw and curated
    * frames separately (two scans of the same table), every row carries
    * its `keep` bit and the curated aggregates are conditional sums
    * beside the raw ones — the two manifests come out of a single
    * map-side-combined groupBy.
    */
  def manifestDrift(s: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    val fp = GraftFunctions.poly_hash(col("text"), 31, 1000000007L)
    TextOps.qualityFlags(Tables.documents(s, dir))
      .select((fp % nShards).as("shard"), fp.as("fp"),
        col("n_chars"), col("keep"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("docs_raw"),
        sum("keep").as("docs_cur"),
        sum("n_chars").cast("long").as("chars_raw"),
        sum(col("n_chars") * col("keep")).cast("long").as("chars_cur"),
        (sum(col("fp").cast("decimal(38,0)")) % 1000000007L)
          .cast("long").as("digest_raw"),
        (sum((col("fp") * col("keep")).cast("decimal(38,0)")) % 1000000007L)
          .cast("long").as("digest_cur"))
      .select(col("shard"), col("docs_raw"), col("docs_cur"),
        (col("docs_raw") - col("docs_cur")).as("docs_removed"),
        (col("chars_raw") - col("chars_cur")).as("chars_removed"),
        col("digest_raw"), col("digest_cur"),
        (col("digest_raw") =!= col("digest_cur")).cast("long")
          .as("digest_changed"))
      .orderBy("shard")
  }

  /** DuckDB oracle for [[manifestDrift]] — the keep rules inlined from
    * the `quality_filter` oracle, the digests from [[FingerprintSql]].
    */
  def manifestDriftOracleSql(nShards: Int = 16): String =
    s"""WITH t AS (
       | SELECT doc_id, n_chars, text,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_chars_nows,
       |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       |  CAST(len(regexp_extract_all(text, '\\b(the|and|is|of|to|in|it|a)\\b')) AS BIGINT) AS n_stopwords
       | FROM documents),
       |f AS (
       | SELECT n_chars, $FingerprintSql AS fp,
       |  CAST(NOT (n_tokens < 20)
       |   AND (1000 * n_chars_nows) // greatest(n_tokens, 1) BETWEEN 3000 AND 5000
       |   AND n_stopwords > 0
       |   AND (1000 * n_punct) // greatest(n_tokens, 1) <= 200 AS BIGINT) AS keep
       | FROM t)
       |SELECT fp % $nShards AS shard,
       | count(*) AS docs_raw,
       | CAST(sum(keep) AS BIGINT) AS docs_cur,
       | CAST(count(*) - sum(keep) AS BIGINT) AS docs_removed,
       | CAST(sum(n_chars) - sum(n_chars * keep) AS BIGINT) AS chars_removed,
       | CAST(sum(fp) % 1000000007 AS BIGINT) AS digest_raw,
       | CAST(sum(fp * keep) % 1000000007 AS BIGINT) AS digest_cur,
       | CAST(CAST(sum(fp) % 1000000007 AS BIGINT)
       |  <> CAST(sum(fp * keep) % 1000000007 AS BIGINT) AS BIGINT) AS digest_changed
       |FROM f GROUP BY 1 ORDER BY shard""".stripMargin

  /** DuckDB oracle for [[shardManifest]]. */
  def shardManifestOracleSql(nShards: Int = 16): String =
    s"""WITH f AS (
       | SELECT doc_id, n_chars, $FingerprintSql AS fp
       | FROM documents)
       |SELECT fp % $nShards AS shard, count(*) AS n_docs,
       | CAST(sum(n_chars) AS BIGINT) AS total_chars,
       | min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       | CAST(sum(fp) % 1000000007 AS BIGINT) AS content_digest
       |FROM f GROUP BY 1 ORDER BY shard""".stripMargin

  /** The full curation pipeline as ONE declarative plan: quality-filter
    * (keep only documents passing every [[TextOps.qualityFilter]] rule),
    * stratified downsample ([[stratifiedSample]] rates), then shard
    * routing — reporting per-shard counts of the curated corpus. This is
    * the composition a training-data run executes end-to-end; expressing
    * it as one plan lets Catalyst collapse all three steps into a single
    * scan + one aggregation shuffle (the filters and the fingerprint are
    * all narrow Column algebra over the same rows).
    */
  def curationPipeline(
      s: SparkSession,
      dir: String,
      nShards: Int = 16): DataFrame =
    TextOps.qualityFlags(Tables.documents(s, dir))
      .filter(col("keep") === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        bucket.as("hash_bucket"),
        (GraftFunctions.poly_hash(col("text"), 31, 1000000007L) % nShards)
          .as("shard"))
      .filter(col("hash_bucket") < rateFor(DefaultRates, DefaultRate))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("total_chars"))
      .orderBy("shard")

  def curationOracleSql(nShards: Int = 16): String = {
    val cases = DefaultRates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString(" ")
    s"""WITH t AS (
       | SELECT doc_id, lang, n_chars, text,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_chars_nows,
       |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       |  CAST(len(regexp_extract_all(text, '\\b(the|and|is|of|to|in|it|a)\\b')) AS BIGINT) AS n_stopwords
       | FROM documents),
       |kept AS (
       | SELECT doc_id, lang, n_chars, text FROM t
       | WHERE NOT (n_tokens < 20)
       |  AND (1000 * n_chars_nows) // greatest(n_tokens, 1) BETWEEN 3000 AND 5000
       |  AND n_stopwords > 0
       |  AND (1000 * n_punct) // greatest(n_tokens, 1) <= 200),
       |f AS (
       | SELECT doc_id, lang, n_chars,
       |  $FingerprintSql % 1000 AS hash_bucket,
       |  $FingerprintSql % $nShards AS shard
       | FROM kept)
       |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM f WHERE hash_bucket < (CASE $cases ELSE $DefaultRate END)
       |GROUP BY shard ORDER BY shard""".stripMargin
  }

  final case class MinKBuffer(items: List[(Long, Long)])
  final case class MinKOutput(items: Seq[(Long, Long)])

  /** Keeps the k smallest (sortKey, id) pairs, associatively — the
    * [[TopKOps.TopKAggregator]] shape pointed the other way. Partial
    * aggregation bounds every map task's state at k entries, so the
    * exchange carries ≤ k rows per (task, stratum) — the scalable form of
    * per-stratum selection. (A `row_number` window would instead funnel a
    * 100 TB head stratum through ONE task to sort it.)
    */
  final class MinKAggregator(k: Int)
      extends Aggregator[(String, Long, Long), MinKBuffer, MinKOutput] {
    private def key(e: (Long, Long)) = e
    // Amortized bounded insert (same shape as AnnOps.CosTopK): cons per
    // row, prune back to the k smallest only at 2k occupancy — keeping a
    // prune-to-k at any point is lossless for the final min-k set.
    override def zero: MinKBuffer = MinKBuffer(Nil)
    override def reduce(b: MinKBuffer, r: (String, Long, Long)): MinKBuffer = {
      val grown = (r._2, r._3) :: b.items
      MinKBuffer(
        if (grown.lengthCompare(2 * k) >= 0) grown.sortBy(key).take(k) else grown)
    }
    override def merge(a: MinKBuffer, b: MinKBuffer): MinKBuffer =
      MinKBuffer((a.items ++ b.items).sortBy(key).take(k))
    override def finish(r: MinKBuffer): MinKOutput = MinKOutput(r.items.sortBy(key).take(k))
    override def bufferEncoder: Encoder[MinKBuffer] = Encoders.product[MinKBuffer]
    override def outputEncoder: Encoder[MinKOutput] = Encoders.product[MinKOutput]
  }

  /** Fixed-size per-stratum sample: exactly min(n, |stratum|) documents
    * per language, selected as the n smallest fingerprints (doc_id tie-
    * break) — deterministic "give me 50 eval docs per language"
    * selection, complementing the rate-based [[stratifiedSample]].
    */
  def fixedPerStratum(s: SparkSession, dir: String, n: Int = 50): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select(col("lang"),
        GraftFunctions.poly_hash(col("text"), 31, 1000000007L).as("fp"),
        col("doc_id"))
      .as[(String, Long, Long)]
    docs
      .groupByKey(_._1)
      .agg(new MinKAggregator(n).toColumn.name("sample"))
      .toDF("lang", "sample")
      .select(col("lang"), posexplode(col("sample.items")))
      .select(
        col("col._2").as("doc_id"),
        col("lang"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy("doc_id")
  }

  def fixedOracleSql(n: Int = 50): String =
    s"""WITH f AS (
       | SELECT doc_id, lang, $FingerprintSql AS fp FROM documents),
       |r AS (
       | SELECT doc_id, lang,
       |  CAST(row_number() OVER (PARTITION BY lang ORDER BY fp, doc_id) AS BIGINT) AS rank
       | FROM f)
       |SELECT doc_id, lang, rank FROM r WHERE rank <= $n ORDER BY doc_id""".stripMargin

  /** DuckDB oracle fragment computing the same fingerprint — kept next to
    * the operator so the Spark expression and its oracle stay in lockstep
    * (same shape the `doc_fingerprint` oracle uses). The '(?s).' dot-all
    * split hashes newlines like the Spark-side PolyHash does, so the
    * oracles stay exact on corpora with embedded newlines.
    */
  val FingerprintSql: String =
    """list_reduce(
      |  list_prepend(0::BIGINT,
      |   list_transform(regexp_extract_all(text, '(?s).'), c -> unicode(c)::BIGINT)),
      |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  def sampleOracleSql(
      rates: Map[String, Int] = DefaultRates,
      default: Int = DefaultRate): String = {
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString(" ")
    s"""WITH f AS (
       | SELECT doc_id, lang, $FingerprintSql % 1000 AS hash_bucket
       | FROM documents)
       |SELECT doc_id, lang, hash_bucket FROM f
       |WHERE hash_bucket < (CASE $cases ELSE $default END)
       |ORDER BY doc_id""".stripMargin
  }

  def shardOracleSql(nShards: Int = 16): String =
    s"""WITH f AS (
       | SELECT $FingerprintSql % $nShards AS shard, n_chars
       | FROM documents)
       |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM f GROUP BY shard ORDER BY shard""".stripMargin

  /** Per-source quota capping — keep only the top `quota` documents per
    * source, ranked by size then id: the head-domain cap every crawl
    * pipeline applies so one boilerplate-heavy domain cannot dominate
    * the training mix. Reuses [[TopKOps.TopKAggregator]] (bounded
    * k-entry buffers with partial aggregation), so a head source with
    * billions of documents still ships at most `quota` candidates per
    * map task through the shuffle — the window-function formulation the
    * ORACLE runs would sort the whole head-source stratum in one task.
    */
  def sourceQuota(s: SparkSession, dir: String, quota: Int = 10): DataFrame = {
    import s.implicits._
    val rows = Tables.documents(s, dir)
      .select(col("source"), col("n_chars").cast("double"), col("doc_id"))
      .as[(String, Double, Long)]
    val topCol = new TopKOps.TopKAggregator(quota).toColumn
    rows
      .groupByKey(_._1)
      .agg(topCol.name("top"))
      .toDF("source", "top")
      .select(col("source"), posexplode(col("top.items")))
      .select(
        col("source"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("doc_id"),
        col("col._1").cast("long").as("n_chars"))
      .orderBy("source", "rank")
  }

  def sourceQuotaOracleSql(quota: Int = 10): String =
    s"""WITH r AS (
       | SELECT source, doc_id, n_chars,
       |  CAST(row_number() OVER (PARTITION BY source
       |   ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
       | FROM documents)
       |SELECT source, rank, doc_id, CAST(n_chars AS BIGINT) AS n_chars
       |FROM r WHERE rank <= $quota ORDER BY source, rank""".stripMargin

  /** Uniform target mixture for [[mixturePlan]] (permille per language,
    * must sum to 1000).
    */
  val TargetMixture: Map[String, Int] =
    Map("en" -> 200, "es" -> 200, "fr" -> 200, "de" -> 200, "zh" -> 200)

  /** Language-mixture rebalancing plan — the data-mixing step of a
    * training run: given target shares, compute the LARGEST output
    * corpus achievable by pure downsampling (no upsampling) that hits
    * the targets exactly, and each language's take and sampling rate.
    * `capacity_l = 1000·n_l ÷ target_l` is the output size at which
    * language l is exhausted; the binding (minimum) capacity sets the
    * plan. All integer arithmetic; one count aggregation (|languages|
    * rows) and a one-row cross-join — nothing corpus-sized moves.
    */
  def mixturePlan(s: SparkSession, dir: String): DataFrame =
    mixturePlanFor(Tables.documents(s, dir))

  /** The plan over any frame with a `lang` column (split out so corpora
    * with languages OUTSIDE the target mixture are testable).
    */
  def mixturePlanFor(docs: DataFrame): DataFrame = {
    val targetCol = TargetMixture.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (l, t)) =>
        acc.when(col("lang") === l, lit(t.toLong))
      }.otherwise(lit(0L))
    val byLang = docs
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("target_permille", targetCol)
      // Languages outside the target mixture are excluded from the plan
      // (the oracle's inner join against the target table does the same)
      // — and without this filter their target of 0 divides by zero
      // under ANSI mode on any corpus with an unlisted language.
      .filter(col("target_permille") > 0)
      .withColumn("capacity", expr("(1000 * n) div target_permille"))
    val total = byLang.agg(
      sum("n").cast("long").as("corpus_total"),
      min("capacity").as("out_total"))
    byLang.crossJoin(broadcast(total))
      .select(
        col("lang"), col("n"),
        expr("(1000 * n) div corpus_total").as("share_permille"),
        col("target_permille"),
        expr("(target_permille * out_total) div 1000").as("take"),
        expr("(1000 * ((target_permille * out_total) div 1000)) div n")
          .as("rate_permille"))
      .orderBy("lang")
  }

  def mixtureOracleSql(): String = {
    val targets = TargetMixture.toSeq.sortBy(_._1)
      .map { case (l, t) => s"('$l', $t)" }.mkString(", ")
    s"""WITH tgt (lang, target_permille) AS (VALUES $targets),
       |b AS (
       | SELECT d.lang, count(*) AS n, CAST(t.target_permille AS BIGINT) AS target_permille
       | FROM documents d JOIN tgt t ON d.lang = t.lang GROUP BY d.lang, t.target_permille),
       |c AS (SELECT lang, n, target_permille, (1000 * n) // target_permille AS capacity FROM b),
       |tot AS (
       | SELECT CAST(sum(n) AS BIGINT) AS corpus_total, CAST(min(capacity) AS BIGINT) AS out_total
       | FROM c)
       |SELECT lang, n, (1000 * n) // corpus_total AS share_permille, target_permille,
       | (target_permille * out_total) // 1000 AS take,
       | (1000 * ((target_permille * out_total) // 1000)) // n AS rate_permille
       |FROM c CROSS JOIN tot ORDER BY lang""".stripMargin
  }

  /** Weighted systematic sampling: ~`k` documents selected proportionally
    * to `n_chars` by cumulative-weight step crossings — the deterministic,
    * coordination-free weighted sampler (a fixed function of the corpus,
    * unlike `rand()`-keyed A-ES whose float powers are neither
    * engine-portable nor rerun-stable). A document is picked once per
    * step boundary its weight interval `(cum - w, cum]` crosses
    * (`picks = cum div step − (cum−w) div step`), so heavy docs can carry
    * multiple picks and total picks telescope to `total div step` ≈ k.
    *
    * Scale shape: the cumulative weight is a HIERARCHICAL prefix sum
    * (the [[graft.operators.RankOps]] pattern) — per-bucket sums collapse
    * map-side, the carry window walks the bucket domain (rows = id-range
    * / 256, metadata-sized), and the intra-bucket running sum partitions
    * by bucket; no whole-corpus serial window. The ORACLE computes the
    * flat serial prefix sum — an independent formulation.
    */
  def sampleWeighted(s: SparkSession, dir: String, k: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val totals = docs.agg(sum("n_chars").as("total"))
    val bucketed = docs.withColumn("bk", expr("doc_id div 256"))
    val carry = bucketed.groupBy("bk").agg(sum("n_chars").as("bsum"))
      .withColumn("carry", coalesce(
        sum("bsum").over(Window.orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bk", "carry")
    bucketed.join(carry, Seq("bk"))
      .withColumn("run", sum("n_chars").over(
        Window.partitionBy("bk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum", col("carry") + col("run"))
      .crossJoin(broadcast(totals))
      .withColumn("step", expr(s"greatest(1L, total div $k)"))
      .withColumn("picks", expr("cum div step - (cum - n_chars) div step"))
      .filter(col("picks") > 0)
      .select(col("doc_id"), col("n_chars"), col("cum"), col("picks"))
      .orderBy("doc_id")
  }

  def sampleWeightedOracleSql(k: Long = 100L): String =
    s"""WITH c AS (
       | SELECT doc_id, n_chars,
       |  CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |   AS BIGINT) AS cum
       | FROM documents),
       |t AS (SELECT greatest(1, CAST(sum(n_chars) AS BIGINT) // $k) AS step
       |      FROM documents)
       |SELECT doc_id, n_chars, cum,
       | cum // step - (cum - n_chars) // step AS picks
       |FROM c, t
       |WHERE cum // step - (cum - n_chars) // step > 0
       |ORDER BY doc_id""".stripMargin

  /** Pareto (80/20) source-coverage cut: which sources, taken largest
    * first, cover 80% of the corpus — the "how concentrated is my feed"
    * audit. The corpus collapses to per-source counts first; the
    * cumulative window walks only the source list (metadata-sized).
    * `core_flag` marks the minimal covering prefix (every source whose
    * PREDECESSORS cover < 80%, so the crossing source is included).
    */
  def paretoSources(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, dir)
      .groupBy("source").agg(count(lit(1)).as("docs"))
    val total = counts.agg(sum("docs").as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("cum_docs", sum("docs").over(
        Window.orderBy(desc("docs"), col("source"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("core_flag",
        ((col("cum_docs") - col("docs")) * 100 < col("total") * 80).cast("long"))
      .select(col("source"), col("docs"), col("cum_docs"), col("core_flag"))
      .orderBy(desc("docs"), col("source"))
  }

  def paretoSourcesOracleSql(): String =
    """WITH c AS (SELECT source, count(*) AS docs FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(docs) AS BIGINT) AS total FROM c),
      |r AS (
      | SELECT source, docs,
      |  CAST(sum(docs) OVER (ORDER BY docs DESC, source
      |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs
      | FROM c)
      |SELECT source, docs, cum_docs,
      | CAST(CASE WHEN (cum_docs - docs) * 100 < total * 80 THEN 1 ELSE 0 END
      |  AS BIGINT) AS core_flag
      |FROM r, t ORDER BY docs DESC, source""".stripMargin

  /** Per-source language-diversity audit via Gini impurity in ppm:
    * `1e6 − Σ_lang (1e6·c²) div tot²` — 0 means a monolingual source,
    * higher means a more even language mix. The pure-ratio form (no
    * logs) keeps it exact-integer end to end, unlike Shannon entropy —
    * the same decision a mixture planner makes, on auditable numbers.
    * One (source, lang) aggregate (bounded by &#124;sources&#124;×&#124;langs&#124;),
    * then a per-source collapse.
    */
  def giniDiversity(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("docs"), count(lit(1)).as("langs"),
        sum(col("c") * col("c")).as("ssq"))
      .select(col("source"), col("docs"), col("langs"),
        (lit(1000000L) - expr("(1000000 * ssq) div (docs * docs)"))
          .as("gini_ppm"))
      .orderBy("source")
  }

  val GiniDiversityOracleSql: String =
    """WITH g AS (
      | SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
      |p AS (
      | SELECT source, sum(c) AS docs, count(*) AS langs,
      |  sum(c * c) AS ssq
      | FROM g GROUP BY source)
      |SELECT source, CAST(docs AS BIGINT) AS docs,
      | CAST(langs AS BIGINT) AS langs,
      | CAST(1000000 - (1000000 * ssq) // (docs * docs) AS BIGINT) AS gini_ppm
      |FROM p ORDER BY source""".stripMargin

  /** Temperature-scaled source mixture (τ = 1/2): the Pile/LLaMA-style
    * rebalancing that flattens the source distribution by sampling
    * source i proportionally to n_i^τ instead of n_i — big feeds are
    * de-emphasized, small curated feeds boosted, without hand-set
    * targets. τ = 1/2 makes the weight `sqrt(n)`, an IEEE-754
    * correctly-rounded op both engines compute bit-identically, frozen
    * to fixed point (`floor(sqrt(n)·1e6)`) BEFORE any further
    * arithmetic so shares divide as exact integers. Output: raw vs
    * tempered milli shares and the boost factor. |sources| rows from
    * one count aggregation — nothing corpus-sized moves.
    */
  def mixtureTemperature(s: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(s, dir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("w_fp",
        floor(sqrt(col("n").cast("double")) * lit(1000000.0d)).cast("long"))
    val tot = bySrc.agg(
      sum("n").cast("long").as("total_docs"),
      sum("w_fp").cast("long").as("total_w"))
    bySrc.crossJoin(broadcast(tot))
      .select(
        col("source"), col("n"),
        expr("(1000 * n) div total_docs").as("raw_share_milli"),
        expr("(1000 * w_fp) div total_w").as("temp_share_milli"),
        expr("""(1000 * ((1000 * w_fp) div total_w))
               | div greatest((1000 * n) div total_docs, 1)"""
          .stripMargin.replace("\n", " ")).as("boost_milli"))
      .orderBy("source")
  }

  /** Token-budget epoch schedule — the executable form of a tempered
    * mixture: given a training token budget (`BudgetX`× the corpus) and
    * τ = 1/2 source weights over TOKEN counts (not doc counts — the
    * unit a trainer actually consumes), each source's allocation splits
    * into whole epochs (full passes) plus a fractional-epoch remainder
    * expressed as a milli sampling rate for the final pass. This is the
    * table a data loader executes directly: `full_epochs` passes over
    * source i, then one pass sampled at `rem_rate_milli`. Upsampling
    * (epochs > 1 for small curated feeds) and downsampling (epochs = 0,
    * remainder-only for huge feeds) fall out of the same arithmetic.
    *
    * Scale shape: one `size(tokens)` projection (no explode) collapsed
    * to |sources| rows map-side; everything after is a 1-row broadcast
    * cross-join. sqrt freezes to fixed point before any division, as in
    * [[mixtureTemperature]].
    */
  val BudgetX = 2L

  def epochSchedule(s: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(s, dir)
      .select(col("source"),
        expr("cast(size(regexp_extract_all(text, '\\\\S+', 0)) as long)")
          .as("n_tok"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .withColumn("w_fp",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0d))
          .cast("long"))
    val tot = bySrc.agg(
      sum("n_tokens").cast("long").as("total_tokens"),
      sum("w_fp").cast("long").as("total_w"))
    // STAGED fixed-point (the tokenLiftProfile rule): share_ppm first,
    // then target — never w_fp·Budget·total in one monomial, which
    // overflows BIGINT near 1e26 at 100 TB token counts (w_fp ~4.5e12 ×
    // budget ~4e13). target uses the EXACT split
    // `s·B div 1e6 = s·(B div 1e6) + (s·(B mod 1e6)) div 1e6` — both
    // products stay under 4e13 / 1e12, and the identity is exact floor
    // division, so small corpora (B < 1e6) lose nothing.
    bySrc.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(1000000 * w_fp) div total_w"))
      .withColumn("target_tokens",
        expr(s"""share_ppm * (($BudgetX * total_tokens) div 1000000)
                | + (share_ppm * (($BudgetX * total_tokens) % 1000000))
                |  div 1000000""".stripMargin.replace("\n", " ")))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        col("share_ppm"), col("target_tokens"),
        expr("target_tokens div n_tokens").as("full_epochs"),
        expr("(1000 * (target_tokens % n_tokens)) div n_tokens")
          .as("rem_rate_milli"))
      .orderBy("source")
  }

  val EpochScheduleOracleSql: String =
    s"""WITH b AS (
       | SELECT source, count(*) AS n_docs,
       |  CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n_tokens
       | FROM documents GROUP BY source),
       |w AS (
       | SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
       |  AS BIGINT) AS w_fp FROM b),
       |t AS (
       | SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(w_fp) AS BIGINT) AS total_w FROM w),
       |sh AS (
       | SELECT w.*, t.total_tokens,
       |  (1000000 * w_fp) // total_w AS share_ppm
       | FROM w CROSS JOIN t),
       |tg AS (
       | SELECT *, share_ppm * (($BudgetX * total_tokens) // 1000000)
       |  + (share_ppm * (($BudgetX * total_tokens) % 1000000)) // 1000000
       |  AS target_tokens FROM sh)
       |SELECT source, n_docs, n_tokens, share_ppm, target_tokens,
       | target_tokens // n_tokens AS full_epochs,
       | (1000 * (target_tokens % n_tokens)) // n_tokens AS rem_rate_milli
       |FROM tg ORDER BY source""".stripMargin

  val MixtureTemperatureOracleSql: String =
    """WITH b AS (
      | SELECT source, count(*) AS n,
      |  CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
      |   AS w_fp
      | FROM documents GROUP BY source),
      |t AS (
      | SELECT CAST(sum(n) AS BIGINT) AS total_docs,
      |  CAST(sum(w_fp) AS BIGINT) AS total_w FROM b)
      |SELECT source, n,
      | (1000 * n) // total_docs AS raw_share_milli,
      | (1000 * w_fp) // total_w AS temp_share_milli,
      | (1000 * ((1000 * w_fp) // total_w))
      |  // greatest((1000 * n) // total_docs, 1) AS boost_milli
      |FROM b CROSS JOIN t ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // Leave-one-source-out quality ablation
  // -------------------------------------------------------------------

  /** Leave-one-source-out quality ablation: for each source, the corpus
    * keep-rate (Gopher rules, [[TextOps.qualityFlags]]) WITHOUT that
    * source, and the ppm delta against the full corpus — the data-mixing
    * readout that ranks sources by how much removing them would move
    * corpus quality, computed from per-source totals alone (never a
    * second scan per source: ablating source X from an additive metric
    * is total minus X's contribution).
    *
    * Scale shape: one scan -> per-source totals (bounded source domain,
    * map-side combined) -> a one-row totals frame broadcast back. The
    * leave-one-out arithmetic is per-source integer math on that tiny
    * frame; cost is one pass at any corpus size.
    */
  def sourceAblation(s: SparkSession, dir: String): DataFrame = {
    val per = TextOps.qualityFlags(Tables.documents(s, dir))
      .select(col("source"), col("keep").cast("long").as("keep"), col("n_chars"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum("keep").as("kept"),
        sum("n_chars").cast("long").as("chars"))
    val tot = per.agg(
      sum("docs").as("t_docs"), sum("kept").as("t_kept"),
      sum("chars").as("t_chars"))
    per.crossJoin(broadcast(tot))
      .select(
        col("source"), col("docs"),
        expr("(1000000 * kept) div docs").as("kept_ppm"),
        expr("(1000000 * chars) div t_chars").as("char_share_ppm"),
        expr("(1000000 * (t_kept - kept)) div greatest(t_docs - docs, 1)")
          .as("kept_ppm_excl"),
        (expr("(1000000 * (t_kept - kept)) div greatest(t_docs - docs, 1)") -
          expr("(1000000 * t_kept) div t_docs")).as("delta_ppm"))
      .orderBy("source")
  }

  /** Per-source selection fraction for [[selectionScores]], in milli. */
  val SelectMilli = 600L

  /** The union of all four detector stopword alternations — nonzero
    * count ⇔ [[TextOps.langId]] predicts something other than 'und'
    * (word lists are disjoint, and whenever any list scores > 0 one
    * branch of the detector fires).
    */
  private val LangKnownRe =
    "\\b(the|and|is|of|el|la|de|que|y|le|les|et|est|une|der|die|und|das|ist)\\b"

  /** Score-based data selection (the DataComp/quality-classifier shape):
    * every doc gets an integer composite score — 500·quality-keep +
    * 300·exact-unique + 200·language-known — and each source keeps its
    * top [[SelectMilli]]‰ by (score desc, doc_id) EXACT rank; the report
    * is one row per source with the selected volume, the waterline score
    * (the last admitted doc's score), and the selected mass's quality
    * makeup. Where `sample_stratified` keeps a hash-random fraction,
    * this keeps the BEST fraction — the curation step between scoring
    * and training-shard export.
    *
    * Scale shape: one scan computes every signal (the dup signal costs
    * the dedup_exact digest exchange — 64-byte keys, never text); the
    * per-source rank is [[RankOps.withHierarchicalRank]], so no source
    * funnels through one task (the length_quartiles precedent); the
    * waterline rollup is per-source bounded.
    */
  def selectionScores(
      s: SparkSession, dir: String,
      selectMilli: Long = SelectMilli): DataFrame = {
    val sized = TextOps.qualityFlags(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), col("n_chars"), col("keep"),
        sha2(col("text"), 256).as("h"),
        (regexp_count(col("text"), lit(LangKnownRe)) > 0)
          .cast("long").as("lang_known"))
    val dupSizes = sized.groupBy("h").agg(count(lit(1)).as("copies"))
    val scored = sized.join(dupSizes, "h")
      .withColumn("score_milli",
        expr("500 * keep + 300 * IF(copies = 1, 1, 0) + 200 * lang_known"))
      .withColumn("inv", expr("1000 - score_milli"))
    val nSrc = scored.groupBy("source").agg(count(lit(1)).as("n_src"))
    RankOps.withHierarchicalRank(
      scored, Seq("source"), "inv", "doc_id", "inv div 100", "rk")
      .join(broadcast(nSrc), "source")
      .withColumn("selected",
        (col("rk") <= expr(s"($selectMilli * n_src) div 1000")).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("selected").as("n_selected"),
        min(when(col("selected") === 1L, col("score_milli")))
          .as("waterline_score"),
        sum(when(col("selected") === 1L, col("n_chars")).otherwise(0L))
          .as("sel_chars"),
        sum(when(col("selected") === 1L, col("keep")).otherwise(0L))
          .as("sel_keep"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[selectionScores]] — the flat per-source
    * row_number window (independent of the hierarchical-rank algorithm).
    */
  def selectionScoresOracleSql(selectMilli: Long = SelectMilli): String =
    s"""WITH t0 AS (
       | SELECT doc_id, source, n_chars, text, sha256(text) AS h,
       |  CASE WHEN len(regexp_extract_all(text, '$LangKnownRe')) > 0 THEN 1 ELSE 0 END AS lang_known,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_chars_nows,
       |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       |  CAST(len(regexp_extract_all(text, '\\b(the|and|is|of|to|in|it|a)\\b')) AS BIGINT) AS n_stopwords
       | FROM documents),
       |t AS (
       | SELECT doc_id, source, n_chars, h, lang_known,
       |  CAST(CAST(n_tokens < 20 AS BIGINT)
       |   + CAST((1000 * n_chars_nows) // greatest(n_tokens, 1) NOT BETWEEN 3000 AND 5000 AS BIGINT)
       |   + CAST(n_stopwords = 0 AS BIGINT)
       |   + CAST((1000 * n_punct) // greatest(n_tokens, 1) > 200 AS BIGINT) = 0 AS BIGINT) AS keep
       | FROM t0),
       |d AS (SELECT h, count(*) AS copies FROM t GROUP BY h),
       |sc AS (
       | SELECT t.*, 500 * keep + 300 * (CASE WHEN copies = 1 THEN 1 ELSE 0 END)
       |  + 200 * lang_known AS score_milli
       | FROM t JOIN d USING (h)),
       |r AS (
       | SELECT *, row_number() OVER (PARTITION BY source ORDER BY score_milli DESC, doc_id) AS rk,
       |  count(*) OVER (PARTITION BY source) AS n_src
       | FROM sc),
       |sel AS (
       | SELECT *, CASE WHEN rk <= ($selectMilli * n_src) // 1000 THEN 1 ELSE 0 END AS selected
       | FROM r)
       |SELECT source, count(*) AS n_docs,
       | CAST(sum(selected) AS BIGINT) AS n_selected,
       | min(CASE WHEN selected = 1 THEN score_milli END) AS waterline_score,
       | CAST(sum(CASE WHEN selected = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS sel_chars,
       | CAST(sum(CASE WHEN selected = 1 THEN keep ELSE 0 END) AS BIGINT) AS sel_keep
       |FROM sel GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB oracle for [[sourceAblation]] (quality CTE text shared with
    * the `quality_filter` oracle).
    */
  val SourceAblationOracleSql: String =
    """WITH t AS (
      | SELECT source, n_chars,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars_nows,
      |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
      |  CAST(len(regexp_extract_all(text, '\b(the|and|is|of|to|in|it|a)\b')) AS BIGINT) AS n_stopwords
      | FROM documents),
      |r AS (
      | SELECT source, n_chars,
      |  CAST(CAST(n_tokens < 20 AS BIGINT)
      |   + CAST((1000 * n_chars_nows) // greatest(n_tokens, 1) NOT BETWEEN 3000 AND 5000 AS BIGINT)
      |   + CAST(n_stopwords = 0 AS BIGINT)
      |   + CAST((1000 * n_punct) // greatest(n_tokens, 1) > 200 AS BIGINT) = 0 AS BIGINT) AS keep
      | FROM t),
      |per AS (
      | SELECT source, count(*) AS docs, CAST(sum(keep) AS BIGINT) AS kept,
      |  CAST(sum(n_chars) AS BIGINT) AS chars
      | FROM r GROUP BY source),
      |tot AS (
      | SELECT CAST(sum(docs) AS BIGINT) AS t_docs, CAST(sum(kept) AS BIGINT) AS t_kept,
      |  CAST(sum(chars) AS BIGINT) AS t_chars FROM per)
      |SELECT source, docs,
      | (1000000 * kept) // docs AS kept_ppm,
      | (1000000 * chars) // t_chars AS char_share_ppm,
      | (1000000 * (t_kept - kept)) // greatest(t_docs - docs, 1) AS kept_ppm_excl,
      | (1000000 * (t_kept - kept)) // greatest(t_docs - docs, 1)
      |  - (1000000 * t_kept) // t_docs AS delta_ppm
      |FROM per CROSS JOIN tot ORDER BY source""".stripMargin
}
