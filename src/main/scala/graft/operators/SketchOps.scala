package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distinct-count sketching with a KMV (k-minimum-values) estimator.
  *
  * The classic cardinality sketches (HLL, theta) are approximate AND
  * engine-specific — `approx_count_distinct` can never hash-match an
  * oracle. KMV gives the same O(k) sketch-size / one-pass properties
  * while staying bit-deterministic: hash every key with a fixed
  * multiplicative hash into [0, P), keep the k smallest distinct hash
  * values, and estimate N ≈ (k-1)·P / h_k from the k-th minimum (the
  * uniform-order-statistics estimator, rel. stddev ≈ 1/√(k−2)). Every
  * step is integer arithmetic on a fixed hash family, so Spark and the
  * DuckDB oracle agree exactly — the sketch itself is checkable, not just
  * its error bound.
  *
  * Scale notes (100 TB): the plan is `distinct` over hash values (partial
  * map-side dedup, shuffle bounded by the number of DISTINCT keys, never
  * row count) followed by `orderBy(h).limit(k)` — a TakeOrdered: each
  * task keeps a k-item bound, the driver merges k·partitions candidates.
  * The global distinct IS required: TakeOrdered alone would let the same
  * hash from two partitions occupy two of the k slots and bias the
  * estimate low. When n_distinct < k the sketch holds every value and the
  * count is exact — reported as such.
  */
object SketchOps {

  /** 2^31 - 1 (Mersenne prime): hash range and modulus. */
  val P: Long = 2147483647L

  /** Knuth's multiplicative constant; (P-1)·K < 2^63 so the product never
    * overflows a Long (Spark 4 ANSI mode throws on overflow).
    */
  val K: Long = 2654435761L

  val DefaultK: Int = 64

  /** One-row sketch report: k, the k-th minimum hash, the KMV estimate
    * and the true distinct count (exact in both engines) for comparison.
    */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = DefaultK): DataFrame = {
    val h = (col(keyCol) % P) * K % P
    val mins = df.select(h.as("h")).distinct().orderBy("h").limit(k)
    val sketch = mins.agg(count(lit(1)).as("n_min"), max("h").as("kth_min"))
    val truth = df.agg(countDistinct(col(keyCol)).as("true_distinct"))
    sketch.crossJoin(truth).select(
      lit(k.toLong).as("k"),
      col("kth_min"),
      // (k-1)·P precomputed: as two int literals the product would
      // overflow INT32 parsing in DuckDB and trip ANSI checks here.
      when(col("n_min") < k, col("n_min"))
        .otherwise(expr(s"${(k - 1).toLong * P} div kth_min"))
        .cast("long").as("est_distinct"),
      col("true_distinct"))
  }

  def kmvDistinctUsers(s: SparkSession, dir: String): DataFrame =
    kmvDistinct(Tables.events(s, dir), "user_id")

  def oracleSql(k: Int = DefaultK): String =
    s"""WITH h AS (
       | SELECT DISTINCT ((user_id % $P) * $K) % $P AS h FROM events),
       |m AS (SELECT h FROM h ORDER BY h LIMIT $k),
       |sk AS (SELECT count(*) AS n_min, max(h) AS kth_min FROM m),
       |t AS (SELECT count(DISTINCT user_id) AS true_distinct FROM events)
       |SELECT CAST($k AS BIGINT) AS k, sk.kth_min,
       | CAST(CASE WHEN sk.n_min < $k THEN sk.n_min
       |  ELSE ${(k - 1).toLong * P} // sk.kth_min END AS BIGINT) AS est_distinct,
       | t.true_distinct
       |FROM sk, t""".stripMargin

  /** KMV set algebra — audience-overlap estimation from two bounded
    * sketches, no exact pass over either side: sketch the click users
    * and the purchase users, UNION the sketches (k smallest of the
    * merged hash sets — itself a valid KMV of A∪B), estimate |A∪B| from
    * its k-th minimum, then estimate the Jaccard similarity as the
    * fraction of the union sketch's members present in BOTH input
    * sketches and scale: |A∩B| ≈ J·|A∪B| (Beyer et al., SIGMOD'07).
    * Exact truth columns ride along, so the gate pins sketch AND error.
    *
    * Scale shape: each side is one distinct-hash shuffle (bounded by its
    * distinct keys) + a k-item TakeOrdered; the set algebra then runs on
    * three k-row frames — constant-size work regardless of corpus scale,
    * which is the entire reason audience overlap ships as sketches.
    */
  def kmvOverlap(s: SparkSession, dir: String, k: Int = DefaultK): DataFrame = {
    val ev = Tables.events(s, dir)
    def hashes(eventType: String): DataFrame =
      ev.filter(col("event_type") === eventType)
        .select(((col("user_id") % P) * K % P).as("h"))
        .distinct()
    def sketch(df: DataFrame): DataFrame = df.orderBy("h").limit(k)
    val skA = sketch(hashes("click")).withColumnRenamed("h", "ha")
    val skB = sketch(hashes("purchase")).withColumnRenamed("h", "hb")
    val skU = sketch(skA.select(col("ha").as("h"))
      .union(skB.select(col("hb").as("h"))).distinct())
    val unionEst = skU.agg(count(lit(1)).as("n_min"), max("h").as("kth_min"))
      .select(
        when(col("n_min") < k, col("n_min"))
          .otherwise(expr(s"${(k - 1).toLong * P} div kth_min"))
          .cast("long").as("est_union"))
    val jointInU = skU
      .join(skA, col("h") === col("ha"), "left_semi")
      .join(skB, skU("h") === col("hb"), "left_semi")
      .agg(count(lit(1)).as("j"))
    val sizeU = skU.agg(count(lit(1)).as("ku"))
    val truth = {
      val a = ev.filter(col("event_type") === "click").select("user_id").distinct()
      val b = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      a.join(b, Seq("user_id")).agg(count(lit(1)).as("true_intersection"))
        .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("true_union")))
    }
    unionEst.crossJoin(jointInU).crossJoin(sizeU).crossJoin(truth)
      .select(
        lit(k.toLong).as("k"),
        col("est_union"),
        expr("(j * est_union) div ku").cast("long").as("est_intersection"),
        col("true_union").cast("long").as("true_union"),
        col("true_intersection").cast("long").as("true_intersection"))
  }

  def kmvOverlapOracleSql(k: Int = DefaultK): String =
    s"""WITH ha AS (
       | SELECT DISTINCT ((user_id % $P) * $K) % $P AS h FROM events
       | WHERE event_type = 'click'),
       |hb AS (
       | SELECT DISTINCT ((user_id % $P) * $K) % $P AS h FROM events
       | WHERE event_type = 'purchase'),
       |ska AS (SELECT h FROM ha ORDER BY h LIMIT $k),
       |skb AS (SELECT h FROM hb ORDER BY h LIMIT $k),
       |sku AS (
       | SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb) u
       | ORDER BY h LIMIT $k),
       |ue AS (
       | SELECT CAST(CASE WHEN count(*) < $k THEN count(*)
       |  ELSE ${(k - 1).toLong * P} // max(h) END AS BIGINT) AS est_union,
       |  count(*) AS ku
       | FROM sku),
       |jj AS (
       | SELECT count(*) AS j FROM sku
       | WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
       |t AS (
       | SELECT
       |  (SELECT count(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'
       |    INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase') x)
       |   AS true_intersection,
       |  (SELECT count(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'
       |    UNION SELECT user_id FROM events WHERE event_type = 'purchase') y)
       |   AS true_union)
       |SELECT CAST($k AS BIGINT) AS k, ue.est_union,
       | CAST((jj.j * ue.est_union) // ue.ku AS BIGINT) AS est_intersection,
       | CAST(t.true_union AS BIGINT) AS true_union,
       | CAST(t.true_intersection AS BIGINT) AS true_intersection
       |FROM ue, jj, t""".stripMargin

  /** Per-GROUP KMV sketches: distinct users per event type, one bounded
    * sketch per group — the grouped form of [[kmvDistinct]], and the
    * deterministic stand-in for `approx_count_distinct` in a GROUP BY.
    *
    * Scale shape: one distinct over (group, hash) — shuffle bounded by
    * distinct pairs, with map-side dedup — then the k-minimum selection
    * runs as the bounded [[SampleOps.MinKAggregator]] (k-entry buffers,
    * PARTIAL-AGGREGATED before the exchange), so a head group never
    * serializes through one task the way the oracle's rank-window
    * formulation would. The truth column is exact in both engines, so
    * the gate checks sketch AND estimate per group.
    */
  def kmvDistinctByType(s: SparkSession, dir: String, k: Int = DefaultK): DataFrame = {
    import s.implicits._
    val pairs = Tables.events(s, dir)
      .select(col("event_type"), ((col("user_id") % P) * K % P).as("h"))
      .distinct()
    val minkCol = new SampleOps.MinKAggregator(k).toColumn
    val sk = pairs
      .select(col("event_type"), col("h"), col("h"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(minkCol.name("mink"))
      .toDF("event_type", "mink")
      .select(
        col("event_type"),
        size(col("mink.items")).cast("long").as("n_min"),
        expr("element_at(mink.items, -1)._1").as("kth_min"))
    val truth = Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("true_distinct"))
    sk.join(truth, "event_type")
      .select(
        col("event_type"),
        lit(k.toLong).as("k"),
        col("kth_min"),
        when(col("n_min") < k, col("n_min"))
          .otherwise(expr(s"${(k - 1).toLong * P} div kth_min"))
          .cast("long").as("est_distinct"),
        col("true_distinct"))
      .orderBy("event_type")
  }

  def kmvByTypeOracleSql(k: Int = DefaultK): String =
    s"""WITH h AS (
       | SELECT DISTINCT event_type, ((user_id % $P) * $K) % $P AS h FROM events),
       |r AS (
       | SELECT event_type, h,
       |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
       |m AS (
       | SELECT event_type, count(*) AS n_min, max(h) AS kth_min
       | FROM r WHERE rn <= $k GROUP BY 1),
       |t AS (
       | SELECT event_type, count(DISTINCT user_id) AS true_distinct
       | FROM events GROUP BY 1)
       |SELECT m.event_type, CAST($k AS BIGINT) AS k, m.kth_min,
       | CAST(CASE WHEN m.n_min < $k THEN m.n_min
       |  ELSE ${(k - 1).toLong * P} // m.kth_min END AS BIGINT) AS est_distinct,
       | t.true_distinct
       |FROM m JOIN t ON m.event_type = t.event_type
       |ORDER BY m.event_type""".stripMargin

  // ---- Deterministic count-min sketch ----------------------------------

  /** Demo-small CMS geometry (3 rows × 256 buckets for ~150 keys at
    * sf0.01) so collisions — and therefore the overcount column — are
    * actually exercised; production sizes w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.
    */
  val CmsD: Int = 3
  val CmsW: Long = 256L

  /** One multiplicative-hash constant per CMS row (public Knuth/xxPrime
    * constants); (P-1)·K < 2^63 so products never overflow a Long.
    */
  val CmsK: Seq[Long] = Seq(2654435761L, 2246822519L, 3266489917L)

  private def cmsPosSql(key: String, d: Int): String =
    s"((($key) % $P) * ${CmsK(d)}) % $P % $CmsW"

  /** Count-min frequency estimation for per-user event counts, reported
    * against truth for the top-k true heavy hitters: `cms_est =
    * min_d counter[d][h_d(key)]` can only OVERcount (collisions add,
    * never subtract) — `overcount` makes the sketch's error auditable,
    * and the gate pins it exactly because every step is integer.
    *
    * Scale shape: the sketch build is one explode(d rows) → groupBy
    * aggregation whose output is the d×w counter table — FIXED SIZE
    * regardless of corpus rows, the whole point of CMS at 100 TB — then
    * broadcast back onto the (distinct-key-sized) probe side. The top-k
    * truth ranking is a TakeOrdered, not a global sort.
    */
  def cmsUserCounts(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id")
    val posStructs = (0 until CmsD).map(d =>
      struct(lit(d).as("row"), expr(cmsPosSql("user_id", d)).as("pos")))
    val counters = ev
      .select(explode(array(posStructs: _*)).as("rp"))
      .groupBy(col("rp.row").as("row"), col("rp.pos").as("pos"))
      .agg(count(lit(1)).as("c"))
    val truth = ev.groupBy("user_id").agg(count(lit(1)).as("true_events"))
    val est = truth
      .select(col("user_id"), col("true_events"),
        explode(array(posStructs: _*)).as("rp"))
      .join(broadcast(counters),
        col("rp.row") === col("row") && col("rp.pos") === col("pos"))
      .groupBy("user_id", "true_events")
      .agg(min("c").as("cms_est"))
    est
      .select(col("user_id"), col("true_events"), col("cms_est"),
        (col("cms_est") - col("true_events")).as("overcount"))
      .orderBy(desc("true_events"), col("user_id"))
      .limit(k)
  }

  def cmsOracleSql(k: Int = 20): String = {
    val rows = (0 until CmsD)
      .map(d => s"SELECT user_id, $d AS row, ${cmsPosSql("user_id", d)} AS pos FROM events")
      .mkString("\n  UNION ALL ")
    s"""WITH rp AS (
       |  $rows),
       |counters AS (SELECT row, pos, count(*) AS c FROM rp GROUP BY 1, 2),
       |truth AS (SELECT user_id, count(*) AS true_events FROM events GROUP BY 1),
       |probe AS (
       | SELECT DISTINCT rp.user_id, rp.row, rp.pos FROM rp),
       |est AS (
       | SELECT p.user_id, min(c.c) AS cms_est
       | FROM probe p JOIN counters c ON p.row = c.row AND p.pos = c.pos
       | GROUP BY 1)
       |SELECT t.user_id, t.true_events, e.cms_est,
       | e.cms_est - t.true_events AS overcount
       |FROM truth t JOIN est e ON t.user_id = e.user_id
       |ORDER BY t.true_events DESC, t.user_id LIMIT $k""".stripMargin
  }

  // ---- Deterministic Bloom pre-filter ----------------------------------

  /** Bloom bit-array size for the registered query. Deliberately DEMO-
    * small (512 bits for a ~50-key eval carve at sf0.01) so false
    * positives actually occur and the audit columns mean something; a
    * production filter sizes m = -n·ln(p)/ln²2 from the build-side count
    * and target FP rate (n=1M keys at p=1% → ~1.2 MB — broadcast-trivial).
    */
  val BloomM: Long = 512L
  val BloomK: Int = 3

  /** The k Kirsch-Mitzenmacher bit positions for a fingerprint: pos_i =
    * (h1 + i·h2) mod m with h1 = fp mod m, h2 = fp mod (m-1) + 1 — two
    * base hashes simulate k independent ones (Kirsch & Mitzenmacher,
    * ESA'06), all integer-exact. Shared between Spark and the oracle as a
    * generated arithmetic string: `idiv`-free, only % — identical in both.
    */
  private def positionsSqlList(fp: String): Seq[String] =
    (0 until BloomK).map(i =>
      s"(($fp) % $BloomM + $i * (($fp) % ${BloomM - 1} + 1)) % $BloomM")

  /** Bloom-pre-filtered decontamination audit, per language: how many
    * training docs the Bloom filter flags (`bloom_positive`), how many are
    * true fingerprint matches (`exact_matches`), and the false-positive
    * overhead the exact verify must absorb. At 100 TB the point of the
    * pattern: the corpus side probes a BROADCAST bit-set (here: the
    * distinct set-position table, ≤ k·|eval| rows) with no shuffle at all,
    * and only bloom-positive docs reach the expensive exact stage — the
    * same two-tier candidates→verify shape as LSH dedup. No false
    * negatives by construction, which the audit's `exact_matches <=
    * bloom_positive` invariant (checked in tests) witnesses.
    */
  def bloomDecontaminationStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val fp = graft.functions.GraftFunctions.poly_hash(col("text"), 31, 1000000007L)
    // Carve the stand-in eval set by doc_id (not fingerprint): a train doc
    // can then share a fingerprint with an eval doc — an exact duplicate
    // across the carve — so `exact_matches` is non-vacuous (an fp-keyed
    // carve could never produce one by construction). The driver corpus
    // happens to plant no cross-carve exact dups, so its truthful answer
    // is 0; the spec proves the tier fires on a corpus that has one.
    bloomAudit(docs.select(col("doc_id"), col("lang"), fp.as("fp")))
  }

  /** The carve + audit over any `(doc_id, lang, fp)` frame. */
  def bloomAudit(withFp: DataFrame): DataFrame = {
    val evalFps = withFp.filter(col("doc_id") % 10 === 0).select("fp").distinct()
    val train = withFp.filter(col("doc_id") % 10 =!= 0)

    val posArr = array(positionsSqlList("fp").map(expr): _*)
    val evalPos = evalFps.select(explode(posArr).as("p")).distinct()
    val trainPos = train.select(col("doc_id"), explode(array_distinct(posArr)).as("p"))
    // Per-doc distinct probe positions (k unless KM positions collide) —
    // derived from trainPos rather than a fresh projection of `train`:
    // Spark shares no common subplans across joins, so the latter would
    // re-run the full-text poly_hash over the whole corpus a second time.
    val needed = trainPos.groupBy("doc_id").agg(count(lit(1)).as("np"))
    val hits = trainPos.join(broadcast(evalPos), Seq("p"))
      .groupBy("doc_id").agg(count(lit(1)).as("hit"))
    val flags = train
      .join(needed, Seq("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .join(broadcast(evalFps.withColumnRenamed("fp", "efp")),
        col("fp") === col("efp"), "left")
      .select(
        col("lang"),
        (coalesce(col("hit"), lit(0L)) === col("np")).cast("long").as("bp"),
        col("efp").isNotNull.cast("long").as("ex"))
    flags.groupBy("lang")
      .agg(
        count(lit(1)).as("total"),
        sum("bp").cast("long").as("bloom_positive"),
        sum("ex").cast("long").as("exact_matches"),
        (sum("bp") - sum("ex")).cast("long").as("false_positives"))
      .orderBy("lang")
  }

  def bloomOracleSql(): String = {
    val posList = positionsSqlList("fp").mkString("[", ", ", "]")
    s"""WITH f AS (
       | SELECT doc_id, lang, ${SampleOps.FingerprintSql} AS fp FROM documents),
       |ev AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 = 0),
       |pos AS (SELECT DISTINCT unnest($posList) AS p FROM ev),
       |tr AS (SELECT doc_id, lang, fp FROM f WHERE doc_id % 10 <> 0),
       |trpos AS (
       | SELECT doc_id, unnest(list_distinct($posList)) AS p FROM tr),
       |np AS (SELECT doc_id, count(*) AS np FROM trpos GROUP BY doc_id),
       |hits AS (
       | SELECT doc_id, count(*) AS hit FROM trpos JOIN pos USING (p) GROUP BY doc_id),
       |fl AS (
       | SELECT tr.lang,
       |  CAST(coalesce(hit, 0) = np.np AS BIGINT) AS bp,
       |  CAST(tr.fp IN (SELECT fp FROM ev) AS BIGINT) AS ex
       | FROM tr JOIN np ON tr.doc_id = np.doc_id
       |  LEFT JOIN hits ON tr.doc_id = hits.doc_id)
       |SELECT lang, count(*) AS total,
       | CAST(sum(bp) AS BIGINT) AS bloom_positive,
       | CAST(sum(ex) AS BIGINT) AS exact_matches,
       | CAST(sum(bp) - sum(ex) AS BIGINT) AS false_positives
       |FROM fl GROUP BY lang ORDER BY lang""".stripMargin
  }
}
