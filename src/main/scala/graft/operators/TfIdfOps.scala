package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** TF-IDF keyword extraction: the top-k most characteristic tokens per
  * document — corpus-level document frequency weighting down the words
  * everything contains, a standard feature/retrieval primitive
  * (reference's text-feature class: analysis/etl_spark.py:143-159).
  *
  * Numerical design: no logarithms or floats anywhere. The score is the
  * exact integer `tfidf_milli = (1000 * tf * N) div (df * doc_tokens)` —
  * monotone in tf/df like classic tf·idf, bit-identical in any engine —
  * with (score desc, token asc) ranking so ties are deterministic.
  *
  * Scale shape: one explode + one (doc_id, token) partial-aggregated
  * groupBy is the only corpus-sized shuffle. The df table is
  * vocabulary-sized — bounded by distinct tokens, not corpus rows — and
  * deliberately NOT broadcast-hinted: a clean test corpus has a tiny
  * vocabulary (AQE broadcasts it at runtime, which the plan-shape test
  * pins), but a 100 TB web crawl's token space (typos, ids, hashes) can
  * run to 10⁸+ entries where a forced broadcast OOMs the executors and
  * the shuffle hash join AQE falls back to is the right plan. Per-doc
  * ranking windows over at most distinct-tokens-per-doc rows, so no
  * stratum serializes. N is one scalar `count()` action (the
  * PageRank-N pattern).
  */
object TfIdfOps {

  // One tokenization contract for every text operator and its oracle.
  private val tokens = TextOps.tokens

  def tfidfTopTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val docLen = tf.groupBy("doc_id").agg(sum("tf").as("doc_tokens"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(docLen, Seq("doc_id"))
      .join(df, Seq("token"))
      .select(
        col("doc_id"), col("token"), col("tf"), col("df"),
        expr(s"(1000 * tf * ${n}L) div (df * doc_tokens)").as("tfidf_milli"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("tfidf_milli"), col("token"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "token", "tf", "df", "tfidf_milli")
      .orderBy("doc_id", "rank")
  }

  def oracleSql(k: Int = 3): String =
    s"""WITH x AS (
       | SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
       | FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM x GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_tokens FROM tf GROUP BY 1),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |sc AS (
       | SELECT tf.doc_id, tf.token, tf.tf, df.df,
       |  (1000 * tf.tf * n.n) // (df.df * dl.doc_tokens) AS tfidf_milli
       | FROM tf JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN df ON tf.token = df.token CROSS JOIN n),
       |r AS (
       | SELECT doc_id, token, tf, df, CAST(tfidf_milli AS BIGINT) AS tfidf_milli,
       |  CAST(row_number() OVER (PARTITION BY doc_id
       |   ORDER BY tfidf_milli DESC, token) AS BIGINT) AS rank
       | FROM sc)
       |SELECT doc_id, rank, token, tf, df, tfidf_milli
       |FROM r WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin

  /** Fixed benchmark query set for [[keywordSearch]] — AND-semantics
    * multi-term queries over the corpus vocabulary (mixed common/rare
    * terms so both the df weighting and the conjunction filter work).
    */
  val QuerySet: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("scan", "filter"),
    2L -> Seq("join", "merge", "sort"),
    3L -> Seq("window", "agg"))

  /** Ranked keyword retrieval — the search-engine primitive on top of
    * the same exact-integer tf·idf contract as [[tfidfTopTerms]]:
    * a document matches a query iff it contains ALL its terms
    * (conjunctive semantics), scored by the summed per-term
    * `tfidf_milli`, top-`k` per query by (score desc, doc_id asc).
    *
    * Scale shape: the (doc, token) index and df table are the SAME
    * frames the extraction op builds (one corpus shuffle); the query
    * list is a literal broadcast; and the per-query top-k avoids a
    * per-query sort of all matching docs via the hierarchical rank —
    * ranking work is bucket-parallel even when a common-term query
    * matches half the corpus. Ties on doc_id rank ascending via the
    * negated-id tie column (the oracle mirrors with `doc_id ASC`).
    */
  def keywordSearch(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val docLen = tf.groupBy("doc_id").agg(sum("tf").as("doc_tokens"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val queries = {
      import s.implicits._
      QuerySet.flatMap { case (qid, ts) => ts.map(t => (qid, t, ts.length.toLong)) }
        .toDF("qid", "token", "n_terms")
    }
    val scored = tf
      .join(broadcast(queries), Seq("token"))
      .join(docLen, Seq("doc_id"))
      .join(df, Seq("token"))
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("matched"),
        max("n_terms").as("n_terms"),
        sum(expr(s"(1000 * tf * ${n}L) div (df * doc_tokens)")).as("score_milli"))
      .filter(col("matched") === col("n_terms"))
      .withColumn("neg_id", -col("doc_id"))
    val cnts = scored.groupBy("qid").agg(count(lit(1)).as("cnt"))
    RankOps.withHierarchicalRank(scored, Seq("qid"), "score_milli", "neg_id",
        "score_milli div 64", "rk")
      .join(broadcast(cnts), Seq("qid"))
      .filter(col("rk") > col("cnt") - k)
      .select(col("qid"), (col("cnt") - col("rk") + 1).as("rank"),
        col("doc_id"), col("score_milli"), col("cnt").as("matching_docs"))
      .orderBy("qid", "rank")
  }

  def keywordSearchOracleSql(k: Int = 10): String = {
    val qvals = QuerySet
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t', ${ts.length})") }
      .mkString(", ")
    s"""WITH x AS (
       | SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
       | FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM x GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_tokens FROM tf GROUP BY 1),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |q(qid, token, n_terms) AS (VALUES $qvals),
       |sc AS (
       | SELECT q.qid, tf.doc_id, count(*) AS matched, max(q.n_terms) AS n_terms,
       |  sum((1000 * tf.tf * n.n) // (df.df * dl.doc_tokens)) AS score_milli
       | FROM tf JOIN q ON tf.token = q.token
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN df ON tf.token = df.token CROSS JOIN n
       | GROUP BY 1, 2),
       |m AS (SELECT * FROM sc WHERE matched = n_terms),
       |c AS (SELECT qid, count(*) AS matching_docs FROM m GROUP BY qid),
       |r AS (
       | SELECT qid, doc_id, CAST(score_milli AS BIGINT) AS score_milli,
       |  CAST(row_number() OVER (PARTITION BY qid
       |   ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
       | FROM m)
       |SELECT CAST(r.qid AS BIGINT) AS qid, rank, doc_id, score_milli,
       | CAST(c.matching_docs AS BIGINT) AS matching_docs
       |FROM r JOIN c ON r.qid = c.qid
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** BM25 k1 and b in milli fixed-point (the standard 1.2 / 0.75). */
  val Bm25K1Milli = 1200L
  val Bm25BMilli = 750L

  /** BM25-shaped DISJUNCTIVE retrieval — the standard lexical ranking
    * shape ([[keywordSearch]] is the conjunctive tf·idf cousin; this
    * adds BM25's tf saturation and document-length normalization, and
    * OR semantics let partial matches rank). Entirely integer
    * fixed-point so the oracle is bit-tight:
    *
    *  - `norm_milli  = 1000 − b + (b·dl) div avgdl` (length norm),
    *  - `tfc_milli   = (1000·tf·(k1+1000)) div (1000·tf + (k1·norm) div 1000)`
    *    (saturating tf component, k1/b in milli),
    *  - `idf_milli   = (1000·(2N−2df+1)) div (2df+1)` — the
    *    Robertson–Sparck-Jones odds ratio `(N−df+½)/(df+½)` in milli
    *    WITHOUT the log: a transcendental ln cannot cross the oracle
    *    boundary bit-exactly (libm vs DuckDB), and the repo's bitlen
    *    log2 floors to ZERO for any term in over a third of the corpus
    *    (measured: every QuerySet term — the whole score degenerated).
    *    The linear odds keep idf monotone-in-df and exactly integer;
    *    the cost vs log-idf is that rare terms weigh more steeply,
    *  - `score_milli = Σ_t (idf_milli(t) · tfc_milli(t)) div 1000`.
    *
    * Scale shape: identical to [[keywordSearch]] — the postings and df
    * frames are the extraction op's (one corpus shuffle), queries are a
    * literal broadcast, avgdl is one scalar pre-divided on the driver,
    * and the per-query top-k rides the hierarchical rank so a
    * common-term query matching half the corpus never serializes into
    * one partition's sort.
    */
  def bm25Search(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val docLen = tf.groupBy("doc_id").agg(sum("tf").as("doc_tokens"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val queries = {
      import s.implicits._
      QuerySet.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
        .toDF("qid", "token")
    }
    val scored = tf
      .join(broadcast(queries), Seq("token"))
      .join(docLen, Seq("doc_id"))
      .join(dfT, Seq("token"))
      // avgdl via a scalar subquery would shuffle; a broadcast 1-row
      // frame keeps it a plan constant per batch.
      .crossJoin(broadcast(docLen.agg(
        expr("sum(doc_tokens) div count(*)").as("avgdl"))))
      .select(col("qid"), col("doc_id"),
        expr(s"""(((1000 * (2 * ${n}L - 2 * df + 1)) div (2 * df + 1))
                 * ((1000 * tf * (${Bm25K1Milli} + 1000))
                    div (1000 * tf + (${Bm25K1Milli}
                         * (1000 - ${Bm25BMilli}
                            + (${Bm25BMilli} * doc_tokens) div avgdl)) div 1000)))
                 div 1000""")
          .as("term_score"))
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("matched"),
        sum("term_score").cast("long").as("score_milli"))
      .withColumn("neg_id", -col("doc_id"))
    val cnts = scored.groupBy("qid").agg(count(lit(1)).as("cnt"))
    RankOps.withHierarchicalRank(scored, Seq("qid"), "score_milli", "neg_id",
        "score_milli div 64", "rk")
      .join(broadcast(cnts), Seq("qid"))
      .filter(col("rk") > col("cnt") - k)
      .select(col("qid"), (col("cnt") - col("rk") + 1).as("rank"),
        col("doc_id"), col("matched"), col("score_milli"),
        col("cnt").as("matching_docs"))
      .orderBy("qid", "rank")
  }

  def bm25OracleSql(k: Int = 10): String = {
    val qvals = QuerySet
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""WITH x AS (
       | SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
       | FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM x GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_tokens FROM tf GROUP BY 1),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |ad AS (SELECT sum(doc_tokens) // count(*) AS avgdl FROM dl),
       |q(qid, token) AS (VALUES $qvals),
       |sc AS (
       | SELECT q.qid, tf.doc_id, count(*) AS matched,
       |  CAST(sum(
       |   (((1000 * (2 * n.n - 2 * df.df + 1)) // (2 * df.df + 1))
       |   * ((1000 * tf.tf * (${Bm25K1Milli} + 1000))
       |      // (1000 * tf.tf + (${Bm25K1Milli}
       |          * (1000 - ${Bm25BMilli}
       |             + (${Bm25BMilli} * dl.doc_tokens) // ad.avgdl)) // 1000)))
       |   // 1000
       |  ) AS BIGINT) AS score_milli
       | FROM tf JOIN q ON tf.token = q.token
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN df ON tf.token = df.token CROSS JOIN n CROSS JOIN ad
       | GROUP BY 1, 2),
       |c AS (SELECT qid, count(*) AS matching_docs FROM sc GROUP BY qid),
       |r AS (
       | SELECT qid, doc_id, matched, score_milli,
       |  CAST(row_number() OVER (PARTITION BY qid
       |   ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
       | FROM sc)
       |SELECT CAST(r.qid AS BIGINT) AS qid, rank, doc_id,
       | CAST(r.matched AS BIGINT) AS matched, score_milli,
       | CAST(c.matching_docs AS BIGINT) AS matching_docs
       |FROM r JOIN c ON r.qid = c.qid
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** nDCG@10 position discounts `round(10⁶ / log2(i+1))` as integer
    * LITERALS (computed once offline), so no transcendental log ever
    * crosses the oracle boundary — the same reason [[bm25Search]] uses
    * the linear odds idf. Index 0 is a 0 pad so `W_CUM(p)` is a plain
    * 1-based prefix-sum lookup for p in 0..10.
    */
  private val NdcgWCumE6: Seq[Long] = Seq(
    0L, 1000000L, 1630930L, 2130930L, 2561607L, 2948460L,
    3304667L, 3638000L, 3953465L, 4254495L, 4543560L)

  /** Retrieval-quality audit: nDCG@10 of the [[bm25Search]] ranking
    * against a deterministic graded relevance — rel(q, doc) =
    * `least(4, (Σ_t tf(doc, t)) div 3)` over the query's matched terms:
    * raw term-occurrence mass bucketed to 5 grades (0..4), grade 4 held
    * by a handful of docs per query. Deliberately NOT the
    * quantity BM25 optimizes (BM25 saturates tf and weighs terms by
    * idf), so the metric is non-trivial — term-coverage grades measured
    * a constant 1.000 here because any full-match doc was ideal.
    * Gain is 2^rel − 1; the ideal DCG comes
    * from the full matching set's grade HISTOGRAM (grades desc, each
    * grade filling positions `(cum−c, min(cum,10)]`, its discount mass a
    * prefix-sum difference of the literal weight table) — so IDCG needs
    * only |grades| ≤ |query terms| rows per query, never a corpus sort.
    * Everything downstream of the postings join is exact integers;
    * `ndcg_ppm = (10⁶·dcg) div idcg`.
    *
    * Scale shape: rides the one postings build ([[bm25Search]]'s own
    * plan) plus a second (qid, doc) rollup of the same term-hit rows;
    * the audit frames after that are queries×grades-sized. The metric
    * itself is the eval harness a retrieval stack ships with — ranking
    * changes surface as a gated ppm delta, not an eyeball diff.
    */
  def ndcgAudit(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    require(k == 10, "discount literals are tabulated for k = 10")
    val wcumArr = s"array(${NdcgWCumE6.mkString("L, ")}L)"
    def wcum(p: String) = s"element_at($wcumArr, cast($p as int) + 1)"
    // Per-(query, doc) grade over ALL matching docs (not only top-k).
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val queries = {
      import s.implicits._
      QuerySet.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
        .toDF("qid", "token")
    }
    val rels = tf.join(broadcast(queries), Seq("token"))
      .groupBy("qid", "doc_id")
      .agg(expr("least(4L, sum(tf) div 3)").as("rel"))
    val top = bm25Search(s, dir, k)
      .select(col("qid"), col("rank"), col("doc_id"))
    val dcg = top
      .join(rels, Seq("qid", "doc_id"))
      .withColumn("gain", expr("shiftleft(1L, cast(rel as int)) - 1"))
      .withColumn("w_e6",
        expr(s"${wcum("rank")} - ${wcum("rank - 1")}"))
      .groupBy("qid")
      .agg(sum(expr("gain * w_e6")).as("dcg_e6"))
    val grades = rels.groupBy("qid", "rel").agg(count(lit(1)).as("c"))
    val wG = Window.partitionBy("qid")
      .orderBy(col("rel").desc)
    val idcg = grades
      .withColumn("cum", sum("c").over(wG))
      .withColumn("lo", expr("least(cum - c, 10L)"))
      .withColumn("hi", expr("least(cum, 10L)"))
      .withColumn("gain", expr("shiftleft(1L, cast(rel as int)) - 1"))
      .withColumn("seg",
        expr(s"gain * (${wcum("hi")} - ${wcum("lo")})"))
      .groupBy("qid")
      .agg(sum("seg").as("idcg_e6"),
        sum("c").cast("long").as("matching_docs"))
    dcg.join(idcg, Seq("qid"))
      .select(col("qid"), col("matching_docs"), col("dcg_e6"),
        col("idcg_e6"),
        // greatest(.., 1): a query whose matching docs all grade rel=0
        // has idcg_e6 = 0 — the repo's div-by-zero convention keeps both
        // engines on the same 0-ppm row instead of NULL-vs-error.
        expr("(1000000 * dcg_e6) div greatest(idcg_e6, 1L)").as("ndcg_ppm"))
      .orderBy("qid")
  }

  /** DuckDB oracle for [[ndcgAudit]]: the [[bm25OracleSql]] CTE chain
    * re-stated, then the identical literal-discount DCG/IDCG algebra.
    */
  def ndcgOracleSql(k: Int = 10): String = {
    require(k == 10)
    val qvals = QuerySet
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    val wcumList = s"[${NdcgWCumE6.mkString(", ")}]"
    def wcum(p: String) = s"$wcumList[CAST($p AS BIGINT) + 1]"
    s"""WITH x AS (
       | SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
       | FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM x GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_tokens FROM tf GROUP BY 1),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |ad AS (SELECT sum(doc_tokens) // count(*) AS avgdl FROM dl),
       |q(qid, token) AS (VALUES $qvals),
       |sc AS (
       | SELECT q.qid, tf.doc_id,
       |  CAST(least(4, sum(tf.tf) // 3) AS BIGINT) AS rel,
       |  CAST(sum(
       |   (((1000 * (2 * n.n - 2 * df.df + 1)) // (2 * df.df + 1))
       |   * ((1000 * tf.tf * (${Bm25K1Milli} + 1000))
       |      // (1000 * tf.tf + (${Bm25K1Milli}
       |          * (1000 - ${Bm25BMilli}
       |             + (${Bm25BMilli} * dl.doc_tokens) // ad.avgdl)) // 1000)))
       |   // 1000
       |  ) AS BIGINT) AS score_milli
       | FROM tf JOIN q ON tf.token = q.token
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN df ON tf.token = df.token CROSS JOIN n CROSS JOIN ad
       | GROUP BY 1, 2),
       |r AS (
       | SELECT qid, rel,
       |  CAST(row_number() OVER (PARTITION BY qid
       |   ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
       | FROM sc),
       |dcg AS (
       | SELECT qid, sum(((1::BIGINT << rel) - 1)
       |   * (${wcum("rank")} - ${wcum("rank - 1")})) AS dcg_e6
       | FROM r WHERE rank <= $k GROUP BY qid),
       |g AS (SELECT qid, rel, count(*) AS c FROM sc GROUP BY 1, 2),
       |gc AS (
       | SELECT qid, rel, c,
       |  sum(c) OVER (PARTITION BY qid ORDER BY rel DESC) AS cum
       | FROM g),
       |idcg AS (
       | SELECT qid,
       |  sum(((1::BIGINT << rel) - 1)
       |   * (${wcum("least(cum, 10)")} - ${wcum("least(cum - c, 10)")})) AS idcg_e6,
       |  CAST(sum(c) AS BIGINT) AS matching_docs
       | FROM gc GROUP BY qid)
       |SELECT CAST(d.qid AS BIGINT) AS qid, i.matching_docs,
       | CAST(d.dcg_e6 AS BIGINT) AS dcg_e6,
       | CAST(i.idcg_e6 AS BIGINT) AS idcg_e6,
       | CAST((1000000 * d.dcg_e6) // greatest(i.idcg_e6, 1) AS BIGINT) AS ndcg_ppm
       |FROM dcg d JOIN idcg i ON d.qid = i.qid
       |ORDER BY qid""".stripMargin
  }

  /** Fixed two-token phrases for [[phraseSearch]]. */
  val PhraseSet: Seq[(String, String, String)] = Seq(
    ("hash join", "hash", "join"),
    ("merge sort", "merge", "sort"),
    ("table scan", "table", "scan"))

  /** Exact phrase search via a POSITIONAL inverted index — the retrieval
    * primitive conjunctive [[keywordSearch]] can't express (term
    * adjacency). Token positions explode once; both phrase terms filter
    * against the broadcast phrase list BEFORE any join, so the position
    * equi-join `(doc, pos+1)` runs over term-hit rows only — at 100 TB
    * that is hits-sized, never corpus-sized. Occurrences count every
    * adjacent pair (overlaps included — "a a a" has two "a a"s), which
    * is exactly what the oracle's independent list-comprehension
    * formulation counts in DuckDB.
    */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs
      .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "tok")))
    val q = {
      import s.implicits._
      PhraseSet.toDF("phrase", "t1", "t2")
    }
    val firsts = toks.join(broadcast(q), col("tok") === col("t1"))
      .select(col("phrase"), col("t2"), col("doc_id"), col("pos"))
    val seconds = toks
      .join(broadcast(q.select(col("t2").as("tsel")).distinct()),
        col("tok") === col("tsel"))
      .select(col("doc_id").as("d"), col("pos").as("p"), col("tok").as("tok2"))
    firsts
      .join(seconds,
        col("doc_id") === col("d") && col("p") === col("pos") + 1 &&
          col("tok2") === col("t2"))
      .groupBy("phrase")
      .agg(countDistinct("doc_id").as("matching_docs"),
        count(lit(1)).as("occurrences"))
      .orderBy("phrase")
  }

  def phraseSearchOracleSql(): String = {
    val qvals = PhraseSet
      .map { case (p, a, b) => s"('$p', '$a', '$b')" }.mkString(", ")
    s"""WITH tok AS (
       | SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |q(phrase, t1, t2) AS (VALUES $qvals),
       |o AS (
       | SELECT q.phrase, t.doc_id,
       |  len([i for i in range(1, len(toks))
       |       if toks[i] = q.t1 and toks[i+1] = q.t2]) AS occ
       | FROM tok t CROSS JOIN q)
       |SELECT phrase,
       | CAST(count(*) FILTER (WHERE occ > 0) AS BIGINT) AS matching_docs,
       | CAST(sum(occ) AS BIGINT) AS occurrences
       |FROM o GROUP BY phrase ORDER BY phrase""".stripMargin
  }

  /** RAKE stopword list (the repo's quality-stats set) and the phrase
    * length cap (degree stays bounded per occurrence).
    */
  val RakeStopwords: Seq[String] =
    Seq("the", "and", "is", "of", "to", "in", "it", "a")
  val RakeMaxPhrase = 4
  val RakeTopK = 20

  /** RAKE keyphrase extraction (Rose et al. 2010) — the multi-word
    * keyword extractor beside single-term tf·idf: candidate phrases are
    * maximal stopword-free token runs (capped at [[RakeMaxPhrase]]
    * tokens), each word scores `deg/freq` over the kept phrases (deg =
    * Σ lengths of phrases containing it, in milli via exact integer
    * division), a phrase scores the sum of its words, and the corpus
    * top-[[RakeTopK]] by (score desc, phrase asc) ships.
    *
    * Scale shape: phrase runs come from one per-doc index window (the
    * per-user-window family: one task sorts one doc's tokens, bounded by
    * doc length); word scores are a token-domain-bounded aggregate
    * broadcast back onto phrase words; the final top-k plans as
    * TakeOrderedAndProject — per-partition top-k plus a k-row merge,
    * never a global sort of the phrase domain.
    */
  def rakeKeyphrases(
      s: SparkSession, dir: String, k: Int = RakeTopK): DataFrame = {
    val stop = RakeStopwords
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(tokens).as(Seq("i", "tok")))
      .filter(!lower(col("tok")).isin(stop: _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("i")))
      .withColumn("run", col("i") - col("rn"))
    val phrases = toks.groupBy("doc_id", "run")
      .agg(count(lit(1)).as("n_tokens"),
        array_join(expr("transform(sort_array(collect_list(struct(i, tok))), x -> x.tok)"),
          " ").as("phrase"))
      .filter(col("n_tokens") <= RakeMaxPhrase)
    val words = toks
      .join(phrases.select("doc_id", "run", "n_tokens"), Seq("doc_id", "run"))
    val wordScores = words.groupBy("tok")
      .agg(expr("(1000 * sum(n_tokens)) div count(*)").as("w_milli"))
    val phraseScores = words.join(wordScores, Seq("tok"))
      .groupBy("doc_id", "run")
      .agg(sum("w_milli").as("score_milli"))
    phrases.join(phraseScores, Seq("doc_id", "run"))
      .groupBy("phrase")
      .agg(max("n_tokens").as("n_tokens"),
        count(lit(1)).as("n_occurrences"),
        max("score_milli").as("score_milli"))
      .orderBy(col("score_milli").desc, col("phrase"))
      .limit(k)
  }

  /** DuckDB oracle for [[rakeKeyphrases]]: identical runs, caps, word
    * scores, and ranking.
    */
  def rakeOracleSql(k: Int = RakeTopK): String = {
    val stop = RakeStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH x AS (
       | SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok,
       |  generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
       | FROM documents),
       |ns AS (
       | SELECT doc_id, tok, i,
       |  i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS run
       | FROM x WHERE lower(tok) NOT IN ($stop)),
       |ph AS (
       | SELECT doc_id, run, count(*) AS n_tokens,
       |  string_agg(tok, ' ' ORDER BY i) AS phrase
       | FROM ns GROUP BY 1, 2 HAVING count(*) <= $RakeMaxPhrase),
       |w AS (
       | SELECT ns.doc_id, ns.run, ns.tok, ph.n_tokens
       | FROM ns JOIN ph ON ns.doc_id = ph.doc_id AND ns.run = ph.run),
       |ws AS (
       | SELECT tok, (1000 * sum(n_tokens)) // count(*) AS w_milli
       | FROM w GROUP BY tok),
       |ps AS (
       | SELECT w.doc_id, w.run, CAST(sum(ws.w_milli) AS BIGINT) AS score_milli
       | FROM w JOIN ws ON w.tok = ws.tok GROUP BY 1, 2)
       |SELECT ph.phrase, CAST(max(ph.n_tokens) AS BIGINT) AS n_tokens,
       | count(*) AS n_occurrences,
       | CAST(max(ps.score_milli) AS BIGINT) AS score_milli
       |FROM ph JOIN ps ON ph.doc_id = ps.doc_id AND ph.run = ps.run
       |GROUP BY ph.phrase
       |ORDER BY score_milli DESC, phrase LIMIT $k""".stripMargin
  }
}
