package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hybrid retrieval: fuse a lexical ranking (exact word-3-gram Jaccard
  * against the query document) with a semantic ranking (exact cosine over
  * the aligned embedding) by reciprocal-rank fusion — the standard
  * two-tower RAG retrieval shape, where RRF is the fusion rule precisely
  * because it needs no score calibration between legs (ranks only).
  * Everything is integer (`jaccard milli`, `1e6 div (K + rank)` RRF
  * contributions), so the full two-leg pipeline replays in DuckDB.
  *
  * The query cohort is the first `nQueries` documents; `doc_id` and
  * `vec_id` are the driver corpus's shared id space, so each query has
  * both a text and an embedding by construction.
  *
  * Scale shape: the lexical leg joins the corpus's exploded shingle
  * postings against the BROADCAST query postings (query side is nQueries
  * docs) — per-posting work, never pair-quadratic; both leg rankings ride
  * the bounded top-k aggregator ([[AnnOps.rankTopK]]), so no leg ever
  * sorts a full candidate list in one task; the fusion join and final
  * window touch ≤ 2·nQueries·kLeg rows regardless of corpus size.
  */
object HybridOps {

  /** RRF dampening constant — the standard k=60 of Cormack et al. */
  val RrfK = 60

  def hybridRrfTopK(
      s: SparkSession,
      dir: String,
      k: Int = 10,
      kLeg: Int = 20,
      nQueries: Int = 5): DataFrame = {
    // Lexical leg: exact Jaccard of distinct word-3-gram shingle sets
    // between each query doc and every doc sharing at least one shingle.
    // The corpus shingle frame is persisted because BOTH the postings and
    // the per-doc sizes read it (Spark shares no subplans — unpersisted,
    // the corpus would be re-shingled per reference); the query side
    // instead re-shingles just the nQueries docs behind a pushed-down
    // doc_id filter, which is cheaper than caching for it.
    val docs = Tables.documents(s, dir)
    val sh = MinHashOps.shingleSets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    // Direct-expression explode, NOT explode(col) over an unpersisted
    // shingle projection: the latter shape measured a constant ~5.5 s of
    // per-execution overhead (the optimizer inlines the lambda-built
    // array through the Generate; behind a cache barrier — the `sh` path
    // above — or as the generator expression itself, it costs nothing).
    val qInv = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"),
        regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("toks"))
      .select(col("q_id"),
        explode(MinHashOps.shinglesFromToks(col("toks"))).as("s"))
    // Shingles are distinct per doc, so the co-occurrence count IS |A∩B|
    // (the [[MinHashOps.ngramJaccardPairs]] identity).
    val inter = inv.join(broadcast(qInv), "s")
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id").as("c_id"))
      .agg(count(lit(1)).as("inter"))
    val lexScored = inter
      .join(broadcast(sizes
        .filter(col("doc_id") < nQueries)
        .select(col("doc_id").as("q_id"), col("n").as("nq"))), "q_id")
      .join(sizes.select(col("doc_id").as("c_id"), col("n").as("nc")), "c_id")
      .select(col("q_id"), col("c_id"),
        // Integer milli Jaccard rides the shared double-valued ranker
        // exactly (values ≤ 1000 are double-exact).
        expr("(1000 * inter) div (nq + nc - inter)").cast("double").as("score"))
    val lexTop = AnnOps.rankTopK(s, lexScored, kLeg)
      .select(col("q_id"), col("c_id"), col("rank").as("lex_rank"))

    // Semantic leg: the exact cosine baseline at leg depth.
    val semTop = AnnOps.annTopK(s, dir, kLeg, nQueries)
      .select(col("q_id").as("sq"), col("c_id").as("sc"),
        col("rank").as("sem_rank"))

    // RRF fusion over the union of the two top lists.
    val fused = lexTop.join(semTop,
        col("q_id") === col("sq") && col("c_id") === col("sc"), "full_outer")
      .select(
        coalesce(col("q_id"), col("sq")).as("q_id"),
        coalesce(col("c_id"), col("sc")).as("c_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"))
      .withColumn("rrf_micro",
        when(col("lex_rank") > 0,
          expr(s"1000000 div ($RrfK + lex_rank)")).otherwise(lit(0L)) +
        when(col("sem_rank") > 0,
          expr(s"1000000 div ($RrfK + sem_rank)")).otherwise(lit(0L)))
    fused
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("q_id")
            .orderBy(col("rrf_micro").desc, col("c_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "rank", "rrf_micro", "lex_rank", "sem_rank")
      .orderBy("q_id", "rank")
  }

  /** DuckDB oracle: both legs + the fusion, integer end to end. The
    * lexical CTEs mirror [[MinHashOps]]' shingle fragment; the semantic
    * CTEs are [[AnnOps.annTopkOracleSql]]'s cosine chain at leg depth.
    */
  def hybridRrfOracleSql(
      k: Int = 10, kLeg: Int = 20, nQueries: Int = 5): String =
    s"""WITH tok AS (
       | SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |sh AS (
       | SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |  ELSE list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])
       |  END AS shingles
       | FROM tok),
       |sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |qe AS (SELECT doc_id AS q_id, unnest(shingles) AS s FROM sh WHERE doc_id < $nQueries),
       |inter AS (
       | SELECT qe.q_id, e.doc_id AS c_id, count(*) AS i
       | FROM e JOIN qe ON e.s = qe.s WHERE e.doc_id <> qe.q_id GROUP BY 1, 2),
       |lex AS (
       | SELECT i.q_id, i.c_id, (1000 * i.i) // (a.n + b.n - i.i) AS jac
       | FROM inter i JOIN sz a ON i.q_id = a.doc_id JOIN sz b ON i.c_id = b.doc_id),
       |lexk AS (
       | SELECT q_id, c_id, lex_rank FROM (
       |  SELECT q_id, c_id,
       |   CAST(row_number() OVER (PARTITION BY q_id ORDER BY jac DESC, c_id) AS BIGINT) AS lex_rank
       |  FROM lex) WHERE lex_rank <= $kLeg),
       |q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
       |c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings),
       |p AS (
       | SELECT q_id, c_id,
       |  round(
       |   list_sum(list_transform(list_zip(qv, cv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |   / (sqrt(list_sum(list_transform(qv, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE))))
       |      * sqrt(list_sum(list_transform(cv, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE))))), 6) AS cosine_r6
       | FROM q, c WHERE q_id <> c_id),
       |semk AS (
       | SELECT q_id, c_id, sem_rank FROM (
       |  SELECT q_id, c_id,
       |   CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine_r6 DESC, c_id) AS BIGINT) AS sem_rank
       |  FROM p) WHERE sem_rank <= $kLeg),
       |u AS (
       | SELECT coalesce(l.q_id, s.q_id) AS q_id, coalesce(l.c_id, s.c_id) AS c_id,
       |  coalesce(l.lex_rank, 0) AS lex_rank, coalesce(s.sem_rank, 0) AS sem_rank,
       |  CAST(CASE WHEN l.lex_rank IS NULL THEN 0 ELSE 1000000 // ($RrfK + l.lex_rank) END
       |   + CASE WHEN s.sem_rank IS NULL THEN 0 ELSE 1000000 // ($RrfK + s.sem_rank) END AS BIGINT) AS rrf_micro
       | FROM lexk l FULL OUTER JOIN semk s ON l.q_id = s.q_id AND l.c_id = s.c_id),
       |r AS (
       | SELECT q_id, c_id, lex_rank, sem_rank, rrf_micro,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf_micro DESC, c_id) AS BIGINT) AS rank
       | FROM u)
       |SELECT q_id, c_id, rank, rrf_micro, lex_rank, sem_rank
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
}
