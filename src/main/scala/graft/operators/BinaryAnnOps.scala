package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Binary (sign-bit) embedding quantization ANN + the Matryoshka
  * truncation-recall ladder.
  *
  * Binary quantization is the 32x-compression end of the ANN storage
  * spectrum the repo already prices (raw 256 B -> PQ 8 B -> binary 16 B
  * here as two 32-bit words in BIGINTs): each dimension contributes one
  * sign bit, candidate distance is a Hamming popcount over packed words,
  * and only a fixed-size shortlist ever touches raw vectors for the exact
  * cosine re-rank (the FAISS `IndexBinaryFlat` + refine composition;
  * reference corpus ops are in analysis/ etl_spark.py-style scans, which
  * have no ANN tier at all - this extends the engine past it).
  *
  * Scale shape: the candidate scan reads 16 bytes per vector, the
  * Hamming score is `bit_count(xor(...))` inside whole-stage codegen, the
  * shortlist is the bounded map-side top-k aggregator shared with every
  * other ANN path (AnnOps.rankTopK), and the re-rank joins raw vectors
  * for shortlist ids only - nQueries x Shortlist rows regardless of
  * corpus size. Everything is fixed-point/integer until the final rounded
  * cosine, so the whole path and its recall audit are oracle-gated.
  */
object BinaryAnnOps {

  /** Default shortlist width for the Hamming pre-filter: candidates kept
    * per query for the exact re-rank. The oracle replays the same
    * constant.
    */
  val Shortlist = 100

  val DefaultK = 10
  val DefaultQueries = 5

  /** One packed 32-bit sign word: bit (i-lo) set iff dim i is positive.
    * Bits are disjoint so `+` is exactly bitwise-or; the fold stays a
    * codegen'd `aggregate` over a constant 32-element sequence.
    */
  private def wordSql(vec: String, lo: Int): String =
    s"aggregate(sequence($lo, ${lo + 31}), 0L, (acc, i) -> acc + " +
      s"IF(CAST(element_at($vec, i + 1) AS DOUBLE) > 0D, shiftleft(1L, i - $lo), 0L))"

  /** The DuckDB mirror of [[wordSql]] (same bit order, same predicate). */
  private def duckWordSql(vec: String, lo: Int): String =
    s"CAST(list_sum(list_transform(range(0, 32), i -> CASE WHEN " +
      s"CAST($vec[i + ${lo + 1}] AS DOUBLE) > 0 THEN (CAST(1 AS BIGINT) << i) " +
      s"ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"

  /** vec_id + the two packed sign words of a 64-dim embedding frame. */
  private[graft] def signCodes(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id"),
      expr(wordSql("embedding", 0)).as("w0"),
      expr(wordSql("embedding", 32)).as("w1"))

  /** Hamming distance between the (qw0,qw1) and (cw0,cw1) code pairs. */
  private def hammingCol: Column =
    (bit_count(col("qw0").bitwiseXOR(col("cw0"))) +
      bit_count(col("qw1").bitwiseXOR(col("cw1")))).cast("long")

  /** Binary-quantized top-k: Hamming shortlist over packed sign codes,
    * exact cosine re-rank on the shortlist only. Output contract matches
    * `ann_topk` (q_id, c_id, rank, cosine_r6).
    */
  def annBinaryTopK(
      s: SparkSession, dir: String,
      k: Int = DefaultK, nQueries: Int = DefaultQueries,
      shortlist: Int = Shortlist): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val codes = signCodes(emb)
    val q = codes.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("w0").as("qw0"), col("w1").as("qw1"))
    // Stage 1: 16-byte codes only. Score = -hamming so the shared bounded
    // top-k aggregator's (score desc, id asc) order is (hamming asc, id asc).
    val hammed = codes
      .select(col("vec_id").as("c_id"), col("w0").as("cw0"), col("w1").as("cw1"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (-hammingCol).cast("double").as("score"))
    val sl = AnnOps.rankTopK(s, hammed, shortlist)
      .select(col("q_id").as("sq"), col("c_id").as("sc"))
    // Stage 2: raw vectors for shortlist ids only (nQueries x shortlist
    // rows); the query side re-reads nQueries raw vectors.
    val qv = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = emb
      .join(broadcast(sl), col("vec_id") === col("sc"))
      .join(broadcast(qv), col("sq") === col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        AnnOps.cosine(col("q_vec"), col("embedding")).as("cosine_r6"))
    AnnOps.rankTopK(s, scored, k)
  }

  /** Integer recall@k of the binary path against the exact baseline. */
  def annRecallBinary(s: SparkSession, dir: String): DataFrame =
    AnnOps.recallOf(AnnOps.annTopK(s, dir), annBinaryTopK(s, dir))

  private def duckCos(qv: String, cv: String): String =
    s"""round(
       |   list_sum(list_transform(list_zip($qv, $cv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |   / (sqrt(list_sum(list_transform($qv, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE))))
       |      * sqrt(list_sum(list_transform($cv, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE))))), 6)""".stripMargin

  /** DuckDB oracle for [[annBinaryTopK]]: identical packed codes, Hamming
    * row_number shortlist, exact-cosine re-rank.
    */
  def binaryOracleSql(
      k: Int = DefaultK, nQueries: Int = DefaultQueries,
      shortlist: Int = Shortlist): String =
    s"""WITH codes AS (
       | SELECT vec_id, ${duckWordSql("embedding", 0)} AS w0,
       |   ${duckWordSql("embedding", 32)} AS w1
       | FROM embeddings),
       |q AS (SELECT vec_id AS q_id, w0 AS qw0, w1 AS qw1 FROM codes WHERE vec_id < $nQueries),
       |h AS (
       | SELECT q_id, c.vec_id AS c_id,
       |  CAST(bit_count(xor(qw0, c.w0)) AS BIGINT) + CAST(bit_count(xor(qw1, c.w1)) AS BIGINT) AS ham
       | FROM q, codes c WHERE c.vec_id <> q_id),
       |sl AS (
       | SELECT q_id, c_id FROM (
       |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id ORDER BY ham, c_id) AS rn
       |  FROM h) WHERE rn <= $shortlist),
       |p AS (
       | SELECT sl.q_id, sl.c_id,
       |  ${duckCos("qe.embedding", "ce.embedding")} AS cosine_r6
       | FROM sl
       | JOIN embeddings ce ON ce.vec_id = sl.c_id
       | JOIN embeddings qe ON qe.vec_id = sl.q_id),
       |r AS (
       | SELECT q_id, c_id, cosine_r6,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine_r6 DESC, c_id) AS BIGINT) AS rank
       | FROM p)
       |SELECT q_id, c_id, rank, cosine_r6 FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** DuckDB oracle for [[annRecallBinary]]. */
  def annRecallBinaryOracleSql(): String =
    AnnOps.recallAuditSql(AnnOps.annTopkOracleSql(), binaryOracleSql())

  // -------------------------------------------------------------------
  // Matryoshka truncation-recall ladder
  // -------------------------------------------------------------------

  /** Prefix widths audited by the ladder (full width is 64). */
  val MatryoshkaDims: Seq[Int] = Seq(16, 32)

  /** Exact top-k over the first `d` dimensions only. */
  private def truncTopK(
      s: SparkSession, dir: String, d: Int, k: Int, nQueries: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), slice(col("embedding"), 1, d).as("embedding"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = emb
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        AnnOps.cosine(col("q_vec"), col("c_vec")).as("cosine_r6"))
    AnnOps.rankTopK(s, scored, k)
  }

  /** Matryoshka truncation recall: for each prefix width in
    * [[MatryoshkaDims]], the integer recall@k of exact search over the
    * truncated vectors against the full-width exact baseline - the audit
    * that prices "store/search only the first d dims" (MRL-style
    * embeddings) exactly the way the PQ ladder prices code compression.
    * One row per (dims, q_id).
    */
  def annMatryoshkaRecall(
      s: SparkSession, dir: String,
      k: Int = DefaultK, nQueries: Int = DefaultQueries): DataFrame = {
    val exact = AnnOps.annTopK(s, dir, k, nQueries)
    MatryoshkaDims.map { d =>
      AnnOps.recallOf(exact, truncTopK(s, dir, d, k, nQueries))
        .select(lit(d.toLong).as("dims"), col("q_id"), col("k"),
          col("hits"), col("recall_milli"))
    }.reduce(_.union(_)).orderBy("dims", "q_id")
  }

  /** Truncated-prefix exact top-k oracle (the full-width oracle with
    * both sides sliced to `d`).
    */
  private def truncTopkSql(d: Int, k: Int, nQueries: Int): String =
    s"""WITH q AS (
       | SELECT vec_id AS q_id, list_slice(embedding, 1, $d) AS qv
       | FROM embeddings WHERE vec_id < $nQueries),
       |c AS (SELECT vec_id AS c_id, list_slice(embedding, 1, $d) AS cv FROM embeddings),
       |p AS (
       | SELECT q_id, c_id, ${duckCos("qv", "cv")} AS cosine_r6
       | FROM q, c WHERE q_id <> c_id),
       |r AS (
       | SELECT q_id, c_id,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cosine_r6 DESC, c_id) AS rank
       | FROM p)
       |SELECT q_id, c_id FROM r WHERE rank <= $k""".stripMargin

  /** DuckDB oracle for [[annMatryoshkaRecall]]. */
  def annMatryoshkaRecallOracleSql(
      k: Int = DefaultK, nQueries: Int = DefaultQueries): String = {
    val arms = MatryoshkaDims.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS dims, e.q_id, count(*) AS k,
         | CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |FROM exact e LEFT JOIN a$d a ON e.q_id = a.q_id AND e.c_id = a.c_id
         |GROUP BY e.q_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    val trunc = MatryoshkaDims
      .map(d => s"a$d AS (${truncTopkSql(d, k, nQueries)})").mkString(",\n")
    s"""WITH exact AS (${AnnOps.annTopkOracleSql(k, nQueries)}),
       |$trunc,
       |r AS (
       |$arms)
       |SELECT dims, q_id, k, hits, CAST((1000 * hits) // k AS BIGINT) AS recall_milli
       |FROM r ORDER BY dims, q_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // SQ8 (scalar-quantized int8) ANN — the 4x-compression middle rung
  // between raw floats (256 B) and PQ/binary codes.
  // -------------------------------------------------------------------

  /** Per-vector symmetric int8 codes under `embedding_int8_audit`'s
    * EXACT quantization contract (scale = max|x|/127, half-up floor,
    * ±127 clamp): (vec_id, amax, q8[64]). The approx score between two
    * coded vectors is the symmetric SQ ADC — exact integer Σq_i·c_i
    * rescaled by (amax_q·amax_c)/127² in one fixed IEEE chain, so both
    * engines produce bit-identical doubles and the shortlist boundary
    * is deterministic (the cosine_r6 precedent).
    */
  private[graft] def sq8Codes(emb: DataFrame): DataFrame =
    emb
      .withColumn("amax",
        expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .select(col("vec_id"), col("amax"),
        expr(
          """CASE WHEN amax > 0D THEN transform(embedding, x ->
            | CAST(greatest(least(floor(CAST(x AS DOUBLE) / (amax / 127.0D) + 0.5D),
            |                     127.0D), -127.0D) AS BIGINT))
            |ELSE transform(embedding, x -> 0L) END""".stripMargin
            .replace("\n", " ")).as("q8"))

  /** SQ8 top-k: full scan over int8 codes (64 B/vector vs 256 B raw),
    * exact cosine re-rank on the shortlist only. Output contract matches
    * `ann_topk` (q_id, c_id, rank, cosine_r6).
    */
  def annSq8TopK(
      s: SparkSession, dir: String,
      k: Int = DefaultK, nQueries: Int = DefaultQueries,
      shortlist: Int = Shortlist): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val codes = sq8Codes(emb)
    val q = codes.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("amax").as("q_amax"),
        col("q8").as("qq8"))
    val approx = codes
      .select(col("vec_id").as("c_id"), col("amax").as("c_amax"),
        col("q8").as("cq8"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        expr(
          """CAST(aggregate(zip_with(qq8, cq8, (a, b) -> a * b), 0L,
            |               (acc, x) -> acc + x) AS DOUBLE)
            | * q_amax * c_amax / 16129.0D""".stripMargin.replace("\n", " "))
          .as("score"))
    val sl = AnnOps.rankTopK(s, approx, shortlist)
      .select(col("q_id").as("sq"), col("c_id").as("sc"))
    val qv = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = emb
      .join(broadcast(sl), col("vec_id") === col("sc"))
      .join(broadcast(qv), col("sq") === col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        AnnOps.cosine(col("q_vec"), col("embedding")).as("cosine_r6"))
    AnnOps.rankTopK(s, scored, k)
  }

  /** Integer recall@k of the SQ8 path against the exact baseline. */
  def annRecallSq8(s: SparkSession, dir: String): DataFrame =
    AnnOps.recallOf(AnnOps.annTopK(s, dir), annSq8TopK(s, dir))

  private def duckSq8Codes: String =
    s"""codes AS MATERIALIZED (
       | SELECT vec_id, amax,
       |  CASE WHEN amax > 0 THEN list_transform(embedding, x ->
       |   CAST(greatest(least(floor(CAST(x AS DOUBLE) / (amax / 127.0) + 0.5),
       |                       127.0), -127.0) AS BIGINT))
       |  ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q8
       | FROM (SELECT vec_id, embedding,
       |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
       |       FROM embeddings))""".stripMargin

  /** DuckDB oracle for [[annSq8TopK]]: identical codes, identical
    * fixed-IEEE approx chain, row_number shortlist, exact re-rank.
    */
  def sq8OracleSql(
      k: Int = DefaultK, nQueries: Int = DefaultQueries,
      shortlist: Int = Shortlist): String =
    s"""WITH $duckSq8Codes,
       |q AS (SELECT vec_id AS q_id, amax AS q_amax, q8 AS qq8
       |      FROM codes WHERE vec_id < $nQueries),
       |h AS (
       | SELECT q_id, c.vec_id AS c_id,
       |  CAST(list_sum(list_transform(list_zip(qq8, c.q8), t -> t[1] * t[2])) AS DOUBLE)
       |   * q_amax * c.amax / 16129.0 AS score
       | FROM q, codes c WHERE c.vec_id <> q_id),
       |sl AS (
       | SELECT q_id, c_id FROM (
       |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rn
       |  FROM h) WHERE rn <= $shortlist),
       |p AS (
       | SELECT sl.q_id, sl.c_id,
       |  ${duckCos("qe.embedding", "ce.embedding")} AS cosine_r6
       | FROM sl
       | JOIN embeddings ce ON ce.vec_id = sl.c_id
       | JOIN embeddings qe ON qe.vec_id = sl.q_id),
       |r AS (
       | SELECT q_id, c_id, cosine_r6,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine_r6 DESC, c_id) AS BIGINT) AS rank
       | FROM p)
       |SELECT q_id, c_id, rank, cosine_r6 FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** DuckDB oracle for [[annRecallSq8]]. */
  def annRecallSq8OracleSql(): String =
    AnnOps.recallAuditSql(AnnOps.annTopkOracleSql(), sq8OracleSql())
}
