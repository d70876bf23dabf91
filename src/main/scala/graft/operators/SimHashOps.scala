package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SimHash near-duplicate detection over `documents.text`.
  *
  * Every document gets a `Bits`-bit signature: bit j is the sign of
  * Σ over its shingles of ±1 according to bit j of a polynomial shingle
  * hash (base 31, mod 1e9+7 — the same hash family as
  * [[TextOps.fingerprints]], so the whole computation is expressible in
  * the DuckDB oracle and bit-exact across engines). Near-dup candidates
  * come from banded code equality (5 bands × 6 bits — by pigeonhole any
  * pair within Hamming distance 4 shares at least one intact band, so
  * recall at the ≤3 threshold is exact, not probabilistic); candidates
  * are verified with `bit_count(xor)`.
  *
  * Scale notes: signatures are per-row Column algebra (zero shuffle);
  * the only shuffle is the 8-byte band-key equi-join, whose volume
  * scales with real signature collisions. Unlike MinHash-LSH the
  * verification needs only the two 30-bit codes, not the shingle sets —
  * the cheapest of the near-dup families at 100 TB.
  */
object SimHashOps {

  val Bits = 30
  val Bands = 5
  val BandBits = 6
  val MaxHamming = 3
  private val Mod = 1000000007L

  /** Polynomial hash per shingle (matches the oracle's list_reduce). */
  private def shingleHashes: Column =
    transform(
      col("shingles"),
      t =>
        aggregate(
          regexp_extract_all(t, lit("."), lit(0)),
          lit(0L),
          (acc, c) => (acc * 31 + ascii(c)) % Mod))

  /** The SimHash code: sign bit per position over the hash multiset. */
  private def simhashCode: Column =
    (0 until Bits).map { j =>
      val bitSum = aggregate(
        col("hs"),
        lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(bitSum >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Near-dup pairs with Hamming distance <= [[MaxHamming]]. */
  def nearDupPairs(docs: DataFrame): DataFrame = {
    val codes = MinHashOps.shingleSets(docs)
      .select(col("doc_id"), shingleHashes.as("hs"))
      .select(col("doc_id"), simhashCode.cast("long").as("code"))

    // One 8-byte key per band: band index folded into the band value.
    val bandKeys = array((0 until Bands).map { b =>
      shiftright(col("code"), BandBits * b)
        .bitwiseAND(lit((1L << BandBits) - 1)) + lit(b.toLong * (1L << BandBits))
    }: _*)

    val buckets = codes.select(col("doc_id"), col("code"), explode(bandKeys).as("band"))
    buckets.as("x")
      .join(
        buckets.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"),
        col("x.code").as("ca"),
        col("y.code").as("cb"))
      .distinct()
      .select(
        col("doc_a"),
        col("doc_b"),
        bit_count(col("ca").bitwiseXOR(col("cb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= MaxHamming)
      .orderBy("doc_a", "doc_b")
  }

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(s, dir))

  /** DuckDB oracle: the identical algorithm, unrolled. */
  def oracleSql: String = {
    val bitSum = (0 until Bits).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> 2*((h >> $j) & 1) - 1)) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val mask = (1L << BandBits) - 1
    val bandSel = (0 until Bands)
      .map(b => s"((code >> ${BandBits * b}) & $mask) + ${b.toLong * (1L << BandBits)} AS b$b")
      .mkString(", ")
    val bandJoin = (0 until Bands).map(b => s"(a.b$b = c.b$b)").mkString(" OR ")
    s"""WITH tok AS (
       | SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |sh AS (
       | SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |  ELSE list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])
       |  END AS shingles
       | FROM tok),
       |hsh AS (
       | SELECT doc_id, list_transform(shingles,
       |  t -> list_reduce(list_prepend(0::BIGINT, list_transform(string_split(t,''), c -> unicode(c)::BIGINT)),
       |       (acc, x) -> (acc * 31 + x) % $Mod)) AS hs
       | FROM sh),
       |codes AS (SELECT doc_id, CAST($bitSum AS BIGINT) AS code FROM hsh),
       |cb AS (SELECT doc_id, code, $bandSel FROM codes),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b, a.code AS ca, c.code AS cc
       | FROM cb a JOIN cb c ON a.doc_id < c.doc_id AND ($bandJoin))
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ca, cc)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(ca, cc)) <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}
