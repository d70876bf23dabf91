package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SimHash near-duplicate detection over `documents.text`.
  *
  * Every document gets a `Bits`-bit signature: bit j is the sign of
  * Σ over its shingles of ±1 according to bit j of a polynomial shingle
  * hash. Two independent hash families supply the bits — base 31 mod
  * 1e9+7 for bits 0-29 and base 131 mod 1e9+9 for bits 30-59 — the same
  * hash construction as [[TextOps.fingerprints]], so the whole
  * computation is expressible in the DuckDB oracle and bit-exact across
  * engines. Near-dup candidates come from banded code equality
  * ([[Bands]] bands × [[BandBits]] bits — by pigeonhole any pair within
  * Hamming distance [[Bands]]-1 shares at least one intact band, so
  * recall at the ≤[[MaxHamming]] threshold is exact, not probabilistic);
  * candidates are verified with `bit_count(xor)`.
  *
  * Scale notes: signatures are per-row Column algebra (zero shuffle);
  * the only shuffle is the 8-byte band-key equi-join, and verification
  * needs only the two 60-bit codes, never the shingle sets — the
  * cheapest of the near-dup families at 100 TB. Candidate volume is
  * Σ over buckets of C(occupancy, 2) with 2^[[BandBits]] = 4096 bucket
  * values per band, suited to ~1e6-1e7 docs per partition of the corpus;
  * at larger N the (Bits, Bands, BandBits) triple is the dial — widen
  * BandBits (and Bits = Bands × BandBits) with log2(N) to hold bucket
  * occupancy flat while keeping the pigeonhole recall bound at
  * Hamming ≤ Bands-1.
  */
object SimHashOps {

  val Bits = 60
  val Bands = 5
  val BandBits = 12
  val MaxHamming = 4
  require(Bands * BandBits == Bits && MaxHamming <= Bands - 1)

  /** Low/high bit halves come from independent polynomial hash families. */
  private val HalfBits = 30
  private val Mod1 = 1000000007L
  private val Mod2 = 1000000009L
  private val Base1 = 31
  private val Base2 = 131

  /** Polynomial hash per shingle — the native [[graft.functions.PolyHash]]
    * expression (one fused JIT loop per shingle; bit-identical to the
    * oracle's list_reduce and to the previous
    * `aggregate(regexp_extract_all(t, "."), ...)` form, which cost a
    * one-char-string array plus an interpreted lambda per character and
    * dominated this query's r4 bench time).
    */
  private def shingleHashes(base: Int, mod: Long): Column =
    transform(col("shingles"),
      t => graft.functions.GraftFunctions.poly_hash(t, base, mod))

  /** The 60-bit SimHash code over the two hash multisets: each half is one
    * native [[graft.functions.SimHashPack]] pass (±1 bit votes, sign >= 0),
    * packed into disjoint bit ranges.
    */
  private def simhashCode: Column =
    graft.functions.GraftFunctions.simhash_pack(col("hs1"), HalfBits, 0) +
      graft.functions.GraftFunctions.simhash_pack(col("hs2"), HalfBits, HalfBits)

  private def codes(docs: DataFrame): DataFrame =
    MinHashOps.shingleSets(docs)
      .select(
        col("doc_id"),
        shingleHashes(Base1, Mod1).as("hs1"),
        shingleHashes(Base2, Mod2).as("hs2"))
      .select(col("doc_id"), simhashCode.cast("long").as("code"))

  /** Candidate pairs (sharing ≥1 band) with both codes attached. */
  private def candidatesWithCodes(docs: DataFrame): DataFrame = {
    // One 8-byte key per band: band index folded into the band value.
    val bandKeys = array((0 until Bands).map { b =>
      shiftright(col("code"), BandBits * b)
        .bitwiseAND(lit((1L << BandBits) - 1)) + lit(b.toLong * (1L << BandBits))
    }: _*)
    // Persist the (doc_id, code) frame — 16 bytes/doc — so the self-join's
    // two sides don't each re-run the shingling pipeline (the expensive
    // part: tokenize + slice + concat per shingle) over the full corpus.
    val buckets = codes(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .select(col("doc_id"), col("code"), explode(bandKeys).as("band"))
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
  }

  /** Distinct band-collision candidate pairs — exposed so tests can pin
    * candidate volume ≪ C(N,2) (the whole point of the banded key space).
    */
  def bandCandidates(docs: DataFrame): DataFrame =
    candidatesWithCodes(docs).select(col("doc_a"), col("doc_b"))

  /** Near-dup pairs with Hamming distance <= [[MaxHamming]]. */
  def nearDupPairs(docs: DataFrame): DataFrame =
    candidatesWithCodes(docs)
      .select(
        col("doc_a"),
        col("doc_b"),
        bit_count(col("ca").bitwiseXOR(col("cb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= MaxHamming)
      .orderBy("doc_a", "doc_b")

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(s, dir))

  /** DuckDB oracle: the identical algorithm, unrolled. */
  def oracleSql: String = {
    def half(hsCol: String, outOffset: Int): String =
      (0 until HalfBits).map { j =>
        s"(CASE WHEN list_sum(list_transform($hsCol, h -> 2*((h >> $j) & 1) - 1)) >= 0 THEN ${1L << (j + outOffset)} ELSE 0 END)"
      }.mkString(" + ")
    val bitSum = half("hs1", 0) + " + " + half("hs2", HalfBits)
    val mask = (1L << BandBits) - 1
    val bandSel = (0 until Bands)
      .map(b => s"((code >> ${BandBits * b}) & $mask) + ${b.toLong * (1L << BandBits)} AS b$b")
      .mkString(", ")
    val bandJoin = (0 until Bands).map(b => s"(a.b$b = c.b$b)").mkString(" OR ")
    def polySql(base: Int, mod: Long): String =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split(t,''), c -> unicode(c)::BIGINT)), (acc, x) -> (acc * $base + x) % $mod)"
    s"""WITH tok AS (
       | SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |sh AS (
       | SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |  ELSE list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])
       |  END AS shingles
       | FROM tok),
       |hsh AS (
       | SELECT doc_id,
       |  list_transform(shingles, t -> ${polySql(Base1, Mod1)}) AS hs1,
       |  list_transform(shingles, t -> ${polySql(Base2, Mod2)}) AS hs2
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
