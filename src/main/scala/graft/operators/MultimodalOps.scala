package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-media extracted features (deterministic stub of a real decoder). */
final case class MediaFeature(
    doc_id: Long,
    byte_len: Long,
    head_hash: String,
    bytes_mean_milli: Long)

/** Multimodal-column handling: media (image/audio/video) carried as opaque
  * `binary` payloads next to a typed metadata struct, with decode /
  * feature-extraction / frame-sampling operators.
  *
  * The container has no media codecs, so the decode step is a STUB — a
  * deterministic byte-level computation stands in for "decode then
  * featurize". Everything around it is the real 100 TB contract:
  *  - payloads live in a `binary` column (never strings — no charset
  *    re-encode on shuffle), metadata in a narrow struct column that
  *    filters/prunes independently of the blob;
  *  - feature extraction is `mapPartitions` over the typed Dataset — the
  *    same batch shape a vectorized decoder (or `mapInPandas` in PySpark)
  *    would use, one library init per partition, streaming iterator, no
  *    whole-partition materialization;
  *  - frame sampling is pure Column algebra (`substring` on binary), so it
  *    stays in codegen and prunes to the sampled frames before any wide op.
  */
object MultimodalOps {

  val FrameBytes = 64

  /** Attach the synthetic binary payload + typed metadata to each document
    * — stands in for blobs ingested from object storage. Metadata is
    * derived deterministically from document properties.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (octet_length(encode(col("text"), "UTF-8")) / FrameBytes + 1).cast("int")
          .as("n_frames")).as("meta"))

  /** Frame sampling: split the payload into fixed-size frames and emit
    * every `stride`-th frame with its digest — pure binary `substring`
    * algebra, no decode required.
    */
  def sampleFrames(payloads: DataFrame, stride: Int = 4): DataFrame =
    payloads
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), expr(s"(octet_length(payload) - 1) div $FrameBytes")),
            i => col("payload").substr(i * FrameBytes + 1, lit(FrameBytes)))))
      .select(col("doc_id"), col("pos").as("frame_idx"), col("col").as("frame"))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame_hash", md5(col("frame")))

  /** Frame-level exact dedup across the corpus: group the sampled frame
    * digests and report duplication mass — the media twin of text
    * `dedup_stats`, and the pre-pass that decides whether a video corpus
    * is worth content-defined chunking (near-identical intros/outros
    * shared across files dominate real media dedup). One summary row so
    * the result is meaningful on corpora with no duplicated frames (like
    * this synthetic one). Scale shape: only digests enter the exchange
    * (never frame bytes), one map-side-combined groupBy + a scalar
    * rollup.
    */
  def frameDedup(s: SparkSession, dir: String): DataFrame =
    sampleFrames(withPayload(Tables.documents(s, dir)))
      .groupBy("frame_hash")
      .agg(count(lit(1)).as("cnt"))
      .agg(
        sum("cnt").as("total_frames"),
        count(lit(1)).as("distinct_frames"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("dup_groups"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_occurrences"),
        sum(when(col("cnt") > 1, col("cnt") - 1).otherwise(0L)).as("dedupable_frames"))

  /** DuckDB oracle for [[frameDedup]] — the frames CTE is
    * [[MultimodalFramesOracleSql]]'s grid, rolled up by digest.
    */
  val FrameDedupOracleSql: String =
    s"""WITH f AS (
       | SELECT md5(substring(text, CAST(i * $FrameBytes + 1 AS BIGINT), $FrameBytes)) AS frame_hash
       | FROM documents, range(0, 64) t(i)
       | WHERE i <= (octet_length(encode(text)) - 1) // $FrameBytes AND i % 4 = 0),
       |g AS (SELECT frame_hash, count(*) AS cnt FROM f GROUP BY 1)
       |SELECT CAST(sum(cnt) AS BIGINT) AS total_frames,
       | count(*) AS distinct_frames,
       | CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
       | CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_occurrences,
       | CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) AS dedupable_frames
       |FROM g""".stripMargin

  // ---- Perceptual near-dup (average-hash) over the frame grid ---------

  /** Band count for the 64-bit perceptual hash (4 × 16-bit bands). */
  val PhashBands = 4

  /** Max Hamming distance reported as "near-duplicate". */
  val PhashHammingMax = 6

  /** Bucket cap for a (band, value) candidate bucket — the df-cap
    * precedent: a constant-background band value (e.g. all-zero bits
    * from flat frames) would otherwise contribute C(bucket, 2) pairs.
    * Dropped buckets are surfaced as the gated `hamming = -1` row.
    */
  val PhashBucketCap = 128L

  /** Perceptual near-dup audit over the sampled frame grid — the
    * NEAR-dup companion of [[frameDedup]]'s exact digests (re-encoded
    * media never digest-matches but its frames stay perceptually
    * adjacent): each distinct full frame gets a 64-bit average-hash
    * (bit_i = byte_i ≥ the frame's exact integer mean — the classic
    * aHash on the 8×8 grid), candidates pair through 16-bit band
    * buckets (the SimHash banding shape: Hamming ≤ 3 guarantees one of
    * 4 bands equal; ≤ 6 still pairs unless misses spread 2-2-1-1),
    * exact Hamming verifies, and the output is the pair-mass histogram
    * per distance plus the dropped-bucket diagnostic row
    * (`hamming = -1`, the capped mass priced like dropped postings).
    *
    * Scale shape: exact-dup frames collapse to ONE representative
    * before any pairing (the dedup_minhash pre-collapse), candidates
    * are bucket-join + cap (never all-pairs), and only 8-byte band
    * values and 64-bit hashes cross shuffles — never frame bytes.
    */
  def mediaPhashDedup(s: SparkSession, dir: String): DataFrame = {
    val frames = sampleFrames(withPayload(Tables.documents(s, dir)))
      .filter(octet_length(col("frame")) === FrameBytes)
    // One representative per distinct frame content (bytes equal per
    // hash, so max() is value-deterministic).
    val rep = frames.groupBy("frame_hash")
      .agg(max(decode(col("frame"), "UTF-8")).as("chars"))
    // 64 char codes -> exact integer mean -> 4 x 16-bit band values.
    val codes = rep.select(
      col("frame_hash"),
      expr(s"transform(sequence(1, $FrameBytes), i -> ascii(substring(chars, i, 1)))")
        .as("codes"))
    val bands = codes
      .withColumn("avgc",
        expr(s"aggregate(codes, 0L, (a, x) -> a + CAST(x AS BIGINT))" +
          s" div $FrameBytes"))
      .select(col("frame_hash"),
        // codes[k] is the SQL [] operator — 0-based on Spark arrays.
        posexplode(expr(
          s"""transform(sequence(0, ${PhashBands - 1}), b ->
             | aggregate(sequence(0, 15), 0L,
             |  (a, j) -> a + IF(codes[b * 16 + j] >= avgc,
             |                   shiftleft(1L, j), 0L)))""".stripMargin)))
      .select(col("frame_hash"), col("pos").as("band"), col("col").as("val"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucketSizes = bands.groupBy("band", "val")
      .agg(count(lit(1)).as("bsz"))
    val kept = bands.join(
      bucketSizes.filter(col("bsz") <= PhashBucketCap), Seq("band", "val"))
    val cand = kept.as("x")
      .join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.val") === col("y.val") &&
          col("x.frame_hash") < col("y.frame_hash"))
      .select(col("x.frame_hash").as("fa"), col("y.frame_hash").as("fb"))
      .distinct()
    val ham = cand
      .join(bands.select(col("frame_hash").as("fa"), col("band"),
        col("val").as("va")), Seq("fa"))
      .join(bands.select(col("frame_hash").as("fb"), col("band"),
        col("val").as("vb")), Seq("fb", "band"))
      .groupBy("fa", "fb")
      .agg(sum(expr("bit_count(va ^ vb)")).as("hamming"))
    val hist = ham.filter(col("hamming") <= PhashHammingMax)
      .groupBy(col("hamming").cast("long").as("hamming"))
      .agg(count(lit(1)).as("n_pairs"))
    val dropped = bucketSizes.filter(col("bsz") > PhashBucketCap)
      .agg(lit(-1L).as("hamming"),
        coalesce(count(lit(1)), lit(0L)).as("n_pairs"))
    val out = dropped.union(hist).orderBy("hamming")
    out
  }

  /** DuckDB oracle for [[mediaPhashDedup]] — the same grid, aHash, band
    * buckets with the cap, exact Hamming via `bit_count(xor(...))`.
    */
  val MediaPhashOracleSql: String =
    s"""WITH fr AS MATERIALIZED (
       | SELECT md5(sub) AS fh, min(sub) AS chars FROM (
       |  SELECT substring(text, CAST(i * $FrameBytes + 1 AS BIGINT), $FrameBytes) AS sub
       |  FROM documents, range(0, 64) t(i)
       |  WHERE i <= (octet_length(encode(text)) - 1) // $FrameBytes AND i % 4 = 0)
       | WHERE octet_length(encode(sub)) = $FrameBytes
       | GROUP BY md5(sub)),
       |c AS MATERIALIZED (
       | SELECT fh, CAST(t.j AS INTEGER) AS j,
       |  CAST(unicode(substr(chars, CAST(t.j + 1 AS BIGINT), 1)) AS BIGINT) AS code
       | FROM fr, range(0, $FrameBytes) t(j)),
       |av AS (SELECT fh, sum(code) // $FrameBytes AS avgc FROM c GROUP BY fh),
       |b AS MATERIALIZED (
       | SELECT c.fh, c.j // 16 AS band,
       |  CAST(sum(CASE WHEN c.code >= av.avgc
       |       THEN (1::BIGINT << (c.j % 16)) ELSE 0 END) AS BIGINT) AS val
       | FROM c JOIN av ON c.fh = av.fh GROUP BY c.fh, c.j // 16),
       |bs AS MATERIALIZED (SELECT band, val, count(*) AS bsz FROM b GROUP BY 1, 2),
       |kept AS (SELECT b.* FROM b JOIN bs USING (band, val) WHERE bsz <= $PhashBucketCap),
       |cand AS MATERIALIZED (
       | SELECT DISTINCT x.fh AS fa, y.fh AS fb
       | FROM kept x JOIN kept y
       |  ON x.band = y.band AND x.val = y.val AND x.fh < y.fh),
       |ham AS (
       | SELECT cand.fa, cand.fb,
       |  CAST(sum(bit_count(xor(xa.val, yb.val))) AS BIGINT) AS hamming
       | FROM cand
       | JOIN b xa ON xa.fh = cand.fa
       | JOIN b yb ON yb.fh = cand.fb AND yb.band = xa.band
       | GROUP BY cand.fa, cand.fb),
       |hist AS (
       | SELECT hamming, count(*) AS n_pairs FROM ham
       | WHERE hamming <= $PhashHammingMax GROUP BY hamming),
       |drp AS (
       | SELECT CAST(-1 AS BIGINT) AS hamming, count(*) AS n_pairs
       | FROM bs WHERE bsz > $PhashBucketCap)
       |SELECT hamming, n_pairs FROM drp
       |UNION ALL SELECT hamming, n_pairs FROM hist
       |ORDER BY hamming""".stripMargin

  // ---- Content-defined chunking (FastCDC-style) ------------------------

  /** Rolling-hash window width (bytes). */
  val CdcWindow = 8
  /** Polynomial modulus — prime < 2^20, so 8 terms × 255 stay < 2^31 and
    * every intermediate is exact BIGINT in any engine. */
  val CdcMod = 1048573L
  /** Polynomial base. */
  val CdcBase = 257L
  /** Boundary density: a position is a cut when `h % CdcDivisor == 0`,
    * so expected chunk length ≈ CdcDivisor bytes (the [[FrameBytes]]
    * scale, deliberately — the two media-dedup passes price the same
    * granularity). */
  val CdcDivisor = 64L

  /** C_j = CdcBase^j mod CdcMod — coefficient for the byte j positions
    * behind the candidate cut. */
  private val cdcCoefs: IndexedSeq[Long] =
    Iterator.iterate(1L)(c => c * CdcBase % CdcMod).take(CdcWindow).toIndexedSeq

  private def cdcPolyDuck(i: String): String =
    cdcCoefs.zipWithIndex
      .map { case (c, j) =>
        s"$c::BIGINT * unicode(substring(text, CAST(($i - $j) AS INT), 1))" }
      .mkString("(", " + ", s") % $CdcMod")

  /** Content-defined chunks of every payload: `(doc_id, chunk_hash,
    * clen)`, one row per chunk, where chunk k spans
    * `(cuts[k] + 1) .. cuts[k+1]` of the BINARY payload.
    *
    * This is the FastCDC idea in its oracle-replayable core: a boundary
    * is a PURE CONTENT predicate (trailing 8-byte polynomial hash ≡ 0
    * mod [[CdcDivisor]], the [[graft.functions.CdcCuts]] native
    * expression — one fused O(window·len) JIT loop per row), so two
    * files sharing a region — shifted, re-muxed, or re-ordered — cut at
    * the SAME interior positions and their shared chunks collide by
    * digest, which whole-frame digests ([[frameDedup]]'s fixed grid)
    * structurally miss. Statelessness is also the scale argument: the
    * boundary test at position i reads only bytes i−7..i, so boundary
    * detection is embarrassingly parallel — FastCDC's min/max clamps
    * (skipped here) are exactly the part that forces a sequential scan,
    * and a production chunker applies them in the same one-pass
    * mapPartitions shape as [[extractFeatures]]; the gated variant keeps
    * the pure predicate so DuckDB replays boundaries bit-for-bit. The
    * divisor is the density dial (expected chunk ≈ divisor bytes).
    *
    * Plan shape (§5 codegen rule): the cuts array is a NATIVE expression
    * (no Catalyst lambda below the Generate), and the chunk structs are
    * exploded AS the generator expression — both documented safe shapes.
    */
  private[graft] def cdcChunks(payloads: DataFrame): DataFrame =
    payloads
      .filter(octet_length(col("payload")) >= 1)
      .select(col("doc_id"), col("payload"),
        graft.functions.GraftFunctions
          .cdc_cuts(col("payload"), CdcWindow, CdcBase, CdcMod, CdcDivisor)
          .as("cuts"))
      .select(
        col("doc_id"), col("payload"),
        explode(expr(
          """filter(
            |  transform(sequence(1, size(cuts) - 1),
            |    k -> struct(element_at(cuts, k) + 1 AS cstart,
            |                element_at(cuts, k + 1) - element_at(cuts, k) AS clen)),
            |  c -> c.clen >= 1)""".stripMargin)).as("c"))
      .select(
        col("doc_id"),
        md5(col("payload").substr(col("c.cstart").cast("int"),
          col("c.clen").cast("int"))).as("chunk_hash"),
        col("c.clen").as("clen"))

  /** One clamped CDC chunk: md5 digest + offsets within the payload. */
  final case class CdcChunk(
      doc_id: Long, chunk_idx: Long, cstart: Long, clen: Long,
      chunk_hash: String)

  /** Min/max chunk clamps for the PRODUCTION chunker ([[cdcChunksClamped]]):
    * min suppresses boundaries that would emit a tiny chunk, max forces a
    * cut — the full FastCDC contract. Expected chunk stays ≈ divisor. */
  val CdcMinLen = 32
  val CdcMaxLen = 256

  /** The production FastCDC chunker: the SAME rolling window hash and
    * boundary predicate as [[cdcChunks]], PLUS the min/max clamps — which
    * make the cut decision sequential (a boundary's validity depends on
    * where the previous cut landed), so this variant runs as ONE
    * imperative O(len) pass per payload inside `mapPartitions` (the
    * [[extractFeatures]] shape: per-partition iterator, no
    * whole-partition materialization). Tests-only by gate design (a
    * sequential fold over bytes is not SQL-expressible); the spec pins
    * the clamp invariants and that on clamp-free inputs it emits
    * EXACTLY the gated pure-predicate chunks.
    *
    * Why both exist: the pure predicate is embarrassingly parallel and
    * oracle-replayable (the gate artifact); the clamps bound chunk-size
    * variance for storage/dedup-ratio SLAs (the production artifact).
    * Shifted duplicates still collide after at most one boundary
    * re-sync inside the shared region, the FastCDC property.
    */
  def cdcChunksClamped(
      s: SparkSession, payloads: DataFrame,
      minLen: Int = CdcMinLen, maxLen: Int = CdcMaxLen): Dataset[CdcChunk] = {
    require(0 < minLen && minLen <= maxLen && CdcWindow <= minLen)
    import s.implicits._
    val (window, mod, divisor) = (CdcWindow, CdcMod, CdcDivisor)
    val coefs = cdcCoefs
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val out = scala.collection.mutable.ArrayBuffer[CdcChunk]()
          val len = bytes.length
          var start = 0 // chunk start, 0-based inclusive
          var i = window // candidate cut position, 1-based
          while (i <= len) {
            var h = 0L
            var j = 0
            while (j < window) { h += coefs(j) * (bytes(i - 1 - j) & 0xff); j += 1 }
            val cut =
              (h % mod % divisor == 0L && i - start >= minLen) ||
                i - start >= maxLen
            if (cut && i < len) {
              out += chunkOf(md, id, out.length, bytes, start, i - start)
              start = i
            }
            i += 1
          }
          if (len > start)
            out += chunkOf(md, id, out.length, bytes, start, len - start)
          out.iterator
        }
      }
  }

  private def chunkOf(
      md: java.security.MessageDigest, id: Long, idx: Int,
      bytes: Array[Byte], start: Int, clen: Int): CdcChunk = {
    md.reset()
    md.update(bytes, start, clen)
    CdcChunk(id, idx.toLong, start.toLong + 1, clen.toLong,
      md.digest().map("%02x".format(_)).mkString)
  }

  /** Registered query: content-defined chunk dedup over the media
    * payloads — the successor pass [[frameDedup]] exists to justify.
    * Groups the CDC chunk digests corpus-wide and reports duplication
    * mass in chunks AND bytes. Scale shape: only (digest, clen) enters
    * the exchange — never chunk bytes — one map-side-combined groupBy
    * and a scalar rollup, the digest-only exchange shared with
    * [[frameDedup]] and text `dedup_stats`.
    */
  def mediaCdcDedup(s: SparkSession, dir: String): DataFrame =
    cdcChunks(withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload")))
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("cnt"), max("clen").as("clen"))
      .agg(
        sum("cnt").as("total_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("dup_groups"),
        sum(when(col("cnt") > 1, col("cnt") - 1).otherwise(0L))
          .as("dedupable_chunks"),
        sum(col("cnt") * col("clen")).as("total_bytes"),
        sum(when(col("cnt") > 1, (col("cnt") - 1) * col("clen")).otherwise(0L))
          .as("dedupable_bytes"))

  /** DuckDB oracle for [[mediaCdcDedup]]: identical polynomial window
    * hash (exact integers), identical cut set (list_sort because
    * list_distinct does not promise order), identical chunk slicing and
    * digest rollup. The round-trip through the binary payload on the
    * Spark side is byte-identical to the text column here because the
    * corpus is ASCII (the standing multimodal-oracle contract).
    */
  val MediaCdcDedupOracleSql: String =
    s"""WITH d AS (
       | SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
       | FROM documents WHERE length(text) >= 1),
       |b AS (
       | SELECT doc_id, text,
       |  list_sort(list_distinct(
       |   [CAST(0 AS BIGINT)] ||
       |   list_filter(
       |     list_transform(range(CAST($CdcWindow AS BIGINT), greatest(len, $CdcWindow) + 1),
       |       i -> CASE WHEN i <= len AND ${cdcPolyDuck("i")} % $CdcDivisor = 0
       |                 THEN i ELSE CAST(-1 AS BIGINT) END),
       |     x -> x >= 0) ||
       |   [len])) AS cuts
       | FROM d),
       |k0 AS (
       | SELECT doc_id, text, cuts, unnest(range(1, len(cuts))) AS k FROM b),
       |c AS (
       | SELECT md5(substring(text, CAST(cuts[k] + 1 AS INT),
       |                      CAST(cuts[k + 1] - cuts[k] AS INT))) AS chunk_hash,
       |        cuts[k + 1] - cuts[k] AS clen
       | FROM k0 WHERE cuts[k + 1] - cuts[k] >= 1),
       |g AS (SELECT chunk_hash, count(*) AS cnt, max(clen) AS clen
       |      FROM c GROUP BY 1)
       |SELECT CAST(sum(cnt) AS BIGINT) AS total_chunks,
       | count(*) AS distinct_chunks,
       | CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
       | CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) AS dedupable_chunks,
       | CAST(sum(cnt * clen) AS BIGINT) AS total_bytes,
       | CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * clen ELSE 0 END) AS BIGINT) AS dedupable_bytes
       |FROM g""".stripMargin

  /** STUB decode + featurize: a real deployment decodes media bytes with a
    * native library inside this exact `mapPartitions` shape. The stand-in
    * is deterministic byte statistics, so tests pin the plumbing.
    */
  def extractFeatures(s: SparkSession, payloads: DataFrame): Dataset[MediaFeature] = {
    import s.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // One decoder init per partition would go here.
        it.map { case (id, bytes) =>
          val mean =
            if (bytes.isEmpty) 0L
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)) * 1000L / bytes.length
          val head = bytes.take(FrameBytes)
          val md = java.security.MessageDigest.getInstance("MD5").digest(head)
          MediaFeature(id, bytes.length.toLong, md.map("%02x".format(_)).mkString, mean)
        }
      }
  }

  /** Registered query: the SQL-checkable slice of the multimodal pipeline
    * (payload sizes + metadata arithmetic; decode outputs are covered by
    * the scalatest suite since DuckDB has no equivalent).
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables.documents(s, dir))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("meta.n_frames").cast("long").as("n_frames"))
      .orderBy("doc_id")

  /** Registered query: every sampled frame's digest through the REAL
    * binary path ([[withPayload]] → [[sampleFrames]]: binary `substr`
    * + `md5` over the payload blob). The oracle reproduces the digests
    * from the text column — byte-slicing == char-slicing because the
    * synthetic corpus is pure ASCII (the gate would hash-mismatch the
    * moment that assumption broke, which is the point of the audit).
    */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    sampleFrames(withPayload(Tables.documents(s, dir)))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("frame_hash"))
      .orderBy("doc_id", "frame_idx")

  /** DuckDB oracle for [[multimodalFrames]]: same frame grid (inclusive
    * `sequence(0, (len-1) div 64)`), `md5` over the text slice (ASCII ⇒
    * identical bytes to the Spark side's binary slice). DuckDB `range`
    * only accepts CONSTANT bounds (no lateral or subquery parameters),
    * so the grid is a fixed 64-frame (4 KiB) ceiling filtered per row —
    * far above the synthetic corpus's ~10-frame max, and a doc ever
    * exceeding it would surface as a gate hash mismatch, not silence;
    * `//` truncates like Spark `div`.
    */
  val MultimodalFramesOracleSql: String =
    s"""WITH f AS (
       | SELECT doc_id, i AS frame_idx,
       |  md5(substring(text, CAST(i * $FrameBytes + 1 AS BIGINT), $FrameBytes)) AS frame_hash
       | FROM documents, range(0, 64) t(i)
       | WHERE i <= (octet_length(encode(text)) - 1) // $FrameBytes)
       |SELECT doc_id, frame_idx, frame_hash FROM f
       |WHERE frame_idx % 4 = 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Registered query: the [[extractFeatures]] decode-stub path itself —
    * the one `mapPartitions` in the library — so the stub's PLUMBING
    * (typed Dataset round-trip, per-partition iterator, schema) is
    * oracle-gated, not just scalatested. Output is the deterministic
    * byte statistics the stub computes.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(s, withPayload(Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"), col("byte_len"), col("head_hash"), col("bytes_mean_milli"))
      .orderBy("doc_id")

  /** DuckDB oracle for [[multimodalFeatures]]: re-derives the stub's
    * byte stats from the ASCII text column — `unicode()` of a 1-char
    * slice == the byte value, summed over a constant-bound char grid
    * (same 1024-byte ceiling rationale as the frame oracle); head
    * digest is `md5` of the first $FrameBytes chars; `//` truncates
    * toward zero exactly like the stub's Long division.
    */
  val MultimodalFeaturesOracleSql: String =
    s"""WITH b AS (
       | SELECT doc_id,
       |  sum(unicode(substring(text, CAST(j + 1 AS BIGINT), 1))) AS bsum
       | FROM documents, range(0, 1024) t(j)
       | WHERE j < octet_length(encode(text))
       | GROUP BY doc_id)
       |SELECT d.doc_id,
       | CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
       | md5(substring(d.text, 1, $FrameBytes)) AS head_hash,
       | CAST(b.bsum * 1000 // octet_length(encode(d.text)) AS BIGINT) AS bytes_mean_milli
       |FROM documents d JOIN b USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
