package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Principal components of the embedding space — the variance-structure
  * readout an embedding feed runs after the per-dimension audits
  * (`embedding_dim_stats` says WHICH dims are dead; the top components
  * say how the live ones co-vary, e.g. whether 2 directions carry most
  * of the corpus variance and ANN code budgets should bend that way).
  *
  * Scale split, by size not by habit: the ONLY corpus-sized work is one
  * pass accumulating raw moment sums — Σx (64 longs) and the upper
  * triangle of Σx·xᵀ (2080 longs) — as a typed [[Aggregator]] whose
  * buffer is a single long array, reduced map-side per partition and
  * merged associatively, all in e6 fixed-point integers so the result
  * is EXACT and partition-order independent. The 64×64 eigensolve then
  * runs on the driver — a 4 KB matrix is driver-sized at any corpus
  * scale, the same judgment call as broadcasting a k×k KMeans table.
  * Power iteration (500 rounds, fixed all-ones start, one deflation for
  * the second component, canonical first-nonzero-positive sign) is
  * deterministic double math on exact integer inputs, so the registered
  * rows-only output never flickers across runs or parallelism.
  */
object PcaOps {

  val Dims: Int = StatsOps.EmbedDims
  private val Tri = Dims * (Dims + 1) / 2 // upper-triangle cell count

  /** buffer = [n, sum_0..63, product HI words (Tri), product LO words
    * (Tri)] — the Σx·xᵀ cells are 128-bit two's-complement (hi, lo)
    * pairs. Products of e6 fixed-point values run ~1e12 per cell for
    * unit-magnitude components, so a 64-bit cell saturates around ~9e6
    * rows — a number a 100 TB embedding feed passes in one partition
    * batch. 128 bits push the ceiling past 10²⁰ rows at any magnitude
    * the e6 quantization itself survives. n and Σx stay 64-bit under
    * addExact (they saturate ~10¹² rows — loudly, not silently).
    */
  final case class Moments(buf: Array[Long])

  private val HiBase = 1 + Dims       // first product-hi slot
  private val LoBase = 1 + Dims + Tri // first product-lo slot

  /** acc(hiIdx, loIdx) += v, 128-bit two's complement: lo words add as
    * unsigned with carry-out `((lo & v) | ((lo | v) & ~nlo)) >>> 63`;
    * the hi word absorbs the carry plus v's sign extension.
    */
  @inline private def add128(b: Array[Long], hiIdx: Int, loIdx: Int, v: Long): Unit = {
    val lo = b(loIdx)
    val nlo = lo + v
    b(loIdx) = nlo
    b(hiIdx) += (v >> 63) + (((lo & v) | ((lo | v) & ~nlo)) >>> 63)
  }

  /** Exact value of a 128-bit (hi, lo) cell. */
  private def toBigInt(hi: Long, lo: Long): BigInt =
    (BigInt(hi) << 64) + (BigInt(lo) & ((BigInt(1) << 64) - 1))

  /** Exact Σx_i·x_j read-back for the (i, j) upper-triangle cell —
    * exposed for the overflow-regression spec.
    */
  private[graft] def productCell(m: Moments, i: Int, j: Int): BigInt = {
    val t = i * Dims - i * (i - 1) / 2 + (j - i)
    toBigInt(m.buf(HiBase + t), m.buf(LoBase + t))
  }

  final class MomentAggregator extends Aggregator[Seq[Float], Moments, Moments] {
    override def zero: Moments = Moments(new Array[Long](1 + Dims + 2 * Tri))
    override def reduce(m: Moments, v: Seq[Float]): Moments = {
      val x = new Array[Long](Dims)
      var i = 0
      while (i < Dims) {
        x(i) = math.floor(v(i).toDouble * 1e6 + 0.5).toLong
        i += 1
      }
      val b = m.buf
      b(0) += 1L
      i = 0
      var t = 0
      while (i < Dims) {
        b(1 + i) += x(i)
        var j = i
        while (j < Dims) {
          // The per-row product still must fit 64 bits (multiplyExact
          // throws at coordinate magnitudes ~3e9 fp = 3e3 raw — far
          // outside any sane embedding); the running SUM is 128-bit.
          add128(b, HiBase + t, LoBase + t, Math.multiplyExact(x(i), x(j)))
          t += 1
          j += 1
        }
        i += 1
      }
      m
    }
    override def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < HiBase) {
        a.buf(i) = Math.addExact(a.buf(i), b.buf(i)); i += 1
      }
      var t = 0
      while (t < Tri) {
        // 128+128 merge: unsigned lo add with carry into the hi sum.
        val lo = a.buf(LoBase + t)
        val vlo = b.buf(LoBase + t)
        val nlo = lo + vlo
        a.buf(LoBase + t) = nlo
        a.buf(HiBase + t) = a.buf(HiBase + t) + b.buf(HiBase + t) +
          (((lo & vlo) | ((lo | vlo) & ~nlo)) >>> 63)
        t += 1
      }
      a
    }
    override def finish(r: Moments): Moments = r
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Top-2 principal components: rows (component, dim, loading_e6,
    * eigenvalue_e12) — loadings of the unit eigenvector in e6, the
    * eigenvalue (variance along the component, in the e6-squared = e12
    * fixed-point unit of `embedding_dim_stats.var_fp2`).
    */
  def embeddingPca(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new MomentAggregator().toColumn
    val m = Tables.embeddings(s, dir)
      .select(col("embedding").cast("array<float>"))
      .as[Seq[Float]]
      .select(agg)
      .head()
    val n = m.buf(0).toDouble
    val mean = Array.tabulate(Dims)(i => m.buf(1 + i) / n)
    val cov = Array.ofDim[Double](Dims, Dims)
    for (i <- 0 until Dims; j <- i until Dims) {
      // Exact 128-bit Σx_i·x_j → double once, at the very end.
      val c = productCell(m, i, j).toDouble / n - mean(i) * mean(j)
      cov(i)(j) = c
      cov(j)(i) = c
    }

    def powerIter(deflate: Option[(Array[Double], Double)]): (Array[Double], Double) = {
      val a = Array.tabulate(Dims, Dims) { (i, j) =>
        deflate match {
          case Some((v, l)) => cov(i)(j) - l * v(i) * v(j)
          case None => cov(i)(j)
        }
      }
      var v = Array.fill(Dims)(1.0 / math.sqrt(Dims.toDouble))
      var lambda = 0.0
      // 500 rounds: this corpus's eigengap is near-flat (λ2/λ1 ≈ 0.93,
      // where the original 60 rounds left ~1% mixing and a visibly
      // rotated v2 after deflation); 0.93^500 ≈ 2e-16 is converged to
      // the double grid, and 500 64×64 matvecs are driver-trivial.
      for (_ <- 1 to 500) {
        val w = Array.tabulate(Dims)(i => {
          var s0 = 0.0
          var j = 0
          while (j < Dims) { s0 += a(i)(j) * v(j); j += 1 }
          s0
        })
        val norm = math.sqrt(w.map(x => x * x).sum)
        v = w.map(_ / norm)
        lambda = norm
      }
      // Canonical sign: first loading of magnitude > 1e-9 is positive.
      val k = v.indexWhere(x => math.abs(x) > 1e-9)
      if (k >= 0 && v(k) < 0) v = v.map(-_)
      (v, lambda)
    }
    val (v1, l1) = powerIter(None)
    val (v2, l2) = powerIter(Some((v1, l1)))

    val rows = Seq((1L, v1, l1), (2L, v2, l2)).flatMap { case (c, v, l) =>
      v.zipWithIndex.map { case (x, d) =>
        (c, d.toLong,
          math.floor(x * 1e6 + 0.5).toLong,
          math.floor(l + 0.5).toLong)
      }
    }
    rows.toDF("component", "dim", "loading_e6", "eigenvalue_e12")
      .orderBy("component", "dim")
  }

  // -------------------------------------------------------------------
  // Fixed-point twin: the `kmeans_lloyd` recipe applied to the 64×64
  // eigensolve, so the PCA family gets a hash-green oracle entry beside
  // the rows-only double-math `embedding_pca`.
  // -------------------------------------------------------------------

  /** Matrix-squaring count for the fixed-point twin: 12 squarings give
    * an effective power-iteration depth of 2¹² = 4096 rounds, so even a
    * near-flat spectrum (this synthetic corpus measures λ2/λ1 ≈ 0.93,
    * where 60 LINEAR rounds leave ~1% mixing) converges to the e6 grid:
    * 0.93^4096 ≈ 10⁻¹²⁹. Each squaring renormalizes to the e12 grid by
    * the exact max-|entry|, so magnitudes never leave HUGEINT range and
    * the per-squaring relative truncation is ~10⁻¹². If an iterate were
    * somehow still moving, both engines replay the identical squaring
    * count, so the hash compare holds regardless.
    */
  val FpSquarings = 12

  private val E6 = BigInt(1000000L)
  private val E12 = E6 * E6

  /** Exact integer sqrt via the SAME construction the DuckDB oracle
    * uses: floor(sqrt(toDouble)) then a ±2 correction window. For every
    * x in range (≤ ~1e30) the double estimate is within 2 of the true
    * root (relative sqrt error ~1e-16·root ≪ 1), so the corrected value
    * is the exact floor sqrt in BOTH engines.
    */
  private[graft] def isqrt(x: BigInt): BigInt = {
    val s0 = BigInt(math.floor(math.sqrt(x.toDouble)).toLong)
    if ((s0 + 2) * (s0 + 2) <= x) s0 + 2
    else if ((s0 + 1) * (s0 + 1) <= x) s0 + 1
    else if (s0 * s0 <= x) s0
    else if ((s0 - 1) * (s0 - 1) <= x) s0 - 1
    else s0 - 2
  }

  /** Normalize a matrix to the e12 grid by its exact max |entry|
    * (eigenvectors unchanged, magnitudes pinned ≤ 1e12).
    */
  private def rescaleE12(c: Array[Array[BigInt]]): Array[Array[BigInt]] = {
    val m = c.flatten.map(_.abs).max.max(BigInt(1))
    c.map(_.map(x => x * E12 / m))
  }

  /** One fixed-point dominant-eigenpair pass over an exact e12 matrix:
    * [[FpSquarings]] repeated squarings (each exact multiply → rescale
    * to the e12 grid by max |entry|), one matvec against the fixed
    * all-125000 start, truncate to e6, integer-sqrt normalize onto the
    * e6 unit sphere, then the Rayleigh quotient against the ORIGINAL
    * matrix. All-integer, truncation toward zero everywhere (BigInt `/`
    * == DuckDB `//`), so the DuckDB unrolled chain reproduces every
    * iterate bit-for-bit.
    */
  private def powerIterFp(a: Array[Array[BigInt]]): (Array[BigInt], BigInt) = {
    var b = rescaleE12(a)
    for (_ <- 1 to FpSquarings) {
      val c = Array.tabulate(Dims, Dims) { (i, j) =>
        var acc = BigInt(0)
        var l = 0
        while (l < Dims) { acc += b(i)(l) * b(l)(j); l += 1 }
        acc
      }
      b = rescaleE12(c)
    }
    val w = Array.tabulate(Dims) { i =>
      var acc = BigInt(0)
      var j = 0
      while (j < Dims) { acc += b(i)(j) * BigInt(125000L); j += 1 }
      acc
    }
    val u = w.map(_ / E6)
    val nrm = isqrt(u.map(x => x * x).sum).max(BigInt(1))
    val v = u.map(x => x * E6 / nrm)
    // Rayleigh quotient in the original matrix's e12 unit (sign-invariant).
    val vav = (for (i <- 0 until Dims; j <- 0 until Dims)
      yield v(i) * a(i)(j) * v(j)).sum
    val vv = v.map(x => x * x).sum.max(BigInt(1))
    (v, vav / vv)
  }

  /** Canonical sign: first nonzero loading positive (exact-integer form
    * of [[embeddingPca]]'s first-|x|>1e-9 rule).
    */
  private def canonical(v: Array[BigInt]): Array[BigInt] = {
    val k = v.indexWhere(_ != 0)
    if (k >= 0 && v(k) < 0) v.map(-_) else v
  }

  /** Top-2 principal components, ORACLE-GATED: the identical corpus
    * moment pass as [[embeddingPca]] (exact e6 integers), then a
    * fixed-round, fixed-point power iteration — truncated-integer
    * covariance `(n·P−S·Sᵀ)/n²`, e6-grid iterates, integer-sqrt
    * normalization, sign-invariant deflation `A−(λ·v·vᵀ)/1e12`,
    * canonical first-nonzero-positive output sign. Every operation is
    * exact integer arithmetic with truncation toward zero, so the
    * unrolled DuckDB chain in [[pcaFpOracleSql]] replays the solve
    * bit-identically — the `kmeans_lloyd` recipe applied to the
    * eigensolve.
    *
    * Scale shape: identical to [[embeddingPca]] — ONE corpus pass
    * (map-side-combined typed Aggregator, 4 KB buffer), then O(R·D²)
    * driver integer math on a 64×64 matrix, constant at any corpus
    * size.
    */
  def embeddingPcaFp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new MomentAggregator().toColumn
    val m = Tables.embeddings(s, dir)
      .select(col("embedding").cast("array<float>"))
      .as[Seq[Float]]
      .select(agg)
      .head()
    val n = BigInt(m.buf(0))
    val sVec = Array.tabulate(Dims)(i => BigInt(m.buf(1 + i)))
    val a = Array.tabulate(Dims, Dims) { (i, j) =>
      val p = if (i <= j) productCell(m, i, j) else productCell(m, j, i)
      (n * p - sVec(i) * sVec(j)) / (n * n)
    }
    val (v1r, l1) = powerIterFp(a)
    // Deflation uses the raw iterate: v·vᵀ is negation-invariant.
    val a2 = Array.tabulate(Dims, Dims) { (i, j) =>
      a(i)(j) - l1 * v1r(i) * v1r(j) / E12
    }
    val (v2r, l2) = powerIterFp(a2)
    val rows =
      Seq((1L, canonical(v1r), l1), (2L, canonical(v2r), l2)).flatMap {
        case (c, v, l) =>
          v.zipWithIndex.map { case (x, d) =>
            (c, d.toLong, x.toLong, l.toLong)
          }
      }
    rows.toDF("component", "dim", "loading_e6", "eigenvalue_e12")
      .orderBy("component", "dim")
  }

  /** DuckDB oracle for [[embeddingPcaFp]]: the e6 moment pass (the
    * `embedding_dim_stats` unnest idiom), truncated-integer covariance,
    * then per component an unrolled [[FpSquarings]]-squaring fixed-point
    * chain (4096-row matrix self-joins, exact max-|entry| rescale) —
    * every `//` sees the same truncation-toward-zero semantics as
    * BigInt division, HUGEINT intermediates throughout (worst-case
    * magnitude 6.4e37 < 2¹²⁷).
    */
  def pcaFpOracleSql(squarings: Int = FpSquarings): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH x AS MATERIALIZED (
         | SELECT vec_id, t.i - 1 AS i,
         |  CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS HUGEINT) AS xi
         | FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${Dims + 1})) AS i) t),
         |cnt AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
         |sv AS MATERIALIZED (SELECT i, sum(xi) AS si FROM x GROUP BY i),
         |mom AS MATERIALIZED (
         | SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS p
         | FROM x a JOIN x b USING (vec_id) GROUP BY a.i, b.i),
         |cov AS MATERIALIZED (
         | SELECT m.i, m.j, (n * p - sa.si * sb.si) // (n * n) AS a
         | FROM mom m JOIN sv sa ON m.i = sa.i JOIN sv sb ON m.j = sb.i
         | CROSS JOIN cnt)""".stripMargin)

    // Exact max-|entry| rescale of matrix CTE `src` onto the e12 grid.
    def rescale(out: String, src: String): String =
      s""",
         |${out}_m AS (SELECT greatest(max(abs(a)), CAST(1 AS HUGEINT)) AS m FROM $src),
         |$out AS MATERIALIZED (
         | SELECT i, j, (a * CAST(1000000000000 AS HUGEINT)) // m AS a
         | FROM $src CROSS JOIN ${out}_m)""".stripMargin

    // One component's chain over matrix CTE `mat`: rescale, `squarings`
    // exact squarings (each rescaled), matvec vs the all-125000 start,
    // e6 truncation, integer-sqrt normalization, Rayleigh vs `mat`.
    def chain(c: Int, mat: String): Unit = {
      sb.append(rescale(s"p${c}_b0", mat))
      for (r <- 1 to squarings) {
        sb.append(s""",
          |p${c}_c$r AS MATERIALIZED (
          | SELECT a.i AS i, b.j AS j, sum(a.a * b.a) AS a
          | FROM p${c}_b${r - 1} a JOIN p${c}_b${r - 1} b ON a.j = b.i
          | GROUP BY a.i, b.j)""".stripMargin)
        sb.append(rescale(s"p${c}_b$r", s"p${c}_c$r"))
      }
      sb.append(s""",
        |p${c}_u AS MATERIALIZED (
        | SELECT i, sum(a * CAST(125000 AS HUGEINT)) // 1000000 AS u
        | FROM p${c}_b$squarings GROUP BY i),
        |p${c}_n AS MATERIALIZED (
        | SELECT greatest(
        |  (CASE WHEN (s0+2)*(s0+2) <= ss THEN s0+2
        |        WHEN (s0+1)*(s0+1) <= ss THEN s0+1
        |        WHEN s0*s0 <= ss THEN s0
        |        WHEN (s0-1)*(s0-1) <= ss THEN s0-1
        |        ELSE s0-2 END), CAST(1 AS HUGEINT)) AS nrm
        | FROM (SELECT ss, CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS HUGEINT) AS s0
        |       FROM (SELECT sum(u*u) AS ss FROM p${c}_u))),
        |p${c}_v AS MATERIALIZED (
        | SELECT i, (u * 1000000) // nrm AS val FROM p${c}_u CROSS JOIN p${c}_n),
        |p${c}_lam AS MATERIALIZED (
        | SELECT (SELECT sum(vi.val * m.a * vj.val)
        |         FROM $mat m JOIN p${c}_v vi ON m.i = vi.i
        |          JOIN p${c}_v vj ON m.j = vj.i)
        |  // greatest((SELECT sum(val*val) FROM p${c}_v), CAST(1 AS HUGEINT)) AS lam)""".stripMargin)
    }

    chain(1, "cov")
    sb.append(s""",
      |cov2 AS MATERIALIZED (
      | SELECT c.i, c.j, c.a - (lam * vi.val * vj.val) // CAST(1000000000000 AS HUGEINT) AS a
      | FROM cov c JOIN p1_v vi ON c.i = vi.i
      |  JOIN p1_v vj ON c.j = vj.i CROSS JOIN p1_lam)""".stripMargin)
    chain(2, "cov2")
    // Canonical sign per component (first nonzero loading positive),
    // then the output frame.
    sb.append(s""",
      |sg1 AS (SELECT coalesce((SELECT CASE WHEN val < 0 THEN -1 ELSE 1 END
      |  FROM p1_v WHERE val <> 0 ORDER BY i LIMIT 1), 1) AS sg),
      |sg2 AS (SELECT coalesce((SELECT CASE WHEN val < 0 THEN -1 ELSE 1 END
      |  FROM p2_v WHERE val <> 0 ORDER BY i LIMIT 1), 1) AS sg)
      |SELECT component, dim, loading_e6, eigenvalue_e12 FROM (
      | SELECT CAST(1 AS BIGINT) AS component, CAST(v.i AS BIGINT) AS dim,
      |  CAST(v.val * sg AS BIGINT) AS loading_e6,
      |  CAST((SELECT lam FROM p1_lam) AS BIGINT) AS eigenvalue_e12
      | FROM p1_v v CROSS JOIN sg1
      | UNION ALL
      | SELECT CAST(2 AS BIGINT) AS component, CAST(v.i AS BIGINT) AS dim,
      |  CAST(v.val * sg AS BIGINT) AS loading_e6,
      |  CAST((SELECT lam FROM p2_lam) AS BIGINT) AS eigenvalue_e12
      | FROM p2_v v CROSS JOIN sg2)
      |ORDER BY component, dim""".stripMargin)
    sb.toString
  }

  /** Embedding whitening / axis-alignment audit — the covariance
    * STRUCTURE readout the code-budget decisions key on
    * (`embedding_dim_stats` reads per-dim variance, `embedding_pca` the
    * top directions; this prices how far the space is from axis-aligned,
    * which is what PQ subspace splits and SQ8 per-vector scales assume):
    * from the same one-pass exact e6 moment accumulation, the fp2-grid
    * covariance cells `a_ij = (n·P_ij − S_i·S_j) div n²` (truncating - BigInt `/`, Spark `div`, DuckDB `//` all truncate toward zero; measured (-7)//2 = -3), rolled to
    * exact-integer summary stats — trace, the off-diagonal |mass| and
    * its ppm share of trace, the worst off-diagonal cell (|a| desc,
    * (i, j) asc), and the diagonal max/min. All integers: the audit
    * hash-gates where the eigensolve itself needed the fixed-point twin.
    *
    * Scale shape: identical to [[embeddingPca]] — one corpus pass into a
    * 4 KB buffer, then a driver-side 64×64 fold.
    */
  def embeddingWhiteningAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new MomentAggregator().toColumn
    val m = Tables.embeddings(s, dir)
      .select(col("embedding").cast("array<float>"))
      .as[Seq[Float]]
      .select(agg)
      .head()
    val n = BigInt(m.buf(0))
    val nn = n * n
    val sums = Array.tabulate(Dims)(i => BigInt(m.buf(1 + i)))
    val a = Array.ofDim[BigInt](Dims, Dims)
    for (i <- 0 until Dims; j <- i until Dims) {
      val cell = (n * productCell(m, i, j) - sums(i) * sums(j)) / nn
      a(i)(j) = cell
      a(j)(i) = cell
    }
    val trace = (0 until Dims).map(i => a(i)(i)).sum
    val offPairs = for (i <- 0 until Dims; j <- (i + 1) until Dims)
      yield (i, j, a(i)(j))
    val offAbs = offPairs.map(_._3.abs).sum
    val worst = offPairs.maxBy { case (i, j, v) => (v.abs, -i, -j) }
    val diag = (0 until Dims).map(i => a(i)(i))
    val rows = Seq(
      ("diag_max_fp2", diag.max.toLong),
      ("diag_min_fp2", diag.min.toLong),
      ("max_offdiag_abs_fp2", worst._3.abs.toLong),
      ("max_offdiag_i", worst._1.toLong),
      ("max_offdiag_j", worst._2.toLong),
      ("offdiag_abs_fp2", offAbs.toLong),
      ("offdiag_trace_ppm", (offAbs * 1000000 / trace).toLong),
      ("trace_fp2", trace.toLong))
    rows.toDF("stat", "value").orderBy("stat")
  }

  /** DuckDB oracle for [[embeddingWhiteningAudit]]: the [[pcaFpOracleSql]]
    * moment/cov CTEs, rolled to the identical summary stats.
    */
  def whiteningOracleSql(): String =
    s"""WITH x AS MATERIALIZED (
       | SELECT vec_id, t.i - 1 AS i,
       |  CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS HUGEINT) AS xi
       | FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${Dims + 1})) AS i) t),
       |cnt AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
       |sv AS MATERIALIZED (SELECT i, sum(xi) AS si FROM x GROUP BY i),
       |mom AS MATERIALIZED (
       | SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS p
       | FROM x a JOIN x b USING (vec_id) WHERE a.i <= b.i GROUP BY a.i, b.i),
       |cov AS MATERIALIZED (
       | SELECT m.i, m.j, (n * p - sa.si * sb.si) // (n * n) AS a
       | FROM mom m JOIN sv sa ON m.i = sa.i JOIN sv sb ON m.j = sb.i
       | CROSS JOIN cnt),
       |tr AS (SELECT sum(a) AS trace FROM cov WHERE i = j),
       |od AS (SELECT sum(abs(a)) AS oabs FROM cov WHERE i < j),
       |wr AS (
       | SELECT i, j, abs(a) AS w FROM cov WHERE i < j
       | ORDER BY abs(a) DESC, i, j LIMIT 1),
       |dg AS (SELECT max(a) AS dmax, min(a) AS dmin FROM cov WHERE i = j)
       |SELECT stat, value FROM (
       | SELECT 'diag_max_fp2' AS stat, CAST(dmax AS BIGINT) AS value FROM dg
       | UNION ALL SELECT 'diag_min_fp2', CAST(dmin AS BIGINT) FROM dg
       | UNION ALL SELECT 'max_offdiag_abs_fp2', CAST(w AS BIGINT) FROM wr
       | UNION ALL SELECT 'max_offdiag_i', CAST(i AS BIGINT) FROM wr
       | UNION ALL SELECT 'max_offdiag_j', CAST(j AS BIGINT) FROM wr
       | UNION ALL SELECT 'offdiag_abs_fp2', CAST(oabs AS BIGINT) FROM od
       | UNION ALL SELECT 'offdiag_trace_ppm',
       |  CAST((oabs * 1000000) // trace AS BIGINT) FROM od CROSS JOIN tr
       | UNION ALL SELECT 'trace_fp2', CAST(trace AS BIGINT) FROM tr)
       |ORDER BY stat""".stripMargin
}
