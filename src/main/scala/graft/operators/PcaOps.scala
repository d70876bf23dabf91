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
  * Power iteration (60 rounds, fixed all-ones start, one deflation for
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
      for (_ <- 1 to 60) {
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
}
