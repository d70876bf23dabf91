package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode code points:
  * `acc = (acc * base + codePoint) % mod`, left to right, in BIGINTs.
  *
  * The (c)-tier replacement for the previous declarative form
  * (`aggregate(regexp_extract_all(s, "."), ...)`) which materialized a
  * one-char-string array per value and evaluated an interpreted lambda per
  * character — the dominant cost of `doc_fingerprint` and `dedup_simhash`
  * at sf0.1. This is one fused JIT loop per value, bit-identical to the
  * DuckDB oracle's `list_reduce(list_transform(string_split(t,''),
  * c -> unicode(c)), (acc, x) -> (acc * base + x) % mod)`.
  *
  * `base`/`mod` must keep every step inside a positive signed 64-bit range
  * (`mod * base + 0x10FFFF < 2^63`), so `%` agrees across engines.
  */
case class PolyHash(child: Expression, base: Int, mod: Long)
    extends UnaryExpression {
  require(mod > 0 && base > 0 && mod <= (Long.MaxValue - 0x10FFFF) / base,
    s"poly_hash step must not overflow a signed 64-bit long (base=$base mod=$mod)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $in.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * ${base}L + $cp) % ${mod}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** SimHash bit packing over an `array<bigint>` of element hashes: for each
  * bit position `j < bits`, sum ±1 according to bit `j` of every element;
  * output bit `j + outOffset` is set iff the sum is >= 0.
  *
  * Fuses what was previously `bits` separate interpreted `aggregate`
  * lambdas per row (the other half of `dedup_simhash`'s cost) into one
  * two-level JIT loop. Identical tie rule (sum >= 0 → 1) to the DuckDB
  * oracle's unrolled `CASE WHEN list_sum(...) >= 0` terms.
  */
case class SimHashPack(child: Expression, bits: Int, outOffset: Int)
    extends UnaryExpression {
  require(bits > 0 && outOffset >= 0 && bits + outOffset <= 63,
    s"simhash_pack needs bits + outOffset <= 63 (got $bits + $outOffset)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_pack requires an array<bigint> argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var code = 0L
    var j = 0
    while (j < bits) {
      var sum = 0L
      var h = 0
      while (h < n) {
        sum += ((arr.getLong(h) >> j) & 1L) * 2L - 1L
        h += 1
      }
      if (sum >= 0L) code |= 1L << (j + outOffset)
      j += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sum = ctx.freshName("sum")
      val code = ctx.freshName("code")
      s"""
         |int $n = $in.numElements();
         |long $code = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  long $sum = 0L;
         |  for (int $h = 0; $h < $n; $h++) {
         |    $sum += (($in.getLong($h) >> $j) & 1L) * 2L - 1L;
         |  }
         |  if ($sum >= 0L) $code |= 1L << ($j + $outOffset);
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

/** Random-hyperplane (SimHash) bucket code over an `array<float>`
  * embedding, entirely in fixed-point integers so the sign of every
  * projection is bit-exact in any engine:
  *
  *  - component quantization: `q_d = floor(x_d * 2^20)` (float→double is
  *    exact; floor is deterministic);
  *  - hyperplane weight: `w(h,d) = ((h*1000003 + d + 1) * 2654435761)
  *    % 2000003 - 1000001` — a Knuth multiplicative hash; all operands
  *    stay positive before the final subtraction, so `%` (remainder)
  *    agrees between Java, Spark and DuckDB;
  *  - bit `h` of the code is set iff `Σ_d q_d * w(h,d) >= 0`.
  *
  * No overflow for |x| <= 2^11 at 64 dims (|q*w| < 2^41, summed over 64
  * terms < 2^47). Replaces `bits` interpreted `zip_with`+`aggregate`
  * passes per row with one fused JIT loop — the cost that made
  * `dedup_embed` the second-slowest query of the r4 bench.
  */
case class VecSimHash(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 63, s"vec_simhash needs 1..63 bits (got $bits)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_simhash requires an array<float> argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var code = 0L
    var h = 0
    while (h < bits) {
      var proj = 0L
      var d = 0
      while (d < n) {
        val q = math.floor(vec.getFloat(d).toDouble * 1048576.0).toLong
        val w = ((h * 1000003L + d + 1L) * 2654435761L) % 2000003L - 1000001L
        proj += q * w
        d += 1
      }
      if (proj >= 0L) code |= 1L << h
      h += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val d = ctx.freshName("d")
      val q = ctx.freshName("q")
      val w = ctx.freshName("w")
      val proj = ctx.freshName("proj")
      val code = ctx.freshName("code")
      s"""
         |int $n = $in.numElements();
         |long $code = 0L;
         |for (int $h = 0; $h < $bits; $h++) {
         |  long $proj = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $q = (long) Math.floor((double) $in.getFloat($d) * 1048576.0);
         |    long $w = (($h * 1000003L + $d + 1L) * 2654435761L) % 2000003L - 1000001L;
         |    $proj += $q * $w;
         |  }
         |  if ($proj >= 0L) $code |= 1L << $h;
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecSimHash =
    copy(child = newChild)
}

/** Content-defined cut positions over a binary payload — the native core
  * of the FastCDC-style media chunker ([[graft.operators.MultimodalOps]]):
  * emits the ascending cut array `[0, b1, b2, ..., len]` where position i
  * (1-based) is a boundary iff the trailing `window`-byte polynomial hash
  * `Σ_j base^j · byte(i−j) mod mod` is ≡ 0 mod `divisor`.
  *
  * One fused O(window·len) JIT loop per row. This replaced the
  * declarative `transform(sequence(...), i -> ascii(substr(text, i, 1)))`
  * form, whose per-position `substr` is an O(i) char-boundary scan on
  * UTF8String — O(len²) per document, measured 14 s at sf0.1 / 138 s at
  * sf1 for the whole query vs ~1 s with this expression. The boundary
  * predicate is a pure content condition (no min/max clamps), so the
  * DuckDB oracle replays it bit-for-bit from the ASCII text column with
  * `unicode()` byte values.
  */
case class CdcCuts(
    child: Expression, window: Int, base: Long, mod: Long, divisor: Long)
    extends UnaryExpression {
  require(window >= 1 && window <= 64, "cdc_cuts window must be in [1, 64]")
  require(mod > 0 && base > 0 && divisor > 0 &&
    mod <= Long.MaxValue / 255 / window,
    "cdc_cuts polynomial step must not overflow a signed 64-bit long")

  private val coefs: Array[Long] =
    Iterator.iterate(1L)(c => c * base % mod).take(window).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val len = b.length
    val cuts = scala.collection.mutable.ArrayBuffer[Long](0L)
    var i = window
    while (i <= len) {
      var h = 0L
      var j = 0
      while (j < window) { h += coefs(j) * (b(i - 1 - j) & 0xff); j += 1 }
      if (h % mod % divisor == 0L && i != len) cuts += i.toLong
      i += 1
    }
    if (len >= 1) cuts += len.toLong
    new org.apache.spark.sql.catalyst.util.GenericArrayData(cuts.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val b = ctx.freshName("b")
      val len = ctx.freshName("len")
      val lst = ctx.freshName("lst")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val arr = ctx.freshName("arr")
      val k = ctx.freshName("k")
      val poly = coefs.zipWithIndex
        .map { case (c, j) => s"${c}L * (($b[$i - ${j + 1}]) & 0xff)" }
        .mkString(" + ")
      s"""
         |byte[] $b = $in;
         |int $len = $b.length;
         |java.util.ArrayList<Long> $lst = new java.util.ArrayList<Long>();
         |$lst.add(0L);
         |for (int $i = $window; $i <= $len; $i++) {
         |  long $h = ($poly) % ${mod}L;
         |  if ($h % ${divisor}L == 0L && $i != $len) $lst.add((long) $i);
         |}
         |if ($len >= 1) $lst.add((long) $len);
         |long[] $arr = new long[$lst.size()];
         |for (int $k = 0; $k < $arr.length; $k++)
         |  $arr[$k] = ((Long) $lst.get($k)).longValue();
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}
