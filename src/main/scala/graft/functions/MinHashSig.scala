package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `numHashes`-element MinHash signature over an `array<string>` shingle
  * set, in a single pass: each shingle is hashed once with XXH64 (seed
  * 42), then `numHashes` affine transforms `a_j*h + b_j` (odd `a_j`,
  * wrapping 2^64 arithmetic — each a bijection on the ring, so the
  * per-row minima are as independent as distinct hash functions for LSH
  * purposes) update running minima.
  *
  * Replaces `numHashes` separate `transform`+`array_min` passes whose
  * per-element lambdas are interpreted (no codegen inside higher-order
  * functions) — at sf0.1 that was 96M interpreted expression evals and
  * most of `dedup_minhash`'s bench time. Signature semantics are
  * Spark-side only (candidates are verified with exact Jaccard; the
  * oracle never sees signatures), so the family change from 64 seeded
  * hashes is behavior-neutral: the banding miss probability at the 0.6
  * Jaccard threshold stays (1-0.6^2)^32 ≈ 6e-7.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 512,
    s"minhash_sig needs 1..512 hashes (got $numHashes)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an array<string> argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val coeffA: Array[Long] =
    Array.tabulate(numHashes)(j => MinHashSig.mix(j.toLong * 2 + 1) | 1L)
  @transient private lazy val coeffB: Array[Long] =
    Array.tabulate(numHashes)(j => MinHashSig.mix(j.toLong * 2 + 2))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var j = 0
      while (j < numHashes) {
        val v = coeffA(j) * h + coeffB(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffB, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u = ctx.freshName("u")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $in.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $u = $in.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |    .hashUnsafeBytes($u.getBaseObject(), $u.getBaseOffset(), $u.numBytes(), 42L);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = $aRef[$j] * $h + $bRef[$j];
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** SplitMix64 finalizer — a deterministic, well-mixed constant
    * generator for the affine coefficients (public-domain mixer; no RNG
    * state, same constants on every executor and every run).
    */
  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
