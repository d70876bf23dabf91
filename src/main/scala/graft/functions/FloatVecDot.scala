package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two `array<float>` columns, accumulated in
  * doubles in index order.
  *
  * This is the (b)-tier extension point from the design brief: a custom
  * Catalyst `Expression` with `doGenCode`, preferred over a Scala UDF
  * because it stays inside whole-stage codegen (no boxing, no
  * serialization) and over `zip_with`+`aggregate` because it fuses the
  * multiply-add loop without materializing the intermediate product
  * array. Accumulation order matches the sequential `aggregate` fold, so
  * swapping one for the other is bit-exact.
  *
  * Shorter input wins on length mismatch (like `zip_with` stopping at the
  * zipped prefix); null array → null; null elements are not expected
  * (embeddings are dense) and read as 0.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<float> arguments, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): FloatVecDot = copy(left = newLeft, right = newRight)
}

/** Scala-facing wrappers for the engine's native expressions, in the style
  * of `org.apache.spark.sql.functions`. Resolution goes through the
  * session's function registry, so the session must be built with
  * [[GraftExtensions]] installed (graft.GraftSession does this).
  */
object GraftFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{call_function, lit}

  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def poly_hash(s: Column, base: Int, mod: Long): Column =
    call_function("poly_hash", s, lit(base), lit(mod))

  def simhash_pack(hashes: Column, bits: Int, outOffset: Int): Column =
    call_function("simhash_pack", hashes, lit(bits), lit(outOffset))

  def vec_simhash(vec: Column, bits: Int): Column =
    call_function("vec_simhash", vec, lit(bits))

  def minhash_sig(shingles: Column, numHashes: Int): Column =
    call_function("minhash_sig", shingles, lit(numHashes))

  def cdc_cuts(
      payload: Column, window: Int, base: Long, mod: Long,
      divisor: Long): Column =
    call_function(
      "cdc_cuts", payload, lit(window), lit(base), lit(mod), lit(divisor))

  def pq_codes(qv: Column, cb: Column, subDim: Int): Column =
    call_function("pq_codes", qv, cb, lit(subDim))

  def pq_adist(dtab: Column, codes: Column): Column =
    call_function("pq_adist", dtab, codes)
}

/** Session extension registering the engine's native functions; installed
  * via `spark.sql.extensions=graft.functions.GraftExtensions`, so plain
  * SQL (`SELECT vec_dot(a, b)`) and `call_function("vec_dot", ...)` both
  * resolve without touching internal APIs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** Compile-time-constant argument: these expressions specialize their
    * generated loop on it, so it must be a literal integer in the call.
    */
  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(
        s"$name must be an integer literal, got ${other.sql}")
  }

  private def longArg(name: String, e: Expression): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other =>
      throw new IllegalArgumentException(
        s"$name must be an integer literal, got ${other.sql}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
        (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
    ext.injectFunction(
      (
        FunctionIdentifier("poly_hash"),
        new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
        (children: Seq[Expression]) =>
          PolyHash(
            children(0),
            intArg("poly_hash base", children(1)),
            longArg("poly_hash mod", children(2)))))
    ext.injectFunction(
      (
        FunctionIdentifier("simhash_pack"),
        new ExpressionInfo(classOf[SimHashPack].getName, "simhash_pack"),
        (children: Seq[Expression]) =>
          SimHashPack(
            children(0),
            intArg("simhash_pack bits", children(1)),
            intArg("simhash_pack outOffset", children(2)))))
    ext.injectFunction(
      (
        FunctionIdentifier("vec_simhash"),
        new ExpressionInfo(classOf[VecSimHash].getName, "vec_simhash"),
        (children: Seq[Expression]) =>
          VecSimHash(children(0), intArg("vec_simhash bits", children(1)))))
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (children: Seq[Expression]) =>
          MinHashSig(children(0), intArg("minhash_sig numHashes", children(1)))))
    ext.injectFunction(
      (
        FunctionIdentifier("cdc_cuts"),
        new ExpressionInfo(classOf[CdcCuts].getName, "cdc_cuts"),
        (children: Seq[Expression]) =>
          CdcCuts(
            children(0),
            intArg("cdc_cuts window", children(1)),
            longArg("cdc_cuts base", children(2)),
            longArg("cdc_cuts mod", children(3)),
            longArg("cdc_cuts divisor", children(4)))))
    ext.injectFunction(
      (
        FunctionIdentifier("pq_codes"),
        new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
        (children: Seq[Expression]) =>
          PqCodes(
            children(0), children(1),
            intArg("pq_codes subDim", children(2)))))
    ext.injectFunction(
      (
        FunctionIdentifier("pq_adist"),
        new ExpressionInfo(classOf[PqAdist].getName, "pq_adist"),
        (children: Seq[Expression]) => PqAdist(children(0), children(1))))
  }
}
