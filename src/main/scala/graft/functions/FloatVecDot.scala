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
  import org.apache.spark.sql.functions.call_function

  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}

/** Session extension registering the engine's native functions; installed
  * via `spark.sql.extensions=graft.functions.GraftExtensions`, so plain
  * SQL (`SELECT vec_dot(a, b)`) and `call_function("vec_dot", ...)` both
  * resolve without touching internal APIs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
        (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
  }
}
