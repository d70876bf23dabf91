package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** PQ sub-space encoding as ONE whole-stage-codegen expression:
  * `pq_codes(qv, cb, subDim)` returns, for each sub-space m of the
  * quantized vector `qv` (array<bigint>, length M·subDim), the argmin
  * codebook index j over `cb` (array<array<bigint>>, K entries of the
  * same length) of the integer L2² between sub-vectors m — lowest j on
  * ties, exactly the `transform/aggregate` HOF fold it replaces.
  *
  * Why an expression (guide §4 / the [[FloatVecDot]] precedent): the HOF
  * form is interpreted — per row it allocates 2·M·K slice arrays and
  * boxes every element, which measured ~0.8 ms/row; this fused loop is
  * M·K·subDim primitive long ops inside codegen, with the codebook
  * arriving as a foldable literal (a plan constant, evaluated once).
  * Byte-identical codes (PqSpec pins the equivalence against the old
  * construction).
  */
case class PqCodes(vec: Expression, cb: Expression, subDim: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cb

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cb.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _))
          if subDim > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_codes requires array<bigint>, array<array<bigint>> and a positive subDim, got ${l.sql}, ${r.sql}, $subDim")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cbs = b.asInstanceOf[ArrayData]
    val k = cbs.numElements()
    val m = x.numElements() / subDim
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var bestD = Long.MaxValue
      var bestJ = -1
      var j = 0
      while (j < k) {
        val cv = cbs.getArray(j)
        var d = 0L
        var i = mm * subDim
        val end = i + subDim
        while (i < end) {
          val diff = x.getLong(i) - cv.getLong(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      out(mm) = bestJ
      mm += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val adCls = classOf[ArrayData].getName
      val gadCls = classOf[GenericArrayData].getName
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val mm = ctx.freshName("mm")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ")
      val cv = ctx.freshName("cv")
      s"""
         |int $k = $b.numElements();
         |int $m = $a.numElements() / $subDim;
         |int[] $out = new int[$m];
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  long $bestD = Long.MAX_VALUE;
         |  int $bestJ = -1;
         |  for (int $j = 0; $j < $k; $j++) {
         |    $adCls $cv = $b.getArray($j);
         |    long $d = 0L;
         |    int $i = $mm * $subDim;
         |    int $end = $i + $subDim;
         |    for (; $i < $end; $i++) {
         |      long $diff = $a.getLong($i) - $cv.getLong($i);
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestJ = $j; }
         |  }
         |  $out[$mm] = $bestJ;
         |}
         |${ev.value} = new $gadCls($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(vec = newLeft, cb = newRight)
}

/** ADC lookup sum as one codegen expression: `pq_adist(dtab, codes)` =
  * Σ_m dtab[m][codes[m]] over the M sub-spaces — the integer asymmetric
  * distance of a PQ-coded candidate against a query's distance table,
  * replacing the interpreted `aggregate(sequence(...), element_at(...))`
  * fold on every scored candidate row.
  */
case class PqAdist(dtab: Expression, codes: Expression)
    extends BinaryExpression {

  override def left: Expression = dtab
  override def right: Expression = codes

  override def checkInputDataTypes(): TypeCheckResult =
    (dtab.dataType, codes.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_adist requires array<array<bigint>> and array<int>, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val tabs = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val m = tabs.numElements()
    var s = 0L
    var i = 0
    while (i < m) {
      s += tabs.getArray(i).getLong(cs.getInt(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $m = $a.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $a.getArray($i).getLong($b.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdist =
    copy(dtab = newLeft, codes = newRight)
}
