package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native unit-normalization of a vector column: array<float|double> →
  * array<double> scaled to L2 norm 1; null when the input is null, the
  * norm is zero (a zero vector has no direction), OR any element is
  * null — all matching the HOF form `when(norm > 0, transform(v, _ /
  * norm))`: a null element nulls the aggregate-sum norm, the null
  * comparison falls through the missing `otherwise`, and the result is
  * null. Both eval paths implement the element-null rule identically
  * (interpreted GenericArrayData would NPE, codegen UnsafeArrayData
  * would silently read 0.0 — either divergence would break the
  * bit-identical-to-HOF contract NormalizeExprSpec pins).
  *
  * Fuses the three-step HOF head (cast-to-double transform, norm
  * aggregate, scale transform) of every similarity pipeline into one
  * primitive loop that participates in whole-stage codegen — the HOF
  * form allocates two intermediate arrays and boxes every element
  * through the lambda interpreter, per row.
  */
case class NormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_normalize"
  override def nullable: Boolean = true // zero vectors → null

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize expects array<float> or array<double>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) {
      if (x.isNullAt(i)) hasNull = true
      else {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        ss += v * v
      }
      i += 1
    }
    if (hasNull || ss <= 0.0) null
    else {
      val norm = math.sqrt(ss)
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = v / norm
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      val hasNull = ctx.freshName("hasNull")
      val get = (idx: String) =>
        if (isFloat) s"(double) $a.getFloat($idx)" else s"$a.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |double $ss = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; break; }
         |  double $v = ${get(i)};
         |  $ss += $v * $v;
         |}
         |if ($hasNull || $ss <= 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $nrm = java.lang.Math.sqrt($ss);
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = ${get(i)} / $nrm;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
