package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All L sign-random-projection LSH bucket keys of an array<double>
  * vector in one native pass: `array<struct<t:int, bkt:long>>`, table
  * t's bucket = Σ_{p : v·plane(t,p) > 0} 2^p — the exact contract of
  * the per-(table, plane) column formulation it replaces
  * ([[graft.ext.SimilaritySearch.bucketKeys]]).
  *
  * Why native: the column form built `tables × bits` separate
  * dot-product expressions, each against an `array()` of `dim` literal
  * doubles — 8 192 literal nodes at the q27/q45 defaults — so every
  * LSH index call paid analyzer/optimizer/codegen time proportional to
  * tables·bits·dim (measured: the lshTopK leg cost ~2× the ivfTopK leg
  * at sf0.1 with the arithmetic being trivial). This expression is ONE
  * node whose plane matrix rides as constructor values, and the eval
  * is a primitive loop — same shape-constant-plan rule as
  * [[NearestCellsExpr]] / the [[graft.ext.CentroidAssign]] value-
  * literal contract.
  *
  * Codegen: [[doGenCode]] emits the same primitive loop into
  * whole-stage codegen, with the plane matrix as a reference object
  * (r17 verdict item — the fallback put an interpreted expression on
  * the per-row hot path of every LSH index build). The interpreted
  * [[eval]] remains the reference twin; SimilaritySearchSpec pins the
  * two paths equal.
  *
  * Bit-exactness (persisted-model contract — buckets must not move):
  * the dot accumulates in index order over the common prefix exactly
  * like [[DotProductExpr]], the sign test is `dp > 0`, and the bit sum
  * Σ 2^p equals the column form's `when(dp > 0, 1L<<p).otherwise(0)`
  * sum. Null semantics replayed exactly: a null vector made every
  * per-plane dot null, the `when` fell through to 0, and the struct
  * array itself was non-null — so null input yields (t, 0L) for every
  * table, NOT null.
  */
case class SignBucketsExpr(
    child: Expression,
    planes: IndexedSeq[IndexedSeq[Double]],
    tables: Int,
    bits: Int)
  extends UnaryExpression {

  require(planes.length == tables * bits,
    s"planes must be tables*bits rows, got ${planes.length}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", IntegerType, nullable = false),
    StructField("bkt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_buckets expects array<double>, got ${t.simpleString(10)}")
  }

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  private def rows(bkt: Int => Long): GenericArrayData = {
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) { out(t) = InternalRow(t, bkt(t)); t += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) rows(_ => 0L)
    else {
      val x = v.asInstanceOf[ArrayData]
      val xn = x.numElements()
      rows { t =>
        var bkt = 0L
        var p = 0
        while (p < bits) {
          val plane = planeArr(t * bits + p)
          val n = math.min(xn, plane.length)
          var acc = 0.0
          var i = 0
          while (i < n) { acc += x.getDouble(i) * plane(i); i += 1 }
          if (acc > 0) bkt += (1L << p)
          p += 1
        }
        bkt
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the plane matrix rides as ONE reference object — never as
    // generated source, so the compiled class is shape-constant and
    // codegen-cache-hit across plane values (the value-literal rule)
    val planesRef = ctx.addReferenceObj("graftSignPlanes", planeArr,
      "double[][]")
    val c = child.genCode(ctx)
    val out = ctx.freshName("sbOut")
    val t = ctx.freshName("sbT")
    val p = ctx.freshName("sbP")
    val i = ctx.freshName("sbI")
    val n = ctx.freshName("sbN")
    val acc = ctx.freshName("sbAcc")
    val bkt = ctx.freshName("sbBkt")
    val plane = ctx.freshName("sbPlane")
    val xn = ctx.freshName("sbXn")
    val rowCls = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
    val arrCls = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    ev.copy(code = code"""
      ${c.code}
      Object[] $out = new Object[$tables];
      if (${c.isNull}) {
        for (int $t = 0; $t < $tables; $t++) {
          $out[$t] = new $rowCls(new Object[] {
            java.lang.Integer.valueOf($t), java.lang.Long.valueOf(0L) });
        }
      } else {
        final int $xn = ${c.value}.numElements();
        for (int $t = 0; $t < $tables; $t++) {
          long $bkt = 0L;
          for (int $p = 0; $p < $bits; $p++) {
            final double[] $plane = $planesRef[$t * $bits + $p];
            final int $n = java.lang.Math.min($xn, $plane.length);
            double $acc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $acc += ${c.value}.getDouble($i) * $plane[$i];
            }
            if ($acc > 0) $bkt += (1L << $p);
          }
          $out[$t] = new $rowCls(new Object[] {
            java.lang.Integer.valueOf($t), java.lang.Long.valueOf($bkt) });
        }
      }
      final $arrCls ${ev.value} = new $arrCls($out);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
