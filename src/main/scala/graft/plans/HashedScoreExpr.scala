package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Mean-pooled hashed-feature score: Σ weights[f] / n over an
  * array<int> of hashed gram ids against an array<double> weight
  * vector (0-based indexing; empty feature array → 0.0).
  *
  * This is [[graft.ext.HashedClassifier]]'s scoring kernel — the
  * 100 TB corpus-filter path. The higher-order-function form
  * (`aggregate(feats, 0.0, (acc, f) -> acc + element_at(w, f+1))`)
  * is CodegenFallback: every document pays a boxed lambda interpreter
  * walk per gram, and the projection drops out of whole-stage
  * codegen. This expression is one primitive loop over the unsafe
  * array data and participates in WSCG (spec-pinned), with the
  * weight vector arriving as ONE typed-literal value (the
  * CentroidAssign rule — retraining never changes generated source).
  *
  * Semantics matched to the HOF twin bit-for-bit on the classifier's
  * inputs (spec-pinned equivalence): left-to-right accumulation in
  * feature order, division by the FEATURE count last. Defensive
  * difference on inputs the classifier never produces: an id outside
  * [0, |weights|) contributes 0 (the HOF's element_at would return
  * null and poison the sum); ids are pmod-bounded at featurize time,
  * so the arm is unreachable in practice.
  */
case class HashedScoreExpr(features: Expression, weights: Expression)
    extends BinaryExpression {

  override def left: Expression = features
  override def right: Expression = weights
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hashed_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (features.dataType, weights.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hashed_score expects (array<int>, array<double>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(f: Any, w: Any): Any = {
    val feats = f.asInstanceOf[ArrayData]
    val wts = w.asInstanceOf[ArrayData]
    val n = feats.numElements()
    if (n == 0) 0.0
    else {
      val dim = wts.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        val id = feats.getInt(i)
        if (id >= 0 && id < dim) acc += wts.getDouble(id)
        i += 1
      }
      acc / n
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, w) => {
      val n = ctx.freshName("n")
      val dim = ctx.freshName("dim")
      val i = ctx.freshName("i")
      val id = ctx.freshName("id")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $f.numElements();
         |if ($n == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  int $dim = $w.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    int $id = $f.getInt($i);
         |    if ($id >= 0 && $id < $dim) $acc += $w.getDouble($id);
         |  }
         |  ${ev.value} = $acc / $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(features = newLeft, weights = newRight)
}
