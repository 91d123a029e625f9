package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JsonExtract

/** F8 as a native Catalyst expression with whole-stage codegen
  * (SURVEY §2.11: "UDF first, optionally promote to a Catalyst
  * `Expression` with `doGenCode`") — unlike the UDF form, this
  * participates in codegen (no Row ↔ Scala serialization per value,
  * no optimizer fence around the call), so scrape-payload parsing can
  * sit inside the same WholeStageCodegen span as the surrounding
  * projections and filters.
  *
  * Semantics identical to [[JsonExtract.extractBalancedJson]] (the
  * string-aware balanced-brace scanner); both generated and interpreted
  * paths call that single implementation.
  */
case class ExtractBalancedJsonExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_extract_json expects (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def nullable: Boolean = true
  override def prettyName: String = "graft_extract_json"

  override def nullSafeEval(text: Any, marker: Any): Any =
    ExtractBalancedJsonExpr.run(
      text.asInstanceOf[UTF8String], marker.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ExtractBalancedJsonExpr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"""
         |${ev.value} = $cls.run($t, $m);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ExtractBalancedJsonExpr {
  /** Shared implementation for interpreted eval and generated code. */
  def run(text: UTF8String, marker: UTF8String): UTF8String = {
    if (text == null || marker == null) return null
    val out = JsonExtract.extractBalancedJson(text.toString, marker.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}
