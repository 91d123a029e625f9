package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonical first pass of a web-scale text pipeline: the same visible
  * string arrives both composed (é) and decomposed (e + U+0301) from
  * different sources, and every downstream exact operator (fingerprint
  * dedup, line dedup, shingling, BPE pre-tok) silently treats them as
  * different documents unless the corpus is normalized first. Spark
  * has no built-in for this; the kernel is `java.text.Normalizer`
  * (ICU-equivalent for the canonical forms), wrapped the
  * [[ExtractBalancedJsonExpr]] way so it rides INSIDE whole-stage
  * codegen rather than fencing the projection behind a UDF.
  *
  * Already-normalized strings (the overwhelming common case) take an
  * allocation-free fast path: `Normalizer.isNormalized` is a scan, and
  * the input UTF8String is returned as-is.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType.simpleString}")
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.run(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalizeExpr.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Shared implementation for interpreted eval and generated code.
    * Never returns null for non-null input (normalization is total).
    */
  def run(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
