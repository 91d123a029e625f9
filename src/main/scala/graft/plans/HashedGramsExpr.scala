package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Hashed unigram featurization as one native kernel: lowercase the
  * text, walk its UTF-8 bytes once splitting on ASCII-whitespace runs
  * (Java regex `\s` = space, \t, \n, \x0B, \f, \r — the exact
  * [[graft.ext.Shingling.tokens]] alphabet), and murmur3-hash each
  * token slice `pmod dim` — the [[graft.ext.HashedClassifier]]
  * featurize step without the four-HOF chain
  * (lower→regexp_replace→split→filter→transform), whose
  * CodegenFallback lambdas disqualify the ENTIRE projection from
  * whole-stage codegen (Spark's CollapseCodegenStages rejects any
  * stage containing a fallback expression — so the score kernel alone
  * could not restore WSCG; featurize had to become native too).
  *
  * Bit-equality contract (spec-pinned against the HOF twin on real
  * and adversarial inputs): lowercasing runs over the WHOLE string
  * first — same order as the HOF chain, which matters for
  * context-sensitive mappings (Greek final sigma) — and the hash is
  * Spark's own `hash()` arithmetic (Murmur3_x86_32 over the UTF-8
  * bytes, seed 42) so ids are identical to
  * `pmod(hash(token), dim)`.
  */
case class HashedGramsExpr(text: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0, s"dim must be positive, got $dim")

  override def child: Expression = text
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hashed_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    text.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_hashed_grams expects string, got ${t.simpleString(10)}")
    }

  override def nullSafeEval(s: Any): Any =
    HashedGramsExpr.compute(s.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.HashedGramsExpr.compute($s, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(text = newChild)
}

object HashedGramsExpr {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Java-callable kernel shared by interpreted eval and generated
    * code: one pass over the lowered bytes, one murmur per token.
    *
    * Lowercasing goes through the SAME arm the `lower()` expression
    * takes for default UTF8_BINARY strings in Spark 4.1 —
    * `CollationSupport.Lower.execBinaryICU` (probed: `lower()` maps
    * "Σ中" to σ like ICU, while both `UTF8String.toLowerCase` and
    * `execBinary` apply Java's final-sigma rule and produce ς; the
    * random-unicode property caught the one-token divergence).
    */
  def compute(s: UTF8String, dim: Int): ArrayData = {
    val bytes = org.apache.spark.sql.catalyst.util.CollationSupport
      .Lower.execBinaryICU(s).getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val h = Murmur3_x86_32.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42)
        val m = h % dim
        out.add(if (m < 0) m + dim else m)
      }
    }
    val arr = new Array[Any](out.size())
    var j = 0
    while (j < out.size()) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }
}
