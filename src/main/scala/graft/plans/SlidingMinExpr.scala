package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sliding-window minimum over an array<long> column: output(i) =
  * min(input(i..i+w-1)) for each of the n−w+1 full windows (a short
  * input yields one global minimum) — the winnowing window-select made
  * a single O(n) primitive loop.
  *
  * The HOF form (`transform(sequence(...), j => array_min(slice(hs,
  * j+1, w)))`) slices and rescans w elements per window — O(n·w)
  * interpreted, with an array allocation per window. This expression
  * runs the classic monotonic-deque algorithm: every element enters and
  * leaves the deque at most once, so the whole column is O(n) with one
  * scratch buffer, inside whole-stage codegen. At fixture document
  * sizes the difference is noise; at real web-document sizes (10⁴-10⁵
  * grams, w 50-200) it is the difference between the dedup scan stage
  * being hash-bound or window-bound.
  *
  * Null semantics: null input → null, and any null ELEMENT → null
  * result, identically in interpreted and generated code (hash arrays
  * never carry null slots in practice, but the static containsNull flag
  * is true whenever the gram lambda is built over a nullable text
  * column, so both paths must agree on the case rather than reject it).
  */
case class SlidingMinExpr(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sliding_min"

  override def nullable: Boolean = true // null elements → null result

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sliding_min expects array<long>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0
    while (i < n) { // null element → null, matching codegen
      if (x.isNullAt(i)) return null
      i += 1
    }
    val outLen = math.max(n - w + 1, 1)
    val out = new Array[Long](if (n == 0) 0 else outLen)
    if (n > 0) {
      // monotonic deque of candidate indices: values increase front to
      // back; front is the current window's minimum
      val deque = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < n) {
        val v = x.getLong(i)
        while (tail > head && x.getLong(deque(tail - 1)) >= v) tail -= 1
        deque(tail) = i
        tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) out(i - w + 1) = x.getLong(deque(head))
        i += 1
      }
      if (n < w) out(0) = x.getLong(deque(head)) // short input: global min
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val outLen = ctx.freshName("outLen")
      val out = ctx.freshName("out")
      val deque = ctx.freshName("deque")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $a.numElements();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $outLen = java.lang.Math.max($n - $w + 1, 1);
         |  long[] $out = new long[$n == 0 ? 0 : $outLen];
         |  if ($n > 0) {
         |    int[] $deque = new int[$n];
         |    int $head = 0;
         |    int $tail = 0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $v = $a.getLong($i);
         |      while ($tail > $head && $a.getLong($deque[$tail - 1]) >= $v) $tail--;
         |      $deque[$tail++] = $i;
         |      if ($deque[$head] <= $i - $w) $head++;
         |      if ($i >= $w - 1) $out[$i - $w + 1] = $a.getLong($deque[$head]);
         |    }
         |    if ($n < $w) $out[0] = $a.getLong($deque[$head]);
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
