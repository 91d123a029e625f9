package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native k-means cell assignment: the `take` nearest centroids of an
  * array<double> vector as `array<struct<d2:double, cell:int>>`,
  * nearest first, ties by cell id — the exact contract of the
  * higher-order-function formulation it replaces
  * ([[graft.ext.CentroidAssign]]).
  *
  * Why native: the HOF form (`transform` over a typed-literal centroid
  * array + `array_sort` + `slice`) is CodegenFallback, so every
  * centroid comparison runs through the boxed lambda interpreter and
  * every row allocates and sorts a k-struct array. This expression is
  * a primitive partial-insertion loop over the unsafe array data — no
  * per-centroid allocation, no boxing — which is the difference
  * between the Lloyd/encode scans of the ANN tier being
  * interpreter-bound and being memory-bound. (Same finding as the PCA
  * moment pass and the q101 classifier kernels: HOFs never reach
  * codegen, so hot per-row loops want a native expression.)
  *
  * Bit-exactness (the q60 "exactly reproducible" contract): ‖c‖² is
  * summed left-to-right at construction exactly as the packed literal
  * did; the dot accumulates in index order ([[DotProductExpr]]'s
  * loop); d2 = ‖c‖² − 2·(v·c) in the same association; and the
  * selection orders by (d2, cell) with java.lang.Double.compare (NaN
  * greatest), matching array_sort's struct ordering — so assignments
  * are bit-identical to the HOF form.
  *
  * Null semantics: null vector → null (the HOF returned null);
  * vector elements are assumed non-null (vector-column contract);
  * length mismatch → dot over the common prefix.
  */
case class NearestCellsExpr(
    child: Expression,
    cells: IndexedSeq[Int],
    centroids: IndexedSeq[IndexedSeq[Double]],
    take: Int)
  extends UnaryExpression with CodegenFallback {

  require(cells.length == centroids.length && take >= 1)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cells expects array<double>, got ${t.simpleString(10)}")
  }

  @transient private lazy val centArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  // left-to-right, matching the driver-side `v.map(x => x*x).sum` of
  // the literal-packed form
  @transient private lazy val normSq: Array[Double] = centArr.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val k = centArr.length
    val t = math.min(take, k)
    val bestD = new Array[Double](t)
    val bestC = new Array[Int](t)
    var filled = 0
    var c = 0
    while (c < k) {
      val cv = centArr(c)
      val n = math.min(x.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * cv(i); i += 1 }
      val d2 = normSq(c) - 2.0 * acc
      val cid = cells(c)
      var p = filled
      while (p > 0 && {
        val cmp = java.lang.Double.compare(bestD(p - 1), d2)
        cmp > 0 || (cmp == 0 && bestC(p - 1) > cid)
      }) p -= 1
      if (p < t) {
        var q = math.min(filled, t - 1)
        while (q > p) { bestD(q) = bestD(q - 1); bestC(q) = bestC(q - 1); q -= 1 }
        bestD(p) = d2
        bestC(p) = cid
        if (filled < t) filled += 1
      }
      c += 1
    }
    val rows = new Array[Any](filled)
    var i = 0
    while (i < filled) { rows(i) = InternalRow(bestD(i), bestC(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
