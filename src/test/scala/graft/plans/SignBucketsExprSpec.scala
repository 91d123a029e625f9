package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the codegen path of [[SignBucketsExpr]] (r18: doGenCode — the
  * bucket loop inside whole-stage codegen) bit-equal to the
  * interpreted eval twin, including the null-vector → (t, 0L) rule.
  */
class SignBucketsExprSpec extends SparkSpec {

  private val tables = 4
  private val bits = 6
  private val dim = 8

  private def planes: IndexedSeq[IndexedSeq[Double]] =
    for (t <- 0 until tables; p <- 0 until bits)
      yield (0 until dim)
        .map(d => math.sin(t * 97 + p * 13 + d * 3.7)): IndexedSeq[Double]

  test("codegen buckets equal interpreted eval, null vector -> (t, 0)") {
    import org.apache.spark.sql.graft.bridge
    import spark.implicits._
    val vecs: Seq[Option[Seq[Double]]] = Seq(
      Some((0 until dim).map(i => math.cos(i * 1.3))),
      Some((0 until dim).map(i => -1.0 + i * 0.27)),
      Some(Seq(0.0, 0.0)), // short vector: dot over common prefix
      None)
    val df = vecs.toDF("v")
    val expr = SignBucketsExpr(
      bridge.expression(col("v")), planes, tables, bits)
    // DataFrame evaluation runs the doGenCode path (WSCG project)
    val viaCodegen = df.select(bridge.column(expr).as("b"))
      .collect().map(_.getSeq[Row](0).map(r => (r.getInt(0), r.getLong(1))))
    // interpreted twin, driver-side
    val viaEval = vecs.map { ov =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
        ov.map(_.toArray).orNull,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))
      expr.copy(child = lit)
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    }.map { ad =>
      (0 until ad.numElements()).map { i =>
        val r = ad.getStruct(i, 2)
        (r.getInt(0), r.getLong(1))
      }
    }
    assert(viaCodegen.toSeq.map(_.toSeq) == viaEval.map(_.toSeq))
    // null vector bucketed as all-zero, never a null array
    assert(viaCodegen.last.forall(_._2 == 0L))
    assert(viaCodegen.last.map(_._1) == (0 until tables))
  }
}
