package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group embedding centroids via a typed `Aggregator` (SURVEY §2.11:
  * the planned custom-UDAF surface — element-wise running mean over
  * `array<float>` with a single pass, map-side partial aggregation, and
  * O(dim) state per group; a collect_list-based mean would buffer every
  * vector per group).
  */
object Centroids {

  /** (sum vector, count) buffer; merge is element-wise — associative and
    * commutative, so Spark runs it as partial + final aggregation.
    */
  final case class Buf(var sums: Array[Double], var n: Long)

  class CentroidAgg(dim: Int) extends Aggregator[Array[Float], Buf, Array[Double]] {
    override def zero: Buf = Buf(Array.fill(dim)(0.0), 0L)
    override def reduce(b: Buf, v: Array[Float]): Buf = {
      if (v != null && v.length == dim) {
        var i = 0
        while (i < dim) { b.sums(i) += v(i); i += 1 }
        b.n += 1
      }
      b
    }
    override def merge(x: Buf, y: Buf): Buf = {
      var i = 0
      while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
    override def finish(b: Buf): Array[Double] =
      if (b.n == 0) Array.empty else b.sums.map(_ / b.n)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Centroid per group: (groupCol, centroid array<double>). */
  def perGroup(df: DataFrame, groupCol: String, vecCol: String, dim: Int): DataFrame = {
    val agg = new CentroidAgg(dim)
    val inEnc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
    df.groupBy(col(groupCol))
      .agg(udaf(agg, inEnc)(col(vecCol)).as("centroid"))
  }
}
