package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.SparkSpec

/** Pins the SQ8 contract: code range, reconstruction error bound
  * (≤ half a quantization step per dimension), exact recovery of the
  * extremes, degenerate-dimension handling, and top-1 self-evidence on
  * separated clusters.
  */
class ScalarQuantizationSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  private def vecs(rows: (Long, Seq[Float])*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava, schema)
  }

  test("codes stay in 0..255; extremes decode exactly; step error bounded") {
    val df = vecs(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f), 3L -> Seq(0f, 0f, 1f),
      4L -> Seq(1f, 1f, 0f), 5L -> Seq(-1f, 0f, 0f))
    val (lo, hi) = ScalarQuantization.train(df, "embedding")
    assert(lo.length === 3 && hi.length === 3)
    assert(lo(0) === -1.0 && hi(0) === 1.0) // dim 0 spans [-1, 1] normalized
    val codes = df.select(col("vec_id"),
      ScalarQuantization.encodeCol(col("embedding"), lo, hi).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes.values.foreach(_.foreach(c => assert(c >= 0 && c <= 255)))
    // the extremes of each dimension hit the end codes exactly
    assert(codes(1L)(0) === 255 && codes(5L)(0) === 0)
    // reconstruction error ≤ half a step per dim for every vector
    df.collect().foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val n = math.sqrt(v.map(x => x * x).sum)
      val u = v.map(_ / n)
      val c = codes(r.getLong(0))
      u.indices.foreach { i =>
        val dec = lo(i) + c(i) * (hi(i) - lo(i)) / 255.0
        val halfStep = (hi(i) - lo(i)) / 255.0 / 2.0 + 1e-12
        assert(math.abs(dec - u(i)) <= halfStep,
          s"dim $i decode error ${math.abs(dec - u(i))} > $halfStep")
      }
    }
  }

  test("degenerate dimension (constant) codes 0 and decodes to its value") {
    val df = vecs(1L -> Seq(0.6f, 0.8f), 2L -> Seq(0.6f, 0.8f))
    val (lo, hi) = ScalarQuantization.train(df, "embedding")
    assert(lo(0) === hi(0)) // constant after normalization
    val c = df.select(ScalarQuantization
      .encodeCol(col("embedding"), lo, hi).as("c"))
      .collect().head.getSeq[Int](0)
    assert(c(0) === 0)
  }

  test("sqTopK ranks separated clusters correctly") {
    // two tight clusters on orthogonal axes + the queries themselves
    val df = vecs(
      1L -> Seq(1f, 0.01f), 2L -> Seq(1f, 0.02f), 3L -> Seq(1f, 0.03f),
      11L -> Seq(0.01f, 1f), 12L -> Seq(0.02f, 1f), 13L -> Seq(0.03f, 1f))
    val (lo, hi) = ScalarQuantization.train(df, "embedding")
    val q = df.filter(col("vec_id").isin(1L, 11L))
    val top = ScalarQuantization.sqTopK(df, q, k = 2, lo, hi)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(top(1L) === Set(2L, 3L), s"axis-1 query matched ${top(1L)}")
    assert(top(11L) === Set(12L, 13L), s"axis-2 query matched ${top(11L)}")
  }

  test("assortativity moments: hand-computed star vs clique") {
    import scala.jdk.CollectionConverters._
    val eSchema = StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))
    def moments(pairs: Seq[(Long, Long)]) = Triangles.assortativityMoments(
      spark.createDataFrame(
        pairs.map { case (a, b) => Row(a, b) }.asJava, eSchema))
      .collect().head
    // Newman 2002 assembly from the moments (m = m2/2 edges):
    //   r = [s_prod/m − (s_half/m2)²] / [s_sq/m2 − (s_half/m2)²]
    def r(row: Row): (Double, Double) = {
      val m2 = row.getAs[Long]("m2").toDouble
      val mean = row.getAs[Long]("s_half") / m2
      (row.getAs[Long]("s_prod") / (m2 / 2) - mean * mean,
        row.getAs[Long]("s_sq") / m2 - mean * mean)
    }
    // star K1,3: hub deg 3, leaves deg 1 → every edge pairs (3,1);
    // maximally disassortative, r = −1
    val star = moments(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(star.getAs[Long]("m2") === 6L)
    assert(star.getAs[Long]("s_prod") === 9L)  // 3·(3·1)
    assert(star.getAs[Long]("s_half") === 12L) // 3·(3+1)
    assert(star.getAs[Long]("s_sq") === 30L)   // 3·(9+1)
    val (sn, sd) = r(star)
    assert(math.abs(sn / sd - (-1.0)) < 1e-12, s"star r = ${sn / sd}")
    // clique K3: regular (all degrees 2) → both r terms vanish (the
    // 0/0 degenerate case the formula predicts for regular graphs)
    val k3 = moments(Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(k3.getAs[Long]("s_prod") === 12L) // 3·(2·2)
    assert(k3.getAs[Long]("s_half") === 12L) // 3·(2+2)
    assert(k3.getAs[Long]("s_sq") === 24L)   // 3·(4+4)
    val (kn, kd) = r(k3)
    assert(math.abs(kn) < 1e-12 && math.abs(kd) < 1e-12)
  }
}
