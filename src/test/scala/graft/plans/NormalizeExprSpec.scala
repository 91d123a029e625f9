package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class NormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  private def hofNormalized(c: org.apache.spark.sql.Column) = {
    val v = transform(c, _.cast("double"))
    val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    when(n > 0, transform(v, x => x / n))
  }

  test("bit-identical to the HOF cast->norm->scale chain (float input)") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.1f, -2.5f, 7.25f)),
      (3L, Array(1e-8f, 1e8f))
    ).toDF("id", "v")
    val got = df.select(col("id"), VectorFunctions.normalize(col("v")).as("n"),
        hofNormalized(col("v")).as("h"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    got.foreach { case (id, n, h) =>
      assert(n == h, s"id=$id native $n != hof $h") // exact, not approx
    }
    // and it actually normalizes
    val norms = df.select(
      sqrt(VectorFunctions.normSq(VectorFunctions.normalize(col("v")))))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
  }

  test("double input accepted; zero vector and null are null") {
    val df = Seq(
      (1L, Some(Array(2.0, 0.0))),
      (2L, Some(Array(0.0, 0.0))),
      (3L, None: Option[Array[Double]])
    ).toDF("id", "v")
    val got = df.select(col("id"), VectorFunctions.normalize(col("v")).as("n"))
      .as[(Long, Option[Seq[Double]])].collect().toMap
    assert(got(1L).contains(Seq(1.0, 0.0)))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
  }

  test("null element → null result, identically in codegen and interpreted eval") {
    // HOF semantics: a null element nulls the aggregate norm, so the
    // whole result is null. Codegen path (DataFrame over nullable
    // array<double>):
    val df = Seq(
      (1L, Array[java.lang.Double](3.0, null, 4.0)),
      (2L, Array[java.lang.Double](3.0, 4.0))
    ).toDF("id", "v")
    val got = df.select(col("id"), VectorFunctions.normalize(col("v")).as("n"),
        hofNormalized(col("v")).as("h"))
      .as[(Long, Option[Seq[Double]], Option[Seq[Double]])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L)._1.isEmpty && got(1L)._2.isEmpty) // native == HOF == null
    assert(got(2L)._1.contains(Seq(0.6, 0.8)))
    // interpreted path (GenericArrayData literal — previously NPE'd):
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit = Literal.create(new GenericArrayData(Array[Any](3.0, null, 4.0)),
      ArrayType(DoubleType, containsNull = true))
    assert(NormalizeExpr(lit).eval(null) == null)
  }

  test("interpreted eval matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit = Literal.create(ArrayData.toArrayData(Array(3.0f, 4.0f)),
      ArrayType(FloatType, containsNull = false))
    val out = NormalizeExpr(lit).eval(null).asInstanceOf[ArrayData]
    assert(out.toDoubleArray().toSeq == Seq(0.6, 0.8))
    val zero = Literal.create(ArrayData.toArrayData(Array(0.0f, 0.0f)),
      ArrayType(FloatType, containsNull = false))
    assert(NormalizeExpr(zero).eval(null) == null)
  }
}
