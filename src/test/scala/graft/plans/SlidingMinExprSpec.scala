package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class SlidingMinExprSpec extends SparkSpec {
  import spark.implicits._

  private def nativeMins(xs: Seq[Long], w: Int): Seq[Long] = {
    import org.apache.spark.sql.graft.bridge
    Seq(Tuple1(xs)).toDF("hs")
      .select(bridge.column(
        SlidingMinExpr(bridge.expression(col("hs")), w)).as("m"))
      .as[Seq[Long]].collect().head
  }

  private def hofMins(xs: Seq[Long], w: Int): Seq[Long] =
    Seq(Tuple1(xs)).toDF("hs")
      .select(transform(
        sequence(lit(0), greatest(size(col("hs")) - w, lit(0))),
        j => array_min(slice(col("hs"), j + 1, lit(w)))).as("m"))
      .as[Seq[Long]].collect().head

  test("matches the HOF slice/array_min chain on random inputs, any window") {
    val g = Gen.zip(
      Gen.choose(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))),
      Gen.choose(1, 12))
    (0 until 12).foreach { s =>
      val (xs, w) = g.apply(Gen.Parameters.default, Seed(77L + s)).get
      assert(nativeMins(xs, w) == hofMins(xs, w), s"seed=$s xs=$xs w=$w")
    }
  }

  test("hand cases: short input, duplicates, strictly increasing/decreasing") {
    assert(nativeMins(Seq(5L), 4) == Seq(5L))          // shorter than window
    assert(nativeMins(Seq(3L, 1L, 2L), 8) == Seq(1L))  // global min fallback
    assert(nativeMins(Seq(2L, 2L, 2L, 2L), 2) == Seq(2L, 2L, 2L))
    assert(nativeMins(Seq(1L, 2L, 3L, 4L), 2) == Seq(1L, 2L, 3L))
    assert(nativeMins(Seq(4L, 3L, 2L, 1L), 2) == Seq(3L, 2L, 1L))
  }

  test("interpreted eval agrees with codegen; null element nulls the result in both") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val lit0 = Literal.create(ArrayData.toArrayData(Array(7L, 3L, 9L, 1L)),
      ArrayType(LongType, containsNull = false))
    val out = SlidingMinExpr(lit0, 2).eval(null).asInstanceOf[ArrayData]
    assert(out.toLongArray().toSeq == Seq(3L, 3L, 1L))
    val withNull = Literal.create(new GenericArrayData(Array[Any](7L, null, 9L)),
      ArrayType(LongType, containsNull = true))
    assert(SlidingMinExpr(withNull, 2).eval(null) == null)
    // codegen path over a nullable-element column
    val df = Seq(Tuple1(Array[java.lang.Long](7L, null, 9L))).toDF("hs")
    import org.apache.spark.sql.graft.bridge
    val got = df.select(bridge.column(
        SlidingMinExpr(bridge.expression(col("hs")), 2)).as("m"))
      .as[Option[Seq[Long]]].collect().head
    assert(got.isEmpty)
  }

  test("fingerprintFrame64 is bit-identical to the generic xxhash64 HOF path") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val fast = graft.ext.Winnowing.fingerprintFrame64(docs, "doc_id", "text",
        k = 20, w = 10)
      .as[(Long, Seq[Long])].collect().toMap.map { case (k2, v) => k2 -> v.toSet }
    val generic = graft.ext.Winnowing.fingerprintFrame(docs, "doc_id", "text",
        k = 20, w = 10, hash = c => xxhash64(c))
      .as[(Long, Seq[Long])].collect().toMap.map { case (k2, v) => k2 -> v.toSet }
    assert(fast == generic)
    assert(fast.nonEmpty && fast.values.forall(_.nonEmpty))
  }
}
