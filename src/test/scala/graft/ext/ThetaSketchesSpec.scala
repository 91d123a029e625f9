package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the theta-sketch set-operation tier: exact mode below nominal
  * entries, the lossless union/merge law, intersection and difference
  * correctness, error-bound coverage in estimation mode, and
  * partitioning-independence of the aggregate.
  */
class ThetaSketchesSpec extends SparkSpec {

  import ThetaSketches._

  private def est(bytes: Array[Byte]): Double = {
    import org.apache.datasketches.memory.Memory
    org.apache.datasketches.theta.CompactSketch.heapify(Memory.wrap(bytes))
      .getEstimate
  }

  test("exact mode: below 2^lgK distinct values the estimate IS the count") {
    import spark.implicits._
    val df = (1 to 300).map(i => s"v${i % 100}").toDF("v")
    val sk = df.agg(sketchAgg(col("v"), lgK = 12).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(est(sk) === 100.0)
  }

  test("merge law: union of per-part sketches == sketch of the whole, any partitioning") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 7, s"t${i % 900}")).toDF("part", "v")
    val whole = df.agg(sketchAgg(col("v"), lgK = 12).as("sk"))
      .head().getAs[Array[Byte]](0)
    val merged = df.groupBy(col("part"))
      .agg(sketchAgg(col("v"), lgK = 12).as("sk"))
      .agg(unionAgg(col("sk"), lgK = 12).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(est(merged) === est(whole))
    assert(est(whole) === 900.0)
    // repartitioned input reaches the identical estimate
    val shuffled = df.repartition(13).agg(sketchAgg(col("v"), lgK = 12)
      .as("sk")).head().getAs[Array[Byte]](0)
    assert(est(shuffled) === est(whole))
  }

  test("intersection and A-not-B are exact in exact mode and satisfy |A| = |A∩B| + |A\\B|") {
    import spark.implicits._
    // A = 0..599, B = 400..899 → |A∩B| = 200, |A\B| = 400
    val a = (0 until 600).map(i => s"k$i").toDF("v")
      .agg(sketchAgg(col("v"), lgK = 12).as("sk")).head().getAs[Array[Byte]](0)
    val b = (400 until 900).map(i => s"k$i").toDF("v")
      .agg(sketchAgg(col("v"), lgK = 12).as("sk")).head().getAs[Array[Byte]](0)
    val inter = Seq((a, b)).toDF("a", "b")
      .select(intersectBounds(3)(col("a"), col("b")).as("r"))
      .select(col("r._1"), col("r._2"), col("r._3")).head()
    assert(inter.getDouble(0) === 200.0)
    assert(inter.getDouble(1) === 200.0) // lb = ub = est in exact mode
    assert(inter.getDouble(2) === 200.0)
    val diff = Seq((a, b)).toDF("a", "b")
      .select(aNotBEstimate(col("a"), col("b")).as("d")).head().getDouble(0)
    assert(diff === 400.0)
  }

  test("estimation mode: ±3σ bounds cover the exact count (deterministic corpus)") {
    import spark.implicits._
    // lgK=9 → 512 nominal entries, 20k distinct values: deep estimation
    val df = (0 until 60000).map(i => s"w${i % 20000}").toDF("v")
    val r = df.agg(sketchAgg(col("v"), lgK = 9).as("sk"))
      .select(estimateBounds(3)(col("sk")).as("r"))
      .select(col("r._1"), col("r._2"), col("r._3")).head()
    val (e, lb, ub) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(lb <= 20000.0 && 20000.0 <= ub,
      s"exact 20000 outside [$lb, $ub] (est $e)")
    assert(lb < ub) // genuinely estimating, not exact mode
    // the estimate itself is within 10% (3σ at lgK=9 is ~13%)
    assert(math.abs(e - 20000.0) / 20000.0 < 0.13)
  }

  test("q121's violation frame is empty on the documents fixture") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val v = ThetaSketches.vocabOverlapViolations(
      docs, "text", "source", lgK = 9, numStdDev = 3)
    assert(v.count() === 0L)
  }
}
