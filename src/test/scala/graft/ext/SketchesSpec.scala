package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("merged sketches equal one sketch over the union (the mergeability law)") {
    val a = (1L to 3000L).map(i => ("a", i)).toDF("g", "v")
    val b = (2000L to 5000L).map(i => ("b", i)).toDF("g", "v")
    // fine-grain sketches per g, rolled up to one estimate...
    val rolled = Sketches.mergeEstimate(
        Sketches.sketchTable(a.union(b), Seq("g"), "v"), Seq.empty)
      .select(col("approx_distinct")).as[Double].head()
    // ...must EXACTLY equal sketching the union directly (HLL merge is
    // lossless over register maxima — not just approximately equal)
    val direct = a.union(b).select(lit(1).as("k"), col("v"))
      .groupBy("k").agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 12))")
        .as("e")).select(col("e")).as[Double].head()
    assert(rolled == direct, s"merge changed the estimate: $rolled vs $direct")
    // and the estimate lands near the true 5000
    assert(math.abs(rolled - 5000.0) / 5000.0 < 0.05, s"estimate $rolled")
  }

  test("sketch table stays small: bytes per group bounded, not cardinality-scaled") {
    val big = (1L to 50000L).map(i => ("x", i)).toDF("g", "v")
    val bytes = Sketches.sketchTable(big, Seq("g"), "v")
      .select(length(col("sketch"))).as[Int].head()
    assert(bytes < 16384, s"sketch grew with cardinality: $bytes bytes")
  }

  test("rollup estimate within the q108 bound on the events table") {
    val e = graft.core.Tables.events(spark, sf001).withColumn("week",
      expr("(unix_micros(ts) div 86400000000) div 7"))
    val rolled = Sketches.mergeEstimate(
        Sketches.sketchTable(e, Seq("event_type", "week"), "user_id"),
        Seq("event_type"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("x"))
    val worst = rolled.join(exact, Seq("event_type"))
      .select((abs(col("approx_distinct") - col("x")) / col("x")).as("err"))
      .agg(max("err")).as[Double].head()
    info(s"worst relative error: $worst")
    assert(worst <= 0.10, s"estimate error $worst past the gate bound")
  }
}
