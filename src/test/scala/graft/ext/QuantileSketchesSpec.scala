package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantileSketchesSpec extends SparkSpec {
  import spark.implicits._

  test("below k the sketch is exact: quantiles of 1..100 hit the true order statistics") {
    // n = 100 < k = 200 → no compaction, every item retained
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("g", "v")
    val sk = QuantileSketches.sketchTable(df, Seq("g"), "v")
    val q = QuantileSketches.rollupQuantiles(sk, Seq("g"),
      Seq(0.01, 0.5, 1.0))
      .select("target_rank", "est_q").as[(Double, Double)]
      .collect().toMap
    // inclusive criterion: smallest item whose rank(≤ item) ≥ r
    assert(q(0.01) == 1.0)
    assert(q(0.5) == 50.0)
    assert(q(1.0) == 100.0)
  }

  test("merging fine sketches equals sketching the union when exact") {
    // two disjoint halves per week, merged per group — below k both
    // paths retain every item, so quantiles must agree exactly
    val fine = ((1 to 50).map(v => ("g", 0L, v.toDouble)) ++
      (51 to 100).map(v => ("g", 1L, v.toDouble))).toDF("g", "wk", "v")
    val merged = QuantileSketches.rollupQuantiles(
      QuantileSketches.sketchTable(fine, Seq("g", "wk"), "v"),
      Seq("g"), Seq(0.25, 0.75))
      .select("target_rank", "est_q").as[(Double, Double)]
      .collect().toMap
    assert(merged(0.25) == 25.0 && merged(0.75) == 75.0)
  }

  test("the band is atom-safe: a constant column violates nothing at any rank") {
    // all mass on one value → rank band of the (exact) estimate is
    // [0, 1]; every target rank sits inside it. A naive
    // |rank_incl − target| gate would flag this correct answer.
    val df = Seq.fill(100)(("g", 7.0)).toDF("g", "v")
    val v = QuantileSketches.rollupViolations(df, Seq("g"), Seq("g"),
      "v", Seq(0.01, 0.5, 0.99))
    assert(v.count() == 0)
  }

  test("violation filter fires on an injected wrong estimate (machinery is live)") {
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("g", "v")
    // est below all data: rank band [0,0]; target 0.5 > 0 + 2ε → row.
    // est above all data: band [1,1]; target 0.5 < 1 − 2ε → row.
    // est at the true median with matching target → no row.
    val est = Seq(("g", 0.5, -1.0, 0.0165), ("g", 0.5, 1e9, 0.0165),
      ("g", 0.5, 50.0, 0.0165))
      .toDF("g", "target_rank", "est_q", "eps")
    val v = QuantileSketches.violationsVs(df, est, Seq("g"), "v")
      .select("est_q").as[Double].collect().toSet
    assert(v == Set(-1.0, 1e9))
  }

  test("sf0.001 events: measured rank margin is inside ε itself (2ε gate has real headroom)") {
    val e = graft.core.Tables.events(spark, sf0001).withColumn("week",
      expr("(unix_micros(ts) div 86400000000) div 7"))
    val est = QuantileSketches.rollupQuantiles(
      QuantileSketches.sketchTable(e, Seq("event_type", "week"), "value"),
      Seq("event_type"), Seq(0.5, 0.95))
    val raw = e.filter(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double").as("v"))
    val margins = raw.join(broadcast(est), Seq("event_type"))
      .groupBy("event_type", "target_rank", "est_q", "eps")
      .agg((sum(when(col("v") < col("est_q"), 1L).otherwise(0L)) /
        count(lit(1))).as("rank_lo"),
        (sum(when(col("v") <= col("est_q"), 1L).otherwise(0L)) /
          count(lit(1))).as("rank_hi"))
      .select(greatest(col("rank_lo") - col("target_rank"),
        col("target_rank") - col("rank_hi"), lit(0.0)).as("gap"),
        col("eps")).as[(Double, Double)].collect()
    assert(margins.nonEmpty)
    margins.foreach { case (gap, eps) =>
      assert(gap <= eps, s"measured gap $gap exceeds single ε $eps")
    }
  }
}
