package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def fill(rows: Seq[(Long, Long, Double)], step: Long = 10L) = {
    val df = rows.toDF("k", "us", "v")
    TimeSeries.resampleFill(df, "k", col("us"), "v", step)
      .orderBy("k", "bucket")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
  }

  test("hand-computed grid: locf carries, interpolation is the exact weighted average") {
    // key 1: obs at buckets 0 (v=1.0) and 4 (v=3.0); gaps 1..3
    val r = fill(Seq((1L, 5L, 1.0), (1L, 42L, 3.0)))
    assert(r.map(_._2) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(r.map(_._4) == Seq(Some(1000000L), None, None, None, Some(3000000L)))
    // locf: 1.0 carried through the gap
    assert(r.map(_._5) == Seq(Some(1000000L), Some(1000000L),
      Some(1000000L), Some(1000000L), Some(3000000L)))
    // linear: 1.0, 1.5, 2.0, 2.5, 3.0
    assert(r.map(_._6) == Seq(Some(1000000L), Some(1500000L),
      Some(2000000L), Some(2500000L), Some(3000000L)))
  }

  test("bucket mean is half-up in micro-units; n_obs counts events") {
    // two obs in one bucket: mean(1.0, 2.01) = 1.505 exactly → half-up
    val r = fill(Seq((1L, 0L, 1.0), (1L, 3L, 2.01)))
    assert(r == Seq((1L, 0L, 2L, Some(1505000L), Some(1505000L), Some(1505000L))))
  }

  test("edges clamp: before first obs interp backfills, after last obs it carries") {
    val r = fill(Seq((1L, 15L, 2.0), (1L, 35L, 4.0), (1L, 5L, -0.0)))
    // bucket 0 has an observation (v = −0.0 → 0), so range is 0..3
    assert(r.map(_._2) == Seq(0L, 1L, 2L, 3L))
    assert(r.map(_._6) == Seq(Some(0L), Some(2000000L), Some(3000000L),
      Some(4000000L)))
  }

  test("keys do not bleed: each key's grid spans only its own range") {
    val r = fill(Seq((1L, 0L, 1.0), (1L, 25L, 2.0), (2L, 100L, 5.0)))
    assert(r.filter(_._1 == 1L).map(_._2) == Seq(0L, 1L, 2L))
    assert(r.filter(_._1 == 2L).map(_._2) == Seq(10L))
    assert(r.filter(_._1 == 2L).head._4.contains(5000000L))
  }

  test("null values are dropped before bucketing") {
    val df = Seq((1L, 0L, Some(1.0)), (1L, 11L, None), (1L, 25L, Some(2.0)))
      .toDF("k", "us", "v")
    val r = TimeSeries.resampleFill(df, "k", col("us"), "v", 10L)
      .orderBy("bucket").select("bucket", "n_obs").as[(Long, Long)]
      .collect().toSeq
    assert(r == Seq((0L, 1L), (1L, 0L), (2L, 1L)))
  }

  test("managed variant releases the bucket-aggregate cache") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = TimeSeries.resampleFillManaged(
      graft.core.Tables.events(spark, sf0001)
        .filter(col("event_type") === "purchase"),
      "user_id", unix_micros(col("ts")), "value", 3600L * 1000000)
    assert(out.count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
  }
}
