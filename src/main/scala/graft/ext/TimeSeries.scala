package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed grid per key, then fill the gaps — forward-fill (last
  * observation carried forward) and linear interpolation between the
  * nearest observations. The standard prep step before any windowed
  * model/feature pipeline consumes sensor, price, or metric streams:
  * downstream ops want one row per (key, tick), not whenever events
  * happened to arrive.
  *
  * Numeric contract (oracle-exact, NUMERICS rule 2): bucket means and
  * interpolated values are FIXED-POINT ×10⁶ BIGINTs computed with
  * integer arithmetic end to end — `round(double, 6)` is not portable
  * here because low-decimal inputs × small-integer grid ratios land on
  * terminating 7-digit decimals ending in 5 constantly (measured: two
  * half-tie rows in the first sf0.01 run). Half-up division of
  * non-negative integers is `(2n + d) div (2d)`, identical under
  * Spark's truncating `div` and DuckDB's flooring `//`. Inputs must be
  * non-negative for that identity (true for value-bearing events).
  *
  * Plan shape: ONE event-sized Exchange — repartition by key up
  * front, and the (key, bucket) hash aggregate is clustered by a
  * superset of that partitioning so Catalyst reuses the exchange. The
  * aggregate is CACHED (it feeds both the per-key grid bounds and the
  * fill join; uncached, the event scan + aggregate run twice). The
  * only other shuffle is bucket-aggregate-sized (the AQE plan inside
  * the cache reports unknown partitioning, so the bounds re-agg
  * re-keys the collapsed frame — rows = observed buckets, not
  * events). All four fill windows (prev/next value, prev/next bucket)
  * share one key-partitioned sort. Grid size per key is span/step
  * rows — the caller's step choice bounds it; no per-key state beyond
  * the window frame exists.
  * At 100 TB: everything keys on `key`; skew = one hot key's span,
  * which is capped by the time range, not the event volume (a million
  * events in one bucket still collapse map-side to one grid row).
  */
object TimeSeries {

  /** Resample `events` to `stepUs`-wide buckets per `keyCol` and fill
    * gaps. `tsCol` must be µs-since-epoch (long) or castable via
    * unix_micros upstream. Output per (key, bucket) in the key's
    * [min, max] observed range, values in micro-units (×10⁶ BIGINT):
    * n_obs, v_obs_u6 (bucket mean, null on gaps), v_ffill_u6 (locf,
    * null before first obs), v_interp_u6 (linear between nearest obs;
    * clamps to the known side at the edges).
    */
  def resampleFill(events: DataFrame, keyCol: String, tsUsCol: Column,
      valueCol: String, stepUs: Long): DataFrame =
    resampleFillManaged(events, keyCol, tsUsCol, valueCol, stepUs)._1

  /** [[resampleFill]] plus a release handle for the internal bucket
    * aggregate cache (feeds the per-key bounds AND the grid join —
    * uncached it would re-scan and re-aggregate the event stream).
    */
  def resampleFillManaged(events: DataFrame, keyCol: String,
      tsUsCol: Column, valueCol: String,
      stepUs: Long): (DataFrame, () => Unit) = {
    require(stepUs > 0)
    // exact floor-div without `div` syntax: (ts − ts%step)/step has an
    // exact-multiple numerator, so the double quotient is an exact
    // integer (< 2^53) — a raw double ts/step could round up across a
    // bucket boundary before the cast truncates
    val us = tsUsCol.cast("long")
    val bucket = ((us - us % stepUs) / stepUs).cast("long")
    val keyed = events
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol), bucket.as("bucket"), col(valueCol).as("__v"))
      .repartition(col(keyCol))
    val obs = keyed
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_obs"),
        (sum(col("__v").cast("decimal(38,6)")) * lit(1000000L))
          .cast("long").as("__sum_u6"))
      // bucket mean in micro-units, half-up: (2Σ + n) div (2n)
      .withColumn("v_obs_u6",
        expr("(2 * __sum_u6 + n_obs) div (2 * n_obs)"))
      .drop("__sum_u6")
      .cache()
    val grid = obs
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol), explode(sequence(col("__mn"), col("__mx")))
        .as("bucket"))
    val joined = grid.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("v_obs_u6"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("v_obs_u6").isNotNull, col("bucket"))
    val filled = joined
      .withColumn("__pv", last(col("v_obs_u6"), ignoreNulls = true).over(back))
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("v_obs_u6"), ignoreNulls = true).over(fwd))
      .withColumn("__nb", first(obsBucket, ignoreNulls = true).over(fwd))
    // weighted-average form keeps the numerator non-negative:
    // (pv·(nb−b) + nv·(b−pb)) / (nb−pb), half-up in integers
    val interp = when(col("__pv").isNull, col("__nv"))
      .when(col("__nv").isNull, col("__pv"))
      .when(col("__nb") === col("__pb"), col("__pv"))
      .otherwise(expr(
        """(2 * (__pv * (__nb - bucket) + __nv * (bucket - __pb))
          |   + (__nb - __pb)) div (2 * (__nb - __pb))""".stripMargin))
    val out = filled.select(col(keyCol), col("bucket"), col("n_obs"),
      col("v_obs_u6"), col("__pv").as("v_ffill_u6"),
      interp.as("v_interp_u6"))
    (out, () => { obs.unpersist(); () })
  }
}
