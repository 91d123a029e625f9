package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier flagging — Tukey's IQR fence, the standard
  * pre-aggregation hygiene filter (price glitches, sensor spikes,
  * length anomalies) that a mean/stddev z-score can't do safely (the
  * outliers poison the very moments that define them; quartiles don't
  * care).
  *
  * Portable by construction: quartiles come from `percentile`, whose
  * interpolation matches DuckDB's `quantile_cont` bit-for-bit (proven
  * by q36), and the fence is plain IEEE ·,−,+ on identical doubles —
  * no rounding step anywhere (see BASELINE.md's rounding-hazard note).
  *
  * Scale shape: one grouped percentile aggregate (group-count rows),
  * broadcast back onto the scan as an equi-join on the group key, and
  * a pure filter/flag projection. Exact percentile materializes
  * per-group sorted state — at 100 TB swap in `approx_percentile`
  * (same dial as [[Binning]]).
  */
object Outliers {

  /** `df` plus `is_outlier`: value outside
    * [q1 − k·IQR, q3 + k·IQR] of its group. `groupCols` empty = one
    * global fence.
    */
  def iqrFlag(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 1.5,
      flagCol: String = "is_outlier",
      exact: Boolean = true): DataFrame = {
    val fn = if (exact) "percentile" else "approx_percentile"
    val grouped =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    val fences = grouped
      .agg(expr(s"$fn($valueCol, 0.25)").as("__q1"),
        expr(s"$fn($valueCol, 0.75)").as("__q3"))
      .withColumn("__lo", col("__q1") - lit(k) * (col("__q3") - col("__q1")))
      .withColumn("__hi", col("__q3") + lit(k) * (col("__q3") - col("__q1")))
      .drop("__q1", "__q3")
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(fences))
      else df.join(broadcast(fences), groupCols)
    joined
      .withColumn(flagCol,
        col(valueCol) < col("__lo") || col(valueCol) > col("__hi"))
      .drop("__lo", "__hi")
  }
}
