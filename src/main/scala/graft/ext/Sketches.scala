package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollups over Spark's native DataSketches HLL
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate` —
  * engine-built-in since 3.5, Apache DataSketches under the hood).
  *
  * The 100 TB pattern this encodes: persist SKETCHES at fine grain
  * (per partition/day/source — a few KB each regardless of
  * cardinality), then answer any coarser distinct-count rollup by
  * MERGING stored sketches instead of rescanning raw data. Distinct
  * counting is the one aggregate that does not decompose (you cannot
  * sum per-day uniques), so without mergeable sketches every rollup
  * query repays a full scan + shuffle of the raw ids; with them a
  * year-over-source rollup reads kilobytes. Both steps are ordinary
  * hash aggregates — map-side partials, no driver state.
  */
object Sketches {

  /** Per-group HLL sketch table: `keys` + `sketch` (binary). This is
    * the stored artifact — a few KB per group at `lgConfigK` = 12
    * (relative standard error ≈ 1.6 %).
    */
  def sketchTable(df: DataFrame, keys: Seq[String],
      valueCol: String, lgConfigK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgConfigK)").as("sketch"))

  /** Roll a sketch table up to coarser `groupKeys`: union-merge the
    * stored sketches and estimate, no raw-data access.
    */
  def mergeEstimate(sketches: DataFrame,
      groupKeys: Seq[String]): DataFrame =
    sketches.groupBy(groupKeys.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))")
        .as("approx_distinct"))

  /** SLIDING-window rollup from the stored sketches: for every value w
    * of `orderCol` present in the table (per `partitionKeys`), the
    * estimated distinct count over the window [w − window + 1, w] —
    * "rolling 4-week actives" from 4 sketch merges per week instead of
    * a re-scan per window (distinct counts don't decompose over
    * overlapping windows; mergeable sketches are the only way rolling
    * uniques stay cheap at corpus scale). Each sketch fans out to the
    * ≤ `window` targets it contributes to — a `window`-factor explode
    * on the KB-sized sketch table, not on raw data — then one
    * hash-agg union per (keys, target). Windows are anchored on
    * PRESENT values only (no phantom trailing windows).
    */
  def rollingMergeEstimate(sketches: DataFrame, orderCol: String,
      window: Int, partitionKeys: Seq[String] = Nil): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val keys = partitionKeys.map(col)
    val expanded = sketches
      .withColumn("_off", explode(sequence(lit(0), lit(window - 1))))
      .select((keys :+ (col(orderCol) + col("_off")).as(orderCol) :+
        col("sketch")): _*)
    val present = sketches
      .select((keys :+ col(orderCol)): _*).distinct()
    expanded.join(present, partitionKeys :+ orderCol)
      .groupBy((keys :+ col(orderCol)): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))")
        .as("approx_distinct"))
  }
}
