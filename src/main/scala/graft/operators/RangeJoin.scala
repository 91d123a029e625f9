package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join with bin bucketing (the second custom
  * join the builder brief names alongside as-of).
  *
  * A naive `v BETWEEN lo AND hi` join has no equi-key, so Spark plans
  * BroadcastNestedLoopJoin — O(|L|·|R|) compares and a hard broadcast
  * requirement. Binning restores an equi-key: left rows key on
  * floor(v/w), right intervals explode to every bin they overlap, the
  * join runs as a plain hash join on the bin, and the exact predicate
  * re-filters within matched bins. Each qualifying (l, r) pair meets in
  * exactly one bin (the bin of v), so no dedup is needed — results are
  * exactly the naive join's.
  *
  * `binWidth` tunes replication vs selectivity: ~the median interval
  * width is the standard choice (intervals then explode to ~2 bins).
  */
object RangeJoin {

  /** Inner join of `left` (point column `v`) with `right` (interval
    * columns `lo`, `hi`), half-open [lo, hi).
    */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      v: String,
      lo: String,
      hi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val lb = left.withColumn("__bin",
      floor(col(v) / binWidth).cast("long"))
    val rb = right.withColumn("__bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    lb.join(rb, Seq("__bin"))
      .filter(col(v) >= col(lo) && col(v) < col(hi))
      .drop("__bin")
  }
}
