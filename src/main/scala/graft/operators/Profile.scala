package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-generic data profiling — the "what did this 100 TB drop
  * actually contain" first look every ingest pipeline runs: one output
  * row per column with row/null/distinct counts, computed in a single
  * aggregation pass regardless of column count.
  *
  * Two modes:
  *  - `exact = false` (the scale default): `approx_count_distinct`
  *    (HyperLogLog++), ONE scan, no row expansion — per-column state is
  *    a fixed sketch, so 100-column × 100 TB profiles cost one pass.
  *  - `exact = true` (the oracle/gate mode): `count(DISTINCT …)` per
  *    column compiles to Catalyst's Expand (each input row fans to
  *    column-count+1 aggregation rows) — exact, but pay ~m× the scan;
  *    right for small frames and correctness gates, wrong at corpus
  *    scale. The mode dial is the documented trade, same convention as
  *    the q38/q46 approx-distinct pair.
  *
  * Output (long format): `column_name`, `n_rows`, `n_nulls`,
  * `n_distinct` — nulls are NOT counted in `n_distinct` (both engines'
  * COUNT(DISTINCT) semantics).
  */
object Profile {

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    val aggExprs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      count(when(col(c).isNull, lit(1))).as(s"__nulls__$c"),
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c))).as(s"__dist__$c")))
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column_name"),
        col("__rows").as("n_rows"),
        col(s"__nulls__$c").as("n_nulls"),
        col(s"__dist__$c").as("n_distinct"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
