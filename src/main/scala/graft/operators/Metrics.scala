package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3 — the reference's progress counters (`rows_in_buffer` logging,
  * `initial_price_paid_data.py:108-118`; row-count logs
  * `monthly_price_paid_data.py:130`) as zero-cost `Dataset.observe`
  * metrics: collected on the executors during the normal pass, no extra
  * action, readable from a QueryExecutionListener or
  * `StreamingQueryProgress.observedMetrics`.
  */
object Metrics {

  /** Attach row count + null-key count observation to a frame. */
  def observeRows(df: DataFrame, name: String, keyCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      count(when(col(keyCol).isNull, 1)).as("n_null_keys"))

  /** Plain row-count observation. */
  def observeCount(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("n_rows"))
}
