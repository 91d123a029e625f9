package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build: collapse a keyed
  * change stream into validity intervals — one row per run of the
  * tracked attribute, `[valid_from, valid_to)` half-open, the current
  * run open-ended. The warehouse-side twin of the reference's keyed
  * UPDATE upsert (`/root/reference/dags/rightmove_outcodes.py:124` —
  * Type 1 overwrite loses history; Type 2 keeps every state with its
  * validity window).
  *
  * Scale shape: ONE shuffle total. Everything is keyed by `keyCol`:
  * the change-detect and version windows sort within the same hash
  * partitioning, the (key, version) aggregate is clustered by a
  * superset of the partitioning key (no re-exchange — Catalyst reuses
  * the window's distribution), and the interval-close `lead` window
  * rides the same partitioning again. Per-key state is a sort buffer,
  * not a materialized history — skew follows the hottest key's event
  * count, same envelope as any sessionization.
  *
  * Ordering is by an explicit total order (`orderCols`, e.g. event
  * time + a unique id tiebreak) so versioning is deterministic under
  * duplicate timestamps. Change detection is null-safe: null → value,
  * value → null, and value → different-value all open a new version;
  * null → null does not.
  */
object ChangeCapture {

  /** Build the Type 2 interval table:
    * (keyCol, version, attr_value, valid_from, valid_to, is_current,
    * n_events). `version` is 1-based per key in `orderCols` order;
    * `valid_from`/`valid_to` carry the first `orderCols.head` value of
    * this / the next run (`valid_to` null on the current run);
    * `n_events` counts collapsed source rows.
    */
  def scd2(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      attrCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must name a total order")
    val ord = orderCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val changed = when(!(lag(col(attrCol), 1).over(w) <=> col(attrCol)), 1)
      .otherwise(0)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    df.withColumn("version", sum(changed).over(w))
      .groupBy(col(keyCol), col("version"))
      .agg(
        min(col(attrCol)).as("attr_value"), // constant within a run
        min(col(orderCols.head)).as("valid_from"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("version"), col("attr_value"),
        col("valid_from"),
        lead(col("valid_from"), 1).over(wNext).as("valid_to"),
        col("n_events"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
