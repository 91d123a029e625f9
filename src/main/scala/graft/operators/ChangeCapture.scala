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
    // the explicit first-row test matters: detecting the first row via
    // `lag(attr) is null-safe-unequal to attr` breaks when the FIRST
    // event's attr is itself null (null <=> null is true ⇒ changed=0 ⇒
    // versions start at 0, violating the 1-based contract and losing
    // such keys in scd2Merge's version=1 first-run lookup)
    val isFirst = lag(lit(0), 1).over(w).isNull
    val changed =
      when(isFirst || !(lag(col(attrCol), 1).over(w) <=> col(attrCol)), 1)
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

  /** Incremental Type 2 merge: fold a NEW batch of change events into
    * an existing [[scd2]] interval table without reprocessing history.
    * Exactness contract (spec-pinned): for any time split T,
    * `scd2Merge(scd2(events ≤ T), events > T) == scd2(all events)` —
    * the incremental path is indistinguishable from the full rebuild.
    *
    * PRECONDITION (append-only): every batch event for a key must sort
    * AFTER that key's already-folded events (the same watermark
    * discipline as the streaming ingests; the interval table does not
    * retain per-event ordering, so a late event cannot be spliced —
    * route late data to a full rebuild of the affected keys).
    *
    * Scale shape: history rows for untouched keys pass through without
    * being read past the anti-join; per touched key the work is the
    * batch's own [[scd2]] plus one join against that key's single
    * CURRENT row. This is the O(batch) pattern of
    * [[graft.ext.MinHashDedup.incrementalNearDuplicates]] applied to
    * dimension history.
    */
  def scd2Merge(
      existing: DataFrame,
      batch: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      attrCol: String): DataFrame = {
    val touched = batch.select(col(keyCol)).distinct()
    val exTouched = existing.join(touched, Seq(keyCol), "left_semi")
    val exUntouched = existing.join(touched, Seq(keyCol), "left_anti")
    val exHist = exTouched.filter(!col("is_current"))
    val exCur = exTouched.filter(col("is_current"))
      .select(col(keyCol), col("version").as("__cur_v"),
        col("attr_value").as("__cur_attr"),
        col("valid_from").as("__cur_from"),
        col("n_events").as("__cur_n"))

    val b = scd2(batch, keyCol, orderCols, attrCol)
    val firstRun = b.filter(col("version") === 1)
      .select(col(keyCol), col("attr_value").as("__first_attr"),
        col("valid_from").as("__first_from"))
    // one row per (key, batch run), decorated with the key's current
    // state; null __cur_v marks a key new to the dimension
    val joined = b.join(firstRun, Seq(keyCol))
      .join(exCur, Seq(keyCol), "left")
    // the isNotNull guard matters: for a key NEW to the dimension,
    // __cur_attr is null and a null batch attr would make the bare
    // null-safe compare TRUE — merging run 1 into a current row that
    // does not exist (nulling valid_from/n_events)
    val continues =
      col("__cur_v").isNotNull && (col("__first_attr") <=> col("__cur_attr"))
    val adjusted = joined.select(
      col(keyCol),
      when(col("__cur_v").isNull, col("version"))
        .when(continues, col("version") + col("__cur_v") - 1)
        .otherwise(col("version") + col("__cur_v")).as("version"),
      col("attr_value"),
      when(continues && col("version") === 1, col("__cur_from"))
        .otherwise(col("valid_from")).as("valid_from"),
      col("valid_to"),
      when(continues && col("version") === 1,
          col("n_events") + col("__cur_n"))
        .otherwise(col("n_events")).as("n_events"))
    // a changed attribute closes the key's current run at the batch start
    val closed = exCur.join(firstRun, Seq(keyCol))
      .filter(!(col("__first_attr") <=> col("__cur_attr")))
      .select(col(keyCol), col("__cur_v").as("version"),
        col("__cur_attr").as("attr_value"),
        col("__cur_from").as("valid_from"),
        col("__first_from").as("valid_to"),
        col("__cur_n").as("n_events"))

    val cols = Seq(keyCol, "version", "attr_value", "valid_from",
      "valid_to", "n_events")
    exUntouched.select(cols.map(col): _*)
      .unionByName(exHist.select(cols.map(col): _*))
      .unionByName(closed)
      .unionByName(adjusted)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
