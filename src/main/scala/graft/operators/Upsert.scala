package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert plans (SURVEY §2.1 S9-S11, §2.3 J1-J3), expressed as DataFrame
  * compositions so Catalyst picks the physical join strategy (broadcast
  * hash when the key side is small, shuffle hash / sort-merge otherwise;
  * AQE may switch at runtime).
  *
  * At 100 TB the target table should be a transactional format with real
  * MERGE; offline, these produce the post-merge state functionally, and
  * [[graft.sources.ParquetTable]] handles atomic overwrite-by-staging.
  */
object Upsert {

  /** Insert-ignore: `INSERT ... ON CONFLICT (key) DO NOTHING`
    * (`monthly_price_paid_data.py:153`) = rows of `updates` whose key is
    * absent from `target`, appended. Dedups updates on the key first
    * (keyed by an arbitrary-but-deterministic min over remaining cols is
    * NOT needed — reference keeps first seen; we keep one row per key via
    * row_number on the given ordering, defaulting to the key itself).
    *
    * Scale note: the anti-join shuffles both sides on the key unless the
    * target's key projection broadcasts; pass `broadcastTarget=true` when
    * the target key set fits in the driver-configured broadcast threshold.
    */
  def insertIgnore(
      target: DataFrame,
      updates: DataFrame,
      key: Seq[String],
      broadcastTarget: Boolean = false): DataFrame = {
    val targetKeys0 = target.select(key.map(col): _*).distinct()
    val targetKeys = if (broadcastTarget) broadcast(targetKeys0) else targetKeys0
    val newRows = updates
      .dropDuplicates(key)
      .join(targetKeys, key, "left_anti")
    target.unionByName(newRows.select(target.columns.map(col).toSeq: _*))
  }

  /** Merge-by-key, latest-wins: `ON CONFLICT (key) DO UPDATE SET ...`
    * (`pull_new_sales_list.py:252-264`). Union target+updates, keep the
    * single row per key that sorts first by `precedence` (e.g.
    * `desc("updated_date")` — ties MUST be broken deterministically by
    * the caller via extra precedence columns).
    */
  def mergeByKey(
      target: DataFrame,
      updates: DataFrame,
      key: Seq[String],
      precedence: Seq[Column]): DataFrame = {
    val unioned = target.unionByName(updates.select(target.columns.map(col).toSeq: _*))
    val w = Window.partitionBy(key.map(col): _*).orderBy(precedence: _*)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keyed update with case-normalized key (`rightmove_outcodes.py:63`:
    * `WHERE lower(outcode) = lower(%s)`): rows of `target` get `setCols`
    * overwritten from `updates` when keys match case-insensitively;
    * unmatched target rows pass through, unmatched updates are dropped
    * (UPDATE semantics, not upsert).
    */
  def updateByNormalizedKey(
      target: DataFrame,
      updates: DataFrame,
      key: String,
      setCols: Seq[String]): DataFrame = {
    val norm = (c: Column) => lower(trim(c))
    val u = updates
      .dropDuplicates(key)
      .select(norm(col(key)).as("__k") +: setCols.map(c => col(c).as(s"__u_$c")): _*)
    val joined = target.join(u, norm(target(key)) === col("__k"), "left")
    val replaced = target.columns.toSeq.map { c =>
      if (setCols.contains(c))
        when(col("__k").isNotNull, col(s"__u_$c")).otherwise(col(c)).as(c)
      else col(c)
    }
    joined.select(replaced: _*)
  }
}
