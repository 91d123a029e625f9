package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row (key, t), the single right
  * row with the greatest t' ≤ t for the same key. The classic
  * time-series operator Spark lacks natively (builder brief's canonical
  * example of a custom operator).
  *
  * Spark-first composition (preference (a) of the brief — no custom
  * physical operator needed): tag and union both sides, sort within key
  * by (time, side) so right rows precede left rows at equal timestamps
  * (inclusive match), then carry the right columns forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding frame and keep
  * the left rows. Cost: ONE shuffle on the key — same as the
  * sort-merge join an engine-native as-of operator would do; no range
  * explosion, no per-key collect.
  */
object AsOfJoin {

  /** @param rightCols right-side value columns to carry; emitted with a
    *                   `asof_` prefix
    * @param leftOuter  keep unmatched left rows (nulls in carried cols)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: Column,
      rightTime: Column,
      rightCols: Seq[String],
      leftOuter: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .select((key.map(col) ++ Seq(col("__t"), col("__side")) ++
        leftCols.filterNot(key.contains).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c"))): _*)
    val r = right
      .withColumn("__t", rightTime)
      .withColumn("__side", lit(0))
      .select((key.map(col) ++ Seq(col("__t"), col("__side")) ++
        leftCols.filterNot(key.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"asof_$c"))): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    val leftRows = carried.filter(col("__side") === 1).drop("__t", "__side")
    if (leftOuter) leftRows
    else leftRows.na.drop(rightCols.map(c => s"asof_$c"))
  }
}
