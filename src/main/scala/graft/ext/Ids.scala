package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed identifier assignment.
  *
  * The naive global row number — `row_number().over(Window.orderBy(…))`
  * with no partition — drags the ENTIRE dataset through one task (Spark
  * plans an `Exchange SinglePartition`): the canonical scale trap for
  * "assign doc ids at ingest". [[globalRowNumber]] is the two-phase
  * fix: range-partition by the order, count rows per partition (one
  * tiny job whose result is nPartitions longs on the driver), broadcast
  * the prefix offsets, then number within partitions and add the
  * offset. Every stage is parallel; the only driver state is the
  * offset array.
  */
object Ids {

  /** Gapless, deterministic 1-based `outCol` numbering of `df` by the
    * total order `orderCols` (callers must pass a TOTAL order — add a
    * unique tiebreak column if the prefix can tie, or equal rows get an
    * arbitrary but stable relative order within a partition).
    *
    * The frame is `localCheckpoint`ed after range partitioning so the
    * counting job and the numbering job see the SAME partition bounds
    * (range sampling re-executed on a re-evaluated plan is not
    * guaranteed to cut identically).
    */
  def globalRowNumber(
      df: DataFrame,
      orderCols: Seq[String],
      outCol: String = "row_num"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must name a total order")
    val ord = orderCols.map(col)
    val parted = df.repartitionByRange(ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = parted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      val sorted = counts.toSeq.sortBy(_._1)
      sorted.map(_._1)
        .zip(sorted.map(_._2).scanLeft(0L)(_ + _))
        .toMap
    }
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    parted
      .withColumn(outCol,
        row_number().over(w).cast("long") +
          coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)))
      .drop("__pid")
  }
}
