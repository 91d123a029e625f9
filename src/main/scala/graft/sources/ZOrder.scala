package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-layout
  * lever for multi-column pruning at scale: interleaving the bits of k
  * range-bucketed columns gives one sort key under which rows close in
  * ANY dimension land close on disk, so parquet min/max stats prune a
  * k-dimensional box predicate to a small file subset. Sorting by
  * (a, b) lexicographically only clusters `a`; z-order clusters both —
  * the reason Delta/Iceberg OPTIMIZE ZORDER exists, expressed here as
  * plain Spark: a pure-arithmetic z-value projection (codegen,
  * scan-stage) + repartitionByRange + sortWithinPartitions.
  *
  * Bucketing is linear min/max → [0, 2^bits): two scalar aggregates per
  * column on the driver (bounded, same contract as IVF centroids). For
  * heavily skewed columns substitute equi-depth buckets
  * (approx_percentile cuts) — the interleave is unchanged.
  */
object ZOrder {

  /** Morton-interleave k already-bucketed columns (each in
    * [0, 2^bits)): bit j of column i lands at position j·k + i. Pure
    * integer shifts/masks — whole-stage codegen, no UDF.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits >= 1 && bits * buckets.size <= 63)
    val k = buckets.size
    val terms = for {
      j <- 0 until bits
      (c, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ + _)
  }

  /** Linear range bucket of a numeric column into [0, 2^bits) given its
    * min/max. Exact double floor (inputs < 2^40) — engine-portable.
    */
  def rangeBucket(c: Column, min: Long, max: Long, bits: Int): Column = {
    val buckets = 1L << bits
    if (max <= min) lit(0L)
    else floor((c - lit(min)).cast("double") * buckets /
      (lit(max) - lit(min) + 1L).cast("double")).cast("long")
  }

  /** Order-preserving long key of a cluster column: numerics cast;
    * STRINGS map through their first-7-bytes UTF-8 prefix read as a
    * base-16 integer, zero-padded on the right — numeric order of the
    * key equals UTF-8 byte order of the string (= Spark's binary
    * string ordering), so range bucketing (and therefore z-range
    * pruning on parquet min/max) works for string dimensions exactly
    * as for numeric ones. Nulls key to 0 (parquet min/max treats
    * nulls separately anyway — IsNull pruning is the nulls path).
    */
  private[graft] def orderKey(c: Column,
      dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case _: org.apache.spark.sql.types.StringType =>
      coalesce(
        conv(rpad(hex(substring(encode(c, "UTF-8"), 1, 7)), 14, "0"),
          16, 10).cast("long"),
        lit(0L))
    case _ => coalesce(c.cast("long"), lit(0L))
  }

  /** Append a `zval` column interleaving `cols` (numeric or string),
    * bucketed to `bits` each by their observed min/max.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val keys = cols.map(c => orderKey(col(c), df.schema(c).dataType))
    val aggs = keys.zipWithIndex.flatMap { case (k, i) =>
      Seq(min(k).as(s"__min_$i"), max(k).as(s"__max_$i"))
    }
    val mm = df.agg(aggs.head, aggs.tail: _*).collect().head
    require(!mm.anyNull,
      "ZOrder.withZValue: input has no rows — min/max bucketing is " +
        "undefined on an empty frame")
    val buckets = keys.zipWithIndex.map { case (k, i) =>
      rangeBucket(k, mm.getLong(2 * i), mm.getLong(2 * i + 1), bits)
    }
    df.withColumn("zval", interleave(buckets, bits))
  }

  /** Cluster `df` into `nFiles` z-ordered output partitions: range
    * partition on the z-value (so each file owns a contiguous z-range,
    * which is what makes min/max stats selective) and sort within.
    * Write the result with any sink; pruning needs no reader support
    * beyond ordinary parquet column stats.
    */
  def layoutBy(df: DataFrame, cols: Seq[String], bits: Int,
      nFiles: Int): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
}
