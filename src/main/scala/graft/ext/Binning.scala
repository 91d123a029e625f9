package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth (quantile) feature binning — the discretization step of
  * feature engineering / calibration curves / per-tier sampling:
  * bucket i holds ≈ 1/nBins of the mass, boundaries at the
  * (i/nBins)-quantiles.
  *
  * Scale shape: cutpoints are ONE aggregate returning nBins−1 doubles
  * to the driver (the q63 eager-build contract), then assignment is a
  * pure scan-stage when-chain — no shuffle of the data, no join. At
  * 100 TB flip `exact = false`: `approx_percentile` is a mergeable
  * one-pass sketch with bounded rank error, while exact `percentile`
  * materializes per-group sorted state — the classic
  * accuracy-for-memory dial, same shape as q36 vs q47.
  *
  * Boundary rule (oracle-pinned): value v lands in bucket
  * `1 + #{cutpoints c : c ≤ v}` — left-closed buckets, values equal to
  * a cutpoint go UP, bucket ids 1..nBins.
  */
object Binning {

  /** The nBins−1 interior quantile cutpoints of `valueCol`. Eager.
    * Rejects an empty / all-null column explicitly (percentile returns
    * SQL NULL there, which would otherwise surface as an opaque NPE).
    */
  def cutpoints(
      df: DataFrame,
      valueCol: String,
      nBins: Int,
      exact: Boolean = true): Seq[Double] = {
    require(nBins >= 2, "nBins must be at least 2")
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val fn = if (exact) "percentile" else "approx_percentile"
    val arr = s"array(${ps.mkString(", ")})"
    val cs = df.agg(expr(s"$fn($valueCol, $arr)").as("cs"))
      .head().getSeq[Double](0)
    require(cs != null,
      s"cutpoints($valueCol): no non-null values to bin")
    cs.toSeq
  }

  /** Bucket-assignment column for the given cutpoints (1-based);
    * null values map to null, never to a bucket.
    */
  def bucketFor(value: Column, cuts: Seq[Double]): Column = {
    val assigned = cuts.zipWithIndex.foldRight(lit(cuts.length + 1): Column) {
      case ((c, i), acc) => when(value < c, lit(i + 1)).otherwise(acc)
    }
    when(value.isNull, lit(null).cast("int")).otherwise(assigned)
  }

  /** `df` plus `bucketCol` ∈ 1..nBins assigned by equi-depth cutpoints
    * of `valueCol`.
    */
  def equiDepth(
      df: DataFrame,
      valueCol: String,
      bucketCol: String,
      nBins: Int,
      exact: Boolean = true): DataFrame =
    df.withColumn(bucketCol,
      bucketFor(col(valueCol), cutpoints(df, valueCol, nBins, exact)))
}
