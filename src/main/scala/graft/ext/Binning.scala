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
    *
    * The exact path does NOT call catalyst's `percentile` aggregate:
    * that operator accumulates a value→count OpenHashMap per partition
    * and merges every distinct value into ONE final task (per-task
    * state ∝ distinct values — guide §5's "per-task state too large"
    * shape, and 3.4 s of the 3.5 s q74 wall at sf0.1). Instead it runs
    * one distributed range-partitioned sort, fetches only the ≤
    * 2·(nBins−1) rows sitting at the interpolation ranks, and replays
    * catalyst Percentile's own interpolation arithmetic driver-side —
    * `position = p·(n−1)`, result `(higher−pos)·lowerKey +
    * (pos−lower)·higherKey` with the equal-key and lower==higher
    * short-circuits — so the cutpoint DOUBLES are bit-identical to the
    * aggregate's (BinningSpec pins the equality against `percentile`).
    * Per-task state is now a sort run, spillable and scale-free.
    */
  def cutpoints(
      df: DataFrame,
      valueCol: String,
      nBins: Int,
      exact: Boolean = true): Seq[Double] = {
    require(nBins >= 2, "nBins must be at least 2")
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    if (!exact) {
      val arr = s"array(${ps.mkString(", ")})"
      val cs = df.agg(expr(s"approx_percentile($valueCol, $arr)").as("cs"))
        .head().getSeq[Double](0)
      require(cs != null,
        s"cutpoints($valueCol): no non-null values to bin")
      return cs.toSeq
    }
    // numeric→double up front: same sort order and the same values
    // Percentile interpolates on (its toDoubleValue conversion)
    val vals = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val ranked = Ids.globalRowNumber(vals, Seq("__v"), "__rk")
    // n from the already-checkpointed ranked frame (no second scan of
    // the source); empty input surfaces as the same require as before
    val nRow = ranked.agg(max(col("__rk"))).head()
    require(!nRow.isNullAt(0),
      s"cutpoints($valueCol): no non-null values to bin")
    val n = nRow.getLong(0)
    val wanted: Seq[Long] = ps.flatMap { p =>
      val pos = p * (n - 1)
      Seq(math.floor(pos).toLong + 1, math.ceil(pos).toLong + 1)
    }.distinct
    val byRank: Map[Long, Double] = ranked
      .filter(col("__rk").isin(wanted: _*))
      .select(col("__rk"), col("__v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ps.map { p =>
      val pos = p * (n - 1)
      val lower = math.floor(pos).toLong
      val higher = math.ceil(pos).toLong
      val lk = byRank(lower + 1)
      if (lower == higher) lk
      else {
        val hk = byRank(higher + 1)
        // catalyst Percentile.getPercentile's exact arithmetic
        if (hk == lk) lk else (higher - pos) * lk + (pos - lower) * hk
      }
    }
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
