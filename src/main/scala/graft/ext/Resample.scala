package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket a keyed event stream and FILL
  * THE GAPS — downstream models and monitors need "0 events this
  * hour" as a row, not an absence (the classic resample/asfreq step;
  * a plain groupBy silently drops empty buckets).
  *
  * Scale shape: bucket assignment is scan-stage integer arithmetic;
  * the dense bucket spine is generated PER KEY from that key's own
  * [min, max] span (`sequence` + explode — no global calendar join,
  * no cross join), and the fill is a left join keyed (key, bucket)
  * that reuses the aggregation's partitioning. Spine volume is
  * Σ span/bucket per key — bounded by the dial, independent of event
  * count. All-integer bucket math ⇒ exactly oracle-able.
  */
object Resample {

  /** (keyCol, bucket_start, n_events) with one row per `bucketUs`-wide
    * bucket from each key's first to last event, zero-filled.
    * `tsUsCol` is µs-since-epoch (longs); `bucket_start` likewise.
    *
    * Timestamps must be NON-NEGATIVE (i.e. post-1970): Spark's `DIV`
    * truncates toward zero while floor-division engines (DuckDB `//`)
    * floor, so pre-epoch values would bucket differently by engine.
    * Shift the column before calling if the domain needs it.
    */
  def fillGaps(
      df: DataFrame,
      keyCol: String,
      tsUsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val counts = df
      .select(col(keyCol),
        expr(s"($tsUsCol DIV $bucketUs) * $bucketUs").as("bucket_start"))
      .groupBy(col(keyCol), col("bucket_start"))
      .agg(count(lit(1)).as("__n"))
    val spine = counts
      .groupBy(col(keyCol))
      .agg(min(col("bucket_start")).as("__lo"), max(col("bucket_start")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(bucketUs)))
          .as("bucket_start"))
    spine.join(counts, Seq(keyCol, "bucket_start"), "left")
      .select(col(keyCol), col("bucket_start"),
        coalesce(col("__n"), lit(0L)).as("n_events"))
  }
}
