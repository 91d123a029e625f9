package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{Clean, Upsert}
import graft.sources.ParquetTable

/** Streaming semantics (SURVEY §2.9): the reference's chunked-HTTP
  * micro-batch ingest (T1), idempotent incremental replay (T2), and the
  * event-time windowed aggregations the engine adds over the `events`
  * stream — watermarks bound all state (SURVEY §7 hard-part #5).
  *
  * Batch/stream parity by construction: every transformation here is a
  * `DataFrame => DataFrame` that works on both batch and streaming
  * frames — the batch twin of [[windowedAgg]] backs oracle query
  * q16_event_window, so streaming correctness is anchored to the same
  * DuckDB-checked plan.
  */
object EventStreams {

  /** Tumbling event-time aggregation, shared batch/stream. */
  def windowedAgg(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Watermarked streaming variant: state for windows older than the
    * watermark is evicted — bounded memory at any volume.
    */
  def windowedAggStream(events: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark), windowLen)

  /** Streaming dedup with bounded state: duplicates arriving within the
    * watermark horizon are dropped; state beyond it is evicted (the
    * streaming analogue of the insert-ignore key check — at 100 TB/day
    * an unbounded `dropDuplicates` state would OOM, this cannot).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** T1: the bulk-CSV micro-batch ingest as a real stream — file source
    * over a staged download dir, `Trigger.AvailableNow` (process all
    * pending files, then stop: exactly the reference's
    * "stream-until-EOF" loop), per-batch clean + insert-ignore upsert
    * via foreachBatch. The reference's duplicated tail-flush logic
    * (`initial_price_paid_data.py:149-174`) does not exist here — the
    * final partial batch is just another micro-batch.
    */
  def ingestPricePaidStream(
      spark: SparkSession,
      csvDir: String,
      schema: StructType,
      table: ParquetTable,
      checkpointDir: String,
      oxOnly: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(schema)
      .option("header", "false")
      .csv(csvDir)
    raw.writeStream
      .queryName("price_paid_ingest")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cleaned0 = Clean.pricePaid(batch)
        val cleaned = if (oxOnly) Clean.oxfordOnly(cleaned0) else cleaned0
        val aligned = cleaned.select(
          table.read().columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
        val merged = Upsert.insertIgnore(
          table.read(), aligned, Seq("transaction_unique_identifier"))
        table.overwriteAtomic(merged, sortCols = Seq("postcode"))
        ()
      }
      .start()
  }
}
