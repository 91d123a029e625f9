package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{CharsetDetect, MainContent, UrlFunctions,
  TextFunctions => T}
import graft.functions.WarcCodec

/** Continuous crawl ingest — the streaming twin of
  * [[graft.jobs.CrawlJobs]].ingest's parse_extract stage: archives
  * LANDING in a directory (the shape a fetch fleet produces) stream
  * through the WARC walk → charset decode → main-content extraction →
  * language/quality/token annotation into the transactional documents
  * table, exactly once.
  *
  * Spark-first composition, no custom glue: the `binaryFile` file
  * source discovers new archives per micro-batch (maxFilesPerTrigger =
  * commit granularity = retry granularity, the
  * [[EventStreams.ingestPricePaidStream]] dial), the transform chain is
  * ordinary typed flatMap + Column work, and the sink is the registered
  * `txlog` streaming sink whose batch-id replay dedup makes crash/
  * restart exactly-once (TxLogStreamSpec's kill-and-resume contract).
  * One archive never splits across tasks (binaryFile = one row per
  * file), so a poison archive costs its own records only.
  */
object CrawlStreams {

  /** @param warcDir   landing directory (glob) of `.warc(.gz/.zst)` files
    * @param tableRoot txlog documents table root
    * @param checkpointDir streaming checkpoint (one lineage per table —
    *                  delete both together, never just the checkpoint)
    * @param maxFilesPerBatch archives per micro-batch
    * @param availableNow true = drain pending then stop (the batch
    *                  backfill trigger); false = continuous
    */
  def ingestWarcStream(
      spark: SparkSession,
      warcDir: String,
      tableRoot: String,
      checkpointDir: String,
      maxFilesPerBatch: Int = 16,
      availableNow: Boolean = true): StreamingQuery = {
    import spark.implicits._
    // binaryFile's schema is fixed by the format, but the STREAMING
    // source requires it stated explicitly
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val raw = spark.readStream
      .format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerBatch)
      .load(warcDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val pages = raw.flatMap { case (_, bytes) =>
      WarcCodec.parseFile(bytes).iterator
        .filter(r => r.warcType == "response" && r.httpStatus.contains(200))
        .map { r =>
          val d = CharsetDetect.decode(r.payload, r.httpContentType)
          (r.targetUri, d.charset, MainContent.extract(d.text))
        }
    }.toDF("url", "charset", "main_text")
    val docs = pages
      .withColumn("doc_id", xxhash64(col("url")))
      .withColumn("source",
        UrlFunctions.registrableDomain(UrlFunctions.host(col("url"))))
      .withColumn("lang", T.langId(col("main_text")))
      .withColumn("quality", T.qualityScore(col("main_text")))
      .withColumn("n_tokens", T.tokenCount(col("main_text")))
    val writer = docs.writeStream
      .queryName("crawl_ingest_stream")
      .format("txlog")
      .option("path", tableRoot)
      .option("checkpointLocation", checkpointDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Streaming WET/WAT derivation over the same landing directory —
    * the distribution companions keep pace with ingest instead of
    * waiting for a batch pass. One stream, one checkpoint, TWO txlog
    * tables: `foreachBatch` derives both row shapes from the batch's
    * archives and appends each under the SAME batch id, so the txlog
    * replay-dedup marker makes the pair exactly-once together (a crash
    * between the two appends replays the batch and the already-written
    * side dedups).
    */
  def wetWatStream(
      spark: SparkSession,
      warcDir: String,
      wetRoot: String,
      watRoot: String,
      checkpointDir: String,
      maxFilesPerBatch: Int = 16,
      availableNow: Boolean = true): StreamingQuery = {
    import spark.implicits._
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val raw = spark.readStream
      .format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerBatch)
      .load(warcDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val writer = raw.writeStream
      .queryName("crawl_wet_wat_stream")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Array[Byte])],
          batchId: Long) =>
        // per-table marker dedup, the TxLogAppendSink recipe: a crash
        // between the two appends replays the batch; the side already
        // carrying this batch id skips
        def appendOnce(root: String,
            df: org.apache.spark.sql.DataFrame): Unit = {
          val table = new graft.sources.TxLogTable(spark, root)
          val done = table.marker(graft.sources.TxLogStream.SinkBatchMarker)
            .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(-1L)
          if (batchId <= done) return
          table.ensureExists(df.schema)
          table.append(df, markers = Map(
            graft.sources.TxLogStream.SinkBatchMarker -> batchId.toString))
        }
        val responses = graft.sources.WarcSource.responses(
          graft.sources.WarcSource.fromBytes(batch))
        appendOnce(wetRoot, graft.sources.WarcDerive.wet(responses).toDF())
        appendOnce(watRoot, graft.sources.WarcDerive.wat(responses).toDF())
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
