package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("txlog")` — the commit-log table as a
  * STREAMING CDC source. Versions are the natural offsets: each
  * micro-batch is exactly the typed change feed of a version range
  * `(from, to]` ([[TxLogTable.changes]] — inserts, update pre/post
  * images, deletes, each stamped `_commit_version`), so a restarted
  * query resumes from its checkpointed version with exactly-once
  * ranges and no state beyond one long. The pattern is the public
  * Delta/Kafka V1 source design: `getOffset` = current table version,
  * `getBatch` = plan the feed range as a streaming-flagged frame.
  *
  * Options: `startingVersion` — first version whose changes are
  * included (`"earliest"` = from table creation; default = only
  * commits AFTER stream start, the tail-the-table mode).
  *
  * Schema evolution while the stream runs: a Structured Streaming V1
  * source's schema is FIXED into the query plan at stream start, so a
  * column added by a later evolved append cannot appear as a real
  * column without a restart (the Delta CDF streaming contract too).
  * RENAMES are the exception: with column mapping
  * ([[TxLogTable.renameColumn]]) the physical name is stable, so a
  * renamed column is recognized as its stream-schema twin and keeps
  * flowing under the stream-start name — no restart, no mode, no
  * nulls. A mid-stream [[TxLogTable.widenColumn]] STOPS the stream
  * with a restart-required error on the first batch carrying the wide
  * type: the fixed stream schema is still narrow, and a silent
  * down-cast would wrap out-of-range values into corrupted change
  * rows (the Delta CDF contract — restart to adopt the wide type).
  * Genuinely NEW columns follow three behaviors, per the
  * `onSchemaEvolution` option:
  *   - `"ignore"` (default) — post-start columns are invisible until
  *     the stream restarts;
  *   - `"fail"` — the first batch containing an unknown column stops
  *     the stream with a descriptive error (pick this when silently
  *     dropping a column is worse than paging someone);
  *   - `"evolved"` — the feed schema gains an `_evolved
  *     map<string,string>` column, and every post-start column
  *     surfaces there (stringified) from its admission batch onward,
  *     NO restart — the consumer opts into weak typing for the gap
  *     columns instead of downtime.
  *
  * Scale shape: offset discovery is one manifest-header read; a batch
  * plans only the CDC/add dirs of its version range (never rescans
  * the table), and the heavy lifting stays in the parquet scan of
  * exactly those files. Downstream this composes with everything
  * Structured Streaming offers — watermarked aggs, stream-stream
  * joins, `foreachBatch` merges into OTHER txlog tables (incremental
  * view maintenance end-to-end).
  */
final class TxLogChangeSource(spark: SparkSession, root: String,
    startExclusive: Long, maxVersionsPerBatch: Option[Long] = None,
    onSchemaEvolution: String = "ignore",
    maxBytesPerBatch: Option[Long] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  require(Set("ignore", "fail", "evolved")(onSchemaEvolution),
    s"onSchemaEvolution must be ignore|fail|evolved, got $onSchemaEvolution")
  require(maxBytesPerBatch.forall(_ > 0L),
    "maxBytesPerBatch must be positive")

  private val table = new TxLogTable(spark, root)

  // Admission control: a stream catching up on a long-lived table must
  // not plan ONE batch over thousands of versions. The cap rides on
  // the last batch end this instance handed out (the V1
  // FileStreamSource maxFilesPerTrigger pattern) — after a restart the
  // first getBatch re-seeds it from the checkpointed start offset.
  // `maxBytesPerBatch` additionally bounds the batch by the ON-DISK
  // bytes of the admitted versions' change dirs (the Delta
  // maxBytesPerTrigger idea) — a backfill over a few huge commits
  // stays memory-shaped even when the version count is tiny. Both
  // caps are soft floors-of-one: a single version always admits, so
  // the stream can never wedge on one oversized commit. Composes with
  // `Trigger.AvailableNow` (Spark's V1 AvailableNowSourceWrapper
  // caps each batch at the source's own getOffset and terminates at
  // the memoized end) — the production backfill shape: bounded
  // batches, then stop.
  @volatile private var lastEnd: Long = startExclusive

  /** On-disk bytes of one version's change payload (immutable once
    * committed — cached), as [[getBatch]] would plan it.
    */
  private val verBytes = new java.util.concurrent.ConcurrentHashMap[
    java.lang.Long, java.lang.Long]()
  private def changeBytes(v: Long): Long =
    verBytes.computeIfAbsent(v, _ => table.changePayloadBytes(v))

  // the mapping in force when this source instance fixed its schema —
  // what makes mid-stream RENAMES transparent below (physical names
  // are stable, so a renamed column is recognized, not "new")
  private val startVersion: Long = table.currentVersion
  private val startMap: Map[String, String] = table.colMapAt(startVersion)

  override val schema: StructType = {
    val base = TxLogStream.changeSchema(table)
    if (onSchemaEvolution == "evolved")
      base.add("_evolved", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType), nullable = true)
    else base
  }

  /** Version ceiling memoized at `Trigger.AvailableNow` start: the
    * query drains commits up to HERE in cap-bounded batches, then
    * terminates (the FileStreamSource SupportsTriggerAvailableNow
    * contract — implementing it directly keeps the engine from
    * wrapping this source and freezing the FIRST capped offset as
    * the terminal end, which would drop the backfill's tail).
    */
  @volatile private var availableEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableEnd = Some(table.currentVersion)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** Next batch end under the admission caps, from floor `from`
    * (exclusive); -Long when nothing to admit.
    */
  private def cappedEnd(from: Long): Long = {
    val cv = availableEnd.fold(table.currentVersion)(
      e => math.min(e, table.currentVersion))
    var capped = maxVersionsPerBatch.fold(cv)(m => math.min(cv, from + m))
    maxBytesPerBatch.foreach { cap =>
      // admit versions until the byte budget is spent; always at
      // least one so progress is guaranteed
      var end = from
      var budget = cap
      var done = false
      while (!done && end < capped) {
        val b = changeBytes(end + 1)
        if (b <= budget || end == from) { end += 1; budget -= b }
        else done = true
      }
      capped = end
    }
    capped
  }

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    if (start != null) lastEnd = math.max(lastEnd, start.json.trim.toLong)
    val from = math.max(lastEnd, startExclusive)
    val capped = cappedEnd(from)
    if (capped <= from) null else LongOffset(capped)
  }

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val cv = table.currentVersion
    if (cv <= startExclusive) null else LongOffset(cv)
  }

  override def getOffset: Option[V1Offset] = {
    val capped = cappedEnd(math.max(lastEnd, startExclusive))
    if (capped <= startExclusive) None else Some(LongOffset(capped))
  }

  // LongOffset serializes as its bare number, so parsing `json` covers
  // both the live object and the checkpoint-recovered SerializedOffset
  private def ver(o: V1Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startExclusive)
    // `end < from` can only happen when a restart's first getOffset ran
    // before the cap re-seeded from the checkpoint (commit below); an
    // empty batch re-seeds it and the stream proceeds from `from`.
    val to = math.max(from, ver(end))
    lastEnd = math.max(lastEnd, to)
    val raw = table.changes(from, to)
    val have = raw.columns.toSet
    val known = schema.fieldNames.toSet
    // columns the stream schema does NOT know, split two ways:
    // a RENAMED column shares its stable physical name with a known
    // column (column mapping) — it is the same data under a new
    // logical name and folds back into its stream-schema column below,
    // NO restart, NO mode needed; only genuinely NEW columns follow
    // the onSchemaEvolution modes
    val unknown0 = raw.columns.toIndexedSeq.filterNot(known)
    val physToStream: Map[String, String] =
      schema.fieldNames.iterator
        .map(k => startMap.getOrElse(k, k) -> k).toMap
    // resolve each unknown through the mapping of a version IN THIS
    // RANGE whose schema carries it — the batch-end map alone would
    // miss an intermediate name when the same column renamed twice
    // inside one catch-up range (its rows would silently null out).
    // The walk is bounded by the admission cap (maxVersionsPerBatch).
    lazy val rangeMaps: Seq[(Set[String], Map[String, String])] =
      ((from + 1) to to).map(vv =>
        (table.schemaAt(vv).fieldNames.toSet, table.colMapAt(vv)))
    val renamedTwin: Map[String, String] = unknown0.flatMap { u =>
      val phys = rangeMaps
        .collectFirst { case (names, cm) if names(u) => cm.getOrElse(u, u) }
        .getOrElse(table.colMapAt(to).getOrElse(u, u))
      physToStream.get(phys).map(u -> _)
    }.toMap
    // stream name -> ALL its renamed twins in this range (a double
    // rename inside one range yields two), ordered as raw's columns
    val twinsOf: Map[String, Seq[String]] =
      renamedTwin.toSeq.groupMap(_._2)(_._1)
        .view.mapValues(_.sortBy(u => raw.columns.indexOf(u))).toMap
    val unknown = unknown0.filterNot(renamedTwin.contains)
    if (unknown.nonEmpty && onSchemaEvolution == "fail")
      throw new IllegalStateException(
        s"txlog CDC stream on $root: schema evolved mid-stream " +
          s"(new columns: ${unknown.mkString(", ")}); restart the " +
          "stream to pick them up, or run with " +
          "onSchemaEvolution=evolved/ignore")
    // A capped catch-up batch may cover only versions that predate a
    // schema-evolution append, so its frame can LACK columns of the
    // stream schema (and early batches the reverse). Conform by name:
    // project the stream schema, null-filling absent fields with their
    // declared type; in `evolved` mode the unknown columns surface in
    // the _evolved map from this batch on instead of waiting for a
    // restart.
    import org.apache.spark.sql.functions.{lit, map_from_arrays, array}
    // one manifest read for the whole batch, consulted only when a
    // stream-schema column is absent from the frame
    lazy val droppedAtEnd = table.droppedColsAt(to)
    val cols = schema.fields.toIndexedSeq.map { f =>
      if (f.name == "_evolved" && onSchemaEvolution == "evolved") {
        if (unknown.isEmpty)
          lit(null).cast("map<string,string>").as("_evolved")
        else map_from_arrays(
          array(unknown.map(lit): _*),
          array(unknown.map(c => col(c).cast("string")): _*))
          .as("_evolved")
      }
      else twinsOf.get(f.name) match {
        // a rename inside the range union-pads each name with nulls
        // over disjoint version sub-ranges; coalescing ALL twins under
        // the stream-schema name reconstructs the continuous column
        // (a double rename in one range yields two twins)
        case Some(us) =>
          val legs = (if (have(f.name)) Seq(col(f.name)) else Nil) ++
            us.map(u => col(u).cast(f.dataType))
          org.apache.spark.sql.functions.coalesce(legs: _*).as(f.name)
        // a mid-stream widenColumn means the batch arrives WIDER than
        // the fixed stream schema; the default non-ANSI cast would
        // silently WRAP out-of-range values into corrupted change rows
        // — fail the batch with a restart-required error instead (the
        // Delta CDF contract: a schema change the fixed stream schema
        // cannot represent faithfully stops the stream)
        case None if have(f.name) =>
          val rawType = raw.schema(f.name).dataType
          if (TxLogTable.widens(f.dataType, rawType))
            throw new IllegalStateException(
              s"txlog CDC stream on $root: column '${f.name}' was " +
                s"widened mid-stream (${f.dataType.simpleString} -> " +
                s"${rawType.simpleString}); restart the stream to adopt " +
                "the wide type — casting down could silently corrupt " +
                "out-of-range values")
          col(f.name).cast(f.dataType).as(f.name)
        // a mid-stream dropColumn: the fixed stream schema still
        // carries the column but the table no longer does — null-
        // filling would silently feed data loss to the consumer, so
        // stop with a restart-required error (the same contract as
        // widen). Distinguished from a column that does not exist YET
        // (capped pre-evolution catch-up: null-fill is correct) by the
        // tombstone set at the batch-end version.
        case None if droppedAtEnd.contains(
            startMap.getOrElse(f.name, f.name)) =>
          throw new IllegalStateException(
            s"txlog CDC stream on $root: column '${f.name}' was " +
              "DROPPED mid-stream; restart the stream to adopt the " +
              "narrowed schema — null-filling would silently hide the " +
              "drop from the consumer")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    val changes = raw.select(cols: _*)
    org.apache.spark.sql.graft.bridge.replanned(changes, isStreaming = true)
  }

  // called by the engine after each completed batch AND with the
  // checkpointed offset on restart — the reliable cap re-seed
  override def commit(end: V1Offset): Unit =
    lastEnd = math.max(lastEnd, ver(end))

  override def stop(): Unit = ()
}

/** `df.writeStream.format("txlog")` — append sink with exactly-once
  * batch replay: every commit carries the micro-batch id as a marker,
  * and a replayed batch (failure between commit and checkpoint
  * advance) is recognized and skipped. Writer options `statsCols` /
  * `bloomCols` / `sortCols` apply per commit, same as the batch
  * writer; `checkpointEvery=N` folds the manifest chain whenever it
  * grows past N commits ([[TxLogTable.maybeCheckpoint]]) — without
  * it, a long-lived micro-batch stream accretes one manifest per
  * trigger and every reader's chain walk grows with stream age.
  * Single-stream-per-table (the marker is the dedup line); concurrent
  * BATCH writers still serialize through the version protocol as
  * usual.
  */
final class TxLogAppendSink(spark: SparkSession, root: String,
    parameters: Map[String, String]) extends Sink {

  private val table = new TxLogTable(spark, root)
  private def csv(key: String): Seq[String] =
    parameters.get(key).toSeq.flatMap(_.split(",")).map(_.trim)
      .filter(_.nonEmpty)
  private val checkpointEvery: Option[Int] =
    parameters.get("checkpointEvery").map(_.trim.toInt)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val done = table.marker(TxLogStream.SinkBatchMarker)
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(-1L)
    if (batchId <= done) return // exact replay of a committed batch
    val batchDf = org.apache.spark.sql.graft.bridge
      .replanned(data, isStreaming = false)
    table.ensureExists(batchDf.schema)
    table.append(batchDf, sortCols = csv("sortCols"),
      statsCols = csv("statsCols"), bloomCols = csv("bloomCols"),
      markers = Map(TxLogStream.SinkBatchMarker -> batchId.toString))
    checkpointEvery.foreach(n => table.maybeCheckpoint(n))
  }
}

object TxLogStream {
  val SinkBatchMarker = "_graft_sink_batch_id"

  /** Feed schema: the table's columns (nullable, as parquet reads
    * them) + the CDC columns. Fixed at stream start; columns added by
    * later schema evolution surface after a restart.
    */
  def changeSchema(table: TxLogTable): StructType = {
    val base = TxLogRelation
      .asNullable(table.schemaAt(table.currentVersion))
      .asInstanceOf[StructType]
    base.add("_change_type", "string", nullable = true)
      .add("_commit_version", "long", nullable = true)
  }
}
