package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.WarcCodec

/** Distributed WARC reader — crawl archives as a Spark source.
  *
  * The scale contract matches how web-scale corpora actually ship: a
  * crawl is tens of thousands of ~1 GB `.warc.gz` files, each gzipped
  * one-member-per-record and therefore NOT block-splittable — the unit
  * of parallelism is the FILE, one task per archive, which at 100 TB is
  * ~100k tasks: exactly the right granularity for a 1000-executor
  * cluster. Two scale properties hold everywhere:
  *
  *   - [[read]] walks each archive as a STREAM
  *     ([[WarcCodec.parseStream]]): task memory is bounded by one
  *     record, never the file, so a >2 GiB archive is a slow task,
  *     not a crash (the JVM's 2 GiB array cap never applies).
  *   - [[readIndexed]] skips the sequential walk entirely when a CDX
  *     index exists (built once by [[index]]): contiguous member
  *     extents coalesce into ranged splits, so ONE archive fans out
  *     to many tasks and a filtered index (one domain, one URL
  *     pattern) reads only the bytes it names — the 100 TB retrieval
  *     path.
  *
  * Parsing is total on dirty archives (truncated members, malformed
  * records stop that file's walk, keeping what was recovered) — at
  * crawl scale corrupt tails are the normal case, and a poison file
  * must cost its own records only, never the job.
  */
object WarcSource {

  /** One WARC record as a typed row. */
  final case class WarcRow(
      warc_file: String,
      record_index: Int,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      http_status: Option[Int],
      http_content_type: Option[String],
      payload: Array[Byte])

  /** Read `.warc` / `.warc.gz` / `.warc.zst` archives under a path
    * glob: one task per archive, each walked incrementally off the
    * filesystem stream (record-bounded memory).
    */
  def read(spark: SparkSession, pathGlob: String): Dataset[WarcRow] = {
    import spark.implicits._
    val paths = RangedIo.listFiles(spark, pathGlob).map(_._1)
    val conf = RangedIo.confBroadcast(spark)
    spark.createDataset(paths)
      .repartition(math.max(1, math.min(paths.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        // parseStream closes its stream at clean exhaustion, but an
        // early-terminated consumer (LIMIT, take, failed stage)
        // abandons the iterator mid-archive — the task-completion
        // listener sweeps whatever is still open so handles never
        // outlive the task (S3A connections included)
        val open = new java.util.concurrent.ConcurrentLinkedQueue[java.io.InputStream]()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            open.forEach(s =>
              try s.close() catch { case _: java.io.IOException => () })
          })
        it.flatMap { path =>
          val in = RangedIo.openStream(conf.value.value, path)
          open.add(in)
          WarcCodec.parseStream(in).map { r =>
            WarcRow(path, r.recordIndex, r.warcType, r.recordId,
              r.targetUri, r.warcDate, r.contentType, r.contentLength,
              r.httpStatus, r.httpContentType, r.payload)
          }
        }
      }
  }

  /** Parse WARC archives already materialized as (fileName, bytes) —
    * the in-query seam (fixtures, bytes fetched by other operators).
    */
  def fromBytes(files: Dataset[(String, Array[Byte])]): Dataset[WarcRow] = {
    import files.sparkSession.implicits._
    files.mapPartitions { rows =>
      rows.flatMap { case (path, bytes) =>
        WarcCodec.parseFile(bytes).iterator.map { r =>
          WarcRow(path, r.recordIndex, r.warcType, r.recordId, r.targetUri,
            r.warcDate, r.contentType, r.contentLength,
            r.httpStatus, r.httpContentType, r.payload)
        }
      }
    }
  }

  /** The fetched-page view: `response` records with their entity body —
    * the input row shape of the downstream extract→language-ID→quality→
    * dedup chain.
    */
  def responses(records: Dataset[WarcRow]): Dataset[WarcRow] =
    records.filter(col("warc_type") === "response")

  /** One CDX-style index row: where a record lives inside its archive. */
  final case class WarcIndexRow(
      warc_file: String,
      record_index: Int,
      warc_type: String,
      record_id: String,
      target_uri: String,
      offset: Long,
      length: Long)

  /** Build the random-access index of a crawl (the CDX model): per
    * record, the byte extent of its gzip member (or plain-file range).
    * At 100 TB this table IS how single pages are retrieved — a keyed
    * lookup + an `offset/length` range request into the archive,
    * instead of re-scanning a 1 GB file per fetch. Same one-task-per-
    * archive shape as [[fromBytes]]; the index itself is tiny
    * (~100 bytes/record) and joins/sorts like any table.
    */
  def index(files: Dataset[(String, Array[Byte])]): Dataset[WarcIndexRow] = {
    import files.sparkSession.implicits._
    files.mapPartitions { rows =>
      rows.flatMap { case (path, bytes) =>
        WarcCodec.parseFileIndexed(bytes).iterator.map { case (r, off, len) =>
          WarcIndexRow(path, r.recordIndex, r.warcType, r.recordId,
            r.targetUri, off, len)
        }
      }
    }
  }

  /** Extent-driven read: fetch exactly the records a CDX index names,
    * as ranged reads against the archives — no sequential walk, no
    * whole-file materialization. Extents are banded by
    * `offset / splitBytes` per file, so one archive fans out to
    * ~size/splitBytes tasks and each task's read is one contiguous
    * [min(offset), max(offset+length)) window covering its band —
    * per-task memory ≤ splitBytes + one member overshoot. Records are
    * then sliced out of the window by their exact extents, so a
    * FILTERED index (one host, one URL pattern) pays only for the
    * bytes it names plus band padding.
    */
  def readIndexed(index: Dataset[WarcIndexRow],
      splitBytes: Long = 128L << 20): Dataset[WarcRow] = {
    require(splitBytes > 0 && splitBytes <= Int.MaxValue.toLong / 2,
      s"splitBytes $splitBytes out of (0, 1 GiB]")
    val spark = index.sparkSession
    import spark.implicits._
    val conf = RangedIo.confBroadcast(spark)
    index
      .groupByKey(r => (r.warc_file, r.offset / splitBytes))
      .flatMapGroups { (key: (String, Long), rows: Iterator[WarcIndexRow]) =>
        val path = key._1
        // a LYING index row (offset past EOF, runaway length) must cost
        // its own records, never the job — clamp every extent to the
        // file's real length before the ranged read (same stance as
        // WikiSource.pagesIndexed). A FAILED stat is a different case:
        // it propagates so Spark retries the task — mapping it to "no
        // records" would silently drop every indexed record of the
        // archive and the result would look complete while missing data.
        val hConf = conf.value.value
        val p = new org.apache.hadoop.fs.Path(path)
        val fileLen = p.getFileSystem(hConf).getFileStatus(p).getLen
        val es = rows.toVector
          .filter(e => e.offset >= 0 && e.length > 0 &&
            e.offset < fileLen)
          .map(e => if (e.offset + e.length <= fileLen) e
            else e.copy(length = fileLen - e.offset))
          .filter(_.length <= Int.MaxValue.toLong - 16) // a JVM slice must exist
          .sortBy(_.offset)
        def row(e: WarcIndexRow, r: WarcCodec.WarcRecord): WarcRow =
          WarcRow(path, e.record_index, r.warcType, r.recordId,
            r.targetUri, r.warcDate, r.contentType, r.contentLength,
            r.httpStatus, r.httpContentType, r.payload)
        if (es.isEmpty) Iterator.empty
        else {
          val start = es.head.offset
          val end = es.iterator.map(e => e.offset + e.length).max
          if (end - start <= Int.MaxValue.toLong - 16) {
            val buf = RangedIo.readRange(hConf, path, start, end - start)
            es.iterator.flatMap { e =>
              WarcCodec.fetchRecord(buf, e.offset - start, e.length)
                .map(row(e, _))
            }
          } else {
            // a clamped-but-huge extent stretched the band past the
            // 2 GiB slice bound: fall back to one ranged read per
            // extent (each individually bounded above)
            es.iterator.flatMap { e =>
              val buf = RangedIo.readRange(hConf, path, e.offset, e.length)
              WarcCodec.fetchRecord(buf, 0, e.length).map(row(e, _))
            }
          }
        }
      }
  }
}
