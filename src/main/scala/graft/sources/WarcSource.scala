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
  * cluster. `spark.read.format("binaryFile")` provides the per-file
  * rows (and pushes a path-glob filter into the listing); record
  * parsing is a per-partition flatMap through [[WarcCodec.parseFile]],
  * so a file's records never materialize anywhere except the one task
  * that owns the file.
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

  /** Read `.warc` / `.warc.gz` archives under a path glob. */
  def read(spark: SparkSession, pathGlob: String): Dataset[WarcRow] = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    fromBytes(files)
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
}
