package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Bzip2Codec, WikiDump}

/** Wikipedia dump SOURCE — turns `pages-articles*.xml.bz2` archives
  * into a documents-shaped DataFrame, the front door for the most
  * common open-corpus seed.
  *
  * Scale shape — INTRA-file parallelism, not one-array-per-archive:
  * Wikipedia's multistream dumps concatenate ~100-page bzip2 streams
  * precisely so readers can split them (a single real dump is ~20 GB
  * — far past the 2 GiB JVM array cap, so whole-file materialization
  * is a hard ceiling, not just a slow path). The read is three
  * declarative stages, all distributed:
  *
  *   1. SCAN: files are listed (names+lengths only) and carved into
  *      fixed scan chunks; one task per chunk ranged-reads its window
  *      and finds byte-aligned stream signatures
  *      ([[Bzip2Codec.signatureOffsets]] — `BZh[1-9]` + the 48-bit
  *      block magic, no decode needed). Chunks overlap by the
  *      signature width; an offset is owned by the chunk containing
  *      its first byte, so the union is exact and duplicate-free.
  *   2. EXTENTS: per file, `lead(offset)` over an offset-ordered
  *      window turns split points into (offset, length) extents —
  *      one tiny-row shuffle.
  *   3. DECODE: one task per stream extent ranged-reads its window,
  *      inflates it through [[Bzip2Codec]] and walks pages with
  *      [[WikiDump]]. Task memory is bounded by ONE stream
  *      (~1 MB compressed in real dumps), never the archive.
  *
  * When the published companion index
  * (`…-multistream-index.txt.bz2`) is available, [[pagesIndexed]]
  * uses its authoritative offsets instead of the signature scan and
  * skips stage 1 entirely.
  *
  * The multistream contract (pages never straddle streams — the
  * format exists so each stream is independently decodable) is what
  * makes per-stream page walks exact; a single-stream archive
  * degrades to one extent per file, the previous behavior.
  * Redirect pages carry their target and empty text — filter on
  * `redirect IS NULL` for content-only corpora.
  */
object WikiSource {

  /** Ranged-scan unit for signature discovery: large enough that a
    * 20 GB dump is ~600 scan tasks, small enough to stay far from the
    * array cap and inside executor memory.
    */
  private val ScanChunk: Long = 32L << 20

  /** Scan-chunk overlap covering a signature straddling a boundary. */
  private val Overlap: Long = 16L

  /** Stream extents of every `.xml.bz2` under `glob`, discovered by
    * the distributed signature scan: one row per bzip2 stream,
    * `(path, offset, length)`. This is the unit of decode
    * parallelism and the per-task memory bound.
    */
  def streamExtents(spark: SparkSession, glob: String): Dataset[(String, Long, Long)] = {
    import spark.implicits._
    val files = RangedIo.listFiles(spark, glob)
    val lens = files.toMap
    val conf = RangedIo.confBroadcast(spark)
    val chunks = files.flatMap { case (p, len) =>
      (0L until len by ScanChunk).map { off =>
        (p, off, math.min(ScanChunk + Overlap, len - off))
      }
    }
    val offsets = spark
      .createDataset(chunks)
      .repartition(math.max(1, math.min(chunks.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { case (p, off, n) =>
        val bytes = RangedIo.readRange(conf.value.value, p, off, n)
        // own only signatures STARTING inside the chunk proper; the
        // overlap tail belongs to the next chunk's start
        Bzip2Codec.signatureOffsets(bytes).iterator
          .filter(o => o < ScanChunk)
          .map(o => (p, off + o))
      }
      .toDF("path", "offset")
    val w = Window.partitionBy(col("path")).orderBy(col("offset"))
    val lenOf = udf((p: String) => lens.getOrElse(p, 0L))
    offsets
      .withColumn("end",
        coalesce(lead(col("offset"), 1).over(w), lenOf(col("path"))))
      .select(col("path"), col("offset"),
        (col("end") - col("offset")).as("length"))
      .as[(String, Long, Long)]
  }

  /** All pages of every `.xml.bz2` dump under `glob`, one decode task
    * per bzip2 stream.
    */
  def pages(spark: SparkSession, glob: String): DataFrame =
    pagesOfExtents(streamExtents(spark, glob))

  /** Split by the published companion index instead of scanning:
    * `indexPath` is the dump's `…-multistream-index.txt(.bz2)` whose
    * `offset:pageId:title` lines carry the authoritative stream
    * offsets. The index is ~1000× smaller than the dump; it decodes
    * in one task and only its distinct offsets (one small row per
    * stream) flow on.
    */
  def pagesIndexed(spark: SparkSession, dumpPath: String,
      indexPath: String): DataFrame = {
    import spark.implicits._
    val dumpLen = RangedIo.listFiles(spark, dumpPath) match {
      case Seq((_, len)) => len
      case other => throw new IllegalArgumentException(
        s"pagesIndexed expects exactly one dump file, got ${other.size}")
    }
    val offsets = spark.read.format("binaryFile").load(indexPath)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val text =
          if (bytes.length >= 3 && bytes(0) == 'B' && bytes(1) == 'Z' &&
            bytes(2) == 'h')
            Bzip2Codec.decode(bytes)
              .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
              .getOrElse("")
          else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        WikiDump.parseMultistreamIndex(text)
      }
      .distinct()
    val extents = offsets.toDF("offset")
      // a lying index (offset at/past EOF) must cost its own rows, not
      // the job: clamp to the dump's real extent before the ranged read
      .filter(col("offset") >= 0 && col("offset") < dumpLen)
      .withColumn("end", coalesce(
        lead(col("offset"), 1).over(Window.orderBy(col("offset"))),
        lit(dumpLen)))
      .select(lit(dumpPath).as("path"), col("offset"),
        (col("end") - col("offset")).as("length"))
      .as[(String, Long, Long)]
    pagesOfExtents(extents)
  }

  /** Decode stage: one task per extent, ranged read → bzip2 inflate →
    * page walk. Totality: an extent that fails to decode (corrupt
    * stream, false split) costs its own pages only, never the job.
    */
  def pagesOfExtents(extents: Dataset[(String, Long, Long)]): DataFrame = {
    val spark = extents.sparkSession
    import spark.implicits._
    val conf = RangedIo.confBroadcast(spark)
    extents
      .repartition(math.max(extents.rdd.getNumPartitions,
        spark.sparkContext.defaultParallelism))
      .flatMap { case (path, off, len) =>
        val bytes = RangedIo.readRange(conf.value.value, path, off, len)
        Bzip2Codec.decode(bytes) match {
          case Some(xml) =>
            WikiDump.pages(
              new String(xml, java.nio.charset.StandardCharsets.UTF_8))
              .map { p =>
                (path, p.title, p.ns, p.pageId, p.redirect, p.text,
                  WikiDump.stripMarkup(p.text))
              }
          case None => Vector.empty
        }
      }
      .toDF("source_file", "title", "ns", "page_id", "redirect",
        "wikitext", "text")
  }

  /** Content pages only (main namespace, not a redirect) in the
    * documents shape the corpus pipeline expects.
    */
  def documents(spark: SparkSession, glob: String): DataFrame =
    pages(spark, glob)
      .filter(col("ns") === 0 && col("redirect").isNull)
      .select(col("page_id").as("doc_id"), col("title"),
        col("text"), lit("wikipedia").as("source"))
}
