package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the FastCDC shape: Xia et al., ATC'16) —
  * the storage-layer dedup primitive: chunk boundaries are picked by a
  * rolling hash of the CONTENT, not by offset, so inserting a byte
  * near the front of a 1 GB blob re-chunks only the first few KB and
  * every later chunk keeps its identity (fixed-size blocks would shift
  * every boundary and dedup nothing). At 100 TB this is how repeated
  * crawls of the same pages, re-encoded archives, and near-identical
  * binaries collapse in the content store: chunk → hash → count
  * copies, an embarrassingly-parallel scan stage plus one hash-keyed
  * aggregate.
  *
  * Deterministic by construction: the gear table is splitmix64 of the
  * byte value (fixed constants), boundaries are pure functions of the
  * bytes, chunk ids are FNV-1a 64 over the chunk content — the same
  * blob chunks identically on every engine, partition, or run
  * (spec-pinned), which is what makes the q170 invariants oracle-able.
  *
  * FastCDC normalization: below `avgSize` a STRICTER mask (more bits)
  * makes boundaries rarer, above it a LOOSER mask makes them more
  * likely — pulling the size distribution toward `avgSize` and away
  * from the exponential tail plain gear-CDC produces. The gear hash's
  * `h = (h << 1) + gear(b)` register forgets bytes after 64 shifts, so
  * boundaries depend on a sliding ~64-byte content window — the
  * re-synchronization property the spec measures.
  */
object ContentChunking {

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 256-entry gear table — fixed, derived, never random at runtime. */
  private val gear: Array[Long] = Array.tabulate(256)(i => splitmix64(i.toLong))

  /** FNV-1a 64 over a byte range: the chunk's content identity. */
  def contentHash(data: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (data(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  final case class Chunk(offset: Int, length: Int, hash: Long)

  private def maskOfBits(bits: Int): Long =
    if (bits <= 0) 0L else (1L << bits) - 1

  /** Chunk `data` with FastCDC-normalized gear boundaries: sizes in
    * `[minSize, maxSize]` (final chunk may undershoot `minSize`),
    * distribution centered on `avgSize` (a power of two). Empty input
    * → no chunks.
    */
  def chunk(data: Array[Byte], minSize: Int, avgSize: Int,
      maxSize: Int): Seq[Chunk] = {
    require(minSize >= 1 && minSize <= avgSize && avgSize <= maxSize,
      "need 1 <= minSize <= avgSize <= maxSize")
    val bits = 63 - java.lang.Long.numberOfLeadingZeros(avgSize.toLong)
    val maskStrict = maskOfBits(bits + 2) // rarer boundaries below avg
    val maskLoose = maskOfBits(math.max(bits - 2, 1)) // likelier above
    val out = Seq.newBuilder[Chunk]
    var start = 0
    while (start < data.length) {
      val limit = math.min(data.length - start, maxSize)
      var cut = limit // maxSize (or EOF) if no boundary fires
      if (limit > minSize) {
        var h = 0L
        var i = 0
        var found = false
        while (i < limit && !found) {
          h = (h << 1) + gear(data(start + i) & 0xff)
          // boundary AFTER byte i ⇒ chunk length i+1; only past minSize
          if (i + 1 >= minSize) {
            val mask = if (i + 1 < avgSize) maskStrict else maskLoose
            if ((h & mask) == 0L) { cut = i + 1; found = true }
          }
          i += 1
        }
      }
      out += Chunk(start, cut, contentHash(data, start, cut))
      start += cut
    }
    out.result()
  }

  /** Corpus chunk table — a pure scan stage:
    * (id, chunk_idx, offset, length, chunk_hash) per blob.
    */
  def chunks(blobs: DataFrame, idCol: String, payloadCol: String,
      minSize: Int, avgSize: Int, maxSize: Int): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        chunk(payload, minSize, avgSize, maxSize).zipWithIndex.map {
          case (c, i) => (id, i, c.offset, c.length, c.hash)
        }
      }
      .toDF("id", "chunk_idx", "offset", "length", "chunk_hash")
  }

  /** Storage-dedup accounting over a chunk table: per distinct chunk,
    * copies and bytes; `stored_bytes` is what a content-addressed
    * store keeps, `logical_bytes` what the blobs add up to. One
    * hash-keyed aggregate.
    */
  def dedupStats(chunkTable: DataFrame): DataFrame =
    chunkTable.groupBy(col("chunk_hash"), col("length"))
      .agg(count(lit(1)).as("n_copies"))
      .agg(
        sum(col("length") * col("n_copies")).as("logical_bytes"),
        sum(col("length")).as("stored_bytes"),
        count(lit(1)).as("n_distinct_chunks"))
}
