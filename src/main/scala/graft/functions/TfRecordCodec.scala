package graft.functions

import java.io.ByteArrayOutputStream

/** Dependency-free TFRecord framing codec — the record container of
  * large-scale training pipelines: a flat sequence of
  * `[u64le length][u32le masked-crc32c(length)][payload]
  * [u32le masked-crc32c(payload)]` frames. Both CRCs are VERIFIED on
  * read (the whole point of the format — torn writes and bit rot
  * surface as a rejected record, not silently truncated training
  * data); CRC32C (Castagnoli) is implemented here from the reversed
  * polynomial with the format's mask `((crc >> 15 | crc << 17) +
  * 0xa282ead8)`.
  *
  * Totality: a malformed frame (bad CRC, length past the buffer)
  * rejects the whole archive → None — distinguishing "file ends
  * cleanly between records" from "file ends mid-record" is exactly
  * what the length CRC is for.
  *
  * Scale shape: like TAR/WARC, the format is sequential by design —
  * the unit of parallelism is one FILE per task (`binaryFile`), with
  * records exploding to rows inside the scan stage.
  */
object TfRecordCodec {

  private val Table: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82f63b78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  /** CRC32C (Castagnoli, reflected) of `b[off, off+len)`. */
  def crc32c(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xffffffff
    var i = off
    val end = off + len
    while (i < end) {
      c = Table((c ^ b(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    ~c
  }

  /** The TFRecord mask applied to a raw crc32c. */
  def masked(crc: Int): Int = {
    val c = crc
    ((c >>> 15) | (c << 17)) + 0xa282ead8
  }

  private def u32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def u64le(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }

  /** All records; None if any frame is malformed or a CRC fails. */
  def records(archive: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (archive == null) return None
    val out = Vector.newBuilder[Array[Byte]]
    var pos = 0
    val n = archive.length
    while (pos < n) {
      if (pos + 12 > n) return None
      val len = u64le(archive, pos)
      if (len < 0 || pos + 12 + len + 4 > n) return None
      val lenCrc = u32le(archive, pos + 8)
      // the length CRC covers the 8 length bytes themselves
      if (masked(crc32c(archive, pos, 8)) != lenCrc) return None
      val dataAt = pos + 12
      val dataCrc = u32le(archive, dataAt + len.toInt)
      if (masked(crc32c(archive, dataAt, len.toInt)) != dataCrc) return None
      out += java.util.Arrays.copyOfRange(archive, dataAt, dataAt + len.toInt)
      pos = dataAt + len.toInt + 4
    }
    Some(out.result())
  }

  def write(recordsIn: Seq[Array[Byte]]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    recordsIn.foreach { r =>
      val lenB = new Array[Byte](8)
      var i = 0
      while (i < 8) { lenB(i) = ((r.length.toLong >>> (8 * i)) & 0xff).toByte; i += 1 }
      o.write(lenB)
      writeU32le(o, masked(crc32c(lenB, 0, 8)))
      o.write(r)
      writeU32le(o, masked(crc32c(r, 0, r.length)))
    }
    o.toByteArray
  }

  private def writeU32le(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
}
