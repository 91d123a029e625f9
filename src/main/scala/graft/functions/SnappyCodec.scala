package graft.functions

/** Dependency-free raw-Snappy BLOCK decompressor — the default codec
  * of both parquet chunks and ORC streams, i.e. the single most
  * common compressed byte-range in a data lake. The raw block format
  * (not the framing format): a varint uncompressed-length preamble,
  * then tagged elements — literals (6-bit length, 60-63 escape to
  * 1-4 extra length bytes) and back-references at three offset widths
  * (copy1: 11-bit offset / 4-11 len; copy2: 16-bit LE; copy4: 32-bit
  * LE), overlapping copies legal and byte-serial by definition.
  *
  * Decode-only by design: writing snappy is an optimization problem
  * (match finding), reading it is a correctness problem — and only
  * the read side sits on the engine's native parquet/ORC path
  * ([[ParquetPages]], [[OrcFooter]]). The all-literal encoder below
  * exists because it is VALID snappy (every compressor must accept
  * it) and pins the tag grammar from the write side in specs; real
  * compressed data is cross-validated against snappy-java in the
  * spec suite.
  *
  * Totality: malformed input → None — a length past the preamble's
  * promise, an offset before the window start, or a truncated tag
  * rejects the block, never mis-copies.
  */
object SnappyCodec {

  /** Decompress one raw snappy block. */
  def decode(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.isEmpty) return None
    // varint preamble: uncompressed length
    var pos = 0
    var len = 0L
    var shift = 0
    var cont = true
    while (cont) {
      if (pos >= b.length || shift > 31) return None
      val x = b(pos) & 0xff
      len |= (x & 0x7fL) << shift
      shift += 7
      pos += 1
      cont = (x & 0x80) != 0
    }
    if (len > Int.MaxValue - 8) return None
    val out = new Array[Byte](len.toInt)
    var op = 0
    while (pos < b.length) {
      val tag = b(pos) & 0xff
      pos += 1
      (tag & 3) match {
        case 0 => // literal
          var n = (tag >>> 2) + 1
          if (n > 60) {
            val extra = n - 60 // 1..4 length bytes, little-endian
            if (pos + extra > b.length) return None
            var v = 0
            var i = 0
            while (i < extra) { v |= (b(pos + i) & 0xff) << (8 * i); i += 1 }
            pos += extra
            n = v + 1
          }
          if (n < 0 || pos + n > b.length || op + n > out.length) return None
          System.arraycopy(b, pos, out, op, n)
          pos += n; op += n
        case 1 => // copy, 1-byte offset
          if (pos >= b.length) return None
          val n = ((tag >>> 2) & 0x7) + 4
          val off = ((tag >>> 5) << 8) | (b(pos) & 0xff)
          pos += 1
          if (!copy(out, op, off, n)) return None
          op += n
        case 2 => // copy, 2-byte LE offset
          if (pos + 2 > b.length) return None
          val n = (tag >>> 2) + 1
          val off = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
          pos += 2
          if (!copy(out, op, off, n)) return None
          op += n
        case _ => // copy, 4-byte LE offset
          if (pos + 4 > b.length) return None
          val n = (tag >>> 2) + 1
          val off = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
            ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
          pos += 4
          if (!copy(out, op, off, n)) return None
          op += n
      }
    }
    if (op != out.length) None else Some(out)
  }

  /** Overlap-legal backward copy; false when the reference is bad. */
  private def copy(out: Array[Byte], op: Int, off: Int, n: Int): Boolean = {
    if (off <= 0 || off > op || op + n > out.length) return false
    var i = 0
    while (i < n) { out(op + i) = out(op + i - off); i += 1 }
    true
  }

  /** Valid-by-construction all-literal encode (no match finding). */
  def encodeLiteral(b: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    var len = b.length
    while ((len & ~0x7f) != 0) { o.write((len & 0x7f) | 0x80); len >>>= 7 }
    o.write(len)
    var pos = 0
    while (pos < b.length) {
      val n = math.min(65536, b.length - pos)
      if (n <= 60) o.write(((n - 1) << 2))
      else if (n <= 256) { o.write(60 << 2 | 0); o.write(n - 1) }
      else { // 2 length bytes
        o.write(61 << 2)
        o.write((n - 1) & 0xff); o.write(((n - 1) >>> 8) & 0xff)
      }
      o.write(b, pos, n)
      pos += n
    }
    o.toByteArray
  }
}
