package graft.functions

import java.io.ByteArrayOutputStream

/** Parquet DATA-PAGE decode — the other half of the native read path
  * started by [[ParquetFooter]]: given a whole file's bytes and a
  * column path, reconstruct the column's VALUES by walking its page
  * stream — Thrift page headers, optional decompression
  * (UNCOMPRESSED/GZIP), RLE/bit-packed-hybrid definition levels,
  * dictionary pages with RLE_DICTIONARY indices, and the PLAIN
  * encodings (INT32/INT64 little-endian, BOOLEAN bit-packed,
  * BYTE_ARRAY length-prefixed). Together with the footer this is a
  * complete, dependency-free parquet reader for the flat-schema
  * subset — the oracle gate (q185) round-trips real Spark-written
  * files back to their source rows byte-by-byte.
  *
  * Scope: v1 data pages (format 1.0, what parquet-mr writes by
  * default), max definition level ≤ 1 (flat optional columns — every
  * Spark-written top-level column), no repetition levels. Snappy/zstd
  * chunks → None (no codec available here), same totality contract
  * as every codec: malformed input → None, never wrong values.
  *
  * Scale shape: per-FILE sequential page walk, embarrassingly
  * parallel across files via `binaryFile` — the same unit of
  * parallelism parquet itself is designed around (row groups within
  * a file extend this; the walk below is already per-chunk).
  */
object ParquetPages {

  import ParquetFooter.{Cur, Malformed, struct, skip}

  /** One column's values across all row groups, in row order;
    * None per-row for nulls; None overall on anything malformed or
    * out of scope.
    */
  def readColumn(file: Array[Byte], path: String)
      : Option[Vector[Option[Any]]] = {
    ParquetFooter.footer(file).flatMap { fm =>
      try {
        // flat-schema leaf: OPTIONAL → max def level 1, REQUIRED → 0
        val maxDef = fm.schema
          .find(f => f.numChildren == 0 && f.name == path) match {
          case Some(f) => if (f.repetition == 1) 1 else 0
          case None => return None
        }
        val out = Vector.newBuilder[Option[Any]]
        fm.rowGroups.foreach { rg =>
          rg.columns.find(_.path == path) match {
            case None => return None
            case Some(chunk) => out ++= readChunk(file, chunk, maxDef)
          }
        }
        Some(out.result())
      } catch {
        case _: Malformed | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
      }
    }
  }

  /** INT64 column convenience: values as Option[Long]. */
  def readInt64Column(file: Array[Byte], path: String)
      : Option[Vector[Option[Long]]] =
    readColumn(file, path).map(_.map(_.map(_.asInstanceOf[Long])))

  // ── page stream ──────────────────────────────────────────────────

  private final case class PageHeader(pageType: Int, uncompressed: Int,
      compressed: Int, numValues: Int, encoding: Int, defEncoding: Int,
      defLevelsByteLen: Int = -1, repLevelsByteLen: Int = -1,
      v2Compressed: Boolean = true)

  private def readPageHeader(c: Cur): PageHeader = {
    var pageType = -1
    var unc = -1
    var comp = -1
    var numValues = -1
    var encoding = -1
    var defEnc = -1
    var defLen = -1
    var repLen = -1
    var v2Comp = true
    struct(c) { (id, wt) =>
      id match {
        case 1 => pageType = c.zigzag().toInt
        case 2 => unc = c.zigzag().toInt
        case 3 => comp = c.zigzag().toInt
        case 5 => // DataPageHeader
          struct(c) { (id2, wt2) =>
            id2 match {
              case 1 => numValues = c.zigzag().toInt
              case 2 => encoding = c.zigzag().toInt
              case 3 => defEnc = c.zigzag().toInt
              case _ => skip(c, wt2)
            }
          }
        case 7 => // DictionaryPageHeader
          struct(c) { (id2, wt2) =>
            id2 match {
              case 1 => numValues = c.zigzag().toInt
              case 2 => encoding = c.zigzag().toInt
              case _ => skip(c, wt2)
            }
          }
        case 8 => // DataPageHeaderV2: levels OUTSIDE the compression
          struct(c) { (id2, wt2) =>
            id2 match {
              case 1 => numValues = c.zigzag().toInt
              case 4 => encoding = c.zigzag().toInt
              case 5 => defLen = c.zigzag().toInt
              case 6 => repLen = c.zigzag().toInt
              case 7 => v2Comp = wt2 == 1 // compact bool rides the type
              case _ => skip(c, wt2)
            }
          }
        case _ => skip(c, wt)
      }
    }
    if (pageType < 0 || unc < 0 || comp < 0) throw new Malformed
    PageHeader(pageType, unc, comp, numValues, encoding, defEnc,
      defLen, repLen, v2Comp)
  }

  private def inflate(codec: String, b: Array[Byte], expect: Int)
      : Array[Byte] = codec match {
    case "UNCOMPRESSED" => b
    case "GZIP" =>
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val o = new ByteArrayOutputStream(expect)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { o.write(buf, 0, n); n = in.read(buf) }
      val out = o.toByteArray
      if (out.length != expect) throw new Malformed
      out
    case "SNAPPY" => // the default codec — our own raw-block decode
      val out = SnappyCodec.decode(b).getOrElse(throw new Malformed)
      if (out.length != expect) throw new Malformed
      out
    case "ZSTD" => // zstd-jni rides the Spark classpath (WARC leg precedent)
      try {
        val out = com.github.luben.zstd.Zstd.decompress(b, expect)
        if (out.length != expect) throw new Malformed
        out
      } catch { case _: com.github.luben.zstd.ZstdException =>
        throw new Malformed }
    case "LZ4_RAW" => // one plain lz4 block; lz4-java on the classpath
      try {
        val out = new Array[Byte](expect)
        val n = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
          .safeDecompressor().decompress(b, 0, b.length, out, 0)
        if (n != expect) throw new Malformed
        out
      } catch { case _: net.jpountz.lz4.LZ4Exception =>
        throw new Malformed }
    case _ => throw new Malformed // lzo/brotli/legacy-lz4 not available
  }

  /** RLE/bit-packed hybrid run decode: `n` values of `bitWidth` bits
    * from `b` starting at `off` (no length prefix). Returns the
    * values; cursor width is consumed internally.
    */
  private def hybrid(b: Array[Byte], off: Int, end: Int, n: Int,
      bitWidth: Int): Array[Int] = {
    val out = new Array[Int](n)
    var got = 0
    var pos = off
    val byteWidth = (bitWidth + 7) / 8
    while (got < n) {
      // LEB128 run header
      var h = 0L
      var shift = 0
      var cont = true
      while (cont) {
        if (pos >= end) throw new Malformed
        val x = b(pos) & 0xff
        pos += 1
        h |= (x & 0x7fL) << shift
        shift += 7
        cont = (x & 0x80) != 0
        if (shift > 35) throw new Malformed
      }
      if ((h & 1) == 0) {
        // RLE run: count = h>>1, one fixed-width value
        val count = (h >>> 1).toInt
        if (count < 0 || got + count > n) throw new Malformed
        var v = 0
        var i = 0
        while (i < byteWidth) {
          if (pos >= end) throw new Malformed
          v |= (b(pos) & 0xff) << (8 * i)
          pos += 1; i += 1
        }
        java.util.Arrays.fill(out, got, got + count, v)
        got += count
      } else {
        // bit-packed groups of 8, LSB first
        val groups = (h >>> 1).toInt
        val total = groups * 8
        if (total <= 0) throw new Malformed
        var bitPos = 0L
        val base = pos
        var i = 0
        while (i < total && got < n) {
          var v = 0
          var j = 0
          while (j < bitWidth) {
            val bit = bitPos + j
            val byteAt = base + (bit >>> 3).toInt
            if (byteAt >= end) throw new Malformed
            v |= ((b(byteAt) >>> (bit & 7).toInt) & 1) << j
            j += 1
          }
          out(got) = v
          got += 1
          bitPos += bitWidth
          i += 1
        }
        // groups are fully materialized on the wire even when the tail
        // exceeds n — consume the whole byte span
        pos = base + (total * bitWidth + 7) / 8
      }
    }
    out
  }

  /** Skip the hybrid stream's 4-byte LE length prefix and decode. */
  private def hybridPrefixed(b: Array[Byte], off: Int, n: Int,
      bitWidth: Int): (Array[Int], Int) = {
    if (off + 4 > b.length) throw new Malformed
    val len = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    if (len < 0 || off + 4 + len > b.length) throw new Malformed
    (hybrid(b, off + 4, off + 4 + len, n, bitWidth), off + 4 + len)
  }

  private def plainValues(pt: String, b: Array[Byte], off: Int,
      n: Int): (Array[Any], Int) = {
    val out = new Array[Any](n)
    var pos = off
    pt match {
      case "INT64" =>
        var i = 0
        while (i < n) {
          if (pos + 8 > b.length) throw new Malformed
          var v = 0L
          var j = 7
          while (j >= 0) { v = (v << 8) | (b(pos + j) & 0xffL); j -= 1 }
          out(i) = v; pos += 8; i += 1
        }
      case "INT32" =>
        var i = 0
        while (i < n) {
          if (pos + 4 > b.length) throw new Malformed
          out(i) = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
            ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
          pos += 4; i += 1
        }
      case "DOUBLE" =>
        var i = 0
        while (i < n) {
          if (pos + 8 > b.length) throw new Malformed
          var v = 0L
          var j = 7
          while (j >= 0) { v = (v << 8) | (b(pos + j) & 0xffL); j -= 1 }
          out(i) = java.lang.Double.longBitsToDouble(v); pos += 8; i += 1
        }
      case "BOOLEAN" =>
        var i = 0
        while (i < n) {
          val byteAt = pos + (i >>> 3)
          if (byteAt >= b.length) throw new Malformed
          out(i) = ((b(byteAt) >>> (i & 7)) & 1) == 1
          i += 1
        }
        pos += (n + 7) / 8
      case "BYTE_ARRAY" =>
        var i = 0
        while (i < n) {
          if (pos + 4 > b.length) throw new Malformed
          val len = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
            ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
          pos += 4
          if (len < 0 || pos + len > b.length) throw new Malformed
          out(i) = new String(b, pos, len, "UTF-8")
          pos += len; i += 1
        }
      case _ => throw new Malformed // INT96/FIXED not in scope
    }
    (out, pos)
  }

  // ── DELTA encodings (the v2 writer's defaults) ───────────────────

  /** LEB128 at a mutable offset holder; returns value. */
  private def uvarint(b: Array[Byte], pos: Array[Int]): Long = {
    var v = 0L
    var shift = 0
    while (shift <= 63) {
      if (pos(0) >= b.length) throw new Malformed
      val x = b(pos(0)) & 0xff
      pos(0) += 1
      v |= (x & 0x7fL) << shift
      if ((x & 0x80) == 0) return v
      shift += 7
    }
    throw new Malformed
  }

  private def zz(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** DELTA_BINARY_PACKED: block/miniblock zigzag-delta bit-packing.
    * Returns exactly `expect` values and leaves `pos` past the LAST
    * CONSUMED byte (miniblock padding included).
    */
  private def deltaBinaryPacked(b: Array[Byte], pos: Array[Int],
      expect: Int): Array[Long] = {
    val blockSize = uvarint(b, pos).toInt
    val numMini = uvarint(b, pos).toInt
    val total = uvarint(b, pos).toInt
    if (blockSize <= 0 || numMini <= 0 || blockSize % numMini != 0 ||
      total < 0 || total < expect) throw new Malformed
    val perMini = blockSize / numMini
    val out = new Array[Long](total)
    var n = 0
    if (total > 0) { out(0) = zz(uvarint(b, pos)); n = 1 }
    while (n < total) {
      val minDelta = zz(uvarint(b, pos))
      val widths = new Array[Int](numMini)
      var i = 0
      while (i < numMini) {
        if (pos(0) >= b.length) throw new Malformed
        widths(i) = b(pos(0)) & 0xff
        pos(0) += 1
        i += 1
      }
      i = 0
      while (i < numMini) {
        val w = widths(i)
        if (w > 64) throw new Malformed
        // a miniblock with NO values occupies zero bytes on the wire
        // (spec: "as if their bit widths were 0"), whatever its width
        // byte says; a miniblock with ANY value is fully materialized
        val byteLen = if (n >= total) 0 else (perMini * w + 7) / 8
        if (pos(0) + byteLen > b.length) throw new Malformed
        var j = 0
        while (j < perMini) {
          if (n < total) {
            var v = 0L
            var k = 0
            val bitBase = j.toLong * w
            while (k < w) {
              val bit = bitBase + k
              val by = pos(0) + (bit >>> 3).toInt
              v |= ((b(by) >>> (bit & 7).toInt) & 1L) << k
              k += 1
            }
            out(n) = out(n - 1) + minDelta + v
            n += 1
          }
          j += 1
        }
        pos(0) += byteLen
        i += 1
      }
    }
    if (expect < total) java.util.Arrays.copyOfRange(out, 0, expect)
    else out
  }

  /** DELTA_LENGTH_BYTE_ARRAY: packed lengths then concatenated data. */
  private def deltaLengthByteArray(b: Array[Byte], pos: Array[Int],
      expect: Int): Array[Any] = {
    val lens = deltaBinaryPacked(b, pos, expect)
    val out = new Array[Any](expect)
    var i = 0
    while (i < expect) {
      val len = lens(i).toInt
      if (len < 0 || pos(0) + len > b.length) throw new Malformed
      out(i) = new String(b, pos(0), len, "UTF-8")
      pos(0) += len
      i += 1
    }
    out
  }

  /** DELTA_BYTE_ARRAY: packed prefix lengths + suffix DLBA — the
    * front-coded string encoding.
    */
  private def deltaByteArray(b: Array[Byte], pos: Array[Int],
      expect: Int): Array[Any] = {
    val prefixes = deltaBinaryPacked(b, pos, expect)
    val suffixes = deltaLengthByteArray(b, pos, expect)
    val out = new Array[Any](expect)
    var prev = ""
    var i = 0
    while (i < expect) {
      val p = prefixes(i).toInt
      if (p < 0 || p > prev.length) throw new Malformed
      val s = prev.substring(0, p) + suffixes(i).asInstanceOf[String]
      out(i) = s
      prev = s
      i += 1
    }
    out
  }

  /** Decode `present` non-null values at `off` for one page. */
  private def decodeValues(pt: String, encoding: Int, body: Array[Byte],
      off: Int, present: Int, dict: Array[Any]): Array[Any] =
    encoding match {
      case 0 => plainValues(pt, body, off, present)._1
      case 2 | 8 => // PLAIN_DICTIONARY / RLE_DICTIONARY
        if (dict == null) throw new Malformed
        if (present == 0) new Array[Any](0)
        else {
          if (off >= body.length) throw new Malformed
          val bw = body(off) & 0xff
          if (bw > 32) throw new Malformed
          val idx = hybrid(body, off + 1, body.length, present, bw)
          idx.map { i =>
            if (i < 0 || i >= dict.length) throw new Malformed
            dict(i)
          }
        }
      case 3 => // RLE (v2 BOOLEAN values): 4-byte length prefix
        if (pt != "BOOLEAN") throw new Malformed
        val (bits, _) = hybridPrefixed(body, off, present, 1)
        bits.map(v => (v == 1): Any)
      case 5 => // DELTA_BINARY_PACKED
        val pos = Array(off)
        val vs = deltaBinaryPacked(body, pos, present)
        pt match {
          case "INT64" => vs.map(v => v: Any)
          case "INT32" => vs.map(v => v.toInt: Any)
          case _ => throw new Malformed
        }
      case 6 =>
        if (pt != "BYTE_ARRAY") throw new Malformed
        deltaLengthByteArray(body, Array(off), present)
      case 7 =>
        if (pt != "BYTE_ARRAY") throw new Malformed
        deltaByteArray(body, Array(off), present)
      case _ => throw new Malformed
    }

  private def readChunk(file: Array[Byte],
      chunk: ParquetFooter.ColumnChunkMeta, maxDef: Int)
      : Vector[Option[Any]] = {
    if (chunk.dataPageOffset < 0) throw new Malformed
    val start = chunk.dictPageOffset
      .map(d => math.min(d, chunk.dataPageOffset))
      .getOrElse(chunk.dataPageOffset)
    var pos = start.toInt
    var dict: Array[Any] = null
    val out = Vector.newBuilder[Option[Any]]
    var remaining = chunk.numValues
    while (remaining > 0) {
      val c = new Cur(file, pos, file.length)
      val h = readPageHeader(c)
      val bodyAt = c.pos
      if (bodyAt + h.compressed > file.length) throw new Malformed
      h.pageType match {
        case 2 => // DICTIONARY_PAGE (PLAIN / PLAIN_DICTIONARY values)
          val raw = java.util.Arrays.copyOfRange(file, bodyAt,
            bodyAt + h.compressed)
          val body = inflate(chunk.codec, raw, h.uncompressed)
          dict = plainValues(chunk.physicalType, body, 0, h.numValues)._1
        case 0 => // DATA_PAGE v1: levels inside the compressed body
          val raw = java.util.Arrays.copyOfRange(file, bodyAt,
            bodyAt + h.compressed)
          val body = inflate(chunk.codec, raw, h.uncompressed)
          val n = h.numValues
          // definition levels: only present when the column is
          // OPTIONAL (max def = 1), RLE-encoded with a length prefix;
          // REQUIRED columns start straight at the values
          val (defs, valuesAt) =
            if (maxDef == 0) (Array.fill(n)(1), 0)
            else if (h.defEncoding == 3) hybridPrefixed(body, 0, n, 1)
            else throw new Malformed
          val present = defs.count(_ == 1)
          val vals = decodeValues(chunk.physicalType, h.encoding, body,
            valuesAt, present, dict)
          var vi = 0
          defs.foreach { d =>
            if (d == 1) { out += Some(vals(vi)); vi += 1 }
            else out += None
          }
          remaining -= n
        case 3 => // DATA_PAGE_V2: levels OUTSIDE the compression
          val n = h.numValues
          val repLen = math.max(0, h.repLevelsByteLen)
          val defLen = math.max(0, h.defLevelsByteLen)
          if (repLen + defLen > h.compressed) throw new Malformed
          val defs =
            if (maxDef == 0 || defLen == 0) Array.fill(n)(1)
            else hybrid(file, bodyAt + repLen,
              bodyAt + repLen + defLen, n, 1)
          val present = defs.count(_ == 1)
          val rawVals = java.util.Arrays.copyOfRange(file,
            bodyAt + repLen + defLen, bodyAt + h.compressed)
          val body =
            if (h.v2Compressed)
              inflate(chunk.codec, rawVals,
                h.uncompressed - repLen - defLen)
            else rawVals
          val vals = decodeValues(chunk.physicalType, h.encoding, body,
            0, present, dict)
          var vi = 0
          defs.foreach { d =>
            if (d == 1) { out += Some(vals(vi)); vi += 1 }
            else out += None
          }
          remaining -= n
        case _ => throw new Malformed // index pages: not value-bearing
      }
      pos = bodyAt + h.compressed
    }
    if (remaining != 0) throw new Malformed
    out.result()
  }
}
