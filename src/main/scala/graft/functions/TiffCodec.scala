package graft.functions

import java.io.ByteArrayOutputStream

/** TIFF 6.0 codec (baseline RGB/grayscale) — the archival/scan image
  * format of document corpora, next to PNG/JPEG/GIF/BMP/WebP.
  * Implemented from the published TIFF 6.0 specification; no codec
  * source consulted.
  *
  * DECODER: both byte orders (II/MM), IFD walk with out-of-line value
  * arrays, multi-strip assembly, 8-bit grayscale and RGB, compressions
  * 1 (none), 5 (LZW — variable 9→12-bit codes, MSB-first, the spec's
  * "early change" width bump, Clear/EOI handling) and 32773 (PackBits),
  * plus the horizontal-differencing predictor (tag 317 = 2). Bomb
  * guard, total on malformed input.
  *
  * ENCODER: spec-valid little-endian single-IFD files in any of the
  * three compressions (with optional predictor for LZW), multi-strip
  * via RowsPerStrip — every decoder arm is exercisable from fixtures.
  */
object TiffCodec {
  import PngCodec.Image

  private val MaxPixels = 1 << 26 // bomb guard: ~67 Mpx

  // ── byte-order-aware reads ────────────────────────────────────────

  private final class Rd(b: Array[Byte], le: Boolean) {
    def u16(off: Int): Int =
      if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def u32(off: Int): Long =
      if (le) (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    def len: Int = b.length
  }

  /** Tag values as longs (SHORT/LONG/BYTE entries; first `count`). */
  private def tagValues(r: Rd, b: Array[Byte], entryOff: Int): Array[Long] = {
    val typ = r.u16(entryOff + 2)
    val count = r.u32(entryOff + 4).toInt
    if (count < 0 || count > (1 << 22)) throw new IllegalStateException("tag count")
    val sz = typ match {
      case 1 | 2 | 6 | 7 => 1
      case 3 => 2
      case 4 | 9 => 4
      case _ => throw new IllegalStateException(s"tag type $typ")
    }
    val total = sz * count
    val valOff = if (total <= 4) entryOff + 8 else r.u32(entryOff + 8).toInt
    if (valOff < 0 || valOff + total > b.length) throw new IllegalStateException("tag bounds")
    Array.tabulate(count) { i =>
      sz match {
        case 1 => (b(valOff + i) & 0xff).toLong
        case 2 => r.u16(valOff + 2 * i).toLong
        case _ => r.u32(valOff + 4 * i)
      }
    }
  }

  /** Decode a baseline 8-bit gray/RGB TIFF. None on anything else or
    * malformed.
    */
  def decode(bytes: Array[Byte]): Option[Image] = try {
    if (bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return None
    val r = new Rd(bytes, le)
    if (r.u16(2) != 42) return None
    var ifd = r.u32(4).toInt
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val nEntries = r.u16(ifd)
    var width = -1; var height = -1
    var bits: Array[Long] = Array(8L)
    var compression = 1L
    var spp = 1
    var rowsPerStrip = Long.MaxValue
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var predictor = 1L
    var i = 0
    while (i < nEntries) {
      val off = ifd + 2 + 12 * i
      if (off + 12 > bytes.length) return None
      val tag = r.u16(off)
      tag match {
        case 256 => width = tagValues(r, bytes, off)(0).toInt
        case 257 => height = tagValues(r, bytes, off)(0).toInt
        case 258 => bits = tagValues(r, bytes, off)
        case 259 => compression = tagValues(r, bytes, off)(0)
        case 273 => stripOffsets = tagValues(r, bytes, off)
        case 277 => spp = tagValues(r, bytes, off)(0).toInt
        case 278 => rowsPerStrip = tagValues(r, bytes, off)(0)
        case 279 => stripCounts = tagValues(r, bytes, off)
        case 317 => predictor = tagValues(r, bytes, off)(0)
        case _ => () // photometric etc. — tolerated, not needed
      }
      i += 1
    }
    if (width <= 0 || height <= 0 || stripOffsets == null) return None
    if (width.toLong * height > MaxPixels) return None
    if (!(spp == 1 || spp == 3) || !bits.forall(_ == 8L)) return None
    if (predictor != 1L && predictor != 2L) return None
    val rowBytes = width * spp
    val out = new Array[Byte](rowBytes * height)
    val counts = if (stripCounts != null) stripCounts
      else Array(bytes.length.toLong - stripOffsets(0)) // single-strip fallback
    if (counts.length != stripOffsets.length) return None
    val rps = if (rowsPerStrip <= 0 || rowsPerStrip > height) height.toLong
      else rowsPerStrip
    var strip = 0
    var row = 0
    while (strip < stripOffsets.length && row < height) {
      val so = stripOffsets(strip).toInt
      val sc = counts(strip).toInt
      if (so < 0 || sc < 0 || so + sc > bytes.length) return None
      val nRows = math.min(rps, height - row).toInt
      val want = nRows * rowBytes
      val raw = java.util.Arrays.copyOfRange(bytes, so, so + sc)
      val data = compression match {
        case 1 => raw
        case 5 => lzwDecode(raw, want)
        case 32773L => packBitsDecode(raw, want)
        case _ => return None
      }
      if (data.length < want) return None
      if (predictor == 2L) undiff(data, nRows, width, spp)
      System.arraycopy(data, 0, out, row * rowBytes, want)
      row += nRows
      strip += 1
    }
    if (row < height) return None
    Some(Image(width, height, spp, out))
  } catch { case _: Throwable => None }

  private def undiff(data: Array[Byte], rows: Int, width: Int, spp: Int): Unit = {
    var y = 0
    while (y < rows) {
      val base = y * width * spp
      var x = 1
      while (x < width) {
        var c = 0
        while (c < spp) {
          val i = base + x * spp + c
          data(i) = (data(i) + data(i - spp)).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
  }

  private def diff(data: Array[Byte], rows: Int, width: Int, spp: Int): Array[Byte] = {
    val out = data.clone()
    var y = 0
    while (y < rows) {
      val base = y * width * spp
      var x = width - 1
      while (x >= 1) {
        var c = 0
        while (c < spp) {
          val i = base + x * spp + c
          out(i) = (data(i) - data(i - spp)).toByte
          c += 1
        }
        x -= 1
      }
      y += 1
    }
    out
  }

  // ── PackBits (32773) ──────────────────────────────────────────────

  private def packBitsDecode(in: Array[Byte], want: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(want)
    var i = 0
    while (i < in.length && out.size < want) {
      val n = in(i)
      i += 1
      if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > in.length) throw new IllegalStateException("packbits literal")
        out.write(in, i, cnt)
        i += cnt
      } else if (n != -128) {
        if (i >= in.length) throw new IllegalStateException("packbits run")
        val cnt = 1 - n
        val v = in(i); i += 1
        var k = 0
        while (k < cnt) { out.write(v); k += 1 }
      }
    }
    out.toByteArray
  }

  private def packBitsEncode(in: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(in.length)
    var i = 0
    while (i < in.length) {
      // find run length at i
      var run = 1
      while (i + run < in.length && in(i + run) == in(i) && run < 128) run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(in(i)); i += run
      } else {
        // literal until next run of ≥3 (spec guidance) or 128 cap
        var lit = 1
        var j = i + 1
        var break = false
        while (!break && j < in.length && lit < 128) {
          var r2 = 1
          while (j + r2 < in.length && in(j + r2) == in(j) && r2 < 3) r2 += 1
          if (r2 >= 3) break = true
          else { lit += 1; j += 1 }
        }
        out.write(lit - 1); out.write(in, i, lit); i += lit
      }
    }
    out.toByteArray
  }

  // ── TIFF LZW (compression 5): MSB-first, 9→12 bits, early change ──

  private def lzwDecode(in: Array[Byte], want: Int): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val out = new ByteArrayOutputStream(want)
    // dictionary: each entry = (prefix code, final byte); roots implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = 0
    def read(): Int = {
      if ((bitPos + width) > in.length * 8) return Eoi
      var v = 0
      var got = 0
      while (got < width) {
        val byteI = (bitPos + got) >> 3
        val bitI = (bitPos + got) & 7
        val take = math.min(8 - bitI, width - got)
        val bitsv = ((in(byteI) & 0xff) >> (8 - bitI - take)) & ((1 << take) - 1)
        v = (v << take) | bitsv
        got += take
      }
      bitPos += width
      v
    }
    def emit(code: Int): Array[Byte] = {
      var stack = List.empty[Byte]
      var c = code
      while (c >= 258) { stack = suffix(c) :: stack; c = prefix(c) }
      ((c.toByte) :: stack).toArray
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == Eoi) done = true
      else if (code == Clear) {
        next = 258; width = 9; prev = -1
      } else {
        if (prev < 0) {
          if (code > 255) throw new IllegalStateException("lzw first code")
          out.write(code)
          prev = code
        } else {
          val entry: Array[Byte] =
            if (code < next) emit(code)
            else if (code == next) { val p = emit(prev); p :+ p(0) }
            else throw new IllegalStateException("lzw code gap")
          out.write(entry, 0, entry.length)
          if (next < 4096) {
            prefix(next) = prev
            suffix(next) = entry(0)
            next += 1
          }
          prev = code
        }
        // TIFF early change, decoder side: bump as soon as the table
        // holds 2^w - 1 entries (one earlier than the naive 2^w — the
        // quirk the spec is infamous for); the encoder's matching bump
        // is at 2^w because its table runs one entry ahead
        if (next == 511 && width == 9) width = 10
        else if (next == 1023 && width == 10) width = 11
        else if (next == 2047 && width == 11) width = 12
      }
      if (out.size >= want) done = true
    }
    out.toByteArray
  }

  private def lzwEncode(in: Array[Byte]): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val out = new ByteArrayOutputStream(in.length)
    var bitBuf = 0L
    var nBits = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      nBits += width
      while (nBits >= 8) {
        out.write(((bitBuf >> (nBits - 8)) & 0xff).toInt)
        nBits -= 8
      }
    }
    val dict = new java.util.HashMap[Long, Integer](8192)
    var next = 258
    def resetDict(): Unit = { dict.clear(); next = 258; width = 9 }
    put(Clear)
    resetDict()
    var cur = -1
    var i = 0
    while (i < in.length) {
      val b = in(i) & 0xff
      if (cur < 0) cur = b
      else {
        val key = (cur.toLong << 8) | b
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur)
          if (next < 4094) {
            dict.put(key, Integer.valueOf(next))
            next += 1
            // encoder side of the early change: the encoder's table
            // runs one entry ahead of the decoder's, so its bump sits
            // at 2^w where the decoder's sits at 2^w - 1
            if (next == 512 && width == 9) width = 10
            else if (next == 1024 && width == 10) width = 11
            else if (next == 2048 && width == 11) width = 12
          } else {
            put(Clear); resetDict()
          }
          cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) put(cur)
    put(Eoi)
    if (nBits > 0) out.write(((bitBuf << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
  }

  // ── encoder ───────────────────────────────────────────────────────

  /** Encode little-endian, single IFD. `compression`: 1, 5 (LZW,
    * optionally with the horizontal predictor) or 32773 (PackBits).
    */
  def encode(img: Image, compression: Int = 1,
      rowsPerStrip: Int = Int.MaxValue, predictor: Boolean = false): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3)
    require(compression == 1 || compression == 5 || compression == 32773)
    require(!predictor || compression == 5)
    val spp = img.channels
    val rowBytes = img.width * spp
    val rps = math.min(rowsPerStrip, img.height)
    val nStrips = (img.height + rps - 1) / rps
    val strips = (0 until nStrips).map { s =>
      val r0 = s * rps
      val nRows = math.min(rps, img.height - r0)
      val raw = java.util.Arrays.copyOfRange(img.data,
        r0 * rowBytes, (r0 + nRows) * rowBytes)
      val pre = if (predictor) diff(raw, nRows, img.width, spp) else raw
      compression match {
        case 1 => pre
        case 5 => lzwEncode(pre)
        case _ => packBitsEncode(pre)
      }
    }

    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { var i = 0; while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    out.write('I'); out.write('I'); u16(42)
    // layout: header(8) | IFD | [bits array if rgb] | strip offsets/counts arrays | strip data
    val tags = Seq(256, 257, 258, 259, 262, 273, 277, 278, 279) ++
      (if (predictor) Seq(317) else Nil)
    val nT = tags.length
    val ifdOff = 8
    val ifdSize = 2 + nT * 12 + 4
    var heap = ifdOff + ifdSize
    // bits array (3 shorts) only when rgb
    val bitsOff = heap
    if (spp == 3) heap += 6
    val offsOff = if (nStrips > 1) { val o = heap; heap += 4 * nStrips; o } else -1
    val cntsOff = if (nStrips > 1) { val o = heap; heap += 4 * nStrips; o } else -1
    val dataOff = heap
    val stripOffsets = strips.scanLeft(dataOff.toLong)((a, s) => a + s.length).init
    u32(ifdOff.toLong)
    u16(nT)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      u16(tag); u16(typ); u32(count.toLong); u32(value)
    }
    entry(256, 3, 1, img.width.toLong)
    entry(257, 3, 1, img.height.toLong)
    if (spp == 3) entry(258, 3, 3, bitsOff.toLong) else entry(258, 3, 1, 8L)
    entry(259, 3, 1, compression.toLong)
    entry(262, 3, 1, if (spp == 3) 2L else 1L) // RGB | BlackIsZero
    if (nStrips > 1) entry(273, 4, nStrips, offsOff.toLong)
    else entry(273, 4, 1, stripOffsets(0))
    entry(277, 3, 1, spp.toLong)
    entry(278, 3, 1, rps.toLong)
    if (nStrips > 1) entry(279, 4, nStrips, cntsOff.toLong)
    else entry(279, 4, 1, strips(0).length.toLong)
    if (predictor) entry(317, 3, 1, 2L)
    u32(0L) // next IFD
    if (spp == 3) { u16(8); u16(8); u16(8) }
    if (nStrips > 1) {
      stripOffsets.foreach(u32)
      strips.foreach(s => u32(s.length.toLong))
    }
    strips.foreach(s => out.write(s))
    out.toByteArray
  }
}
