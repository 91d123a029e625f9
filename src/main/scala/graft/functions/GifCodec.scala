package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** GIF87a/89a decode — the third REAL image codec of the multimodal
  * tier (PNG q81, JPEG q84/q113). Implements the public GIF
  * specification (CompuServe GIF89a spec; W3C note) end to end:
  * header + logical screen descriptor, global/local color tables,
  * extension-block walk, image descriptor, the GIF variant of LZW
  * (variable code width 3..12 bits, LSB-first packing, CLEAR/EOI,
  * deferred-clear handling at a full table), Interlace four-pass row
  * order, and palette mapping to RGB. First frame only — animation
  * frames after the first are a compositing concern
  * ([[AviCodec]] covers the multi-frame tier for video).
  *
  * The encoder exists for the oracle loop: it performs REAL LZW
  * string-table compression (not the fixed-code "uncompressed GIF"
  * trick), so decoding a fixture exercises dictionary growth, code
  * width bumps, and table-full resets — the parts of LZW where
  * off-by-ones live.
  *
  * Scale: pure per-row byte work, no Spark dependency — runs inside
  * the same `mapPartitions` decode stage as the other codecs
  * (plan-pinned shuffle-free).
  */
object GifCodec {

  import PngCodec.Image

  // ── bit I/O (LSB-first, the GIF packing order) ────────────────────

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var bit = 0
    def read(width: Int): Int = {
      var v = 0
      var got = 0
      while (got < width) {
        if (pos >= data.length) return -1
        val avail = 8 - bit
        val take = math.min(width - got, avail)
        val bits = ((data(pos) & 0xff) >> bit) & ((1 << take) - 1)
        v |= bits << got
        got += take
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      v
    }
  }

  private final class BitWriter {
    private val out = mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var bit = 0
    def write(code: Int, width: Int): Unit = {
      var v = code
      var left = width
      while (left > 0) {
        val take = math.min(left, 8 - bit)
        cur |= (v & ((1 << take) - 1)) << bit
        v >>= take
        left -= take
        bit += take
        if (bit == 8) { out += cur.toByte; cur = 0; bit = 0 }
      }
    }
    def finish(): Array[Byte] = {
      if (bit > 0) { out += cur.toByte; cur = 0; bit = 0 }
      out.toArray
    }
  }

  // ── LZW ───────────────────────────────────────────────────────────

  /** GIF-LZW decode of concatenated sub-block data. Returns exactly
    * `expected` indices or None (truncation, bad code, overflow).
    */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var produced = 0
    val in = new BitReader(data)
    var width = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    while (produced < expected) {
      val code = in.read(width)
      if (code < 0 || code > next || code == eoi) {
        return if (code == eoi && produced == expected) Some(out) else None
      }
      if (code == clear) {
        width = minCodeSize + 1
        next = eoi + 1
        prev = -1
      } else if (prev == -1) {
        if (code >= clear) return None // first code must be a literal
        out(produced) = code.toByte
        produced += 1
        prev = code
      } else {
        // expand string(code); the just-defined code (KwKwK case) is
        // string(prev) + firstChar(string(prev))
        val isKwK = code == next
        var sp = 0
        var c = if (isKwK) prev else code
        while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        val first = c.toByte
        stack(sp) = first
        sp += 1
        var i = sp - 1
        while (i >= 0) {
          if (produced >= expected) return None
          out(produced) = stack(i); produced += 1; i -= 1
        }
        if (isKwK) {
          if (produced >= expected) return None
          out(produced) = first; produced += 1
        }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** Real LZW compression of pixel indices (string-table, CLEAR on a
    * full table, EOI terminator). `minCodeSize` must satisfy
    * 2^minCodeSize ≥ palette size.
    */
  private def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val w = new BitWriter
    var width = minCodeSize + 1
    var next = eoi + 1
    val table = new mutable.HashMap[(Int, Int), Int]
    w.write(clear, width)
    if (indices.isEmpty) { w.write(eoi, width); return w.finish() }
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val b = indices(i) & 0xff
      table.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          w.write(cur, width)
          if (next < 4096) {
            table((cur, b)) = next
            next += 1
            // one later than the decoder's bump: the decoder defines
            // entry n only after READING the code emitted after n was
            // added, so its counter trails the encoder's by one
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else {
            w.write(clear, width)
            table.clear()
            width = minCodeSize + 1
            next = eoi + 1
          }
          cur = b
      }
      i += 1
    }
    w.write(cur, width)
    w.write(eoi, width)
    w.finish()
  }

  // ── container ─────────────────────────────────────────────────────

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** The four-pass interlace row sequence for `height` rows. */
  private[functions] def interlaceRows(height: Int): Array[Int] = {
    val rows = mutable.ArrayBuffer.empty[Int]
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)))
      { var y = start; while (y < height) { rows += y; y += step } }
    rows.toArray
  }

  /** First-frame decode → RGB [[PngCodec.Image]]; None for anything
    * that is not a well-formed single-palette GIF (wrong magic in
    * O(1), truncation, bad LZW stream, missing color table).
    */
  def decode(payload: Array[Byte]): Option[Image] = {
    try {
      if (payload.length < 13) return None
      val magic = new String(payload, 0, 6, StandardCharsets.US_ASCII)
      if (magic != "GIF87a" && magic != "GIF89a") return None
      val sw = u16(payload, 6)
      val sh = u16(payload, 8)
      val packed = payload(10) & 0xff
      var pos = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (pos + 3 * n > payload.length) return None
        gct = java.util.Arrays.copyOfRange(payload, pos, pos + 3 * n)
        pos += 3 * n
      }
      // block walk to the first image descriptor
      while (pos < payload.length) {
        (payload(pos) & 0xff) match {
          case 0x21 => // extension: label byte + sub-blocks
            pos += 2
            while (pos < payload.length && payload(pos) != 0)
              pos += 1 + (payload(pos) & 0xff)
            pos += 1
          case 0x2c =>
            if (pos + 10 > payload.length) return None
            val left = u16(payload, pos + 1)
            val top = u16(payload, pos + 3)
            val iw = u16(payload, pos + 5)
            val ih = u16(payload, pos + 7)
            val ipacked = payload(pos + 9) & 0xff
            pos += 10
            var ct = gct
            if ((ipacked & 0x80) != 0) {
              val n = 2 << (ipacked & 7)
              if (pos + 3 * n > payload.length) return None
              ct = java.util.Arrays.copyOfRange(payload, pos, pos + 3 * n)
              pos += 3 * n
            }
            if (ct == null || iw == 0 || ih == 0) return None
            if (left + iw > sw || top + ih > sh) return None
            if (pos >= payload.length) return None
            val minCode = payload(pos) & 0xff
            pos += 1
            val data = mutable.ArrayBuffer.empty[Byte]
            while (pos < payload.length && payload(pos) != 0) {
              val n = payload(pos) & 0xff
              if (pos + 1 + n > payload.length) return None
              data ++= payload.slice(pos + 1, pos + 1 + n)
              pos += 1 + n
            }
            val idx = lzwDecode(data.toArray, minCode, iw * ih)
              .getOrElse(return None)
            val nColors = ct.length / 3
            // frame rows land at their interlace targets; pixels
            // outside the frame (logical screen border) stay black
            val rowOrder =
              if ((ipacked & 0x40) != 0) interlaceRows(ih)
              else Array.tabulate(ih)(identity)
            val out = new Array[Byte](sw * sh * 3)
            var r = 0
            while (r < ih) {
              val y = top + rowOrder(r)
              var x = 0
              while (x < iw) {
                val c = idx(r * iw + x) & 0xff
                if (c >= nColors) return None
                val o = (y * sw + left + x) * 3
                out(o) = ct(3 * c)
                out(o + 1) = ct(3 * c + 1)
                out(o + 2) = ct(3 * c + 2)
                x += 1
              }
              r += 1
            }
            return Some(Image(sw, sh, 3, out))
          case 0x3b => return None // trailer before any image
          case _ => return None
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Single-frame GIF89a encode of palette `indices` (row-major) with
    * an RGB `palette` (3·n bytes, n a power of two ≥ 4). Real LZW.
    */
  def encode(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte], interlaced: Boolean = false): Array[Byte] = {
    require(palette.length % 3 == 0, "palette must be 3*n bytes")
    val n = palette.length / 3
    require(n >= 4 && (n & (n - 1)) == 0, s"palette size must be 2^k >= 4, got $n")
    require(indices.length == width * height, "indices must be width*height")
    val gctBits = 31 - Integer.numberOfLeadingZeros(n) // log2 n
    val out = mutable.ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes(StandardCharsets.US_ASCII)
    out += (width & 0xff).toByte; out += ((width >> 8) & 0xff).toByte
    out += (height & 0xff).toByte; out += ((height >> 8) & 0xff).toByte
    out += (0x80 | ((gctBits - 1) & 7)).toByte // GCT present, size
    out += 0.toByte // background
    out += 0.toByte // aspect
    out ++= palette
    // image descriptor at (0,0)
    out += 0x2c.toByte
    out += 0.toByte; out += 0.toByte; out += 0.toByte; out += 0.toByte
    out += (width & 0xff).toByte; out += ((width >> 8) & 0xff).toByte
    out += (height & 0xff).toByte; out += ((height >> 8) & 0xff).toByte
    out += (if (interlaced) 0x40 else 0x00).toByte
    val ordered =
      if (!interlaced) indices
      else {
        val rows = interlaceRows(height)
        val o = new Array[Byte](indices.length)
        var r = 0
        while (r < height) {
          System.arraycopy(indices, rows(r) * width, o, r * width, width)
          r += 1
        }
        o
      }
    val minCode = math.max(2, gctBits)
    out += minCode.toByte
    val lzw = lzwEncode(ordered, minCode)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out += len.toByte
      out ++= lzw.slice(off, off + len)
      off += len
    }
    out += 0.toByte // block terminator
    out += 0x3b.toByte // trailer
    out.toArray
  }

  /** Deterministic oracle-replayable fixture: palette color c =
    * ((5c+seed)%256, (3c+2seed)%256, (7c+3seed)%256) over 64 colors;
    * pixel (x,y) uses index (seed + 3x + 7y) % 64.
    */
  def syntheticIndexed(seed: Long, width: Int, height: Int): (Array[Byte], Array[Byte]) = {
    val palette = new Array[Byte](64 * 3)
    var c = 0
    while (c < 64) {
      palette(3 * c) = ((5L * c + seed) % 256).toByte
      palette(3 * c + 1) = ((3L * c + 2L * seed) % 256).toByte
      palette(3 * c + 2) = ((7L * c + 3L * seed) % 256).toByte
      c += 1
    }
    val idx = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        idx(y * width + x) = ((seed + 3L * x + 7L * y) % 64).toByte
        x += 1
      }
      y += 1
    }
    (palette, idx)
  }
}
