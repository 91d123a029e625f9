package graft.functions

import PngCodec.Image

/** Dependency-free WebP codec for the LOSSLESS (VP8L) stream — the
  * majority image encoding of a modern web crawl the PNG/JPEG/GIF/BMP
  * chain was missing. Written against the public "WebP Lossless
  * Bitstream Specification" and the RIFF container rules; no
  * reference code.
  *
  * Decode surface (total: anything outside it returns None, never
  * wrong pixels — the [[PngCodec]] contract):
  *   - RIFF/WEBP container with a VP8L chunk;
  *   - LSB-first bitstream: 0x2f signature, 14-bit width/height-1,
  *     version 0;
  *   - prefix codes in BOTH forms (simple 1-2-symbol and normal
  *     code-length-coded with the 16/17/18 repeat codes, the
  *     `kCodeLengthCodeOrder` permutation, and the optional
  *     max_symbol shortcut);
  *   - color cache (any 1-11 bits), LZ77 back-references with the
  *     prefix-coded length/distance scheme, distance plane-codes in
  *     the direct (> 120) range;
  *   - three of the four pixel transforms, inverse-applied in
  *     reverse read order: SUBTRACT-GREEN, the 14-mode PREDICTOR
  *     transform (its per-block mode image decoded as the spec's
  *     sub-resolution entropy-coded image), and COLOR-INDEXING
  *     (palette with delta-coded entries, including the sub-byte
  *     pixel-bundling widths) — what real encoders emit for
  *     photographic and icon content respectively;
  *   - NOT decoded (None, documented): the cross-channel COLOR
  *     transform, meta-prefix (entropy-image) ARGB streams,
  *     predictor combined with color-indexing, and the 120 mapped
  *     2-D distance codes — rejecting beats silently mis-addressing
  *     rows.
  *
  * Encode side (fixture/writer leg): a real, generally-correct VP8L
  * encoder — greedy distance-1 run LZ77 + 8-bit color cache +
  * literals, per-channel histograms, package-merge length-limited
  * Huffman (15 for symbols, 7 for the code-length code), canonical
  * code assignment, RLE-coded code lengths; opt-in subtract-green
  * and fixed-mode predictor transforms, plus a palette
  * ([[encodeIndexed]]) path with pixel bundling, put the
  * inverse-transform arms on the oracle-verified path.
  * decode(encode(img)) is pixel-exact for every raster (q153's hash
  * gate).
  *
  * Lossy (VP8) and extended (VP8X) WebP: header-only dimension
  * parse ([[dims]]) — the metadata step; full VP8 entropy decode is
  * out of scope, and totality keeps it honest.
  */
object WebpCodec {

  // ── bit I/O (LSB-first, the DEFLATE/VP8L convention) ──────────────

  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    var eof = false
    def readBit(): Int = {
      if (pos >= end) { eof = true; return 0 }
      val v = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def writeBits(v: Int, len: Int): Unit = {
      var i = 0
      while (i < len) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    /** Prefix-code bits go root-first = MSB of the canonical code. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  // ── canonical prefix codes ────────────────────────────────────────

  /** Spec permutation for code-length-code lengths. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private val MaxAllowedCodeLength = 15

  /** Canonical code values for the given lengths (0 = unused):
    * symbols sorted by (length, index), DEFLATE next-code assignment.
    */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.foldLeft(0)(math.max)
    val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + count(l - 1)) << 1
      next(l) = code
      l += 1
    }
    val codes = new Array[Int](lengths.length)
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = next(lengths(s)); next(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  /** Canonical MSB-first decoder over code lengths; single-symbol
    * codes read zero bits (the spec's degenerate-tree rule).
    */
  private final class PrefixDecoder(lengths: Array[Int]) {
    private val maxLen = lengths.foldLeft(0)(math.max)
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    private val nSyms = count.sum
    private val single = if (nSyms == 1) lengths.indexWhere(_ > 0) else -1
    private val firstCode = new Array[Int](maxLen + 1)
    private val offset = new Array[Int](maxLen + 1)
    private val sorted = new Array[Int](nSyms)
    locally {
      var code = 0
      var off = 0
      var l = 1
      while (l <= maxLen) {
        code = (code + (if (l >= 2) count(l - 1) else 0)) << 1
        firstCode(l) = code
        offset(l) = off
        off += count(l)
        l += 1
      }
      val idx = offset.clone()
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) { sorted(idx(len)) = s; idx(len) += 1 }
        s += 1
      }
    }
    val valid: Boolean = nSyms > 0
    def next(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.readBit()
        len += 1
        val rel = code - firstCode(len)
        if (rel >= 0 && rel < count(len)) return sorted(offset(len) + rel)
      }
      -1 // not a valid code (or eof-zeros ran off the tree)
    }
  }

  /** Package-merge length-limited Huffman lengths. Zero-frequency
    * symbols get 0. One active symbol gets length 1 (callers that can
    * use a zero-bit simple code special-case it).
    */
  private def limitedLengths(freqs: Array[Long], limit: Int): Array[Int] = {
    val active = freqs.indices.filter(freqs(_) > 0)
    val lengths = new Array[Int](freqs.length)
    if (active.isEmpty) return lengths
    if (active.length == 1) { lengths(active.head) = 1; return lengths }
    require(active.length <= (1 << limit),
      s"alphabet ${active.length} exceeds 2^$limit")
    final case class Pack(w: Long, syms: List[Int])
    val leaves = active.map(s => Pack(freqs(s), s :: Nil))
      .sortBy(p => (p.w, p.syms.head)).toVector
    var row = leaves
    var level = 1
    while (level < limit) {
      val paired = row.grouped(2).collect {
        case two if two.length == 2 =>
          Pack(two(0).w + two(1).w, two(0).syms ++ two(1).syms)
      }.toVector
      // stable merge keeps determinism across runs/partitions
      row = (leaves ++ paired).sortBy(_.w)
      level += 1
    }
    row.take(2 * active.length - 2)
      .foreach(_.syms.foreach(s => lengths(s) += 1))
    lengths
  }

  // ── VP8L prefix-coded value scheme (lengths and distances) ────────

  /** value (≥1) → (prefix symbol, extra bits, extra value); inverse of
    * the spec's offset + ReadBits(extra) + 1.
    */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    val x = v - 1
    if (x < 2) (x, 0, 0)
    else {
      val k = 31 - Integer.numberOfLeadingZeros(x)
      val e = k - 1
      val sym = if (x >= (3 << e)) 2 * e + 3 else 2 * e + 2
      (sym, e, x - ((2 + (sym & 1)) << e))
    }
  }

  private def prefixDecodeValue(sym: Int, br: BitReader): Int =
    if (sym < 4) sym + 1
    else {
      val e = (sym - 2) >> 1
      ((2 + (sym & 1)) << e) + br.readBits(e) + 1
    }

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  // ── pixel-channel arithmetic (ARGB ints) ──────────────────────────

  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  private def subPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) - (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) - (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = ((((a >>> 24) + (b >>> 24)) / 2) & 0xff) << 24
    val rr = (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2) & 0xff) << 16
    val gg = (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2) & 0xff) << 8
    val bb = (((a & 0xff) + (b & 0xff)) / 2) & 0xff
    aa | rr | gg | bb
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def c(sh: Int) = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
      ((tl >>> sh) & 0xff)) << sh
    c(24) | c(16) | c(8) | c(0)
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    def c(sh: Int) = {
      val a = (ave >>> sh) & 0xff
      clamp255(a + (a - ((tl >>> sh) & 0xff)) / 2) << sh
    }
    c(24) | c(16) | c(8) | c(0)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
    var pL = 0
    var pT = 0
    var sh = 0
    while (sh < 32) {
      val p = ch(l, sh) + ch(t, sh) - ch(tl, sh)
      pL += math.abs(p - ch(l, sh))
      pT += math.abs(p - ch(t, sh))
      sh += 8
    }
    if (pL < pT) l else t
  }

  /** The 14 spec predictors; -1 marks an invalid mode. */
  private def predictPixel(mode: Int, l: Int, t: Int, tl: Int,
      tr: Int): Int = mode match {
    case 0 => 0xff000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => avg2(avg2(l, tr), t)
    case 6 => avg2(l, tl)
    case 7 => avg2(l, t)
    case 8 => avg2(tl, t)
    case 9 => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => select(l, t, tl)
    case 12 => clampAddSubtractFull(l, t, tl)
    case 13 => clampAddSubtractHalf(avg2(l, t), tl)
    case _ => -1
  }

  /** Predictor for position i on a row-major image where neighbors are
    * already final. Edge rules per spec: (0,0) predicts opaque black,
    * row 0 predicts LEFT, column 0 predicts TOP; the top-right of the
    * last column is the first pixel of the current row (the
    * contiguous-memory addressing the spec codifies).
    */
  private def predictorAt(px: Array[Int], w: Int, x: Int, y: Int,
      mode: Int): Int = {
    val i = y * w + x
    if (x == 0 && y == 0) 0xff000000
    else if (y == 0) px(i - 1)
    else if (x == 0) px(i - w)
    else predictPixel(mode, px(i - 1), px(i - w), px(i - w - 1),
      px(i - w + 1))
  }

  // ── entropy-coded image (shared by the ARGB image and sub-images) ─

  private def readEntropyImage(br: BitReader, w: Int, h: Int,
      level0: Boolean): Option[Array[Int]] = {
    val cacheBits = if (br.readBits(1) == 1) br.readBits(4) else 0
    if (cacheBits > 11) return None
    // the meta-prefix bit exists ONLY at level 0 (sub-images never
    // consume it — the spec's allow_recursion short-circuit)
    if (level0 && br.readBits(1) != 0) return None
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val green = readPrefixCode(br, 256 + 24 + cacheSize).getOrElse(return None)
    val red = readPrefixCode(br, 256).getOrElse(return None)
    val blue = readPrefixCode(br, 256).getOrElse(return None)
    val alpha = readPrefixCode(br, 256).getOrElse(return None)
    val dist = readPrefixCode(br, 40).getOrElse(return None)
    val n = w * h
    val px = new Array[Int](n)
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    def insert(p: Int): Unit =
      if (cache != null) cache(cacheHash(p, cacheBits)) = p
    var pos = 0
    while (pos < n && !br.eof) {
      val s = green.next(br)
      if (s < 0) return None
      if (s < 256) {
        val r = red.next(br)
        val b = blue.next(br)
        val a = alpha.next(br)
        if ((r | b | a) < 0) return None
        val p = (a << 24) | (r << 16) | (s << 8) | b
        px(pos) = p
        insert(p)
        pos += 1
      } else if (s < 256 + 24) {
        val length = prefixDecodeValue(s - 256, br)
        val ds = dist.next(br)
        if (ds < 0) return None
        val planeCode = prefixDecodeValue(ds, br)
        // mapped 2-D codes (≤ 120) are out of the decode surface
        if (planeCode <= 120) return None
        val d = planeCode - 120
        if (d > pos || pos + length > n) return None
        var k = 0
        while (k < length) {
          val p = px(pos - d)
          px(pos) = p
          insert(p)
          pos += 1
          k += 1
        }
      } else {
        if (cache == null) return None
        val idx = s - 256 - 24
        if (idx >= cacheSize) return None
        px(pos) = cache(idx)
        pos += 1
      }
    }
    if (pos == n && !br.eof) Some(px) else None
  }

  /** One prefix code, simple or normal form. */
  private def readPrefixCode(br: BitReader,
      alphabetSize: Int): Option[PrefixDecoder] = {
    val lengths = new Array[Int](alphabetSize)
    if (br.readBits(1) == 1) { // simple
      val numSymbols = br.readBits(1) + 1
      val first8 = br.readBits(1) == 1
      val s0 = br.readBits(if (first8) 8 else 1)
      if (s0 >= alphabetSize) return None
      if (numSymbols == 1) lengths(s0) = 1 // degenerate: zero-bit read
      else {
        val s1 = br.readBits(8)
        if (s1 >= alphabetSize || s1 == s0) return None
        lengths(s0) = 1
        lengths(s1) = 1
      }
      Some(new PrefixDecoder(lengths)).filter(_.valid)
    } else { // normal: code-length-coded lengths
      val numCodes = br.readBits(4) + 4
      if (numCodes > ClOrder.length) return None
      val clLengths = new Array[Int](ClOrder.length)
      var i = 0
      while (i < numCodes) { clLengths(ClOrder(i)) = br.readBits(3); i += 1 }
      val cl = new PrefixDecoder(clLengths)
      if (!cl.valid) return None
      var maxSymbol =
        if (br.readBits(1) == 1) {
          val lengthNBits = 2 + 2 * br.readBits(3)
          2 + br.readBits(lengthNBits)
        } else alphabetSize
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0 && !br.eof) {
        maxSymbol -= 1
        val c = cl.next(br)
        if (c < 0 || c > 18) return None
        if (c < 16) {
          lengths(sym) = c
          sym += 1
          if (c != 0) prev = c
        } else {
          val (repeat, value) = c match {
            case 16 => (br.readBits(2) + 3, prev)
            case 17 => (br.readBits(3) + 3, 0)
            case _ => (br.readBits(7) + 11, 0)
          }
          if (sym + repeat > alphabetSize) return None
          var k = 0
          while (k < repeat) { lengths(sym) = value; sym += 1; k += 1 }
        }
      }
      if (br.eof) return None
      Some(new PrefixDecoder(lengths)).filter(_.valid)
    }
  }

  // ── decode ────────────────────────────────────────────────────────

  private val Vp8lMagic = 0x2f

  /** Full VP8L pixel decode from a WebP container. */
  def decode(payload: Array[Byte]): Option[Image] = {
    val (off, len) = vp8lChunk(payload).getOrElse(return None)
    if (len < 5) return None
    if ((payload(off) & 0xff) != Vp8lMagic) return None
    val br = new BitReader(payload, off + 1, off + len)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    val alphaUsed = br.readBits(1)
    if (br.readBits(3) != 0) return None // version
    if (w.toLong * h > PngCodec.MaxPixels) return None

    // transform stack, in read order
    var order = List.empty[Int]
    var predictor: Option[(Int, Array[Int], Int)] = None // sizeBits, modes, subW
    var palette: Option[(Array[Int], Int)] = None // entries, xbits
    var decodeW = w
    var more = br.readBits(1) == 1
    while (more) {
      val t = br.readBits(2)
      if (order.contains(t)) return None // each transform at most once
      order = order :+ t
      t match {
        case 2 => () // subtract-green: no data
        case 0 =>
          val sizeBits = br.readBits(3) + 2
          val bs = 1 << sizeBits
          val sw = (w + bs - 1) >> sizeBits
          val sh = (h + bs - 1) >> sizeBits
          val modes = readEntropyImage(br, sw, sh, level0 = false)
            .getOrElse(return None)
          predictor = Some((sizeBits, modes, sw))
        case 3 =>
          val tableSize = br.readBits(8) + 1
          val raw = readEntropyImage(br, tableSize, 1, level0 = false)
            .getOrElse(return None)
          // palette entries are delta-coded against the previous one
          val pal = new Array[Int](tableSize)
          var prev = 0
          var i = 0
          while (i < tableSize) { pal(i) = addPixels(prev, raw(i)); prev = pal(i); i += 1 }
          val xbits =
            if (tableSize <= 2) 3
            else if (tableSize <= 4) 2
            else if (tableSize <= 16) 1
            else 0
          palette = Some((pal, xbits))
          decodeW = (w + (1 << xbits) - 1) >> xbits
        case _ => return None // cross-channel color transform: out of surface
      }
      more = br.readBits(1) == 1
    }
    if (br.eof) return None
    // predictor-over-packed-indices is a combination real encoders do
    // not produce; dims would disagree — reject rather than guess
    if (predictor.isDefined && palette.isDefined) return None

    var px = readEntropyImage(br, decodeW, h, level0 = true)
      .getOrElse(return None)
    if (br.eof) return None

    // inverse transforms, reverse read order
    order.reverse.foreach {
      case 2 => // add green back to red and blue
        var i = 0
        while (i < px.length) {
          val p = px(i)
          val g = (p >> 8) & 0xff
          val r = (((p >> 16) & 0xff) + g) & 0xff
          val b = ((p & 0xff) + g) & 0xff
          px(i) = (p & 0xff00ff00) | (r << 16) | b
          i += 1
        }
      case 0 =>
        val (sizeBits, modes, subW) = predictor.get
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val mode =
              (modes((y >> sizeBits) * subW + (x >> sizeBits)) >> 8) & 0xff
            if (mode > 13) return None
            val i = y * w + x
            px(i) = addPixels(px(i), predictorAt(px, w, x, y, mode))
            x += 1
          }
          y += 1
        }
      case 3 =>
        val (pal, xbits) = palette.get
        val unpacked = new Array[Int](w * h)
        val perPacked = 1 << xbits
        val bitsPer = 8 >> xbits
        val mask = (1 << bitsPer) - 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val packed = px(y * decodeW + x / perPacked)
            val g = (packed >> 8) & 0xff
            val idx = (g >> ((x % perPacked) * bitsPer)) & mask
            unpacked(y * w + x) =
              if (idx < pal.length) pal(idx) else 0x00000000
            x += 1
          }
          y += 1
        }
        px = unpacked
      case _ => return None
    }

    val useAlpha = alphaUsed == 1
    val ch = if (useAlpha) 4 else 3
    val data = new Array[Byte](w * h * ch)
    var i = 0
    while (i < w * h) {
      val p = px(i)
      data(i * ch) = ((p >> 16) & 0xff).toByte
      data(i * ch + 1) = ((p >> 8) & 0xff).toByte
      data(i * ch + 2) = (p & 0xff).toByte
      if (useAlpha) data(i * ch + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    Some(Image(w, h, ch, data))
  }

  // ── encode ────────────────────────────────────────────────────────

  private val CacheBits = 8

  private sealed trait Tok
  private final case class Lit(argb: Int) extends Tok
  private final case class CacheRef(idx: Int) extends Tok
  private final case class Copy(len: Int) extends Tok // distance always 1

  private def toArgb(img: Image): (Array[Int], Boolean) = {
    val n = img.width * img.height
    val px = new Array[Int](n)
    var i = 0
    while (i < n) {
      px(i) = img.channels match {
        case 4 =>
          val o = i * 4
          ((img.data(o + 3) & 0xff) << 24) | ((img.data(o) & 0xff) << 16) |
            ((img.data(o + 1) & 0xff) << 8) | (img.data(o + 2) & 0xff)
        case 3 =>
          val o = i * 3
          0xff000000 | ((img.data(o) & 0xff) << 16) |
            ((img.data(o + 1) & 0xff) << 8) | (img.data(o + 2) & 0xff)
        case 2 =>
          val v = img.data(i * 2) & 0xff
          ((img.data(i * 2 + 1) & 0xff) << 24) | (v << 16) | (v << 8) | v
        case _ =>
          val v = img.data(i) & 0xff
          0xff000000 | (v << 16) | (v << 8) | v
      }
      i += 1
    }
    (px, img.channels == 4 || img.channels == 2)
  }

  /** Tokenize + histogram + code + emit one entropy-coded image.
    * `level0` controls the meta-prefix bit; `useCache` trades header
    * bits for hits (off for tiny sub-images).
    */
  private def writeEntropyImage(bw: BitWriter, px: Array[Int],
      level0: Boolean, useCache: Boolean): Unit = {
    val cacheBits = if (useCache) CacheBits else 0
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val cache = if (useCache) new Array[Int](1 << cacheBits) else null
    val seeded = if (useCache) new Array[Boolean](1 << cacheBits) else null
    def insert(p: Int): Unit = if (useCache) {
      val hsh = cacheHash(p, cacheBits)
      cache(hsh) = p
      seeded(hsh) = true
    }
    var i = 0
    val n = px.length
    while (i < n) {
      val p = px(i)
      var run = 0
      if (i > 0 && p == px(i - 1)) {
        while (i + run < n && px(i + run) == px(i - 1) && run < 4096) run += 1
      }
      if (run >= 2) {
        toks += Copy(run)
        insert(p) // all copied pixels identical: one insert suffices
        i += run
      } else {
        val hsh = if (useCache) cacheHash(p, cacheBits) else 0
        if (useCache && seeded(hsh) && cache(hsh) == p) toks += CacheRef(hsh)
        else { toks += Lit(p); insert(p) }
        i += 1
      }
    }

    val greenF = new Array[Long](256 + 24 + (if (useCache) 1 << cacheBits else 0))
    val redF = new Array[Long](256)
    val blueF = new Array[Long](256)
    val alphaF = new Array[Long](256)
    val distF = new Array[Long](40)
    val dist1 = prefixEncode(1 + 120) // plane code for distance 1
    toks.foreach {
      case Lit(p) =>
        greenF((p >> 8) & 0xff) += 1
        redF((p >> 16) & 0xff) += 1
        blueF(p & 0xff) += 1
        alphaF((p >>> 24) & 0xff) += 1
      case CacheRef(idx) => greenF(256 + 24 + idx) += 1
      case Copy(len) =>
        greenF(256 + prefixEncode(len)._1) += 1
        distF(dist1._1) += 1
    }

    if (useCache) {
      bw.writeBits(1, 1)
      bw.writeBits(cacheBits, 4)
    } else bw.writeBits(0, 1)
    if (level0) bw.writeBits(0, 1) // no meta prefix codes

    val greenC = writePrefixCode(bw, greenF)
    val redC = writePrefixCode(bw, redF)
    val blueC = writePrefixCode(bw, blueF)
    val alphaC = writePrefixCode(bw, alphaF)
    val distC = writePrefixCode(bw, distF)

    toks.foreach {
      case Lit(p) =>
        greenC((p >> 8) & 0xff, bw)
        redC((p >> 16) & 0xff, bw)
        blueC(p & 0xff, bw)
        alphaC((p >>> 24) & 0xff, bw)
      case CacheRef(idx) => greenC(256 + 24 + idx, bw)
      case Copy(len) =>
        val (ls, le, lv) = prefixEncode(len)
        greenC(256 + ls, bw)
        bw.writeBits(lv, le)
        distC(dist1._1, bw)
        bw.writeBits(dist1._3, dist1._2)
    }
  }

  /** VP8L-lossless encode (1/2/3/4-channel rasters; gray encodes as
    * r=g=b). No transforms — the plain literal/LZ77/cache stream.
    */
  def encode(img: Image): Array[Byte] =
    encodeWith(img, subtractGreen = false, predictorMode = None)

  /** VP8L encode with the transform stack: optional SUBTRACT-GREEN
    * and an optional fixed-mode PREDICTOR (mode 0-13, constant across
    * blocks — the sub-resolution mode image is a single-literal
    * entropy image). Forward order subtract-green → predictor;
    * bitstream lists them so the decoder inverts in the right order.
    */
  def encodeWith(img: Image, subtractGreen: Boolean,
      predictorMode: Option[Int]): Array[Byte] = {
    require(img.width > 0 && img.height > 0 &&
      img.width <= (1 << 14) && img.height <= (1 << 14),
      "VP8L dims are 14-bit")
    predictorMode.foreach(m => require(m >= 0 && m <= 13,
      s"predictor mode 0-13, got $m"))
    val (orig, alphaUsed) = toArgb(img)
    val w = img.width
    val h = img.height

    var px = orig
    if (subtractGreen) {
      val out = new Array[Int](px.length)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        out(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
      px = out
    }
    predictorMode.foreach { mode =>
      // residuals against the (possibly subtract-greened) final values,
      // scanning forward so neighbors are the values the decoder will
      // have already reconstructed
      val src = px
      val out = new Array[Int](src.length)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          out(i) = subPixels(src(i), predictorAt(src, w, x, y, mode))
          x += 1
        }
        y += 1
      }
      px = out
    }

    val bw = new BitWriter
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(if (alphaUsed) 1 else 0, 1)
    bw.writeBits(0, 3) // version
    if (subtractGreen) {
      bw.writeBits(1, 1)
      bw.writeBits(2, 2)
    }
    predictorMode.foreach { mode =>
      bw.writeBits(1, 1)
      bw.writeBits(0, 2)
      val sizeBits = 4 // 16-pixel blocks
      bw.writeBits(sizeBits - 2, 3)
      val bs = 1 << sizeBits
      val sw = (w + bs - 1) >> sizeBits
      val sh = (h + bs - 1) >> sizeBits
      // constant mode image: every block pixel = 0xff000000 | mode<<8
      writeEntropyImage(bw,
        Array.fill(sw * sh)(0xff000000 | (mode << 8)),
        level0 = false, useCache = false)
    }
    bw.writeBits(0, 1) // end of transforms
    writeEntropyImage(bw, px, level0 = true, useCache = true)
    container(bw.toBytes)
  }

  /** Palette (COLOR-INDEXING) encode: for rasters with ≤ 256 distinct
    * colors — the icon/logo/diagram shape — emit the delta-coded
    * palette plus the index image, pixel-BUNDLED into sub-byte widths
    * when the palette is small (≤16 → 2 px/byte, ≤4 → 4, ≤2 → 8).
    * Falls back to [[encode]] when the color census exceeds 256.
    */
  def encodeIndexed(img: Image): Array[Byte] = {
    require(img.width > 0 && img.height > 0 &&
      img.width <= (1 << 14) && img.height <= (1 << 14),
      "VP8L dims are 14-bit")
    val (px, alphaUsed) = toArgb(img)
    val w = img.width
    val h = img.height
    val palette = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    var i = 0
    while (i < px.length && palette.size <= 256) {
      val p = px(i)
      if (!palette.contains(p)) palette(p) = palette.size
      i += 1
    }
    if (palette.size > 256) return encode(img)
    val tableSize = palette.size
    val xbits =
      if (tableSize <= 2) 3
      else if (tableSize <= 4) 2
      else if (tableSize <= 16) 1
      else 0
    val perPacked = 1 << xbits
    val bitsPer = 8 >> xbits
    val packedW = (w + perPacked - 1) >> xbits

    val packed = new Array[Int](packedW * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < packedW) {
        var g = 0
        var j = 0
        while (j < perPacked) {
          val srcX = x * perPacked + j
          if (srcX < w) g |= palette(px(y * w + srcX)) << (j * bitsPer)
          j += 1
        }
        packed(y * packedW + x) = 0xff000000 | (g << 8)
        x += 1
      }
      y += 1
    }
    // delta-code palette entries
    val entries = palette.keys.toArray
    val deltas = new Array[Int](tableSize)
    var prev = 0
    i = 0
    while (i < tableSize) { deltas(i) = subPixels(entries(i), prev); prev = entries(i); i += 1 }

    val bw = new BitWriter
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(if (alphaUsed) 1 else 0, 1)
    bw.writeBits(0, 3)
    bw.writeBits(1, 1) // one transform…
    bw.writeBits(3, 2) // …color indexing
    bw.writeBits(tableSize - 1, 8)
    writeEntropyImage(bw, deltas, level0 = false, useCache = false)
    bw.writeBits(0, 1) // end of transforms
    writeEntropyImage(bw, packed, level0 = true, useCache = true)
    container(bw.toBytes)
  }

  /** Emit one prefix code (simple when it fits, else normal RLE form);
    * returns the symbol writer.
    */
  private def writePrefixCode(bw: BitWriter,
      freqs: Array[Long]): (Int, BitWriter) => Unit = {
    val used = freqs.indices.filter(freqs(_) > 0)
    val simpleOk = used.nonEmpty && used.length <= 2 && used.forall(_ < 256)
    if (used.isEmpty || simpleOk) {
      // a code is mandatory even if never exercised: 1-symbol simple
      val syms = if (used.isEmpty) Seq(0) else used.sorted
      bw.writeBits(1, 1) // simple
      bw.writeBits(syms.length - 1, 1)
      val first8 = syms.head >= 2
      bw.writeBits(if (first8) 1 else 0, 1)
      bw.writeBits(syms.head, if (first8) 8 else 1)
      if (syms.length == 2) bw.writeBits(syms(1), 8)
      val codeOf = syms.zipWithIndex.toMap
      val len = if (syms.length == 1) 0 else 1
      (sym: Int, w: BitWriter) => w.writeCode(codeOf(sym), len)
    } else {
      val lengths = limitedLengths(freqs, MaxAllowedCodeLength)
      val codes = canonicalCodes(lengths)
      bw.writeBits(0, 1) // normal
      // RLE-tokenize the length sequence (16 repeats prev NONZERO len,
      // 17/18 zero runs) — trailing zeros still emitted so the reader,
      // told nothing via max_symbol, covers the whole alphabet
      val clToks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i < lengths.length) {
        val v = lengths(i)
        var run = 1
        while (i + run < lengths.length && lengths(i + run) == v) run += 1
        if (v == 0) {
          var left = run
          while (left >= 11) {
            val take = math.min(left, 138)
            clToks += ((18, take - 11)); left -= take
          }
          while (left >= 3) {
            val take = math.min(left, 10)
            clToks += ((17, take - 3)); left -= take
          }
          while (left > 0) { clToks += ((0, 0)); left -= 1 }
        } else {
          // one literal (sets the 16-code's "previous"), rest via 16s
          clToks += ((v, 0))
          var left = run - 1
          while (left >= 3) {
            val take = math.min(left, 6)
            clToks += ((16, take - 3)); left -= take
          }
          while (left > 0) { clToks += ((v, 0)); left -= 1 }
        }
        i += run
      }
      val clFreq = new Array[Long](19)
      clToks.foreach { case (c, _) => clFreq(c) += 1 }
      val clLengths = limitedLengths(clFreq, 7)
      val clCodes = canonicalCodes(clLengths)
      val maxOrderIdx = ClOrder.indices
        .filter(oi => clLengths(ClOrder(oi)) > 0).foldLeft(3)(math.max)
      val numCodes = maxOrderIdx + 1
      bw.writeBits(numCodes - 4, 4)
      (0 until numCodes).foreach(oi => bw.writeBits(clLengths(ClOrder(oi)), 3))
      bw.writeBits(0, 1) // no max_symbol shortcut
      clToks.foreach { case (c, extra) =>
        bw.writeCode(clCodes(c), clLengths(c))
        c match {
          case 16 => bw.writeBits(extra, 2)
          case 17 => bw.writeBits(extra, 3)
          case 18 => bw.writeBits(extra, 7)
          case _ => ()
        }
      }
      (sym: Int, w: BitWriter) => w.writeCode(codes(sym), lengths(sym))
    }
  }

  // ── RIFF container ────────────────────────────────────────────────

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def container(vp8l: Array[Byte]): Array[Byte] = {
    val full = Array[Byte](Vp8lMagic.toByte) ++ vp8l
    val padded = if (full.length % 2 == 1) full :+ 0.toByte else full
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + padded.length) ++
      "WEBP".getBytes("US-ASCII") ++
      "VP8L".getBytes("US-ASCII") ++ le32(full.length) ++ padded
  }

  private def leu32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), "US-ASCII")

  /** (offset, length) of the first VP8L chunk's payload. */
  private def vp8lChunk(b: Array[Byte]): Option[(Int, Int)] =
    chunkOf(b, "VP8L")

  private def chunkOf(b: Array[Byte], want: String): Option[(Int, Int)] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" ||
      tag(b, 8) != "WEBP") return None
    var off = 12
    while (off + 8 <= b.length) {
      val t = tag(b, off)
      val len = leu32(b, off + 4)
      if (len < 0 || len > Int.MaxValue - 8 ||
        off + 8 + len > b.length) return None
      if (t == want) return Some((off + 8, len.toInt))
      off += 8 + len.toInt + (len.toInt & 1)
    }
    None
  }

  // ── header-only dims (VP8L / lossy VP8 / extended VP8X) ───────────

  /** WebP dimensions from whichever stream chunk is present — the
    * [[ImageHeaders]] metadata tier for this container.
    */
  def dims(payload: Array[Byte]): Option[ImageHeaders.Dims] =
    chunkOf(payload, "VP8L").flatMap { case (off, len) =>
      if (len < 5 || (payload(off) & 0xff) != Vp8lMagic) None
      else {
        val br = new BitReader(payload, off + 1, off + len)
        val w = br.readBits(14) + 1
        val h = br.readBits(14) + 1
        Some(ImageHeaders.Dims("webp", w, h))
      }
    }.orElse(chunkOf(payload, "VP8X").flatMap { case (off, len) =>
      // canvas size: 24-bit minus-one fields after 4 flag/reserved bytes
      if (len < 10) None
      else {
        def u24(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
          ((payload(o + 2) & 0xff) << 16)
        Some(ImageHeaders.Dims("webp", u24(off + 4) + 1, u24(off + 7) + 1))
      }
    }).orElse(chunkOf(payload, "VP8 ").flatMap { case (off, len) =>
      // lossy: 3-byte frame tag, start code 9D 01 2A, 14-bit w/h (LE)
      if (len < 10 || (payload(off + 3) & 0xff) != 0x9d ||
        (payload(off + 4) & 0xff) != 0x01 ||
        (payload(off + 5) & 0xff) != 0x2a) None
      else {
        val w = ((payload(off + 6) & 0xff) | ((payload(off + 7) & 0xff) << 8)) & 0x3fff
        val h = ((payload(off + 8) & 0xff) | ((payload(off + 9) & 0xff) << 8)) & 0x3fff
        if (w == 0 || h == 0) None else Some(ImageHeaders.Dims("webp", w, h))
      }
    })
}
