package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free PNG PIXEL codec — the full-decode leg the header
  * parser ([[ImageHeaders]]) deliberately stopped short of: chunk walk
  * with CRC validation, IDAT zlib inflate (`java.util.zip.Inflater` —
  * zlib IS the PNG compression, no native codec involved), and the
  * per-scanline unfilter pass (filters 0–4: None/Sub/Up/Average/Paeth
  * per the PNG spec §9), yielding raw interleaved samples.
  *
  * Supported surface, stated honestly: 8-bit depth, color types 0
  * (gray), 2 (RGB), 3 (palette — PLTE lookup expands to RGB; tRNS is
  * skipped, so the output is the opaque projection), 4 (gray+alpha),
  * 6 (RGBA), non-interlaced — the shapes a training-data pipeline
  * actually normalizes to. 1/2/4-bit depths, 16-bit, and Adam7
  * interlace decode to None rather than wrong pixels.
  *
  * Scale/robustness posture: decode is O(pixels) per row and runs
  * inside per-partition batch stages ([[graft.ext.Multimodal]]); a
  * decompression bomb cannot overshoot — the inflate target is the
  * exact raster size computed from the (CRC-validated) IHDR, bounded by
  * [[MaxPixels]], and surplus compressed bytes reject the payload.
  *
  * The encoder emits REAL standards-compliant PNGs (used as test/query
  * fixtures): zlib-deflated IDAT, per-row filter chosen as row%5 so a
  * round-trip exercises every unfilter arm, correct CRCs everywhere.
  */
object PngCodec {

  /** Raster cap for a single decode: 64 M samples (≈ a 4096×4096 RGBA
    * frame) — beyond that a row belongs in a tiled layout, not one cell.
    */
  val MaxPixels: Long = 1L << 26

  /** Decoded raster: row-major, channel-interleaved 8-bit samples;
    * `data.length == width * height * channels`.
    */
  final case class Image(width: Int, height: Int, channels: Int,
      data: Array[Byte])

  private val Sig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // gray
    case 2 => 3 // rgb
    case 4 => 2 // gray + alpha
    case 6 => 4 // rgba
    case _ => -1 // palette (3) and friends: unsupported
  }

  /** Full pixel decode; None on anything malformed OR outside the
    * supported surface (never throws, never returns wrong pixels).
    */
  def decode(payload: Array[Byte]): Option[Image] = {
    if (payload == null || payload.length < 45) return None // sig+IHDR+IDAT+IEND min
    var i = 0
    while (i < 8) { if (payload(i) != Sig(i)) return None; i += 1 }

    // IHDR must be first (reuse the header parser's validation incl CRC)
    if (ImageHeaders.pngDims(payload).isEmpty) return None
    val w = be32(payload, 16)
    val h = be32(payload, 20)
    val bitDepth = payload(24) & 0xff
    val colorType = payload(25) & 0xff
    val compression = payload(26) & 0xff
    val filterMethod = payload(27) & 0xff
    val interlace = payload(28) & 0xff
    val isPalette = colorType == 3
    val ch = if (isPalette) 1 else channelsOf(colorType) // filter-pass bpp
    val outCh = if (isPalette) 3 else ch
    if (bitDepth != 8 || ch < 0 || interlace != 0 ||
      compression != 0 || filterMethod != 0) return None
    if (w * h > MaxPixels || w * h * outCh > Int.MaxValue - 64) return None
    val width = w.toInt
    val height = h.toInt

    // chunk walk: concatenate IDAT bodies (CRC-checked), capture PLTE
    // for palette images (required, pre-IDAT, ≤256 RGB entries; PLTE on
    // a non-palette image stays rejected — this codec doesn't honor
    // suggested palettes), stop at IEND
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var off = 8 + 25 // past IHDR
    var sawEnd = false
    while (!sawEnd) {
      if (off + 12 > payload.length) return None // truncated walk
      val len = be32(payload, off)
      if (len < 0 || len > Int.MaxValue - 12 ||
        off + 12 + len > payload.length) return None
      val crc = new CRC32
      crc.update(payload, off + 4, 4 + len.toInt)
      if (crc.getValue != be32(payload, off + 8 + len.toInt)) return None
      val ctype = new String(payload, off + 4, 4, "US-ASCII")
      ctype match {
        case "IDAT" => idat.write(payload, off + 8, len.toInt)
        case "PLTE" =>
          if (!isPalette || plte != null || idat.size() > 0) return None
          if (len == 0 || len % 3 != 0 || len > 768) return None
          plte = java.util.Arrays.copyOfRange(payload, off + 8,
            off + 8 + len.toInt)
        case "IEND" => sawEnd = true
        case t if (t.charAt(0) & 0x20) == 0 => return None // unknown CRITICAL chunk
        case _ => () // ancillary (tEXt, gAMA, …): skip
      }
      off += 12 + len.toInt
    }
    val compressed = idat.toByteArray
    if (compressed.isEmpty) return None
    if (isPalette && plte == null) return None

    // inflate to the EXACT raster size the IHDR implies — a bomb or a
    // short stream both reject
    val stride = width * ch
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new Inflater()
    try {
      inf.setInput(compressed)
      var produced = 0
      while (produced < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, produced, raw.length - produced)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        produced += n
      }
      if (produced < raw.length) return None
      // surplus plaintext beyond the raster = not the image IHDR declared
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // unfilter scanlines in place (spec §9); bpp = channels at depth 8
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val a = if (x >= ch) out(rowOut + x - ch) & 0xff else 0
        val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val c = if (x >= ch && y > 0) out(rowOut - stride + x - ch) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        out(rowOut + x) = ((raw(rowIn + x) & 0xff) + pred).toByte
        x += 1
      }
      y += 1
    }
    if (!isPalette) Some(Image(width, height, ch, out))
    else {
      // palette lookup: index raster → RGB; an index past the palette
      // is malformed (never reads garbage colors). tRNS is ancillary
      // and skipped — output is the opaque RGB projection.
      val nEntries = plte.length / 3
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < width * height) {
        val idx = out(i) & 0xff
        if (idx >= nEntries) return None
        rgb(3 * i) = plte(3 * idx)
        rgb(3 * i + 1) = plte(3 * idx + 1)
        rgb(3 * i + 2) = plte(3 * idx + 2)
        i += 1
      }
      Some(Image(width, height, 3, rgb))
    }
  }

  /** Paeth predictor (spec §9.4): nearest of a/b/c to a+b−c, ties a,b,c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ── encoder (real PNGs, fixture-grade) ───────────────────────────

  /** Encode an 8-bit raster to a standards-compliant PNG. Per-row
    * filter = row % 5, so decoding a multi-row image crosses every
    * unfilter arm; zlib via Deflater (default level).
    */
  def encode(img: Image): Array[Byte] = {
    val colorType = img.channels match {
      case 1 => 0
      case 2 => 4
      case 3 => 2
      case 4 => 6
      case n => throw new IllegalArgumentException(s"unsupported channels $n")
    }
    require(img.width > 0 && img.height > 0 &&
      img.data.length == img.width * img.height * img.channels,
      "raster size must match dims")
    val stride = img.width * img.channels
    val ch = img.channels

    // filter pass
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      val rowIn = y * stride
      val rowOut = y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val cur = img.data(rowIn + x) & 0xff
        val a = if (x >= ch) img.data(rowIn + x - ch) & 0xff else 0
        val b = if (y > 0) img.data(rowIn - stride + x) & 0xff else 0
        val c = if (x >= ch && y > 0) img.data(rowIn - stride + x - ch) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(rowOut + x) = (cur - pred).toByte
        x += 1
      }
      y += 1
    }

    // zlib-compress the filtered stream
    val def_ = new Deflater()
    val compressed = try {
      def_.setInput(raw); def_.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def_.finished()) buf.write(tmp, 0, def_.deflate(tmp))
      buf.toByteArray
    } finally def_.end()

    val out = java.nio.ByteBuffer.allocate(
      8 + 25 + (12 + compressed.length) + 12)
    out.put(Sig)
    writeChunk(out, "IHDR", { b =>
      b.putInt(img.width).putInt(img.height)
      b.put(8.toByte).put(colorType.toByte)
      b.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no-interlace
    }, 13)
    writeChunk(out, "IDAT", _.put(compressed), compressed.length)
    writeChunk(out, "IEND", _ => (), 0)
    out.array()
  }

  private def writeChunk(out: java.nio.ByteBuffer, ctype: String,
      body: java.nio.ByteBuffer => Unit, len: Int): Unit = {
    out.putInt(len)
    val start = out.position()
    out.put(ctype.getBytes("US-ASCII"))
    body(out)
    val crc = new CRC32
    crc.update(out.array(), start, 4 + len)
    out.putInt(crc.getValue.toInt)
  }

  /** Encode an 8-bit PALETTE PNG (color type 3): `palette` is packed
    * RGB triplets (≤ 256 entries), `indices` the row-major index
    * raster. Same per-row filter = row%5 discipline as [[encode]] (the
    * filter pass runs on the index plane at bpp 1, exactly how the
    * decoder unfilters it). Decodes — here and in any conformant
    * viewer — to the palette-expanded RGB raster.
    */
  def encodePalette(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && indices.length == width * height,
      "index raster must match dims")
    require(palette.nonEmpty && palette.length % 3 == 0 &&
      palette.length <= 768, "palette must be 1..256 RGB triplets")
    val n = palette.length / 3
    require(indices.forall(i => (i & 0xff) < n), "index out of palette range")

    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      val ft = y % 5
      raw(y * (width + 1)) = ft.toByte
      val rowIn = y * width
      val rowOut = y * (width + 1) + 1
      var x = 0
      while (x < width) {
        val cur = indices(rowIn + x) & 0xff
        val a = if (x >= 1) indices(rowIn + x - 1) & 0xff else 0
        val b = if (y > 0) indices(rowIn - width + x) & 0xff else 0
        val c = if (x >= 1 && y > 0) indices(rowIn - width + x - 1) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(rowOut + x) = (cur - pred).toByte
        x += 1
      }
      y += 1
    }

    val def_ = new Deflater()
    val compressed = try {
      def_.setInput(raw); def_.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def_.finished()) buf.write(tmp, 0, def_.deflate(tmp))
      buf.toByteArray
    } finally def_.end()

    val out = java.nio.ByteBuffer.allocate(
      8 + 25 + (12 + palette.length) + (12 + compressed.length) + 12)
    out.put(Sig)
    writeChunk(out, "IHDR", { b =>
      b.putInt(width).putInt(height)
      b.put(8.toByte).put(3.toByte) // depth 8, palette
      b.put(0.toByte).put(0.toByte).put(0.toByte)
    }, 13)
    writeChunk(out, "PLTE", _.put(palette), palette.length)
    writeChunk(out, "IDAT", _.put(compressed), compressed.length)
    writeChunk(out, "IEND", _ => (), 0)
    out.array()
  }

  /** Deterministic RGB test raster: pixel (x,y) of image `seed` is
    * (seed + 3x + 7y, 2·seed + 5x + y, 3·seed + x + 11y) mod 256 —
    * integer arithmetic an oracle can replay in SQL.
    */
  def syntheticRgb(seed: Long, width: Int, height: Int): Image = {
    val data = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        data(i) = ((seed + 3L * x + 7L * y) % 256).toByte
        data(i + 1) = ((2L * seed + 5L * x + y) % 256).toByte
        data(i + 2) = ((3L * seed + x + 11L * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, 3, data)
  }
}
