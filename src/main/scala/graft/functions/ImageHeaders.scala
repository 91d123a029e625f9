package graft.functions

import java.util.zip.CRC32

/** Dependency-free image HEADER codecs: parse (and, for test fixtures,
  * emit) just enough of the PNG and JPEG container formats to recover
  * dimensions from the leading bytes — the metadata step of a
  * multimodal pipeline, runnable anywhere the JVM is, with no native
  * codec. Full pixel decode stays behind [[graft.ext.Multimodal]]'s
  * declared kernel seam; THIS byte-format logic is real:
  *
  *  - PNG: 8-byte signature, then the IHDR chunk (must be first per the
  *    spec): length=13, type "IHDR", big-endian width/height, bit
  *    depth, color type — validated including the CRC-32 over
  *    type+data that PNG mandates, so a bit-flipped header is rejected
  *    rather than misread.
  *  - JPEG: SOI marker, then a marker-segment walk (skipping APPn/COM/
  *    quantization/Huffman tables by their declared lengths, tolerating
  *    0xFF fill bytes) to the first start-of-frame marker (SOF0-15
  *    minus DHT/JPG/DAC holes), whose payload carries precision,
  *    height, width. Stops cold at SOS/EOI — dimensions live before
  *    entropy-coded data, so only the prefix is ever touched.
  *
  * Parsers take the payload as bytes already in memory (multimodal
  * rows carry whole payloads); both are O(header), not O(payload).
  */
object ImageHeaders {

  /** Parsed header metadata; `width`/`height` in pixels. */
  final case class Dims(format: String, width: Int, height: Int)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** PNG dimensions from the IHDR chunk; None on anything malformed
    * (short payload, wrong signature, IHDR not first, bad CRC,
    * non-positive dims).
    */
  def pngDims(payload: Array[Byte]): Option[Dims] = {
    // signature(8) + len(4) + "IHDR"(4) + data(13) + crc(4)
    if (payload == null || payload.length < 33) return None
    var i = 0
    while (i < 8) { if (payload(i) != PngSig(i)) return None; i += 1 }
    if (be32(payload, 8) != 13L) return None // IHDR data length is fixed
    if (payload(12) != 'I' || payload(13) != 'H' ||
        payload(14) != 'D' || payload(15) != 'R') return None
    val crc = new CRC32
    crc.update(payload, 12, 4 + 13) // chunk type + data, per spec
    if (crc.getValue != be32(payload, 29)) return None
    val w = be32(payload, 16)
    val h = be32(payload, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(Dims("png", w.toInt, h.toInt))
  }

  /** JPEG dimensions from the first SOF marker; None on anything
    * malformed or if SOS/EOI arrives before a frame header.
    */
  def jpegDims(payload: Array[Byte]): Option[Dims] = {
    if (payload == null || payload.length < 4) return None
    if ((payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8)
      return None // SOI
    var i = 2
    while (i + 3 < payload.length) {
      if ((payload(i) & 0xff) != 0xff) return None // marker alignment lost
      var m = payload(i + 1) & 0xff
      while (m == 0xff && i + 2 < payload.length) { i += 1; m = payload(i + 1) & 0xff } // fill bytes
      // fill bytes ran to the buffer edge without resolving a marker, or
      // the skip left too little room for a length field: truncated, not
      // parseable — the default arm below would otherwise read past the
      // array (found by review: payload FF D8 FF FF FF FF)
      if (m == 0xff || i + 3 >= payload.length) return None
      m match {
        case 0xd8 => i += 2 // stray SOI — no length field
        case 0x01 => i += 2 // TEM — standalone, no length field
        case rst if rst >= 0xd0 && rst <= 0xd7 =>
          i += 2 // RSTn — standalone; reading a "length" here would desync
        case 0xd9 | 0xda => return None // EOI / SOS before any SOF
        case sof if (sof >= 0xc0 && sof <= 0xcf) &&
            sof != 0xc4 && sof != 0xc8 && sof != 0xcc => // SOFn (not DHT/JPG/DAC)
          if (i + 9 >= payload.length) return None
          val len = be16(payload, i + 2)
          if (len < 8) return None
          val h = be16(payload, i + 5)
          val w = be16(payload, i + 7)
          return if (w <= 0 || h <= 0) None else Some(Dims("jpeg", w, h))
        case _ => // segment with length: APPn, COM, DQT, DRI, ...
          val len = be16(payload, i + 2)
          if (len < 2) return None
          i += 2 + len
      }
    }
    None
  }

  /** Sniff PNG, then JPEG, then WebP (each validates its own magic). */
  def dims(payload: Array[Byte]): Option[Dims] =
    pngDims(payload).orElse(jpegDims(payload))
      .orElse(WebpCodec.dims(payload))

  // ── fixture emitters ──────────────────────────────────────────────
  // Minimal spec-shaped headers (valid signature/IHDR/CRC, valid
  // SOI/APP0/COM/SOF0 walk) with no pixel data — deterministic stand-ins
  // for real blobs so parser∘encoder is oracle-checkable end to end.

  /** Header-only PNG: signature + IHDR (valid CRC) + IEND. */
  def pngHeaderBytes(width: Int, height: Int, bitDepth: Int = 8,
      colorType: Int = 6): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12)
    out.put(PngSig)
    out.putInt(13)
    val typeAndData = java.nio.ByteBuffer.allocate(17)
    typeAndData.put("IHDR".getBytes("US-ASCII"))
    typeAndData.putInt(width).putInt(height)
    typeAndData.put(bitDepth.toByte).put(colorType.toByte)
    typeAndData.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    val td = typeAndData.array()
    out.put(td)
    val crc = new CRC32; crc.update(td)
    out.putInt(crc.getValue.toInt)
    out.putInt(0); out.put("IEND".getBytes("US-ASCII"))
    val iendCrc = new CRC32; iendCrc.update("IEND".getBytes("US-ASCII"))
    out.putInt(iendCrc.getValue.toInt)
    out.array()
  }

  /** Header-only JPEG: SOI + JFIF APP0 + COM (exercises the segment
    * skip) + SOF0 + EOI.
    */
  def jpegHeaderBytes(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      "jpeg dims must fit in uint16")
    val comment = "graft".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(2 + 18 + (4 + comment.length) + 19 + 2)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
    out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    out.put(1.toByte).put(1.toByte) // version 1.1
    out.put(0.toByte).putShort(1).putShort(1) // no units, 1:1 density
    out.put(0.toByte).put(0.toByte) // no thumbnail
    out.put(0xff.toByte).put(0xfe.toByte) // COM
    out.putShort((2 + comment.length).toShort).put(comment)
    out.put(0xff.toByte).put(0xc0.toByte).putShort(17) // SOF0, 3 components
    out.put(8.toByte).putShort(height.toShort).putShort(width.toShort)
    out.put(3.toByte)
    var c = 1
    while (c <= 3) { // component id, 1:1 sampling, quant table 0
      out.put(c.toByte).put(0x11.toByte).put(0.toByte); c += 1
    }
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }
}
