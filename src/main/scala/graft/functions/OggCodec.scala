package graft.functions

import java.io.ByteArrayOutputStream

/** Ogg container walk (RFC 3533) with Vorbis and Opus identification
  * headers — the streaming-audio metadata leg next to WAV/MP3/FLAC.
  * Page-level only, as a corpus profiler needs: capture pattern, page
  * CRC (the Ogg polynomial, unreflected 0x04C11DB7, zeroed-field
  * convention), BOS/EOS flags, granule positions; the first packet's
  * magic selects the codec and yields channels/rate/pre-skip. Duration
  * comes from the LAST page's granule position: Vorbis granules count
  * PCM samples at the stream rate; Opus granules tick at 48 kHz minus
  * the pre-skip. Total on malformed input.
  */
object OggCodec {

  final case class OggMeta(
      codec: String, // "vorbis" | "opus"
      channels: Int,
      sampleRate: Int,
      preSkip: Int, // opus only; 0 for vorbis
      nPages: Int,
      nSamples: Long)

  // ── Ogg page CRC: poly 0x04C11DB7, init 0, no reflection/xorout ──
  private val crcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) { r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1; k += 1 }
    r
  }
  private def crc(b: Array[Byte]): Int = {
    var c = 0
    var i = 0
    while (i < b.length) { c = (c << 8) ^ crcTable(((c >>> 24) ^ (b(i) & 0xff)) & 0xff); i += 1 }
    c
  }

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def le64(v: Long): Array[Byte] =
    Array.tabulate(8)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def rdLe(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xff); i -= 1 }
    v
  }

  // ── writer ────────────────────────────────────────────────────────

  /** One Ogg page wrapping `packet` as its only (complete) packet. */
  def page(headerType: Int, granule: Long, serial: Int, seq: Int,
      packet: Array[Byte]): Array[Byte] = {
    // lacing: 255-valued segments + terminator < 255
    val segs = new ByteArrayOutputStream()
    var rest = packet.length
    while (rest >= 255) { segs.write(255); rest -= 255 }
    segs.write(rest)
    val segTable = segs.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes("ASCII"))
    out.write(0) // version
    out.write(headerType)
    out.write(le64(granule))
    out.write(le32(serial.toLong))
    out.write(le32(seq.toLong))
    out.write(le32(0)) // crc placeholder
    out.write(segTable.length)
    out.write(segTable)
    out.write(packet)
    val bytes = out.toByteArray
    val c = crc(bytes)
    val withCrc = bytes.clone()
    System.arraycopy(le32(c.toLong & 0xffffffffL), 0, withCrc, 22, 4)
    withCrc
  }

  /** Vorbis identification header packet. */
  def vorbisIdPacket(channels: Int, sampleRate: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(1); out.write("vorbis".getBytes("ASCII"))
    out.write(le32(0)) // version
    out.write(channels)
    out.write(le32(sampleRate.toLong))
    out.write(le32(0)); out.write(le32(0)); out.write(le32(0)) // bitrates
    out.write(0xb8) // blocksizes (2^8 / 2^11)
    out.write(1)    // framing bit
    out.toByteArray
  }

  /** Opus identification header packet (OpusHead). */
  def opusIdPacket(channels: Int, inputSampleRate: Int, preSkip: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("OpusHead".getBytes("ASCII"))
    out.write(1) // version
    out.write(channels)
    out.write(le16(preSkip))
    out.write(le32(inputSampleRate.toLong))
    out.write(le16(0)) // output gain
    out.write(0)       // mapping family
    out.toByteArray
  }

  /** Assemble a structurally valid stream: BOS ID-header page, data
    * pages with opaque packets and monotone granules, EOS on the last.
    */
  def encode(idPacket: Array[Byte], serial: Int,
      granules: Seq[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(page(0x02, 0L, serial, 0, idPacket))
    granules.zipWithIndex.foreach { case (g, i) =>
      val last = i == granules.length - 1
      val dummy = Array.tabulate(37 + i)(k => ((k * 31 + i) & 0xff).toByte)
      out.write(page(if (last) 0x04 else 0x00, g, serial, i + 1, dummy))
    }
    out.toByteArray
  }

  // ── parser ────────────────────────────────────────────────────────

  /** Walk all pages (CRC-verified) of the FIRST logical stream and
    * derive codec metadata. None on bad magic/CRC or unknown codec.
    */
  def meta(bytes: Array[Byte]): Option[OggMeta] = try {
    var pos = 0
    var nPages = 0
    var lastGranule = -1L
    var first: Option[(String, Int, Int, Int)] = None // codec, ch, rate, preskip
    while (pos + 27 <= bytes.length) {
      if (!(bytes(pos) == 'O' && bytes(pos + 1) == 'g' && bytes(pos + 2) == 'g' &&
        bytes(pos + 3) == 'S')) return None
      if (bytes(pos + 4) != 0) return None
      val granule = rdLe(bytes, pos + 6, 8)
      val gotCrc = rdLe(bytes, pos + 22, 4).toInt
      val nSegs = bytes(pos + 26) & 0xff
      if (pos + 27 + nSegs > bytes.length) return None
      var dataLen = 0
      var s = 0
      while (s < nSegs) { dataLen += bytes(pos + 27 + s) & 0xff; s += 1 }
      val pageEnd = pos + 27 + nSegs + dataLen
      if (pageEnd > bytes.length) return None
      // CRC with the field zeroed
      val check = java.util.Arrays.copyOfRange(bytes, pos, pageEnd)
      check(22) = 0; check(23) = 0; check(24) = 0; check(25) = 0
      if (crc(check) != gotCrc) return None
      if (nPages == 0) {
        val d = pos + 27 + nSegs
        if (dataLen >= 30 && bytes(d) == 1 &&
          new String(bytes, d + 1, 6, "ASCII") == "vorbis") {
          val ch = bytes(d + 11) & 0xff
          val rate = rdLe(bytes, d + 12, 4).toInt
          first = Some(("vorbis", ch, rate, 0))
        } else if (dataLen >= 19 &&
          new String(bytes, d, 8, "ASCII") == "OpusHead") {
          val ch = bytes(d + 9) & 0xff
          val preskip = rdLe(bytes, d + 10, 2).toInt
          val rate = rdLe(bytes, d + 12, 4).toInt
          first = Some(("opus", ch, rate, preskip))
        } else return None
      }
      if (granule != -1L) lastGranule = granule
      nPages += 1
      pos = pageEnd
    }
    if (pos != bytes.length || nPages == 0) return None
    first.map { case (codec, ch, rate, preskip) =>
      val n = if (lastGranule < 0) 0L
        else if (codec == "opus") math.max(0L, lastGranule - preskip)
        else lastGranule
      OggMeta(codec, ch, rate, preskip, nPages, n)
    }
  } catch { case _: Throwable => None }
}
