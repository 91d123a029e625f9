package graft.functions

/** Dependency-free MPEG audio (MP3) FRAME-WALK parser — the metadata
  * step for the dominant compressed-audio encoding of a web crawl
  * (the WAV/RIFF walk of [[AudioHeaders]] covers the uncompressed
  * case). No sample decode — an MP3's pipeline-relevant facts
  * (channels, sample rate, bitrate, exact sample count → duration)
  * all live in the 4-byte frame headers, and a CBR/VBR-agnostic way
  * to get them is to WALK the frames: each header declares its own
  * frame length, so the walk is O(frames) header reads with no
  * entropy decoding.
  *
  * Surface (the practically-universal subset): MPEG-1/2/2.5 Layer
  * III, optional leading ID3v2 tag (skipped by its syncsafe declared
  * size), optional trailing ID3v1 tag (128-byte 'TAG' block,
  * tolerated), CRC-protected or not. Totality contract as the image
  * codecs: malformed input → None, never a throw, never wrong
  * numbers; a sync word that does not yield a consistent walk
  * (≥ MinFrames valid consecutive frames) is rejected rather than
  * trusted — the false-sync hazard the frame-length walk exists to
  * avoid.
  *
  * Scale shape: runs inside the same `mapPartitions` decode stage as
  * every codec ([[graft.ext.Multimodal.mp3Meta]]) — scan-stage,
  * O(header-bytes) per row, no shuffle.
  */
object Mp3Codec {

  /** Parsed stream metadata. `nSamples` is exact
    * (frames × samples-per-frame for the stream's version/layer), so
    * duration derives downstream as `nSamples / sampleRate` in
    * whatever precision the consumer wants — the
    * numerator/denominator discipline (NUMERICS.md) applied to time.
    */
  final case class Mp3Meta(version: String, layer: Int,
      bitrateKbps: Int, sampleRate: Int, channels: Int,
      nFrames: Long, nSamples: Long)

  /** Frames required for a sync to be believed. */
  private val MinFrames = 2

  // MPEG-1 Layer III bitrates (kbps) by bitrate index 1-14
  private val BitratesV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  // MPEG-2/2.5 Layer III
  private val BitratesV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val RatesV1 = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)
  private val RatesV25 = Array(11025, 12000, 8000)

  private def id3v2Size(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    // 4 syncsafe bytes (7 bits each); header is 10 bytes
    val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val footer = if ((b(5) & 0x10) != 0) 10 else 0
    val total = 10 + sz + footer
    if (total <= 0 || total > b.length) 0 else total
  }

  /** One parsed frame header: (frameLength, version, layer,
    * bitrateKbps, sampleRate, channels, samplesPerFrame); None when
    * the 4 bytes at `off` are not a valid Layer III header.
    */
  private def frameAt(b: Array[Byte], off: Int)
      : Option[(Int, String, Int, Int, Int, Int, Int)] = {
    if (off + 4 > b.length) return None
    val h = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None // 11-bit sync
    val versionBits = (h >>> 19) & 0x3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layerBits = (h >>> 17) & 0x3   // 1 = Layer III
    if (versionBits == 1 || layerBits != 1) return None
    val bitrateIdx = (h >>> 12) & 0xf
    val rateIdx = (h >>> 10) & 0x3
    if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
    val padding = (h >>> 9) & 0x1
    val channelMode = (h >>> 6) & 0x3 // 3 = mono
    val (version, rates, bitrates, samplesPerFrame, coef) = versionBits match {
      case 3 => ("MPEG1", RatesV1, BitratesV1L3, 1152, 144000)
      case 2 => ("MPEG2", RatesV2, BitratesV2L3, 576, 72000)
      case _ => ("MPEG2.5", RatesV25, BitratesV2L3, 576, 72000)
    }
    val bitrate = bitrates(bitrateIdx)
    val rate = rates(rateIdx)
    val frameLen = coef * bitrate / rate + padding
    if (frameLen < 4) return None
    Some((frameLen, version, 3, bitrate, rate,
      if (channelMode == 3) 1 else 2, samplesPerFrame))
  }

  /** Walk the whole stream. Header facts (version/layer/rate/
    * channels) must be CONSISTENT across frames (they are for any
    * real file); bitrate may vary (VBR) — the reported bitrate is the
    * first frame's, the convention header-only tools use when no
    * Xing/VBRI tag is parsed.
    */
  def meta(payload: Array[Byte]): Option[Mp3Meta] = {
    if (payload == null) return None
    var off = id3v2Size(payload)
    // trailing ID3v1 'TAG' block is not frame data
    val end =
      if (payload.length >= 128 + off &&
        payload(payload.length - 128) == 'T' &&
        payload(payload.length - 127) == 'A' &&
        payload(payload.length - 126) == 'G') payload.length - 128
      else payload.length
    frameAt(payload, off) match {
      case None => None
      case Some((_, version, _, bitrate0, rate0, ch0, spf)) =>
        var nFrames = 0L
        var pos = off
        var ok = true
        while (ok && pos + 4 <= end) {
          frameAt(payload, pos) match {
            case Some((len, v, _, _, r, c, _))
                if v == version && r == rate0 && c == ch0 =>
              nFrames += 1
              pos += len
            case _ => ok = false
          }
        }
        // the walk must land exactly at the end and carry conviction
        if (nFrames < MinFrames || pos != end) None
        else Some(Mp3Meta(version, 3, bitrate0, rate0, ch0,
          nFrames, nFrames * spf))
    }
  }

  // ── fixture builder (spec/oracle side) ────────────────────────────

  /** Standards-shaped synthetic stream: `nFrames` Layer III frames at
    * the given indices, frame bodies filled with a non-sync pattern,
    * padding bit set on every third frame (exercises the +1 length
    * arm), optionally fronted by an ID3v2 tag and tailed by ID3v1.
    */
  def mp3Bytes(versionBits: Int, bitrateIdx: Int, rateIdx: Int,
      mono: Boolean, nFrames: Int, id3v2Bytes: Int = 0,
      id3v1: Boolean = false): Array[Byte] = {
    require(versionBits == 3 || versionBits == 2 || versionBits == 0)
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2)
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // v2.3, no flags
      // syncsafe size of the tag BODY
      out.write((id3v2Bytes >>> 21) & 0x7f)
      out.write((id3v2Bytes >>> 14) & 0x7f)
      out.write((id3v2Bytes >>> 7) & 0x7f)
      out.write(id3v2Bytes & 0x7f)
      out.write(new Array[Byte](id3v2Bytes))
    }
    val (rates, bitrates, coef) = versionBits match {
      case 3 => (RatesV1, BitratesV1L3, 144000)
      case 2 => (RatesV2, BitratesV2L3, 72000)
      case _ => (RatesV25, BitratesV2L3, 72000)
    }
    val baseLen = coef * bitrates(bitrateIdx) / rates(rateIdx)
    val filler = Array.fill[Byte](baseLen + 1 - 4)(0xAA.toByte)
    var i = 0
    while (i < nFrames) {
      val padding = if (i % 3 == 0) 1 else 0
      val frameLen = baseLen + padding
      val h = (0x7ff << 21) | (versionBits << 19) | (1 << 17) | (1 << 16) |
        (bitrateIdx << 12) | (rateIdx << 10) | (padding << 9) |
        ((if (mono) 3 else 0) << 6)
      out.write((h >>> 24) & 0xff); out.write((h >>> 16) & 0xff)
      out.write((h >>> 8) & 0xff); out.write(h & 0xff)
      out.write(filler, 0, frameLen - 4)
      i += 1
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      (3 until 128).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  // ── ID3v2 text frames (the metadata a real library actually wants:
  // TIT2 title, TPE1 artist, TALB album, …) ──────────────────────────

  /** Parse the leading ID3v2.3/2.4 tag's TEXT frames (IDs starting
    * 'T') into id → decoded value. Handles both frame-size encodings
    * (v2.3 plain 32-bit, v2.4 syncsafe), all four text encodings
    * (0 Latin-1, 1 UTF-16 with BOM, 2 UTF-16BE, 3 UTF-8), trailing
    * NULs, and stops at padding. Total: damage yields the frames
    * parsed so far. Empty map when no tag.
    */
  def id3v2Frames(payload: Array[Byte]): Map[String, String] = {
    val total = id3v2Size(payload)
    if (total == 0) return Map.empty
    val v24 = (payload(3) & 0xff) >= 4
    val footer = if ((payload(5) & 0x10) != 0) 10 else 0
    val end = total - footer
    val out = Map.newBuilder[String, String]
    var p = 10
    var going = true
    while (going && p + 10 <= end) {
      val id = new String(payload, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (!id.forall(c => c.isUpper || c.isDigit)) going = false // padding
      else {
        val sz =
          if (v24)
            ((payload(p + 4) & 0x7f) << 21) | ((payload(p + 5) & 0x7f) << 14) |
              ((payload(p + 6) & 0x7f) << 7) | (payload(p + 7) & 0x7f)
          else
            ((payload(p + 4) & 0xff) << 24) | ((payload(p + 5) & 0xff) << 16) |
              ((payload(p + 6) & 0xff) << 8) | (payload(p + 7) & 0xff)
        val bodyAt = p + 10
        if (sz <= 0 || bodyAt + sz > end) going = false
        else {
          if (id.startsWith("T") && sz >= 1) {
            val enc = payload(bodyAt) & 0xff
            val raw = java.util.Arrays.copyOfRange(payload, bodyAt + 1, bodyAt + sz)
            val cs = enc match {
              case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
              case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-led
              case 2 => java.nio.charset.StandardCharsets.UTF_16BE
              case _ => java.nio.charset.StandardCharsets.UTF_8
            }
            val s = new String(raw, cs).takeWhile(_ != '\u0000')
            out += id -> s
          }
          p = bodyAt + sz
        }
      }
    }
    out.result()
  }

  /** Serialize an ID3v2 tag of text frames — v2.3 (plain frame sizes)
    * or v2.4 (syncsafe); `encoding` per the spec byte (0 Latin-1,
    * 1 UTF-16+BOM, 2 UTF-16BE v2.4-only, 3 UTF-8 v2.4-only).
    * Prepend to any MP3 byte stream; [[meta]]/[[id3v2Frames]] skip or
    * read it by its declared syncsafe size.
    */
  def id3v2TagBytes(frames: Seq[(String, String)], v24: Boolean = false,
      encoding: Int = 3): Array[Byte] = {
    require(encoding >= 0 && encoding <= 3, "encoding byte in [0,3]")
    require(v24 || encoding < 2, s"encoding $encoding requires ID3v2.4")
    val bodies = frames.map { case (id, value) =>
      require(id.length == 4, s"frame id must be 4 chars: $id")
      val text = encoding match {
        case 0 => value.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        case 1 => // UTF-16 LE with explicit BOM
          Array(0xff.toByte, 0xfe.toByte) ++
            value.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
        case 2 => value.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
        case _ => value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
      (id, Array(encoding.toByte) ++ text)
    }
    val size = bodies.map(_._2.length + 10).sum
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(if (v24) 4 else 3); out.write(0); out.write(0)
    out.write((size >>> 21) & 0x7f); out.write((size >>> 14) & 0x7f)
    out.write((size >>> 7) & 0x7f); out.write(size & 0x7f)
    bodies.foreach { case (id, body) =>
      id.foreach(c => out.write(c))
      val sz = body.length
      if (v24) {
        out.write((sz >>> 21) & 0x7f); out.write((sz >>> 14) & 0x7f)
        out.write((sz >>> 7) & 0x7f); out.write(sz & 0x7f)
      } else {
        out.write((sz >>> 24) & 0xff); out.write((sz >>> 16) & 0xff)
        out.write((sz >>> 8) & 0xff); out.write(sz & 0xff)
      }
      out.write(0); out.write(0) // frame flags
      out.write(body)
    }
    out.toByteArray
  }
}
