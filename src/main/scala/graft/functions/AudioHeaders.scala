package graft.functions

/** Dependency-free WAV (RIFF) HEADER codec — the audio leg of the
  * multimodal metadata surface, sibling of [[ImageHeaders]]: recover
  * (channels, sample rate, bit depth, frame count) from the container
  * header without decoding samples.
  *
  * Parse walk: "RIFF" magic + declared riff size + "WAVE" form type,
  * then a chunk walk ("fmt " for the format block, "data" for the
  * payload size) honoring the RIFF word-alignment rule (odd-sized
  * chunks are padded to even offsets). Samples are never touched —
  * O(header) regardless of payload size, and a header-only fixture
  * (declared data size, truncated body) still parses, matching how a
  * real pipeline reads metadata from a ranged prefix fetch.
  */
object AudioHeaders {

  /** Parsed audio metadata. `nFrames` = data bytes / block align.
    * `formatCode` is the fmt chunk's wFormatTag with
    * WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolved to its SubFormat code:
    * 1 = integer PCM, 3 = IEEE float, 6 = A-law, 7 = µ-law.
    */
  final case class AudioMeta(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nFrames: Long,
      formatCode: Int = 1)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** WAV metadata from the RIFF header; None on anything malformed
    * (wrong magic, no fmt chunk, zero block align, truncated walk).
    */
  def wavMeta(payload: Array[Byte]): Option[AudioMeta] = {
    if (payload == null || payload.length < 36) return None
    if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // ch, rate, bits, blockAlign, code
    var dataBytes = -1L
    while (i + 8 <= payload.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = tag(payload, i)
      val size = le32(payload, i + 4)
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > payload.length) return None
        val code0 = le16(payload, i + 8)
        val channels = le16(payload, i + 10)
        val rate = le32(payload, i + 12).toInt
        val blockAlign = le16(payload, i + 20)
        val bits = le16(payload, i + 22)
        // WAVE_FORMAT_EXTENSIBLE: the real tag is the SubFormat GUID's
        // leading 16 bits (fmt body offset 24 = chunk offset i+8+24)
        val code =
          if (code0 == 0xfffe && size >= 40 && i + 8 + 26 <= payload.length)
            le16(payload, i + 8 + 24)
          else code0
        if (channels <= 0 || rate <= 0 || bits <= 0 || blockAlign <= 0)
          return None
        fmt = Some((channels, rate, bits, blockAlign, code))
      } else if (id == "data") {
        dataBytes = size // declared size counts even when body is truncated
      }
      // chunk body + RIFF word-alignment pad. Walk the offset in Long:
      // a declared size near 2^31 Int-overflows `i + 8 + size` into a
      // negative offset and an out-of-bounds read (found by review);
      // anything past the buffer just ends the walk — a truncated body
      // after a complete header is the header-only fixture shape.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > payload.length) payload.length else next.toInt
    }
    fmt.flatMap { case (channels, rate, bits, blockAlign, code) =>
      if (dataBytes < 0) None
      else Some(AudioMeta(channels, rate, bits, dataBytes / blockAlign, code))
    }
  }

  /** Sample-level stats over a 16-bit PCM data chunk — the audio
    * sibling of [[PngCodec]]'s pixel decode: the data payload is REAL
    * bytes, not metadata. Integer-exact by construction (sum of squares
    * and clip count over int16 samples — no floats, so an oracle
    * replays it bit-for-bit): `nSamples` counts across channels,
    * `sumSquares` = Σ s², `nClipped` counts full-scale samples
    * (−32768/32767), `peak` = max |s| (32768 when a −32768 occurs).
    *
    * Contract: 16-bit PCM only (`bitsPerSample == 16`) — other depths
    * return None rather than misread samples. A body shorter than the
    * declared data size (prefix fetch) computes over the complete
    * samples present; `sumSquares` overflows Long only past 2³³
    * samples (≈ 10 h of 48 kHz stereo ×100 — beyond a single row's
    * payload by design).
    */
  def pcmStats(payload: Array[Byte]): Option[PcmStats] = {
    if (payload == null || payload.length < 36) return None
    if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return None
    var i = 12
    var bits = -1
    var dataOff = -1
    var dataLen = -1L
    while (i + 8 <= payload.length && (bits < 0 || dataOff < 0)) {
      val id = tag(payload, i)
      val size = le32(payload, i + 4)
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > payload.length) return None
        bits = le16(payload, i + 22)
      } else if (id == "data") {
        dataOff = i + 8
        dataLen = size
      }
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > payload.length) payload.length else next.toInt
    }
    if (bits != 16 || dataOff < 0) return None
    // complete samples actually present (truncated-body tolerance)
    val avail = math.min(dataLen, (payload.length - dataOff).toLong)
    val n = (avail / 2L).toInt
    var sumSq = 0L
    var clipped = 0L
    var peak = 0
    var s = 0
    while (s < n) {
      val v = (le16(payload, dataOff + 2 * s) << 16) >> 16 // sign-extend int16
      sumSq += v.toLong * v
      if (v == 32767 || v == -32768) clipped += 1
      val a = math.abs(v)
      if (a > peak) peak = a
      s += 1
    }
    Some(PcmStats(n.toLong, sumSq, clipped, peak))
  }

  /** See [[pcmStats]]. */
  final case class PcmStats(nSamples: Long, sumSquares: Long,
      nClipped: Long, peak: Int)

  /** Decoded 16-bit PCM: channel-interleaved samples plus the format
    * needed to process them. Same surface and truncation tolerance as
    * [[pcmStats]] (complete FRAMES only — a ragged trailing channel
    * slice is dropped, never misaligned); None on non-16-bit-PCM.
    */
  final case class WavPcm(channels: Int, sampleRate: Int,
      samples: Array[Short])

  /** Full sample decode — the input side of DSP kernels (resample,
    * mixdown) the way [[PngCodec.decode]] feeds the image kernels.
    */
  def wavSamples(payload: Array[Byte]): Option[WavPcm] = {
    val meta = wavMeta(payload).getOrElse(return None)
    if (meta.bitsPerSample != 16) return None
    // re-walk for the data offset (wavMeta only keeps the size)
    var i = 12
    var dataOff = -1
    var dataLen = -1L
    while (i + 8 <= payload.length && dataOff < 0) {
      val size = le32(payload, i + 4)
      if (tag(payload, i) == "data") { dataOff = i + 8; dataLen = size }
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > payload.length) payload.length else next.toInt
    }
    if (dataOff < 0) return None
    // declared chunk size bounds the decode (trailing LIST/id3 chunks
    // must never read as samples); truncated bodies keep their prefix
    val avail = math.min(dataLen, (payload.length - dataOff).toLong).toInt
    val nWhole = avail / 2 / meta.channels * meta.channels
    val out = new Array[Short](nWhole)
    var s = 0
    while (s < nWhole) {
      out(s) = le16(payload, dataOff + 2 * s).toShort
      s += 1
    }
    Some(WavPcm(meta.channels, meta.sampleRate, out))
  }

  /** Multi-format sample decode to the canonical int16 intermediate —
    * the formats real speech/audio corpora actually carry:
    * integer PCM at 8 (unsigned), 16, 24, and 32 bits (high 16 bits
    * kept for the wide depths), IEEE float32 (format 3; clamped to
    * [-1,1] and scaled to ±32767), and the G.711 telephony codings
    * µ-law (7) / A-law (6) via [[G711]]. WAVE_FORMAT_EXTENSIBLE
    * resolves through its SubFormat. Same whole-frame truncation
    * tolerance as [[wavSamples]]; unsupported codings → None, never
    * misread samples.
    */
  def wavSamples16(payload: Array[Byte]): Option[WavPcm] = {
    val meta = wavMeta(payload).getOrElse(return None)
    var i = 12
    var dataOff = -1
    var dataLen = -1L
    while (i + 8 <= payload.length && dataOff < 0) {
      val size = le32(payload, i + 4)
      if (tag(payload, i) == "data") { dataOff = i + 8; dataLen = size }
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > payload.length) payload.length else next.toInt
    }
    if (dataOff < 0) return None
    // the DECLARED chunk size bounds the decode — real-corpus WAVs
    // carry LIST/INFO or id3 chunks after `data`, which must never be
    // decoded as samples; a truncated body still decodes its prefix
    val avail = math.min(dataLen, (payload.length - dataOff).toLong).toInt
    val bytesPer = meta.bitsPerSample / 8
    if (bytesPer <= 0) return None
    val nWhole = avail / bytesPer / meta.channels * meta.channels
    def decodeWith(f: Int => Int): Option[WavPcm] = {
      val out = new Array[Short](nWhole)
      var s = 0
      while (s < nWhole) {
        out(s) = f(dataOff + bytesPer * s).toShort
        s += 1
      }
      Some(WavPcm(meta.channels, meta.sampleRate, out))
    }
    (meta.formatCode, meta.bitsPerSample) match {
      case (1, 16) => decodeWith(o => (le16(payload, o) << 16) >> 16)
      case (1, 8) => decodeWith(o => ((payload(o) & 0xff) - 128) << 8)
      case (1, 24) => decodeWith { o =>
        val v = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
          (payload(o + 2) << 16) // top byte sign-extends
        v >> 8
      }
      case (1, 32) => decodeWith(o => le32(payload, o).toInt >> 16)
      case (3, 32) => decodeWith { o =>
        val f = java.lang.Float.intBitsToFloat(le32(payload, o).toInt)
        val c = if (f.isNaN) 0f else math.max(-1f, math.min(1f, f))
        math.round(c * 32767f)
      }
      case (6, 8) => decodeWith(o => G711.alawDecode(payload(o)).toInt)
      case (7, 8) => decodeWith(o => G711.mulawDecode(payload(o)).toInt)
      case _ => None
    }
  }

  /** Non-PCM (or wide-PCM) WAV writer: fmt chunk with the given
    * wFormatTag (18-byte body, cbSize 0, for non-PCM tags per the
    * spec, plus the mandatory `fact` frame-count chunk), then the raw
    * coded body as given. The µ-law/A-law/float fixtures the decode
    * gates read back.
    */
  def wavBytesFmt(formatCode: Int, channels: Int, sampleRate: Int,
      bitsPerSample: Int, body: Array[Byte]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 &&
      bitsPerSample > 0 && bitsPerSample % 8 == 0)
    val blockAlign = channels * bitsPerSample / 8
    val pcm = formatCode == 1
    val fmtBody = if (pcm) 16 else 18
    val factLen = if (pcm) 0 else 12
    val total = 12 + (8 + fmtBody) + factLen + 8 + body.length
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt(total - 8)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII"))
    out.putInt(fmtBody)
    out.putShort(formatCode.toShort)
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * blockAlign)
    out.putShort(blockAlign.toShort)
    out.putShort(bitsPerSample.toShort)
    if (!pcm) {
      out.putShort(0) // cbSize
      out.put("fact".getBytes("US-ASCII"))
      out.putInt(4)
      out.putInt(body.length / blockAlign)
    }
    out.put("data".getBytes("US-ASCII"))
    out.putInt(body.length)
    out.put(body)
    out.array()
  }

  /** Real 16-bit PCM WAV: [[wavHeaderBytes]]' layout plus the actual
    * little-endian sample body (samples interleaved across channels as
    * given).
    */
  def wavBytes(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 &&
      samples.length % channels == 0, "whole frames only")
    val header = wavHeaderBytes(channels, sampleRate, 16,
      samples.length.toLong / channels)
    val out = java.nio.ByteBuffer.allocate(44 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(header)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Header-only PCM WAV fixture: RIFF/WAVE + fmt + data chunk header
    * with the declared size and NO sample body — deterministic stand-in
    * so parser∘encoder is oracle-checkable end to end.
    */
  def wavHeaderBytes(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Long): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nFrames >= 0)
    require(bitsPerSample > 0 && bitsPerSample % 8 == 0)
    val blockAlign = channels * bitsPerSample / 8
    val dataBytes = nFrames * blockAlign
    require(dataBytes <= Int.MaxValue - 36, "fixture data size must fit RIFF32")
    val out = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt((36 + dataBytes).toInt) // riff size as if the body followed
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII"))
    out.putInt(16) // PCM fmt block
    out.putShort(1.toShort) // audio format: PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * blockAlign) // byte rate
    out.putShort(blockAlign.toShort)
    out.putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII"))
    out.putInt(dataBytes.toInt)
    out.array()
  }
}
