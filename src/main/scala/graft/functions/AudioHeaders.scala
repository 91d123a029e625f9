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

  /** Parsed audio metadata. `nFrames` = data bytes / block align. */
  final case class AudioMeta(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nFrames: Long)

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
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataBytes = -1L
    while (i + 8 <= payload.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = tag(payload, i)
      val size = le32(payload, i + 4)
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > payload.length) return None
        val channels = le16(payload, i + 10)
        val rate = le32(payload, i + 12).toInt
        val blockAlign = le16(payload, i + 20)
        val bits = le16(payload, i + 22)
        if (channels <= 0 || rate <= 0 || bits <= 0 || blockAlign <= 0)
          return None
        fmt = Some((channels, rate, bits, blockAlign))
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
    fmt.flatMap { case (channels, rate, bits, blockAlign) =>
      if (dataBytes < 0) None
      else Some(AudioMeta(channels, rate, bits, dataBytes / blockAlign))
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
    while (i + 8 <= payload.length && dataOff < 0) {
      val size = le32(payload, i + 4)
      if (tag(payload, i) == "data") dataOff = i + 8
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > payload.length) payload.length else next.toInt
    }
    if (dataOff < 0) return None
    val avail = payload.length - dataOff
    val nWhole = avail / 2 / meta.channels * meta.channels
    val out = new Array[Short](nWhole)
    var s = 0
    while (s < nWhole) {
      out(s) = le16(payload, dataOff + 2 * s).toShort
      s += 1
    }
    Some(WavPcm(meta.channels, meta.sampleRate, out))
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
