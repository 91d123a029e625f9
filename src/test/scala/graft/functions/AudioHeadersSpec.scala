package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AudioHeaders._

class AudioHeadersSpec extends AnyFunSuite {

  test("wav: encoder round-trips through the parser across formats") {
    for ((ch, rate, bits, frames) <- Seq(
        (1, 8000, 8, 0L), (1, 16000, 16, 1L), (2, 44100, 16, 12345L),
        (2, 48000, 32, 999L), (6, 96000, 24, 7L))) {
      assert(wavMeta(wavHeaderBytes(ch, rate, bits, frames)) ==
        Some(AudioMeta(ch, rate, bits, frames)), s"$ch/$rate/$bits/$frames")
    }
  }

  test("header-only fixture parses even though the data body is absent") {
    // declared data size counts; a ranged prefix fetch is the real shape
    val b = wavHeaderBytes(2, 44100, 16, 1000L)
    assert(b.length == 44) // nothing after the data chunk header
    assert(wavMeta(b).map(_.nFrames) == Some(1000L))
  }

  test("chunk walk skips unknown chunks and honors odd-size padding") {
    val base = wavHeaderBytes(1, 22050, 16, 10L)
    // splice a 3-byte LIST chunk (odd size → 1 pad byte) before fmt
    val pre = base.take(12)
    val post = base.drop(12)
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    assert(wavMeta(pre ++ junk ++ post) ==
      Some(AudioMeta(1, 22050, 16, 10L)))
  }

  test("malformed inputs parse to None, never throw") {
    val ok = wavHeaderBytes(2, 44100, 16, 5L)
    assert(wavMeta(null).isEmpty)
    assert(wavMeta(Array.empty[Byte]).isEmpty)
    assert(wavMeta(ok.take(20)).isEmpty) // truncated mid-fmt
    assert(wavMeta("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty) // bad form
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    assert(wavMeta(badMagic).isEmpty)
    // fmt present but no data chunk at all
    assert(wavMeta(ok.take(36)).isEmpty)
    // zero channels must be rejected, not divide the frame math
    val zeroCh = ok.clone(); zeroCh(22) = 0; zeroCh(23) = 0
    assert(wavMeta(zeroCh).isEmpty)
    // absurd declared chunk size can't send the walk spinning
    val hugeChunk = ok.clone()
    hugeChunk(16) = 0xff.toByte; hugeChunk(17) = 0xff.toByte
    hugeChunk(18) = 0xff.toByte; hugeChunk(19) = 0x7f.toByte
    assert(wavMeta(hugeChunk).isEmpty)
    // near-2^31 size whose walk offset Int-overflows to negative (review
    // regression: previously a StringIndexOutOfBoundsException)
    val overflow = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "LIST".getBytes("US-ASCII") ++
      Array[Byte](0xf5.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte)
    assert(wavMeta(overflow).isEmpty)
  }

  test("pcmStats: integer-exact stats over a real sample body") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 1000)
    val bytes = wavBytes(1, 16000, samples)
    // the real body still parses as a header too
    assert(wavMeta(bytes) == Some(AudioMeta(1, 16000, 16, 6)))
    val s = pcmStats(bytes).get
    assert(s.nSamples == 6)
    assert(s.sumSquares == 0L + 100 * 100 + 100 * 100 + 32767L * 32767 +
      32768L * 32768 + 1000 * 1000)
    assert(s.nClipped == 2) // full-scale positive and negative
    assert(s.peak == 32768)
  }

  test("pcmStats: stereo interleaved counts all channels; truncated body uses complete samples") {
    val samples = Array[Short](10, -10, 20, -20) // 2 frames x 2 channels
    val bytes = wavBytes(2, 8000, samples)
    assert(pcmStats(bytes).get.nSamples == 4)
    assert(pcmStats(bytes).get.sumSquares == 100 + 100 + 400 + 400)
    // cut mid-sample (drop 1 of the 8 body bytes): 3 complete samples remain
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 1)
    assert(pcmStats(cut).get.nSamples == 3)
    assert(pcmStats(cut).get.sumSquares == 100 + 100 + 400)
  }

  test("pcmStats: non-16-bit and malformed payloads are None, never misread") {
    assert(pcmStats(wavHeaderBytes(1, 8000, 8, 10)).isEmpty) // 8-bit
    assert(pcmStats(wavHeaderBytes(2, 44100, 32, 10)).isEmpty) // 32-bit
    assert(pcmStats(null).isEmpty)
    assert(pcmStats(Array[Byte](1, 2, 3)).isEmpty)
    assert(pcmStats("RIFFxxxxWAVEjunk".getBytes("US-ASCII")).isEmpty)
    // header-only 16-bit fixture: declared data but zero bytes present
    val headerOnly = wavHeaderBytes(1, 16000, 16, 100)
    assert(pcmStats(headerOnly) ==
      Some(PcmStats(0, 0, 0, 0))) // prefix fetch: no samples available yet
  }

  test("wavSamples: full decode round-trips; ragged trailing bytes drop whole frames") {
    val stereo = Array[Short](10, -20, 30, -40, 32767, -32768)
    val bytes = wavBytes(2, 44100, stereo)
    val pcm = wavSamples(bytes).get
    assert(pcm.channels == 2 && pcm.sampleRate == 44100)
    assert(pcm.samples.toSeq == stereo.toSeq)
    // drop 3 bytes: mid-sample cut leaves 2 complete FRAMES (4 samples),
    // never a half-frame that would swap channels downstream
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 3)
    assert(wavSamples(cut).get.samples.toSeq == Seq[Short](10, -20, 30, -40))
    assert(wavSamples(wavHeaderBytes(1, 8000, 8, 10)).isEmpty) // 8-bit
    assert(wavSamples(null).isEmpty)
  }

  test("trailing chunks after `data` are never decoded as samples") {
    // real-corpus shape: ffmpeg/lame append LIST/INFO or id3 chunks
    val stereo = Array[Short](100, -200, 300, -400)
    val wav = wavBytes(2, 44100, stereo)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](8, 0, 0, 0) ++ "INFOxxxx".getBytes("US-ASCII")
    val withTail = {
      val out = java.util.Arrays.copyOf(wav, wav.length + listChunk.length)
      System.arraycopy(listChunk, 0, out, wav.length, listChunk.length)
      // fix the RIFF size to cover the new chunk
      val riff = out.length - 8
      out(4) = (riff & 0xff).toByte; out(5) = ((riff >> 8) & 0xff).toByte
      out(6) = ((riff >> 16) & 0xff).toByte
      out(7) = ((riff >> 24) & 0xff).toByte
      out
    }
    assert(wavSamples(withTail).get.samples.toSeq == stereo.toSeq)
    assert(wavSamples16(withTail).get.samples.toSeq == stereo.toSeq)
    assert(pcmStats(withTail).get.nSamples == 4L)
  }

  test("G.711 decode is BYTE-EXACT against the JDK converters, both laws") {
    import javax.sound.sampled._
    def jdk(enc: AudioFormat.Encoding): Array[Short] = {
      val all = Array.tabulate[Byte](256)(i => i.toByte)
      val srcFmt = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dstFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(all), srcFmt, 256)
      val out = AudioSystem.getAudioInputStream(dstFmt, src).readAllBytes()
      Array.tabulate(256)(i =>
        ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort)
    }
    val muJdk = jdk(AudioFormat.Encoding.ULAW)
    val aJdk = jdk(AudioFormat.Encoding.ALAW)
    (0 until 256).foreach { i =>
      assert(G711.mulawDecode(i.toByte) == muJdk(i), s"mu byte $i")
      assert(G711.alawDecode(i.toByte) == aJdk(i), s"a byte $i")
    }
    // encode∘decode: every decoded value re-encodes to its own byte
    // (codewords are fixed points of the companding quantizer)
    (0 until 256).foreach { i =>
      assert(G711.mulawEncode(G711.mulawDecode(i.toByte)) == i.toByte ||
        // +0/-0 share a magnitude: 0x7f/0xff both decode to ±0
        math.abs(G711.mulawDecode(i.toByte).toInt) == 0, s"mu fix $i")
      assert(G711.alawEncode(G711.alawDecode(i.toByte)) == i.toByte, s"a fix $i")
    }
  }

  test("wavSamples16: every supported coding decodes; unsupported → None") {
    // µ-law / A-law WAVs (format 6/7, fact chunk) decode to the same
    // int16 values the JDK would produce
    val coded = Array.tabulate[Byte](64)(i => ((i * 37 + 5) % 256).toByte)
    val mu = wavSamples16(wavBytesFmt(7, 1, 8000, 8, coded)).get
    assert(mu.samples.toSeq == coded.toSeq.map(G711.mulawDecode))
    val al = wavSamples16(wavBytesFmt(6, 1, 8000, 8, coded)).get
    assert(al.samples.toSeq == coded.toSeq.map(G711.alawDecode))
    // 8-bit unsigned PCM: 128 is silence
    val u8 = Array[Byte](0, 128.toByte, 255.toByte)
    assert(wavSamples16(wavBytesFmt(1, 1, 8000, 8, u8)).get.samples.toSeq ==
      Seq[Short](-32768, 0, 32512))
    // 24-bit PCM keeps the high 16 bits
    val s24 = java.nio.ByteBuffer.allocate(6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    s24.put(0x56.toByte).put(0x34.toByte).put(0x12.toByte) // 0x123456
    s24.put(0xaa.toByte).put(0xcb.toByte).put(0xed.toByte) // 0xedcbaa (neg)
    assert(wavSamples16(wavBytesFmt(1, 1, 8000, 24, s24.array())).get
      .samples.toSeq == Seq[Short](0x1234, 0xedcb.toShort))
    // 32-bit PCM keeps the high 16 bits
    val s32 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0x7fff0000).putInt(0x80010000)
    assert(wavSamples16(wavBytesFmt(1, 1, 8000, 32, s32.array())).get
      .samples.toSeq == Seq[Short](32767, -32767))
    // float32 clamps and scales; NaN → 0
    val f32 = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putFloat(0.5f).putFloat(-2.0f).putFloat(1.0f).putFloat(Float.NaN)
    assert(wavSamples16(wavBytesFmt(3, 1, 48000, 32, f32.array())).get
      .samples.toSeq ==
      Seq[Short](math.round(0.5f * 32767).toShort, -32767, 32767, 0))
    // WAVE_FORMAT_EXTENSIBLE resolves through the SubFormat tag
    val ext = {
      val b = wavBytesFmt(0xfffe, 1, 8000, 8, coded)
      // grow the fmt body to 40 with a SubFormat whose leading 16 bits
      // say µ-law; rebuild by hand from the plain layout
      val pre = java.util.Arrays.copyOfRange(b, 0, 20) // through fmt size
      val fmtBody = java.util.Arrays.copyOfRange(b, 20, 38) // 18-byte body
      // extension: cbSize(2)=22, validBits(2), channelMask(4), GUID(16)
      val sub = new Array[Byte](24)
      sub(0) = 22 // cbSize
      sub(2) = 8 // valid bits
      sub(8) = 7 // SubFormat GUID leading 16 bits: µ-law
      val rest = java.util.Arrays.copyOfRange(b, 38, b.length)
      val out = java.nio.ByteBuffer
        .allocate(pre.length + 16 + sub.length + rest.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(pre, 0, 16)
      out.putInt(40) // fmt chunk size
      out.put(fmtBody, 0, 16) // wFormatTag..wBitsPerSample
      out.put(sub)
      out.put(rest)
      // fix riff size
      val arr = out.array()
      val riff = arr.length - 8
      arr(4) = (riff & 0xff).toByte; arr(5) = ((riff >> 8) & 0xff).toByte
      arr(6) = ((riff >> 16) & 0xff).toByte; arr(7) = ((riff >> 24) & 0xff).toByte
      arr
    }
    val viaExt = wavSamples16(ext).get
    assert(viaExt.samples.toSeq == coded.toSeq.map(G711.mulawDecode))
    assert(wavMeta(ext).get.formatCode == 7)
    // unsupported: 8-bit float nonsense → None, never misread
    assert(wavSamples16(wavBytesFmt(3, 1, 8000, 8, u8)).isEmpty)
    assert(wavSamples16(wavBytesFmt(2, 1, 8000, 8, u8)).isEmpty) // ADPCM
  }
}
