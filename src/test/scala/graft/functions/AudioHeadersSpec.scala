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
}
