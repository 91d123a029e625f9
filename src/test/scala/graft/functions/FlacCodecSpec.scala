package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class FlacCodecSpec extends AnyFunSuite {

  private def tone(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(i => (((seed * 31 + i * 17) % 65536) - 32768).toInt)

  test("STREAMINFO bit layout matches the spec by hand") {
    val pcm = Array.fill(10)(0)
    val b = FlacCodec.encode(pcm, 1, 44100, blockSize = 10)
    assert(new String(b.take(4), "ASCII") == "fLaC")
    assert((b(4) & 0xff) == 0x80) // last-block flag + type 0
    assert(((b(5) & 0xff) << 16 | (b(6) & 0xff) << 8 | (b(7) & 0xff)) == 34)
    val si = b.drop(8)
    // min/max block = 10
    assert(((si(0) & 0xff) << 8 | (si(1) & 0xff)) == 10)
    assert(((si(2) & 0xff) << 8 | (si(3) & 0xff)) == 10)
    // bytes 10-12: 20 bits rate 44100 (0x0AC44 as a 20-bit field),
    // 3 bits channels-1 (0), 5 bits bps-1 (15), then 36 bits total (10)
    assert((si(10) & 0xff) == 0x0A && (si(11) & 0xff) == 0xC4)
    assert(((si(12) & 0xff) >> 4) == 0x4)
    // channels-1=0 (3 bits) + bps-1=15 (5 bits): 000 01111 packed after rate
    assert((si(12) & 0x0e) == 0x00) // channel bits
    assert(((si(12) & 0x01) << 4 | ((si(13) & 0xff) >> 4)) == 15)
    // total samples 36 bits = 10
    val total = ((si(13) & 0x0fL) << 32) | ((si(14) & 0xffL) << 24) |
      ((si(15) & 0xffL) << 16) | ((si(16) & 0xffL) << 8) | (si(17) & 0xffL)
    assert(total == 10)
    val m = FlacCodec.meta(b).get
    assert(m == FlacCodec.FlacMeta(10, 10, 44100, 1, 16, 10))
  }

  test("mono round trip: fixed predictors, multi-frame, partial tail") {
    val pcm = tone(10000, 7) // 3 frames at 4096: two full + tail
    val b = FlacCodec.encode(pcm, 1, 16000)
    val d = FlacCodec.decode(b).get
    assert(d.meta.totalSamples == 10000 && d.meta.channels == 1)
    assert(d.samples.toSeq == pcm.toSeq)
    // losslessness is also the compression point: flat signals shrink
    val flat = FlacCodec.encode(Array.fill(8192)(1234), 1, 16000)
    assert(flat.length < 8192 * 2 / 10)
    assert(FlacCodec.decode(flat).get.samples.forall(_ == 1234))
  }

  test("stereo round trips: independent, left/side, right/side, mid/side") {
    val n = 5000
    val pcm = new Array[Int](n * 2)
    for (i <- 0 until n) {
      pcm(2 * i) = (((i * 131 + 7) % 65536) - 32768)
      pcm(2 * i + 1) = pcm(2 * i) / 2 + (i % 64) // correlated channels
    }
    for (mode <- Seq(FlacCodec.Independent, FlacCodec.LeftSide,
        FlacCodec.RightSide, FlacCodec.MidSide)) {
      val b = FlacCodec.encode(pcm, 2, 44100, stereo = mode)
      val d = FlacCodec.decode(b).get
      assert(d.samples.toSeq == pcm.toSeq, s"mode=$mode")
    }
    // decorrelation should beat independent on correlated input
    val ind = FlacCodec.encode(pcm, 2, 44100).length
    val ms = FlacCodec.encode(pcm, 2, 44100, stereo = FlacCodec.MidSide).length
    assert(ms < ind)
  }

  test("LPC subframes and Rice partitions round trip") {
    val pcm = tone(8192, 99)
    val lpc = FlacCodec.encode(pcm, 1, 48000, useLpc = true)
    assert(FlacCodec.decode(lpc).get.samples.toSeq == pcm.toSeq)
    val parts = FlacCodec.encode(pcm, 1, 48000, partitionOrder = 3)
    assert(FlacCodec.decode(parts).get.samples.toSeq == pcm.toSeq)
    val both = FlacCodec.encode(pcm, 1, 48000, useLpc = true, partitionOrder = 2)
    assert(FlacCodec.decode(both).get.samples.toSeq == pcm.toSeq)
  }

  test("corruption is total: flipped bits → None, never wrong samples") {
    val pcm = tone(3000, 3)
    val good = FlacCodec.encode(pcm, 1, 8000)
    assert(FlacCodec.decode(good).isDefined)
    // flip a bit inside frame data (after streaminfo = 8+4+34 bytes)
    for (at <- Seq(50, good.length / 2, good.length - 3)) {
      val bad = good.clone()
      bad(at) = (bad(at) ^ 0x10).toByte
      val r = FlacCodec.decode(bad)
      assert(r.isEmpty || r.get.samples.toSeq == pcm.toSeq, s"at=$at")
      // (a flip in padding bits can be survivable; wrong samples cannot)
    }
    assert(FlacCodec.decode("nonsense".getBytes).isEmpty)
    assert(FlacCodec.decode(Array[Byte]('f', 'L', 'a', 'C')).isEmpty)
    assert(FlacCodec.meta(Array.emptyByteArray).isEmpty)
  }

  test("empty stream and constant blocks") {
    val empty = FlacCodec.encode(Array.emptyIntArray, 1, 8000)
    val d = FlacCodec.decode(empty).get
    assert(d.meta.totalSamples == 0 && d.samples.isEmpty)
    val const = FlacCodec.encode(Array.fill(4096)(-32768), 1, 8000)
    assert(FlacCodec.decode(const).get.samples.forall(_ == -32768))
  }
}
