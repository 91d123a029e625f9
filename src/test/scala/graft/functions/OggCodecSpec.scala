package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class OggCodecSpec extends AnyFunSuite {

  test("vorbis stream: pages walk, CRC verifies, duration from granule") {
    val b = OggCodec.encode(OggCodec.vorbisIdPacket(2, 44100), 7,
      Seq(1000L, 2500L, 4411L))
    val m = OggCodec.meta(b).get
    assert(m == OggCodec.OggMeta("vorbis", 2, 44100, 0, 4, 4411L))
  }

  test("opus stream: pre-skip subtracts from the 48k granule") {
    val b = OggCodec.encode(OggCodec.opusIdPacket(1, 24000, preSkip = 312), 9,
      Seq(48312L))
    val m = OggCodec.meta(b).get
    assert(m.codec == "opus" && m.channels == 1 && m.sampleRate == 24000)
    assert(m.preSkip == 312 && m.nSamples == 48000L)
  }

  test("hand-built page: CRC matches the spec polynomial convention") {
    // independent check: flip one payload byte → CRC must fail
    val good = OggCodec.encode(OggCodec.vorbisIdPacket(1, 8000), 1, Seq(100L))
    assert(OggCodec.meta(good).isDefined)
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte
    assert(OggCodec.meta(bad).isEmpty)
    // and a flip INSIDE the crc field itself also fails
    val bad2 = good.clone()
    bad2(22) = (bad2(22) ^ 0x01).toByte
    assert(OggCodec.meta(bad2).isEmpty)
  }

  test("large packets lace across 255-byte segments") {
    val bigId = OggCodec.vorbisIdPacket(1, 16000) ++ new Array[Byte](600)
    val b = OggCodec.encode(bigId, 3, Seq(7L))
    val m = OggCodec.meta(b).get
    assert(m.codec == "vorbis" && m.nSamples == 7L)
  }

  test("total on garbage and truncation") {
    assert(OggCodec.meta("OggS but not really".getBytes).isEmpty)
    assert(OggCodec.meta(Array.emptyByteArray).isEmpty)
    val good = OggCodec.encode(OggCodec.opusIdPacket(2, 48000, 0), 5, Seq(10L))
    assert(OggCodec.meta(java.util.Arrays.copyOfRange(good, 0, good.length - 4)).isEmpty)
  }
}
