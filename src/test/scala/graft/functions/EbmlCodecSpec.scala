package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class EbmlCodecSpec extends AnyFunSuite {
  import EbmlCodec._

  private val vid = VideoTrackSpec("V_VP9", 1920L, 1080L)
  private val aud = AudioTrackSpec("A_OPUS", 2L, 48000.0)

  test("webm video+audio roundtrip") {
    val b = mkvBytes("webm", 1000000L, 240000.0, Some(vid), Some(aud))
    val m = meta(b).get
    assert(m.docType == "webm" && m.timestampScale == 1000000L &&
      m.durationTicks == 240000.0)
    assert(m.tracks == Vector(
      MkvTrack(1L, 1L, "V_VP9", 1920L, 1080L, 0L, 0.0),
      MkvTrack(2L, 2L, "A_OPUS", 0L, 0L, 2L, 48000.0)))
  }

  test("unknown-size segment (live-stream shape) walks to end of input") {
    val known = mkvBytes("matroska", 500000L, 77.0, Some(vid), None)
    val unknown = mkvBytes("matroska", 500000L, 77.0, Some(vid), None,
      unknownSegment = true)
    assert(meta(known).get == meta(unknown).get)
  }

  test("hand-assembled golden bytes parse (conventions are the RFC's)") {
    // EBML header: ID 1A45DFA3, size 0x8B (=11), body: DocType(4282)
    // size 0x84 "webm" + EBMLVersion(4286) size 0x81 value 1
    val header = Array[Byte](
      0x1A, 0x45.toByte, 0xDF.toByte, 0xA3.toByte, 0x8B.toByte,
      0x42, 0x82.toByte, 0x84.toByte, 'w', 'e', 'b', 'm',
      0x42, 0x86.toByte, 0x81.toByte, 1)
    // Segment: ID 18538067, size marker 2-byte (0x40NN), body: Info
    // with TimestampScale(2AD7B1) size 0x83 value 1000000 (0x0F4240)
    val info = Array[Byte](
      0x15, 0x49, 0xA9.toByte, 0x66, 0x87.toByte,
      0x2A, 0xD7.toByte, 0xB1.toByte, 0x83.toByte,
      0x0F, 0x42, 0x40)
    val seg = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67,
      0x40, info.length.toByte) ++ info
    val m = meta(header ++ seg).get
    assert(m.docType == "webm" && m.timestampScale == 1000000L)
    assert(m.tracks.isEmpty && m.durationTicks.isNaN)
  }

  test("matroska default timestamp scale applies when Info omits it") {
    // write then splice out nothing — instead build with default scale
    val b = mkvBytes("matroska", 1000000L, 5.0, None, Some(aud))
    assert(meta(b).get.timestampScale == 1000000L)
  }

  test("4-byte float duration parses too") {
    // writer emits 8-byte floats; hand-build a 4-byte one
    val f4 = java.lang.Float.floatToIntBits(12.5f)
    val dur = Array[Byte](0x44, 0x89.toByte, 0x84.toByte,
      (f4 >>> 24).toByte, (f4 >>> 16).toByte, (f4 >>> 8).toByte, f4.toByte)
    val info = Array[Byte](0x15, 0x49, 0xA9.toByte, 0x66,
      (0x80 | dur.length).toByte) ++ dur
    val seg = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67,
      (0x80 | info.length).toByte) ++ info
    val ebml = Array[Byte](
      0x1A, 0x45.toByte, 0xDF.toByte, 0xA3.toByte, 0x87.toByte,
      0x42, 0x82.toByte, 0x84.toByte, 'w', 'e', 'b', 'm')
    val m = meta(ebml ++ seg).get
    assert(m.durationTicks == 12.5)
    assert(m.timestampScale == 1000000L) // Matroska default applies
  }

  test("total on garbage, truncation, lying sizes") {
    assert(meta(null).isEmpty)
    assert(meta(Array.emptyByteArray).isEmpty)
    assert(meta("certainly not an ebml stream".getBytes).isEmpty)
    val good = mkvBytes("webm", 1000000L, 1.0, Some(vid), Some(aud))
    assert(meta(java.util.Arrays.copyOfRange(good, 0, good.length - 3)).isEmpty)
    // a zero first byte is an invalid VINT
    val bad = good.clone(); bad(0) = 0
    assert(meta(bad).isEmpty)
  }
}
