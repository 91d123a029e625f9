package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class Mp4CodecSpec extends AnyFunSuite {
  import Mp4Codec._

  private val vid = VideoSpec("avc1", 320, 240, 30000L, 1001L, 120L)
  private val aud = AudioSpec("mp4a", 2, 48000, 1024L, 50L)

  test("video+audio roundtrip: brands, tracks, dims, sample counts") {
    val b = mp4Bytes("isom", 1000L, 4004L, Some(vid), Some(aud))
    val m = meta(b).get
    assert(m.majorBrand == "isom" && m.timescale == 1000L &&
      m.duration == 4004L && m.tracks.length == 2)
    val v = m.tracks.find(_.handler == "vide").get
    assert(v == TrackMeta(1L, "vide", "avc1", 320, 240, 0, 0, 120L,
      30000L, 120L * 1001L))
    val a = m.tracks.find(_.handler == "soun").get
    assert(a == TrackMeta(2L, "soun", "mp4a", 0, 0, 2, 48000, 50L,
      48000L, 50L * 1024L))
  }

  test("version-1 (64-bit) mvhd/tkhd/mdhd arm decodes identically") {
    val b0 = mp4Bytes("isom", 600L, 9000L, Some(vid), None)
    val b1 = mp4Bytes("isom", 600L, 9000L, Some(vid), None, v1 = true)
    assert(b1.length > b0.length) // the wide headers are really there
    assert(meta(b0).get == meta(b1).get)
  }

  test("largesize (size==1) mdat arm walks") {
    val b = mp4Bytes("mp42", 1000L, 100L, None, Some(aud),
      largeMdat = true)
    val m = meta(b).get
    assert(m.majorBrand == "mp42" && m.tracks.length == 1)
    assert(m.tracks.head.sampleRate == 48000)
  }

  test("audio-only and video-only files parse") {
    val a = meta(mp4Bytes("isom", 1L, 1L, None, Some(aud))).get
    assert(a.tracks.map(_.handler) == Vector("soun"))
    val v = meta(mp4Bytes("isom", 1L, 1L, Some(vid), None)).get
    assert(v.tracks.map(_.handler) == Vector("vide"))
  }

  test("unknown top-level and moov-level boxes are skipped by size") {
    val base = mp4Bytes("isom", 1000L, 5L, Some(vid), None)
    // splice a uuid box between ftyp (24 bytes here) and moov
    val ftypLen = 24
    val uuid = Array[Byte](0, 0, 0, 12, 'u', 'u', 'i', 'd', 1, 2, 3, 4)
    val spliced = base.take(ftypLen) ++ uuid ++ base.drop(ftypLen)
    assert(meta(spliced) == meta(base))
  }

  test("total on garbage, truncation, and lying sizes") {
    assert(meta(null).isEmpty)
    assert(meta(Array.emptyByteArray).isEmpty)
    assert(meta("this is not an mp4 file at all!!".getBytes).isEmpty)
    val good = mp4Bytes("isom", 1000L, 5L, Some(vid), Some(aud))
    assert(meta(java.util.Arrays.copyOfRange(good, 0, good.length / 2)).isEmpty)
    // corrupt moov's declared size so it overruns the file
    val bad = good.clone()
    val moovAt = {
      var p = 0; var found = -1
      while (found < 0 && p + 8 <= bad.length) {
        if (new String(bad, p + 4, 4, "ISO-8859-1") == "moov") found = p
        else p += (((bad(p) & 0xff) << 24) | ((bad(p + 1) & 0xff) << 16) |
          ((bad(p + 2) & 0xff) << 8) | (bad(p + 3) & 0xff))
      }
      found
    }
    bad(moovAt) = 0x7f.toByte
    assert(meta(bad).isEmpty)
  }

  test("no moov, or moov without mvhd → None") {
    val onlyFtyp = mp4Bytes("isom", 1000L, 5L, Some(vid), None)
      .take(24)
    assert(meta(onlyFtyp).isEmpty)
  }
}
