package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AviCodec._

class AviCodecSpec extends AnyFunSuite {

  private def flatFrame(w: Int, h: Int, seed: Int): Array[Byte] =
    JpegCodec.encodeFlatGray(w, h, (bx, by) => (seed + 31 * bx + 57 * by) % 256)

  test("aviBytes→decode identity: dims, timing, frame payloads byte-for-byte") {
    val frames = (0 until 5).map(f => flatFrame(24, 16, 10 + 40 * f))
    val video = decode(aviBytes(24, 16, 33333, frames)).getOrElse(fail("no decode"))
    assert(video.width == 24 && video.height == 16 && video.usPerFrame == 33333)
    assert(video.frames.length == 5)
    for (f <- 0 until 5)
      assert(java.util.Arrays.equals(video.frames(f), frames(f)), s"frame $f")
  }

  test("odd-length frames exercise the word-alignment pad on the hot walk") {
    // force both parities: odd frames get one post-EOI byte (ignored by
    // the JPEG walk, flips the RIFF pad path), alternating by index
    val frames = (0 until 6).map { f =>
      val b = flatFrame(9, 7, 3 + 17 * f)
      if ((b.length % 2 == 0) == (f % 2 == 0)) b :+ 0.toByte else b
    }
    assert(frames.exists(_.length % 2 == 1) && frames.exists(_.length % 2 == 0))
    val video = decode(aviBytes(9, 7, 40000, frames)).get
    assert(video.frames.length == 6)
    for (f <- 0 until 6) {
      assert(java.util.Arrays.equals(video.frames(f), frames(f)), s"frame $f")
      assert(JpegCodec.decode(video.frames(f)).isDefined, s"frame $f not a JPEG")
    }
  }

  test("every extracted frame decodes to the encoded block values") {
    val frames = (0 until 3).map(f => flatFrame(17, 10, 100 * f))
    val video = decode(aviBytes(17, 10, 66667, frames)).get
    for (f <- 0 until 3) {
      val img = JpegCodec.decode(video.frames(f)).get
      assert(img.width == 17 && img.height == 10)
      for (y <- 0 until 10; x <- 0 until 17)
        assert((img.data(y * 17 + x) & 0xff) ==
          (100 * f + 31 * (x / 8) + 57 * (y / 8)) % 256, s"f=$f ($x,$y)")
    }
  }

  test("corrupted containers reject: truncation, frame-count lies, foreign codec") {
    val ok = aviBytes(16, 8, 50000, (0 until 3).map(f => flatFrame(16, 8, f * 80)))
    assert(decode(ok).isDefined)
    for (cut <- 0 until ok.length by 7)
      assert(decode(java.util.Arrays.copyOf(ok, cut)).isEmpty, s"cut=$cut")
    // lie about the frame count in avih (offset: RIFF(12) + LIST hdr(12) +
    // avih hdr(8) + 16 into the body)
    val lied = ok.clone(); lied(12 + 12 + 8 + 16) = 9
    assert(decode(lied).isEmpty)
    // foreign fourcc in strh
    val strhAt = (0 until ok.length - 4).find(i =>
      new String(ok, i, 4, "US-ASCII") == "strh").get
    val xvid = ok.clone()
    "XVID".getBytes("US-ASCII").copyToArray(xvid, strhAt + 12)
    assert(decode(xvid).isEmpty)
    // not an AVI at all
    assert(decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(decode(null).isEmpty)
    assert(decode(Array[Byte]()).isEmpty)
  }

  test("fuzz totality: single-bit flips never throw") {
    val ok = aviBytes(8, 8, 41708, Seq(flatFrame(8, 8, 77), flatFrame(8, 8, 201)))
    for (pos <- 0 until ok.length; bit <- Seq(0x01, 0x80)) {
      val bad = ok.clone()
      bad(pos) = (bad(pos) ^ bit).toByte
      decode(bad) // must not throw
    }
  }

  test("oversized declared dims reject before any consumer allocates") {
    val ok = aviBytes(8, 8, 40000, Seq(flatFrame(8, 8, 50)))
    val bad = ok.clone()
    // avih dwWidth at RIFF(12)+LIST hdr(12)+avih hdr(8)+32: write 65535
    bad(12 + 12 + 8 + 32) = 0xff.toByte; bad(12 + 12 + 8 + 33) = 0xff.toByte
    bad(12 + 12 + 8 + 36) = 0xff.toByte; bad(12 + 12 + 8 + 37) = 0xff.toByte
    assert(decode(bad).isEmpty)
  }
}
