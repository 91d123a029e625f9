package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageHeaders._

class ImageHeadersSpec extends AnyFunSuite {

  test("png: encoder round-trips through the parser across the dim range") {
    for ((w, h) <- Seq((1, 1), (16, 16), (640, 480), (65535, 3), (1 << 20, 7))) {
      assert(pngDims(pngHeaderBytes(w, h)) == Some(Dims("png", w, h)), s"$w x $h")
    }
  }

  test("jpeg: encoder round-trips through the parser, uint16 edges included") {
    for ((w, h) <- Seq((1, 1), (640, 480), (65535, 65535), (3, 65535))) {
      assert(jpegDims(jpegHeaderBytes(w, h)) == Some(Dims("jpeg", w, h)), s"$w x $h")
    }
  }

  test("png: CRC validation rejects a bit-flipped header instead of misreading it") {
    val ok = pngHeaderBytes(640, 480)
    val flipped = ok.clone()
    flipped(17) = (flipped(17) ^ 0x01).toByte // inside the width field
    assert(pngDims(flipped).isEmpty) // dims changed but CRC no longer matches
    val badCrc = ok.clone()
    badCrc(30) = (badCrc(30) ^ 0x01).toByte // inside the CRC field itself
    assert(pngDims(badCrc).isEmpty)
  }

  test("malformed inputs parse to None, never throw") {
    val png = pngHeaderBytes(100, 100)
    val jpg = jpegHeaderBytes(100, 100)
    assert(pngDims(null).isEmpty && jpegDims(null).isEmpty)
    assert(pngDims(Array.empty[Byte]).isEmpty)
    assert(pngDims(png.take(20)).isEmpty) // truncated mid-IHDR
    assert(jpegDims(jpg.take(3)).isEmpty) // truncated after SOI
    assert(jpegDims(jpg.takeWhile(_ != 0xc0.toByte)).isEmpty) // no SOF reached
    assert(dims("just some text bytes".getBytes("UTF-8")).isEmpty)
    // wrong magic: swap the leading byte
    val badSig = png.clone(); badSig(0) = 'X'.toByte
    assert(pngDims(badSig).isEmpty)
  }

  test("jpeg: fill bytes running to the buffer edge parse to None (review regression)") {
    // FF D8 followed by nothing but fill bytes: the fill skip reaches the
    // edge with no marker resolved — previously read past the array
    assert(jpegDims(Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff)
      .map(_.toByte)).isEmpty)
    // marker resolved right at the edge with no room for its length field
    assert(jpegDims(Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xe0)
      .map(_.toByte)).isEmpty)
  }

  test("jpeg: SOS/EOI before any SOF means no dims (entropy data never scanned)") {
    // SOI + APP0 + SOS — a frame header never appears
    val app0 = jpegHeaderBytes(9, 9).slice(2, 20)
    val bytes = Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++
      Array[Byte](0xff.toByte, 0xda.toByte, 0, 4, 0, 0)
    assert(jpegDims(bytes).isEmpty)
  }

  test("jpeg: 0xFF fill bytes between segments are tolerated") {
    val plain = jpegHeaderBytes(320, 200)
    // inject two fill bytes before the SOF marker (find FF C0)
    val sofAt = plain.indices.dropWhile(i =>
      !((plain(i) & 0xff) == 0xff && (plain(i + 1) & 0xff) == 0xc0)).head
    val padded = plain.take(sofAt) ++
      Array[Byte](0xff.toByte, 0xff.toByte) ++ plain.drop(sofAt)
    assert(jpegDims(padded) == Some(Dims("jpeg", 320, 200)))
  }

  test("jpeg: standalone TEM/RST markers are length-less, not desync points") {
    // TEM (0x01) and RSTn (0xD0-0xD7) carry no length field; the walk
    // must step over them (i += 2) rather than reading payload bytes as
    // a bogus segment length (advisor finding, round 6)
    val plain = jpegHeaderBytes(320, 200)
    val sofAt = plain.indices.dropWhile(i =>
      !((plain(i) & 0xff) == 0xff && (plain(i + 1) & 0xff) == 0xc0)).head
    for (marker <- Seq(0x01, 0xd0, 0xd3, 0xd7)) {
      val padded = plain.take(sofAt) ++
        Array[Byte](0xff.toByte, marker.toByte) ++ plain.drop(sofAt)
      assert(jpegDims(padded) == Some(Dims("jpeg", 320, 200)), f"marker $marker%02x")
    }
  }

  test("dims() sniffs format from magic, not from a hint") {
    assert(dims(pngHeaderBytes(12, 34)) == Some(Dims("png", 12, 34)))
    assert(dims(jpegHeaderBytes(56, 78)) == Some(Dims("jpeg", 56, 78)))
  }
}
