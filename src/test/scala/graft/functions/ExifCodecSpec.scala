package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class ExifCodecSpec extends AnyFunSuite {

  private val full = ExifCodec.ExifMeta(
    byteOrderLittle = true,
    orientation = Some(6),
    make = Some("CamCo"),
    model = Some("M3"),
    dateTime = Some("2026:01:02 12:34:56"),
    exifWidth = Some(4032L),
    exifHeight = Some(3024L),
    iso = Some(400),
    exposure = Some(ExifCodec.Rational(1, 125)),
    fNumber = Some(ExifCodec.Rational(28, 10)))

  test("TIFF blob round trips in both byte orders, all fields") {
    for (little <- Seq(true, false)) {
      val m = full.copy(byteOrderLittle = little)
      val got = ExifCodec.fromTiff(ExifCodec.tiffBytes(m))
      assert(got == m, s"little=$little")
    }
  }

  test("partial metadata round trips (absent fields stay absent)") {
    val m = ExifCodec.Empty.copy(orientation = Some(1), iso = Some(100))
    assert(ExifCodec.fromTiff(ExifCodec.tiffBytes(m)) == m)
    val strings = ExifCodec.Empty.copy(make = Some("ab")) // inline-length ASCII
    assert(ExifCodec.fromTiff(ExifCodec.tiffBytes(strings)) == strings)
  }

  test("APP1 inserts after SOI of a real JPEG; decode still works; no EXIF → None") {
    val jpeg = JpegCodec.encodeFlatGray(16, 16, (_, _) => 128)
    assert(ExifCodec.fromJpeg(jpeg).isEmpty)
    val tagged = ExifCodec.withExif(jpeg, full)
    assert(ExifCodec.fromJpeg(tagged).contains(full))
    // the pixel decoder must be oblivious to the APP1 segment
    assert(JpegCodec.decode(tagged).map(_.width) == JpegCodec.decode(jpeg).map(_.width))
    assert(JpegCodec.decode(tagged).get.data.toSeq == JpegCodec.decode(jpeg).get.data.toSeq)
  }

  test("hand-authored big-endian fixture (independent of the writer)") {
    // MM, magic 42, IFD0 at 8 with ONE entry: Orientation SHORT 1 = 8,
    // then next-IFD pointer 0
    val b = Array[Int](
      'M', 'M', 0, 42, 0, 0, 0, 8,
      0, 1, // one entry
      0x01, 0x12, 0, 3, 0, 0, 0, 1, 0, 8, 0, 0, // tag, SHORT, count 1, value 8
      0, 0, 0, 0).map(_.toByte)
    val got = ExifCodec.fromTiff(b)
    assert(!got.byteOrderLittle)
    assert(got.orientation.contains(8))
    assert(got.make.isEmpty && got.iso.isEmpty)
  }

  test("total on damage: truncations, bad magic, cyclic pointers") {
    val good = ExifCodec.tiffBytes(full)
    (0 until good.length by 5).foreach(n => ExifCodec.fromTiff(good.take(n)))
    assert(ExifCodec.fromTiff("JUNKJUNK".getBytes) == ExifCodec.Empty)
    // Exif pointer pointing at itself must not loop forever
    val selfPtr = Array[Int](
      'I', 'I', 42, 0, 8, 0, 0, 0,
      1, 0,
      0x69, 0x87, 4, 0, 1, 0, 0, 0, 8, 0, 0, 0, // ExifPtr → IFD0 again
      0, 0, 0, 0).map(_.toByte)
    ExifCodec.fromTiff(selfPtr) // must return (the sub-walk reads as exif IFD)
    val jpegJunk = Array[Int](0xff, 0xd8, 0xff, 0xe1, 0, 3, 0).map(_.toByte)
    assert(ExifCodec.fromJpeg(jpegJunk).isEmpty)
  }
}
