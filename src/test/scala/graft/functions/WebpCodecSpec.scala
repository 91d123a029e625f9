package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PngCodec.Image
import graft.functions.WebpCodec._

class WebpCodecSpec extends AnyFunSuite {

  private def roundTrip(img: Image): Unit = {
    val decoded = decode(encode(img))
    assert(decoded.isDefined, s"${img.width}x${img.height}/${img.channels}")
    val d = decoded.get
    assert((d.width, d.height) === (img.width, img.height))
    img.channels match {
      case 3 | 4 =>
        assert(d.channels === img.channels)
        assert(d.data.toSeq === img.data.toSeq)
      case _ => // gray encodes as r=g=b
        assert(d.channels === (if (img.channels == 2) 4 else 3))
        val ch = d.channels
        (0 until img.width * img.height).foreach { i =>
          val v = img.data(i * img.channels) & 0xff
          assert((d.data(i * ch) & 0xff) === v)
          assert((d.data(i * ch + 1) & 0xff) === v)
          assert((d.data(i * ch + 2) & 0xff) === v)
        }
    }
  }

  test("round-trip: synthetic RGB rasters across shapes (1x1 .. 64x48)") {
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1), (4, 4), (16, 12),
        (64, 48), (19, 23)))
      roundTrip(PngCodec.syntheticRgb(w.toLong * h + 13, w, h))
  }

  test("round-trip: rasters that exercise LZ77 runs and cache hits") {
    // 4-wide blocks: horizontal runs (distance-1 copies) + repeated
    // colors across rows (color-cache hits)
    for (seed <- Seq(1L, 77L, 200L)) {
      val (w, h) = (32, 16)
      val data = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        data(i) = ((seed + 11 * (x / 4) + 3 * (y / 4)) % 256).toByte
        data(i + 1) = ((2 * seed + 7 * (x / 4)) % 256).toByte
        data(i + 2) = ((3 * seed + (y / 4)) % 256).toByte
      }
      roundTrip(Image(w, h, 3, data))
    }
    // constant image: one literal + one long copy
    roundTrip(Image(50, 40, 3, Array.fill[Byte](50 * 40 * 3)(0x5a)))
  }

  test("round-trip: alpha and gray channel shapes") {
    val rgba = {
      val d = new Array[Byte](10 * 10 * 4)
      (0 until 100).foreach { i =>
        d(i * 4) = (i * 3 % 256).toByte
        d(i * 4 + 1) = (i * 5 % 256).toByte
        d(i * 4 + 2) = (i * 7 % 256).toByte
        d(i * 4 + 3) = (i * 2 % 256).toByte
      }
      Image(10, 10, 4, d)
    }
    roundTrip(rgba)
    roundTrip(Image(9, 5, 1, Array.tabulate[Byte](45)(i => (i * 17 % 256).toByte)))
  }

  test("all 256 byte values per channel round-trip (full-alphabet Huffman)") {
    // 256 distinct colors in a 16x16 tile — every literal symbol of
    // every channel code is on the path, code lengths near-uniform
    val d = new Array[Byte](16 * 16 * 3)
    (0 until 256).foreach { i =>
      d(i * 3) = i.toByte
      d(i * 3 + 1) = (255 - i).toByte
      d(i * 3 + 2) = ((i * 37) % 256).toByte
    }
    roundTrip(Image(16, 16, 3, d))
  }

  test("transform round-trips: subtract-green, every predictor mode, both combined") {
    val img = PngCodec.syntheticRgb(42L, 37, 29)
    assert(decode(encodeWith(img, subtractGreen = true,
      predictorMode = None)).get.data.toSeq === img.data.toSeq)
    (0 to 13).foreach { mode =>
      val d = decode(encodeWith(img, subtractGreen = false,
        predictorMode = Some(mode)))
      assert(d.isDefined && d.get.data.toSeq === img.data.toSeq,
        s"predictor mode $mode")
    }
    (0 to 13).foreach { mode =>
      val d = decode(encodeWith(img, subtractGreen = true,
        predictorMode = Some(mode)))
      assert(d.isDefined && d.get.data.toSeq === img.data.toSeq,
        s"SG + predictor mode $mode")
    }
    // alpha channel through the predictor path too
    val rgba = Image(18, 11, 4,
      Array.tabulate[Byte](18 * 11 * 4)(i => ((i * 29 + 5) % 256).toByte))
    assert(decode(encodeWith(rgba, subtractGreen = true,
      predictorMode = Some(12))).get.data.toSeq === rgba.data.toSeq)
  }

  test("palette round-trips: every bundling width, first-seen order, 256-color edge") {
    // 2 colors → 8 px/byte; 4 → 4; 16 → 2; 200 → 1 (no bundling)
    for (nColors <- Seq(2, 3, 4, 9, 16, 17, 200, 256)) {
      val (w, h) = (41, 13) // non-multiple of every bundling width
      val d = new Array[Byte](w * h * 3)
      (0 until w * h).foreach { i =>
        val c = (i * 7) % nColors
        d(i * 3) = (c * 31 % 256).toByte
        d(i * 3 + 1) = (c * 17 % 256).toByte
        d(i * 3 + 2) = (255 - c % 256).toByte
      }
      val img = Image(w, h, 3, d)
      val enc = encodeIndexed(img)
      val dec = decode(enc)
      assert(dec.isDefined && dec.get.data.toSeq === img.data.toSeq,
        s"$nColors colors")
      // small palettes actually bundle: the packed stream must be
      // smaller than the plain encoding of the same raster
      if (nColors <= 16)
        assert(enc.length < encode(img).length, s"$nColors colors: no gain?")
    }
    // over 256 distinct colors: falls back to the plain path, still exact
    val big = PngCodec.syntheticRgb(7L, 40, 30)
    assert(decode(encodeIndexed(big)).get.data.toSeq === big.data.toSeq)
  }

  test("totality: garbage, truncation, and bit flips never throw, never lie about dims") {
    val good = encode(PngCodec.syntheticRgb(5L, 12, 9))
    assert(decode(good).isDefined)
    assert(decode(null) === None)
    assert(decode(Array.empty[Byte]) === None)
    assert(decode("RIFFxxxxWEBP".getBytes) === None)
    (0 until good.length by 5).foreach(n => decode(good.take(n))) // no throw
    (0 until good.length).foreach { i =>
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x41).toByte
      decode(bad).foreach { img => // decoded despite the flip: dims must hold
        assert(img.width.toLong * img.height * img.channels ===
          img.data.length)
      }
    }
  }

  test("header dims: VP8L, VP8X canvas, lossy VP8 frame tag") {
    val l = encode(PngCodec.syntheticRgb(9L, 33, 21))
    assert(dims(l) === Some(ImageHeaders.Dims("webp", 33, 21)))
    // hand-built VP8X: canvas 100x50
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u24m1(v: Int) = Array(((v - 1) & 0xff).toByte,
      (((v - 1) >> 8) & 0xff).toByte, (((v - 1) >> 16) & 0xff).toByte)
    val vp8x = "RIFF".getBytes ++ le32(4 + 8 + 10) ++ "WEBP".getBytes ++
      "VP8X".getBytes ++ le32(10) ++ Array[Byte](0, 0, 0, 0) ++
      u24m1(100) ++ u24m1(50)
    assert(dims(vp8x) === Some(ImageHeaders.Dims("webp", 100, 50)))
    // hand-built lossy VP8 header: 320x240
    val frame = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (320 & 0xff).toByte, (320 >> 8).toByte,
      (240 & 0xff).toByte, (240 >> 8).toByte)
    val vp8 = "RIFF".getBytes ++ le32(4 + 8 + frame.length) ++
      "WEBP".getBytes ++ "VP8 ".getBytes ++ le32(frame.length) ++ frame
    assert(dims(vp8) === Some(ImageHeaders.Dims("webp", 320, 240)))
    assert(dims(Array.fill[Byte](30)(1)) === None)
  }
}
