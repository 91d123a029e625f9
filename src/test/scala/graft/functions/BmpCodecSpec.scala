package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BMP codec: encode→decode identity, external validation
  * against the JDK's independent BMP reader AND writer, padded-row
  * widths, top-down bitmaps, and decode totality on corruption.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def synth(seed: Long, w: Int, h: Int) =
    PngCodec.syntheticRgb(seed, w, h)

  test("encode -> decode is the identity across padding widths") {
    // widths mod 4 = 0..3 exercise every row-padding arm
    for (w <- 4 to 7; h <- Seq(3, 5)) {
      val img = synth(w * 31L + h, w, h)
      val back = BmpCodec.decode(BmpCodec.encode(img))
      assert(back.isDefined, s"$w x $h failed to decode")
      assert(back.get.width === w && back.get.height === h)
      assert(back.get.channels === 3)
      assert(back.get.data.toSeq === img.data.toSeq, s"$w x $h pixels differ")
    }
  }

  test("JDK ImageIO reads our encoder's output pixel-exactly") {
    val img = synth(42L, 10, 6)
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(BmpCodec.encode(img)))
    assert(jdk != null, "ImageIO rejected our BMP")
    assert(jdk.getWidth === 10 && jdk.getHeight === 6)
    for (y <- 0 until 6; x <- 0 until 10) {
      val i = (y * 10 + x) * 3
      val rgb = jdk.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === (img.data(i) & 0xff), s"R @($x,$y)")
      assert(((rgb >> 8) & 0xff) === (img.data(i + 1) & 0xff), s"G @($x,$y)")
      assert((rgb & 0xff) === (img.data(i + 2) & 0xff), s"B @($x,$y)")
    }
  }

  test("we read the JDK writer's BMP pixel-exactly") {
    val img = synth(7L, 9, 4) // width 9: padded rows from a foreign writer
    val buf = new java.awt.image.BufferedImage(9, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 9) {
      val i = (y * 9 + x) * 3
      buf.setRGB(x, y, ((img.data(i) & 0xff) << 16) |
        ((img.data(i + 1) & 0xff) << 8) | (img.data(i + 2) & 0xff))
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "bmp", out))
    val back = BmpCodec.decode(out.toByteArray)
    assert(back.isDefined, "failed to decode a JDK-written BMP")
    assert(back.get.width === 9 && back.get.height === 4)
    assert(back.get.data.toSeq === img.data.toSeq)
  }

  test("top-down bitmaps (negative height) decode in row order") {
    val img = synth(3L, 5, 3)
    val bottomUp = BmpCodec.encode(img)
    // flip to top-down: negate height, reverse the stored row order
    val rowBytes = (5 * 3 + 3) / 4 * 4
    val td = bottomUp.clone()
    val nh = -3
    td(22) = (nh & 0xff).toByte; td(23) = ((nh >> 8) & 0xff).toByte
    td(24) = ((nh >> 16) & 0xff).toByte; td(25) = ((nh >> 24) & 0xff).toByte
    for (y <- 0 until 3)
      System.arraycopy(bottomUp, 54 + (2 - y) * rowBytes,
        td, 54 + y * rowBytes, rowBytes)
    val back = BmpCodec.decode(td)
    assert(back.isDefined && back.get.data.toSeq === img.data.toSeq)
  }

  test("decode is total: truncation, bit flips, wrong surface all give None") {
    val good = BmpCodec.encode(synth(9L, 8, 8))
    for (cut <- Seq(0, 1, 13, 53, good.length - 1))
      assert(BmpCodec.decode(good.take(cut)).isEmpty, s"truncated at $cut")
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(BmpCodec.decode(badMagic).isEmpty)
    val badBpp = good.clone(); badBpp(28) = 8 // paletted: unsupported
    assert(BmpCodec.decode(badBpp).isEmpty)
    val badComp = good.clone(); badComp(30) = 1 // BI_RLE8
    assert(BmpCodec.decode(badComp).isEmpty)
    val bomb = good.clone() // 2^31-ish dimensions must not allocate
    bomb(18) = -1; bomb(19) = -1; bomb(20) = -1; bomb(21) = 0x7f
    assert(BmpCodec.decode(bomb).isEmpty)
    assert(BmpCodec.decode(null).isEmpty)
    assert(BmpCodec.decode(Array.emptyByteArray).isEmpty)
  }
}
