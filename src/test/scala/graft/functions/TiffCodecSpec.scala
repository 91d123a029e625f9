package graft.functions

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import PngCodec.Image

class TiffCodecSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int, ch: Int, seed: Int): Image = {
    val d = new Array[Byte](w * h * ch)
    var i = 0
    while (i < d.length) { d(i) = ((seed + i * 31 + (i * i) % 97) & 0xff).toByte; i += 1 }
    Image(w, h, ch, d)
  }

  test("round trips: none/LZW/PackBits × gray/RGB × strips × predictor") {
    for {
      ch <- Seq(1, 3)
      comp <- Seq(1, 5, 32773)
      rps <- Seq(Int.MaxValue, 7)
    } {
      val img = raster(37, 23, ch, comp + ch)
      val enc = TiffCodec.encode(img, comp, rowsPerStrip = rps)
      val dec = TiffCodec.decode(enc).get
      assert(dec.width == 37 && dec.height == 23 && dec.channels == ch,
        s"ch=$ch comp=$comp rps=$rps")
      assert(dec.data.toSeq == img.data.toSeq, s"ch=$ch comp=$comp rps=$rps")
    }
    // LZW + horizontal predictor (smooth data where it actually helps)
    val smooth = Image(64, 64, 3, Array.tabulate(64 * 64 * 3)(i => (i / 48).toByte))
    val withP = TiffCodec.encode(smooth, 5, predictor = true)
    val noP = TiffCodec.encode(smooth, 5)
    assert(TiffCodec.decode(withP).get.data.toSeq == smooth.data.toSeq)
    assert(withP.length < noP.length) // the predictor must pay for itself here
  }

  test("LZW survives table growth to 12 bits and dictionary resets") {
    // low-redundancy raster → >4094 dict entries → in-stream Clear
    val big = raster(128, 128, 3, 5)
    val enc = TiffCodec.encode(big, 5)
    assert(TiffCodec.decode(enc).get.data.toSeq == big.data.toSeq)
  }

  test("JDK ImageIO reads our encoder's output pixel-exactly, all compressions") {
    val img = raster(19, 11, 3, 42)
    for (comp <- Seq(1, 5, 32773)) {
      val jdk = ImageIO.read(new ByteArrayInputStream(TiffCodec.encode(img, comp)))
      assert(jdk != null, s"ImageIO rejected comp=$comp")
      assert(jdk.getWidth == 19 && jdk.getHeight == 11)
      for (y <- 0 until 11; x <- 0 until 19) {
        val i = (y * 19 + x) * 3
        val expected = ((img.data(i) & 0xff) << 16) |
          ((img.data(i + 1) & 0xff) << 8) | (img.data(i + 2) & 0xff)
        assert((jdk.getRGB(x, y) & 0xffffff) == expected, s"comp=$comp ($x,$y)")
      }
    }
  }

  test("our decoder reads JDK ImageIO's TIFF output") {
    val img = raster(15, 9, 3, 7)
    val bi = new java.awt.image.BufferedImage(15, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 15) {
      val i = (y * 15 + x) * 3
      bi.setRGB(x, y, ((img.data(i) & 0xff) << 16) |
        ((img.data(i + 1) & 0xff) << 8) | (img.data(i + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(bi, "TIFF", bos))
    val dec = TiffCodec.decode(bos.toByteArray)
    assert(dec.isDefined, "our decoder rejected ImageIO's TIFF")
    val d = dec.get
    assert(d.width == 15 && d.height == 9)
    assert(d.data.toSeq == img.data.toSeq)
  }

  test("total on malformed input") {
    assert(TiffCodec.decode("not a tiff".getBytes).isEmpty)
    assert(TiffCodec.decode(Array[Byte]('I', 'I', 42, 0)).isEmpty)
    val good = TiffCodec.encode(raster(8, 8, 1, 1), 5)
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length / 2)
    assert(TiffCodec.decode(cut).isEmpty)
  }
}
