package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PngCodec._

class PngCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, ch: Int): Image = {
    val data = new Array[Byte](w * h * ch)
    var i = 0
    while (i < data.length) { data(i) = ((i * 7 + i / ch) % 256).toByte; i += 1 }
    Image(w, h, ch, data)
  }

  test("encode→decode identity across all four supported color types") {
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (3, 7), (16, 16), (33, 5))) {
      val img = gradient(w, h, ch)
      val back = decode(encode(img))
      assert(back.isDefined, s"ch=$ch $w x $h failed to decode")
      assert(back.get.width == w && back.get.height == h &&
        back.get.channels == ch)
      assert(java.util.Arrays.equals(back.get.data, img.data),
        s"pixel mismatch ch=$ch $w x $h")
    }
  }

  test("every unfilter arm is exercised: ≥5 rows means filters 0-4 all appear") {
    // encoder picks filter = row % 5; a 7-row image crosses every arm,
    // and the identity above must still hold (this test pins the claim)
    val img = gradient(5, 7, 3)
    val bytes = encode(img)
    // filter bytes live in the deflated stream — inflate and look
    val inf = new java.util.zip.Inflater()
    val idatStart = {
      var off = 8 + 25
      while (new String(bytes, off + 4, 4, "US-ASCII") != "IDAT")
        off += 12 + ((bytes(off) & 0xff) << 24 | (bytes(off + 1) & 0xff) << 16 |
          (bytes(off + 2) & 0xff) << 8 | (bytes(off + 3) & 0xff))
      off
    }
    val len = (bytes(idatStart) & 0xff) << 24 | (bytes(idatStart + 1) & 0xff) << 16 |
      (bytes(idatStart + 2) & 0xff) << 8 | (bytes(idatStart + 3) & 0xff)
    inf.setInput(bytes, idatStart + 8, len)
    val raw = new Array[Byte]((5 * 3 + 1) * 7)
    var done = 0
    while (done < raw.length && !inf.finished())
      done += inf.inflate(raw, done, raw.length - done)
    inf.end()
    val filters = (0 until 7).map(y => raw(y * 16) & 0xff)
    assert(filters == Seq(0, 1, 2, 3, 4, 0, 1))
  }

  test("synthetic raster formula matches the q81 oracle arithmetic") {
    val img = syntheticRgb(seed = 42L, width = 6, height = 4)
    for (y <- 0 until 4; x <- 0 until 6) {
      val i = (y * 6 + x) * 3
      assert((img.data(i) & 0xff) == ((42 + 3 * x + 7 * y) % 256))
      assert((img.data(i + 1) & 0xff) == ((84 + 5 * x + y) % 256))
      assert((img.data(i + 2) & 0xff) == ((126 + x + 11 * y) % 256))
    }
  }

  test("palette PNGs: PLTE lookup expands to RGB, JDK-decoder cross-check, bad index rejects") {
    val palette = Array[Byte](
      10, 20, 30, 100.toByte, 110.toByte, 120.toByte,
      200.toByte, 210.toByte, 220.toByte, 5, 6, 7)
    val indices = Array.tabulate(7 * 6)(i => (i % 4).toByte)
    val bytes = encodePalette(7, 6, palette, indices)
    val img = decode(bytes).getOrElse(fail("palette decode failed"))
    assert(img.width == 7 && img.height == 6 && img.channels == 3)
    for (i <- 0 until 42; c <- 0 until 3)
      assert(img.data(3 * i + c) == palette(3 * (i % 4) + c), s"px $i ch $c")
    // independent implementation: the JDK decodes the same bytes
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 6; x <- 0 until 7) {
      val p = jdk.getRGB(x, y)
      val i = (y * 7 + x) * 3
      assert((img.data(i) & 0xff) == ((p >> 16) & 0xff) &&
        (img.data(i + 1) & 0xff) == ((p >> 8) & 0xff) &&
        (img.data(i + 2) & 0xff) == (p & 0xff), s"jdk ($x,$y)")
    }
    // shrink the palette below the max index (CRCs rebuilt): the
    // out-of-range index must reject, never read garbage colors
    val at = 8 + 25
    assert(new String(bytes, at + 4, 4, "US-ASCII") == "PLTE")
    val shrunk = java.nio.ByteBuffer.allocate(bytes.length - 3)
    shrunk.put(bytes, 0, at)
    shrunk.putInt(9).put("PLTE".getBytes("US-ASCII")).put(palette, 0, 9)
    val crc = new java.util.zip.CRC32
    crc.update(shrunk.array(), at + 4, 13)
    shrunk.putInt(crc.getValue.toInt)
    shrunk.put(bytes, at + 12 + 12, bytes.length - at - 24)
    assert(decode(shrunk.array()).isEmpty)
  }

  test("corrupted payloads decode to None, never throw or return wrong pixels") {
    val ok = encode(gradient(9, 9, 3))
    assert(decode(ok).isDefined)
    // truncations at every prefix length
    for (cut <- 0 until ok.length by 7)
      assert(decode(java.util.Arrays.copyOf(ok, cut)).isEmpty, s"cut=$cut")
    // single-bit flips: either still-decodable to the SAME pixels (flip
    // in a skippable region) or None — never different pixels
    val truth = decode(ok).get.data
    for (pos <- 0 until ok.length by 3) {
      val bad = ok.clone()
      bad(pos) = (bad(pos) ^ 0x10).toByte
      decode(bad) match {
        case None => ()
        case Some(img) =>
          assert(java.util.Arrays.equals(img.data, truth),
            s"bit flip at $pos produced different pixels silently")
      }
    }
  }

  test("unsupported/malformed surface rejects: PLTE-less palette, 16-bit, interlace, bad filter method") {
    val ok = encode(gradient(4, 4, 3))
    def mutIhdr(off: Int, v: Byte): Array[Byte] = {
      val b = ok.clone()
      b(off) = v
      // rewrite the IHDR CRC so the rejection is about the FIELD, not CRC
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 17)
      val c = crc.getValue
      b(29) = (c >> 24).toByte; b(30) = (c >> 16).toByte
      b(31) = (c >> 8).toByte; b(32) = c.toByte
      b
    }
    assert(decode(mutIhdr(24, 16)).isEmpty) // 16-bit depth
    assert(decode(mutIhdr(25, 3)).isEmpty) // palette
    assert(decode(mutIhdr(28, 1)).isEmpty) // Adam7 interlace
    assert(decode(mutIhdr(27, 1)).isEmpty) // unknown filter method
  }

  test("decompression bomb guard: stream longer than the declared raster rejects") {
    val img = gradient(4, 4, 1)
    val good = encode(img)
    // craft an IDAT that inflates to twice the raster: reuse encoder
    // internals by encoding a taller image, then transplanting its IDAT
    // under the 4x4 IHDR (CRCs rewritten)
    val tall = encode(gradient(4, 8, 1))
    val idatOf = (b: Array[Byte]) => {
      var off = 8 + 25
      while (new String(b, off + 4, 4, "US-ASCII") != "IDAT")
        off += 12 + ((b(off) & 0xff) << 24 | (b(off + 1) & 0xff) << 16 |
          (b(off + 2) & 0xff) << 8 | (b(off + 3) & 0xff))
      off
    }
    val tOff = idatOf(tall)
    val tLen = (tall(tOff) & 0xff) << 24 | (tall(tOff + 1) & 0xff) << 16 |
      (tall(tOff + 2) & 0xff) << 8 | (tall(tOff + 3) & 0xff)
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + tLen + 12)
    out.put(good, 0, 8 + 25) // 4x4 IHDR
    out.put(tall, tOff, 12 + tLen) // 4x8 worth of scanlines
    out.put(good, good.length - 12, 12) // IEND
    assert(decode(out.array()).isEmpty)
  }

  test("unknown critical chunk rejects; ancillary chunk is skipped") {
    val ok = encode(gradient(3, 3, 3))
    def insertChunk(ctype: String): Array[Byte] = {
      val body = Array[Byte](1, 2, 3)
      val chunk = java.nio.ByteBuffer.allocate(12 + body.length)
      chunk.putInt(body.length).put(ctype.getBytes("US-ASCII")).put(body)
      val crc = new java.util.zip.CRC32
      crc.update(chunk.array(), 4, 4 + body.length)
      chunk.putInt(crc.getValue.toInt)
      // insert after IHDR
      val at = 8 + 25
      val out = new Array[Byte](ok.length + chunk.capacity())
      System.arraycopy(ok, 0, out, 0, at)
      System.arraycopy(chunk.array(), 0, out, at, chunk.capacity())
      System.arraycopy(ok, at, out, at + chunk.capacity(), ok.length - at)
      out
    }
    assert(decode(insertChunk("tEXt")).isDefined) // ancillary: skipped
    assert(decode(insertChunk("sBIT")).isDefined)
    assert(decode(insertChunk("PLTE")).isEmpty) // critical we don't honor
    assert(decode(insertChunk("QRST")).isEmpty) // unknown critical
  }
}
