package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JpegCodec._

/** The independent-implementation check: the JDK's ImageIO JPEG codec
  * (a libjpeg-lineage integer implementation) decodes/encodes the same
  * streams. Diff bounds are chosen per error source:
  *  - flat DC-only fixtures: IDCT is exact on both sides (DC quantum 8
  *    divides 8·(v−128)), so gray must match BIT-EXACTLY; color within
  *    ±1 (ImageIO's fixed-point YCbCr→RGB vs our floor(x+0.5)).
  *  - natural-content gray streams (ImageIO-encoded): the only
  *    divergence is integer-vs-double IDCT, spec-bounded at ±1 by
  *    T.81 §A.3.3 accuracy requirements — we allow ±2.
  * Color natural content is deliberately NOT cross-decoded: subsampled
  * chroma makes the upsample filter (our replication vs libjpeg's
  * triangle) part of the output, and neither is "wrong".
  */
class JpegCodecSpec extends AnyFunSuite {

  private def decodeImageIO(b: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))

  test("flat gray fixtures round-trip bit-exactly at awkward sizes and restart intervals") {
    for ((w, h) <- Seq((8, 8), (1, 1), (7, 5), (16, 8), (17, 15), (64, 48), (100, 1));
         rst <- Seq(0, 1, 3)) {
      val bytes = encodeFlatGray(w, h, (bx, by) => (11 * bx + 29 * by + 40) % 256)
      val img = decode(bytes).getOrElse(fail(s"$w x $h rst=$rst: no decode"))
      assert(img.width == w && img.height == h && img.channels == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.data(y * w + x) & 0xff) == (11 * (x / 8) + 29 * (y / 8) + 40) % 256,
          s"($x,$y) $w x $h rst=$rst")
    }
  }

  test("flat gray fixtures match the JDK decoder bit-exactly") {
    for ((w, h) <- Seq((8, 8), (7, 5), (33, 17))) {
      val bytes = encodeFlatGray(w, h, (bx, by) => (50 * bx + 90 * by + 5) % 256)
      val ours = decode(bytes).get
      val jdk = decodeImageIO(bytes)
      assert(jdk.getWidth == w && jdk.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((ours.data(y * w + x) & 0xff) ==
          (jdk.getRaster.getSample(x, y, 0)), s"($x,$y) $w x $h")
    }
  }

  test("flat 4:2:0 color fixtures decode to the exact YCbCr→RGB formula") {
    def rgbOf(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def c(v: Double) = math.max(0, math.min(255, math.floor(v + 0.5).toInt))
      (c(yv + 1.402 * (cr - 128)),
        c(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        c(yv + 1.772 * (cb - 128)))
    }
    for ((w, h) <- Seq((16, 16), (5, 3), (17, 15), (40, 33))) {
      val f = (mx: Int, my: Int) =>
        ((37 * mx + 11 * my + 60) % 256, (80 * mx + 160) % 256, (50 * my + 90) % 256)
      val bytes = encodeFlatYcc420(w, h, f)
      val img = decode(bytes).getOrElse(fail(s"$w x $h: no decode"))
      assert(img.width == w && img.height == h && img.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (yv, cb, cr) = f(x / 16, y / 16)
        val (r, g, b) = rgbOf(yv, cb, cr)
        val i = (y * w + x) * 3
        assert((img.data(i) & 0xff) == r && (img.data(i + 1) & 0xff) == g &&
          (img.data(i + 2) & 0xff) == b, s"($x,$y) $w x $h")
      }
    }
  }

  test("flat color fixtures agree with the JDK decoder within ±1 per channel") {
    // chroma globally flat, luma varying per MCU: Y is full-resolution
    // (never upsampled), so the JDK's triangle chroma filter and our
    // replication see identical inputs and only the YCbCr→RGB rounding
    // differs. Varying chroma vs the exact formula is the test above —
    // against OUR decoder, whose upsample choice is part of the contract.
    val bytes = encodeFlatYcc420(34, 18,
      (mx, my) => ((90 + 30 * mx + 55 * my) % 256, 70, 180))
    val ours = decode(bytes).get
    val jdk = decodeImageIO(bytes)
    for (y <- 0 until 18; x <- 0 until 34) {
      val p = jdk.getRGB(x, y)
      val i = (y * 34 + x) * 3
      for ((oursV, jdkV, ch) <- Seq(
          (ours.data(i) & 0xff, (p >> 16) & 0xff, "r"),
          (ours.data(i + 1) & 0xff, (p >> 8) & 0xff, "g"),
          (ours.data(i + 2) & 0xff, p & 0xff, "b")))
        assert(math.abs(oursV - jdkV) <= 1, s"($x,$y) $ch ours=$oursV jdk=$jdkV")
    }
  }

  test("natural-content gray stream from the JDK encoder decodes within ±2 of the JDK decoder") {
    // real entropy data: every AC path, ZRL, multi-length Huffman codes
    val w = 120; val h = 80
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0,
        (128 + 90 * math.sin(x / 7.0) * math.cos(y / 5.0) +
          (if ((x / 16 + y / 16) % 2 == 0) 30 else -30)).toInt.max(0).min(255))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = decode(bytes).getOrElse(fail("no decode of JDK-encoded stream"))
    val jdk = decodeImageIO(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 1)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs((ours.data(y * w + x) & 0xff) - jdk.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"max per-sample diff $maxDiff")
  }

  test("dims agree with the header parser on every fixture") {
    for ((w, h) <- Seq((8, 8), (17, 15), (100, 1))) {
      val g = encodeFlatGray(w, h, (_, _) => 128)
      val c = encodeFlatYcc420(w, h, (_, _) => (128, 128, 128))
      for (bytes <- Seq(g, c)) {
        val d = ImageHeaders.jpegDims(bytes).getOrElse(fail("header parse failed"))
        assert(d.width == w && d.height == h)
        val img = decode(bytes).get
        assert(img.width == w && img.height == h)
      }
    }
  }

  test("corrupted restart sequence and truncation reject; bit flips never throw") {
    val ok = encodeFlatGray(40, 24, (bx, by) => (bx * 37 + by * 73) % 256,
      restartInterval = 2)
    assert(decode(ok).isDefined)
    // break the RST ordinal sequence: find the first RST0 and bump it
    val rstAt = (0 until ok.length - 1).find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xd0).get
    val badRst = ok.clone(); badRst(rstAt + 1) = 0xd3.toByte
    assert(decode(badRst).isEmpty)
    for (cut <- 0 until ok.length by 5)
      assert(decode(java.util.Arrays.copyOf(ok, cut)).isEmpty, s"cut=$cut")
    // no CRC in JPEG: a flip may legally decode (to different pixels) or
    // reject — the contract under fuzz is totality, never an exception
    for (pos <- 2 until ok.length; bit <- Seq(0x01, 0x80)) {
      val bad = ok.clone()
      bad(pos) = (bad(pos) ^ bit).toByte
      decode(bad) // must not throw
    }
  }

  test("unsupported surface rejects: lossless, arithmetic, 4-component, 12-bit, stray SOI") {
    val ok = encodeFlatGray(16, 16, (_, _) => 99)
    val sofAt = (0 until ok.length - 1).find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    def mut(off: Int, v: Int): Array[Byte] = {
      val b = ok.clone(); b(off) = v.toByte; b
    }
    // 0xc2 (progressive) is no longer a reject — but THIS stream is
    // baseline data whose SOS declares Se=63 for a "DC" band, which the
    // progressive validator must still refuse
    assert(decode(mut(sofAt + 1, 0xc2)).isEmpty)
    assert(decode(mut(sofAt + 1, 0xc3)).isEmpty) // lossless
    assert(decode(mut(sofAt + 1, 0xc9)).isEmpty) // arithmetic
    assert(decode(mut(sofAt + 4, 12)).isEmpty) // 12-bit precision
    assert(decode(mut(sofAt + 9, 4)).isEmpty) // nf=4 (CMYK shape)
    assert(decode(mut(sofAt + 1, 0xd8)).isEmpty) // SOI mid-stream
    assert(decode(Array[Byte]()).isEmpty)
    assert(decode(null).isEmpty)
    assert(decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  test("property: 30 random flat configs round-trip exactly and match the JDK") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 30) {
      val w = rnd.nextInt(40) + 1
      val h = rnd.nextInt(30) + 1
      val base = rnd.nextInt(256)
      val dx = rnd.nextInt(64)
      val dy = rnd.nextInt(64)
      val rst = rnd.nextInt(3) // 0 = none
      val bytes = encodeFlatGray(w, h,
        (bx, by) => (base + dx * bx + dy * by) % 256, restartInterval = rst)
      val img = decode(bytes).getOrElse(fail(s"trial $trial $w x $h rst=$rst"))
      val jdk = decodeImageIO(bytes)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = (base + dx * (x / 8) + dy * (y / 8)) % 256
        assert((img.data(y * w + x) & 0xff) == expect, s"t$trial ours ($x,$y)")
        assert(jdk.getRaster.getSample(x, y, 0) == expect, s"t$trial jdk ($x,$y)")
      }
    }
  }

  test("progressive flat fixtures decode bit-exactly and agree with the JDK decoder") {
    for ((w, h) <- Seq((8, 8), (1, 1), (7, 5), (17, 15), (64, 48), (100, 1))) {
      val bytes = encodeFlatGrayProgressive(w, h,
        (bx, by) => (11 * bx + 29 * by + 40) % 256)
      val img = decode(bytes).getOrElse(fail(s"$w x $h: no progressive decode"))
      assert(img.width == w && img.height == h && img.channels == 1)
      val jdk = decodeImageIO(bytes)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = (11 * (x / 8) + 29 * (y / 8) + 40) % 256
        assert((img.data(y * w + x) & 0xff) == expect, s"ours ($x,$y) $w x $h")
        assert(jdk.getRaster.getSample(x, y, 0) == expect, s"jdk ($x,$y) $w x $h")
      }
    }
  }

  test("progressive equals sequential on identical flat content") {
    val f = (bx: Int, by: Int) => (53 * bx + 17 * by + 3) % 256
    val seq = decode(encodeFlatGray(33, 25, f)).get
    val prog = decode(encodeFlatGrayProgressive(33, 25, f)).get
    assert(seq.width == prog.width && seq.height == prog.height)
    assert(java.util.Arrays.equals(seq.data, prog.data))
  }

  test("JDK progressive-encoded natural gray decodes within ±2 of the JDK decoder") {
    // the real thing: multi-scan spectral selection + successive
    // approximation with NONZERO AC coefficients — exercises AC-first
    // placement, AC-refine correction bits, and cross-scan EOB runs
    val w = 120; val h = 80
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0,
        (128 + 90 * math.sin(x / 7.0) * math.cos(y / 5.0) +
          (if ((x / 16 + y / 16) % 2 == 0) 30 else -30)).toInt.max(0).min(255))
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(src, null, null), p)
    ios.close(); wr.dispose()
    val bytes = bos.toByteArray
    // confirm the writer actually emitted SOF2
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
      "JDK writer did not produce a progressive stream")
    val ours = decode(bytes).getOrElse(fail("no decode of JDK progressive stream"))
    val jdk = decodeImageIO(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 1)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs((ours.data(y * w + x) & 0xff) - jdk.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"max per-sample diff $maxDiff")
  }

  test("JDK progressive-encoded natural COLOR decodes within ±2 luma of the JDK decoder") {
    // color progressive: interleaved DC scan + per-component AC scans.
    // Chroma is flat (gray content in RGB) so the upsample filter
    // difference vanishes and a tight cross-decoder bound holds.
    val w = 48; val h = 32
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (128 + 80 * math.sin((x + 2 * y) / 6.0)).toInt.max(0).min(255)
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(src, null, null), p)
    ios.close(); wr.dispose()
    val bytes = bos.toByteArray
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2))
    val ours = decode(bytes).getOrElse(fail("no decode of JDK progressive color"))
    val jdk = decodeImageIO(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val g = (jdk.getRGB(x, y) >> 8) & 0xff
      maxDiff = math.max(maxDiff,
        math.abs((ours.data((y * w + x) * 3 + 1) & 0xff) - g))
    }
    assert(maxDiff <= 2, s"max green-channel diff $maxDiff")
  }

  test("progressive truncation rejects; bit flips never throw") {
    val ok = encodeFlatGrayProgressive(40, 24, (bx, by) => (bx * 37 + by * 73) % 256)
    assert(decode(ok).isDefined)
    for (cut <- 0 until ok.length by 7)
      assert(decode(java.util.Arrays.copyOf(ok, cut)).isEmpty, s"cut=$cut")
    for (pos <- 2 until ok.length; bit <- Seq(0x01, 0x80)) {
      val bad = ok.clone()
      bad(pos) = (bad(pos) ^ bit).toByte
      decode(bad) // totality: may decode differently or reject, never throw
    }
  }

  test("oversized frame rejects before any allocation") {
    // hand-build SOI + SOF0 declaring 65535×65535×3 (> MaxPixels)
    val b = new scala.collection.mutable.ArrayBuffer[Byte]()
    b += 0xff.toByte; b += 0xd8.toByte
    b += 0xff.toByte; b += 0xc0.toByte
    b ++= Array[Byte](0, 17, 8, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    b += 0xff.toByte; b += 0xd9.toByte
    assert(decode(b.toArray).isEmpty)
  }
}
