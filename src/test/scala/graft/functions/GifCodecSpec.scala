package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the GIF codec: encode∘decode identity (both interlace modes),
  * cross-check against the JDK's independent ImageIO GIF decoder,
  * LZW dictionary-growth and table-full paths, and totality on
  * corrupt input.
  */
class GifCodecSpec extends AnyFunSuite {

  private def viaImageIo(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) None
    else Some((img.getWidth, img.getHeight,
      img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)))
  }

  private def assertMatchesImageIo(payload: Array[Byte]): Unit = {
    val ours = GifCodec.decode(payload).get
    val (w, h, argb) = viaImageIo(payload).get
    assert((ours.width, ours.height) === ((w, h)))
    var i = 0
    while (i < w * h) {
      val r = (argb(i) >> 16) & 0xff
      val g = (argb(i) >> 8) & 0xff
      val b = argb(i) & 0xff
      assert((ours.data(3 * i) & 0xff) === r, s"R at pixel $i")
      assert((ours.data(3 * i + 1) & 0xff) === g, s"G at pixel $i")
      assert((ours.data(3 * i + 2) & 0xff) === b, s"B at pixel $i")
      i += 1
    }
  }

  test("encode -> decode identity on the synthetic fixture, and ImageIO agrees") {
    for (seed <- Seq(0L, 7L, 123L); interlaced <- Seq(false, true)) {
      val (w, h) = ((seed % 16 + 4).toInt, (seed % 12 + 4).toInt)
      val (pal, idx) = GifCodec.syntheticIndexed(seed, w, h)
      val payload = GifCodec.encode(w, h, pal, idx, interlaced)
      val img = GifCodec.decode(payload).get
      assert((img.width, img.height, img.channels) === ((w, h, 3)))
      for (y <- 0 until h; x <- 0 until w) {
        val c = ((seed + 3 * x + 7 * y) % 64).toInt
        val o = (y * w + x) * 3
        assert((img.data(o) & 0xff) === ((5 * c + seed) % 256).toInt,
          s"seed=$seed interlaced=$interlaced px($x,$y)")
      }
      // JDK ImageIO mis-deinterlaces h<=4 GIFs (empty pass 2 drops a
      // row and duplicates row 0 — verified h=4: [0,3,1,0]); the spec
      // order round-trips here and matches ImageIO at every h >= 5
      if (!interlaced || h >= 5) assertMatchesImageIo(payload)
    }
  }

  test("interlaced and sequential encodings of the same raster decode identically") {
    val (pal, idx) = GifCodec.syntheticIndexed(42L, 19, 13)
    val a = GifCodec.decode(GifCodec.encode(19, 13, pal, idx, interlaced = false)).get
    val b = GifCodec.decode(GifCodec.encode(19, 13, pal, idx, interlaced = true)).get
    assert(a.data.toSeq === b.data.toSeq)
  }

  test("LZW survives dictionary growth through all code widths and a table-full reset") {
    // a high-entropy 256-color raster large enough to fill the 4096-entry
    // table (forcing a mid-stream CLEAR) and climb every code width
    val w = 200; val h = 120
    val pal = new Array[Byte](256 * 3)
    var c = 0
    while (c < 256) {
      pal(3 * c) = c.toByte; pal(3 * c + 1) = (255 - c).toByte
      pal(3 * c + 2) = ((c * 31) % 256).toByte; c += 1
    }
    val idx = new Array[Byte](w * h)
    var i = 0
    var s = 12345L
    while (i < idx.length) {
      s = s * 6364136223846793005L + 1442695040888963407L // LCG
      idx(i) = (s >>> 56).toByte
      i += 1
    }
    val payload = GifCodec.encode(w, h, pal, idx)
    val img = GifCodec.decode(payload).get
    i = 0
    while (i < idx.length) {
      val c0 = idx(i) & 0xff
      assert((img.data(3 * i) & 0xff) === (pal(3 * c0) & 0xff))
      i += 1
    }
    assertMatchesImageIo(payload)
  }

  test("single-color and single-pixel images round-trip (KwKwK and tiny-stream edges)") {
    // all-same-index data produces the KwKwK code pattern immediately
    val pal = Array.tabulate[Byte](4 * 3)(i => (i * 17).toByte)
    val flat = GifCodec.encode(9, 7, pal, Array.fill[Byte](63)(2))
    val img = GifCodec.decode(flat).get
    assert(img.data.grouped(3).map(_.toSeq).toSet.size === 1)
    assertMatchesImageIo(flat)
    val one = GifCodec.encode(1, 1, pal, Array[Byte](3))
    assert(GifCodec.decode(one).get.data.toSeq ===
      Seq(pal(9), pal(10), pal(11)))
  }

  test("totality: wrong magic O(1)-rejects; truncations and bit flips never throw") {
    val (pal, idx) = GifCodec.syntheticIndexed(5L, 12, 9)
    val payload = GifCodec.encode(12, 9, pal, idx)
    assert(GifCodec.decode("not a gif at all".getBytes) === None)
    assert(GifCodec.decode(Array.empty[Byte]) === None)
    for (cut <- Seq(3, 10, 14, payload.length / 2, payload.length - 2))
      GifCodec.decode(payload.take(cut)) // must not throw
    for (flip <- 6 until math.min(payload.length, 60)) {
      val mutated = payload.clone()
      mutated(flip) = (mutated(flip) ^ 0x55).toByte
      GifCodec.decode(mutated) // any result, no throw
    }
  }
}
