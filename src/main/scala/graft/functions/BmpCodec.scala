package graft.functions

/** Windows BMP (DIB) codec — the fourth still-image format next to
  * [[PngCodec]]/[[JpegCodec]]/[[GifCodec]], covering the uncompressed
  * 24-bit BI_RGB surface a scraped corpus actually contains (screen
  * shots, export artifacts). Layout per the public BITMAPFILEHEADER /
  * BITMAPINFOHEADER spec: 14-byte file header (`BM`, file size, pixel
  * array offset), ≥ 40-byte info header (width, height, planes=1,
  * bpp, compression), pixel rows BGR-ordered, each row padded to a
  * 4-byte boundary, stored BOTTOM-UP when height is positive and
  * top-down when negative.
  *
  * Same decode contract as the other codecs: `None` on anything
  * malformed, truncated, or outside the supported surface (bpp ≠ 24,
  * compressed variants, absurd dimensions) — never throws, never
  * returns wrong pixels. Output is [[PngCodec.Image]] (row-major RGB)
  * so the [[graft.ext.Multimodal]] stats/hash/resize stages work
  * unchanged.
  */
object BmpCodec {

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Full pixel decode of a 24-bit BI_RGB bitmap. */
  def decode(payload: Array[Byte]): Option[PngCodec.Image] = {
    if (payload == null || payload.length < 54) return None
    if (payload(0) != 'B' || payload(1) != 'M') return None
    val dataOffset = le32(payload, 10)
    val infoSize = le32(payload, 14)
    if (infoSize < 40) return None // BITMAPCOREHEADER not supported
    val width = le32(payload, 18).toInt
    val rawHeight = le32(payload, 22).toInt
    val planes = le16(payload, 26)
    val bpp = le16(payload, 28)
    val compression = le32(payload, 30)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    if (width <= 0 || height <= 0 || planes != 1) return None
    if (bpp != 24 || compression != 0L) return None // BI_RGB 24-bit only
    if (width.toLong * height * 3 > PngCodec.MaxPixels) return None
    val rowBytes = (width * 3 + 3) / 4 * 4 // 4-byte row padding
    val need = dataOffset + rowBytes.toLong * height
    if (dataOffset < 54 || need > payload.length) return None
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val src = dataOffset.toInt + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        // BGR on disk → RGB in memory
        out(i) = payload(src + x * 3 + 2)
        out(i + 1) = payload(src + x * 3 + 1)
        out(i + 2) = payload(src + x * 3)
        x += 1
      }
      y += 1
    }
    Some(PngCodec.Image(width, height, 3, out))
  }

  /** Standards-compliant 24-bit BI_RGB encoder (bottom-up, padded
    * rows) for RGB [[PngCodec.Image]]s — the fixture leg that makes
    * the format hash-gateable, and a real writer for export paths.
    */
  def encode(img: PngCodec.Image): Array[Byte] = {
    require(img.channels == 3, s"BMP encoder is RGB-only, got ${img.channels}")
    val rowBytes = (img.width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * img.height
    val fileSize = 54 + dataSize
    val b = new Array[Byte](fileSize)
    def putLe16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLe32(off: Int, v: Long): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    putLe32(2, fileSize); putLe32(10, 54L)
    putLe32(14, 40L) // BITMAPINFOHEADER
    putLe32(18, img.width); putLe32(22, img.height) // bottom-up
    putLe16(26, 1); putLe16(28, 24)
    putLe32(30, 0L) // BI_RGB
    putLe32(34, dataSize)
    putLe32(38, 2835L); putLe32(42, 2835L) // 72 DPI
    var y = 0
    while (y < img.height) {
      val dst = 54 + (img.height - 1 - y) * rowBytes
      var x = 0
      while (x < img.width) {
        val i = (y * img.width + x) * 3
        b(dst + x * 3) = img.data(i + 2)     // B
        b(dst + x * 3 + 1) = img.data(i + 1) // G
        b(dst + x * 3 + 2) = img.data(i)     // R
        x += 1
      }
      y += 1
    }
    b
  }
}
