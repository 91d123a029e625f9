package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** EXIF metadata read/write — the camera/orientation sidecar riding in
  * a JPEG's APP1 segment (an embedded TIFF IFD structure, both byte
  * orders) or a TIFF's own IFD0. A real image pipeline needs it before
  * any pixel work: orientation decides whether width/height are
  * swapped and how to rotate, capture metadata (make/model/time, ISO,
  * exposure, f-number) is dedup/provenance signal. Public sources:
  * EXIF 2.3 / TIFF 6.0 structure documents.
  *
  * Reader is total: malformed input → fields parsed so far (or an
  * empty meta), never a throw — the codec-tier contract. Rationals are
  * carried as exact (numerator, denominator) pairs per the NUMERICS.md
  * numerator/denominator discipline, never divided into doubles.
  */
object ExifCodec {

  final case class Rational(num: Long, den: Long)

  final case class ExifMeta(
      byteOrderLittle: Boolean,
      orientation: Option[Int],
      make: Option[String],
      model: Option[String],
      dateTime: Option[String],
      exifWidth: Option[Long],
      exifHeight: Option[Long],
      iso: Option[Int],
      exposure: Option[Rational],
      fNumber: Option[Rational])

  val Empty: ExifMeta = ExifMeta(byteOrderLittle = true, None, None, None,
    None, None, None, None, None, None)

  // tag ids (IFD0 + Exif sub-IFD)
  private val TOrientation = 0x0112
  private val TMake = 0x010f
  private val TModel = 0x0110
  private val TDateTime = 0x0132
  private val TExifPtr = 0x8769
  private val TExposure = 0x829a
  private val TFNumber = 0x829d
  private val TIso = 0x8827
  private val TWidth = 0xa002
  private val THeight = 0xa003

  private final class Rd(b: Array[Byte], little: Boolean) {
    def ok(off: Int, n: Int): Boolean = off >= 0 && off + n <= b.length
    def u16(off: Int): Int =
      if (little) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def u32(off: Int): Long =
      if (little)
        (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      else
        ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  }

  /** Parse a TIFF-structured blob (EXIF body or whole TIFF file). */
  def fromTiff(b: Array[Byte]): ExifMeta = {
    try {
      if (b.length < 8) return Empty
      val little = b(0) == 'I' && b(1) == 'I'
      val big = b(0) == 'M' && b(1) == 'M'
      if (!little && !big) return Empty
      val r = new Rd(b, little)
      if (r.u16(2) != 42) return Empty
      var meta = Empty.copy(byteOrderLittle = little)

      def str(off: Int, count: Int): Option[String] =
        if (!r.ok(off, count)) None
        else Some(new String(b, off, count, US_ASCII).takeWhile(_ != '\u0000'))

      def walk(ifdOff: Long, isExifIfd: Boolean): Unit = {
        val o = ifdOff.toInt
        if (!r.ok(o, 2)) return
        val n = r.u16(o)
        var i = 0
        while (i < n) {
          val e = o + 2 + i * 12
          if (!r.ok(e, 12)) return
          val tag = r.u16(e)
          val typ = r.u16(e + 2)
          val count = r.u32(e + 4)
          // inline when total size <= 4, else the value field is an offset
          val tsize = typ match {
            case 1 | 2 | 6 | 7 => 1L
            case 3 | 8 => 2L
            case 4 | 9 | 11 => 4L
            case 5 | 10 | 12 => 8L
            case _ => 0L
          }
          val total = tsize * count
          val valOff = if (total <= 4) e + 8 else r.u32(e + 8).toInt
          def short0: Option[Int] =
            if (typ == 3 && r.ok(valOff, 2)) Some(r.u16(valOff)) else None
          def long0: Option[Long] =
            if (typ == 4 && r.ok(valOff, 4)) Some(r.u32(valOff))
            else short0.map(_.toLong)
          def rational0: Option[Rational] =
            if (typ == 5 && r.ok(valOff, 8))
              Some(Rational(r.u32(valOff), r.u32(valOff + 4)))
            else None
          tag match {
            case TOrientation if !isExifIfd => meta = meta.copy(orientation = short0)
            case TMake if !isExifIfd =>
              meta = meta.copy(make = str(valOff, count.toInt))
            case TModel if !isExifIfd =>
              meta = meta.copy(model = str(valOff, count.toInt))
            case TDateTime if !isExifIfd =>
              meta = meta.copy(dateTime = str(valOff, count.toInt))
            case TExifPtr if !isExifIfd && typ == 4 =>
              if (r.ok(valOff, 4)) walk(r.u32(valOff), isExifIfd = true)
            case TWidth if isExifIfd => meta = meta.copy(exifWidth = long0)
            case THeight if isExifIfd => meta = meta.copy(exifHeight = long0)
            case TIso if isExifIfd => meta = meta.copy(iso = short0)
            case TExposure if isExifIfd => meta = meta.copy(exposure = rational0)
            case TFNumber if isExifIfd => meta = meta.copy(fNumber = rational0)
            case _ =>
          }
          i += 1
        }
      }
      walk(r.u32(4), isExifIfd = false)
      meta
    } catch { case _: Exception => Empty }
  }

  /** Find the `Exif\0\0` APP1 segment in a JPEG's marker walk and
    * parse its TIFF body. None when the JPEG carries no EXIF.
    */
  def fromJpeg(b: Array[Byte]): Option[ExifMeta] = {
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var p = 2
      while (p + 4 <= b.length && (b(p) & 0xff) == 0xff) {
        val marker = b(p + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length) return None
        if (marker == 0xe1 && len >= 8 &&
            b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
            b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0) {
          val body = java.util.Arrays.copyOfRange(b, p + 10, p + 2 + len)
          return Some(fromTiff(body))
        }
        p += 2 + len
      }
      None
    } catch { case _: Exception => None }
  }

  // ── writer ─────────────────────────────────────────────────────────

  /** Serialize an EXIF TIFF blob (IFD0 + Exif sub-IFD) in either byte
    * order. Strings/rationals longer than 4 bytes go to the value
    * area with proper offsets, the TIFF rule the reader round-trips.
    */
  def tiffBytes(meta: ExifMeta): Array[Byte] = {
    val little = meta.byteOrderLittle
    final case class Entry(tag: Int, typ: Int, count: Int, inline: Option[Long],
        data: Option[Array[Byte]])
    def ascii(s: String): Array[Byte] = (s + "\u0000").getBytes(US_ASCII)
    def rat(x: Rational): Array[Byte] = {
      val out = new Array[Byte](8)
      writeU32(out, 0, x.num); writeU32(out, 4, x.den); out
    }
    def writeU32(a: Array[Byte], off: Int, v: Long): Unit = {
      if (little) { var i = 0; while (i < 4) { a(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 } }
      else { var i = 0; while (i < 4) { a(off + 3 - i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 } }
    }

    val ifd0 = Seq.newBuilder[Entry]
    meta.orientation.foreach(v => ifd0 += Entry(TOrientation, 3, 1, Some(v.toLong), None))
    meta.make.foreach(s => ifd0 += Entry(TMake, 2, s.length + 1, None, Some(ascii(s))))
    meta.model.foreach(s => ifd0 += Entry(TModel, 2, s.length + 1, None, Some(ascii(s))))
    meta.dateTime.foreach(s => ifd0 += Entry(TDateTime, 2, s.length + 1, None, Some(ascii(s))))
    val exif = Seq.newBuilder[Entry]
    meta.exposure.foreach(x => exif += Entry(TExposure, 5, 1, None, Some(rat(x))))
    meta.fNumber.foreach(x => exif += Entry(TFNumber, 5, 1, None, Some(rat(x))))
    meta.iso.foreach(v => exif += Entry(TIso, 3, 1, Some(v.toLong), None))
    meta.exifWidth.foreach(v => exif += Entry(TWidth, 4, 1, Some(v), None))
    meta.exifHeight.foreach(v => exif += Entry(THeight, 4, 1, Some(v), None))
    val exifEntries = exif.result().sortBy(_.tag)
    val hasExif = exifEntries.nonEmpty
    val ifd0All = (ifd0.result() ++ (if (hasExif)
      Seq(Entry(TExifPtr, 4, 1, Some(0L), None)) else Nil)).sortBy(_.tag)

    // layout: header(8) + ifd0 + exifIfd + value area
    val ifd0Size = 2 + ifd0All.length * 12 + 4
    val exifOff = 8 + ifd0Size
    val exifSize = if (hasExif) 2 + exifEntries.length * 12 + 4 else 0
    var dataOff = exifOff + exifSize
    val dataArea = new ByteArrayOutputStream()

    def serEntries(entries: Seq[Entry], at: Int): Array[Byte] = {
      val out = new Array[Byte]((entries.length * 12) + 6)
      if (little) { out(0) = (entries.length & 0xff).toByte; out(1) = ((entries.length >> 8) & 0xff).toByte }
      else { out(0) = ((entries.length >> 8) & 0xff).toByte; out(1) = (entries.length & 0xff).toByte }
      entries.zipWithIndex.foreach { case (e, i) =>
        val p = 2 + i * 12
        def u16(off: Int, v: Int): Unit =
          if (little) { out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte }
          else { out(off) = ((v >> 8) & 0xff).toByte; out(off + 1) = (v & 0xff).toByte }
        u16(p, e.tag); u16(p + 2, e.typ)
        writeU32(out, p + 4, e.count.toLong)
        e.data match {
          case Some(d) if d.length > 4 =>
            writeU32(out, p + 8, dataOff.toLong)
            dataArea.write(d); dataOff += d.length
          case Some(d) => // short payload inline, left-justified
            var i2 = 0
            while (i2 < 4) { out(p + 8 + i2) = if (i2 < d.length) d(i2) else 0; i2 += 1 }
          case None =>
            val v = if (e.tag == TExifPtr) exifOff.toLong else e.inline.getOrElse(0L)
            if (e.typ == 3) u16(p + 8, v.toInt) // SHORT inline: 2 bytes, rest 0
            else writeU32(out, p + 8, v)
        }
      }
      // next-IFD pointer = 0
      out
    }

    val ifd0Bytes = serEntries(ifd0All, 8)
    val exifBytes = if (hasExif) serEntries(exifEntries, exifOff) else Array.emptyByteArray

    val out = new ByteArrayOutputStream()
    if (little) { out.write('I'); out.write('I') } else { out.write('M'); out.write('M') }
    val magic = new Array[Byte](2); // 42
    if (little) { magic(0) = 42; magic(1) = 0 } else { magic(0) = 0; magic(1) = 42 }
    out.write(magic)
    val first = new Array[Byte](4); writeU32(first, 0, 8L); out.write(first)
    out.write(ifd0Bytes)
    out.write(exifBytes)
    out.write(dataArea.toByteArray)
    out.toByteArray
  }

  /** Insert `meta` as an `Exif\0\0` APP1 segment right after a JPEG's
    * SOI marker (any existing segments keep their order after it).
    */
  def withExif(jpeg: Array[Byte], meta: ExifMeta): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    val body = tiffBytes(meta)
    val seg = new ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = 2 + 6 + body.length
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write("Exif".getBytes(US_ASCII)); seg.write(0); seg.write(0)
    seg.write(body)
    val out = new ByteArrayOutputStream(jpeg.length + len + 2)
    out.write(jpeg, 0, 2)
    out.write(seg.toByteArray)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }
}
