package graft.functions

import java.io.ByteArrayOutputStream

/** Dependency-free EBML / Matroska (WebM) element walk and writer —
  * the open-web video container (RFC 8794 EBML framing, Matroska
  * DocType), completing the container tier next to [[Mp4Codec]]
  * (ISO-BMFF) and [[AviCodec]] (RIFF). Like the MP4 walk, only the
  * metadata tree is touched: EBML header → Segment → Info
  * (TimestampScale, Duration) and Tracks (type, CodecID, video dims,
  * audio rate/channels); Cluster payloads are skipped by their
  * declared size, so cost is O(metadata) regardless of media size.
  *
  * Surface: EBML variable-length integers for both element IDs (kept
  * with their length marker, the RFC's "as written" convention) and
  * sizes (marker stripped), UNKNOWN-SIZE elements (all-ones VINT —
  * the live-streaming Segment shape, terminated by the parent's end
  * or an element not in the master's allowed set; here: end-of-input),
  * uint/float(4 and 8 byte)/string element bodies. Totality contract
  * as every codec: malformed input → None; sizes are bounds-checked
  * against the parent extent.
  */
object EbmlCodec {

  final case class MkvTrack(number: Long, trackType: Long,
      codecId: String, width: Long, height: Long, channels: Long,
      sampleRate: Double)

  final case class MkvMeta(docType: String, timestampScale: Long,
      durationTicks: Double, tracks: Vector[MkvTrack])

  // element IDs (as written, marker included)
  private val EBML = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackNumber = 0xD7L
  private val TrackType = 0x83L
  private val CodecID = 0x86L
  private val Video = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Audio = 0xE1L
  private val SamplingFrequency = 0xB5L
  private val Channels = 0x9FL

  /** Read a VINT at `off`. Returns (value, width) or null on overrun/
    * invalid. `keepMarker` = element-ID convention (RFC 8794 §5).
    */
  private def vint(b: Array[Byte], off: Int, until: Int,
      keepMarker: Boolean): (Long, Int) = {
    if (off >= until) return null
    val first = b(off) & 0xff
    if (first == 0) return null
    val width = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (width > 8 || off + width > until) return null
    var v = if (keepMarker) first.toLong
      else first.toLong & ((1 << (8 - width)) - 1)
    var i = 1
    while (i < width) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    (v, width)
  }

  /** True when a size VINT is the all-ones "unknown size" sentinel. */
  private def unknownSize(b: Array[Byte], off: Int, width: Int): Boolean = {
    val first = b(off) & 0xff
    val dataBits = first & ((1 << (8 - width)) - 1)
    if (dataBits != (1 << (8 - width)) - 1) return false
    var i = 1
    while (i < width) {
      if ((b(off + i) & 0xff) != 0xff) return false
      i += 1
    }
    true
  }

  private def uintAt(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], off: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(uintAt(b, off, 4).toInt).toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(b, off, 8))
    else Double.NaN

  /** Walk elements in `[from, until)`; `f(id, bodyFrom, bodyUntil,
    * unknown)` per element. Unknown-size elements extend to `until`
    * (the parent's end — the RFC's termination rule specialized to
    * the shapes we write, where an unknown-size element is last in
    * its parent). Returns false on malformed framing.
    */
  private def walk(b: Array[Byte], from: Int, until: Int)(
      f: (Long, Int, Int) => Boolean): Boolean = {
    var pos = from
    while (pos < until) {
      val id = vint(b, pos, until, keepMarker = true)
      if (id == null) return false
      val sizeOff = pos + id._2
      val size = vint(b, sizeOff, until, keepMarker = false)
      if (size == null) return false
      val bodyFrom = sizeOff + size._2
      val bodyUntil =
        if (unknownSize(b, sizeOff, size._2)) until
        else {
          val end = bodyFrom.toLong + size._1
          if (end > until) return false
          end.toInt
        }
      if (!f(id._1, bodyFrom, bodyUntil)) return false
      pos = bodyUntil
    }
    true
  }

  def meta(payload: Array[Byte]): Option[MkvMeta] = {
    if (payload == null || payload.length < 8) return None
    var docType: String = null
    var timestampScale = 1000000L // Matroska default
    var durationTicks = Double.NaN
    val tracks = Vector.newBuilder[MkvTrack]
    var sawSegment = false
    val ok = walk(payload, 0, payload.length) { (id, from, until) =>
      id match {
        case EBML =>
          walk(payload, from, until) { (id2, f2, u2) =>
            if (id2 == DocType)
              docType = new String(payload, f2, u2 - f2, "UTF-8")
            true
          }
        case Segment =>
          sawSegment = true
          walk(payload, from, until) { (id2, f2, u2) =>
            id2 match {
              case Info =>
                walk(payload, f2, u2) { (id3, f3, u3) =>
                  id3 match {
                    case TimestampScale =>
                      timestampScale = uintAt(payload, f3, u3 - f3)
                    case Duration =>
                      durationTicks = floatAt(payload, f3, u3 - f3)
                    case _ =>
                  }
                  true
                }
              case Tracks =>
                walk(payload, f2, u2) { (id3, f3, u3) =>
                  if (id3 == TrackEntry) {
                    var num = -1L; var typ = -1L; var codec: String = null
                    var w = 0L; var h = 0L; var ch = 0L
                    var sr = 0.0
                    val ok3 = walk(payload, f3, u3) { (id4, f4, u4) =>
                      id4 match {
                        case TrackNumber => num = uintAt(payload, f4, u4 - f4)
                        case TrackType => typ = uintAt(payload, f4, u4 - f4)
                        case CodecID =>
                          codec = new String(payload, f4, u4 - f4, "UTF-8")
                        case Video =>
                          if (!walk(payload, f4, u4) { (id5, f5, u5) =>
                            if (id5 == PixelWidth) w = uintAt(payload, f5, u5 - f5)
                            else if (id5 == PixelHeight) h = uintAt(payload, f5, u5 - f5)
                            true
                          }) return None
                        case Audio =>
                          if (!walk(payload, f4, u4) { (id5, f5, u5) =>
                            if (id5 == Channels) ch = uintAt(payload, f5, u5 - f5)
                            else if (id5 == SamplingFrequency)
                              sr = floatAt(payload, f5, u5 - f5)
                            true
                          }) return None
                        case _ =>
                      }
                      true
                    }
                    if (!ok3 || num < 0 || typ < 0 || codec == null)
                      return None
                    tracks += MkvTrack(num, typ, codec, w, h, ch, sr)
                  }
                  true
                }
              case _ => true // Cluster, SeekHead, Cues … skip by size
            }
          }
        case _ => true
      }
    }
    if (!ok || docType == null || !sawSegment) None
    else Some(MkvMeta(docType, timestampScale, durationTicks,
      tracks.result()))
  }

  // ── write ────────────────────────────────────────────────────────

  private def idBytes(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    Array.tabulate[Byte](n)(i => (id >>> (8 * (n - 1 - i))).toByte)
  }

  private def sizeBytes(size: Long): Array[Byte] = {
    // smallest width whose data bits can hold `size` (not all-ones)
    var width = 1
    while (width <= 8 && (size >= (1L << (7 * width)) - 1)) width += 1
    val marked = size | (1L << (7 * width))
    Array.tabulate[Byte](width)(i =>
      (marked >>> (8 * (width - 1 - i))).toByte)
  }

  private def el(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ sizeBytes(body.length.toLong) ++ body

  /** An element written with the unknown-size sentinel. */
  private def elUnknown(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ Array(0xff.toByte) ++ body

  private def uintBody(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    Array.tabulate[Byte](n)(i => (v >>> (8 * (n - 1 - i))).toByte)
  }

  private def floatBody(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    Array.tabulate[Byte](8)(i => (bits >>> (8 * (7 - i))).toByte)
  }

  final case class VideoTrackSpec(codecId: String, width: Long, height: Long)
  final case class AudioTrackSpec(codecId: String, channels: Long,
      sampleRate: Double)

  /** Encode a structurally-real Matroska/WebM metadata tree. When
    * `unknownSegment`, the Segment is written with the all-ones size
    * (the live-stream shape) and must be the last top-level element.
    */
  def mkvBytes(docType: String, timestampScale: Long,
      durationTicks: Double, video: Option[VideoTrackSpec],
      audio: Option[AudioTrackSpec],
      unknownSegment: Boolean = false): Array[Byte] = {
    val header = el(EBML,
      el(0x4286L, uintBody(1)) ++ // EBMLVersion
        el(0x42F7L, uintBody(1)) ++ // EBMLReadVersion
        el(0x42F2L, uintBody(4)) ++ // EBMLMaxIDLength
        el(0x42F3L, uintBody(8)) ++ // EBMLMaxSizeLength
        el(DocType, docType.getBytes("UTF-8")) ++
        el(0x4287L, uintBody(4)) ++ // DocTypeVersion
        el(0x4285L, uintBody(2))) // DocTypeReadVersion
    val info = el(Info,
      el(TimestampScale, uintBody(timestampScale)) ++
        el(Duration, floatBody(durationTicks)) ++
        el(0x4D80L, "graft".getBytes("UTF-8")) ++ // MuxingApp
        el(0x5741L, "graft".getBytes("UTF-8"))) // WritingApp
    val entries = Vector.newBuilder[Array[Byte]]
    var n = 1L
    video.foreach { v =>
      entries += el(TrackEntry,
        el(TrackNumber, uintBody(n)) ++
          el(0x73C5L, uintBody(n)) ++ // TrackUID
          el(TrackType, uintBody(1)) ++
          el(CodecID, v.codecId.getBytes("UTF-8")) ++
          el(Video,
            el(PixelWidth, uintBody(v.width)) ++
              el(PixelHeight, uintBody(v.height))))
      n += 1
    }
    audio.foreach { a =>
      entries += el(TrackEntry,
        el(TrackNumber, uintBody(n)) ++
          el(0x73C5L, uintBody(n)) ++
          el(TrackType, uintBody(2)) ++
          el(CodecID, a.codecId.getBytes("UTF-8")) ++
          el(Audio,
            el(SamplingFrequency, floatBody(a.sampleRate)) ++
              el(Channels, uintBody(a.channels))))
      n += 1
    }
    val tracksEl = el(Tracks, entries.result().foldLeft(
      Array.emptyByteArray)(_ ++ _))
    val segBody = info ++ tracksEl
    val o = new ByteArrayOutputStream()
    o.write(header)
    o.write(if (unknownSegment) elUnknown(Segment, segBody)
    else el(Segment, segBody))
    o.toByteArray
  }
}
