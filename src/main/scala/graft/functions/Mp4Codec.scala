package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Dependency-free MP4 / ISO-BMFF (ISO/IEC 14496-12) BOX-WALK parser
  * and writer — the dominant video container of a web crawl (the
  * AVI/RIFF walk of [[AviCodec]] covers the legacy case, Matroska the
  * open one). No sample decode: a video file's pipeline-relevant
  * facts (duration, track count, codec fourccs, dimensions, audio
  * rate/channels, exact sample counts) all live in the `moov` box
  * tree, so the walk is O(metadata-bytes) regardless of media size —
  * the property that makes it a scan-stage operator at 100 TB.
  *
  * Surface: the box grammar (`[size:u32][type:4cc]`, size==1 →
  * 64-bit largesize, size==0 → to-EOF), `ftyp`, `moov` > `mvhd`
  * (versions 0 AND 1), `trak` > `tkhd` (v0/v1), `mdia` > `mdhd`
  * (v0/v1) / `hdlr` / `minf` > `stbl` > `stsd` (visual and audio
  * sample-entry layouts) + `stts`/`stsz`; unknown boxes are skipped
  * by declared size (the forward-compat rule the format was designed
  * around). Totality contract as the image codecs: malformed input →
  * None, never a throw, never wrong numbers; every size is
  * bounds-checked against its parent extent, so a lying box cannot
  * walk out of its container.
  *
  * Scale shape: runs inside the same `mapPartitions` decode stage as
  * every codec ([[graft.ext.Multimodal]]) — scan-stage, no shuffle.
  */
object Mp4Codec {

  /** One track's metadata. `nSamples` is exact (stsz sample_count);
    * duration ships as the (mediaDuration, mediaTimescale) integer
    * pair per the NUMERICS numerator/denominator rule.
    */
  final case class TrackMeta(trackId: Long, handler: String,
      codec: String, width: Int, height: Int, channels: Int,
      sampleRate: Int, nSamples: Long, mediaTimescale: Long,
      mediaDuration: Long)

  final case class Mp4Meta(majorBrand: String, timescale: Long,
      duration: Long, tracks: Vector[TrackMeta])

  // ── reads (big-endian throughout — the ISO-BMFF byte order) ──────

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, StandardCharsets.ISO_8859_1)

  /** Walk the boxes in `[from, until)`, invoking `f(type, payloadFrom,
    * payloadUntil)` per box. Returns false (abort) on any structural
    * lie: header past extent, declared size overrunning the parent,
    * or a non-monotonic size.
    */
  private def walk(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var pos = from
    while (pos < until) {
      if (pos + 8 > until) return false
      val size32 = u32(b, pos)
      val typ = fourcc(b, pos + 4)
      var header = 8
      val size: Long =
        if (size32 == 1L) {
          if (pos + 16 > until) return false
          header = 16
          u64(b, pos + 8)
        } else if (size32 == 0L) (until - pos).toLong
        else size32
      if (size < header || pos + size > until) return false
      if (!f(typ, pos + header, pos + size.toInt)) return false
      pos += size.toInt
    }
    true
  }

  /** Full-box (version, flags) preamble; returns version or -1. */
  private def fullBoxVersion(b: Array[Byte], from: Int, until: Int): Int =
    if (from + 4 > until) -1 else b(from) & 0xff

  // ── decode ───────────────────────────────────────────────────────

  def meta(payload: Array[Byte]): Option[Mp4Meta] = {
    if (payload == null || payload.length < 16) return None
    var majorBrand: String = null
    var timescale = 0L
    var duration = -1L
    val tracks = Vector.newBuilder[TrackMeta]
    var sawMoov = false
    val ok = walk(payload, 0, payload.length) { (typ, from, until) =>
      typ match {
        case "ftyp" =>
          if (until - from < 8) false
          else { majorBrand = fourcc(payload, from); true }
        case "moov" =>
          sawMoov = true
          walk(payload, from, until) { (t2, f2, u2) =>
            t2 match {
              case "mvhd" =>
                fullBoxVersion(payload, f2, u2) match {
                  case 0 if u2 - f2 >= 4 + 16 =>
                    timescale = u32(payload, f2 + 12)
                    duration = u32(payload, f2 + 16); true
                  case 1 if u2 - f2 >= 4 + 28 =>
                    timescale = u32(payload, f2 + 20)
                    duration = u64(payload, f2 + 24); true
                  case _ => false
                }
              case "trak" =>
                parseTrak(payload, f2, u2) match {
                  case Some(t) => tracks += t; true
                  case None => false
                }
              case _ => true // udta, meta, iods … skip by size
            }
          }
        case _ => true // mdat, free, skip, uuid … skip by size
      }
    }
    if (!ok || majorBrand == null || !sawMoov || timescale <= 0 ||
      duration < 0) None
    else Some(Mp4Meta(majorBrand, timescale, duration, tracks.result()))
  }

  private def parseTrak(b: Array[Byte], from: Int, until: Int)
      : Option[TrackMeta] = {
    var trackId = -1L
    var handler: String = null
    var codec: String = null
    var width = 0
    var height = 0
    var channels = 0
    var sampleRate = 0
    var nSamples = -1L
    var mediaTimescale = 0L
    var mediaDuration = -1L
    val ok = walk(b, from, until) { (typ, f, u) =>
      typ match {
        case "tkhd" =>
          fullBoxVersion(b, f, u) match {
            case 0 if u - f >= 4 + 80 =>
              trackId = u32(b, f + 12)
              // width/height are 16.16 fixed at payload end
              width = u32(b, u - 8).toInt >>> 16
              height = u32(b, u - 4).toInt >>> 16
              true
            case 1 if u - f >= 4 + 92 =>
              trackId = u32(b, f + 20)
              width = u32(b, u - 8).toInt >>> 16
              height = u32(b, u - 4).toInt >>> 16
              true
            case _ => false
          }
        case "mdia" =>
          walk(b, f, u) { (t2, f2, u2) =>
            t2 match {
              case "mdhd" =>
                fullBoxVersion(b, f2, u2) match {
                  case 0 if u2 - f2 >= 4 + 16 =>
                    mediaTimescale = u32(b, f2 + 12)
                    mediaDuration = u32(b, f2 + 16); true
                  case 1 if u2 - f2 >= 4 + 28 =>
                    mediaTimescale = u32(b, f2 + 20)
                    mediaDuration = u64(b, f2 + 24); true
                  case _ => false
                }
              case "hdlr" =>
                if (u2 - f2 < 12) false
                else { handler = fourcc(b, f2 + 8); true }
              case "minf" =>
                walk(b, f2, u2) { (t3, f3, u3) =>
                  t3 match {
                    case "stbl" =>
                      walk(b, f3, u3) { (t4, f4, u4) =>
                        t4 match {
                          case "stsd" =>
                            // fullbox + entry_count, then first entry
                            if (u4 - f4 < 8 + 8) false
                            else {
                              val entryStart = f4 + 8
                              val esize = u32(b, entryStart)
                              if (esize < 16 ||
                                entryStart + esize > u4) false
                              else {
                                codec = fourcc(b, entryStart + 4)
                                // SampleEntry: 6 reserved + u16 dref idx
                                val body = entryStart + 16
                                if (handler == "vide" &&
                                  entryStart + 36 <= u4) {
                                  // VisualSampleEntry: 16 predefined/
                                  // reserved bytes then width/height
                                  width = u16(b, body + 16)
                                  height = u16(b, body + 18)
                                } else if (handler == "soun" &&
                                  entryStart + 36 <= u4) {
                                  // AudioSampleEntry: 8 reserved,
                                  // channelcount, samplesize,
                                  // 4 predefined, samplerate 16.16
                                  channels = u16(b, body + 8)
                                  sampleRate =
                                    u32(b, body + 16).toInt >>> 16
                                }
                                true
                              }
                            }
                          case "stsz" =>
                            if (u4 - f4 < 12) false
                            else { nSamples = u32(b, f4 + 8); true }
                          case _ => true // stts, stsc, stco …
                        }
                      }
                    case _ => true // vmhd, smhd, dinf …
                  }
                }
              case _ => true
            }
          }
        case _ => true // edts …
      }
    }
    if (!ok || trackId < 0 || handler == null || codec == null ||
      mediaTimescale <= 0 || mediaDuration < 0 || nSamples < 0) None
    else Some(TrackMeta(trackId, handler, codec, width, height,
      channels, sampleRate, nSamples, mediaTimescale, mediaDuration))
  }

  // ── encode ───────────────────────────────────────────────────────

  private def be32(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def be64(v: Long): Array[Byte] =
    be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def be16(v: Int): Array[Byte] =
    Array((v >>> 8).toByte, v.toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val total = 8 + payload.map(_.length).sum
    o.write(be32(total))
    o.write(typ.getBytes(StandardCharsets.ISO_8859_1))
    payload.foreach(o.write)
    o.toByteArray
  }

  /** A box written with the 64-bit largesize form (size field == 1),
    * regardless of actual size — exercises the decoder's largesize
    * arm on real data.
    */
  private def boxLarge(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val total = 16L + payload.map(_.length).sum
    o.write(be32(1))
    o.write(typ.getBytes(StandardCharsets.ISO_8859_1))
    o.write(be64(total))
    payload.foreach(o.write)
    o.toByteArray
  }

  private val UnityMatrix: Array[Byte] =
    (be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L))

  private def mvhd(v1: Boolean, timescale: Long, duration: Long,
      nextTrack: Long): Array[Byte] = {
    val times =
      if (v1) be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration)
      else be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration)
    box("mvhd",
      Array((if (v1) 1 else 0).toByte, 0, 0, 0), times,
      be32(0x00010000L), // rate 1.0
      be16(0x0100), be16(0), // volume, reserved
      be32(0), be32(0), UnityMatrix,
      Array.fill[Byte](24)(0), // pre_defined ×6
      be32(nextTrack))
  }

  private def tkhd(v1: Boolean, trackId: Long, duration: Long,
      width: Int, height: Int, audio: Boolean): Array[Byte] = {
    val times =
      if (v1) be64(0) ++ be64(0) ++ be32(trackId) ++ be32(0) ++ be64(duration)
      else be32(0) ++ be32(0) ++ be32(trackId) ++ be32(0) ++ be32(duration)
    box("tkhd",
      Array((if (v1) 1 else 0).toByte, 0, 0, 7), times,
      be32(0), be32(0), // reserved
      be16(0), be16(0), // layer, alternate_group
      be16(if (audio) 0x0100 else 0), be16(0), // volume, reserved
      UnityMatrix,
      be32(width.toLong << 16), be32(height.toLong << 16))
  }

  private def mdhd(v1: Boolean, timescale: Long, duration: Long)
      : Array[Byte] = {
    val times =
      if (v1) be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration)
      else be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration)
    box("mdhd",
      Array((if (v1) 1 else 0).toByte, 0, 0, 0), times,
      be16(0x55c4), be16(0)) // language 'und', pre_defined
  }

  private def hdlr(handlerType: String, name: String): Array[Byte] =
    box("hdlr", be32(0), be32(0),
      handlerType.getBytes(StandardCharsets.ISO_8859_1),
      Array.fill[Byte](12)(0),
      (name + " ").getBytes(StandardCharsets.UTF_8))

  private def visualEntry(codec: String, width: Int, height: Int)
      : Array[Byte] =
    box(codec,
      Array.fill[Byte](6)(0), be16(1), // reserved, data_ref_index
      be16(0), be16(0), // pre_defined, reserved
      Array.fill[Byte](12)(0), // pre_defined ×3
      be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L), // 72 dpi
      be32(0), be16(1), // reserved, frame_count
      Array.fill[Byte](32)(0), // compressorname
      be16(0x0018), be16(0xffff)) // depth, pre_defined -1

  private def audioEntry(codec: String, channels: Int, rate: Int)
      : Array[Byte] =
    box(codec,
      Array.fill[Byte](6)(0), be16(1), // reserved, data_ref_index
      be32(0), be32(0), // reserved ×2
      be16(channels), be16(16), // channelcount, samplesize
      be16(0), be16(0), // pre_defined, reserved
      be32(rate.toLong << 16)) // samplerate 16.16

  private def stbl(entry: Array[Byte], nSamples: Long,
      sampleDelta: Long): Array[Byte] = {
    val stsd = box("stsd", be32(0), be32(1), entry)
    val stts = box("stts", be32(0), be32(1), be32(nSamples),
      be32(sampleDelta))
    // uniform-size form (sample_size != 0 → no per-sample table)
    val stsz = box("stsz", be32(0), be32(256), be32(nSamples))
    val stsc = box("stsc", be32(0), be32(0))
    val stco = box("stco", be32(0), be32(0))
    box("stbl", stsd, stts, stsz, stsc, stco)
  }

  private def trak(v1: Boolean, trackId: Long, handlerType: String,
      entry: Array[Byte], mediaTimescale: Long, mediaDuration: Long,
      trakDuration: Long, width: Int, height: Int, nSamples: Long,
      sampleDelta: Long): Array[Byte] = {
    val header =
      if (handlerType == "vide") box("vmhd", be32(1), be64(0))
      else box("smhd", be32(0), be32(0))
    val dinf = box("dinf",
      box("dref", be32(0), be32(1),
        box("url ", Array[Byte](0, 0, 0, 1))))
    val minf = box("minf", header, dinf,
      stbl(entry, nSamples, sampleDelta))
    val mdia = box("mdia", mdhd(v1, mediaTimescale, mediaDuration),
      hdlr(handlerType, if (handlerType == "vide") "Video" else "Audio"),
      minf)
    box("trak",
      tkhd(v1, trackId, trakDuration, width, height,
        handlerType == "soun"), mdia)
  }

  final case class VideoSpec(codec: String, width: Int, height: Int,
      timescale: Long, sampleDelta: Long, nSamples: Long)

  final case class AudioSpec(codec: String, channels: Int, rate: Int,
      samplesPerFrame: Long, nFrames: Long)

  /** Encode a structurally-real MP4: ftyp + moov (mvhd + one trak per
    * spec) + a free box + mdat. `v1` selects the 64-bit (version 1)
    * header arm for mvhd/tkhd/mdhd; `largeMdat` writes mdat with the
    * size==1 largesize form.
    */
  def mp4Bytes(majorBrand: String, timescale: Long, duration: Long,
      video: Option[VideoSpec], audio: Option[AudioSpec],
      v1: Boolean = false, largeMdat: Boolean = false,
      mdatSize: Int = 32): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(box("ftyp",
      majorBrand.getBytes(StandardCharsets.ISO_8859_1), be32(0x200),
      "isomiso2".getBytes(StandardCharsets.ISO_8859_1)))
    val traks = Vector.newBuilder[Array[Byte]]
    var nextId = 1L
    video.foreach { v =>
      traks += trak(v1, nextId, "vide",
        visualEntry(v.codec, v.width, v.height), v.timescale,
        v.sampleDelta * v.nSamples, duration, v.width, v.height,
        v.nSamples, v.sampleDelta)
      nextId += 1
    }
    audio.foreach { a =>
      traks += trak(v1, nextId, "soun",
        audioEntry(a.codec, a.channels, a.rate),
        a.rate.toLong, a.samplesPerFrame * a.nFrames, duration,
        0, 0, a.nFrames, a.samplesPerFrame)
      nextId += 1
    }
    o.write(box("moov",
      (mvhd(v1, timescale, duration, nextId) +: traks.result()): _*))
    o.write(box("free", new Array[Byte](8)))
    val media = Array.tabulate[Byte](mdatSize)(i => (i * 31 + 7).toByte)
    o.write(if (largeMdat) boxLarge("mdat", media) else box("mdat", media))
    o.toByteArray
  }
}
