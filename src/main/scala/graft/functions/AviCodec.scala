package graft.functions

/** Dependency-free AVI (RIFF) MJPEG container codec — the VIDEO leg of
  * the multimodal surface, completing the real-decode set: images
  * ([[PngCodec]]/[[JpegCodec]]), audio ([[AudioHeaders]] PCM), and now
  * video as Motion-JPEG inside the classic AVI RIFF layout. MJPEG is
  * the honest dependency-free choice: each frame is a complete baseline
  * JPEG, so the per-frame decode reuses [[JpegCodec]] whole — no
  * inter-frame prediction state, which is also why real pipelines use
  * it as the bring-up format.
  *
  * Container walk (same RIFF discipline as the WAV side, nested one
  * level): `RIFF…'AVI '` → `LIST hdrl` → `avih` (frame timing, counts,
  * dims) + `LIST strl` → `strh` (stream type/handler) / `strf`
  * (BITMAPINFOHEADER) → `LIST movi` → `00dc`/`00db` frame chunks, each
  * a standalone JPEG, odd sizes padded per the RIFF word-alignment
  * rule (MJPEG frames routinely have odd lengths, so the pad path is
  * on the hot walk, not a corner). `idx1` and any unknown chunk are
  * skipped — the index is an optimization for seeking, not part of the
  * pixel contract.
  *
  * Supported surface, stated honestly: single video stream, fourcc
  * `MJPG` (case-insensitive per practice) or `00db` raw-DIB-tagged
  * MJPEG bodies; anything else — multiple streams, other codecs,
  * OpenDML extensions — returns None rather than wrong frames, the
  * same posture as the image codecs. Frame payloads decode lazily via
  * [[JpegCodec.decode]] so an undecodable single frame fails only that
  * frame's consumer, not the container parse.
  *
  * Scale posture: the walk is O(bytes) per row inside per-partition
  * batch stages ([[graft.ext.Multimodal]]); frame count and dims are
  * validated against [[PngCodec.MaxPixels]] before any consumer
  * allocates a raster, and a declared size that runs past the buffer
  * rejects the container (no partial-frame reads).
  *
  * Public sources: Microsoft AVI RIFF format documentation (avih /
  * strh / BITMAPINFOHEADER layouts, movi chunk tagging) and the RIFF
  * 1991 spec (word alignment). No code derived from any AVI library.
  */
object AviCodec {

  /** Parsed container: dims + timing from the headers, frame payloads
    * as raw (complete) JPEG byte chunks in stream order.
    */
  final case class AviVideo(
      width: Int,
      height: Int,
      usPerFrame: Int,
      frames: Vector[Array[Byte]])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Walk the chunks of one RIFF level in [from, to), calling `f(id,
    * listType, bodyFrom, bodyTo)` per chunk (`listType` is the LIST
    * form type or "" for plain chunks, with the body offsets excluding
    * it). Returns false on any structural violation: truncated header,
    * declared size past the level end.
    */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      f: (String, String, Int, Int) => Boolean): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      val bodyEnd = i.toLong + 8L + size
      if (bodyEnd > to) return false
      if (id == "LIST") {
        if (size < 4) return false
        if (!f(id, tag(b, i + 8), i + 12, bodyEnd.toInt)) return false
      } else {
        if (!f(id, "", i + 8, bodyEnd.toInt)) return false
      }
      i = (bodyEnd + (size & 1L)).toInt // RIFF word alignment
    }
    i >= to // a trailing partial chunk header is a truncation
  }

  /** Parse an MJPEG AVI; None on anything malformed or outside the
    * supported surface (never throws, never returns wrong frames).
    */
  def decode(payload: Array[Byte]): Option[AviVideo] = {
    if (payload == null || payload.length < 24) return None
    if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "AVI ") return None
    val riffEnd = math.min(payload.length.toLong, 8L + le32(payload, 4)).toInt

    var width = -1
    var height = -1
    var usPerFrame = -1
    var declaredFrames = -1L
    var streams = -1L
    var handlerOk = false
    val frames = Vector.newBuilder[Array[Byte]]

    val ok = walk(payload, 12, riffEnd) { (id, listType, from, to) =>
      if (id == "LIST" && listType == "hdrl") {
        walk(payload, from, to) { (hid, hlist, hfrom, hto) =>
          if (hid == "avih") {
            if (hto - hfrom < 40) false
            else {
              usPerFrame = le32(payload, hfrom).toInt
              declaredFrames = le32(payload, hfrom + 16)
              streams = le32(payload, hfrom + 24)
              width = le32(payload, hfrom + 32).toInt
              height = le32(payload, hfrom + 36).toInt
              true
            }
          } else if (hid == "LIST" && hlist == "strl") {
            walk(payload, hfrom, hto) { (sid, _, sfrom, sto) =>
              if (sid == "strh") {
                if (sto - sfrom < 8) false
                else {
                  val fccType = tag(payload, sfrom)
                  val fccHandler = tag(payload, sfrom + 4)
                  if (fccType == "vids" &&
                    fccHandler.equalsIgnoreCase("MJPG")) handlerOk = true
                  true // non-vids streams rejected via the streams count
                }
              } else true // strf/strn: dims already owned by avih
            }
          } else true // odml/junk inside hdrl: skip
        }
      } else if (id == "LIST" && listType == "movi") {
        walk(payload, from, to) { (mid, _, mfrom, mto) =>
          if (mid.length == 4 && mid.substring(2) == "dc" ||
            mid.length == 4 && mid.substring(2) == "db") {
            if (mid.substring(0, 2) != "00") false // single-stream surface
            else {
              frames += java.util.Arrays.copyOfRange(payload, mfrom, mto)
              true
            }
          } else true // rec lists / idx1 prewrites: skip
        }
      } else true // idx1 / JUNK: skip
    }

    if (!ok || !handlerOk || width <= 0 || height <= 0 ||
      usPerFrame <= 0 || streams != 1) return None
    if (width.toLong * height * 3 > PngCodec.MaxPixels) return None
    val fs = frames.result()
    if (fs.isEmpty || declaredFrames != fs.length) return None
    Some(AviVideo(width, height, usPerFrame, fs))
  }

  /** Build a single-stream MJPEG AVI from complete JPEG frame payloads
    * (the encoder side of the contract — REAL layout: avih/strh/strf
    * headers, movi `00dc` chunks, word-aligned). Frames must share the
    * container dims; [[decode]]∘[[aviBytes]] = identity on the frame
    * bytes, which is what the q85 oracle leans on.
    */
  def aviBytes(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && frames.nonEmpty)
    val moviBody = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val out = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = out.put(s.getBytes("US-ASCII"))

    fourcc("RIFF"); out.putInt(riffBody); fourcc("AVI ")

    fourcc("LIST"); out.putInt(hdrlBody); fourcc("hdrl")
    fourcc("avih"); out.putInt(56)
    out.putInt(usPerFrame)
    out.putInt(0) // max bytes/sec: advisory
    out.putInt(0) // padding granularity
    out.putInt(0) // flags
    out.putInt(frames.length)
    out.putInt(0) // initial frames
    out.putInt(1) // streams
    out.putInt(0) // suggested buffer
    out.putInt(width)
    out.putInt(height)
    (0 until 4).foreach(_ => out.putInt(0)) // reserved

    fourcc("LIST"); out.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); out.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    out.putInt(0) // flags
    out.putShort(0); out.putShort(0) // priority, language
    out.putInt(0) // initial frames
    out.putInt(usPerFrame) // scale
    out.putInt(1000000) // rate → fps = rate/scale
    out.putInt(0) // start
    out.putInt(frames.length) // length in frames
    out.putInt(0) // suggested buffer
    out.putInt(-1) // quality: default
    out.putInt(0) // sample size: varies per frame
    (0 until 4).foreach(_ => out.putShort(0)) // rcFrame

    fourcc("strf"); out.putInt(40) // BITMAPINFOHEADER
    out.putInt(40)
    out.putInt(width)
    out.putInt(height)
    out.putShort(1) // planes
    out.putShort(24) // bit count
    fourcc("MJPG") // biCompression
    out.putInt(width * height * 3) // biSizeImage (nominal)
    out.putInt(0); out.putInt(0) // ppm x/y
    out.putInt(0); out.putInt(0) // clr used/important

    fourcc("LIST"); out.putInt(moviBody); fourcc("movi")
    frames.foreach { f =>
      fourcc("00dc"); out.putInt(f.length); out.put(f)
      if ((f.length & 1) == 1) out.put(0.toByte) // word-align pad
    }
    out.array()
  }
}
