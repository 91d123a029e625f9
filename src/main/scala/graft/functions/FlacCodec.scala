package graft.functions

import java.io.ByteArrayOutputStream
import java.security.MessageDigest

/** FLAC (Free Lossless Audio Codec) — the dominant lossless audio
  * encoding of archival/crawled corpora, closing the audio chain next
  * to WAV ([[AudioHeaders]]) and MP3 ([[Mp3Codec]]). Implemented from
  * the published xiph.org format specification; no codec source
  * consulted.
  *
  * DECODER (the corpus-facing leg) covers the general format: STREAMINFO
  * walk, frame sync + header (all block-size codes, the sample-rate
  * table + end-of-header forms, all four channel assignments including
  * left/side, right/side and mid/side reconstruction), subframe types
  * CONSTANT / VERBATIM / FIXED(0–4) / LPC(1–32) with wasted-bits
  * unary, partitioned Rice residuals in both methods (4- and 5-bit
  * parameters) with raw-bits escapes, CRC-8 header and CRC-16 frame
  * checks, and the STREAMINFO MD5 over the decoded PCM as the final
  * stream-integrity gate. Total: any malformed input → None.
  *
  * ENCODER emits a spec-valid subset used by the oracle gates and any
  * fixture need: fixed 4096-sample blocking, per-block subframe choice
  * (CONSTANT when flat, else best FIXED order 0–2 by absolute residual
  * sum, optionally an LPC encoding of the same predictor to put the
  * LPC read path under gates), optional stereo decorrelation
  * (left/side, right/side, mid/side), Rice parameter per partition
  * chosen by exact cost, configurable partition order, real MD5.
  */
object FlacCodec {

  final case class FlacMeta(
      minBlock: Int, maxBlock: Int,
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long)

  /** Decoded stream: interleaved samples (channel-major within each
    * frame position, i.e. `samples(i*channels + c)`).
    */
  final case class FlacAudio(meta: FlacMeta, samples: Array[Int])

  // ── CRCs (FLAC polynomials; init 0) ───────────────────────────────

  private val crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i; var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
    c
  }
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table(c ^ (b(i) & 0xff)); i += 1 }
    c
  }
  private val crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8; var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
    c
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc16Table(((c >> 8) ^ (b(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // ── MSB-first bit IO ──────────────────────────────────────────────

  private final class BW {
    private val out = new ByteArrayOutputStream()
    private var buf = 0L
    private var n = 0
    def put(v: Long, bits: Int): Unit = {
      var left = bits
      while (left > 0) {
        val take = math.min(left, 8 - n)
        val shift = left - take
        val piece = (v >>> shift) & ((1L << take) - 1)
        buf = (buf << take) | piece
        n += take
        left -= take
        if (n == 8) { out.write(buf.toInt & 0xff); buf = 0; n = 0 }
      }
    }
    def putSigned(v: Int, bits: Int): Unit = put(v.toLong & ((1L << bits) - 1), bits)
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def align(): Unit = if (n > 0) { buf <<= (8 - n); out.write(buf.toInt & 0xff); buf = 0; n = 0 }
    def toArray: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  private final class BR(b: Array[Byte], start: Int) {
    var pos: Int = start // byte position
    private var bit = 0  // bits consumed of current byte
    def eof: Boolean = pos >= b.length
    def bits(nBits: Int): Long = {
      var left = nBits
      var v = 0L
      while (left > 0) {
        if (pos >= b.length) throw new IllegalStateException("eof")
        val avail = 8 - bit
        val take = math.min(left, avail)
        val cur = b(pos) & 0xff
        val piece = (cur >>> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | piece
        bit += take
        left -= take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      v
    }
    def sbits(nBits: Int): Int = {
      val v = bits(nBits)
      val sign = 1L << (nBits - 1)
      (if ((v & sign) != 0) v - (sign << 1) else v).toInt
    }
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0) { q += 1; if (q > (1 << 24)) throw new IllegalStateException("unary") }
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def aligned: Boolean = bit == 0
  }

  // ── UTF-8-style coded number (frame/sample index, up to 36 bits) ──

  private def putUtf8(w: BW, v: Long): Unit = {
    if (v < 0x80) w.put(v, 8)
    else {
      // count payload bits → continuation byte count
      var cont = 1
      while (cont < 6 && v >= (1L << (6 * cont + (6 - cont)))) cont += 1
      // leading byte: cont+1 ones, a zero, then the top payload bits
      val leadPayloadBits = 6 - cont
      var lead = 0
      var i = 0
      while (i <= cont) { lead = (lead << 1) | 1; i += 1 }
      lead = lead << 1 // trailing zero marker
      w.put(lead.toLong, cont + 2)
      w.put((v >>> (6 * cont)) & ((1L << leadPayloadBits) - 1), leadPayloadBits)
      var k = cont - 1
      while (k >= 0) { w.put(0x2L, 2); w.put((v >>> (6 * k)) & 0x3f, 6); k -= 1 }
    }
  }

  private def readUtf8(r: BR): Long = {
    val first = r.bits(8).toInt
    if ((first & 0x80) == 0) first.toLong
    else {
      var cont = 0
      var mask = 0x40
      while ((first & mask) != 0) { cont += 1; mask >>= 1 }
      if (cont < 1 || cont > 6) throw new IllegalStateException("utf8")
      var v = (first & (mask - 1)).toLong
      var i = 0
      while (i < cont) {
        val c = r.bits(8).toInt
        if ((c & 0xc0) != 0x80) throw new IllegalStateException("utf8 cont")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  // ── STREAMINFO ────────────────────────────────────────────────────

  /** Parse STREAMINFO (and its md5) without touching frames. */
  def meta(bytes: Array[Byte]): Option[FlacMeta] =
    try metaWithOffsets(bytes).map(_._1) catch { case _: Throwable => None }

  private def metaWithOffsets(bytes: Array[Byte]): Option[(FlacMeta, Array[Byte], Int)] = {
    if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
      bytes(2) != 'a' || bytes(3) != 'C') return None
    var pos = 4
    var si: Option[(FlacMeta, Array[Byte])] = None
    var last = false
    while (!last) {
      if (pos + 4 > bytes.length) return None
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4
      if (pos + len > bytes.length) return None
      if (typ == 0 && len >= 34) {
        val r = new BR(bytes, pos)
        val minB = r.bits(16).toInt
        val maxB = r.bits(16).toInt
        r.bits(24); r.bits(24) // min/max frame size
        val rate = r.bits(20).toInt
        val ch = r.bits(3).toInt + 1
        val bps = r.bits(5).toInt + 1
        val total = r.bits(36)
        val md5 = java.util.Arrays.copyOfRange(bytes, pos + 18, pos + 34)
        si = Some((FlacMeta(minB, maxB, rate, ch, bps, total), md5))
      }
      pos += len
    }
    si.map { case (m, md5) => (m, md5, pos) }
  }

  // ── decoder ───────────────────────────────────────────────────────

  private val RateTable = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -2, -3, -4, 0)
  private val SizeTable = Array(-1, 8, 12, 0, 16, 20, 24, 32)

  /** Full decode: frames → PCM, with CRC-8/CRC-16 and stream-MD5
    * verification. None on any structural or integrity failure.
    */
  def decode(bytes: Array[Byte]): Option[FlacAudio] = try {
    metaWithOffsets(bytes) match {
      case None => None
      case Some((m, wantMd5, frameStart)) =>
        if (m.channels < 1 || m.channels > 8 || m.bitsPerSample < 4 ||
          m.bitsPerSample > 32 || m.totalSamples < 0) return None
        val nTotal = m.totalSamples
        if (nTotal > (1L << 28) / math.max(1, m.channels)) return None // bomb guard
        val out = new Array[Int]((nTotal * m.channels).toInt)
        var written = 0L
        val r = new BR(bytes, frameStart)
        while (written < nTotal) {
          val frameBase = r.pos
          // frame header
          if (r.bits(14) != 0x3ffe) return None
          r.bits(1) // reserved
          val variable = r.bits(1) == 1
          val bsCode = r.bits(4).toInt
          val srCode = r.bits(4).toInt
          val chanAsg = r.bits(4).toInt
          val szCode = r.bits(3).toInt
          if (r.bits(1) != 0) return None // reserved
          readUtf8(r) // frame (or sample) number — sequential by construction
          val blockSize = bsCode match {
            case 0 => return None
            case 1 => 192
            case c if c >= 2 && c <= 5 => 576 << (c - 2)
            case 6 => r.bits(8).toInt + 1
            case 7 => r.bits(16).toInt + 1
            case c => 256 << (c - 8)
          }
          srCode match {
            case 0 => ()
            case 12 => r.bits(8)
            case 13 | 14 => r.bits(16)
            case 15 => return None
            case _ => ()
          }
          val bps = if (szCode == 0) m.bitsPerSample
            else { val s = SizeTable(szCode); if (s <= 0) return None; s }
          // CRC-8 of the header (header is byte-aligned here)
          if (!r.aligned) return None
          val gotCrc8 = r.bits(8).toInt
          if (crc8(bytes, frameBase, r.pos - 1) != gotCrc8) return None

          val nCh = if (chanAsg < 8) chanAsg + 1
            else if (chanAsg <= 10) 2
            else return None
          if (nCh != m.channels) return None

          val chans = Array.ofDim[Array[Int]](nCh)
          var c = 0
          while (c < nCh) {
            val extra = chanAsg match {
              case 8 => if (c == 1) 1 else 0  // left/side
              case 9 => if (c == 0) 1 else 0  // right/side (side first)
              case 10 => if (c == 1) 1 else 0 // mid/side
              case _ => 0
            }
            chans(c) = decodeSubframe(r, blockSize, bps + extra)
            c += 1
          }
          // undo stereo decorrelation
          chanAsg match {
            case 8 => // left/side: right = left - side
              var i = 0; while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
            case 9 => // right/side: left = side + right
              val side = chans(0); val right = chans(1)
              val left = new Array[Int](blockSize)
              var i = 0; while (i < blockSize) { left(i) = side(i) + right(i); i += 1 }
              chans(0) = left
            case 10 => // mid/side
              var i = 0
              while (i < blockSize) {
                val side = chans(1)(i)
                var mid = chans(0)(i) << 1
                mid |= (side & 1)
                chans(0)(i) = (mid + side) >> 1
                chans(1)(i) = (mid - side) >> 1
                i += 1
              }
            case _ => ()
          }
          r.align()
          val gotCrc16 = r.bits(16).toInt
          if (crc16(bytes, frameBase, r.pos - 2) != gotCrc16) return None

          val take = math.min(blockSize.toLong, nTotal - written).toInt
          var i = 0
          while (i < take) {
            var cc = 0
            while (cc < nCh) {
              out(((written + i) * nCh).toInt + cc) = chans(cc)(i)
              cc += 1
            }
            i += 1
          }
          written += take
        }
        // stream MD5 (all-zero STREAMINFO md5 = unknown per spec: skip)
        if (wantMd5.exists(_ != 0)) {
          val got = pcmMd5(out, m.channels, m.bitsPerSample)
          if (!java.util.Arrays.equals(got, wantMd5)) return None
        }
        Some(FlacAudio(m, out))
    }
  } catch { case _: Throwable => None }

  private def decodeSubframe(r: BR, blockSize: Int, bps: Int): Array[Int] = {
    if (r.bits(1) != 0) throw new IllegalStateException("subframe pad")
    val typ = r.bits(6).toInt
    val wastedFlag = r.bits(1) == 1
    val wasted = if (wastedFlag) r.unary() + 1 else 0
    val ebps = bps - wasted
    val out = new Array[Int](blockSize)
    if (typ == 0) { // CONSTANT
      val v = r.sbits(ebps)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0; while (i < blockSize) { out(i) = r.sbits(ebps); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      var i = 0
      while (i < order) { out(i) = r.sbits(ebps); i += 1 }
      val res = decodeResidual(r, blockSize, order)
      i = order
      while (i < blockSize) {
        val p = order match {
          case 0 => 0
          case 1 => out(i - 1)
          case 2 => 2 * out(i - 1) - out(i - 2)
          case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
          case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) - out(i - 4)
        }
        out(i) = res(i - order) + p
        i += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC
      val order = (typ & 0x1f) + 1
      var i = 0
      while (i < order) { out(i) = r.sbits(ebps); i += 1 }
      val precision = r.bits(4).toInt + 1
      if (precision == 16) throw new IllegalStateException("bad qlp precision")
      val shift = r.sbits(5)
      if (shift < 0) throw new IllegalStateException("negative qlp shift")
      val coefs = Array.fill(order)(r.sbits(precision))
      val res = decodeResidual(r, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = res(i - order) + (acc >> shift).toInt
        i += 1
      }
    } else throw new IllegalStateException(s"reserved subframe type $typ")
    if (wasted > 0) { var i = 0; while (i < blockSize) { out(i) <<= wasted; i += 1 } }
    out
  }

  private def decodeResidual(r: BR, blockSize: Int, order: Int): Array[Int] = {
    val method = r.bits(2).toInt
    if (method > 1) throw new IllegalStateException("residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.bits(4).toInt
    val nPart = 1 << po
    if (blockSize % nPart != 0) throw new IllegalStateException("partition size")
    val out = new Array[Int](blockSize - order)
    var idx = 0
    var p = 0
    while (p < nPart) {
      val count = (blockSize >> po) - (if (p == 0) order else 0)
      if (count < 0) throw new IllegalStateException("partition count")
      val param = r.bits(pBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0 else r.sbits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val u = (q.toLong << param) | r.bits(param)
          // zigzag unfold
          out(idx) = (if ((u & 1) == 0) u >>> 1 else -((u >>> 1) + 1)).toInt
          idx += 1; i += 1
        }
      }
      p += 1
    }
    out
  }

  private def pcmMd5(samples: Array[Int], channels: Int, bps: Int): Array[Byte] = {
    val bytesPer = (bps + 7) / 8
    val md = MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](samples.length * bytesPer)
    var i = 0
    while (i < samples.length) {
      var v = samples(i)
      var b = 0
      while (b < bytesPer) { buf(i * bytesPer + b) = (v & 0xff).toByte; v >>= 8; b += 1 }
      i += 1
    }
    md.digest(buf)
  }

  // ── encoder ───────────────────────────────────────────────────────

  sealed trait StereoMode
  case object Independent extends StereoMode
  case object LeftSide extends StereoMode
  case object RightSide extends StereoMode
  case object MidSide extends StereoMode

  /** Encode interleaved PCM. `partitionOrder` > 0 splits residuals
    * into 2^po Rice partitions (full blocks only — short tail frames
    * fall back to one partition); `useLpc` re-expresses the chosen
    * fixed predictor as an explicit quantized-LPC subframe, putting
    * the LPC read path under the same bit-exact gates.
    */
  def encode(samples: Array[Int], channels: Int, sampleRate: Int,
      bps: Int = 16, blockSize: Int = 4096,
      stereo: StereoMode = Independent, useLpc: Boolean = false,
      partitionOrder: Int = 0): Array[Byte] = {
    require(channels >= 1 && channels <= 8)
    require(samples.length % channels == 0)
    val szCode = bps match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
      case _ => throw new IllegalArgumentException(s"bps $bps")
    }
    val nSamples = samples.length / channels
    val frames = new ByteArrayOutputStream()
    var minFrame = Int.MaxValue
    var maxFrame = 0
    var frameIdx = 0L
    var off = 0
    while (off < nSamples) {
      val bs = math.min(blockSize, nSamples - off)
      val chan = Array.tabulate(channels)(c =>
        Array.tabulate(bs)(i => samples((off + i) * channels + c)))
      val effStereo = if (channels == 2) stereo else Independent
      val (enc0, enc1, asg, extras) = effStereo match {
        case Independent => (chan(0), if (channels > 1) chan(1) else null, channels - 1, (0, 0))
        case LeftSide =>
          val side = Array.tabulate(bs)(i => chan(0)(i) - chan(1)(i))
          (chan(0), side, 8, (0, 1))
        case RightSide =>
          val side = Array.tabulate(bs)(i => chan(0)(i) - chan(1)(i))
          (side, chan(1), 9, (1, 0))
        case MidSide =>
          val mid = Array.tabulate(bs)(i => (chan(0)(i) + chan(1)(i)) >> 1)
          val side = Array.tabulate(bs)(i => chan(0)(i) - chan(1)(i))
          (mid, side, 10, (0, 1))
      }
      val w = new BW
      w.put(0x3ffe, 14); w.put(0, 1); w.put(0, 1) // sync, reserved, fixed strategy
      w.put(7, 4)        // block size at end of header, 16-bit
      w.put(0, 4)        // sample rate from STREAMINFO
      w.put(asg.toLong, 4)
      w.put(szCode.toLong, 3)
      w.put(0, 1)
      putUtf8(w, frameIdx)
      w.put((bs - 1).toLong, 16)
      val headBytes = w.toArray // header is byte-aligned here
      val w2 = new BW
      headBytes.foreach(b => w2.put(b & 0xffL, 8))
      w2.put(crc8(headBytes, 0, headBytes.length).toLong, 8)
      // subframes
      val po = if (bs == blockSize && partitionOrder > 0 &&
        blockSize % (1 << partitionOrder) == 0 &&
        (blockSize >> partitionOrder) > 4) partitionOrder else 0
      if (channels == 1) encodeSubframe(w2, enc0, bps, useLpc, po)
      else {
        encodeSubframe(w2, enc0, bps + extras._1, useLpc, po)
        encodeSubframe(w2, enc1, bps + extras._2, useLpc, po)
        var c = 2
        while (c < channels) { encodeSubframe(w2, chan(c), bps, useLpc, po); c += 1 }
      }
      w2.align()
      val frameBytes = w2.toArray
      val withCrc = new BW
      frameBytes.foreach(b => withCrc.put(b & 0xffL, 8))
      withCrc.put(crc16(frameBytes, 0, frameBytes.length).toLong, 16)
      val fb = withCrc.toArray
      frames.write(fb)
      minFrame = math.min(minFrame, fb.length)
      maxFrame = math.max(maxFrame, fb.length)
      frameIdx += 1
      off += bs
    }
    if (nSamples == 0) { minFrame = 0; maxFrame = 0 }

    // STREAMINFO
    val si = new BW
    si.put(blockSize.toLong, 16); si.put(blockSize.toLong, 16)
    si.put(minFrame.toLong & 0xffffff, 24); si.put(maxFrame.toLong & 0xffffff, 24)
    si.put(sampleRate.toLong, 20)
    si.put((channels - 1).toLong, 3)
    si.put((bps - 1).toLong, 5)
    si.put(nSamples.toLong, 36)
    val md5 = pcmMd5(samples, channels, bps)
    md5.foreach(b => si.put(b & 0xffL, 8))
    val siBytes = si.toArray

    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(0x80) // last block, type 0 (STREAMINFO)
    out.write(0); out.write(0); out.write(34)
    out.write(siBytes)
    out.write(frames.toByteArray)
    out.toByteArray
  }

  private def encodeSubframe(w: BW, x: Array[Int], bps: Int,
      useLpc: Boolean, po: Int): Unit = {
    val bs = x.length
    val constant = bs > 0 && x.forall(_ == x(0))
    if (constant) {
      w.put(0, 1); w.put(0, 6); w.put(0, 1)
      w.putSigned(x(0), bps)
      return
    }
    // pick fixed order 0..2 by absolute residual sum
    def residual(order: Int): Array[Int] = Array.tabulate(bs - order) { k =>
      val i = k + order
      order match {
        case 0 => x(i)
        case 1 => x(i) - x(i - 1)
        case _ => x(i) - 2 * x(i - 1) + x(i - 2)
      }
    }
    val maxOrder = math.min(2, bs - 1)
    var best = 0
    var bestSum = Long.MaxValue
    var o = 0
    while (o <= maxOrder) {
      val res = residual(o)
      var s = 0L; var i = 0
      while (i < res.length) { s += math.abs(res(i).toLong); i += 1 }
      if (s < bestSum) { bestSum = s; best = o }
      o += 1
    }
    val order = best
    val res = residual(order)
    if (useLpc && order >= 1) {
      // the fixed predictor as an explicit LPC: coefs {1} or {2,-1}, shift 0
      w.put(0, 1)
      w.put((0x20 | (order - 1)).toLong, 6)
      w.put(0, 1)
      var i = 0
      while (i < order) { w.putSigned(x(i), bps); i += 1 }
      w.put(3, 4)  // precision-1 = 3 → 4-bit coefficients
      w.putSigned(0, 5) // shift 0
      if (order == 1) w.putSigned(1, 4)
      else { w.putSigned(2, 4); w.putSigned(-1, 4) }
      writeResidual(w, res, bs, order, po)
    } else {
      w.put(0, 1)
      w.put((0x08 | order).toLong, 6)
      w.put(0, 1)
      var i = 0
      while (i < order) { w.putSigned(x(i), bps); i += 1 }
      writeResidual(w, res, bs, order, po)
    }
  }

  private def riceParam(res: Array[Int], from: Int, until: Int): Int = {
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var bits = 0L
      var i = from
      while (i < until) {
        val v = res(i)
        val u = (v.toLong << 1) ^ (v.toLong >> 63)
        bits += (u >>> k) + 1 + k
        i += 1
      }
      if (bits < bestBits) { bestBits = bits; bestK = k }
      k += 1
    }
    bestK
  }

  private def writeResidual(w: BW, res: Array[Int], bs: Int, order: Int, po: Int): Unit = {
    w.put(0, 2)  // method 0: 4-bit Rice parameters
    w.put(po.toLong, 4)
    val nPart = 1 << po
    var idx = 0
    var p = 0
    while (p < nPart) {
      val count = (bs >> po) - (if (p == 0) order else 0)
      val k = riceParam(res, idx, idx + count)
      w.put(k.toLong, 4)
      var i = 0
      while (i < count) {
        val v = res(idx)
        val u = (v.toLong << 1) ^ (v.toLong >> 63)
        w.putUnary((u >>> k).toInt)
        if (k > 0) w.put(u & ((1L << k) - 1), k)
        idx += 1; i += 1
      }
      p += 1
    }
  }
}
