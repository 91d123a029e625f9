package graft.functions

/** Dependency-free baseline JPEG PIXEL codec — closes the last declared
  * multimodal decode gap: where [[ImageHeaders.jpegDims]] stops at the
  * SOF marker, this decodes the entropy-coded data itself (ITU T.81
  * baseline/extended-sequential Huffman process): marker walk, DQT/DHT
  * table parse, per-MCU Huffman decode (DC diff + AC run-length, F.2.2),
  * dequantize + de-zigzag, 8×8 inverse DCT, replication chroma
  * upsample, and JFIF YCbCr→RGB.
  *
  * Supported surface, stated honestly: 8-bit Huffman sequential (SOF0/
  * SOF1) AND progressive (SOF2 — spectral selection + successive
  * approximation per T.81 Annex G: DC first/refine, AC first/refine
  * with EOB-run state, coefficients accumulated raw across scans and
  * IDCT'd once at EOI), 1- or 3-component, any sampling factors ≤ 4,
  * interleaved or per-component scans, restart markers, 8- and 16-bit
  * quant tables. Arithmetic coding, lossless, hierarchical, and
  * 4-component (Adobe CMYK) files decode to None rather than wrong
  * pixels — same posture as [[PngCodec]].
  *
  * Determinism contract (what the q84 oracle leans on): the IDCT runs
  * in double precision, so a DC-only block (flat 8×8 source) decodes to
  * EXACTLY its source value — F(0,0)=8·(v−128) survives quantization
  * when the DC quantum divides it, the only nonzero IDCT term is
  * F(0,0)/8, and the accumulated float error (≲1e-12) vanishes in the
  * round. The [[encodeFlat*]] fixtures exploit that: flat blocks with
  * DC quantum 8 round-trip bit-exactly through ANY conformant decoder
  * (spec-checked against the JDK's ImageIO as the independent
  * implementation), giving lossy-format plumbing a lossless oracle.
  *
  * Scale posture: decode is O(pixels) per row inside per-partition
  * batch stages ([[graft.ext.Multimodal]]); the raster allocation is
  * bounded by the CRC-free equivalent of the PNG bomb guard — frame
  * dimensions are validated against [[PngCodec.MaxPixels]] before any
  * plane is allocated, and truncated entropy data fails the row (None),
  * never the job.
  *
  * Public sources: ITU-T T.81 (the JPEG spec — marker syntax §B, F.2
  * decode flowcharts, K.3 typical Huffman tables), JFIF 1.02 (YCbCr
  * matrix). No code derived from any JPEG library.
  */
object JpegCodec {

  import PngCodec.Image

  /** Internal control-flow signal: any malformed/unsupported structure
    * lands here and surfaces as None. Stackless — fuzzed corpora hit
    * this on most rows and a stack trace per reject would dominate.
    */
  private val Fail: RuntimeException =
    new RuntimeException("jpeg reject") {
      override def fillInStackTrace(): Throwable = this
    }

  /** Zigzag index → natural (row-major, vertical-freq-major) position. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19,
    26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49,
    56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59, 52,
    45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ───────────────────────── Huffman ─────────────────────────

  /** Canonical Huffman table per T.81 C.2 / F.2.2.3: `bits(l)` = number
    * of codes of length l (1-indexed), `vals` = symbols in code order.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val maxcode = Array.fill(17)(-1)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l)
          k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.bit()
      var l = 1
      while (code > maxcode(l)) {
        l += 1
        if (l > 16) throw Fail
        code = (code << 1) | r.bit()
      }
      vals(valptr(l) + code - mincode(l))
    }
  }

  /** MSB-first bit reader over the entropy-coded segment, undoing 0xFF00
    * byte stuffing. A bare marker (0xFF non-zero) or EOF mid-read is
    * malformed at every point this reader is consulted — restart markers
    * are consumed byte-wise by the scan loop, never through here.
    */
  private final class BitReader(d: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= d.length) throw Fail
        val b = d(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= d.length) throw Fail
          if ((d(pos) & 0xff) != 0x00) throw Fail
          pos += 1
        }
        cur = b
        cnt = 8
      }
      cnt -= 1
      (cur >>> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Drop buffered bits (byte-align) — restart-marker boundary. */
    def align(): Unit = cnt = 0
  }

  /** T.81 F.2.2.1 EXTEND: map a received magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ───────────────────────── IDCT ─────────────────────────

  /** cosT(u·8+x) = C(u)/2 · cos((2x+1)uπ/16) — separable 1-D basis. */
  private val CosT: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val c = if (u == 0) math.sqrt(0.5) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = 0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16)
        x += 1
      }
      u += 1
    }
    t
  }

  /** 8×8 inverse DCT of dequantized natural-order coeffs; output is
    * level-shifted (+128), rounded, clamped samples in (y·8+x) order.
    */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosT(u * 8 + x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += CosT(vv * 8 + y) * tmp(vv * 8 + x); vv += 1 }
        val p = math.floor(s + 128.5).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // ───────────────────────── Decoder ─────────────────────────

  private final class Component(val id: Int, val h: Int, val v: Int,
      val tq: Int) {
    var plane: Array[Byte] = null // padded to whole MCUs
    var planeW: Int = 0
    var blocksW: Int = 0 // ceil(compW/8) — non-interleaved scan grid
    var blocksH: Int = 0
    // progressive only: raw (un-dequantized) coefficients for every
    // block of the PADDED grid, natural order within a block; scans
    // accumulate bits here and the IDCT runs once at EOI
    var coefs: Array[Int] = null
    var coefBlocksW: Int = 0 // padded grid width = mcusX·h
    var dcPred: Int = 0 // per-scan DC predictor (reset at scan/RST)
  }

  /** Full pixel decode; None on anything malformed OR outside the
    * supported surface (never throws, never returns wrong pixels).
    */
  def decode(payload: Array[Byte]): Option[Image] = {
    if (payload == null || payload.length < 4) return None
    if ((payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8)
      return None
    try Some(run(payload))
    catch { case _: Exception => None }
  }

  private def run(d: Array[Byte]): Image = {
    def u8(i: Int): Int = { if (i < 0 || i >= d.length) throw Fail; d(i) & 0xff }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var restartInterval = 0
    var width = 0
    var height = 0
    var comps: Array[Component] = null
    var hMax = 0
    var vMax = 0
    var mcusX = 0
    var mcusY = 0
    var progressive = false

    var pos = 2
    var eoi = false
    while (!eoi) {
      if (u8(pos) != 0xff) throw Fail
      pos += 1
      var m = u8(pos)
      pos += 1
      while (m == 0xff) { m = u8(pos); pos += 1 } // fill bytes

      if (m == 0xd9) { // EOI
        eoi = true
      } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        // TEM / stray RST: standalone, no length field
      } else if (m == 0xdb) { // DQT
        val end = pos + u16(pos)
        var p = pos + 2
        while (p < end) {
          val pq = u8(p) >> 4
          val tq = u8(p) & 0xf
          if (pq > 1 || tq > 3) throw Fail
          p += 1
          val tab = new Array[Int](64)
          var k = 0
          while (k < 64) {
            val v =
              if (pq == 1) { val x = u16(p); p += 2; x }
              else { val x = u8(p); p += 1; x }
            if (v == 0) throw Fail
            tab(ZigZag(k)) = v
            k += 1
          }
          qt(tq) = tab
        }
        if (p != end) throw Fail
        pos = end
      } else if (m == 0xc4) { // DHT
        val end = pos + u16(pos)
        var p = pos + 2
        while (p < end) {
          val tc = u8(p) >> 4
          val th = u8(p) & 0xf
          if (tc > 1 || th > 3) throw Fail
          val bits = new Array[Int](17)
          var total = 0
          var l = 1
          while (l <= 16) { bits(l) = u8(p + l); total += bits(l); l += 1 }
          if (total == 0 || total > 256) throw Fail
          val vals = new Array[Int](total)
          var i = 0
          while (i < total) { vals(i) = u8(p + 17 + i); i += 1 }
          val t = new HuffTable(bits, vals)
          if (tc == 0) dcT(th) = t else acT(th) = t
          p += 17 + total
        }
        if (p != end) throw Fail
        pos = end
      } else if (m == 0xdd) { // DRI
        if (u16(pos) != 4) throw Fail
        restartInterval = u16(pos + 2)
        pos += 4
      } else if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
        // SOF0/SOF1 Huffman sequential, SOF2 Huffman progressive
        if (comps != null) throw Fail // one frame per file
        progressive = m == 0xc2
        val end = pos + u16(pos)
        if (u8(pos + 2) != 8) throw Fail // precision
        height = u16(pos + 3)
        width = u16(pos + 5)
        val nf = u8(pos + 7)
        if (width == 0 || height == 0) throw Fail
        if (nf != 1 && nf != 3) throw Fail // gray or YCbCr; CMYK → None
        if (width.toLong * height * nf > PngCodec.MaxPixels) throw Fail
        comps = new Array[Component](nf)
        var i = 0
        var p = pos + 8
        while (i < nf) {
          val id = u8(p)
          val h = u8(p + 1) >> 4
          val v = u8(p + 1) & 0xf
          val tq = u8(p + 2)
          if (h < 1 || h > 4 || v < 1 || v > 4 || tq > 3) throw Fail
          comps(i) = new Component(id, h, v, tq)
          p += 3
          i += 1
        }
        if (p != end) throw Fail
        hMax = comps.map(_.h).max
        vMax = comps.map(_.v).max
        mcusX = (width + 8 * hMax - 1) / (8 * hMax)
        mcusY = (height + 8 * vMax - 1) / (8 * vMax)
        comps.foreach { c =>
          c.planeW = mcusX * c.h * 8
          val planeH = mcusY * c.v * 8
          if (c.planeW.toLong * planeH > 4 * PngCodec.MaxPixels) throw Fail
          c.plane = new Array[Byte](c.planeW * planeH)
          c.blocksW = ((width * c.h + hMax - 1) / hMax + 7) / 8
          c.blocksH = ((height * c.v + vMax - 1) / vMax + 7) / 8
          if (progressive) {
            // coefficient store = 64 ints per padded-grid block (4 B per
            // sample-equivalent — same order of memory as the plane ×4);
            // the plane guard above already bounds padded pixels
            c.coefBlocksW = mcusX * c.h
            c.coefs = new Array[Int](c.planeW * planeH)
          }
        }
        pos = end
      } else if ((m >= 0xc3 && m <= 0xcf) && m != 0xc4 && m != 0xc8 &&
          m != 0xcc) {
        throw Fail // lossless/arithmetic/hierarchical
      } else if (m == 0xda) { // SOS
        if (comps == null) throw Fail
        val ns = u8(pos + 2)
        if (ns < 1 || ns > comps.length) throw Fail
        val scanComps = new Array[Component](ns)
        val scanTd = new Array[Int](ns)
        val scanTa = new Array[Int](ns)
        var i = 0
        var p = pos + 3
        while (i < ns) {
          val cs = u8(p)
          val c = comps.find(_.id == cs).getOrElse(throw Fail)
          scanComps(i) = c
          scanTd(i) = u8(p + 1) >> 4
          scanTa(i) = u8(p + 1) & 0xf
          if (scanTd(i) > 3 || scanTa(i) > 3) throw Fail
          p += 2
          i += 1
        }
        val ss = u8(p)
        val se = u8(p + 1)
        val ah = u8(p + 2) >> 4
        val al = u8(p + 2) & 0xf
        p += 3
        if (p != pos + u16(pos)) throw Fail
        if (!progressive) {
          // baseline: spectral/approximation bytes must be 0,63,0, and
          // every scan component needs both tables
          if (ss != 0 || se != 63 || ah != 0 || al != 0) throw Fail
          val scanDc = scanTd.map(t => Option(dcT(t)).getOrElse(throw Fail))
          val scanAc = scanTa.map(t => Option(acT(t)).getOrElse(throw Fail))
          pos = decodeScan(d, p, scanComps, scanDc, scanAc, qt,
            restartInterval, mcusX, mcusY)
        } else {
          // progressive (T.81 G.1): DC band (Ss=Se=0) may interleave;
          // AC bands are single-component; Ah=0 first pass, else one
          // successive-approximation refinement bit per pass
          if (ss == 0 && se != 0) throw Fail
          if (ss > 0 && (ns != 1 || se < ss || se > 63)) throw Fail
          if (al > 13 || (ah != 0 && ah != al + 1)) throw Fail
          // table demand depends on the scan kind: DC-first needs the
          // DC table, AC scans the AC table, DC-refine neither
          val scanDc = scanTd.map(t =>
            if (ss == 0 && ah == 0) Option(dcT(t)).getOrElse(throw Fail)
            else null)
          val scanAc = scanTa.map(t =>
            if (ss > 0) Option(acT(t)).getOrElse(throw Fail) else null)
          pos = decodeProgScan(d, p, scanComps, scanDc, scanAc,
            ss, se, ah, al, restartInterval, mcusX, mcusY)
        }
      } else if (m == 0xd8) { // SOI mid-stream
        throw Fail
      } else { // APPn / COM / DNL / anything else with a length field
        val len = u16(pos)
        if (len < 2) throw Fail
        pos += len
      }
    }

    if (comps == null) throw Fail
    if (progressive) reconstructProgressive(comps, qt)
    assemble(width, height, comps, hMax, vMax)
  }

  /** EOI-time reconstruction for progressive frames: dequantize each
    * accumulated coefficient block and IDCT it into the plane. Only the
    * component's REAL block grid is rendered — padded-grid blocks
    * (decoded to keep interleaved DC scans in bit-sync) carry no
    * displayed pixel.
    */
  private def reconstructProgressive(comps: Array[Component],
      qt: Array[Array[Int]]): Unit = {
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    comps.foreach { c =>
      val q = Option(qt(c.tq)).getOrElse(throw Fail)
      var by = 0
      while (by < c.blocksH) {
        var bx = 0
        while (bx < c.blocksW) {
          val base = (by * c.coefBlocksW + bx) * 64
          var k = 0
          while (k < 64) { coef(k) = c.coefs(base + k) * q(k); k += 1 }
          idct(coef, px)
          val x0 = bx * 8
          val y0 = by * 8
          var y = 0
          while (y < 8) {
            val row = (y0 + y) * c.planeW + x0
            var x = 0
            while (x < 8) {
              c.plane(row + x) = px(y * 8 + x).toByte
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
    }
  }

  /** One progressive scan (T.81 G.2 decode procedures). Coefficients
    * accumulate RAW (un-dequantized) in each component's `coefs` —
    * successive approximation shifts/refines integer magnitudes, so
    * quantization must wait for reconstruction. `eobrun` (G.1.2.2) is
    * scan-level state: an EOBn symbol ends the current block's band and
    * skips the band in the next eobrun−1 blocks; restart markers reset
    * it with the DC predictors.
    */
  private def decodeProgScan(d: Array[Byte], start: Int,
      scanComps: Array[Component], scanDc: Array[HuffTable],
      scanAc: Array[HuffTable], ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int, mcusX: Int, mcusY: Int): Int = {
    val br = new BitReader(d, start)
    var eobrun = 0
    scanComps.foreach(_.dcPred = 0)

    // DC first pass (G.1.2.1): baseline DC decode, value lands in the
    // top approximation bits
    def dcFirst(ci: Int, bx: Int, by: Int): Unit = {
      val c = scanComps(ci)
      val s0 = scanDc(ci).decode(br)
      if (s0 > 11) throw Fail
      c.dcPred += extend(br.receive(s0), s0)
      c.coefs((by * c.coefBlocksW + bx) * 64) = c.dcPred << al
    }

    // DC refinement (G.1.2.1): one raw bit per block
    def dcRefine(ci: Int, bx: Int, by: Int): Unit = {
      val c = scanComps(ci)
      if (br.bit() == 1)
        c.coefs((by * c.coefBlocksW + bx) * 64) |= 1 << al
    }

    // AC first pass (G.1.2.2): run-length + EOB-run over the band
    def acFirst(bx: Int, by: Int): Unit = {
      val c = scanComps(0)
      val base = (by * c.coefBlocksW + bx) * 64
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = scanAc(0).decode(br)
        val r = rs >> 4
        val s = rs & 0xf
        if (s == 0) {
          if (r < 15) {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            k = se + 1 // EOB: band done for this block
          } else k += 16 // ZRL
        } else {
          k += r
          if (k > se) throw Fail
          c.coefs(base + ZigZag(k)) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }

    // AC refinement (G.1.2.3): already-nonzero coefficients receive a
    // correction bit whenever the scan passes over them; zero-history
    // coefficients are created at ±1<<al. The run length r counts only
    // ZERO-history positions — nonzero ones are "transparent".
    def acRefine(bx: Int, by: Int): Unit = {
      val c = scanComps(0)
      val base = (by * c.coefBlocksW + bx) * 64
      val p1 = 1 << al
      val m1 = -1 << al
      def correct(z: Int): Unit =
        if (br.bit() == 1 && (c.coefs(z) & p1) == 0)
          c.coefs(z) += (if (c.coefs(z) >= 0) p1 else m1)
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (!done && k <= se) {
          val rs = scanAc(0).decode(br)
          var r = rs >> 4
          val s = rs & 0xf
          var newVal = 0
          if (s == 0) {
            if (r < 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              done = true // remaining band handled by the eobrun arm
            }
            // r == 15: ZRL — run of 16 zero-history positions
          } else {
            if (s != 1) throw Fail // refinement creates only ±1 (G.1.2.3)
            newVal = if (br.bit() == 1) p1 else m1
          }
          if (!done) {
            var placed = false
            while (!placed && k <= se) {
              val z = base + ZigZag(k)
              if (c.coefs(z) != 0) correct(z)
              else if (r == 0) {
                if (newVal != 0) c.coefs(z) = newVal
                placed = true
              } else r -= 1
              k += 1
            }
            if (!placed && newVal != 0) throw Fail // band ran out
          }
        }
      }
      if (eobrun > 0) {
        // EOB region: only correction bits for surviving nonzeros
        while (k <= se) {
          val z = base + ZigZag(k)
          if (c.coefs(z) != 0) correct(z)
          k += 1
        }
        eobrun -= 1
      }
    }

    // Unit grid (same rule as baseline): interleaved DC scan → MCU
    // grid; single-component scan → that component's own block grid
    val single = scanComps.length == 1
    val totalUnits =
      if (single) scanComps(0).blocksW * scanComps(0).blocksH
      else mcusX * mcusY
    var rstIdx = 0
    var unit = 0
    while (unit < totalUnits) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.align()
        if (br.pos + 1 >= d.length) throw Fail
        if ((d(br.pos) & 0xff) != 0xff ||
            (d(br.pos + 1) & 0xff) != 0xd0 + rstIdx) throw Fail
        br.pos += 2
        rstIdx = (rstIdx + 1) % 8
        scanComps.foreach(_.dcPred = 0)
        eobrun = 0
      }
      if (single) {
        val c = scanComps(0)
        val bx = unit % c.blocksW
        val by = unit / c.blocksW
        if (ss == 0) { if (ah == 0) dcFirst(0, bx, by) else dcRefine(0, bx, by) }
        else { if (ah == 0) acFirst(bx, by) else acRefine(bx, by) }
      } else {
        // interleaved: progressive allows it for the DC band only
        if (ss != 0) throw Fail
        val mx = unit % mcusX
        val my = unit / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var v = 0
          while (v < c.v) {
            var h = 0
            while (h < c.h) {
              if (ah == 0) dcFirst(ci, mx * c.h + h, my * c.v + v)
              else dcRefine(ci, mx * c.h + h, my * c.v + v)
              h += 1
            }
            v += 1
          }
          ci += 1
        }
      }
      unit += 1
    }
    br.align()
    br.pos
  }

  /** Decode one scan's entropy data; returns the position just past it
    * (at the next marker's 0xFF).
    */
  private def decodeScan(d: Array[Byte], start: Int,
      scanComps: Array[Component], scanDc: Array[HuffTable],
      scanAc: Array[HuffTable], qt: Array[Array[Int]],
      restartInterval: Int, mcusX: Int, mcusY: Int): Int = {
    val br = new BitReader(d, start)
    val pred = new Array[Int](scanComps.length)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)

    def decodeBlock(ci: Int, bx: Int, by: Int): Unit = {
      val c = scanComps(ci)
      val q = Option(qt(c.tq)).getOrElse(throw Fail)
      java.util.Arrays.fill(coef, 0)
      val s0 = scanDc(ci).decode(br)
      if (s0 > 11) throw Fail
      pred(ci) += extend(br.receive(s0), s0)
      coef(0) = pred(ci) * q(0)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = scanAc(ci).decode(br)
        val r = rs >> 4
        val s = rs & 0xf
        if (s == 0) {
          if (rs == 0x00) done = true // EOB
          else if (rs == 0xf0) k += 16 // ZRL
          else throw Fail
        } else {
          k += r
          if (k > 63) throw Fail
          val nat = ZigZag(k)
          coef(nat) = extend(br.receive(s), s) * q(nat)
          k += 1
        }
      }
      idct(coef, px)
      val x0 = bx * 8
      val y0 = by * 8
      var y = 0
      while (y < 8) {
        var x = 0
        val row = (y0 + y) * c.planeW + x0
        while (x < 8) {
          c.plane(row + x) = px(y * 8 + x).toByte
          x += 1
        }
        y += 1
      }
    }

    // Unit grid: interleaved scan → MCU of H×V blocks per component;
    // single-component scan → that component's own block grid (T.81
    // A.2.2: non-interleaved data units are NOT padded to MCU factors).
    val totalUnits =
      if (scanComps.length == 1) scanComps(0).blocksW * scanComps(0).blocksH
      else mcusX * mcusY
    var rstIdx = 0
    var unit = 0
    while (unit < totalUnits) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.align()
        if (br.pos + 1 >= d.length) throw Fail
        if ((d(br.pos) & 0xff) != 0xff ||
            (d(br.pos + 1) & 0xff) != 0xd0 + rstIdx) throw Fail
        br.pos += 2
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      if (scanComps.length == 1) {
        val c = scanComps(0)
        decodeBlock(0, unit % c.blocksW, unit / c.blocksW)
      } else {
        val mx = unit % mcusX
        val my = unit / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var v = 0
          while (v < c.v) {
            var h = 0
            while (h < c.h) {
              decodeBlock(ci, mx * c.h + h, my * c.v + v)
              h += 1
            }
            v += 1
          }
          ci += 1
        }
      }
      unit += 1
    }
    br.align()
    br.pos
  }

  /** Replication-upsample component planes and convert to the output
    * raster (gray passthrough or JFIF YCbCr→RGB with floor(x+0.5)
    * rounding — the q84 oracle mirrors this expression verbatim).
    */
  private def assemble(width: Int, height: Int, comps: Array[Component],
      hMax: Int, vMax: Int): Image = {
    def clamp(v: Int): Byte =
      (if (v < 0) 0 else if (v > 255) 255 else v).toByte
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        val srcRow = (y * c.v / vMax) * c.planeW
        var x = 0
        while (x < width) {
          out(y * width + x) = c.plane(srcRow + x * c.h / hMax)
          x += 1
        }
        y += 1
      }
      Image(width, height, 1, out)
    } else {
      val cy = comps(0)
      val cb = comps(1)
      val cr = comps(2)
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = cy.plane((y * cy.v / vMax) * cy.planeW +
            x * cy.h / hMax) & 0xff
          val cbv = cb.plane((y * cb.v / vMax) * cb.planeW +
            x * cb.h / hMax) & 0xff
          val crv = cr.plane((y * cr.v / vMax) * cr.planeW +
            x * cr.h / hMax) & 0xff
          val i = (y * width + x) * 3
          out(i) = clamp(math.floor(yv + 1.402 * (crv - 128) + 0.5).toInt)
          out(i + 1) = clamp(math.floor(
            yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128) + 0.5).toInt)
          out(i + 2) = clamp(math.floor(yv + 1.772 * (cbv - 128) + 0.5).toInt)
          x += 1
        }
        y += 1
      }
      Image(width, height, 3, out)
    }
  }

  // ───────────────────────── Encoder (flat-block fixtures) ─────────────

  /** T.81 K.3.1 typical DC Huffman tables (public spec tables). The AC
    * side needs only EOB for DC-only blocks, so a minimal one-symbol
    * table (code "0" → EOB) keeps the stream valid and small; the
    * all-ones code stays reserved per C.2.
    */
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = DcLumVals
  private val AcEobBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcEobVals = Array(0)

  /** Canonical code assignment (T.81 C.2): symbol → (code, length). */
  private def canonical(bits: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = Map.newBuilder[Int, (Int, Int)]
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        out += vals(k) -> ((code, l))
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  private final class BitWriter {
    val buf = new scala.collection.mutable.ArrayBuffer[Byte](256)
    private var cur = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >>> i) & 1)
        cnt += 1
        if (cnt == 8) {
          buf += cur.toByte
          if (cur == 0xff) buf += 0x00.toByte // byte stuffing
          cur = 0
          cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 B.1.1.5). */
    def flush(): Unit =
      if (cnt > 0) { put((1 << (8 - cnt)) - 1, 8 - cnt) }
  }

  private def dcCategory(diff: Int): Int = {
    var a = math.abs(diff)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** DC diff alone (category code + magnitude bits) — the whole entropy
    * content of a progressive DC-first scan's block.
    */
  private def putDc(w: BitWriter, dc: Map[Int, (Int, Int)],
      diff: Int): Unit = {
    val s = dcCategory(diff)
    val (c, l) = dc(s)
    w.put(c, l)
    if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
  }

  /** Shared flat-block entropy encoder: one DC diff + EOB per block. */
  private def putDcOnlyBlock(w: BitWriter, dc: Map[Int, (Int, Int)],
      ac: Map[Int, (Int, Int)], diff: Int): Unit = {
    putDc(w, dc, diff)
    val (ec, el) = ac(0x00)
    w.put(ec, el)
  }

  private def header(out: scala.collection.mutable.ArrayBuffer[Byte],
      marker: Int, body: Array[Int]): Unit = {
    out += 0xff.toByte
    out += marker.toByte
    val len = body.length + 2
    out += (len >> 8).toByte
    out += (len & 0xff).toByte
    body.foreach(b => out += b.toByte)
  }

  /** Quant tables for the fixtures: DC quantum 8 (divides 8·(v−128)
    * exactly → lossless round-trip for flat blocks), AC 16 (unused).
    */
  private def dqtBody(tq: Int): Array[Int] =
    Array(tq) ++ Array.tabulate(64)(k => if (k == 0) 8 else 16)

  private def dhtBody(tc: Int, th: Int, bits: Array[Int],
      vals: Array[Int]): Array[Int] =
    Array((tc << 4) | th) ++ bits.drop(1) ++ vals

  /** Encode a grayscale JPEG whose 8×8 blocks are each flat at
    * `blockVal(bx, by)` (0–255). Any conformant baseline decoder
    * recovers the exact values; cropping to (width, height) discards
    * the padded block remainder per the spec.
    */
  def encodeFlatGray(width: Int, height: Int,
      blockVal: (Int, Int) => Int, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0)
    val out = new scala.collection.mutable.ArrayBuffer[Byte](1024)
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    header(out, 0xdb, dqtBody(0))
    header(out, 0xc0, Array(8, height >> 8, height & 0xff, width >> 8,
      width & 0xff, 1, 1, 0x11, 0))
    header(out, 0xc4, dhtBody(0, 0, DcLumBits, DcLumVals))
    header(out, 0xc4, dhtBody(1, 0, AcEobBits, AcEobVals))
    if (restartInterval > 0)
      header(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    header(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dc = canonical(DcLumBits, DcLumVals)
    val ac = canonical(AcEobBits, AcEobVals)
    val w = new BitWriter
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    var pred = 0
    var rstIdx = 0
    var unit = 0
    while (unit < bw * bh) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        w.flush()
        out ++= w.buf; w.buf.clear()
        out += 0xff.toByte; out += (0xd0 + rstIdx).toByte
        rstIdx = (rstIdx + 1) % 8
        pred = 0
      }
      val v = blockVal(unit % bw, unit / bw)
      require(v >= 0 && v <= 255)
      putDcOnlyBlock(w, dc, ac, (v - 128) - pred)
      pred = v - 128
      unit += 1
    }
    w.flush()
    out ++= w.buf
    out += 0xff.toByte; out += 0xd9.toByte // EOI
    out.toArray
  }

  /** AC table for progressive fixtures: the fifteen EOBn symbols
    * (r<<4, r = 0..14) at four bits each — enough to express any EOB
    * run, which is ALL a zero-AC progressive scan emits.
    */
  private val AcEobnBits =
    Array(0, 0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcEobnVals = Array.tabulate(15)(r => r << 4)

  /** Encode a PROGRESSIVE (SOF2) grayscale JPEG of the same flat-block
    * content as [[encodeFlatGray]], through the canonical four-scan
    * successive-approximation script:
    *   1. DC first   (Al=1): diffs of (v−128) >> 1
    *   2. AC first   1–63 (Al=1): one EOBn run covering every block
    *   3. DC refine  (Ah=1, Al=0): one raw bit per block — (v−128) & 1
    *   4. AC refine  1–63 (Ah=1, Al=0): the EOBn run again
    * Flat blocks keep every AC zero, so the decoded raster must equal
    * the sequential encoding of the same content BIT-EXACTLY (DC
    * reconstruction is floor(x/2)·2 + (x&1) = x; DC quantum 8 is again
    * lossless) — giving the progressive path the same arithmetic oracle
    * the baseline fixtures have, while exercising DC-first/refine and
    * both EOB-run arms.
    */
  def encodeFlatGrayProgressive(width: Int, height: Int,
      blockVal: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val out = new scala.collection.mutable.ArrayBuffer[Byte](1024)
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    header(out, 0xdb, dqtBody(0))
    header(out, 0xc2, Array(8, height >> 8, height & 0xff, width >> 8,
      width & 0xff, 1, 1, 0x11, 0))
    header(out, 0xc4, dhtBody(0, 0, DcLumBits, DcLumVals))
    header(out, 0xc4, dhtBody(1, 0, AcEobnBits, AcEobnVals))
    val dc = canonical(DcLumBits, DcLumVals)
    val ac = canonical(AcEobnBits, AcEobnVals)
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val nBlocks = bw * bh
    def vOf(unit: Int): Int = {
      val v = blockVal(unit % bw, unit / bw)
      require(v >= 0 && v <= 255)
      v - 128
    }
    def scan(params: Array[Int])(body: BitWriter => Unit): Unit = {
      header(out, 0xda, params)
      val w = new BitWriter
      body(w)
      w.flush()
      out ++= w.buf
    }
    // one EOBn covering all nBlocks: eobrun_total = 2^r + extra
    def putEobAll(w: BitWriter): Unit = {
      val r = 31 - Integer.numberOfLeadingZeros(nBlocks)
      val (c, l) = ac(r << 4)
      w.put(c, l)
      if (r > 0) w.put(nBlocks - (1 << r), r)
    }
    scan(Array(1, 1, 0x00, 0, 0, 0x01)) { w => // DC first, Al=1
      var pred = 0
      var unit = 0
      while (unit < nBlocks) {
        val t = vOf(unit) >> 1
        putDc(w, dc, t - pred)
        pred = t
        unit += 1
      }
    }
    scan(Array(1, 1, 0x00, 1, 63, 0x01))(putEobAll) // AC first, Al=1
    scan(Array(1, 1, 0x00, 0, 0, 0x10)) { w => // DC refine, Ah=1 Al=0
      var unit = 0
      while (unit < nBlocks) { w.put(vOf(unit) & 1, 1); unit += 1 }
    }
    scan(Array(1, 1, 0x00, 1, 63, 0x10))(putEobAll) // AC refine
    out += 0xff.toByte; out += 0xd9.toByte // EOI
    out.toArray
  }

  /** Encode a 4:2:0 YCbCr JPEG whose 16×16 MCUs are each flat at
    * `mcuVal(mx, my) = (y, cb, cr)` (each 0–255): four identical Y
    * blocks + one Cb + one Cr per MCU, DC-only. Decodes exactly to the
    * source planes under replication upsample (flat chroma makes the
    * upsample filter irrelevant), so RGB output is `assemble`'s
    * conversion of the exact (y, cb, cr) — the q84 oracle computes it.
    */
  def encodeFlatYcc420(width: Int, height: Int,
      mcuVal: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val out = new scala.collection.mutable.ArrayBuffer[Byte](1024)
    out += 0xff.toByte; out += 0xd8.toByte
    header(out, 0xdb, dqtBody(0))
    header(out, 0xdb, dqtBody(1))
    header(out, 0xc0, Array(8, height >> 8, height & 0xff, width >> 8,
      width & 0xff, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    header(out, 0xc4, dhtBody(0, 0, DcLumBits, DcLumVals))
    header(out, 0xc4, dhtBody(0, 1, DcChrBits, DcChrVals))
    header(out, 0xc4, dhtBody(1, 0, AcEobBits, AcEobVals))
    header(out, 0xda, Array(3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 63, 0))
    val dcLum = canonical(DcLumBits, DcLumVals)
    val dcChr = canonical(DcChrBits, DcChrVals)
    val ac = canonical(AcEobBits, AcEobVals)
    val w = new BitWriter
    val mx0 = (width + 15) / 16
    val my0 = (height + 15) / 16
    var predY = 0
    var predCb = 0
    var predCr = 0
    var unit = 0
    while (unit < mx0 * my0) {
      val (yv, cbv, crv) = mcuVal(unit % mx0, unit / mx0)
      require(yv >= 0 && yv <= 255 && cbv >= 0 && cbv <= 255 &&
        crv >= 0 && crv <= 255)
      var b = 0
      while (b < 4) { // four flat Y blocks: first carries the diff
        putDcOnlyBlock(w, dcLum, ac, (yv - 128) - predY)
        predY = yv - 128
        b += 1
      }
      putDcOnlyBlock(w, dcChr, ac, (cbv - 128) - predCb)
      predCb = cbv - 128
      putDcOnlyBlock(w, dcChr, ac, (crv - 128) - predCr)
      predCr = crv - 128
      unit += 1
    }
    w.flush()
    out ++= w.buf
    out += 0xff.toByte; out += 0xd9.toByte
    out.toArray
  }
}
