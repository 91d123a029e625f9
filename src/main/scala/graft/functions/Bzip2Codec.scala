package graft.functions

import java.io.ByteArrayOutputStream

/** Dependency-free bzip2 DECODER — the compression of the classic
  * LLM corpus drop (Wikipedia database dumps ship as `.xml.bz2`
  * multistream archives). The full pipeline is inverted from first
  * principles: MSB-first bit stream → per-group Huffman tables
  * (delta-coded lengths, selector-switched every 50 symbols) →
  * RUNA/RUNB bijective-base-2 run lengths + move-to-front inverse →
  * Burrows-Wheeler inverse via the counting-sort successor vector →
  * RLE1 inverse — with the format's own MSB-first CRC32 verified per
  * BLOCK and the combined CRC per STREAM, and multistream
  * concatenation (the Wikipedia layout) walked to the end.
  *
  * Decode-only by the [[SnappyCodec]] argument: writing bzip2 is an
  * optimization problem (BWT construction), reading it is the
  * correctness problem on the ingest path. commons-compress (Spark
  * classpath) is the reference writer in specs and queries.
  * Totality: malformed input, a CRC mismatch, or the deprecated
  * randomized-block flag → None, never wrong bytes.
  *
  * Scale shape: per-FILE sequential decode over `binaryFile` — bzip2
  * is block-structured but the stream framing is sequential; the
  * parallel unit is one archive (or one multistream member) per task.
  */
object Bzip2Codec {

  private final class Malformed extends RuntimeException

  private final class Bits(val b: Array[Byte]) {
    var pos = 0L // bit position
    def bit(): Int = {
      val byteAt = (pos >>> 3).toInt
      if (byteAt >= b.length) throw new Malformed
      val v = (b(byteAt) >>> (7 - (pos & 7).toInt)) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bitsL(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
    def atEnd: Boolean = (pos >>> 3) >= b.length
  }

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  /** bzip2's MSB-first CRC32 over a byte range. */
  private def blockCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0xffffffff
    var i = off
    val end = off + len
    while (i < end) {
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    ~crc
  }

  private val BlockMagic = 0x314159265359L
  private val EosMagic = 0x177245385090L

  /** Positions (within `b`, from `from` until `until`) where a bzip2
    * STREAM starts: the 4-byte `BZh[1-9]` header immediately followed
    * by the 48-bit block magic (streams are byte-aligned, so the
    * 10-byte signature is byte-aligned too — unlike intra-stream
    * blocks, which float at bit granularity). A 10-byte match inside
    * compressed payload has probability ~2⁻⁸⁰ per offset: this is the
    * split rule that lets a multistream archive (the Wikipedia dump
    * layout) fan out to one task per stream WITHOUT decoding anything,
    * which is exactly why the foundation publishes dumps multistream.
    */
  def signatureOffsets(b: Array[Byte], from: Int = 0,
      until: Int = Int.MaxValue): Vector[Int] = {
    val out = Vector.newBuilder[Int]
    val end = math.min(b.length, until)
    var i = math.max(0, from)
    while (i + 10 <= end) {
      if (b(i) == 'B' && b(i + 1) == 'Z' && b(i + 2) == 'h' &&
        b(i + 3) >= '1' && b(i + 3) <= '9' &&
        (b(i + 4) & 0xff) == 0x31 && (b(i + 5) & 0xff) == 0x41 &&
        (b(i + 6) & 0xff) == 0x59 && (b(i + 7) & 0xff) == 0x26 &&
        (b(i + 8) & 0xff) == 0x53 && (b(i + 9) & 0xff) == 0x59) {
        out += i
        i += 10
      } else i += 1
    }
    out.result()
  }

  /** Decompress a (possibly multistream) bzip2 payload. */
  def decode(payload: Array[Byte]): Option[Array[Byte]] = {
    if (payload == null || payload.length < 10) return None
    try {
      val in = new Bits(payload)
      val out = new ByteArrayOutputStream()
      var streams = 0
      while (!in.atEnd) {
        // stream header
        if (in.bits(8) != 'B' || in.bits(8) != 'Z' ||
          in.bits(8) != 'h') {
          // trailing garbage after ≥1 good stream → reject (strict)
          throw new Malformed
        }
        val level = in.bits(8) - '0'
        if (level < 1 || level > 9) throw new Malformed
        val blockLimit = level * 100000 + 10
        var streamCrc = 0
        var going = true
        while (going) {
          val magic = in.bitsL(48)
          if (magic == EosMagic) {
            val declared = in.bits(32)
            if (declared != streamCrc) throw new Malformed
            in.alignByte()
            going = false
          } else if (magic == BlockMagic) {
            val declared = in.bits(32)
            val block = decodeBlock(in, blockLimit)
            if (blockCrc(block, 0, block.length) != declared)
              throw new Malformed
            out.write(block)
            streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ declared
          } else throw new Malformed
        }
        streams += 1
      }
      if (streams == 0) None else Some(out.toByteArray)
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
        _: NegativeArraySizeException => None
    }
  }

  /** One block: Huffman → MTF/RLE2 inverse → BWT inverse → RLE1
    * inverse.
    */
  private def decodeBlock(in: Bits, blockLimit: Int): Array[Byte] = {
    if (in.bit() != 0) throw new Malformed // randomized: deprecated
    val origPtr = in.bits(24)
    // symbol map
    val ranges = in.bits(16)
    val used = new Array[Boolean](256)
    var nInUse = 0
    var r = 0
    while (r < 16) {
      if (((ranges >>> (15 - r)) & 1) == 1) {
        val bm = in.bits(16)
        var i = 0
        while (i < 16) {
          if (((bm >>> (15 - i)) & 1) == 1) {
            used(r * 16 + i) = true
            nInUse += 1
          }
          i += 1
        }
      }
      r += 1
    }
    if (nInUse == 0) throw new Malformed
    val seqToUnseq = new Array[Int](nInUse)
    var k = 0
    var c = 0
    while (c < 256) {
      if (used(c)) { seqToUnseq(k) = c; k += 1 }
      c += 1
    }
    val alphaSize = nInUse + 2 // RUNA, RUNB, 2..nInUse, EOB
    val nGroups = in.bits(3)
    if (nGroups < 2 || nGroups > 6) throw new Malformed
    val nSelectors = in.bits(15)
    if (nSelectors < 1) throw new Malformed
    // selectors: unary count of 1-bits, then MTF over group ids
    val selMtf = new Array[Int](nSelectors)
    var s = 0
    while (s < nSelectors) {
      var j = 0
      while (in.bit() == 1) {
        j += 1
        if (j >= nGroups) throw new Malformed
      }
      selMtf(s) = j
      s += 1
    }
    val pos = Array.tabulate(nGroups)(identity)
    val selectors = new Array[Int](nSelectors)
    s = 0
    while (s < nSelectors) {
      val v = selMtf(s)
      val tmp = pos(v)
      var i = v
      while (i > 0) { pos(i) = pos(i - 1); i -= 1 }
      pos(0) = tmp
      selectors(s) = tmp
      s += 1
    }
    // Huffman code lengths per group
    val lengths = Array.ofDim[Int](nGroups, alphaSize)
    var g = 0
    while (g < nGroups) {
      var cur = in.bits(5)
      var sym = 0
      while (sym < alphaSize) {
        var going = true
        while (going) {
          if (cur < 1 || cur > 20) throw new Malformed
          if (in.bit() == 0) going = false
          else { if (in.bit() == 0) cur += 1 else cur -= 1 }
        }
        lengths(g)(sym) = cur
        sym += 1
      }
      g += 1
    }
    // canonical decode tables per group: limit/base/perm
    val limit = Array.ofDim[Int](nGroups, 25)
    val base = Array.ofDim[Int](nGroups, 25)
    val perm = Array.ofDim[Int](nGroups, alphaSize)
    val minLens = new Array[Int](nGroups)
    g = 0
    while (g < nGroups) {
      var minLen = 32
      var maxLen = 0
      var i = 0
      while (i < alphaSize) {
        if (lengths(g)(i) > maxLen) maxLen = lengths(g)(i)
        if (lengths(g)(i) < minLen) minLen = lengths(g)(i)
        i += 1
      }
      minLens(g) = minLen
      // perm: symbols ordered by code length
      var pp = 0
      var l = minLen
      while (l <= maxLen) {
        i = 0
        while (i < alphaSize) {
          if (lengths(g)(i) == l) { perm(g)(pp) = i; pp += 1 }
          i += 1
        }
        l += 1
      }
      val cnt = new Array[Int](25)
      i = 0
      while (i < alphaSize) { cnt(lengths(g)(i) + 1) += 1; i += 1 }
      i = 1
      while (i < 25) { cnt(i) += cnt(i - 1); i += 1 }
      var vec = 0
      l = minLen
      while (l <= maxLen) {
        vec += cnt(l + 1) - cnt(l)
        limit(g)(l) = vec - 1
        vec <<= 1
        l += 1
      }
      l = minLen + 1
      while (l <= maxLen) {
        base(g)(l) = ((limit(g)(l - 1) + 1) << 1) - cnt(l)
        l += 1
      }
      g += 1
    }
    // symbol stream
    val mtf = new Array[Int](256)
    var i = 0
    while (i < nInUse) { mtf(i) = seqToUnseq(i); i += 1 }
    val bwt = new Array[Byte](blockLimit)
    var n = 0
    var groupNo = -1
    var groupPos = 0
    var curTbl = 0
    def nextSym(): Int = {
      if (groupPos == 0) {
        groupNo += 1
        if (groupNo >= nSelectors) throw new Malformed
        groupPos = 50
        curTbl = selectors(groupNo)
      }
      groupPos -= 1
      var l = minLens(curTbl)
      var v = in.bits(l)
      while (l <= 23 && v > limit(curTbl)(l)) {
        l += 1
        v = (v << 1) | in.bit()
      }
      if (l > 23) throw new Malformed
      val idx = v - base(curTbl)(l)
      if (idx < 0 || idx >= alphaSize) throw new Malformed
      perm(curTbl)(idx)
    }
    val eob = alphaSize - 1
    var sym = nextSym()
    while (sym != eob) {
      if (sym <= 1) { // RUNA/RUNB: bijective base-2 run of mtf[0]
        var run = 0L
        var bitK = 0
        while (sym <= 1) {
          run += (sym + 1).toLong << bitK
          bitK += 1
          if (bitK > 40) throw new Malformed
          sym = nextSym()
        }
        val byte0 = mtf(0).toByte
        if (n + run > blockLimit) throw new Malformed
        var j = 0L
        while (j < run) { bwt(n) = byte0; n += 1; j += 1 }
      } else {
        // move-to-front at position sym-1
        val p = sym - 1
        val tmp = mtf(p)
        var j = p
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = tmp
        if (n >= blockLimit) throw new Malformed
        bwt(n) = tmp.toByte
        n += 1
        sym = nextSym()
      }
    }
    if (origPtr >= n) throw new Malformed
    // inverse BWT: counting-sort successor vector
    val counts = new Array[Int](256)
    i = 0
    while (i < n) { counts(bwt(i) & 0xff) += 1; i += 1 }
    val starts = new Array[Int](256)
    var acc = 0
    c = 0
    while (c < 256) { starts(c) = acc; acc += counts(c); c += 1 }
    val tt = new Array[Int](n)
    i = 0
    while (i < n) {
      val ch = bwt(i) & 0xff
      tt(starts(ch)) = i
      starts(ch) += 1
      i += 1
    }
    // walk + RLE1 inverse fused
    val out = new ByteArrayOutputStream(n)
    var p = tt(origPtr)
    var emitted = 0
    var runByte = -1
    var runLen = 0
    while (emitted < n) {
      val b = bwt(p) & 0xff
      p = tt(p)
      emitted += 1
      if (runLen == 4) {
        // this byte is the repeat COUNT for the preceding 4-run
        var j = 0
        while (j < b) { out.write(runByte); j += 1 }
        runLen = 0
        runByte = -1
      } else {
        if (b == runByte) runLen += 1
        else { runByte = b; runLen = 1 }
        out.write(b)
      }
    }
    if (runLen == 4) throw new Malformed // dangling run without count
    out.toByteArray
  }
}
