package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater, Inflater}

/** ZIP archive read/write (APPNOTE.TXT structure) — the container of
  * the office-document tail of a web crawl: every `.docx`/`.xlsx`/
  * `.pptx`/`.epub`/`.jar` response is a ZIP, so lifting their text
  * starts with a real central-directory walk. The JDK's ZipFile wants
  * a file on disk and ZipInputStream trusts local headers (wrong
  * archive member list when entries were superseded); reading the
  * CENTRAL DIRECTORY — found from the End-Of-Central-Directory record
  * scanned back from the tail — is the correct, random-access-shaped
  * parse, and the one that works on a byte array straight out of a
  * WARC payload.
  *
  * Surface: methods 0 (stored) and 8 (deflate) — the universal pair —
  * CRC-32 verification per entry, UTF-8 names. Totality: damaged
  * archives yield the entries that parse and verify; never a throw.
  * Scale shape: pure per-payload work inside the usual codec scan
  * stage ([[graft.ext.Multimodal]] contract).
  */
object ZipCodec {

  /** One archive member (central-directory view). */
  final case class Entry(name: String, method: Int, compressedSize: Long,
      size: Long, crc32: Long, localHeaderOffset: Long)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def u64(b: Array[Byte], off: Int): Long =
    u32(b, off) | (u32(b, off + 4) << 32)

  /** Locate EOCD (scan backward past an optional comment) and list the
    * central directory. Empty on damage.
    */
  def entries(b: Array[Byte]): Seq[Entry] = {
    try {
      if (b.length < 22) return Nil
      // EOCD signature 0x06054b50; comment may pad up to 65535 bytes
      var p = b.length - 22
      val floor = math.max(0, b.length - 22 - 65535)
      while (p >= floor && !(b(p) == 0x50 && b(p + 1) == 0x4b &&
          b(p + 2) == 0x05 && b(p + 3) == 0x06)) p -= 1
      if (p < floor) return Nil
      var n: Long = u16(b, p + 10)
      var cdOff: Long = u32(b, p + 16)
      // ZIP64: sentinel fields defer to the ZIP64 EOCD record, found
      // via the 20-byte locator (sig PK\x06\x07) directly before the
      // EOCD — the shape every >4 GB / >65535-member archive has
      if ((n == 0xffffL || cdOff == 0xffffffffL) && p >= 20 &&
        b(p - 20) == 0x50 && b(p - 19) == 0x4b &&
        b(p - 18) == 0x06 && b(p - 17) == 0x07) {
        val z64 = u64(b, p - 12)
        if (z64 >= 0 && z64 + 56 <= b.length &&
          b(z64.toInt) == 0x50 && b(z64.toInt + 1) == 0x4b &&
          b(z64.toInt + 2) == 0x06 && b(z64.toInt + 3) == 0x06) {
          n = u64(b, z64.toInt + 32)
          cdOff = u64(b, z64.toInt + 48)
        }
      }
      if (cdOff < 0 || cdOff > b.length) return Nil
      val out = Seq.newBuilder[Entry]
      var q = cdOff.toInt
      var i = 0L
      while (i < n && q + 46 <= b.length) {
        if (!(b(q) == 0x50 && b(q + 1) == 0x4b && b(q + 2) == 0x01 &&
            b(q + 3) == 0x02)) return out.result()
        val method = u16(b, q + 10)
        val crc = u32(b, q + 16)
        var csize = u32(b, q + 20)
        var usize = u32(b, q + 24)
        val nameLen = u16(b, q + 28)
        val extraLen = u16(b, q + 30)
        val commentLen = u16(b, q + 32)
        var lho = u32(b, q + 42)
        if (q + 46 + nameLen + extraLen > b.length) return out.result()
        val name = new String(b, q + 46, nameLen, UTF_8)
        // ZIP64 extended-information extra (id 0x0001): 8-byte values
        // replace, IN DECLARED ORDER, exactly the header fields that
        // carry the 0xffffffff sentinel
        if (usize == 0xffffffffL || csize == 0xffffffffL ||
          lho == 0xffffffffL) {
          var x = q + 46 + nameLen
          val xEnd = x + extraLen
          while (x + 4 <= xEnd) {
            val id = u16(b, x)
            val len = u16(b, x + 2)
            if (id == 1 && x + 4 + len <= xEnd) {
              var v = x + 4
              if (usize == 0xffffffffL && v + 8 <= x + 4 + len) {
                usize = u64(b, v); v += 8
              }
              if (csize == 0xffffffffL && v + 8 <= x + 4 + len) {
                csize = u64(b, v); v += 8
              }
              if (lho == 0xffffffffL && v + 8 <= x + 4 + len) {
                lho = u64(b, v); v += 8
              }
            }
            x += 4 + len
          }
        }
        out += Entry(name, method, csize, usize, crc, lho)
        q += 46 + nameLen + extraLen + commentLen
        i += 1
      }
      out.result()
    } catch { case _: Exception => Nil }
  }

  /** Extract + CRC-verify one member through its LOCAL header (the
    * central directory's offset). None on mismatch or damage.
    */
  def read(b: Array[Byte], e: Entry): Option[Array[Byte]] = {
    try {
      val p = e.localHeaderOffset.toInt
      if (p + 30 > b.length) return None
      if (!(b(p) == 0x50 && b(p + 1) == 0x4b && b(p + 2) == 0x03 &&
          b(p + 3) == 0x04)) return None
      val nameLen = u16(b, p + 26)
      val extraLen = u16(b, p + 28)
      val dataAt = p + 30 + nameLen + extraLen
      if (dataAt + e.compressedSize > b.length) return None
      val raw = java.util.Arrays.copyOfRange(b, dataAt,
        dataAt + e.compressedSize.toInt)
      val data = e.method match {
        case 0 => raw
        case 8 =>
          val inf = new Inflater(true) // raw deflate
          inf.setInput(raw)
          val out = new ByteArrayOutputStream(e.size.toInt max 64)
          val buf = new Array[Byte](8192)
          try {
            var done = inf.finished()
            while (!done) {
              val k = inf.inflate(buf)
              if (k > 0) out.write(buf, 0, k)
              // finished FIRST: an empty deflate stream's only inflate
              // call returns 0 with finished AND needsInput both set
              if (inf.finished()) done = true
              else if (k == 0 && inf.needsInput()) return None // truncated
            }
          } finally inf.end()
          out.toByteArray
        case _ => return None // unsupported method
      }
      val crc = new CRC32()
      crc.update(data)
      if (crc.getValue != e.crc32 || data.length.toLong != e.size) None
      else Some(data)
    } catch { case _: Exception => None }
  }

  /** Convenience: every verified (name, bytes) of an archive. */
  def readAll(b: Array[Byte]): Seq[(String, Array[Byte])] =
    entries(b).flatMap(e => read(b, e).map(e.name -> _))

  /** Spec-valid single-shot writer: local headers + central directory
    * + EOCD, deflate (or stored when it doesn't pay / `store`).
    */
  def zipBytes(members: Seq[(String, Array[Byte])],
      store: Boolean = false): Array[Byte] = {
    // classic (non-ZIP64) records only: 16-bit member count, 32-bit
    // offsets/sizes. Fail loudly rather than silently truncating the
    // EOCD fields into a corrupt archive (the reader side DOES accept
    // ZIP64; the writer's domain is bounded fixtures).
    require(members.length <= 0xffff,
      s"zipBytes: ${members.length} members exceeds the classic EOCD " +
        "16-bit count; ZIP64 writing is unsupported")
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      var i = 0; while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    val central = new ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >> 8) & 0xff) }
    def c32(v: Long): Unit = {
      var i = 0; while (i < 4) { central.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    members.foreach { case (name, data) =>
      val nameB = name.getBytes(UTF_8)
      val crc = new CRC32(); crc.update(data)
      val deflated = if (store) data else {
        val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(data); d.finish()
        val bo = new ByteArrayOutputStream(data.length / 2 + 64)
        val buf = new Array[Byte](8192)
        while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
        d.end()
        bo.toByteArray
      }
      val (method, payload) =
        if (store || deflated.length >= data.length) (0, data) else (8, deflated)
      val lho = out.size().toLong
      require(lho <= 0xffffffffL,
        "zipBytes: local-header offset exceeds 32 bits; ZIP64 writing " +
          "is unsupported")
      // local header
      w32(0x04034b50L); w16(20); w16(0x800 /* UTF-8 names */); w16(method)
      w16(0); w16(0) // time/date: fixed zeros — deterministic archives
      w32(crc.getValue); w32(payload.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(payload)
      // central record
      c32(0x02014b50L); c16(20); c16(20); c16(0x800); c16(method)
      c16(0); c16(0)
      c32(crc.getValue); c32(payload.length.toLong); c32(data.length.toLong)
      c16(nameB.length); c16(0); c16(0); c16(0); c16(0)
      c32(0L); c32(lho)
      central.write(nameB)
    }
    val cdOff = out.size().toLong
    val cd = central.toByteArray
    out.write(cd)
    w32(0x06054b50L); w16(0); w16(0)
    w16(members.length); w16(members.length)
    w32(cd.length.toLong); w32(cdOff); w16(0)
    out.toByteArray
  }
}
