package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Dependency-free TAR (POSIX ustar) archive walk and writer — the
  * archive sibling of [[ZipCodec]]'s central-directory walk, and the
  * container most large text corpora actually ship in (`.tar.gz`
  * dumps). TAR has no central directory: the only correct read IS the
  * sequential 512-byte-block walk, each header block declaring its
  * member's size (octal, NUL/space-terminated), the member payload
  * padded to the block size, the archive terminated by two zero
  * blocks.
  *
  * Surface: ustar magic ("ustar\0" POSIX and "ustar " GNU), the
  * header checksum (unsigned sum with the checksum field counted as
  * spaces — verified, not trusted), typeflags '0'/NUL (file), '5'
  * (directory), 'L' (GNU longname: the next member's name rides a
  * payload), pax extended headers ('x': "len key=value\n" records,
  * `path`/`size` overrides applied to the following member). Totality
  * contract as every codec: malformed input → None, never a throw;
  * a checksum mismatch or a size overrunning the archive rejects the
  * file rather than mis-walking it.
  *
  * The gzip composition (`.tar.gz`) reuses the same
  * `java.util.zip.GZIPInputStream` wire-decode as the WARC leg — TAR
  * is not seekable inside gzip, which is exactly why the walk is
  * sequential and why at 100 TB the unit of parallelism is one
  * ARCHIVE per task (the [[graft.sources.WarcSource]] binaryFile
  * pattern), never an intra-archive split.
  */
object TarCodec {

  /** One member's metadata (`dataOffset` into the UNCOMPRESSED
    * archive — the CDX-style extent that makes re-fetch O(1)).
    */
  final case class TarEntry(name: String, size: Long, mtime: Long,
      typeflag: Char, dataOffset: Long)

  private val Block = 512

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') { v = (v << 3) | (c - '0'); seen = true }
      else if (c == 0 || c == ' ') { if (seen) i = end }
      else return -1L
      i += 1
    }
    if (seen) v else -1L
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, StandardCharsets.UTF_8)
  }

  private def zeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + Block) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Header checksum: unsigned byte sum with bytes 148-155 counted as
    * ASCII spaces.
    */
  private def checksum(b: Array[Byte], off: Int): Long = {
    var s = 0L
    var i = 0
    while (i < Block) {
      s += (if (i >= 148 && i < 156) ' '.toInt else b(off + i) & 0xff)
      i += 1
    }
    s
  }

  /** Parse pax "len key=value\n" records. */
  private def paxRecords(payload: Array[Byte]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var pos = 0
    while (pos < payload.length) {
      var sp = pos
      while (sp < payload.length && payload(sp) != ' ') sp += 1
      if (sp >= payload.length) return out.result()
      val lenStr = new String(payload, pos, sp - pos, StandardCharsets.US_ASCII)
      val len = try lenStr.toInt catch { case _: NumberFormatException => -1 }
      if (len <= 0 || pos + len > payload.length) return out.result()
      val rec = new String(payload, sp + 1, pos + len - sp - 2,
        StandardCharsets.UTF_8) // drop trailing \n
      val eq = rec.indexOf('=')
      if (eq > 0) out += rec.substring(0, eq) -> rec.substring(eq + 1)
      pos += len
    }
    out.result()
  }

  /** Walk the archive; None on any structural lie. Directories are
    * listed; GNU longnames and pax path/size overrides are applied to
    * the member they precede (the 'L'/'x' carrier blocks themselves
    * are not listed — they are encoding, not content).
    */
  def entries(archive: Array[Byte]): Option[Vector[TarEntry]] = {
    if (archive == null || archive.length < 2 * Block ||
      archive.length % Block != 0) return None
    val out = Vector.newBuilder[TarEntry]
    var pos = 0
    var pendingName: String = null
    var pendingSize = -1L
    while (pos + Block <= archive.length) {
      if (zeroBlock(archive, pos)) {
        // end-of-archive: require the second zero block
        return if (pos + 2 * Block <= archive.length &&
          zeroBlock(archive, pos + Block)) Some(out.result())
        else None
      }
      val magic = str(archive, pos + 257, 6)
      if (magic != "ustar" && magic != "ustar ") return None
      val declared = octal(archive, pos + 148, 8)
      if (declared < 0 || declared != checksum(archive, pos)) return None
      val size0 = octal(archive, pos + 124, 12)
      if (size0 < 0) return None
      val typeflag = {
        val t = archive(pos + 156) & 0xff
        if (t == 0) '0' else t.toChar
      }
      val dataAt = pos + Block
      def paddedOf(sz: Long): Long = (sz + Block - 1) / Block * Block
      // the walk advance follows the ACTUAL payload extent: a pax size
      // override (the only reason writers emit one — >8 GiB members, or
      // zeroed ustar size fields) replaces the header's size for the
      // member it precedes, so the member arm advances by it too
      var advance = paddedOf(size0)
      typeflag match {
        case 'L' => // GNU longname: payload is the next member's name
          if (dataAt + advance > archive.length) return None
          pendingName =
            str(archive, dataAt, size0.toInt)
        case 'x' => // pax extended header for the next member
          if (dataAt + advance > archive.length) return None
          val pax = paxRecords(
            java.util.Arrays.copyOfRange(archive, dataAt,
              dataAt + size0.toInt))
          pax.get("path").foreach(pendingName = _)
          pax.get("size").foreach { s =>
            pendingSize = try s.toLong catch {
              case _: NumberFormatException => return None
            }
          }
        case t =>
          val prefix = str(archive, pos + 345, 155)
          val short = str(archive, pos, 100)
          val name =
            if (pendingName != null) pendingName
            else if (magic == "ustar" && prefix.nonEmpty)
              prefix + "/" + short
            else short
          val size = if (pendingSize >= 0) pendingSize else size0
          advance = paddedOf(size)
          if (dataAt + advance > archive.length) return None
          out += TarEntry(name, size, octal(archive, pos + 136, 12),
            t, dataAt.toLong)
          pendingName = null
          pendingSize = -1L
      }
      pos = dataAt + advance.toInt
    }
    None // ran off the end without the terminator
  }

  /** Extract one member's payload by its entry. */
  def readEntry(archive: Array[Byte], e: TarEntry): Option[Array[Byte]] =
    if (e.dataOffset + e.size > archive.length || e.size < 0) None
    else Some(java.util.Arrays.copyOfRange(archive,
      e.dataOffset.toInt, (e.dataOffset + e.size).toInt))

  /** All file members as (name, payload). */
  def readAll(archive: Array[Byte]): Vector[(String, Array[Byte])] =
    entries(archive).getOrElse(Vector.empty).collect {
      case e if e.typeflag == '0' =>
        e.name -> readEntry(archive, e).getOrElse(Array.emptyByteArray)
    }

  // ── write ────────────────────────────────────────────────────────

  private def writeOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (len - 1 - s.length)) + s
    var i = 0
    while (i < len - 1) { h(off + i) = padded(i).toByte; i += 1 }
    h(off + len - 1) = 0
  }

  private def header(name: String, size: Long, mtime: Long,
      typeflag: Char): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nb = name.getBytes(StandardCharsets.UTF_8)
    System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
    writeOctal(h, 100, 8, 420) // mode 0644
    writeOctal(h, 108, 8, 0) // uid
    writeOctal(h, 116, 8, 0) // gid
    writeOctal(h, 124, 12, size)
    writeOctal(h, 136, 12, mtime)
    h(156) = typeflag.toByte
    System.arraycopy("ustar".getBytes(StandardCharsets.US_ASCII), 0,
      h, 257, 5) // + the NUL already there
    h(263) = '0'; h(264) = '0' // version "00"
    // checksum written as 6 octal digits, NUL, space
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = checksum(h, 0)
    val s = java.lang.Long.toOctalString(sum)
    val p = ("0" * (6 - s.length)) + s
    var i = 0
    while (i < 6) { h(148 + i) = p(i).toByte; i += 1 }
    h(154) = 0
    h(155) = ' '
    h
  }

  private def pad(o: ByteArrayOutputStream, n: Int): Unit =
    if (n % Block != 0) o.write(new Array[Byte](Block - n % Block))

  /** Write a ustar archive. Names longer than 100 bytes ride a GNU
    * 'L' longname member when `gnuLong`, else a pax 'x' header —
    * both read-arms stay exercised by real writes.
    */
  def tarBytes(members: Seq[(String, Array[Byte], Long)],
      gnuLong: Boolean = true): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    members.foreach { case (name, data, mtime) =>
      if (name.getBytes(StandardCharsets.UTF_8).length > 100) {
        if (gnuLong) {
          val nb = name.getBytes(StandardCharsets.UTF_8)
          o.write(header("././@LongLink", nb.length.toLong, 0, 'L'))
          o.write(nb); pad(o, nb.length)
        } else {
          val rec0 = s" path=$name\n"
          // record length includes its own digits — fixed point
          var len = rec0.length + 1
          while ((len.toString.length + rec0.length) != len)
            len = len.toString.length + rec0.length
          val rec = s"$len$rec0".getBytes(StandardCharsets.UTF_8)
          o.write(header("pax_header", rec.length.toLong, 0, 'x'))
          o.write(rec); pad(o, rec.length)
        }
      }
      val shortName =
        if (name.getBytes(StandardCharsets.UTF_8).length > 100)
          name.substring(math.max(0, name.length - 100)).take(100)
        else name
      o.write(header(shortName, data.length.toLong, mtime, '0'))
      o.write(data); pad(o, data.length)
    }
    o.write(new Array[Byte](2 * Block))
    o.toByteArray
  }

  /** gzip the archive (one member — the `.tar.gz` shape). */
  def gzip(archive: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(archive); gz.close()
    bos.toByteArray
  }

  /** Inflate a `.tar.gz` payload back to the raw archive; None when
    * the gzip frame is broken.
    */
  def gunzip(payload: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(payload))
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
}
