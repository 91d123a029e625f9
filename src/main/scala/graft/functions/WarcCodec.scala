package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (Web ARChive, ISO 28500 / WARC-1.0) container codec — the
  * public format of large-scale web crawls, and therefore the raw-input
  * container of a web-scale training-data pipeline.
  *
  * Writer and parser are independent implementations of the published
  * grammar (warcwriter is NOT parse⁻¹ by construction): a record is a
  * `WARC/1.0` version line, CRLF-separated named fields terminated by an
  * empty line, exactly `Content-Length` block octets, then the mandatory
  * two-CRLF record separator. `.warc.gz` files hold ONE GZIP MEMBER PER
  * RECORD (the Common Crawl convention, which is what makes per-record
  * random access possible on an otherwise non-splittable stream); the
  * parser also accepts a whole-file single-member stream and plain
  * uncompressed files, sniffing the 0x1f8b magic.
  *
  * HTTP payloads (`Content-Type: application/http`) are split at the
  * first blank line into status/headers and body per RFC 9112 framing;
  * the status code and entity `Content-Type` surface as typed columns.
  *
  * Reference behavior mirrored: the reference pipeline ingests fetched
  * HTTP bodies and keys them by URL (pull_new_sales_list.py:96-134);
  * WARC is that same fetch→parse seam expressed in the standard archival
  * container instead of a live HTTP client.
  */
object WarcCodec {

  /** One parsed WARC record. `payload` is the HTTP entity body when the
    * block is an application/http message, else the raw block.
    */
  final case class WarcRecord(
      recordIndex: Int,
      warcType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      contentLength: Long,
      httpStatus: Option[Int],
      httpContentType: Option[String],
      payload: Array[Byte])

  private val CRLF = "\r\n"

  // ── writer ────────────────────────────────────────────────────────

  /** Serialize one WARC record (headers + block + separator). */
  def record(
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      warcDate: String,
      contentType: String,
      block: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(CRLF)
    sb.append("WARC-Type: ").append(warcType).append(CRLF)
    sb.append("WARC-Record-ID: ").append(recordId).append(CRLF)
    sb.append("WARC-Date: ").append(warcDate).append(CRLF)
    targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append(CRLF))
    extraHeaders.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append(CRLF)
    }
    sb.append("Content-Type: ").append(contentType).append(CRLF)
    sb.append("Content-Length: ").append(block.length).append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes(US_ASCII)
    val tail = (CRLF + CRLF).getBytes(US_ASCII)
    val out = new Array[Byte](head.length + block.length + tail.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    System.arraycopy(tail, 0, out, head.length + block.length, tail.length)
    out
  }

  /** An HTTP response block: status line + headers + blank line + body.
    * `gzipBody` adds `Content-Encoding: gzip` (the dominant entity
    * coding of a real crawl); `chunked` frames the body with
    * `Transfer-Encoding: chunked` (RFC 9112 §7.1) instead of a
    * Content-Length — applied AFTER the content coding, as on the wire.
    */
  def httpResponseBlock(
      status: Int,
      reason: String,
      entityContentType: String,
      body: Array[Byte],
      gzipBody: Boolean = false,
      chunked: Boolean = false): Array[Byte] = {
    val encoded = if (gzipBody) {
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(body); gz.finish(); gz.close()
      bos.toByteArray
    } else body
    val framed = if (chunked) chunkEncode(encoded) else encoded
    val sb = new StringBuilder
    sb.append(s"HTTP/1.1 $status $reason").append(CRLF)
    sb.append(s"Content-Type: $entityContentType").append(CRLF)
    if (gzipBody) sb.append("Content-Encoding: gzip").append(CRLF)
    if (chunked) sb.append("Transfer-Encoding: chunked").append(CRLF)
    else sb.append(s"Content-Length: ${framed.length}").append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes(US_ASCII)
    val out = new Array[Byte](head.length + framed.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(framed, 0, out, head.length, framed.length)
    out
  }

  /** RFC 9112 chunked framing: split into a few chunks so the decoder's
    * size-line walk sees more than one chunk.
    */
  private def chunkEncode(body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    var pos = 0
    val step = math.max(1, body.length / 3)
    while (pos < body.length) {
      val len = math.min(step, body.length - pos)
      bos.write(Integer.toHexString(len).getBytes(US_ASCII))
      bos.write('\r'); bos.write('\n')
      bos.write(body, pos, len)
      bos.write('\r'); bos.write('\n')
      pos += len
    }
    bos.write("0\r\n\r\n".getBytes(US_ASCII))
    bos.toByteArray
  }

  /** A `response` record wrapping an HTTP response. */
  def responseRecord(
      recordId: String,
      targetUri: String,
      warcDate: String,
      status: Int,
      reason: String,
      entityContentType: String,
      body: Array[Byte],
      gzipBody: Boolean = false,
      chunked: Boolean = false): Array[Byte] =
    record("response", recordId, Some(targetUri), warcDate,
      "application/http; msgtype=response",
      httpResponseBlock(status, reason, entityContentType, body,
        gzipBody = gzipBody, chunked = chunked))

  /** A `warcinfo` record (file-level metadata). */
  def warcinfoRecord(recordId: String, warcDate: String,
      fields: Seq[(String, String)]): Array[Byte] =
    record("warcinfo", recordId, None, warcDate,
      "application/warc-fields",
      fields.map { case (k, v) => s"$k: $v$CRLF" }.mkString.getBytes(UTF_8))

  /** Assemble a WARC file from records; gzip = one member per record
    * (the Common Crawl layout).
    */
  def file(records: Seq[Array[Byte]], gzip: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    records.foreach { r =>
      if (gzip) {
        val gz = new GZIPOutputStream(bos)
        gz.write(r); gz.finish(); gz.close()
      } else bos.write(r)
    }
    bos.toByteArray
  }

  // ── parser ────────────────────────────────────────────────────────

  /** Parse a whole WARC file (plain; gzip multi-member or single; or
    * zstd — the `.warc.zst` layout of newer crawls, detected by the
    * 28 B5 2F FD frame magic and inflated via the zstd-jni Spark
    * ships). Total on malformed input: parsing stops at the first
    * unreadable record boundary and returns what was recovered.
    */
  def parseFile(bytes: Array[Byte]): Seq[WarcRecord] = {
    val plain =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        gunzipAll(bytes)
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x28 && (bytes(1) & 0xff) == 0xb5 &&
        (bytes(2) & 0xff) == 0x2f && (bytes(3) & 0xff) == 0xfd)
        unzstdAll(bytes)
      else bytes
    parsePlain(plain)
  }

  /** STREAMING parse — the scale path: records are decoded
    * incrementally off an `InputStream` (plain, gzip member chain, or
    * zstd frames, sniffed from the leading magic), so task memory is
    * bounded by ONE record, never the archive. This is what removes
    * the 2 GiB whole-file-array ceiling for >2 GiB `.warc.gz` files
    * while keeping the one-task-per-archive granularity (gzip member
    * chains are not seekable — the sequential walk IS the correct
    * read). Totality as [[parseFile]]: the walk stops at the first
    * unreadable boundary, keeping what was recovered, and closes the
    * stream when it finishes.
    */
  def parseStream(raw: java.io.InputStream): Iterator[WarcRecord] = {
    val pb = new java.io.PushbackInputStream(raw, 4)
    val sniff = new Array[Byte](4)
    var n = 0
    try {
      var r = pb.read(sniff, 0, 4)
      while (r > 0 && n + r <= 4) { n += r; r = if (n < 4) pb.read(sniff, n, 4 - n) else 0 }
      pb.unread(sniff, 0, n)
    } catch { case _: java.io.IOException => () }
    // decompressor construction itself reads the stream header — a
    // truncated 2-byte gzip stub throws HERE, and totality demands an
    // empty walk, not a failed task
    val in: Option[java.io.InputStream] =
      try {
        if (n >= 2 && (sniff(0) & 0xff) == 0x1f && (sniff(1) & 0xff) == 0x8b)
          Some(new GZIPInputStream(pb, 65536))
        else if (n >= 4 && (sniff(0) & 0xff) == 0x28 && (sniff(1) & 0xff) == 0xb5 &&
          (sniff(2) & 0xff) == 0x2f && (sniff(3) & 0xff) == 0xfd) {
          val z = new com.github.luben.zstd.ZstdInputStream(pb)
          z.setContinuous(true)
          Some(z)
        } else Some(pb)
      } catch {
        case _: java.io.IOException =>
          try pb.close() catch { case _: java.io.IOException => () }
          None
      }
    in.map(recordIterator).getOrElse(Iterator.empty)
  }

  /** Max WARC header region the streaming walk will buffer before
    * declaring the record malformed (headers are ~300 bytes in real
    * crawls; 1 MiB is far past any conformant writer).
    */
  private val MaxStreamHeader = 1 << 20

  private def recordIterator(in: java.io.InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var idx = 0
      private var done = false

      private def close(): Unit = {
        done = true
        try in.close() catch { case _: java.io.IOException => () }
      }

      /** Read the header region (through CRLFCRLF) + block + trailing
        * separator of one record; null at a clean end or the first
        * malformed boundary.
        */
      private def readOne(): WarcRecord = {
        try {
          // skip inter-record CRLFs; detect EOF
          var c = in.read()
          while (c == '\r') {
            val c2 = in.read()
            if (c2 != '\n') return null
            c = in.read()
          }
          if (c < 0) return null
          val hdr = new ByteArrayOutputStream(512)
          hdr.write(c)
          // accumulate until CRLFCRLF
          var tail = 0 // how much of \r\n\r\n is matched
          while (tail < 4) {
            val b = in.read()
            if (b < 0 || hdr.size > MaxStreamHeader) return null
            hdr.write(b)
            tail = (tail, b) match {
              case (0, '\r') => 1
              case (1, '\n') => 2
              case (2, '\r') => 3
              case (3, '\n') => 4
              case (_, '\r') => 1
              case _ => 0
            }
          }
          val headerBytes = hdr.toByteArray
          // reuse the byte-array record parser on header + block: first
          // parse Content-Length out of the header region alone
          val header = new String(headerBytes, 0, headerBytes.length - 4, UTF_8)
          val lines = header.split("\r\n", -1)
          if (lines.isEmpty || !lines(0).startsWith("WARC/")) return null
          val lenLine = lines.iterator.drop(1).find(
            _.toLowerCase.startsWith("content-length"))
          val contentLength = lenLine.flatMap { ln =>
            val i = ln.indexOf(':')
            if (i < 0) None
            else try Some(ln.substring(i + 1).trim.toLong)
            catch { case _: NumberFormatException => None }
          }.getOrElse(-1L)
          if (contentLength < 0) return null
          if (contentLength > Int.MaxValue - 8) {
            // a single >2 GiB record must cost ITSELF, not the rest of
            // the archive: skip its block and keep walking (this is the
            // designated big-archive path — whole-file loss here would
            // recreate the exact failure mode the streaming walk removes)
            in.skipNBytes(contentLength)
            return readOne()
          }
          val block = in.readNBytes(contentLength.toInt)
          if (block.length != contentLength.toInt) return null
          // assemble the full record bytes and delegate to parseOne so
          // streaming and whole-array parses share one grammar
          val rec = new Array[Byte](headerBytes.length + block.length + 4)
          System.arraycopy(headerBytes, 0, rec, 0, headerBytes.length)
          System.arraycopy(block, 0, rec, headerBytes.length, block.length)
          rec(rec.length - 4) = '\r'; rec(rec.length - 3) = '\n'
          rec(rec.length - 2) = '\r'; rec(rec.length - 1) = '\n'
          parseOne(rec, 0, idx) match {
            case Some((r, _)) => r
            case None => null
          }
        } catch { case _: java.io.IOException => null }
      }

      override def hasNext: Boolean = {
        if (done) return nextRec != null
        if (nextRec == null) {
          nextRec = readOne()
          if (nextRec == null) close() else idx += 1
        }
        nextRec != null
      }

      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec
        nextRec = null
        r
      }
    }

  /** Decompress a (possibly multi-frame) zstd stream. */
  private def unzstdAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 4)
    try {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new ByteArrayInputStream(bytes))
      in.setContinuous(true) // walk concatenated frames
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
    } catch { case _: java.io.IOException => () } // keep what decoded
    out.toByteArray
  }

  /** One zstd frame per record — the `.warc.zst` sibling of the gzip
    * member layout.
    */
  def fileZstd(records: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    records.foreach(r => bos.write(com.github.luben.zstd.Zstd.compress(r, 3)))
    bos.toByteArray
  }

  // ── CDX-style random access ───────────────────────────────────────

  /** Byte extents of each gzip member: (offset, compressedLength).
    * This is what makes the one-member-per-record layout random-
    * accessible — an index of these extents (the CDX model) lets a
    * reader range-request exactly one record out of a ~1 GB archive.
    * Walks headers manually (FEXTRA/FNAME/FCOMMENT/FHCRC) and measures
    * each deflate stream with a raw Inflater; stops at the first
    * malformed member, keeping the extents recovered.
    */
  def gzipMembers(bytes: Array[Byte]): Seq[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var pos = 0
    try {
      while (pos + 18 <= bytes.length &&
        (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b) {
        val start = pos
        val flg = bytes(pos + 3) & 0xff
        var p = pos + 10
        if ((flg & 4) != 0) { // FEXTRA
          val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
          p += 2 + xlen
        }
        if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 }  // FNAME
        if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
        if ((flg & 2) != 0) p += 2                                    // FHCRC
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(bytes, p, bytes.length - p)
        val buf = new Array[Byte](65536)
        while (!inf.finished()) {
          if (inf.inflate(buf) == 0 && inf.needsInput())
            throw new java.io.EOFException("truncated member")
        }
        val used = (bytes.length - p) - inf.getRemaining
        inf.end()
        pos = p + used + 8 // CRC32 + ISIZE trailer
        if (pos > bytes.length) throw new java.io.EOFException("truncated trailer")
        out += ((start.toLong, (pos - start).toLong))
      }
    } catch { case _: Exception => () } // keep recovered extents
    out.result()
  }

  /** Records with their byte extents — the index builder's view. For
    * gzip archives extents are whole members (range-requestable); for
    * plain files they are record byte ranges.
    */
  def parseFileIndexed(bytes: Array[Byte]): Seq[(WarcRecord, Long, Long)] = {
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      var idx = 0
      gzipMembers(bytes).flatMap { case (off, len) =>
        val slice = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
        parsePlain(gunzipAll(slice)).headOption.map { r =>
          val withIdx = r.copy(recordIndex = idx)
          idx += 1
          (withIdx, off, len)
        }
      }
    } else {
      // plain: reconstruct extents from the parse walk
      val recs = parsePlain(bytes)
      var pos = 0L
      recs.map { r =>
        // each serialized record = header + block + 2 CRLF; header size
        // is not retained, so re-scan the boundary from `pos`
        val start = pos
        val hdrEnd = indexOfBlank(bytes, pos.toInt)
        val end = hdrEnd + 4 + r.contentLength + 4
        pos = end
        (r, start, end - start)
      }
    }
  }

  /** Random-access one record given its extent (the range-request
    * read path: at scale `bytes` here is the ranged slice itself).
    */
  def fetchRecord(bytes: Array[Byte], offset: Long, length: Long): Option[WarcRecord] = {
    if (offset < 0 || length <= 0 || offset + length > bytes.length) return None
    val slice = java.util.Arrays.copyOfRange(bytes, offset.toInt, (offset + length).toInt)
    parseFile(slice).headOption
  }

  /** Decompress an entire (possibly multi-member) gzip stream. */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 4)
    try {
      // GZIPInputStream transparently walks concatenated members.
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 65536)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
    } catch { case _: java.io.IOException => () } // keep what decoded
    out.toByteArray
  }

  private def parsePlain(b: Array[Byte]): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    var ok = true
    while (ok && pos < b.length) {
      // skip any inter-record CRLFs
      while (pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n') pos += 2
      if (pos >= b.length) ok = false
      else parseOne(b, pos, idx) match {
        case Some((rec, next)) => out += rec; idx += 1; pos = next
        case None => ok = false
      }
    }
    out.result()
  }

  private def parseOne(b: Array[Byte], start: Int, idx: Int): Option[(WarcRecord, Int)] = {
    // header region ends at the first CRLFCRLF
    val hdrEnd = indexOfBlank(b, start)
    if (hdrEnd < 0) return None
    val header = new String(b, start, hdrEnd - start, UTF_8)
    val lines = header.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    var warcType, recordId, targetUri, warcDate, contentType = ""
    var contentLength = -1L
    lines.iterator.drop(1).foreach { ln =>
      val c = ln.indexOf(':')
      if (c > 0) {
        val k = ln.substring(0, c).trim.toLowerCase
        val v = ln.substring(c + 1).trim
        k match {
          case "warc-type"       => warcType = v
          case "warc-record-id"  => recordId = v
          case "warc-target-uri" => targetUri = v
          case "warc-date"       => warcDate = v
          case "content-type"    => contentType = v
          case "content-length"  => contentLength = try v.toLong catch { case _: NumberFormatException => -1L }
          case _ => ()
        }
      }
    }
    val blockStart = hdrEnd + 4
    if (contentLength < 0 || blockStart + contentLength > b.length) return None
    val block = java.util.Arrays.copyOfRange(b, blockStart, blockStart + contentLength.toInt)

    val (st, hct, payload) =
      if (contentType.toLowerCase.startsWith("application/http")) parseHttp(block)
      else (None, None, block)

    Some((WarcRecord(idx, warcType, recordId, targetUri, warcDate, contentType,
      contentLength, st, hct, payload), blockStart + contentLength.toInt))
  }

  /** Split an HTTP message block into (status, entity Content-Type,
    * decoded body): chunked transfer framing is unwrapped (RFC 9112
    * §7.1, trailers skipped) and gzip/deflate content codings inflated
    * — so the payload column downstream operators see is always the
    * entity itself, as fetched. Decode failures fall back to the raw
    * body (dirty-corpus posture).
    */
  private def parseHttp(block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    val hdrEnd = indexOfBlank(block, 0)
    if (hdrEnd < 0) return (None, None, block)
    val head = new String(block, 0, hdrEnd, UTF_8)
    val lines = head.split("\r\n", -1)
    val status = lines.headOption.flatMap { sl =>
      val parts = sl.split(" ")
      if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
        try Some(parts(1).toInt) catch { case _: NumberFormatException => None }
      else None
    }
    def header(name: String): Option[String] = lines.iterator.drop(1).flatMap { ln =>
      val c = ln.indexOf(':')
      if (c > 0 && ln.substring(0, c).trim.equalsIgnoreCase(name))
        Some(ln.substring(c + 1).trim)
      else None
    }.toSeq.headOption
    val ct = header("content-type")
    val raw = java.util.Arrays.copyOfRange(block, hdrEnd + 4, block.length)
    val unframed =
      if (header("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
        chunkDecode(raw).getOrElse(raw)
      else raw
    val body = header("content-encoding").map(_.toLowerCase.trim) match {
      case Some("gzip") | Some("x-gzip") =>
        val d = gunzipAll(unframed); if (d.nonEmpty || unframed.isEmpty) d else unframed
      case Some("deflate") => inflate(unframed).getOrElse(unframed)
      case _ => unframed
    }
    (status, ct, body)
  }

  /** Unwrap RFC 9112 chunked framing; None on malformed size lines. */
  private def chunkDecode(b: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream(b.length)
    var pos = 0
    while (true) {
      // size line: hex digits up to CRLF (chunk extensions after ';' ignored)
      val eol = indexOfCrlf(b, pos)
      if (eol < 0) return None
      val line = new String(b, pos, eol - pos, US_ASCII)
      val hexPart = { val s = line.indexOf(';'); if (s >= 0) line.substring(0, s) else line }.trim
      val size = try java.lang.Long.parseLong(hexPart, 16) catch { case _: NumberFormatException => return None }
      if (size < 0 || eol + 2 + size > b.length) return None
      if (size == 0) return Some(out.toByteArray) // trailers (if any) skipped
      out.write(b, eol + 2, size.toInt)
      pos = eol + 2 + size.toInt
      // chunk data is followed by CRLF
      if (pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n') pos += 2
      else return None
    }
    None // unreachable
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** HTTP `deflate` is zlib-wrapped; some servers send raw deflate —
    * try both (the lenient posture every HTTP client ships).
    */
  private def inflate(b: Array[Byte]): Option[Array[Byte]] = {
    def tryWith(nowrap: Boolean): Option[Array[Byte]] = try {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(b)
      val out = new ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) { inf.end(); return None } // needs more input: truncated
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }
    tryWith(false).orElse(tryWith(true))
  }

  /** Index of the first CRLFCRLF at/after `from`, or -1. */
  private def indexOfBlank(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
