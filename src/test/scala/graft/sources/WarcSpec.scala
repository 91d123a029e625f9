package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.functions.WarcCodec
import org.apache.spark.sql.functions.col

class WarcSpec extends SparkSpec {

  // ── parser vs an INDEPENDENT hand-written archive (not the writer's
  // output): literal bytes assembled from the WARC-1.0 grammar itself.
  test("parser reads a hand-authored plain archive") {
    val body = "<html><body>hi</body></html>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n$body"
    val raw =
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:handmade-1>\r\n" +
        "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
        "WARC-Target-URI: https://h.example/a\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n" +
        "\r\n" + http + "\r\n\r\n" +
        // a second, non-http record
        "WARC/1.0\r\n" +
        "WARC-Type: resource\r\n" +
        "WARC-Record-ID: <urn:uuid:handmade-2>\r\n" +
        "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
        "WARC-Target-URI: https://h.example/b\r\n" +
        "Content-Type: text/plain\r\n" +
        "Content-Length: 5\r\n" +
        "\r\nhello\r\n\r\n"
    val recs = WarcCodec.parseFile(raw.getBytes(UTF_8))
    assert(recs.map(_.warcType) == Seq("response", "resource"))
    val r = recs.head
    assert(r.targetUri == "https://h.example/a")
    assert(r.httpStatus.contains(200))
    assert(r.httpContentType.contains("text/html"))
    assert(new String(r.payload, UTF_8) == body)
    assert(new String(recs(1).payload, UTF_8) == "hello")
    assert(recs(1).httpStatus.isEmpty)
  }

  test("writer→parser round trip, gzip multi-member and plain") {
    val body = "café — naïve".getBytes(UTF_8) // multi-byte: length is octets
    val recs = Seq(
      WarcCodec.warcinfoRecord("<urn:uuid:i>", "2026-01-01T00:00:00Z",
        Seq("software" -> "graft", "format" -> "WARC/1.0")),
      WarcCodec.responseRecord("<urn:uuid:r>", "https://e.org/x",
        "2026-01-01T00:00:00Z", 301, "Moved", "text/plain; charset=utf-8", body))
    for (gz <- Seq(false, true)) {
      val parsed = WarcCodec.parseFile(WarcCodec.file(recs, gzip = gz))
      assert(parsed.map(_.warcType) == Seq("warcinfo", "response"), s"gzip=$gz")
      assert(parsed(1).httpStatus.contains(301))
      assert(parsed(1).contentLength > body.length) // http head included
      assert(parsed(1).payload.toSeq == body.toSeq)
      assert(new String(parsed.head.payload, UTF_8).contains("software: graft"))
    }
  }

  test("HTTP wire codings: gzip body, chunked framing, both") {
    val body = ("lorem ipsum " * 20).getBytes(UTF_8)
    for ((gz, ch) <- Seq((true, false), (false, true), (true, true))) {
      val rec = WarcCodec.responseRecord("<urn:uuid:e>", "https://e.org/enc",
        "2026-01-01T00:00:00Z", 200, "OK", "text/plain", body,
        gzipBody = gz, chunked = ch)
      val parsed = WarcCodec.parseFile(rec)
      assert(parsed.length == 1, s"gz=$gz ch=$ch")
      assert(parsed.head.payload.toSeq == body.toSeq, s"gz=$gz ch=$ch")
      // the WARC block carries the WIRE bytes, not the entity
      if (gz) assert(parsed.head.contentLength < body.length + 200)
    }
  }

  test("hand-built chunked + deflate message decodes (parser ≠ writer⁻¹)") {
    // zlib-deflate "hello world", then frame as two chunks by hand
    val entity = "hello world".getBytes(UTF_8)
    val dbos = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(dbos)
    dos.write(entity); dos.finish(); dos.close()
    val z = dbos.toByteArray
    val cut = z.length / 2
    val framed = new java.io.ByteArrayOutputStream()
    framed.write(Integer.toHexString(cut).getBytes(UTF_8)); framed.write("\r\n".getBytes(UTF_8))
    framed.write(z, 0, cut); framed.write("\r\n".getBytes(UTF_8))
    // second chunk with a chunk extension, which must be ignored
    framed.write((Integer.toHexString(z.length - cut) + ";ext=1").getBytes(UTF_8))
    framed.write("\r\n".getBytes(UTF_8))
    framed.write(z, cut, z.length - cut); framed.write("\r\n".getBytes(UTF_8))
    framed.write("0\r\n\r\n".getBytes(UTF_8))
    val http = framed.toByteArray
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Content-Encoding: deflate\r\nTransfer-Encoding: chunked\r\n\r\n").getBytes(UTF_8)
    val block = head ++ http
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:ch>\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "WARC-Target-URI: https://e.org/ch\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8) ++
      block ++ "\r\n\r\n".getBytes(UTF_8)
    val recs = WarcCodec.parseFile(raw)
    assert(recs.length == 1)
    assert(new String(recs.head.payload, UTF_8) == "hello world")
  }

  test(".warc.zst: multi-frame zstd archive parses like the gzip layout") {
    val recs = (0 until 3).map(i =>
      WarcCodec.responseRecord(s"<urn:uuid:z$i>", s"https://e.org/z/$i",
        "2026-01-01T00:00:00Z", 200, "OK", "text/plain",
        s"zstd body $i".getBytes(UTF_8)))
    val parsed = WarcCodec.parseFile(WarcCodec.fileZstd(recs))
    assert(parsed.length == 3)
    assert(parsed.map(_.targetUri) == (0 until 3).map(i => s"https://e.org/z/$i"))
    assert(new String(parsed(1).payload, UTF_8) == "zstd body 1")
  }

  test("CDX index: member extents are range-fetchable, tile exactly") {
    val recs = (0 until 3).map(i =>
      WarcCodec.responseRecord(s"<urn:uuid:c$i>", s"https://e.org/c/$i",
        "2026-01-01T00:00:00Z", 200, "OK", "text/plain",
        (s"body $i " * (i + 1)).getBytes(UTF_8)))
    for (gz <- Seq(true, false)) {
      val bytes = WarcCodec.file(recs, gzip = gz)
      val idx = WarcCodec.parseFileIndexed(bytes)
      assert(idx.length == 3, s"gz=$gz")
      assert(idx.head._2 == 0L)
      assert(idx.last._2 + idx.last._3 == bytes.length, s"gz=$gz extents must tile")
      // a RANGED read (slice only!) recovers record 1 — the range-request model
      val (r1, off, len) = idx(1)
      val slice = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
      val fetched = WarcCodec.parseFile(slice).head
      assert(fetched.targetUri == r1.targetUri && fetched.targetUri == "https://e.org/c/1")
      assert(new String(fetched.payload, UTF_8) == "body 1 body 1 ")
    }
    // gzip member walk handles FNAME'd headers (foreign writers set it)
    val bos = new java.io.ByteArrayOutputStream()
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val rec = recs(0)
    deflater.setInput(rec); deflater.finish()
    val buf = new Array[Byte](1 << 16)
    val flg = 8 // FNAME
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, flg.toByte, 0, 0, 0, 0, 0, 0xff.toByte))
    bos.write("a.warc".getBytes(UTF_8)); bos.write(0)
    while (!deflater.finished()) { val n = deflater.deflate(buf); bos.write(buf, 0, n) }
    val crc = new java.util.zip.CRC32(); crc.update(rec)
    for (i <- 0 until 4) bos.write(((crc.getValue >> (8 * i)) & 0xff).toInt)
    for (i <- 0 until 4) bos.write(((rec.length.toLong >> (8 * i)) & 0xff).toInt)
    val withName = bos.toByteArray
    val idx2 = WarcCodec.parseFileIndexed(withName)
    assert(idx2.length == 1 && idx2.head._3 == withName.length.toLong)
  }

  test("total on dirty input: truncated tail keeps recovered records") {
    val good = WarcCodec.responseRecord("<urn:uuid:g>", "https://e.org/1",
      "2026-01-01T00:00:00Z", 200, "OK", "text/plain", "ok".getBytes(UTF_8))
    val full = WarcCodec.file(Seq(good, good), gzip = false)
    // cut into the second record's block
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 6)
    val recs = WarcCodec.parseFile(cut)
    assert(recs.length == 1)
    assert(recs.head.httpStatus.contains(200))
    // garbage is zero records, not an exception
    assert(WarcCodec.parseFile("not a warc".getBytes(UTF_8)).isEmpty)
    assert(WarcCodec.parseFile(Array[Byte](0x1f, 0x8b.toByte, 1, 2)).isEmpty)
  }

  test("streaming parse ≡ whole-array parse on plain, gzip, and zstd") {
    val recs = (0 until 5).map(i =>
      WarcCodec.responseRecord(s"<urn:uuid:s$i>", s"https://e.org/s/$i",
        "2026-01-01T00:00:00Z", 200, "OK", "text/plain",
        (s"stream body $i " * (i + 1)).getBytes(UTF_8)))
    val layouts = Seq(
      "plain" -> WarcCodec.file(recs, gzip = false),
      "gzip" -> WarcCodec.file(recs, gzip = true),
      "zstd" -> WarcCodec.fileZstd(recs))
    for ((name, bytes) <- layouts) {
      val whole = WarcCodec.parseFile(bytes)
      val streamed = WarcCodec.parseStream(
        new java.io.ByteArrayInputStream(bytes)).toVector
      assert(streamed.length == whole.length, name)
      streamed.zip(whole).foreach { case (s, w) =>
        assert(s.recordIndex == w.recordIndex, name)
        assert(s.targetUri == w.targetUri, name)
        assert(s.httpStatus == w.httpStatus, name)
        assert(java.util.Arrays.equals(s.payload, w.payload), name)
      }
    }
    // totality: a cut mid-block keeps the recovered prefix, no throw
    val plain = WarcCodec.file(recs, gzip = false)
    val cut = java.util.Arrays.copyOfRange(plain, 0, plain.length - 10)
    val got = WarcCodec.parseStream(new java.io.ByteArrayInputStream(cut)).toVector
    assert(got.length == 4)
    assert(WarcCodec.parseStream(new java.io.ByteArrayInputStream(
      "not a warc".getBytes(UTF_8))).isEmpty)
    // gzip magic with a truncated header: the decompressor constructor
    // itself throws — must surface as an empty walk, not a failed task
    assert(WarcCodec.parseStream(new java.io.ByteArrayInputStream(
      Array[Byte](0x1f, 0x8b.toByte, 1, 2))).isEmpty)
    assert(WarcCodec.parseStream(
      new java.io.ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
    // a record CLAIMING a >2 GiB block: the skip attempt hits EOF on
    // this fixture — the good prefix survives, no throw (with real
    // bytes present, the walk would skip the block and continue)
    val huge = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Record-ID: <urn:uuid:huge>\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Type: text/plain\r\nContent-Length: 3000000000\r\n\r\n")
      .getBytes(UTF_8)
    val mixed = WarcCodec.file(recs.take(2), gzip = false) ++ huge
    val got2 = WarcCodec.parseStream(
      new java.io.ByteArrayInputStream(mixed)).toVector
    assert(got2.length == 2)
  }

  test("readIndexed: CDX extents fan one archive out to ranged splits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc_idx_spec").toFile
    try {
      val recs = (0 until 12).map(i =>
        WarcCodec.responseRecord(s"<urn:uuid:x$i>", s"https://e.org/x/$i",
          "2026-01-01T00:00:00Z", 200, "OK", "text/plain",
          (s"indexed body $i | " * 40).getBytes(UTF_8)))
      val bytes = WarcCodec.file(recs, gzip = true)
      val path = Paths.get(dir.toString, "big.warc.gz")
      Files.write(path, bytes)
      val fileDs = spark.createDataset(Seq((path.toString, bytes)))
      val idx = WarcSource.index(fileDs)
      val idxRows = idx.collect()
      assert(idxRows.length == 12)
      // splitBytes far below the archive size → MANY bands (>1 task
      // per archive — the scale contract the whole-file walk lacked)
      val split = 1024L
      val bands = idxRows.map(_.offset / split).distinct
      assert(bands.length > 1, s"want >1 ranged split, got ${bands.length}")
      val got = WarcSource.readIndexed(idx, splitBytes = split)
        .collect().sortBy(_.record_index)
      assert(got.length == 12)
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.record_index == i)
        assert(r.target_uri == s"https://e.org/x/$i")
        assert(new String(r.payload, UTF_8).startsWith(s"indexed body $i |"))
      }
      // a FILTERED index reads only what it names
      val some = WarcSource.readIndexed(
        idx.filter(col("record_index") % 3 === 0), splitBytes = split)
        .collect().map(_.record_index).sorted
      assert(some.toSeq == Seq(0, 3, 6, 9))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("distributed read: binaryFile → one task per archive → typed rows") {
    val dir = Files.createTempDirectory("warc_spec").toFile
    try {
      for (i <- 0 until 4) {
        val rec = WarcCodec.responseRecord(s"<urn:uuid:$i>", s"https://e.org/p/$i",
          "2026-01-01T00:00:00Z", 200, "OK", "text/html",
          s"<p>doc $i</p>".getBytes(UTF_8))
        Files.write(Paths.get(dir.toString, f"part-$i%02d.warc.gz"),
          WarcCodec.file(Seq(rec), gzip = true))
      }
      val rows = WarcSource.read(spark, dir.toString + "/*.warc.gz")
      val got = WarcSource.responses(rows).collect().sortBy(_.target_uri)
      assert(got.length == 4)
      assert(got.map(_.target_uri).toSeq == (0 until 4).map(i => s"https://e.org/p/$i"))
      assert(got.forall(_.http_status.contains(200)))
      assert(new String(got(2).payload, UTF_8) == "<p>doc 2</p>")
      assert(got.forall(_.warc_file.endsWith(".warc.gz")))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
