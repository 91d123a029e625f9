package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

class ZipOfficeSpec extends AnyFunSuite {

  private val members = Seq(
    "a.txt" -> "alpha beta gamma delta".getBytes(UTF_8),
    "dir/b.bin" -> Array.tabulate[Byte](5000)(i => (i * 31).toByte),
    "empty" -> Array.emptyByteArray,
    "uni/ünïcode—名前.txt" -> "content".getBytes(UTF_8))

  test("our writer → our reader: entries, sizes, CRCs, both methods") {
    for (store <- Seq(false, true)) {
      val zip = ZipCodec.zipBytes(members, store)
      val got = ZipCodec.readAll(zip)
      assert(got.map(_._1) == members.map(_._1), s"store=$store")
      got.zip(members).foreach { case ((_, d), (_, e)) =>
        assert(d.toSeq == e.toSeq, s"store=$store")
      }
      val es = ZipCodec.entries(zip)
      assert(es.forall(e => e.size == members.toMap.apply(e.name).length))
      if (store) assert(es.forall(_.method == 0))
    }
  }

  test("our writer → JDK ZipInputStream (independent conformance check)") {
    val zip = ZipCodec.zipBytes(members)
    val zin = new ZipInputStream(new ByteArrayInputStream(zip), UTF_8)
    val got = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null)
      .map { e =>
        val bo = new ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = zin.read(buf)
        while (n >= 0) { bo.write(buf, 0, n); n = zin.read(buf) }
        e.getName -> bo.toByteArray
      }.toSeq
    assert(got.map(_._1) == members.map(_._1))
    got.zip(members).foreach { case ((_, d), (_, e)) => assert(d.toSeq == e.toSeq) }
  }

  test("JDK ZipOutputStream → our reader (the other direction)") {
    val bo = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bo, UTF_8)
    members.foreach { case (name, data) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(data)
      zout.closeEntry()
    }
    zout.close()
    val got = ZipCodec.readAll(bo.toByteArray)
    assert(got.map(_._1) == members.map(_._1))
    got.zip(members).foreach { case ((_, d), (_, e)) => assert(d.toSeq == e.toSeq) }
  }

  test("ZIP64: >65535 members resolve via the EOCD locator + extras") {
    // the JDK writer switches to ZIP64 EOCD + sentinel counts past
    // 0xffff entries; our walk must follow the locator and the
    // 0x0001 extended-information extras
    val bo = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bo, UTF_8)
    zout.setMethod(ZipOutputStream.STORED)
    val crc = new java.util.zip.CRC32()
    val payload = "x".getBytes(UTF_8)
    crc.update(payload)
    (0 until 70000).foreach { i =>
      val e = new ZipEntry(s"m$i")
      e.setMethod(ZipEntry.STORED)
      e.setSize(1)
      e.setCrc(crc.getValue)
      zout.putNextEntry(e)
      zout.write(payload)
      zout.closeEntry()
    }
    zout.close()
    val bytes = bo.toByteArray
    val es = ZipCodec.entries(bytes)
    assert(es.length == 70000)
    assert(es.head.name == "m0" && es.last.name == "m69999")
    Seq(0, 1, 65535, 65536, 69999).foreach { i =>
      val e = es(i)
      assert(e.name == s"m$i" && e.size == 1L)
      assert(ZipCodec.read(bytes, e).exists(_.sameElements(payload)))
    }
  }

  test("writer refuses >65535 members instead of truncating the EOCD") {
    val many = (0 to 0xffff).map(i => (s"m$i", Array.emptyByteArray))
    val e = intercept[IllegalArgumentException](ZipCodec.zipBytes(many))
    assert(e.getMessage.contains("ZIP64"))
    // exactly the classic limit still writes and reads back
    val atCap = many.take(3)
    assert(ZipCodec.entries(ZipCodec.zipBytes(atCap)).length == 3)
  }

  test("total on damage: truncation, flipped bytes, garbage") {
    val zip = ZipCodec.zipBytes(members)
    (0 until zip.length by 101).foreach(n => ZipCodec.readAll(zip.take(n)))
    assert(ZipCodec.entries("not a zip at all".getBytes).isEmpty)
    // flip a payload byte: that member's CRC rejects, others survive
    val bad = zip.clone()
    bad(40) = (bad(40) ^ 0x7f).toByte
    val got = ZipCodec.readAll(bad)
    assert(got.length < members.length)
  }

  test("docx round trip: paragraphs, entities, tabs, breaks, whitespace") {
    val paras = Seq(
      "plain paragraph",
      "enti&ties < and > here",
      "  leading and trailing  ",
      "")
    val docx = OfficeText.docxBytes(paras)
    assert(OfficeText.docxText(docx).contains(paras.mkString("\n")))
    // hand-authored document part with attributes, tab and break runs
    val xml =
      """<?xml version="1.0"?><w:document xmlns:w="x"><w:body>""" +
        """<w:p w:rsidR="00AB"><w:pPr><w:jc w:val="left"/></w:pPr>""" +
        """<w:r><w:t>first</w:t></w:r><w:r><w:tab/><w:t>after&#9;tab</w:t></w:r></w:p>""" +
        """<w:p><w:r><w:t xml:space="preserve">a</w:t><w:br/><w:t>b</w:t></w:r></w:p>""" +
        """</w:body></w:document>"""
    val got = OfficeText.wordprocessingParagraphs(xml)
    assert(got == Seq("first\tafter\ttab", "a\nb"))
    assert(OfficeText.docxText("junk".getBytes).isEmpty)
  }

  test("xlsx: shared strings (incl. rich runs), inline, numeric, A1 refs past Z") {
    val cells = Seq(
      (0, 0, "hello", false), (0, 1, "world & co", false),
      (1, 0, "hello", false), // duplicate → one shared-string item
      (2, 27, "wide", false), // column AB: two-letter reference
      (1, 1, "42.5", true))
    val xlsx = OfficeText.xlsxBytes(cells)
    val got = OfficeText.xlsxCells(xlsx)
      .map(c => (c.row, c.col, c.value)).toSet
    assert(got == cells.map(c => (c._1, c._2, c._3)).toSet)
    // shared-string table deduplicated
    val sstXml = new String(ZipCodec.readAll(xlsx)
      .find(_._1 == "xl/sharedStrings.xml").get._2, UTF_8)
    assert(OfficeText.sharedStrings(sstXml) == Vector("hello", "world & co", "wide"))
    // rich-text runs concatenate; inlineStr cells parse
    assert(OfficeText.sharedStrings(
      "<sst><si><r><t>a </t></r><r><t>b</t></r></si></sst>") == Vector("a b"))
    val inline = """<sheetData><row r="1"><c r="B1" t="inlineStr"><is><t>in line</t></is></c></row></sheetData>"""
    assert(OfficeText.sheetCells(inline, Vector.empty) ==
      Seq(OfficeText.Cell(0, 1, "in line")))
    assert(OfficeText.xlsxCells("junk".getBytes).isEmpty)
  }

  test("epub: zipped xhtml members extract in archive order, scripts pruned") {
    val epub = ZipCodec.zipBytes(Seq(
      "mimetype" -> "application/epub+zip".getBytes(UTF_8),
      "ch1.xhtml" -> "<html><head><script>no</script></head><body><p>one two</p></body></html>".getBytes(UTF_8),
      "ch2.html" -> "<html><body><p>three</p></body></html>".getBytes(UTF_8),
      "style.css" -> "p { }".getBytes(UTF_8)))
    val got = OfficeText.epubText(epub)
    assert(got == Seq("ch1.xhtml" -> "one two", "ch2.html" -> "three"))
  }
}
