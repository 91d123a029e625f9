package graft.functions

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.scalatest.funsuite.AnyFunSuite

class PdfCodecSpec extends AnyFunSuite {

  private val lorem = "the fast key order sort table scan merge part " +
    "window small hash scan join order batch batch batch stream spark"

  test("round trips every encoder arm byte-exactly") {
    val pages = Seq(lorem, lorem.reverse, "short page", "")
    for {
      flate <- Seq(false, true)
      xrefStream <- Seq(false, true)
      kerned <- Seq(false, true)
      two <- Seq(false, true)
    } {
      val bytes = PdfCodec.encode(pages, flate = flate, xrefStream = xrefStream,
        kerned = kerned, twoStreamsPerPage = two)
      val got = PdfCodec.extractText(bytes)
      assert(got.nPages == pages.length,
        s"flate=$flate xrefStream=$xrefStream kerned=$kerned two=$two")
      assert(got.pages == pages,
        s"flate=$flate xrefStream=$xrefStream kerned=$kerned two=$two")
    }
  }

  test("escapes, octal, nested parens, non-ASCII, newlines round trip") {
    val nasty = Seq(
      "parens (nested (deep)) and \\ backslash",
      "tabs\tand\nnewlines\randbells",
      "unicode: déjà vu — 中文 € ✓",
      ")( unbalanced-looking but escaped")
    for (xs <- Seq(false, true); k <- Seq(false, true)) {
      val bytes = PdfCodec.encode(nasty, flate = true, xrefStream = xs, kerned = k)
      assert(PdfCodec.extractText(bytes).pages == nasty, s"xs=$xs k=$k")
    }
  }

  test("title metadata round trips through /Info in both xref shapes") {
    for (xs <- Seq(false, true)) {
      val bytes = PdfCodec.encode(Seq("body"), xrefStream = xs,
        title = Some("Crawl Report — überdoc"))
      assert(PdfCodec.extractText(bytes).title.contains("Crawl Report — überdoc"))
    }
  }

  test("incremental update appends a page and /Prev chain resolves") {
    val base = PdfCodec.encode(Seq("page one", "page two"), flate = true)
    val updated = PdfCodec.appendPage(base, "page three (appended)")
    val got = PdfCodec.extractText(updated)
    assert(got.nPages == 3)
    assert(got.pages == Seq("page one", "page two", "page three (appended)"))
    // the base document alone must still read as 2 pages (append-only)
    assert(PdfCodec.extractText(base).pages == Seq("page one", "page two"))
    // and the update must be a strict byte-prefix extension
    assert(updated.take(base.length).sameElements(base))
  }

  test("two stacked incremental updates: newest xref entry wins twice") {
    val v0 = PdfCodec.encode(Seq("a"), flate = false)
    val v1 = PdfCodec.appendPage(v0, "b")
    val v2 = PdfCodec.appendPage(v1, "c")
    assert(PdfCodec.extractText(v2).pages == Seq("a", "b", "c"))
  }

  test("hand-written fixture: hex strings, comments, indirect /Length, TJ kerning") {
    // A minimal classic-xref PDF assembled by hand (offsets computed below)
    // exercising reader paths the encoder never emits: hex-string show,
    // an indirect /Length, interleaved comments, and ' / " operators.
    val content =
      "BT /F1 12 Tf (Mixed ) Tj <48656C6C6F> Tj ( ) Tj " +
        "[(ker) -120 (ned)] TJ (, quoted:) Tj T* (q1) ' 2 3 (q2) \" ET"
    val objs = Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
      "3 0 obj\n% a comment between objects\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
      s"4 0 obj\n<< /Length 5 0 R >>\nstream\n$content\nendstream\nendobj\n",
      s"5 0 obj\n${content.length + 1}\nendobj\n")
    val header = "%PDF-1.4\n"
    val body = new StringBuilder(header)
    val offsets = objs.map { o => val off = body.length; body.append(o); off }
    val xrefOff = body.length
    body.append("xref\n0 6\n0000000000 65535 f \n")
    offsets.foreach(o => body.append(f"$o%010d 00000 n \n"))
    body.append("trailer\n<< /Size 6 /Root 1 0 R >>\n")
    body.append(s"startxref\n$xrefOff\n%%EOF\n")
    val got = PdfCodec.extractText(body.toString.getBytes(ISO_8859_1))
    assert(got.nPages == 1)
    assert(got.pages.head == "Mixed Hello kerned, quoted:q1q2")
  }

  test("total on damage: truncation, garbage, missing xref never throw") {
    val good = PdfCodec.encode(Seq(lorem, lorem), flate = true, xrefStream = true)
    // every truncation point must return, not throw
    Seq(0, 1, 10, good.length / 4, good.length / 2, good.length - 3).foreach { n =>
      val r = PdfCodec.extractText(good.take(n))
      assert(r.nPages >= 0)
    }
    assert(PdfCodec.extractText(Array.fill[Byte](64)(0x41)).nPages == 0)
    assert(PdfCodec.extractText(Array.emptyByteArray).nPages == 0)
    // flipped byte inside the deflate body: recovered pages only, no throw
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x55).toByte
    PdfCodec.extractText(bad) // must not throw
  }

  test("object-stream packing actually packs (dict objects live in the ObjStm)") {
    val xs = PdfCodec.encode(Seq("p1", "p2", "p3"), flate = true, xrefStream = true)
    val classic = PdfCodec.encode(Seq("p1", "p2", "p3"), flate = true)
    val sx = new String(xs, ISO_8859_1)
    val sc = new String(classic, ISO_8859_1)
    assert(sx.contains("/ObjStm") && sx.contains("/XRef"))
    assert(!sc.contains("/ObjStm"))
    // classic writes "1 0 obj" for the catalog in the clear; modern must not
    // (newline-anchored: "11 0 obj" must not satisfy the check)
    assert(sc.contains("\n1 0 obj"))
    assert(!sx.contains("\n1 0 obj"))
    assert(PdfCodec.extractText(xs).pages == Seq("p1", "p2", "p3"))
  }

  test("UTF-16BE BOM title decodes per the text-string rule") {
    // hand-build: title bytes = BOM + UTF-16BE of "Ünïcode"
    val t = "Ünïcode"
    val be = t.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    val strBytes = Array[Byte](0xfe.toByte, 0xff.toByte) ++ be
    val hex = strBytes.map(b => f"${b & 0xff}%02X").mkString
    val objs = Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n",
      s"3 0 obj\n<< /Title <$hex> >>\nendobj\n")
    val body = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { o => val off = body.length; body.append(o); off }
    val xrefOff = body.length
    body.append("xref\n0 4\n0000000000 65535 f \n")
    offsets.foreach(o => body.append(f"$o%010d 00000 n \n"))
    body.append("trailer\n<< /Size 4 /Root 1 0 R /Info 3 0 R >>\n")
    body.append(s"startxref\n$xrefOff\n%%EOF\n")
    assert(PdfCodec.extractText(body.toString.getBytes(ISO_8859_1)).title.contains(t))
  }

  test("ASCIIHexDecode filter chain decodes a content stream") {
    val content = "BT (hexed) Tj ET"
    val hexed = content.getBytes(UTF_8).map(b => f"${b & 0xff}%02x").mkString + ">"
    val objs = Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
      s"4 0 obj\n<< /Length ${hexed.length} /Filter /ASCIIHexDecode >>\nstream\n$hexed\nendstream\nendobj\n")
    val body = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { o => val off = body.length; body.append(o); off }
    val xrefOff = body.length
    body.append("xref\n0 5\n0000000000 65535 f \n")
    offsets.foreach(o => body.append(f"$o%010d 00000 n \n"))
    body.append("trailer\n<< /Size 5 /Root 1 0 R >>\n")
    body.append(s"startxref\n$xrefOff\n%%EOF\n")
    assert(PdfCodec.extractText(body.toString.getBytes(ISO_8859_1)).pages ==
      Seq("hexed"))
  }
}
