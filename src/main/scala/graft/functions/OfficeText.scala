package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

/** Text extraction for the ZIP-packaged document formats a crawl's
  * office/ebook tail is made of: DOCX (OOXML WordprocessingML) and
  * EPUB (zipped XHTML spine). Both compose [[ZipCodec]] with the
  * in-house markup walkers — no office suite, no external XML stack.
  *
  * DOCX rule (what every extractor implements): text lives in `<w:t>`
  * runs inside `<w:p>` paragraphs of `word/document.xml`; runs
  * concatenate within a paragraph, paragraphs join with a newline.
  * `<w:tab/>` → tab, `<w:br/>` → newline, everything else is
  * formatting to ignore. XML entities unescaped. EPUB rule: every
  * `.xhtml`/`.html` member in archive order through the WET
  * visible-text walk ([[graft.sources.WarcDerive.pageText]] shape).
  *
  * Totality: not-a-zip / missing parts / damaged members → None (or
  * the members that parse), the codec-tier contract.
  */
object OfficeText {

  private def unescapeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              scala.util.Try(Integer.parseInt(ent.drop(2), 16))
                .toOption.map(cp => new String(Character.toChars(cp)))
            case _ if ent.startsWith("#") =>
              scala.util.Try(ent.drop(1).toInt)
                .toOption.map(cp => new String(Character.toChars(cp)))
            case _ => None
          }
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Paragraph list of one WordprocessingML document part. */
  def wordprocessingParagraphs(xml: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val para = new StringBuilder
    var i = 0
    var inPara = false
    while (i < xml.length) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = xml.length }
      else {
        val gt = xml.indexOf('>', lt + 1)
        if (gt < 0) { i = xml.length }
        else {
          val tag = xml.substring(lt + 1, gt)
          if (tag.startsWith("w:p ") || tag == "w:p") {
            inPara = true; para.clear()
          } else if (tag == "/w:p") {
            if (inPara) out += para.toString
            inPara = false
          } else if (inPara &&
              (tag.startsWith("w:t ") || tag == "w:t")) {
            val close = xml.indexOf("</w:t>", gt + 1)
            if (close >= 0) {
              para.append(unescapeXml(xml.substring(gt + 1, close)))
              i = close + 6
            }
          } else if (inPara && (tag == "w:tab/" || tag.startsWith("w:tab "))) {
            para.append('\t')
          } else if (inPara && (tag == "w:br/" || tag.startsWith("w:br "))) {
            para.append('\n')
          }
          if (i <= gt) i = gt + 1
        }
      }
    }
    out.result()
  }

  /** DOCX → paragraphs joined by `\n`. None when the archive has no
    * readable `word/document.xml`.
    */
  def docxText(bytes: Array[Byte]): Option[String] =
    ZipCodec.entries(bytes).find(_.name == "word/document.xml")
      .flatMap(e => ZipCodec.read(bytes, e))
      .map(xml => wordprocessingParagraphs(new String(xml, UTF_8)).mkString("\n"))

  /** EPUB (or any zipped-HTML container) → per-member visible text in
    * archive order, [[graft.sources.WarcDerive.pageText]] semantics.
    */
  def epubText(bytes: Array[Byte]): Seq[(String, String)] =
    ZipCodec.readAll(bytes).collect {
      case (name, data) if name.endsWith(".xhtml") || name.endsWith(".html") =>
        name -> graft.sources.WarcDerive.pageText(new String(data, UTF_8))
    }

  // ── XLSX (SpreadsheetML) ───────────────────────────────────────────

  /** One sheet cell: 0-based row/col and the cell's text value
    * (shared-string resolved, inline string, or the raw numeric `<v>`).
    */
  final case class Cell(row: Int, col: Int, value: String)

  /** Column letters of an A1 reference → 0-based column. */
  private def colOf(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    c - 1
  }

  private def rowOf(ref: String): Int = {
    val digits = ref.dropWhile(_.isLetter)
    if (digits.isEmpty) 0 else digits.toInt - 1
  }

  /** The shared-string table: `<si>` items, each either one `<t>` or
    * rich-text `<r><t>` runs (concatenated).
    */
  def sharedStrings(xml: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (true) {
      val si = xml.indexOf("<si>", i)
      if (si < 0) return out.result()
      val end = xml.indexOf("</si>", si)
      if (end < 0) return out.result()
      val item = xml.substring(si, end)
      val sb = new StringBuilder
      var j = 0
      var going = true
      while (going) {
        val t0 = item.indexOf("<t", j)
        if (t0 < 0) going = false
        else {
          val gt = item.indexOf('>', t0)
          val t1 = item.indexOf("</t>", gt)
          if (gt < 0 || t1 < 0) going = false
          else {
            sb.append(unescapeXml(item.substring(gt + 1, t1)))
            j = t1 + 4
          }
        }
      }
      out += sb.toString
      i = end + 5
    }
    out.result()
  }

  /** Cells of one worksheet part, shared strings resolved. Handles
    * `t="s"` (shared), `t="inlineStr"` (`<is><t>`), `t="str"` and
    * untyped numeric (`<v>` verbatim).
    */
  def sheetCells(xml: String, shared: Vector[String]): Seq[Cell] = {
    val out = Seq.newBuilder[Cell]
    var i = 0
    var going = true
    while (going) {
      val c0 = xml.indexOf("<c ", i)
      if (c0 < 0) going = false
      else {
        val gt = xml.indexOf('>', c0)
        if (gt < 0) going = false
        else {
          val attrs = xml.substring(c0 + 3, if (xml.charAt(gt - 1) == '/') gt - 1 else gt)
          def attr(name: String): Option[String] = {
            val k = attrs.indexOf(name + "=\"")
            if (k < 0) None
            else {
              val v0 = k + name.length + 2
              val v1 = attrs.indexOf('"', v0)
              if (v1 < 0) None else Some(attrs.substring(v0, v1))
            }
          }
          val ref = attr("r").getOrElse("")
          val typ = attr("t").getOrElse("")
          if (xml.charAt(gt - 1) == '/') { i = gt + 1 } // empty cell
          else {
            val cEnd = xml.indexOf("</c>", gt)
            if (cEnd < 0) going = false
            else {
              val body = xml.substring(gt + 1, cEnd)
              val value: Option[String] = typ match {
                case "inlineStr" =>
                  val t0 = body.indexOf("<t")
                  val g = if (t0 >= 0) body.indexOf('>', t0) else -1
                  val t1 = if (g >= 0) body.indexOf("</t>", g) else -1
                  if (t1 >= 0) Some(unescapeXml(body.substring(g + 1, t1))) else None
                case _ =>
                  val v0 = body.indexOf("<v>")
                  val v1 = if (v0 >= 0) body.indexOf("</v>", v0) else -1
                  if (v1 < 0) None
                  else {
                    val raw = unescapeXml(body.substring(v0 + 3, v1))
                    if (typ == "s")
                      scala.util.Try(shared(raw.trim.toInt)).toOption
                    else Some(raw)
                  }
              }
              value.foreach(v => out += Cell(rowOf(ref), colOf(ref), v))
              i = cEnd + 4
            }
          }
        }
      }
    }
    out.result()
  }

  /** XLSX → every cell of every worksheet part under `xl/worksheets/`
    * (archive order), shared strings resolved. Empty when not an XLSX.
    */
  def xlsxCells(bytes: Array[Byte]): Seq[Cell] = {
    val parts = ZipCodec.readAll(bytes)
    val shared = parts.collectFirst {
      case (n, d) if n == "xl/sharedStrings.xml" =>
        sharedStrings(new String(d, UTF_8))
    }.getOrElse(Vector.empty)
    parts.collect {
      case (n, d) if n.startsWith("xl/worksheets/") && n.endsWith(".xml") =>
        sheetCells(new String(d, UTF_8), shared)
    }.flatten
  }

  // ── fixture writer (spec/oracle side) ──────────────────────────────

  private def escapeXml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Minimal structurally-valid DOCX: content types, package rels, and
    * the document part with one `<w:p>`/`<w:r>`/`<w:t>` per paragraph
    * (`xml:space="preserve"` so edge whitespace survives).
    */
  def docxBytes(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p =>
      s"""<w:p><w:r><w:t xml:space="preserve">${escapeXml(p)}</w:t></w:r></w:p>""")
      .mkString
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        s"<w:body>$body</w:body></w:document>"
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
        """</Types>"""
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
        """</Relationships>"""
    ZipCodec.zipBytes(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes(UTF_8),
      "_rels/.rels" -> rels.getBytes(UTF_8),
      "word/document.xml" -> doc.getBytes(UTF_8)))
  }

  /** Minimal structurally-valid XLSX: string cells go through a REAL
    * shared-string table (the path every producer uses), numeric cells
    * stay untyped `<v>`; one sheet. `cells` are (row, col, value,
    * isNumeric).
    */
  def xlsxBytes(cells: Seq[(Int, Int, String, Boolean)]): Array[Byte] = {
    val sharedVals = cells.collect { case (_, _, v, false) => v }.distinct
    val sharedIdx = sharedVals.zipWithIndex.toMap
    def ref(row: Int, col: Int): String = {
      var c = col + 1
      val sb = new StringBuilder
      while (c > 0) { sb.insert(0, ('A' + (c - 1) % 26).toChar); c = (c - 1) / 26 }
      sb.toString + (row + 1)
    }
    val rows = cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (r, cs) =>
      val cellsXml = cs.sortBy(_._2).map { case (row, col, v, isNum) =>
        if (isNum) s"""<c r="${ref(row, col)}"><v>${escapeXml(v)}</v></c>"""
        else s"""<c r="${ref(row, col)}" t="s"><v>${sharedIdx(v)}</v></c>"""
      }.mkString
      s"""<row r="${r + 1}">$cellsXml</row>"""
    }.mkString
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        s"<sheetData>$rows</sheetData></worksheet>"
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedVals.length}" uniqueCount="${sharedVals.length}">""" +
        sharedVals.map(v =>
          s"""<si><t xml:space="preserve">${escapeXml(v)}</t></si>""").mkString +
        "</sst>"
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
        """</Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
        """</Types>"""
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    ZipCodec.zipBytes(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes(UTF_8),
      "_rels/.rels" -> rels.getBytes(UTF_8),
      "xl/workbook.xml" -> workbook.getBytes(UTF_8),
      "xl/_rels/workbook.xml.rels" -> wbRels.getBytes(UTF_8),
      "xl/sharedStrings.xml" -> sst.getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8)))
  }
}
