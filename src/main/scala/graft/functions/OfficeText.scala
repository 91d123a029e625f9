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
}
