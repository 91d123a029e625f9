package graft.functions

import java.nio.charset.StandardCharsets

/** Wikipedia database-dump walk — the `pages-articles.xml.bz2` shape
  * that seeds most open LLM corpora: [[Bzip2Codec]] inflates the
  * (multistream) archive, and this walker scans the export XML for
  * `<page>` elements, extracting title, namespace, page id, the
  * redirect target when present, and the raw wikitext body with XML
  * entities unescaped. A scanning extractor, not a general XML
  * parser, on purpose: the export schema is fixed and flat, dumps are
  * huge, and the walk is single-pass O(bytes) — the same stance as
  * the WARC/WET leg.
  *
  * Also provides [[stripMarkup]], the light wikitext→text rule used
  * for corpus building: templates and comments dropped, links
  * reduced to their anchor text, emphasis/heading markers removed —
  * deterministic and conservative (content never invented, only
  * markers removed).
  */
object WikiDump {

  final case class WikiPage(title: String, ns: Int, pageId: Long,
      redirect: Option[String], text: String)

  private def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "lt" => "<"
            case "gt" => ">"
            case "amp" => "&"
            case "quot" => "\""
            case "apos" => "'"
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try new String(Character.toChars(
                Integer.parseInt(e.substring(2), 16)))
              catch { case _: RuntimeException => null }
            case e if e.startsWith("#") =>
              try new String(Character.toChars(
                Integer.parseInt(e.substring(1))))
              catch { case _: RuntimeException => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** First `<tag …>body</tag>` inside [from, until); (body, endPos). */
  private def element(xml: String, tag: String, from: Int, until: Int)
      : Option[(String, Int)] = {
    val open = xml.indexOf("<" + tag, from)
    if (open < 0 || open >= until) return None
    val gt = xml.indexOf('>', open)
    if (gt < 0 || gt >= until) return None
    if (xml(gt - 1) == '/') return Some(("", gt + 1)) // self-closing
    val close = xml.indexOf("</" + tag + ">", gt + 1)
    if (close < 0 || close >= until) return None
    Some((xml.substring(gt + 1, close), close + tag.length + 3))
  }

  /** Attribute value inside the first `<tag …/>` in range. */
  private def attr(xml: String, tag: String, name: String, from: Int,
      until: Int): Option[String] = {
    val open = xml.indexOf("<" + tag, from)
    if (open < 0 || open >= until) return None
    val gt = xml.indexOf('>', open)
    if (gt < 0 || gt >= until) return None
    val span = xml.substring(open, gt)
    val key = name + "=\""
    val at = span.indexOf(key)
    if (at < 0) return None
    val end = span.indexOf('"', at + key.length)
    if (end < 0) return None
    Some(unescape(span.substring(at + key.length, end)))
  }

  /** All pages of an export XML document. */
  def pages(xml: String): Vector[WikiPage] = {
    val out = Vector.newBuilder[WikiPage]
    var pos = 0
    var going = true
    while (going) {
      val open = xml.indexOf("<page>", pos)
      if (open < 0) going = false
      else {
        val close = xml.indexOf("</page>", open)
        if (close < 0) going = false
        else {
          val until = close
          val title = element(xml, "title", open, until)
            .map(t => unescape(t._1)).getOrElse("")
          val ns = element(xml, "ns", open, until)
            .flatMap(t => t._1.trim.toIntOption).getOrElse(0)
          val id = element(xml, "id", open, until)
            .flatMap(t => t._1.trim.toLongOption).getOrElse(-1L)
          val redirect = attr(xml, "redirect", "title", open, until)
          // the text element lives inside <revision>
          val text = element(xml, "revision", open, until)
            .flatMap { case (rev, _) =>
              element(rev, "text", 0, rev.length).map(t => unescape(t._1))
            }
            .getOrElse("")
          out += WikiPage(title, ns, id, redirect, text)
          pos = close + 7
        }
      }
    }
    out.result()
  }

  /** Inflate a (multistream) `.xml.bz2` dump and walk its pages. */
  def pagesFromBzip2(payload: Array[Byte]): Option[Vector[WikiPage]] =
    Bzip2Codec.decode(payload).map(b =>
      pages(new String(b, StandardCharsets.UTF_8)))

  /** Parse the published multistream companion index
    * (`…-multistream-index.txt`, one `offset:pageId:title` line per
    * page, offsets repeating for the ~100 pages sharing a stream) to
    * the DISTINCT sorted stream offsets — the authoritative split
    * points the foundation ships precisely so readers can parallelize
    * a 20 GB dump without scanning it. Malformed lines are skipped
    * (titles may themselves contain ':'; only the first two fields
    * are positional).
    */
  def parseMultistreamIndex(text: String): Vector[Long] = {
    val seen = scala.collection.mutable.SortedSet.empty[Long]
    text.linesIterator.foreach { line =>
      val c1 = line.indexOf(':')
      if (c1 > 0) {
        line.substring(0, c1).toLongOption.foreach { off =>
          if (off >= 0) seen += off
        }
      }
    }
    seen.toVector
  }

  /** Conservative wikitext→text: drop {{templates}} (nested),
    * <!--comments-->, <ref> footnote spans (paired and self-closing),
    * and {| tables |} (nested — tables are data, not prose); reduce
    * [[target|anchor]]/[[page]] links to their visible text (dropping
    * File:/Category: links and un-piped interwiki/language links
    * entirely); strip ''emphasis'' and ==heading== markers and
    * leading list bullets. Never invents content.
    */
  def stripMarkup(wikitext: String): String = {
    val noComments = {
      val sb = new StringBuilder
      var i = 0
      while (i < wikitext.length) {
        if (wikitext.startsWith("<!--", i)) {
          val e = wikitext.indexOf("-->", i + 4)
          i = if (e < 0) wikitext.length else e + 3
        } else { sb.append(wikitext(i)); i += 1 }
      }
      sb.toString
    }
    // <ref name=..>…</ref> and <ref … /> footnote spans drop whole —
    // before template strip, so {{cite}} bodies inside refs go with
    // them; an unterminated ref drops to end of text (same stance as
    // comments)
    val noRefs = {
      val s = noComments
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.startsWith("<ref", i) &&
          (i + 4 >= s.length || !Character.isLetterOrDigit(s(i + 4)))) {
          val gt = s.indexOf('>', i + 4)
          if (gt < 0) i = s.length
          else if (s(gt - 1) == '/') i = gt + 1 // self-closing
          else {
            val close = s.indexOf("</ref>", gt + 1)
            i = if (close < 0) s.length else close + 6
          }
        } else { sb.append(s(i)); i += 1 }
      }
      sb.toString
    }
    val noTemplates = {
      val s = noRefs
      val sb = new StringBuilder
      var depth = 0
      var i = 0
      while (i < s.length) {
        if (s.startsWith("{{", i)) { depth += 1; i += 2 }
        else if (depth > 0 && s.startsWith("}}", i)) {
          depth -= 1; i += 2
        } else {
          if (depth == 0) sb.append(s(i))
          i += 1
        }
      }
      sb.toString
    }
    // {| tables |} drop whole (nested): wikitables are layout/data,
    // not running prose — the conservative call for a text corpus
    val noTables = {
      val s = noTemplates
      val sb = new StringBuilder
      var depth = 0
      var i = 0
      while (i < s.length) {
        if (s.startsWith("{|", i)) { depth += 1; i += 2 }
        else if (depth > 0 && s.startsWith("|}", i)) { depth -= 1; i += 2 }
        else {
          if (depth == 0) sb.append(s(i))
          i += 1
        }
      }
      sb.toString
    }
    val noLinks = {
      val s = noTables
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.startsWith("[[", i)) {
          val e = s.indexOf("]]", i + 2)
          if (e < 0) { sb.append(s(i)); i += 1 }
          else {
            val inner = s.substring(i + 2, e)
            val colon = inner.indexOf(':')
            val pipe = inner.lastIndexOf('|')
            val mediaOrCat = colon >= 0 && (colon < pipe || pipe < 0) &&
              (inner.startsWith("File:") || inner.startsWith("Image:") ||
                inner.startsWith("Category:"))
            // un-piped [[xx:Title]] is a language/interwiki link (a
            // sidebar pointer, not article text); piped ones render
            // their anchor and keep it
            val interwiki = pipe < 0 &&
              inner.matches("[a-z]{2,3}(-[a-z]+)?:.+")
            if (mediaOrCat || interwiki) () // dropped entirely
            else sb.append(if (pipe >= 0) inner.substring(pipe + 1) else inner)
            i = e + 2
          }
        } else { sb.append(s(i)); i += 1 }
      }
      sb.toString
    }
    noLinks.linesIterator.map { line0 =>
      var line = line0
      // heading markers
      if (line.startsWith("==")) {
        line = line.replaceAll("^=+\\s*", "").replaceAll("\\s*=+$", "")
      }
      // list bullets / indentation markers
      line = line.replaceAll("^[*#:;]+\\s*", "")
      // bold/italic quotes
      line.replace("'''", "").replace("''", "")
    }.mkString("\n")
  }
}
