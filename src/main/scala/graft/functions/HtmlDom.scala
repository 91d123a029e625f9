package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Dependency-free HTML parser: tokenizer → element tree → the selector
  * subset the reference's scraping actually uses
  * (`pull_new_sales_list.py:123-137`: `find_all("div", class_ contains
  * X)`, `find("a", class_=Y)`, `find("a", href=True)`, `.get(attr)`,
  * script-text iteration). The survey-sanctioned regex family
  * ([[graft.operators.ScrapeParse]]) stays for flat patterns; this path
  * exists because regexes cannot express CONTAINMENT — "ids inside a
  * result card" vs "ids anywhere in the page" (ads, comments, script
  * blobs) diverge exactly when pages carry decoys, and the tree is the
  * only honest scoping (divergence cases are spec-pinned).
  *
  * Parsing model (the WHATWG tokenizer reduced to what static scraping
  * needs, written from the public spec — no code from any parser):
  * tags with double-/single-/un-quoted attributes, void elements,
  * self-closing syntax, comments, doctype/CDATA-ish `<!` bailouts, and
  * raw-text elements (`script`/`style` content runs to the matching
  * case-insensitive close tag — angle brackets inside don't open
  * tags). Error recovery is the lenient scraper posture: an unmatched
  * close tag is ignored; an unclosed element is closed by its
  * ancestor's close or EOF; malformed input never throws.
  *
  * Scale shape: one forward pass, O(bytes) per document, no backtrack;
  * runs inside per-partition Dataset maps exactly like the
  * [[graft.ext.Multimodal]] codecs — a pure scan-stage row transform.
  */
object HtmlDom {

  sealed trait Node
  final case class Text(s: String) extends Node
  final case class Elem(tag: String, attrs: Map[String, String],
      children: Vector[Node]) extends Node {

    /** All descendant elements (pre-order), self excluded. */
    def descendants: Iterator[Elem] = children.iterator.flatMap {
      case e: Elem => Iterator.single(e) ++ e.descendants
      case _ => Iterator.empty
    }

    /** BeautifulSoup `find_all(tag, pred)`: pre-order descendants of
      * `tag` satisfying `pred`.
      */
    def findAll(tag: String, pred: Elem => Boolean = _ => true): Seq[Elem] =
      descendants.filter(e => e.tag == tag && pred(e)).toSeq

    /** BeautifulSoup `find`: first pre-order match or None. */
    def find(tag: String, pred: Elem => Boolean = _ => true): Option[Elem] =
      descendants.find(e => e.tag == tag && pred(e))

    def attr(name: String): Option[String] = attrs.get(name)

    /** Concatenated descendant text (whitespace preserved). */
    def text: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case Text(s) => sb.append(s); ()
        case e: Elem => e.children.foreach(walk)
      }
      children.foreach(walk)
      sb.toString
    }
  }

  /** `class_=lambda c: c and X in c` — the reference's container
    * predicate: class ATTRIBUTE STRING contains the needle (substring,
    * exactly as the lambda tests — not token equality).
    */
  def classContains(needle: String): Elem => Boolean =
    e => e.attrs.get("class").exists(_.contains(needle))

  /** `find("a", href=True)`: attribute present (any value). */
  def hasAttr(name: String): Elem => Boolean = _.attrs.contains(name)

  /** Elements that only ever open (WHATWG void list). */
  private val Void = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** Raw-text elements: content runs to the matching close tag. */
  private val RawText = Set("script", "style", "textarea", "title")

  /** Parse to a synthetic root element (tag "#root"). Never throws on
    * any input; null parses as empty.
    */
  def parse(html: String): Elem = {
    val s = if (html == null) "" else html
    val n = s.length
    // open-element stack: (tag, attrs, children-so-far)
    val stack = ArrayBuffer[(String, Map[String, String], ArrayBuffer[Node])]()
    stack += (("#root", Map.empty, ArrayBuffer[Node]()))

    def closeOne(): Unit = {
      val (tag, attrs, kids) = stack.remove(stack.length - 1)
      stack.last._3 += Elem(tag, attrs, kids.toVector)
      ()
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 3 < n && s.charAt(i + 1) == '!' &&
          s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
        val end = s.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3 // comment dropped
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '!') {
        val end = s.indexOf('>', i) // doctype / CDATA-ish: skip
        i = if (end < 0) n else end + 1
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '/') {
        val end = s.indexOf('>', i)
        if (end < 0) i = n
        else {
          val name = s.substring(i + 2, end).trim.toLowerCase
          // pop to the matching open element; ignore if none (lenient)
          val at = stack.lastIndexWhere(_._1 == name)
          if (at > 0) while (stack.length > at) closeOne()
          i = end + 1
        }
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1).isLetter) {
        val (tag, attrs, selfClosed, next) = parseTag(s, i)
        i = next
        if (Void(tag) || selfClosed) {
          stack.last._3 += Elem(tag, attrs, Vector.empty)
        } else if (RawText(tag)) {
          // raw text: scan for the case-insensitive close tag
          val close = indexOfIgnoreCase(s, "</" + tag, i)
          val end = if (close < 0) n else close
          val body = s.substring(i, end)
          stack.last._3 += Elem(tag, attrs,
            if (body.isEmpty) Vector.empty else Vector(Text(body)))
          i = if (close < 0) n else {
            val gt = s.indexOf('>', close)
            if (gt < 0) n else gt + 1
          }
        } else {
          stack += ((tag, attrs, ArrayBuffer[Node]()))
        }
      } else {
        val next = s.indexOf('<', i + 1)
        val end = if (next < 0) n else next
        val t = s.substring(i, end)
        if (t.nonEmpty) stack.last._3 += Text(t)
        i = end
      }
    }
    while (stack.length > 1) closeOne() // EOF closes unclosed elements
    val (_, _, kids) = stack(0)
    Elem("#root", Map.empty, kids.toVector)
  }

  /** Parse `<tag attr=... >` starting at `start` (pointing at '<').
    * Returns (lowercased tag, attrs, selfClosed, index past '>').
    */
  private def parseTag(s: String, start: Int): (String, Map[String, String], Boolean, Int) = {
    val n = s.length
    var i = start + 1
    val t0 = i
    while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
    val tag = s.substring(t0, i).toLowerCase
    val attrs = Map.newBuilder[String, String]
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') {
            selfClosed = true; i += 2; done = true
          } else i += 1
        case _ =>
          val a0 = i
          while (i < n && !s.charAt(i).isWhitespace &&
              s.charAt(i) != '=' && s.charAt(i) != '>' &&
              s.charAt(i) != '/') i += 1
          val name = s.substring(a0, i).toLowerCase
          while (i < n && s.charAt(i).isWhitespace) i += 1
          var value = ""
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && s.charAt(i).isWhitespace) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i)
              val v0 = i + 1
              val vEnd = s.indexOf(q, v0)
              if (vEnd < 0) { value = s.substring(v0); i = n }
              else { value = s.substring(v0, vEnd); i = vEnd + 1 }
            } else {
              val v0 = i
              while (i < n && !s.charAt(i).isWhitespace &&
                  s.charAt(i) != '>') i += 1
              value = s.substring(v0, i)
            }
          }
          if (name.nonEmpty) attrs += name -> value
      }
    }
    (tag, attrs.result(), selfClosed, i)
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }
}
