package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import java.nio.charset.StandardCharsets.UTF_8

class WikiDumpSpec extends AnyFunSuite {
  import WikiDump._

  private val xml =
    """<mediawiki xml:lang="en">
      |<siteinfo><sitename>Test</sitename></siteinfo>
      |<page>
      |  <title>Alpha &amp; Beta</title>
      |  <ns>0</ns>
      |  <id>12</id>
      |  <revision>
      |    <id>999</id>
      |    <text bytes="40" xml:space="preserve">Body with &lt;tags&gt; &amp; entities</text>
      |  </revision>
      |</page>
      |<page>
      |  <title>Redirected</title>
      |  <ns>0</ns>
      |  <id>13</id>
      |  <redirect title="Alpha &amp; Beta" />
      |  <revision><id>1000</id><text>#REDIRECT [[Alpha &amp; Beta]]</text></revision>
      |</page>
      |<page>
      |  <title>Talk:Alpha</title>
      |  <ns>1</ns>
      |  <id>14</id>
      |  <revision><id>1001</id><text></text></revision>
      |</page>
      |</mediawiki>""".stripMargin

  test("page walk: titles, ns, ids, redirect, entity unescape") {
    val ps = pages(xml)
    assert(ps.length == 3)
    assert(ps(0) == WikiPage("Alpha & Beta", 0, 12L, None,
      "Body with <tags> & entities"))
    assert(ps(1).redirect.contains("Alpha & Beta"))
    assert(ps(1).pageId == 13L)
    assert(ps(2) == WikiPage("Talk:Alpha", 1, 14L, None, ""))
  }

  test("pagesFromBzip2: full .xml.bz2 path incl. multistream") {
    def bz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new BZip2CompressorOutputStream(bos, 9)
      o.write(s.getBytes(UTF_8)); o.close()
      bos.toByteArray
    }
    val half = xml.indexOf("<page>", xml.indexOf("<page>") + 1)
    val multi = bz(xml.substring(0, half)) ++ bz(xml.substring(half))
    val ps = pagesFromBzip2(multi).get
    assert(ps.map(_.title) ==
      Vector("Alpha & Beta", "Redirected", "Talk:Alpha"))
    assert(pagesFromBzip2("not bzip2".getBytes(UTF_8)).isEmpty)
  }

  test("stripMarkup: templates, comments, links, emphasis, headings") {
    val w =
      """== History ==
        |{{Infobox thing|param={{nested}}|x=1}}
        |The '''quick''' ''fox'' ran to [[Rome]] and [[Paris|the city]].
        |<!-- editorial note -->
        |[[File:Map.png|thumb|A map]]
        |* item one
        |# item two""".stripMargin
    val t = stripMarkup(w)
    assert(t.contains("History"))
    assert(!t.contains("=="))
    assert(!t.contains("Infobox") && !t.contains("nested"))
    assert(t.contains("The quick fox ran to Rome and the city."))
    assert(!t.contains("editorial"))
    assert(!t.contains("Map.png") && !t.contains("A map"))
    assert(t.contains("item one") && t.contains("item two"))
    assert(!t.contains("* item") && !t.contains("# item"))
  }

  test("stripMarkup: tables, ref spans, category and interwiki links") {
    val w =
      """Before the table.
        |{| class="wikitable"
        ||-
        |! header !! h2
        || cell {{tmpl}} || [[Link]]
        ||}
        |After the table.
        |A fact<ref name="a">{{cite web|url=x}}</ref> and more<ref group=n />.
        |An unclosed ref is dropped to EOT policy only when unterminated.
        |[[Category:Things]][[fr:Chose]] kept [[de:Ding|the thing]]
        |[[zh-min:x]] gone, [[NotALang:Title]] stays as text""".stripMargin
    val t = stripMarkup(w)
    assert(t.contains("Before the table."))
    assert(t.contains("After the table."))
    assert(!t.contains("wikitable") && !t.contains("header") &&
      !t.contains("cell"))
    assert(t.contains("A fact and more."))
    assert(!t.contains("cite web"))
    assert(!t.contains("Category") && !t.contains("Things"))
    assert(!t.contains("Chose") && !t.contains("fr:"))
    assert(t.contains("kept the thing")) // piped interwiki keeps anchor
    assert(!t.contains("zh-min"))
    assert(t.contains("NotALang:Title")) // uppercase prefix: a real page
    // nested table
    val nested = "x{| outer {| inner |} still outer |}y"
    assert(stripMarkup(nested) == "xy")
    // unterminated ref drops to end (comment stance), table too
    assert(stripMarkup("keep<ref>lost forever") == "keep")
    // self-closing ref with no space
    assert(stripMarkup("a<ref/>b") == "ab")
    // '<reference>' is NOT a ref tag (word boundary)
    assert(stripMarkup("<references />") == "<references />")
  }
}
