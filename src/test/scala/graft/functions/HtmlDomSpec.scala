package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlDom._

class HtmlDomSpec extends AnyFunSuite {

  test("tree structure: nesting, attributes in all three quote styles, voids, self-closing") {
    val root = parse(
      """<div id=main class="a b" data-x='y'>
        |  <p>one<br>two</p>
        |  <img src="i.png"/>
        |</div>""".stripMargin)
    val div = root.find("div").get
    assert(div.attrs === Map("id" -> "main", "class" -> "a b", "data-x" -> "y"))
    val p = div.find("p").get
    assert(p.text === "onetwo") // br is void: doesn't swallow "two"
    assert(p.findAll("br").length === 1)
    assert(div.findAll("img").length === 1)
    assert(root.descendants.map(_.tag).toSeq === Seq("div", "p", "br", "img"))
  }

  test("raw-text elements: markup inside script/style is NOT parsed as tags") {
    val root = parse(
      """<body><script>if (a<b) { x = "<div>"; }</script>
        |<style>p > a { color: red }</style><p>real</p></body>""".stripMargin)
    assert(root.findAll("div").isEmpty, "div inside script leaked into the tree")
    assert(root.find("script").get.text.contains("\"<div>\""))
    assert(root.findAll("p").map(_.text) === Seq("real"))
    // close tag match is case-insensitive
    val r2 = parse("<script>x</SCRIPT><p>after</p>")
    assert(r2.findAll("p").map(_.text) === Seq("after"))
  }

  test("comments and doctype are dropped; their content never matches") {
    val root = parse(
      "<!DOCTYPE html><body><!-- <a href='/properties/111'>x</a> --><p>t</p></body>")
    assert(root.findAll("a").isEmpty)
    assert(root.find("p").get.text === "t")
  }

  test("lenient recovery: unmatched close ignored, unclosed elements closed by ancestor/EOF") {
    val root = parse("<div><p>a</span><b>c</div><i>tail")
    val div = root.find("div").get
    assert(div.find("p").isDefined) // </span> ignored, p still open then
    assert(div.find("b").exists(_.text === "c")) // </div> closes p and b
    assert(root.find("i").exists(_.text === "tail")) // EOF closes i
    assert(parse(null).children.isEmpty)
    assert(parse("<").findAll("a").isEmpty) // truncated input never throws
    assert(parse("<div class=").findAll("div").nonEmpty)
  }

  test("selector subset: classContains is the reference lambda, hasAttr is href=True") {
    val root = parse(
      """<div class="x l-searchResult y"><a class="propertyCard-link" href="/p/1">v</a></div>
        |<div class="other"><a href="/p/2">w</a></div>""".stripMargin)
    val cards = root.findAll("div", classContains("l-searchResult"))
    assert(cards.length === 1)
    assert(cards.head.find("a", classContains("propertyCard-link"))
      .flatMap(_.attr("href")) === Some("/p/1"))
    assert(root.findAll("a", hasAttr("href")).length === 2)
    assert(root.findAll("a", hasAttr("download")).isEmpty)
  }

  test("divergence: DOM scoping rejects the decoys the whole-page regex reports") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    // one listing card (id 1000) + three decoys: footer link (777),
    // comment (888), script blob (999)
    val html =
      """<html><head><script>var u="/properties/999";</script></head><body>
        |<div class="l-searchResult"><a class="propertyCard-link" href="/properties/1000">v</a></div>
        |<!-- /properties/888 -->
        |<footer><a href="/properties/777">old</a></footer>
        |</body></html>""".stripMargin
    val pages = Seq((1L, html)).toDF("doc_id", "html")
    val dom = graft.operators.ScrapeParse
      .propertyIdsDom(pages, "doc_id", "html")
      .collect().map(_.getString(1)).toSet
    val regex = graft.operators.ScrapeParse
      .propertyIds(pages, "doc_id", "html")
      .collect().map(_.getString(1)).toSet
    assert(dom === Set("1000"), "DOM path must see only the card id")
    assert(regex === Set("1000", "777", "888", "999"),
      "regex path reports every decoy — the divergence that motivates the tree")
  }

  test("reference fallback order: propertyCard-link without href is skipped, not replaced") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    // card 1: propertyCard-link present but hrefless → reference does
    // NOT fall back to the other a[href]; card 2: no propertyCard-link
    // → falls back to first a[href]
    val html =
      """<div class="l-searchResult"><a class="propertyCard-link">x</a><a href="/properties/5">y</a></div>
        |<div class="l-searchResult"><span><a href="/properties/6">z</a></span></div>""".stripMargin
    val got = graft.operators.ScrapeParse
      .propertyIdsDom(Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect().map(_.getString(1)).toSet
    assert(got === Set("6"))
  }
}
