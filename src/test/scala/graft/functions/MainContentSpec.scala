package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class MainContentSpec extends AnyFunSuite {

  test("chrome pruned, article paragraphs extracted") {
    val html =
      """<html><body>
        |<header><nav><a href="/">home</a><a href="/b">blog</a></nav></header>
        |<div class="sidebar"><p>subscribe now for more of everything</p></div>
        |<article><p>First real paragraph with enough text.</p>
        |<p>Second real paragraph, also substantial enough.</p></article>
        |<footer><p>copyright</p></footer>
        |</body></html>""".stripMargin
    assert(MainContent.extract(html) ==
      "First real paragraph with enough text.\nSecond real paragraph, also substantial enough.")
  }

  test("link-dense related block loses to shorter plain article") {
    val html =
      """<div class="linkbox"><p><a href="/1">this related headline is actually longer than the article body</a>
        |<a href="/2">and this second related headline is longer still by a distance</a></p></div>
        |<div id="post"><p>Short but real article text.</p></div>""".stripMargin
    assert(MainContent.extract(html) == "Short but real article text.")
  }

  test("marker classes and ids prune whole subtrees") {
    val html =
      """<div id="comments-area"><p>comment one is long long long long long</p>
        |<p>comment two is also long long long long</p></div>
        |<div class="ad-box"><p>buy buy buy buy buy buy buy buy buy buy</p></div>
        |<div class="content"><p>The genuine article body text here.</p></div>""".stripMargin
    assert(MainContent.extract(html) == "The genuine article body text here.")
    // marker must match as a token: class "shadow" is NOT "ad"
    val ok = """<div class="shadow"><p>Tokens matter for marker matching.</p></div>"""
    assert(MainContent.extract(ok) == "Tokens matter for marker matching.")
  }

  test("script decoy markup never surfaces; whitespace normalized") {
    val html =
      "<script>var x = \"<p>decoy paragraph that must not appear</p>\";</script>" +
        "<div><p>  spaced\n   out\t words  </p></div>"
    assert(MainContent.extract(html) == "spaced out words")
  }

  test("document order breaks score ties; fallback when no paragraphs") {
    val html = "<div><p>alpha beta</p></div><div><p>gamma delt</p></div>"
    // equal scores (10 chars each): first container in document order wins
    assert(MainContent.extract(html) == "alpha beta")
    assert(MainContent.extract("<div>bare text, no paragraph tags</div>") ==
      "bare text, no paragraph tags")
    assert(MainContent.extract("") == "")
    assert(MainContent.extract(null) == "")
  }

  test("nested container: deepest scoring parent owns its paragraphs") {
    val html =
      """<div id="outer"><div id="inner"><p>Inner paragraph body one here.</p>
        |<p>Inner paragraph body two here.</p></div></div>""".stripMargin
    assert(MainContent.extract(html) ==
      "Inner paragraph body one here.\nInner paragraph body two here.")
  }
}
