package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class RobotsRulesSpec extends AnyFunSuite {

  val txt: String =
    """# example per RFC 9309 §2.2/§5
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/public
      |Disallow: /*.pdf$
      |Crawl-delay: 2.5
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  val r: RobotsRules.Robots = RobotsRules.parse(txt)

  test("group selection: named token beats *; unknown agent gets *") {
    assert(r.groupFor("Mozilla compatible graftbot/2.1").exists(_.agents.contains("graftbot")))
    assert(r.groupFor("otherbot").exists(_.agents.contains("otherbot")))
    assert(r.groupFor("randombot").exists(_.agents == Vector("*")))
    assert(!r.allows("randombot", "/anything")) // deny-all group
  }

  test("longest-match precedence and Allow override") {
    assert(!r.allows("graftbot", "/private/x"))
    assert(r.allows("graftbot", "/private/public/doc"))
    assert(r.allows("graftbot", "/open/page"))
  }

  test("wildcard and $ anchor") {
    assert(!r.allows("graftbot", "/a/b.pdf"))
    assert(r.allows("graftbot", "/a/b.pdfx")) // anchor must miss
    assert(RobotsRules.matches("/a*b*c", "/aXXbYYc"))
    assert(!RobotsRules.matches("/a*b*c", "/aXXc"))
    assert(RobotsRules.matches("/a*$", "/a/anything"))
    assert(RobotsRules.matches("/end$", "/end"))
    assert(!RobotsRules.matches("/end$", "/end/"))
    // ordered segments cannot overlap: '/ab*bc' needs a SECOND 'bc'
    assert(!RobotsRules.matches("/ab*bc", "/abc"))
    assert(RobotsRules.matches("/ab*bc", "/abxbc"))
  }

  test("crawl-delay surfaces per group") {
    assert(r.crawlDelay("graftbot").contains(2.5))
    assert(r.crawlDelay("randombot").isEmpty)
  }

  test("most specific agent token wins across groups") {
    val t =
      """User-agent: bot
        |Disallow: /a
        |
        |User-agent: graftbot
        |Disallow: /b
        |""".stripMargin
    val rr = RobotsRules.parse(t)
    // "graftbot" (8) is more specific than "bot" (3) for agent graftbot
    assert(rr.allows("graftbot", "/a"))
    assert(!rr.allows("graftbot", "/b"))
  }

  test("sitemap directives are group-independent discovery seeds") {
    val t =
      """Sitemap: https://e.org/before-any-group.xml
        |User-agent: a
        |Disallow: /x
        |Sitemap: https://e.org/inside.xml
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val rr = RobotsRules.parse(t)
    assert(rr.sitemaps ==
      Vector("https://e.org/before-any-group.xml", "https://e.org/inside.xml"))
    // the directive between rules must not have broken group parsing
    assert(!rr.allows("a", "/x") && rr.allows("a", "/y"))
  }

  test("lenient parsing: comments, stray rules, empty patterns, garbage") {
    val t =
      """Disallow: /ignored-no-group
        |User-agent: a
        |Disallow:
        |NotADirective: x
        |Allow: /ok # trailing comment
        |""".stripMargin
    val rr = RobotsRules.parse(t)
    assert(rr.allows("a", "/anything")) // empty Disallow is a no-op
    assert(rr.allows("a", "/ok"))
    assert(RobotsRules.parse(null).groups.isEmpty)
    assert(RobotsRules.parse("::::\n\n##").groups.isEmpty)
  }

  test("page directives: meta robots tokens, case, none, header union") {
    import RobotsRules.{pageDirectives, PageDirectives}
    def html(content: String) =
      s"""<html><head><meta name="robots" content="$content"></head><body/></html>"""
    assert(pageDirectives(html("noindex")) == PageDirectives(true, false))
    assert(pageDirectives(html("nofollow")) == PageDirectives(false, true))
    assert(pageDirectives(html("noindex, nofollow")) == PageDirectives(true, true))
    assert(pageDirectives(html("NONE")) == PageDirectives(true, true))
    assert(pageDirectives(html("all")) == PageDirectives(false, false))
    assert(pageDirectives(html("noarchive, nosnippet")) == PageDirectives(false, false))
    // no meta at all
    assert(pageDirectives("<html><body><p>x</p></body></html>") ==
      PageDirectives(false, false))
    // other meta names don't count; NAME is case-insensitive
    assert(pageDirectives(
      """<meta name="viewport" content="noindex">""") ==
      PageDirectives(false, false))
    assert(pageDirectives(
      """<meta name="ROBOTS" content="NoIndex">""") ==
      PageDirectives(true, false))
    // multiple metas union; X-Robots-Tag header unions in
    assert(pageDirectives(html("noindex") +
      """<meta name="robots" content="nofollow">""") ==
      PageDirectives(true, true))
    assert(pageDirectives("<html/>", Some("noindex, nofollow")) ==
      PageDirectives(true, true))
  }
}
