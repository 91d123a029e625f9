package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FrontierLinkSpec extends SparkSpec {

  test("frontier schedule: per-domain serialization, spacing, one Exchange") {
    import spark.implicits._
    val urls = Seq(
      ("https://a.com/2", 5, 1000L),
      ("https://a.com/1", 9, 1000L),
      ("https://www.a.com/3", 1, 1000L), // same registrable domain as a.com
      ("https://b.org/x", 7, 200L))
      .toDF("url", "prio", "delay_ms")
    val plan = Frontier.schedule(urls, "url", col("prio"), col("delay_ms"), 8)
    val rows = plan.select("url", "domain", "seq", "fetch_offset_ms")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSeq
    val byUrl = rows.map(t => t._1 -> t).toMap
    // a.com serializes all three (www.a.com folds in), priority desc
    assert(byUrl("https://a.com/1")._3 == 1 && byUrl("https://a.com/1")._4 == 0L)
    assert(byUrl("https://a.com/2")._3 == 2 && byUrl("https://a.com/2")._4 == 1000L)
    assert(byUrl("https://www.a.com/3")._3 == 3 && byUrl("https://www.a.com/3")._4 == 2000L)
    assert(byUrl("https://b.org/x")._3 == 1 && byUrl("https://b.org/x")._4 == 0L)
    // one shuffle: the domain window's Exchange and nothing else
    val allEx = "Exchange".r.findAllIn(plan.queryExecution.executedPlan.toString).length
    assert(allEx == 1, s"expected 1 Exchange, plan had $allEx\n${plan.queryExecution.executedPlan}")
  }

  test("href resolution: RFC 3986 arms and pseudo-link drops") {
    val base = "https://h.example/a/b/page.html"
    assert(LinkGraph.resolve(base, "https://x.org/q").contains("https://x.org/q"))
    assert(LinkGraph.resolve(base, "/top").contains("https://h.example/top"))
    assert(LinkGraph.resolve(base, "c.html").contains("https://h.example/a/b/c.html"))
    assert(LinkGraph.resolve(base, "../c.html").contains("https://h.example/a/c.html"))
    assert(LinkGraph.resolve(base, "../../../c").contains("https://h.example/c")) // climb past root clamps
    assert(LinkGraph.resolve(base, "./d/").contains("https://h.example/a/b/d/"))
    assert(LinkGraph.resolve(base, "//cdn.example/x").contains("https://cdn.example/x"))
    assert(LinkGraph.resolve("http://h.example/", "//cdn.example/x").contains("http://cdn.example/x"))
    assert(LinkGraph.resolve(base, "#frag").isEmpty)
    assert(LinkGraph.resolve(base, "javascript:void(0)").isEmpty)
    assert(LinkGraph.resolve(base, "mailto:a@b.c").isEmpty)
    assert(LinkGraph.resolve(base, "").isEmpty)
    assert(LinkGraph.resolve("nonsense-base", "x").isEmpty)
  }

  test("links: DOM scoping, nofollow token, anchor normalization") {
    val html =
      """<script>var a='<a href="https://decoy.example/">d</a>';</script>
        |<a href="/one" rel="noopener nofollow">  First
        |   Link </a><a href="/two" rel="noopener">second</a>
        |<a name="no-href-anchor">not a link</a>""".stripMargin
    val ls = LinkGraph.links("https://s.example/p", html)
    assert(ls.map(_.dst_url) == Seq("https://s.example/one", "https://s.example/two"))
    assert(ls(0).nofollow && !ls(1).nofollow)
    assert(ls(0).anchor == "First Link")
  }

  test("host graph: aggregation, self-loop drop, follow counts") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.com/p1", """<a href="https://b.com/x">1</a><a href="https://b.com/y" rel="nofollow">2</a><a href="/self">3</a>"""),
      ("https://a.com/p2", """<a href="https://b.com/z">4</a>""")).toDF("url", "html")
    val g = LinkGraph.hostGraph(LinkGraph.edges(pages, "url", "html"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(g.toSeq == Seq(("a.com", "b.com", 3L, 2L)))
  }
}
