package graft.operators

import graft.SparkSpec

class PaginationSpec extends SparkSpec {
  import spark.implicits._

  private def page(url: String, next: Option[String], n: Int): (String, String) = {
    val nextField = next.map(u => s""","next":"$u"""").getOrElse("")
    url ->
      s"""<script>window.jsonModel = {"n":$n,"pagination":{"page":$n$nextField}};</script>"""
  }

  test("paginationChain follows next links in order and stops at chain end") {
    val pages = Seq(
      page("p1", Some("p2"), 1), page("p2", Some("p3"), 2),
      page("p3", None, 3), page("zz", Some("p1"), 9)
    ).toDF("url", "html")
    val chain = ScrapeParse.paginationChain(pages, "url", "html", "p1")
      .select("page_idx", "url").as[(Int, String)].collect().toSeq
    assert(chain == Seq((0, "p1"), (1, "p2"), (2, "p3")))
  }

  test("paginationChain survives cycles, dangling links, and honors the cap") {
    val cyc = Seq(page("a", Some("b"), 1), page("b", Some("a"), 2))
      .toDF("url", "html")
    assert(ScrapeParse.paginationChain(cyc, "url", "html", "a").count() == 2)
    assert(ScrapeParse.paginationChain(cyc, "url", "html", "a", maxPages = 1)
      .count() == 1)
    val dangle = Seq(page("a", Some("missing"), 1)).toDF("url", "html")
    assert(ScrapeParse.paginationChain(dangle, "url", "html", "a").count() == 1)
  }
}
