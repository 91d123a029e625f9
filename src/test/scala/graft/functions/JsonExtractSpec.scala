package graft.functions

import graft.SparkSpec
import graft.operators.ScrapeParse

class JsonExtractSpec extends SparkSpec {
  import spark.implicits._
  import JsonExtract.extractBalancedJson

  test("nested braces") {
    val html = """window.jsonModel = {"a":{"b":{"c":1}},"d":2};</script>"""
    assert(extractBalancedJson(html, "window.jsonModel") ==
      """{"a":{"b":{"c":1}},"d":2}""")
  }

  test("braces inside JSON strings don't break depth") {
    val html = """window.jsonModel = {"text":"}{"," x":"{{{"};rest"""
    assert(extractBalancedJson(html, "window.jsonModel") ==
      """{"text":"}{"," x":"{{{"}""")
  }

  test("escaped quotes inside strings") {
    val html = """m = {"a":"say \"}{\" ok","b":1} tail"""
    assert(extractBalancedJson(html, "m =") == """{"a":"say \"}{\" ok","b":1}""")
  }

  test("missing marker / unbalanced → null") {
    assert(extractBalancedJson("no marker here", "window.jsonModel") == null)
    assert(extractBalancedJson("m = {\"a\": {", "m =") == null)
    assert(extractBalancedJson(null, "m") == null)
  }

  test("column pipeline: jsonModel + pagination.next") {
    val pages = Seq(
      ("p1", """<script>window.jsonModel = {"pagination":{"next":"48"},"n":2}</script>"""),
      ("p2", """<script>no model</script>"""))
      .toDF("page", "html")
    val out = ScrapeParse.jsonModel(pages, "html")
      .select("page", "pagination_next").as[(String, Option[String])]
      .collect().toMap
    assert(out("p1").contains("48"))
    assert(out("p2").isEmpty)
  }
}
