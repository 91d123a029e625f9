package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.functions.WarcCodec

class WarcDeriveSpec extends SparkSpec {

  private def responseArchive(id: Long, html: String,
      gzip: Boolean = false): (String, Array[Byte]) = {
    val recs = Seq(
      WarcCodec.warcinfoRecord(s"<urn:uuid:i$id>", "2026-01-01T00:00:00Z",
        Seq("software" -> "graft")),
      WarcCodec.responseRecord(s"<urn:uuid:r$id>",
        s"https://e.org/page/$id", "2026-01-01T00:00:00Z", 200, "OK",
        "text/html; charset=utf-8", html.getBytes(UTF_8)))
    (s"p$id.warc", WarcCodec.file(recs, gzip))
  }

  test("wet: script/style dropped, whitespace normalized, title included") {
    import spark.implicits._
    val html =
      """<html><head><title>  The   Title </title>
        |<style>p { color: red }</style>
        |<script>var x = "<p>decoy</p>";</script></head>
        |<body>
        |<p>alpha   beta</p>
        |<noscript>no js</noscript>
        |<p>gamma</p>
        |</body></html>""".stripMargin
    val rows = WarcDerive.wet(WarcSource.responses(
      WarcSource.fromBytes(Seq(responseArchive(1L, html)).toDS()))).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.text == "The Title alpha beta gamma")
    assert(r.text_len == r.text.length.toLong)
    assert(r.charset == "utf-8")
    assert(r.target_uri == "https://e.org/page/1")
    assert(r.refers_to == "<urn:uuid:r1>")
  }

  test("wet: non-HTML payload passes through as normalized text") {
    import spark.implicits._
    val recs = Seq(WarcCodec.responseRecord("<urn:uuid:t>",
      "https://e.org/plain", "2026-01-01T00:00:00Z", 200, "OK",
      "text/plain; charset=utf-8", "  raw \n text  ".getBytes(UTF_8)))
    val rows = WarcDerive.wet(WarcSource.responses(WarcSource.fromBytes(
      Seq(("t.warc", WarcCodec.file(recs, gzip = false))).toDS()))).collect()
    assert(rows.head.text == "raw text")
  }

  test("wat: title, resolved links, nofollow-agnostic dst list, json envelope") {
    import spark.implicits._
    val html =
      """<html><head><title>T</title></head><body>
        |<a href="/abs">a</a>
        |<a href="rel/x">b</a>
        |<a href="https://other.org/z">c</a>
        |<a name="anchor-without-href">d</a>
        |</body></html>""".stripMargin
    val rows = WarcDerive.wat(WarcSource.responses(
      WarcSource.fromBytes(Seq(responseArchive(7L, html, gzip = true)).toDS())))
      .collect()
    val r = rows.head
    assert(r.title.contains("T"))
    assert(r.links == Seq("https://e.org/abs", "https://e.org/page/rel/x",
      "https://other.org/z"))
    assert(r.n_links == 3)
    assert(r.meta_json ==
      """{"uri":"https://e.org/page/7","status":200,"content_type":"text/html; charset=utf-8","title":"T","n_links":3}""")
  }

  test("wetFile/watFile: publishable archives re-parse with linkage intact") {
    import spark.implicits._
    val files = (1L to 3L).map(i =>
      responseArchive(i, s"<html><head><title>T$i</title></head>" +
        s"<body><p>body $i</p></body></html>", gzip = i % 2 == 0))
    val responses = WarcSource.responses(WarcSource.fromBytes(files.toDS()))
    val wet = WarcDerive.wet(responses).collect().sortBy(_.target_uri).toSeq
    val wat = WarcDerive.wat(responses).collect().sortBy(_.target_uri).toSeq
    for (gz <- Seq(false, true)) {
      val wetBack = WarcCodec.parseFile(WarcDerive.wetFile(wet, gz))
      assert(wetBack.map(_.warcType) == Seq.fill(3)("conversion"))
      assert(wetBack.map(_.targetUri) == wet.map(_.target_uri))
      assert(wetBack.map(r => new String(r.payload, UTF_8)) == wet.map(_.text))
      val watBack = WarcCodec.parseFile(WarcDerive.watFile(wat, gz))
      assert(watBack.map(_.warcType) == Seq.fill(3)("metadata"))
      assert(watBack.map(_.contentType) == Seq.fill(3)("application/json"))
      assert(watBack.map(r => new String(r.payload, UTF_8)) ==
        wat.map(_.meta_json))
    }
  }

  test("json escaping: quotes, backslashes, control chars in title survive") {
    import spark.implicits._
    val title = """He said "hi" \ bye""" + "\t!"
    val html = s"<html><head><title>$title</title></head><body><p>x</p></body></html>"
    val rows = WarcDerive.wat(WarcSource.responses(
      WarcSource.fromBytes(Seq(responseArchive(9L, html)).toDS()))).collect()
    val r = rows.head
    // whitespace normalization folds the tab into a space
    assert(r.title.contains("""He said "hi" \ bye !"""))
    assert(r.meta_json.contains("""\"hi\""""))
    assert(r.meta_json.contains("""\\ bye"""))
  }
}
