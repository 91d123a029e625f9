package graft.jobs

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.functions.WarcCodec
import graft.orchestration.TaskGraph

class CrawlJobsSpec extends SparkSpec {

  private def page(host: String, body: String, links: String): Array[Byte] =
    (s"""<html><head><title>t</title></head><body>
        |<header><nav><a href="/">home</a></nav></header>
        |<article><p>$body</p></article>
        |$links
        |<footer><p>footer text</p></footer></body></html>""".stripMargin)
      .getBytes(UTF_8)

  test("crawl ingest end to end: documents, host graph, polite frontier") {
    val dir = Files.createTempDirectory("crawl_spec")
    val warcDir = dir.resolve("warc"); Files.createDirectory(warcDir)
    val out = dir.resolve("out").toString

    // archive 1: two pages on a.com — one links out to b.org and to an
    // unfetched path; one 404 that must be dropped
    val recs1 = Seq(
      WarcCodec.responseRecord("<urn:uuid:1>", "https://a.com/p1",
        "2026-01-01T00:00:00Z", 200, "OK", "text/html; charset=utf-8",
        page("a.com", "the first article body with enough words to pass",
          """<a href="https://b.org/x">to b</a><a href="/p2">deeper</a>
            |<a href="/secret/x">hidden</a>
            |<a href="https://a.com/p1">self</a>""".stripMargin), chunked = true),
      WarcCodec.responseRecord("<urn:uuid:2>", "https://a.com/gone",
        "2026-01-01T00:00:00Z", 404, "Not Found", "text/html",
        "<p>gone</p>".getBytes(UTF_8)))
    // archive 2: one page on b.org, gzip body, windows-1252 charset
    val recs2 = Seq(
      WarcCodec.responseRecord("<urn:uuid:3>", "https://b.org/x",
        "2026-01-01T00:00:00Z", 200, "OK", "text/html; charset=iso-8859-1",
        ("<html><body><article><p>b page body caf" + "é" +
          " words words</p></article></body></html>").getBytes("windows-1252"),
        gzipBody = true))
    Files.write(warcDir.resolve("a.warc.gz"), WarcCodec.file(recs1, gzip = true))
    Files.write(warcDir.resolve("b.warc"), WarcCodec.file(recs2, gzip = false))
    // archive 3: page-level robots directives — a noindex page (kept
    // out of the corpus, links still followed) and a nofollow page
    // (kept, its outlinks dropped)
    val recs3 = Seq(
      WarcCodec.responseRecord("<urn:uuid:4>", "https://a.com/nx",
        "2026-01-01T00:00:00Z", 200, "OK", "text/html; charset=utf-8",
        ("""<html><head><meta name="robots" content="noindex"></head>""" +
          """<body><article><p>hidden from the corpus</p></article>""" +
          """<a href="/from-nx">follow me</a></body></html>""").getBytes(UTF_8)),
      WarcCodec.responseRecord("<urn:uuid:5>", "https://a.com/nf",
        "2026-01-01T00:00:00Z", 200, "OK", "text/html; charset=utf-8",
        ("""<html><head><meta name="ROBOTS" content="NOFOLLOW"></head>""" +
          """<body><article><p>indexed but unendorsing</p></article>""" +
          """<a href="/from-nf">do not queue</a></body></html>""").getBytes(UTF_8)))
    Files.write(warcDir.resolve("c.warc"), WarcCodec.file(recs3, gzip = false))

    // robots for a.com denies /secret/
    val robotsDir = dir.resolve("robots").toString
    import spark.implicits._
    Seq(("a.com", "User-agent: *\nDisallow: /secret/\n"))
      .toDF("domain", "robots_txt").write.parquet(robotsDir)

    val r = TaskGraph.run(CrawlJobs.ingest(
      warcDir.toString + "/*", out, robotsPath = Some(robotsDir)), spark)
    assert(r.succeeded, r.states)

    val docs = spark.read.parquet(s"$out/documents").collect()
      .map(row => row.getString(row.fieldIndex("url")) ->
        row.getString(row.fieldIndex("main_text"))).toMap
    // 404 AND the meta-noindex page dropped; the nofollow page stays
    assert(docs.keySet == Set("https://a.com/p1", "https://b.org/x",
      "https://a.com/nf"))
    assert(docs("https://a.com/p1") ==
      "the first article body with enough words to pass") // chrome stripped
    assert(docs("https://b.org/x").contains("café")) // 1252 decoded

    val hosts = spark.read.parquet(s"$out/host_graph").collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2))).toSet
    assert(hosts == Set(("a.com", "b.org", 1L))) // self-host links dropped

    val frontier = spark.read.parquet(s"$out/frontier")
      .select("url").collect().map(_.getString(0)).toSet
    // fetched urls and robots-denied /secret/ are out; /p2 and the nav
    // link's site root (unfetched) are due — frontier discovery reads
    // the RAW page, not the extracted article. Neither directive page
    // contributes links: noindex pages leave the pipeline entirely
    // (the documented conservative reading — long-term noindex demotes
    // links anyway), nofollow pages stay but keep their links.
    assert(frontier == Set("https://a.com/p2", "https://a.com/"))

    // WET/WAT companions: faithful to the fetch — the 404 IS included
    val wet = spark.read.parquet(s"$out/wet").collect()
      .map(row => row.getString(row.fieldIndex("target_uri")) ->
        row.getString(row.fieldIndex("text"))).toMap
    assert(wet.keySet == Set("https://a.com/p1", "https://a.com/gone",
      "https://b.org/x", "https://a.com/nx", "https://a.com/nf"))
    assert(wet("https://a.com/gone") == "gone")
    // WET is the FULL visible text (chrome included), unlike documents
    assert(wet("https://a.com/p1").startsWith("t home the first article"))
    assert(wet("https://b.org/x").contains("café"))

    val wat = spark.read.parquet(s"$out/wat")
    val watRow = wat.filter(wat("target_uri") === "https://a.com/p1")
      .collect().head
    assert(watRow.getAs[Long]("n_links") == 5L) // nav + 4 body anchors
    assert(watRow.getAs[String]("title") == "t")
    assert(watRow.getAs[String]("meta_json").contains("\"n_links\":5"))
  }
}
