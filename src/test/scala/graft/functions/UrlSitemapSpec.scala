package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class UrlSitemapSpec extends SparkSpec {

  test("host/domain/shard/path over the URL shapes") {
    import spark.implicits._
    val urls = Seq(
      "https://www.blog.site.co.uk/a/b?q=1#f",
      "http://user:pw@api.example.com:8443/v1/x",
      "https://10.1.2.3/raw",
      "ftp://files.example.org",
      "/relative/path",
      "https://localhost/x").toDF("url")
    val out = urls
      .withColumn("host", UrlFunctions.host(col("url")))
      .withColumn("domain", UrlFunctions.registrableDomain(col("host")))
      .withColumn("path", UrlFunctions.path(col("url")))
      .withColumn("shard", UrlFunctions.crawlShard(col("domain"), 16))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(out(0) == (("www.blog.site.co.uk", "site.co.uk", "/a/b")))
    assert(out(1) == (("api.example.com", "example.com", "/v1/x")))
    assert(out(2) == (("10.1.2.3", "10.1.2.3", "/raw")))
    assert(out(3) == (("files.example.org", "example.org", "/")))
    assert(out(4) == ((null, null, null)))
    assert(out(5) == (("localhost", "localhost", "/x")))
  }

  test("crawl shard: same domain → same shard, in range, null-safe") {
    import spark.implicits._
    val df = Seq("a.com", "a.com", "b.com", null).toDF("d")
      .withColumn("s", UrlFunctions.crawlShard(col("d"), 8))
    val s = df.collect().map(r => if (r.isNullAt(1)) -1L else r.getLong(1))
    assert(s(0) == s(1))
    assert(s.take(3).forall(v => v >= 0 && v < 8))
    assert(s(3) == -1L)
  }

  test("sitemap urlset parses; missing fields degrade to None") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://e.org/1</loc><lastmod>2026-02-03</lastmod>
        |<changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc> https://e.org/2 </loc></url>
        |<url><priority>0.5</priority></url>
        |<url><loc>https://e.org/3</loc><priority>high</priority></url>
        |</urlset>""".stripMargin
    val es = Sitemap.parse(xml)
    assert(es.map(_.loc) == Seq("https://e.org/1", "https://e.org/2", "https://e.org/3"))
    assert(es(0).priority.contains(0.8))
    assert(es(0).lastmod.contains("2026-02-03"))
    assert(es(1).lastmod.isEmpty && es(1).priority.isEmpty)
    assert(es(2).priority.isEmpty) // non-numeric priority → None, no throw
  }

  test("sitemapindex locs; garbage input is empty not thrown") {
    val idx =
      """<sitemapindex><sitemap><loc>https://e.org/s1.xml</loc></sitemap>
        |<sitemap><loc>https://e.org/s2.xml</loc></sitemap></sitemapindex>""".stripMargin
    assert(Sitemap.indexLocs(idx) == Seq("https://e.org/s1.xml", "https://e.org/s2.xml"))
    assert(Sitemap.parse("<<<not xml").isEmpty)
    assert(Sitemap.indexLocs(null).isEmpty)
  }
}
