package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.functions.WarcCodec
import graft.sources.TxLogTable

class CrawlStreamsSpec extends SparkSpec {

  private def warc(path: java.nio.file.Path, url: String, body: String): Unit = {
    val rec = WarcCodec.responseRecord(s"<urn:uuid:${url.hashCode}>", url,
      "2026-01-01T00:00:00Z", 200, "OK", "text/html; charset=utf-8",
      s"<article><p>$body</p></article>".getBytes(UTF_8))
    Files.write(path, WarcCodec.file(Seq(rec), gzip = true))
    ()
  }

  test("landing archives stream into the txlog table exactly once") {
    val dir = Files.createTempDirectory("crawl_stream")
    val land = dir.resolve("landing"); Files.createDirectory(land)
    val table = dir.resolve("docs").toString
    val ckpt = dir.resolve("ckpt").toString

    warc(land.resolve("a.warc.gz"), "https://a.com/1", "first page body here")
    warc(land.resolve("b.warc.gz"), "https://b.org/2", "second page body here")
    CrawlStreams.ingestWarcStream(spark, land.toString, table, ckpt)
      .awaitTermination()
    val t = new TxLogTable(spark, table)
    val after2 = t.read().collect()
    assert(after2.length == 2)
    val byUrl = after2.map(r => r.getString(r.fieldIndex("url")) ->
      r.getString(r.fieldIndex("main_text"))).toMap
    assert(byUrl("https://a.com/1") == "first page body here")

    // drain again with nothing new: no growth (batch-id dedup + source offsets)
    CrawlStreams.ingestWarcStream(spark, land.toString, table, ckpt)
      .awaitTermination()
    assert(t.read().count() == 2)

    // a third archive lands: exactly its rows append
    warc(land.resolve("c.warc.gz"), "https://c.net/3", "third page body here")
    CrawlStreams.ingestWarcStream(spark, land.toString, table, ckpt)
      .awaitTermination()
    val urls = t.read().select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("https://a.com/1", "https://b.org/2", "https://c.net/3"))

    // annotations landed as columns
    val row = t.read().filter(org.apache.spark.sql.functions.col("url") === "https://c.net/3").collect()(0)
    assert(row.getAs[Number](row.fieldIndex("n_tokens")).longValue() == 4L)
    assert(row.getString(row.fieldIndex("source")) == "c.net")
  }

  test("WET/WAT companions stream into their txlog tables exactly once") {
    val dir = Files.createTempDirectory("wetwat_stream")
    val land = dir.resolve("landing"); Files.createDirectory(land)
    val wetRoot = dir.resolve("wet").toString
    val watRoot = dir.resolve("wat").toString
    val ckpt = dir.resolve("ckpt").toString

    warc(land.resolve("a.warc.gz"), "https://a.com/1", "alpha beta gamma")
    warc(land.resolve("b.warc.gz"), "https://b.org/2", "delta words here")
    CrawlStreams.wetWatStream(spark, land.toString, wetRoot, watRoot, ckpt)
      .awaitTermination()
    val wet = new TxLogTable(spark, wetRoot)
    val wat = new TxLogTable(spark, watRoot)
    assert(wet.read().count() == 2 && wat.read().count() == 2)
    val texts = wet.read().collect()
      .map(r => r.getString(r.fieldIndex("target_uri")) ->
        r.getString(r.fieldIndex("text"))).toMap
    assert(texts("https://a.com/1") == "alpha beta gamma")

    // re-drain: offsets + marker dedup keep both tables fixed
    CrawlStreams.wetWatStream(spark, land.toString, wetRoot, watRoot, ckpt)
      .awaitTermination()
    assert(wet.read().count() == 2 && wat.read().count() == 2)

    // new archive appends one row to EACH side
    warc(land.resolve("c.warc.gz"), "https://c.net/3", "third page body")
    CrawlStreams.wetWatStream(spark, land.toString, wetRoot, watRoot, ckpt)
      .awaitTermination()
    assert(wet.read().count() == 3 && wat.read().count() == 3)
    val wr = wat.read()
      .filter(org.apache.spark.sql.functions.col("target_uri") === "https://c.net/3")
      .collect()(0)
    assert(wr.getString(wr.fieldIndex("meta_json")).contains("\"status\":200"))
  }
}
