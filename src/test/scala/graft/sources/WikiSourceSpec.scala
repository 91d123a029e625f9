package graft.sources

import graft.SparkSpec
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

class WikiSourceSpec extends SparkSpec {

  private def page(id: Long, title: String, ns: Int, text: String,
      redirect: Option[String] = None): String = {
    val r = redirect.map(t => s"""<redirect title="$t" />""").getOrElse("")
    s"""<page>
       |  <title>$title</title>
       |  <ns>$ns</ns>
       |  <id>$id</id>
       |  $r
       |  <revision><id>${id * 7}</id>
       |  <text xml:space="preserve">$text</text></revision>
       |</page>""".stripMargin
  }

  private def bz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new BZip2CompressorOutputStream(bos, 9)
    o.write(s.getBytes(UTF_8)); o.close()
    bos.toByteArray
  }

  test("binaryFile glob → pages across files, multistream, both shapes") {
    val dir = Files.createTempDirectory("wikisrc")
    // file 1: single stream, two pages (one a Talk page)
    Files.write(dir.resolve("part1.xml.bz2"), bz("<mediawiki>" +
      page(1, "Spark", 0, "Apache [[Spark]] is '''fast'''.") +
      page(2, "Talk:Spark", 1, "discussion") + "</mediawiki>"))
    // file 2: MULTISTREAM (the real dump layout) with a redirect page
    Files.write(dir.resolve("part2.xml.bz2"),
      bz("<mediawiki>" + page(3, "BWT", 0, "Burrows-Wheeler {{cn}} transform.")) ++
        bz(page(4, "B-W-T", 0, "#REDIRECT [[BWT]]", Some("BWT")) +
          "</mediawiki>"))
    val all = WikiSource.pages(spark, dir.toString + "/*.xml.bz2")
    assert(all.count() == 4L)
    val docs = WikiSource.documents(spark, dir.toString + "/*.xml.bz2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    // content-only: ns 0 and not a redirect → pages 1 and 3
    assert(docs.map(_._1).toSeq == Seq(1L, 3L))
    assert(docs(0)._3 == "Apache Spark is fast.") // markup stripped
    assert(docs(1)._3 == "Burrows-Wheeler  transform.") // template dropped
  }
}
