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

  test("multistream archive fans out to one extent per stream; task " +
    "memory is bounded by a stream, never the file") {
    val dir = Files.createTempDirectory("wikisplit")
    val nStreams = 24
    val perStream = 4
    val streams = (0 until nStreams).map { s =>
      bz((if (s == 0) "<mediawiki>\n" else "") +
        (0 until perStream).map { p =>
          val id = s * perStream + p
          page(id + 1, s"Page $id", 0, s"body of page $id " * 50)
        }.mkString("\n") +
        (if (s == nStreams - 1) "\n</mediawiki>" else ""))
    }
    val file = dir.resolve("multi.xml.bz2")
    Files.write(file, streams.reduce(_ ++ _))
    val fileLen = Files.size(file)

    // the split discovers every stream boundary without decoding
    val extents = WikiSource.streamExtents(spark, file.toString).collect()
      .sortBy(_._2)
    assert(extents.length == nStreams,
      s"want $nStreams per-stream extents, got ${extents.length}")
    // extents tile the file exactly: starts at 0, gap-free, ends at EOF
    assert(extents.head._2 == 0L)
    extents.sliding(2).foreach {
      case Array((_, o1, l1), (_, o2, _)) => assert(o1 + l1 == o2)
      case _ => ()
    }
    assert(extents.last._2 + extents.last._3 == fileLen)
    // the bounded-task-memory contract: no task ever materializes more
    // than one stream — far below the whole archive
    val maxExtent = extents.map(_._3).max
    assert(maxExtent < fileLen / 2,
      s"extent $maxExtent not stream-bounded vs file $fileLen")

    // and the split read agrees with a whole-archive decode
    val got = WikiSource.pages(spark, file.toString)
      .collect().map(r => (r.getAs[Long]("page_id"), r.getAs[String]("title"),
        r.getAs[String]("wikitext"))).sortBy(_._1)
    assert(got.length == nStreams * perStream)
    val whole = graft.functions.WikiDump
      .pagesFromBzip2(Files.readAllBytes(file)).get
      .map(p => (p.pageId, p.title, p.text)).sortBy(_._1)
    assert(got.toSeq == whole)
  }

  test("pagesIndexed splits by the published multistream index") {
    val dir = Files.createTempDirectory("wikiindexed")
    val streams = (0 until 6).map { s =>
      bz((if (s == 0) "<mediawiki>\n" else "") +
        page(s + 1, s"Indexed $s", 0, s"indexed body $s") +
        (if (s == 5) "\n</mediawiki>" else ""))
    }
    val dump = dir.resolve("dump.xml.bz2")
    Files.write(dump, streams.reduce(_ ++ _))
    // companion index: offset:pageId:title, one line per page (offsets
    // repeat within a stream in real dumps; exercise dedup via the
    // first stream's mediawiki header page sharing offset 0)
    val offsets = streams.scanLeft(0L)(_ + _.length).init
    val indexText = offsets.zipWithIndex.map { case (off, s) =>
      s"$off:${s + 1}:Indexed $s"
    }.mkString("\n") + "\n0:1:Indexed 0\n not-a-line \n"
    val index = dir.resolve("dump-index.txt.bz2")
    Files.write(index, bz(indexText))
    val got = WikiSource.pagesIndexed(spark, dump.toString, index.toString)
      .collect().map(r => (r.getAs[Long]("page_id"), r.getAs[String]("title")))
      .sortBy(_._1)
    assert(got.toSeq == (0 until 6).map(s => (s + 1L, s"Indexed $s")))
  }
}
