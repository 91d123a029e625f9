package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scaling evidence for the ranged-split archive read (round-10's
  * WikiSource rework): builds a synthetic MULTISTREAM `.xml.bz2` of N
  * bzip2 streams × P pages, reads it through the production
  * `WikiSource.pages` path (signature scan → extents → per-stream
  * ranged decode), and prints one JSON line with the wall time and the
  * extent fan-out. Run at N and 10N to read the curve: wall should
  * grow ≈ linearly in streams while the per-task memory stays ONE
  * stream — the property the old one-`Array[Byte]`-per-archive shape
  * (hard 2 GiB cap) could not have.
  *
  * Usage: runMain graft.tools.ArchiveScaleCheck [nStreams] [pagesPer]
  */
object ArchiveScaleCheck {
  def main(args: Array[String]): Unit = {
    val nStreams = args.headOption.map(_.toInt).getOrElse(64)
    val pagesPer = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("wiki_scale")
    val file = dir.resolve(s"dump_$nStreams.xml.bz2")
    // deterministic page bodies, ~1 KB each — a stream is ~100 KB raw
    def pageXml(s: Int, p: Int): String = {
      val id = s.toLong * pagesPer + p
      val body = s"stream $s page $p " * 64
      s"<page><title>P $id</title><ns>0</ns><id>${id + 1}</id>" +
        s"<revision><id>${id * 7 + 1}</id><text>$body</text></revision></page>"
    }
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(file), 1 << 20)
    (0 until nStreams).foreach { s =>
      val o = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(out, 1)
      val sb = new StringBuilder
      if (s == 0) sb.append("<mediawiki>\n")
      (0 until pagesPer).foreach(p => sb.append(pageXml(s, p)).append('\n'))
      if (s == nStreams - 1) sb.append("</mediawiki>")
      o.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      o.finish() // member boundary WITHOUT closing the file stream
    }
    out.close()
    val bytes = Files.size(file)

    val extents = graft.sources.WikiSource
      .streamExtents(spark, file.toString).count()
    def timed(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.sources.WikiSource.pages(spark, file.toString).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    timed() // warm
    val (sec, pages) = timed()
    println(s"""{"streams":$nStreams,"extents":$extents,""" +
      s""""bytes":$bytes,"pages":$pages,"sec":$sec}""")
    // cleanup
    Files.deleteIfExists(file); Files.deleteIfExists(dir)
    spark.stop()
  }
}
