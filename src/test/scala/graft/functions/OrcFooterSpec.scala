package graft.functions

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class OrcFooterSpec extends SparkSpec {
  import OrcFooter._

  private def writeOrc(compression: String): Array[Byte] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("orcfooter").toString + "/t"
    (0L until 800L)
      .map(i => (i, if (i % 5 == 0) None else Some(i * 2 - 300), s"v${i % 9}"))
      .toDF("id", "v", "s").coalesce(1)
      .write.option("compression", compression).orc(dir)
    val file = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".orc")).head
    Files.readAllBytes(Paths.get(file))
  }

  private def check(m: OrcMeta): Unit = {
    assert(m.numRows == 800L)
    assert(m.stripeRows.sum == 800L)
    assert(m.columns.map(c => (c.name, c.kind)) ==
      Vector(("id", "LONG"), ("v", "LONG"), ("s", "STRING")))
    val id = m.columns(0)
    assert(id.numValues == 800L && !id.hasNull)
    assert(id.intMin.contains(0L) && id.intMax.contains(799L))
    assert(id.intSum.contains((0L until 800L).sum))
    val v = m.columns(1)
    val present = (0L until 800L).filter(_ % 5 != 0).map(_ * 2 - 300)
    assert(v.numValues == present.length.toLong && v.hasNull)
    assert(v.intMin.contains(present.min)) // negative → sint decode
    assert(v.intMax.contains(present.max))
    assert(v.intSum.contains(present.sum))
    val s = m.columns(2)
    assert(s.numValues == 800L && s.intMin.isEmpty)
  }

  test("zlib footer: chunked raw-deflate framing decodes") {
    val m = footer(writeOrc("zlib")).get
    assert(m.compression == "ZLIB")
    check(m)
  }

  test("uncompressed footer") {
    val m = footer(writeOrc("none")).get
    assert(m.compression == "NONE")
    check(m)
  }

  test("snappy footer via our raw-block decode") {
    val m = footer(writeOrc("snappy")).get
    assert(m.compression == "SNAPPY")
    check(m)
  }

  test("zstd footer via the classpath zstd-jni") {
    val m = footer(writeOrc("zstd")).get
    assert(m.compression == "ZSTD")
    check(m)
  }

  test("total on garbage and truncation") {
    assert(footer(null).isEmpty)
    assert(footer("ORC but not really".getBytes).isEmpty)
    val good = writeOrc("none")
    assert(footer(java.util.Arrays.copyOfRange(good, 0, good.length / 3)).isEmpty)
    val bad = good.clone()
    bad(bad.length - 1) = 100 // lie about postscript length
    assert(footer(bad).isEmpty)
  }
}
