package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import java.nio.charset.StandardCharsets.UTF_8

class Bzip2CodecSpec extends AnyFunSuite {
  import Bzip2Codec._

  private def bz(plain: Array[Byte], level: Int = 9): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new BZip2CompressorOutputStream(bos, level)
    out.write(plain); out.close()
    bos.toByteArray
  }

  test("cross-check: commons-compress writes, we decode, many shapes") {
    val rnd = new scala.util.Random(11)
    val shapes = Seq[Array[Byte]](
      "hello bzip2 world".getBytes(UTF_8),
      ("the quick brown fox " * 500).getBytes(UTF_8), // RUNA/RUNB runs
      Array.fill[Byte](50000)(7), // long single-byte run → RLE1 paths
      ("ab" * 30000).getBytes(UTF_8),
      { val b = new Array[Byte](120000); rnd.nextBytes(b); b }, // >1 block at level 1? no — random, level 9 single block
      (0 until 256).map(_.toByte).toArray,
      "x".getBytes(UTF_8),
      // exactly-4 runs followed by different byte (RLE1 count-0 arm)
      "aaaab aaaabb aaaa".getBytes(UTF_8))
    shapes.foreach { plain =>
      val got = decode(bz(plain)).get
      assert(java.util.Arrays.equals(got, plain),
        s"mismatch on ${plain.length} bytes")
    }
  }

  test("level-1 archive spanning multiple blocks") {
    val rnd = new scala.util.Random(5)
    val plain = new Array[Byte](250000) // > 2×100k blocks at level 1
    rnd.nextBytes(plain)
    val got = decode(bz(plain, level = 1)).get
    assert(java.util.Arrays.equals(got, plain))
  }

  test("multistream concatenation (the Wikipedia dump layout)") {
    val a = "first stream ".getBytes(UTF_8)
    val b = "second stream".getBytes(UTF_8)
    val got = decode(bz(a) ++ bz(b)).get
    assert(new String(got, UTF_8) == "first stream second stream")
  }

  test("CLI bzip2 output decodes too (independent writer)") {
    val tool = java.nio.file.Paths.get("/usr/bin/bzip2")
    val alt = java.nio.file.Paths.get("/root/miniconda/bin/bzip2")
    val bin = if (java.nio.file.Files.isExecutable(tool)) tool
    else alt
    assume(java.nio.file.Files.isExecutable(bin))
    val plain = ("wiki " * 1000).getBytes(UTF_8)
    val p = new ProcessBuilder(bin.toString, "-z", "-c").start()
    p.getOutputStream.write(plain); p.getOutputStream.close()
    val compressed = p.getInputStream.readAllBytes()
    p.waitFor()
    assert(java.util.Arrays.equals(decode(compressed).get, plain))
  }

  test("block CRC tamper, truncation, garbage → None") {
    val good = bz("payload under test, long enough to matter".getBytes(UTF_8))
    assert(decode(null).isEmpty)
    assert(decode("BZh9 but not really".getBytes(UTF_8)).isEmpty)
    assert(decode(java.util.Arrays.copyOfRange(good, 0, good.length - 2)).isEmpty)
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x10).toByte
    assert(decode(bad).isEmpty) // block or stream CRC catches it
    // trailing garbage after a valid stream → strict reject
    assert(decode(good ++ "junk".getBytes(UTF_8)).isEmpty)
  }
}
