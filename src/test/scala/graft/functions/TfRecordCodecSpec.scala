package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class TfRecordCodecSpec extends AnyFunSuite {
  import TfRecordCodec._

  test("crc32c matches the known vector and the JDK implementation") {
    val v = "123456789".getBytes(UTF_8)
    assert(crc32c(v, 0, v.length) == 0xe3069283.toInt)
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { n =>
      val b = new Array[Byte](n * 13)
      rnd.nextBytes(b)
      val jdk = new java.util.zip.CRC32C()
      jdk.update(b)
      assert(crc32c(b, 0, b.length) == jdk.getValue.toInt)
    }
  }

  test("write → records roundtrip incl. empty records") {
    val rs = Seq("alpha".getBytes(UTF_8), Array.emptyByteArray,
      Array.tabulate[Byte](1000)(i => (i * 3).toByte))
    val got = records(write(rs)).get
    assert(got.length == 3)
    got.zip(rs).foreach { case (g, w) =>
      assert(java.util.Arrays.equals(g, w))
    }
  }

  test("bit rot in payload, length, or either CRC rejects the archive") {
    val good = write(Seq("payload-bytes".getBytes(UTF_8)))
    (Seq(0, 5, 8, 13, good.length - 2)).foreach { i =>
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x40).toByte
      assert(records(bad).isEmpty, s"flip at $i should reject")
    }
  }

  test("mid-record truncation rejects; empty archive is zero records") {
    val good = write(Seq("abc".getBytes(UTF_8), "def".getBytes(UTF_8)))
    assert(records(java.util.Arrays.copyOfRange(good, 0, good.length - 1)).isEmpty)
    assert(records(java.util.Arrays.copyOfRange(good, 0, 11)).isEmpty)
    assert(records(Array.emptyByteArray).get.isEmpty)
    assert(records(null).isEmpty)
  }
}
