package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class SnappyCodecSpec extends AnyFunSuite {
  import SnappyCodec._

  test("cross-check: snappy-java compress → our decode, many shapes") {
    val shapes = Seq[Array[Byte]](
      Array.emptyByteArray,
      "x".getBytes(UTF_8),
      "the quick brown fox jumps over the lazy dog".getBytes(UTF_8),
      // highly repetitive → short-offset copies
      ("ab" * 5000).getBytes(UTF_8),
      // period > 11-bit offset → copy2 path
      (("0123456789abcdef" * 300) + ("z" * 4096) +
        ("0123456789abcdef" * 300)).getBytes(UTF_8),
      // binary with overlapping run (offset 1)
      Array.fill[Byte](10000)(42),
      // pseudo-random — mostly literals incl. long-literal escapes
      { val r = new scala.util.Random(3); val b = new Array[Byte](70000)
        r.nextBytes(b); b })
    shapes.foreach { plain =>
      val comp = org.xerial.snappy.Snappy.compress(plain)
      val got = decode(comp).get
      assert(java.util.Arrays.equals(got, plain),
        s"mismatch on shape of ${plain.length} bytes")
    }
  }

  test("our all-literal encode → snappy-java uncompress") {
    val plain = ("literal grammar from the write side " * 40).getBytes(UTF_8)
    val enc = encodeLiteral(plain)
    assert(java.util.Arrays.equals(
      org.xerial.snappy.Snappy.uncompress(enc), plain))
    assert(java.util.Arrays.equals(decode(enc).get, plain))
    // and a >256-byte single segment exercises the 2-byte length escape
    val big = new Array[Byte](70000)
    assert(java.util.Arrays.equals(decode(encodeLiteral(big)).get, big))
  }

  test("total on malformed: truncation, bad offsets, length lies") {
    assert(decode(null).isEmpty)
    assert(decode(Array.emptyByteArray).isEmpty)
    val good = org.xerial.snappy.Snappy.compress(
      ("abc" * 100).getBytes(UTF_8))
    assert(decode(java.util.Arrays.copyOfRange(good, 0, good.length - 3)).isEmpty)
    // preamble promises more than the elements deliver
    val lie = good.clone()
    lie(0) = (lie(0) ^ 0x01).toByte
    assert(decode(lie).isEmpty)
    // copy before window start: tag copy1 len4 off 1 at op 0
    assert(decode(Array[Byte](4, 1, 0)).isEmpty)
  }
}
