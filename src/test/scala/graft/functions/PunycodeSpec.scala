package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class PunycodeSpec extends AnyFunSuite {
  import Punycode._

  // RFC 3492 §7.1 official samples (a selection spanning scripts)
  private val rfcSamples = Seq(
    // (A) Arabic (Egyptian)
    ("ليهمابتكل" +
      "موشعربي؟",
      "egbpdaj6bu4bxfgehfvwxn"),
    // (B) Chinese (simplified)
    ("他们为什么不说中文",
      "ihqwcrb4cv8a8dqg056pqjye"),
    // (I) Russian (Cyrillic)
    ("почемужеон" +
      "инеговорят" +
      "порусски",
      "b1abfaaepdrnnbgefbadotcwatmq2g4l"),
    // (L) mixed with basic code points
    ("3年B組金八先生", "3B-ww4c5e180e575a65lsy2b"),
    // (P) long mixed
    ("MajiでKoiする5秒前",
      "MajiKoi5-783gue6qz075azm5e"))

  test("RFC 3492 sample strings encode to the published forms") {
    rfcSamples.foreach { case (unicode, puny) =>
      assert(encode(unicode).contains(puny), s"encode of $puny sample")
    }
  }

  test("RFC 3492 sample strings decode back") {
    rfcSamples.foreach { case (unicode, puny) =>
      assert(decode(puny).contains(unicode), s"decode of $puny sample")
    }
  }

  test("agrees with the JDK's IDN on hostnames") {
    val hosts = Seq("bücher.example", "münchen.de", "παράδειγμα.δοκιμή",
      "пример.испытание", "例え.テスト", "plain-ascii.example.com")
    hosts.foreach { h =>
      val ascii = hostToAscii(h).get
      assert(ascii == java.net.IDN.toASCII(h), s"toAscii $h")
      assert(hostToUnicode(ascii).contains(h), s"toUnicode $ascii")
    }
  }

  test("supplementary-plane code points roundtrip") {
    val s = "a😀b" // 😀
    val e = encode(s).get
    assert(decode(e).contains(s))
  }

  test("total on malformed labels") {
    assert(decode(null).isEmpty)
    assert(decode("!!!").isEmpty)
    assert(decode("a-@").isEmpty)
    assert(decode("99999999h").isEmpty) // overflow path
    assert(hostToUnicode("xn--!!!.example").isEmpty)
    assert(encode(null).isEmpty)
  }
}
