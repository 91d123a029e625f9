package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CharsetDetectSpec extends AnyFunSuite {
  import CharsetDetect.decode

  test("BOMs win over everything") {
    val utf8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "héllo".getBytes("UTF-8")
    val d8 = decode(utf8, Some("text/html; charset=iso-8859-1")) // header lies; BOM wins
    assert(d8 == CharsetDetect.Decoded("utf-8", "héllo"))
    val le = Array[Byte](0xff.toByte, 0xfe.toByte) ++ "ab€".getBytes("UTF-16LE")
    assert(decode(le, None) == CharsetDetect.Decoded("utf-16le", "ab€"))
    val be = Array[Byte](0xfe.toByte, 0xff.toByte) ++ "ab€".getBytes("UTF-16BE")
    assert(decode(be, None) == CharsetDetect.Decoded("utf-16be", "ab€"))
  }

  test("transport charset label, WHATWG 1252 superset reading") {
    // 0x80 is € in windows-1252 but a control char in true iso-8859-1:
    // the whatwg normalization must decode it as €
    val b = "price: €9".getBytes("windows-1252")
    val d = decode(b, Some("text/plain; charset=ISO-8859-1"))
    assert(d.charset == "windows-1252")
    assert(d.text == "price: €9")
  }

  test("meta prescan: both attribute forms, only in the head window") {
    val m1 = "<html><meta charset='utf-8'><body>naïve</body>".getBytes("UTF-8")
    assert(decode(m1, None).text.contains("naïve"))
    val m2 = ("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">" +
      "caf" + "é").getBytes("windows-1252")
    val d2 = decode(m2, None)
    assert(d2.charset == "windows-1252" && d2.text.endsWith("café"))
  }

  test("validation fallback: invalid utf-8 decodes as 1252, valid stays utf-8") {
    val invalid = "résumé".getBytes("windows-1252") // é = 0xE9, bad utf-8
    val d = decode(invalid, None)
    assert(d.charset == "windows-1252" && d.text == "résumé")
    val valid = "résumé".getBytes("UTF-8")
    val d2 = decode(valid, None)
    assert(d2.charset == "utf-8" && d2.text == "résumé")
    assert(decode(Array.emptyByteArray, None) == CharsetDetect.Decoded("utf-8", ""))
  }

  test("unknown labels fall through to sniffing") {
    val b = "plain".getBytes("UTF-8")
    assert(decode(b, Some("text/html; charset=x-weird-enc")).charset == "utf-8")
  }
}
