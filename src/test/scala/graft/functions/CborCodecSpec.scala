package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CborCodecSpec extends AnyFunSuite {
  import CborCodec._

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("RFC 8949 appendix A golden vectors decode") {
    assert(decode(hex("00")).get == CInt(0))
    assert(decode(hex("17")).get == CInt(23))
    assert(decode(hex("1818")).get == CInt(24))
    assert(decode(hex("1a000f4240")).get == CInt(1000000))
    assert(decode(hex("20")).get == CInt(-1))
    assert(decode(hex("3863")).get == CInt(-100))
    assert(decode(hex("6449455446")).get == CText("IETF"))
    assert(decode(hex("83010203")).get ==
      CArr(Vector(CInt(1), CInt(2), CInt(3))))
    assert(decode(hex("a26161016162820203")).get ==
      CMap(Vector(CText("a") -> CInt(1),
        CText("b") -> CArr(Vector(CInt(2), CInt(3))))))
    assert(decode(hex("fb3ff199999999999a")).get == CFloat(1.1))
    assert(decode(hex("f93c00")).get == CFloat(1.0)) // half
    assert(decode(hex("f90001")).get ==
      CFloat(5.960464477539063e-8)) // subnormal half
    assert(decode(hex("f4")).get == CBool(false))
    assert(decode(hex("f6")).get == CNull)
    assert(decode(hex("c11a514b67b0")).get ==
      CTag(1, CInt(1363896240))) // epoch tag
    // indefinite array and string
    assert(decode(hex("9f0102ff")).get == CArr(Vector(CInt(1), CInt(2))))
    assert(decode(hex("5f42010243030405ff")).get ==
      CBytes(Vector[Byte](1, 2, 3, 4, 5)))
    assert(decode(hex("7f657374726561646d696e67ff")).get ==
      CText("streaming"))
  }

  test("golden vectors re-encode to the canonical bytes") {
    assert(encode(CInt(1000000)).toVector == hex("1a000f4240").toVector)
    assert(encode(CInt(-100)).toVector == hex("3863").toVector)
    assert(encode(CText("IETF")).toVector == hex("6449455446").toVector)
    assert(encode(CMap(Vector(CText("a") -> CInt(1),
      CText("b") -> CArr(Vector(CInt(2), CInt(3)))))).toVector ==
      hex("a26161016162820203").toVector)
    assert(encode(CFloat(1.1)).toVector == hex("fb3ff199999999999a").toVector)
  }

  test("deterministic roundtrip on a nested document") {
    val doc = CMap(Vector(
      CText("id") -> CInt(77),
      CText("neg") -> CInt(-78),
      CText("tags") -> CArr(Vector(CText("a"), CText("b"))),
      CText("blob") -> CBytes(Vector[Byte](9, 8, 7)),
      CText("ok") -> CBool(true),
      CText("none") -> CNull,
      CText("t") -> CTag(1, CInt(123456))))
    val b = encode(doc)
    assert(decode(b).get == doc)
    assert(encode(decode(b).get).toVector == b.toVector)
  }

  test("indefinite-length framing decodes to the same value") {
    val xs = Seq[Cbor](CInt(1), CText("x"), CArr(Vector(CInt(2))))
    assert(decode(encodeIndefiniteArr(xs)).get == CArr(xs.toVector))
  }

  test("total on malformed: truncation, trailing bytes, depth bomb") {
    assert(decode(null).isEmpty)
    assert(decode(Array.emptyByteArray).isEmpty)
    assert(decode(hex("1a000f42")).isEmpty) // truncated u32 arg
    assert(decode(hex("8301")).isEmpty) // array of 3 with 1 item
    assert(decode(hex("0001")).isEmpty) // trailing bytes
    assert(decode(hex("9f01")).isEmpty) // unterminated indefinite
    assert(decode(hex("5f00ff")).isEmpty) // non-bytes chunk in bytes
    val bomb = Array.fill[Byte](200)(0x81.toByte) :+ 0x00.toByte
    assert(decode(bomb).isEmpty) // 200 deep > MaxDepth
  }

  test("64-bit ints outside the Long domain are rejected, not wrapped") {
    // uint 2^63 would wrap negative in CInt and re-encode as a negint
    assert(decode(hex("1b8000000000000000")).isEmpty)
    assert(decode(hex("1bffffffffffffffff")).isEmpty) // 2^64-1
    // negint -(2^63)-1 is below Long.MinValue
    assert(decode(hex("3b8000000000000000")).isEmpty)
    // boundary values inside the domain still decode and round-trip
    assert(decode(hex("1b7fffffffffffffff")).get == CInt(Long.MaxValue))
    assert(decode(hex("3b7fffffffffffffff")).get == CInt(Long.MinValue))
    assert(encode(CInt(Long.MaxValue)).sameElements(hex("1b7fffffffffffffff")))
    assert(encode(CInt(Long.MinValue)).sameElements(hex("3b7fffffffffffffff")))
  }
}
