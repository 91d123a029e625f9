package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class ProtoWireSpec extends AnyFunSuite {
  import ProtoWire._

  test("golden bytes from the language-guide examples") {
    // field 1 varint 150 → 08 96 01
    assert(encode(Seq(Field(1, VInt(150L)))).toVector ==
      Vector[Byte](0x08, 0x96.toByte, 0x01))
    // field 2 string "testing" → 12 07 "testing"
    val s = encode(Seq(string(2, "testing")))
    assert(s.toVector ==
      (Vector[Byte](0x12, 0x07) ++ "testing".getBytes(UTF_8).toVector))
    val dec = decode(s).get
    assert(dec == Vector(Field(2, Chunk("testing".getBytes(UTF_8)))) ||
      utf8(dec.head.value.asInstanceOf[Chunk]) == "testing")
  }

  test("all wire types roundtrip") {
    val fs = Seq(
      Field(1, VInt(300L)),
      Field(2, Fixed64(-17L)),
      Field(3, Fixed32(0x12345678)),
      string(4, "héllo"),
      sint(5, -42L),
      packed(6, Seq(3L, 270L, 86942L)),
      message(7, Seq(Field(1, VInt(9L)), string(2, "in"))))
    val dec = decode(encode(fs)).get
    assert(dec.length == 7)
    assert(dec(0) == Field(1, VInt(300L)))
    assert(dec(1) == Field(2, Fixed64(-17L)))
    assert(dec(2) == Field(3, Fixed32(0x12345678)))
    assert(utf8(dec(3).value.asInstanceOf[Chunk]) == "héllo")
    assert(zigzag(dec(4).value.asInstanceOf[VInt].v) == -42L)
    assert(packedVarints(dec(5).value.asInstanceOf[Chunk]).get ==
      Vector(3L, 270L, 86942L))
    val inner = nested(dec(6).value.asInstanceOf[Chunk]).get
    assert(inner(0) == Field(1, VInt(9L)))
    assert(utf8(inner(1).value.asInstanceOf[Chunk]) == "in")
  }

  test("negative varint takes ten bytes and roundtrips") {
    val b = encode(Seq(Field(1, VInt(-1L))))
    assert(b.length == 1 + 10)
    assert(decode(b).get == Vector(Field(1, VInt(-1L))))
  }

  test("total on malformed: truncated varint, bad length, group types") {
    assert(decode(null).isEmpty)
    assert(decode(Array[Byte](0x08)).isEmpty) // tag then nothing
    assert(decode(Array[Byte](0x12, 0x7f, 0x01)).isEmpty) // len 127 > buf
    assert(decode(Array[Byte](0x0b)).isEmpty) // field 1 wiretype 3 (group)
    assert(decode(Array[Byte](0x80.toByte)).isEmpty) // truncated tag
    assert(decode(Array[Byte](0x00, 0x01)).isEmpty) // field number 0
  }
}
