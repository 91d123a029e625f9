package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Dependency-free protobuf WIRE-FORMAT codec — the length-prefixed
  * tag/value grammar (varint, zigzag, fixed32/64, length-delimited,
  * packed repeated) that a schema-less reader can walk without any
  * generated classes. This is the shape telemetry, ML example
  * records, and RPC payloads actually arrive in at a data platform's
  * edge: the pipeline-relevant operation is the generic walk (field
  * census, selective field extraction, nested-message recursion), not
  * codegen — the same "read the container, not the framework" stance
  * as the [[ParquetFooter]] Thrift walk.
  *
  * Surface: wire types 0 (varint), 1 (fixed64), 2 (length-delimited),
  * 5 (fixed32); deprecated group types are rejected (None), as modern
  * encoders never emit them. Helpers decode the standard
  * interpretations: zigzag (sintN), UTF-8 strings, nested messages,
  * packed repeated varints. Totality: malformed input → None — a
  * truncated varint or a length running past the buffer rejects the
  * message, never mis-reads it.
  *
  * Scale shape: scan-stage per-row decode, embarrassingly parallel;
  * fields extract in one pass without materializing a tree.
  */
object ProtoWire {

  sealed trait WireValue
  final case class VInt(v: Long) extends WireValue
  final case class Fixed64(v: Long) extends WireValue
  final case class Fixed32(v: Int) extends WireValue
  final case class Chunk(v: Array[Byte]) extends WireValue

  final case class Field(number: Int, value: WireValue)

  // ── decode ───────────────────────────────────────────────────────

  private def varintAt(b: Array[Byte], off: Int, end: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var pos = off
    while (pos < end && shift <= 63) {
      val x = b(pos) & 0xff
      v |= (x & 0x7fL) << shift
      pos += 1
      if ((x & 0x80) == 0) return (v, pos - off)
      shift += 7
    }
    null
  }

  /** Walk one message; None on malformed framing. */
  def decode(payload: Array[Byte]): Option[Vector[Field]] =
    if (payload == null) None else decodeRange(payload, 0, payload.length)

  private def decodeRange(b: Array[Byte], from: Int, until: Int)
      : Option[Vector[Field]] = {
    val out = Vector.newBuilder[Field]
    var pos = from
    while (pos < until) {
      val tag = varintAt(b, pos, until)
      if (tag == null) return None
      pos += tag._2
      val fieldNo = (tag._1 >>> 3).toInt
      if (fieldNo == 0) return None
      (tag._1 & 0x7) match {
        case 0 =>
          val v = varintAt(b, pos, until)
          if (v == null) return None
          out += Field(fieldNo, VInt(v._1)); pos += v._2
        case 1 =>
          if (pos + 8 > until) return None
          var v = 0L
          var i = 7
          while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
          out += Field(fieldNo, Fixed64(v)); pos += 8
        case 2 =>
          val len = varintAt(b, pos, until)
          if (len == null) return None
          pos += len._2
          val n = len._1
          if (n < 0 || pos + n > until) return None
          out += Field(fieldNo,
            Chunk(java.util.Arrays.copyOfRange(b, pos, pos + n.toInt)))
          pos += n.toInt
        case 5 =>
          if (pos + 4 > until) return None
          val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
            ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
          out += Field(fieldNo, Fixed32(v)); pos += 4
        case _ => return None // groups (3/4) and reserved types
      }
    }
    Some(out.result())
  }

  /** sintN interpretation of a varint field. */
  def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  def utf8(c: Chunk): String = new String(c.v, StandardCharsets.UTF_8)

  /** Nested-message interpretation of a length-delimited field. */
  def nested(c: Chunk): Option[Vector[Field]] = decode(c.v)

  /** Packed-repeated-varint interpretation. */
  def packedVarints(c: Chunk): Option[Vector[Long]] = {
    val out = Vector.newBuilder[Long]
    var pos = 0
    while (pos < c.v.length) {
      val v = varintAt(c.v, pos, c.v.length)
      if (v == null) return None
      out += v._1; pos += v._2
    }
    Some(out.result())
  }

  // ── encode ───────────────────────────────────────────────────────

  private def writeVarint(o: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      o.write(((v & 0x7f) | 0x80).toInt)
      v = v >>> 7
    }
    o.write(v.toInt)
  }

  def encode(fields: Seq[Field]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    fields.foreach { f =>
      f.value match {
        case VInt(v) =>
          writeVarint(o, (f.number.toLong << 3) | 0)
          writeVarint(o, v)
        case Fixed64(v) =>
          writeVarint(o, (f.number.toLong << 3) | 1)
          var i = 0
          while (i < 8) { o.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
        case Fixed32(v) =>
          writeVarint(o, (f.number.toLong << 3) | 5)
          var i = 0
          while (i < 4) { o.write((v >>> (8 * i)) & 0xff); i += 1 }
        case Chunk(v) =>
          writeVarint(o, (f.number.toLong << 3) | 2)
          writeVarint(o, v.length.toLong)
          o.write(v)
      }
    }
    o.toByteArray
  }

  def string(number: Int, s: String): Field =
    Field(number, Chunk(s.getBytes(StandardCharsets.UTF_8)))

  def message(number: Int, fields: Seq[Field]): Field =
    Field(number, Chunk(encode(fields)))

  def packed(number: Int, vs: Seq[Long]): Field = {
    val o = new ByteArrayOutputStream()
    vs.foreach(writeVarint(o, _))
    Field(number, Chunk(o.toByteArray))
  }

  def sint(number: Int, v: Long): Field =
    Field(number, VInt((v << 1) ^ (v >> 63)))
}
