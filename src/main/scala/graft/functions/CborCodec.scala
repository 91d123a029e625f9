package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Dependency-free CBOR (RFC 8949) codec — the binary JSON of the
  * web/IoT edge, completing the interchange tier next to
  * [[ProtoWire]]: where protobuf needs field numbers agreed upon in
  * advance, CBOR is self-describing, which makes it the shape
  * schemaless event payloads arrive in.
  *
  * Surface: all eight major types — unsigned/negative integers (all
  * four width arguments + immediate), byte/text strings, arrays,
  * maps, tags (kept, item preserved), simple values (false/true/
  * null) and float64 (float16/32 decode too, re-encode as 64) —
  * plus INDEFINITE-LENGTH arrays/maps/strings ("streaming" framing,
  * 0xff break). The encoder is deterministic (RFC 8949 §4.2 core:
  * shortest-form integer arguments, definite lengths) so
  * encode∘decode is the identity on the canonical subset and decode
  * is total on the rest. Malformed input → None, never a throw;
  * nesting depth is bounded against adversarial recursion.
  *
  * Scale shape: scan-stage per-row decode, same contract as every
  * codec here.
  */
object CborCodec {

  sealed trait Cbor
  final case class CInt(v: Long) extends Cbor // uint and negint ranges
  final case class CBytes(v: Vector[Byte]) extends Cbor
  final case class CText(v: String) extends Cbor
  final case class CArr(v: Vector[Cbor]) extends Cbor
  final case class CMap(v: Vector[(Cbor, Cbor)]) extends Cbor
  final case class CTag(tag: Long, item: Cbor) extends Cbor
  final case class CBool(v: Boolean) extends Cbor
  case object CNull extends Cbor
  final case class CFloat(v: Double) extends Cbor

  private val MaxDepth = 64

  // ── decode ───────────────────────────────────────────────────────

  private final class Malformed extends RuntimeException
  private final class Cur(val b: Array[Byte], var pos: Int) {
    def u8(): Int = {
      if (pos >= b.length) throw new Malformed
      val v = b(pos) & 0xff; pos += 1; v
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > b.length) throw new Malformed
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n; out
    }
    def beN(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
  }

  /** Argument for additional-info `ai`; -1 = indefinite. */
  private def arg(c: Cur, ai: Int): Long = ai match {
    case x if x < 24 => x.toLong
    case 24 => c.beN(1)
    case 25 => c.beN(2)
    case 26 => c.beN(4)
    case 27 => c.beN(8)
    case 31 => -1L
    case _ => throw new Malformed
  }

  private def half(bits: Int): Double = {
    // IEEE 754 binary16 → double (RFC 8949 appendix D recipe)
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    val v =
      if (exp == 0) java.lang.Math.scalb(mant.toDouble, -24)
      else if (exp != 31) java.lang.Math.scalb(mant + 1024.0, exp - 25)
      else if (mant == 0) Double.PositiveInfinity
      else Double.NaN
    if ((bits & 0x8000) != 0) -v else v
  }

  private def item(c: Cur, depth: Int): Cbor = {
    if (depth > MaxDepth) throw new Malformed
    val ib = c.u8()
    val major = ib >>> 5
    val ai = ib & 0x1f
    major match {
      case 0 => CInt(arg(c, ai) match {
        // bit 63 set (uint ≥ 2^63) would wrap negative in CInt and
        // re-encode as a negint: reject outside the Long domain so
        // decode stays total and decode→encode round-trip-safe
        case v if v < 0 => throw new Malformed
        case v => v
      })
      case 1 =>
        val v = arg(c, ai)
        if (v < 0) throw new Malformed // negint ≤ -(2^63+1): out of Long
        CInt(-1L - v)
      case 2 => CBytes(strBody(c, ai, depth, text = false).toVector)
      case 3 => CText(new String(strBody(c, ai, depth, text = true),
        StandardCharsets.UTF_8))
      case 4 =>
        val n = arg(c, ai)
        val out = Vector.newBuilder[Cbor]
        if (n == -1L) {
          while (peekNotBreak(c)) out += item(c, depth + 1)
          c.pos += 1
        } else {
          var i = 0L
          while (i < n) { out += item(c, depth + 1); i += 1 }
        }
        CArr(out.result())
      case 5 =>
        val n = arg(c, ai)
        val out = Vector.newBuilder[(Cbor, Cbor)]
        if (n == -1L) {
          while (peekNotBreak(c))
            out += ((item(c, depth + 1), item(c, depth + 1)))
          c.pos += 1
        } else {
          var i = 0L
          while (i < n) {
            out += ((item(c, depth + 1), item(c, depth + 1))); i += 1
          }
        }
        CMap(out.result())
      case 6 =>
        val t = arg(c, ai)
        if (t == -1L) throw new Malformed
        CTag(t, item(c, depth + 1))
      case 7 => ai match {
        case 20 => CBool(false)
        case 21 => CBool(true)
        case 22 => CNull
        case 23 => CNull // undefined → null (one shape downstream)
        case 25 => CFloat(half(c.beN(2).toInt))
        case 26 => CFloat(java.lang.Float.intBitsToFloat(c.beN(4).toInt).toDouble)
        case 27 => CFloat(java.lang.Double.longBitsToDouble(c.beN(8)))
        case _ => throw new Malformed // simple values we don't model
      }
    }
  }

  private def peekNotBreak(c: Cur): Boolean = {
    if (c.pos >= c.b.length) throw new Malformed
    (c.b(c.pos) & 0xff) != 0xff
  }

  /** String body; indefinite strings concatenate definite chunks of
    * the SAME major type (the RFC rule).
    */
  private def strBody(c: Cur, ai: Int, depth: Int, text: Boolean)
      : Array[Byte] = {
    val n = arg(c, ai)
    if (n != -1L) {
      if (n > Int.MaxValue) throw new Malformed
      c.take(n.toInt)
    } else {
      val o = new ByteArrayOutputStream()
      while (peekNotBreak(c)) {
        val ib = c.u8()
        val major = ib >>> 5
        if (major != (if (text) 3 else 2)) throw new Malformed
        val m = arg(c, ib & 0x1f)
        if (m == -1L || m > Int.MaxValue) throw new Malformed // no nesting
        o.write(c.take(m.toInt))
      }
      c.pos += 1
      o.toByteArray
    }
  }

  def decode(payload: Array[Byte]): Option[Cbor] =
    if (payload == null || payload.isEmpty) None
    else {
      val c = new Cur(payload, 0)
      try {
        val v = item(c, 0)
        if (c.pos == payload.length) Some(v) else None // trailing bytes
      } catch {
        case _: Malformed => None
      }
    }

  // ── encode (deterministic: shortest-form, definite-length) ───────

  private def head(o: ByteArrayOutputStream, major: Int, v: Long): Unit = {
    val m = major << 5
    if (v < 24) o.write(m | v.toInt)
    else if (v < 256) { o.write(m | 24); o.write(v.toInt) }
    else if (v < 65536) {
      o.write(m | 25); o.write((v >>> 8).toInt); o.write((v & 0xff).toInt)
    } else if (v < (1L << 32)) {
      o.write(m | 26)
      var i = 3
      while (i >= 0) { o.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
    } else {
      o.write(m | 27)
      var i = 7
      while (i >= 0) { o.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
  }

  private def enc(o: ByteArrayOutputStream, v: Cbor): Unit = v match {
    case CInt(x) =>
      if (x >= 0) head(o, 0, x) else head(o, 1, -1L - x)
    case CBytes(b) =>
      head(o, 2, b.length.toLong); o.write(b.toArray)
    case CText(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      head(o, 3, b.length.toLong); o.write(b)
    case CArr(xs) =>
      head(o, 4, xs.length.toLong); xs.foreach(enc(o, _))
    case CMap(kvs) =>
      head(o, 5, kvs.length.toLong)
      kvs.foreach { case (k, x) => enc(o, k); enc(o, x) }
    case CTag(t, x) => head(o, 6, t); enc(o, x)
    case CBool(false) => o.write(0xf4)
    case CBool(true) => o.write(0xf5)
    case CNull => o.write(0xf6)
    case CFloat(d) =>
      o.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 7
      while (i >= 0) { o.write(((bits >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  def encode(v: Cbor): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    enc(o, v)
    o.toByteArray
  }

  /** Indefinite-length re-framing of an array encode — the streaming
    * shape, for putting the 0xff-break arm on real data paths.
    */
  def encodeIndefiniteArr(xs: Seq[Cbor]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(0x9f)
    xs.foreach(enc(o, _))
    o.write(0xff)
    o.toByteArray
  }
}
