package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Dependency-free Avro Object Container File (OCF) reader — the
  * third native lake-format read path next to [[ParquetPages]] and
  * [[OrcFooter]], and the cross-engine gate in the other direction:
  * the files under test are written by the Avro REFERENCE library
  * ([[graft.sources.AvroTables]]), decoded here from first
  * principles. Layout: `Obj\x01`, a metadata map (`avro.schema` JSON,
  * `avro.codec`), a 16-byte sync marker, then blocks of
  * `[count zigzag][byteLen zigzag][records][sync]` with the sync
  * VERIFIED per block (torn-write detection, the TAR/TFRecord
  * stance). Record bodies are Avro binary: zigzag varints for
  * int/long, length-prefixed UTF-8, single-byte booleans, 8-byte LE
  * doubles, and nullable 2-branch unions (branch index then value).
  *
  * Scope: flat record schemas over the primitive types above — the
  * shape a DataFrame column set actually is; nested/array schemas →
  * None (the schema-aware [[graft.sources.AvroTables]] handles those
  * through the reference library). Codecs: null and deflate (raw).
  * The schema JSON is parsed by the minimal recursive parser below —
  * total, no library. Malformed anything → None.
  *
  * Scale shape: per-FILE sequential block walk over `binaryFile`,
  * records exploding inside the scan stage — same unit of
  * parallelism as every archive codec here.
  */
object AvroOcf {

  /** `nullBranch` = the union index of "null" (-1 when the field is
    * required) — read from the schema, never assumed, since both
    * ["null",T] and [T,"null"] orders exist in the wild.
    */
  final case class OcfField(name: String, tpe: String,
      nullable: Boolean, nullBranch: Int = -1)

  final case class OcfMeta(codec: String, fields: Vector[OcfField],
      nBlocks: Int, nRecords: Long)

  // ── minimal JSON (totality: Malformed on anything broken) ────────

  private final class Malformed extends RuntimeException
  private final class P(val s: String) {
    var pos = 0
    def ws(): Unit = {
      while (pos < s.length && Character.isWhitespace(s(pos))) pos += 1
    }
    def expect(c: Char): Unit = {
      ws()
      if (pos >= s.length || s(pos) != c) throw new Malformed
      pos += 1
    }
    def peek(): Char = {
      ws()
      if (pos >= s.length) throw new Malformed
      s(pos)
    }
  }

  private def jValue(p: P): Any = p.peek() match {
    case '{' =>
      p.expect('{')
      val m = Map.newBuilder[String, Any]
      if (p.peek() == '}') { p.expect('}'); return m.result() }
      var going = true
      while (going) {
        val k = jString(p)
        p.expect(':')
        m += k -> jValue(p)
        if (p.peek() == ',') p.expect(',') else { p.expect('}'); going = false }
      }
      m.result()
    case '[' =>
      p.expect('[')
      val v = Vector.newBuilder[Any]
      if (p.peek() == ']') { p.expect(']'); return v.result() }
      var going = true
      while (going) {
        v += jValue(p)
        if (p.peek() == ',') p.expect(',') else { p.expect(']'); going = false }
      }
      v.result()
    case '"' => jString(p)
    case 't' =>
      if (!p.s.startsWith("true", p.pos)) throw new Malformed
      p.pos += 4; java.lang.Boolean.TRUE
    case 'f' =>
      if (!p.s.startsWith("false", p.pos)) throw new Malformed
      p.pos += 5; java.lang.Boolean.FALSE
    case 'n' =>
      if (!p.s.startsWith("null", p.pos)) throw new Malformed
      p.pos += 4; null
    case c if c == '-' || (c >= '0' && c <= '9') =>
      val start = p.pos
      while (p.pos < p.s.length &&
        "+-.eE0123456789".indexOf(p.s(p.pos)) >= 0) p.pos += 1
      val t = p.s.substring(start, p.pos)
      try java.lang.Double.valueOf(t)
      catch { case _: NumberFormatException => throw new Malformed }
    case _ => throw new Malformed
  }

  private def jString(p: P): String = {
    p.expect('"')
    val sb = new StringBuilder
    while (true) {
      if (p.pos >= p.s.length) throw new Malformed
      val c = p.s(p.pos)
      p.pos += 1
      if (c == '"') return sb.toString
      else if (c == '\\') {
        if (p.pos >= p.s.length) throw new Malformed
        val e = p.s(p.pos)
        p.pos += 1
        e match {
          case '"' | '\\' | '/' => sb.append(e)
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'u' =>
            if (p.pos + 4 > p.s.length) throw new Malformed
            sb.append(Integer.parseInt(
              p.s.substring(p.pos, p.pos + 4), 16).toChar)
            p.pos += 4
          case _ => throw new Malformed
        }
      } else sb.append(c)
    }
    throw new Malformed
  }

  /** Flat-record field list from the schema JSON; None when the
    * schema is outside the flat-primitive scope.
    */
  private def parseFields(schemaJson: String): Option[Vector[OcfField]] = {
    val root = try jValue(new P(schemaJson)) catch {
      case _: Malformed => return None
    }
    root match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        if (mm.get("type") != Some("record")) return None
        mm.get("fields") match {
          case Some(fs: Vector[_]) =>
            val out = Vector.newBuilder[OcfField]
            fs.foreach {
              case fm: Map[_, _] =>
                val f = fm.asInstanceOf[Map[String, Any]]
                val name = f.get("name") match {
                  case Some(s: String) => s
                  case _ => return None
                }
                f.get("type") match {
                  case Some(t: String) if isPrimitive(t) =>
                    out += OcfField(name, t, nullable = false)
                  case Some(tm: Map[_, _]) =>
                    val t = logicalName(tm.asInstanceOf[Map[String, Any]])
                      .getOrElse(return None)
                    out += OcfField(name, t, nullable = false)
                  case Some(u: Vector[_]) if u.length == 2 =>
                    // each branch: "null", a primitive name, or a
                    // logical-type object — resolve to the extended name
                    val branches = u.map {
                      case s: String => Some(s)
                      case m: Map[_, _] =>
                        logicalName(m.asInstanceOf[Map[String, Any]])
                      case _ => None
                    }
                    if (branches.exists(_.isEmpty)) return None
                    val names = branches.map(_.get)
                    if (!names.contains("null")) return None
                    val t = names.find(_ != "null").get
                    if (!isPrimitive(t)) return None
                    out += OcfField(name, t, nullable = true,
                      nullBranch = names.indexOf("null"))
                  case _ => return None // nested/array/map → out of scope
                }
              case _ => return None
            }
            Some(out.result())
          case _ => None
        }
      case _ => None
    }
  }

  private def isPrimitive(t: String): Boolean =
    t == "long" || t == "int" || t == "string" || t == "boolean" ||
      t == "double" || t == "float" || t == "bytes" ||
      t == "date" || t == "timestamp-millis" || t == "timestamp-micros" ||
      t.startsWith("decimal:")

  /** Resolve a JSON type OBJECT ({"type":"bytes","logicalType":
    * "decimal","scale":2,...}) to the extended type name the decoder
    * speaks: the logical name when it's one we decode (carried on the
    * carrier the spec assigns), the bare carrier when no logicalType
    * rides it, None otherwise. Decimal keeps its scale in the name —
    * the one parameter the binary decode needs.
    */
  private def logicalName(m: Map[String, Any]): Option[String] = {
    val carrier = m.get("type") match {
      case Some(s: String) => s
      case _ => return None
    }
    m.get("logicalType") match {
      case None => Some(carrier).filter(isPrimitive)
      case Some("date") if carrier == "int" => Some("date")
      case Some("timestamp-millis") if carrier == "long" =>
        Some("timestamp-millis")
      case Some("timestamp-micros") if carrier == "long" =>
        Some("timestamp-micros")
      case Some("decimal") if carrier == "bytes" =>
        m.get("scale") match {
          case Some(d: java.lang.Double) if d.doubleValue.isValidInt =>
            Some(s"decimal:${d.intValue}")
          case None => Some("decimal:0") // spec default scale = 0
          case _ => None
        }
      case _ => None // unknown logical type → out of scope, not misread
    }
  }

  // ── binary decode ────────────────────────────────────────────────

  private final class Cur(val b: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = {
      if (pos >= end) throw new Malformed
      val v = b(pos) & 0xff; pos += 1; v
    }
    def zigzag(): Long = {
      var v = 0L
      var shift = 0
      while (shift <= 63) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return (v >>> 1) ^ -(v & 1)
        shift += 7
      }
      throw new Malformed
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > end) throw new Malformed
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n; out
    }
  }

  private def value(c: Cur, tpe: String): Any = tpe match {
    case "long" => c.zigzag()
    case "int" => c.zigzag().toInt
    case "string" => new String(c.take(c.zigzag().toInt),
      StandardCharsets.UTF_8)
    case "bytes" => c.take(c.zigzag().toInt).toVector
    case "boolean" => c.u8() match {
      case 0 => false
      case 1 => true
      case _ => throw new Malformed
    }
    case "double" =>
      var v = 0L
      var i = 0
      while (i < 8) { v |= (c.u8().toLong << (8 * i)); i += 1 }
      java.lang.Double.longBitsToDouble(v)
    case "float" =>
      var v = 0
      var i = 0
      while (i < 4) { v |= c.u8() << (8 * i); i += 1 }
      java.lang.Float.intBitsToFloat(v).toDouble
    // logical types, decoded to their java.time / BigDecimal meaning
    // (the raw carrier value alone would be a silent misread)
    case "date" =>
      java.time.LocalDate.ofEpochDay(c.zigzag())
    case "timestamp-millis" =>
      java.time.Instant.ofEpochMilli(c.zigzag())
    case "timestamp-micros" =>
      val us = c.zigzag()
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
    case t if t.startsWith("decimal:") =>
      val scale = t.substring("decimal:".length).toInt
      val raw = c.take(c.zigzag().toInt)
      if (raw.isEmpty) throw new Malformed // zero-length two's complement
      new java.math.BigDecimal(new java.math.BigInteger(raw), scale)
    case _ => throw new Malformed
  }

  private def inflateBlock(codec: String, b: Array[Byte]): Array[Byte] =
    codec match {
      case "null" => b
      case "deflate" =>
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(b)
        val o = new ByteArrayOutputStream(b.length * 2)
        val buf = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && inf.needsInput()) throw new Malformed
            o.write(buf, 0, n)
          }
        } catch {
          case _: java.util.zip.DataFormatException => throw new Malformed
        } finally inf.end()
        o.toByteArray
      case _ => throw new Malformed // snappy/zstd OCF codecs unused here
    }

  /** Metadata + block census without decoding records. */
  def meta(file: Array[Byte]): Option[OcfMeta] =
    parse(file).map(_._1)

  /** All records as field vectors (schema order), nulls as None. */
  def readRows(file: Array[Byte]): Option[Vector[Vector[Option[Any]]]] =
    parse(file).map(_._2)

  private def parse(file: Array[Byte])
      : Option[(OcfMeta, Vector[Vector[Option[Any]]])] = {
    if (file == null || file.length < 4 + 16 + 2) return None
    if (file(0) != 'O' || file(1) != 'b' || file(2) != 'j' ||
      file(3) != 1) return None
    try {
      val c = new Cur(file, 4, file.length)
      var schemaJson: String = null
      var codec = "null"
      // metadata map: (count[, byteLen]) then key/value pairs; 0 ends
      var going = true
      while (going) {
        var count = c.zigzag()
        if (count == 0) going = false
        else {
          if (count < 0) { c.zigzag(); count = -count } // block byteLen
          var i = 0L
          while (i < count) {
            val k = new String(c.take(c.zigzag().toInt),
              StandardCharsets.UTF_8)
            val v = c.take(c.zigzag().toInt)
            if (k == "avro.schema")
              schemaJson = new String(v, StandardCharsets.UTF_8)
            else if (k == "avro.codec")
              codec = new String(v, StandardCharsets.UTF_8)
            i += 1
          }
        }
      }
      if (schemaJson == null) return None
      val fields = parseFields(schemaJson).getOrElse(return None)
      val sync = c.take(16)
      val rows = Vector.newBuilder[Vector[Option[Any]]]
      var nBlocks = 0
      var nRecords = 0L
      while (c.pos < c.end) {
        val count = c.zigzag()
        if (count < 0) return None
        val byteLen = c.zigzag()
        if (byteLen < 0) return None
        val data = inflateBlock(codec, c.take(byteLen.toInt))
        val bc = new Cur(data, 0, data.length)
        var i = 0L
        while (i < count) {
          rows += fields.map { f =>
            if (f.nullable) {
              val branch = bc.zigzag()
              if (branch == f.nullBranch) None
              else if (branch == 1L - f.nullBranch) Some(value(bc, f.tpe))
              else return None
            } else Some(value(bc, f.tpe))
          }
          i += 1
        }
        if (bc.pos != bc.end) return None // trailing bytes in block
        val blockSync = c.take(16)
        if (!java.util.Arrays.equals(blockSync, sync)) return None
        nBlocks += 1
        nRecords += count
      }
      Some((OcfMeta(codec, fields, nBlocks, nRecords), rows.result()))
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
        _: NegativeArraySizeException => None
    }
  }
}
