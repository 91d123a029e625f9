package graft.functions

import java.nio.charset.StandardCharsets

/** Dependency-free Arrow IPC FILE-format reader — the interchange
  * format ML data loaders actually speak, decoded from first
  * principles: the flatbuffers grammar (vtables, soffsets, forward
  * offsets, vectors, union fields) is implemented below rather than
  * linked, then the IPC framing (encapsulated messages with the
  * 0xFFFFFFFF continuation, the file footer with its Block index)
  * and the columnar body layout (validity bitmaps, fixed-width
  * little-endian values, offset+data layout for Utf8) on top of it.
  * Files under test are written by the Arrow REFERENCE library
  * (arrow-java rides the Spark classpath for pandas-UDF interop) —
  * the cross-engine direction of [[AvroOcf]] and the inverse of the
  * parquet gate.
  *
  * Scope: File format (magic `ARROW1`), uncompressed bodies, flat
  * schemas over Int(8-64, signed)/FloatingPoint(double)/Bool/Utf8,
  * any number of record batches; dictionaries, compression, nested
  * types → None. Totality as every codec: malformed input → None.
  *
  * Scale shape: per-FILE decode over `binaryFile`; batches explode to
  * rows inside the scan stage.
  */
object ArrowIpc {

  private final class Malformed extends RuntimeException

  // ── minimal flatbuffers reading ──────────────────────────────────

  private def u8(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p >= b.length) throw new Malformed
    b(p) & 0xff
  }
  private def u16(b: Array[Byte], p: Int): Int =
    u8(b, p) | (u8(b, p + 1) << 8)
  private def i32(b: Array[Byte], p: Int): Int =
    u8(b, p) | (u8(b, p + 1) << 8) | (u8(b, p + 2) << 16) |
      (u8(b, p + 3) << 24)
  private def i64(b: Array[Byte], p: Int): Long =
    (i32(b, p) & 0xffffffffL) | (i32(b, p + 4).toLong << 32)

  /** A flatbuffers table at absolute position `pos`. */
  private final case class Tbl(b: Array[Byte], pos: Int) {
    private val vt = pos - i32(b, pos) // soffset is signed
    private val vtSize = u16(b, vt)
    /** Absolute position of field slot `idx` (0-based), or -1. */
    def slot(idx: Int): Int = {
      val off = 4 + 2 * idx
      if (off + 2 > vtSize) -1
      else {
        val rel = u16(b, vt + off)
        if (rel == 0) -1 else pos + rel
      }
    }
    def int(idx: Int, default: Int): Int = {
      val s = slot(idx); if (s < 0) default else i32(b, s)
    }
    def long(idx: Int, default: Long): Long = {
      val s = slot(idx); if (s < 0) default else i64(b, s)
    }
    def short(idx: Int, default: Int): Int = {
      val s = slot(idx); if (s < 0) default else u16(b, s)
    }
    def byte(idx: Int, default: Int): Int = {
      val s = slot(idx); if (s < 0) default else u8(b, s)
    }
    def bool(idx: Int, default: Boolean): Boolean = {
      val s = slot(idx); if (s < 0) default else u8(b, s) != 0
    }
    /** Follow an indirect (table/vector/string) field. */
    def indirect(idx: Int): Int = {
      val s = slot(idx)
      if (s < 0) -1 else s + i32(b, s)
    }
    def table(idx: Int): Option[Tbl] = {
      val p = indirect(idx)
      if (p < 0) None else Some(Tbl(b, p))
    }
    def string(idx: Int): Option[String] = {
      val p = indirect(idx)
      if (p < 0) None
      else {
        val n = i32(b, p)
        if (n < 0 || p + 4 + n > b.length) throw new Malformed
        Some(new String(b, p + 4, n, StandardCharsets.UTF_8))
      }
    }
    def vectorLen(idx: Int): Int = {
      val p = indirect(idx)
      if (p < 0) 0 else i32(b, p)
    }
    /** Absolute position of vector element `i` (element width w). */
    def vectorElem(idx: Int, i: Int, w: Int): Int = {
      val p = indirect(idx)
      if (p < 0 || i < 0 || i >= i32(b, p)) throw new Malformed
      p + 4 + i * w
    }
    /** Table stored in a vector-of-offsets at element `i`. */
    def vectorTable(idx: Int, i: Int): Tbl = {
      val e = vectorElem(idx, i, 4)
      Tbl(b, e + i32(b, e))
    }
  }

  private def rootTable(b: Array[Byte], from: Int, until: Int): Tbl = {
    if (from + 4 > until) throw new Malformed
    Tbl(b, from + i32(b, from))
  }

  // ── schema model ─────────────────────────────────────────────────

  /** `tpe`: "int64"/"int32"/"int16"/"int8"/"float64"/"bool"/"utf8". */
  final case class ArrowField(name: String, tpe: String, nullable: Boolean)

  final case class ArrowMeta(fields: Vector[ArrowField], nBatches: Int,
      nRows: Long)

  // Field table: 0 name, 1 nullable, 2 type_type(u8), 3 type,
  // 4 dictionary, 5 children, 6 custom_metadata
  private def parseField(f: Tbl): ArrowField = {
    val name = f.string(0).getOrElse(throw new Malformed)
    val nullable = f.bool(1, default = false)
    if (f.table(4).isDefined) throw new Malformed // dictionary-encoded
    if (f.vectorLen(5) > 0) throw new Malformed // nested
    val tt = f.byte(2, 0) // Type union discriminant
    val tpe = tt match {
      case 2 => // Int{0 bitWidth, 1 is_signed}
        val t = f.table(3).getOrElse(throw new Malformed)
        val bw = t.int(0, 0)
        if (!t.bool(1, default = false)) throw new Malformed // unsigned
        bw match {
          case 64 => "int64"
          case 32 => "int32"
          case 16 => "int16"
          case 8 => "int8"
          case _ => throw new Malformed
        }
      case 3 => // FloatingPoint{0 precision}: 2 = DOUBLE
        val t = f.table(3).getOrElse(throw new Malformed)
        if (t.short(0, -1) != 2) throw new Malformed
        "float64"
      case 5 => "utf8" // Utf8{}
      case 6 => "bool" // Bool{}
      case _ => throw new Malformed // lists, structs, decimals, …
    }
    ArrowField(name, tpe, nullable)
  }

  // Schema table: 0 endianness, 1 fields, 2 custom_metadata, 3 features
  private def parseSchema(s: Tbl): Vector[ArrowField] = {
    if (s.short(0, 0) != 0) throw new Malformed // big-endian files
    (0 until s.vectorLen(1)).map(i => parseField(s.vectorTable(1, i)))
      .toVector
  }

  // ── IPC framing ──────────────────────────────────────────────────

  private val Magic = "ARROW1".getBytes(StandardCharsets.US_ASCII)

  private def hasMagic(b: Array[Byte], at: Int): Boolean =
    at >= 0 && at + 6 <= b.length &&
      (0 until 6).forall(i => b(at + i) == Magic(i))

  /** Decode the whole file to (meta, rows). */
  private def parse(file: Array[Byte])
      : Option[(ArrowMeta, Vector[Vector[Option[Any]]])] = {
    if (file == null || file.length < 20) return None
    if (!hasMagic(file, 0) || !hasMagic(file, file.length - 6)) return None
    try {
      val footerLen = i32(file, file.length - 10)
      val footerAt = file.length - 10 - footerLen
      if (footerLen <= 0 || footerAt < 8) return None
      // Footer: 0 version, 1 schema, 2 dictionaries, 3 recordBatches
      val footer = rootTable(file, footerAt, file.length - 10)
      val schema = footer.table(1).map(parseSchema)
        .getOrElse(return None)
      if (footer.vectorLen(2) > 0) return None // dictionary batches
      val nBatches = footer.vectorLen(3)
      val rows = Vector.newBuilder[Vector[Option[Any]]]
      var nRows = 0L
      var bi = 0
      while (bi < nBatches) {
        // Block struct: offset i64, metaDataLength i32 (+pad), bodyLength i64
        val e = footer.vectorElem(3, bi, 24)
        val off = i64(file, e)
        val metaLen = i32(file, e + 8)
        val bodyLen = i64(file, e + 16)
        if (off < 0 || metaLen < 0 || bodyLen < 0 ||
          off + metaLen + bodyLen > file.length) return None
        val msgAt = off.toInt
        // encapsulated message: FFFFFFFF continuation, then meta length
        val (fbAt, fbEnd) =
          if (i32(file, msgAt) == -1)
            (msgAt + 8, msgAt + 8 + i32(file, msgAt + 4))
          else (msgAt + 4, msgAt + 4 + i32(file, msgAt)) // legacy framing
        if (fbEnd > file.length) return None
        // Message: 0 version, 1 header_type(u8), 2 header, 3 bodyLength
        val msg = rootTable(file, fbAt, fbEnd)
        if (msg.byte(1, 0) != 3) return None // not a RecordBatch
        val rb = msg.table(2).getOrElse(return None)
        if (rb.table(3).isDefined) return None // compressed body
        val batch = decodeBatch(file, rb, (off + metaLen).toInt, schema)
        rows ++= batch
        nRows += batch.length
        bi += 1
      }
      Some((ArrowMeta(schema, nBatches, nRows), rows.result()))
    } catch {
      case _: Malformed | _: IndexOutOfBoundsException |
        _: NegativeArraySizeException => None
    }
  }

  /** One RecordBatch's rows. `rb` is the RecordBatch table
    * (0 length, 1 nodes, 2 buffers, 3 compression), `bodyAt` the
    * absolute start of the batch body.
    */
  private def decodeBatch(file: Array[Byte], rb: Tbl, bodyAt: Int,
      schema: Vector[ArrowField]): Vector[Vector[Option[Any]]] = {
    val n = rb.long(0, -1L)
    if (n < 0 || n > Int.MaxValue) throw new Malformed
    // buffers: struct Buffer{offset i64, length i64} (16 bytes)
    val nBuf = rb.vectorLen(2)
    var bufIdx = 0
    def nextBuf(): (Int, Long) = {
      if (bufIdx >= nBuf) throw new Malformed
      val be = rb.vectorElem(2, bufIdx, 16)
      bufIdx += 1
      val boff = i64(file, be)
      val blen = i64(file, be + 8)
      if (boff < 0 || blen < 0 ||
        bodyAt + boff + blen > file.length) throw new Malformed
      ((bodyAt + boff).toInt, blen)
    }
    val cols = schema.map { f =>
      val (vAt, vLen) = nextBuf() // validity bitmap
      def isSet(i: Int): Boolean =
        vLen == 0 || ((file(vAt + (i >> 3)) >>> (i & 7)) & 1) == 1
      f.tpe match {
        case "utf8" =>
          val (oAt, _) = nextBuf() // offsets: (n+1) × i32
          val (dAt, _) = nextBuf() // data
          Vector.tabulate(n.toInt) { i =>
            if (!isSet(i)) None
            else {
              val s = i32(file, oAt + 4 * i)
              val t = i32(file, oAt + 4 * (i + 1))
              if (s < 0 || t < s || dAt.toLong + t > file.length)
                throw new Malformed
              Some(new String(file, dAt + s, t - s,
                StandardCharsets.UTF_8): Any)
            }
          }
        case "bool" =>
          val (dAt, _) = nextBuf()
          Vector.tabulate(n.toInt) { i =>
            if (!isSet(i)) None
            else Some((((file(dAt + (i >> 3)) >>> (i & 7)) & 1) == 1): Any)
          }
        case "float64" =>
          val (dAt, _) = nextBuf()
          Vector.tabulate(n.toInt) { i =>
            if (!isSet(i)) None
            else Some(java.lang.Double.longBitsToDouble(
              i64(file, dAt + 8 * i)): Any)
          }
        case "int64" =>
          val (dAt, _) = nextBuf()
          Vector.tabulate(n.toInt) { i =>
            if (!isSet(i)) None else Some(i64(file, dAt + 8 * i): Any)
          }
        case "int32" =>
          val (dAt, _) = nextBuf()
          Vector.tabulate(n.toInt) { i =>
            if (!isSet(i)) None else Some(i32(file, dAt + 4 * i): Any)
          }
        case "int16" =>
          val (dAt, _) = nextBuf()
          Vector.tabulate(n.toInt) { i =>
            if (!isSet(i)) None
            else Some(u16(file, dAt + 2 * i).toShort: Any)
          }
        case "int8" =>
          val (dAt, _) = nextBuf()
          Vector.tabulate(n.toInt) { i =>
            if (!isSet(i)) None else Some(file(dAt + i): Any)
          }
        case _ => throw new Malformed
      }
    }
    Vector.tabulate(n.toInt)(r => cols.map(_(r)))
  }

  def meta(file: Array[Byte]): Option[ArrowMeta] = parse(file).map(_._1)

  def readRows(file: Array[Byte]): Option[Vector[Vector[Option[Any]]]] =
    parse(file).map(_._2)

  /** The STREAM variant (no magic, no footer): a Schema message, then
    * RecordBatch messages, terminated by the 0xFFFFFFFF/0 end-of-
    * stream marker (or end of input). The wire shape of Arrow Flight
    * and spark→pandas interop — same message grammar, schema arrives
    * in-band instead of via the footer's Block index.
    */
  def readStreamRows(stream: Array[Byte])
      : Option[Vector[Vector[Option[Any]]]] = {
    if (stream == null || stream.length < 8) return None
    try {
      var pos = 0
      var schema: Vector[ArrowField] = null
      val rows = Vector.newBuilder[Vector[Option[Any]]]
      var going = true
      while (going && pos + 8 <= stream.length) {
        val (metaLen, fbAt) =
          if (i32(stream, pos) == -1) (i32(stream, pos + 4), pos + 8)
          else (i32(stream, pos), pos + 4) // legacy framing
        if (metaLen == 0) going = false // end-of-stream marker
        else {
          if (metaLen < 0 || fbAt + metaLen > stream.length)
            throw new Malformed
          val msg = rootTable(stream, fbAt, fbAt + metaLen)
          val bodyLen = msg.long(3, 0L)
          val bodyAt = fbAt + metaLen
          if (bodyLen < 0 || bodyAt + bodyLen > stream.length)
            throw new Malformed
          msg.byte(1, 0) match {
            case 1 => // Schema message
              schema = parseSchema(msg.table(2).getOrElse(
                throw new Malformed))
            case 3 => // RecordBatch
              if (schema == null) throw new Malformed
              val rb = msg.table(2).getOrElse(throw new Malformed)
              if (rb.table(3).isDefined) throw new Malformed
              rows ++= decodeBatch(stream, rb, bodyAt, schema)
            case _ => throw new Malformed // dictionaries, tensors …
          }
          pos = bodyAt + bodyLen.toInt
        }
      }
      if (schema == null) None else Some(rows.result())
    } catch {
      case _: Malformed | _: IndexOutOfBoundsException |
        _: NegativeArraySizeException => None
    }
  }
}
