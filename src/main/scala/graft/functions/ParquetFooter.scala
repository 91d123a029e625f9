package graft.functions

import java.nio.charset.StandardCharsets

/** Dependency-free Parquet FOOTER reader — a Thrift compact-protocol
  * decode of `FileMetaData` straight from the file bytes, no
  * parquet-mr involved. The footer is where every table-format
  * decision at 100 TB actually lives: row counts, per-chunk
  * value/null counts, min/max statistics, codecs, sizes — reading it
  * WITHOUT opening column data is what makes manifest-level data
  * skipping ([[graft.sources.DataSkipping]]) and scan planning
  * metadata-cost operations. This codec makes that layer inspectable
  * as a query: the engine's own statistics path, oracle-checked
  * against recomputing the same facts from the data.
  *
  * Layout: `PAR1 … [footer thrift][u32 LE footer_len]"PAR1"`. The
  * footer is Thrift COMPACT protocol (field-delta headers, zigzag
  * varints, length-prefixed binaries, size|type list headers) —
  * decoded here by a recursive-descent walker that extracts the
  * fields the engine needs and SKIPS unknown fields by type (the
  * forward-compat discipline Thrift is designed around, same spirit
  * as the box/EBML walks). Totality: malformed input → None.
  *
  * Scale shape: O(footer bytes) per file, embarrassingly parallel
  * over a `binaryFile` scan — the pattern for auditing a million-file
  * table without touching a single data page.
  */
object ParquetFooter {

  final case class ColumnChunkMeta(path: String, physicalType: String,
      codec: String, numValues: Long, compressedSize: Long,
      uncompressedSize: Long, nullCount: Option[Long],
      minValue: Option[Array[Byte]], maxValue: Option[Array[Byte]],
      dataPageOffset: Long = -1L, dictPageOffset: Option[Long] = None)

  final case class RowGroupMeta(numRows: Long, totalByteSize: Long,
      columns: Vector[ColumnChunkMeta])

  /** One flattened schema element as written. `repetition`:
    * 0=REQUIRED, 1=OPTIONAL, 2=REPEATED (-1 on the root, which omits
    * it). `physicalType` is "GROUP" for non-leaves.
    */
  final case class SchemaField(name: String, physicalType: String,
      numChildren: Int, repetition: Int)

  final case class FooterMeta(version: Int, numRows: Long,
      createdBy: Option[String], schema: Vector[SchemaField],
      rowGroups: Vector[RowGroupMeta])

  private val PhysicalTypes = Array("BOOLEAN", "INT32", "INT64",
    "INT96", "FLOAT", "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")

  private val Codecs = Array("UNCOMPRESSED", "SNAPPY", "GZIP", "LZO",
    "BROTLI", "LZ4", "ZSTD", "LZ4_RAW")

  // ── compact-protocol reader ──────────────────────────────────────

  /** Mutable cursor; all reads throw Malformed on overrun, caught at
    * the `footer()` boundary (totality without Option-threading every
    * varint).
    */
  private[functions] final class Malformed extends RuntimeException
  private[functions] final class Cur(val b: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = {
      if (pos >= end) throw new Malformed
      val v = b(pos) & 0xff; pos += 1; v
    }
    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (true) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new Malformed
      }
      v
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > end) throw new Malformed
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n; out
    }
    def binary(): Array[Byte] = bytes(varint().toInt)
  }

  private val TStop = 0
  private val TBoolTrue = 1
  private val TBoolFalse = 2
  private val TByte = 3
  private val TI16 = 4
  private val TI32 = 5
  private val TI64 = 6
  private val TDouble = 7
  private val TBinary = 8
  private val TList = 9
  private val TSet = 10
  private val TMap = 11
  private val TStruct = 12

  private[functions] def skip(c: Cur, tpe: Int): Unit = tpe match {
    case TBoolTrue | TBoolFalse => ()
    case TByte => c.u8()
    case TI16 | TI32 | TI64 => c.zigzag()
    case TDouble => c.bytes(8)
    case TBinary => c.binary()
    case TList | TSet =>
      val h = c.u8()
      val elemType = h & 0x0f
      val n = { val s = (h >>> 4) & 0x0f; if (s == 15) c.varint().toInt else s }
      var i = 0
      while (i < n) { skip(c, elemType); i += 1 }
    case TMap =>
      val n = c.varint().toInt
      if (n > 0) {
        val kv = c.u8()
        var i = 0
        while (i < n) { skip(c, kv >>> 4); skip(c, kv & 0x0f); i += 1 }
      }
    case TStruct =>
      var lastId = 0
      var going = true
      while (going) {
        val h = c.u8()
        if (h == TStop) going = false
        else {
          val delta = (h >>> 4) & 0x0f
          lastId = if (delta != 0) lastId + delta else c.zigzag().toInt
          skip(c, h & 0x0f)
        }
      }
    case _ => throw new Malformed
  }

  /** Walk one struct: `f(fieldId, wireType)` must CONSUME the value
    * (or call `skip`).
    */
  private[functions] def struct(c: Cur)(f: (Int, Int) => Unit): Unit = {
    var lastId = 0
    var going = true
    while (going) {
      val h = c.u8()
      if (h == TStop) going = false
      else {
        val delta = (h >>> 4) & 0x0f
        lastId = if (delta != 0) lastId + delta else c.zigzag().toInt
        f(lastId, h & 0x0f)
      }
    }
  }

  private[functions] def listOf[A](c: Cur)(read: () => A): Vector[A] = {
    val h = c.u8()
    val n = { val s = (h >>> 4) & 0x0f; if (s == 15) c.varint().toInt else s }
    if (n < 0 || n > c.end - c.pos) throw new Malformed // ≥1 byte/elem
    val out = Vector.newBuilder[A]
    var i = 0
    while (i < n) { out += read(); i += 1 }
    out.result()
  }

  private def str(b: Array[Byte]): String =
    new String(b, StandardCharsets.UTF_8)

  // ── FileMetaData extraction ──────────────────────────────────────

  private def readSchemaElement(c: Cur): SchemaField = {
    var tpe = -1
    var name: String = null
    var numChildren = 0
    var repetition = -1
    struct(c) { (id, wt) =>
      id match {
        case 1 => tpe = c.zigzag().toInt
        case 3 => repetition = c.zigzag().toInt
        case 4 => name = str(c.binary())
        case 5 => numChildren = c.zigzag().toInt
        case _ => skip(c, wt)
      }
    }
    if (name == null) throw new Malformed
    val t =
      if (tpe >= 0 && tpe < PhysicalTypes.length) PhysicalTypes(tpe)
      else "GROUP"
    SchemaField(name, t, numChildren, repetition)
  }

  private def readStatistics(c: Cur): (Option[Long],
      Option[Array[Byte]], Option[Array[Byte]]) = {
    var nullCount: Option[Long] = None
    var minV: Option[Array[Byte]] = None
    var maxV: Option[Array[Byte]] = None
    struct(c) { (id, wt) =>
      id match {
        case 3 => nullCount = Some(c.zigzag())
        case 5 => maxV = Some(c.binary())
        case 6 => minV = Some(c.binary())
        case _ => skip(c, wt)
      }
    }
    (nullCount, minV, maxV)
  }

  private def readColumnMeta(c: Cur): ColumnChunkMeta = {
    var tpe = -1
    var codec = -1
    var path: String = null
    var numValues = -1L
    var unc = -1L
    var comp = -1L
    var stats: (Option[Long], Option[Array[Byte]], Option[Array[Byte]]) =
      (None, None, None)
    var dataOff = -1L
    var dictOff: Option[Long] = None
    struct(c) { (id, wt) =>
      id match {
        case 1 => tpe = c.zigzag().toInt
        case 3 => path = listOf(c)(() => str(c.binary())).mkString(".")
        case 4 => codec = c.zigzag().toInt
        case 5 => numValues = c.zigzag()
        case 6 => unc = c.zigzag()
        case 7 => comp = c.zigzag()
        case 9 => dataOff = c.zigzag()
        case 11 => dictOff = Some(c.zigzag())
        case 12 => stats = readStatistics(c)
        case _ => skip(c, wt)
      }
    }
    if (path == null || numValues < 0 || tpe < 0 ||
      tpe >= PhysicalTypes.length) throw new Malformed
    ColumnChunkMeta(path, PhysicalTypes(tpe),
      if (codec >= 0 && codec < Codecs.length) Codecs(codec) else "UNKNOWN",
      numValues, comp, unc, stats._1, stats._2, stats._3,
      dataOff, dictOff)
  }

  private def readColumnChunk(c: Cur): Option[ColumnChunkMeta] = {
    var meta: Option[ColumnChunkMeta] = None
    struct(c) { (id, wt) =>
      id match {
        case 3 => meta = Some(readColumnMeta(c))
        case _ => skip(c, wt)
      }
    }
    meta
  }

  private def readRowGroup(c: Cur): RowGroupMeta = {
    var numRows = -1L
    var totalBytes = -1L
    var cols = Vector.empty[ColumnChunkMeta]
    struct(c) { (id, wt) =>
      id match {
        case 1 => cols = listOf(c)(() => readColumnChunk(c)).flatten
        case 2 => totalBytes = c.zigzag()
        case 3 => numRows = c.zigzag()
        case _ => skip(c, wt)
      }
    }
    if (numRows < 0) throw new Malformed
    RowGroupMeta(numRows, totalBytes, cols)
  }

  /** Parse a whole parquet FILE's footer (pass the complete file
    * bytes; only the tail is touched).
    */
  def footer(file: Array[Byte]): Option[FooterMeta] = {
    if (file == null || file.length < 12) return None
    val n = file.length
    if (file(0) != 'P' || file(1) != 'A' || file(2) != 'R' ||
      file(3) != '1' || file(n - 4) != 'P' || file(n - 3) != 'A' ||
      file(n - 2) != 'R' || file(n - 1) != '1') return None
    val len = (file(n - 8) & 0xff) | ((file(n - 7) & 0xff) << 8) |
      ((file(n - 6) & 0xff) << 16) | ((file(n - 5) & 0xff) << 24)
    if (len <= 0 || len > n - 12) return None
    val c = new Cur(file, n - 8 - len, n - 8)
    try {
      var version = -1
      var numRows = -1L
      var createdBy: Option[String] = None
      var schema = Vector.empty[SchemaField]
      var rowGroups = Vector.empty[RowGroupMeta]
      struct(c) { (id, wt) =>
        id match {
          case 1 => version = c.zigzag().toInt
          case 2 => schema = listOf(c)(() => readSchemaElement(c))
          case 3 => numRows = c.zigzag()
          case 4 => rowGroups = listOf(c)(() => readRowGroup(c))
          case 6 => createdBy = Some(str(c.binary()))
          case _ => skip(c, wt)
        }
      }
      if (numRows < 0 || schema.isEmpty) None
      else Some(FooterMeta(version, numRows, createdBy, schema, rowGroups))
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
        _: NegativeArraySizeException => None
    }
  }

  /** Decode a plain-encoded statistics value for the integer physical
    * types (little-endian, the parquet convention).
    */
  def statAsLong(physicalType: String, v: Array[Byte]): Option[Long] =
    physicalType match {
      case "INT32" if v.length == 4 =>
        Some((v(0) & 0xffL) | ((v(1) & 0xffL) << 8) |
          ((v(2) & 0xffL) << 16) | ((v(3).toLong) << 24))
      case "INT64" if v.length == 8 =>
        var x = 0L
        var i = 7
        while (i >= 0) { x = (x << 8) | (v(i) & 0xffL); i -= 1 }
        Some(x) // all 64 bits assembled → two's complement is intact
      case _ => None
    }
}
