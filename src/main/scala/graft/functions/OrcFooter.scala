package graft.functions

import java.io.ByteArrayOutputStream

/** Dependency-free ORC FOOTER reader — the ORC sibling of
  * [[ParquetFooter]], built on [[ProtoWire]] because ORC's metadata
  * IS protobuf: the file tail is `…[footer][postscript][u8 psLen]`,
  * the PostScript (never compressed) names the codec and footer
  * length, and the Footer carries stripes, the type tree, row counts
  * and per-column statistics. Statistics here are the data-skipping
  * currency exactly as in parquet — numberOfValues is the NON-NULL
  * count (ORC's convention, unlike parquet's), IntegerStatistics adds
  * the min/max/sum triple as zigzag sint64.
  *
  * Compressed footers arrive in ORC's chunked framing: 3-byte LE
  * header `(chunkLen << 1) | isOriginal`, then either a raw-DEFLATE
  * chunk (ZLIB kind — no zlib wrapper) or the original bytes.
  * NONE/ZLIB are decoded; SNAPPY/LZO/LZ4/ZSTD chunks → None (no
  * codec here), same totality contract as every codec: malformed
  * input → None, never wrong numbers.
  *
  * Scale shape: O(tail bytes) per file over a `binaryFile` scan —
  * the million-file audit pattern again.
  */
object OrcFooter {

  final case class OrcColumn(name: String, kind: String,
      numValues: Long, hasNull: Boolean, intMin: Option[Long],
      intMax: Option[Long], intSum: Option[Long])

  final case class OrcMeta(numRows: Long, compression: String,
      nStripes: Int, stripeRows: Vector[Long],
      columns: Vector[OrcColumn])

  private val Kinds = Array("BOOLEAN", "BYTE", "SHORT", "INT", "LONG",
    "FLOAT", "DOUBLE", "STRING", "BINARY", "TIMESTAMP", "LIST", "MAP",
    "STRUCT", "UNION", "DECIMAL", "DATE", "VARCHAR", "CHAR")

  private val Compressions = Array("NONE", "ZLIB", "SNAPPY", "LZO",
    "LZ4", "ZSTD")

  import ProtoWire.{Field, VInt, Chunk}

  private def vint(fs: Vector[Field], no: Int): Option[Long] =
    fs.collectFirst { case Field(`no`, VInt(v)) => v }

  private def chunks(fs: Vector[Field], no: Int): Vector[Array[Byte]] =
    fs.collect { case Field(`no`, Chunk(v)) => v }

  /** ORC chunked-compression framing → plain bytes. ZLIB chunks are
    * raw DEFLATE, SNAPPY chunks our own [[SnappyCodec]] raw blocks,
    * ZSTD frames via zstd-jni (Spark-classpath precedent).
    */
  private def inflate(kind: String, b: Array[Byte]): Option[Array[Byte]] =
    kind match {
      case "NONE" => Some(b)
      case "ZLIB" | "SNAPPY" | "ZSTD" =>
        val o = new ByteArrayOutputStream()
        var pos = 0
        while (pos < b.length) {
          if (pos + 3 > b.length) return None
          val h = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
            ((b(pos + 2) & 0xff) << 16)
          pos += 3
          val len = h >>> 1
          if (len < 0 || pos + len > b.length) return None
          if ((h & 1) == 1) o.write(b, pos, len) // original chunk
          else kind match {
            case "ZLIB" =>
              val inf = new java.util.zip.Inflater(true) // raw deflate
              inf.setInput(b, pos, len)
              val buf = new Array[Byte](8192)
              try {
                while (!inf.finished()) {
                  val n = inf.inflate(buf)
                  if (n == 0 && inf.needsInput()) return None
                  o.write(buf, 0, n)
                }
              } catch {
                case _: java.util.zip.DataFormatException => return None
              } finally inf.end()
            case "SNAPPY" =>
              val chunk = java.util.Arrays.copyOfRange(b, pos, pos + len)
              SnappyCodec.decode(chunk) match {
                case Some(d) => o.write(d, 0, d.length)
                case None => return None
              }
            case _ => // ZSTD
              val chunk = java.util.Arrays.copyOfRange(b, pos, pos + len)
              try {
                val size = com.github.luben.zstd.Zstd
                  .getFrameContentSize(chunk)
                if (size <= 0 || size > Int.MaxValue) return None
                o.write(com.github.luben.zstd.Zstd
                  .decompress(chunk, size.toInt))
              } catch {
                case _: com.github.luben.zstd.ZstdException => return None
              }
          }
          pos += len
        }
        Some(o.toByteArray)
      case _ => None // lzo/lz4 not available here
    }

  def footer(file: Array[Byte]): Option[OrcMeta] = {
    if (file == null || file.length < 16) return None
    val n = file.length
    val psLen = file(n - 1) & 0xff
    if (psLen <= 0 || psLen + 1 > n) return None
    val ps = ProtoWire.decode(
      java.util.Arrays.copyOfRange(file, n - 1 - psLen, n - 1))
      .getOrElse(return None)
    val magic = ps.collectFirst { case Field(8000, c: Chunk) =>
      ProtoWire.utf8(c) }
    if (!magic.contains("ORC")) return None
    val footerLen = vint(ps, 1).getOrElse(return None).toInt
    val compression = vint(ps, 2).map(_.toInt)
      .filter(c => c >= 0 && c < Compressions.length)
      .map(Compressions(_)).getOrElse("NONE")
    val footStart = n - 1 - psLen - footerLen
    if (footerLen <= 0 || footStart < 0) return None
    val raw = java.util.Arrays.copyOfRange(file, footStart, n - 1 - psLen)
    val plain = inflate(compression, raw).getOrElse(return None)
    val foot = ProtoWire.decode(plain).getOrElse(return None)

    val numRows = vint(foot, 6).getOrElse(return None)
    val stripes = chunks(foot, 3).map { sb =>
      ProtoWire.decode(sb).flatMap(vint(_, 5)).getOrElse(return None)
    }
    // type tree: element 0 is the root; flat schemas have the root
    // STRUCT carrying the leaf names, leaves following in order
    val types = chunks(foot, 4).map(tb =>
      ProtoWire.decode(tb).getOrElse(return None))
    if (types.isEmpty) return None
    val rootNames = chunks(types.head, 3).map(b =>
      new String(b, java.nio.charset.StandardCharsets.UTF_8))
    val leafKinds = types.tail.map(t =>
      vint(t, 1).map(_.toInt).filter(k => k >= 0 && k < Kinds.length)
        .map(Kinds(_)).getOrElse(return None))
    val stats = chunks(foot, 7).map(sb =>
      ProtoWire.decode(sb).getOrElse(return None))
    // stats(0) is the root column; leaves are 1-based
    val cols = rootNames.zipWithIndex.map { case (name, i) =>
      if (i + 1 >= stats.length || i >= leafKinds.length)
        return None
      val st = stats(i + 1)
      val nv = vint(st, 1).getOrElse(return None)
      val hasNull = vint(st, 10).exists(_ != 0)
      val ints = chunks(st, 2).headOption
        .flatMap(ProtoWire.decode(_))
      OrcColumn(name, leafKinds(i), nv, hasNull,
        ints.flatMap(vint(_, 1)).map(ProtoWire.zigzag),
        ints.flatMap(vint(_, 2)).map(ProtoWire.zigzag),
        ints.flatMap(vint(_, 3)).map(ProtoWire.zigzag))
    }
    Some(OrcMeta(numRows, compression, stripes.length, stripes, cols))
  }
}
