package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal — the classic repetition detector
  * from the Gopher/MassiveText cleaning family: text that deflates far
  * below typical prose entropy is boilerplate, keyword spam, or
  * generated repetition, and the zlib ratio catches patterns that
  * n-gram counters ([[RepetitionStats]]) miss (long-range and
  * approximate repeats within the 32 KiB window).
  *
  * Shape: a typed per-partition batch stage with ONE `Deflater`
  * allocated per partition (reset between rows, `end()`ed when the
  * partition iterator drains) — the codec-init amortization pattern
  * shared with [[Multimodal]]'s decoders; zero shuffles, scan-stage at
  * any scale.
  *
  * Oracle posture: the deflated LENGTH depends on the zlib
  * implementation, so the q89 gate is invariant-form (the q28/q44
  * family): raw byte counts are hashed exactly, and two structural
  * facts that hold for ANY correct deflate ride as pinned-true
  * booleans — output never exceeds the stored-block bound, and a
  * 10×-repeated text compresses to strictly less than 10× the
  * original's deflate size (self-similarity within the window).
  */
object CompressionStats {

  /** Per-document compression accounting. `ratio_e6` = deflated/raw
    * ×10⁶ fixed-point (integer, so downstream thresholds are
    * engine-stable); `deflate10_bytes` deflates the text repeated ×10
    * (the self-similarity probe).
    */
  final case class DocCompression(
      doc_id: Long,
      raw_bytes: Long,
      deflate_bytes: Long,
      deflate10_bytes: Long,
      ratio_e6: Long)

  implicit private val enc: Encoder[DocCompression] =
    Encoders.product[DocCompression]

  private def deflatedLen(d: java.util.zip.Deflater,
      bytes: Array[Byte]): Long = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Per-doc deflate accounting at the given zlib level (6 = zlib
    * default; the level is a knob, the invariants hold at any level).
    */
  def perDoc(docs: DataFrame, idCol: String, textCol: String,
      level: Int = 6): Dataset[DocCompression] = {
    require(level >= 0 && level <= 9)
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        val d = new java.util.zip.Deflater(level)
        var closed = false
        new Iterator[DocCompression] {
          def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h && !closed) { d.end(); closed = true }
            h
          }
          def next(): DocCompression = {
            val (id, text) = rows.next()
            val raw = text.getBytes("UTF-8")
            val one = deflatedLen(d, raw)
            val rep = new Array[Byte](raw.length * 10)
            var i = 0
            while (i < 10) {
              System.arraycopy(raw, 0, rep, i * raw.length, raw.length)
              i += 1
            }
            val ten = deflatedLen(d, rep)
            val ratio =
              if (raw.length == 0) 1000000L
              else one * 1000000L / raw.length
            DocCompression(id, raw.length.toLong, one, ten, ratio)
          }
        }
      }
  }
}
