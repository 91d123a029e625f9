package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{MinHashDedup, Multimodal, NGramJaccard, SimHash, SimilaritySearch}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

import graft.queries.QueryUtil.{Q, scratchDir, tokRe}

/** image tier: real container codecs (PNG/JPEG/GIF/BMP/TIFF/WebP),
  * EXIF, perceptual dHash dedup with closure and incremental arms.
  *
  * One tier of the [[ExtQueries]] registry (split per registry tier so
  * no single file carries the whole 200-query surface); entries and
  * oracle SQL are verbatim registry members composed back together in
  * [[ExtQueries]].
  */
object ExtImageQueries {

  val queries: Map[String, Q] = Map(
    // ── image-header metadata decode: REAL container-format parsing
    // (PNG IHDR with CRC validation, JPEG SOF marker walk), no native
    // codec. Payloads are header-only fixtures built per doc_id with
    // arithmetic dims, so the oracle pins parser∘encoder = identity
    // over both formats: a byte-offset or endianness slip in EITHER
    // direction breaks the hash. (Fills the q06 slot retired in round 1
    // when the relational surface renumbered.)
    "q06_image_headers" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 640 + 16).toInt
          val h = (id % 480 + 16).toInt
          val (payload, fmt) =
            if (id % 2 == 0)
              (graft.functions.ImageHeaders.pngHeaderBytes(w, h), "image/png")
            else
              (graft.functions.ImageHeaders.jpegHeaderBytes(w, h), "image/jpeg")
          Multimodal.MediaRow(id, payload, fmt, source)
        }
      Multimodal.imageMeta(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("format_detected").as("fmt"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
    },

    // ── perceptual image hash (dHash): q81's synthetic PNG rasters
    // through the REAL decode, then the 9×8 luma grid's horizontal
    // gradient-sign bits. Integer-exact throughout, so the oracle
    // replays pixel formula → truncating resize indices → Rec.601
    // luma → bit pack from pure SQL arithmetic; the 64-bit hash rides
    // as two unsigned 32-bit halves (a BIGINT can't carry bit 63 as a
    // sum term portably). Corpus-scale near-dup pairing over these
    // hashes reuses the SimHash pigeonhole chunk join (spec-pinned).
    "q93_image_dhash" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.PngCodec.encode(img),
            "image/png", source)
        }
      Multimodal.imageDHash(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"),
          shiftrightunsigned(col("dhash"), 32).as("dhash_hi"))
    },

    // ── end-to-end image dedup closure: the q93 rasters through REAL
    // decode → dHash → pigeonhole Hamming pairs (≤2) → connected
    // components → canonical label per near-dup cluster. The fixture
    // family makes this semantically sharp: the raster formula's
    // horizontal gradients are doc_id-INDEPENDENT for a fixed (w,h)
    // class, i.e. same-dimension images are brightness-shifted copies
    // — exactly what dHash exists to identify (422 of 500 docs fall
    // into 21 clusters at sf0.01). Identical hashes collapse to a
    // representative BEFORE the Hamming join (exact-dup cliques are
    // the corpus mass; pairs over distinct VALUES, not images —
    // equivalence to the naive pairs∘closure spec-pinned). Oracle
    // replays hash arithmetic, brute-force Hamming on the 32-bit
    // halves (bit_count∘xor — no 64-bit reconstruction, bit 63 won't
    // ride a BIGINT), and a recursive-CTE closure over the FULL pair
    // graph, so the collapse must be invisible in the answer.
    "q96_image_dedup_closure" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.PngCodec.encode(img),
            "image/png", source)
        }
      Multimodal.nearDuplicateImageComponents(media, maxDist = 2)
    },

    // ── incremental image dedup (the multimodal member of the q50/q54
    // incremental family): the 10% batch (doc_id ≡ 0 mod 10) arrives
    // as raw payloads, the corpus as its stored 8-byte dHash index;
    // pairs with ≥1 batch side via batch×corpus + batch×batch chunk
    // joins — corpus×corpus never enumerated. EXACT oracle: brute
    // Hamming over the formula hashes with the ≥1-batch-side predicate.
    "q99_incremental_image_dedup" -> { (s, dir) =>
      import s.implicits._
      val all = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.PngCodec.encode(img),
            "image/png", source)
        }
      val batch = all.filter(r => r.media_id % 10 == 0)
      val corpusIndex = Multimodal.imageDHash(
          all.filter(r => r.media_id % 10 != 0)).toDF()
        .filter(col("dhash").isNotNull)
        .select(col("media_id"), col("dhash"))
      Multimodal.incrementalNearDuplicateImages(batch, corpusIndex, maxDist = 2)
        .select(col("doc_a"), col("doc_b"),
          col("hamming").cast("long").as("hamming"))
    },

    // ── multimodal plumbing: opaque binary payload column + typed
    // metadata. Payload here is the utf-8 text bytes standing in for an
    // image/audio blob; decode itself is stubbed in graft.ext.Multimodal.
    "q23_multimodal_meta" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          col("source"))
        .select(
          col("doc_id"),
          length(col("payload")).as("payload_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("source"))
    },

    // ── multimodal decode invariant, driver-checked (was rows-only):
    // the mapPartitions batch contract must be deterministic — two
    // extraction runs over DIFFERENT partitionings produce identical
    // feature vectors — and the Spark-side plumbing (payload bytes
    // through toMedia) is oracled against octet_length in SQL.
    // All-true frame. The second run is deliberately repartitioned so
    // its canonical plan differs from the first: with byte-identical
    // plans, exchange/subplan reuse would evaluate the extraction ONCE
    // and compare it with itself, making the invariant vacuous — the
    // distinct partitioning both defeats reuse and strengthens the
    // claim to partition-layout independence.
    "q28_media_features" -> { (s, dir) =>
      def run(docs: org.apache.spark.sql.DataFrame) = Multimodal
        .extractFeatures(Multimodal.toMedia(docs), dim = 8).toDF()
      val docs = Tables.documents(s, dir)
      val a = run(docs)
        .select(col("media_id"), col("n_bytes"), col("features").as("fa"))
      val b = run(docs.repartition(7, col("doc_id")))
        .select(col("media_id"), col("features").as("fb"))
      a.join(b, "media_id")
        .select(col("media_id"), col("n_bytes"),
          (col("fa") === col("fb")).as("deterministic"))
    },

    // ── REAL PNG pixel decode: per doc_id a synthetic RGB raster with
    // arithmetic pixel values is encoded to a standards-compliant PNG
    // (zlib IDAT, per-row filters 0-4) and decoded back through the
    // full chunk-walk → inflate → unfilter pipeline; the oracle
    // recomputes the integer luma sum from the pixel formula, so a slip
    // anywhere — filter math, inflate bounds, channel order, CRC —
    // breaks the hash. (The encode side uses every filter type, so all
    // five unfilter arms are on the verified path.)
    "q81_png_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.PngCodec.encode(img),
            "image/png", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── REAL JPEG pixel decode (the lossy sibling of q81, made
    // hash-gateable): per doc_id a DC-only flat-block JPEG — even ids
    // grayscale, odd ids 4:2:0 YCbCr — is entropy-ENCODED (canonical
    // Huffman, byte stuffing, per-block DC prediction) then decoded
    // back through the full marker walk → Huffman → dequant → IDCT →
    // upsample → YCbCr→RGB pipeline. Flat blocks with DC quantum 8
    // survive quantization exactly (F(0,0)=8·(v−128) is divisible, the
    // IDCT has one term), so the oracle replays the per-MCU value
    // formula plus the JFIF color matrix in SQL and the hash gate
    // applies to a lossy format. A slip in Huffman table construction,
    // EXTEND, prediction, dequant, upsample, or the color matrix —
    // either direction — breaks it.
    "q84_jpeg_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val payload =
            if (id % 2 == 0)
              graft.functions.JpegCodec.encodeFlatGray(w, h,
                (bx, by) => ((id + 7 * bx + 13 * by) % 256).toInt)
            else
              graft.functions.JpegCodec.encodeFlatYcc420(w, h, (mx, _) => (
                ((id + 5 * mx) % 256).toInt,
                ((2 * id + 11 * mx) % 256).toInt,
                ((3 * id + 7 * mx) % 256).toInt))
          Multimodal.MediaRow(id, payload, "image/jpeg", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── PROGRESSIVE JPEG pixel decode (q84's sibling for the majority
    // encoding of large web JPEGs): the same flat-block content as q84
    // even-ids, but entropy-coded through the four-scan successive-
    // approximation script (DC first Al=1 → AC EOB-runs → DC refine →
    // AC refine). Flat blocks survive the approximation losslessly
    // (floor(x/2)·2 + (x&1) = x; DC quantum 8), so the SAME arithmetic
    // oracle applies — a slip in scan dispatch, coefficient
    // accumulation, EOB-run bookkeeping, or the point transform breaks
    // the hash in either direction.
    "q113_jpeg_progressive_stats" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val payload = graft.functions.JpegCodec.encodeFlatGrayProgressive(
            w, h, (bx, by) => ((id + 7 * bx + 13 * by) % 256).toInt)
          Multimodal.MediaRow(id, payload, "image/jpeg", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── REAL GIF pixel decode (the palette sibling of q81/q84): per
    // doc_id a 64-color palette + index raster is LZW-COMPRESSED into
    // a GIF89a container (real string-table LZW — dictionary growth,
    // code-width bumps, sub-block framing) and decoded back through
    // the block walk → LZW → palette-map pipeline; odd ids are
    // INTERLACED, so the four-pass row reorder is under the hash too.
    // The oracle replays palette and index arithmetic in SQL — a slip
    // in LZW code scheduling, bit packing, or interlace mapping in
    // EITHER direction breaks it.
    "q122_gif_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val (palette, idx) = graft.functions.GifCodec.syntheticIndexed(id, w, h)
          Multimodal.MediaRow(id,
            graft.functions.GifCodec.encode(w, h, palette, idx,
              interlaced = id % 2 == 1),
            "image/gif", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── BMP raster identity (the 4th still-image codec): the same
    // integer pixel formulas as q81, recovered through a REAL 24-bit
    // BI_RGB encode→decode (BGR order, bottom-up rows, 4-byte row
    // padding). Shares q81's arithmetic oracle verbatim.
    "q149_bmp_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.BmpCodec.encode(img),
            "image/bmp", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── REAL WebP/VP8L pixel decode (the 5th still-image codec — the
    // majority lossless encoding of a modern crawl): per doc_id a
    // 4×4-BLOCK raster (horizontal runs + repeated colors, so the
    // encoder's LZ77 distance-1 copies AND color-cache hits are on the
    // verified path, not just literals) is VP8L-encoded — package-merge
    // Huffman, RLE'd code lengths, cache inserts — and decoded back
    // through the full container walk → prefix-code rebuild → LZ77/
    // cache pixel loop. Ids rotate the encoder path so every transform
    // arm is under THIS hash gate: id%3==0 subtract-green + predictor
    // mode 11 (Select) with its sub-resolution mode image; id%3==1
    // COLOR-INDEXING (block rasters have ≤20 colors → bundled sub-byte
    // indices); id%3==2 the plain stream. A slip in canonical code
    // assignment, bit order, the repeat codes, cache hashing, copy
    // addressing, any inverse transform, or palette delta-coding
    // breaks the hash.
    "q153_webp_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val data = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = (y * w + x) * 3
              data(i) = ((id + 3L * (x / 4) + 7L * (y / 4)) % 256).toByte
              data(i + 1) = ((2L * id + 5L * (x / 4) + (y / 4)) % 256).toByte
              data(i + 2) = ((3L * id + (x / 4) + 11L * (y / 4)) % 256).toByte
              x += 1
            }
            y += 1
          }
          val img = graft.functions.PngCodec.Image(w, h, 3, data)
          val payload = (id % 3) match {
            case 0 => graft.functions.WebpCodec.encodeWith(img,
              subtractGreen = true, predictorMode = Some(11))
            case 1 => graft.functions.WebpCodec.encodeIndexed(img)
            case _ => graft.functions.WebpCodec.encode(img)
          }
          Multimodal.MediaRow(id, payload, "image/webp", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── REAL TIFF decode (the 6th still-image codec — the archival/
    // scan format): q81's synthetic raster rides a TIFF encode→decode
    // with ids rotating the compression arm (none / LZW with its
    // early-change width quirk / PackBits), the horizontal predictor
    // on the LZW arm, and multi-strip assembly (5-row strips) — all
    // under the same arithmetic luma oracle as q81/q149. The JDK
    // ImageIO cross-check lives in TiffCodecSpec.
    "q164_tiff_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          val payload = (id % 3) match {
            case 0 => graft.functions.TiffCodec.encode(img, 5,
              rowsPerStrip = 5, predictor = true)
            case 1 => graft.functions.TiffCodec.encode(img, 32773, rowsPerStrip = 5)
            case _ => graft.functions.TiffCodec.encode(img, 1)
          }
          Multimodal.MediaRow(id, payload, "image/tiff", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── EXIF metadata through a real JPEG APP1 walk: per doc a full
    // IFD0 + Exif sub-IFD (byte order rotating with doc parity,
    // inline SHORT/LONG values, offset-stored ASCII and RATIONAL) is
    // embedded after SOI of a real JpegCodec stream and recovered
    // field-exact; rationals ship as num/den strings (NUMERICS
    // numerator/denominator discipline — never divided).
    "q174_exif_meta" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val meta = graft.functions.ExifCodec.ExifMeta(
            byteOrderLittle = id % 2 == 0,
            orientation = Some((id % 8 + 1).toInt),
            make = Some("CamCo"),
            model = Some("M" + (id % 5)),
            dateTime = Some(s"2026:01:0${id % 9 + 1} 12:00:00"),
            exifWidth = Some(id % 640 + 16),
            exifHeight = Some(id % 480 + 16),
            iso = Some((100 + (id % 8) * 100).toInt),
            exposure = Some(graft.functions.ExifCodec.Rational(1, id % 500 + 1)),
            fNumber = Some(graft.functions.ExifCodec.Rational(id % 10 + 10, 5)))
          val jpeg = graft.functions.JpegCodec.encodeFlatGray(
            16, 16, (_, _) => ((id % 200) + 28).toInt)
          val got = graft.functions.ExifCodec
            .fromJpeg(graft.functions.ExifCodec.withExif(jpeg, meta))
            .getOrElse(graft.functions.ExifCodec.Empty)
          (id,
            got.orientation.map(_.toLong).getOrElse(-1L),
            got.make.getOrElse(""), got.model.getOrElse(""),
            got.dateTime.getOrElse(""),
            got.exifWidth.getOrElse(-1L), got.exifHeight.getOrElse(-1L),
            got.iso.map(_.toLong).getOrElse(-1L),
            got.exposure.map(x => s"${x.num}/${x.den}").getOrElse(""),
            got.fNumber.map(x => s"${x.num}/${x.den}").getOrElse(""))
        }
        .toDF("doc_id", "orientation", "make", "model", "date_time",
          "exif_w", "exif_h", "iso", "exposure", "fnumber")
    },
  )

  private[queries] val oracleBase: Map[String, String] = Map(
    // parser∘encoder identity: the oracle recomputes the dims the Spark
    // side ENCODED into real PNG/JPEG header bytes and then PARSED back
    "q06_image_headers" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
        |  doc_id % 640 + 16 AS width,
        |  doc_id % 480 + 16 AS height
        |FROM documents""".stripMargin,

    // pixel-kernel identity: the oracle replays the synthetic raster's
    // integer pixel formula; the Spark side must recover it through a
    // real PNG encode→decode (deflate, filters, CRCs)
    "q81_png_pixel_stats" ->
      """SELECT d.doc_id,
        |  d.doc_id % 16 + 4 AS width,
        |  d.doc_id % 12 + 4 AS height,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(299*((d.doc_id + 3*x.i + 7*y.i) % 256)
        |         + 587*((2*d.doc_id + 5*x.i + y.i) % 256)
        |         + 114*((3*d.doc_id + x.i + 11*y.i) % 256)) AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id""".stripMargin,

    // lossy-format identity: the oracle replays the flat-block value
    // formulas and the JFIF YCbCr→RGB matrix (identical double
    // expressions → identical IEEE results → floor agrees); the Spark
    // side must recover them through a real JPEG entropy encode→decode
    "q84_jpeg_pixel_stats" ->
      """WITH px AS (
        |  SELECT d.doc_id AS doc_id, x.i AS x, y.i AS y,
        |    (d.doc_id + 5*(x.i//16)) % 256 AS yv,
        |    (2*d.doc_id + 11*(x.i//16)) % 256 AS cb,
        |    (3*d.doc_id + 7*(x.i//16)) % 256 AS cr
        |  FROM documents d
        |  JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |  JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4),
        |rgb AS (
        |  SELECT doc_id, x, y,
        |    least(255, greatest(0, CAST(floor(yv + 1.402*(cr-128) + 0.5) AS BIGINT))) AS r,
        |    least(255, greatest(0, CAST(floor(yv - 0.344136*(cb-128) - 0.714136*(cr-128) + 0.5) AS BIGINT))) AS g,
        |    least(255, greatest(0, CAST(floor(yv + 1.772*(cb-128) + 0.5) AS BIGINT))) AS b
        |  FROM px)
        |SELECT doc_id,
        |  doc_id % 16 + 4 AS width,
        |  doc_id % 12 + 4 AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS channels,
        |  (doc_id % 16 + 4) * (doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0
        |    THEN 1000*((doc_id + 7*(x//8) + 13*(y//8)) % 256)
        |    ELSE 299*r + 587*g + 114*b END) AS BIGINT) AS luma_sum
        |FROM rgb GROUP BY doc_id""".stripMargin,

    // progressive identity: the successive-approximation round-trip is
    // lossless on flat blocks, so the oracle is q84's gray arithmetic
    // verbatim — the engine side must recover it through the four-scan
    // progressive decode instead of the baseline path
    "q113_jpeg_progressive_stats" ->
      """SELECT d.doc_id AS doc_id,
        |  d.doc_id % 16 + 4 AS width,
        |  d.doc_id % 12 + 4 AS height,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(1000*((d.doc_id + 7*(x.i//8) + 13*(y.i//8)) % 256)) AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id""".stripMargin,

    // dHash replay from pure arithmetic: q81's pixel formula sampled at
    // the truncating 9×8 grid indices, Rec.601 integer luma, horizontal
    // gradient-sign bits summed into the two unsigned halves
    "q93_image_dhash" ->
      """WITH g AS (
        |  SELECT d.doc_id, r.i AS r, c.i AS c,
        |    (c.i * (d.doc_id % 16 + 4)) // 9 AS sx,
        |    (r.i * (d.doc_id % 12 + 4)) // 8 AS sy
        |  FROM documents d
        |  JOIN range(0, 8) r(i) ON true
        |  JOIN range(0, 9) c(i) ON true),
        |l AS (
        |  SELECT doc_id, r, c,
        |    299*((doc_id + 3*sx + 7*sy) % 256)
        |      + 587*((2*doc_id + 5*sx + sy) % 256)
        |      + 114*((3*doc_id + sx + 11*sy) % 256) AS luma
        |  FROM g),
        |b AS (
        |  SELECT a.doc_id, a.r, a.c,
        |    CASE WHEN a.luma < n.luma THEN 1 ELSE 0 END AS bit
        |  FROM l a JOIN l n
        |    ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
        |  WHERE a.c < 8)
        |SELECT doc_id,
        |  doc_id % 16 + 4 AS width,
        |  doc_id % 12 + 4 AS height,
        |  CAST(sum(CASE WHEN r*8+c < 32
        |    THEN bit * (CAST(1 AS BIGINT) << (r*8+c)) ELSE 0 END) AS BIGINT) AS dhash_lo,
        |  CAST(sum(CASE WHEN r*8+c >= 32
        |    THEN bit * (CAST(1 AS BIGINT) << (r*8+c-32)) ELSE 0 END) AS BIGINT) AS dhash_hi
        |FROM b GROUP BY doc_id""".stripMargin,

    // palette-format identity: color index c = (doc_id+3x+7y)%64,
    // palette[c] = ((5c+id)%256, (3c+2id)%256, (7c+3id)%256); the
    // engine must recover this through a real LZW decode (+ interlace
    // reorder on odd ids)
    "q122_gif_pixel_stats" ->
      """SELECT d.doc_id,
        |  d.doc_id % 16 + 4 AS width,
        |  d.doc_id % 12 + 4 AS height,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(299*((5*((d.doc_id + 3*x.i + 7*y.i) % 64) + d.doc_id) % 256)
        |         + 587*((3*((d.doc_id + 3*x.i + 7*y.i) % 64) + 2*d.doc_id) % 256)
        |         + 114*((7*((d.doc_id + 3*x.i + 7*y.i) % 64) + 3*d.doc_id) % 256))
        |       AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id""".stripMargin,

    // brute-force replay of the incremental contract: q93's hash
    // arithmetic, all pairs at Hamming ≤ 2 with at least one batch side
    "q99_incremental_image_dedup" ->
      """WITH g AS (
        |  SELECT d.doc_id, r.i AS r, c.i AS c,
        |    (c.i * (d.doc_id % 16 + 4)) // 9 AS sx,
        |    (r.i * (d.doc_id % 12 + 4)) // 8 AS sy
        |  FROM documents d
        |  JOIN range(0, 8) r(i) ON true
        |  JOIN range(0, 9) c(i) ON true),
        |l AS (
        |  SELECT doc_id, r, c,
        |    299*((doc_id + 3*sx + 7*sy) % 256)
        |      + 587*((2*doc_id + 5*sx + sy) % 256)
        |      + 114*((3*doc_id + sx + 11*sy) % 256) AS luma
        |  FROM g),
        |b AS (
        |  SELECT a.doc_id, a.r, a.c,
        |    CASE WHEN a.luma < n.luma THEN 1 ELSE 0 END AS bit
        |  FROM l a JOIN l n
        |    ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN r*8+c < 32
        |      THEN bit * (CAST(1 AS BIGINT) << (r*8+c)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN r*8+c >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (r*8+c-32)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM b GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 2
        |  AND (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)""".stripMargin,

    // q93's hash arithmetic + brute Hamming on the halves + recursive
    // closure (q34's reach pattern)
    "q96_image_dedup_closure" ->
      """WITH RECURSIVE g AS (
        |  SELECT d.doc_id, r.i AS r, c.i AS c,
        |    (c.i * (d.doc_id % 16 + 4)) // 9 AS sx,
        |    (r.i * (d.doc_id % 12 + 4)) // 8 AS sy
        |  FROM documents d
        |  JOIN range(0, 8) r(i) ON true
        |  JOIN range(0, 9) c(i) ON true),
        |l AS (
        |  SELECT doc_id, r, c,
        |    299*((doc_id + 3*sx + 7*sy) % 256)
        |      + 587*((2*doc_id + 5*sx + sy) % 256)
        |      + 114*((3*doc_id + sx + 11*sy) % 256) AS luma
        |  FROM g),
        |b AS (
        |  SELECT a.doc_id, a.r, a.c,
        |    CASE WHEN a.luma < n.luma THEN 1 ELSE 0 END AS bit
        |  FROM l a JOIN l n
        |    ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN r*8+c < 32
        |      THEN bit * (CAST(1 AS BIGINT) << (r*8+c)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN r*8+c >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (r*8+c-32)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM b GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM h a JOIN h b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 2),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
        |SELECT src AS vertex, least(src, MIN(dst)) AS component
        |FROM reach GROUP BY src""".stripMargin,

    "q23_multimodal_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS payload_bytes,
        |  md5(text) AS payload_md5, source
        |FROM documents""".stripMargin,

    "q28_media_features" ->
      """SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  true AS deterministic
        |FROM documents""".stripMargin,

    // block-raster identity: the oracle replays the 4x4-block pixel
    // formula; the Spark side recovers it through a real VP8L
    // encode→decode (prefix codes, LZ77 copies, color cache)
    "q153_webp_pixel_stats" ->
      """SELECT d.doc_id,
        |  d.doc_id % 16 + 4 AS width,
        |  d.doc_id % 12 + 4 AS height,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(299*((d.doc_id + 3*(x.i//4) + 7*(y.i//4)) % 256)
        |         + 587*((2*d.doc_id + 5*(x.i//4) + (y.i//4)) % 256)
        |         + 114*((3*d.doc_id + (x.i//4) + 11*(y.i//4)) % 256))
        |    AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id""".stripMargin,

    // IFD-grammar identity: every field the APP1 walk must recover
    "q174_exif_meta" ->
      """SELECT doc_id,
        |  CAST(doc_id % 8 + 1 AS BIGINT) AS orientation,
        |  'CamCo' AS make,
        |  'M' || (doc_id % 5) AS model,
        |  '2026:01:0' || (doc_id % 9 + 1) || ' 12:00:00' AS date_time,
        |  CAST(doc_id % 640 + 16 AS BIGINT) AS exif_w,
        |  CAST(doc_id % 480 + 16 AS BIGINT) AS exif_h,
        |  CAST(100 + (doc_id % 8) * 100 AS BIGINT) AS iso,
        |  '1/' || (doc_id % 500 + 1) AS exposure,
        |  (doc_id % 10 + 10) || '/5' AS fnumber
        |FROM documents""".stripMargin,
  )
}
