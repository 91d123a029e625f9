package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * / frame-sample run as typed `mapPartitions` stages (the Scala
  * analogue of Pandas-UDF batch processing — per-partition iteration, so
  * a real decoder would amortize codec/model init per partition, not per
  * row).
  *
  * Two tiers of "decode":
  *
  *  - HEADER decode ([[imageMeta]]) is REAL: dependency-free PNG/JPEG
  *    container parsing ([[graft.functions.ImageHeaders]] — IHDR with
  *    CRC validation, SOF marker walk) recovers format and pixel
  *    dimensions from the leading bytes. Oracle-checked end to end
  *    (q06: parser∘encoder identity over both formats).
  *  - PIXEL/SAMPLE decode is REAL for PNG, baseline JPEG, and 16-bit
  *    PCM WAV: [[pixelStats]]/[[resizeImages]] run
  *    [[graft.functions.PngCodec]] (IDAT zlib inflate + scanline
  *    unfilter — no native codec, zlib IS the format) with
  *    [[graft.functions.JpegCodec]] (marker walk → Huffman → dequant →
  *    IDCT → upsample → YCbCr) as the fallback leg, and [[sampleStats]]
  *    folds int16 samples from the WAV data chunk, and VIDEO is real
  *    as MJPEG-in-AVI ([[graft.functions.AviCodec]] container walk +
  *    per-frame JPEG decode in [[frameStats]]). Progressive JPEG and
  *    formats beyond these take the [[FakeDecoder]] tier below.
  *  - GENERIC feature extraction over arbitrary formats remains the
  *    declared stub: [[FakeDecoder]] derives a deterministic vector
  *    from the payload bytes. The Spark-side contract — schema, batch
  *    shape, partitioning, null/empty handling — is real and tested;
  *    swapping in a true embedding model touches only
  *    [[FakeDecoder.decode]].
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      source: String)

  /** Extracted features: fixed-dim vector + payload stats. */
  case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      features: Array[Float])

  /** Header-decoded metadata: format/dims are None when the payload is
    * not a parseable PNG/JPEG (text blobs, truncated headers, CRC
    * mismatches).
    */
  case class MediaMeta(
      media_id: Long,
      n_bytes: Long,
      format_detected: Option[String],
      width: Option[Int],
      height: Option[Int])

  /** Header-decoded audio metadata; None fields on non-WAV payloads. */
  case class AudioMeta(
      media_id: Long,
      n_bytes: Long,
      channels: Option[Int],
      sample_rate: Option[Int],
      bits_per_sample: Option[Int],
      n_frames: Option[Long])

  /** Frame-walk MP3 metadata ([[graft.functions.Mp3Codec]]); None
    * fields on payloads that are not a consistent Layer III walk.
    * `n_samples` is exact — duration derives as n_samples/sample_rate
    * downstream, the numerator/denominator time discipline.
    */
  case class Mp3Meta(
      media_id: Long,
      n_bytes: Long,
      version: Option[String],
      bitrate_kbps: Option[Int],
      sample_rate: Option[Int],
      channels: Option[Int],
      n_frames: Option[Long],
      n_samples: Option[Long])

  implicit private val mediaEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit private val metaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
  implicit private val audioEnc: Encoder[AudioMeta] = Encoders.product[AudioMeta]
  implicit private val mp3Enc: Encoder[Mp3Meta] = Encoders.product[Mp3Meta]

  /** STUB decoder — deterministic fake standing in for a real
    * image/audio codec. A production decoder would replace `decode`
    * with (e.g.) JPEG decode + patch embedding; everything around it
    * stays identical.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      // Deterministic "features": per-slot byte-windowed FNV-1a hashes
      // scaled into [-1, 1]. Stable across JVMs and partitionings.
      val out = new Array[Float](dim)
      var slot = 0
      while (slot < dim) {
        var h = 2166136261L ^ slot
        var i = slot
        while (i < payload.length) {
          h = (h ^ (payload(i) & 0xff)) * 16777619L
          i += dim
        }
        out(slot) = ((h & 0xffffff).toFloat / 0x7fffff) - 1.0f
        slot += 1
      }
      out
    }
  }

  /** Wrap a text corpus as media rows — utf-8 bytes stand in for real
    * blobs in the fixtures; a real pipeline reads
    * `spark.read.format("binaryFile")` into the same shape.
    */
  def toMedia(docs: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "text", sourceCol: String = "source"): Dataset[MediaRow] =
    docs.select(
        col(idCol).cast("long").as("media_id"),
        col(payloadCol).cast("binary").as("payload"),
        lit("text/plain").as("format"),
        col(sourceCol).as("source"))
      .as[MediaRow]

  /** Batch feature extraction: per-partition decode (codec init once per
    * partition — the batch shape a real decoder needs).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      // real impl: val codec = HeavyCodec.open()  — once per partition
      rows.map { r =>
        MediaFeatures(r.media_id, r.payload.length.toLong,
          FakeDecoder.decode(r.payload, dim))
      }
    }

  /** Header-only metadata decode — the REAL byte-format leg of the
    * multimodal surface: PNG IHDR (CRC-validated) and JPEG SOF marker
    * walk via [[graft.functions.ImageHeaders]], per-partition like
    * every other decode stage. O(header) per row regardless of payload
    * size; unparseable payloads yield None columns rather than errors
    * (dirty corpora are the normal case).
    */
  def imageMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val d = graft.functions.ImageHeaders.dims(r.payload)
        MediaMeta(r.media_id, r.payload.length.toLong,
          d.map(_.format), d.map(_.width), d.map(_.height))
      }
    }

  /** Audio sibling of [[imageMeta]]: WAV/RIFF header walk via
    * [[graft.functions.AudioHeaders]] — channels, sample rate, bit
    * depth, frame count from the container header, samples untouched.
    */
  def audioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = graft.functions.AudioHeaders.wavMeta(r.payload)
        AudioMeta(r.media_id, r.payload.length.toLong,
          m.map(_.channels), m.map(_.sampleRate),
          m.map(_.bitsPerSample), m.map(_.nFrames))
      }
    }

  /** Compressed-audio sibling of [[audioMeta]]: the MP3 frame walk
    * ([[graft.functions.Mp3Codec.meta]]) — O(frame headers) per row,
    * same per-partition decode stage, total on dirty payloads.
    */
  def mp3Meta(media: Dataset[MediaRow]): Dataset[Mp3Meta] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = graft.functions.Mp3Codec.meta(r.payload)
        Mp3Meta(r.media_id, r.payload.length.toLong,
          m.map(_.version), m.map(_.bitrateKbps), m.map(_.sampleRate),
          m.map(_.channels), m.map(_.nFrames), m.map(_.nSamples))
      }
    }

  /** Pixel-decoded image stats — REAL decode, not the FakeDecoder
    * tier: [[graft.functions.PngCodec]] runs the chunk walk, IDAT zlib
    * inflate, and scanline unfilter, then integer luma is summed per
    * image (RGB(A): Σ(299R+587G+114B), Rec.601 ×1000 fixed-point;
    * gray(+alpha): Σ(1000·v) — same scale, so mixed corpora compare).
    * Baseline JPEG payloads take the [[graft.functions.JpegCodec]]
    * fallback (each codec rejects the other's magic bytes in O(1), so
    * the chain costs one signature check). None columns for anything
    * neither codec accepts. Oracle-checked end to end as q81 (PNG) and
    * q84 (JPEG — flat DC-only fixtures make the lossy format lossless,
    * so the hash gate applies).
    */
  case class PixelStats(
      media_id: Long,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      n_pixels: Option[Long],
      luma_sum: Option[Long])

  implicit private val pixEnc: Encoder[PixelStats] = Encoders.product[PixelStats]

  /** The image-codec dispatch chain shared by every pixel stage:
    * formats are sniffed by magic, so mixed corpora decode row by row
    * (PNG, JPEG, GIF, BMP, WebP/VP8L, TIFF).
    */
  private def decodeImage(payload: Array[Byte]): Option[graft.functions.PngCodec.Image] =
    graft.functions.PngCodec.decode(payload)
      .orElse(graft.functions.JpegCodec.decode(payload))
      .orElse(graft.functions.GifCodec.decode(payload))
      .orElse(graft.functions.BmpCodec.decode(payload))
      .orElse(graft.functions.WebpCodec.decode(payload))
      .orElse(graft.functions.TiffCodec.decode(payload))

  def pixelStats(media: Dataset[MediaRow]): Dataset[PixelStats] =
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.payload) match {
          case None =>
            PixelStats(r.media_id, None, None, None, None, None)
          case Some(img) =>
            PixelStats(r.media_id, Some(img.width), Some(img.height),
              Some(img.channels), Some(img.width.toLong * img.height),
              Some(lumaSum(img)))
        }
      }
    }

  /** Integer luma fold shared by the image and video stats stages:
    * RGB(A): Σ(299R+587G+114B) (Rec.601 ×1000 fixed-point); gray
    * (+alpha): Σ(1000·v) — same scale, so mixed corpora compare.
    */
  private def lumaSum(img: graft.functions.PngCodec.Image): Long = {
    var luma = 0L
    val d = img.data
    var i = 0
    img.channels match {
      case 3 | 4 =>
        while (i < d.length) {
          luma += 299L * (d(i) & 0xff) + 587L * (d(i + 1) & 0xff) +
            114L * (d(i + 2) & 0xff)
          i += img.channels
        }
      case _ => // gray / gray+alpha: value channel first
        while (i < d.length) {
          luma += 1000L * (d(i) & 0xff)
          i += img.channels
        }
    }
    luma
  }

  /** Per-pixel integer luma, same Rec.601 ×1000 fixed-point scale as
    * [[lumaSum]] (RGB(A): 299R+587G+114B; gray(+alpha): 1000·v).
    */
  private def lumaAt(img: graft.functions.PngCodec.Image,
      x: Int, y: Int): Long = {
    val i = (y * img.width + x) * img.channels
    val d = img.data
    img.channels match {
      case 3 | 4 =>
        299L * (d(i) & 0xff) + 587L * (d(i + 1) & 0xff) +
          114L * (d(i + 2) & 0xff)
      case _ => 1000L * (d(i) & 0xff)
    }
  }

  /** Perceptual difference-hash result; `dhash` None when the payload
    * decodes with neither codec.
    */
  case class ImageHash(
      media_id: Long,
      width: Option[Int],
      height: Option[Int],
      dhash: Option[Long])

  implicit private val ihEnc: Encoder[ImageHash] = Encoders.product[ImageHash]

  /** Perceptual image hash — dHash ("difference hash", Krawetz 2013;
    * the standard cheap near-dup key in image corpus pipelines, e.g.
    * the DataComp/LAION dedup stacks): decode (PNG, baseline-JPEG
    * fallback — [[pixelStats]]' chain), sample the integer luma on a
    * 9×8 nearest-neighbor grid (sx = ⌊c·w/9⌋, sy = ⌊r·h/8⌋ — same
    * truncating index rule as [[resizeImages]]), then bit r·8+c of the
    * 64-bit hash records L(r,c) < L(r,c+1): the horizontal gradient
    * SIGN pattern, which survives uniform scaling and brightness/
    * contrast shifts that preserve pixel ordering. Integer-exact end
    * to end, so the whole decode→sample→compare pipeline is
    * oracle-replayable (q93) — and because nested floor division
    * composes (⌊⌊k·a/m⌋/k⌋ = ⌊a/m⌋), an integer-factor nearest-
    * neighbor upscale provably CANNOT change the hash (spec-pinned).
    *
    * Scale shape: a scan-stage mapPartitions projection, one row per
    * image — the corpus-scale near-dup join over these hashes is
    * [[nearDuplicateImages]].
    */
  def imageDHash(media: Dataset[MediaRow]): Dataset[ImageHash] =
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.payload) match {
          case None => ImageHash(r.media_id, None, None, None)
          case Some(img) =>
            val l = Array.ofDim[Long](8, 9)
            var row = 0
            while (row < 8) {
              val sy = (row.toLong * img.height / 8).toInt
              var c = 0
              while (c < 9) {
                val sx = (c.toLong * img.width / 9).toInt
                l(row)(c) = lumaAt(img, sx, sy)
                c += 1
              }
              row += 1
            }
            var h = 0L
            var k = 0
            while (k < 64) {
              if (l(k / 8)(k % 8) < l(k / 8)(k % 8 + 1)) h |= 1L << k
              k += 1
            }
            ImageHash(r.media_id, Some(img.width), Some(img.height), Some(h))
        }
      }
    }

  /** Image near-duplicate pairs by dHash Hamming distance ≤ `maxDist`,
    * blocked EXACTLY via [[SimHash.nearPairsFromSignatures]]'
    * pigeonhole chunk join (maxDist+1 chunks of the 64-bit key ⇒ every
    * qualifying pair shares one chunk — no all-pairs stage, same
    * corpus-scale shape as the text SimHash path). Undecodable rows
    * drop out (no hash, no pair). Output: `doc_a`, `doc_b`, `hamming`.
    */
  def nearDuplicateImages(media: Dataset[MediaRow], maxDist: Int): DataFrame =
    SimHash.nearPairsFromSignatures(
      imageDHash(media).toDF()
        .filter(col("dhash").isNotNull)
        .select(col("media_id").as("id"), col("dhash").as("simhash")),
      maxDist)

  /** Incremental image near-dup — the multimodal sibling of
    * [[MinHashDedup.incrementalNearDuplicates]] /
    * [[SimilaritySearch.incrementalCosineNearDuplicates]]: pairs at
    * Hamming ≤ `maxDist` where at least ONE side is from `newMedia` —
    * batch×corpus plus batch×batch through the same pigeonhole chunk
    * join; corpus×corpus is NEVER enumerated, so per-batch cost is
    * |batch|-proportional, not |corpus|². The corpus side arrives as an
    * already-hashed index frame (`media_id`, `dhash`) — at 100 TB the
    * stored index IS the hashes, 8 bytes per image; re-decoding the
    * corpus per batch would defeat the point. Output: `doc_a` <
    * `doc_b`, `hamming`.
    */
  def incrementalNearDuplicateImages(newMedia: Dataset[MediaRow],
      corpusHashes: DataFrame, maxDist: Int): DataFrame = {
    val nChunks = maxDist + 1
    def chunked(sigs: DataFrame): DataFrame = sigs
      .select(col("id"), col("simhash"),
        explode(SimHash.chunkKeys(col("simhash"), nChunks)).as("c"))
      .select(col("id"), col("simhash"),
        col("c.chunk").as("chunk"), col("c.ck").as("ck"))
    // cached: feeds the cross join AND the batch-internal self join
    val newSigs = imageDHash(newMedia).toDF()
      .filter(col("dhash").isNotNull)
      .select(col("media_id").as("id"), col("dhash").as("simhash"))
      .cache()
    val newChunked = chunked(newSigs)
    val oldChunked = chunked(
      corpusHashes.select(col("media_id").as("id"), col("dhash").as("simhash")))
    val cross = newChunked.as("a").join(oldChunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") =!= col("b.id") &&
          expr("bit_count(a.simhash ^ b.simhash)") <= maxDist)
      .select(least(col("a.id"), col("b.id")).as("doc_a"),
        greatest(col("a.id"), col("b.id")).as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
    val within = SimHash.nearPairsFromSignatures(newSigs, maxDist)
    cross.unionByName(within).distinct()
  }

  /** Image near-duplicate CLUSTERS: per image in any near-dup relation,
    * (vertex = media_id, component = smallest media_id reachable via
    * Hamming ≤ `maxDist` steps) — [[nearDuplicateImages]] composed with
    * [[ConnectedComponents]], but scale-restructured: identical hashes
    * collapse to one representative (min id) BEFORE the pair join, so
    * the Hamming join and the closure run over DISTINCT hash values,
    * not images. Exact-duplicate cliques are the dominant mass in a
    * dedup corpus (a k-copy image contributes k²/2 pairs but only ONE
    * distinct hash), so candidate volume drops from Σ clique² to
    * Σ distinct-hash-bucket² — the standard exact-collapse-then-
    * near-dup staging of large dedup pipelines. EXACT equivalence to
    * the naive pairs∘closure composition (spec-pinned): within-clique
    * edges are implied by the shared hash; the rep graph's closure
    * labels (min rep = min member, since the rep IS the clique min)
    * broadcast back over the hash join.
    */
  def nearDuplicateImageComponents(media: Dataset[MediaRow],
      maxDist: Int): DataFrame = {
    // cached at the (media_id, dhash) level: the decode pass is the
    // dominant cost and would otherwise run once for the group census
    // and again for the map-back join
    val h = imageDHash(media).toDF()
      .filter(col("dhash").isNotNull)
      .select(col("media_id"), col("dhash"))
      .cache()
    val groups = h.groupBy(col("dhash"))
      .agg(min(col("media_id")).as("rep"), count(lit(1)).as("n"))
    val repPairs = SimHash.nearPairsFromSignatures(
      groups.select(col("rep").as("id"), col("dhash").as("simhash")),
      maxDist)
    val comp = ConnectedComponents.auto(repPairs, "doc_a", "doc_b")
    h.join(groups, Seq("dhash"))
      .join(comp, col("rep") === col("vertex"), "left")
      .filter(col("component").isNotNull || col("n") >= 2)
      .select(col("media_id").as("vertex"),
        coalesce(col("component"), col("rep")).as("component"))
  }

  /** PCM sample stats — the audio analogue of [[pixelStats]], real
    * bytes not metadata: [[graft.functions.AudioHeaders.pcmStats]]
    * walks to the data chunk and folds int16 samples into integer-
    * exact aggregates. None columns for non-16-bit-PCM payloads.
    */
  case class SampleStats(
      media_id: Long,
      n_samples: Option[Long],
      sum_squares: Option[Long],
      n_clipped: Option[Long],
      peak: Option[Int])

  implicit private val sampEnc: Encoder[SampleStats] = Encoders.product[SampleStats]

  def sampleStats(media: Dataset[MediaRow]): Dataset[SampleStats] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val s = graft.functions.AudioHeaders.pcmStats(r.payload)
        SampleStats(r.media_id, s.map(_.nSamples), s.map(_.sumSquares),
          s.map(_.nClipped), s.map(_.peak))
      }
    }

  /** FLAC sibling of [[sampleStats]]: the REAL lossless-audio decode
    * ([[graft.functions.FlacCodec]] — frame walk, fixed/LPC prediction,
    * Rice residuals, CRC + stream-MD5 verification) folded into the
    * SAME integer aggregates, one scale across PCM and FLAC corpora.
    * Clip bounds come from the stream's bits-per-sample. None columns
    * on anything that fails structural or integrity checks.
    */
  def flacSampleStats(media: Dataset[MediaRow]): Dataset[SampleStats] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val d = graft.functions.FlacCodec.decode(r.payload)
        val folded = d.map { a =>
          val lo = -(1 << (a.meta.bitsPerSample - 1))
          val hi = (1 << (a.meta.bitsPerSample - 1)) - 1
          var sumSq = 0L; var clipped = 0L; var peak = 0
          var i = 0
          while (i < a.samples.length) {
            val s = a.samples(i)
            sumSq += s.toLong * s
            if (s == lo || s == hi) clipped += 1
            val as = math.abs(s)
            if (as > peak) peak = as
            i += 1
          }
          (a.samples.length.toLong / math.max(1, a.meta.channels), sumSq, clipped, peak)
        }
        SampleStats(r.media_id, folded.map(_._1), folded.map(_._2),
          folded.map(_._3), folded.map(_._4))
      }
    }

  /** Ogg sibling of [[mp3Meta]]: the RFC 3533 page walk
    * ([[graft.functions.OggCodec.meta]]) with Vorbis/Opus ID headers —
    * CRC-verified pages, duration from the closing granule position.
    */
  case class OggMetaRow(
      media_id: Long,
      n_bytes: Long,
      codec: Option[String],
      channels: Option[Int],
      sample_rate: Option[Int],
      n_pages: Option[Int],
      n_samples: Option[Long])

  implicit private val oggEnc: Encoder[OggMetaRow] = Encoders.product[OggMetaRow]

  def oggMeta(media: Dataset[MediaRow]): Dataset[OggMetaRow] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = graft.functions.OggCodec.meta(r.payload)
        OggMetaRow(r.media_id, r.payload.length.toLong,
          m.map(_.codec), m.map(_.channels), m.map(_.sampleRate),
          m.map(_.nPages), m.map(_.nSamples))
      }
    }

  /** ISO-BMFF (MP4) box-walk metadata, one row per file with the
    * first video and first audio track flattened — the modern-web
    * sibling of [[videoMeta]]'s AVI walk: [[graft.functions.Mp4Codec]]
    * walks ftyp/moov/trak without touching mdat, so cost is
    * O(metadata) regardless of media size. None columns on anything
    * that fails the box grammar.
    */
  case class Mp4MetaRow(
      media_id: Long,
      n_bytes: Long,
      major_brand: Option[String],
      timescale: Option[Long],
      duration: Option[Long],
      n_tracks: Option[Int],
      video_codec: Option[String],
      width: Option[Int],
      height: Option[Int],
      v_samples: Option[Long],
      audio_codec: Option[String],
      channels: Option[Int],
      sample_rate: Option[Int],
      a_samples: Option[Long])

  implicit private val mp4Enc: Encoder[Mp4MetaRow] = Encoders.product[Mp4MetaRow]

  def mp4Meta(media: Dataset[MediaRow]): Dataset[Mp4MetaRow] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = graft.functions.Mp4Codec.meta(r.payload)
        val vid = m.flatMap(_.tracks.find(_.handler == "vide"))
        val aud = m.flatMap(_.tracks.find(_.handler == "soun"))
        Mp4MetaRow(r.media_id, r.payload.length.toLong,
          m.map(_.majorBrand), m.map(_.timescale), m.map(_.duration),
          m.map(_.tracks.length),
          vid.map(_.codec), vid.map(_.width), vid.map(_.height),
          vid.map(_.nSamples),
          aud.map(_.codec), aud.map(_.channels), aud.map(_.sampleRate),
          aud.map(_.nSamples))
      }
    }

  /** Container-decoded video metadata — the video sibling of
    * [[imageMeta]]/[[audioMeta]]: [[graft.functions.AviCodec]] walks
    * the RIFF structure (avih/strh/strf headers, movi frame census)
    * without touching frame pixels. None fields on anything that isn't
    * a single-stream MJPEG AVI.
    */
  case class VideoMeta(
      media_id: Long,
      n_bytes: Long,
      width: Option[Int],
      height: Option[Int],
      us_per_frame: Option[Int],
      n_frames: Option[Int])

  implicit private val videoEnc: Encoder[VideoMeta] = Encoders.product[VideoMeta]

  def videoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val v = graft.functions.AviCodec.decode(r.payload)
        VideoMeta(r.media_id, r.payload.length.toLong,
          v.map(_.width), v.map(_.height), v.map(_.usPerFrame),
          v.map(_.frames.length))
      }
    }

  /** REAL video frame extraction + per-frame pixel decode: the
    * container walk yields complete MJPEG frame payloads, each decoded
    * through [[graft.functions.JpegCodec]] into the same integer luma
    * stats as [[pixelStats]] (shared fold — one scale across image and
    * video corpora). Row explosion is per FRAME, the shape a frame-
    * level training pipeline needs; undecodable containers contribute
    * no rows (dirty-corpus discipline, same as [[frameSample]] on
    * empty payloads) and an undecodable single frame yields its row
    * with None stats rather than poisoning its siblings. Oracle-
    * checked end to end as q85 over flat-block fixtures.
    */
  case class FrameStats(
      media_id: Long,
      frame_idx: Int,
      n_pixels: Option[Long],
      luma_sum: Option[Long])

  implicit private val frameEnc: Encoder[FrameStats] = Encoders.product[FrameStats]

  def frameStats(media: Dataset[MediaRow]): Dataset[FrameStats] =
    media.flatMap { r =>
      graft.functions.AviCodec.decode(r.payload) match {
        case None => Iterator.empty
        case Some(video) =>
          video.frames.iterator.zipWithIndex.map { case (frame, idx) =>
            graft.functions.JpegCodec.decode(frame) match {
              case None => FrameStats(r.media_id, idx, None, None)
              case Some(img) =>
                FrameStats(r.media_id, idx,
                  Some(img.width.toLong * img.height), Some(lumaSum(img)))
            }
          }
      }
    }

  /** Content-addressed video-frame fingerprints: one row per frame
    * with the md5 of the frame's exact payload bytes — the key for
    * frame-level dedup across a video corpus (broadcast intros,
    * station cards, and duplicated clips collapse to one training
    * example). Same flatMap shape as [[frameStats]]; grouping the
    * output by `frame_md5` is a plain hash agg, so corpus-scale dedup
    * is two-level-aggregation cheap. Oracle-checked end to end as q90
    * (the flat-block fixtures make byte-identity an arithmetic
    * equivalence SQL can replay).
    */
  case class FrameFingerprint(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Long,
      frame_md5: String)

  implicit private val ffEnc: Encoder[FrameFingerprint] =
    Encoders.product[FrameFingerprint]

  def frameFingerprints(media: Dataset[MediaRow]): Dataset[FrameFingerprint] =
    media.flatMap { r =>
      graft.functions.AviCodec.decode(r.payload) match {
        case None => Iterator.empty
        case Some(video) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          video.frames.iterator.zipWithIndex.map { case (frame, idx) =>
            md.reset()
            val hex = md.digest(frame).map("%02x".format(_)).mkString
            FrameFingerprint(r.media_id, idx, frame.length.toLong, hex)
          }
      }
    }

  /** Per-frame short-time energy + zero-crossing analysis; one row per
    * whole `frameSize`-sample frame of channel 0.
    */
  case class FrameEnergy(
      media_id: Long,
      frame_idx: Int,
      sum_abs: Long,
      sum_squares: Long,
      n_zero_cross: Int,
      is_silence: Boolean)

  implicit private val feEnc: Encoder[FrameEnergy] =
    Encoders.product[FrameEnergy]

  /** Short-time frame analysis over decodable 16-bit PCM WAVs — the
    * classic VAD/silence-trim front end of an ASR data pipeline
    * (Rabiner & Schafer's short-time energy + zero-crossing-rate pair):
    * channel 0 is cut into whole `frameSize`-sample frames (tail
    * remainder dropped — partial frames would skew the mean-based
    * silence test) and each frame folds integer-exactly to
    *
    *  - `sum_abs`      — Σ|s|, the magnitude energy,
    *  - `sum_squares`  — Σs², the power energy,
    *  - `n_zero_cross` — sign flips between CONSECUTIVE samples within
    *    the frame (negative vs non-negative — the boundary pair of
    *    adjacent frames belongs to neither),
    *  - `is_silence`   — Σ|s| < `silenceMeanAbs`·frameSize, i.e. the
    *    frame's mean |s| is under the threshold.
    *
    * Multi-channel inputs analyze channel 0 (downmix or [[resamplePcm]]
    * first if another policy is wanted); undecodable payloads emit no
    * rows ([[frameFingerprints]]' dirty-corpus discipline). Everything
    * is integer arithmetic, so the whole decode→frame→fold path is
    * oracle-replayable (q94). Scale shape: scan-stage flatMap, ≤
    * n_samples/frameSize rows per doc, no shuffle.
    */
  def frameEnergy(media: Dataset[MediaRow], frameSize: Int,
      silenceMeanAbs: Long): Dataset[FrameEnergy] = {
    require(frameSize > 0 && silenceMeanAbs >= 0)
    media.flatMap { r =>
      graft.functions.AudioHeaders.wavSamples(r.payload) match {
        case None => Iterator.empty
        case Some(pcm) =>
          val ch = pcm.channels
          val nFrames0 = pcm.samples.length / ch // channel-0 sample count
          val nWhole = nFrames0 / frameSize
          (0 until nWhole).iterator.map { f =>
            var sumAbs = 0L
            var sumSq = 0L
            var zc = 0
            var i = 0
            var prev = 0
            while (i < frameSize) {
              val s = pcm.samples((f * frameSize + i) * ch).toInt
              sumAbs += math.abs(s)
              sumSq += s.toLong * s
              if (i > 0 && ((prev < 0) != (s < 0))) zc += 1
              prev = s
              i += 1
            }
            FrameEnergy(r.media_id, f, sumAbs, sumSq, zc,
              sumAbs < silenceMeanAbs * frameSize)
          }
      }
    }
  }

  /** REAL image resize for decodable PNGs and baseline JPEGs: decode →
    * nearest-neighbor resample to (targetW, targetH) → re-encode as
    * PNG (JPEG inputs are thereby transcoded — re-encoding lossless
    * avoids a second generation loss, the normal normalize-to-one-
    * format move in a training pipeline; `format` is updated to
    * match). Payloads that don't decode pass through unchanged
    * (dirty-corpus discipline: a resize stage must not destroy rows it
    * can't parse). Nearest-neighbor is the honest kernel for a
    * dependency-free codec — bilinear/Lanczos swap in at the marked
    * sampling line.
    */
  def resizeImages(media: Dataset[MediaRow], targetW: Int,
      targetH: Int): Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0)
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.payload) match {
          case None => r
          case Some(img) =>
            val out = new Array[Byte](targetW * targetH * img.channels)
            var y = 0
            while (y < targetH) {
              val sy = (y.toLong * img.height / targetH).toInt
              var x = 0
              while (x < targetW) {
                val sx = (x.toLong * img.width / targetW).toInt // nearest-neighbor sample
                var c = 0
                while (c < img.channels) {
                  out((y * targetW + x) * img.channels + c) =
                    img.data((sy * img.width + sx) * img.channels + c)
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            r.copy(
              payload = graft.functions.PngCodec.encode(
                graft.functions.PngCodec.Image(targetW, targetH,
                  img.channels, out)),
              format = "image/png")
        }
      }
    }
  }

  /** REAL audio resample for decodable 16-bit PCM WAVs — the audio
    * analogue of [[resizeImages]]: decode → per-channel linear
    * interpolation onto the target rate's sample grid → re-encode
    * (still a valid WAV). The kernel is integer-exact by construction:
    * output frame j sits at source position j·srcRate/targetRate, split
    * as idx = (j·srcRate)/targetRate and frac = (j·srcRate) mod
    * targetRate, and interpolates s[idx] + (s[idx+1]−s[idx])·frac/
    * targetRate with truncating integer division — no floats, so an
    * oracle replays it bit-for-bit (q86; DuckDB's `//` truncates like
    * the JVM). nFrames_out = nFrames_in·targetRate/srcRate, so a
    * source already at the target rate round-trips identically.
    * Payloads that don't decode pass through unchanged, same
    * dirty-corpus discipline as [[resizeImages]]. Linear is the honest
    * dependency-free kernel — windowed-sinc swaps in at the marked
    * line with everything around it unchanged.
    */
  def resamplePcm(media: Dataset[MediaRow], targetRate: Int): Dataset[MediaRow] = {
    require(targetRate > 0 && targetRate <= 1000000)
    media.mapPartitions { rows =>
      rows.map { r =>
        graft.functions.AudioHeaders.wavSamples(r.payload) match {
          case None => r
          case Some(pcm) =>
            val ch = pcm.channels
            val nIn = pcm.samples.length / ch
            val nOut = (nIn.toLong * targetRate / pcm.sampleRate).toInt
            val out = new Array[Short](nOut * ch)
            var j = 0
            while (j < nOut) {
              val num = j.toLong * pcm.sampleRate
              val idx = (num / targetRate).toInt
              val frac = num % targetRate
              val idx1 = math.min(idx + 1, nIn - 1)
              var c = 0
              while (c < ch) {
                val a = pcm.samples(idx * ch + c).toInt
                val b = pcm.samples(idx1 * ch + c).toInt
                // linear interpolation; windowed-sinc kernel swaps in here
                out(j * ch + c) = (a + (b - a).toLong * frac / targetRate).toShort
                c += 1
              }
              j += 1
            }
            r.copy(payload = graft.functions.AudioHeaders.wavBytes(
              ch, targetRate, out))
        }
      }
    }
  }

  /** Resize: map each payload to a fixed target byte length — the
    * stand-in for image resize / audio resample. The STUB "kernel" is
    * stride sampling (pick every len/target-th byte); short non-empty
    * payloads are stride-repeated (each source byte repeats to fill the
    * target, e.g. "xy" → "xxxxyyyy" at target 8) and empty payloads
    * zero-fill; a real implementation replaces the kernel with
    * bilinear/Lanczos over decoded pixels, and everything around it —
    * per-partition batching (resize libraries also amortize init),
    * typed output schema, empty-payload handling — stays identical.
    * Output schema: (media_id, payload binary[targetBytes], format,
    * source) — same shape as the input, composable with
    * [[extractFeatures]] / [[frameSample]].
    */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    require(targetBytes > 0)
    media.mapPartitions { rows =>
      // real impl: val kernel = ResizeKernel.init(targetBytes) — per partition
      rows.map { r =>
        val src = r.payload
        val out = new Array[Byte](targetBytes)
        if (src.nonEmpty) {
          var i = 0
          while (i < targetBytes) {
            out(i) = src(math.min(src.length - 1,
              (i.toLong * src.length / targetBytes).toInt))
            i += 1
          }
        }
        r.copy(payload = out)
      }
    }
  }

  /** Frame sampling: slice the payload into n equal "frames" (stands in
    * for video frame extraction; slicing math is the real contract).
    */
  def frameSample(media: Dataset[MediaRow], nFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.payload.length
      if (len == 0) Iterator.empty
      else {
        val step = math.max(1, len / nFrames)
        (0 until math.min(nFrames, len)).iterator.map { f =>
          val start = f * step
          val end = math.min(len, start + step)
          (r.media_id, f, java.util.Arrays.copyOfRange(r.payload, start, end))
        }
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }
}
