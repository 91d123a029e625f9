package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{MinHashDedup, Multimodal, NGramJaccard, SimHash, SimilaritySearch}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

import graft.queries.QueryUtil.{Q, scratchDir, tokRe}

/** audio/video tier: WAV/G.711/float PCM, FLAC, MP3, Ogg, ID3,
  * MJPEG-AVI frame stats, MP4/MKV metadata walks, frame dedup.
  *
  * One tier of the [[ExtQueries]] registry (split per registry tier so
  * no single file carries the whole 200-query surface); entries and
  * oracle SQL are verbatim registry members composed back together in
  * [[ExtQueries]].
  */
object ExtAvQueries {

  val queries: Map[String, Q] = Map(

    // ── audio-header metadata decode, the q06 pattern for WAV/RIFF:
    // header-only PCM fixtures with arithmetic (channels, rate, frames)
    // per doc_id; the oracle pins parser∘encoder = identity — chunk
    // walk, little-endian fields, blockAlign frame math all verified.
    "q80_audio_headers" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val ch = (id % 2 + 1).toInt
          val rate = (8000 + (id % 5) * 8000).toInt
          val frames = id % 1000 + 1
          Multimodal.MediaRow(id,
            graft.functions.AudioHeaders.wavHeaderBytes(ch, rate, 16, frames),
            "audio/wav", source)
        }
      Multimodal.audioMeta(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_frames").as("n_frames"))
    },

    // ── short-time frame energy + zero-crossing rate (the VAD/
    // silence-trim front end of an ASR pipeline): q82's synthetic WAVs
    // through the REAL decode, then 16-sample frames fold to Σ|s|, Σs²,
    // sign-flip count, and a mean-|s| silence flag — all integer, so
    // the oracle replays decode→frame→fold from the sample formula
    // (per-frame rows, tail remainder dropped, frame-boundary pairs
    // counted in neither frame — each a distinct way to break the hash).
    "q94_audio_frame_energy" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = (id % 200 + 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toShort)
          Multimodal.MediaRow(id,
            graft.functions.AudioHeaders.wavBytes(1, 16000, samples),
            "audio/wav", source)
        }
      Multimodal.frameEnergy(media, frameSize = 16, silenceMeanAbs = 8192)
        .toDF()
        .select(col("media_id").as("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("sum_abs"), col("sum_squares"),
          col("n_zero_cross").cast("long").as("n_zero_cross"),
          col("is_silence"))
    },

    // ── REAL video frame extraction (the multimodal set's third leg):
    // per doc_id an MJPEG AVI — real RIFF layout: avih/strh/strf
    // headers, word-aligned movi chunks — carrying id%4+2 flat-block
    // JPEG frames is built, then decoded back through the container
    // walk and per-frame entropy decode into per-frame luma stats. One
    // output row per FRAME, so the frame census, chunk boundaries, and
    // every frame's pixel recovery are all on the hash gate.
    "q85_mjpeg_frame_stats" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val nf = (id % 4 + 2).toInt
          val frames = (0 until nf).map { f =>
            graft.functions.JpegCodec.encodeFlatGray(w, h, (bx, by) =>
              ((id + 17 * f + 7 * bx + 13 * by) % 256).toInt)
          }
          Multimodal.MediaRow(id,
            graft.functions.AviCodec.aviBytes(w, h, 33333, frames),
            "video/x-msvideo", source)
        }
      Multimodal.frameStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── REAL WAV sample decode, the q81 pattern for audio: synthetic
    // int16 PCM with arithmetic sample values rides a real RIFF body;
    // sample stats (Σ s², clip count, peak) are integer-exact so the
    // oracle replays the formula bit-for-bit.
    "q82_wav_pcm_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = (id % 200 + 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toShort)
          Multimodal.MediaRow(id,
            graft.functions.AudioHeaders.wavBytes(1, 16000, samples),
            "audio/wav", source)
        }
      Multimodal.sampleStats(media).toDF()
        .select(col("media_id").as("doc_id"), col("n_samples"),
          col("sum_squares"), col("n_clipped"),
          col("peak").cast("long").as("peak"))
    },

    // ── REAL audio resample (the DSP kernel the audio leg was
    // missing): per doc_id int16 PCM at a per-doc source rate (8-24
    // kHz — both up- and down-sampling on the gate, with the identity
    // case at 16 kHz as anchor) is linear-interpolated onto the 16 kHz
    // grid — integer-exact kernel, truncating division on both engines
    // — then folded by the same sampleStats as q82. Two container
    // round-trips and the interpolation arithmetic are all under the
    // hash.
    "q86_pcm_resample" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = (id % 200 + 50).toInt
          val srcRate = (8000 + (id % 5) * 4000).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toShort)
          Multimodal.MediaRow(id,
            graft.functions.AudioHeaders.wavBytes(1, srcRate, samples),
            "audio/wav", source)
        }
      Multimodal.sampleStats(Multimodal.resamplePcm(media, 16000)).toDF()
        .select(col("media_id").as("doc_id"), col("n_samples"),
          col("sum_squares"), col("n_clipped"),
          col("peak").cast("long").as("peak"))
    },

    // ── content-addressed FRAME-level video dedup: md5 over exact
    // frame payload bytes, grouped — the broadcast-intro/duplicated-
    // clip collapse a video training pipeline runs before sampling.
    // The value formula folds doc_id mod 32, so ids congruent mod 96
    // (lcm of the width/height/value periods) produce BYTE-IDENTICAL
    // frames: real multi-copy groups exist at every SF (~5 copies per
    // group at 500 docs), not just singletons. The oracle replays
    // byte-identity as arithmetic — frames are equal iff dims agree
    // and (doc_id%32 + 17·frame) mod 256 agrees (the bx/by terms
    // cancel) — so container walk, frame slicing, AND digest grouping
    // are all under the hash.
    "q90_video_frame_dedup" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val nf = (id % 4 + 2).toInt
          val frames = (0 until nf).map { f =>
            graft.functions.JpegCodec.encodeFlatGray(w, h, (bx, by) =>
              ((id % 32 + 17 * f + 7 * bx + 13 * by) % 256).toInt)
          }
          Multimodal.MediaRow(id,
            graft.functions.AviCodec.aviBytes(w, h, 33333, frames),
            "video/x-msvideo", source)
        }
      Multimodal.frameFingerprints(media).toDF()
        .groupBy(col("frame_md5"))
        .agg(min(col("media_id")).as("canonical_doc_id"),
          count(lit(1)).as("n_copies"),
          min(col("media_id") * 1000 + col("frame_idx")).as("canonical_key"))
        .select(col("canonical_doc_id"), col("n_copies"), col("canonical_key"))
    },

    // ── MP3 frame-walk metadata (the compressed-audio sibling of
    // q80's WAV walk): per doc_id a standards-shaped Layer III stream
    // — MPEG-1 or MPEG-2 by id, cycling bitrate/rate indices, mono/
    // stereo, padding bits every third frame, ID3v2 prefix and ID3v1
    // trailer on id strides — walked frame-by-frame back to exact
    // (version, bitrate, rate, channels, frames, samples). The oracle
    // replays the index arithmetic through the published bitrate/rate
    // tables, so a slip in sync masks, table rows, padding math, the
    // syncsafe ID3 skip, or samples-per-frame breaks the hash.
    "q152_mp3_headers" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val vbits = if (id % 4 == 0) 2 else 3
          val payload = graft.functions.Mp3Codec.mp3Bytes(vbits,
            (id % 14 + 1).toInt, (id % 3).toInt, id % 2 == 0,
            (id % 297 + 3).toInt,
            id3v2Bytes = if (id % 5 == 0) 64 else 0,
            id3v1 = id % 7 == 0)
          Multimodal.MediaRow(id, payload, "audio/mpeg", source)
        }
      Multimodal.mp3Meta(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("version"),
          col("bitrate_kbps").cast("long").as("bitrate_kbps"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("n_frames"), col("n_samples"))
    },

    // ── REAL FLAC decode (the lossless-audio format of archival
    // corpora): q82's exact PCM formula rides a full FLAC encode →
    // decode instead of a WAV container — frame walk, fixed/LPC
    // prediction, partitioned Rice residuals, CRC-8/16 and the
    // STREAMINFO MD5 integrity gate all under q82's arithmetic oracle.
    // 64-sample blocks force multi-frame streams with partial tails;
    // ids rotate the predictor representation (explicit quantized-LPC
    // vs FIXED) and the Rice partition order 0-2, so every decode arm
    // is hash-gated.
    "q161_flac_pcm_stats" -> { (s, dir) =>
      import s.implicits._
      val media = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("source")))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = (id % 200 + 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toInt)
          val payload = graft.functions.FlacCodec.encode(
            samples, channels = 1, sampleRate = 16000, blockSize = 64,
            useLpc = id % 2 == 0, partitionOrder = (id % 3).toInt)
          Multimodal.MediaRow(id, payload, "audio/flac", source)
        }
      Multimodal.flacSampleStats(media).toDF()
        .select(col("media_id").as("doc_id"), col("n_samples"),
          col("sum_squares"), col("n_clipped"),
          col("peak").cast("long").as("peak"))
    },

    // ── Ogg container walk (Vorbis + Opus ID headers): per doc a
    // structurally valid multi-page stream — BOS ID page, data pages,
    // EOS granule carrying the duration — CRC-verified page by page.
    // Opus durations subtract the pre-skip from the 48 kHz granule;
    // Vorbis granules are stream-rate samples; both arms land on the
    // same arithmetic n_samples under the oracle.
    "q163_ogg_meta" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = id % 1000 + 1
          val nData = (id % 3 + 1).toInt
          val (idPkt, lastGranule) =
            if (id % 2 == 0)
              (graft.functions.OggCodec.vorbisIdPacket(
                (id % 2 + 1).toInt, (8000 + (id % 5) * 8000).toInt), n)
            else
              (graft.functions.OggCodec.opusIdPacket(
                (id % 2 + 1).toInt,
                Seq(48000, 24000, 16000)((id % 3).toInt), preSkip = 312),
                n + 312)
          val granules = (1 to nData).map(i =>
            if (i == nData) lastGranule else lastGranule * i / nData)
          val payload = graft.functions.OggCodec.encode(
            idPkt, serial = (id & 0x7fffffff).toInt, granules)
          Multimodal.MediaRow(id, payload, "audio/ogg", source)
        }
      Multimodal.oggMeta(media).toDF()
        .select(col("media_id").as("doc_id"), col("codec"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_pages").cast("long").as("n_pages"),
          col("n_samples"))
    },

    // ── ID3v2 text-frame metadata (TIT2/TPE1/TALB): per doc a real
    // tag — ids rotating tag version × text encoding across all four
    // spec arms (v2.3+Latin-1, v2.3+UTF-16 BOM, v2.4+UTF-16BE,
    // v2.4+UTF-8, the two later encodings being v2.4-only) — fronting
    // a q152-style Layer III frame walk; the parser must recover the
    // exact strings THROUGH the tag grammar (plain vs syncsafe frame
    // sizes, encoding bytes) and the frame walk must still count
    // frames exactly past the tag it skips.
    "q173_mp3_id3" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("source"))
        .as[(Long, String, String)]
        .map { case (id, text, source) =>
          val title = "T" + text.take(20)
          val album = "A" + (id % 7)
          val (v24, enc) = (id % 4) match {
            case 0 => (false, 0)
            case 1 => (false, 1)
            case 2 => (true, 2)
            case _ => (true, 3)
          }
          val tag = graft.functions.Mp3Codec.id3v2TagBytes(
            Seq("TIT2" -> title, "TPE1" -> source, "TALB" -> album),
            v24 = v24, encoding = enc)
          val body = graft.functions.Mp3Codec.mp3Bytes(
            versionBits = 3, bitrateIdx = 9, rateIdx = 0,
            mono = id % 2 == 0, nFrames = (id % 50 + 2).toInt)
          val payload = tag ++ body
          val frames = graft.functions.Mp3Codec.id3v2Frames(payload)
          val m = graft.functions.Mp3Codec.meta(payload)
          (id, frames.getOrElse("TIT2", ""), frames.getOrElse("TPE1", ""),
            frames.getOrElse("TALB", ""), m.map(_.nFrames).getOrElse(-1L))
        }
        .toDF("doc_id", "title", "artist", "album", "n_frames")
    },

    // ── ISO-BMFF (MP4) box-walk metadata: per doc a structurally real
    // MP4 — ftyp + moov (mvhd, video trak id%5!=4, audio trak id%3!=0,
    // full stbl chain) + free + mdat — is ENCODED and walked back.
    // Ids rotate the grammar arms so every one is under the hash
    // gate: id%5==0 writes version-1 (64-bit) mvhd/tkhd/mdhd,
    // id%4==0 writes mdat in the size==1 largesize form.
    "q178_mp4_meta" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val vid =
            if (id % 5 != 4) Some(graft.functions.Mp4Codec.VideoSpec(
              "avc1", (id % 320 + 16).toInt, (id % 240 + 16).toInt,
              30000L, 1001L, id % 100 + 1))
            else None
          val aud =
            if (id % 3 != 0) Some(graft.functions.Mp4Codec.AudioSpec(
              "mp4a", (id % 2 + 1).toInt,
              if (id % 3 == 1) 48000 else 32000, 1024L, id % 50 + 1))
            else None
          val payload = graft.functions.Mp4Codec.mp4Bytes(
            if (id % 2 == 0) "isom" else "mp42", 1000L,
            id % 5000 + 1000, vid, aud,
            v1 = id % 5 == 0, largeMdat = id % 4 == 0)
          Multimodal.MediaRow(id, payload, "video/mp4", source)
        }
      Multimodal.mp4Meta(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("major_brand"), col("timescale"), col("duration"),
          col("n_tracks").cast("long").as("n_tracks"),
          col("video_codec"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("v_samples"),
          col("audio_codec"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("a_samples"))
    },

    // ── Matroska/WebM (EBML) element walk: per doc a real metadata
    // tree — EBML header, Segment > Info (TimestampScale, Duration)
    // and Tracks — encoded and walked back. id%5==0 writes the
    // Segment with the UNKNOWN-SIZE sentinel (the live-stream shape),
    // so both termination rules are under the hash gate; durations are
    // integers stored in the format's float element (exact in f64).
    "q180_mkv_meta" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val vid =
            if (id % 4 != 3) Some(graft.functions.EbmlCodec.VideoTrackSpec(
              if (id % 3 == 0) "V_VP9"
              else if (id % 3 == 1) "V_AV1" else "V_MPEG4/ISO/AVC",
              id % 1920 + 16, id % 1080 + 16))
            else None
          val aud =
            if (id % 2 == 0) Some(graft.functions.EbmlCodec.AudioTrackSpec(
              "A_OPUS", id % 3 + 1, 48000.0))
            else None
          val b = graft.functions.EbmlCodec.mkvBytes(
            if (id % 2 == 0) "webm" else "matroska", 1000000L,
            (id % 100000 + 1000).toDouble, vid, aud,
            unknownSegment = id % 5 == 0)
          val m = graft.functions.EbmlCodec.meta(b)
          val v = m.flatMap(_.tracks.find(_.trackType == 1L))
          val a = m.flatMap(_.tracks.find(_.trackType == 2L))
          (id, m.map(_.docType), m.map(_.timestampScale),
            m.map(_.durationTicks.toLong), m.map(_.tracks.length.toLong),
            v.map(_.codecId), v.map(_.width), v.map(_.height),
            a.map(_.codecId), a.map(_.channels),
            a.map(_.sampleRate.toLong))
        }
        .toDF("doc_id", "doc_type", "timestamp_scale", "duration_ticks",
          "n_tracks", "video_codec", "width", "height", "audio_codec",
          "channels", "sample_rate")
    },

    // ── G.711 µ-law/A-law WAV decode under the oracle (q82's
    // arithmetic-oracle family): per doc, 48 coded bytes are built by
    // arithmetic, wrapped as REAL format-7 and format-6 WAV files
    // (fact chunk and all), and decoded through the production
    // wavSamples16 path. The ORACLE restates both ITU-T G.711 segment
    // expansions as DuckDB integer bit arithmetic — so the Spark-side
    // decode is pinned twice over: byte-exact vs the JDK converters in
    // the spec, and formula-exact vs an independent SQL restatement
    // here. Integer-only stats, no floats under the hash.
    "q194_g711_wav_decode" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val coded = Array.tabulate[Byte](48)(i =>
            ((id * 31 + i * 7) % 256).toByte)
          val mu = graft.functions.AudioHeaders.wavSamples16(
            graft.functions.AudioHeaders.wavBytesFmt(7, 1, 8000, 8, coded))
            .get.samples
          val al = graft.functions.AudioHeaders.wavSamples16(
            graft.functions.AudioHeaders.wavBytesFmt(6, 1, 8000, 8, coded))
            .get.samples
          def sum(a: Array[Short]) = a.iterator.map(_.toLong).sum
          def sumSq(a: Array[Short]) = a.iterator.map(v => v.toLong * v).sum
          def peak(a: Array[Short]) = a.iterator.map(v => math.abs(v.toLong)).max
          (id, sum(mu), sumSq(mu), peak(mu), sum(al), peak(al))
        }
        .toDF("doc_id", "mu_sum", "mu_sumsq", "mu_peak", "a_sum", "a_peak")
    },

    // ── IEEE-float32 WAV decode under the oracle: per doc, 32 float
    // samples on the odd/32 grid x_i = (2i + (doc_id % 9)*2 - 39)/32
    // (odd numerators ⇒ x·32767 never lands on an exact .5, so
    // half-up and half-away rounding agree across engines; the grid
    // also crosses ±1 so the clamp arm is under the hash). The floats
    // ride a real format-3 WAV (fact chunk and all) through
    // wavSamples16; the oracle recomputes round(clamp(x)·32767) in
    // plain SQL. Deterministic: i/32 and the products are exact in
    // float64 and the float32 payload values are exactly
    // representable (n/32 with |n| < 2^24).
    "q195_float_wav_decode" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val off = (id % 9).toInt * 2 - 39
          val floats = Array.tabulate(32)(i => (2 * i + off) / 32.0f)
          val body = java.nio.ByteBuffer.allocate(4 * floats.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          floats.foreach(body.putFloat)
          val pcm = graft.functions.AudioHeaders.wavSamples16(
            graft.functions.AudioHeaders.wavBytesFmt(3, 1, 48000, 32,
              body.array())).get.samples
          (id, pcm.iterator.map(_.toLong).sum,
            pcm.iterator.map(v => math.abs(v.toLong)).max,
            pcm.iterator.map(_.toLong).min)
        }
        .toDF("doc_id", "f_sum", "f_peak", "f_min")
    },
  )

  private[queries] val oracleBase: Map[String, String] = Map(

    "q80_audio_headers" ->
      """SELECT doc_id,
        |  doc_id % 2 + 1 AS channels,
        |  8000 + (doc_id % 5) * 8000 AS sample_rate,
        |  doc_id % 1000 + 1 AS n_frames
        |FROM documents""".stripMargin,

    // frame-level identity: one oracle row per (doc, frame) replaying
    // the flat-block formula; the Spark side must recover it through
    // the AVI container walk plus a per-frame JPEG entropy decode
    "q85_mjpeg_frame_stats" ->
      """SELECT d.doc_id, f.i AS frame_idx,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(1000*((d.doc_id + 17*f.i + 7*(x.i//8) + 13*(y.i//8)) % 256)) AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 6) f(i) ON f.i < d.doc_id % 4 + 2
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id, f.i""".stripMargin,

    // resample identity: the oracle replays the integer interpolation
    // (idx/frac split, truncating `//` — same semantics as JVM int
    // division) over the synthetic sample formula; the Spark side must
    // recover it through WAV decode → kernel → WAV encode → stats
    "q86_pcm_resample" ->
      """WITH p AS (
        |  SELECT d.doc_id AS doc_id,
        |    d.doc_id % 200 + 50 AS n,
        |    8000 + (d.doc_id % 5) * 4000 AS src
        |  FROM documents d),
        |g AS (
        |  SELECT doc_id, n, src, j.i AS j,
        |    (j.i * src) // 16000 AS idx,
        |    (j.i * src) % 16000 AS frac
        |  FROM p JOIN range(0, 500) j(i) ON j.i < (n * 16000) // src),
        |v AS (
        |  SELECT doc_id, j,
        |    ((doc_id*31 + idx*17) % 65536 - 32768)
        |      + (((doc_id*31 + least(idx+1, n-1)*17) % 65536 - 32768)
        |         - ((doc_id*31 + idx*17) % 65536 - 32768)) * frac // 16000 AS val
        |  FROM g)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(val*val) AS BIGINT) AS sum_squares,
        |  CAST(sum(CASE WHEN val IN (-32768, 32767) THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(max(abs(val)) AS BIGINT) AS peak
        |FROM v GROUP BY doc_id""".stripMargin,

    // byte-identity as arithmetic: md5 groups over real JPEG payloads
    // must coincide with the formula-equivalence groups
    "q90_video_frame_dedup" ->
      """WITH f AS (
        |  SELECT d.doc_id, ff.i AS frame_idx,
        |    d.doc_id % 16 AS wk, d.doc_id % 12 AS hk,
        |    (d.doc_id % 32 + 17*ff.i) % 256 AS vk
        |  FROM documents d
        |  JOIN range(0, 6) ff(i) ON ff.i < d.doc_id % 4 + 2)
        |SELECT CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(min(doc_id * 1000 + frame_idx) AS BIGINT) AS canonical_key
        |FROM f GROUP BY wk, hk, vk""".stripMargin,

    "q82_wav_pcm_stats" ->
      """SELECT d.doc_id,
        |  d.doc_id % 200 + 50 AS n_samples,
        |  CAST(sum(((d.doc_id*31 + i.i*17) % 65536 - 32768)
        |         * ((d.doc_id*31 + i.i*17) % 65536 - 32768)) AS BIGINT) AS sum_squares,
        |  CAST(sum(CASE WHEN (d.doc_id*31 + i.i*17) % 65536 - 32768 IN (-32768, 32767)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(max(abs((d.doc_id*31 + i.i*17) % 65536 - 32768)) AS BIGINT) AS peak
        |FROM documents d
        |JOIN range(0, 250) i(i) ON i.i < d.doc_id % 200 + 50
        |GROUP BY d.doc_id""".stripMargin,

    // frame-fold replay from the q82 sample formula: whole 16-sample
    // frames only, in-frame consecutive sign flips, mean-|s| silence
    "q94_audio_frame_energy" ->
      """WITH s AS (
        |  SELECT d.doc_id, i.i AS i,
        |    (d.doc_id*31 + i.i*17) % 65536 - 32768 AS v,
        |    CASE WHEN i.i % 16 <> 0
        |      THEN (d.doc_id*31 + (i.i-1)*17) % 65536 - 32768 END AS prev
        |  FROM documents d
        |  JOIN range(0, 256) i(i)
        |    ON i.i < ((d.doc_id % 200 + 50) // 16) * 16)
        |SELECT doc_id, i // 16 AS frame_idx,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(sum(v*v) AS BIGINT) AS sum_squares,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND ((prev < 0) <> (v < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross,
        |  sum(abs(v)) < 8192*16 AS is_silence
        |FROM s GROUP BY doc_id, frame_idx""".stripMargin,

    // index arithmetic through the published MPEG bitrate/rate tables
    "q152_mp3_headers" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN 'MPEG2' ELSE 'MPEG1' END AS version,
        |  CAST(CASE WHEN doc_id % 4 = 0
        |    THEN [8,16,24,32,40,48,56,64,80,96,112,128,144,160]
        |      [CAST(doc_id % 14 AS INT) + 1]
        |    ELSE [32,40,48,56,64,80,96,112,128,160,192,224,256,320]
        |      [CAST(doc_id % 14 AS INT) + 1]
        |  END AS BIGINT) AS bitrate_kbps,
        |  CAST(CASE WHEN doc_id % 4 = 0
        |    THEN [22050,24000,16000][CAST(doc_id % 3 AS INT) + 1]
        |    ELSE [44100,48000,32000][CAST(doc_id % 3 AS INT) + 1]
        |  END AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
        |    AS channels,
        |  CAST(doc_id % 297 + 3 AS BIGINT) AS n_frames,
        |  CAST((doc_id % 297 + 3) *
        |    CASE WHEN doc_id % 4 = 0 THEN 576 ELSE 1152 END AS BIGINT)
        |    AS n_samples
        |FROM documents""".stripMargin,

    // container identity: ID-header fields and the granule-derived
    // duration replayed per codec arm
    "q163_ogg_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'vorbis' ELSE 'opus' END AS codec,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 + (doc_id % 5) * 8000
        |    ELSE [48000,24000,16000][CAST(doc_id % 3 AS INT) + 1]
        |  END AS BIGINT) AS sample_rate,
        |  CAST(doc_id % 3 + 2 AS BIGINT) AS n_pages,
        |  CAST(doc_id % 1000 + 1 AS BIGINT) AS n_samples
        |FROM documents""".stripMargin,

    // tag-grammar identity: the oracle recomputes the exact strings
    // the ID3v2 frames must deliver and q152's frame-count arithmetic
    "q173_mp3_id3" ->
      """SELECT doc_id,
        |  'T' || substring(text, 1, 20) AS title,
        |  source AS artist,
        |  'A' || (doc_id % 7) AS album,
        |  CAST(doc_id % 50 + 2 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,

    // container identity: the oracle recomputes the track facts the
    // Spark side ENCODED into a real ISO-BMFF box tree and WALKED back
    "q178_mp4_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END
        |    AS major_brand,
        |  CAST(1000 AS BIGINT) AS timescale,
        |  CAST(doc_id % 5000 + 1000 AS BIGINT) AS duration,
        |  CAST((CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END)
        |     + (CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_tracks,
        |  CASE WHEN doc_id % 5 <> 4 THEN 'avc1' END AS video_codec,
        |  CASE WHEN doc_id % 5 <> 4
        |    THEN CAST(doc_id % 320 + 16 AS BIGINT) END AS width,
        |  CASE WHEN doc_id % 5 <> 4
        |    THEN CAST(doc_id % 240 + 16 AS BIGINT) END AS height,
        |  CASE WHEN doc_id % 5 <> 4
        |    THEN CAST(doc_id % 100 + 1 AS BIGINT) END AS v_samples,
        |  CASE WHEN doc_id % 3 <> 0 THEN 'mp4a' END AS audio_codec,
        |  CASE WHEN doc_id % 3 <> 0
        |    THEN CAST(doc_id % 2 + 1 AS BIGINT) END AS channels,
        |  CASE WHEN doc_id % 3 <> 0
        |    THEN CAST(CASE WHEN doc_id % 3 = 1 THEN 48000 ELSE 32000
        |      END AS BIGINT) END AS sample_rate,
        |  CASE WHEN doc_id % 3 <> 0
        |    THEN CAST(doc_id % 50 + 1 AS BIGINT) END AS a_samples
        |FROM documents""".stripMargin,

    // container identity: the EBML tree's fields recomputed
    // arithmetically; the Spark side recovers them through a real
    // element write → VINT walk (incl. unknown-size segments)
    "q180_mkv_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'matroska' END
        |    AS doc_type,
        |  CAST(1000000 AS BIGINT) AS timestamp_scale,
        |  CAST(doc_id % 100000 + 1000 AS BIGINT) AS duration_ticks,
        |  CAST((CASE WHEN doc_id % 4 <> 3 THEN 1 ELSE 0 END)
        |     + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_tracks,
        |  CASE WHEN doc_id % 4 <> 3 THEN
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'V_VP9'
        |      WHEN 1 THEN 'V_AV1' ELSE 'V_MPEG4/ISO/AVC' END
        |  END AS video_codec,
        |  CASE WHEN doc_id % 4 <> 3
        |    THEN CAST(doc_id % 1920 + 16 AS BIGINT) END AS width,
        |  CASE WHEN doc_id % 4 <> 3
        |    THEN CAST(doc_id % 1080 + 16 AS BIGINT) END AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN 'A_OPUS' END AS audio_codec,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN CAST(doc_id % 3 + 1 AS BIGINT) END AS channels,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN CAST(48000 AS BIGINT) END AS sample_rate
        |FROM documents""".stripMargin,
    "q195_float_wav_decode" ->
      """WITH g AS (
        |  SELECT d.doc_id, (2*t.i + (d.doc_id % 9)*2 - 39) AS n
        |  FROM documents d, generate_series(0, 31) AS t(i)
        |), s AS (
        |  SELECT doc_id,
        |    CAST(round(greatest(-1.0, least(1.0, n / 32.0)) * 32767)
        |      AS BIGINT) AS v
        |  FROM g
        |)
        |SELECT doc_id,
        |  CAST(sum(v) AS BIGINT) AS f_sum,
        |  CAST(max(abs(v)) AS BIGINT) AS f_peak,
        |  CAST(min(v) AS BIGINT) AS f_min
        |FROM s GROUP BY doc_id""".stripMargin,
    "q194_g711_wav_decode" ->
      """WITH bytes AS (
        |  SELECT d.doc_id, (d.doc_id*31 + t.i*7) % 256 AS v
        |  FROM documents d, generate_series(0, 47) AS t(i)
        |), pre AS (
        |  SELECT doc_id, 255 - v AS u, xor(v, 85) AS a FROM bytes
        |), dec AS (
        |  SELECT doc_id,
        |    (CASE WHEN u >= 128 THEN -1 ELSE 1 END) *
        |      ((((u & 15)*8 + 132) << ((u >> 4) & 7)) - 132) AS mu,
        |    (CASE WHEN (a & 128) <> 0 THEN 1 ELSE -1 END) *
        |      (CASE WHEN ((a >> 4) & 7) = 0 THEN (a & 15)*16 + 8
        |            ELSE ((a & 15)*16 + 264) << (((a >> 4) & 7) - 1)
        |       END) AS al
        |  FROM pre
        |)
        |SELECT doc_id,
        |  CAST(sum(mu) AS BIGINT) AS mu_sum,
        |  CAST(sum(mu*mu) AS BIGINT) AS mu_sumsq,
        |  CAST(max(abs(mu)) AS BIGINT) AS mu_peak,
        |  CAST(sum(al) AS BIGINT) AS a_sum,
        |  CAST(max(abs(al)) AS BIGINT) AS a_peak
        |FROM dec GROUP BY doc_id""".stripMargin,
  )
}
