package graft.ext

import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: deterministic, fixed dim, byte counts real") {
    val media = Multimodal.toMedia(Tables.documents(spark, sf0001))
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2) // deterministic across runs/partitionings
    assert(f1.values.forall(_.length == 8))
    assert(f1.values.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("frameSample: n frames reassemble to original payload prefix") {
    val media = Multimodal.toMedia(
      Seq((7L, "abcdefghij", "src")).toDF("doc_id", "text", "source"))
    val frames = Multimodal.frameSample(media, nFrames = 5)
      .orderBy("frame_idx").collect()
    assert(frames.length == 5)
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame_payload"))
    assert(new String(joined.take(10), "UTF-8") == "abcdefghij")
  }

  test("empty payload yields no frames, features still defined") {
    val media = Multimodal.toMedia(
      Seq((8L, "", "src")).toDF("doc_id", "text", "source"))
    assert(Multimodal.frameSample(media, 3).count() == 0)
    val f = Multimodal.extractFeatures(media, dim = 4).collect().head
    assert(f.n_bytes == 0 && f.features.length == 4)
  }

  test("imageMeta: real header decode on mixed clean/dirty payloads") {
    import graft.functions.ImageHeaders
    val rows = Seq(
      Multimodal.MediaRow(1L, ImageHeaders.pngHeaderBytes(640, 480),
        "image/png", "src"),
      Multimodal.MediaRow(2L, ImageHeaders.jpegHeaderBytes(320, 200),
        "image/jpeg", "src"),
      Multimodal.MediaRow(3L, "not an image at all".getBytes("UTF-8"),
        "text/plain", "src"),
      Multimodal.MediaRow(4L, ImageHeaders.pngHeaderBytes(9, 9).take(20),
        "image/png", "src")) // truncated mid-header
    val out = Multimodal.imageMeta(spark.createDataset(rows)).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(1L).format_detected == Some("png") &&
      out(1L).width == Some(640) && out(1L).height == Some(480))
    assert(out(2L).format_detected == Some("jpeg") &&
      out(2L).width == Some(320) && out(2L).height == Some(200))
    assert(out(3L).format_detected.isEmpty && out(3L).width.isEmpty)
    assert(out(4L).format_detected.isEmpty) // dirty row → None, no throw
    assert(out(4L).n_bytes == 20)
  }

  test("audioMeta: WAV header decode, None on non-audio payloads") {
    import graft.functions.AudioHeaders
    val rows = Seq(
      Multimodal.MediaRow(1L, AudioHeaders.wavHeaderBytes(2, 44100, 16, 500L),
        "audio/wav", "src"),
      Multimodal.MediaRow(2L, "definitely not riff".getBytes("UTF-8"),
        "text/plain", "src"))
    val out = Multimodal.audioMeta(spark.createDataset(rows)).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(1L).channels == Some(2) && out(1L).sample_rate == Some(44100) &&
      out(1L).bits_per_sample == Some(16) && out(1L).n_frames == Some(500L))
    assert(out(2L).channels.isEmpty && out(2L).n_frames.isEmpty)
  }

  test("resize: fixed target length, endpoints preserved, composes with features") {
    val media = Multimodal.toMedia(Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz", "src"), // shrink 26 → 8
      (2L, "xy", "src"),                          // grow 2 → 8
      (3L, "", "src")                             // empty → zero-pad
    ).toDF("doc_id", "text", "source"))
    val out = Multimodal.resize(media, targetBytes = 8).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(out.values.forall(_.length == 8))
    assert(out(1L)(0) == 'a'.toByte)              // first byte kept
    assert(out(1L)(7) == "abcdefghijklmnopqrstuvwxyz"(26 * 7 / 8).toByte)
    assert(out(2L).toSeq == "xxxxyyyy".getBytes.toSeq) // stride repeat
    assert(out(3L).forall(_ == 0))                // zero-padded
    // deterministic + composes: features of resized media are stable
    val f1 = Multimodal.extractFeatures(
      Multimodal.resize(media, 8), dim = 4).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(
      Multimodal.resize(media, 8), dim = 4).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == 4))
  }

  test("pixelStats: real PNG decode through the batch stage; None on dirty rows") {
    import graft.functions.PngCodec
    val gray = PngCodec.Image(2, 2, 1,
      Array[Byte](10, 20, 30, 40))
    val rgb = PngCodec.syntheticRgb(5L, 6, 4)
    val rows = Seq(
      Multimodal.MediaRow(1L, PngCodec.encode(rgb), "image/png", "src"),
      Multimodal.MediaRow(2L, PngCodec.encode(gray), "image/png", "src"),
      Multimodal.MediaRow(3L, "not a png".getBytes("UTF-8"), "text/plain", "src"),
      Multimodal.MediaRow(4L,
        graft.functions.JpegCodec.encodeFlatGray(10, 9, (bx, by) => 60 + 80 * bx + 100 * by),
        "image/jpeg", "src"))
    val out = Multimodal.pixelStats(spark.createDataset(rows)).collect()
      .map(p => p.media_id -> p).toMap
    // rgb luma: replay the formula (same arithmetic as the q81 oracle)
    val expected = (for (y <- 0 until 4; x <- 0 until 6) yield
      299L * ((5 + 3 * x + 7 * y) % 256) + 587L * ((10 + 5 * x + y) % 256) +
        114L * ((15 + x + 11 * y) % 256)).sum
    assert(out(1L).n_pixels == Some(24L) && out(1L).luma_sum == Some(expected))
    assert(out(2L).channels == Some(1) &&
      out(2L).luma_sum == Some(1000L * (10 + 20 + 30 + 40)))
    assert(out(3L).width.isEmpty && out(3L).luma_sum.isEmpty)
    // JPEG fallback leg: flat 8×8 blocks decode exactly (10×9 → blocks
    // (0,0)=60, (1,0)=140, (0,1)=160, (1,1)=240; crop keeps 8/2 cols,
    // 8/1 rows of each)
    assert(out(4L).channels == Some(1) && out(4L).n_pixels == Some(90L))
    assert(out(4L).luma_sum == Some(1000L *
      (64 * 60 + 16 * 140 + 8 * 160 + 2 * 240)))
  }

  test("sampleStats: real PCM fold through the batch stage") {
    import graft.functions.AudioHeaders
    val rows = Seq(
      Multimodal.MediaRow(1L,
        AudioHeaders.wavBytes(1, 8000, Array[Short](3, -4, 32767)),
        "audio/wav", "src"),
      Multimodal.MediaRow(2L, "nope".getBytes("UTF-8"), "text/plain", "src"))
    val out = Multimodal.sampleStats(spark.createDataset(rows)).collect()
      .map(p => p.media_id -> p).toMap
    assert(out(1L).n_samples == Some(3L))
    assert(out(1L).sum_squares == Some(9L + 16 + 32767L * 32767))
    assert(out(1L).n_clipped == Some(1L) && out(1L).peak == Some(32767))
    assert(out(2L).n_samples.isEmpty)
  }

  test("resamplePcm: integer linear interpolation, identity at equal rates, dirty passthrough") {
    import graft.functions.AudioHeaders
    val rows = Seq(
      Multimodal.MediaRow(1L, AudioHeaders.wavBytes(1, 8000, Array[Short](0, 100)),
        "audio/wav", "src"),
      Multimodal.MediaRow(2L, AudioHeaders.wavBytes(1, 16000,
        Array[Short](7, -9, 32767, -32768)), "audio/wav", "src"),
      Multimodal.MediaRow(3L, AudioHeaders.wavBytes(2, 8000,
        Array[Short](0, 1000, 100, 2000)), "audio/wav", "src"),
      Multimodal.MediaRow(4L, "静かな夜".getBytes("UTF-8"), "text/plain", "src"))
    val out = Multimodal.resamplePcm(spark.createDataset(rows), 16000)
      .collect().map(r => r.media_id -> r).toMap
    def samples(id: Long) = AudioHeaders.wavSamples(out(id).payload).get
    // 2x upsample: j=1 interpolates halfway, j=3 clamps to the last frame
    assert(samples(1L).samples.toSeq == Seq[Short](0, 50, 100, 100))
    assert(samples(1L).sampleRate == 16000)
    // equal rates: bit-identical samples (idx=j, frac=0)
    assert(samples(2L).samples.toSeq == Seq[Short](7, -9, 32767, -32768))
    // stereo: channels interpolate independently, stay interleaved
    assert(samples(3L).samples.toSeq == Seq[Short](0, 1000, 50, 1500, 100, 2000, 100, 2000))
    assert(samples(3L).channels == 2)
    // undecodable payloads pass through untouched
    assert(out(4L).payload.toSeq == "静かな夜".getBytes("UTF-8").toSeq)
  }

  test("videoMeta + frameStats: real AVI container walk and per-frame decode") {
    import graft.functions.{AviCodec, JpegCodec}
    val frames = (0 until 3).map(f =>
      JpegCodec.encodeFlatGray(10, 8, (bx, by) => (20 + 50 * f + 30 * bx + 90 * by) % 256))
    val rows = Seq(
      Multimodal.MediaRow(1L, AviCodec.aviBytes(10, 8, 33333, frames),
        "video/x-msvideo", "src"),
      Multimodal.MediaRow(2L, "not a video".getBytes("UTF-8"), "text/plain", "src"))
    val meta = Multimodal.videoMeta(spark.createDataset(rows)).collect()
      .map(v => v.media_id -> v).toMap
    assert(meta(1L).width == Some(10) && meta(1L).height == Some(8) &&
      meta(1L).us_per_frame == Some(33333) && meta(1L).n_frames == Some(3))
    assert(meta(2L).width.isEmpty && meta(2L).n_frames.isEmpty)
    val stats = Multimodal.frameStats(spark.createDataset(rows)).collect()
    assert(stats.map(_.media_id).toSet == Set(1L)) // dirty row: no rows
    assert(stats.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2))
    for (st <- stats) {
      // 10×8 gray: blocks (0,0) 8×8=64px, (1,0) 2×8=16px
      val f = st.frame_idx
      val expected = 1000L * (64 * ((20 + 50 * f) % 256) + 16 * ((50 + 50 * f) % 256))
      assert(st.n_pixels == Some(80L) && st.luma_sum == Some(expected), s"frame $f")
    }
  }

  test("frameFingerprints: identical frames share md5 across containers, distinct don't") {
    import graft.functions.{AviCodec, JpegCodec}
    val shared = JpegCodec.encodeFlatGray(8, 8, (_, _) => 123)
    val other = JpegCodec.encodeFlatGray(8, 8, (_, _) => 124)
    val rows = Seq(
      Multimodal.MediaRow(1L, AviCodec.aviBytes(8, 8, 40000, Seq(shared, other)),
        "video/x-msvideo", "src"),
      Multimodal.MediaRow(2L, AviCodec.aviBytes(8, 8, 40000, Seq(shared)),
        "video/x-msvideo", "src"))
    val fps = Multimodal.frameFingerprints(spark.createDataset(rows)).collect()
    assert(fps.length == 3)
    val byKey = fps.map(f => (f.media_id, f.frame_idx) -> f.frame_md5).toMap
    assert(byKey((1L, 0)) == byKey((2L, 0))) // same bytes, different container
    assert(byKey((1L, 0)) != byKey((1L, 1)))
    assert(fps.forall(_.frame_bytes == shared.length.toLong))
  }

  test("resizeImages: real nearest-neighbor resample, output is a valid PNG") {
    import graft.functions.PngCodec
    val src = PngCodec.syntheticRgb(9L, 8, 6)
    val rows = Seq(
      Multimodal.MediaRow(1L, PngCodec.encode(src), "image/png", "src"),
      Multimodal.MediaRow(2L, "text stays".getBytes("UTF-8"), "text/plain", "src"))
    val out = Multimodal.resizeImages(spark.createDataset(rows), 4, 3)
      .collect().map(r => r.media_id -> r).toMap
    val resized = PngCodec.decode(out(1L).payload).get
    assert(resized.width == 4 && resized.height == 3 && resized.channels == 3)
    // nearest-neighbor: output pixel (x,y) = source pixel (2x, 2y)
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3)
      assert(resized.data((y * 4 + x) * 3 + c) ==
        src.data(((2 * y) * 8 + 2 * x) * 3 + c), s"($x,$y,$c)")
    // undecodable payloads pass through untouched
    assert(out(2L).payload.toSeq == "text stays".getBytes("UTF-8").toSeq)
  }

  test("frameEnergy: hand-computed folds, tail drop, channel-0 on stereo, silence flag") {
    import graft.functions.AudioHeaders
    // mono: frames of 4; 10 samples -> 2 whole frames, tail of 2 dropped
    val mono = Array[Short](100, -100, 50, -50, /*f1*/ 3, 3, -3, 3, /*tail*/ 999, 999)
    // stereo: channel 0 = (8, -8, 8, -8), channel 1 = loud junk that must not leak
    val stereo = Array[Short](8, 30000, -8, 30000, 8, 30000, -8, 30000)
    val rows = Seq(
      Multimodal.MediaRow(1L, AudioHeaders.wavBytes(1, 8000, mono), "audio/wav", "t"),
      Multimodal.MediaRow(2L, AudioHeaders.wavBytes(2, 8000, stereo), "audio/wav", "t"),
      Multimodal.MediaRow(3L, "nope".getBytes("UTF-8"), "text/plain", "t"))
    val out = Multimodal.frameEnergy(spark.createDataset(rows),
        frameSize = 4, silenceMeanAbs = 10)
      .collect().groupBy(_.media_id).map { case (k, v) => k -> v.sortBy(_.frame_idx) }
    val m = out(1L)
    assert(m.length == 2) // tail dropped
    assert(m(0).sum_abs == 300 && m(0).sum_squares == 25000 && m(0).n_zero_cross == 3)
    assert(!m(0).is_silence) // 300 >= 10*4
    assert(m(1).sum_abs == 12 && m(1).n_zero_cross == 2 && m(1).is_silence)
    val st = out(2L)
    assert(st.length == 1 && st(0).sum_abs == 32 && st(0).n_zero_cross == 3)
    assert(!out.contains(3L)) // undecodable emits no rows
  }

  test("imageDHash: hand-computed gradient bits; ramp saturates; flat is zero") {
    import graft.functions.PngCodec
    // 9x8 gray ramp increasing left to right: every horizontal gradient
    // is positive, so all 64 bits set
    val ramp = PngCodec.Image(9, 8, 1,
      Array.tabulate(72)(i => (i % 9 * 20).toByte))
    // flat image: no strict increase anywhere, hash 0
    val flat = PngCodec.Image(9, 8, 1, Array.fill(72)(77.toByte))
    // 2x2 RGB with a known single comparison pattern
    val rows = Seq(
      Multimodal.MediaRow(1L, PngCodec.encode(ramp), "image/png", "t"),
      Multimodal.MediaRow(2L, PngCodec.encode(flat), "image/png", "t"),
      Multimodal.MediaRow(3L, "junk".getBytes("UTF-8"), "text/plain", "t"))
    val out = Multimodal.imageDHash(spark.createDataset(rows))
      .collect().map(h => h.media_id -> h).toMap
    assert(out(1L).dhash.contains(-1L)) // all 64 bits
    assert(out(2L).dhash.contains(0L))
    assert(out(3L).dhash.isEmpty && out(3L).width.isEmpty)
  }

  test("imageDHash: invariant under integer-factor nearest-neighbor upscale") {
    import graft.functions.PngCodec
    // floor-division composition: sampling the 2x/3x upscale hits the
    // same source pixels, so the hash provably cannot move
    val src = PngCodec.syntheticRgb(42L, 12, 9)
    val pairs = for (f <- Seq(2, 3)) yield {
      val rows = Seq(Multimodal.MediaRow(1L, PngCodec.encode(src), "image/png", "t"))
      val up = Multimodal.resizeImages(
        spark.createDataset(rows), 12 * f, 9 * f)
      (Multimodal.imageDHash(spark.createDataset(rows)).collect().head.dhash,
        Multimodal.imageDHash(up).collect().head.dhash)
    }
    pairs.foreach { case (orig, scaled) =>
      assert(orig.isDefined && orig == scaled)
    }
  }

  test("imageDHash: brightness shift preserving pixel order preserves the hash") {
    import graft.functions.PngCodec
    val base = PngCodec.syntheticRgb(7L, 10, 8)
    // halve every channel: strictly monotone map on [0,255], so every
    // luma comparison keeps its sign (integer luma of halved channels
    // is not exactly half, but < is preserved when all channels halve
    // with the same truncation ordering on an even-valued raster)
    val dimmed = PngCodec.Image(base.width, base.height, base.channels,
      base.data.map(b => ((b & 0xff) >> 1).toByte))
    val h = Multimodal.imageDHash(spark.createDataset(Seq(
        Multimodal.MediaRow(1L, PngCodec.encode(base), "image/png", "t"),
        Multimodal.MediaRow(2L, PngCodec.encode(dimmed), "image/png", "t"))))
      .collect().map(x => x.media_id -> x.dhash).toMap
    // the hashes agree on the vast majority of bits (exact equality is
    // not guaranteed: >> 1 truncation can flip a tie). Hamming ≤ 4 of 64.
    val d = java.lang.Long.bitCount(h(1L).get ^ h(2L).get)
    assert(d <= 4, s"hamming $d")
  }

  test("nearDuplicateImageComponents: hash-collapse closure == naive pairs∘closure") {
    import graft.functions.PngCodec
    // 60 images over a few (w,h) classes: heavy identical-hash cliques
    // plus cross-clique near-misses — the exact shape the collapse
    // optimizes. Equivalence must be EXACT, vertex set included.
    val rows = (0L until 60L).map { id =>
      val w = (id % 4 + 6).toInt
      val h = (id % 3 + 6).toInt
      Multimodal.MediaRow(id,
        PngCodec.encode(PngCodec.syntheticRgb(id, w, h)), "image/png", "t")
    }
    val media = spark.createDataset(rows)
    val fast = Multimodal.nearDuplicateImageComponents(media, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = ConnectedComponents.auto(
        Multimodal.nearDuplicateImages(media, maxDist = 2), "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(fast.nonEmpty) // the fixture really does cluster
  }

  test("incrementalNearDuplicateImages == full pairs restricted to a batch side") {
    import graft.functions.PngCodec
    import org.apache.spark.sql.functions.col
    val rows = (0L until 40L).map { id =>
      val w = (id % 4 + 6).toInt
      val h = (id % 3 + 6).toInt
      Multimodal.MediaRow(id,
        PngCodec.encode(PngCodec.syntheticRgb(id, w, h)), "image/png", "t")
    }
    val media = spark.createDataset(rows)
    val batch = media.filter(r => r.media_id % 5 == 0)
    val index = Multimodal.imageDHash(media.filter(r => r.media_id % 5 != 0))
      .toDF().filter(col("dhash").isNotNull)
      .select(col("media_id"), col("dhash"))
    val inc = Multimodal.incrementalNearDuplicateImages(batch, index, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Multimodal.nearDuplicateImages(media, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = full.filter { case (a, b, _) => a % 5 == 0 || b % 5 == 0 }
    assert(inc == expected)
    // corpus-only pairs really are excluded, and some exist to exclude
    assert(full.exists { case (a, b, _) => a % 5 != 0 && b % 5 != 0 })
    assert(inc.forall { case (a, b, _) => a % 5 == 0 || b % 5 == 0 })
  }

  test("nearDuplicateImages: planted near-dup found, distinct images not paired") {
    import graft.functions.PngCodec
    val a = PngCodec.syntheticRgb(5L, 16, 12)
    // near-dup of a: one pixel's channels nudged by 1 (at most a few
    // grid comparisons can flip)
    val tweaked = a.data.clone()
    tweaked(0) = ((tweaked(0) & 0xff) ^ 1).toByte
    val b = PngCodec.Image(16, 12, 3, tweaked)
    val far = PngCodec.syntheticRgb(999L, 16, 12)
    val rows = Seq(
      Multimodal.MediaRow(1L, PngCodec.encode(a), "image/png", "t"),
      Multimodal.MediaRow(2L, PngCodec.encode(b), "image/png", "t"),
      Multimodal.MediaRow(3L, PngCodec.encode(far), "image/png", "t"),
      Multimodal.MediaRow(4L, "noise".getBytes("UTF-8"), "text/plain", "t"))
    val pairs = Multimodal.nearDuplicateImages(spark.createDataset(rows), maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // undecodable row never appears
    assert(pairs.forall { case (x, y) => x != 4L && y != 4L })
  }
}
