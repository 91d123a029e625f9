package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.Schemas
import graft.functions.DateCodecs
import graft.operators.{Clean, Upsert}

/** Property-based invariants (SURVEY §5.2): load idempotency, dedup key
  * uniqueness, clean row-count monotonicity, yyyymmdd round-trip.
  */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  /** Deterministic sampling in place of the scalatestplus bridge (not in
    * the offline dependency cache): n draws from seeded generators.
    */
  private def forAll[T](g: Gen[T], n: Int = 8)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(42L + i)).get)
    }
  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val dateGen: Gen[java.sql.Date] =
    Gen.choose(0L, 20000L).map(d => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(d)))

  test("yyyymmdd round-trips for any date 1970-2024") {
    forAll(Gen.listOfN(50, dateGen)) { dates =>
      whenever(dates.nonEmpty) {
        val df = dates.toDF("d")
        val back = df.select(
            DateCodecs.fromYyyymmdd(DateCodecs.yyyymmdd(col("d"))).as("r"),
            col("d"))
          .filter(col("r") =!= col("d"))
        assert(back.count() == 0)
      }
    }
  }

  private val rowGen: Gen[(String, String, String, String)] = for {
    tui <- Gen.oneOf(Gen.uuid.map(u => s"{$u}"), Gen.const(null: String))
    price <- Gen.oneOf(Gen.choose(1, 10000000).map(_.toString), Gen.const("xx"),
      Gen.const(null: String))
    date <- Gen.oneOf(Gen.const("2017-03-10 00:00"), Gen.const("not a date"),
      Gen.const(null: String))
    pc <- Gen.oneOf("OX1 1AA", "SW1A 1AA", null)
  } yield (tui, price, date, pc)

  private def raw(rows: Seq[(String, String, String, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (t, p, d, pc) =>
        Row(t, p, d, pc, "T", "N", "F", "1", "", "X", "", "OXFORD",
          "OXFORD", "OXFORDSHIRE", "A", "A")
      }), Schemas.pricePaidCsv)

  test("clean never grows the frame; survivors have non-null keys") {
    forAll(Gen.listOfN(30, rowGen)) { rows =>
      whenever(rows.nonEmpty) {
        val cleaned = Clean.pricePaid(raw(rows))
        assert(cleaned.count() <= rows.length)
        assert(cleaned.filter(
          Clean.pricePaidKeyCols.map(col(_).isNull).reduce(_ || _)).count() == 0)
      }
    }
  }

  test("insertIgnore is idempotent and keeps keys unique") {
    forAll(Gen.zip(Gen.listOfN(20, Gen.choose(1, 8)),
        Gen.listOfN(20, Gen.choose(1, 8)))) { case (t, u) =>
        val target = t.distinct.map(k => (s"k$k", s"t$k")).toDF("key", "v")
        val updates = u.map(k => (s"k$k", s"u$k")).toDF("key", "v")
        val once = Upsert.insertIgnore(target, updates, Seq("key"))
        val twice = Upsert.insertIgnore(once, updates, Seq("key"))
        assert(once.groupBy("key").count().filter(col("count") > 1).count() == 0)
        assert(twice.count() == once.count())
        // original target values always win
        val kept = once.as[(String, String)].collect().toMap
        t.distinct.foreach(k => assert(kept(s"k$k") == s"t$k"))
    }
  }

  test("mergeByKey yields exactly one row per key, the max-precedence one") {
    forAll(Gen.listOfN(25, Gen.zip(Gen.choose(1, 6), Gen.choose(0L, 100L)))) {
      pairs =>
        whenever(pairs.nonEmpty) {
          val target = pairs.map { case (k, v) => (s"k$k", v) }.toDF("key", "ver")
          val updates = pairs.map { case (k, v) => (s"k$k", v + 1) }.toDF("key", "ver")
          val merged = Upsert.mergeByKey(target, updates, Seq("key"),
            Seq(col("ver").desc))
          assert(merged.groupBy("key").count().filter(col("count") > 1).count() == 0)
          val expect = pairs.groupBy(p => s"k${p._1}")
            .map { case (k, vs) => k -> (vs.map(_._2).max + 1) }
          assert(merged.as[(String, Long)].collect().toMap == expect)
        }
    }
  }

  test("BlockJoin.allPairs covers every unordered pair exactly once, any block count") {
    forAll(Gen.zip(Gen.choose(1, 40), Gen.choose(1, 12)), n = 6) {
      case (n, blocks) =>
        val ids = (1 to n).map(_.toLong)
        val pairs = graft.operators.BlockJoin
          .allPairs(ids.toDF("id"), "id", blocks)
          .select(least(col("id_a"), col("id_b")),
            greatest(col("id_a"), col("id_b")))
          .as[(Long, Long)].collect().toSeq
        val expect = (for {
          a <- ids; b <- ids if a < b
        } yield (a, b)).toSet
        assert(pairs.size == expect.size, s"n=$n blocks=$blocks: duplicates or misses")
        assert(pairs.toSet == expect, s"n=$n blocks=$blocks: wrong pair set")
    }
  }

  test("header parsers are total: arbitrary bytes and every prefix parse without throwing") {
    import graft.functions.{AudioHeaders, ImageHeaders}
    val junk = Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt)
        .map(_.toByte)))
    forAll(junk, n = 300) { bs =>
      val b = bs.toArray
      ImageHeaders.dims(b); AudioHeaders.wavMeta(b); ()
    }
    // raw junk almost never clears the magic checks, so it exercises
    // only the first guard — both review-found crashes (JPEG fill-byte
    // edge, WAV chunk-size overflow) lived PAST the magic. Fuzz the
    // post-magic structure too: valid magic + junk tail.
    val pngSig = ImageHeaders.pngHeaderBytes(1, 1).take(8)
    val jpgSig = Array(0xff, 0xd8).map(_.toByte)
    val wavSig = AudioHeaders.wavHeaderBytes(1, 8000, 8, 0L).take(12)
    forAll(junk, n = 300) { bs =>
      val tail = bs.toArray
      ImageHeaders.pngDims(pngSig ++ tail)
      ImageHeaders.jpegDims(jpgSig ++ tail)
      // bias the jpeg tail toward marker bytes so the segment walk runs
      ImageHeaders.jpegDims(jpgSig ++ tail.map(b => if (b % 3 == 0) 0xff.toByte else b))
      AudioHeaders.wavMeta(wavSig ++ tail)
      ()
    }
    // every truncation of a valid header must degrade to None, not throw
    val png = ImageHeaders.pngHeaderBytes(640, 480)
    val jpg = ImageHeaders.jpegHeaderBytes(640, 480)
    val wav = AudioHeaders.wavHeaderBytes(2, 44100, 16, 77L)
    for (src <- Seq(png, jpg, wav); i <- 0 to src.length) {
      val p = java.util.Arrays.copyOf(src, i)
      ImageHeaders.dims(p); AudioHeaders.wavMeta(p); ()
    }
    // the sample decoders share the totality bar: valid-magic + junk
    // tails, every truncation of real G.711/float/extensible WAVs, and
    // single-byte corruptions must all return (Some|None), never throw
    val coded = Array.tabulate[Byte](32)(i => (i * 11 + 3).toByte)
    val realWavs = Seq(
      AudioHeaders.wavBytesFmt(7, 1, 8000, 8, coded),
      AudioHeaders.wavBytesFmt(6, 2, 8000, 8, coded),
      AudioHeaders.wavBytesFmt(3, 1, 48000, 32, coded),
      AudioHeaders.wavBytesFmt(1, 1, 8000, 24, coded.take(24)))
    forAll(junk, n = 200) { bs =>
      AudioHeaders.wavSamples16(wavSig ++ bs.toArray); ()
    }
    for (src <- realWavs) {
      for (i <- 0 to src.length)
        AudioHeaders.wavSamples16(java.util.Arrays.copyOf(src, i))
      var i = 0
      while (i < src.length) {
        val mut = src.clone(); mut(i) = (mut(i) ^ 0x5f).toByte
        AudioHeaders.wavSamples16(mut)
        i += 3
      }
    }
  }

  test("png: EVERY single-bit corruption across the signed region is rejected") {
    import graft.functions.ImageHeaders
    // signature(8) + length(4) + "IHDR"(4) + data(13) + crc(4) = bytes
    // 0..32 — the whole prefix the parser reads is covered by either the
    // magic/length/type checks or the mandated CRC, so no flip can
    // silently misreport dimensions
    val png = ImageHeaders.pngHeaderBytes(1234, 567)
    for (i <- 0 until 33; bit <- Seq(0x01, 0x80)) {
      val m = png.clone(); m(i) = (m(i) ^ bit).toByte
      val r = ImageHeaders.pngDims(m)
      assert(r.isEmpty, s"byte $i bit $bit parsed as $r")
    }
  }

  test("LineDedup invariants over random corpora: subset, order, df threshold, blank immunity") {
    val lineGen = Gen.oneOf(Gen.oneOf("alpha", "beta", "gamma", "delta"),
      Gen.const(""), Gen.const("  "),
      Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString))
    val docGen = Gen.listOfN(6, lineGen).map(_.mkString("\n"))
    forAll(Gen.listOfN(12, docGen), n = 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = graft.ext.LineDedup
        .removeDuplicatedLines(docs.toDF("doc_id", "text"), "doc_id", "text", 2)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      // reference semantics computed in plain Scala
      val split = docs.map { case (id, t) => id -> t.split("\n", -1).toSeq }.toMap
      val df = split.toSeq.flatMap { case (id, ls) =>
        ls.filter(_.trim.nonEmpty).distinct.map(_ -> id)
      }.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      docs.foreach { case (id, _) =>
        val ls = split(id)
        val expectKept = ls.filter(l => l.trim.isEmpty || df.getOrElse(l, 0) < 2)
        val (_, clean, nLines, nRemoved) = out(id)
        assert(nLines == ls.size.toLong, s"doc $id n_lines")
        assert(clean == expectKept.mkString("\n") ||
          (expectKept.isEmpty && clean == ""), s"doc $id text")
        assert(nRemoved == (ls.size - expectKept.size).toLong, s"doc $id n_removed")
      }
    }
  }

  test("imageDHash is total over arbitrary byte payloads (None, never a throw)") {
    val junkGen = Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)
    forAll(Gen.listOfN(24, junkGen), n = 4) { payloads =>
      val rows = payloads.zipWithIndex.map { case (p, i) =>
        graft.ext.Multimodal.MediaRow(i.toLong, p, "application/octet-stream", "fuzz")
      }
      val out = graft.ext.Multimodal.imageDHash(spark.createDataset(rows))
        .collect()
      assert(out.length == payloads.size)
      assert(out.forall(_.dhash.isEmpty)) // junk never decodes
    }
  }

  test("Profile: n_distinct <= n_rows - n_nulls for any frame, both modes") {
    val cellGen = Gen.oneOf(Gen.const(null: String), Gen.alphaStr.map(_.take(3)))
    forAll(Gen.listOfN(30, Gen.zip(cellGen, cellGen)), n = 4) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("a", "b")
        Seq(true, false).foreach { exact =>
          graft.operators.Profile.profile(df, exact)
            .as[(String, Long, Long, Long)].collect().foreach {
              case (c, n, nulls, dist) =>
                assert(n == rows.size.toLong)
                assert(dist <= n - nulls, s"$c exact=$exact")
                assert(nulls >= 0 && dist >= 0)
            }
        }
      }
    }
  }

  test("BlockJoin.crossPairs covers every left×right pair exactly once, any block count") {
    forAll(Gen.zip(Gen.choose(1, 15), Gen.choose(1, 25), Gen.choose(1, 12)), n = 6) {
      case (nl, nr, blocks) =>
        val left = (1 to nl).map(_.toLong)
        // overlap the id spaces so the distinct-id exclusion is exercised
        val right = (nl / 2 + 1 to nl / 2 + nr).map(_.toLong)
        val pairs = graft.operators.BlockJoin
          .crossPairs(left.toDF("id"), right.toDF("id"), "id", blocks)
          .select(col("id_a"), col("id_b"))
          .as[(Long, Long)].collect().toSeq
        val expect = (for { a <- left; b <- right if a != b } yield (a, b)).toSet
        assert(pairs.size == expect.size, s"nl=$nl nr=$nr blocks=$blocks: dup/miss")
        assert(pairs.toSet == expect, s"nl=$nl nr=$nr blocks=$blocks: wrong set")
    }
  }

  test("native featurize kernel == HOF twin on random unicode strings") {
    import graft.ext.HashedClassifier
    // strings over a unicode-heavy alphabet with every \s character
    // interleaved — the kernel's tokenize/lowercase/hash must agree
    // with the four-HOF chain on anything
    val alphabet = "aAzZ09äÄßΣσς中文 \t\n\f\r.!-é"
    val strGen: Gen[String] = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alphabet.toSeq)).map(_.mkString))
    forAll(Gen.listOfN(40, strGen), n = 5) { strs =>
      whenever(strs.nonEmpty) {
        val dim = 1 << 10
        val rows = strs.toDF("text").select(
            HashedClassifier.features(col("text"), dim).as("native"),
            HashedClassifier.featuresHof(col("text"), dim).as("hof"),
            col("text"))
          .collect()
        rows.foreach { r =>
          assert(r.getSeq[Int](0) == r.getSeq[Int](1),
            s"diverged on ${r.getString(2).map(_.toInt.toHexString)}")
        }
      }
    }
  }
}
