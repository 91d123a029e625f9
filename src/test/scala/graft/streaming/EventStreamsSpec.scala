package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.{Schemas, Tables}
import graft.sources.ParquetTable

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("windowedAgg batch twin matches direct computation on sf0.001") {
    val ev = Tables.events(spark, sf0001)
    val out = EventStreams.windowedAgg(ev, "1 hour")
    val total = out.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == ev.count())
  }

  test("streaming windowed agg with watermark produces batch-equal results") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedAggStream(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((t(1), "click", 1.0), (t(2), "click", 2.0), (t(11), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("winagg")
      .select("win_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows == Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.0),
      (Timestamp.valueOf("2024-01-01 10:10:00"), "view", 1L, 5.0)))
    q.stop()
  }

  test("streaming hopping windows: each event lands in window/slide overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams
      .hoppingAggStream(events, "10 minutes", "5 minutes", "5 minutes")
      .writeStream.format("memory").queryName("hopagg")
      .outputMode("complete").start()
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((t(1), "click", 1.0), (t(7), "click", 2.0))
    q.processAllAvailable()
    val rows = spark.table("hopagg")
      .select("win_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    // 10:01 → windows [09:55,10:05) and [10:00,10:10);
    // 10:07 → [10:00,10:10) and [10:05,10:15)
    assert(rows == Set(
      (Timestamp.valueOf("2024-01-01 09:55:00"), "click", 1L, 1.0),
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.0),
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1L, 2.0)))
    // batch twin agrees on the same frame
    val batch = EventStreams.hoppingAgg(
      Seq((t(1), "click", 1.0), (t(7), "click", 2.0))
        .toDF("ts", "event_type", "value"), "10 minutes", "5 minutes")
      .select("win_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(batch == rows)
    q.stop()
  }

  test("dedupStream drops in-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val events = mem.toDF().toDF("ts", "k")
    val q = EventStreams.dedupStream(events, Seq("k"), "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    mem.addData((t0, "a"), (t0, "a"), (t0, "b"))
    q.processAllAvailable()
    assert(spark.table("dedup").count() == 2)
    q.stop()
  }

  test("stream-static enrichment joins dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val out = EventStreams.enrichStream(
      mem.toDF().toDF("user_id", "value"), dim, Seq("user_id"))
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData((1L, 5.0), (3L, 7.0))
    q.processAllAvailable()
    val rows = spark.table("enriched")
      .select("user_id", "tier").as[(Long, Option[String])].collect().toMap
    assert(rows(1L).contains("gold"))
    assert(rows(3L).isEmpty) // left join keeps unmatched stream rows
    q.stop()
  }

  test("stream-stream interval join: watermarked, matches its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val cdf = clicks.toDF().toDF("c_ts", "user_id", "click_id")
    val pdf = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
    val q = EventStreams.joinStreams(cdf, pdf,
        col("user_id") === col("p_user"), "c_ts", "p_ts", "30 minutes",
        "1 hour", "1 hour")
      .select(col("click_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val clickRows = Seq((t(0), 1L, 100L), (t(5), 2L, 101L))
    val purchaseRows = Seq(
      (t(10), 1L, 200L), // match: user 1, +10 min
      (t(40), 1L, 201L), // no: outside 30-min bound
      (t(12), 3L, 202L), // no: key mismatch
      (t(4), 2L, 203L))  // no: before the click
    clicks.addData(clickRows: _*)
    purchases.addData(purchaseRows: _*)
    q.processAllAvailable()
    val streamed = spark.table("ssjoin").as[(Long, Long)].collect().toSet
    assert(streamed == Set((100L, 200L)))
    q.stop()
    // batch twin over the identical rows through the shared body
    val batch = EventStreams.intervalJoin(
        clickRows.toDF("c_ts", "user_id", "click_id"), "c_ts",
        purchaseRows.toDF("p_ts", "p_user", "purchase_id"), "p_ts",
        col("user_id") === col("p_user"), "30 minutes")
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    assert(batch == streamed)
  }

  test("stream-stream LEFT OUTER interval join: unmatched lefts emit after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = EventStreams.joinStreams(
        clicks.toDF().toDF("c_ts", "user_id", "click_id"),
        purchases.toDF().toDF("p_ts", "p_user", "purchase_id"),
        col("user_id") === col("p_user"), "c_ts", "p_ts", "30 minutes",
        "1 hour", "1 hour", joinType = "left_outer")
      .select(col("click_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("ssouter")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val t = (m: Int) => new Timestamp(t0.getTime + m * 60000L)
    clicks.addData((t(0), 1L, 100L), (t(5), 5L, 105L)) // 105 never matches
    purchases.addData((t(10), 1L, 200L))
    q.processAllAvailable()
    // push both watermarks far past 105's match horizon
    clicks.addData((t(300), 9L, 999L))
    purchases.addData((t(300), 9L, 888L))
    q.processAllAvailable()
    val rows = spark.table("ssouter")
      .as[(Long, Option[Long])].collect().toSet
    assert(rows.contains((100L, Some(200L))))
    assert(rows.contains((105L, None)), s"unmatched left not emitted: $rows")
    q.stop()
  }

  test("streaming CSV ingest: micro-batches upsert, replay-safe, tail batch included") {
    val work = Files.createTempDirectory("ingest").toString
    val csvDir = s"$work/in"; Files.createDirectories(java.nio.file.Paths.get(csvDir))
    val tableRoot = s"$work/table"
    def csvRow(id: String, pc: String) =
      s""""{$id}","100","2017-03-10 00:00","$pc","T","N","F","1","","X","","OXFORD","OXFORD","OXFORDSHIRE","A","A""""
    Files.write(java.nio.file.Paths.get(csvDir, "a.csv"),
      Seq(csvRow("A", "OX1 1AA"), csvRow("B", "SW1 1AA")).mkString("\n").getBytes)
    val table = new ParquetTable(spark, tableRoot)
    table.ensureExists(Schemas.pricePaid)
    val q1 = EventStreams.ingestPricePaidStream(spark, csvDir,
      Schemas.pricePaidCsv, table, s"$work/ckpt")
    q1.awaitTermination()
    assert(table.read().select("transaction_unique_identifier")
      .as[String].collect().toSeq == Seq("A")) // OX filter applied
    // second file lands (incremental), includes a dup of A
    Files.write(java.nio.file.Paths.get(csvDir, "b.csv"),
      Seq(csvRow("A", "OX1 1AA"), csvRow("C", "OX2 2BB")).mkString("\n").getBytes)
    val q2 = EventStreams.ingestPricePaidStream(spark, csvDir,
      Schemas.pricePaidCsv, table, s"$work/ckpt")
    q2.awaitTermination()
    assert(table.read().select("transaction_unique_identifier")
      .as[String].collect().toSet == Set("A", "C"))
  }

  test("streaming ingest survives a mid-run crash: resume from checkpoint equals single-run state (T2)") {
    def csvRow(id: String, pc: String) =
      s""""{$id}","100","2017-03-10 00:00","$pc","T","N","F","1","","X","","OXFORD","OXFORD","OXFORDSHIRE","A","A""""
    def seedInput(dir: String): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(dir))
      // 3 files → 3 micro-batches at maxFilesPerBatch=1; D duplicated
      // across files so the post-crash retry also re-tests insert-ignore
      Files.write(java.nio.file.Paths.get(dir, "a.csv"),
        Seq(csvRow("A", "OX1 1AA"), csvRow("D", "OX4 4DD")).mkString("\n").getBytes)
      Files.write(java.nio.file.Paths.get(dir, "b.csv"),
        Seq(csvRow("B", "OX2 2BB"), csvRow("D", "OX4 4DD")).mkString("\n").getBytes)
      Files.write(java.nio.file.Paths.get(dir, "c.csv"),
        Seq(csvRow("C", "OX3 3CC")).mkString("\n").getBytes)
    }
    def ids(t: ParquetTable) = t.read()
      .select("transaction_unique_identifier").as[String].collect().toSeq.sorted

    val work = Files.createTempDirectory("crash").toString

    // reference: uninterrupted single run over the same input
    val refDir = s"$work/ref-in"; seedInput(refDir)
    val refTable = new ParquetTable(spark, s"$work/ref-table")
    refTable.ensureExists(Schemas.pricePaid)
    EventStreams.ingestPricePaidStream(spark, refDir, Schemas.pricePaidCsv,
      refTable, s"$work/ref-ckpt", maxFilesPerBatch = Some(1)).awaitTermination()

    // crashing run: die at the head of the second micro-batch, after
    // batch 0 has committed to the table and the checkpoint
    val inDir = s"$work/in"; seedInput(inDir)
    val table = new ParquetTable(spark, s"$work/table")
    table.ensureExists(Schemas.pricePaid)
    val crashing = EventStreams.ingestPricePaidStream(spark, inDir,
      Schemas.pricePaidCsv, table, s"$work/ckpt", maxFilesPerBatch = Some(1),
      beforeCommit = (_, batchId) =>
        if (batchId >= 1) throw new RuntimeException("injected crash"))
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashing.awaitTermination()
    }
    assert(boom.getMessage.contains("injected crash"))
    val midIds = ids(table)
    assert(midIds.nonEmpty && midIds.size < ids(refTable).size,
      s"crash landed too early/late: $midIds") // partial state on disk

    // resume from the same checkpoint, no injection: remaining batches
    // replay; final state must equal the uninterrupted run exactly
    EventStreams.ingestPricePaidStream(spark, inDir, Schemas.pricePaidCsv,
      table, s"$work/ckpt", maxFilesPerBatch = Some(1)).awaitTermination()
    assert(ids(table) == ids(refTable))
    assert(ids(table) == Seq("A", "B", "C", "D")) // D exactly once
  }

  test("scd2 streaming ingest: incremental folds equal the full rebuild; batch marker survives replay") {
    val work = Files.createTempDirectory("scd2stream").toString
    val srcDir = s"$work/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val table = new ParquetTable(spark, s"$work/dim")
    val evSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("attr",
        org.apache.spark.sql.types.StringType)))
    val all = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (2L, 15L, 3L, "X"),
      (1L, 35L, 4L, "B"), (2L, 40L, 5L, "Y"), (3L, 45L, 6L, "Q"))
    def land(name: String, rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.toDF("k", "ts", "id", "attr").coalesce(1)
        .write.mode("append").parquet(s"$srcDir/$name")
    def run(ckpt: String = s"$work/ckpt"): Unit =
      EventStreams.scd2IngestStream(spark, s"$srcDir/*", evSchema, table,
        ckpt, "k", Seq("ts", "id"), "attr").awaitTermination()
    def state() = table.read()
      .select("k", "version", "attr_value", "valid_from", "valid_to",
        "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

    land("f1", all.filter(_._2 <= 30)); run()
    land("f2", all.filter(_._2 > 30)); run()
    val expected = graft.operators.ChangeCapture.scd2(
      all.toDF("k", "ts", "id", "attr"), "k", Seq("ts", "id"), "attr")
      .select("k", "version", "attr_value", "valid_from", "valid_to",
        "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(state() == expected)
    assert(table.marker("_graft_batch_id").map(_.trim) == Some("1"))

    // same-checkpoint restart with no new files: batch ids are monotone
    // within the lineage, nothing re-applies, state is untouched
    run()
    assert(state() == expected)
    assert(table.marker("_graft_batch_id").map(_.trim) == Some("1"))

    // checkpoint reset while the table is retained: batch ids from the
    // new lineage are NOT comparable with the recorded one (a fresh
    // query restarts at 0 ≤ applied and would silently drop any NEW
    // data mixed into the re-delivery) — the stream must fail fast and
    // leave the table exactly as committed
    land("f3", Seq((3L, 50L, 7L, "R")))
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(ckpt = s"$work/ckpt2")
    }
    assert(boom.getCause.getMessage.contains("refusing to guess"))
    assert(state() == expected) // f3 not applied, nothing double-folded
    assert(table.marker("_graft_batch_id").map(_.trim) == Some("1"))

    // explicit rebuild (table and checkpoint deleted together) picks up
    // f3: the documented recovery path
    def deleteRec(p: String): Unit = {
      val path = java.nio.file.Paths.get(p)
      if (Files.exists(path)) {
        val s = Files.walk(path)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
        finally s.close()
      }
    }
    deleteRec(s"$work/dim"); deleteRec(s"$work/ckpt2")
    run(ckpt = s"$work/ckpt2")
    val withF3 = graft.operators.ChangeCapture.scd2(
      (all :+ (3L, 50L, 7L, "R")).toDF("k", "ts", "id", "attr"),
      "k", Seq("ts", "id"), "attr")
      .select("k", "version", "attr_value", "valid_from", "valid_to",
        "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(state() == withF3)

    // legacy table: a batch-id marker with NO lineage marker (written
    // before lineage tracking) is just as uncomparable — must fail
    // fast, not silently skip
    Files.delete(java.nio.file.Paths.get(s"$work/dim", "_graft_query_id"))
    val legacyBoom =
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run(ckpt = s"$work/ckpt3")
      }
    assert(legacyBoom.getCause.getMessage.contains("<none recorded>"))
    assert(state() == withF3) // untouched
  }

  test("qualityFilteredIngest: pre-trained model gates the stream, replay-safe") {
    val work = Files.createTempDirectory("qfingest").toString
    val srcDir = s"$work/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val corpus = new ParquetTable(spark, s"$work/corpus")
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    corpus.ensureExists(docSchema)
    // offline training on a labeled toy frame (separable rule)
    val labeled = ((1 to 20).map(i => (s"good clean words number $i here", 1.0)) ++
      (1 to 20).map(i => (s"spam spam buy now spam click $i", 0.0)))
      .toDF("text", "y")
    val model = graft.ext.HashedClassifier.fit(labeled, "text", "y",
      dim = 1 << 12, iters = 30)
    def land(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$srcDir/$name")
    def run(): Unit = EventStreams.qualityFilteredIngest(spark, s"$srcDir/*",
      docSchema, corpus, s"$work/ckpt", model).awaitTermination()
    def corpusIds = corpus.read().select("doc_id").as[Long].collect().toSeq.sorted

    land("f1", Seq(
      1L -> "good clean words and more good words",
      2L -> "spam spam buy now spam click here spam"))
    run()
    assert(corpusIds == Seq(1L), s"got $corpusIds")

    // second batch: another good doc lands, spam keeps dying
    land("f2", Seq(
      3L -> "spam click spam buy spam now",
      4L -> "more good clean words in a clean document"))
    run()
    assert(corpusIds == Seq(1L, 4L), s"got $corpusIds")

    // re-delivery under a new file name: insert-ignore absorbs it
    land("f3", Seq(1L -> "good clean words and more good words"))
    run()
    assert(corpusIds == Seq(1L, 4L))
  }

  test("nearDupFilteredIngest: cross-batch near-dups dropped via persistent index, replay-safe") {
    val work = Files.createTempDirectory("nddingest").toString
    val srcDir = s"$work/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val corpus = new ParquetTable(spark, s"$work/corpus")
    val index = new ParquetTable(spark, s"$work/index")
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    corpus.ensureExists(docSchema)
    index.ensureExists(Schemas.minhashIndex)
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    def land(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$srcDir/$name")
    def run(): Unit = EventStreams.nearDupFilteredIngest(spark, s"$srcDir/*",
      docSchema, corpus, index, s"$work/ckpt").awaitTermination()
    def corpusIds = corpus.read().select("doc_id").as[Long].collect().toSeq.sorted

    // batch 1: 1 and 2 are near-dups of each other; 3 unrelated
    land("f1", Seq(
      1L -> base,
      2L -> base.replace("kilo", "zulu"), // 1-word change: jaccard >> 0.5
      3L -> "one two three four five six seven eight nine ten eleven twelve"))
    run()
    assert(corpusIds == Seq(1L, 3L), s"got $corpusIds") // 2 lost to 1
    assert(index.read().count() == 2)

    // batch 2: 4 near-dups corpus doc 1 (cross-batch!); 5 is novel
    land("f2", Seq(
      4L -> base.replace("alpha", "yankee"),
      5L -> "red orange yellow green blue indigo violet black white gray pink brown"))
    run()
    assert(corpusIds == Seq(1L, 3L, 5L), s"got $corpusIds") // 4 caught by the INDEX
    assert(index.read().count() == 3)

    // re-delivery of batch-1 content under new file name: insert-ignore
    // + pair-filter make it a no-op (replay safety at the content level)
    land("f3", Seq(1L -> base, 3L -> "one two three four five six seven eight nine ten eleven twelve"))
    run()
    assert(corpusIds == Seq(1L, 3L, 5L))
    assert(index.read().count() == 3)

    // a batch doc with a SMALLER id than its corpus near-dup partner
    // must still lose — ids are user-assigned, not monotonic, and the
    // landed corpus is never retro-edited
    land("f4", Seq(0L -> base.replace("delta", "sierra")))
    run()
    assert(corpusIds == Seq(1L, 3L, 5L), s"smaller-id near-dup admitted: $corpusIds")
    assert(index.read().count() == 3)

    // a batch carrying the SAME id twice with DIFFERENT text: one
    // deterministic pick (min by the remaining columns) must feed the
    // pair computation, the corpus write AND the index write — the
    // persisted signature must describe the text that actually landed,
    // not an independent arbitrary pick
    land("f5", Seq(
      6L -> "wolf bear lynx otter moose raven eagle heron crane stork finch wren",
      6L -> "apple pear plum grape peach mango lemon lime fig date kiwi melon",
      // corrupt null-text retry: nulls order LAST, so it must never
      // beat a real row for the same id
      6L -> (null: String)))
    run()
    assert(corpusIds == Seq(1L, 3L, 5L, 6L), s"got $corpusIds")
    val landed = corpus.read().filter(col("doc_id") === 6L)
      .select("text").as[String].collect().toSeq
    assert(landed.size == 1)
    assert(landed.head.startsWith("apple"), // lexicographic min of the two
      s"non-deterministic pick landed: ${landed.head}")
    val expectedSig = graft.ext.MinHashDedup.indexFrame(
        Seq(6L -> landed.head).toDF("doc_id", "text"), "doc_id", "text")
      .select("sig").collect().head.getSeq[Long](0)
    val storedSig = index.read().filter(col("id") === 6L)
      .select("sig").collect().head.getSeq[Long](0)
    assert(storedSig == expectedSig,
      "index signature must be computed from the landed text")
  }
}
