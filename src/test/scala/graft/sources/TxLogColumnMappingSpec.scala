package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Column mapping: renames and type widening WITHOUT rewriting data —
  * physical file names are stable; logical schema and the manifest's
  * colMap move. Pins: metadata-only commits (no data dirs touched),
  * time travel under each snapshot's own mapping, physical names on
  * disk, stats-pruned reads through the rename, restore across a
  * rename, the retired-physical-shadow guard, and the CDC stream
  * flowing through a mid-stream rename without restart.
  */
class TxLogColumnMappingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("n", IntegerType, nullable = true)))

  private def df(rows: (Long, String, Int)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, v, n) => Row(k, v, Integer.valueOf(n)) }.asJava,
      schema)
  }

  test("rename is metadata-only; reads, time travel, and merge follow") {
    val root = Files.createTempDirectory("txcmap").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    val v1 = t.append(df((1L, "a", 10), (2L, "b", 20)))
    val dirsBefore = Files.list(Paths.get(root, "data")).count()
    val v2 = t.renameColumn("v", "label")
    // metadata-only: not one new data dir
    assert(Files.list(Paths.get(root, "data")).count() == dirsBefore)
    // live read surfaces the new name with the old values
    val now = t.read().orderBy("k").collect()
    assert(t.read().columns.toSeq == Seq("k", "label", "n"))
    assert(now.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // time travel reads the PRE-rename snapshot under ITS schema
    assert(t.readAt(v1).columns.toSeq == Seq("k", "v", "n"))
    assert(t.readAt(v1).orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
    // a write AFTER the rename uses logical names; files store physical
    val v3 = t.append(df((3L, "c", 30)).toDF("k", "label", "n"))
    val m3 = t.colMapAt(v3)
    assert(m3 == Map("label" -> "v"))
    // raw parquet of every staged dir carries the PHYSICAL name
    import scala.jdk.CollectionConverters._
    val dirs = Files.list(Paths.get(root, "data")).iterator().asScala.toSeq
    val physCols = dirs.flatMap { d =>
      scala.util.Try(spark.read.parquet(d.toString).columns.toSeq).toOption
    }
    assert(physCols.forall(_.contains("v")), s"physical cols: $physCols")
    assert(physCols.forall(c => !c.contains("label")))
    // merge across the rename: logical key+precedence over mixed files
    t.merge(df((2L, "B", 21), (4L, "d", 40)).toDF("k", "label", "n"),
      Seq("k"), Seq(col("n").desc))
    val merged = t.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(merged.toSeq ==
      Seq((1L, "a", 10), (2L, "B", 21), (3L, "c", 30), (4L, "d", 40)))
    // double rename: label -> tag keeps the SAME physical
    t.renameColumn("label", "tag")
    assert(t.colMapAt(t.currentVersion) == Map("tag" -> "v"))
    assert(t.read().columns.toSeq == Seq("k", "tag", "n"))
    // rename collision and unknown column reject
    intercept[IllegalArgumentException](t.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](t.renameColumn("tag", "k"))
    // a NEW column shadowing the retired physical name rejects
    val bad = df((9L, "z", 9)).toDF("k", "tag", "v")
    intercept[IllegalArgumentException](t.append(bad))
  }

  test("stats-pruned reads and the DSv1 relation work through a rename") {
    val root = Files.createTempDirectory("txcmap_stats").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", 1), (2L, "b", 2)), statsCols = Seq("k", "n"))
    t.renameColumn("n", "amount")
    t.append(df((10L, "x", 100), (11L, "y", 110)).toDF("k", "v", "amount"),
      statsCols = Seq("k", "amount"))
    val got = t.readWhere(col("amount") > 50).orderBy("k").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(10L, 11L))
    // pruning EFFECTIVENESS: the filter must skip the low-range dir
    val paths = t.scanPathsAt(t.currentVersion, col("amount") > 50)
    val all = t.scanPathsAt(t.currentVersion, lit(true))
    assert(paths.size < all.size, s"pruned ${paths.size} of ${all.size}")
  }

  test("widenColumn int→long is metadata-only; narrow files upcast") {
    val root = Files.createTempDirectory("txwide").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", 7)))
    val dirsBefore = Files.list(Paths.get(root, "data")).count()
    t.widenColumn("n", LongType)
    assert(Files.list(Paths.get(root, "data")).count() == dirsBefore)
    assert(t.read().schema("n").dataType == LongType)
    // wide write after the widen; both epochs read under one schema
    val wide = spark.createDataFrame(
      java.util.List.of(Row(5L, "w", 5000000000L)),
      StructType(Seq(StructField("k", LongType, nullable = false),
        StructField("v", StringType, nullable = true),
        StructField("n", LongType, nullable = true))))
    t.append(wide)
    val rows = t.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 7L), (5L, 5000000000L)))
    // narrowing and nonsense widenings reject
    intercept[IllegalArgumentException](t.widenColumn("n", IntegerType))
    intercept[IllegalArgumentException](t.widenColumn("v", LongType))
    // rename composes with widen (same column, physical still stable)
    t.renameColumn("n", "count")
    assert(t.read().orderBy("k").collect().map(_.getLong(2)).toSeq ==
      Seq(7L, 5000000000L))
  }

  test("restore across a rename rolls schema AND mapping back") {
    val root = Files.createTempDirectory("txcmap_restore").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    val v1 = t.append(df((1L, "a", 1)))
    t.renameColumn("v", "label")
    t.append(df((2L, "b", 2)).toDF("k", "label", "n"))
    val vr = t.restore(v1)
    // restored snapshot: old logical name, old rows only
    assert(t.read().columns.toSeq == Seq("k", "v", "n"))
    assert(t.read().collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(t.colMapAt(vr) == Map.empty)
    // the restore's CDC leg names the dropped rows under the TARGET
    // schema (no forked old/new columns)
    val ch = t.changes(vr - 1, vr)
    val deleted = ch.filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(deleted == Seq(2L))
    // the leg surfaces ONE name (the target's), never a forked pair
    assert(!(ch.columns.contains("label") && ch.columns.contains("v")))
    // writes after the restore use the rolled-back names
    t.append(df((3L, "c", 3)))
    assert(t.read().orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 3L))
  }

  test("double rename inside ONE batch range: every leg folds back") {
    val root = Files.createTempDirectory("txcmap_double").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", 1)))
    // fix the stream schema NOW (column v), then rename twice with an
    // append under each intermediate name — one catch-up batch covers
    // all of it
    val src = new TxLogChangeSource(spark, root, startExclusive = 0L,
      onSchemaEvolution = "fail")
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    t.renameColumn("v", "b")
    t.append(df((2L, "from-b", 2)).toDF("k", "b", "n"))
    t.renameColumn("b", "c")
    t.append(df((3L, "from-c", 3)).toDF("k", "c", "n"))
    val batch = org.apache.spark.sql.graft.bridge.debatched(
      src.getBatch(None, LongOffset(t.currentVersion)))
    assert(batch.columns.contains("v") &&
      !batch.columns.contains("b") && !batch.columns.contains("c"))
    val inserts = batch.filter(col("_change_type") === "insert")
      .select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // the intermediate-name leg (v6 under 'b') must NOT null out
    assert(inserts == Set((1L, "a"), (2L, "from-b"), (3L, "from-c")))
  }

  test("CDC stream keeps flowing through a mid-stream rename") {
    val root = Files.createTempDirectory("txcmap_stream").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", 1)))
    val out = Files.createTempDirectory("txcmap_stream_out").toString
    val ck = Files.createTempDirectory("txcmap_stream_ck").toString
    // ONE continuous run (one Source instance, schema fixed at start);
    // fail mode pins that a rename must NOT trip the unknown-column
    // error — it is the same column under its stable physical name
    val q = spark.readStream.format("txlog")
      .option("startingVersion", "earliest")
      .option("onSchemaEvolution", "fail").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable() // batch with pre-rename rows flushed
      t.renameColumn("v", "label")
      t.append(df((2L, "b", 2)).toDF("k", "label", "n"))
      q.processAllAvailable() // post-rename batch through the SAME source
      q.exception.foreach(e => fail(s"stream failed: ${e.cause}", e))
    } finally q.stop()
    val got = spark.read.parquet(out)
    // the renamed column kept flowing under the STREAM-START name
    assert(got.columns.contains("v") && !got.columns.contains("label"))
    val inserts = got.filter(col("_change_type") === "insert")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(inserts == Set((1L, "a"), (2L, "b")))
  }

  test("dropColumn is metadata-only; time travel keeps the column") {
    val root = Files.createTempDirectory("txdrop").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    val v1 = t.append(df((1L, "a", 10), (2L, "b", 20)))
    val dirsBefore = Files.list(Paths.get(root, "data")).count()
    t.dropColumn("v")
    // metadata-only: not one new data dir, no file rewritten
    assert(Files.list(Paths.get(root, "data")).count() == dirsBefore)
    assert(t.read().columns.toSeq == Seq("k", "n"))
    assert(t.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 10), (2L, 20)))
    // the pre-drop snapshot still serves the column (time travel)
    assert(t.readAt(v1).columns.toSeq == Seq("k", "v", "n"))
    assert(t.readAt(v1).orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
    // appends after the drop conform to the narrowed schema
    t.append(df((3L, "ignored", 30)).select("k", "n"))
    assert(t.read().count() == 3L)
  }

  test("a dropped column's physical name is tombstoned against reuse") {
    val root = Files.createTempDirectory("txdrop_tomb").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", 10)))
    // rename v -> label first: the DROP must tombstone the PHYSICAL
    // name (v), which is what the files store
    t.renameColumn("v", "label")
    t.dropColumn("label")
    assert(t.droppedColsAt(t.currentVersion) == Set("v"))
    // a new column may not claim the retired physical name by ANY door
    val e1 = intercept[IllegalArgumentException](t.addColumn("v", StringType))
    assert(e1.getMessage.contains("DROPPED"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      t.append(df((5L, "x", 5)).toDF("k", "v", "n"))
    }
    assert(e2.getMessage.contains("DROPPED"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](t.renameColumn("n", "v"))
    assert(e3.getMessage.contains("DROPPED"), e3.getMessage)
    // an unrelated new name is fine, and old rows read it as null
    t.addColumn("fresh", StringType)
    assert(t.read().columns.toSeq == Seq("k", "n", "fresh"))
    assert(t.read().collect().forall(_.isNullAt(2)))
  }

  test("dropColumn guards: live CHECK blocks, last column blocks") {
    val root = Files.createTempDirectory("txdrop_guard").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", 10)))
    t.addConstraint("n_pos", "n > 0")
    val e = intercept[IllegalArgumentException](t.dropColumn("n"))
    assert(e.getMessage.contains("n_pos"), e.getMessage)
    t.dropConstraint("n_pos")
    t.dropColumn("n")
    t.dropColumn("v")
    val last = intercept[IllegalArgumentException](t.dropColumn("k"))
    assert(last.getMessage.contains("at least one column"), last.getMessage)
    intercept[IllegalArgumentException](t.dropColumn("nope"))
  }

  test("restore to a pre-drop snapshot resurrects the column and clears its tombstone") {
    val root = Files.createTempDirectory("txdrop_restore").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    val v1 = t.append(df((1L, "a", 10), (2L, "b", 20)))
    t.dropColumn("v")
    assert(t.droppedColsAt(t.currentVersion) == Set("v"))
    t.restore(v1)
    // schema, values, AND the tombstone state roll back together —
    // files were never rewritten, so the data is simply visible again
    assert(t.read().columns.toSeq == Seq("k", "v", "n"))
    assert(t.read().orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
    assert(t.droppedColsAt(t.currentVersion).isEmpty)
  }

  test("CDC stream stops restart-required on a mid-stream drop") {
    val root = Files.createTempDirectory("txdrop_stream").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", 1)))
    val out = Files.createTempDirectory("txdrop_stream_out").toString
    val ck = Files.createTempDirectory("txdrop_stream_ck").toString
    val q = spark.readStream.format("txlog")
      .option("startingVersion", "earliest").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      t.dropColumn("v")
      t.append(df((2L, "ignored", 2)).select("k", "n"))
      val err = intercept[Exception](q.processAllAvailable())
      assert((err.getMessage + Option(q.exception.map(_.toString))
          .getOrElse("")).contains("DROPPED mid-stream"),
        s"expected restart-required drop error, got: $err / ${q.exception}")
    } finally q.stop()
  }
}
