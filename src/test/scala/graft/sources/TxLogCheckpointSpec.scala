package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Pins the parquet stats checkpoint (round 9): skipping stats fold
  * into a `_log/ckpt-*.parquet` file referenced by the manifest's
  * `statsFile` — never inline JSON — with a `_last_checkpoint`
  * pointer, so the driver's metadata cost is bounded by COMMIT COUNT
  * and pruning runs as a distributed job whose collect is bounded by
  * the MATCHED files, not the table census. The 10⁴-file synthetic
  * test is the scale witness: a manifest under a kilobyte fronting
  * ten thousand per-file stat rows, pruned to single-file reads.
  */
class TxLogCheckpointSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def df(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, v) => Row(k, v) }.asJava, schema)
  }

  private def fresh(): (TxLogTable, String) = {
    val root = Files.createTempDirectory("txckpt").toString
    (new TxLogTable(spark, root), root)
  }

  private def manifestText(root: String, v: Long): String =
    new String(Files.readAllBytes(
      Paths.get(root, "_log", f"$v%020d.json")), "UTF-8")

  test("checkpoint moves stats to parquet: manifest stays small, pruning still bites, pointer written") {
    val (t, root) = fresh()
    t.ensureExists(schema)
    // 4 stats-bearing appends with disjoint key ranges, 1 file each
    (0L until 4L).foreach { b =>
      t.append(df((b * 100L until b * 100L + 50L).map(k =>
        (k, s"v$k")): _*).coalesce(1), statsCols = Seq("k"))
    }
    assert(t.scanPathsAt(t.currentVersion, col("k") === 105L).size === 1)

    val cv = t.checkpoint()
    assert(t.lastCheckpoint === Some(cv))
    // the fold manifest carries NO inline stats — only the parquet ref
    val mtxt = manifestText(root, cv)
    assert(!mtxt.contains("\"stats\""), s"inline stats leaked: $mtxt")
    assert(mtxt.contains("\"statsFile\""))
    // pruning from the checkpoint: same effectiveness as inline
    assert(t.scanPathsAt(cv, col("k") === 105L).size === 1)
    assert(t.scanPathsAt(cv, col("k") < 1000L).size === 4)
    // soundness: pruned read ≡ full read + filter
    assert(t.readWhere(col("k") === 105L).collect().map(_.getLong(0)).toSeq
      === Seq(105L))
  }

  test("second checkpoint folds the prior checkpoint plus later inline stats; vacuum GCs the stale one") {
    val (t, root) = fresh()
    t.ensureExists(schema)
    t.append(df((0L until 50L).map(k => (k, s"v$k")): _*).coalesce(1),
      statsCols = Seq("k"))
    val cv1 = t.checkpoint()
    // post-checkpoint append with inline stats in a fresh key range
    t.append(df((1000L until 1050L).map(k => (k, s"v$k")): _*).coalesce(1),
      statsCols = Seq("k"))
    val cv2 = t.checkpoint()
    assert(t.lastCheckpoint === Some(cv2))
    // BOTH ranges prune from the folded checkpoint (no inline anywhere)
    assert(!manifestText(root, cv2).contains("\"stats\""))
    assert(t.scanPathsAt(cv2, col("k") === 5L).size === 1)
    assert(t.scanPathsAt(cv2, col("k") === 1005L).size === 1)
    assert(t.scanPathsAt(cv2, col("k") === 777L).isEmpty)

    import scala.jdk.CollectionConverters._
    def ckptFiles(): Set[String] = {
      val s = Files.list(Paths.get(root, "_log"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("ckpt-")).toSet
      finally s.close()
    }
    assert(ckptFiles().size === 2)
    // full-history vacuum keeps both (cv1's manifest still references
    // the first); dropping history GCs the superseded checkpoint
    t.vacuum(retainHistory = true)
    assert(ckptFiles().size === 2)
    t.vacuum(retainHistory = false, minAgeMillis = 0L)
    assert(ckptFiles().size === 1)
    assert(t.scanPathsAt(t.currentVersion, col("k") === 1005L).size === 1)
    val _ = cv1
  }

  test("restore carries the checkpoint reference; pruning effective on the restored snapshot") {
    val (t, _) = fresh()
    t.ensureExists(schema)
    t.append(df((0L until 50L).map(k => (k, s"v$k")): _*).coalesce(1),
      statsCols = Seq("k"))
    t.append(df((100L until 150L).map(k => (k, s"v$k")): _*).coalesce(1),
      statsCols = Seq("k"))
    val cv = t.checkpoint()
    t.delete(col("k") >= 100L)
    val rv = t.restore(cv)
    assert(t.scanPathsAt(rv, col("k") === 105L).size === 1)
    assert(t.readAt(rv).count() === 100L)
  }

  test("checkpointEvery sink option bounds the chain walk on a hot append path") {
    val (t, root) = fresh()
    t.ensureExists(schema)
    val sink = new TxLogAppendSink(spark, root,
      Map("checkpointEvery" -> "5", "statsCols" -> "k"))
    (0 until 18).foreach(b =>
      sink.addBatch(b.toLong, df((b.toLong, s"b$b")).coalesce(1)))
    // maybeCheckpoint fires whenever the chain passes 5 commits, so
    // history shows periodic overwrite folds and the final chain is
    // short no matter how long the stream ran
    val folds = t.history().count(_._2 == "overwrite")
    assert(folds >= 3, s"expected periodic folds, history=${t.history()}")
    assert(t.lastCheckpoint.isDefined)
    // data intact, stats still prune after the folds
    assert(t.read().count() === 18L)
    assert(t.scanPathsAt(t.currentVersion, col("k") === 7L).size === 1)
    val noFold = t.maybeCheckpoint(maxChain = 100)
    assert(noFold.isEmpty, "short chain must not re-fold")
  }

  test("10^4-file synthetic log: sub-KB manifest, distributed prune to one file") {
    val (t, root) = fresh()
    t.ensureExists(schema)
    // one REAL dir so the live set exists on disk
    t.append(df((0L, "seed")).coalesce(1))
    val liveDir = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(root, "data"))
      try s.iterator().asScala.map(_.getFileName.toString).toList.head
      finally s.close()
    }
    // synthetic checkpoint: 10⁴ per-file stat rows with disjoint
    // 10-wide key ranges, built as a Spark job (never a driver list
    // of FileStats)
    import spark.implicits._
    val n = 10000
    val ckptName = "ckpt-synthetic.parquet"
    spark.range(n).map { i =>
      TxLogTable.CkptStatRow(f"$liveDir%s/part-$i%05d", 10L,
        Map("k" -> (i * 10).toString),
        Map("k" -> (i * 10 + 9).toString),
        Map("k" -> 0L), Map.empty, Map.empty)
    }.write.parquet(Paths.get(root, "_log", ckptName).toString)
    // hand-commit a fold manifest fronting the synthetic census
    val schemaJson = schema.json
    val committed = t.tryCommit(t.currentVersion + 1,
      TxLogTable.Manifest(0L, "overwrite", Seq(liveDir), schemaJson,
        System.currentTimeMillis(), None, None, Some(Nil), Some(ckptName)))
    assert(committed)
    val v = t.currentVersion
    // the manifest fronting 10⁴ files is metadata-sized
    assert(manifestText(root, v).length < 1024)
    // point predicate → exactly the one covering synthetic file
    val hit = t.scanPathsAt(v, col("k") === 55555L)
    assert(hit.size === 1 && hit.head.endsWith(f"$liveDir%s/part-${5555}%05d"))
    // range predicate → proportional slice, not the census
    assert(t.scanPathsAt(v, col("k") < 100L).size === 10)
    // unpredicated → everything (conservative)
    assert(t.scanPathsAt(v, lit(true)).size === n)
  }
}
