package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Pins deletion vectors (round 9): [[TxLogTable.deleteVectored]]
  * commits a sidecar of (file, position) pairs instead of rewriting
  * the snapshot — the merge-on-read DML path that makes a point
  * delete on a huge table a deleted-rows-sized commit. The headline
  * assertion is the scale witness: after a 1-row delete, every live
  * data dir of the previous version is STILL the live set (no
  * rewrite), and only the sidecar was added.
  */
class TxLogDvSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def df(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, v) => Row(k, v) }.asJava, schema)
  }

  private def fresh(): (TxLogTable, String) = {
    val root = Files.createTempDirectory("txdv").toString
    (new TxLogTable(spark, root), root)
  }

  private def keys(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("k").collect().map(_.getLong(0)).toSet

  test("1-row delete commits WITHOUT rewriting untouched files; reads apply the vector") {
    val (t, root) = fresh()
    t.ensureExists(schema)
    (0L until 4L).foreach { b =>
      t.append(df((b * 100L until b * 100L + 5L).map(k =>
        (k, s"v$k")): _*).coalesce(1), statsCols = Seq("k"))
    }
    import scala.jdk.CollectionConverters._
    def dataDirs(): Set[String] = {
      val s = Files.list(Paths.get(root, "data"))
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    val dirsBefore = dataDirs()
    val v = t.deleteVectored(col("k") === 102L)
    // the live set is UNCHANGED — the commit added only the sidecar
    val dirsAfter = dataDirs()
    assert((dirsAfter -- dirsBefore).size === 1)
    assert(t.scanPathsAt(v, lit(true)).toSet ===
      t.scanPathsAt(v - 1, lit(true)).toSet,
      "live data files must not be rewritten by a vectored delete")
    // merge-on-read: the row is gone from every read path
    assert(keys(t.read()) === ((0L until 4L).flatMap(b =>
      b * 100L until b * 100L + 5L).toSet - 102L))
    assert(keys(t.readWhere(col("k") >= 100L && col("k") < 200L)) ===
      Set(100L, 101L, 103L, 104L))
    assert(keys(spark.read.format("txlog").load(root)
      .filter(col("k") >= 100L)) ===
      ((1L until 4L).flatMap(b => b * 100L until b * 100L + 5L).toSet - 102L))
    // time travel still sees the pre-delete row
    assert(keys(t.readAt(v - 1)).contains(102L))
    // CDC: the delete is on the typed feed
    val ch = t.changes(v - 1, v)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ch === Seq((102L, "delete")))
  }

  test("stacked vectored deletes compose; copy-on-write commits fold and reset them") {
    val (t, _) = fresh()
    t.ensureExists(schema)
    t.append(df((0L until 10L).map(k => (k, s"v$k")): _*).coalesce(1))
    t.deleteVectored(col("k") === 3L)
    t.deleteVectored(col("k") === 7L)
    assert(keys(t.read()) === (0L until 10L).toSet -- Set(3L, 7L))
    // an already-deleted position never re-matches (no duplicate CDC)
    val v = t.deleteVectored(col("k") <= 4L)
    assert(t.changes(v - 1, v).select("k").collect()
      .map(_.getLong(0)).toSet === Set(0L, 1L, 2L, 4L))
    assert(keys(t.read()) === Set(5L, 6L, 8L, 9L))
    // checkpoint carries the vectors (metadata fold must not resurrect)
    val cv = t.checkpoint()
    assert(keys(t.readAt(cv)) === Set(5L, 6L, 9L, 8L))
    // compaction (copy-on-write) folds vectors into rewritten files
    // and resets them: same data, no dv in effect
    val comp = t.compact(targetRowsPerFile = 100)
    assert(keys(t.readAt(comp)) === Set(5L, 6L, 8L, 9L))
    assert(t.dvDirsAt(comp).isEmpty,
      "overwrite-class commits must reset deletion vectors")
  }

  test("restore across vectored deletes: rows resurrect, and the resurrection is on the feed") {
    val (t, _) = fresh()
    t.ensureExists(schema)
    t.append(df((0L until 6L).map(k => (k, s"v$k")): _*).coalesce(1)) // v1
    val v2 = t.deleteVectored(col("k") === 2L)                        // v2
    t.deleteVectored(col("k") === 4L)                                 // v3
    val rv = t.restore(v2)                                            // v4
    assert(keys(t.read()) === (0L until 6L).toSet - 2L)
    // shared-dir DV delta: k=4 resurrects as an insert on the feed
    val ch = t.changes(rv - 1, rv)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ch === Seq((4L, "insert")))
    // restore to BEFORE any vector: k=2 resurrects too (k=4 is already
    // alive since the first restore, so the delta is exactly one row)
    val rv2 = t.restore(1L)
    assert(keys(t.read()) === (0L until 6L).toSet)
    assert(t.changes(rv2 - 1, rv2).select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((2L, "insert")))
  }

  test("vacuum never collects referenced sidecars; merge serializes over a vectored table") {
    val (t, _) = fresh()
    t.ensureExists(schema)
    t.append(df((0L until 5L).map(k => (k, s"v$k")): _*).coalesce(1))
    t.deleteVectored(col("k") === 1L)
    assert(t.vacuum(retainHistory = true) === Nil)
    assert(keys(t.read()) === Set(0L, 2L, 3L, 4L))
    // a merge reads the DV-applied snapshot and rewrites: deleted row
    // stays dead, merge lands, vectors reset
    t.mergeConditional(df((2L, "UP")), Seq("k"),
      Seq(TxLogTable.MatchedUpdate()))
    assert(t.read().filter(col("k") === 2L).select("v").collect()
      .map(_.getString(0)).toSeq === Seq("UP"))
    assert(keys(t.read()) === Set(0L, 2L, 3L, 4L))
    assert(t.dvDirsAt(t.currentVersion).isEmpty)
  }
}
