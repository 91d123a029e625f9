package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.sources.TxLogTable

/** Pins incremental view maintenance over the typed change feed: the
  * folded state equals a from-scratch aggregate of the snapshot after
  * every kind of commit (insert, update, delete, dup-key collapse),
  * including null group keys and groups that drop to zero — and the
  * equality is exact (decimal retraction), not approximate.
  */
class IncrementalViewSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("g", StringType, nullable = true),
    StructField("x", DoubleType, nullable = true),
    StructField("ts", LongType, nullable = false)))

  private def df(rows: (Long, String, java.lang.Double, Long)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (k, g, x, ts) =>
        Row(k, g, x, ts)
      }: _*), schema)

  private val group = Seq("g")
  private val sums = Seq("x")

  private def recompute(t: TxLogTable) =
    IncrementalView.seed(t.read(), group, sums)

  private def asMap(d: org.apache.spark.sql.DataFrame) =
    d.collect().map { r =>
      Option(r.getString(0)) -> ((r.getLong(1),
        Option(r.getDecimal(2)).map(_.toPlainString).orNull))
    }.toMap

  test("fold across append, merge, conditional delete equals recompute") {
    val t = new TxLogTable(spark,
      Files.createTempDirectory("ivm").toString)
    t.ensureExists(schema)
    var state = IncrementalView.empty(t.read(), group, sums)
    var last = 0L
    def step(commit: => Long): Unit = {
      val v = commit
      state = IncrementalView.applyChanges(state, t.changes(last, v),
        group, sums)
      last = v
      assert(asMap(state) === asMap(recompute(t)), s"diverged at v$v")
    }
    // inserts, including a null group and a null value
    step(t.append(df((1L, "a", 1.5, 1L), (2L, "a", 2.25, 1L),
      (3L, "b", 10.0, 1L), (4L, null, 7.0, 1L), (5L, "b", null, 1L))))
    // latest-wins merge: moves k=1 from group a to b, updates k=3
    step(t.merge(df((1L, "b", 100.0, 9L), (3L, "b", 20.0, 9L),
      (6L, "c", 1.0, 9L)), Seq("k"), Seq(col("ts").desc)))
    // conditional merge: delete group-c's only row (group drops out),
    // update k=2
    step(t.mergeConditional(df((6L, "c", 0.0, 20L), (2L, "a", 5.0, 20L)),
      Seq("k"),
      whenMatched = Seq(
        TxLogTable.MatchedDelete(Some("s.x = 0.0")),
        TxLogTable.MatchedUpdate(None)),
      insertWhenNotMatched = false))
    // group c vanished entirely (n reached 0)
    assert(!asMap(state).contains(Some("c")))
    // dup-key collapse via raw append then unrelated merge
    step(t.append(df((7L, "a", 3.0, 30L), (7L, "a", 4.0, 31L))))
    step(t.merge(df((8L, "d", 8.0, 40L)), Seq("k"), Seq(col("ts").desc)))
  }

  test("seeded mid-history fold matches the pure fold") {
    val t = new TxLogTable(spark,
      Files.createTempDirectory("ivm2").toString)
    t.ensureExists(schema)
    val v1 = t.append(df((1L, "a", 1.0, 1L), (2L, "b", 2.0, 1L)))
    val v2 = t.merge(df((1L, "a", 9.0, 9L), (3L, "b", 3.0, 9L)),
      Seq("k"), Seq(col("ts").desc))
    val seeded = IncrementalView.applyChanges(
      IncrementalView.seed(t.readAt(v1), group, sums),
      t.changes(v1, v2), group, sums)
    val pure = IncrementalView.applyChanges(
      IncrementalView.empty(t.read(), group, sums),
      t.changes(0L, v2), group, sums)
    assert(asMap(seeded) === asMap(pure))
    assert(asMap(seeded) === asMap(recompute(t)))
  }

  test("retraction is exact: repeated update cycles leave no residue") {
    val t = new TxLogTable(spark,
      Files.createTempDirectory("ivm3").toString)
    t.ensureExists(schema)
    var state = IncrementalView.empty(t.read(), group, sums)
    var last = t.append(df((1L, "a", 0.1, 0L), (2L, "a", 0.2, 0L)))
    state = IncrementalView.applyChanges(state, t.changes(0L, last),
      group, sums)
    for (i <- 1 to 5) {
      val v = t.merge(df((1L, "a", 0.1 * i + 0.3, i.toLong)),
        Seq("k"), Seq(col("ts").desc))
      state = IncrementalView.applyChanges(state, t.changes(last, v),
        group, sums)
      last = v
    }
    assert(asMap(state) === asMap(recompute(t)))
  }
}
