package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.sources.TxLogTable

/** Pins the transactional materialized view: refresh == recompute
  * after every commit kind, refresh is idempotent (no-op when
  * current), the marker travels atomically with the state, and a
  * stale-marker rerun (crash simulation) converges instead of
  * double-applying.
  */
class MaterializedViewSpec extends SparkSpec {

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

  private def tables() = (
    new TxLogTable(spark, Files.createTempDirectory("mv_src").toString),
    new TxLogTable(spark, Files.createTempDirectory("mv_view").toString))

  private def asMap(d: org.apache.spark.sql.DataFrame) =
    d.collect().map { r =>
      Option(r.getString(0)) -> ((r.getLong(1),
        Option(r.getDecimal(2)).map(_.toPlainString).orNull))
    }.toMap

  test("refresh tracks the source across append / merge / delete") {
    val (src, view) = tables()
    src.ensureExists(schema)
    src.append(df((1L, "a", 1.0, 1L), (2L, "b", 2.0, 1L)))
    assert(MaterializedView.refresh(src, view, group, sums) ===
      src.currentVersion)
    assert(asMap(view.read()) ===
      asMap(IncrementalView.seed(src.read(), group, sums)))

    src.merge(df((1L, "b", 5.0, 9L), (3L, "c", 7.0, 9L)),
      Seq("k"), Seq(col("ts").desc))
    src.mergeConditional(df((3L, "c", 0.0, 20L)), Seq("k"),
      whenMatched = Seq(TxLogTable.MatchedDelete(Some("s.x = 0.0"))),
      insertWhenNotMatched = false)
    MaterializedView.refresh(src, view, group, sums)
    assert(asMap(view.read()) ===
      asMap(IncrementalView.seed(src.read(), group, sums)))
    assert(view.marker(MaterializedView.VersionMarker)
      === Some(src.currentVersion.toString))
  }

  test("refresh with nothing new commits nothing (idempotent no-op)") {
    val (src, view) = tables()
    src.ensureExists(schema)
    src.append(df((1L, "a", 1.0, 1L)))
    MaterializedView.refresh(src, view, group, sums)
    val vv = view.currentVersion
    MaterializedView.refresh(src, view, group, sums)
    assert(view.currentVersion === vv)
  }

  test("stale-marker rerun converges: fold is over (marker, head], never reapplied") {
    val (src, view) = tables()
    src.ensureExists(schema)
    src.append(df((1L, "a", 1.0, 1L)))
    MaterializedView.refresh(src, view, group, sums)
    src.append(df((2L, "a", 10.0, 2L)))
    // two back-to-back refreshes of the same new range: the second
    // sees marker == head and must not double-count k=2
    MaterializedView.refresh(src, view, group, sums)
    MaterializedView.refresh(src, view, group, sums)
    assert(asMap(view.read()) ===
      asMap(IncrementalView.seed(src.read(), group, sums)))
    assert(asMap(view.read())(Some("a"))._1 === 2L)
  }
}
