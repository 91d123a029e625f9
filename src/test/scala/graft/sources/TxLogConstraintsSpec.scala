package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** CHECK constraints and COPY INTO on the txlog table: constraints are
  * metadata-only commits enforced fail-fast INSIDE each data-changing
  * write job (SQL CHECK semantics: only FALSE violates, NULL passes);
  * COPY INTO is exactly-once file ingest whose ingested-set survives
  * overwrites and replays.
  */
class TxLogConstraintsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("n", LongType, nullable = true)))

  private def df(rows: (Long, String, java.lang.Long)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, v, n) => Row(k, v, n) }.asJava, schema)
  }

  private def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)

  test("CHECK constraints: add validates history, writes enforce, NULL passes") {
    val root = Files.createTempDirectory("txcheck").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", L(10)), (2L, "b", null)))
    // adding a constraint the existing rows PASS (null n passes CHECK)
    t.addConstraint("n_positive", "n > 0")
    // a violating append fails loudly and commits NOTHING
    val v0 = t.currentVersion
    val e = intercept[Exception](t.append(df((3L, "c", L(-5)))))
    assert(stackMessage(e).contains("n_positive"), stackMessage(e).take(400))
    assert(t.currentVersion == v0, "failed write must not advance the log")
    assert(t.read().count() == 2)
    // passing rows (incl. NULL) still write
    t.append(df((3L, "c", L(7)), (4L, "d", null)))
    assert(t.read().count() == 4)
    // merge and update enforce too
    intercept[Exception](t.merge(df((4L, "D", L(-1))), Seq("k"),
      Seq(col("n").desc_nulls_last)))
    intercept[Exception](
      t.update(col("k") === 1L, Map("n" -> lit(-9L))))
    assert(t.readAt(t.currentVersion).filter(col("n") < 0).count() == 0)
    // adding a constraint the EXISTING rows violate is rejected
    intercept[Exception](t.addConstraint("v_is_z", "v = 'z'"))
    assert(!t.read().isEmpty)
    // drop, then the formerly-vetoed write lands
    t.dropConstraint("n_positive")
    t.append(df((9L, "neg", L(-5))))
    assert(t.read().filter(col("n") === -5L).count() == 1)
    intercept[IllegalArgumentException](t.dropConstraint("ghost"))
  }

  private def stackMessage(e: Throwable): String = {
    var m = ""
    var cur = e
    while (cur != null) { m += Option(cur.getMessage).getOrElse(""); cur = cur.getCause }
    m
  }

  test("a batch OMITTING a constrained column passes (null-pad, SQL CHECK)") {
    val root = Files.createTempDirectory("txcheck_missing").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a", L(5))))
    t.addConstraint("n_positive", "n > 0")
    // legal evolved batch without `n`: rows land with n = null, and
    // NULL passes a CHECK — enforcement must not fail analysis
    val partial = spark.createDataFrame(
      java.util.List.of(Row(2L, "b")),
      StructType(Seq(StructField("k", LongType, nullable = false),
        StructField("v", StringType, nullable = true))))
    t.append(partial)
    val got = t.read().orderBy("k").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got(1).isNullAt(2))
  }

  test("constraints survive checkpoint folding and roll back with restore") {
    val root = Files.createTempDirectory("txcheck_ckpt").toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    val vPlain = t.append(df((1L, "a", L(1))))
    t.addConstraint("n_small", "n < 100")
    t.append(df((2L, "b", L(2))))
    t.checkpoint()
    // still enforced after the fold
    intercept[Exception](t.append(df((3L, "c", L(500)))))
    // restore to before the constraint existed → it is gone
    t.restore(vPlain)
    t.append(df((3L, "c", L(500))))
    assert(t.read().filter(col("n") === 500L).count() == 1)
  }

  test("COPY INTO ingests each file exactly once, across replays and overwrites") {
    val root = Files.createTempDirectory("txcopy").toString
    val land = Files.createTempDirectory("txcopy_land")
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    df((1L, "a", L(1))).coalesce(1).write.parquet(land.resolve("f1").toString)
    df((2L, "b", L(2))).coalesce(1).write.parquet(land.resolve("f2").toString)
    val glob = land.toString + "/f*/part-*.parquet"
    val v1 = t.copyInto(glob)
    assert(t.read().count() == 2)
    assert(t.copiedFiles.size == 2)
    // exact replay: NO new version, NO new rows
    assert(t.copyInto(glob) == v1)
    assert(t.read().count() == 2)
    // a new landed file: only IT is ingested
    df((3L, "c", L(3))).coalesce(1).write.parquet(land.resolve("f3").toString)
    t.copyInto(glob)
    assert(t.read().count() == 3)
    assert(t.copiedFiles.size == 3)
    // the ingested set survives a full overwrite (file idempotency is
    // about the FILES, not the table state)
    t.overwrite(df((9L, "z", L(9))))
    assert(t.copyInto(glob) == t.currentVersion) // nothing fresh
    assert(t.read().count() == 1)
    // constraints veto a bad landing file before anything commits
    t.addConstraint("n_positive", "n > 0")
    df((4L, "bad", L(-4))).coalesce(1)
      .write.parquet(land.resolve("f4").toString)
    val vPre = t.currentVersion
    intercept[Exception](t.copyInto(glob))
    assert(t.currentVersion == vPre)
    // the vetoed file stays un-ingested: fixing the constraint lets a
    // re-run pick it up (no false "already copied" marker)
    t.dropConstraint("n_positive")
    t.copyInto(glob)
    assert(t.read().filter(col("k") === 4L).count() == 1)
  }
}
