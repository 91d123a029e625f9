package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The Hadoop-FS store layer: the txlog table and catalog must run
  * their ENTIRE metadata IO (manifests, stats checkpoints, DVs,
  * pointers, the catalog tree) through `org.apache.hadoop.fs
  * .FileSystem`, so a root may name any mounted scheme. Pinned here:
  * (1) the full table lifecycle — commits, stats pruning, DV deletes,
  * checkpoint, time travel, CDC, vacuum — over an explicitly
  * SCHEME-QUALIFIED `file:/` root (the RawLocal proof of the
  * abstraction the sandbox can give); (2) the V2 read path and SQL DML
  * over that root; (3) a qualified CATALOG root; (4) owner selection
  * by scheme — posix links on `file:`, loud refusal on schemes with
  * no atomic primitive; (5) the source-level pin that no
  * `java.nio.file`/`java.io.File` call remains in the store layer.
  */
class TxStoreSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def df(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava,
      schema)
  }

  /** An explicitly scheme-qualified root — the same directory a plain
    * local path would name, but every store call must now survive URI
    * parsing and FileSystem resolution.
    */
  private def qualifiedRoot(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    "file:" + dir.toUri.getPath.stripSuffix("/")
  }

  test("full table lifecycle over a file:-qualified root") {
    val root = qualifiedRoot("txstore")
    val t = new TxLogTable(spark, root)
    t.ensureExists(schema)
    t.append(df((1L, "a"), (2L, "b")), statsCols = Seq("k"))
    t.append(df((3L, "c"), (4L, "d")), statsCols = Seq("k"))
    assert(t.currentVersion === 2L)
    assert(t.read().count() === 4L)

    // stats pruning works over the qualified paths
    val pruned = t.scanPathsAt(2L, col("k") === 1L)
    val all = t.scanPathsAt(2L, lit(true))
    assert(pruned.size < all.size,
      s"manifest pruning must engage: ${pruned.size}/${all.size}")

    // merge + time travel + CDC
    t.merge(df((2L, "B"), (5L, "e")), Seq("k"), Seq(lit(1)))
    assert(t.read().count() === 5L)
    assert(t.readAt(2L).count() === 4L, "snapshot v2 is immutable")
    val feed = t.changes(2L, t.currentVersion)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .count() >= 1L)

    // DV delete (merge-on-read) then checkpoint + vacuum
    t.deleteVectored(col("k") === 3L)
    assert(t.read().count() === 4L)
    assert(!t.read().collect().map(_.getLong(0)).contains(3L))
    t.checkpoint()
    assert(t.lastCheckpoint.contains(t.currentVersion))
    t.vacuum(minAgeMillis = 0L)
    assert(t.read().count() === 4L, "vacuum must never touch live data")

    // and the SAME table resolves through the plain-path alias of the
    // root (one canonical store, two spellings)
    val plain = new TxLogTable(spark,
      java.net.URI.create(root).getPath)
    assert(plain.currentVersion === t.currentVersion)
    assert(plain.read().count() === 4L)
  }

  test("V2 reads, SQL DML, and schema evolution over a qualified root") {
    val root = qualifiedRoot("txstore_v2")
    df((1L, "a"), (2L, "b")).write.format("txlog").save(root)
    val back = spark.read.format("txlog").load(root)
    assert(back.count() === 2L)
    // the V2 scan plans over the store's qualified paths
    assert(back.queryExecution.executedPlan.toString.contains("BatchScan")
      || back.queryExecution.executedPlan.toString.contains("Scan"),
      back.queryExecution.executedPlan.toString)
    // SQL DML through the parser extension routes to the same root
    import graft.plans.GraftSql
    GraftSql.sql(spark,
      s"DELETE FROM txlog.`$root` WHERE k = 1").collect()
    assert(spark.read.format("txlog").load(root).count() === 1L)
    // evolved append through the writer path
    val wide = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, "z", "x")),
      schema.add("note", StringType))
    wide.write.format("txlog")
      .mode(org.apache.spark.sql.SaveMode.Append).save(root)
    val cols = spark.read.format("txlog").load(root).columns.toSeq
    assert(cols === Seq("k", "v", "note"))
  }

  test("catalog tree on a qualified root resolves, creates, and drops") {
    val wh = qualifiedRoot("txstore_cat")
    val cat = s"lakeq${System.nanoTime() % 100000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[TxLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) USING txlog")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .collect().head.getLong(0) === 2L)
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql(s"DROP TABLE $cat.db.t")
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect().isEmpty)
  }

  test("owner selection: posix links on file:, loud refusal without a primitive") {
    val localFs = FileSystem.getLocal(new Configuration())
    assert(CommitOwner.forStore(localFs) eq PosixCommitOwner)
    // a scheme with no atomic put-if-absent must refuse, not silently
    // degrade to check-then-write
    val rawS3Like = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "s3a"
    }
    val err = intercept[IllegalArgumentException](
      CommitOwner.forStore(rawS3Like))
    assert(err.getMessage.contains("ExternalCasCommitOwner"),
      err.getMessage)
  }

  test("no java.nio/java.io.File escapes into the store layer") {
    val storeLayer = Seq(
      "src/main/scala/graft/sources/TxStore.scala",
      "src/main/scala/graft/sources/TxLogTable.scala",
      "src/main/scala/graft/sources/TxLogV2.scala",
      "src/main/scala/graft/sources/TxLogCatalog.scala",
      "src/main/scala/graft/sources/TxLogSource.scala",
      "src/main/scala/graft/sources/TxLogStream.scala")
    storeLayer.foreach { f =>
      val body = new String(Files.readAllBytes(Paths.get(f)), "UTF-8")
      assert(!body.contains("java.nio.file") &&
        !body.contains("java.io.File(") && !body.contains("new File("),
        s"$f must route all IO through org.apache.hadoop.fs.FileSystem")
    }
    // CommitOwner.scala may use java.nio ONLY inside the documented
    // posix-scoped components (PosixCommitOwner, LocalObjectStoreOps,
    // FileCasRegistry); the generic protocol classes must not
    val owner = new String(Files.readAllBytes(
      Paths.get("src/main/scala/graft/sources/CommitOwner.scala")), "UTF-8")
    val generic = owner.substring(
      owner.indexOf("class ExternalCasCommitOwner"))
    assert(!generic.contains("java.nio.file"),
      "the CAS protocol itself must be store-agnostic")
  }
}
