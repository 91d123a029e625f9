package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persistent name catalog ([[TxLogCatalog]]): `catalog.ns.table`
  * names live as a directory tree, so they survive the session — a
  * NEW session (fresh session state, fresh catalog instance) pointed
  * at the same root resolves the same tables. Pinned: DDL/DML through
  * Spark's own V2 exec nodes (CREATE/CTAS/INSERT/SELECT/SHOW/DROP/
  * RENAME), MERGE by catalog-qualified name through the SQL-DML
  * layer, cross-session resolution, and identifier hygiene (a name
  * part can never escape the catalog root).
  */
class TxLogCatalogSpec extends SparkSpec {

  private def freshCatalog(name: String): String = {
    val root = Files.createTempDirectory(s"txcat_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[TxLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    root
  }

  test("CREATE / INSERT / SELECT / SHOW / DROP through the V2 catalog") {
    freshCatalog("lake1")
    spark.sql("CREATE NAMESPACE lake1.db")
    spark.sql("CREATE TABLE lake1.db.ev (k BIGINT, tag STRING) USING txlog")
    spark.sql("INSERT INTO lake1.db.ev VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO lake1.db.ev VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM lake1.db.ev").count() === 3L)
    assert(spark.sql("SHOW TABLES IN lake1.db").collect()
      .map(_.getString(1)).toSeq === Seq("ev"))
    // INSERT OVERWRITE resets the live set through the commit protocol
    spark.sql("INSERT OVERWRITE lake1.db.ev VALUES (9, 'z')")
    assert(spark.sql("SELECT k FROM lake1.db.ev").collect()
      .map(_.getLong(0)).toSeq === Seq(9L))
    // RENAME TO takes the new name relative to the table's catalog
    // (Spark passes it verbatim — no catalog qualifier)
    spark.sql("ALTER TABLE lake1.db.ev RENAME TO db.ev2")
    assert(spark.sql("SELECT * FROM lake1.db.ev2").count() === 1L)
    assert(spark.sql("DROP TABLE lake1.db.ev2").collect().isEmpty)
    assert(!spark.catalog.tableExists("lake1.db.ev2"))
  }

  test("CTAS lands data through the same commit path") {
    freshCatalog("lake2")
    import spark.implicits._
    (1L to 10L).map(k => (k, k * 2)).toDF("k", "v")
      .createOrReplaceTempView("txcat_src")
    spark.sql("CREATE TABLE lake2.agg USING txlog AS " +
      "SELECT k, v FROM txcat_src WHERE k <= 4")
    assert(spark.sql("SELECT sum(v) FROM lake2.agg").collect()
      .head.getLong(0) === 20L)
  }

  test("names survive the session: a NEW session resolves and MERGEs by name") {
    val root = freshCatalog("lake3")
    spark.sql("CREATE TABLE lake3.users (id BIGINT, name STRING) USING txlog")
    spark.sql("INSERT INTO lake3.users VALUES (1, 'ann'), (2, 'bob')")

    // a NEW session: fresh session state, fresh catalog INSTANCE —
    // only the directory tree carries the name across
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.lake3", classOf[TxLogCatalog].getName)
    s2.conf.set("spark.sql.catalog.lake3.root", root)
    assert(s2.sql("SELECT name FROM lake3.users ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("ann", "bob"))

    // MERGE by catalog-qualified name through the SQL-DML layer
    import s2.implicits._
    Seq((2L, "bobby"), (3L, "cal")).toDF("id", "name")
      .createOrReplaceTempView("txcat_upd")
    graft.plans.GraftSql.sql(s2,
      """MERGE INTO lake3.users t USING txcat_upd s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(s2.sql("SELECT name FROM lake3.users ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("ann", "bobby", "cal"))
    // time travel by NAME sees the pre-merge snapshot
    assert(graft.plans.GraftSql.sql(s2,
      "SELECT count(*) AS n FROM lake3.users VERSION AS OF 1")
      .collect().head.getLong(0) === 2L)
    // and the FIRST session observes the merge (same directory)
    assert(spark.sql("SELECT count(*) FROM lake3.users").collect()
      .head.getLong(0) === 3L)
  }

  test("identifier hygiene: a name part can never escape the root") {
    freshCatalog("lake4")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE lake4.`../evil` (k BIGINT) USING txlog")
    }
    assert(e.getMessage.contains("plain identifier"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM lake4.`a/b`")
    }
    assert(e2.getMessage.contains("plain identifier") ||
      e2.getMessage.toLowerCase.contains("table or view not found") ||
      e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"), e2.getMessage)
  }

  test("ALTER TABLE routes column changes to metadata-only evolution; maintenance SQL by name") {
    freshCatalog("lake6")
    spark.sql("CREATE TABLE lake6.t (k INT, v STRING) USING txlog")
    spark.sql("INSERT INTO lake6.t VALUES (1, 'a'), (2, 'b')")
    // RENAME COLUMN → TxLogTable.renameColumn (metadata-only)
    spark.sql("ALTER TABLE lake6.t RENAME COLUMN v TO label")
    assert(spark.sql("SELECT label FROM lake6.t ORDER BY k").collect()
      .map(_.getString(0)).toSeq === Seq("a", "b"))
    // ALTER COLUMN TYPE → TxLogTable.widenColumn (lossless widening)
    spark.sql("ALTER TABLE lake6.t ALTER COLUMN k TYPE BIGINT")
    assert(spark.sql("SELECT sum(k) FROM lake6.t").collect()
      .head.getLong(0) === 3L)
    // ADD COLUMN → TxLogTable.addColumn: metadata-only, nullable,
    // existing rows read null, new appends may fill it
    spark.sql("ALTER TABLE lake6.t ADD COLUMN extra STRING")
    assert(spark.sql("SELECT extra FROM lake6.t").collect()
      .forall(_.isNullAt(0)), "pre-existing rows must read null")
    spark.sql("INSERT INTO lake6.t VALUES (9, 'z', 'filled')")
    assert(spark.sql(
      "SELECT count(*) FROM lake6.t WHERE extra = 'filled'").collect()
      .head.getLong(0) === 1L)
    // narrowing and unsupported shapes fail loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE lake6.t ALTER COLUMN k TYPE INT")
    }
    // ADD COLUMN clauses the metadata-only commit cannot honor reject
    // loudly instead of producing a different schema than requested
    val posErr = intercept[Exception] {
      spark.sql("ALTER TABLE lake6.t ADD COLUMN early STRING FIRST")
    }
    assert(posErr.getMessage.contains("FIRST/AFTER"), posErr.getMessage)
    val cmtErr = intercept[Exception] {
      spark.sql("ALTER TABLE lake6.t ADD COLUMN noted STRING COMMENT 'x'")
    }
    assert(cmtErr.getMessage.contains("COMMENT"), cmtErr.getMessage)
    assert(!spark.table("lake6.t").columns.contains("early") &&
      !spark.table("lake6.t").columns.contains("noted"),
      "rejected ADD COLUMN must leave the schema untouched")
    // DROP COLUMN → TxLogTable.dropColumn: metadata-only, values of
    // the remaining columns untouched, IF EXISTS tolerated
    spark.sql("ALTER TABLE lake6.t ADD COLUMN doomed INT")
    spark.sql("ALTER TABLE lake6.t DROP COLUMN doomed")
    assert(!spark.table("lake6.t").columns.contains("doomed"))
    spark.sql("ALTER TABLE lake6.t DROP COLUMN IF EXISTS never_was")
    intercept[Exception] {
      spark.sql("ALTER TABLE lake6.t DROP COLUMN never_was")
    }
    assert(spark.sql("SELECT sum(k) FROM lake6.t").collect()
      .head.getLong(0) === 12L, "drops must not disturb surviving data")
    // maintenance statements accept catalog-qualified NAMES too
    import graft.plans.GraftSql
    spark.sql("INSERT INTO lake6.t VALUES (3, 'c', NULL)")
    assert(GraftSql.sql(spark, "DESCRIBE HISTORY lake6.t").count() >= 6L)
    GraftSql.sql(spark, "OPTIMIZE lake6.t INTO 1 FILES").collect()
    val det = GraftSql.sql(spark, "DESCRIBE DETAIL lake6.t").collect().head
    assert(det.getLong(1) === 1L, s"post-optimize file count: $det")
    GraftSql.sql(spark, "VACUUM lake6.t FULL RETAIN 0 HOURS").collect()
    assert(spark.sql("SELECT count(*) FROM lake6.t").collect()
      .head.getLong(0) === 4L)
    // an unresolvable name fails loudly, not as a path
    val e = intercept[Exception] {
      GraftSql.sql(spark, "DESCRIBE HISTORY lake6.nope").collect()
    }
    assert(e.getMessage.contains("does not resolve to a txlog table"),
      e.getMessage)
  }

  test("a foreign provider is rejected; namespaces list and drop") {
    freshCatalog("lake5")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE lake5.p (k BIGINT) USING parquet")
    }
    assert(e.getMessage.contains("txlog tables only"), e.getMessage)
    spark.sql("CREATE NAMESPACE lake5.ns1")
    spark.sql("CREATE TABLE lake5.ns1.t1 (k BIGINT) USING txlog")
    assert(spark.sql("SHOW NAMESPACES IN lake5").collect()
      .map(_.getString(0)).toSeq === Seq("ns1"))
    intercept[Exception] { // non-empty without CASCADE
      spark.sql("DROP NAMESPACE lake5.ns1")
    }
    spark.sql("DROP NAMESPACE lake5.ns1 CASCADE")
    assert(spark.sql("SHOW NAMESPACES IN lake5").collect().isEmpty)
  }

  test("writeTo: the native V2 BATCH_WRITE surface (append / overwrite / options)") {
    freshCatalog("lakew")
    spark.sql("CREATE NAMESPACE lakew.db")
    spark.sql("CREATE TABLE lakew.db.w (k BIGINT, v STRING) USING txlog")
    import spark.implicits._

    // the plan must be a native V2 append, not the V1 fallback
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    df1.writeTo("lakew.db.w").append()
    assert(spark.table("lakew.db.w").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // a second append accumulates (append, not replace)
    Seq((3L, "c")).toDF("k", "v").writeTo("lakew.db.w").append()
    assert(spark.table("lakew.db.w").count() === 3L)

    // overwritePartitions on an unpartitioned table replaces the snapshot
    Seq((9L, "z")).toDF("k", "v").writeTo("lakew.db.w").overwritePartitions()
    assert(spark.table("lakew.db.w").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((9L, "z")))

    // INSERT INTO rides the same staged-commit write and serializes
    spark.sql("INSERT INTO lakew.db.w VALUES (10, 'y')")
    assert(spark.table("lakew.db.w").count() === 2L)

    // time travel across the native commits still works by version
    val root = spark.conf.get("spark.sql.catalog.lakew.root")
    val t = new TxLogTable(spark, s"$root/db/w")
    assert(t.readAt(t.currentVersion - 2).count() === 3L,
      "the pre-overwrite snapshot must still be reachable")
  }

  test("writeTo options: statsCols sidecars collect and prune; sortCols orders rows") {
    freshCatalog("lakews")
    spark.sql("CREATE NAMESPACE lakews.db")
    spark.sql("CREATE TABLE lakews.db.s (k BIGINT, v BIGINT) USING txlog")
    import spark.implicits._
    // 4 shuffle partitions (SparkSpec) -> multiple staged part files
    (0L until 400L).map(k => (k, k * 3)).toDF("k", "v")
      .repartitionByRange(4, col("k"))
      .writeTo("lakews.db.s")
      .option("statsCols", "k").option("sortCols", "k")
      .append()
    val root = spark.conf.get("spark.sql.catalog.lakews.root")
    val t = new TxLogTable(spark, s"$root/db/s")
    // the manifest carries per-file ranges and a point read prunes
    val pruned = t.scanPathsAt(t.currentVersion, col("k") === 5L)
    val all = t.scanPathsAt(t.currentVersion, lit(true))
    assert(all.size >= 4, s"expected >=4 staged part files, got ${all.size}")
    assert(pruned.size < all.size,
      s"statsCols option must enable pruning: ${pruned.size}/${all.size}")
    // sortCols flowed through RequiresDistributionAndOrdering: each
    // staged file holds a contiguous sorted run
    all.foreach { f =>
      val ks = spark.read.parquet(f).select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"file $f is not sorted by k")
    }
    assert(spark.table("lakews.db.s").count() === 400L)
  }

  test("native writes enforce CHECK constraints; a violating batch commits nothing") {
    freshCatalog("lakewc")
    spark.sql("CREATE NAMESPACE lakewc.db")
    spark.sql("CREATE TABLE lakewc.db.c (k BIGINT, v BIGINT) USING txlog")
    import spark.implicits._
    Seq((1L, 5L)).toDF("k", "v").writeTo("lakewc.db.c").append()
    val root = spark.conf.get("spark.sql.catalog.lakewc.root")
    val t = new TxLogTable(spark, s"$root/db/c")
    t.addConstraint("v_pos", "v > 0")
    val before = t.currentVersion
    val err = intercept[Exception] {
      Seq((2L, -7L)).toDF("k", "v").writeTo("lakewc.db.c").append()
    }
    assert((err.getMessage + Option(err.getCause).fold("")(_.getMessage))
      .contains("v_pos") ||
      err.toString.contains("v_pos"), err.toString)
    assert(t.currentVersion === before,
      "a violating native write must commit nothing")
    assert(spark.table("lakewc.db.c").count() === 1L)
  }

  test("PARTITIONED BY = cluster-by metadata: file-constant layout, census, pruning") {
    freshCatalog("lakep")
    spark.sql("CREATE NAMESPACE lakep.db")
    spark.sql("CREATE TABLE lakep.db.p (grp BIGINT, k BIGINT, v BIGINT) " +
      "USING txlog PARTITIONED BY (grp)")
    import spark.implicits._
    // a deliberately SHUFFLED ingest: the write's required
    // distribution/ordering must reassemble the groups
    (0L until 300L).map(i => (i % 3L, i, i * 2L))
      .toDF("grp", "k", "v").repartition(4, col("k"))
      .writeTo("lakep.db.p").append()
    val root = spark.conf.get("spark.sql.catalog.lakep.root")
    val t = new TxLogTable(spark, s"$root/db/p")
    // every staged file is CONSTANT in grp
    val files = t.liveDataPaths(t.currentVersion)
    files.foreach { f =>
      val gs = spark.read.parquet(f).select("grp").distinct().collect()
      assert(gs.length === 1, s"file $f mixes groups")
    }
    assert(files.size >= 3, s"expected >=1 file per group, got $files")
    // GROUP BY the partition column answers from the manifest alone
    val census = spark.sql(
      "SELECT grp, count(*) AS n, min(k) AS mn, max(k) AS mx " +
        "FROM lakep.db.p GROUP BY grp")
    assert(census.queryExecution.executedPlan.toString
      .contains("LocalTableScan"), census.queryExecution.executedPlan)
    assert(census.orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 100L), (1L, 100L), (2L, 100L)))
    // a point predicate on the partition column prunes files
    spark.sql("SELECT sum(v) FROM lakep.db.p WHERE grp = 1")
      .collect()
    val (scanned, live) = TxLogV2.lastScan
    assert(scanned < live, s"grp predicate must prune: $scanned/$live")
    // dynamic partition overwrite rejects loudly (not expressible
    // dir-granularly; a silent full replace would be wrong semantics)
    val e = intercept[Exception] {
      Seq((1L, 9999L, 0L)).toDF("grp", "k", "v")
        .writeTo("lakep.db.p").overwritePartitions()
    }
    assert(e.getMessage.contains("dynamic partition overwrite"),
      e.getMessage)
    // non-identity transforms reject at CREATE
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE lakep.db.b (k BIGINT, ts TIMESTAMP) " +
        "USING txlog PARTITIONED BY (days(ts))")
    }
    assert(e2.getMessage.contains("identity columns"), e2.getMessage)
  }

  test("DROP then re-CREATE at the same root never serves the dropped " +
      "table's cached manifests") {
    freshCatalog("lakeinv")
    spark.sql("CREATE TABLE lakeinv.t (k BIGINT, tag STRING) USING txlog")
    spark.sql("INSERT INTO lakeinv.t VALUES (1, 'old'), (2, 'old')")
    // warm the JVM-wide manifest cache with the first lifetime
    assert(spark.sql("SELECT * FROM lakeinv.t").count() === 2L)
    spark.sql("DROP TABLE lakeinv.t")
    // second lifetime at the SAME root: different schema, fresh v0/v1
    spark.sql("CREATE TABLE lakeinv.t (k BIGINT, score DOUBLE) USING txlog")
    spark.sql("INSERT INTO lakeinv.t VALUES (7, 0.5)")
    val out = spark.sql("SELECT * FROM lakeinv.t").collect()
    assert(out.length === 1 && out.head.getLong(0) === 7L)
    assert(spark.sql("SELECT * FROM lakeinv.t").schema.fieldNames.toSeq ===
      Seq("k", "score"))
    // out-of-band recreation (another PROCESS drops and recreates, so
    // no in-JVM purge runs): a NEW table handle detects the stale
    // cache entry via the (modTime, length) store witness
    val root = Files.createTempDirectory("txinv_oob").toString
    val t1 = new TxLogTable(spark, root)
    t1.ensureExists(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT"))
    import spark.implicits._
    t1.append(Seq(1L, 2L, 3L).toDF("k"))
    assert(t1.read().count() === 3L) // warm cache for v0..v1
    // simulate the foreign recreate by rewriting version 1's manifest
    // file in place with version 0's (empty-table) content — different
    // length, different modTime, same path
    val hPath = (n: String) => new org.apache.hadoop.fs.Path(
      s"$root/_log/$n")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val v0Bytes = {
      val in = fs.open(hPath(f"${0L}%020d.json"))
      try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    }
    Thread.sleep(5) // distinct modTime for the rewritten manifest
    val out1 = fs.create(hPath(f"${1L}%020d.json"), true)
    try out1.write(v0Bytes) finally out1.close()
    // a FRESH handle must see the rewritten lifetime (empty), not the
    // cached 3-row v1
    val t2 = new TxLogTable(spark, root)
    assert(t2.read().count() === 0L,
      "stale cached manifest served after out-of-band recreation")
  }
}
