package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The object-store commit-owner seam, end to end over a scheme with
  * NO atomic publish primitive ([[MockS3FileSystem]], `mocks3://` →
  * RawLocalFileSystem): reads need no owner at all (lazy resolution —
  * a pure SELECT of an object-store table must just work), commits
  * with no owner fail LOUDLY with the conf advice, and setting
  * `spark.graft.txlog.commitOwner=external-cas` (+ registry dir)
  * injects a [[FileCasRegistry]]-backed [[ExternalCasCommitOwner]]
  * into every surface that constructs tables internally —
  * `format("txlog")` save/load, SQL DML through [[plans.GraftSql]]
  * (MERGE / OPTIMIZE / time travel), and the persistent `graft`
  * catalog (CREATE / INSERT / SELECT) — with no owner object threaded
  * anywhere by the caller.
  */
class ObjectStoreOwnerSpec extends SparkSpec {

  private def mockRoot(tag: String): String = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mocks3.impl", classOf[MockS3FileSystem].getName)
    s"mocks3://${Files.createTempDirectory(s"mocks3_$tag")}"
  }

  private def withCasConf[A](f: => A): A = {
    val reg = Files.createTempDirectory("casreg")
    spark.conf.set(CommitOwner.ConfKey, "external-cas")
    spark.conf.set(CommitOwner.RegistryDirKey, reg.toString)
    try f
    finally {
      spark.conf.unset(CommitOwner.ConfKey)
      spark.conf.unset(CommitOwner.RegistryDirKey)
    }
  }

  test("reads need NO owner; an owner-less commit is loud with conf advice") {
    val root = mockRoot("reads")
    import spark.implicits._
    val df = (1L to 20L).map(k => (k, s"v$k")).toDF("k", "tag")
    withCasConf { df.write.format("txlog").mode("append").save(root) }

    // conf now UNSET: snapshot read, pruned read, time travel — all
    // green with no commit primitive resolvable for mocks3://
    val t = new TxLogTable(spark, root)
    assert(t.read().count() === 20L)
    assert(t.readWhere(col("k") === 7L).collect().head.getString(1) === "v7")
    assert(t.readAt(t.currentVersion).count() === 20L)
    assert(spark.read.format("txlog").load(root).count() === 20L)

    // …but the first COMMIT attempt without an owner names the seam
    val e = intercept[IllegalArgumentException] {
      t.append(df.limit(1))
    }
    assert(e.getMessage.contains("mocks3"), e.getMessage)
    assert(e.getMessage.contains(CommitOwner.ConfKey), e.getMessage)
    // a typo'd owner value must not silently degrade to read-only
    spark.conf.set(CommitOwner.ConfKey, "dynamo")
    try {
      val e2 = intercept[IllegalArgumentException] {
        new TxLogTable(spark, root).append(df.limit(1))
      }
      assert(e2.getMessage.contains("dynamo"), e2.getMessage)
    } finally spark.conf.unset(CommitOwner.ConfKey)
  }

  test("format(txlog) + SQL DML on mocks3:// with a conf-injected CAS owner") {
    val root = mockRoot("dml")
    import spark.implicits._
    withCasConf {
      Seq((1L, "ann", 10.0), (2L, "bob", 20.0)).toDF("id", "name", "score")
        .write.format("txlog").mode("append").save(root)
      Seq((3L, "cal", 30.0)).toDF("id", "name", "score")
        .write.format("txlog").mode("append").save(root)
      assert(spark.read.format("txlog").load(root).count() === 3L)

      // MERGE through the SQL-DML layer (read-modify-write commit)
      Seq((2L, "bobby", 25.0), (4L, "dee", 40.0))
        .toDF("id", "name", "score").createOrReplaceTempView("mocks3_upd")
      graft.plans.GraftSql.sql(spark,
        s"""MERGE INTO txlog.`$root` t USING mocks3_upd s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      assert(spark.read.format("txlog").load(root)
        .orderBy("id").select("name").as[String].collect().toSeq ===
        Seq("ann", "bobby", "cal", "dee"))

      // OPTIMIZE compacts through the same staged-commit protocol
      graft.plans.GraftSql.sql(spark,
        s"OPTIMIZE txlog.`$root` INTO 1 FILES").collect()
      assert(spark.read.format("txlog").load(root).count() === 4L)

      // time travel still resolves pre-merge state on the mock store
      assert(graft.plans.GraftSql.sql(spark,
        s"SELECT count(*) AS n FROM txlog.`$root` VERSION AS OF 2")
        .collect().head.getLong(0) === 3L)
    }
  }

  test("streaming toTable over mocks3:// commits through the CAS owner") {
    val root = mockRoot("stream")
    val cat = s"mockstr${scala.util.Random.nextInt(1000000)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val src = Files.createTempDirectory("mocks3_src").toString
    val ck = Files.createTempDirectory("mocks3_ck").toString
    import spark.implicits._
    withCasConf {
      spark.sql(s"CREATE TABLE $cat.sink (k BIGINT, tag STRING) USING txlog")
      Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
        .coalesce(1).write.parquet(s"$src/f0")
      def run(): Unit = {
        val q = spark.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("tag",
              org.apache.spark.sql.types.StringType, nullable = true))))
          .option("maxFilesPerTrigger", 1).parquet(src + "/*")
          .writeStream.option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(s"$cat.sink")
        q.awaitTermination(120000)
        q.exception.foreach(e => fail(s"stream failed: ${e.cause}", e))
      }
      run()
      val t = new TxLogTable(spark, s"$root/sink")
      assert(t.read().count() === 2L)
      assert(t.marker(TxLogStream.SinkBatchMarker) === Some("0"))
      // kill-and-resume on the mock store: nothing re-lands
      run()
      assert(t.read().count() === 2L)
    }
    // and the landed table reads with NO owner configured
    assert(spark.sql(s"SELECT count(*) FROM $cat.sink")
      .collect().head.getLong(0) === 2L)
  }

  test("the persistent catalog lives on mocks3:// with the conf owner") {
    val root = mockRoot("cat")
    val cat = s"mocklake${scala.util.Random.nextInt(1000000)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    withCasConf {
      spark.sql(s"CREATE TABLE $cat.ev (k BIGINT, tag STRING) USING txlog")
      spark.sql(s"INSERT INTO $cat.ev VALUES (1, 'a'), (2, 'b')")
      // catalog INSERT runs the NATIVE V2 staged write on the mock
      // store (BATCH_WRITE capability) — executor staged files,
      // task-commit renames, CAS manifest publish
      spark.sql(s"INSERT INTO $cat.ev VALUES (3, 'c')")
      assert(spark.sql(s"SELECT sum(k) FROM $cat.ev")
        .collect().head.getLong(0) === 6L)
      import spark.implicits._
      Seq((3L, "cc"), (4L, "d")).toDF("k", "tag")
        .createOrReplaceTempView("mockcat_upd")
      graft.plans.GraftSql.sql(spark,
        s"""MERGE INTO $cat.ev t USING mockcat_upd s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      assert(spark.sql(s"SELECT tag FROM $cat.ev ORDER BY k")
        .as[String].collect().toSeq === Seq("a", "b", "cc", "d"))
    }
    // reads keep working with the owner conf GONE
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev")
      .collect().head.getLong(0) === 4L)
  }
}
