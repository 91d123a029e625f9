package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{TxLogCatalog, TxLogTable}

/** SHOW PARTITIONS + DESCRIBE DETAIL clustering info on PARTITIONED
  * txlog tables — answered from the manifest census (zero file
  * opens) when the layout censuses, with a real distinct scan as the
  * straggler fallback; non-txlog targets keep Spark's native SHOW
  * PARTITIONS; non-partitioned txlog tables reject loudly.
  */
class ShowPartitionsSpec extends SparkSpec {

  test("partition census from the manifest; detail carries clustering") {
    val cat = s"sp${scala.util.Random.nextInt(1000000)}"
    val root = Files.createTempDirectory("txsp").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.ev (grp BIGINT, k BIGINT) USING txlog " +
      "PARTITIONED BY (grp)")
    import spark.implicits._
    (0L until 30L).map(i => (i % 3, i)).toDF("grp", "k")
      .writeTo(s"$cat.ev").append()

    val parts = GraftSql.sql(spark, s"SHOW PARTITIONS $cat.ev")
      .collect().map(_.getString(0)).toSeq
    assert(parts === Seq("grp=0", "grp=1", "grp=2"))

    val det = GraftSql.sql(spark, s"DESCRIBE DETAIL $cat.ev")
      .collect().head
    assert(det.getAs[String]("clustering") === "grp")
    assert(det.getAs[Long]("num_partitions") === 3L)

    // straggler fallback: a stats-less V1 append breaks the census —
    // SHOW PARTITIONS falls back to a distinct scan, same values +
    // the new partition
    new TxLogTable(spark, s"$root/ev")
      .append(Seq((7L, 999L)).toDF("grp", "k").coalesce(1))
    val parts2 = GraftSql.sql(spark, s"SHOW PARTITIONS $cat.ev")
      .collect().map(_.getString(0)).toSeq
    assert(parts2 === Seq("grp=0", "grp=1", "grp=2", "grp=7"))

    // non-partitioned txlog table rejects loudly
    spark.sql(s"CREATE TABLE $cat.flat (k BIGINT) USING txlog")
    val e = intercept[UnsupportedOperationException] {
      GraftSql.sql(spark, s"SHOW PARTITIONS $cat.flat").collect()
    }
    assert(e.getMessage.contains("not") &&
      e.getMessage.contains("partitioned"), e.getMessage)

    // DATE partition values print as date LITERALS (Spark/Hive
    // output), never the epoch-day stat encoding; a NULL partition in
    // the straggler fallback prints the hive default token
    spark.sql(s"CREATE TABLE $cat.dated (d DATE, k BIGINT) USING txlog " +
      "PARTITIONED BY (d)")
    Seq(("2024-03-01", 1L), ("2024-03-02", 2L))
      .toDF("ds", "k").selectExpr("CAST(ds AS DATE) AS d", "k")
      .writeTo(s"$cat.dated").append()
    val dparts = GraftSql.sql(spark, s"SHOW PARTITIONS $cat.dated")
      .collect().map(_.getString(0)).toSeq
    assert(dparts === Seq("d=2024-03-01", "d=2024-03-02"), dparts)
    new TxLogTable(spark, s"$root/dated")
      .append(Seq((null: String, 9L)).toDF("ds", "k")
        .selectExpr("CAST(ds AS DATE) AS d", "k").coalesce(1))
    val dparts2 = GraftSql.sql(spark, s"SHOW PARTITIONS $cat.dated")
      .collect().map(_.getString(0)).toSeq
    assert(dparts2 === Seq("d=2024-03-01", "d=2024-03-02",
      "d=__HIVE_DEFAULT_PARTITION__"), dparts2)
  }

  test("non-txlog targets keep Spark's native SHOW PARTITIONS") {
    val warehouse = Files.createTempDirectory("txsp_hive").toString
    spark.sql("DROP TABLE IF EXISTS sp_native_t")
    spark.sql("CREATE TABLE sp_native_t (k BIGINT, p BIGINT) " +
      s"USING parquet PARTITIONED BY (p) LOCATION '$warehouse/t'")
    spark.sql("INSERT INTO sp_native_t VALUES (1, 10), (2, 20)")
    try {
      val got = GraftSql.sql(spark, "SHOW PARTITIONS sp_native_t")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got === Seq("p=10", "p=20"))
    } finally spark.sql("DROP TABLE IF EXISTS sp_native_t")
  }
}
