package graft.sources

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Upsert

/** Mock-JDBC round trip over embedded Derby (on Spark's own classpath):
  * proves the reference's Postgres-shaped flows — scan with pushdown,
  * append, staged-overwrite upsert — run over a real JDBC source, with
  * semantics equal to the ParquetTable path the engine uses offline.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val work = {
    val dir = Files.createTempDirectory("jdbc").toString
    // keep derby.log out of the repo cwd
    System.setProperty("derby.system.home", dir)
    dir
  }
  private lazy val url = s"jdbc:derby:$work/db;create=true"
  private val props = new Properties
  private val varcharNames = Map(
    "createTableColumnTypes" -> "name VARCHAR(64)")

  test("write → read round-trip; predicate pushdown reaches the JDBC scan") {
    val df = Seq((1L, "alpha", 10.5), (2L, "bravo", 20.5), (3L, "carol", 30.5))
      .toDF("id", "name", "score")
    df.write.options(varcharNames).jdbc(url, "t_round", props)

    val back = spark.read.jdbc(url, "t_round", props)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "alpha", 10.5), (2L, "bravo", 20.5), (3L, "carol", 30.5)))

    // the filter must become a WHERE clause server-side, not a client
    // filter over a full pull — the non-negotiable on a real database
    val q = back.filter(col("id") > 1).select("id", "name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(id,1)") || plan.contains("id > 1"), plan)
    // column pruning: score must not be in the JDBC ReadSchema
    assert(plan.contains("ReadSchema") && !plan.contains("score"), plan)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("upsert over JDBC ≡ upsert over Parquet; staged overwrite swaps atomically") {
    val target = Seq((1L, "keep", 100L), (2L, "old", 100L))
      .toDF("id", "name", "updated")
    val batch = Seq((2L, "new", 200L), (3L, "ins", 200L))
      .toDF("id", "name", "updated")

    // parquet leg (the engine's long-verified path)
    val pqRoot = s"$work/pq_target"
    target.write.parquet(pqRoot)
    val viaParquet = Upsert.mergeByKey(
      spark.read.parquet(pqRoot), batch, Seq("id"),
      Seq(col("updated").desc)).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // jdbc leg: same merge over a JDBC scan, staged-overwrite write-back
    val jt = new JdbcTable(spark, url, "t_upsert", props, varcharNames)
    target.write.options(varcharNames).jdbc(url, "t_upsert", props)
    val merged = Upsert.mergeByKey(
      jt.read(), batch, Seq("id"), Seq(col("updated").desc))
    jt.overwriteAtomic(merged)
    val viaJdbc = jt.read().collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    assert(viaJdbc == viaParquet)
    assert(viaJdbc == Set((1L, "keep", 100L), (2L, "new", 200L), (3L, "ins", 200L)))

    // idempotent replay, the T2 discipline: same batch again, same state
    jt.overwriteAtomic(Upsert.mergeByKey(
      jt.read(), batch, Seq("id"), Seq(col("updated").desc)))
    assert(jt.read().count() == 3)
    // no staging table may linger after the swaps (names are run-unique
    // now — list by pattern instead of probing one fixed name; Derby
    // has no metadata escape, so over-match and filter exactly)
    assert(tablesLike("%STG%").filter(_.contains("_STG_")).isEmpty)
    assert(jt.exists)
  }

  private def tablesLike(pattern: String): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, null, pattern, Array("TABLE"))
      val out = Seq.newBuilder[String]
      try { while (rs.next()) out += rs.getString("TABLE_NAME") }
      finally rs.close()
      out.result()
    } finally conn.close()
  }

  test("exists() never wildcard-matches: t_x must not match tYx") {
    // the raw probe pattern 'tzroun_' WOULD match table tzround (_ is
    // any-one-char in getTables patterns, and Derby offers no escape) —
    // exists() must reject it by exact-name comparison of the results
    Seq((1L, "w")).toDF("id", "name").write.options(varcharNames)
      .jdbc(url, "tzround", props)
    assert(!new JdbcTable(spark, url, "tzroun_", props).exists)
    assert(!new JdbcTable(spark, url, "t_round2", props).exists)
    assert(new JdbcTable(spark, url, "tzround", props).exists)
  }

  test("swap dialect seam: Postgres body is IF-EXISTS + ALTER RENAME, never may-fail") {
    import graft.sources.JdbcSwapDialect
    val pg = JdbcSwapDialect.forUrl("jdbc:postgresql://db/prices")
    assert(pg == JdbcSwapDialect.Postgres)
    assert(pg.swapStatements("sales_stg_ab12", "sales") == Seq(
      ("DROP TABLE IF EXISTS sales", false), // failed stmt would abort a PG txn (25P02)
      ("ALTER TABLE sales_stg_ab12 RENAME TO sales", false)))
    val derby = JdbcSwapDialect.forUrl(url)
    assert(derby == JdbcSwapDialect.Derby)
    assert(derby.swapStatements("s", "t").map(_._1) ==
      Seq("DROP TABLE t", "RENAME TABLE s TO t"))
    // only the Derby DROP may fail inside its txn
    assert(derby.swapStatements("s", "t").map(_._2) == Seq(true, false))
    intercept[IllegalArgumentException] {
      JdbcSwapDialect.forUrl("jdbc:mysql://db/x")
    }
    // unquoted-identifier policy gate
    intercept[IllegalArgumentException] {
      new JdbcTable(spark, url, "bad-name;drop", props)
    }
  }

  test("insert-ignore parity: existing keys never overwritten through JDBC") {
    val jt = new JdbcTable(spark, url, "t_ins", props, varcharNames)
    Seq((1L, "orig", 1L)).toDF("id", "name", "updated")
      .write.options(varcharNames).jdbc(url, "t_ins", props)
    val batch = Seq((1L, "clobber", 9L), (2L, "fresh", 9L))
      .toDF("id", "name", "updated")
    jt.overwriteAtomic(Upsert.insertIgnore(jt.read(), batch, Seq("id")))
    val out = jt.read().collect().map(r =>
      (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "orig", 2L -> "fresh")) // 1 kept, 2 inserted
  }
}
