package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC-backed table with the same sink semantics as [[ParquetTable]] —
  * the reference's actual store is Postgres (the price-paid DAGs write
  * through a JDBC hook: `dags/initial_price_paid_data.py:53-94`,
  * `dags/monthly_price_paid_data.py:140-160`); this class proves the
  * engine's upsert flows run unchanged over `spark.read.jdbc` /
  * `DataFrame.write.jdbc`, with predicate pushdown reaching the
  * database (the JDBC scan advertises PushedFilters, so a watermark or
  * key filter becomes a WHERE clause server-side instead of a full
  * table pull — the non-negotiable at any real table size).
  *
  * Overwrite is staged like ParquetTable's: write the post-merge state
  * to a staging TABLE, then DROP old + RENAME staging in ONE
  * transaction — Derby DDL is transactional, so readers see old-or-new,
  * never half. The swap STATEMENTS are Derby dialect: a Postgres target
  * needs `DROP TABLE IF EXISTS` + `ALTER TABLE … RENAME TO` (plain
  * `RENAME TABLE` is not Postgres syntax, and a failed statement inside
  * an open Postgres transaction aborts it — 25P02 — so the
  * ignore-the-DROP pattern below is Derby-only too), lower-cased
  * unquoted identifiers, and ideally a server-side `INSERT … ON
  * CONFLICT`/MERGE instead of the read-merge-swap. Every caller goes
  * through [[overwriteAtomic]], so that swap body is the single place a
  * dialect port touches.
  *
  * @param writeOptions extra writer options — pass
  *   `createTableColumnTypes` to pin VARCHAR widths (Spark's Derby/
  *   Postgres dialects default StringType to CLOB/TEXT, which can't be
  *   compared or indexed efficiently).
  */
final class JdbcTable(
    spark: SparkSession,
    url: String,
    table: String,
    props: Properties = new Properties,
    writeOptions: Map[String, String] = Map.empty) {

  def read(): DataFrame = spark.read.jdbc(url, table, props)

  def exists: Boolean = {
    val conn = DriverManager.getConnection(url, props)
    try {
      // unquoted identifiers fold per-database (Derby: upper, Postgres:
      // lower) — probe the folded forms rather than assuming one
      Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
        val rs = conn.getMetaData.getTables(null, null, t, Array("TABLE"))
        try rs.next() finally rs.close()
      }
    } finally conn.close()
  }

  /** S8: plain append (micro-batch inserts). */
  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).options(writeOptions).jdbc(url, table, props)

  /** Staged atomic overwrite: stage table → transactional drop+rename.
    * The staging write may lazily READ from `table` (merge results do);
    * the target is untouched until the staging table is complete.
    */
  def overwriteAtomic(df: DataFrame): Unit = {
    val staging = s"${table}_staging"
    df.write.mode(SaveMode.Overwrite).options(writeOptions)
      .jdbc(url, staging, props)
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        // statement-level failure (absent table) doesn't poison the txn
        try st.execute(s"DROP TABLE $table")
        catch { case _: java.sql.SQLException => () }
        st.execute(s"RENAME TABLE $staging TO $table")
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }
}
