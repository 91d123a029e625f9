package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Dialect-specific body of the staged atomic table swap — the single
  * seam a new database port touches. Each dialect emits the statements
  * that, run inside ONE transaction, replace `target` with `staging`:
  *
  *  - Derby has transactional DDL but no `DROP TABLE IF EXISTS`, so the
  *    DROP is marked may-fail (statement-level failure does not poison
  *    a Derby transaction) and the rename is `RENAME TABLE`.
  *  - Postgres also has transactional DDL but ANY failed statement
  *    aborts the open transaction (SQLSTATE 25P02) — so the DROP must
  *    be the never-failing `DROP TABLE IF EXISTS` form and nothing is
  *    marked may-fail; the rename is `ALTER TABLE … RENAME TO` (plain
  *    `RENAME TABLE` is not Postgres syntax, and RENAME TO takes the
  *    bare new name, not a qualified one).
  *
  * Identifiers ride UNQUOTED by policy: Spark's `DataFrameWriter.jdbc`
  * interpolates the caller's table name into `CREATE TABLE` unquoted,
  * so the database case-folds it (Derby → upper, Postgres → lower);
  * quoting here would make the swap look for a different, case-exact
  * name than the one the writer created. [[JdbcSwapDialect.validIdent]]
  * rejects names that need quoting before any SQL is built.
  */
sealed trait JdbcSwapDialect {
  def name: String

  /** (sql, mayFail): statements for one transaction; a `mayFail`
    * statement's SQLException is swallowed (dialects set it only where
    * a failed statement cannot poison the transaction).
    */
  def swapStatements(staging: String, target: String): Seq[(String, Boolean)]
}

object JdbcSwapDialect {

  case object Derby extends JdbcSwapDialect {
    val name = "derby"
    def swapStatements(staging: String, target: String): Seq[(String, Boolean)] =
      Seq(
        (s"DROP TABLE $target", true), // absent target: statement fails, txn survives
        (s"RENAME TABLE $staging TO $target", false))
  }

  case object Postgres extends JdbcSwapDialect {
    val name = "postgresql"
    def swapStatements(staging: String, target: String): Seq[(String, Boolean)] =
      Seq(
        (s"DROP TABLE IF EXISTS $target", false), // never fails → never aborts the txn
        (s"ALTER TABLE $staging RENAME TO $target", false))
  }

  /** Dispatch on the JDBC URL scheme; unknown schemes fail fast naming
    * this seam rather than running a wrong-dialect swap.
    */
  def forUrl(url: String): JdbcSwapDialect =
    if (url.startsWith("jdbc:derby:")) Derby
    else if (url.startsWith("jdbc:postgresql:")) Postgres
    else throw new IllegalArgumentException(
      s"no swap dialect for '$url' — add a JdbcSwapDialect (the single " +
        "place the staged atomic overwrite touches a database's DDL)")

  /** Unquoted-identifier policy gate (see trait scaladoc): plain
    * `[A-Za-z_][A-Za-z0-9_]*` only — anything else would need quoting,
    * which the unquoted CREATE path's case folding can't meet.
    */
  def validIdent(ident: String): Boolean =
    ident.nonEmpty && ident.length <= 96 &&
      (ident.head.isLetter || ident.head == '_') &&
      ident.forall(c => c.isLetterOrDigit || c == '_')
}

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
  * to a run-unique staging TABLE, then swap old→new in ONE transaction
  * via the [[JdbcSwapDialect]] for this URL — DDL is transactional on
  * both supported dialects, so readers see old-or-new, never half.
  *
  * Concurrency contract: the run-unique staging name means two
  * concurrent writers can no longer clobber each other's staging
  * table, but the final swap is still last-commit-wins on the TARGET —
  * callers needing stronger coordination must serialize writers per
  * table (the reference does: one DAG owns each table).
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
  require(JdbcSwapDialect.validIdent(table),
    s"table name '$table' is not a plain unquoted identifier (see " +
      "JdbcSwapDialect: the staged swap rides unquoted DDL by policy)")

  def read(): DataFrame = spark.read.jdbc(url, table, props)

  def exists: Boolean = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      // getTables patterns treat _ and % as LIKE wildcards, so t_name
      // can false-positive match tXname. Escape when the driver offers
      // an escape string (Postgres: backslash) — but Derby returns ""
      // (no metadata escape at all), so the pattern alone can never be
      // trusted: the authoritative check is exact TABLE_NAME equality
      // over whatever rows the (possibly wildcarded) pattern returns.
      val esc = md.getSearchStringEscape
      def pat(t: String): String =
        if (esc == null || esc.isEmpty) t
        else t.replace(esc, esc + esc).replace("_", esc + "_")
          .replace("%", esc + "%")
      // unquoted identifiers fold per-database (Derby: upper, Postgres:
      // lower) — probe the folded forms rather than assuming one
      Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
        val rs = md.getTables(null, null, pat(t), Array("TABLE"))
        try {
          var found = false
          while (!found && rs.next()) found = rs.getString("TABLE_NAME") == t
          found
        } finally rs.close()
      }
    } finally conn.close()
  }

  /** S8: plain append (micro-batch inserts). */
  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).options(writeOptions).jdbc(url, table, props)

  /** Staged atomic overwrite: stage table → one-transaction swap via
    * the URL's [[JdbcSwapDialect]]. The staging write may lazily READ
    * from `table` (merge results do); the target is untouched until the
    * staging table is complete. On swap failure the staging table is
    * best-effort dropped so retries don't accumulate orphans.
    */
  def overwriteAtomic(df: DataFrame): Unit = {
    val dialect = JdbcSwapDialect.forUrl(url)
    // run-unique suffix: concurrent writers never share a staging table
    val staging =
      s"${table}_stg_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.Overwrite).options(writeOptions)
      .jdbc(url, staging, props)
    val conn = DriverManager.getConnection(url, props)
    try {
      try JdbcTable.runSwap(conn, dialect, staging, table)
      catch {
        case e: Throwable =>
          dropQuietly(conn, staging)
          throw e
      }
    } finally conn.close()
  }

  private def dropQuietly(conn: Connection, t: String): Unit = {
    try {
      conn.setAutoCommit(true)
      val st = conn.createStatement()
      try st.execute(s"DROP TABLE $t")
      finally st.close()
    } catch { case _: Throwable => () }
  }
}

object JdbcTable {

  /** The one-transaction staged swap, factored so the spec can drive a
    * dialect's statements through a connection with THAT database's
    * transaction semantics (the PG arm is exercised against an
    * embedded PG-semantics connection: any failed statement poisons
    * the transaction — the exact property [[JdbcSwapDialect.Postgres]]
    * exists to survive). `mayFail` statements swallow their own
    * SQLException; whether the transaction survives that failure is
    * the DIALECT's bet, which this method does not paper over.
    */
  private[sources] def runSwap(conn: java.sql.Connection,
      dialect: JdbcSwapDialect, staging: String, target: String): Unit = {
    conn.setAutoCommit(false)
    val st = conn.createStatement()
    try {
      dialect.swapStatements(staging, target).foreach { case (sql, mayFail) =>
        if (mayFail)
          try st.execute(sql) catch { case _: java.sql.SQLException => () }
        else st.execute(sql)
      }
      conn.commit()
    } catch {
      case e: Throwable =>
        conn.rollback()
        throw e
    } finally st.close()
  }
}
