package graft.sources

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, SQLException, Statement}

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[JdbcSwapDialect.Postgres]] END-TO-END through an embedded
  * connection that enforces POSTGRES TRANSACTION SEMANTICS — the
  * property the dialect split exists for: any failed statement aborts
  * the open transaction (SQLSTATE 25P02, "current transaction is
  * aborted, commands ignored"), so Derby's may-fail DROP pattern is
  * fatal on PG even though the exception is swallowed client-side.
  * No PG server exists in this environment (and no PG-mode embedded
  * engine is on the dependency-frozen classpath), so the semantics are
  * implemented here from the documented behavior and the REAL swap
  * code ([[JdbcTable.runSwap]]) runs against them — statement
  * interpretation, transaction poisoning, commit/rollback, and PG's
  * lower-case identifier folding all behave as the server would.
  */
class PgSwapSpec extends AnyFunSuite {

  /** Minimal PG-semantics catalog: tables + transactional DDL with
    * statement-failure poisoning.
    */
  private final class PgLite {
    val tables = scala.collection.mutable.Set.empty[String]
    private var snapshot: Set[String] = Set.empty
    private var inTxn = false
    var aborted = false
    val log = scala.collection.mutable.Buffer.empty[String]

    def begin(): Unit = { snapshot = tables.toSet; inTxn = true; aborted = false }

    def exec(sql0: String): Unit = {
      log += sql0
      if (!inTxn) begin()
      if (aborted)
        throw new SQLException("current transaction is aborted, commands " +
          "ignored until end of transaction block", "25P02")
      try interpret(sql0.trim)
      catch { case e: SQLException => aborted = true; throw e }
    }

    def commit(): Unit = {
      // PG turns COMMIT of an aborted txn into ROLLBACK
      if (aborted) { tables.clear(); tables ++= snapshot }
      inTxn = false; aborted = false
    }

    def rollback(): Unit = {
      tables.clear(); tables ++= snapshot
      inTxn = false; aborted = false
    }

    private val dropIf = "(?i)DROP TABLE IF EXISTS (\\S+)".r
    private val drop = "(?i)DROP TABLE (\\S+)".r
    private val alterRename = "(?i)ALTER TABLE (\\S+) RENAME TO (\\S+)".r

    private def fold(ident: String) = ident.toLowerCase // PG unquoted fold

    private def interpret(sql: String): Unit = sql match {
      case dropIf(t) =>
        tables -= fold(t); ()
      case alterRename(a, b) =>
        if (!tables.contains(fold(a)))
          throw new SQLException(s"""relation "${fold(a)}" does not exist""", "42P01")
        if (tables.contains(fold(b)))
          throw new SQLException(s"""relation "${fold(b)}" already exists""", "42P07")
        tables -= fold(a); tables += fold(b); ()
      case drop(t) =>
        if (!tables.contains(fold(t)))
          throw new SQLException(s"""table "${fold(t)}" does not exist""", "42P01")
        tables -= fold(t); ()
      case other =>
        // RENAME TABLE (Derby syntax) and anything else: not PG
        throw new SQLException(s"syntax error at or near " +
          s""""${other.split("\\s+").headOption.getOrElse("?")}"""", "42601")
    }
  }

  /** java.sql.Connection/Statement over [[PgLite]] via dynamic proxy —
    * only the members the swap path touches are live.
    */
  private def connectionOf(pg: PgLite): Connection = {
    val stmtHandler = new InvocationHandler {
      def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "execute" => pg.exec(args(0).asInstanceOf[String]); java.lang.Boolean.FALSE
          case "close" => null
          case _ => throw new UnsupportedOperationException(m.getName)
        }
    }
    val connHandler = new InvocationHandler {
      def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "createStatement" => Proxy.newProxyInstance(
            getClass.getClassLoader, Array(classOf[Statement]), stmtHandler)
          case "setAutoCommit" =>
            if (args(0) == java.lang.Boolean.FALSE) pg.begin(); null
          case "commit" => pg.commit(); null
          case "rollback" => pg.rollback(); null
          case "close" => null
          case _ => throw new UnsupportedOperationException(m.getName)
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), connHandler).asInstanceOf[Connection]
  }

  test("PG swap replaces an existing target in one transaction") {
    val pg = new PgLite
    pg.tables ++= Seq("price_paid", "price_paid_stg_1")
    JdbcTable.runSwap(connectionOf(pg), JdbcSwapDialect.Postgres,
      "price_paid_stg_1", "price_paid")
    assert(pg.tables.toSet == Set("price_paid"))
    assert(pg.log.head.toUpperCase.startsWith("DROP TABLE IF EXISTS"))
  }

  test("PG swap with NO pre-existing target succeeds (IF EXISTS form)") {
    val pg = new PgLite
    pg.tables += "t_stg_2"
    JdbcTable.runSwap(connectionOf(pg), JdbcSwapDialect.Postgres, "t_stg_2", "t")
    assert(pg.tables.toSet == Set("t"))
  }

  test("Derby's statements under PG semantics abort the transaction " +
    "(why the dialect split is load-bearing)") {
    val pg = new PgLite
    pg.tables += "t_stg_3" // no target: Derby's plain DROP fails
    val e = intercept[SQLException](
      JdbcTable.runSwap(connectionOf(pg), JdbcSwapDialect.Derby, "t_stg_3", "t"))
    // the DROP's own failure was swallowed (mayFail) — what surfaces is
    // PG's poisoned-transaction error on the rename that followed
    assert(e.getSQLState == "25P02")
    // rollback restored the catalog: staging still present, no target
    assert(pg.tables.toSet == Set("t_stg_3"))
  }

  test("mid-swap failure rolls back: catalog unchanged") {
    val pg = new PgLite
    // staging missing entirely → ALTER fails (42P01) → rollback
    pg.tables += "victim"
    val e = intercept[SQLException](
      JdbcTable.runSwap(connectionOf(pg), JdbcSwapDialect.Postgres,
        "ghost_stg", "victim"))
    assert(e.getSQLState == "42P01")
    // the IF EXISTS drop of `victim` happened inside the txn — rollback
    // must bring it back (transactional DDL, the property the staged
    // swap relies on)
    assert(pg.tables.toSet == Set("victim"))
  }

  test("PG folds unquoted identifiers to lower case through the swap") {
    val pg = new PgLite
    pg.tables ++= Seq("mixed", "mixed_stg")
    JdbcTable.runSwap(connectionOf(pg), JdbcSwapDialect.Postgres,
      "MIXED_STG", "Mixed")
    assert(pg.tables.toSet == Set("mixed"))
  }
}
