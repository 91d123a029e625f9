package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package-private bridge: Column ⇄ catalyst Expression conversion lives
  * behind `private[sql]` in Spark 4 (`classic.ExpressionUtils`); this
  * shim re-exports just the two conversions the engine's native
  * expressions need. Standard pattern for Spark extension libraries.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → catalyst conversion. [[expression]] returns a
    * lazy `ColumnNodeExpression` wrapper whose tree is opaque to
    * pattern matching; this converts through the session's node
    * converter so callers that INSPECT the tree (e.g. data-skipping
    * pruning) see real catalyst nodes (`UnresolvedFunction`,
    * `UnresolvedAttribute`, `Literal`).
    */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Look up a registered V2 catalog plugin by name — `CatalogManager`
    * is `private[sql]` in Spark 4. The SQL-DML layer uses it to route
    * MERGE/UPDATE/DELETE on `catalog.ns.table` identifiers whose head
    * names a [[graft.sources.TxLogCatalog]]. None when no such catalog
    * is registered (the statement then follows Spark's normal path).
    */
  def catalogPlugin(spark: org.apache.spark.sql.SparkSession,
      name: String): Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] =
    try Some(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.catalog(name))
    catch { case _: Exception => None }

  /** Execute a logical plan as a DataFrame — `Dataset.ofRows` is
    * `private[sql]` in Spark 4. The SQL-DML command layer
    * ([[graft.plans.GraftSqlParser]]) needs it to run a MERGE source
    * subquery plan and to hand rewritten statements back to the
    * session.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-plan a batch DataFrame's rows as a (non-)streaming frame —
    * `internalCreateDataFrame` is `private[sql]` in Spark 4. Streaming
    * V1 sources must hand `MicroBatchExecution` a plan flagged
    * `isStreaming=true` (the FileStreamSource/DeltaSource pattern);
    * V1 sinks must do the inverse, because the incremental plan a
    * Sink receives cannot be re-executed through `df.write`.
    */
  def replanned(df: org.apache.spark.sql.DataFrame,
      isStreaming: Boolean): org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming)
  }

  /** The inverse seam for SPECS that drive a V1 `Source.getBatch`
    * directly: the returned frame's `LogicalRDD` is flagged streaming
    * (so any batch action on it is rejected by the analyzer); rewrap
    * its already-computed RDD as a plain batch frame. Never used by
    * production paths — real streams execute through
    * `MicroBatchExecution`.
    */
  def debatched(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val lr = df.queryExecution.logical.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }.getOrElse(throw new IllegalArgumentException(
      "debatched expects a frame built on a LogicalRDD (a V1 getBatch result)"))
    cs.internalCreateDataFrame(
      lr.rdd.asInstanceOf[org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow]],
      df.schema, isStreaming = false)
  }
}
