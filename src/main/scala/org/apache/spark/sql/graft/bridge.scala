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
}
