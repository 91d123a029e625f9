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
}
