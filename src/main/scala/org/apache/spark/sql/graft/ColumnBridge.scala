package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversion —
  * the classic-mode internals moved behind package privacy in Spark 4's
  * Connect refactor; extension libraries reach them from a shim inside
  * the `org.apache.spark.sql` package (the usual pattern for custom-
  * expression libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
