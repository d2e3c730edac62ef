package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x wraps Column around ColumnNode; the Expression<->Column bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is private[sql]. This is
  * the standard extension-library shim: expose the two converters from within
  * the org.apache.spark.sql package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
