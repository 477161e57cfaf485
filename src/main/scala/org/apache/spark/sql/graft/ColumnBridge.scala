package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor (Connect-
  * compatible Column is ColumnNode-backed); the classic bridge lives in
  * `private[sql] ExpressionUtils`. This forwarder re-exposes it to the
  * engine — the standard extension-library pattern for custom Catalyst
  * expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
