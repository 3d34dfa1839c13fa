package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(expr) constructor — Columns wrap
  * ColumnNodes, and the Expression converters live behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils).
  * This bridge re-exports the two conversions our custom Catalyst
  * expressions need; living under org.apache.spark.sql is the
  * established extension-library pattern for exactly this.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
