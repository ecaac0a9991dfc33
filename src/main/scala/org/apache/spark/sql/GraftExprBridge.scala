package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters — the
  * standard extension-point shim for libraries that ship custom Catalyst
  * expressions (Spark 4's Column is an opaque ColumnNode; conversion lives
  * in `classic.ExpressionUtils`, which is sql-private). */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
