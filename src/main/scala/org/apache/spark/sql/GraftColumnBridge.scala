package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from a custom Catalyst [[Expression]] to a user-facing [[Column]].
  * Spark 4 made the Column(expr) constructor private[sql] (Connect split);
  * this shim lives in the sql package solely to re-expose the classic-mode
  * conversion for graft's native expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
