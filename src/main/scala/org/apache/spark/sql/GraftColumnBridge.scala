package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression conversions —
  * the standard technique for libraries that ship native Catalyst
  * expressions (ExpressionUtils is package-private in Spark 4.x).
  * Kept to the two calls graft.functions needs; nothing else leaks.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
