package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression seam for
  * graft's custom Catalyst expressions (graft.functions). This is the
  * established pattern for third-party Catalyst extensions on Spark 4's
  * classic API (Column wraps a ColumnNode, and ExpressionUtils is the
  * sanctioned converter, just sql-private). Nothing else from the private
  * surface is touched. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
