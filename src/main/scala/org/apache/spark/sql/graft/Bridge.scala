package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved the classic `Column(expr)` constructor behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); this
  * is the standard extension-library shim — a minimal forwarder living
  * in the `org.apache.spark.sql` namespace. No Spark internals are
  * reimplemented here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
