package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge. Spark 4 made the Column/Expression
 * conversion helpers `private[sql]`
 * (org.apache.spark.sql.classic.ExpressionUtils), so libraries that define
 * custom Catalyst expressions expose them through a small shim in an
 * `org.apache.spark.sql` subpackage — the standard extension pattern.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
