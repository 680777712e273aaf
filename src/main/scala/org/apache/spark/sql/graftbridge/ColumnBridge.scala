package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression interop shim. Spark 4 made the conversions
  * `private[sql]` (Connect-compatible Column is node-backed); libraries
  * that define native Catalyst expressions reach them through an
  * `org.apache.spark.sql` subpackage — the standard pattern. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
