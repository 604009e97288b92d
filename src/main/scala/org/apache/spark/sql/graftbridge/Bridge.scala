package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column wraps a ColumnNode, and the converters between
  * catalyst `Expression` and `Column` (`classic.ExpressionUtils`) are
  * `private[sql]`. This bridge lives in an `org.apache.spark.sql`
  * subpackage to expose exactly those two conversions to graft's custom
  * expressions — the standard extension-library pattern.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
