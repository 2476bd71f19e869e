package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression conversions live behind `private[sql]` in Spark 4
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this subpackage
  * bridge re-exports just the two conversions the engine's native
  * expressions need — the standard pattern for third-party Catalyst
  * extension libraries. */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
