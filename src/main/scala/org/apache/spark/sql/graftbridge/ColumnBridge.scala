package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> catalyst Expression
  * converters (Spark 4 hid the classic `new Column(expr)` constructor).
  * Living under `org.apache.spark.sql` is the established pattern for
  * Spark-native extension libraries that define custom expressions.
  */
object ColumnBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
