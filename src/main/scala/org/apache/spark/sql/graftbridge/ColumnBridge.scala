package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression converters so graft
  * can expose custom Catalyst Expressions as user-facing Columns (the
  * Spark 4 unified Column API no longer has a public Expression
  * constructor). Lives in the org.apache.spark.sql package solely for
  * access; contains no logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
