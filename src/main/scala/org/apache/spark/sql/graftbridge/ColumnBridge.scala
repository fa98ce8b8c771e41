package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4 wraps
  * Columns in backend-agnostic ColumnNodes; the classic converters live behind
  * the sql package boundary). Standard practice for libraries shipping custom
  * Catalyst expressions: one tiny file inside the package, nothing else. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
