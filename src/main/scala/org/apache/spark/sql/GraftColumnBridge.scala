package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the classic Column <-> Expression converters,
  * which are private[sql] in Spark 4. Lives in the spark.sql package
  * solely for access; used by graft's native expressions to expose a
  * Column API without a FunctionRegistry round trip. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
