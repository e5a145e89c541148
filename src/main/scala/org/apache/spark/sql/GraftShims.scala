package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. `classic.ExpressionUtils` is private[sql] in Spark 4, so the
  * conversion lives in this package — the conventional extension point for
  * libraries adding native expressions (no Spark internals are modified). */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
