package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow, stable bridge to the `private[sql]` Expression↔Column converters
  * (Spark 4.x moved `Column` to a connect-agnostic ColumnNode model; classic
  * sessions convert via `org.apache.spark.sql.classic.ExpressionUtils`).
  * This is the supported in-JVM path for exposing custom Catalyst
  * expressions as `Column`s without going through SQL string parsing.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
