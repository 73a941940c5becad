package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from a Catalyst [[Expression]] to a user-facing [[Column]].
  * Spark 4 hides the classic constructor behind `private[sql]`
  * (`classic.ExpressionUtils.column`); this shim lives in the sql
  * package so graft's native expressions can surface as Columns.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function on a LIVE session (the sessionState
    * registry is `private[sql]`; extensions-based injection only
    * applies at session build time). */
  def registerFunction(
      spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
