package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column ↔ Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft's custom
  * Catalyst expressions can be exposed as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** build a DataFrame from a raw logical plan (Dataset.ofRows is
    * private[sql]) — used to hand custom logical nodes to the session. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** register a custom expression as a SQL-callable function on an
    * existing session (sessionState is private[sql]; extensions-based
    * registration covers sessions built with spark.sql.extensions). */
  def registerFunction(spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
