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

  /** CACHE-HYGIENE probe (round 12): one-line summaries of every plan
    * still registered in the session's CacheManager. A registered query
    * must leave this EMPTY after it executes — a leaked persist() (a) is
    * session-lifetime memory in any long-lived serving/streaming process
    * that runs the registry and (b) gets silently substituted by the
    * CacheManager into ANY sibling query that builds the identical
    * logical plan, mutating its physical plan (the round-11 tx_dsir
    * ReusedExchange regression). localCheckpoint pins do NOT appear here
    * — that is exactly why they are the sanctioned multi-consumer pin.
    * The `cachedData` list is fully private, so the enumeration goes
    * through reflection; emptiness itself uses the public isEmpty. */
  def leakedCachePlans(spark: SparkSession): Seq[String] = {
    val cm = spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager
    if (cm.isEmpty) return Seq.empty
    val f = cm.getClass.getDeclaredField("cachedData")
    f.setAccessible(true)
    f.get(cm)
      .asInstanceOf[IndexedSeq[org.apache.spark.sql.execution.CachedData]]
      .map(_.plan.simpleString(2).linesIterator.mkString(" | ").take(300))
  }

  /** drop every CacheManager entry — the between-queries reset that makes
    * audited plan counters independent of registry ordering. */
  def clearAllCache(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.clearCache()

  /** drain the listener bus (private[spark]) — lets a metrics listener's
    * counters be read back synchronously after an action returns, so
    * per-query CPU-time attribution doesn't bleed into the next query. */
  def waitListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
