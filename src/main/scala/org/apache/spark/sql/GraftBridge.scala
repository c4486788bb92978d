package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` Column ↔ Expression conversions, so the
  * graft library can expose custom Catalyst expressions (e.g.
  * [[graft.functions.CosineSimilarity]]) through the public Column API.
  * Standard pattern for Spark-native libraries on Spark 4.x, where
  * `Column(expr)` is no longer public.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw LogicalPlan (the `Dataset.ofRows` hook —
    * `private[sql]`, needed to surface custom logical operators like
    * [[graft.plans.AsofJoinPlan]] through the public API). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes, ready
    * to be referenced by a custom operator's key/payload expressions). */
  def analyzedPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Idempotently add a planner strategy to a LIVE session — the
    * `experimental.extraStrategies` twin of
    * `SparkSessionExtensions.injectPlannerStrategy` for sessions the
    * driver builds without the graft extensions config. */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy)) {
      cs.experimental.extraStrategies =
        strategy +: cs.experimental.extraStrategies
    }
  }
}
