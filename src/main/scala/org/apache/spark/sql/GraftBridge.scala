package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression conversions, so the
  * graft library can expose custom Catalyst expressions (e.g.
  * [[graft.functions.CosineSimilarity]]) through the public Column API.
  * Standard pattern for Spark-native libraries on Spark 4.x, where
  * `Column(expr)` is no longer public.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
