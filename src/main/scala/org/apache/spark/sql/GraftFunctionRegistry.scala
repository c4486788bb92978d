package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Runtime SQL-function registration on an already-built session (the
  * extensions path in [[graft.functions.GraftExtensions]] only works at
  * session build time; the driver hands us a pre-built session). */
object GraftFunctionRegistry {
  def register(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
