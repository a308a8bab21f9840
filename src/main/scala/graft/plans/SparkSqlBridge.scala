package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility bridge for third-party Catalyst extensions:
  * Column⇄Expression conversion lives in `private[sql]`
  * ExpressionUtils in Spark 4, so extension libraries expose it from
  * inside the org.apache.spark.sql namespace (the standard pattern
  * for out-of-tree expressions). Nothing else from spark-internals is
  * re-exported.
  */
object SparkSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
