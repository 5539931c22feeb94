package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 scoped these conversions
  * private[sql]; third-party native expressions (graft.plans.*) reach
  * them through this in-namespace shim — the standard pattern for
  * Catalyst extension libraries. */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** DataFrame over a custom LogicalPlan (classic.Dataset.ofRows is
    * private[sql]) — how third-party operators (graft.plans.AsOfJoin)
    * hand their plan back to the session. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
    plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
    : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
