package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor — the standard
  * escape hatch extension libraries use to turn a custom LogicalPlan
  * into a DataFrame (graft.plans.AsOf builds its plan programmatically;
  * there is no public API for that yet).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression bridges (classic.ExpressionUtils is the
    * blessed conversion since Columns became ColumnNode wrappers) —
    * lets library code build Columns over custom expressions without
    * a session-level function registration. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
