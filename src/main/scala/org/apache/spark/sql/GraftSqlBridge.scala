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
}
