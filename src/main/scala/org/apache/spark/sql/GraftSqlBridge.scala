package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so library
  * code can materialize a DataFrame from a CUSTOM LogicalPlan (the
  * tier-(c) operator path: LogicalPlan + Strategy + SparkPlan). This is
  * the standard extension-library idiom — the classic Dataset.ofRows
  * entry point is sql-package-private by design, and planner extensions
  * that introduce new logical operators re-export it exactly like this. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
