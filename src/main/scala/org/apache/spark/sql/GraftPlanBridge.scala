package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-access bridge: `Dataset.ofRows` is `private[sql]`, and graft's
  * custom logical operators (e.g. [[graft.plans.AsOfJoinPlan]]) need a way
  * to re-enter the public `DataFrame` world after constructing a plan node
  * the fluent API can't express. This is the standard extension-library
  * pattern (the hook `SparkSessionExtensions` itself expects: strategies
  * see the plan, but something must put the plan into a Dataset first).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
