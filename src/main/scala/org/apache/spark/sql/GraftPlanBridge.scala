package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` `Dataset.ofRows`: lets the graft library
  * wrap a custom [[LogicalPlan]] node (e.g. `graft.plans.GraftTopKPerKey`)
  * back into a user-facing DataFrame. This is the standard extension-library
  * technique for APIs Spark exposes to its own package only — the one file
  * in this repo outside the `graft` namespace.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
