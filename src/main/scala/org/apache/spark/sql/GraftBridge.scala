package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for `Dataset.ofRows` (package-private in Spark): lets
  * the library hand a custom [[LogicalPlan]] node (graft.plans.TopKPerKeyNode)
  * to the session for analysis + planning. Lives in the Spark namespace for
  * visibility only — contains no Spark-internal logic.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
