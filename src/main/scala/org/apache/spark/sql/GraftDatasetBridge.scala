package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the sql package: builds a DataFrame from a
  * custom LogicalPlan (Dataset.ofRows is private[sql]). This is the
  * standard integration point for libraries shipping their own plan
  * nodes; nothing else from the internal API is touched.
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
