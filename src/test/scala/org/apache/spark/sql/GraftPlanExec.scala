package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql] Dataset.ofRows`: the
  * RegistrySpec window guard executes the CHILD subtree of every
  * unpartitioned Window it finds, to assert the frame feeding the
  * single-partition sort is a bounded control frame (row count), not
  * a corpus-derived one. Lives under org.apache.spark.sql solely for
  * package-private access; never shipped in main. */
object GraftPlanExec {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
