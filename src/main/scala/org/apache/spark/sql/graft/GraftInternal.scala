package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Package-position accessor for `Dataset.ofRows` (private[sql]) — used
  * ONLY by the ad-hoc measurement tool [[graft.tools.QueryTime]] to
  * re-plan a query minus its root Sort. Production operators never
  * construct DataFrames from raw logical plans.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
