package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset => CDataset, SparkSession => CSparkSession}

/** Test-only bridge into `Dataset.ofRows` (private[sql]): lets the
  * global-window fleet audit execute the CHILD of a Window node in
  * isolation, to measure the row count actually flowing into each
  * unpartitioned window (GlobalWindowSpecs). Test scope only — main
  * source never reaches across the package boundary.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): CDataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
