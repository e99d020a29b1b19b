package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` bridge: lets the engine materialize a DataFrame
  * from a custom resolved LogicalPlan (graft.plans.AsOfJoinPlan). Lives in
  * the org.apache.spark.sql package solely to reach
  * `classic.Dataset.ofRows` — the same technique every out-of-tree Spark
  * extension uses; no Spark behavior is modified.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
