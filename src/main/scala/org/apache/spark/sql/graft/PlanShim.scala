package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` Dataset constructor: turns an
  * analyzed LogicalPlan back into a DataFrame. Used by the equality-MERGE
  * rewrite, whose command re-executes the MERGE's source plan as the upsert
  * batch. Standard extension-shim pattern (the same door Delta/Iceberg use);
  * nothing else from the internal API is touched.
  */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
