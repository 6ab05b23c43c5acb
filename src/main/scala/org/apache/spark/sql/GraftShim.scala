package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so the
  * graft library can return DataFrames built from custom logical
  * plans (the AsOfJoin node). This is the standard extension-library
  * technique; nothing else from the sql internals is touched.
  */
object GraftShim {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
}
