package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the custom-operator surface needs:
  * wrapping a hand-built [[LogicalPlan]] back into a [[DataFrame]]
  * (`Dataset.ofRows` — package-private to `org.apache.spark.sql`, hence
  * this file's package). Everything else about graft's custom operators
  * ([[graft.plans.AsofJoin]] and its strategy) lives in the public
  * extension API; this bridge is deliberately one line so the surface
  * area touching Spark internals stays auditable. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
