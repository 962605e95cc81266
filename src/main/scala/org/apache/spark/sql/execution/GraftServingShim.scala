package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.SparkSession

/** `QueryExecution.prepareExecutedPlan(session, optimizedPlan)` is
  * `private[execution]`: physical strategy selection + execution
  * preparations (incl. AQE insertion) straight from an already-optimized
  * logical plan, with no analyzer or optimizer pass. This shim re-exports
  * it for the serving-session plan cache (`graft.engine.Serving` via
  * `graftbridge.PlanBridge`); it lives in this package purely for the
  * access qualifier. */
object GraftServingShim {
  def executedPlan(spark: SparkSession, optimized: LogicalPlan): SparkPlan =
    QueryExecution.prepareExecutedPlan(spark, optimized)
}
