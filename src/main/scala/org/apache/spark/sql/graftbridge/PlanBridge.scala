package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{StructField, StructType}

/** Bridge to the `private[sql]` plan-execution surfaces the serving-session
  * plan cache needs (`graft.engine.Serving`). Lives in an
  * `org.apache.spark.sql` subpackage purely to satisfy the access
  * qualifier; contains no Spark-internal logic.
  *
  * Two execution tiers for a cached (already-optimized) probe plan:
  *  - [[ofRows]]: wrap the plan in a fresh Dataset — the analyzer and
  *    optimizer re-run (both are fast and idempotent on an
  *    already-optimized plan) but plan CONSTRUCTION and the relation's
  *    file listing are amortized. Returns a full DataFrame, so declared
  *    queries keep their plan-pin `require()`s and Verify keeps writing
  *    parquet from it.
  *  - [[collectFromOptimized]]: hand the plan straight to physical
  *    planning + preparation (`QueryExecution.prepareExecutedPlan` — no
  *    analyzer, no optimizer) and execute-collect it. The true warm
  *    serving call: per-request work is literal rebinding + codegen
  *    (Janino-cached — varying literals ride the references array) +
  *    the job itself. */
object PlanBridge {

  private def classic(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Dataset from a logical plan (the `Dataset.ofRows` that Spark 4 hides
    * behind `private[sql]`). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(classic(spark), plan)

  /** The external-row schema of a resolved plan's output. */
  def schemaOf(plan: LogicalPlan): StructType =
    StructType(plan.output.map(a => StructField(a.name, a.dataType, a.nullable)))

  /** Physical-plan + execute-collect from an ALREADY-OPTIMIZED logical
    * plan, skipping analyzer and optimizer entirely. The caller owns the
    * contract that `plan` really is optimizer output with only literal /
    * LocalRelation-data substitutions applied (what `graft.engine.Serving`
    * templates guarantee) — arbitrary logical plans belong in [[ofRows]]. */
  def collectFromOptimized(spark: SparkSession, plan: LogicalPlan): Array[Row] = {
    val physical = org.apache.spark.sql.execution.GraftServingShim
      .executedPlan(classic(spark), plan)
    val toScala = CatalystTypeConverters.createToScalaConverter(schemaOf(plan))
    physical.executeCollect().map(toScala(_).asInstanceOf[Row])
  }
}
