package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql]` surface: lets specs evaluate
  * an arbitrary LOGICAL subplan (e.g. the child of a Window node
  * found inside an optimized plan) as a DataFrame, so plan-shape
  * audits can measure what actually flows into an operator instead
  * of trusting comments. Test classpath only — the engine itself
  * never reaches behind the public API. */
object GraftTestShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
