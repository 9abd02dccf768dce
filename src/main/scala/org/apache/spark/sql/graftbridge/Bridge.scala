package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Thin visibility bridge: Spark 4 made the Expression<->Column conversions
  * and Dataset-from-LogicalPlan construction `private[sql]`, so extension
  * libraries host these calls inside the `org.apache.spark.sql` namespace
  * (the standard technique used by Spark connector/extension projects). No
  * Spark internals are re-implemented here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over a (possibly custom) logical plan; runs analysis. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Idempotently attach a planner strategy to an existing session (for
    * sessions not built with [[graft.plans.GraftExtensions]]). Synchronized
    * on the session's ExperimentalMethods: the check-then-append is not
    * atomic, and a lost concurrent append would fail later planning with
    * "No plan for" the custom node.
    */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[ClassicSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(s))
        exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
