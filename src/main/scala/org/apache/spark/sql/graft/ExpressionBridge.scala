package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin bridge to Spark's classic Column ⇄ Expression converters,
  * which are `private[sql]` in Spark 4. Living under
  * `org.apache.spark.sql` grants the required visibility — the usual
  * pattern for libraries that register custom Catalyst expressions.
  */
object ExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw logical plan (Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Apply an extensions object's injected functions to a live
    * session's registry (`registerFunctions` is private[sql];
    * `spark.sql.extensions` is a static conf, so the config path
    * can't be exercised against an already-running test context).
    */
  def applyFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(
      spark.sessionState.functionRegistry.asInstanceOf[
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
}
