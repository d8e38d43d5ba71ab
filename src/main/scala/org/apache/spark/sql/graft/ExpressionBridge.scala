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

  /** localCheckpoint with statistics truncation, for iterative
    * DataFrame loops (label propagation, fixed-point joins).
    *
    * `Dataset.localCheckpoint` truncates the LOGICAL plan but carries
    * the optimized plan's estimated `Statistics` onto the resulting
    * `LogicalRDD`. In a loop whose body joins the previous iteration
    * with itself, the estimated `sizeInBytes` is therefore a PRODUCT
    * of the previous round's estimates — the number's digit count
    * grows geometrically (×3 per round for a 3-reference body), and
    * after ~15 rounds the driver spends minutes multiplying
    * million-digit BigInts during planning. Rebuilding the
    * `LogicalRDD` without the inherited stats resets the estimate to
    * the session default each round; AQE re-plans from actual runtime
    * sizes anyway, and partitioning/ordering are preserved.
    */
  def checkpointTruncated(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val chk = df.localCheckpoint()
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    chk.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val session = chk.sparkSession
        org.apache.spark.sql.classic.Dataset.ofRows(session, lr.copy()(session, None, None))
      case _ => chk
    }
  }

  /** Unpersist the executor block-manager storage behind a
    * localCheckpoint-backed DataFrame. `Dataset.unpersist` only
    * removes CacheManager entries, so a checkpointed relation's
    * blocks otherwise linger until the RDD is GC'd and the
    * ContextCleaner runs — a data-sized checkpoint (a streaming
    * drain's summary) can overlap the next query's memory window.
    * After this call the DataFrame is DEAD (the lineage was truncated
    * at checkpoint, so the blocks cannot be recomputed) — callers
    * must have fully consumed the result.
    */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

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
