package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ExpressionBridge

/** Planner strategy mapping the logical AsOfJoin to its sort-merge
  * exec (registered via GraftExtensions, or lazily by `AsOf.join`).
  */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

/** Column-level API for the as-of join. Caller guarantees disjoint
  * column names between the two sides (rename with `toDF` first) and
  * timestamp/long-typed `ts` columns.
  */
object AsOf {
  def join(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTs: Column, rightTs: Column): DataFrame = {
    val spark = left.sparkSession
    // idempotently make the strategy available on this session even
    // without spark.sql.extensions configuration
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    val plan = AsOfJoin(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      leftKeys.map(ExpressionBridge.expression),
      rightKeys.map(ExpressionBridge.expression),
      ExpressionBridge.expression(leftTs),
      ExpressionBridge.expression(rightTs))
    ExpressionBridge.ofRows(spark, plan)
  }
}
