package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape census over the whole registry: every partition-less
  * window and every BroadcastNestedLoopJoin, with the subtree feeding
  * it summarized — the evidence base for PlanShapeSpec's bounded-side
  * predicates (a site must be bounded BY CONSTRUCTION: a 1-row
  * aggregate, a literal relation, or a limit, or it is a scale risk).
  *
  * Usage: runMain graft.ShapeAudit [sfDir]
  */
object ShapeAudit {

  /** Every physical node, descending through AQE wrappers, query
    * stages, cached relations, and reused exchanges (mirror of
    * PlanShapeSpec.nodes — duplicated here because test classes are
    * not on the main classpath). */
  def nodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: nodes(q.plan)
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s +: nodes(s.relation.cachedPlan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        r +: nodes(r.child)
      case n => Seq(n)
    }.flatten

  private def summarize(p: SparkPlan): String =
    nodes(p).map(_.getClass.getSimpleName).mkString(" > ")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("8", "graft-shape-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val skip = Set(
      "cdc_stream_windowed", "cdc_stream_scd2", "cdc_stream_handoff",
      "cdc_stream_roundtrip", "cdc_stream_dedup", "cdc_stream_frontier",
      "events_stream_attribution", "events_stream_attribution_outer",
      "events_stream_quiet", "events_stream_sessions")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        val plan = fn(spark, dir).queryExecution.executedPlan
        val all = nodes(plan)
        all.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            println(s"GLOBALWIN $name :: ${summarize(w.child)}")
          case j: BroadcastNestedLoopJoinExec =>
            val side = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
              case _ => j.right
            }
            println(s"BNLJ $name :: ${summarize(side)}")
          case _ => ()
        }
        CacheScope.releaseAll()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
