package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeFeed

/** Scan pushdown of replay/threshold predicates on the events
  * timestamp, whichever reader branch is active (Tables.withEventTime):
  * under the legacy raw-nanos long read the DerivedTimeBound rule must
  * add a pushable raw-nanos bound; under the Spark 4.1+ native
  * timestamp_ntz read Catalyst itself unwraps the ntz→ltz cast, so the
  * SAME assertion (a LessThanOrEqual(ts,…) entry in PushedFilters)
  * holds with no rule involved. The rule's widened bounds must never
  * change results — including at truncation boundaries and for
  * negative epochs, where toward-zero `div` differs from floor.
  */
class DerivedTimeBoundSpec extends AnyFunSuite {
  import SparkTestSession._

  test("replayAt cutoff reaches the events parquet scan as a pushed ts bound") {
    val c = ChangeFeed.fromEvents(spark, sf)
    val state = ChangeFeed.replayAt(c, lit("2024-01-15 00:00:00"),
      Seq("user_id"), Seq(col("ts"), col("event_id")))
    val leaves = state.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("LessThanOrEqual(ts,"),
      s"expected a pushed raw-nanos upper bound in:\n$leaves")
  }

  test("derived bounds preserve exact semantics incl. negative epochs") {
    import spark.implicits._
    val xs = Seq(-2000L, -1999L, -1001L, -1000L, -999L, -1L, 0L, 1L,
      999L, 1000L, 1500L, 123456789L)
    val df = xs.toDF("nanos")
      .withColumn("ts", timestamp_micros(expr("nanos div 1000")))
    for (q <- Seq(-2L, -1L, 0L, 1L, 1000L)) {
      def got(c: org.apache.spark.sql.Column) =
        df.filter(c).select("nanos").collect().map(_.getLong(0)).toSet
      assert(got(col("ts") <= timestamp_micros(lit(q)))
        == xs.filter(x => x / 1000 <= q).toSet, s"le q=$q")
      assert(got(col("ts") >= timestamp_micros(lit(q)))
        == xs.filter(x => x / 1000 >= q).toSet, s"ge q=$q")
      assert(got(col("ts") < timestamp_micros(lit(q)))
        == xs.filter(x => x / 1000 < q).toSet, s"lt q=$q")
      assert(got(col("ts") === timestamp_micros(lit(q)))
        == xs.filter(x => x / 1000 == q).toSet, s"eq q=$q")
      assert(got(timestamp_micros(lit(q)) <= col("ts"))
        == xs.filter(x => q <= x / 1000).toSet, s"mirrored le q=$q")
    }
  }
}
