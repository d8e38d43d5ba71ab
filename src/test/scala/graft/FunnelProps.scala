package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Analytics

/** Property check for the ordered-stage funnel: the chained
  * whole-partition window minima (stage N's threshold is stage N-1's
  * timestamp) must equal a per-user sequential fold. Tiny ts range
  * forces same-ts stage collisions — at-or-after is `>=`, so a
  * click at the signup instant counts.
  */
object FunnelProps extends Properties("graft.funnel") {
  private lazy val spark = SparkTestSession.spark

  private val events: Gen[List[(Int, Long, String)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 3),
      Gen.chooseNum(0L, 10L),
      Gen.frequency(3 -> "signup", 3 -> "click", 2 -> "purchase", 2 -> "view")))

  property("funnel == per-user sequential fold") =
    Prop.forAll(events) { evs =>
      import spark.implicits._
      val got = Analytics.funnel(evs.toDF("user_id", "ts", "event_type"))
        .collect()(0)
      val gotCounts =
        (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))

      val byUser = evs.groupBy(_._1)
      def stage(rows: List[(Int, Long, String)],
          typ: String, thresh: Option[Long]): Option[Long] =
        thresh.flatMap(t =>
          rows.collect { case (_, ts, `typ`) if ts >= t => ts }.minOption)
      val stages = byUser.values.map { rows =>
        val t1 = rows.collect { case (_, ts, "signup") => ts }.minOption
        val t2 = stage(rows, "click", t1)
        val t3 = stage(rows, "purchase", t2)
        (t1, t2, t3)
      }
      val expect = (byUser.size.toLong,
        stages.count(_._1.isDefined).toLong,
        stages.count(_._2.isDefined).toLong,
        stages.count(_._3.isDefined).toLong)

      gotCounts == expect
    }
}
