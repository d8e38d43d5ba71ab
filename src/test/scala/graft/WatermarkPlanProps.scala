package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.cdc.TableStatistics

/** Property check for the watermark sizing plan against a
  * plain-Scala reference: for arbitrary feeds the plan's lateness
  * mass, candidate drop counts, and zero-drop recommendation must
  * equal a direct walk of the audit's perturbed delivery order
  * (user_id % 5 == 0 delivers in reverse). Tiny ts ranges keep
  * exactly-at-candidate lateness values (the > boundary) frequent.
  */
object WatermarkPlanProps extends Properties("graft.watermark") {
  private lazy val spark = SparkTestSession.spark

  // (user_id, event_id, tsSec): event ids globally distinct so the
  // delivery order is total; seconds small so 1s/5s boundaries hit
  private val feedGen: Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 12L)))
      .map(_.zipWithIndex.map { case ((u, s), i) => (u, i.toLong + 1, s) })

  property("watermarkPlan == perturbed-delivery reference") =
    Prop.forAll(feedGen) { evs =>
      import spark.implicits._
      val df = evs.toDF("user_id", "event_id", "sec")
        .select(
          concat(lit("t"), (col("user_id") % 2).cast("string"))
            .as("table_name"),
          col("user_id"), col("event_id"),
          col("sec").cast("timestamp").as("ts"))
      val got = TableStatistics.watermarkPlan(df).collect()
        .map(r => r.getAs[String]("table_name") -> ((
          r.getAs[Long]("n_events"), r.getAs[Long]("n_late"),
          r.getAs[Long]("sum_late_us"), r.getAs[Long]("max_late_us"),
          r.getAs[Long]("n_drop_w1s"), r.getAs[Long]("n_drop_w5s"),
          r.getAs[Long]("recommended_watermark_us")))).toMap

      val expect = evs.groupBy(t => "t" + (t._1 % 2)).map {
        case (table, rows) =>
          val lates = rows.groupBy(_._1).values.flatMap { userRows =>
            val ordered =
              if (userRows.head._1 % 5 == 0) userRows.sortBy(-_._2)
              else userRows.sortBy(_._2)
            var prevMax = Long.MinValue
            ordered.flatMap { case (_, _, sec) =>
              val us = sec * 1000000L
              val late = if (prevMax != Long.MinValue && us < prevMax)
                Some(prevMax - us) else None
              prevMax = math.max(prevMax, us)
              late
            }
          }.toList
          table -> ((rows.size.toLong, lates.size.toLong,
            lates.sum, if (lates.isEmpty) 0L else lates.max,
            lates.count(_ > 1000000L).toLong,
            lates.count(_ > 5000000L).toLong,
            if (lates.isEmpty) 0L else lates.max))
      }
      got == expect
    }
}
