package graft

import java.sql.Date

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Property checks for the windowed event analytics against
  * plain-Scala references: sequence-gap detection, trailing-7-day
  * distinct actives, and weekly cohort retention. Day/id ranges are
  * kept tiny so window boundaries (exactly-threshold gaps, day 0,
  * offset-week edges) occur constantly.
  */
object WindowedEventProps extends Properties("graft.windowed") {
  private lazy val spark = SparkTestSession.spark

  // --- eventGaps ---------------------------------------------------

  private val gapEvents: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 200L)).map(ids =>
      ids.distinct.map(id => (id % 3, id)))

  property("eventGaps == per-user sorted-diff reference") =
    Prop.forAll(gapEvents, Gen.chooseNum(1, 4)) { (evs, factor) =>
      import spark.implicits._
      val got = Analytics.eventGaps(
          evs.toDF("user_id", "event_id"), factor)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap

      val nUsers = evs.map(_._1).distinct.size
      val expect = evs.groupBy(_._1).flatMap { case (u, rows) =>
        val gaps = rows.map(_._2).sorted.sliding(2).collect {
          case Seq(a, b) => b - a
        }.toList
        val nGaps = gaps.count(_ > nUsers.toLong * factor)
        if (nGaps > 0) Some(u -> ((rows.size.toLong, nGaps.toLong, gaps.max)))
        else None
      }
      got == expect
    }

  // --- rollingActive / retention ----------------------------------

  private val dayEvents: Gen[List[(Long, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0, 20)))

  private val Epoch = Date.valueOf("2024-01-01").toLocalDate

  private def toDF(evs: List[(Long, Int)]) = {
    import spark.implicits._
    evs.map { case (u, d) => (u, Date.valueOf(Epoch.plusDays(d))) }
      .toDF("user_id", "day")
      .withColumn("ts", col("day").cast("timestamp"))
      .select("user_id", "ts")
  }

  property("rollingActive == trailing-7-day distinct reference") =
    Prop.forAll(dayEvents) { evs =>
      val got = Analytics.rollingActive(toDF(evs))
        .collect()
        .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1)).toMap

      val active = evs.map { case (u, d) =>
        (u, Epoch.plusDays(d).toEpochDay)
      }.distinct
      val days = active.map(_._2).distinct
      val expect = days.map(day =>
        day -> active.collect {
          case (u, d) if d <= day && d > day - 7 => u
        }.distinct.size.toLong).toMap
      got == expect
    }

  property("retention == cohort-week distinct reference") =
    Prop.forAll(dayEvents) { evs =>
      val got = Analytics.retention(toDF(evs))
        .collect()
        .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)) ->
          r.getLong(2)).toMap

      val byUser = evs.map { case (u, d) => (u, Epoch.plusDays(d).toEpochDay) }
        .groupBy(_._1)
      val expect = byUser.toSeq.flatMap { case (u, rows) =>
        val cohort = rows.map(_._2).min
        rows.map(r => (cohort, (r._2 - cohort) / 7) -> u)
      }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
      got == expect
    }
}
