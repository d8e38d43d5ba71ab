package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Property check for the gaps-and-islands streak operator: the
  * window-chain formulation must equal a plain-Scala fold over each
  * user's sorted distinct day set — including the adjacent-day
  * boundary (day difference EXACTLY 1 continues a streak, 2 breaks
  * it) and the tie-break (longest streak, then EARLIEST start).
  * Days are drawn from a small range so duplicates, adjacency, and
  * equal-length streaks occur constantly.
  */
object StreakProps extends Properties("graft.streak") {
  private lazy val spark = SparkTestSession.spark

  private val events: Gen[List[(Int, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 2),    // user
      Gen.chooseNum(0, 14)))  // day offset from 2024-01-01

  property("streaks == per-user sorted-day fold") =
    Prop.forAll(events) { evs =>
      import spark.implicits._
      val base = LocalDate.of(2024, 1, 1)
      val df = evs.map { case (u, d) =>
        (u.toLong, java.sql.Timestamp.valueOf(
          base.plusDays(d.toLong).atStartOfDay.plusHours(3)))
      }.toDF("user_id", "ts")
      val got = Analytics.streaks(df).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getDate(5).toLocalDate)).toMap

      val expect = evs.groupBy(_._1).map { case (u, rows) =>
        val days = rows.map(d => base.plusDays(d._2.toLong)).distinct.sorted(
          Ordering.by((d: LocalDate) => d.toEpochDay))
        // fold consecutive days into runs
        val runs = days.foldLeft(List.empty[List[LocalDate]]) {
          case ((cur @ (prev :: _)) :: rest, d)
              if d.toEpochDay - prev.toEpochDay == 1 => (d :: cur) :: rest
          case (acc, d) => List(d) :: acc
        }.reverse.map(r => (r.length.toLong, r.min(Ordering.by((d: LocalDate) => d.toEpochDay))))
        val bestLen = runs.map(_._1).max
        val bestStart = runs.filter(_._1 == bestLen).map(_._2)
          .min(Ordering.by((d: LocalDate) => d.toEpochDay))
        u.toLong -> (days.length.toLong, runs.length.toLong,
          rows.length.toLong, bestLen, bestStart)
      }
      val ok = got == expect
      if (!ok) println(s"got=$got\nexpect=$expect")
      ok
    }
}
