package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Property checks for the attribution twins against a per-user
  * sequential-scan reference: each purchase credits its first/last
  * preceding non-purchase touch within the lookback window, older or
  * absent touches fall to 'direct'. Timestamps sit on a day grid and
  * the lookback is 1-3 days, so the age-exactly-at-window boundary
  * (in-window — the rule is strictly greater than) and the
  * no-preceding-touch edge occur constantly.
  */
object AttributionProps extends Properties("graft.attribution") {
  private lazy val spark = SparkTestSession.spark

  private val DayUs = 86400000000L

  private val events: Gen[List[(Long, Long, String, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 2L),
      Gen.chooseNum(0L, 8L).map(_ * DayUs),
      Gen.frequency(3 -> "purchase", 3 -> "click", 2 -> "view"),
      Gen.chooseNum(0, 10000).map(_ / 100.0)))

  private type Agg = (Long, Double, Option[Double])

  private def reference(evs: List[(Long, Long, String, Double)],
      lookbackDays: Int, firstTouch: Boolean): Map[String, Agg] = {
    val credited = evs.zipWithIndex
      .map { case ((u, t, ty, v), i) => (u, t, ty, v, i.toLong) }
      .groupBy(_._1).values.flatMap { rows =>
        val ordered = rows.sortBy(r => (r._2, r._5))
        ordered.zipWithIndex.collect { case ((_, t, "purchase", v, _), i) =>
          val touches = ordered.take(i).filter(_._3 != "purchase")
          val touch = if (firstTouch) touches.headOption else touches.lastOption
          touch match {
            case Some((_, tt, ch, _, _)) if t - tt <= lookbackDays * DayUs =>
              (ch, v, Some(t - tt))
            case _ => ("direct", v, None)
          }
        }
      }.toList
    credited.groupBy(_._1).view.mapValues { rows =>
      val ages = rows.flatMap(_._3)
      (rows.size.toLong,
        rows.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble,
        if (ages.isEmpty) None
        else Some(ages.sum.toDouble / rows.size.toDouble / 60000000.0))
    }.toMap
  }

  private def run(evs: List[(Long, Long, String, Double)],
      lookbackDays: Int, firstTouch: Boolean): Map[String, Agg] = {
    import spark.implicits._
    val df = evs.zipWithIndex
      .map { case ((u, t, ty, v), i) => (u, i.toLong, t, ty, v) }
      .toDF("user_id", "event_id", "tsu", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val out =
      if (firstTouch) Analytics.attributionFirstTouch(df, lookbackDays)
      else Analytics.attribution(df, lookbackDays)
    out.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
  }

  property("last-touch attribution == sequential-scan reference") =
    Prop.forAll(events, Gen.chooseNum(1, 3)) { (evs, lb) =>
      run(evs, lb, firstTouch = false) ==
        reference(evs, lb, firstTouch = false)
    }

  property("first-touch attribution == sequential-scan reference") =
    Prop.forAll(events, Gen.chooseNum(1, 3)) { (evs, lb) =>
      run(evs, lb, firstTouch = true) ==
        reference(evs, lb, firstTouch = true)
    }
}
