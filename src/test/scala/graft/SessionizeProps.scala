package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Property check for sessionization: the window-cumulative-sum
  * formulation must equal a plain-Scala fold over per-user
  * chronological event lists. Timestamps are drawn on a 15-minute
  * grid so gaps of EXACTLY 30 minutes (not a break — the rule is
  * strictly greater) occur constantly, pinning the boundary the
  * SQL twin shares.
  */
object SessionizeProps extends Properties("graft.sessionize") {
  private lazy val spark = SparkTestSession.spark

  private val GapMicros = 1800000000L // 30 min

  private val events: Gen[List[(Int, Long, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 2),
      Gen.chooseNum(0L, 12L).map(_ * (GapMicros / 2)), // 15-min grid
      Gen.chooseNum(0, 10000).map(_ / 100.0)))

  property("sessionize == per-user chronological fold") =
    Prop.forAll(events) { evs =>
      import spark.implicits._
      val df = evs.zipWithIndex
        .map { case ((u, t, v), i) => (u.toLong, i.toLong, t, v) }
        .toDF("user_id", "event_id", "tsu", "value")
        .withColumn("ts", timestamp_micros(col("tsu")))
      val got = Analytics.sessionize(df)
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("session_value"), unix_micros(col("session_start")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap

      val expect = evs.zipWithIndex
        .map { case ((u, t, v), i) => (u.toLong, t, v, i.toLong) }
        .groupBy(_._1)
        .flatMap { case (u, rows) =>
          val ordered = rows.sortBy(r => (r._2, r._4))
          // fold into sessions: break on gap > 30 min from the
          // previous event (exactly 30 min stays in-session)
          val sessions = ordered.foldLeft(List.empty[List[(Long, Double)]]) {
            case (acc, (_, t, v, _)) => acc match {
              case (cur @ ((prevT, _) :: _)) :: rest if t - prevT <= GapMicros =>
                ((t, v) :: cur) :: rest
              case _ => List((t, v)) :: acc
            }
          }.reverse
          sessions.zipWithIndex.map { case (s, i) =>
            val vals = s.map(_._2)
            val sum = vals.map(v => BigDecimal(v).setScale(2)).sum.toDouble
            (u, (i + 1).toLong) -> (s.size.toLong, sum, s.map(_._1).min)
          }
        }

      got == expect
    }
}
