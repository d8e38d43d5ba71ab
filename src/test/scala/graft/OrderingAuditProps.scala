package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.cdc.TableStatistics

/** Property check for the out-of-order delivery audit: the
  * running-max window formulation (with its planted reversed-delivery
  * perturbation for user_id % 5 == 0) must equal a plain-Scala fold
  * over each key's delivery-ordered event list. Timestamps are drawn
  * from a tiny grid so equal timestamps (ts == running max is NOT
  * late — strict <) occur constantly, pinning the boundary.
  */
object OrderingAuditProps extends Properties("graft.orderingAudit") {
  private lazy val spark = SparkTestSession.spark

  private val events: Gen[List[(Int, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 6),   // user (includes %5==0 users 0 and 5)
      Gen.chooseNum(0, 8)))  // ts micros on a tiny grid

  property("audit == per-key delivery-ordered fold") =
    Prop.forAll(events) { evs =>
      import spark.implicits._
      val rows = evs.zipWithIndex.map { case ((u, t), i) =>
        (s"t_${u % 2}", u.toLong, i.toLong, t.toLong)
      }
      val df = rows.toDF("table_name", "user_id", "event_id", "tsu")
        .withColumn("ts", timestamp_micros(col("tsu")))
      val got = TableStatistics.orderingAudit(df).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap

      val expect = rows.groupBy(_._1).map { case (tbl, rs) =>
        val perKey = rs.groupBy(_._2).toSeq.map { case (u, es) =>
          val pos: Long => Long = id => if (u % 5 == 0) -id else id
          val ordered = es.sortBy(e => pos(e._3))
          // fold: strict running max; late = ts < max of previous
          val (_, lates) = ordered.foldLeft((Option.empty[Long],
            List.empty[Long])) { case ((mx, acc), (_, _, _, t)) =>
            val late = mx.exists(m => t < m)
            (Some(mx.fold(t)(math.max(_, t))),
              if (late) (mx.get - t) :: acc else acc)
          }
          (u, es.size.toLong, lates.size.toLong, lates.toSet,
            lates.sorted.lastOption)
        }
        val lateKeys = perKey.filter(_._3 > 0)
        tbl -> (perKey.map(_._2).sum, perKey.map(_._3).sum,
          lateKeys.size.toLong,
          lateKeys.flatMap(_._5).sorted.lastOption)
      }
      val ok = got == expect
      if (!ok) println(s"got=$got\nexpect=$expect")
      ok
    }
}
