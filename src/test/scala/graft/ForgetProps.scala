package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property checks for cdc.Forget.audit: for arbitrary change feeds
  * and deletion lists, residual is always zero, the scrub count is
  * exactly the listed keys' rows, and the per-table state delta is
  * exactly the forgotten keys that were LIVE (latest op not a
  * delete).
  */
object ForgetProps extends Properties("graft.forget") {
  private lazy val spark = SparkTestSession.spark

  private case class Ev(table: String, user: Long, seq: Long, op: String)

  private val ev: Gen[(String, Long, String)] = for {
    t <- Gen.oneOf("t0", "t1")
    u <- Gen.chooseNum(0L, 5L)
    op <- Gen.frequency(3 -> Gen.const("insert"), 3 -> Gen.const("update"),
      1 -> Gen.const("delete"))
  } yield (t, u, op)

  private val feed: Gen[List[(String, Long, String)]] =
    Gen.nonEmptyListOf(ev)
  private val list: Gen[List[Long]] =
    Gen.someOf(0L to 5L).map(_.toList)

  property("residual zero; scrub total; state delta = live forgotten keys") =
    Prop.forAll(feed, list) { (evs, keys) =>
      import spark.implicits._
      val rows = evs.zipWithIndex.map { case ((t, u, op), i) =>
        (t, u, new Timestamp(1700000000000L + i * 1000L), i.toLong, op)
      }
      val changes = rows.toDF("table_name", "user_id", "ts", "event_id", "op")
      val keyDf = keys.toDF("user_id")
      val report = cdc.Forget.audit(changes, "user_id", keyDf,
        Seq(col("ts"), col("event_id"))).collect()
      val keySet = keys.toSet
      // driver recompute
      val byTable = rows.groupBy(_._1)
      val ok = report.forall { r =>
        val t = r.getAs[String]("table_name")
        val trs = byTable(t)
        val live = trs.groupBy(_._2).values
          .map(_.maxBy(x => (x._3.getTime, x._4)))
          .filter(_._5 != "delete").map(_._2).toSet
        r.getAs[Long]("residual_keys") == 0L &&
        r.getAs[Long]("feed_rows") == trs.size.toLong &&
        r.getAs[Long]("feed_scrubbed") ==
          trs.count(x => keySet(x._2)).toLong &&
        r.getAs[Long]("state_keys_before") == live.size.toLong &&
        r.getAs[Long]("state_keys_after") ==
          live.count(u => !keySet(u)).toLong
      }
      Prop(ok && report.length == byTable.size) :| report.mkString("; ")
    }
}
