package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties}

import graft.cdc.ChangeFeed

/** SCD2 history vs a plain-Scala fold over each key's sorted change
  * list: versions 1..n in (ts, event_id) order, each closed by the
  * next change's timestamp, exactly one current version per key
  * whose last op isn't a delete. Heavy ts ties force the event_id
  * tie-break path.
  */
object Scd2Props extends Properties("graft.scd2") {
  private lazy val spark = SparkTestSession.spark

  private val feeds: Gen[List[(Int, Int, Int, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 2),    // user
      Gen.chooseNum(0, 4),    // ts minute (heavy ties)
      Gen.chooseNum(0, 999),  // event id
      Gen.chooseNum(0, 2)))   // op selector: 0 insert, 1 update, 2 delete

  property("scd2History == per-key sorted fold") =
    Prop.forAll(feeds) { rows =>
      import spark.implicits._
      val ops = Array("insert", "update", "delete")
      val distinct = rows.groupBy(_._3).map(_._2.head).toList
      val df = distinct.map { case (u, m, id, o) =>
        (u.toLong, new Timestamp(1700000000000L + m * 60000L),
          id.toLong, ops(o), s"users_$u", o.toDouble)
      }.toDF("user_id", "ts", "event_id", "op", "table_name", "value")
      val got = ChangeFeed.scd2History(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getString(2), r.getTimestamp(5), Option(r.getTimestamp(6)),
            r.getBoolean(7))).toMap

      val expect = distinct.groupBy(_._1).flatMap { case (u, grp) =>
        val sorted = grp.sortBy(r => (r._2, r._3))
        sorted.zipWithIndex.map { case ((_, m, id, o), i) =>
          val from = new Timestamp(1700000000000L + m * 60000L)
          val to = if (i + 1 < sorted.length)
            Some(new Timestamp(1700000000000L + sorted(i + 1)._2 * 60000L))
          else None
          (u.toLong, (i + 1).toLong) ->
            ((ops(o), from, to, to.isEmpty && ops(o) != "delete"))
        }
      }
      got == expect
    }
}
