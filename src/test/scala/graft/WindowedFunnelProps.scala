package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Analytics

/** Property pins for the round-9 additions whose cores are small
  * enough to re-derive in plain Scala: the time-bounded funnel
  * against a per-user fold, and the latency-SLO percentile picks
  * against a sorted-list reference.
  */
object WindowedFunnelProps extends Properties("graft.windowed9") {
  private lazy val spark = SparkTestSession.spark

  private val WindowUs = 72L * 3600 * 1000000

  private val events: Gen[List[(Int, Int, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 2),    // user
      Gen.chooseNum(0, 200),  // hour offset (spans the 72h window)
      Gen.chooseNum(0, 2)))   // stage: signup/click/purchase

  property("funnelWindowed == per-user chained-deadline fold") =
    Prop.forAll(events) { evs =>
      import spark.implicits._
      val types = Array("signup", "click", "purchase")
      val df = evs.zipWithIndex.map { case ((u, hr, st), i) =>
        (u.toLong, new Timestamp(1700000000000L + hr * 3600000L + i),
          types(st))
      }.toDF("user_id", "ts", "event_type")
      val r = Analytics.funnelWindowed(df).collect()(0)

      val byUser = evs.zipWithIndex.map { case ((u, hr, st), i) =>
        (u.toLong, 1700000000000000L + hr * 3600000000L + i * 1000L, types(st))
      }.groupBy(_._1)
      def stage(rows: List[(Long, Long, String)], t: String,
          after: Option[Long]): Option[Long] = after match {
        case None => None
        case Some(a) => rows.filter(e => e._3 == t && e._2 >= a &&
          e._2 <= a + WindowUs).map(_._2).minOption
      }
      val users = byUser.map { case (_, rows) =>
        val rl = rows.toList
        val t1 = rl.filter(_._3 == "signup").map(_._2).minOption
        val t2 = stage(rl, "click", t1)
        val t3 = stage(rl, "purchase", t2)
        (t1, t2, t3)
      }.toList
      val ok1 = r.getLong(0) == byUser.size.toLong
      val ok2 = r.getLong(1) == users.count(_._1.isDefined).toLong
      val ok3 = r.getLong(2) == users.count(_._2.isDefined).toLong
      val ok4 = r.getLong(3) == users.count(_._3.isDefined).toLong
      val conv = users.collect { case (Some(a), _, Some(c)) => c - a }.sorted
      val okMed =
        if (conv.isEmpty) r.isNullAt(4)
        else r.getLong(4) == conv((conv.size - 1) / 2)
      ok1 && ok2 && ok3 && ok4 && okMed
    }

  property("latencySlo percentiles == sorted-list rank picks") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 500))) { ids =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val distinct = ids.distinct
      val df = distinct.map { i =>
        (i.toLong, new Timestamp(1700000000000L), i.toLong,
          "update", "users_0", 0.0)
      }.toDF("user_id", "ts", "event_id", "op", "table_name", "value")
      val r = graft.cdc.ChangeFeed.latencySlo(df).collect()(0)
      // recompute the planted latencies driver-side via the SAME hash
      val lat = df.select(
        (pmod(graft.functions.Portable.pHash(col("event_id").cast("string")),
          lit(30000000L)) +
          when(col("user_id") % 13 === 0, lit(300000000L)).otherwise(lit(0L)))
          .as("l"))
        .as[Long].collect().sorted
      def pick(p: Int) = lat((lat.length * p + 99) / 100 - 1)
      r.getLong(2) == pick(50) && r.getLong(3) == pick(95) &&
        r.getLong(4) == pick(99) && r.getLong(5) == lat.max &&
        r.getLong(6) == lat.count(_ > 60000000L).toLong
    }
}
