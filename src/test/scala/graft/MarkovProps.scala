package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Property checks for the Markov transition matrix and the type
  * co-occurrence operator against sequential-scan references.
  *
  * Generators use few users/types on a coarse timestamp grid so
  * ties (same-ts events ordered by event_id), single-event users
  * (no transitions), and single-type users (no pairs) occur
  * constantly. Doubles are compared exactly: the references apply
  * the same IEEE operations in the same order as the Spark
  * expressions.
  */
object MarkovProps extends Properties("graft.markov") {
  private lazy val spark = SparkTestSession.spark

  private val MinUs = 60000000L

  private val events: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 5L).map(_ * MinUs),
      Gen.oneOf("signup", "click", "view", "purchase")))

  private def toDf(evs: List[(Long, Long, String)]) = {
    import spark.implicits._
    evs.zipWithIndex
      .map { case ((u, t, ty), i) => (u, i.toLong, t, ty) }
      .toDF("user_id", "event_id", "tsu", "event_type")
      .withColumn("ts", timestamp_micros(col("tsu")))
  }

  private type MRow = (Long, Double, Double)

  private def markovReference(
      evs: List[(Long, Long, String)]): Map[(String, String), MRow] = {
    val trans = evs.zipWithIndex
      .map { case ((u, t, ty), i) => (u, t, ty, i.toLong) }
      .groupBy(_._1).values.flatMap { rows =>
        val ordered = rows.sortBy(r => (r._2, r._4)).map(_._3)
        ordered.zip(ordered.drop(1))
      }.toList
    val n = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nFrom = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nTo = trans.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nAll = trans.size.toLong
    n.map { case ((f, t), c) =>
      val p = c.toDouble / nFrom(f).toDouble
      (f, t) -> ((c, p, p / (nTo(t).toDouble / nAll.toDouble)))
    }
  }

  property("transition matrix == sequential-scan reference") =
    Prop.forAll(events) { evs =>
      val got = Analytics.markovTransitions(toDf(evs)).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      got == markovReference(evs)
    }

  private type CRow = (Long, Long, Long, Double)

  private def coocReference(
      evs: List[(Long, Long, String)]): Map[(String, String), CRow] = {
    val byType = evs.map(e => (e._3, e._1)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keys.toSeq.sorted
    (for {
      i <- types.indices; j <- (i + 1) until types.length
      (a, b) = (types(i), types(j))
      both = (byType(a) & byType(b)).size.toLong
      if both > 0
    } yield (a, b) -> ((both, byType(a).size.toLong, byType(b).size.toLong,
      both.toDouble /
        (byType(a).size.toLong + byType(b).size.toLong - both).toDouble)))
      .toMap
  }

  property("type co-occurrence == user-set reference") =
    Prop.forAll(events) { evs =>
      val got = Analytics.typeCooccurrence(toDf(evs)).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      got == coocReference(evs)
    }
}
