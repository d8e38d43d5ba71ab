package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Analytics

/** Random-input law for the CUPED readout: cupedOn must equal a
  * driver-side fold that mirrors its exact arithmetic (integer-cents
  * sums, BigInt moments, the same fixed chain of double expressions)
  * on any feed the generator produces — including degenerate arms,
  * zero pre-period variance (null θ), and single-user types. Values
  * are whole-dollar doubles so the cents conversion is exact on both
  * sides.
  */
object CupedProps extends Properties("graft.cuped") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  // (user 0..5, type a/b, minute 0..30, whole-dollar value 0..50)
  private val feedGen: Gen[List[(Long, String, Int, Double)]] =
    Gen.chooseNum(2, 24).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.chooseNum(0L, 5L), Gen.oneOf("a", "b"),
      Gen.chooseNum(0, 30), Gen.chooseNum(0, 50).map(_.toDouble))))
      .map(_.map { case (u, t, m, v) => (u, t, m, v) })

  private case class Row(
      nUsers: Long, nA: Long, nB: Long, theta: Option[Double],
      rho2: Option[Double], meanYA: Double, meanYB: Double,
      liftRaw: Double, adjA: Option[Double], adjB: Option[Double],
      liftAdj: Option[Double])

  private def fold(evs: List[(Long, String, Int, Double)])
      : Map[String, Row] = {
    val us = evs.map { case (_, _, m, _) =>
      1700000000000000L + m * 60000000L }
    val mid = (us.min + us.max) / 2 // even sum in this generator's grid
    evs.groupBy(_._2).map { case (tpe, es) =>
      val perUser = es.groupBy(_._1).map { case (u, rows) =>
        val x = rows.filter { case (_, _, m, _) =>
          1700000000000000L + m * 60000000L <= mid }
          .map(r => (r._4 * 100).toLong).sum
        val y = rows.filter { case (_, _, m, _) =>
          1700000000000000L + m * 60000000L > mid }
          .map(r => (r._4 * 100).toLong).sum
        (u, x, y)
      }.toSeq
      val n = perUser.size.toLong
      def bi(l: Long) = BigInt(l)
      val sx = perUser.map(p => bi(p._2)).sum
      val sy = perUser.map(p => bi(p._3)).sum
      val sxy = perUser.map(p => bi(p._2) * bi(p._3)).sum
      val sxx = perUser.map(p => bi(p._2) * bi(p._2)).sum
      val syy = perUser.map(p => bi(p._3) * bi(p._3)).sum
      val covN = (bi(n) * sxy - sx * sy).toDouble
      val varXN = (bi(n) * sxx - sx * sx).toDouble
      val varYN = (bi(n) * syy - sy * sy).toDouble
      val theta = if (varXN > 0) Some(covN / varXN) else None
      val rho2 = if (varXN > 0 && varYN > 0)
        Some(covN * covN / (varXN * varYN)) else None
      val arms = perUser.groupBy(p => if (p._1 % 2 == 0) "A" else "B")
      def armStat(a: String) = arms.get(a).map { rows =>
        (rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum)
      }
      (tpe, armStat("A"), armStat("B")) match {
        case (_, Some((na, axa, aya)), Some((nb, axb, ayb))) =>
          val meanYA = aya.toDouble / na.toDouble / 100.0
          val meanYB = ayb.toDouble / nb.toDouble / 100.0
          val meanXA = axa.toDouble / na.toDouble / 100.0
          val meanXB = axb.toDouble / nb.toDouble / 100.0
          val meanXAll = sx.toDouble / n.toDouble / 100.0
          val adjA = theta.map(t => meanYA - t * (meanXA - meanXAll))
          val adjB = theta.map(t => meanYB - t * (meanXB - meanXAll))
          tpe -> Some(Row(n, na, nb, theta, rho2, meanYA, meanYB,
            meanYB - meanYA, adjA, adjB,
            adjA.flatMap(a => adjB.map(_ - a))))
        case _ => tpe -> None // a one-armed type emits no row (inner join)
      }
    }.collect { case (t, Some(r)) => t -> r }
  }

  property("cupedOn == driver fold on random feeds") =
    Prop.forAll(feedGen) { evs =>
      import spark.implicits._
      val df = evs.zipWithIndex.map { case ((u, t, m, v), i) =>
        (i.toLong, ts(m), u, t, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Analytics.cupedOn(df).collect().map { r =>
        def d(c: String): Option[Double] =
          if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Double](c))
        r.getAs[String]("event_type") -> Row(
          r.getAs[Long]("n_users"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), d("theta"), d("rho2"),
          r.getAs[Double]("mean_y_a"), r.getAs[Double]("mean_y_b"),
          r.getAs[Double]("lift_raw"), d("adj_mean_a"), d("adj_mean_b"),
          d("lift_adj"))
      }.toMap
      got == fold(evs)
    }
}
