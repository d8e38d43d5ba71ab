package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Analytics

/** Property check for the exact per-group median: the ranked-window
  * double-middle-row selection must equal direct sorted indexing —
  * odd groups take the middle value, even groups the midpoint of the
  * two middles, ties broken by the unique key. A tiny value space
  * forces heavy price ties across the group boundary rows.
  */
object MedianProps extends Properties("graft.median") {
  private lazy val spark = SparkTestSession.spark

  private val orders: Gen[List[(String, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("1-URGENT", "2-HIGH", "3-MEDIUM"),
      Gen.chooseNum(0, 40).map(_ * 0.25)))

  property("medianPrice == sorted-middle reference") =
    Prop.forAll(orders) { ords =>
      import spark.implicits._
      val df = ords.zipWithIndex
        .map { case ((p, v), i) => (p, v, i.toLong) }
        .toDF("o_orderpriority", "o_totalprice", "o_orderkey")
      val got = Analytics.medianPrice(df)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

      val expect = ords.groupBy(_._1).view.mapValues { rows =>
        val vals = rows.map(_._2).sorted
        val n = vals.size
        (n.toLong, (vals((n - 1) / 2) + vals(n / 2)) / 2.0)
      }.toMap

      got == expect
    }
}
