package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.plans.AsOf

/** Property check for the custom as-of join exec: on arbitrary
  * two-sided inputs it must equal a plain-Scala per-row reference
  * (latest same-key right ts ≤ left ts). The generator forces the
  * edges the streaming merge must get right: null timestamps on both
  * sides (match nothing / are discarded mid-stream), null KEYS (the
  * natural row ordering groups nulls together, pandas-merge_asof
  * style — unlike an equi-join), dense ts collisions across keys, and
  * left rows before/after their key's whole right history.
  * (key, rts) pairs are deduplicated in the generator because the
  * exec's pick among equal-ts versions is sort-order-dependent.
  */
object AsOfProps extends Properties("graft.asof") {
  private lazy val spark = SparkTestSession.spark

  private val key: Gen[Option[Int]] = Gen.frequency(
    9 -> Gen.chooseNum(0, 3).map(Some(_)), 1 -> Gen.const(None))
  private val ts: Gen[Option[Long]] = Gen.frequency(
    9 -> Gen.chooseNum(0L, 20L).map(Some(_)), 1 -> Gen.const(None))

  private val lefts: Gen[List[(Option[Int], Option[Long])]] =
    Gen.nonEmptyListOf(Gen.zip(key, ts))
  private val rights: Gen[Map[(Option[Int], Option[Long]), Long]] =
    Gen.listOf(Gen.zip(Gen.zip(key, ts), Gen.chooseNum(1L, 1000L)))
      .map(_.toMap)

  property("as-of join == per-row latest-version reference") =
    Prop.forAll(lefts, rights) { (ls, rs) =>
      import spark.implicits._
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "k", "lts")
      val rseq = rs.toSeq
      val right = rseq.map { case ((k, t), p) => (k, t, p) }
        .toDF("rk", "rts", "payload")

      val got = AsOf.join(left, right,
          Seq(left("k")), Seq(right("rk")), left("lts"), right("rts"))
        .select("id", "payload")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      val expect = ls.zipWithIndex.map { case ((k, lt), i) =>
        i.toLong -> (lt match {
          case None => None
          case Some(t) =>
            val hits = rseq.collect {
              case ((rk, Some(rt)), p) if rk == k && rt <= t => (rt, p)
            }
            if (hits.isEmpty) None else Some(hits.maxBy(_._1)._2)
        })
      }.toMap

      got == expect
    }
}
