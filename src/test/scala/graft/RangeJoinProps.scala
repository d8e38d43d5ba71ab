package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Property check for the bucketized range join: on RANDOM interval
  * sets (negative epochs, zero-length, bucket-straddling, heavily
  * overlapping) and random bucket widths, the bucketized equi-join
  * must produce exactly the naive cross-join BETWEEN result — no
  * missing pairs at bucket boundaries, no duplicates from the
  * interval explode. Case counts are small because every case runs a
  * Spark job.
  */
object RangeJoinProps extends Properties("graft.rangejoin") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val cases: Gen[(List[(Long, Long)], List[Long], Long)] = for {
    nIv <- Gen.chooseNum(1, 12)
    ivs <- Gen.listOfN(nIv, for {
      lo <- Gen.chooseNum(-500L, 500L)
      len <- Gen.chooseNum(0L, 400L)
    } yield (lo, lo + len))
    nPt <- Gen.chooseNum(1, 40)
    pts <- Gen.listOfN(nPt, Gen.chooseNum(-600L, 1000L))
    w <- Gen.oneOf(1L, 7L, 64L, 100L, 1000L)
  } yield (ivs, pts, w)

  property("bucketized == naive BETWEEN on random inputs") =
    Prop.forAll(cases) { case (ivs, pts, w) =>
      import spark.implicits._
      val iv = ivs.zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iv_id", "lo", "hi")
      val pt = pts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("pt_id", "t")
      val got = RangeJoin.pointInInterval(
          pt, col("t"), iv, col("lo"), col("hi"), bucketUs = w)
        .select(col("pt_id"), col("iv_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val naive = pt.crossJoin(iv)
        .filter(col("t") >= col("lo") && col("t") <= col("hi"))
        .select(col("pt_id"), col("iv_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // set equality AND no duplicates in the bucketized output
      got.toSet == naive && got.length == got.toSet.size
    }
}
