package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

/** Property checks for the native vec_outer_sum aggregate: for
  * arbitrary grouped long-vector inputs, the flattened upper-triangle
  * Σ xᵢxⱼ equals a driver-side fold regardless of partitioning
  * (exercising update/merge/serialize differently per run).
  */
object VecOuterSumProps extends Properties("graft.vecoutersum") {
  private lazy val spark = SparkTestSession.spark

  private val dim = 5
  private val vec: Gen[Seq[Long]] =
    Gen.listOfN(dim, Gen.chooseNum(-1000L, 1000L)).map(_.toSeq)
  private val rows: Gen[List[(Int, Seq[Long])]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 3), vec))

  private def outer(v: Seq[Long]): Seq[Long] =
    for (i <- 0 until dim; j <- i until dim) yield v(i) * v(j)

  property("vec_outer_sum == driver fold under any partitioning") =
    Prop.forAll(rows, Gen.chooseNum(1, 7)) { (data, parts) =>
      import spark.implicits._
      val df = data.toDF("g", "q").repartition(parts, col("g"), col("q"))
      val got = df.groupBy(col("g"))
        .agg(graft.functions.VecOuterSum.vecOuterSum(col("q")).as("s"))
        .collect()
        .map(r => r.getAs[Int]("g") ->
          r.getAs[collection.Seq[Long]]("s").toSeq).toMap
      val expect = data.groupBy(_._1).view.mapValues(
        _.map(v => outer(v._2)).reduce((a, b) =>
          a.zip(b).map { case (x, y) => x + y }))
      got.keySet == expect.keySet &&
        expect.forall { case (g, v) => got(g) == v }
    }
}
