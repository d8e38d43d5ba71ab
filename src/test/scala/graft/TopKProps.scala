package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.ml.{Similarity, Vectors}

/** Property check for brute-force cosine top-k: the broadcast-join +
  * ranked-window pipeline must equal a plain-Scala all-pairs scan.
  * Components are thousandths (k/1000f), so quantization is exact by
  * construction and both sides run the identical integer-dot /
  * double-sqrt formula — bitwise-equal cosines, no tolerance. A
  * constant leading component keeps every norm nonzero.
  */
object TopKProps extends Properties("graft.topk") {
  private lazy val spark = SparkTestSession.spark

  private val vecs: Gen[List[List[Int]]] =
    Gen.chooseNum(2, 15).flatMap(n => Gen.listOfN(n,
      Gen.listOfN(4, Gen.chooseNum(-500, 500)).map(1000 :: _)))

  property("topKBruteForce == all-pairs scan reference") =
    Prop.forAll(vecs) { ints =>
      import spark.implicits._
      val df = ints.zipWithIndex
        .map { case (c, i) => (i.toLong, c.map(_ / 1000.0f)) }
        .toDF("vec_id", "embedding")
      val got = Similarity.topKBruteForce(df)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(1), r.getDouble(2))))
        .toMap

      val qs = ints.map(_.map(_.toLong)).zipWithIndex
      val n2 = qs.map { case (q, _) => q.map(x => x * x).sum }
      val expect = qs.take(Similarity.NumProbes).flatMap { case (qp, p) =>
        qs.filter(_._2 != p)
          .map { case (qv, v) =>
            val dot = qp.zip(qv).map { case (a, b) => a * b }.sum
            (v.toLong, dot.toDouble / math.sqrt((n2(p) * n2(v)).toDouble))
          }
          .sortBy { case (v, cos) => (-cos, v) }
          .take(Similarity.TopK)
          .zipWithIndex
          .map { case ((v, cos), rk) => (p.toLong, rk + 1L) -> ((v, cos)) }
      }.toMap

      got == expect
    }
}
