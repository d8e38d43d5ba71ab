package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Similarity

/** Pins `Similarity.quantRecallCurve` against an independent plain-
  * Scala fold (quantize → per-vector requant → cosine rank → top-k →
  * recall), NOT a re-derivation of the SQL — the same
  * shared-formula-bug defense as the other property suites.
  */
class QuantRecallSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Half-away-from-zero rounding — what Spark round() and DuckDB
    * round() both do on doubles.
    */
  private def rnd(d: Double): Long =
    (if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)).toLong

  test("quantRecallCurve equals a driver-side fold on a deterministic fixture") {
    import spark.implicits._
    // 20 vectors, dim 4, integer-valued components in [-11, 11] so
    // the *1000 quantization is exact (no float-boundary ambiguity)
    val raw = (0 until 20).map { id =>
      (id.toLong,
        Array.tabulate(4)(j => (((id * 7 + j * 3) % 23) - 11).toFloat),
        id % 3)
    }
    val embs = raw.toDF("vec_id", "embedding", "label")
    val got = Similarity.quantRecallCurve(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // independent fold
    val q = raw.map { case (id, v, _) => id -> v.map(x => (x * 1000).toLong) }.toMap
    def topK(vecs: Map[Long, Array[Long]]): Map[Long, Seq[Long]] = {
      val live = vecs.filter(_._2.exists(_ != 0L))
      live.keys.filter(_ < Similarity.NumProbes).map { p =>
        val qp = live(p)
        val ranked = live.toSeq.filter(_._1 != p).map { case (id, qc) =>
          val dot = qp.zip(qc).map { case (a, b) => a * b }.sum
          val n2p = qp.map(x => x * x).sum.toDouble
          val n2c = qc.map(x => x * x).sum.toDouble
          (id, dot.toDouble / math.sqrt(n2p * n2c))
        }.sortBy { case (id, c) => (-c, id) }.take(Similarity.TopK)
        p -> ranked.map(_._1)
      }.toMap
    }
    val exact = topK(q)
    for (b <- Similarity.QuantCurveBits) {
      val l = (1L << (b - 1)) - 1
      val rq = q.map { case (id, v) =>
        val m = math.max(v.map(math.abs).max, 1L)
        id -> v.map(x => rnd(x.toDouble * l / m))
      }
      val approx = topK(rq)
      exact.foreach { case (p, ex) =>
        val ap = approx.getOrElse(p, Seq.empty).toSet
        val want = ex.count(ap.contains).toDouble / ex.size
        assert(got((b.toLong, p)) == want,
          s"bits=$b probe=$p: got ${got((b.toLong, p))}, fold says $want")
      }
    }
  }

  test("quantRecallCurve on sf data: unit range, 8-bit beats 2-bit on average") {
    val rows = SparkEntry.queries("embed_quantize_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    val byBits = rows.groupBy(_.getAs[Long]("n_bits"))
      .view.mapValues(rs => rs.map(_.getAs[Double]("recall_at_k")).sum / rs.length)
    assert(byBits(8L) >= byBits(2L))
  }
}
