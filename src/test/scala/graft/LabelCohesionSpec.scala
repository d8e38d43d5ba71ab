package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sums-identity label-cohesion readout against the
  * brute-force pairwise computation it replaces:
  *
  *  1. REFERENCE — intra_num / inter_num equal the explicit ordered
  *     pairwise dot sums over quantized vectors, for every label.
  *  2. SEPARATION — on well-separated clusters every label's margin
  *     is positive; with labels reassigned round-robin (cluster
  *     structure destroyed) no label keeps a large positive margin.
  */
class LabelCohesionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(71)
  private val dim = 8

  /** Three well-separated clusters: basis direction e_{label} plus
    * small noise.
    */
  private def vec(label: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      (if (d == label) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.round(x.toDouble * 1000))

  private def refSums(rows: Seq[(Long, Array[Float], Int)])
      : Map[Int, (Long, Long)] = {
    val q = rows.map { case (_, v, l) => (l, quant(v)) }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    q.map(_._1).distinct.map { l =>
      val in = q.filter(_._1 == l).map(_._2)
      val out = q.filter(_._1 != l).map(_._2)
      val intra = (for (a <- in; b <- in if !(a eq b)) yield dot(a, b)).sum
      val inter = (for (a <- in; b <- out) yield dot(a, b)).sum
      l -> (intra, inter)
    }.toMap
  }

  private def run(rows: Seq[(Long, Array[Float], Int)]) =
    graft.ml.Similarity.labelCohesion(
      rows.toDF("vec_id", "embedding", "label"))
      .select("label", "n_vecs", "intra_num", "intra_pairs", "inter_num",
        "inter_pairs", "mean_intra", "mean_inter", "margin")
      .as[(Int, Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("sums identity equals the brute-force pairwise dot sums") {
    val rows = (0L until 30L).map(id => (id, vec((id % 3).toInt), (id % 3).toInt))
    val want = refSums(rows)
    val got = run(rows)
    assert(got.keySet === want.keySet)
    for ((l, (wIntra, wInter)) <- want) {
      val r = got(l)
      assert(r._3 === wIntra, s"label $l intra")
      assert(r._5 === wInter, s"label $l inter")
      assert(r._4 === r._2 * (r._2 - 1), s"label $l intra pairs")
      assert(r._6 === r._2 * (30L - r._2), s"label $l inter pairs")
      assert(math.abs(r._9 - (r._7 - r._8)) < 1e-12, s"label $l margin")
    }
  }

  test("separated clusters score positive margins; shuffled labels do not") {
    val rows = (0L until 30L).map(id => (id, vec((id % 3).toInt), (id % 3).toInt))
    val tight = run(rows)
    for ((l, r) <- tight) assert(r._9 > 0.0, s"label $l tight margin")
    // reassign labels round-robin against the cluster id: every label
    // now holds an equal mix of all three clusters
    val shuffled = rows.map { case (id, v, _) => (id, v, ((id / 3) % 3).toInt) }
    val loose = run(shuffled)
    val worstTight = tight.values.map(_._9).min
    for ((l, r) <- loose)
      assert(r._9 < worstTight, s"label $l shuffled margin must collapse")
  }
}
