package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable
import graft.ml.TextAnalysis

/** Pins the interpolated Kneser-Ney bigram census against an
  * INDEPENDENT plain-Scala model build:
  *
  *  1. REFERENCE — every returned row's counts (raw, context,
  *     follower, continuation, type total) and p_kn match the
  *     reference model bit-for-bit, and the top-20 cut picks exactly
  *     the reference's (count desc, w1, w2) head.
  *  2. NORMALIZATION — the reference model's full-vocabulary
  *     distribution sums to 1 per context (the property the
  *     discount/continuation construction exists to guarantee).
  *  3. CONTINUATION ≠ FREQUENCY — a word planted frequent in ONE
  *     context only gets a lower continuation count than a word seen
  *     across many contexts (the "san francisco" property).
  */
class KnBigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val D = TextAnalysis.KnDiscount

  private case class Model(
      bf: Map[(String, String), Long],
      cv: Map[String, Long],
      follow: Map[String, Long],
      prec: Map[String, Long],
      total: Long)

  private def buildModel(texts: Seq[String]): Model = {
    val bf = texts
      .flatMap { t =>
        val toks = Portable.normTextJvm(t).split(" ").filter(_.nonEmpty)
        toks.sliding(2).filter(_.length == 2).map(a => (a(0), a(1)))
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    Model(
      bf,
      bf.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum },
      bf.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong },
      bf.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong },
      bf.size.toLong)
  }

  private def pkn(m: Model, v: String, w: String): Double =
    ((m.bf((v, w)).toDouble - D) / m.cv(v).toDouble) +
      ((D * m.follow(v).toDouble / m.cv(v).toDouble) *
        (m.prec(w).toDouble / m.total.toDouble))

  test("knBigrams matches the plain-Scala reference model") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector.tabulate(12)(i => s"t$i")
    val texts = Seq.tabulate(25) { _ =>
      Seq.fill(8 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "s") }
      .toDF("doc_id", "text", "source")
    val m = buildModel(texts)
    val want = m.bf.toSeq
      .sortBy { case ((v, w), c) => (-c, v, w) }
      .take(TextAnalysis.KnTopK)
      .map { case ((v, w), c) =>
        (v, w, c, m.cv(v), m.follow(v), m.prec(w), m.total, pkn(m, v, w))
      }
    val got = TextAnalysis.knBigrams(df, col("text"))
      .as[(String, String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got === want)
  }

  test("reference model normalizes to 1 per context over the vocabulary") {
    val m = buildModel(Seq(
      "a b a c a b d c a b",
      "b a c d a b a a c d",
      "c a b d d a b c b a"))
    for (v <- m.cv.keys) {
      val seenMass = m.bf.collect {
        case ((`v`, _), c) => (c.toDouble - D) / m.cv(v).toDouble
      }.sum
      val backoff = D * m.follow(v).toDouble / m.cv(v).toDouble
      // continuation distribution sums to exactly 1 over the vocab
      assert(math.abs(seenMass + backoff - 1.0) < 1e-12, s"context $v")
    }
  }

  test("continuation count discounts the one-context frequent word") {
    // "francisco" appears often but ONLY after "san"; "the" appears
    // after many different words with the same total frequency
    val texts = Seq.fill(6)("san francisco") ++
      Seq("x the", "y the", "z the", "u the", "v the", "w the")
    val m = buildModel(texts)
    assert(m.bf(("san", "francisco")) === 6L)
    assert(m.prec("francisco") === 1L)
    assert(m.prec("the") === 6L)
    assert(pkn(m, "san", "francisco") > 0.0)
    // equal raw bigram counts would rank them equal; continuation
    // separates them in the smoothed backoff term
    assert(m.prec("the") > m.prec("francisco"))
  }
}
