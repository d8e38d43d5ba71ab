package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable
import graft.ml.TextAnalysis

/** Pins the held-out LM evaluation against an INDEPENDENT plain-Scala
  * fold (java md5 split gate + train-half counts + bit-length log2):
  *
  *  1. REFERENCE — every per-source row matches the fold exactly.
  *  2. NO LEAKAGE — a token that occurs only in held-out documents is
  *     OOV (the model cannot have seen it), and in-vocab + OOV tile
  *     the held-out token count.
  */
class HeldoutPerplexitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def isTrain(source: String, id: Long): Boolean =
    refHash(s"$source#$id#split") % 1000 < 800

  private def log2floor(q: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(q)

  test("heldout perplexity matches the plain-Scala fold; OOV is airtight") {
    val rnd = new scala.util.Random(61)
    val vocab = Vector.tabulate(30)(i => s"v$i")
    val docs = (0L until 80L).map { id =>
      val n = 6 + rnd.nextInt(25)
      // held-out docs occasionally emit a token the train half can
      // never contain (named by their own id) -> guaranteed OOV
      val base = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val toks = if (!isTrain(s"s${id % 4}", id) && id % 5 == 0)
        base :+ s"unique$id" else base
      (id, toks.mkString(" "), s"s${id % 4}")
    }
    // reference fold
    val toksOf = docs.map { case (id, t, s) =>
      (id, s, Portable.normTextJvm(t).split(" ").filter(_.nonEmpty).toSeq)
    }
    val trainTf = toksOf
      .filter { case (id, s, _) => isTrain(s, id) }
      .flatMap(_._3).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nTrain = trainTf.values.sum
    val want = toksOf
      .filter { case (id, s, _) => !isTrain(s, id) }
      .flatMap { case (_, s, ts) => ts.map(t => (s, t)) }
      .groupBy(_._1).map { case (src, rows) =>
        val sur = rows.map(_._2).map(t => trainTf.get(t).map(tf =>
          log2floor(nTrain / tf)))
        val inv = sur.flatten
        src -> (rows.size.toLong, inv.size.toLong,
          (sur.size - inv.size).toLong, inv.sum)
      }
    val got = TextAnalysis.heldoutPerplexity(
      docs.toDF("doc_id", "text", "source"), col("text"))
      .select("source", "n_tokens", "n_invocab", "n_oov", "oov_rate",
        "sum_surprise", "avg_surprise")
      .as[(String, Long, Long, Long, Double, Long, Double)].collect()
    assert(got.map(_._1).toSet === want.keySet)
    for ((src, nTok, nInv, nOov, oovRate, sumSur, avgSur) <- got) {
      val (wTok, wInv, wOov, wSum) = want(src)
      assert((nTok, nInv, nOov, sumSur) === ((wTok, wInv, wOov, wSum)), src)
      assert(nInv + nOov === nTok, s"$src tiling")
      assert(math.abs(oovRate - nOov.toDouble / nTok.toDouble) < 1e-12)
      assert(math.abs(avgSur - sumSur.toDouble / nInv.toDouble) < 1e-12)
    }
    // every planted unique token is held-out by construction, so the
    // model can never have seen one: each contributes exactly one OOV
    val planted = toksOf.count { case (id, s, _) =>
      !isTrain(s, id) && id % 5 == 0
    }
    assert(planted >= 1, "corpus must plant at least one OOV doc")
    assert(got.map(_._4).sum >= planted.toLong, "planted OOVs all surface")
  }

  test("a source with no scorable held-out tokens reports an explicit zero row") {
    // "emp" docs are all EMPTY TEXT: whatever split they hash into,
    // they contribute zero held-out tokens — pre-r13 the source
    // silently vanished from the report ("not evaluated" and
    // "evaluated, zero tokens" were indistinguishable); the
    // |sources|-row contract demands an explicit zero row
    val docs = (
      (0L until 12L).map(id => (id, s"alpha beta gamma token$id", "norm")) ++
        (100L until 110L).map(id => (id, "", "emp"))
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.heldoutPerplexity(docs, col("text"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet === Set("norm", "emp"),
      "output must carry one row per distinct source")
    val z = got("emp")
    assert(z.getAs[Long]("n_tokens") === 0L)
    assert(z.getAs[Long]("n_invocab") === 0L)
    assert(z.getAs[Long]("n_oov") === 0L)
    assert(z.getAs[Double]("oov_rate") === 0.0)
    assert(z.getAs[Long]("sum_surprise") === 0L)
    assert(z.getAs[Double]("avg_surprise") === 0.0)
  }
}
