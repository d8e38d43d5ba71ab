package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Corpus

/** Pins the quality-score reliability diagram:
  *
  *  1. PARTITION — the bins tile the corpus (Σ n_docs = |corpus|,
  *     bins 1..n, sizes differ by ≤ 1 — the exact NTILE law).
  *  2. ORDER — bins are score-ascending: each bin's min_score is ≥
  *     the previous bin's max_score, and pass counts never exceed
  *     bin size.
  *  3. SEPARATION — on a corpus built from clear hard-gate failures
  *     (short docs) and clear passes (long stopword-bearing prose),
  *     the bottom bins read pass_rate 0 and the top bins 1.
  */
class QualityCalibrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(53)
  // clear failures: < 50 tokens. clear passes: 60+ tokens of
  // stopword-rich prose with 3-10 char words.
  private val words = Vector("the", "and", "with", "from", "table",
    "spark", "engine", "corpus", "window", "stream")
  private def prose(n: Int): String =
    Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
  private val docs = (0L until 100L).map { id =>
    val txt = if (id % 2 == 0) prose(5 + rnd.nextInt(20))
    else prose(60 + rnd.nextInt(40))
    (id, txt, "s")
  }
  private lazy val out = Corpus.qualityCalibration(
    docs.toDF("doc_id", "text", "source"), col("text"))
    .select("bin", "n_docs", "n_pass", "pass_rate", "min_score", "max_score")
    .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)

  test("bins tile the corpus with NTILE sizes") {
    assert(out.map(_._1).toSeq === (1L to 10L))
    assert(out.map(_._2).sum === docs.length.toLong)
    assert(out.map(_._2).max - out.map(_._2).min <= 1L)
  }

  test("bins are score-ascending and pass counts bounded") {
    out.sliding(2).foreach {
      case Array(a, b) => assert(b._5 >= a._6, s"bin ${b._1} order")
      case _ =>
    }
    for (r <- out) {
      assert(r._3 <= r._2)
      assert(r._5 <= r._6)
      assert(math.abs(r._4 - r._3.toDouble / r._2.toDouble) < 1e-12)
    }
  }

  test("hard-gate separation shows in the ramp") {
    // bottom half of the score order = the short docs: all fail the
    // 50-token rule; top bins = long prose: all pass every rule
    assert(out.take(3).forall(_._4 === 0.0), "bottom bins all-fail")
    assert(out.takeRight(3).forall(_._4 === 1.0), "top bins all-pass")
  }
}
