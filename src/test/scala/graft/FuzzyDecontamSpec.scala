package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Corpus

/** Pins the NEAR-dup decontamination gate's contracts:
  *
  *  1. VERBATIM LEAK — a train doc that is an exact copy of an eval
  *     doc is a candidate (all bands collide), verifies at Jaccard
  *     1.0, and counts as a match.
  *  2. NEAR LEAK — a train doc sharing most of an eval doc's
  *     shingles (one word changed) verifies at Jaccard ≥ 0.5.
  *  3. EXPLICIT ZEROS — every train doc reports a row; a train set
  *     with disjoint vocabulary reports all zeros (clean ≠ absent),
  *     including docs too short to shingle.
  *  4. BOUNDARY — eval docs never appear in the output.
  */
class FuzzyDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val evalText =
    "the quick brown fox jumps over the lazy dog near the old river bank today"

  private def run(rows: Seq[(Long, String, String)]) =
    Corpus.fuzzyDecontaminationScores(
      rows.toDF("doc_id", "text", "source"), col("source") === "eval")
      .select("doc_id", "n_candidates", "n_matches", "max_jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("verbatim and near-verbatim leaks verify; clean docs report zeros") {
    val near = evalText.replace("jumps", "leaps")
    val rows = Seq(
      (1L, evalText, "eval"),
      (10L, evalText, "train"),                       // verbatim leak
      (11L, near, "train"),                           // near leak
      (12L, "completely different words about spark engines", "train"),
      (13L, "so tiny", "train"))                      // too short to shingle
    val r = run(rows)
    assert(r.keySet === Set(10L, 11L, 12L, 13L), "train rows only")
    assert(r(10L)._2 >= 1L && r(10L)._3 >= 1L, "verbatim: candidate + match")
    assert(r(10L)._4 === 1.0, "verbatim: exact Jaccard 1")
    assert(r(11L)._3 >= 1L, "near leak verifies at tau 0.5")
    assert(r(11L)._4 >= 0.5 && r(11L)._4 < 1.0)
    assert(r(13L) === ((13L, 0L, 0L, 0.0)), "short doc scores explicit 0")
  }

  test("disjoint-vocabulary corpus reports all zeros") {
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "eval"),
      (2L, "one two three four five six seven", "train"),
      (3L, "red green blue yellow purple orange", "train"))
    val r = run(rows)
    assert(r.keySet === Set(2L, 3L))
    for (id <- Seq(2L, 3L))
      assert(r(id) === ((id, 0L, 0L, 0.0)), s"doc $id clean zeros")
  }
}
