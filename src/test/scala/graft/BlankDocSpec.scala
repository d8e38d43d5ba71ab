package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.TextAnalysis

/** Blank, whitespace-only, and marker-free documents through the
  * text-analysis family: the driver corpus contains none, so these
  * behaviors — no phantom '' token, quality 0 for a tokenless doc,
  * 'und' language abstention, explicit rows (not absence) from the
  * per-doc scorers, stage-consistent PII counts — need their own
  * fixture.
  */
class BlankDocSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, ""),
    (3L, "   \t\n  "),
    (4L, "zzz qqq xxx")) // no marker hits in any language
    .toDF("doc_id", "text")

  test("blank docs tokenize to empty arrays, not ['']") {
    val counts = TextAnalysis.tokenCounts(docs, col("text"))
      .select("doc_id", "n_tokens", "avg_token_len").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(counts(2L) == ((0L, 0.0)) && counts(3L) == ((0L, 0.0)))
    assert(counts(1L)._1 == 6L)
    // the empty string never enters the vocabulary
    val vocab = TextAnalysis.termStats(docs, col("text"))
      .select("tok").collect().map(_.getString(0)).toSet
    assert(!vocab.contains(""))
  }

  test("a tokenless doc scores quality 0; marker-free docs get 'und'") {
    val q = TextAnalysis.quality(docs, col("text"))
      .select("doc_id", "quality_score", "stop_ratio").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(q(2L) == ((0.0, 0.0)) && q(3L) == ((0.0, 0.0)))
    assert(q(1L)._1 > 0.3) // real doc with stopwords scores above floor
    val langs = TextAnalysis.langId(docs, col("text"))
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en")
    assert(langs(2L) == "und" && langs(3L) == "und" && langs(4L) == "und")
  }

  test("per-doc scorers emit explicit rows for tokenless docs") {
    val kw = TextAnalysis.keywords(docs, col("text"))
      .select("doc_id", "keyword").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(kw.keySet == Set(1L, 2L, 3L, 4L))
    assert(kw(2L).isEmpty && kw(3L).isEmpty && kw(1L).nonEmpty)
    val lm = TextAnalysis.unigramLm(docs, col("text"))
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm.keySet == Set(1L, 2L, 3L, 4L) && lm(2L) == 0L)
    val rep = TextAnalysis.repetition(docs, col("text"))
      .select("doc_id", "top_freq", "dup_word_ratio", "top_word_ratio")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(rep(2L) == ((0L, 0.0, 0.0)))
  }

  test("PII counts equal the markers inserted, even when spans nest") {
    val nested = Seq((1L, "reach 555-123-4567@relay.example.com now"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(nested, col("text")).collect()(0)
    assert(r.getAs[Long]("n_emails") == 1L)
    // the phone-shaped span was swallowed by the email redaction:
    // counted per-stage, it is NOT tallied, matching zero <PHONE>
    // markers in the redacted text
    assert(r.getAs[Long]("n_phones") == 0L)
    assert(r.getAs[String]("redacted").contains("<EMAIL>"))
    assert(!r.getAs[String]("redacted").contains("<PHONE>"))
  }
}
