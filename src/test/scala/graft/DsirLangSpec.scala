package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Corpus, TextAnalysis}

/** Round-11 LLM-pipeline additions: DSIR-style targeted selection
  * (hashed-unigram importance weights, exact-integer log-ratio,
  * pure rank cut) and the code-switching detector (per-half
  * language-ID disagreement).
  */
class DsirLangSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dsir: raw docs resembling the target outrank the rest; cut is exact") {
    import spark.implicits._
    // target speaks "alpha beta"; raw pool has 2 target-like docs and
    // 8 unrelated ones — the 20% cut must select exactly the 2 lookalikes
    val target = (0 until 10).map(i => (i.toLong, "tgt", "alpha beta alpha beta"))
    val like = (10 until 12).map(i => (i.toLong, s"raw${i % 4}", "alpha beta gamma"))
    val other = (12 until 20).map(i => (i.toLong, s"raw${i % 4}", "zzz yyy xxx www"))
    val docs = (target ++ like ++ other).toDF("doc_id", "source", "text")
    val out = Corpus.dsirSelect(docs, col("text"), "tgt", selPct = 20).collect()
    // the target source never appears in the census
    assert(!out.exists(_.getString(0) == "tgt"))
    val nDocs = out.map(_.getAs[Long]("n_docs")).sum
    val nSel = out.map(_.getAs[Long]("n_selected")).sum
    assert(nDocs === 10L)
    assert(nSel === 2L) // ceil(10 * 20 / 100)
    // the selected mass sits in the sources holding the lookalikes
    val selBySource = out.map(r =>
      r.getString(0) -> r.getAs[Long]("n_selected")).toMap
    assert(selBySource("raw2") === 1L && selBySource("raw3") === 1L)
    // lookalike tokens hit target-heavy buckets: their weight sums
    // must exceed every unrelated doc's (which only hit raw buckets)
    val likeSources = Set("raw2", "raw3")
    out.filter(r => likeSources(r.getString(0))).foreach { r =>
      assert(r.getAs[Long]("selected_logw_int") > 0L)
    }
  }

  test("dsir: weights are anti-symmetric in the distributions they compare") {
    import spark.implicits._
    // one raw doc made ONLY of target-exclusive tokens vs one made
    // ONLY of raw-exclusive tokens: the first must rank above
    val docs = Seq(
      (0L, "tgt", "qq rr qq rr qq rr"),
      (1L, "raw", "qq rr"),
      (2L, "raw", "ss tt ss tt ss tt ss tt")).toDF("doc_id", "source", "text")
    val out = Corpus.dsirSelect(docs, col("text"), "tgt", selPct = 50)
      .collect()
    val raw = out.find(_.getString(0) == "raw").get
    assert(raw.getAs[Long]("n_docs") === 2L)
    assert(raw.getAs[Long]("n_selected") === 1L)
    // doc 1 (target-like) is the selected one: its logw (positive)
    // is the selected mass, doc 2's (negative) is excluded
    assert(raw.getAs[Long]("selected_logw_int") > 0L)
    assert(raw.getAs[Long]("sum_logw_int") <
      raw.getAs[Long]("selected_logw_int"))
  }

  test("lang consistency: mixed, thin, and consistent verdicts") {
    import spark.implicits._
    val docs = Seq(
      // clean English both halves
      (0L, "en", "the cat is of the house and the dog is a friend"),
      // English first half, German second half -> mixed
      (1L, "xx", "the cat is of the house der hund ist und das der die"),
      // markers only in the first half -> thin
      (2L, "en", "the of and is a zz yy xx ww vv uu"),
      // no markers anywhere -> consistent (und everywhere)
      (3L, "und", "zz yy xx"),
      // empty text -> consistent
      (4L, "und", "")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langConsistency(docs, col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getString(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out(0L)._4 === "consistent" && out(0L)._1 === "en")
    assert(out(1L)._4 === "mixed")
    assert(out(1L)._2 === "en" && out(1L)._3 === "de")
    assert(out(2L)._4 === "thin" && out(2L)._2 === "en" &&
      out(2L)._3 === "und")
    assert(out(3L) === (("und", "und", "und", "consistent")))
    assert(out(4L) === (("und", "und", "und", "consistent")))
  }

  test("bpe fertility: per-language totals reconcile with the per-source encode") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val byLang = TextAnalysis.bpeFertility(docs, col("text")).collect()
    val bySource = TextAnalysis.bpeEncode(docs, col("text")).collect()
    // same corpus, same trained vocabulary -> identical piece/token mass
    assert(byLang.map(_.getAs[Long]("n_pieces")).sum ===
      bySource.map(_.getAs[Long]("n_pieces")).sum)
    assert(byLang.map(_.getAs[Long]("n_tokens")).sum ===
      bySource.map(_.getAs[Long]("n_tokens")).sum)
    // a piece never covers more than a word: fertility >= 1 everywhere
    byLang.foreach(r => assert(r.getAs[Double]("fertility") >= 1.0))
    // planted multilingual tax: an en-dominant census spends merges on
    // en pairs, so a German-heavy doc set pays MORE pieces per word
    val planted = (
      (0 until 40).map(i => (i.toLong, "the of and is a " * 6 + s"house$i")) ++
      (40 until 50).map(i =>
        (i.toLong, "der die das und ist " * 6 + s"haus$i")))
      .toDF("doc_id", "text")
    val f = TextAnalysis.bpeFertility(planted, col("text")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("fertility")).toMap
    assert(f.contains("en") && f.contains("de"))
    assert(f("de") > f("en"))
  }

  test("gopher rules: each planted violation trips exactly its rule") {
    import spark.implicits._
    // 50 words, 2 stopwords, mean length ~5, all alphabetic
    val good = "the of " + (1 to 48).map(i => "word" + i).mkString(" ")
    val docs = Seq(
      (0L, "s", good),
      // 4 words with healthy mean length and 2 stopwords: only wc trips
      (1L, "s", "the of elephants elephants"),
      // 2 stopwords + 48 twelve-char words: only mean length trips
      (2L, "s", "the of " + Seq.fill(48)("w" * 12).mkString(" ")),
      // 50 alphabetic words, zero stopwords: only the stopword rule trips
      (3L, "s", (1 to 50).map(i => "xyzzy" + i).mkString(" ")),
      // 2 stopwords + 10 alphabetic + 38 numeric words: only alpha trips
      (4L, "s", "the of " + (1 to 10).map(i => "word" + i).mkString(" ") +
        " " + Seq.fill(38)("12345").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val r = Corpus.gopherRules(docs, col("text")).collect()(0)
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_fail_wordcount") === 1L)
    assert(r.getAs[Long]("n_fail_meanlen") === 1L)
    assert(r.getAs[Long]("n_fail_stopwords") === 1L)
    assert(r.getAs[Long]("n_fail_alpha") === 1L)
    assert(r.getAs[Long]("n_keep") === 1L)
  }

  test("contamination curve: wider n-grams flag strictly less; planted leaks land per width") {
    import spark.implicits._
    val evalText = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12 e13 e14"
    val docs = Seq(
      (0L, "eval", evalText),
      // shares an 8-token run with eval -> flagged at 3 and 8, not 13
      (1L, "raw", "x1 x2 e1 e2 e3 e4 e5 e6 e7 e8 y1 y2"),
      // shares only a 3-token run -> flagged at 3 only
      (2L, "raw", "z1 e1 e2 e3 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11"),
      // shares nothing -> never flagged
      (3L, "raw", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14"))
      .toDF("doc_id", "source", "text")
    val out = Corpus.contaminationCurve(docs, col("source") === "eval")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_contaminated"))).toMap
    assert(out(3L) === ((3L, 2L)))
    assert(out(8L) === ((3L, 1L)))
    assert(out(13L) === ((3L, 0L)))
  }

  test("lang consistency: halves partition the token stream exactly (odd lengths)") {
    import spark.implicits._
    // 5 tokens: h1 = first 2, h2 = last 3 — the German evidence sits
    // in token 5, which a truncating half-split would drop
    val docs = Seq((0L, "xx", "the the zz der und"))
      .toDF("doc_id", "lang", "text")
    val r = TextAnalysis.langConsistency(docs, col("text")).collect()(0)
    assert(r.getString(3) === "en")
    assert(r.getString(4) === "de")
    assert(r.getString(5) === "mixed")
  }
}
