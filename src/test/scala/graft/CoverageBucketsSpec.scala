package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Corpus, Dedup, TextAnalysis}

/** Pins the round's corpus-triage trio: the vocabulary coverage
  * elbow against a hand-counted census (power-of-two checkpoints, a
  * final row that always reaches coverage 1.0), the CCNet buckets'
  * NTILE shape + score ordering, and the impact-trio dominance law
  * (exact-dup removal can never exceed MinHash removal — every
  * exact-dup pair is an LSH candidate with Jaccard 1 ≥ τ, and the
  * shared global-min canonical keeps the same survivor).
  */
class CoverageBucketsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("vocab coverage matches a hand census and ends at 1.0") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.vocabCoverage(docs, col("text"))
      .select("vocab_size", "tok", "covered_tokens", "total_tokens",
        "coverage")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq === Seq(
      (1L, "a", 3L, 6L, 0.5),
      (2L, "b", 5L, 6L, 5.0 / 6.0),
      (3L, "c", 6L, 6L, 1.0)))
    // |V| a power of two: the final row is emitted once, not twice
    val docs4 = Seq((1L, "a a a b b c d")).toDF("doc_id", "text")
    val sizes = TextAnalysis.vocabCoverage(docs4, col("text"))
      .select("vocab_size").as[Long].collect().toSeq
    assert(sizes === Seq(1L, 2L, 4L))
  }

  test("ccnet buckets: NTILE shape, score ordering, full partition") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = TextAnalysis.ccnetBuckets(docs, col("text")).collect()
    val byLang = rows.groupBy(_.getAs[String]("pred_lang"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    byLang.foreach { case (_, rs) =>
      val counts = rs.sortBy(_.getAs[Long]("bucket"))
        .map(_.getAs[Long]("n_docs"))
      // NTILE(3): sizes differ by at most one, earlier tiles never smaller
      assert(counts.max - counts.min <= 1L)
      assert(counts.sameElements(counts.sorted.reverse))
      // head is the most familiar band: min over head ≥ max over next
      val byBucket = rs.map(r =>
        r.getAs[Long]("bucket") -> r).toMap
      for (b <- 1L until rs.length.toLong)
        assert(byBucket(b).getAs[Double]("min_score") >=
          byBucket(b + 1).getAs[Double]("max_score"))
    }
  }

  test("survivorship rows re-aggregate to exactly the impact removals") {
    val docs = Tables.load(spark, sf, "documents")
    val byLoser = Dedup.minhashSurvivorship(docs).collect()
      .groupBy(_.getAs[String]("loser_source")).view
      .mapValues(rs => (rs.map(_.getAs[Long]("n_docs_lost")).sum,
        rs.map(_.getAs[Long]("chars_lost")).sum)).toMap
    val impact = Dedup.minhashImpact(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_removed"), r.getAs[Long]("chars_removed"))).toMap
    impact.foreach { case (src, (n, ch)) =>
      assert(byLoser.getOrElse(src, (0L, 0L)) === ((n, ch)),
        s"source $src: survivorship and impact disagree")
    }
  }

  test("langid margin: ties land in bucket 0 under the alphabetical winner") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "der die the a"),        // de 2 vs en 2: tie → de, margin 0
      (2L, "the a of and is"),      // en 5, margin 5 → bucket 3
      (3L, "xyzzy plugh")           // no markers → und, margin 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langidMargin(docs, col("text")).collect()
      .map(r => (r.getAs[String]("pred_lang"),
        r.getAs[Long]("margin_bucket")) -> r.getAs[Long]("n_docs")).toMap
    assert(got === Map(
      ("de", 0L) -> 1L, ("en", 3L) -> 1L, ("und", 0L) -> 1L))
  }

  test("session depth buckets partition the session relation") {
    val spark2 = spark
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("events_session_depth")(spark2, sf)
      .collect()
    val sessions = graft.operators.Analytics.sessionize(
      Tables.load(spark2, sf, "events"))
    assert(rows.map(_.getAs[Long]("n_sessions")).sum === sessions.count())
    assert(rows.map(_.getAs[Long]("n_events_total")).sum ===
      Tables.load(spark2, sf, "events").count())
    assert(math.abs(rows.map(_.getAs[Double]("session_share")).sum - 1.0)
      < 1e-9)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("min_depth") >= (1L << b))
      assert(r.getAs[Long]("max_depth") < (2L << b))
    }
  }

  test("impact dominance: exact-dup removal never exceeds MinHash removal") {
    val docs = Tables.load(spark, sf, "documents")
    // dedupImpact reports the KEPT side; removed = total − kept
    val exact = Corpus.dedupImpact(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs") - r.getAs[Long]("n_kept"),
          r.getAs[Long]("chars_total") - r.getAs[Long]("chars_kept"))).toMap
    val mh = Dedup.minhashImpact(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_removed"), r.getAs[Long]("chars_removed"),
          r.getAs[Double]("docs_removed_share"))).toMap
    assert(exact.keySet === mh.keySet)
    exact.foreach { case (src, (nEx, chEx)) =>
      val (nMh, chMh, share) = mh(src)
      assert(nEx <= nMh, s"source $src: exact $nEx > minhash $nMh")
      assert(chEx <= chMh)
      assert(share >= 0.0 && share <= 1.0)
    }
  }
}
