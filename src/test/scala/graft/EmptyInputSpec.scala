package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeFeed
import graft.ml.{Corpus, Dedup, Similarity}
import graft.operators.Analytics
import graft.plans.AsOf

/** Zero-row inputs through every DataFrame-taking core: each must
  * plan and execute to an empty (or correctly-degenerate) result,
  * never throw. The oracle harness can't see this class of defect —
  * every driver table is non-empty — and window/aggregate plans are
  * where empty-relation edge cases (first/last over nothing, min of
  * no rows, global agg producing one row) hide.
  */
class EmptyInputSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def emptyEvents =
    Seq.empty[(Long, Long, Timestamp, String, Double)]
      .toDF("user_id", "event_id", "ts", "event_type", "value")

  test("windowed event cores run on zero rows") {
    assert(Analytics.sessionize(emptyEvents).count() === 0L)
    assert(Analytics.rollingActive(emptyEvents).count() === 0L)
    assert(Analytics.retention(emptyEvents).count() === 0L)
    assert(Analytics.attribution(emptyEvents).count() === 0L)
    assert(Analytics.attributionFirstTouch(emptyEvents).count() === 0L)
    assert(Analytics.eventGaps(
      Seq.empty[(Long, Long)].toDF("user_id", "event_id")).count() === 0L)
    // global aggregate with no groups: one-row schema contract gives
    // zero rows only because funnel groups per user first
    assert(Analytics.funnel(emptyEvents).collect()(0).getLong(0) === 0L)
  }

  test("median and packing cores run on zero rows") {
    assert(Analytics.medianPrice(
      Seq.empty[(String, Double, Long)]
        .toDF("o_orderpriority", "o_totalprice", "o_orderkey"))
      .count() === 0L)
    assert(Corpus.packed(
      Seq.empty[(String, Long, String)].toDF("source", "doc_id", "text"),
      budgetTokens = 8).count() === 0L)
  }

  test("CDC apply cores run on zero rows") {
    val changes = Seq.empty[(Long, Long, String)].toDF("k", "seq", "op")
    assert(ChangeFeed.applyChanges(changes, Seq("k"), Seq(col("seq"))).count() === 0L)
    assert(ChangeFeed.latestPerKey(changes, Seq("k"), Seq(col("seq"))).count() === 0L)
  }

  test("as-of join with an empty right side keeps all left rows unmatched") {
    val left = Seq((1L, 5L)).toDF("k", "lts")
    val right = Seq.empty[(Long, Long, Long)].toDF("rk", "rts", "payload")
    val out = AsOf.join(left, right,
      Seq(left("k")), Seq(right("rk")), left("lts"), right("rts")).collect()
    assert(out.length === 1 && out(0).isNullAt(3))
    val emptyLeft = right.select(col("rk").as("k2"), col("rts").as("t2"))
    val noLeft = AsOf.join(emptyLeft, left,
      Seq(emptyLeft("k2")), Seq(left("k")), emptyLeft("t2"), left("lts"))
    assert(noLeft.count() === 0L)
  }

  test("dedup and similarity cores run on zero rows") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashPairs(docs).count() === 0L)
    assert(Dedup.simhashNearPairs(docs).count() === 0L)
    assert(Similarity.topKBruteForce(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")).count() === 0L)
  }

  test("round-10 text/corpus cores run on zero rows") {
    import graft.ml.TextAnalysis
    val docs = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "source", "text", "n_chars")
    assert(TextAnalysis.burstiness(docs, col("text")).count() === 0L)
    assert(TextAnalysis.zipfOctaves(docs, col("text")).count() === 0L)
    assert(TextAnalysis.asciiProfile(docs, col("text")).count() === 0L)
    assert(TextAnalysis.qualityLengthCorr(docs, col("text")).count() === 0L)
    assert(TextAnalysis.charLm(docs, col("text")).count() === 0L)
    assert(Corpus.dedupImpact(docs).count() === 0L)
    assert(Corpus.annealMix(docs).count() === 0L)
  }

  test("round-10d cores run on zero rows") {
    import graft.ml.TextAnalysis
    // experimentation/growth set: empty feeds yield empty censuses —
    // except conversionLag, whose global-aggregate contract is ONE
    // row of zeros (the signup denominator exists even when nobody
    // signed up; the rate is then 0/0 = NaN, matching the oracle)
    assert(Analytics.cupedOn(emptyEvents).count() === 0L)
    assert(Analytics.srmOn(emptyEvents).count() === 0L)
    assert(Analytics.cohortLtvOn(emptyEvents).count() === 0L)
    val lag = Analytics.conversionLagOn(emptyEvents).collect()
    assert(lag.length === 1 && lag(0).getAs[Long]("n_converted") === 0L)
    // checkpoint frontier + schema timeline on an empty feed
    val changes = Seq.empty[(Long, Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "partition_key")
    assert(graft.cdc.Retention.checkpointFrontier(changes).count() === 0L)
    assert(graft.cdc.TableStatistics.schemaTimeline(
      Seq.empty[(String, Timestamp, String)]
        .toDF("table_name", "ts", "props")).count() === 0L)
    // corpus-triage set over an empty corpus
    val docs = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "text", "source", "n_chars")
    assert(TextAnalysis.vocabCoverage(docs, col("text")).count() === 0L)
    assert(TextAnalysis.ccnetBuckets(docs, col("text")).count() === 0L)
    assert(TextAnalysis.codeDetect(docs, col("text")).count() === 0L)
    assert(TextAnalysis.langidMargin(docs, col("text")).count() === 0L)
    assert(Dedup.minhashImpact(docs).count() === 0L)
    assert(Dedup.minhashSurvivorship(docs).count() === 0L)
    // graph census on an empty edge relation
    assert(Similarity.triangleCensus(
      Seq.empty[(Long, Long)].toDF("src", "dst"),
      Seq.empty[(Long, Long)].toDF("vec_id", "label")).count() === 0L)
    // the new rank helper on zero rows
    assert(graft.functions.Ranks.groupedWithSum(
      Seq.empty[(Long, Long)].toDF("v", "id"),
      Nil, Seq("v", "id"), "v").count() === 0L)
  }

  test("round-10 graph/embedding cores run on zero rows") {
    val embs = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.tripletMining(embs).count() === 0L)
    assert(Similarity.anisotropy(embs).count() === 0L)
    assert(Similarity.graphSearch(embs).count() === 0L)
    assert(Similarity.prefixRecallCurve(embs).count() === 0L)
    assert(Similarity.pageRank(embs).count() === 0L)
    // fixed-round census operators emit their census rows with zero
    // counts rather than an empty relation — the round axis is the
    // contract, the counts carry the emptiness
    val kcore = Similarity.knnKcore(embs).collect()
    assert(kcore.length === Similarity.KcoreRounds + 1 &&
      kcore.forall(_.getAs[Long]("n_alive") === 0L))
    assert(Analytics.markovStationary(emptyEvents).count() === 0L)
  }
}
