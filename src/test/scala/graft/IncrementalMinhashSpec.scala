package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Dedup

/** Pins the incremental NEAR-dup ingest census against the batch
  * near-dup generator it must agree with:
  *
  *  1. CONSISTENCY — the per-source census derives EXACTLY from
  *     minhashPairs(docs): for each odd (batch) doc, its candidates
  *     are the bucket-cohabiting pairs touching it, split by partner
  *     parity, and its dup flags are n_match ≥ NearDupMatches on
  *     those same pairs. (Both run the same signature/banding
  *     pipeline, so the candidate sets must coincide on the
  *     odd-touching subset — snapshot×snapshot pairs influence
  *     nothing.)
  *  2. PLANT — a clone family spanning both parities yields
  *     dup-vs-snapshot AND dup-within-batch counts; unique docs
  *     count clean.
  */
class IncrementalMinhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cloneText =
    "the fast pipeline reads the stream and writes the parquet table today"
  private val docs: Seq[(Long, String, String)] =
    (0L until 10L).map(id => (id, cloneText, s"src${id % 2}")) ++
      (10L until 40L).map { id =>
        val toks = Seq.tabulate(12)(j => s"u${id}t$j").mkString(" ")
        (id, toks, s"src${id % 2}")
      }

  test("census derives exactly from minhashPairs on the odd-touching subset") {
    val df = docs.toDF("doc_id", "text", "source")
    val pairs = Dedup.minhashPairs(df)
      .select("doc_id_a", "doc_id_b", "n_match")
      .as[(Long, Long, Long)].collect()
    val byDoc = docs.filter(_._1 % 2 == 1).map { case (id, _, src) =>
      val partners = pairs.collect {
        case (a, b, m) if a == id => (b, m)
        case (a, b, m) if b == id => (a, m)
      }
      val (snap, batch) = partners.partition(_._1 % 2 == 0)
      (src, snap.length.toLong, batch.length.toLong,
        if (snap.exists(_._2 >= Dedup.NearDupMatches)) 1L else 0L,
        if (batch.exists(_._2 >= Dedup.NearDupMatches)) 1L else 0L)
    }
    val want = byDoc.groupBy(_._1).map { case (src, rows) =>
      src -> (rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(_._4).sum, rows.map(_._5).sum,
        rows.count(r => r._4 == 0L && r._5 == 0L).toLong)
    }
    val got = Dedup.incrementalMinhash(df)
      .select("source", "n_batch", "n_cand_vs_snapshot",
        "n_cand_within_batch", "n_dup_vs_snapshot", "n_dup_within_batch",
        "n_clean")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7)).toMap
    assert(got === want)
    // the plant spans parities: both dup directions must be non-zero
    assert(got.values.map(_._4).sum >= 1L, "dup vs snapshot found")
    assert(got.values.map(_._5).sum >= 1L, "dup within batch found")
    assert(got.values.map(_._6).sum >= 1L, "clean docs pass")
  }
}
