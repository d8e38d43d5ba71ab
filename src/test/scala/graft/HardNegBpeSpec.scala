package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Similarity, TextAnalysis}

/** Fixture checks for hard-negative mining and the BPE/hapax text
  * census ops. */
class HardNegBpeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("hardNegatives: different-label argmax, never a same-label row") {
    import spark.implicits._
    // probe 0 (label 1): nearest overall is vec 1 (same label, same
    // direction) — must be SKIPPED; nearest different-label is vec 2
    // (close direction), then vec 3 (orthogonal-ish).
    val embs = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.1f), 1),   // same label: excluded
      (2L, Array(0.8f, 0.2f), 2),
      (3L, Array(0.0f, 1.0f), 2),
      (4L, Array(-1.0f, 0.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(embs, k = 2)
      .filter(col("probe_id") === 0L).orderBy(col("rk")).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(2L, 3L))
    assert(got.forall(r => r.getInt(3) != r.getInt(1)))
    assert(got.map(_.getLong(5)).toSeq == Seq(1L, 2L))
  }

  test("tripletMining: hardest positive, semi-hard negative strictly below it") {
    import spark.implicits._
    // probe 0 (label 1): positives are 1 (cos≈0.99) and 2 (cos=0 —
    // the HARDEST, picked); negatives are 3 (cos≈0.97 > pos_cos=0 —
    // violating zone, excluded by the semi-hard rule) and 4
    // (cos=−1 < 0 — the semi-hard pick).
    val embs = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.8f, 0.2f), 2),
      (4L, Array(-1.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val r0 = Similarity.tripletMining(embs)
      .filter(col("probe_id") === 0L).collect().head
    assert(r0.getAs[Long]("pos_id") == 2L)
    assert(r0.getAs[Long]("neg_id") == 4L)
    assert(r0.getAs[Double]("neg_cos") < r0.getAs[Double]("pos_cos"))
    assert(r0.getAs[Double]("margin") ==
      r0.getAs[Double]("pos_cos") - r0.getAs[Double]("neg_cos"))
    // corpus invariants: every emitted negative sits strictly below
    // its positive (the semi-hard contract), margins positive
    val rows = SparkEntry.queries("embed_triplet_mining")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getAs[Double]("neg_cos") < r.getAs[Double]("pos_cos"))
      assert(r.getAs[Double]("margin") > 0.0)
    }
  }

  test("bpePairStats: pair counts weight by token frequency, repeats count per position") {
    import spark.implicits._
    // "abab" contributes pairs ab,ba,ab (positions) per occurrence;
    // it occurs 2x -> ab: 4, ba: 2. "ab" adds 3 more ab. Single-char
    // token "x" contributes nothing.
    val docs = Seq((1L, "abab abab ab x"), (2L, "ab ab"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(docs, col("text"), 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("ab") == (7L, 2L)) // 2*2 from abab + 3*1 from ab; 2 token types
    assert(got("ba") == (2L, 1L))
    assert(!got.contains("x"))
  }

  test("bpeTrain: greedy non-overlapping contraction, merged symbols feed later rounds") {
    import spark.implicits._
    // round 1 must pick (a,a): "aaaa"x3 contributes 3 positions x 3
    // occurrences = 9, beating (b,c)'s 5. The contraction is greedy
    // left-to-right: aaaa -> (aa)(aa), NOT three overlapping merges —
    // so round 2's census sees pair (aa,aa) with count 3 from aaaa
    // plus nothing from elsewhere, while (b,c) still has 5 -> round 2
    // = (b,c). Round 3 then merges the round-2 SYMBOL (bc) with d
    // (count 5), proving merged symbols re-enter the loop.
    val docs = Seq(
      (1L, "aaaa aaaa aaaa bcd bcd"),
      (2L, "bcd bcd bcd")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, col("text"), 3)
      .collect().map(r => (r.getAs[Long]("round"),
        (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
          r.getAs[String]("merged"), r.getAs[Long]("pair_count"))))
      .toMap
    assert(got(1L) === (("a", "a", "aa", 9L)))
    assert(got(2L) === (("b", "c", "bc", 5L)))
    assert(got(3L) === (("bc", "d", "bcd", 5L)))
  }

  test("bpeCompressionCurve: round 0 = chars, totals shrink by merge count, exhausted rounds repeat") {
    import spark.implicits._
    // vocab = {ab: n=2}. Round 1 merges (a)(b) count 2 → total pieces
    // 4 → 2; rounds 2-3 have no pair left → repeat final state with
    // the empty pair, so both engines always emit nMerges+1 rows.
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeCompressionCurve(docs, col("text"), 3)
      .collect().map(r => r.getAs[Long]("round") ->
        ((r.getAs[String]("merged_pair"), r.getAs[Long]("merge_count"),
          r.getAs[Long]("total_pieces"), r.getAs[Long]("total_chars"),
          r.getAs[Long]("n_tokens")))).toMap
    assert(got.size === 4)
    assert(got(0L) === (("", 0L, 4L, 4L, 2L)))
    assert(got(1L) === (("(a)(b)", 2L, 2L, 4L, 2L)))
    assert(got(2L) === (("", 0L, 2L, 4L, 2L)))
    assert(got(3L) === (("", 0L, 2L, 4L, 2L)))
    // on the real corpus: totals only shrink, strictly so whenever a
    // pair was actually merged (greedy non-overlapping contraction
    // removes between ⌈cnt/2⌉ and cnt pieces — cnt exactly unless the
    // pair self-overlaps like (a)(a) in aaaa)
    val curve = TextAnalysis.bpeCompressionCurve(
      Tables.load(spark, sf, "documents"), col("text"), 4).collect()
      .sortBy(_.getAs[Long]("round"))
    curve.sliding(2).foreach { case Array(a, b) =>
      val removed = a.getAs[Long]("total_pieces") - b.getAs[Long]("total_pieces")
      val cnt = b.getAs[Long]("merge_count")
      assert(removed >= (cnt + 1) / 2 && removed <= cnt,
        s"round ${b.getAs[Long]("round")}: removed $removed outside [⌈cnt/2⌉, cnt] for cnt $cnt")
      case _ => ()
    }
  }

  test("bpeEncode: trained tokens cost merged symbols, others fall back to chars") {
    import spark.implicits._
    // one merge: (a,b) with count 2 -> 'ab' encodes to ONE piece;
    // 'x9' is untrained -> 2 char-fallback pieces
    val docs = Seq((1L, "s1", "ab ab x9"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.bpeEncode(docs, col("text"), 1).head()
    assert(r.getAs[Long]("n_docs") === 1L)
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("n_pieces") === 4L)  // 2x 'ab'(1) + 'x9'(2)
    assert(r.getAs[Long]("n_chars") === 6L)
    assert(r.getAs[Double]("pieces_per_token") === 4.0 / 3.0)
    assert(r.getAs[Double]("chars_per_piece") === 6.0 / 4.0)
  }

  test("bpeTrain: non-alphabetic tokens never reach the trainer") {
    import spark.implicits._
    val docs = Seq((1L, "x9x9 x9x9 (()) ab ab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, col("text"), 1).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("merged") === "ab")
  }

  test("prefixRecall: full-width prefix scores 1.0 on every probe") {
    import spark.implicits._
    val embs = (0L until 12L).map { i =>
      (i, Array.tabulate(6)(j => ((i * 7 + j * 3) % 5 - 2).toFloat), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val full = Similarity.prefixRecall(embs, prefixDim = 6).collect()
    assert(full.nonEmpty && full.forall(_.getDouble(1) == 1.0))
    // a 2-wide prefix is a coarser ranking: recall stays within [0, 1]
    val cut = Similarity.prefixRecall(embs, prefixDim = 2).collect()
    assert(cut.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("knnGraphStats: a tight clique is fully reciprocal") {
    import spark.implicits._
    // 4 near-identical vectors (one clique): every node's top-3 are
    // the other three, all edges mutual -> reciprocity 1.0
    val embs = (0L until 4L).map { i =>
      (i, Array.tabulate(64)(j => (1.0 + 0.001 * i + 0.01 * j).toFloat), 7)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnGraphStats(embs, k = 3).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getInt(0) == 7 && r.getLong(1) == 4L)
    assert(r.getLong(2) == 12L && r.getLong(3) == 12L)
    assert(r.getDouble(4) == 1.0)
  }

  test("weightedSample: keep rate tracks the quality gate bounds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "", "empty"),                        // score 0 -> never kept
      (2L, "the of and to a in is it", "stopry"))
      .toDF("doc_id", "text", "source")
    val got = graft.ml.Corpus.weightedSample(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("empty") == (1L, 0L, 0L))        // zero permille mass
    val (n, kept, mass) = got("stopry")
    assert(n == 1L && kept <= n && mass > 0L && mass <= 1000L)
  }

  test("splitLeakage: planted cross-split duplicates are found and counted") {
    import spark.implicits._
    // 60 byte-identical docs under distinct ids: the id-hash split
    // scatters them across train/val/test, so the audit must report
    // cross-split sharing of their single fingerprint
    val docs = (1L to 60L).map(i => (i, "the same exact text", "s1"))
      .toDF("doc_id", "text", "source")
    val got = graft.ml.Corpus.splitLeakage(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // recompute expectation from the split assignment itself
    val bySplit = graft.ml.Corpus.splitAssigned(docs)
      .groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = bySplit.filter(_._2 > 0).keySet
    assert(present.size >= 2, s"fixture degenerate: $bySplit")
    val expectPairs = (for {
      a <- present; b <- present if a < b
    } yield (a, b) -> (1L, bySplit(a) + bySplit(b))).toMap
    assert(got == expectPairs)
  }

  test("hapaxProfile: exact hapax share per source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "red red blue", "s1"),   // s1 vocab {red:2, blue:1} -> 1 hapax of 2 terms
      (2L, "green", "s2"))          // s2 vocab {green:1} -> 1 of 1
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.hapaxProfile(docs, col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("s1") == (2L, 3L, 1L, 0.5))
    assert(got("s2") == (1L, 1L, 1L, 1.0))
  }
}
