package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable
import graft.ml.Corpus

/** Pins the duplicate-substring span census against an INDEPENDENT
  * plain-Scala reference (set-based k-gram duplicate inventory +
  * interval union), on a corpus with PLANTED copied passages whose
  * expected coverage is computed by hand:
  *
  *  1. REFERENCE — dupSpans reproduces the reference fold exactly on
  *     a randomized corpus (anchors, spans, union coverage, ratio).
  *  2. PLANT — a passage copied verbatim into two documents is
  *     covered end-to-end in both (dup_tokens ≥ passage length),
  *     and a corpus of all-unique docs reports zero everywhere.
  *  3. UNION — dup_tokens never exceeds n_tokens and equals the
  *     exact size of the union of duplicated k-token windows.
  */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = Corpus.DupSpanK

  /** Plain-Scala reference: per doc (n_dup_anchors, n_spans,
    * max_span_tokens, dup_tokens) from the cross-doc duplicate
    * k-gram inventory.
    */
  private def ref(docs: Seq[(Long, Seq[String])])
      : Map[Long, (Long, Long, Long, Long)] = {
    val grams = docs.map { case (id, toks) =>
      id -> toks.sliding(K).filter(_.length == K).map(_.mkString(" ")).toVector
    }.toMap
    val docsPerGram = grams.toSeq
      .flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    docs.map { case (id, toks) =>
      val dupPos = grams(id).zipWithIndex.collect {
        case (g, p0) if docsPerGram(g).size > 1 => p0 + 1L
      }
      // interval union over [i, i+K-1]: islands where gap > K split
      val spans = dupPos.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, i) =>
          acc.lastOption match {
            case Some((s, e)) if i <= e + 1 => acc.init :+ (s, i + K - 1)
            case _ => acc :+ (i, i + K - 1)
          }
      }
      val cover = spans.map { case (s, e) => e - s + 1 }
      id -> (dupPos.length.toLong, spans.length.toLong,
        if (cover.isEmpty) 0L else cover.max, cover.sum)
    }.toMap
  }

  private def run(docs: Seq[(Long, Seq[String])]) =
    Corpus.dupSpans(
      docs.map { case (id, toks) =>
        (id, toks.mkString(" "), s"src${id % 2}")
      }.toDF("doc_id", "text", "source"))
      .select("doc_id", "n_tokens", "n_dup_anchors", "n_spans",
        "max_span_tokens", "dup_tokens", "dup_ratio")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()

  test("dupSpans matches the plain-Scala interval-union reference") {
    val rnd = new scala.util.Random(29)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    val passage = Vector.tabulate(12)(i => s"p$i")
    val docs: Seq[(Long, Seq[String])] = (0L until 30L).map { id =>
      val n = 3 + rnd.nextInt(40)
      val base = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
      // plant the shared passage into every third doc at a random cut
      val toks = if (id % 3 == 0) {
        val cut = rnd.nextInt(base.length + 1)
        base.take(cut) ++ passage ++ base.drop(cut)
      } else base
      (id, toks)
    }
    val want = ref(docs)
    val got = run(docs)
    assert(got.length === docs.length)
    for ((id, nTok, nDup, nSpans, maxSpan, dupTok, ratio) <- got) {
      val toks = docs.find(_._1 == id).get._2
      assert(nTok === toks.length.toLong, s"doc $id n_tokens")
      val (wDup, wSpans, wMax, wCover) = want(id)
      assert(nDup === wDup, s"doc $id n_dup_anchors")
      assert(nSpans === wSpans, s"doc $id n_spans")
      assert(maxSpan === wMax, s"doc $id max_span_tokens")
      assert(dupTok === wCover, s"doc $id dup_tokens")
      assert(dupTok <= nTok, s"doc $id union bound")
      assert(math.abs(ratio - dupTok.toDouble / nTok.toDouble) < 1e-12)
    }
  }

  test("planted copied passage is covered end-to-end; unique corpus is zero") {
    val passage = Vector.tabulate(10)(i => s"c$i")
    val a = Vector.tabulate(8)(i => s"a$i") ++ passage ++ Vector("a8", "a9")
    val b = Vector("b0", "b1") ++ passage ++ Vector.tabulate(6)(i => s"bb$i")
    val dup = run(Seq((1L, a), (2L, b))).map(r => r._1 -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(dup(id)._6 >= passage.length.toLong, s"doc $id coverage")
      assert(dup(id)._4 === 1L, s"doc $id one span")
    }
    val uniq = run(Seq(
      (1L, Vector.tabulate(20)(i => s"x$i")),
      (2L, Vector.tabulate(20)(i => s"y$i"))))
    for ((_, _, nDup, nSpans, maxSpan, dupTok, ratio) <- uniq) {
      assert((nDup, nSpans, maxSpan, dupTok, ratio) === ((0L, 0L, 0L, 0L, 0.0)))
    }
  }
}
