package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.Portable
import graft.ml.Corpus

/** Property layer for the round-12 corpus folds, each against an
  * INDEPENDENT plain-Scala reference (java md5, no shared Spark
  * code) on RANDOM corpora — empty docs, repeated tokens, and
  * boundary-dense alphabets included:
  *
  *  - content-defined chunking: the (doc, chunk_id, start, size, fp)
  *    set equals the reference fold for every document;
  *  - duplicate spans: the per-doc (dup anchors, spans, max span,
  *    union coverage) quadruple equals the interval-union reference;
  *  - epoch plan: integer allocations equal the reference and the
  *    budget-conservation / cap laws hold on every random size map.
  */
object ChunkSpanProps extends Properties("graft.chunkspan") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  // small alphabet => repeated tokens, shared k-grams, hot fps
  private val tokGen: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    ts <- Gen.listOfN(n, tokGen)
  } yield ts.mkString(" ")
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, docGen))

  private def toks(t: String): Seq[String] =
    Portable.normTextJvm(t).split(" ").toSeq.filter(_.nonEmpty)

  private def df(texts: List[String]) = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, s"s${i % 2}") }
      .toDF("doc_id", "text", "source")
  }

  private def refChunks(ts: Seq[String]): Seq[(Long, Long, Long, Long)] = {
    val w = Corpus.ContentWindow
    val bounds = (1 to ts.length).map(i =>
      i >= w && refHash(ts.slice(i - w, i).mkString(" ")) %
        Corpus.ContentMask == 0)
    val ids = bounds.scanLeft(0L)((acc, b) => if (b) acc + 1 else acc)
    ts.zipWithIndex.map { case (t, i0) => (ids(i0), i0 + 1L, t) }
      .groupBy(_._1).toSeq
      .map { case (cid, rows) =>
        (cid, rows.map(_._2).min, rows.length.toLong,
          refHash(rows.sortBy(_._2).map(_._3).mkString(" ")))
      }
  }

  property("contentChunks == reference fold on random corpora") =
    Prop.forAll(corpusGen) { texts =>
      val got = Corpus.contentChunks(df(texts))
        .select("doc_id", "chunk_id", "chunk_start", "chunk_tokens", "chunk_fp")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        refChunks(toks(t)).map { case (cid, st, n, fp) =>
          (i.toLong, cid, st, n, fp)
        }
      }.toSet
      got == want
    }

  property("dupSpans == interval-union reference on random corpora") =
    Prop.forAll(corpusGen) { texts =>
      val k = Corpus.DupSpanK
      val grams = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> toks(t).sliding(k).filter(_.length == k)
          .map(_.mkString(" ")).toVector
      }.toMap
      val docsPer = grams.toSeq
        .flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
      val want = grams.map { case (id, gs) =>
        val pos = gs.zipWithIndex.collect {
          case (g, p0) if docsPer(g).size > 1 => p0 + 1L
        }
        val spans = pos.foldLeft(Vector.empty[(Long, Long)]) {
          case (acc, i) => acc.lastOption match {
            case Some((s, e)) if i <= e + 1 => acc.init :+ (s, i + k - 1)
            case _ => acc :+ (i, i + k - 1)
          }
        }
        val cover = spans.map { case (s, e) => e - s + 1 }
        id -> (pos.length.toLong, spans.length.toLong,
          if (cover.isEmpty) 0L else cover.max, cover.sum)
      }
      val got = Corpus.dupSpans(df(texts))
        .select("doc_id", "n_dup_anchors", "n_spans", "max_span_tokens",
          "dup_tokens")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toMap
      got == want
    }

  private val sizesGen: Gen[List[Int]] =
    Gen.chooseNum(2, 8).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1, 60)))

  // NoShrink: ScalaCheck's list shrinker ignores chooseNum bounds and
  // offers negative sizes the generator can never produce
  property("epochPlan == reference allocation; budget and cap laws hold") =
    Prop.forAllNoShrink(sizesGen) { sizes =>
      import spark.implicits._
      // one doc per source with exactly n single-char tokens
      val d = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("x").mkString(" "), s"src$i")
      }.toDF("doc_id", "text", "source")
      val got = Corpus.epochPlan(d)
        .select("source", "n_tokens", "target_tokens", "alloc_capped",
          "alloc_final")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toMap
      val corpus = sizes.map(_.toLong).sum
      val budget = Corpus.EpochBudgetX * corpus
      val target = budget / sizes.length
      val cap = sizes.zipWithIndex
        .map { case (n, i) => s"src$i" -> Corpus.EpochCap * n }.toMap
      val a1 = cap.view.mapValues(c => math.min(target, c)).toMap
      // toSeq before map: keys is a Set, and mapping differences over
      // a Set would DEDUPLICATE equal spare terms before the sum
      val spare = cap.keys.toSeq.map(s => cap(s) - a1(s)).sum
      val leftover = budget - a1.values.sum
      val fin = cap.keys.toSeq.map { s =>
        s -> (if (spare > 0)
          a1(s).toDouble +
            leftover.toDouble * ((cap(s) - a1(s)).toDouble / spare.toDouble)
        else a1(s).toDouble)
      }.toMap
      got.keySet == cap.keySet &&
        got.forall { case (s, (n, t, a, f)) =>
          n == sizes(s.drop(3).toInt).toLong && t == target && a == a1(s) &&
            math.abs(f - fin(s)) < 1e-9 && f <= cap(s).toDouble + 1e-9
        } &&
        math.abs(got.values.map(_._4).sum - budget.toDouble) < 1e-6
    }
}
