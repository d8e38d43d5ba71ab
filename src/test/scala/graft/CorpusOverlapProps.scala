package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Portable

/** Property checks for the cross-source shingle overlap and the
  * bigram-LM scorer against JVM set/frequency references built on
  * [[Portable.normTextJvm]] (the proven toLowerCase/whitespace twin
  * of the engine tokenizer).
  *
  * Texts draw from a 4-word alphabet with 0-6 tokens so sub-3-token
  * docs (empty shingle sets), all-blank docs, and heavy shingle
  * collisions across sources all occur constantly.
  */
object CorpusOverlapProps extends Properties("graft.corpusOverlap") {
  private lazy val spark = SparkTestSession.spark

  private val word = Gen.oneOf("alpha", "beta", "gamma", "Delta")
  private val text: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private val docs: Gen[List[(Long, String, String)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 100L),
      Gen.oneOf("s1", "s2", "s3"), text))
      .map(_.groupBy(_._1).map(_._2.head).toList) // distinct doc ids

  private def toDf(ds: List[(Long, String, String)]) = {
    import spark.implicits._
    ds.toDF("doc_id", "source", "text")
  }

  private def tokensJvm(t: String): List[String] =
    Portable.normTextJvm(t).split(" ").filter(_.nonEmpty).toList

  private def shinglesJvm(t: String): Set[String] =
    tokensJvm(t).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet

  private type ORow = (Long, Long, Long, Double)

  private def overlapReference(
      ds: List[(Long, String, String)]): Map[(String, String), ORow] = {
    val bySrc = ds.groupBy(_._2).view
      .mapValues(_.flatMap(d => shinglesJvm(d._3)).toSet).toMap
    val srcs = bySrc.keys.toSeq.sorted
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (a, b) = (srcs(i), srcs(j))
      shared = (bySrc(a) & bySrc(b)).size.toLong
      if shared > 0
    } yield (a, b) -> ((shared, bySrc(a).size.toLong, bySrc(b).size.toLong,
      shared.toDouble /
        (bySrc(a).size.toLong + bySrc(b).size.toLong - shared).toDouble)))
      .toMap
  }

  property("source overlap == shingle-set reference") =
    Prop.forAll(docs) { ds =>
      val got = ml.Corpus.sourceOverlap(toDf(ds)).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      got == overlapReference(ds)
    }

  private def log2Floor(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  private type BRow = (Long, Long, Long, Long, Option[Double])

  private def bigramReference(
      ds: List[(Long, String, String)]): Map[Long, BRow] = {
    val toks = ds.map { case (id, _, t) => id -> tokensJvm(t) }
    val uf = toks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val biAll = toks.map { case (id, ts) => id -> ts.zip(ts.drop(1)) }
    val bf = biAll.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    biAll.map { case (id, bis) =>
      val n = bis.size.toLong
      val novel = bis.count(b => bf(b) == 1L).toLong
      val sumBf = bis.map(bf).sum
      val surprise = bis.map { case b @ (w1, _) => log2Floor(uf(w1) / bf(b)) }.sum
      id -> ((n, novel, sumBf, surprise,
        if (n == 0) None else Some(surprise.toDouble / n.toDouble)))
    }.toMap
  }

  property("bigram LM == frequency-table reference") =
    Prop.forAll(docs) { ds =>
      val got = ml.TextAnalysis.bigramLm(toDf(ds),
          org.apache.spark.sql.functions.col("text")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
      got == bigramReference(ds)
    }
}
