package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.ml.TextAnalysis

/** Property checks for the BPE trainer against an independent
  * plain-Scala greedy fold over symbol LISTS (no delimited-string
  * representation, no `replace` — a genuinely different encoding of
  * the same algorithm): on arbitrary small corpora over {a, b, c},
  * the merge tables must be identical round for round — argmax pair,
  * tie-break, count, and the greedy non-overlapping contraction
  * feeding the next census.
  */
object BpeProps extends Properties("graft.bpe") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val NMerges = 4

  private val tokenGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val corpusGen: Gen[List[String]] =
    Gen.nonEmptyListOf(tokenGen)

  /** Reference trainer: vocab as symbol lists, greedy left-to-right
    * contraction, argmax by (count desc, wrapped-pair asc).
    */
  private def referenceTrain(
      tokens: List[String]): Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[List[String], Long] = tokens.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (t, n) => t.toList.map(_.toString) -> n }
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (round <- 1 to NMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) =>
          (-c, s"($l)($r)") }
        merges += ((round.toLong, l, r, l + r, cnt))
        vocab = vocab.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (out.nonEmpty && out.last == l && s == r)
              out(out.length - 1) = l + r
            else out += s
          }
          out.toList -> n
        }
      }
    }
    merges.result()
  }

  property("merge table equals the symbol-list greedy fold") =
    Prop.forAll(corpusGen) { tokens =>
      import spark.implicits._
      val docs = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
      val got = TextAnalysis.bpeTrain(docs, col("text"), NMerges)
        .collect()
        .map(r => (r.getAs[Long]("round"), r.getAs[String]("left_sym"),
          r.getAs[String]("right_sym"), r.getAs[String]("merged"),
          r.getAs[Long]("pair_count")))
        .toSeq
      val want = referenceTrain(tokens)
      (got == want) :| s"got=$got\nwant=$want"
    }
}
