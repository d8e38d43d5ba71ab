package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.ml.Corpus

/** Property check for greedy contiguous sequence packing: the
  * window cumulative-offset bin assignment must equal a per-source
  * running fold over the operator's own token counts (so the check
  * isolates the window machinery, not the tokenizer), including
  * empty documents and budget-1 bins.
  */
object PackProps extends Properties("graft.pack") {
  private lazy val spark = SparkTestSession.spark

  private val docs: Gen[List[(String, String)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("web", "code"),
      Gen.chooseNum(0, 12).map(n => Seq.fill(n)("tok").mkString(" "))))

  property("packed bins == per-source running-offset fold") =
    Prop.forAll(docs, Gen.chooseNum(1, 10)) { (ds, budget) =>
      import spark.implicits._
      val df = ds.zipWithIndex
        .map { case ((s, t), i) => (s, i.toLong, t) }
        .toDF("source", "doc_id", "text")
      val rows = Corpus.packed(df, budget)
        .select("source", "doc_id", "n_tokens", "cum_tokens", "bin")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))

      // each input doc appears exactly once
      rows.length == ds.length &&
        rows.map(_._2).toSet == ds.indices.map(_.toLong).toSet &&
        rows.groupBy(_._1).forall { case (_, srcRows) =>
          var cum = 0L
          srcRows.sortBy(_._2).forall { case (_, _, n, cumGot, bin) =>
            val binExpect = cum / budget
            cum += n
            cumGot == cum && bin == binExpect
          }
        }
    }
}
