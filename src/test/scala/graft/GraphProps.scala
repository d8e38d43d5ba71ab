package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.ml.{Corpus, Dedup}

/** Property-based checks for the graph/corpus operators: exact
  * connected components against a union-find ground truth on RANDOM
  * graphs (chains, cliques, isolated edges — whatever the generator
  * produces, not just the LSH testdata shape), and hash-gate sampling
  * laws. Case counts are small because every case runs a Spark job.
  */
object GraphProps extends Properties("graft.graph") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val edgeList: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L))))
      .map(_.filter { case (a, b) => a != b })

  property("clusterLabels == union-find on random graphs") =
    Prop.forAll(edgeList) { pairs =>
      import spark.implicits._
      if (pairs.isEmpty)
        Dedup.clusterLabels(
          Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0L
      else {
        val expected = SparkTestSession.unionFindComponents(pairs)
        val edges = pairs.toDF("src", "dst")
          .union(pairs.map(_.swap).toDF("src", "dst"))
        val got = Dedup.clusterLabels(edges).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
          .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
        got == expected
      }
    }

  /** Driver-side fixed-point PageRank — the arithmetic twin of
    * Similarity.pageRankRanks (floors and all), so equality is exact
    * on any graph the generator produces.
    */
  private def simulatePageRank(pairs: List[(Long, Long)], iters: Int): Map[Long, Long] = {
    val S = graft.ml.Similarity.PageRankScale
    val edges = pairs.distinct
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = nodes.map(v => v -> math.floor(S.toDouble / n).toLong).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        math.floor(r(u).toDouble / outdeg(u).toDouble).toLong }.sum).toMap
      val dang = nodes.filterNot(outdeg.contains).map(r).sum
      val dShare = math.floor(dang.toDouble / n).toLong
      val base = math.floor(0.15 * (S.toDouble / n)).toLong
      r = nodes.map(v => v -> (base +
        math.floor(0.85 * (contrib.getOrElse(v, 0L) + dShare).toDouble).toLong)).toMap
    }
    r
  }

  property("pageRankRanks == driver fixed-point simulation on random graphs") =
    Prop.forAll(edgeList.suchThat(_.nonEmpty)) { pairs =>
      import spark.implicits._
      val edges = pairs.distinct.toDF("src", "dst")
      val got = graft.ml.Similarity.pageRankRanks(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == simulatePageRank(pairs, graft.ml.Similarity.PageRankIters)
    }

  private val perMille: Gen[Int] = Gen.chooseNum(0, 1000)

  property("hash-gate sampling is monotone in rate and deterministic") =
    Prop.forAll(perMille, perMille) { (r1, r2) =>
      val docs = Tables.load(spark, SparkTestSession.sf, "documents")
      val (lo, hi) = (math.min(r1, r2), math.max(r1, r2))
      def ids(r: Int): Set[Long] =
        Corpus.sampled(docs, Map.empty, r)
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val (a, b) = (ids(lo), ids(hi))
      // lower rate selects a SUBSET of the higher rate's rows (same
      // hash gate), and re-running reproduces the selection exactly
      a.subsetOf(b) && ids(lo) == a
    }
}
