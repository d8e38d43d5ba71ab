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

  /** Driver-side k-core peel — the arithmetic twin of
    * Similarity.kcoreCensus (symmetrize, fixed rounds, strictly-
    * less-than-k removal), so equality is exact.
    */
  private def simulateKcore(pairs: List[(Long, Long)], k: Int, rounds: Int)
      : Seq[(Long, Long, Long)] = {
    val sym = pairs.flatMap(p => Seq(p, p.swap)).distinct
    var alive = sym.map(_._1).toSet
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 0 to rounds) {
      val aliveE = sym.filter(p => alive(p._1) && alive(p._2))
      out += ((r.toLong, alive.size.toLong, (aliveE.size / 2).toLong))
      if (r < rounds)
        alive = aliveE.groupBy(_._1).collect {
          case (v, es) if es.size >= k => v
        }.toSet
    }
    out.toSeq
  }

  property("kcoreCensus == driver peel on random graphs") =
    Prop.forAll(edgeList.suchThat(_.nonEmpty)) { pairs =>
      import spark.implicits._
      val clean = pairs.distinct
      val got = graft.ml.Similarity.kcoreCensus(clean.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      got == simulateKcore(clean, graft.ml.Similarity.KcoreK,
        graft.ml.Similarity.KcoreRounds)
    }

  /** Driver-side triangle census — the arithmetic twin of
    * Similarity.triangleCensus (symmetrize, per-node triangle count
    * as closed neighbor pairs, per-label rollup), so equality is
    * exact on any graph shape the generator produces. The driver
    * counts naively per center; agreement proves the oriented
    * enumeration finds every triangle exactly once.
    */
  private def simulateTriangles(pairs: List[(Long, Long)])
      : Set[(Long, Long, Long, Long, Long, Option[Double])] = {
    val sym = pairs.flatMap(p => Seq(p, p.swap)).distinct
    val nbr = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = nbr.keys.toSeq.sorted
    val rows = nodes.map { v =>
      val ns = nbr(v).toSeq.sorted
      val tv = (for {
        i <- ns.indices; j <- (i + 1) until ns.length
        if nbr(ns(i)).contains(ns(j))
      } yield 1).size.toLong
      (v, v % 3, ns.length.toLong, tv)
    }
    rows.groupBy(_._2).map { case (label, rs) =>
      val wedges2 = rs.map(r => r._3 * (r._3 - 1)).sum
      val closed = rs.map(_._4).sum
      (label, rs.size.toLong, rs.count(_._3 >= 2).toLong,
        wedges2 / 2, closed,
        if (wedges2 > 0) Some(closed.toDouble * 2.0 / wedges2.toDouble)
        else None)
    }.toSet
  }

  property("triangleCensus == driver count on random graphs") =
    Prop.forAll(edgeList.suchThat(_.nonEmpty)) { pairs =>
      import spark.implicits._
      val clean = pairs.distinct
      val nodes = clean.flatMap(p => Seq(p._1, p._2)).distinct
      val labels = nodes.map(v => (v, v % 3)).toDF("vec_id", "label")
      val got = graft.ml.Similarity.triangleCensus(
          clean.toDF("src", "dst"), labels)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSet
      got == simulateTriangles(clean)
    }

  /** Random user event streams for the stationary-chain property:
    * a few users, each a short random walk over 4 event types at
    * distinct timestamps.
    */
  private val eventStream: Gen[List[(Long, Long, String)]] =
    Gen.chooseNum(2, 25).flatMap { n =>
      Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(1L, 3L), Gen.oneOf("A", "B", "C", "D")))
    }.map(_.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) })

  /** Driver twin of Analytics.markovStationary: transitions from
    * per-user (ts, event_id)-ordered timelines, then the weighted
    * fixed-point iteration with the same floor chain.
    */
  private def simulateStationary(
      evs: List[(Long, Long, String)], iters: Int): Map[String, Long] = {
    val S = graft.operators.Analytics.StationaryScale
    val trans = evs.groupBy(_._2).values.toSeq.flatMap { tl =>
      val ordered = tl.sortBy(_._1).map(_._3)
      ordered.zip(ordered.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    if (trans.isEmpty) return Map.empty
    val nFrom = trans.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val nodes = trans.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    val n = nodes.length
    val base = math.floor(0.15 * (S.toDouble / n)).toLong
    var pi = nodes.map(v => v -> math.floor(S.toDouble / n).toLong).toMap
    for (_ <- 1 to iters) {
      val contrib = trans.toSeq.groupBy(_._1._2).view.mapValues(_.map {
        case ((f, _), c) =>
          math.floor(pi(f).toDouble * (c.toDouble / nFrom(f).toDouble)).toLong
      }.sum).toMap
      val dang = nodes.filterNot(nFrom.contains).map(pi).sum
      val dShare = math.floor(dang.toDouble / n).toLong
      pi = nodes.map(v => v -> (base +
        math.floor(0.85 * (contrib.getOrElse(v, 0L) + dShare).toDouble)
          .toLong)).toMap
    }
    pi
  }

  property("markovStationary == driver fixed-point on random event streams") =
    Prop.forAll(eventStream) { evs =>
      import spark.implicits._
      val df = evs.map { case (id, u, t) =>
        (id, new java.sql.Timestamp(1700000000000L + id * 60000L), u, t)
      }.toDF("event_id", "ts", "user_id", "event_type")
      val got = graft.operators.Analytics.markovStationary(df)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got == simulateStationary(evs, graft.operators.Analytics.StationaryIters)
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
