package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Dedup, Similarity}

/** Pins the per-bucket candidate-cap semantics — the guardrail on the
  * O(bucket²) hot bucket in every LSH candidate generator (the one
  * named scale-killer of the round-11 verdict). Three contracts:
  *
  *  1. SELECTION — an oversized bucket keeps exactly `cap` members in
  *     the documented fair order (portable hash of id:key..., id
  *     tie-break), and a bucket at-or-under the cap is untouched, so
  *     a cap above every bucket size is a bit-exact no-op.
  *  2. CENSUS — capCensus prices exactly what capBucketMembers drops:
  *     its kept/dropped member and pair arithmetic must agree with
  *     the selection itself (same order, same `least(m, cap)` math).
  *  3. NEVER SILENT — the census reports a non-zero dropped mass
  *     whenever (and only whenever) the selection actually dropped
  *     members.
  */
class CapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A corpus with one planted hot bucket: `clones` verbatim-identical
    * docs (every minhash band collides) plus distinct background docs.
    */
  private def plantedDocs(clones: Int, distinct: Int) = {
    val cloneText = "the quick brown fox jumps over the lazy dog " * 4
    val rows =
      (0 until clones).map(i => (i.toLong, cloneText)) ++
        (0 until distinct).map(i =>
          ((clones + i).toLong,
            s"unique document number $i with payload ${"x" * i} end"))
    rows.toDF("doc_id", "text")
  }

  private def buckets(docs: org.apache.spark.sql.DataFrame) =
    Dedup.bandBuckets(Dedup.minhashSignatures(Dedup.shingles(docs)))

  test("cap above every bucket size is a bit-exact no-op") {
    val docs = plantedDocs(clones = 4, distinct = 6)
    val plain = Dedup.minhashPairs(docs)
      .orderBy("doc_id_a", "doc_id_b").collect().toSeq
    val capped = Dedup.minhashPairs(docs, cap = 1000)
      .orderBy("doc_id_a", "doc_id_b").collect().toSeq
    assert(capped == plain)
  }

  test("oversized bucket keeps exactly cap members in the fair order") {
    val docs = plantedDocs(clones = 9, distinct = 0)
    val cap = 4
    val kept = Dedup.capBucketMembers(
        buckets(docs), "doc_id", Seq("band", "bh"), cap)
      .groupBy("band", "bh").agg(
        count(lit(1)).as("m"),
        sort_array(collect_list(col("doc_id"))).as("kept_ids"))
      .collect()
    assert(kept.nonEmpty)
    kept.foreach(r => assert(r.getLong(2) == cap.toLong))
    // Reference selection computed independently: rank all 9 clone ids
    // per bucket by (pHash(id:band:bh), id) and take the first `cap`.
    val expect = buckets(docs)
      .withColumn("o", Dedup.capOrder("doc_id", Seq("band", "bh")))
      .collect()
      .groupBy(r => (r.getAs[Any]("band"), r.getAs[Any]("bh")))
      .map { case (k, rs) =>
        k -> rs.sortBy(r => (r.getAs[Long]("o"), r.getAs[Long]("doc_id")))
          .take(cap).map(_.getAs[Long]("doc_id")).sorted.toSeq
      }
    kept.foreach { r =>
      val k = (r.getAs[Any]("band"), r.getAs[Any]("bh"))
      assert(r.getSeq[Long](3).toSeq == expect(k),
        s"fair-order selection drifted in bucket $k")
    }
  }

  test("capped pairs are a subset of uncapped pairs, bounded by cap choose 2") {
    val docs = plantedDocs(clones = 12, distinct = 8)
    val cap = 3
    val plain = Dedup.minhashPairs(docs)
      .select("doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashPairs(docs, cap)
      .select("doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(plain))
    // the 12-clone component contributes at most C(cap,2) pairs per
    // band after the cap (uncapped it would be C(12,2) = 66)
    val clonePairs = capped.count { case (a, b) => a < 12 && b < 12 }
    assert(clonePairs <= Dedup.Bands * cap * (cap - 1) / 2)
    assert(clonePairs >= cap * (cap - 1) / 2,
      "the cap must still emit pairs inside the hot bucket")
  }

  test("census arithmetic agrees with the selection it prices") {
    val docs = plantedDocs(clones = 12, distinct = 8)
    val cap = 3
    val census = Dedup.minhashCapCensus(docs, cap).collect()
    assert(census.nonEmpty)
    val b = buckets(docs)
    val sizes = b.groupBy("band", "bh").agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getAs[Any]("band"), r.getLong(2)))
    census.foreach { r =>
      val band = r.getAs[Long]("band")
      val ms = sizes.collect { case (bd, m)
        if bd.toString.toLong == band => m }
      assert(r.getAs[Long]("n_buckets") == ms.length.toLong)
      assert(r.getAs[Long]("n_hot_buckets") == ms.count(_ > cap).toLong)
      assert(r.getAs[Long]("n_members") == ms.sum)
      assert(r.getAs[Long]("n_members_dropped") ==
        ms.map(m => m - math.min(m, cap.toLong)).sum)
      assert(r.getAs[Long]("n_pairs_uncapped") ==
        ms.map(m => m * (m - 1) / 2).sum)
      assert(r.getAs[Long]("n_pairs_capped") ==
        ms.map { m => val k = math.min(m, cap.toLong); k * (k - 1) / 2 }.sum)
      val (u, c) =
        (r.getAs[Long]("n_pairs_uncapped"), r.getAs[Long]("n_pairs_capped"))
      assert(math.abs(r.getAs[Double]("dropped_pair_share") -
        (if (u > 0) (u - c).toDouble / u else 0.0)) < 1e-12)
    }
    // the selection's actual kept count must be what the census says
    val keptTotal = Dedup.capBucketMembers(
      b, "doc_id", Seq("band", "bh"), cap).count()
    val censusKept = census.map(r =>
      r.getAs[Long]("n_members") - r.getAs[Long]("n_members_dropped")).sum
    assert(keptTotal == censusKept,
      "census dropped-mass must price exactly what the selection drops")
  }

  test("dropped mass is zero iff nothing was dropped") {
    val benign = plantedDocs(clones = 2, distinct = 6)
    Dedup.minhashCapCensus(benign, cap = 16).collect().foreach { r =>
      assert(r.getAs[Long]("n_members_dropped") == 0L)
      assert(r.getAs[Double]("dropped_pair_share") == 0.0)
    }
    val hot = plantedDocs(clones = 12, distinct = 2)
    val censusHot = Dedup.minhashCapCensus(hot, cap = 3).collect()
    assert(censusHot.exists(_.getAs[Long]("n_members_dropped") > 0L),
      "a 12-clone plant over cap 3 must report dropped mass")
  }

  test("cap below 2 fails loudly (generates no pairs)") {
    val docs = plantedDocs(clones = 3, distinct = 1)
    intercept[IllegalArgumentException](Dedup.minhashPairs(docs, cap = 1))
    intercept[IllegalArgumentException](Dedup.minhashCapCensus(docs, cap = 0))
  }

  test("recall curve counts equal the capped generator's actual output") {
    // cap_needed <= c must be EXACTLY "survives minhashPairs(docs, c)"
    // — the curve is only a tuning aid if it prices the real selection
    val docs = plantedDocs(clones = 12, distinct = 8)
    val curve = Dedup.capRecallCurve(docs, caps = Seq(2, 3, 4))
      .collect().map(r => r.getAs[Long]("cap") -> r).toMap
    val total = Dedup.minhashPairs(docs).count()
    Seq(2, 3, 4).foreach { c =>
      val capped = Dedup.minhashPairs(docs, c)
      val row = curve(c.toLong)
      assert(row.getAs[Long]("n_pairs_kept") == capped.count(),
        s"curve pair count must equal minhashPairs(docs, $c)")
      assert(row.getAs[Long]("n_pairs_total") == total)
      assert(row.getAs[Long]("n_neardup_kept") ==
        capped.filter(col("n_match") >= Dedup.NearDupMatches).count(),
        s"curve near-dup count must equal the capped generator at $c")
    }
    // recall is monotone in the cap width
    val recalls = Seq(2, 3, 4).map(c => curve(c.toLong).getAs[Double]("neardup_recall"))
    assert(recalls == recalls.sorted)
  }

  test("embedding curve counts equal the capped SRP generator's output") {
    val embs = Tables.load(spark, SparkTestSession.sf, "embeddings")
    val caps = Seq(2, 4, 8)
    val curve = Dedup.embeddingCapRecallCurve(embs, caps)
      .collect().map(r => r.getAs[Long]("cap") -> r).toMap
    caps.foreach { c =>
      assert(curve(c.toLong).getAs[Long]("n_neardup_kept") ==
        Dedup.embeddingPairs(embs, c).count(),
        s"curve near-dup count must equal embeddingPairs(embs, $c)")
    }
    // total = the uncapped generator's near-dup yield
    assert(curve(2L).getAs[Long]("n_neardup_total") ==
      Dedup.embeddingPairs(embs, Dedup.NoCap).count())
  }

  test("benign data skips the cap window entirely (r13 skip law)") {
    // the pre-census fast path: when NO bucket exceeds the cap, the
    // rank window would keep every row — so capBucketMembers must
    // return the input RELATION (no Window node, no repartition) and
    // stay bit-exact; when a bucket IS hot, the window must appear
    val benign = buckets(plantedDocs(clones = 2, distinct = 6))
    val keptBenign = Dedup.capBucketMembers(
      benign, "doc_id", Seq("band", "bh"), cap = 16)
    assert(!keptBenign.queryExecution.optimizedPlan.toString
      .contains("row_number"),
      "no bucket over the cap => the rank window must be skipped")
    assert(keptBenign.orderBy("doc_id", "band").collect().toSeq ==
      benign.orderBy("doc_id", "band").collect().toSeq,
      "the skip path must be bit-exact pass-through")
    val hot = buckets(plantedDocs(clones = 9, distinct = 0))
    val keptHot = Dedup.capBucketMembers(
      hot, "doc_id", Seq("band", "bh"), cap = 4)
    assert(keptHot.queryExecution.optimizedPlan.toString
      .contains("row_number"),
      "a hot bucket must still route through the rank window")
  }

  test("pre-census memoizes: one job per bucket relation per scope (r14)") {
    // the de-eager contract: capBucketMembers' benign/hot pre-census
    // is one Spark job per (canonical bucket plan, keys, cap) between
    // releaseAll calls — a second capped build over the same relation
    // must not re-run it, and a fresh scope must
    CacheScope.releaseAll()
    val b = buckets(plantedDocs(clones = 2, distinct = 6))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Dedup.capBucketMembers(b, "doc_id", Seq("band", "bh"), 16)
      Thread.sleep(500) // listener bus drains asynchronously
      val first = jobs.get
      assert(first >= 1, "first capped build must run the census job")
      Dedup.capBucketMembers(b, "doc_id", Seq("band", "bh"), 16)
      // a STRUCTURALLY equal relation built independently must hit the
      // same memo entry (the key is the canonicalized plan, not the
      // object) — this is what lets several capped generators share
      // one materialized bucket relation's verdict
      Dedup.capBucketMembers(
        buckets(plantedDocs(clones = 2, distinct = 6)),
        "doc_id", Seq("band", "bh"), 16)
      Thread.sleep(500)
      assert(jobs.get == first,
        "re-building over the same bucket relation re-ran the census")
      CacheScope.releaseAll()
      Dedup.capBucketMembers(b, "doc_id", Seq("band", "bh"), 16)
      Thread.sleep(500)
      assert(jobs.get > first,
        "a new scope must re-derive the verdict (staleness bound)")
    } finally spark.sparkContext.removeSparkListener(l)
    CacheScope.releaseAll()
  }

  /** The corpus_sample per-mille gate, replicated for the sampled-
    * curve laws (hash of source#doc_id — Corpus.sampled's exact
    * expression). */
  private def docGate(rate: Int) =
    pmod(graft.functions.Portable.pHash(
      concat(col("source"), lit("#"), col("doc_id"))), lit(1000L)) < rate

  test("sampled curve == full curve of the pre-filtered corpus (r13)") {
    val rate = Dedup.CurveSamplePerMille
    val docs = plantedDocs(clones = 12, distinct = 8)
      .withColumn("source", lit("s0"))
    val sampled = Dedup.capRecallCurve(docs, caps = Seq(2, 3, 4),
      samplePerMille = rate).orderBy("cap").collect().toSeq
    val prefiltered = Dedup.capRecallCurve(docs.filter(docGate(rate)),
      caps = Seq(2, 3, 4)).orderBy("cap").collect().toSeq
    assert(sampled == prefiltered,
      "samplePerMille must BE the hash gate — nothing else may differ")
    // and the embedding twin, over its vec_id gate
    val embs = Tables.load(spark, SparkTestSession.sf, "embeddings")
    val eGate = pmod(graft.functions.Portable.pHash(
      col("vec_id").cast("string")), lit(1000L)) < rate
    val eSampled = Dedup.embeddingCapRecallCurve(embs, Seq(2, 4),
      samplePerMille = rate).orderBy("cap").collect().toSeq
    val ePre = Dedup.embeddingCapRecallCurve(embs.filter(eGate), Seq(2, 4))
      .orderBy("cap").collect().toSeq
    assert(eSampled == ePre)
  }

  test("sampled curve stays bounded on a planted hub (r13 probe)") {
    // h clones make the uncapped join pay ~C(h,2) hub pairs; the
    // per-mille gate keeps k <= h of them, so the sampled curve's
    // TOTAL pair mass must collapse to exactly C(k,2) hub pairs plus
    // sub-linear background — the quadratic shrink that makes the
    // sample-bounded variant the production shape
    val rate = Dedup.CurveSamplePerMille
    val h = 24
    val docs = plantedDocs(clones = h, distinct = 10)
      .withColumn("source", lit("hub"))
    val keptClones = docs.filter(docGate(rate))
      .filter(col("doc_id") < h).count().toInt
    assert(keptClones < h, "gate must thin the hub at 500 per-mille")
    val full = Dedup.capRecallCurve(docs, caps = Seq(2))
      .collect().head.getAs[Long]("n_pairs_total")
    val sampled = Dedup.capRecallCurve(docs, caps = Seq(2),
      samplePerMille = rate)
      .collect().head.getAs[Long]("n_pairs_total")
    assert(full >= h.toLong * (h - 1) / 2,
      "uncapped full curve must pay the whole hub join")
    assert(sampled <= full)
    assert(sampled >= keptClones.toLong * (keptClones - 1) / 2,
      "the surviving clones still pair with each other")
    // bounded: kept-hub pairs + a background allowance strictly
    // below the dropped hub mass
    assert(sampled < full - (h.toLong * (h - 1) / 2 -
      keptClones.toLong * (keptClones - 1) / 2) + 50,
      "sampled pair mass must track the quadratic hub shrink")
  }

  test("knnEdges' operative cap never binds on the benign testdata") {
    val embs = Tables.load(spark, SparkTestSession.sf, "embeddings")
    val census = Similarity.knnCapCensus(embs).collect()
    assert(census.nonEmpty)
    census.foreach { r =>
      assert(r.getAs[Long]("n_hot_buckets") == 0L,
        s"KnnBucketCap=${Similarity.KnnBucketCap} must sit far above " +
          "benign bucket sizes")
      assert(r.getAs[Long]("n_members_dropped") == 0L)
    }
  }
}
