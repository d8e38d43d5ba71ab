package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Corpus, Dedup, Similarity, TextAnalysis, Vectors}
import graft.multimodal.Binary

class MlSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = Tables.load(spark, sf, "documents")
  private def embs = Tables.load(spark, sf, "embeddings")

  test("native dot product matches the higher-order formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextInt(2001).toLong - 1000),
      Seq.fill(64)(rnd.nextInt(2001).toLong - 1000)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      Vectors.dot(col("a"), col("b")).as("n"),
      Vectors.dotHof(col("a"), col("b")).as("h")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // and against a plain Scala computation
    val expected = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got.map(_.getLong(0)).toSeq == expected)
  }

  test("long_dot: null elements null the result, length mismatch throws") {
    import spark.implicits._
    // null element → null (the HOF twin's SQL semantics)
    val withNull = Seq((Seq(Option(1L), None), Seq(Option(5L), Option(7L))))
      .toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("d"),
        Vectors.dotHof(col("a"), col("b")).as("h"))
      .collect()(0)
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
    // mismatched lengths surface the upstream bug instead of
    // truncating to a plausible partial sum
    val err = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(5L))).toDF("a", "b")
        .select(Vectors.dot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).exists(c =>
        c.getMessage != null && c.getMessage.contains("mismatched lengths")))
  }

  test("jvmPHash matches the Spark portable hash bit-for-bit") {
    val samples = Seq("", "a", "hello world", "srp#3#17", "graft.users_1")
    val fromSpark = spark.range(1)
      .select(samples.map(s =>
        graft.functions.Portable.pHash(lit(s)).as(s"h")): _*)
      .collect()(0)
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(fromSpark.getLong(i) == Vectors.jvmPHash(s), s"mismatch for '$s'")
    }
  }

  test("dedup_exact groups partition the corpus") {
    val total = docs.count()
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.map(_.getAs[Long]("n_docs")).sum == total)
    assert(groups.forall(_.getAs[Long]("canonical_id") >= 0))
  }

  test("minhash candidate pairs are ordered and est_jaccard bounded") {
    val pairs = Dedup.minhashPairs(docs).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_id_a") < r.getAs[Long]("doc_id_b"))
      val ej = r.getAs[Double]("est_jaccard")
      assert(ej >= 0.0 && ej <= 1.0)
    }
  }

  test("ngram jaccard is exact on candidates and bounded") {
    val rows = Dedup.ngramJaccardPairs(docs).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("n_inter") <=
        math.min(r.getAs[Long]("size_a"), r.getAs[Long]("size_b")))
    }
  }

  test("simhash covers every doc once; bucket counts consistent") {
    val rows = Dedup.simhash(docs).collect()
    assert(rows.length == docs.count())
    val byBucket = rows.groupBy(_.getAs[Long]("simhash"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bucket") ==
        byBucket(r.getAs[Long]("simhash")).length)
    }
  }

  test("embedding near-dup pairs pass the cosine threshold") {
    val rows = Dedup.embeddingPairs(embs).collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c >= Dedup.CosineTau && c <= 1.0 + 1e-12)
      assert(r.getAs[Long]("vec_id_a") < r.getAs[Long]("vec_id_b"))
    }
  }

  test("brute-force top-k: k per probe, descending, no self-match") {
    val rows = Similarity.topKBruteForce(embs).collect()
    val perProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(perProbe.size == Similarity.NumProbes)
    perProbe.values.foreach { g =>
      assert(g.length == Similarity.TopK)
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      val cs = sorted.map(_.getAs[Double]("cos_sim"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      g.foreach(r =>
        assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("probe_id")))
    }
  }

  test("ANN-LSH neighbors are a subset scored identically to brute force") {
    val brute = Similarity.topKBruteForce(embs).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    val ann = Similarity.topKAnnLsh(embs).collect()
    // every ANN hit that brute force also ranked must agree on cosine
    ann.foreach { r =>
      val key = (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(c => assert(c == r.getAs[Double]("cos_sim")))
    }
  }

  test("IVF ANN: k per probe, descending, candidates come from probed cells") {
    val rows = Similarity.topKAnnIvf(embs).collect()
    val perProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(perProbe.size == Similarity.NumProbes)
    perProbe.values.foreach { g =>
      assert(g.length == Similarity.TopK)
      val cs = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos_sim"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // exact cosines must agree with the brute-force scores
    val brute = Similarity.topKBruteForce(embs).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(c => assert(c == r.getAs[Double]("cos_sim")))
    }
  }

  test("IVF-PQ composed index: candidates intersect IVF's cells, scores are ADC's") {
    val rows = Similarity.topKAnnIvfPq(embs).collect()
    assert(rows.nonEmpty)
    // ranks dense from 1, ascending approx distance per probe
    rows.groupBy(_.getAs[Long]("probe_id")).values.foreach { g =>
      val byRk = g.sortBy(_.getAs[Long]("rk"))
      assert(byRk.map(_.getAs[Long]("rk")).toSeq ==
        (1L to byRk.length.toLong))
      val d = byRk.map(_.getAs[Long]("approx_d2"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
      assert(byRk.length <= Similarity.TopK)
    }
    // every composed neighbor carries exactly the plain-ADC score
    // (the IVF stage may only PRUNE, never rescore) ...
    val adc = Similarity.topKAnnPq(embs).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("approx_d2")).toMap
    // ... and composed results present in the unpruned ADC top-k
    // must agree on the distance
    rows.foreach { r =>
      val key = (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))
      adc.get(key).foreach(d => assert(d == r.getAs[Long]("approx_d2")))
    }
    // strict cell containment: every composed neighbor's cell is one
    // of its probe's ivfTopCells selections (the IVF stage prunes to
    // exactly these cells)
    val lab = embs.collect().map(r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[Number]("label").longValue()).toMap
    val selected = Similarity.ivfTopCells(
        graft.ml.Vectors.quantized(embs),
        embs.select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("label")),
        Similarity.IvfNProbe)
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, g) =>
        p -> g.map(_.getAs[Number]("label").longValue()).toSet }
    rows.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val cell = lab(r.getAs[Long]("neighbor_id"))
      assert(selected(p).contains(cell),
        s"probe $p neighbor cell $cell outside its selected cells ${selected(p)}")
    }
  }

  test("semDedupImpact: mirror loses to the global canonical; removals equal cluster mass") {
    import spark.implicits._
    // docs 1 and 2 are semantic near-dups across sources: component
    // {1,2} keeps canonical 1, so source b loses its copy; 3 is a
    // singleton and survives.
    val ones = Array.fill(64)(1f)
    val alt = Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)
    val e = Seq(
      (1L, ones, 0), (2L, ones, 0),
      (3L, alt, 1)).toDF("vec_id", "embedding", "label")
    val d = Seq(
      (1L, "a", 10L), (2L, "b", 12L), (3L, "b", 7L))
      .toDF("doc_id", "source", "n_chars")
    val got = Dedup.semDedupImpact(e, d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("chars_removed")))).toMap
    assert(got("a") === ((1L, 0L, 0L)))
    assert(got("b") === ((2L, 1L, 12L)))
    // on the real corpus: total removals = Σ (component size − 1)
    val removed = Dedup.semDedupImpact(embs, docs).collect()
      .map(_.getAs[Long]("n_removed")).sum
    val clusterMass = Dedup.embeddingClusters(embs).collect()
      .map(r => r.getAs[Long]("n_vecs") - 1).sum
    assert(removed === clusterMass,
      "impact removals must equal the cluster gauge's non-canonical mass")
  }

  test("annFrontier merged tagged pass: per-geometry matches equal the standalone rankers'") {
    // r16 folds lsh/multiprobe/ivf/hamming/pq through ONE tagged
    // window (each geometry's ranking key mapped to one ascending
    // skey: hamming/approx_d2 as-is, cosine negated). This pins that
    // the merge changed the PLAN, not any geometry's ranking: every
    // folded method's n_matched equals the intersection of its
    // STANDALONE ranker's top-k with the exact set.
    val rows = Similarity.annFrontier(embs).collect()
    val byKey = rows.map(r =>
      (r.getAs[String]("method"), r.getAs[Long]("param")) -> r).toMap
    val exact = Similarity.topKBruteForce(embs).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    def nMatched(df: org.apache.spark.sql.DataFrame): Long =
      df.select("probe_id", "neighbor_id").collect()
        .count(r => exact.contains((r.getLong(0), r.getLong(1)))).toLong
    assert(byKey(("lsh", 0L)).getAs[Long]("n_matched") ===
      nMatched(Similarity.topKAnnLsh(embs)))
    assert(byKey(("lsh_multiprobe", 0L)).getAs[Long]("n_matched") ===
      nMatched(Similarity.topKAnnMultiprobe(embs)))
    assert(byKey(("hamming", 0L)).getAs[Long]("n_matched") ===
      nMatched(Similarity.topKAnnHamming(embs)))
    assert(byKey(("pq", 0L)).getAs[Long]("n_matched") ===
      nMatched(Similarity.topKAnnPq(embs)))
  }

  test("annFrontier: shared exact denominator, nested-IVF monotonicity, dominance verdicts") {
    val rows = Similarity.annFrontier(embs).collect()
    // exact, lsh, lsh_multiprobe, pq, hamming + the two knob sweeps
    assert(rows.length === 5 + Similarity.IvfCurveProbes.length +
      Similarity.GraphCurveHops.length)
    val nExact = rows.map(_.getAs[Long]("n_exact")).toSet
    assert(nExact.size === 1, "every config scores against the same exact set")
    val byKey = rows.map(r =>
      (r.getAs[String]("method"), r.getAs[Long]("param")) -> r).toMap
    val ex = byKey(("exact", 0L))
    assert(ex.getAs[Long]("n_matched") === ex.getAs[Long]("n_exact"))
    assert(ex.getAs[Double]("recall") === 1.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_candidates"))
    }
    // nested candidate sets under the same scoring: recall and cost
    // both monotone in nProbe
    val ivf = Similarity.IvfCurveProbes.map(np => byKey(("ivf", np.toLong)))
    ivf.sliding(2).foreach { case Seq(a, b) =>
      assert(a.getAs[Long]("n_candidates") <= b.getAs[Long]("n_candidates"))
      assert(a.getAs[Long]("n_matched") <= b.getAs[Long]("n_matched"))
      case _ => ()
    }
    // multiprobe candidates are a strict superset of plain LSH's, so
    // both its cost and its matches dominate; hamming scans exactly
    // the exact ranker's candidate set at 1-bit precision
    val (lsh, mp) = (byKey(("lsh", 0L)), byKey(("lsh_multiprobe", 0L)))
    assert(mp.getAs[Long]("n_candidates") >= lsh.getAs[Long]("n_candidates"))
    assert(mp.getAs[Long]("n_matched") >= lsh.getAs[Long]("n_matched"))
    assert(byKey(("hamming", 0L)).getAs[Long]("n_candidates") ===
      byKey(("exact", 0L)).getAs[Long]("n_candidates"))
    // the walk's visited set only grows with hops (the beam itself
    // may regress a hit, so only cost is asserted monotone)
    val gr = Similarity.GraphCurveHops.map(h => byKey(("graph", h.toLong)))
    gr.sliding(2).foreach { case Seq(a, b) =>
      assert(a.getAs[Long]("n_candidates") <= b.getAs[Long]("n_candidates"))
      case _ => ()
    }
    // pareto flags must equal the dominance rule recomputed here
    rows.foreach { r =>
      val dominated = rows.exists { o =>
        (o.getAs[String]("method") != r.getAs[String]("method") ||
          o.getAs[Long]("param") != r.getAs[Long]("param")) &&
          o.getAs[Long]("n_matched") >= r.getAs[Long]("n_matched") &&
          o.getAs[Long]("n_candidates") <= r.getAs[Long]("n_candidates") &&
          (o.getAs[Long]("n_matched") > r.getAs[Long]("n_matched") ||
            o.getAs[Long]("n_candidates") < r.getAs[Long]("n_candidates"))
      }
      assert(r.getAs[Boolean]("pareto") === !dominated,
        s"${r.getAs[String]("method")}/${r.getAs[Long]("param")}")
    }
  }

  test("ivfBalance: occupancy partitions the corpus; verdicts follow the integer thresholds") {
    val rows = Similarity.ivfBalance(embs).collect()
    val seeded = embs.collect().map(_.getAs[Number]("label").longValue()).toSet
    assert(rows.map(_.getAs[Long]("cell")).toSet === seeded)
    val nTotal = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(nTotal === embs.count())
    val nCells = rows.length.toLong
    rows.foreach { r =>
      val nv = r.getAs[Long]("n_vecs")
      val expect =
        if (nv == 0) "dead"
        else if (nv * nCells > nTotal * 2) "split"
        else if (nv * nCells * 2 < nTotal) "merge"
        else "ok"
      assert(r.getAs[String]("verdict") === expect)
      assert(math.abs(r.getAs[Double]("load_ratio") -
        nv.toDouble * nCells / nTotal) < 1e-12)
    }
  }

  test("ivfBalance: planted hot / starved / abandoned cells get split / merge / dead") {
    import spark.implicits._
    // cells 0 and 2 share direction (1,0): the E-step tie-breaks to
    // the smaller cell id, so cell 2 is abandoned. Cell 0 then holds
    // 7 of 8 vectors (21 > 2·8 → split); cell 1 holds 1 (2 < 8 via
    // 1·3·2 = 6 < 8 → merge).
    val vecs =
      (0 until 6).map(i => (i.toLong, Array(1f, 0f), 0)) ++
        Seq((6L, Array(0f, 1f), 1), (7L, Array(1f, 0f), 2))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfBalance(df).collect()
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_vecs"), r.getAs[String]("verdict"))).toMap
    assert(got(0L) === ((7L, "split")))
    assert(got(1L) === ((1L, "merge")))
    assert(got(2L) === ((0L, "dead")))
  }

  test("kmeansTrain: movement decays, cells stay within the seeded id space") {
    val curve = Similarity.kmeansTrain(embs).collect()
    assert(curve.length === Similarity.KmeansIters)
    val moved = curve.sortBy(_.getAs[Long]("iter")).map(_.getAs[Long]("n_moved"))
    assert(moved.zip(moved.tail).forall { case (a, b) => b <= a },
      s"movement must not grow round over round: ${moved.toSeq}")
    val seeded = embs.collect().map(_.getAs[Number]("label").longValue()).toSet
    val trained = Similarity.kmeansTrainedCells(embs).collect()
    assert(trained.length === embs.count())
    assert(trained.map(_.getAs[Number]("label").longValue()).toSet
      .subsetOf(seeded),
      "assignments can only target cells that existed (centroids come from members)")
    val recall = Similarity.ivfTrainedRecall(embs).collect()
    assert(recall.length === Similarity.NumProbes)
    assert(recall.forall { r =>
      val v = r.getAs[Double]("recall_at_k"); v >= 0.0 && v <= 1.0 })
  }

  test("transformation rules rename tables and reshape columns") {
    import graft.cdc.{ChangeFeed, TableMapping}
    val t = TableMapping.Transformations(Seq(
      TableMapping.RenameTable("users_0", "archive"),
      TableMapping.RenameColumn("value", "amount"),
      TableMapping.AddColumn("one", lit(1)),
      TableMapping.RemoveColumn("props")))
    val out = t(ChangeFeed.fromEvents(spark, sf))
    assert(!out.columns.contains("props"))
    assert(!out.columns.contains("value"))
    assert(out.columns.contains("amount") && out.columns.contains("one"))
    val tables = out.select("table_name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(tables.contains("archive") && !tables.contains("users_0"))
  }

  test("text analysis: counts, fingerprints, quality, langid shape") {
    val t = TextAnalysis.tokenCounts(docs, col("text")).collect()
    t.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_distinct_tokens"))
      assert(r.getAs[Double]("avg_token_len") > 0)
    }
    val q = TextAnalysis.quality(docs, col("text")).collect()
    q.foreach { r =>
      val s = r.getAs[Double]("quality_score")
      assert(s >= 0.0 && s <= 1.0)
    }
    // 'und' = zero marker hits in every language (the abstention)
    val langs = TextAnalysis.markers.map(_._1).toSet + "und"
    val preds = TextAnalysis.langId(docs, col("text")).collect()
      .map(r => (r.getAs[String]("pred_lang"),
        TextAnalysis.markers.map { case (l, _) => r.getAs[Long](s"score_$l") }))
    preds.foreach { case (p, scores) =>
      assert(langs.contains(p))
      assert((p == "und") == scores.forall(_ == 0L))
    }
    val fps = TextAnalysis.fingerprint(docs, col("text")).collect()
    fps.foreach(r => assert(r.getAs[String]("fp").length == 32))
  }

  test("frame sampler fans out videos 1-to-N, passes others through") {
    val out = Binary.frameSample(Binary.mediaPayload(docs)).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (docId, frames) =>
      val kind = frames.head.getAs[String]("kind")
      if (kind == "video") {
        assert(frames.length == (1 + java.lang.Math.floorMod(docId, 3L)).toInt)
        assert(frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq ==
          (0L until frames.length))
      } else assert(frames.length == 1)
    }
  }

  test("clusters: partition the candidate-graph vertices, labels are member minima") {
    val pairs = SparkEntry.queries("dedup_minhash")(spark, sf).collect()
    val vertices = pairs.flatMap(r =>
      Seq(r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))).toSet
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
    assert(clusters.map(_.getAs[Long]("n_docs")).sum == vertices.size)
    clusters.foreach { c =>
      assert(vertices.contains(c.getAs[Long]("cluster_id")))
      assert(c.getAs[Long]("cluster_id") <= c.getAs[Long]("max_doc_id"))
    }
  }

  test("clusterLabels computes EXACT connected components (union-find ground truth)") {
    import spark.implicits._
    val cands = SparkEntry.queries("dedup_minhash")(spark, sf)
      .select(col("doc_id_a"), col("doc_id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find over the same candidate graph (test-only;
    // the operator under test never collects)
    val expected = SparkTestSession.unionFindComponents(cands)
    val edges = cands.toSeq.toDF("src", "dst")
      .union(cands.toSeq.map(_.swap).toDF("src", "dst"))
    val labels = Dedup.clusterLabels(edges)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(got == expected)
    // and the labels are a fixed point: one more propagation round
    // changes nothing (guards against any fixed-depth approximation)
    val nbrMin = edges
      .join(labels.select(col("v").as("dst"), col("label").as("nl")), "dst")
      .groupBy(col("src")).agg(min(col("nl")).as("min_nbr"))
      .withColumnRenamed("src", "v")
    val improved = labels.join(nbrMin, Seq("v"))
      .filter(col("min_nbr") < col("label")).count()
    assert(improved == 0L)
    // a corpus with zero candidate pairs yields an empty cluster set,
    // not a crash (null label-sum on the empty graph)
    assert(Dedup.clusterLabels(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }

  test("recall@k is 1.0 against itself and within [0,1] for the LSH index") {
    import graft.ml.Similarity
    val bf = Similarity.topKBruteForce(embs)
    val self = Similarity.recallAtK(bf, bf).collect()
    assert(self.nonEmpty)
    self.foreach(r => assert(r.getAs[Double]("recall_at_k") == 1.0))
    val lsh = Similarity.recallAtK(bf,
      Similarity.topKAnnLsh(embs)).collect()
    lsh.foreach { r =>
      val v = r.getAs[Double]("recall_at_k")
      assert(v >= 0.0 && v <= 1.0)
    }
    val ivf = Similarity.recallAtK(bf,
      Similarity.topKAnnIvf(embs)).collect()
    assert(ivf.length == lsh.length) // one row per probe for both
    ivf.foreach { r =>
      val v = r.getAs[Double]("recall_at_k")
      assert(v >= 0.0 && v <= 1.0)
    }
  }

  test("multi-probe LSH: candidate superset of plain LSH, recall dominates") {
    import graft.ml.Similarity
    // every plain-LSH result pair appears in the multiprobe CANDIDATE
    // set (flip set includes the unflipped code), so per-probe recall
    // can only rise
    val bf = Similarity.topKBruteForce(embs)
    val lsh = Similarity.recallAtK(bf, Similarity.topKAnnLsh(embs))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mp = Similarity.recallAtK(bf, Similarity.topKAnnMultiprobe(embs))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mp.keySet === lsh.keySet)
    lsh.foreach { case (p, r) =>
      assert(mp(p) >= r, s"probe $p: multiprobe ${mp(p)} < lsh $r")
      assert(mp(p) <= 1.0)
    }
  }

  test("hamming ranking: a sign-copy ranks first at 0, an antipode last at 64") {
    import spark.implicits._
    import graft.ml.Similarity
    // 64-dim probe with strictly nonzero components; corpus holds an
    // exact copy (hamming 0) and the antipode (every sign flips: 64)
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 0.5f else -0.5f)
    val neg = v.map(-_)
    val rows = Seq(
      (0L, v, "p"), (10L, v, "c"), (11L, neg, "c"),
      (12L, Array.tabulate(64)(i => if (i < 32) 0.5f else -0.5f), "c"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.topKAnnHamming(rows)
      .filter(col("probe_id") === 0L).collect()
      .map(r => r.getAs[Long]("neighbor_id") ->
        (r.getAs[Long]("hamming"), r.getAs[Long]("rk"))).toMap
    assert(got(10L) === ((0L, 1L)))
    assert(got(11L) === ((64L, 3L)))
    assert(got(12L)._1 > 0L && got(12L)._1 < 64L)
    // recall against exact cosine: the sign-copy geometry is benign
    // enough that every value stays in [0, 1]
    val rec = Similarity.recallAtK(Similarity.topKBruteForce(embs),
      Similarity.topKAnnHamming(embs)).collect()
    rec.foreach { r =>
      val x = r.getAs[Double]("recall_at_k")
      assert(x >= 0.0 && x <= 1.0)
    }
  }

  test("two-stage re-rank dominates the plain Hamming ranking per probe") {
    import graft.ml.Similarity
    // the Hamming top-k is inside the re-rank candidate set and exact
    // cosine can only promote true neighbors within it
    val bf = Similarity.topKBruteForce(embs)
    val plain = Similarity.recallAtK(bf, Similarity.topKAnnHamming(embs))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rr = Similarity.recallAtK(bf, Similarity.topKAnnHammingRerank(embs))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rr.keySet === plain.keySet)
    plain.foreach { case (p, v) =>
      assert(rr(p) >= v, s"probe $p: rerank ${rr(p)} < hamming $v")
    }
  }

  test("corpus sampling is deterministic, rate-respecting, and stratum-scoped") {
    import graft.ml.Corpus
    val rates = Map("src1" -> 1000, "src2" -> 0)
    val s1 = Corpus.sampled(docs, rates, defaultPerMille = 100).collect()
    val s2 = Corpus.sampled(docs, rates, defaultPerMille = 100).collect()
    // deterministic: identical selection on re-run
    assert(s1.map(_.getAs[Long]("doc_id")).sorted.sameElements(
      s2.map(_.getAs[Long]("doc_id")).sorted))
    val bySrc = s1.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    val totals = docs.collect().groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    // per-mille 1000 keeps everything; 0 keeps nothing
    assert(bySrc.get("src1").contains(totals("src1")))
    assert(!bySrc.contains("src2"))
    // default strata keep roughly defaultPerMille (loose bound at tiny n)
    bySrc.filterKeys(s => !rates.contains(s)).foreach { case (s, n) =>
      assert(n <= totals(s) / 2, s"stratum $s kept $n of ${totals(s)}")
    }
  }

  test("sequence packing: bins respect the running-offset budget and partition by source") {
    import graft.ml.Corpus
    val budget = 512
    val rows = Corpus.packed(docs, budget).collect()
    rows.groupBy(_.getAs[String]("source")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("bin") == cum / budget)
        cum += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") == cum)
      }
    }
    // summary partitions all docs exactly once
    val sum = Corpus.packSummary(docs, budget).collect()
    assert(sum.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("decontamination scores match a driver-side recomputation") {
    import graft.ml.Corpus
    def shingleSet(text: String): Set[String] = {
      val toks = graft.functions.Portable.normTextJvm(text).split(" ")
      if (toks.length < Dedup.ShingleN) Set.empty
      else toks.sliding(Dedup.ShingleN).map(_.mkString(" ")).toSet
    }
    val all = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val evalSh = all.filter(_._2 == "src0").flatMap(t => shingleSet(t._3)).toSet
    val expected = all.filter(_._2 != "src0").flatMap { case (id, _, text) =>
      val sh = shingleSet(text)
      if (sh.isEmpty) None
      else Some(id -> (sh.size.toLong, sh.count(evalSh).toLong))
    }.toMap
    val got = Corpus.decontaminationScores(docs, col("source") === "src0")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_overlap"))).toMap
    assert(got == expected)
  }

  test("bloom decontamination matches a driver-side filter recomputation") {
    import graft.ml.Corpus
    val m = 512 // small enough that FPs actually occur at this corpus size
    def shingleSet(text: String): Set[String] = {
      val toks = graft.functions.Portable.normTextJvm(text).split(" ")
      if (toks.length < Dedup.ShingleN) Set.empty
      else toks.sliding(Dedup.ShingleN).map(_.mkString(" ")).toSet
    }
    def positions(sh: String): Seq[Long] =
      (0 until 3).map(s => Vectors.jvmPHash(sh + "#" + s) % m)
    val all = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val evalSh = all.filter(_._2 == "src0").flatMap(t => shingleSet(t._3)).toSet
    val filter = evalSh.flatMap(positions)
    val expected = all.filter(_._2 != "src0").map { case (id, _, text) =>
      val sh = shingleSet(text)
      val bloom = sh.count(s => positions(s).forall(filter))
      val exact = sh.count(evalSh)
      id -> (sh.size.toLong, bloom.toLong, exact.toLong)
    }.toMap
    val got = Corpus.bloomDecontaminationScores(
        docs, col("source") === "src0", m = m)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_bloom_hits"),
          r.getAs[Long]("n_exact_hits"))).toMap
    assert(got == expected)
    // the exact hits are always a subset of the bloom hits, and at
    // m=512 the filter is saturated enough that false positives exist
    // — the FP-accounting column is exercised, not vacuous
    assert(got.values.forall { case (_, b, e) => b >= e })
    assert(got.values.exists { case (_, b, e) => b > e },
      "expected at least one bloom false positive at m=512")
  }

  test("shuffle audit positions are a permutation and sources interleave") {
    import graft.ml.Corpus
    val rows = Corpus.shuffleAudit(docs).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("first_pos"),
        r.getAs[Long]("last_pos"), r.getAs[Double]("mean_pos")))
    val n = rows.map(_._1).sum
    assert(n == docs.count())
    // positions are exactly 1..N: ends reached, rank mass exact
    assert(rows.map(_._2).min == 1L && rows.map(_._3).max == n)
    val sumPos = rows.map { case (nd, _, _, m) => m * nd }.sum
    assert(math.abs(sumPos - n.toDouble * (n + 1) / 2) < 1e-6 * n * n)
    // interleaving: every non-tiny source's mean sits near the global
    // center, not in a band of its own (hash-uniform order)
    rows.filter(_._1 > 50).foreach { case (_, _, _, m) =>
      assert(math.abs(m - (n + 1) / 2.0) < n / 4.0)
    }
  }

  test("pipeline funnel stages are monotone and tie out against the stage operators") {
    import graft.ml.Corpus
    val funnel = Corpus.pipelineFunnel(docs, col("source") === "src0")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_raw"), r.getAs[Long]("n_quality"),
          r.getAs[Long]("n_canonical"), r.getAs[Long]("n_final"),
          r.getAs[Long]("tokens_final"))).toMap
    // monotone: each gate only removes documents
    funnel.values.foreach { case (raw, q, c, f, toks) =>
      assert(raw >= q && q >= c && c >= f)
      assert(f > 0 || toks == 0)
    }
    // n_raw ties out against the raw per-source counts
    val raw = docs.filter(col("source") =!= "src0")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel.view.mapValues(_._1).toMap == raw)
    // the decontamination stage agrees with decontaminationScores:
    // per-source zero-overlap canonical keepers == n_final
    val keptByDecon = Corpus.decontaminationScores(
        docs, col("source") === "src0")
      .filter(col("n_overlap") === 0L).select("doc_id")
    val scored = graft.ml.TextAnalysis.quality(
        docs.filter(col("source") =!= "src0"), col("text"))
      .withColumn("fp", md5(graft.functions.Portable.normText(col("text"))))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
          .orderBy(col("doc_id"))))
      .filter(col("quality_score") >= 0.5 && col("rn") === 1)
    val expectedFinal = scored.join(keptByDecon, "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel.collect { case (s, (_, _, _, f, _)) if f > 0 => s -> f }
      == expectedFinal)
  }

  test("embedding clusters are the exact components of the near-dup graph") {
    val embs = Tables.load(spark, sf, "embeddings")
    val pairs = Dedup.embeddingPairs(embs)
      .select("vec_id_a", "vec_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find with min-root unions: the component
    // root is always the component's minimum vertex
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val expected = verts.groupBy(find).map { case (root, vs) =>
      root -> (vs.size.toLong, vs.max) }
    val got = Dedup.embeddingClusters(embs).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("max_vec_id"))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "test corpus should contain embedding near-dups")
  }

  test("PQ codebook report matches a driver-side recomputation") {
    import graft.ml.Similarity
    // Spark's round(double) rounds ties away from zero over the
    // canonical decimal rendering — mirror it exactly
    def rnd(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val embs = Tables.load(spark, sf, "embeddings")
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => rnd(x.toDouble * 1000)).toArray)
    val W = Similarity.PqWidth
    val planes = Array.tabulate(Similarity.PqSub, Similarity.PqBits)(
      (j, p) => Similarity.pqPlane(j, p).toArray)
    def code0(q: Array[Long], j: Int): Long =
      (0 until Similarity.PqBits).map { p =>
        val d = (0 until W).map(i => q(j * W + i) * planes(j)(p)(i)).sum
        if (d >= 0) 1L << p else 0L
      }.sum
    // rounded-mean centroids per (sub, code0, component)
    val members = vecs.flatMap { case (_, q) =>
      (0 until Similarity.PqSub).map(j => ((j, code0(q, j)), q)) }
    val comp = members.groupBy(_._1).map { case ((j, c), vs) =>
      (j, c) -> Array.tabulate(W)(i =>
        rnd(vs.map(_._2(j * W + i)).sum.toDouble / vs.length))
    }
    // refine: nearest centroid within the subspace by (d2, code)
    val chosen = vecs.flatMap { case (_, q) =>
      (0 until Similarity.PqSub).map { j =>
        comp.collect { case ((`j`, c), m) =>
          (c, (0 until W).map(i =>
            { val d = q(j * W + i) - m(i); d * d }).sum)
        }.minBy { case (c, d2) => (d2, c) } match {
          case (c, d2) => ((j.toLong, c), d2)
        }
      }
    }
    val expected = chosen.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._2).sum) }
    val got = Similarity.pqReport(embs).collect()
      .map(r => (r.getAs[Long]("subspace"), r.getAs[Long]("code")) ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("sum_d2"))).toMap
    assert(got == expected)
    // every vector contributes exactly one code per subspace
    (0 until Similarity.PqSub).foreach { j =>
      assert(got.collect { case ((s, _), (n, _)) if s == j => n }.sum
        == vecs.length.toLong)
    }
  }

  test("PQ-ADC top-k matches a driver-side lookup-table ranking") {
    import graft.ml.Similarity
    def rnd(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val embs = Tables.load(spark, sf, "embeddings")
    // the ADC scan stores NORMALIZED-quantized vectors (unit-sphere
    // L2 ≡ cosine order); mirror quantize → n2 → rescale → round
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => rnd(x.toDouble * 1000)).toArray)
      .filter { case (_, q) => q.exists(_ != 0L) }
      .map { case (id, q) =>
        val n2 = q.map(x => x * x).sum
        id -> q.map(x => rnd(x.toDouble * 1000 / math.sqrt(n2.toDouble)))
      }
    val W = Similarity.PqWidth
    val planes = Array.tabulate(Similarity.PqSub, Similarity.PqBits)(
      (j, p) => Similarity.pqPlane(j, p).toArray)
    def code0(q: Array[Long], j: Int): Long =
      (0 until Similarity.PqBits).map { p =>
        val d = (0 until W).map(i => q(j * W + i) * planes(j)(p)(i)).sum
        if (d >= 0) 1L << p else 0L
      }.sum
    val members = vecs.flatMap { case (_, q) =>
      (0 until Similarity.PqSub).map(j => ((j, code0(q, j)), q)) }
    val comp = members.groupBy(_._1).map { case ((j, c), vs) =>
      (j, c) -> Array.tabulate(W)(i =>
        rnd(vs.map(_._2(j * W + i)).sum.toDouble / vs.length))
    }
    def subD2(q: Array[Long], j: Int, m: Array[Long]): Long =
      (0 until W).map { i => val d = q(j * W + i) - m(i); d * d }.sum
    // chosen code per (vec, sub): nearest centroid, ties by code
    val codes = vecs.map { case (id, q) =>
      id -> (0 until Similarity.PqSub).map { j =>
        comp.collect { case ((`j`, c), m) => (c, subD2(q, j, m)) }
          .minBy { case (c, d2) => (d2, c) }._1
      }
    }.toMap
    val probes = vecs.filter(_._1 < Similarity.NumProbes)
    val expected = probes.flatMap { case (pid, pq) =>
      val scoredC = vecs.filter(_._1 != pid).map { case (nid, _) =>
        val d = (0 until Similarity.PqSub).map { j =>
          val m = comp((j, codes(nid)(j)))
          subD2(pq, j, m)
        }.sum
        (nid, d)
      }.sortBy { case (nid, d) => (d, nid) }.take(Similarity.TopK)
      scoredC.zipWithIndex.map { case ((nid, d), k) =>
        (pid, nid) -> (d, (k + 1).toLong) }
    }.toMap
    val got = Similarity.topKAnnPq(embs).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")) ->
        (r.getAs[Long]("approx_d2"), r.getAs[Long]("rk"))).toMap
    assert(got == expected)
  }

  test("frame sampler offsets and checksums come from the bytes, not the length") {
    // frame sums partition the whole-payload sum the decoder finds,
    // and every frame offset lands exactly on that frame's content
    // (re-parsed independently here from the encoded bytes)
    val ids = Seq(2L, 5L, 8L, 11L) // videos: 3 frames each
    ids.foreach { id =>
      val p = Binary.encodeMedia(id)
      val frames = Binary.parseFrames(id, p)
      val whole = Binary.parseMedia(id, p)
      assert(frames.map(_.frame_sum).sum == whole.payload_sum, s"id=$id")
      frames.foreach { f =>
        val sliceSum = (f.frame_off until f.frame_off + f.frame_bytes)
          .map(k => p(k.toInt) & 0xff).map(_.toLong).sum
        assert(f.frame_sum == sliceSum, s"id=$id frame=${f.frame_idx}")
        assert(f.luma_sum <= f.frame_sum && f.luma_sum > 0, s"id=$id")
      }
      // offsets strictly increase and stay within the payload
      val offs = frames.map(_.frame_off)
      assert(offs == offs.sorted && offs.last + frames.last.frame_bytes <= p.length)
    }
    // single-plane kinds: one frame, luma == frame sum == decoder sum
    Seq(0L, 3L, 1L, 4L).foreach { id =>
      val p = Binary.encodeMedia(id)
      val fs = Binary.parseFrames(id, p)
      assert(fs.length == 1)
      assert(fs.head.frame_sum == Binary.parseMedia(id, p).payload_sum)
      assert(fs.head.luma_sum == fs.head.frame_sum)
    }
  }

  test("topk terms: at most k per group, contiguous ranks, freq non-increasing") {
    val rows = SparkEntry.queries("text_topk_terms")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("group_key")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.length <= 10)
      assert(sorted.map(_.getAs[Long]("rk")).sameElements(1L to sorted.length))
      val fs = sorted.map(_.getAs[Long]("term_freq"))
      assert(fs.zip(fs.tail).forall { case (a, b) => b <= a })
    }
  }

  test("media decoder emits one parsed row per document") {
    val out = Binary.decodeMedia(Binary.mediaPayload(docs)).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      assert(Set("image", "audio", "video").contains(r.getAs[String]("kind")))
      assert(r.getAs[Long]("f0") > 0 && r.getAs[Long]("payload_sum") > 0)
    }
  }

  test("media decoder parses hand-authored canonical files, not just its own") {
    import java.nio.{ByteBuffer, ByteOrder}
    // 2x2 24-bpp BMP authored from the spec: stride 8 (2 padding
    // bytes/row), rows stored bottom-up, pixel bytes sum to 780.
    val bmp = ByteBuffer.allocate(70).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(70)
      .putShort(0).putShort(0).putInt(54)
    bmp.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    Seq(70, 80, 90, 100, 110, 120, 0, 0, // image row 1 (stored first)
      10, 20, 30, 40, 50, 60, 0, 0)      // image row 0
      .foreach(b => bmp.put(b.toByte))
    val gotBmp = Binary.parseMedia(7L, bmp.array())
    assert((gotBmp.kind, gotBmp.f0, gotBmp.f1, gotBmp.f2, gotBmp.payload_sum)
      == (("image", 2L, 2L, 24L, 780L)))

    // canonical 44-byte-header WAV, 44100 Hz mono 8-bit, 4 samples
    val wav = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(40)
      .put("WAVE".getBytes("US-ASCII"))
    wav.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(44100).putInt(44100)
      .putShort(1).putShort(8)
    wav.put("data".getBytes("US-ASCII")).putInt(4)
    Seq(1, 2, 3, 250).foreach(b => wav.put(b.toByte))
    val gotWav = Binary.parseMedia(8L, wav.array())
    assert((gotWav.kind, gotWav.f0, gotWav.f1, gotWav.f2, gotWav.payload_sum)
      == (("audio", 44100L, 8L, 4L, 256L)))

    // one-frame 2x2 C420 Y4M: 6 plane bytes (4 Y + 1 Cb + 1 Cr)
    val y4m = ("YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\nFRAME\n"
      .getBytes("US-ASCII") ++ Array[Byte](5, 6, 7, 8, 9, 10))
    val gotY4m = Binary.parseMedia(9L, y4m)
    assert((gotY4m.kind, gotY4m.f0, gotY4m.f1, gotY4m.f2, gotY4m.payload_sum)
      == (("video", 2L, 2L, 1L, 45L)))

    // unknown container fails loudly with the doc id
    val e = intercept[org.apache.spark.SparkException] {
      Binary.decodeMedia(spark.createDataFrame(Seq(
        (99L, Array[Byte](0, 1, 2, 3)))).toDF("doc_id", "payload")).collect()
    }
    assert(e.getMessage != null)
  }

  test("audio features parse a hand-authored WAV and tie out per-sample") {
    import java.nio.{ByteBuffer, ByteOrder}
    // 4 samples 128,130,126,128 → devs 0,+2,-2,0: energy 8, two sign
    // flips (+2→-2 and -2→0 with 0 counted non-negative), peak 2.
    val wav = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(40)
      .put("WAVE".getBytes("US-ASCII"))
    wav.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    wav.put("data".getBytes("US-ASCII")).putInt(4)
    Seq(128, 130, 126, 128).foreach(b => wav.put(b.toByte))
    val f = Binary.parseAudioFeatures(5L, wav.array()).get
    assert((f.sample_rate, f.n_samples, f.sum_sq_dev, f.n_zero_cross,
      f.peak_dev, f.duration_us) == ((8000L, 4L, 8L, 2L, 2L, 500L)))
    // non-audio payloads contribute no row
    assert(Binary.parseAudioFeatures(6L, Binary.encodeMedia(0L)).isEmpty)
    // features recomputed from the synthesized content formula
    val id = 7L // 7 % 3 == 1 → audio
    val n = (64 + id % 101).toInt
    val devs = (0 until n).map(k => ((id * 31 + k) % 256 - 128).toInt)
    val g = Binary.parseAudioFeatures(id, Binary.encodeMedia(id)).get
    assert(g.sum_sq_dev == devs.map(d => d.toLong * d).sum)
    assert(g.n_zero_cross ==
      devs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    assert(g.peak_dev == devs.map(math.abs).max.toLong)
  }

  test("image features parse a hand-authored BMP and tie out per-channel") {
    import java.nio.{ByteBuffer, ByteOrder}
    // same hand-authored 2x2 BMP as the decoder test: channel sums
    // B=10+40+70+100, G=20+50+80+110, R=30+60+90+120; mean 780/12
    val bmp = ByteBuffer.allocate(70).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(70)
      .putShort(0).putShort(0).putInt(54)
    bmp.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    Seq(70, 80, 90, 100, 110, 120, 0, 0,
      10, 20, 30, 40, 50, 60, 0, 0)
      .foreach(b => bmp.put(b.toByte))
    val f = Binary.parseImageFeatures(7L, bmp.array()).get
    assert((f.width, f.height, f.n_pixels, f.sum_b, f.sum_g, f.sum_r)
      == ((2L, 2L, 4L, 220L, 260L, 300L)))
    assert(f.mean_brightness == 65.0)
    // padding bytes are structural, not pixel data: they're excluded
    assert(f.sum_b + f.sum_g + f.sum_r == 780L)
    // non-image payloads contribute no row
    assert(Binary.parseImageFeatures(8L, Binary.encodeMedia(1L)).isEmpty)
  }

  test("scene cuts tie out against the frame walk's luma sums") {
    val docs = Tables.load(spark, sf, "documents")
    val frames = Binary.frameSample(Binary.mediaPayload(docs))
    val lumas = frames.filter(col("kind") === "video")
      .select("doc_id", "frame_idx", "luma_sum").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    val expected = lumas.map { case (id, ls) =>
      val diffs = ls.sliding(2).filter(_.size == 2).map(p => math.abs(p(1) - p(0))).toSeq
      id -> (ls.size.toLong, diffs.sum, diffs.count(_ > 100L).toLong,
        if (diffs.isEmpty) 0L else diffs.max)
    }
    val got = Binary.sceneCuts(frames).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_frames"),
        r.getAs[Long]("sum_abs_diff"), r.getAs[Long]("n_cuts"),
        r.getAs[Long]("max_diff"))).toMap
    assert(got == expected)
    // multi-frame videos exist, so the diff path is exercised
    assert(got.values.exists(_._1 > 1L))
  }

  test("media encode/decode roundtrip matches the oracle formulas") {
    for (id <- 0L to 60L) {
      val info = Binary.parseMedia(id, Binary.encodeMedia(id))
      val m = (id % 3).toInt
      val n = m match {
        case 0 => (4 + id % 13) * (3 + id % 7) * 3
        case 1 => 64 + id % 101
        case _ => (1 + id % 3) * ((4 + 2 * (id % 6)) * (2 + 2 * (id % 4)) * 3 / 2)
      }
      val expSum = (0L until n).map(k => (id * 31 + k) % 256).sum
      assert(info.payload_sum == expSum, s"id=$id")
      m match {
        case 0 => assert((info.kind, info.f0, info.f1, info.f2)
          == (("image", 4 + id % 13, 3 + id % 7, 24L)), s"id=$id")
        case 1 => assert((info.kind, info.f0, info.f1, info.f2)
          == (("audio", 8000 + (id % 5) * 2000, 8L, 64 + id % 101)), s"id=$id")
        case _ => assert((info.kind, info.f0, info.f1, info.f2)
          == (("video", 4 + 2 * (id % 6), 2 + 2 * (id % 4), 1 + id % 3)), s"id=$id")
      }
    }
  }

  test("anisotropy: aligned cloud scores 1, balanced cloud scores 0") {
    import spark.implicits._
    val embs = Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(1.0f, 0.0f), 1),
      (2L, Array(1.0f, 0.0f), 2), (3L, Array(-1.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.anisotropy(embs).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Double]("anisotropy"), r.getAs[Double]("mean_shift"))).toMap
    assert(got(1) == ((1.0, 1.0)))   // identical vectors: mean == each
    assert(got(2) == ((0.0, 0.0)))   // opposing vectors: mean cancels
    val rows = SparkEntry.queries("embed_anisotropy")(spark, sf).collect()
    assert(rows.forall { r =>
      val a = r.getAs[Double]("anisotropy"); a >= 0.0 && a <= 1.0 })
  }

  test("kcore: erosion is monotone in both nodes and edges") {
    val rows = SparkEntry.queries("sim_knn_kcore")(spark, sf).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.map(_.getAs[Long]("round")).sameElements(
      0L to Similarity.KcoreRounds))
    val alive = rows.map(_.getAs[Long]("n_alive"))
    val edges = rows.map(_.getAs[Long]("n_edges"))
    assert(alive.zip(alive.tail).forall { case (a, b) => b <= a })
    assert(edges.zip(edges.tail).forall { case (a, b) => b <= a })
    assert(alive.head > 0)
  }

  test("quality-length correlation: |r| bounded, degenerate source is null") {
    import spark.implicits._
    val df = Seq((1L, "solo", "one doc only here")).toDF("doc_id", "source", "text")
    val solo = TextAnalysis.qualityLengthCorr(df, col("text")).collect().head
    assert(solo.isNullAt(solo.fieldIndex("r")))  // zero variance
    val rows = SparkEntry.queries("corpus_quality_length_corr")(spark, sf)
      .collect()
    rows.filter(!_.isNullAt(4)).foreach { r =>
      val v = r.getAs[Double]("r"); assert(v >= -1.0 && v <= 1.0) }
  }

  test("char LM: hand-computed bigram surprise") {
    import spark.implicits._
    // doc 1 "aa": bigram "aa" (bf=1), unigram a (uf=2+1 from doc 2)
    //   = 3 → surprise ⌊log2(3 div 1)⌋ = 1
    // doc 2 "a": no bigrams → zero counts, null avg
    val df = Seq((1L, "aa"), (2L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.charLm(df, col("text")).collect()
    assert(got(0).getAs[Long]("n_bigrams") == 1L)
    assert(got(0).getAs[Long]("n_novel") == 1L)
    assert(got(0).getAs[Long]("sum_surprise") == 1L)
    assert(got(0).getAs[Double]("avg_surprise") == 1.0)
    assert(got(1).getAs[Long]("n_bigrams") == 0L)
    assert(got(1).isNullAt(got(1).fieldIndex("avg_surprise")))
  }

  test("graph search: beam invariants; more hops never regress the beam") {
    val embs = Tables.load(spark, sf, "embeddings")
    val beam = SparkEntry.queries("sim_ann_graph")(spark, sf).collect()
    beam.groupBy(_.getAs[Long]("probe_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      val rks = sorted.map(_.getAs[Long]("rk"))
      assert(rks.sameElements(1L to rks.length) &&
        rks.length <= Similarity.GraphSearchBeam)
      val cos = sorted.map(_.getAs[Double]("cos_sim"))
      assert(cos.zip(cos.tail).forall { case (a, b) => b <= a })
      assert(sorted.forall(r =>
        r.getAs[Long]("neighbor_id") != r.getAs[Long]("probe_id")))
    }
    // visited-best is kept in every expansion, so a longer walk's
    // best-found cosine can only improve
    def bestByProbe(hops: Int): Map[Long, Double] = {
      graft.CacheScope.releaseAll()
      Similarity.graphSearch(embs, hops = hops).collect()
        .groupBy(_.getAs[Long]("probe_id"))
        .view.mapValues(_.map(_.getAs[Double]("cos_sim")).max).toMap
    }
    val h1 = bestByProbe(1)
    val h4 = bestByProbe(Similarity.GraphSearchHops)
    h1.foreach { case (p, c1) => assert(h4(p) >= c1, s"probe $p regressed") }
  }

  test("graph curve: per-probe recall monotone in walk length") {
    val rows = SparkEntry.queries("sim_ann_graph_curve")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("hops")).distinct.sorted.sameElements(
      Similarity.GraphCurveHops.map(_.toLong)))
    // a true top-k neighbor can never be evicted from a beam ≥ k
    // (only nodes ranking above it could, and those ARE top-k), so
    // recall per probe never decreases as the walk lengthens
    rows.groupBy(_.getAs[Long]("probe_id")).values.foreach { g =>
      val byHop = g.sortBy(_.getAs[Long]("hops"))
        .map(_.getAs[Double]("recall_at_k"))
      assert(byHop.zip(byHop.tail).forall { case (a, b) => b >= a })
    }
  }

  test("prefix curve: recall in [0,1]; the widest prefix dominates the narrowest") {
    val rows = SparkEntry.queries("embed_prefix_curve")(spark, sf).collect()
    assert(rows.forall { r =>
      val x = r.getAs[Double]("recall_at_k"); x >= 0.0 && x <= 1.0 })
    val byDim = rows.groupBy(_.getAs[Long]("prefix_dim"))
      .view.mapValues(rs =>
        rs.map(_.getAs[Double]("recall_at_k")).sum / rs.length).toMap
    assert(byDim.keySet == Similarity.PrefixCurveDims.map(_.toLong).toSet)
    assert(byDim(32L) >= byDim(4L))
  }

  test("ascii profile: multibyte excess counts continuation bytes exactly") {
    import spark.implicits._
    // "héllo" = 5 chars, 6 UTF-8 bytes (é is 2) → excess 1
    val df = Seq((1L, "A", "héllo"), (2L, "A", "ascii"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.asciiProfile(df, col("text")).collect().head
    assert(r.getAs[Long]("n_chars") == 10L && r.getAs[Long]("n_bytes") == 11L)
    assert(r.getAs[Long]("multibyte_excess") == 1L)
    assert(r.getAs[Long]("n_multibyte_docs") == 1L)
    // corpus invariants: bytes never below chars
    val rows = SparkEntry.queries("text_ascii_profile")(spark, sf).collect()
    assert(rows.forall(x =>
      x.getAs[Long]("n_bytes") >= x.getAs[Long]("n_chars")))
  }

  test("dedup impact: survivors agree with dedup_exact; mirror source fully removed") {
    import spark.implicits._
    // doc 3 mirrors doc 1's text from another source: the global
    // min-doc_id rule keeps doc 1, so source B shows 100% removal
    val df = Seq(
      (1L, "A", "same text here", 14L),
      (2L, "A", "other text", 10L),
      (3L, "B", "same text here", 14L)).toDF("doc_id", "source", "text", "n_chars")
    val got = Corpus.dedupImpact(df).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_kept"), r.getAs[Double]("removed_share"))).toMap
    assert(got("A") == ((2L, 0.0)) && got("B") == ((0L, 1.0)))
    // full corpus: kept docs across sources == distinct fingerprints
    val rows = SparkEntry.queries("corpus_dedup_impact")(spark, sf).collect()
    val nFp = SparkEntry.queries("dedup_exact")(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_kept")).sum == nFp)
    assert(rows.forall { r =>
      val s = r.getAs[Double]("removed_share"); s >= 0.0 && s <= 1.0 })
  }

  test("anneal mix: sqrt temperature compresses the share range, weights sum to 1") {
    import spark.implicits._
    val df = Seq((1L, "A", 100L), (2L, "B", 400L))
      .toDF("doc_id", "source", "n_chars")
    val got = Corpus.annealMix(df).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("share"), r.getAs[Double]("w_half"))).toMap
    assert(got("A")._1 == 0.2 && got("B")._1 == 0.8)
    assert(math.abs(got("A")._2 - 1.0 / 3.0) < 1e-12)
    assert(math.abs(got("B")._2 - 2.0 / 3.0) < 1e-12)
    val rows = SparkEntry.queries("corpus_anneal_mix")(spark, sf).collect()
    // 1e-6: the Σ normalizer is kept at DECIMAL(38,6) for engine
    // parity, so each weight carries ~1e-8 relative rounding
    Seq("share", "w_half", "w_quarter").foreach { c =>
      assert(math.abs(rows.map(_.getAs[Double](c)).sum - 1.0) < 1e-6, c)
    }
    // annealing monotonicity: α<1 pulls every weight toward uniform
    val uniform = 1.0 / rows.length
    rows.foreach { r =>
      val (s, h) = (r.getAs[Double]("share"), r.getAs[Double]("w_half"))
      assert(if (s > uniform) h <= s else h >= s,
        s"${r.getAs[String]("source")}: $s -> $h")
    }
  }

  test("burstiness: hand-computed Fano factors; even spread scores 0") {
    import spark.implicits._
    // src A, term "a": doc1 c=3, doc2 c=1 → df=2, sx=4, sx2=10
    //   vmr = (2·10 − 16) / (2·4) = 0.5  (bursty: clumps in doc1)
    // src A, term "b": one per doc → vmr = (2·2 − 4) / (2·2) = 0
    val df = Seq(
      (1L, "A", "a a a b"),
      (2L, "A", "a b")).toDF("doc_id", "source", "text")
    val got = TextAnalysis.burstiness(df, col("text"), 10)
      .orderBy(col("rk")).collect()
    val byTok = got.map(r => r.getAs[String]("tok") ->
      (r.getAs[Long]("df"), r.getAs[Long]("total_tf"),
        r.getAs[Double]("vmr"))).toMap
    assert(byTok("a") == ((2L, 4L, 0.5)))
    assert(byTok("b") == ((2L, 2L, 0.0)))
    // full-corpus run: ranks contiguous per source, VMR never negative
    val rows = SparkEntry.queries("text_burstiness")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("source")).values.foreach { g =>
      val rks = g.map(_.getAs[Long]("rk")).sorted
      assert(rks.sameElements(1L to rks.length))
    }
    assert(rows.forall(_.getAs[Double]("vmr") >= 0.0))
  }

  test("zipf octaves: masses partition the token count, octave widths bounded") {
    val rows = SparkEntry.queries("text_zipf_octaves")(spark, sf).collect()
    val toks = docs.select(explode(TextAnalysis.tokens(col("text")))
      .as("t")).count()
    assert(rows.map(_.getAs[Long]("mass")).sum == toks)
    rows.groupBy(_.getAs[String]("source")).values.foreach { g =>
      val byOct = g.sortBy(_.getAs[Long]("octave"))
      // octave j holds ranks [2^j, 2^{j+1}) → at most 2^j terms;
      // octave 0 is exactly the rank-1 term
      byOct.foreach { r =>
        val j = r.getAs[Long]("octave")
        assert(r.getAs[Long]("n_terms") <= (1L << j))
      }
      assert(byOct.head.getAs[Long]("octave") == 0L &&
        byOct.head.getAs[Long]("n_terms") == 1L)
      // decay defined for every octave but the first
      assert(byOct.head.isNullAt(byOct.head.fieldIndex("decay")))
      assert(byOct.tail.forall(r => !r.isNullAt(r.fieldIndex("decay"))))
    }
  }

  test("unigram LM scores match a hand-computed frequency table") {
    import spark.implicits._
    // tf: a=2, b=2, c=1  →  doc 1: Σtf=6, Σ⌊log2 tf⌋=3, hapax=0
    //                       doc 2: Σtf=3, Σ⌊log2 tf⌋=1, hapax=1
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLm(df, col("text"))
      .orderBy(col("doc_id")).collect()
    assert(got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("sum_tf"), r.getAs[Long]("sum_log2_tf"),
      r.getAs[Long]("n_hapax"))).toSeq ==
      Seq((1L, 3L, 6L, 3L, 0L), (2L, 2L, 3L, 1L, 1L)))
    assert(got(0).getAs[Double]("avg_tf") == 2.0)
    assert(got(1).getAs[Double]("avg_log2_tf") == 0.5)
  }

  test("bigram LM surprise matches a hand-computed table; empty docs kept") {
    import spark.implicits._
    // uf: a=4 b=2 c=1; bf: (a,a)=1 (a,b)=2 (b,a)=1
    // surprise ⌊log2(uf//bf)⌋: (a,a)=2 (a,b)=1 (b,a)=1
    val df = Seq((1L, "a a b a"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLm(df, col("text"))
      .orderBy(col("doc_id")).collect()
    assert(got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
      r.getAs[Long]("n_novel"), r.getAs[Long]("sum_bf"),
      r.getAs[Long]("sum_surprise"))).toSeq ==
      Seq((1L, 3L, 2L, 4L, 4L), (2L, 1L, 0L, 2L, 1L), (3L, 0L, 0L, 0L, 0L)))
    assert(math.abs(got(0).getAs[Double]("avg_surprise") - 4.0 / 3) < 1e-12)
    assert(got(1).getAs[Double]("avg_surprise") == 1.0)
    assert(got(2).isNullAt(got(2).fieldIndex("avg_surprise")))
    // corpus-level invariant on the real table: n_bigrams = max(n_tokens-1, 0)
    val docs = Tables.load(spark, sf, "documents")
    val uni = TextAnalysis.unigramLm(docs, col("text"))
      .select(col("doc_id"), col("n_tokens"))
    val bad = TextAnalysis.bigramLm(docs, col("text"))
      .join(uni, "doc_id")
      .filter(col("n_bigrams") =!=
        greatest(col("n_tokens") - 1L, org.apache.spark.sql.functions.lit(0L)))
      .count()
    assert(bad == 0L)
  }

  test("PII scrub counts and redacts exactly the planted spans") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at jo.doe+x@test.org or jo@a.io thanks"),
      (2L, "ssn 123-45-6789 phone 555-123-4567"),
      (3L, "clean text, no identifiers at all"),
      (4L, "almost 12-34-5678 and 5551234567 but not shaped")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(df, col("text"))
      .orderBy(col("doc_id")).collect()
    def row(i: Int) = (got(i).getAs[Long]("n_emails"),
      got(i).getAs[Long]("n_phones"), got(i).getAs[Long]("n_ids"),
      got(i).getAs[String]("redacted"))
    assert(row(0) == (2L, 0L, 0L, "mail me at <EMAIL> or <EMAIL> thanks"))
    assert(row(1) == (0L, 1L, 1L, "ssn <ID> phone <PHONE>"))
    assert(row(2) == (0L, 0L, 0L, "clean text, no identifiers at all"))
    assert(row(3) == (0L, 0L, 0L, "almost 12-34-5678 and 5551234567 but not shaped"))
  }

  test("epoch-weighted mixture: full epochs unconditional, partial gated, zero dropped") {
    import graft.ml.Corpus
    val weights = Map("src0" -> 2500, "src1" -> 1000, "src2" -> 0)
    val out = Corpus.mixed(docs, weights, defaultPerMille = 1000)
      .select(col("doc_id"), col("source"), col("epoch")).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(!bySrc.contains("src2"))
    val src0Ids = docs.filter(col("source") === "src0")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // epochs 0 and 1 carry EVERY src0 doc; epoch 2 a strict subset
    val src0 = bySrc("src0").groupBy(_.getAs[Long]("epoch"))
    assert(src0(0L).map(_.getLong(0)).toSet == src0Ids)
    assert(src0(1L).map(_.getLong(0)).toSet == src0Ids)
    val partial = src0.getOrElse(2L, Array.empty).map(_.getLong(0)).toSet
    assert(partial.subsetOf(src0Ids) && partial.size < src0Ids.size)
    // weight 1000 = exactly one unconditional epoch
    bySrc.view.filterKeys(k => k != "src0" && k != "src2").values.foreach { rows =>
      assert(rows.forall(_.getAs[Long]("epoch") == 0L))
    }
    // deterministic: a second run selects the identical multiset
    val again = Corpus.mixed(docs, weights, defaultPerMille = 1000)
      .select(col("doc_id"), col("source"), col("epoch")).collect()
    assert(again.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      .sameElements(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted))
  }

  test("repetition signals are internally consistent per document") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "go go go go"),
      (3L, "unique words only here"),
      (4L, "one")).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(df, col("text"))
      .orderBy(col("doc_id")).collect()
    got.foreach { r =>
      val (n, d, top) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("top_freq"))
      assert(d <= n && top >= 1 && top <= n)
      assert(r.getAs[Long]("n_bigrams") == math.max(n - 1, 0L))
      assert(math.abs(r.getAs[Double]("dup_word_ratio") -
        (n - d).toDouble / n) < 1e-12)
    }
    // "go go go go": 4 words, 1 distinct, top_freq 4, 3 bigrams all equal
    val g2 = got(1)
    assert(g2.getAs[Long]("top_freq") == 4L)
    assert(g2.getAs[Long]("n_distinct_bigrams") == 1L)
    assert(g2.getAs[Double]("dup_bigram_ratio") == 2.0 / 3.0)
    // single word: no bigrams, ratio defined as 0
    assert(got(3).getAs[Double]("dup_bigram_ratio") == 0.0)
  }

  test("dup-ngram census: per-source totals tie out against the shingle inventory") {
    import graft.ml.Corpus
    val got = SparkEntry.queries("corpus_dup_ngrams")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, sh) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_shared"))
      assert(sh >= 0 && sh <= n)
      val ratio = r.getAs[Double]("shared_ratio")
      assert(math.abs(ratio - sh.toDouble / n) < 1e-12)
    }
    val totalPairs = Dedup.shingles(
      Tables.load(spark, sf, "documents")).distinct().count()
    assert(got.map(_.getAs[Long]("n_shingles")).sum == totalPairs)
  }

  test("keywords: one keyword per doc, argmax beats the doc's rarest repeated term") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha alpha alpha common common"),
      (2L, "common common beta beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(df, col("text"))
      .orderBy(col("doc_id")).collect()
    assert(got.length == 3)
    // 'common' appears in every doc → idf ⌊log2(3/3)⌋ = 0, score 0;
    // the doc-exclusive terms (df=1, idf ⌊log2 3⌋=1) must win
    assert(got(0).getAs[String]("keyword") == "alpha")
    assert(got(0).getAs[Long]("score") == 3L)
    assert(got(1).getAs[String]("keyword") == "beta")
    assert(got(2).getAs[String]("keyword") == "gamma")
  }

  test("length histogram buckets bound their min/max token counts") {
    val got = SparkEntry.queries("corpus_histogram")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (lo, hi) = (1L << b, 1L << (b + 1))
      assert(r.getAs[Long]("min_tokens") >= lo)
      assert(r.getAs[Long]("max_tokens") < hi)
      assert(r.getAs[Long]("min_tokens") <= r.getAs[Long]("max_tokens"))
    }
    val total = Tables.load(spark, sf, "documents").count()
    assert(got.map(_.getAs[Long]("n_docs")).sum == total)
  }

  test("wide-simhash near pairs respect the hamming bound and pigeonhole bands") {
    val rows = SparkEntry.queries("dedup_simhash_pairs")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("hamming") <= Dedup.MaxHamming)
      assert(r.getAs[Long]("doc_id_a") < r.getAs[Long]("doc_id_b"))
    }
    // exact duplicates (same normalized text) must surface at hamming 0
    val sigs = Dedup.simhashWideSigs(Tables.load(spark, sf, "documents"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sig")).toMap
    val dupGroups = SparkEntry.queries("dedup_exact")(spark, sf).collect()
      .filter(_.getAs[Long]("n_docs") > 1)
    if (dupGroups.nonEmpty) {
      val pairKeys = rows.map(r =>
        (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))).toSet
      assert(rows.nonEmpty)
      // hamming recomputed driver-side matches
      rows.take(10).foreach { r =>
        val hd = java.lang.Long.bitCount(
          sigs(r.getAs[Long]("doc_id_a")) ^ sigs(r.getAs[Long]("doc_id_b")))
        assert(hd == r.getAs[Long]("hamming"))
      }
      assert(pairKeys.nonEmpty)
    }
  }

  test("LSH calibration buckets tie out against the pair-level queries") {
    val cal = SparkEntry.queries("dedup_lsh_calibration")(spark, sf).collect()
    assert(cal.nonEmpty)
    // same candidate universe as the verify step
    val nPairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf).count()
    assert(cal.map(_.getAs[Long]("n_pairs")).sum == nPairs)
    cal.foreach { r =>
      assert(r.getAs[Long]("n_near_dup") <= r.getAs[Long]("n_pairs"))
      val p = r.getAs[Double]("precision")
      assert(p >= 0.0 && p <= 1.0)
    }
    // precision is non-decreasing from the lowest to the highest
    // agreement bucket on this corpus (exact dups agree on all hashes)
    val byMatch = cal.sortBy(_.getAs[Long]("n_match"))
    assert(byMatch.last.getAs[Double]("precision") >=
      byMatch.head.getAs[Double]("precision"))
  }

  test("blocklist gate blocks exactly the docs containing a listed token") {
    val rows = SparkEntry.queries("corpus_blocklist")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nBlocked = rows.map(_.getAs[Long]("n_blocked")).sum
    val expected = Tables.load(spark, sf, "documents")
      .filter(array_contains(TextAnalysis.tokens(col("text")), "dup") ||
        array_contains(TextAnalysis.tokens(col("text")), "slow"))
      .count()
    assert(nBlocked == expected && nBlocked > 0)
    rows.foreach(r => assert(r.getAs[Long]("n_blocked") <= r.getAs[Long]("n_docs")))
  }

  test("incremental dedup categories partition the batch") {
    val rows = SparkEntry.queries("dedup_incremental")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_batch") ==
        r.getAs[Long]("n_dup_vs_snapshot") +
        r.getAs[Long]("n_dup_within_batch") +
        r.getAs[Long]("n_new_unique"))
    }
    // batch = all odd doc ids
    val nOdd = Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1).count()
    assert(rows.map(_.getAs[Long]("n_batch")).sum == nOdd)
  }

  test("threshold pairs stay within label and above tau, no self/dup pairs") {
    val rows = SparkEntry.queries("sim_pairs_threshold")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id_a") < r.getAs[Long]("vec_id_b"))
      assert(r.getAs[Double]("cos_sim") >= Similarity.PairTau)
      assert(r.getAs[Double]("cos_sim") <= 1.0 + 1e-12)
    }
    val keys = rows.map(r => (r.getAs[Long]("vec_id_a"), r.getAs[Long]("vec_id_b")))
    assert(keys.distinct.length == keys.length)
  }

  test("int8 quantization error is small and scales are in range") {
    val rows = SparkEntry.queries("embed_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nVecs = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs)
    rows.foreach { r =>
      // rounding to the nearest int8 step keeps relative sq-error
      // far under (0.5/127)² ≈ 15.5 ppm of signal energy per axis —
      // allow generous headroom for small-norm vectors
      assert(r.getAs[Double]("err_ppm") >= 0.0)
      assert(r.getAs[Double]("err_ppm") < 1000.0,
        s"err_ppm ${r.getAs[Double]("err_ppm")}")
      assert(r.getAs[Double]("avg_scale") >= 1.0)
    }
  }

  test("vec_sum matches the posexplode twin and handles merge paths") {
    // exploded relational twin over the real embeddings
    val q = embs.select(col("label"),
      Vectors.quantize(col("embedding")).as("q"))
    val twin = q
      .select(col("label"), posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("v")).as("sum_q"))
      .collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim")) ->
        r.getAs[Long]("sum_q")).toMap
    // force a multi-partition plan so partial-merge + serialize run
    val got = q.repartition(8, col("label"))
      .groupBy(col("label"))
      .agg(graft.functions.VecSum.vecSum(col("q")).as("sums"))
      .select(col("label"), posexplode(col("sums")).as(Seq("dim", "s")))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val k = (r.getAs[Int]("label"), r.getAs[Int]("dim"))
      assert(twin(k) == r.getAs[Long]("s"), s"mismatch at $k")
    }
    // SQL registry path (GraftExtensions)
    q.createOrReplaceTempView("vs_in")
    val viaSql = spark.sql(
      "SELECT label, vec_sum(q) AS sums FROM vs_in GROUP BY label").count()
    assert(viaSql > 0)
  }

  test("label centroids average the quantized components exactly") {
    val rows = Similarity.labelCentroids(embs).collect()
    val labels = embs.select("label").distinct().count()
    assert(rows.map(_.getAs[Int]("label")).distinct.length == labels.toInt)
    rows.foreach { r =>
      val c = r.getAs[Double]("centroid")
      val expect = r.getAs[Long]("sum_q").toDouble /
        (r.getAs[Long]("n_vecs") * Vectors.Scale).toDouble
      assert(c == expect)
      assert(math.abs(c) <= 1.0 + 1e-12) // components are in [-1, 1]
    }
  }

  test("chunking covers every token with the declared size and stride") {
    val stride = ml.Corpus.ChunkStride.toLong
    val size_ = ml.Corpus.ChunkSize.toLong
    val chunks = ml.Corpus.chunked(docs).collect()
    val nByDoc = docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n"))
      .filter(col("n") > 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n").toLong).toMap
    // kept starts: every stride until a window adds no new tokens
    val expectChunks = nByDoc.values.map { n =>
      (0L until n by stride)
        .count(s => s == 0 || s + size_ - stride < n).toLong
    }.sum
    assert(chunks.length.toLong == expectChunks)
    chunks.foreach { r =>
      val ct = r.getAs[Long]("chunk_tokens")
      assert(ct >= 1 && ct <= size_)
    }
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_id"))
      // chunk ids are contiguous from 0 (only trailing starts drop)
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ==
        sorted.indices.map(_.toLong))
      // the last chunk reaches the doc's final token (full coverage)
      val last = sorted.last
      assert(last.getAs[Long]("chunk_id") * stride +
        last.getAs[Long]("chunk_tokens") == nByDoc(doc))
      // every chunk past the first adds tokens beyond its predecessor
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.getAs[Long]("chunk_id") * stride +
            b.getAs[Long]("chunk_tokens") >
            a.getAs[Long]("chunk_id") * stride + a.getAs[Long]("chunk_tokens"))
        case _ =>
      }
    }
  }

  test("knn classification votes are consistent with the neighbor list") {
    val nn = Similarity.topKBruteForce(embs).collect()
    val labelOf = embs.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val expected = nn.groupBy(_.getAs[Long]("probe_id")).map { case (p, rs) =>
      val votes = rs.groupBy(r => labelOf(r.getAs[Long]("neighbor_id")))
        .map { case (l, g) =>
          (l, g.length.toLong, g.map(_.getAs[Long]("rk")).min) }
      val best = votes.toSeq.minBy { case (l, v, br) => (-v, br, l.toLong) }
      p -> (best._1, best._2)
    }
    val got = Similarity.knnClassify(embs).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (lbl, v) = expected(r.getAs[Long]("probe_id"))
      assert(r.getAs[Int]("predicted_label") == lbl)
      assert(r.getAs[Long]("votes") == v)
    }
  }

  test("containment bounds jaccard and the verdict matches the ratio") {
    val jac = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b")) -> r)
      .toMap
    val rows = Dedup.containmentPairs(docs).collect()
    assert(rows.length == jac.size) // same candidate set
    rows.foreach { r =>
      val k = (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))
      val j = jac(k)
      val (ca, cb) =
        (r.getAs[Double]("containment_a"), r.getAs[Double]("containment_b"))
      // containment dominates symmetric jaccard on both sides
      assert(ca >= j.getAs[Double]("jaccard") - 1e-12)
      assert(cb >= j.getAs[Double]("jaccard") - 1e-12)
      assert(ca <= 1.0 + 1e-12 && cb <= 1.0 + 1e-12)
      assert(r.getAs[Long]("n_inter") == j.getAs[Long]("n_inter"))
      assert(r.getAs[Boolean]("contained") == (r.getAs[Long]("n_inter") * 5 >=
        math.min(j.getAs[Long]("size_a"), j.getAs[Long]("size_b")) * 4))
    }
  }

  test("quality filter keeps exactly the top half per source") {
    val kept = ml.Corpus.qualityFiltered(docs).collect()
    val perSource = docs.groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val keptBySource = kept.groupBy(_.getAs[String]("source"))
    keptBySource.foreach { case (src, rows) =>
      assert(rows.length.toLong == (perSource(src) + 1) / 2, s"source $src")
      // ranks are contiguous from 1 and scores non-increasing in rank
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ==
        (1L to rows.length.toLong))
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Double]("quality_score") >=
            lo.getAs[Double]("quality_score"))
        case _ =>
      }
    }
    assert(keptBySource.keySet == perSource.keySet)
  }

  test("fuzzy verify: lev is a metric-consistent distance on candidates") {
    val rows = Dedup.fuzzyVerifiedPairs(docs).collect()
    assert(rows.nonEmpty)
    val nt = docs.select(col("doc_id"),
        graft.functions.Portable.normText(col("text")).as("nt")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("nt")).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))
      assert(a < b)
      val lev = r.getAs[Long]("lev")
      val (ta, tb) = (nt(a), nt(b))
      // identity of indiscernibles + length lower bound
      assert((lev == 0L) == (ta == tb))
      assert(lev >= math.abs(ta.length - tb.length).toLong)
      assert(lev <= math.max(ta.length, tb.length).toLong)
      assert(r.getAs[Boolean]("near") ==
        (lev * 5 <= math.max(ta.length, tb.length).toLong))
    }
  }

  test("chunk dedup census ties out against the chunk inventory") {
    val stats = ml.Corpus.chunkDupStats(docs).collect()
    val chunks = ml.Corpus.chunked(docs).collect()
    assert(stats.map(_.getAs[Long]("n_chunks")).sum == chunks.length.toLong)
    // driver-side recompute of the shared count
    val docsPerFp = chunks.groupBy(_.getAs[Long]("chunk_fp"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).distinct.size).toMap
    val expectShared = chunks.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.count(c => docsPerFp(c.getAs[Long]("chunk_fp")) > 1))
      .toMap
    stats.foreach { r =>
      assert(r.getAs[Long]("n_shared_chunks") ==
        expectShared(r.getAs[String]("source")).toLong)
      val ratio = r.getAs[Double]("shared_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("kmeans assignment matrix is total and matches a driver argmax") {
    val m = Similarity.kmeansAssign(embs).collect()
    assert(m.map(_.getAs[Long]("n_vecs")).sum == embs.count())
    // driver-side recompute on the quantized vectors
    val vecs = embs.select(col("vec_id"), col("label"),
        Vectors.quantize(col("embedding")).as("q")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[collection.Seq[Long]]("q").toSeq))
    val means = vecs.groupBy(_._2).view.mapValues { g =>
      val s = g.map(_._3).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      s.map(x => math.round(x.toDouble / g.length))
    }.toMap
    val sn2 = means.view.mapValues(m => math.max(m.map(x => x * x).sum, 1L)).toMap
    val expect = vecs.map { case (_, label, q) =>
      val best = means.keys.toSeq.map { cell =>
        val dot = q.zip(means(cell)).map { case (x, y) => x * y }.sum
        (cell, dot.toDouble / math.sqrt(sn2(cell).toDouble))
      }.minBy { case (cell, score) => (-score, cell) }._1
      (label, best)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(m.length == expect.size)
    m.foreach { r =>
      val k = (r.getAs[Int]("label"), r.getAs[Int]("assigned_cell"))
      assert(expect(k) == r.getAs[Long]("n_vecs"), s"mismatch at $k")
    }
  }

  test("source overlap matches driver-side shingle-set intersections") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = ml.Corpus.sourceOverlap(docs).collect()
    assert(rows.nonEmpty)
    // ground truth: per-source shingle sets built from Dedup.shingles
    val shingleRows = ml.Dedup.shingles(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("source", "shingle").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = shingleRows.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b)
      val (sa, sb) = (bySrc(a), bySrc(b))
      val shared = (sa & sb).size.toLong
      assert(r.getAs[Long]("n_shared") == shared)
      assert(r.getAs[Long]("n_a") == sa.size && r.getAs[Long]("n_b") == sb.size)
      val jac = shared.toDouble / (sa.size + sb.size - shared)
      assert(math.abs(r.getAs[Double]("jaccard") - jac) < 1e-12)
    }
    // completeness: every overlapping pair is reported
    val srcs = bySrc.keys.toSeq.sorted
    val expect = for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      if (bySrc(srcs(i)) & bySrc(srcs(j))).nonEmpty
    } yield (srcs(i), srcs(j))
    assert(rows.length == expect.length)
  }

  test("norm profile: totals, dim agreement, rms bounded by extremes") {
    val embs = Tables.load(spark, sf, "embeddings")
    val rows = ml.Similarity.normProfile(embs).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == embs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("dim_lo") == r.getAs[Long]("dim_hi"))
      val (lo, hi) = (r.getAs[Long]("min_n2"), r.getAs[Long]("max_n2"))
      assert(lo <= hi)
      val rms = r.getAs[Double]("rms_norm")
      assert(rms >= math.sqrt(lo.toDouble) - 1e-9 &&
        rms <= math.sqrt(hi.toDouble) + 1e-9)
      assert(r.getAs[Long]("n_zero") == 0L) // synthetic corpus has no zero vecs
    }
  }

  test("train/val/test split is disjoint, total, and roughly 80/10/10") {
    val docs = Tables.load(spark, sf, "documents")
    val assigned = ml.Corpus.splitAssigned(docs)
    assert(assigned.count() == docs.count()) // total: every doc gets a split
    val bySplit = assigned.groupBy("split").count().collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("count")).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val n = docs.count().toDouble
    assert(bySplit.getOrElse("train", 0L) / n > 0.6)
    assert(bySplit.getOrElse("train", 0L) / n < 0.95)
  }

  test("perplexity filter: pos is a permutation, exactly ceil(25%) dropped, " +
    "and the cut respects the (score, doc_id) order") {
    val rows = TextAnalysis.perplexityFilter(docs, col("text")).collect()
    val n = docs.count()
    assert(rows.length == n)
    assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to n).toSeq)
    val cut = (n * 25 + 99) / 100
    val (dropped, kept) = rows.partition(r => !r.getAs[Boolean]("kept"))
    assert(dropped.length == cut && kept.length == n - cut)
    // every dropped pos ≤ cut < every kept pos, and the score at any
    // kept pos is ≥ the score at any dropped pos (ranks follow score)
    assert(dropped.forall(_.getAs[Long]("pos") <= cut))
    def score(r: org.apache.spark.sql.Row): Double =
      Option(r.getAs[java.lang.Double]("avg_log2_tf"))
        .map(_.doubleValue).getOrElse(-1.0)
    if (dropped.nonEmpty && kept.nonEmpty)
      assert(kept.map(score).min >= dropped.map(score).max - 1e-12)
  }

  test("embed covariance equals a driver-side exact computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val d = 6
    val vecs = Seq.fill(40)(Seq.fill(d)(rnd.nextFloat() * 2f - 1f))
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val got = Similarity.covariance(df).collect()
    assert(got.length == d * (d + 1) / 2)
    // quantize exactly as Vectors.quantize (HALF_UP on the double)
    val q = vecs.map(_.map(x =>
      BigDecimal(x.toDouble * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val nn = q.length.toLong
    got.foreach { r =>
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      val si = q.map(_(i)).sum
      val sj = q.map(_(j)).sum
      val sij = q.map(v => v(i) * v(j)).sum
      assert(r.getAs[Long]("sum_i") == si)
      assert(r.getAs[Long]("sum_j") == sj)
      assert(r.getAs[Long]("sum_ij") == sij)
      val cov = (nn.toDouble * sij.toDouble - si.toDouble * sj.toDouble) /
        (nn.toDouble * (nn - 1).toDouble)
      assert(r.getAs[Double]("cov") == cov)
    }
  }

  test("pca power iteration equals an exact driver-side replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val d = 5
    val vecs = Seq.fill(30)(Seq.fill(d)(rnd.nextFloat() * 2f - 1f))
    val got = Similarity.pcaPower(vecs.map(Tuple1(_)).toDF("embedding"))
      .collect().sortBy(_.getAs[Long]("i"))
    assert(got.length == d)
    // replay: quantize, M = sum qq', three integer power steps
    val q = vecs.map(_.map(x => BigDecimal(x.toDouble * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val m = Array.tabulate(d, d)((i, j) => q.map(v => v(i) * v(j)).sum)
    var v = Array.fill(d)(1000L)
    for (_ <- 1 to 3) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
      val mx = u.map(math.abs).max
      v = u.map(x => if (mx == 0) 0L else (x * 1000) / mx)
    }
    val ul = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
    val num = (0 until d).map(i => v(i) * ul(i)).sum
    val den = v.map(x => x * x).sum
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("v") == v(i), s"component $i")
      assert(r.getAs[Long]("ray_num") == num)
      assert(r.getAs[Long]("ray_den") == den)
      assert(r.getAs[Double]("lambda") == num.toDouble / den.toDouble)
    }
    // normalization pins the argmax component at exactly ±1000
    assert(got.map(r => math.abs(r.getAs[Long]("v"))).max == 1000L)
  }

  test("phash clusters + banded neighbors equal an all-pairs replay") {
    val payload = Binary.mediaPayload(docs)
    val got = Binary.phashClusters(payload).collect()
      .map(r => r.getAs[Long]("phash") ->
        (r.getAs[Long]("n_images"), r.getAs[Long]("min_doc"),
          r.getAs[Long]("n_near_hashes"), r.getAs[Long]("n_near_images")))
      .toMap
    // ground truth: parse every image hash on the driver
    val hashes = payload.collect()
      .flatMap(r => Binary.parsePhash(
        r.getAs[Long]("doc_id"), r.getAs[Array[Byte]]("payload")))
    assert(hashes.nonEmpty)
    // hashes use only 16 bits
    assert(hashes.forall { case (_, h) => (h & ~0xffffL) == 0L })
    val byHash = hashes.groupBy(_._2)
    val expect = byHash.map { case (h, members) =>
      val near = byHash.keys.filter(o =>
        o != h && java.lang.Long.bitCount(h ^ o) <= 2).toSeq
      h -> (members.length.toLong, members.map(_._1).min,
        near.length.toLong, near.map(o => byHash(o).length.toLong).sum)
    }
    assert(got == expect)
  }

  test("signal agreement equals a driver-side Spearman over the same scores") {
    val got = ml.Corpus.signalAgreement(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_d2"),
          r.getAs[Double]("spearman"))).toMap
    val q = TextAnalysis.quality(docs, col("text"))
      .select(col("doc_id"), col("source"), col("quality_score")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Double]("quality_score")))
    val f = TextAnalysis.unigramLm(docs, col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Double]("avg_log2_tf"))
          .map(_.doubleValue).getOrElse(-1.0)).toMap
    val expect = q.groupBy(_._2).map { case (src, ds) =>
      val rq = ds.sortBy(d => (d._3, d._1)).zipWithIndex
        .map { case (d, i) => d._1 -> (i + 1).toLong }.toMap
      val rf = ds.sortBy(d => (f(d._1), d._1)).zipWithIndex
        .map { case (d, i) => d._1 -> (i + 1).toLong }.toMap
      val sumD2 = ds.map(d => { val x = rq(d._1) - rf(d._1); x * x }).sum
      val n = ds.length.toLong
      val rho = 1.0 - (6.0 * sumD2.toDouble) /
        (n.toDouble * (n.toDouble * n.toDouble - 1))
      src -> (n, sumD2, rho)
    }
    assert(got == expect)
    got.values.foreach { case (_, _, rho) => assert(rho >= -1.0 && rho <= 1.0) }
  }

  test("stratified-k draws the k hash-smallest docs per source") {
    val rows = ml.Corpus.stratifiedK(docs, k = 10).collect()
    val bySource = docs.select(col("source"), col("doc_id")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      .groupBy(_._1)
    bySource.foreach { case (src, members) =>
      val expect = members.map { case (s, id) =>
        (Vectors.jvmPHash(s"$s#$id"), id) }.sorted.take(10).map(_._2).toSeq
      val got = rows.filter(_.getAs[String]("source") == src)
        .sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("doc_id")).toSeq
      assert(got == expect, s"source $src")
    }
    assert(rows.length == bySource.map { case (_, m) => math.min(10, m.size) }.sum)
  }

  test("vad segments equal a driver-side islands replay") {
    val payload = Binary.mediaPayload(docs)
    val got = Binary.vadSegments(payload).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_active"),
          r.getAs[Long]("n_segments"), r.getAs[Long]("max_segment"))).toMap
    val expect = payload.collect().flatMap { r =>
      val id = r.getAs[Long]("doc_id")
      val frames = Binary.parseVadFrames(id, r.getAs[Array[Byte]]("payload"), 16)
      if (frames.isEmpty) None else {
        val act = frames.filter(_.energy > 1024L).map(_.frame_idx)
        // islands: consecutive frame indexes form one segment
        val segs = act.foldLeft(List.empty[List[Long]]) {
          case (acc, f) => acc match {
            case (h :: t) :: rest if h == f - 1 => (f :: h :: t) :: rest
            case _ => List(f) :: acc
          }
        }
        Some(id -> (frames.length.toLong, act.length.toLong,
          segs.length.toLong,
          if (segs.isEmpty) 0L else segs.map(_.length.toLong).max))
      }
    }.toMap
    assert(got == expect && got.nonEmpty)
  }

  test("subspace energy equals a driver-side projection replay") {
    val v = Similarity.pcaPower(embs).collect()
      .sortBy(_.getAs[Long]("i")).map(_.getAs[Long]("v"))
    val rows = Similarity.subspaceEnergy(embs).collect()
    val raw = embs.collect().map(r => (r.getAs[Int]("label"),
      r.getAs[collection.Seq[Float]]("embedding").map(x =>
        BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
    val byLabel = raw.groupBy(_._1)
    assert(rows.map(_.getAs[Int]("label")).toSet == byLabel.keySet)
    rows.foreach { r =>
      val g = byLabel(r.getAs[Int]("label"))
      val ss = g.map { case (_, q) =>
        q.zip(v).map { case (x, w) => x * w }.sum }
      assert(r.getAs[Long]("n") == g.length.toLong)
      assert(r.getAs[Long]("sum_s") == ss.sum)
      assert(r.getAs[Long]("sum_s2") == ss.map(s => s * s).sum)
    }
  }

  test("epoch drift equals a driver-side split-and-average replay") {
    val rows = Similarity.epochDrift(embs).collect()
    val raw = embs.collect().map(r => (r.getAs[Long]("vec_id"),
      r.getAs[collection.Seq[Float]]("embedding").map(x =>
        BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
    val lo = raw.map(_._1).min
    val hi = raw.map(_._1).max
    val (ea, eb) = raw.partition { case (id, _) =>
      (id - lo) * 2 / (hi - lo + 1) == 0 }
    assert(rows.length == raw.head._2.length)
    rows.foreach { r =>
      val i = r.getAs[Long]("i").toInt
      assert(r.getAs[Long]("n_a") == ea.length.toLong)
      assert(r.getAs[Long]("n_b") == eb.length.toLong)
      assert(r.getAs[Long]("sum_a") == ea.map(_._2(i)).sum)
      assert(r.getAs[Long]("sum_b") == eb.map(_._2(i)).sum)
      assert(r.getAs[Double]("mean_a") ==
        ea.map(_._2(i)).sum.toDouble / ea.length.toDouble)
    }
  }

  test("audio fingerprint: hand WAV folds the right bits, tail ignored") {
    import java.nio.{ByteBuffer, ByteOrder}
    // 53 samples: window0 dev=0 (E=0), window1 dev=10 (E=1600),
    // window2 dev=1 (E=16), then a 5-sample tail that must NOT
    // become a window. Bits (strict increase): E1>E0 → 1, E2>E1 → 0
    // → fp = 0b10 = 2, n_windows = 3.
    val n = 53
    val wav = ByteBuffer.allocate(44 + n).order(ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    wav.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    wav.put("data".getBytes("US-ASCII")).putInt(n)
    (0 until n).foreach { k =>
      val v = if (k < 16) 128 else if (k < 32) 138 else if (k < 48) 129 else 200
      wav.put(v.toByte)
    }
    val got = multimodal.Binary.parseAudioFp(1L, wav.array()).get
    assert(got.n_windows == 3L)
    assert(got.fingerprint == 2L)
    // non-WAV payloads emit nothing
    assert(multimodal.Binary.parseAudioFp(2L, Array[Byte](1, 2, 3)).isEmpty)
    // census ledger on sf data: every audio doc lands in exactly one
    // contour class
    val census = SparkEntry.queries("multimodal_audio_fingerprint")(spark, sf)
      .collect()
    val nAudio = multimodal.Binary
      .mediaPayload(Tables.load(spark, sf, "documents"))
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 1).count()
    assert(census.map(_.getAs[Long]("n_docs")).sum == nAudio)
    census.foreach { r =>
      // a fingerprint of nw windows has nw−1 bits
      assert(r.getAs[Long]("fingerprint") <
        (1L << (r.getAs[Long]("n_windows") - 1).toInt))
    }
  }

  test("mmr: duplicate demoted below the diverse candidate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // probe 0 → candidates: 1 = top relevance, 2 = SAME direction as
    // 1 (sim 1.0 — the duplicate), 3 = diverse with decent relevance.
    // Step 2 must pick 3 over the duplicate: 0.5·(rel₃ − sim(3,1)) ≈
    // +0.041 beats 0.5·(rel₂ − 1) ≈ −0.003. Step 3 takes the dup.
    val embs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(1.8f, 0.2f), 0),   // ×2 scale of vec 1: cosine twin
      (3L, Array(0.7f, -0.7f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = ml.Similarity.mmrDiversify(embs)
      .filter(col("probe_id") === 0L).orderBy(col("rk")).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 2L))
    assert(got.map(_.getAs[Long]("rk")).toSeq == Seq(1L, 2L, 3L))
    // first pick pays no penalty: score = λ·rel exactly
    assert(got(0).getAs[Double]("mmr_score") ==
      0.5 * got(0).getAs[Double]("rel"))
    // corpus invariants: rk1 is the relevance argmax, picks distinct,
    // scores bounded by |cosine| ≤ 1 on both terms (the penalty may
    // be NEGATIVE — an anti-similar candidate earns a bonus, which
    // is correct MMR behavior)
    val rows = SparkEntry.queries("embed_mmr_diversify")(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    byProbe.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.head.getAs[Double]("rel") ==
        rs.map(_.getAs[Double]("rel")).max)
      val ids = rs.map(_.getAs[Long]("vec_id"))
      assert(ids.distinct.length == ids.length)
      rs.foreach(r => assert(math.abs(r.getAs[Double]("mmr_score")) <= 1.0))
    }
  }

  test("token budget: greedy prefix cut equals a driver-side replay") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
    val got = ml.Corpus.tokenBudget(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // independent replay: score via the operator's own scorer (the
    // scoring formula has its own oracle through
    // corpus_quality_filter), then the greedy cut as a plain fold
    val scored = ml.TextAnalysis.quality(docs, col("text"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("quality_score")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("quality_score")))
      .sortBy { case (id, _, _, q) => (-q, id) }
    var run = 0L
    val admitted = scored.map { case (id, src, n, q) =>
      val ok = run + n <= ml.Corpus.TokenBudget
      run += n
      (id, src, n, q, ok)
    }
    // the running total keeps accumulating past the cut, so the cut
    // is a prefix: once one doc fails, all later docs fail
    val flags = admitted.map(_._5)
    assert(!flags.dropWhile(identity).contains(true))
    val bySrc = admitted.groupBy(_._2)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val g = got(src)
      assert(g.getAs[Long]("n_docs") == rows.length.toLong)
      assert(g.getAs[Long]("n_admitted") == rows.count(_._5).toLong)
      assert(g.getAs[Long]("tokens_admitted") ==
        rows.filter(_._5).map(_._3).sum)
      assert(g.getAs[Long]("tokens_total") == rows.map(_._3).sum)
      val cut = rows.filter(_._5).map(_._4)
      if (cut.nonEmpty) assert(g.getAs[Double]("cut_quality") == cut.min)
      else assert(g.isNullAt(g.fieldIndex("cut_quality")))
    }
    // the budget binds: something admitted, something rejected
    assert(admitted.exists(_._5) && admitted.exists(!_._5))
  }

  test("source divergence: hand TV distances, absent-token closed form") {
    import spark.implicits._
    // s1 = "a a b" (p = 2/3, 1/3, 0), s2 = "b c" (p = 0, 1/2, 1/2),
    // corpus = (0.4, 0.4, 0.2). TV(s1) = (|2/3-.4|+|1/3-.4|+.2)/2 =
    // 8/30; TV(s2) = (.4+.1+.3)/2 = 8/20. Integer numerators: s1
    // present |2*5-2*3|+|1*5-2*3| = 5, absent 3*(5-4) = 3; s2
    // present 1+3 = 4, absent 2*(5-3) = 4.
    val docs = Seq((0L, "s1", "a a b"), (1L, "s2", "b c"))
      .toDF("doc_id", "source", "text")
    val got = ml.Corpus.sourceDivergence(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("s1").getAs[Long]("n_tokens") == 3L)
    assert(got("s1").getAs[Double]("tv_distance") == 8.0 / (2.0 * 3.0 * 5.0))
    assert(got("s1").getAs[String]("top_token") == "a")
    assert(got("s1").getAs[Double]("top_share_gap") == 4.0 / (3.0 * 5.0))
    assert(got("s2").getAs[Double]("tv_distance") == 8.0 / (2.0 * 2.0 * 5.0))
    assert(got("s2").getAs[String]("top_token") == "c")
    // sf invariants: TV in [0,1], top gap bounded by 2*TV
    SparkEntry.queries("corpus_source_divergence")(spark, sf).collect()
      .foreach { r =>
        val tv = r.getAs[Double]("tv_distance")
        assert(tv >= 0.0 && tv <= 1.0)
        assert(r.getAs[Double]("top_share_gap") <= 2.0 * tv + 1e-12)
      }
  }

  test("kmeans elbow: two clean clusters cohere at every k") {
    import spark.implicits._
    // 3 copies of (1,0) and 3 of (0,1): every k recovers the two
    // directions (k=2 seeds are mixed {0,2,4}/{1,3,5} and one E-step
    // unmixes them; k>=8 seeds singletons and the smallest-cell
    // tie-break collapses each direction onto its first id), so
    // n_live_cells = 2 and cohesion = 6 * 1000*1000 everywhere.
    val embs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0), (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.0f, 1.0f), 1), (5L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = ml.Similarity.kmeansElbow(embs).collect()
    assert(got.map(_.getAs[Long]("k")).toSeq == Seq(2L, 4L, 8L, 16L))
    got.foreach { r =>
      assert(r.getAs[Long]("n_live_cells") == 2L)
      assert(r.getAs[Long]("total_dot") == 6000000L)
      assert(r.getAs[Double]("avg_dot") == 1000000.0)
    }
    // corpus invariants at sf: live cells bounded by k, the mean is
    // exactly total / |corpus|
    val rows = SparkEntry.queries("sim_kmeans_elbow")(spark, sf).collect()
    val n = Tables.load(spark, sf, "embeddings").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_live_cells") <= r.getAs[Long]("k"))
      assert(r.getAs[Double]("avg_dot") ==
        r.getAs[Long]("total_dot").toDouble / n)
    }
  }

  test("rrf fusion: driver replay over the two component rankings") {
    val vec = SparkEntry.queries("sim_topk_bruteforce")(spark, sf).collect()
      .map(r => ((r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")),
        r.getAs[Long]("rk"))).toMap
    val lex = SparkEntry.queries("text_tfidf_topk")(spark, sf).collect()
      .map(r => ((r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")),
        r.getAs[Long]("rk"))).toMap
    val k = ml.Similarity.RrfK
    val expected = (vec.keySet ++ lex.keySet).toSeq
      .map { key =>
        val score = vec.get(key).map(r => 1.0 / (k + r)).getOrElse(0.0) +
          lex.get(key).map(r => 1.0 / (k + r)).getOrElse(0.0)
        (key._1, key._2, vec.getOrElse(key, 0L), lex.getOrElse(key, 0L), score)
      }
      .groupBy(_._1)
      .flatMap { case (_, cands) =>
        cands.sortBy { case (_, nid, _, _, s) => (-s, nid) }
          .take(ml.Similarity.TopK).zipWithIndex
          .map { case ((p, nid, vr, lr, s), i) => (p, i + 1L, nid, vr, lr, s) }
      }.toSet
    val got = SparkEntry.queries("sim_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("vec_rk"),
        r.getAs[Long]("lex_rk"), r.getAs[Double]("rrf_score"))).toSet
    assert(got == expected)
    // both rankers contribute somewhere: some fused row carries a
    // nonzero rank from each side, and some row fuses BOTH
    assert(got.exists(_._4 > 0) && got.exists(_._5 > 0))
    assert(got.exists(r => r._4 > 0 && r._5 > 0))
  }

  test("video fingerprint: hand frames fold LSB-first, cap at bit 62") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc 1: luma 10 -> 50 -> 20 -> 60: transitions up/down/up ->
    // bits 0 and 2 -> fp = 5. doc 2: 70 frames strictly increasing:
    // 69 up-transitions but only the first 63 fold -> fp = 2^63 - 1.
    // doc 3 (kind=image) must be excluded.
    val rows =
      Seq((10L, 0), (50L, 1), (20L, 2), (60L, 3)).map { case (l, i) =>
        (1L, "video", i.toLong, l)
      } ++ (0 until 70).map(i => (2L, "video", i.toLong, 100L + i)) ++
        Seq((3L, "image", 0L, 5L))
    val frames = rows.toDF("doc_id", "kind", "frame_idx", "luma_sum")
    val got = multimodal.Binary.videoFingerprintCensus(frames).collect()
      .map(r => (r.getAs[Long]("n_frames"), r.getAs[Long]("fingerprint"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("canonical_id"))).toSet
    assert(got == Set((4L, 5L, 1L, 1L), (70L, Long.MaxValue, 1L, 2L)))
    // census ledger on sf data: every video doc in exactly one class
    val census = SparkEntry.queries("multimodal_video_fingerprint")(spark, sf)
      .collect()
    val nVideo = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 2).count()
    assert(census.map(_.getAs[Long]("n_docs")).sum == nVideo)
  }
}
