package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Corpus-level pipeline operators (SURVEY.md §2C): deterministic
  * sampling and sequence packing — the steps between "clean
  * documents" and "training batches".
  *
  * Scale notes: sampling is a map-only filter on a portable hash (no
  * shuffle, reproducible across engines and runs — a corpus re-sample
  * at 100 TB must not depend on partitioning or row order); packing
  * is one window per source partition (single shuffle on the
  * partition key).
  */
object Corpus {

  /** Per-source per-mille rate resolution shared by [[sampled]] and
    * [[mixed]] — one nested-CASE column over a literal map.
    */
  private def perSourceRate(rates: Map[String, Int], default: Int): Column =
    rates.foldLeft(lit(default).cast("long")) { case (acc, (src, r)) =>
      when(col("source") === src, lit(r.toLong)).otherwise(acc)
    }

  /** Deterministic stratified sample: keep a document iff the
    * portable hash of (source, doc_id) falls under the stratum's
    * per-mille rate. Hash-based (not `sample()`): the selection is a
    * pure function of the row, so it is stable under retries,
    * repartitioning, and engine changes — the property a multi-epoch
    * training pipeline needs from its subsampling step.
    *
    * @param rates per-mille keep-rate per source; sources absent from
    *              the map use `defaultPerMille`
    */
  def sampled(
      docs: DataFrame,
      rates: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    val h = Portable.pHash(concat(col("source"), lit("#"), col("doc_id")))
    docs.filter(pmod(h, lit(1000L)) < perSourceRate(rates, defaultPerMille))
  }

  /** Importance-weighted sampling: each document's keep-probability
    * IS its quality score (per-mille, rounded) — the gate a curated
    * pretraining mix uses instead of [[sampled]]'s flat per-source
    * rate, so low-quality mass thins smoothly rather than at a hard
    * threshold. The same deterministic portable-hash gate as
    * [[sampled]]: selection is a pure function of the row, stable
    * under retries/partitioning/engines. Reported per source:
    * doc counts, kept counts, the expected per-mille mass (so the
    * realized rate can be audited against the intended one), and the
    * realized rate.
    *
    * Scale shape: scoring is map-only (quality's single-pass
    * tokenization), the gate is map-only, and the only shuffle is
    * the |sources|-row rollup.
    */
  def weightedSample(docs: DataFrame): DataFrame = {
    val scored = graft.ml.TextAnalysis.quality(docs, col("text"))
      .withColumn("permille",
        expr("CAST(round(quality_score * 1000) AS BIGINT)"))
    val h = Portable.pHash(concat(col("source"), lit("#"), col("doc_id")))
    scored.withColumn("kept", pmod(h, lit(1000L)) < col("permille"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("permille")).as("permille_mass"))
      .withColumn("kept_rate",
        col("n_kept").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }

  /** Epoch-weighted mixture: realize a training-mix weight per source
    * (in per-mille epochs — 2500 = "see src0 2.5 times per pass") as
    * repeated full epochs plus ONE hash-gated partial epoch. A doc
    * with weight w appears at epochs 0..⌊w/1000⌋-1 unconditionally
    * and at the final epoch iff the portable hash of
    * (source, doc_id, epoch) falls under w mod 1000 — so upsampling
    * is deterministic, reproducible across engines/retries, and
    * independent of partitioning, exactly like [[sampled]]'s gate.
    *
    * Scale shape: map-only (explode of a ≤⌈w/1000⌉-element sequence,
    * then a hash filter) — no shuffle; output size is the mixture-
    * weighted corpus size, which is the point.
    */
  def mixed(
      docs: DataFrame,
      weightsPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    val wpm = perSourceRate(weightsPerMille, defaultPerMille)
    // weight 0 would make sequence() count DOWN (negative stop), not
    // produce nothing — guard with an empty epoch array
    val epochs = when(col("weight_pm") > 0,
      sequence(lit(0L), floor((col("weight_pm") + 999L) / 1000L).cast("long") - 1))
      .otherwise(array())
    val gate = Portable.pHash(concat(
      col("source"), lit("#"), col("doc_id"), lit("#"), col("epoch")))
    docs.withColumn("weight_pm", wpm)
      .withColumn("epoch", explode(epochs))
      .filter(col("epoch") < floor(col("weight_pm") / 1000L).cast("long") ||
        pmod(gate, lit(1000L)) < col("weight_pm") % 1000L)
  }

  /** Deterministic train/val/test split: the portable hash of
    * (source, doc_id, "split") mod 1000 buckets each document —
    * <800 train, <900 val, else test. Hash-based for the same
    * reasons as [[sampled]]: the assignment is a pure row function
    * (stable under retries/repartitioning/engine swaps) and the
    * three splits are DISJOINT by construction — the property that
    * actually matters for leakage. Map-only, no shuffle.
    */
  def splitAssigned(docs: DataFrame): DataFrame = {
    val h = pmod(Portable.pHash(concat(
      col("source"), lit("#"), col("doc_id"), lit("#split"))), lit(1000))
    // null-keyed docs get a NULL split, not 'test': a null hash fails
    // both when() predicates, so otherwise() would herd 100% of them
    // into the 10% test bucket — inconsistent with the sibling hash
    // gates (sampled/mixed), whose null predicates DROP such rows
    docs.withColumn("split",
      when(h.isNull, lit(null).cast("string"))
        .when(h < 800, "train").when(h < 900, "val").otherwise("test"))
  }

  /** Split-leakage audit: exact-duplicate content that crosses the
    * train/val/test boundary. [[splitAssigned]] hashes on
    * (source, doc_id) — the right key for REPRODUCIBILITY, but two
    * byte-identical documents with different ids can land in
    * different splits, silently leaking val/test content into
    * training. This reports, per split pair, the shared fingerprints
    * and the documents they cover — the measured argument for
    * content-fingerprint splitting (or for deduping BEFORE
    * splitting, which the corpus_funnel ordering already does).
    *
    * Scale shape: distinct (fp, split) pairs (one exchange, bounded
    * by the corpus), a per-fp split census on the SAME key, then a
    * split×split rollup — ≤9 rows out. Never doc×doc.
    */
  def splitLeakage(docs: DataFrame): DataFrame = {
    val fp = splitAssigned(docs)
      .filter(col("split").isNotNull)
      .select(md5(Portable.normText(col("text"))).as("fp"),
        col("split"), col("doc_id"))
    val fs = graft.CacheScope.materialize(
      fp.select(col("fp"), col("split")).distinct())
    val pairs = fs.select(col("fp"), col("split").as("split_a"))
      .join(fs.select(col("fp"), col("split").as("split_b")), "fp")
      .filter(col("split_a") < col("split_b"))
    val docsPerFpSplit = fp.groupBy(col("fp"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
    pairs
      .join(docsPerFpSplit.select(col("fp"), col("split").as("split_a"),
        col("n_docs").as("docs_a")), Seq("fp", "split_a"))
      .join(docsPerFpSplit.select(col("fp"), col("split").as("split_b"),
        col("n_docs").as("docs_b")), Seq("fp", "split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_shared_fps"),
        sum(col("docs_a") + col("docs_b")).as("n_docs_affected"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** Token-level blocklist gate: a document is blocked iff any of its
    * tokens matches the (tiny, literal) blocklist — the standard
    * cleaning stage between crawling and training. `arrays_overlap`
    * against a literal array is per-row codegen'd set probing:
    * map-only, no shuffle, no join — at 100 TB the blocklist rides
    * in the closure, not a broadcast relation. Reported per source
    * as kept/blocked counts and the chars removed.
    */
  def blocklistSummary(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val blocked = arrays_overlap(
      TextAnalysis.tokens(col("text")),
      array(terms.map(lit): _*))
    docs.withColumn("blocked", blocked)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"),
        sum(when(col("blocked"), col("n_chars")).otherwise(0L))
          .as("blocked_chars"))
  }

  /** Greedy contiguous sequence packing: within each source (ordered
    * by doc_id), documents are packed into fixed token-budget bins by
    * cumulative offset — bin = (running tokens before this doc) div
    * budget. The contiguous-greedy strategy is what streaming
    * tokenizer pipelines actually use (no global bin-packing search),
    * and it is a pure window function: deterministic, one shuffle,
    * no driver-side state.
    */
  def packed(docs: DataFrame, budgetTokens: Int): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTokens = size(TextAnalysis.tokens(col("text"))).cast("long")
    docs
      .withColumn("n_tokens", nTokens)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        ((col("cum_tokens") - col("n_tokens")) / budgetTokens).cast("long"))
  }

  /** Benchmark decontamination scores: for every non-eval document,
    * the fraction of its distinct word 3-grams that also appear in
    * the eval set (`isEval` marks held-out/benchmark docs). Training
    * pipelines drop or flag docs above a threshold so evaluation data
    * cannot leak into training.
    *
    * Scale shape: the eval shingle inventory is a distinct projection
    * (near-always broadcastable — eval sets are small next to the
    * corpus); scoring is one left join on the shingle and a per-doc
    * aggregate, never a doc×doc comparison. Shingling reuses the
    * dedup pipeline's exchange-materialized tokenizer.
    */
  def decontaminationScores(docs: DataFrame, isEval: Column): DataFrame = {
    val sh = Dedup.shingles(docs)
    val evalIds = docs.filter(isEval).select(col("doc_id").as("eval_id"))
    val evalShingles = sh
      .join(evalIds, col("doc_id") === col("eval_id"), "left_semi")
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1))
    val corpusSh = sh
      .join(evalIds, col("doc_id") === col("eval_id"), "left_anti")
      .distinct()
    val scores = corpusSh
      .join(evalShingles, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_overlap"))
    // left join from the full non-eval corpus: a doc too short to
    // shingle (< ShingleN tokens) has no 3-grams to leak, so it
    // scores an explicit 0 — silently omitting it would make a
    // threshold consumer treat it as unscored rather than clean
    docs.filter(!isEval).select(col("doc_id"))
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("n_overlap").cast("double") /
          col("n_shingles").cast("double"), lit(0.0)).as("contamination"))
  }

  /** NEAR-duplicate decontamination: [[decontaminationScores]]'
    * fuzzy sibling. Exact n-gram overlap misses an eval document
    * that was lightly paraphrased or reformatted into the training
    * corpus; this runs the full MinHash-banding near-dup pipeline
    * ACROSS the train/eval boundary instead — per train document,
    * the eval documents sharing an LSH band bucket (candidates), how
    * many verify at exact Jaccard ≥ 0.5 (integer test 3·|∩| ≥
    * |A|+|B|), and the best exact Jaccard seen. Every train doc
    * reports a row (explicit zeros — same contract as the exact
    * gate: unscored ≠ clean).
    *
    * Scale shape: the banding join is train-bucket × eval-bucket —
    * the eval side is tiny next to the corpus in any real deployment
    * (broadcastable), so candidate mass is bounded by eval bucket
    * occupancy, never train×train; exact verification is
    * candidate-bounded via co-keyed shingle joins (the
    * [[Dedup.ngramJaccardPairs]] shape). Never all-pairs.
    */
  def fuzzyDecontaminationScores(docs: DataFrame, isEval: Column): DataFrame = {
    val flags = docs.select(col("doc_id"), isEval.as("is_eval"))
    val sh = graft.CacheScope.materialize(Dedup.shingles(docs).distinct())
    val sigs = graft.CacheScope.materialize(Dedup.signaturesWithSize(sh))
    val buckets = Dedup.bandBuckets(sigs).join(flags, "doc_id")
    val bt = buckets.filter(!col("is_eval"))
      .select(col("doc_id").as("tid"), col("band"), col("bh"))
    val be = buckets.filter(col("is_eval"))
      .select(col("doc_id").as("eid"), col("band"), col("bh"))
    val cand = bt.join(be, Seq("band", "bh"))
      .select(col("tid"), col("eid")).distinct()
    val shT = sh.toDF("tid", "shingle")
      .join(cand.select("tid").distinct(), Seq("tid"), "left_semi")
    val shE = sh.toDF("eid2", "shingle_e")
      .join(cand.select(col("eid").as("eid2")).distinct(),
        Seq("eid2"), "left_semi")
    val inter = cand
      .join(shT, "tid")
      .join(shE,
        col("eid") === col("eid2") && col("shingle") === col("shingle_e"))
      .groupBy(col("tid"), col("eid"))
      .agg(count(lit(1)).as("n_inter"))
    val sizes = sigs.select(col("doc_id"), col("set_size"))
    // left join: a band-hash collision can pair docs with zero
    // shared shingles — they are candidates with Jaccard 0, not
    // absent rows
    val scored = cand
      .join(inter, Seq("tid", "eid"), "left")
      .join(sizes.toDF("tid", "sz_a"), "tid")
      .join(sizes.toDF("eid", "sz_b"), "eid")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
    val perTrain = scored.groupBy(col("tid"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(lit(3L) * col("n_inter") >= col("sz_a") + col("sz_b"), 1L)
          .otherwise(0L)).as("n_matches"),
        max(col("n_inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
          .as("max_jaccard"))
    docs.filter(!isEval).select(col("doc_id"))
      .join(perTrain.withColumnRenamed("tid", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"))
  }

  /** Gopher-style rule census (the published document-quality rule
    * set of Rae et al. 2021 §A1.1, restricted to the signals this
    * corpus carries): per source, how many docs each rule rejects
    * and how many survive ALL of them —
    *   word count ∈ [50, 100k];
    *   mean word length ∈ [3, 10] (tested by integer
    *     cross-multiplication 3n ≤ Σlen ≤ 10n — no division rounds);
    *   ≥ 2 English stopword hits (the "stop word" rule, on the SAME
    *     marker list langid and text_quality use);
    *   ≥ 80% of words contain an alphabetic character (5·n_alpha ≥
    *     4·n, exact).
    * Where `corpus_quality_filter` blends signals into one score and
    * cuts a percentile, this is the published HARD-RULE gate — the
    * census a pipeline reads per source to see WHICH rule does the
    * rejecting before adopting the set.
    *
    * Scale shape: map-only per-doc booleans (token array reused by
    * all four rules inside one projection) + one map-side-combined
    * per-source aggregate; output |sources| rows.
    */
  /** The four per-document Gopher rule booleans over `text` — ONE
    * definition shared by [[gopherRules]] and [[qualityCalibration]]
    * (oracle parity needs the two sites bit-identical, so they must
    * not be copies that can drift).
    */
  private def gopherFlags(text: Column): Seq[Column] = {
    val t = TextAnalysis.tokens(text)
    val n = size(t).cast("long")
    val sumLen = coalesce(
      aggregate(transform(t, x => length(x).cast("long")), lit(0L), _ + _),
      lit(0L))
    val nAlpha = size(filter(t, x => x.rlike("[a-z]"))).cast("long")
    val nStop = size(filter(t,
      x => x.isin(TextAnalysis.EnStopwords.map(lit): _*))).cast("long")
    Seq((n >= 50L && n <= 100000L).as("r_wc"),
      (lit(3L) * n <= sumLen && sumLen <= lit(10L) * n).as("r_mwl"),
      (nStop >= 2L).as("r_stop"),
      (lit(5L) * nAlpha >= lit(4L) * n).as("r_alpha"))
  }

  def gopherRules(docs: DataFrame, text: Column): DataFrame = {
    val flags = docs.select(col("source") +: gopherFlags(text): _*)
    flags.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("r_wc"), 1L).otherwise(0L)).as("n_fail_wordcount"),
        sum(when(!col("r_mwl"), 1L).otherwise(0L)).as("n_fail_meanlen"),
        sum(when(!col("r_stop"), 1L).otherwise(0L)).as("n_fail_stopwords"),
        sum(when(!col("r_alpha"), 1L).otherwise(0L)).as("n_fail_alpha"),
        sum(when(col("r_wc") && col("r_mwl") && col("r_stop") &&
          col("r_alpha"), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_share",
        col("n_keep").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }

  /** Calibration of the SOFT quality score against the published
    * HARD gate: rank the corpus by [[TextAnalysis.quality]] score,
    * cut into `nBins` exact global quantile bins, and report each
    * bin's Gopher all-rules pass rate. A calibrated score shows a
    * monotone pass-rate ramp (low-score bins fail the hard rules,
    * high-score bins pass); a flat ramp means the blended score adds
    * nothing over the rules and a threshold picked on it is
    * arbitrary. This is the reliability-diagram gauge a pipeline
    * reads before using the soft score as its keep/drop dial.
    *
    * Scale shape: scoring and rule flags are map-only over one token
    * array per doc; the global quantile cut is the two-phase
    * [[graft.functions.Ranks.grouped]] rank (range partitioning —
    * never a single-partition window) + the exact NTILE arithmetic;
    * output |bins| rows.
    */
  def qualityCalibration(docs: DataFrame, text: Column,
      nBins: Int = 10): DataFrame = {
    val scored = TextAnalysis.quality(docs, text)
      .select(col("doc_id") +: col("quality_score") +: gopherFlags(text): _*)
      .withColumn("gopher_pass",
        col("r_wc") && col("r_mwl") && col("r_stop") && col("r_alpha"))
    graft.functions.Ranks
      .grouped(scored, Nil, Seq("quality_score", "doc_id"))
      .withColumn("bin",
        expr(graft.functions.Ranks.ntileExpr("rank", "grp_total", nBins))
          .cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("n_pass"),
        min(col("quality_score")).as("min_score"),
        max(col("quality_score")).as("max_score"))
      .withColumn("pass_rate",
        col("n_pass").cast("double") / col("n_docs").cast("double"))
      .select(col("bin"), col("n_docs"), col("n_pass"), col("pass_rate"),
        col("min_score"), col("max_score"))
  }

  /** Contamination-sensitivity curve: [[decontaminationScores]]'
    * overlap gate swept across n-gram widths. The gate's width IS
    * its precision/recall dial — 3-grams over-flag (common phrases
    * read as leakage), 13-grams (the GPT-3 decontamination width)
    * under-flag paraphrased leakage — and this curve is the table a
    * pipeline reads to pick the width: per n, the eval inventory
    * size, how many raw docs carry ≥1 overlapping n-gram, the total
    * overlap instance mass, and the contaminated share of the corpus
    * (double division of exact integers; the doc denominator is
    * fixed across widths so the rows compare).
    *
    * Scale shape: the corpus tokenizes ONCE (materialized token
    * arrays); each width slices the same cached relation — per n one
    * distinct (doc, shingle) shuffle and an eval-inventory join
    * (eval sets are small next to the corpus → broadcastable), never
    * doc×doc. Output |ns| rows.
    */
  def contaminationCurve(docs: DataFrame, isEval: Column,
      ns: Seq[Int] = Seq(3, 8, 13),
      text: Column = col("text")): DataFrame = {
    require(ns.nonEmpty, "contaminationCurve needs at least one n-gram width")
    val toks = graft.CacheScope.materialize(
      docs.select(col("doc_id"), isEval.as("is_eval"),
        graft.ml.TextAnalysis.tokens(text).as("toks")))
    val nRaw = toks.filter(!col("is_eval")).agg(count(lit(1)).as("n_docs"))
    ns.map { n =>
      val sh = toks.select(col("doc_id"), col("is_eval"),
        explode(Dedup.shingleArrayN(col("toks"), n)).as("shingle"))
      val evalInv = sh.filter(col("is_eval"))
        .select(col("shingle")).distinct()
        .withColumn("hit", lit(1))
      val perDoc = sh.filter(!col("is_eval"))
        .select(col("doc_id"), col("shingle")).distinct()
        .join(evalInv, Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(col("hit")).as("n_overlap"))
      perDoc.agg(
          coalesce(sum(when(col("n_overlap") > 0, 1L).otherwise(0L)),
            lit(0L)).as("n_contaminated"),
          coalesce(sum(col("n_overlap")), lit(0L)).as("sum_overlap"))
        .crossJoin(evalInv.agg(count(lit(1)).as("n_eval_ngrams")))
        .crossJoin(nRaw)
        .select(lit(n.toLong).as("ngram_n"), col("n_eval_ngrams"),
          col("n_docs"), col("n_contaminated"), col("sum_overlap"),
          (col("n_contaminated").cast("double") /
            col("n_docs").cast("double")).as("contaminated_share"))
    }.reduce(_ unionByName _).orderBy(col("ngram_n"))
  }

  /** Cross-document duplicated n-gram inventory per source: of each
    * source's distinct (doc, 3-gram) instances, how many use a 3-gram
    * that also appears in at least one OTHER document corpus-wide.
    * This is the corpus-level repetition census (boilerplate headers,
    * licence blocks, template text) that decides whether line/passage
    * dedup is worth running — the cheap precursor to MinHash.
    *
    * Scale shape: distinct (doc, shingle) pairs (one shuffle), a
    * document-frequency count as a window over the SAME shingle key
    * (second shuffle, vocabulary-bounded output), then a per-source
    * rollup (tiny). Never doc×doc; the df>1 test replaces any join
    * against a duplicate inventory.
    */
  def dupNgramStats(docs: DataFrame): DataFrame = {
    val sh = Dedup.shingles(docs).distinct()
    val w = Window.partitionBy(col("shingle"))
    sh.withColumn("df", count(lit(1)).over(w))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_ratio",
        col("n_shared").cast("double") / col("n_shingles").cast("double"))
  }

  /** Max epochs a source may repeat in [[epochPlan]] — 4, the
    * published point past which repeated data stops buying loss
    * (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models"). */
  val EpochCap = 4L

  /** Training-token budget as a multiple of the corpus size. 2× — a
    * data-constrained run (the regime the epoch planner exists for).
    */
  val EpochBudgetX = 2L

  /** Data-constrained epoch planner: given a training-token budget of
    * [[EpochBudgetX]]× the corpus and a UNIFORM per-source target mix,
    * allocate tokens per source under the [[EpochCap]]-epoch repeat
    * limit — small sources hit the cap, and their unserved share is
    * redistributed to uncapped sources in proportion to remaining
    * capacity. The output is the per-source training manifest: target
    * share, capped first-pass allocation, final allocation, and the
    * implied epoch count a sampler repeats that source.
    *
    * Exactness: every cross-source SUM is integer (budget, targets,
    * capacities, first-pass allocations) so the plan is independent
    * of partitioning and accumulation order; the only doubles are
    * one per-row redistribution fraction and the final epochs
    * division — bit-identical in any engine.
    *
    * Scale shape: one map-side-combined per-source token aggregate
    * over the corpus (the only corpus-sized work), then two 1-row
    * broadcast totals over the |sources| relation. Output |sources|
    * rows.
    */
  def epochPlan(docs: DataFrame): DataFrame = {
    val perSrc = docs
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("corpus_tokens"),
      count(lit(1)).as("n_sources"))
    val base = graft.CacheScope.materialize(
      perSrc.crossJoin(broadcast(tot))
        .withColumn("budget", lit(EpochBudgetX) * col("corpus_tokens"))
        .withColumn("target_tokens", expr("budget div n_sources"))
        .withColumn("capacity", lit(EpochCap) * col("n_tokens"))
        .withColumn("alloc_capped",
          least(col("target_tokens"), col("capacity"))))
    val agg2 = base.agg(sum(col("alloc_capped")).as("allocated"),
      sum(col("capacity") - col("alloc_capped")).as("spare"))
    base.crossJoin(broadcast(agg2))
      .withColumn("leftover", col("budget") - col("allocated"))
      .withColumn("alloc_final",
        when(col("spare") > 0L,
          col("alloc_capped").cast("double") +
            col("leftover").cast("double") *
            ((col("capacity") - col("alloc_capped")).cast("double") /
              col("spare").cast("double")))
          .otherwise(col("alloc_capped").cast("double")))
      // a source whose docs tokenize to zero tokens would read
      // 0.0/0.0 = NaN here, and Spark/DuckDB parity would then hang
      // on DuckDB's ieee_floating_point_ops setting — explicit 0.0,
      // consistent with the dup_ratio/oov_rate guards elsewhere
      .withColumn("epochs",
        when(col("n_tokens") > 0L,
          col("alloc_final") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("capped", col("alloc_capped") === col("capacity"))
      .select(col("source"), col("n_tokens"), col("target_tokens"),
        col("alloc_capped"), col("alloc_final"), col("epochs"),
        col("capped"))
  }

  /** Anchor width for [[dupSpans]] — the k-gram a duplicated span is
    * detected at. 5 tokens ≈ the smallest run that is plausibly
    * copied text rather than coincidence on this corpus; a web-scale
    * deployment uses the published 50-token threshold.
    */
  val DupSpanK = 5

  /** Duplicate-substring span census (the ExactSubstr dedup view of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better", at k-gram anchor granularity): for every
    * document, the maximal spans of text whose [[DupSpanK]]-gram
    * anchors ALL appear in at least one other document — the exact
    * regions substring-level dedup would cut, where
    * [[dupNgramStats]] only counts shingles and MinHash only flags
    * whole documents. Two anchors merge into one span when their
    * k-token windows overlap or touch (gap ≤ k), so `dup_tokens` is
    * the EXACT union coverage of duplicated windows — never double-
    * counted, never fragmented.
    *
    * Scale shape: anchor fan-out is document-bounded (one posexplode);
    * the duplicate inventory is a distinct (fp, doc) relation with a
    * document-frequency window on the fp key (vocabulary-bounded,
    * same shape as [[dupNgramStats]]); the flag joins back co-keyed
    * on (fp, doc); span merging is a per-document gaps-and-islands
    * window (documents are bounded, perfectly parallel). Never
    * doc×doc — the df>1 test replaces any pairwise comparison.
    */
  def dupSpans(docs: DataFrame): DataFrame = {
    val k = DupSpanK
    val base = graft.CacheScope.materialize(
      docs.select(col("doc_id"), col("source"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .withColumn("n_tokens", size(col("toks")).cast("long")))
    val anch = base
      .select(col("doc_id"),
        posexplode(Dedup.shingleArrayN(col("toks"), k)).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("i"),
        Portable.pHash(col("gram")).as("fp"))
    val dupFps = anch.select(col("fp"), col("doc_id")).distinct()
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("df") > 1)
      .drop("df")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val spans = anch.join(dupFps, Seq("fp", "doc_id"))
      .withColumn("new_span",
        when(lag(col("i"), 1).over(byDoc).isNull ||
          col("i") - lag(col("i"), 1).over(byDoc) > k, 1L).otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(count(lit(1)).as("span_anchors"),
        (max(col("i")) - min(col("i")) + k).as("span_tokens"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_anchors")).as("n_dup_anchors"),
        max(col("span_tokens")).as("max_span_tokens"),
        sum(col("span_tokens")).as("dup_tokens"))
    base.select(col("doc_id"), col("source"), col("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        greatest(col("n_tokens") - (k - 1), lit(0L)).as("n_anchors"),
        coalesce(col("n_dup_anchors"), lit(0L)).as("n_dup_anchors"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }

  /** Token-length histogram per source in exact power-of-two buckets
    * (bucket = ⌊log2 n_tokens⌋ via the bin()-length trick — no
    * floating log, so engines bucket identically at every boundary).
    * The token-budget planning view a pipeline consults before
    * packing/mixing. Map-only per doc, then one tiny aggregate:
    * output is |sources| × ~12 buckets at any corpus size.
    */
  def lengthHistogram(docs: DataFrame): DataFrame = {
    val n = size(TextAnalysis.tokens(col("text"))).cast("long")
    docs.select(col("source"), n.as("n_tokens"))
      .withColumn("bucket", (length(bin(col("n_tokens"))) - 1).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
  }

  /** Relative quality gate: keep each source's top half by
    * [[TextAnalysis.quality]] score (rank ties broken by doc_id, the
    * keep test in exact integers: 2·rank ≤ n+1 ⟺ rank ≤ ⌈n/2⌉) —
    * the percentile-threshold filter pipelines apply when an absolute
    * score cutoff would over- or under-prune a source.
    *
    * Scale shape: scoring is map-only; ranking is ONE shuffle on the
    * source key with both window frames (ranked + unranked count)
    * sharing it. An exact per-source median rank at 100 TB implies a
    * per-source sort — that is the cost of the exact formulation;
    * the approximate alternative (threshold from a quantile sketch,
    * see q_quantile_sketch) trades it away when sources are huge.
    */
  def qualityFiltered(docs: DataFrame): DataFrame = {
    val scored = TextAnalysis.quality(docs, col("text"))
      .select(col("doc_id"), col("source"), col("quality_score"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rk") * 2 <= col("n_docs") + 1)
      .select(col("source"), col("doc_id"), col("quality_score"), col("rk"))
  }

  val TokenBudget = 12000L

  /** Greedy token-budget planner: rank the whole corpus by quality
    * (desc, doc_id tiebreak) and admit documents in rank order while
    * the running token total still fits the budget — the "best N
    * tokens we can afford" selection a training run makes when
    * compute, not data, is the binding constraint. Per source: how
    * many docs/tokens made the cut and the admitted quality floor —
    * the mixing consequence of a GLOBAL quality cut (vs
    * [[qualityFiltered]]'s per-source median, which fixes the mix
    * and moves the bar).
    *
    * The cut is a pure prefix: token counts are non-negative, so
    * once the inclusive running sum passes the budget every later
    * rank fails too — a deterministic cutline, not a knapsack.
    *
    * Scale shape: scoring is map-only; the global rank order runs
    * through [[graft.functions.Ranks.prefixSum]]'s range partition +
    * per-partition windows + broadcast |partitions|-row offsets (a
    * plain `sum() OVER (ORDER BY quality)` would collapse the corpus
    * onto one task); the rollup is a |sources|-row aggregate.
    */
  def tokenBudget(docs: DataFrame, budget: Long = TokenBudget): DataFrame = {
    val scored = TextAnalysis.quality(docs, col("text"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("quality_score"))
      .withColumn("neg_q", -col("quality_score"))
    graft.functions.Ranks
      .prefixSum(scored, Seq("neg_q", "doc_id"), "n_tokens")
      .withColumn("admitted", col("prefix_sum") + col("n_tokens") <= budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("admitted"), col("n_tokens")).otherwise(0L))
          .as("tokens_admitted"),
        sum(col("n_tokens")).as("tokens_total"),
        min(when(col("admitted"), col("quality_score"))).as("cut_quality"))
      .orderBy(col("source"))
  }

  val ChunkSize = 32
  val ChunkStride = 24

  /** Fixed-window token chunking with overlap: each document fans out
    * to chunks of [[ChunkSize]] tokens starting every [[ChunkStride]]
    * tokens (so consecutive chunks share `ChunkSize - ChunkStride`
    * tokens of context) — the doc→training-sequence step of a
    * tokenizer pipeline, and the unit passage/chunk dedup and
    * retrieval indexing operate on. A trailing start whose window
    * adds NO new tokens (start + ChunkSize − ChunkStride ≥ n: the
    * previous chunk already reached the end of the document) is
    * dropped — it would be a strict suffix of its predecessor,
    * duplicate training content, and inflate every downstream chunk
    * count.
    *
    * Scale shape: map-only — the explode fan-out is at most
    * ⌈n_tokens / stride⌉ per document (bounded by document length,
    * never corpus size), no shuffle, no join; each chunk carries a
    * portable 60-bit fingerprint so downstream exact chunk-dedup is a
    * plain groupBy. Determinism: chunk boundaries are pure functions
    * of the token sequence.
    */
  def chunked(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs
      .select(col("doc_id"), col("source"), toks.as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") > 0)
      .withColumn("start",
        explode(sequence(lit(0), col("n_tokens") - 1, lit(ChunkStride))))
      .filter(col("start") === 0 ||
        col("start") + lit(ChunkSize - ChunkStride) < col("n_tokens"))
      .withColumn("chunk",
        slice(col("toks"), col("start") + lit(1), lit(ChunkSize)))
      .select(col("doc_id"), col("source"),
        (col("start") / ChunkStride).cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        Portable.pHash(concat_ws(" ", col("chunk"))).as("chunk_fp"))
  }

  /** Packing-efficiency report over [[packed]]'s greedy contiguous
    * bins: per source the bins used vs the ⌈Σtokens/budget⌉ lower
    * bound no packing can beat, the realized token utilization, and
    * the bins a budget-exceeding document overflows. This is the
    * gauge that says whether smarter packing (FFD, length-bucketed
    * shuffling) would buy real step-count — if efficiency is already
    * ~1, reordering the corpus buys nothing.
    *
    * Scale shape: rides [[packed]]'s single source-keyed window
    * exchange; per-bin sums reduce on (source, bin), the report on
    * source — both map-side combined. All integers except the two
    * final divisions.
    */
  def packEfficiency(docs: DataFrame, budgetTokens: Int): DataFrame =
    packed(docs, budgetTokens)
      .groupBy(col("source"), col("bin"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("bins_used"),
        sum(col("bin_tokens")).as("total_tokens"),
        sum(when(col("bin_tokens") > budgetTokens, 1L).otherwise(0L))
          .as("n_overflow_bins"))
      .withColumn("lower_bound",
        expr(s"(total_tokens + $budgetTokens - 1) div $budgetTokens"))
      .withColumn("efficiency",
        col("lower_bound").cast("double") / col("bins_used").cast("double"))
      .withColumn("utilization",
        col("total_tokens").cast("double") /
          (col("bins_used") * budgetTokens).cast("double"))
      .orderBy(col("source"))

  /** Passage-level duplication census over [[chunked]] fingerprints:
    * per source, how many chunks share their 60-bit fingerprint with
    * at least one OTHER document (boilerplate passages, quoted
    * blocks, licence text — what passage dedup would remove). The
    * chunk-granularity sibling of [[dupNgramStats]].
    *
    * Scale shape: distinct (fingerprint, doc) pairs (one shuffle), a
    * document-frequency window on the SAME fingerprint key, a join
    * back to the chunk rows on (fp, doc) — co-keyed with the distinct
    * — and a tiny per-source rollup. Never doc×doc.
    */
  def chunkDupStats(docs: DataFrame): DataFrame = {
    // persisted: ch feeds both join branches, and only the distinct
    // branch has an exchange — without this the tokenize/slice/hash
    // pipeline runs twice over the corpus
    val ch = graft.CacheScope.materialize(chunked(docs))
    val w = Window.partitionBy(col("chunk_fp"))
    val docsPerFp = ch.select(col("chunk_fp"), col("doc_id")).distinct()
      .withColumn("docs_with_fp", count(lit(1)).over(w))
    ch.join(docsPerFp, Seq("chunk_fp", "doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("docs_with_fp") > 1, 1L).otherwise(0L))
          .as("n_shared_chunks"))
      .withColumn("shared_ratio",
        col("n_shared_chunks").cast("double") / col("n_chunks").cast("double"))
  }

  /** Content-defined chunking boundary window (tokens hashed per
    * boundary test) and modulus: a chunk boundary falls after token i
    * iff the portable hash of tokens (i−2..i) ≡ 0 mod [[ContentMask]],
    * giving an expected chunk length of ~[[ContentMask]] tokens.
    */
  val ContentWindow = 3
  val ContentMask = 8

  /** Content-defined chunking (the rsync/CDC-for-storage idea applied
    * to the token stream): boundaries are a pure function of LOCAL
    * token content — the hash of the trailing [[ContentWindow]]-token
    * window — not of position. Where [[chunked]]'s fixed-stride grid
    * shifts EVERY boundary when a token is inserted or removed
    * upstream (so chunk-level dedup loses all alignment between near-
    * identical revisions), content-defined boundaries re-synchronize
    * one window past the edit: every chunk not containing the edit
    * keeps its exact fingerprint. [[chunkRobustness]] measures that
    * contrast directly.
    *
    * Stateless variant (no min/max chunk bound): the boundary test
    * depends only on the local window, never on the previous
    * boundary, so the whole chunking is expressible as one window
    * prefix-sum — and verifiable in plain SQL — instead of a
    * sequential per-document fold.
    *
    * Scale shape: one posexplode fan-out bounded by document length,
    * one per-document window (documents are the partition unit —
    * bounded length, perfectly parallel across the corpus), one
    * (doc, chunk) aggregate; no join, never doc×doc. The boundary
    * test is evaluated INSIDE one array transform BEFORE the
    * explode, so exploded rows carry only (token, flag) — never the
    * whole document array (carrying `toks` through the explode and
    * slicing per row would make the explode's input O(n_tokens²)
    * bytes per document); the fan-out cost is O(n_tokens · window).
    */
  def contentChunks(docs: DataFrame): DataFrame = {
    val w = ContentWindow
    val tok = docs
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("source"),
        posexplode(transform(col("toks"), (t, i0) =>
          struct(t.as("tok"),
            when(i0 >= w - 1 &&
              pmod(Portable.pHash(concat_ws(" ",
                  slice(col("toks"), (i0 - (w - 2)).cast("int"), lit(w)))),
                lit(ContentMask.toLong)) === 0L, 1L).otherwise(0L)
              .as("is_b")))).as(Seq("i0", "tb")))
      .select(col("doc_id"), col("source"),
        (col("i0") + 1).cast("long").as("i"),
        col("tb.tok").as("tok"), col("tb.is_b").as("is_b"))
    // boundary AFTER token i starts the next chunk, so a token's
    // chunk id counts the boundaries strictly BEFORE it
    val prior = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tok
      .withColumn("chunk_id", coalesce(sum(col("is_b")).over(prior), lit(0L)))
      .groupBy(col("doc_id"), col("source"), col("chunk_id"))
      .agg(min(col("i")).as("chunk_start"),
        count(lit(1)).as("chunk_tokens"),
        Portable.pHash(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("i"), col("tok")))),
            x => x.getField("tok")))).as("chunk_fp"))
  }

  /** The edit-robustness A/B that justifies content-defined chunking:
    * prepend ONE token to every document (the canonical upstream edit
    * — a new header line, a changed byline) and measure, per method,
    * what fraction of (doc, chunk-fingerprint) pairs survive. Fixed-
    * stride chunking loses nearly everything (every boundary shifts
    * by one token); content-defined chunking loses only the chunks
    * containing the edit window. This ratio is exactly the fraction
    * of chunk-dedup work (and incremental-storage reuse) that
    * survives a trivial revision at 100 TB.
    *
    * Scale shape: four chunking passes over the corpus (2 methods ×
    * 2 variants), each map-shaped per [[chunked]]/[[contentChunks]];
    * the preservation probe is a per-doc equi-join on
    * (doc_id, chunk_fp) — co-keyed, never cross-document.
    */
  def chunkRobustness(docs: DataFrame): DataFrame = {
    val shifted = docs.withColumn("text", concat(lit("zzz "), col("text")))
    def fps(d: DataFrame, content: Boolean): DataFrame = {
      val ch = if (content) contentChunks(d) else chunked(d)
      ch.select(col("doc_id"), col("chunk_fp")).distinct()
    }
    val rows = Seq(("content", true), ("fixed", false)).map { case (m, c) =>
      fps(docs, c)
        .join(fps(shifted, c).withColumn("hit", lit(1)),
          Seq("doc_id", "chunk_fp"), "left")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_fps"),
          count(col("hit")).as("n_preserved"))
        .select(lit(m).as("method"), col("n_docs"), col("n_fps"),
          col("n_preserved"),
          when(col("n_fps") > 0,
            col("n_preserved").cast("double") / col("n_fps").cast("double"))
            .otherwise(lit(0.0)).as("preserved_ratio"))
    }
    rows.reduce(_ union _)
  }

  /** Packing summary per (source, bin): the batch manifest. */
  def packSummary(docs: DataFrame, budgetTokens: Int): DataFrame =
    packed(docs, budgetTokens)
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  /** Cross-source shingle overlap: for every source pair, how many
    * distinct word 3-grams the two shingle sets share, with the
    * Jaccard of those sets. The training-mix view of cross-source
    * contamination — which "independent" sources actually carry the
    * same boilerplate (and would double-count under a per-source
    * dedup budget). Complements [[dupNgramStats]] (corpus-wide
    * duplication per source) with WHO shares WITH WHOM.
    *
    * Scale shape: ONE scan, ONE shuffle. The raw shingle stream goes
    * straight into groupBy(shingle).collect_set(source) — collect_set
    * dedups during the map-side partial, so no separate DISTINCT
    * exchange exists, and each shingle's set is bounded at |sources|
    * elements (never a row-pair fan-out on a hot shingle). Everything
    * downstream derives from that vocabulary-bounded relation
    * (materialized, two consumers): per-source totals by re-exploding
    * it, pairs map-side at ≤ C(|sources|,2) each, final rollup
    * |sources|²-row tiny. Totals ride a |sources|-row broadcast
    * twice. No shingle self-join anywhere.
    */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val shufN = docs.sparkSession.sessionState.conf.numShufflePartitions
    // tokenize below a doc-keyed exchange (spread over CPUs; a
    // source-keyed spread would cap parallelism at |sources|)
    val toks = docs
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .repartition(shufN, col("doc_id"))
    val sh = toks
      .select(col("source"), explode(Dedup.shingleArray(col("toks"))).as("shingle"))
    val srcSets = graft.CacheScope.lazyPersist(sh.groupBy(col("shingle"))
      .agg(sort_array(collect_set(col("source"))).as("srcs")))
    val totals = srcSets.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val multi = srcSets.filter(size(col("srcs")) >= 2)
    val pairArr = flatten(transform(sequence(lit(0), size(col("srcs")) - 2), i =>
      transform(sequence(i + 1, size(col("srcs")) - 1), j =>
        struct(element_at(col("srcs"), i + 1).as("source_a"),
          element_at(col("srcs"), j + 1).as("source_b")))))
    val pairs = multi.select(explode(pairArr).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(totals.select(col("source").as("source_a"), col("n").as("n_a"))),
        "source_a")
      .join(broadcast(totals.select(col("source").as("source_b"), col("n").as("n_b"))),
        "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        (col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
          .as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Exact per-source token-length percentiles (p50/p90/p99) by
    * deterministic rank selection: rank docs by (n_tokens, doc_id)
    * within source and read the value at rank ⌈n·p/100⌉ — the
    * engine-identical tie-break `q_median_price` uses, widened to a
    * percentile profile. The curve a pipeline consults to set context
    * lengths and packing budgets (next to `corpus_histogram`'s
    * log-bucket view).
    *
    * Scale shape: tokenization is map-only; ONE shuffle partitions by
    * source for the rank window (parallelism capped at |sources| —
    * the honest cost of EXACT per-group order statistics; the
    * bounded-memory relaxation is `q_quantile_sketch`'s hash-rank
    * sample); the percentile selection is a conditional aggregate on
    * the ranked rows, grouping satisfied by the window's partitioning.
    */
  def lengthPercentiles(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val bySrc = Window.partitionBy(col("source"))
    val ranked = d
      .withColumn("rn", row_number().over(
        bySrc.orderBy(col("n_tokens"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(bySrc))
    def pick(p: Int) =
      max(when(col("rn") === expr(s"(cnt * $p + 99) DIV 100"),
        col("n_tokens"))).as(s"p${p}_tokens")
    ranked.groupBy(col("source"))
      .agg(max(col("cnt")).as("n_docs"),
        pick(50), pick(90), pick(99),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("source"))
  }

  /** Per-document n-gram novelty: the fraction of a doc's distinct
    * 3-grams whose FIRST corpus appearance (by doc_id ingestion
    * order) is this doc — the marginal-diversity curve that decides
    * when more data from a source stops adding new content (the
    * per-doc twin of `corpus_dup_ngrams`' census; shingle-less docs
    * score 1.0 by convention).
    *
    * Scale shape: distinct (doc, shingle) pairs (one shuffle), the
    * first-appearance doc as a min window over the SAME
    * vocabulary-bounded relation (second shuffle on shingle), then a
    * per-doc rollup. Never doc×doc, no join against a first-seen
    * inventory — the window IS the inventory.
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val ds = Dedup.shingles(docs).distinct()
    val firstDoc = ds.withColumn("first_doc",
      min(col("doc_id")).over(Window.partitionBy(col("shingle"))))
    val perDoc = firstDoc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_shingles"), lit(0L)) > 0,
          col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(1.0)).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Heaps'-law vocabulary growth over 3-gram shingles: new distinct
    * shingles first appearing in each doc-id decile, with the running
    * vocabulary size — the curve that says whether more data from
    * this corpus still grows the vocabulary (the corpus-level
    * companion to `corpus_novelty`'s per-doc view; 3-grams rather
    * than unigrams because a bounded word list saturates instantly
    * while the n-gram space keeps growing — the regime Heaps' law
    * describes).
    *
    * Scale shape: min(doc_id) per shingle is duplicate-insensitive,
    * so the raw shingle explode aggregates straight to the
    * vocabulary-bounded first-appearance relation (ONE shingle-keyed
    * shuffle, no distinct pre-pass); deciles are exact integer math
    * against a 1-row broadcast of the doc-id bounds; the cumulative
    * sum is a window over the ≤10-row post-aggregate.
    */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    val firstDoc = Dedup.shingles(docs)
      .groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
    val bounds = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    firstDoc.crossJoin(broadcast(bounds))
      .withColumn("decile",
        expr("((first_doc - lo) * 10) DIV (hi - lo + 1)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_new_terms"))
      .withColumn("cum_vocab",
        sum(col("n_new_terms")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("decile"))
  }

  /** Deterministic global training order + interleaving audit. After
    * mixing, a corpus needs a reproducible shuffle (the data-order
    * step: identical across retries and partitioning, no RNG state) —
    * position = rank of the portable hash of (source, doc_id), the
    * same key law the sampler gates on. The audit reports, per
    * source, its positions' spread in the global order: a healthy
    * shuffle interleaves every source across the whole range (each
    * source's mean position ≈ the global mean; min/max near the
    * ends for any non-tiny source), while a degenerate order
    * (sorted-by-source ingestion) shows disjoint [min,max] bands.
    *
    * Scale shape: a naive global-rank window collapses to ONE
    * partition — so ranks are computed two-phase: range-partition by
    * the hash key (the distributed total sort a training-manifest
    * write pays anyway), per-partition row_number, plus each
    * partition's start offset from a |partitions|-row prefix-sum
    * relation joined back broadcast. The only global window runs
    * over that tiny offsets relation, never over the corpus.
    */
  def shuffleAudit(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("source"), col("doc_id"),
      Portable.pHash(concat(col("source"), lit("#"), col("doc_id"))).as("h"))
    // ties broken by the full key so the order is total and
    // retry-stable; the two-phase mechanics (pid captured on the
    // materialized ranged relation, broadcast offsets) live in
    // functions/Ranks — ONE implementation for every global rank
    graft.functions.Ranks.grouped(keyed, Nil, Seq("h", "source", "doc_id"))
      .withColumn("pos", col("rank"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"),
        (sum(col("pos")).cast("double") / count(lit(1))).as("mean_pos"))
      .orderBy(col("source"))
  }

  /** Exact-k stratified sample: the k docs per source with the
    * smallest portable (source, doc_id) hash — the balanced
    * evaluation-set draw ([[sampled]] is the RATE gate; this is the
    * COUNT gate a "500 docs per source for human eval" request
    * needs). Hash-rank selection keeps the draw deterministic,
    * reproducible across engines/retries, and independent of
    * partitioning.
    *
    * Scale shape: ONE source-keyed exchange; the rank window is
    * top-k-prunable, so Spark's WindowGroupLimit caps every group at
    * k rows BEFORE the full sort — per-partition heaps, not a
    * per-source total order (the plan the `text_topk_terms` audit
    * pinned). Output is |sources|·k rows.
    */
  def stratifiedK(docs: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    docs.select(col("source"), col("doc_id"),
        Portable.pHash(concat(col("source"), lit("#"), col("doc_id"))).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("source"), col("doc_id"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** Per-source Spearman rank agreement between the two quality
    * signals the pipeline gates on — the heuristic
    * [[TextAnalysis.quality]] score and the unigram-LM familiarity
    * ([[TextAnalysis.unigramLm]]'s avg_log2_tf, the
    * `text_perplexity_filter` signal). Before trusting either gate, a
    * data team checks whether they agree (ρ near 1: redundant; near
    * 0: orthogonal — run both; negative: one is inverted for this
    * source). Both rankings use the (score, doc_id) deterministic
    * tie-break, Σd² is an exact integer aggregate, and ρ =
    * 1 − 6Σd²/(n(n²−1)) is one fixed double expression (n(n²−1)
    * multiplied in doubles so the denominator can't wrap at corpus
    * n).
    *
    * Scale shape: scoring is quality's map-only pass plus
    * unigramLm's two shuffles; BOTH rank windows share one
    * source-partition exchange (two sorts, no second shuffle); the
    * rollup collapses on the same key. Parallelism capped at
    * |sources| — the honest cost of exact per-group order statistics
    * (same contract as [[lengthPercentiles]]).
    */
  def signalAgreement(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(docs, col("text"))
      .select(col("doc_id"), col("source"), col("quality_score"))
    val f = TextAnalysis.unigramLm(docs, col("text"))
      .select(col("doc_id"),
        coalesce(col("avg_log2_tf"), lit(-1.0)).as("fam"))
    val bySrc = Window.partitionBy(col("source"))
    q.join(f, "doc_id")
      .withColumn("rq", row_number().over(
        bySrc.orderBy(col("quality_score"), col("doc_id"))).cast("long"))
      .withColumn("rf", row_number().over(
        bySrc.orderBy(col("fam"), col("doc_id"))).cast("long"))
      .withColumn("d", col("rq") - col("rf"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("d") * col("d")).as("sum_d2"))
      .withColumn("spearman",
        when(col("n_docs") > 1,
          lit(1.0) - (lit(6.0) * col("sum_d2").cast("double")) /
            (col("n_docs").cast("double") *
              (col("n_docs").cast("double") * col("n_docs").cast("double")
                - 1)))
          .otherwise(lit(null).cast("double")))
      .orderBy(col("source"))
  }

  /** End-to-end training-data funnel: the composed pipeline a corpus
    * actually runs — quality gate → exact-dup canonicalization →
    * decontamination — reported as per-source surviving counts at
    * each stage plus the token mass that reaches training. This is
    * the yield report a data team reads before launching a run:
    * where documents die, and how many tokens the corpus actually
    * contributes after every gate.
    *
    * Stage semantics reuse the shipped operators verbatim
    * (TextAnalysis.quality's score + threshold 0.5, corpus_clean's
    * keep-first-doc_id canonical rule, decontaminationScores' 3-gram
    * overlap with zero-tolerance), so the funnel IS the composition,
    * not a re-implementation.
    *
    * Scale shape: quality is map-only; the canonical rule is one fp
    * window; decontamination is the eval-shingle join (broadcast at
    * real eval:corpus ratios). All gates collapse into conditional
    * sums in ONE per-source aggregate — the funnel costs one pass
    * over the scored relation, not a pass per stage.
    */
  def pipelineFunnel(docs: DataFrame, isEval: Column): DataFrame = {
    val train = docs.filter(!isEval)
    val scored = TextAnalysis.quality(train, col("text"))
      .withColumn("fp", md5(Portable.normText(col("text"))))
    val canonical = scored.withColumn("rn",
      row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
    val decon = decontaminationScores(docs, isEval)
      .select(col("doc_id"), col("n_overlap"))
    val keepQ = col("quality_score") >= 0.5
    val keepC = keepQ && col("rn") === 1
    val keepD = keepC && col("n_overlap") === 0L
    canonical.join(decon, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(keepQ, 1L).otherwise(0L)).as("n_quality"),
        sum(when(keepC, 1L).otherwise(0L)).as("n_canonical"),
        sum(when(keepD, 1L).otherwise(0L)).as("n_final"),
        sum(when(keepD, col("n_tokens")).otherwise(0L)).as("tokens_final"))
      .orderBy(col("source"))
  }

  /** Bloom-filter decontamination: the broadcast-bitmap scale path of
    * [[decontaminationScores]]. The eval set's shingle inventory is
    * folded into an `m`-position Bloom filter (each shingle sets `k`
    * positions, `pos_i = pHash(shingle, seed=i) mod m`); a training
    * shingle is bloom-positive iff ALL `k` of its positions are
    * occupied. The per-doc report carries both the bloom verdict and
    * the exact-join verdict, so the filter's false-positive yield is
    * measured, not assumed — the calibration a pipeline runs at small
    * scale before trusting the bloom-only path at full scale.
    *
    * Scale shape: the filter is a DISTINCT of at most `m` integer
    * positions — broadcast by construction no matter how large the
    * eval set grows (the whole point vs the exact join, whose
    * build side grows with the eval corpus). Scoring fans each
    * distinct (doc, shingle) out ×k against the broadcast, then one
    * (doc, shingle) reduce and one doc reduce. The exact-hit column
    * reuses [[decontaminationScores]]'s left join purely as the
    * FP-accounting cross-check; a production bloom-only run drops
    * that join and keeps the broadcast.
    */
  def bloomDecontaminationScores(
      docs: DataFrame,
      isEval: Column,
      m: Int = 8192,
      k: Int = 3): DataFrame = {
    val sh = Dedup.shingles(docs)
    val evalIds = docs.filter(isEval).select(col("doc_id").as("eval_id"))
    val evalShingles = sh
      .join(evalIds, col("doc_id") === col("eval_id"), "left_semi")
      .select(col("shingle")).distinct()
    def positions(c: Column): Seq[Column] =
      (0 until k).map(s => pmod(Portable.pHash(c, s), lit(m.toLong)))
    val filterPos = evalShingles
      .select(explode(array(positions(col("shingle")): _*)).as("pos"))
      .distinct()
      .withColumn("occupied", lit(1))
    val corpusSh = sh
      .join(evalIds, col("doc_id") === col("eval_id"), "left_anti")
      .distinct()
    val perShingle = corpusSh
      .select(col("doc_id"), col("shingle"),
        explode(array(positions(col("shingle")): _*)).as("pos"))
      .join(broadcast(filterPos), Seq("pos"), "left")
      .groupBy(col("doc_id"), col("shingle"))
      // all k probe rows matched ⇒ every position occupied. Seed
      // collisions (two seeds, same position) still yield k probe
      // rows with a consistent verdict, so count==k stays exact.
      .agg((count(col("occupied")) === k).as("bloom_hit"))
    val exact = evalShingles.withColumn("exact", lit(1))
    val scores = perShingle
      .join(exact, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        count(col("exact")).as("n_exact_hits"))
    docs.filter(!isEval).select(col("doc_id"))
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_bloom_hits"), lit(0L)).as("n_bloom_hits"),
        coalesce(col("n_exact_hits"), lit(0L)).as("n_exact_hits"),
        (coalesce(col("n_bloom_hits"), lit(0L)) -
          coalesce(col("n_exact_hits"), lit(0L))).as("n_false_positives"),
        (coalesce(col("n_bloom_hits"), lit(0L)) > 0L).as("flagged"))
  }

  /** Dedup impact audit per source: what exact dedup would REMOVE,
    * in documents and in character mass, before anyone runs it — the
    * "is dedup worth a full pass here" gauge, and after the pass,
    * the per-source attribution of what went (a duplicate group
    * spanning sources keeps its GLOBAL min-doc_id canonical, so a
    * mirror source that re-hosts another source's pages correctly
    * shows ~100% removal while the originating source keeps its
    * copies). Same canonical rule as dedup_exact, so the two
    * operators never disagree about survivors.
    *
    * Scale shape: ONE shuffle on the fingerprint (the window min
    * rides the same exchange), then a |sources|-row rollup. The
    * shares divide exact BIGINTs once — bit-identical across
    * engines. No doc×doc anything.
    */
  def dedupImpact(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"), col("source"), col("n_chars"),
      md5(Portable.normText(col("text"))).as("fp"))
    val w = Window.partitionBy(col("fp"))
    val marked = fp.withColumn("keep",
      when(col("doc_id") === min(col("doc_id")).over(w), 1L).otherwise(0L))
    marked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_kept"),
        sum(col("n_chars")).as("chars_total"),
        sum(col("keep") * col("n_chars")).as("chars_kept"))
      .withColumn("removed_share",
        (col("n_docs") - col("n_kept")).cast("double") /
          col("n_docs").cast("double"))
      .withColumn("chars_removed_share",
        (col("chars_total") - col("chars_kept")).cast("double") /
          col("chars_total").cast("double"))
      .orderBy(col("source"))
  }

  /** Temperature-annealed source mixing weights — the multinomial
    * re-balancing (p_i^α / Σ p_j^α) multilingual/multi-source
    * training mixes use to up-sample small sources without drowning
    * large ones (the α-sampling of the XLM-R / mT5 recipes). Output
    * per source: the natural share by character mass and the
    * annealed shares at α = 1, ½, ¼, plus the effective number of
    * epochs each source would run under a fixed token budget drawn
    * with those weights (epochs > 1 ⇒ the source repeats; the
    * overfit-risk column).
    *
    * Determinism: α is restricted to {1, ½, ¼} ON PURPOSE — p^½ is
    * sqrt (IEEE correctly rounded in every engine) and p^¼ is
    * sqrt∘sqrt, so no libm pow() whose last ulp differs between the
    * JVM and DuckDB enters the compare. The cross-source normalizer
    * Σ√cᵢ is summed as DECIMAL(38,6) (exact, order-independent —
    * a raw double sum would depend on partition order), then the
    * final weight is one double division.
    *
    * Scale shape: one |sources|-row aggregate + a broadcast-sized
    * normalizer join. Everything after the first reduce is
    * constant-size.
    */
  def annealMix(docs: DataFrame, budgetChars: Long = 1L << 20): DataFrame = {
    val bySource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val roots = bySource
      .withColumn("s1", col("chars").cast("double"))
      .withColumn("s2", sqrt(col("chars").cast("double")))
      .withColumn("s4", sqrt(sqrt(col("chars").cast("double"))))
    val norms = roots.agg(
      sum(col("s1").cast("decimal(38,6)")).cast("double").as("z1"),
      sum(col("s2").cast("decimal(38,6)")).cast("double").as("z2"),
      sum(col("s4").cast("decimal(38,6)")).cast("double").as("z4"))
    roots.crossJoin(broadcast(norms))
      .withColumn("share", col("s1") / col("z1"))
      .withColumn("w_half", col("s2") / col("z2"))
      .withColumn("w_quarter", col("s4") / col("z4"))
      .withColumn("epochs_half",
        lit(budgetChars.toDouble) * col("w_half") / col("s1"))
      .select(col("source"), col("n_docs"), col("chars"), col("share"),
        col("w_half"), col("w_quarter"), col("epochs_half"))
      .orderBy(col("source"))
  }

  /** Per-source total-variation distance from the corpus token
    * distribution — the "which source is most out-of-distribution"
    * ranking a mixture designer reads before weighting (KL is the
    * textbook choice, but its log makes the sum a float reduction
    * whose value depends on partition order AND on each engine's
    * non-correctly-rounded ln; TV = ½·Σ|p_s − p_c| has an EXACT
    * integer numerator via the cross-product trick Σ|c_st·N −
    * C_t·n_s| — `text_term_drift`'s identity — so the statistic is
    * reproducible to the last bit). Tokens the source never uses
    * enter through the closed form n_s·(N − Σ_{t∈s}C_t) rather than
    * a vocab×sources fan-out; the top-contributing token (largest
    * |share gap|, smallest token on ties, among tokens PRESENT in
    * the source — an absent token's gap is pure corpus mass, not a
    * signature of the source) is reported with its share gap.
    *
    * Scale shape: ONE vocabulary-bounded (source, token) reduce
    * (map-side combined); corpus totals reduce off it; n_s and N are
    * |sources|-row / 1-row broadcasts; the argmax is a per-source
    * max + an equi-join back — no window over the full vocabulary
    * relation is ever globally sorted. Same int64 headroom caveat as
    * `text_term_drift`: cross-products are exact out to ~10⁹-count
    * terms against 10⁹-token corpora; past that, compare per-mille
    * shares.
    */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val tc = docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val corpus = tc.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
    val ns = tc.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val n = corpus.agg(sum(col("ct")).as("n_total"))
    val contrib = tc.join(corpus, "tok")
      .join(broadcast(ns), "source").crossJoin(broadcast(n))
      .withColumn("gap",
        abs(col("c") * col("n_total") - col("ct") * col("n_s")))
    val agg = contrib.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_s"), max(col("n_total")).as("n_total"),
        sum(col("gap")).as("present_gap"),
        sum(col("ct")).as("covered_ct"), max(col("gap")).as("max_gap"))
      .withColumn("tv_distance",
        (col("present_gap") + col("n_s") * (col("n_total") - col("covered_ct")))
          .cast("double")
          / (lit(2.0) * col("n_s").cast("double") * col("n_total").cast("double")))
    val top = contrib.join(
      agg.select(col("source"), col("max_gap")), "source")
      .filter(col("gap") === col("max_gap"))
      .groupBy(col("source")).agg(min(col("tok")).as("top_token"))
    agg.join(top, "source")
      .withColumn("top_share_gap", col("max_gap").cast("double")
        / (col("n_s").cast("double") * col("n_total").cast("double")))
      .select(col("source"), col("n_s").as("n_tokens"), col("tv_distance"),
        col("top_token"), col("top_share_gap"))
      .orderBy(col("source"))
  }

  /** DSIR-style importance selection (the hashed-n-gram importance
    * resampling recipe of Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every RAW
    * document by how much more likely its hashed-unigram features
    * are under the TARGET distribution (the high-quality corpus the
    * training mix should resemble — here one source) than under the
    * raw pool's own, and keep the top `selPct` percent by that
    * importance weight. This is the targeted sibling of the
    * untargeted gates (`corpus_quality_filter` scores docs
    * absolutely; DSIR scores them RELATIVE to what the mix is
    * missing).
    *
    * Portability: the per-feature log-ratio is the exact-integer
    * self-information difference ⌊log2(ct_target(b)+1)⌋ −
    * ⌊log2(ct_raw(b)+1)⌋ (the [[TextAnalysis.unigramLm]] bin-length
    * trick — a float Σ log p is not reproducible across engines),
    * summed per doc as an int64; the only double is the final
    * per-token average, and the selection is a pure rank cut over
    * (avg_logw desc, doc_id) — no float threshold anywhere.
    *
    * Scale shape: features hash into `buckets` cells, so the
    * distribution relation is bounded at |buckets| rows — it
    * BROADCASTS back onto the token stream no matter how large the
    * corpus (the whole point of hashed DSIR: the importance model's
    * size is fixed while the corpus grows); one (doc) shuffle for
    * the per-doc sum; the global rank is the two-phase
    * [[graft.functions.Ranks.grouped]] (no single-task window);
    * output is a |sources|-row selection census.
    */
  def dsirSelect(docs: DataFrame, text: Column, targetSource: String,
      buckets: Int = 256, selPct: Int = 20): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokens(text)).as("tok"))
      .withColumn("bucket", Portable.pHash(col("tok")) % buckets)
    val ct = toks.groupBy(col("bucket"))
      .agg(
        sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("ct_t"),
        sum(when(col("source") =!= targetSource, 1L).otherwise(0L)).as("ct_r"))
    def li(c: Column): Column = (length(bin(c + 1)) - 1).cast("long")
    val scored = toks.filter(col("source") =!= targetSource)
      .join(broadcast(ct), "bucket")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(li(col("ct_t")) - li(col("ct_r"))).as("logw_int"))
      .withColumn("avg_logw",
        col("logw_int").cast("double") / col("n_tokens").cast("double"))
    // tokenless raw docs never reach the explode: they carry no
    // evidence either way, so the census counts SCOREABLE docs
    val ranked = graft.functions.Ranks.grouped(
      scored.withColumn("neg_w", -col("avg_logw")),
      Nil, Seq("neg_w", "doc_id"))
    ranked
      .withColumn("kept",
        col("rank") <= expr(s"(grp_total * $selPct + 99) DIV 100"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L))
          .as("selected_tokens"),
        sum(col("logw_int")).as("sum_logw_int"),
        sum(when(col("kept"), col("logw_int")).otherwise(0L))
          .as("selected_logw_int"))
      .withColumn("selected_share",
        col("n_selected").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }
}
