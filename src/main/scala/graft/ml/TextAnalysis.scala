package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Text-analysis operators for a training-data pipeline (SURVEY.md
  * §2C): token/char counting, document fingerprinting, quality
  * scoring, and a marker-based language-ID heuristic.
  *
  * Everything is a pure column expression over `functions._` — no
  * UDFs, so the DuckDB oracle can recompute every operator exactly
  * and the scalar expressions ride whole-stage codegen (the
  * higher-order array functions — aggregate/filter/transform/
  * zip_with — evaluate on Catalyst's interpreted path, but stay
  * per-row column-local: no row-by-row JVM⇄interpreter boundary like
  * a UDF, and no effect on the shuffle-free plan shape). Ratios are
  * computed as a single double division over exact integer counts,
  * which is bit-identical across engines (IEEE-754 division is
  * correctly rounded everywhere).
  *
  * At 100 TB these are embarrassingly parallel map-only transforms:
  * no shuffle, no state — they scale with input splits.
  */
object TextAnalysis {

  /** Normalized token array of a text column. Empty tokens are
    * removed: `split` on empty/whitespace-only text yields `['']`
    * in both engines, and without the removal every counting
    * operator reports one phantom token per blank document and the
    * empty string enters the corpus vocabulary. `array_remove` (a
    * codegen'd collection expression), NOT a `filter` lambda — the
    * interpreted-lambda variant measured +60% on the
    * quality-gate query (tokens() is the hottest expression in the
    * text family).
    */
  def tokens(text: Column): Column =
    array_remove(split(Portable.normText(text), " "), "")

  def duckTokens(x: String): String =
    s"list_filter(string_split(${Portable.duckNormText(x)}, ' '), t -> t <> '')"

  /** BPE-ish subword pattern: greedy runs of up to 4 letters or a
    * digit run — a stand-in for byte-pair pieces that both engines'
    * regex engines count identically.
    */
  val SubtokenPattern = "[a-z]{1,4}|[0-9]+"

  /** Mean token length; 0.0 for a tokenless doc (0/0 would be NaN).
    * ONE definition shared by [[tokenCounts]] and [[quality]] — the
    * oracle-parity design needs the two sites bit-identical, so they
    * must not be separate copies that can drift.
    */
  private def avgTokenLen(t: Column): Column =
    when(size(t) > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double")
        / size(t).cast("double"))
      .otherwise(lit(0.0))

  /** Token + char counting: the "how big is this document really"
    * pass every corpus pipeline runs first. `n_subtokens` adds the
    * BPE-ish piece count (whitespace tokens alone under-estimate
    * model token budgets).
    */
  def tokenCounts(df: DataFrame, text: Column): DataFrame = {
    // tokenize once into a real column (see quality's rationale)
    val t = col("_toks")
    df.withColumn("_toks", tokens(text))
      .withColumn("n_chars", length(text).cast("long"))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(t)).cast("long"))
      .withColumn("n_subtokens",
        regexp_count(Portable.normText(text), lit(SubtokenPattern)).cast("long"))
      .withColumn("avg_token_len", avgTokenLen(t))
      .drop("_toks")
  }

  /** Document fingerprint: md5 of canonicalized text (exact-dup key)
    * plus the 60-bit portable hash used for sharding/bucketing.
    */
  def fingerprint(df: DataFrame, text: Column): DataFrame =
    df.withColumn("fp", md5(Portable.normText(text)))
      .withColumn("fp60", Portable.pHash(Portable.normText(text)))

  /** Winnowing-style rolling fingerprint: the minimum 60-bit hash
    * over the document's word n-gram windows (the min-sampled variant
    * of a rolling-hash fingerprint — stable under content shifts,
    * unlike the whole-document hash).
    */
  def rollingFingerprint(docs: DataFrame): DataFrame =
    Dedup.shingles(docs)
      .select(col("doc_id"), Portable.pHashPair(col("shingle"))._1.as("h1"))
      .groupBy(col("doc_id")).agg(min(col("h1")).as("fp_roll"))

  /** Vocabulary statistics: per token, document frequency (docs
    * containing it) and total term frequency — the exact integer
    * core of TF-IDF (the idf log is left to the caller: float logs
    * aren't reproducible across engines, counts are). One explode +
    * one aggregation; output cardinality = vocabulary size.
    */
  def termStats(docs: DataFrame, text: Column): DataFrame =
    docs.select(col("doc_id"), explode(tokens(text)).as("tok"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"),
        count(lit(1)).as("term_freq"))

  /** Heavy hitters: top-k terms per group (source) by exact term
    * frequency, deterministic tie-break on the token itself.
    *
    * Scale shape: explode → partial-aggregated groupBy(group, tok)
    * (map-side combine collapses each split's duplicates before the
    * shuffle) → per-group ranked window over the vocabulary. The
    * window partitions by the group key, so no global sort; output
    * cardinality = k × #groups. At 100 TB the exact count is still
    * the right first choice — vocabulary cardinality, not corpus
    * size, bounds the shuffle (Zipf keeps it small); a count-min
    * sketch only wins when even the vocabulary doesn't fit.
    */
  def topKTerms(docs: DataFrame, group: Column, text: Column, k: Int): DataFrame = {
    val tf = docs.select(group.as("group_key"), explode(tokens(text)).as("tok"))
      .groupBy(col("group_key"), col("tok"))
      .agg(count(lit(1)).as("term_freq"))
    val w = Window.partitionBy(col("group_key"))
      .orderBy(col("term_freq").desc, col("tok"))
    tf.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Per-language stopword marker sets (classic stopword-list
    * language ID — the fastText-free heuristic). Deterministic
    * alphabetical tie-break on equal scores.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "了", "在", "是", "我"))

  /** The English marker set — also the stopword basis of the quality
    * score and its oracles (one definition, so langId and quality
    * can't silently diverge).
    */
  val EnStopwords: Seq[String] = markers.toMap.apply("en")

  private def markerCount(t: Column, words: Seq[String]): Column =
    size(filter(t, x => x.isin(words.map(lit): _*))).cast("long")

  /** Language ID: argmax of marker counts, alphabetical tie-break
    * (langs are pre-sorted in `markers`, so a running strictly-greater
    * comparison implements it). Zero marker hits in EVERY language —
    * code, an unlisted language, a blank doc — abstains with 'und'
    * (ISO 639 undetermined) instead of silently labeling the doc
    * with the alphabetically-first language.
    */
  def langId(df: DataFrame, text: Column): DataFrame = {
    val t = tokens(text)
    val scored = markers.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang", markerCount(t, words))
    }
    scored.withColumn("pred_lang",
      predFromScores(l => col(s"score_$l")))
  }

  /** The [[langId]] argmax (first-alphabetical winner on ties,
    * 'und' abstention on zero total) as a pure expression over the
    * per-language score columns — shared with [[langConsistency]],
    * which evaluates it on several token slices of one document.
    */
  private def predFromScores(score: String => Column): Column = {
    val pred = markers.tail.foldLeft(
      (lit(markers.head._1), score(markers.head._1))) {
      case ((bestLang, bestScore), (lang, _)) =>
        val s = score(lang)
        (when(s > bestScore, lit(lang)).otherwise(bestLang),
          when(s > bestScore, s).otherwise(bestScore))
    }
    val total = markers.map { case (lang, _) => score(lang) }
      .reduce(_ + _)
    when(total === 0, lit("und")).otherwise(pred._1)
  }

  /** Code-switching / concatenation-artifact detector: language-ID
    * the FULL document and each HALF of its token stream
    * independently, and flag docs whose halves disagree. A scraped
    * page that glues an English navigation chrome onto a German
    * article (or a crawl record that concatenated two documents)
    * language-IDs cleanly as a whole — its halves don't. The routing
    * consumers (`corpus_ccnet_buckets`' per-language LM, the
    * per-language quality gates) silently mis-score exactly these
    * docs, so a curation pipeline quarantines them rather than
    * trusting the whole-doc label.
    *
    * Halves split the TOKEN stream at ⌊n/2⌋ (a char split could cut
    * a word in two and hand the engines different token sets); a
    * half with no marker hits abstains with 'und', and 'und' halves
    * count as disagreement only against a CONTRARY label ('und' vs
    * 'en' means "no evidence", not "other language" — the verdict
    * is 'mixed' only when both halves carry evidence and disagree,
    * 'thin' when either half abstains but the doc as a whole has a
    * label, 'consistent' otherwise).
    *
    * Scale shape: map-only — tokens, two slices, three argmax
    * expressions, all inside one codegen'd projection; zero
    * shuffles before the presentation sort. Output one row per doc.
    */
  def langConsistency(docs: DataFrame, text: Column): DataFrame = {
    val t = tokens(text)
    val n = size(t)
    // Column./ is DOUBLE division — ⌊n/2⌋ must be an explicit floor,
    // or h2's length (n − n/2) truncates 2.5 → 2 and odd-length docs
    // silently lose their last token
    val k = floor(n / 2).cast("int")
    val h1 = slice(t, lit(1), k)
    val h2 = slice(t, k + 1, n - k)
    val base = markers.foldLeft(docs) { case (d, (lang, words)) =>
      d.withColumn(s"s_full_$lang", markerCount(t, words))
        .withColumn(s"s_h1_$lang", markerCount(h1, words))
        .withColumn(s"s_h2_$lang", markerCount(h2, words))
    }
    base
      .withColumn("pred_full", predFromScores(l => col(s"s_full_$l")))
      .withColumn("pred_h1", predFromScores(l => col(s"s_h1_$l")))
      .withColumn("pred_h2", predFromScores(l => col(s"s_h2_$l")))
      .withColumn("verdict",
        when(col("pred_h1") =!= "und" && col("pred_h2") =!= "und" &&
          col("pred_h1") =!= col("pred_h2"), "mixed")
          .when(col("pred_full") =!= "und" &&
            (col("pred_h1") === "und" || col("pred_h2") === "und"), "thin")
          .otherwise("consistent"))
      .select(col("doc_id"), col("lang"), col("pred_full"),
        col("pred_h1"), col("pred_h2"), col("verdict"))
  }

  /** Language-router confidence census — the margin audit behind
    * [[langId]]'s argmax: per predicted language, how many docs won
    * by 0 (a TIE — the alphabetical tie-break decided, i.e. the
    * router guessed), by 1, by 2, or by ≥3 marker hits. The
    * zero-margin mass is the honest error bar on every downstream
    * consumer (`text_langid_eval`'s confusion, `corpus_ccnet_buckets`'
    * routing); a healthy corpus concentrates in the ≥3 bucket.
    * Margin = top score − second score via an exact integer sort of
    * the 5-score vector; all counts integers, the within-language
    * share one division over the bounded census.
    */
  def langidMargin(docs: DataFrame, text: Column): DataFrame = {
    val scored = langId(docs, text)
    val arr = array_sort(array(
      markers.map { case (l, _) => col(s"score_$l") }: _*))
    val census = scored
      .withColumn("margin",
        element_at(arr, -1) - element_at(arr, -2))
      .withColumn("margin_bucket", least(col("margin"), lit(3L)))
      .groupBy(col("pred_lang"), col("margin_bucket"))
      .agg(count(lit(1)).as("n_docs"))
    census.withColumn("lang_share",
        col("n_docs").cast("double") /
          sum(col("n_docs")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("pred_lang"))).cast("double"))
      .orderBy(col("pred_lang"), col("margin_bucket"))
  }

  /** Unigram-LM familiarity scoring — the corpus-level half of a
    * perplexity quality filter (CCNet/Gopher-style: score each doc by
    * how probable its tokens are under a language model trained on
    * the corpus itself; low familiarity ≈ high perplexity ≈ noise).
    *
    * The log-likelihood is deliberately decomposed into EXACT integer
    * aggregates — Σ tf(t), Σ ⌊log2 tf(t)⌋ (computed as
    * length(bin(tf))-1, exact in both engines), hapax count — with
    * one final double division each, because a float Σ log p(t) is
    * not reproducible across engines (libm vs java.lang.Math last-ulp
    * differences, plus order-dependent double summation). ⌊log2 tf⌋
    * is the integer-rounded self-information, so avg_log2_tf is a
    * monotone stand-in for negative cross-entropy; callers wanting
    * nats/exact perplexity can apply their own smoothing downstream.
    *
    * Scale shape: one explode + vocabulary aggregate (map-side
    * partial; Zipf bounds the vocab, not the corpus), a join of
    * tokens against the vocab on the term key (threshold-broadcast
    * while the vocab is small, co-partitioned shuffle once a 100 TB
    * corpus's vocabulary outgrows the driver — no forced hint), and
    * one per-doc aggregate. */
  def unigramLm(docs: DataFrame, text: Column): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(text)).as("tok"))
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val scores = toks.join(tf, "tok")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("tf")).as("sum_tf"),
        sum((length(bin(col("tf"))) - 1).cast("long")).as("sum_log2_tf"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
    // left join from the corpus: explode emits nothing for a
    // tokenless doc, and absence reads as "unscored" downstream —
    // keep the doc with zero counts and NULL (undefined) averages
    docs.select(col("doc_id")).join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_tf"), lit(0L)).as("sum_tf"),
        coalesce(col("sum_log2_tf"), lit(0L)).as("sum_log2_tf"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
      .withColumn("avg_tf",
        col("sum_tf").cast("double") / nullif(col("n_tokens"), lit(0L)).cast("double"))
      .withColumn("avg_log2_tf",
        col("sum_log2_tf").cast("double") / nullif(col("n_tokens"), lit(0L)).cast("double"))
  }

  /** Per-document keyword: the term maximizing tf · ⌊log2(N ÷ df)⌋ —
    * a TF-IDF argmax whose idf is the exact integer self-information
    * (same ⌊log2⌋-via-bin trick as [[unigramLm]]), so both engines
    * score and tie-break identically (score desc, tf desc, term asc).
    *
    * Scale shape: tf is one shuffle on (doc, term); df aggregates the
    * tf relation on term (vocabulary-bounded output) and joins back on
    * the SAME term key (co-partitioned, no extra exchange at scale);
    * the argmax is a per-doc window over one shuffle on doc_id. N is a
    * 1-row broadcast. Nothing is ever doc × vocabulary.
    */
  def keywords(docs: DataFrame, text: Column): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(text)).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tf").desc, col("tok"))
    val best = tf.join(df, "tok")
      .crossJoin(broadcast(n))
      // integer floor division (expr "div"), NOT double /: the double
      // quotient rounds and its truncation can disagree with exact
      // floor at corpus scale
      .withColumn("idf_int",
        (length(bin(expr("n_docs div df"))) - 1).cast("long"))
      .withColumn("score", col("tf") * col("idf_int"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("tok").as("keyword"),
        col("tf"), col("df"), col("score"))
    // keep tokenless docs with a NULL keyword (absence would read as
    // "unscored" downstream — same contract as unigramLm)
    docs.select(col("doc_id")).join(best, Seq("doc_id"), "left")
  }

  // --- PII scrubbing ----------------------------------------------

  /** RE2-compatible patterns (no lookarounds/backrefs), so the Spark
    * (java.util.regex) and DuckDB (RE2) engines match identically on
    * ASCII text.
    */
  // (?i): emails are case-insensitive on the wire; both engines'
  // regex dialects support the inline flag, preserving parity
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  val IdRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** PII scrub: count and redact email / phone / SSN-shaped spans —
    * the compliance pass a corpus pipeline runs before anything else
    * ships. Redaction applies email → id → phone (the digit patterns
    * are mutually exclusive — 3-2-4 vs 3-3-4 groups — so the order
    * cannot cascade between them). Each count runs on the text AS OF
    * its own redaction stage, so counts equal the markers inserted:
    * counting on the original text would tally a phone-shaped span
    * inside an email address that the email replacement then
    * swallows, and an auditor cross-checking counts against markers
    * would see a mismatch. Pure codegen'd column expressions:
    * map-only, no shuffle, scales with input splits.
    */
  def piiScrub(df: DataFrame, text: Column): DataFrame = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterId = regexp_replace(afterEmail, IdRe, "<ID>")
    df.withColumn("n_emails", regexp_count(text, lit(EmailRe)).cast("long"))
      .withColumn("n_ids", regexp_count(afterEmail, lit(IdRe)).cast("long"))
      .withColumn("n_phones", regexp_count(afterId, lit(PhoneRe)).cast("long"))
      .withColumn("redacted", regexp_replace(afterId, PhoneRe, "<PHONE>"))
  }

  // --- Repetition signals ------------------------------------------

  /** Gopher-style within-document repetition signals: duplicate-word
    * fraction, most-common-word fraction, and duplicate-bigram
    * fraction — the "is this doc just the same phrase looping" gate
    * that runs right after quality scoring in a corpus pipeline.
    *
    * Everything is a higher-order array expression over the token
    * array (distinct/size for uniques, zip_with of two slices for
    * bigrams, a transform+filter scan for the top frequency) — pure
    * map-only codegen, NO shuffle, so at 100 TB it rides the scan. The
    * top-frequency scan is O(distinct × n) per doc, bounded by the
    * per-doc token count, never by corpus size. Ratios divide exact
    * integers once in double, which both engines round identically.
    */
  def repetition(df: DataFrame, text: Column): DataFrame = {
    // tokenize once into a real column (see quality's rationale)
    val t = col("_toks")
    val nW = size(t).cast("long")
    val nD = size(array_distinct(t)).cast("long")
    val topF = array_max(transform(array_distinct(t),
      x => size(filter(t, y => y === x)))).cast("long")
    val bigrams = zip_with(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    df.withColumn("_toks", tokens(text))
      .withColumn("n_words", nW)
      .withColumn("n_distinct", nD)
      // coalesce: array_max over a tokenless doc's empty array is
      // null; the word ratios guard the matching 0/0
      .withColumn("top_freq", coalesce(topF, lit(0L)))
      .withColumn("n_bigrams", size(bigrams).cast("long"))
      .withColumn("n_distinct_bigrams", size(array_distinct(bigrams)).cast("long"))
      .withColumn("dup_word_ratio",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          (col("n_words") - col("n_distinct")).cast("double") /
            col("n_words").cast("double")))
      .withColumn("top_word_ratio",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          col("top_freq").cast("double") / col("n_words").cast("double")))
      .withColumn("dup_bigram_ratio",
        when(col("n_bigrams") === 0, lit(0.0)).otherwise(
          (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
            col("n_bigrams").cast("double")))
      .drop("_toks")
  }

  /** Quality score: the usual cheap corpus-filter features — doc
    * length, mean token length, stopword ratio — combined with fixed
    * weights into a single score. Weights match the oracle verbatim;
    * the expression tree shape is identical so doubles agree bitwise.
    */
  def quality(df: DataFrame, text: Column): DataFrame = {
    // tokenize ONCE into a real column: every ratio below references
    // the array several times, and as an inline expression each
    // reference would re-run normalize+split+filter per row
    // (CollapseProject keeps a multiply-referenced non-cheap alias
    // in its own projection, so this evaluates once)
    val t = col("_toks")
    val nTok = size(t).cast("long")
    val stop = markerCount(t, EnStopwords)
    df.withColumn("_toks", tokens(text))
      .withColumn("n_tokens", nTok)
      .withColumn("stop_ratio",
        when(nTok > 0, stop.cast("double") / nTok.cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("avg_token_len", avgTokenLen(t))
      // a tokenless doc is the worst document, not a 0.3-scorer (the
      // stopword term rewards stop_ratio 0, which an empty doc gets
      // vacuously)
      .withColumn("quality_score",
        when(nTok === 0, lit(0.0)).otherwise(
          lit(0.4) * least(nTok.cast("double") / lit(64.0), lit(1.0)) +
            lit(0.3) * (lit(1.0) - col("stop_ratio")) +
            lit(0.3) * least(col("avg_token_len") / lit(8.0), lit(1.0))))
      .drop("_toks")
  }

  /** Bigram language-model score per document: each in-doc bigram's
    * "surprise" under the corpus MLE P(w2|w1) = bf(w1w2)/uf(w1),
    * carried as the EXACT integer ⌊log2(uf div bf)⌋ (bin-length
    * trick, same as [[keywords]]' idf) so both engines sum the same
    * longs — the double division happens once per doc at the end. A
    * high avg_surprise marks text whose word order the corpus can't
    * predict (gibberish or genuinely novel prose); n_novel counts
    * corpus-unique bigrams, the [[unigramLm]] hapax notion one order
    * up.
    *
    * Scale shape: unigram and bigram frequency tables are vocabulary-
    * bounded aggregates of the token stream; bf joins uf on w1 BEFORE
    * the stream-side join, so the big bigram relation joins once
    * against one (w1,w2)-keyed table co-partitioned with its own
    * grouping. Tokenless/1-token docs survive via the final left join
    * with zero counts and NULL (undefined) avg — same contract as
    * [[unigramLm]].
    */
  def bigramLm(docs: DataFrame, text: Column): DataFrame = {
    // the token arrays feed three consumers (unigram table, bigram
    // grouping, bigram join side) — deliberately NOT materialized:
    // the stream is corpus-sized, caching it writes a corpus-sized
    // store while avoiding no shuffle (each consumer shuffles on its
    // own key regardless), and re-tokenizing is map-only CPU on the
    // scan. Measured locally: caching was +83% (0.51 vs 0.28 s at
    // sf0.1). Contrast sourceOverlap/typeCooccurrence, which cache
    // REDUCED relations to avoid repeating a distinct shuffle.
    val toks = docs.select(col("doc_id"), tokens(text).as("toks"))
    val uni = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
    val bi = toks.select(col("doc_id"), explode(
        when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2), i =>
            struct(element_at(col("toks"), i + 1).as("w1"),
              element_at(col("toks"), i + 2).as("w2"))))
          .otherwise(array())).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uf = uni.groupBy(col("tok").as("w1")).agg(count(lit(1)).as("uf"))
    val bf = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bf"))
      .join(uf, "w1")
      .withColumn("surprise",
        (length(bin(expr("uf div bf"))) - 1).cast("long"))
    val scores = bi.join(bf, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("bf") === 1, 1L).otherwise(0L)).as("n_novel"),
        sum(col("bf")).as("sum_bf"),
        sum(col("surprise")).as("sum_surprise"))
    docs.select(col("doc_id")).join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(col("sum_bf"), lit(0L)).as("sum_bf"),
        coalesce(col("sum_surprise"), lit(0L)).as("sum_surprise"))
      .withColumn("avg_surprise",
        col("sum_surprise").cast("double") /
          nullif(col("n_bigrams"), lit(0L)).cast("double"))
  }

  /** Held-out LM evaluation: train the corpus unigram model on the
    * deterministic TRAIN split only ([[Corpus.splitAssigned]] — the
    * same (source, doc_id) hash gate the rest of the library splits
    * by) and score the held-out val+test halves per source:
    * out-of-vocabulary rate plus the exact-integer ⌊log2(N/tf)⌋
    * surprise of in-vocabulary tokens. [[unigramLm]] scores every
    * document under a model trained on EVERYTHING — fine for
    * familiarity ranking, leakage for evaluation; this is the
    * no-leakage number a pipeline quotes as "perplexity on held-out
    * data" when comparing corpus versions.
    *
    * Scale shape: the trained tf table is vocabulary-bounded (one
    * aggregate over the train-half token stream, materialized once —
    * it feeds the scoring join AND the 1-row total); the held-out
    * stream left-joins it on the token key, co-partitioned with tf's
    * own grouping; N is a 1-row broadcast; output |sources| rows —
    * EXPLICITLY: the per-source aggregate is left-joined back onto
    * the distinct source list, so a source whose documents all hash
    * into the train split (or whose held-out docs have zero tokens)
    * still reports a zero row instead of vanishing — "not evaluated"
    * and "evaluated, zero held-out tokens" must stay distinguishable
    * (the explicit-zeros contract of fuzzyDecontaminationScores).
    */
  def heldoutPerplexity(docs: DataFrame, text: Column): DataFrame = {
    val sp = Corpus.splitAssigned(docs).filter(col("split").isNotNull)
    val toks = sp.select(col("source"), col("split"),
      explode(tokens(text)).as("tok"))
    val tf = graft.CacheScope.materialize(
      toks.filter(col("split") === "train")
        .groupBy(col("tok")).agg(count(lit(1)).as("tf")))
    val nTrain = tf.agg(coalesce(sum(col("tf")), lit(0L)).as("n_train"))
    val held = toks.filter(col("split") =!= "train")
      .join(tf, Seq("tok"), "left")
      .crossJoin(broadcast(nTrain))
      .withColumn("surprise",
        when(col("tf").isNotNull,
          (length(bin(expr("n_train div tf"))) - 1).cast("long")))
    val per = held.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("surprise")).as("n_invocab"),
        sum(when(col("tf").isNull, 1L).otherwise(0L)).as("n_oov"),
        coalesce(sum(col("surprise")), lit(0L)).as("sum_surprise"))
    docs.select(col("source")).distinct()
      .join(per, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_invocab"), lit(0L)).as("n_invocab"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("sum_surprise"), lit(0L)).as("sum_surprise"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("avg_surprise",
        when(col("n_invocab") > 0,
          col("sum_surprise").cast("double") /
            col("n_invocab").cast("double")).otherwise(lit(0.0)))
      .select(col("source"), col("n_tokens"), col("n_invocab"),
        col("n_oov"), col("oov_rate"), col("sum_surprise"),
        col("avg_surprise"))
  }

  /** Absolute discount for [[knBigrams]] — 0.75, the canonical
    * Kneser-Ney choice (Chen & Goodman 1999's fixed-discount
    * variant). */
  val KnDiscount = 0.75

  /** Rows the Kneser-Ney census returns. */
  val KnTopK = 20

  /** Interpolated Kneser-Ney bigram model census: the corpus's top
    * [[KnTopK]] bigrams by raw count with every count the smoothed
    * estimate is built from, and the estimate itself —
    *
    *   p_kn(w|v) = (c(vw) − D)/c(v·)
    *             + (D·N1+(v,·)/c(v·)) · (N1+(·,w)/N1+(··))
    *
    * where c(v·) is the context total, N1+(v,·) the distinct
    * followers of v, N1+(·,w) the CONTINUATION count of w (how many
    * distinct contexts w follows — the reason "francisco" scores low
    * even though "san francisco" is frequent), and N1+(··) the
    * distinct bigram types. Next to [[bigramLm]]'s per-document MLE
    * surprise, this is the smoothed-model view a corpus LM (CCNet
    * filtering, contamination scoring) actually uses.
    *
    * Scale shape: ONE vocabulary-bounded bigram-count aggregate is
    * the only corpus-sized shuffle; context/continuation/type tables
    * are aggregates OF that table (materialized once); the total is
    * a broadcast 1-row cross join; the top-k cut is a distributed
    * TakeOrderedAndProject (per-partition top-k, never a full sort),
    * totally ordered by (count desc, w1, w2).
    */
  def knBigrams(docs: DataFrame, text: Column): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(text).as("toks"))
    val bi = toks.select(explode(
        when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2), i =>
            struct(element_at(col("toks"), i + 1).as("w1"),
              element_at(col("toks"), i + 2).as("w2"))))
          .otherwise(array())).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bf = graft.CacheScope.materialize(
      bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_vw")))
    val ctx = bf.groupBy(col("w1"))
      .agg(sum(col("c_vw")).as("c_v"), count(lit(1)).as("n1p_follow"))
    val prec = bf.groupBy(col("w2")).agg(count(lit(1)).as("n1p_prec"))
    val tot = bf.agg(count(lit(1)).as("n1p_total"))
    val d = KnDiscount
    bf.join(ctx, "w1").join(prec, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c_vw"), col("c_v"),
        col("n1p_follow"), col("n1p_prec"), col("n1p_total"),
        (((col("c_vw").cast("double") - lit(d)) / col("c_v").cast("double")) +
          ((lit(d) * col("n1p_follow").cast("double") /
            col("c_v").cast("double")) *
            (col("n1p_prec").cast("double") / col("n1p_total").cast("double"))))
          .as("p_kn"))
      .orderBy(col("c_vw").desc, col("w1"), col("w2"))
      .limit(KnTopK)
  }

  /** The CCNet-style perplexity gate [[unigramLm]] exists to feed:
    * rank every doc by LM familiarity (avg_log2_tf — one double
    * division of exact integer aggregates, so the score and therefore
    * the order is bit-identical cross-engine) and drop the least
    * familiar `dropPct` percent. Tokenless docs score -1.0 (< any
    * real score ≥ 0) so "unscored" deterministically sorts into the
    * dropped band instead of riding an engine-specific NULL order.
    * `kept = pos > ⌈n·dropPct/100⌉` — a pure rank cut, no float
    * threshold comparison anywhere.
    *
    * Scale shape: scoring is [[unigramLm]]'s two shuffles; the global
    * rank is the same two-phase scheme as `corpus_shuffle` (range-
    * partition by (score, doc_id), per-partition row_number, start
    * offsets from a |partitions|-row broadcast prefix sum) — the only
    * global window runs over the tiny offsets relation, never the
    * corpus; the cut rank comes from a 1-row broadcast total.
    */
  def perplexityFilter(docs: DataFrame, text: Column, dropPct: Int = 25): DataFrame = {
    val lm = unigramLm(docs, text)
      .withColumn("score", coalesce(col("avg_log2_tf"), lit(-1.0)))
      .select(col("doc_id"), col("n_tokens"), col("avg_log2_tf"), col("score"))
    // the two-phase global rank lives in functions/Ranks (one
    // implementation, one materialize-before-offsets contract);
    // grp_total doubles as the n_docs the cut rank derives from
    graft.functions.Ranks.grouped(lm, Nil, Seq("score", "doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("avg_log2_tf"),
        col("rank").as("pos"),
        (col("rank") > expr(s"(grp_total * $dropPct + 99) DIV 100"))
          .as("kept"))
  }

  /** CCNet-style language × perplexity bucketing — the corpus
    * triage table the CCNet pipeline ships: per PREDICTED language,
    * docs split into head/middle/tail tertiles by LM familiarity
    * (head = most familiar = lowest perplexity, the band CCNet
    * keeps for pretraining; tail = the band it drops or routes to
    * heavier filtering). Composes [[langId]] (the routing key — a
    * per-language LM must not be asked to judge another language's
    * text) with [[unigramLm]]'s familiarity score; tokenless docs
    * score −1.0 and land deterministically in the tail.
    *
    * Buckets are SQL-NTILE(3) semantics over the exact (score desc,
    * doc_id) order per language — a pure rank cut (the
    * perplexityFilter contract: no float threshold, ties impossible
    * by doc_id), so both engines cut identically.
    *
    * Scale shape: scoring is unigramLm's vocabulary-bounded
    * shuffles; langId is map-only; the per-language rank is the
    * two-phase [[graft.functions.Ranks.grouped]] (no language ever
    * collapses to one task — 'en' at 100 TB is billions of rows);
    * output is ≤ |langs|·3 census rows.
    */
  def ccnetBuckets(docs: DataFrame, text: Column): DataFrame = {
    val lm = unigramLm(docs, text)
      .withColumn("score", coalesce(col("avg_log2_tf"), lit(-1.0)))
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val lang = langId(docs, text).select(col("doc_id"), col("pred_lang"))
    val scored = lm.join(lang, "doc_id")
      .withColumn("neg_score", -col("score"))
    graft.functions.Ranks.grouped(
        scored, Seq("pred_lang"), Seq("neg_score", "doc_id"))
      .withColumn("bucket",
        expr(graft.functions.Ranks.ntileExpr("rank", "grp_total", 3))
          .cast("long"))
      .groupBy(col("pred_lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .select(col("pred_lang"), col("bucket"),
        when(col("bucket") === 1L, "head")
          .when(col("bucket") === 2L, "middle")
          .otherwise("tail").as("bucket_name"),
        col("n_docs"), col("n_tokens"), col("min_score"), col("max_score"))
      .orderBy(col("pred_lang"), col("bucket"))
  }

  /** Term-distribution drift between the corpus's two ingestion
    * epochs (first/second half of the doc-id range — the
    * embed_epoch_drift convention, applied to text): per term the
    * epoch counts and the cross-normalized integer distance
    * |c0·N1 − c1·N0| (zero iff the term's share is identical in both
    * epochs; scale-free without a single division). Top 20 drifted
    * terms — the "what changed in this crawl" monitor run before new
    * data joins training.
    *
    * Scale shape: epoch bounds are a 1-row broadcast; term×epoch
    * counts reduce on the vocabulary (map-side combined); totals are
    * a second 1-row broadcast; top-k is a TakeOrderedAndProject. The
    * int64 cross-product is exact out to ~10⁹-count terms against
    * 10⁹-token epochs; past that, compare per-mille shares instead.
    */
  def termDrift(docs: DataFrame, topK: Int = 20): DataFrame = {
    val bounds = docs.agg(
      expr("(min(doc_id) + max(doc_id)) div 2").as("mid"))
    val tc = docs.crossJoin(broadcast(bounds))
      .select(when(col("doc_id") <= col("mid"), 0L).otherwise(1L).as("epoch"),
        explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("epoch") === 0L, 1L).otherwise(0L)).as("c0"),
        sum(when(col("epoch") === 1L, 1L).otherwise(0L)).as("c1"))
    val totals = tc.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
    tc.crossJoin(broadcast(totals))
      .withColumn("drift", abs(col("c0") * col("n1") - col("c1") * col("n0")))
      .select(col("tok"), col("c0"), col("c1"), col("drift"))
      .orderBy(col("drift").desc, col("tok"))
      .limit(topK)
  }

  val TfidfDim = 64
  val TfidfProbes = 8
  val TfidfTopK = 5

  /** Text similarity search WITHOUT embeddings: cosine top-k over
    * feature-hashed TF-IDF vectors. Each document becomes a
    * `TfidfDim`-component integer vector — token counts weighted by
    * the exact ⌊log2(N/df)⌋ idf (the [[keywords]] bin-length trick)
    * and feature-hashed by the portable hash — and the probe docs
    * rank the corpus by exact integer-dot cosine. The lexical twin
    * of `sim_topk_bruteforce`: what retrieval looks like before an
    * encoder exists, and the sanity baseline an embedding index is
    * graded against.
    *
    * Scale shape: tf/df are vocabulary-bounded reduces; the hashed
    * relation is |docs|·dim SPARSE (only occupied components);
    * probes broadcast as ≤probes·dim rows and the dot is one
    * component equi-join + reduce — the corpus relation shuffles
    * once on (doc, component), never doc×doc.
    */
  def tfidfTopK(docs: DataFrame, dim: Int = TfidfDim): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val flat = graft.CacheScope.materialize(tf.join(dfRel, "tok")
      .crossJoin(broadcast(n))
      // +1-smoothed idf (weight = bin-length of N div df, >= 1): the
      // unsmoothed floor-log zeroes every common token, and on a
      // small-vocabulary corpus that zeroes whole documents
      .withColumn("w", col("tf") * length(bin(expr("n_docs div df"))))
      .groupBy(col("doc_id"),
        pmod(Portable.pHash(col("tok")), lit(dim.toLong)).as("i"))
      .agg(sum(col("w")).as("v")))
    val norms = flat.groupBy(col("doc_id")).agg(sum(col("v") * col("v")).as("n2"))
    val pf = broadcast(flat.filter(col("doc_id") < TfidfProbes)
      .select(col("doc_id").as("probe_id"), col("i"), col("v").as("pv")))
    val d = flat.join(pf, "i")
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(sum(col("v") * col("pv")).as("dot"))
    val scored = d
      .join(broadcast(norms.select(col("doc_id").as("probe_id"),
        col("n2").as("n2p")).filter(col("probe_id") < TfidfProbes)), "probe_id")
      .join(norms, "doc_id")
      .filter(col("n2p") > 0 && col("n2") > 0)
      .withColumn("cos_sim", graft.ml.Vectors.cosine(col("dot"), col("n2p"), col("n2")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TfidfTopK)
      .select(col("probe_id"), col("doc_id").as("neighbor_id"),
        col("cos_sim"), col("rk"))
      .orderBy(col("probe_id"), col("rk"))
  }

  /** BPE first-iteration pair statistics: adjacent character-pair
    * frequencies over the corpus vocabulary, weighted by token
    * frequency — the count a byte-pair-encoding trainer computes to
    * pick its first merge (each further merge repeats this census
    * over the rewritten vocabulary). Top `topK` pairs, deterministic
    * (count desc, pair) order.
    *
    * Scale shape: token counting is the standard vocabulary-bounded
    * reduce (map-side combined); the pair fan-out then runs over the
    * DISTINCT vocabulary, not the corpus — a token contributes its
    * |token|−1 positions once, scaled by its count — so the second
    * shuffle is bounded by alphabet², and the top-k is a
    * TakeOrderedAndProject (per-partition heaps), never a global
    * sort.
    */
  def bpePairStats(docs: DataFrame, text: Column, topK: Int = 50): DataFrame =
    docs.select(explode(tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_tok"))
      .filter(char_length(col("token")) >= 2)
      .select(col("token"), col("n_tok"), explode(expr(
        "transform(sequence(1, char_length(token) - 1)," +
          " i -> substring(token, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("n_tok")).as("pair_count"),
        countDistinct(col("token")).as("n_token_types"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topK)

  /** BPE trainer: iterate the merge loop [[bpePairStats]] computes one
    * census of — `nMerges` rounds, each picking the most frequent
    * adjacent symbol pair over the corpus vocabulary (count desc,
    * pair asc tie-break) and contracting it in every token before the
    * next census. Output: one row per round with the merged pair and
    * its count — the actual (deterministic) merge table a tokenizer
    * would ship.
    *
    * Representation: each vocabulary token is held as its symbol
    * sequence in delimited form `(s1)(s2)…(sn)` — training is
    * restricted to `^[a-z]+$` tokens so the delimiters can never
    * collide with symbol content. The round's contraction is then a
    * plain non-overlapping left-to-right `replace` of `(a)(b)` with
    * `(ab)` — exactly BPE's greedy merge scan, because the closed
    * delimiters make occurrences non-adjacent ( `(a)(a)(a)(a)` under
    * pair (a,a) → `(aa)(aa)`, never sharing a boundary char ) — and
    * the SAME string primitive the oracle replays.
    *
    * Scale shape: the census is vocabulary-bounded (a token
    * contributes its |token|−1 positions once, scaled by its corpus
    * count — the [[bpePairStats]] argument), so every round shuffles
    * |vocab| rows at most; the corpus-sized reduce happens once, up
    * front, and is cached across rounds. The per-round driver step is
    * a documented 1-row collect (the argmax merge decision — the
    * k-means-update pattern); all rewriting stays distributed.
    */
  def bpeTrain(docs: DataFrame, text: Column, nMerges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainBpe(docs, text, nMerges)._2
      .toDF("round", "left_sym", "right_sym", "merged", "pair_count")
      .orderBy(col("round"))
  }

  /** Shared trainer core: the merged-vocabulary relation
    * (tok, w = delimited symbols, n = corpus count) after `nMerges`
    * rounds, plus the merge table rows, plus the CACHED pre-merge
    * census the loop rewrote (so [[bpeCompressionCurve]] can replay
    * intermediate states without a second corpus reduce).
    * [[bpeTrain]] reports the table; [[bpeEncode]] applies the
    * vocabulary.
    */
  private def trainBpe(
      docs: DataFrame,
      text: Column,
      nMerges: Int)
    : (DataFrame, Seq[(Long, String, String, String, Long)], DataFrame) = {
    val base = graft.CacheScope.materialize(
      docs.select(explode(tokens(text)).as("tok"))
        .filter(col("tok").rlike("^[a-z]+$"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .select(col("tok"),
          regexp_replace(col("tok"), "(.)", "($1)").as("w"), col("n")))
    var vocab = base
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (round <- 1 to nMerges) {
      val top = vocab
        .select(col("n"),
          split(expr("substring(w, 2, char_length(w) - 2)"), "\\)\\(").as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(sy) - 1)," +
            " i -> concat('(', element_at(sy, i), ')(', element_at(sy, i + 1), ')'))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect()
      if (top.nonEmpty) {
        val pair = top(0).getAs[String]("pair")
        val cnt = top(0).getAs[Long]("cnt")
        val inner = pair.substring(1, pair.length - 1).split("\\)\\(")
        merges += ((round.toLong, inner(0), inner(1), inner(0) + inner(1), cnt))
        vocab = vocab.select(col("tok"),
          regexp_replace(col("w"), java.util.regex.Pattern.quote(pair),
            java.util.regex.Matcher.quoteReplacement(s"(${inner(0)}${inner(1)})"))
            .as("w"),
          col("n"))
      }
    }
    (vocab, merges.result(), base)
  }

  /** Tokenizer application — the payoff of [[bpeTrain]]: encode the
    * corpus with the learned merge table and report the compression
    * profile per source (pieces per token, chars per piece — the
    * numbers that decide whether N merges is enough vocabulary).
    * Trained `^[a-z]+$` tokens cost their merged symbol count;
    * everything else falls back to one piece per character (the
    * byte-fallback convention).
    *
    * Scale shape: the corpus reduces ONCE to (source, token) counts
    * (map-side combined, vocabulary-bounded), the trained vocabulary
    * joins on the token key (vocabulary-sized build side), and the
    * per-source rollup is |sources| rows. The corpus is never
    * re-tokenized per merge — all 8 rewrites happened on the
    * vocabulary relation during training.
    */
  def bpeEncode(docs: DataFrame, text: Column, nMerges: Int = 8): DataFrame = {
    val (vocab, _, _) = trainBpe(docs, text, nMerges)
    val nSym = vocab.select(col("tok"),
      size(split(expr("substring(w, 2, char_length(w) - 2)"), "\\)\\("))
        .cast("long").as("n_sym"))
    val tokCounts = docs
      .select(col("source"), explode(tokens(text)).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    tokCounts.join(nSym, Seq("tok"), "left")
      .select(col("source"), col("cnt"),
        char_length(col("tok")).cast("long").as("n_chars"),
        coalesce(col("n_sym"), char_length(col("tok")).cast("long"))
          .as("pieces"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("pieces")).as("n_pieces"),
        sum(col("cnt") * col("n_chars")).as("n_chars"))
      .join(broadcast(nDocs), "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_pieces"), col("n_chars"),
        (col("n_pieces").cast("double") / col("n_tokens").cast("double"))
          .as("pieces_per_token"),
        (col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("chars_per_piece"))
      .orderBy(col("source"))
  }

  /** Tokenizer fertility per PREDICTED language — the multilingual
    * tax gauge: pieces per word under the corpus-trained merge table,
    * keyed by [[langId]]'s routing instead of [[bpeEncode]]'s source.
    * A tokenizer trained on an English-dominant census spends its
    * merges on English pairs, so other languages tokenize into more
    * pieces per word — this table is the per-language cost report
    * (the reason production tokenizers train on a language-balanced
    * sample), read next to `text_bpe_compression`'s budget curve.
    *
    * Scale shape: identical to [[bpeEncode]] — the corpus reduces
    * once to (lang, token) counts (vocabulary-bounded per language),
    * the trained vocabulary joins on the token key; langId is a
    * map-only projection on the same scan. Output ≤ |langs|+1 rows.
    */
  def bpeFertility(docs: DataFrame, text: Column, nMerges: Int = 8): DataFrame = {
    val (vocab, _, _) = trainBpe(docs, text, nMerges)
    val nSym = vocab.select(col("tok"),
      size(split(expr("substring(w, 2, char_length(w) - 2)"), "\\)\\("))
        .cast("long").as("n_sym"))
    val lang = langId(docs, text).select(col("doc_id"), col("pred_lang"))
    val tokCounts = docs
      .select(col("doc_id"), explode(tokens(text)).as("tok"))
      .join(lang, "doc_id")
      .groupBy(col("pred_lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val nDocs = lang.groupBy(col("pred_lang")).agg(count(lit(1)).as("n_docs"))
    tokCounts.join(nSym, Seq("tok"), "left")
      .select(col("pred_lang"), col("cnt"),
        char_length(col("tok")).cast("long").as("n_chars"),
        coalesce(col("n_sym"), char_length(col("tok")).cast("long"))
          .as("pieces"))
      .groupBy(col("pred_lang"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("pieces")).as("n_pieces"),
        sum(col("cnt") * col("n_chars")).as("n_chars"))
      .join(broadcast(nDocs), "pred_lang")
      .select(col("pred_lang"), col("n_docs"), col("n_tokens"),
        col("n_pieces"),
        (col("n_pieces").cast("double") / col("n_tokens").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("chars_per_piece"))
      .orderBy(col("pred_lang"))
  }

  /** Oracle twin of [[bpeFertility]]; `langCteBody` is a SELECT
    * yielding (doc_id, pred_lang) — SparkEntry owns the langid SQL.
    */
  def duckBpeFertility(textExpr: String, table: String, nMerges: Int,
      langCteBody: String): String = {
    val sb = duckBpeChain(textExpr, table, nMerges)
    sb.append(
      s""",
         |vf AS (SELECT tok,
         |    CAST(len(string_split(substring(w, 2, length(w) - 2), ')('))
         |      AS BIGINT) AS n_sym FROM v$nMerges),
         |lng AS ($langCteBody),
         |corp AS (SELECT doc_id, unnest(${duckTokens(textExpr)}) AS tok
         |  FROM $table),
         |tc AS (SELECT lng.pred_lang, corp.tok, count(*) AS cnt
         |  FROM corp JOIN lng ON lng.doc_id = corp.doc_id GROUP BY 1, 2),
         |jn AS (SELECT tc.pred_lang, tc.cnt,
         |    CAST(length(tc.tok) AS BIGINT) AS n_chars,
         |    coalesce(vf.n_sym, CAST(length(tc.tok) AS BIGINT)) AS pieces
         |  FROM tc LEFT JOIN vf ON vf.tok = tc.tok),
         |agg AS (SELECT pred_lang,
         |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |    CAST(sum(cnt * pieces) AS BIGINT) AS n_pieces,
         |    CAST(sum(cnt * n_chars) AS BIGINT) AS n_chars
         |  FROM jn GROUP BY 1),
         |nd AS (SELECT pred_lang, count(*) AS n_docs FROM lng GROUP BY 1)
         |SELECT agg.pred_lang, nd.n_docs, agg.n_tokens, agg.n_pieces,
         |  CAST(agg.n_pieces AS DOUBLE) / CAST(agg.n_tokens AS DOUBLE)
         |    AS fertility,
         |  CAST(agg.n_chars AS DOUBLE) / CAST(agg.n_pieces AS DOUBLE)
         |    AS chars_per_piece
         |FROM agg JOIN nd ON nd.pred_lang = agg.pred_lang
         |ORDER BY 1""".stripMargin)
    sb.toString
  }

  /** Merges-vs-compression knob curve — the "how many merges is
    * enough" companion of [[bpeTrain]] (the tokenizer's analogue of
    * `sim_kmeans_elbow`'s k curve): after each merge round r ∈
    * [0, nMerges], the corpus-weighted piece total over the trained
    * vocabulary, pieces per token, and chars per piece, next to the
    * pair merged that round and its census count. Round 0 is the
    * un-merged character baseline; the curve's flattening marginal
    * gain is what picks the vocabulary budget. Rounds past
    * vocabulary exhaustion (no pair left to merge) repeat the final
    * state with an empty pair — mirroring the oracle's LIMIT-1-of-
    * empty convention so both engines emit nMerges + 1 rows always.
    *
    * Scale shape: the corpus reduces ONCE to the cached census
    * ([[trainBpe]]'s); each round's statistic replays the ≤r
    * vocabulary rewrites on that cached relation and reduces to ONE
    * row (map-side combined, vocabulary-bounded) — the corpus is
    * never re-tokenized. Output nMerges + 1 rows.
    */
  def bpeCompressionCurve(
      docs: DataFrame, text: Column, nMerges: Int = 8): DataFrame = {
    val (_, merges, base) = trainBpe(docs, text, nMerges)
    def stat(round: Int, pair: String, cnt: Long, w: Column): DataFrame =
      base.select(col("n"), char_length(col("tok")).cast("long").as("chars"),
        w.as("wr"))
        .select(col("n"), col("chars"),
          size(split(expr("substring(wr, 2, char_length(wr) - 2)"),
            "\\)\\(")).cast("long").as("pieces"))
        .agg(lit(round.toLong).as("round"), lit(pair).as("merged_pair"),
          lit(cnt).as("merge_count"),
          sum(col("n") * col("pieces")).as("total_pieces"),
          sum(col("n") * col("chars")).as("total_chars"),
          sum(col("n")).as("n_tokens"))
    var w: Column = col("w")
    val rows = Seq.newBuilder[DataFrame]
    rows += stat(0, "", 0L, w)
    val byRound = merges.map(m => m._1.toInt -> m).toMap
    for (round <- 1 to nMerges) {
      byRound.get(round) match {
        case Some((_, a, b, merged, cnt)) =>
          w = regexp_replace(w,
            java.util.regex.Pattern.quote(s"($a)($b)"),
            java.util.regex.Matcher.quoteReplacement(s"($merged)"))
          rows += stat(round, s"($a)($b)", cnt, w)
        case None =>
          rows += stat(round, "", 0L, w)
      }
    }
    rows.result().reduce(_ unionByName _)
      .select(col("round"), col("merged_pair"), col("merge_count"),
        col("total_pieces"), col("total_chars"), col("n_tokens"),
        (col("total_pieces").cast("double") / col("n_tokens").cast("double"))
          .as("pieces_per_token"),
        (col("total_chars").cast("double") / col("total_pieces").cast("double"))
          .as("chars_per_piece"))
      .orderBy(col("round"))
  }

  /** Oracle twin of [[bpeTrain]]: the merge loop unrolled as chained
    * CTEs (one census + argmax + rewrite per round), over the same
    * delimited representation and the same `replace` primitive. The
    * vocabulary CTEs carry the source token so [[duckBpeEncode]] can
    * join the trained vocabulary back onto the corpus.
    */
  private def duckBpeChain(textExpr: String, table: String, nMerges: Int): StringBuilder = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH tk AS (SELECT unnest(${duckTokens(textExpr)}) AS tok FROM $table),
         |v0 AS (SELECT tok, regexp_replace(tok, '(.)', '(\\1)', 'g') AS w,
         |    count(*) AS n
         |  FROM tk WHERE regexp_matches(tok, '^[a-z]+$$') GROUP BY 1, 2)""".stripMargin)
    for (r <- 1 to nMerges) {
      sb.append(
        s""",
           |c$r AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
           |    SELECT n, unnest(list_transform(range(1, len(sy)),
           |      i -> '(' || sy[i] || ')(' || sy[i + 1] || ')')) AS pair
           |    FROM (SELECT n, string_split(substring(w, 2, length(w) - 2),
           |        ')(') AS sy FROM v${r - 1}) s
           |    WHERE len(sy) >= 2) p GROUP BY 1),
           |t$r AS (SELECT pair, cnt FROM c$r ORDER BY cnt DESC, pair LIMIT 1),
           |v$r AS (SELECT v.tok,
           |    CASE WHEN t.pair IS NULL THEN v.w
           |      ELSE replace(v.w, t.pair, replace(t.pair, ')(', '')) END AS w,
           |    v.n FROM v${r - 1} v LEFT JOIN t$r t ON TRUE)""".stripMargin)
    }
    sb
  }

  def duckBpeTrain(textExpr: String, table: String, nMerges: Int): String = {
    val sb = duckBpeChain(textExpr, table, nMerges)
    val rounds = (1 to nMerges).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  string_split(substring(pair, 2, length(pair) - 2), ')(')[1]
         |    AS left_sym,
         |  string_split(substring(pair, 2, length(pair) - 2), ')(')[2]
         |    AS right_sym,
         |  string_split(substring(pair, 2, length(pair) - 2), ')(')[1]
         |    || string_split(substring(pair, 2, length(pair) - 2), ')(')[2]
         |    AS merged,
         |  cnt AS pair_count FROM t$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    sb.append(s"\n$rounds\nORDER BY round")
    sb.toString
  }

  /** Oracle twin of [[bpeCompressionCurve]]: one statistics row per
    * vocabulary state v0..vN of the unrolled chain, the round's pair
    * and count pulled from t$r by scalar subquery (COALESCE('')
    * matches the engine's repeat-final-state convention when merges
    * exhaust early).
    */
  def duckBpeCompression(
      textExpr: String, table: String, nMerges: Int): String = {
    val sb = duckBpeChain(textExpr, table, nMerges)
    val pieces = "len(string_split(substring(w, 2, length(w) - 2), ')('))"
    def row(r: Int): String = {
      val pair =
        if (r == 0) "''" else s"COALESCE((SELECT pair FROM t$r), '')"
      val cnt =
        if (r == 0) "CAST(0 AS BIGINT)"
        else s"COALESCE((SELECT cnt FROM t$r), 0)"
      s"""SELECT CAST($r AS BIGINT) AS round, $pair AS merged_pair,
         |  $cnt AS merge_count,
         |  CAST(sum(n * $pieces) AS BIGINT) AS total_pieces,
         |  CAST(sum(n * length(tok)) AS BIGINT) AS total_chars,
         |  CAST(sum(n) AS BIGINT) AS n_tokens,
         |  CAST(sum(n * $pieces) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
         |    AS pieces_per_token,
         |  CAST(sum(n * length(tok)) AS DOUBLE)
         |    / CAST(sum(n * $pieces) AS DOUBLE) AS chars_per_piece
         |FROM v$r""".stripMargin
    }
    sb.append("\n" + (0 to nMerges).map(row).mkString("\nUNION ALL\n") +
      "\nORDER BY round")
    sb.toString
  }

  /** Oracle twin of [[bpeEncode]]: the training chain plus the
    * vocabulary join back onto the (source, token) corpus counts,
    * with the same one-piece-per-character fallback for untrained
    * tokens.
    */
  def duckBpeEncode(textExpr: String, table: String, nMerges: Int): String = {
    val sb = duckBpeChain(textExpr, table, nMerges)
    sb.append(
      s""",
         |vf AS (SELECT tok,
         |    CAST(len(string_split(substring(w, 2, length(w) - 2), ')('))
         |      AS BIGINT) AS n_sym FROM v$nMerges),
         |corp AS (SELECT source, unnest(${duckTokens(textExpr)}) AS tok
         |  FROM $table),
         |tc AS (SELECT source, tok, count(*) AS cnt FROM corp GROUP BY 1, 2),
         |jn AS (SELECT tc.source, tc.cnt,
         |    CAST(length(tc.tok) AS BIGINT) AS n_chars,
         |    coalesce(vf.n_sym, CAST(length(tc.tok) AS BIGINT)) AS pieces
         |  FROM tc LEFT JOIN vf ON vf.tok = tc.tok),
         |agg AS (SELECT source,
         |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |    CAST(sum(cnt * pieces) AS BIGINT) AS n_pieces,
         |    CAST(sum(cnt * n_chars) AS BIGINT) AS n_chars
         |  FROM jn GROUP BY 1),
         |nd AS (SELECT source, count(*) AS n_docs FROM $table GROUP BY 1)
         |SELECT agg.source, nd.n_docs, agg.n_tokens, agg.n_pieces,
         |  agg.n_chars,
         |  CAST(agg.n_pieces AS DOUBLE) / CAST(agg.n_tokens AS DOUBLE)
         |    AS pieces_per_token,
         |  CAST(agg.n_chars AS DOUBLE) / CAST(agg.n_pieces AS DOUBLE)
         |    AS chars_per_piece
         |FROM agg JOIN nd ON nd.source = agg.source
         |ORDER BY 1""".stripMargin)
    sb.toString
  }

  /** Hapax profile per source: vocabulary size, hapax legomena
    * (terms seen exactly once in the source) and their share of the
    * vocabulary. A high hapax share flags OCR noise / tokenizer
    * breakage / boilerplate-free diversity — the cheap lexical
    * health gauge next to `corpus_vocab_growth`'s curve.
    *
    * Scale shape: two map-side-combined reduces — (source, term)
    * counts bounded by per-source vocabulary, then a |sources|-row
    * rollup. The share divides two exact BIGINTs, identically in
    * both engines.
    */
  def hapaxProfile(docs: DataFrame, text: Column): DataFrame =
    docs.select(col("source"), explode(tokens(text)).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("cnt")).as("n_tokens"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_share",
        col("n_hapax").cast("double") / col("n_terms").cast("double"))
      .orderBy(col("source"))

  /** Code-symbol class for [[codeDetect]] — literal characters only
    * (no class metacharacters), so both engines' regex dialects read
    * it identically.
    */
  val CodeSymbolPattern = "[{}();=<>#&|+*/%]"

  /** Code-vs-prose detection — the routing gate a pretraining
    * pipeline runs before language-specific filtering (code must NOT
    * flow through prose quality/perplexity gates: braces and
    * semicolons read as "noise" to a prose LM and the corpus loses
    * its code split). Per doc: exact symbol/digit censuses over the
    * RAW text (normalization would strip exactly the signal) and an
    * integer verdict — code iff symbols are ≥ 5% of characters
    * (20·n_symbols ≥ n_chars), no float threshold.
    *
    * Map-only at any scale; shares are one double division each,
    * null for empty docs.
    */
  def codeDetect(docs: DataFrame, text: Column): DataFrame = {
    val symbols = regexp_count(text, lit(CodeSymbolPattern)).cast("long")
    val digits = regexp_count(text, lit("[0-9]")).cast("long")
    docs.select(col("doc_id"), col("source"),
        length(text).cast("long").as("n_chars"),
        symbols.as("n_symbols"), digits.as("n_digits"))
      .withColumn("symbol_share",
        when(col("n_chars") > 0,
          col("n_symbols").cast("double") / col("n_chars").cast("double")))
      .withColumn("digit_share",
        when(col("n_chars") > 0,
          col("n_digits").cast("double") / col("n_chars").cast("double")))
      .withColumn("is_code",
        col("n_chars") > 0 && lit(20L) * col("n_symbols") >= col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Top-N vocabulary coverage elbow — the tokenizer-sizing curve:
    * rank the corpus vocabulary by frequency and report, at every
    * power-of-two vocabulary size (plus the full-vocabulary row),
    * how much of the corpus token mass the top N types cover. The
    * read is direct: the N where coverage flattens is the vocabulary
    * budget a tokenizer/embedding table should buy; the gap between
    * the elbow and 1.0 is the long-tail mass subword pieces must
    * absorb. Next to `text_bpe_compression` (merges → compression on
    * the TRAINED pieces) this prices the WHOLE-WORD ceiling; next to
    * `corpus_vocab_growth` (Heaps' law over ingestion) it holds the
    * corpus fixed and sweeps the budget.
    *
    * Every number is an exact integer until the final coverage
    * division. The boundary token itself is emitted per row — ties
    * at the boundary are deterministic ((tf desc, tok) total order).
    *
    * Scale shape: one map-side-combined (tok) reduce bounded by
    * vocabulary, then ONE range exchange through
    * [[graft.functions.Ranks.groupedWithSum]] — rank and running
    * coverage come from the same distributed sort (never a global
    * single-task window), the coverage denominator rides the same
    * broadcast offsets relation, and the power-of-two gate prunes
    * output to ≤ log₂|V|+1 rows.
    */
  def vocabCoverage(docs: DataFrame, text: Column): DataFrame = {
    val tf = docs.select(explode(tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .withColumn("neg_tf", -col("tf"))
    graft.functions.Ranks.groupedWithSum(
        tf, Nil, Seq("neg_tf", "tok"), "tf")
      .withColumn("covered_tokens", col("prefix_sum") + col("tf"))
      .filter(col("rank").bitwiseAND(col("rank") - 1) === 0 ||
        col("rank") === col("grp_total"))
      .select(col("rank").as("vocab_size"), col("tok"), col("tf"),
        col("covered_tokens"),
        col("grp_value_total").as("total_tokens"),
        (col("covered_tokens").cast("double") /
          col("grp_value_total").cast("double")).as("coverage"))
      .orderBy(col("vocab_size"))
  }

  /** UTF-8 byte-vs-char census per source — the cheap encoding-health
    * gauge run before any text op: `n_bytes − n_chars` counts exactly
    * the multibyte continuation bytes, so a nominally-ASCII source
    * with a high excess share is either genuinely non-Latin or
    * MOJIBAKE (double-encoded UTF-8 inflates the excess ~2×), and a
    * CJK source with excess ≈ 0 has been lossily transliterated.
    * Pure integer map-only arithmetic (length vs octet_length; the
    * oracle's strlen) — no Unicode tables enter the compare.
    */
  def asciiProfile(docs: DataFrame, text: Column): DataFrame =
    docs.select(col("source"),
        length(text).cast("long").as("chars"),
        octet_length(text).cast("long").as("bytes"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars")).as("n_chars"),
        sum(col("bytes")).as("n_bytes"),
        sum(when(col("bytes") > col("chars"), 1L).otherwise(0L))
          .as("n_multibyte_docs"))
      .withColumn("multibyte_excess", col("n_bytes") - col("n_chars"))
      .withColumn("excess_share",
        (col("n_bytes") - col("n_chars")).cast("double") /
          col("n_chars").cast("double"))
      .orderBy(col("source"))

  /** Quality–length correlation per source — the LENGTH-BIAS audit
    * of the quality signal itself: a strongly positive Pearson r
    * says the "quality" score is mostly measuring document length,
    * so gating or importance-resampling on it silently reshapes the
    * corpus's length distribution (the classic filtered-corpus
    * artifact). x = token count, y = the same per-mille quality
    * integer the Corpus.weightedSample gate acts on, so this audits
    * exactly the signal that drives importance sampling.
    *
    * Determinism: all five moments (Σx, Σy, Σxy, Σx², Σy²) reduce as
    * EXACT integers; r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
    * is then a fixed per-row double expression — two sqrts, one
    * divide — identical in both engines. (Integer moments stay under
    * 2⁶³ through ~10⁸ docs/source; widen to decimal(38,0) beyond.)
    * NULL r for a degenerate source (zero variance on either side).
    */
  def qualityLengthCorr(docs: DataFrame, text: Column): DataFrame = {
    val scored = quality(docs, text)
      .select(col("source"), col("n_tokens").as("x"),
        floor(col("quality_score") * lit(1000.0)).as("y"))
    val m = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val dx = m("n") * m("sxx") - m("sx") * m("sx")
    val dy = m("n") * m("syy") - m("sy") * m("sy")
    m.withColumn("r",
        when(dx > 0 && dy > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
          .otherwise(lit(null).cast("double")))
      .select(col("source"), col("n"), col("sx").as("sum_tokens"),
        col("sy").as("sum_quality_pm"), col("r"))
      .orderBy(col("source"))
  }

  /** Character-bigram LM surprise per document — the encoding-level
    * gibberish detector (the CCNet-style fluency gate one level
    * below [[bigramLm]]'s word-order view): each in-doc character
    * bigram scores ⌊log2(uf div bf)⌋ under the corpus MLE
    * P(c2|c1) — byte salad and wrong-charset text light up here
    * even when a word tokenizer sees nothing (every "word" is
    * novel, so word-level stats saturate). Same bin-length integer
    * log as every LM here: the only double is one final division.
    *
    * Scale shape: the char fan-out is the cost (≈ doc bytes — the
    * shingling cost class, map-only behind the spread repartition);
    * both frequency tables are ALPHABET²-bounded (≤ a few thousand
    * rows), so the stream joins tiny broadcastable relations.
    */
  def charLm(docs: DataFrame, text: Column): DataFrame = {
    val base = docs.select(col("doc_id"), Portable.normText(text).as("t"))
    val bi = base.select(col("doc_id"), explode(
        when(length(col("t")) > 1,
          expr("transform(sequence(1, length(t) - 1)," +
            " i -> substring(t, i, 2))"))
          .otherwise(array().cast("array<string>"))).as("bg"))
    val un = base.select(col("doc_id"), explode(
        when(length(col("t")) > 0,
          expr("transform(sequence(1, length(t))," +
            " i -> substring(t, i, 1))"))
          .otherwise(array().cast("array<string>"))).as("c"))
    val uf = un.groupBy(col("c")).agg(count(lit(1)).as("uf"))
    val bf = bi.groupBy(col("bg")).agg(count(lit(1)).as("bf"))
      .join(uf, substring(col("bg"), 1, 1) === col("c"))
      .withColumn("surprise",
        (length(bin(expr("uf div bf"))) - 1).cast("long"))
      .select(col("bg"), col("bf"), col("surprise"))
    val scores = bi.join(bf, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("bf") === 1, 1L).otherwise(0L)).as("n_novel"),
        sum(col("surprise")).as("sum_surprise"))
    base.select(col("doc_id"))
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(col("sum_surprise"), lit(0L)).as("sum_surprise"))
      .withColumn("avg_surprise",
        col("sum_surprise").cast("double") /
          nullif(col("n_bigrams"), lit(0L)).cast("double"))
      .orderBy(col("doc_id"))
  }

  val KeyphraseK = 5

  /** Top-k bigram KEYPHRASES per source — the multi-word unit
    * [[keywords]]' unigram argmax can't see ("machine learning",
    * "new york"): per-source bigram frequency × the corpus-wide
    * integer idf ⌊log2(n_docs div df)⌋ (bin-length, no libm), ranked
    * with a deterministic (score desc, phrase) tie-break. The
    * source-level (not doc-level) rank is the deliberate contrast:
    * keyphrases describe a SOURCE's topical identity for mix
    * curation, where keywords tag individual documents.
    *
    * Scale shape: the bigram relation is a map-only adjacent-pair
    * transform; tf and df reduce on the bigram-vocabulary key
    * (map-side combined); n_docs is a 1-row broadcast; per-source
    * top-k is WindowGroupLimit-prunable.
    */
  def keyphrases(docs: DataFrame, text: Column, k: Int = KeyphraseK): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"), tokens(text).as("toks"))
    val bi = toks.select(col("doc_id"), col("source"), explode(
        when(size(col("toks")) > 1,
          expr("transform(sequence(0, size(toks) - 2)," +
            " i -> concat(toks[i], ' ', toks[i + 1]))"))
          .otherwise(array().cast("array<string>"))).as("bg"))
    val dfr = bi.select(col("doc_id"), col("bg")).distinct()
      .groupBy(col("bg")).agg(count(lit(1)).as("df"))
    val tf = bi.groupBy(col("source"), col("bg")).agg(count(lit(1)).as("tf"))
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val scored = tf.join(dfr, "bg").crossJoin(nDocs)
      .withColumn("idf", (length(bin(expr("n_docs div df"))) - 1).cast("long"))
      .withColumn("score", col("tf") * col("idf"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("bg"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("source"), col("bg").as("keyphrase"), col("tf"),
        col("df"), col("score"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** Term burstiness per source: for the top-k terms by document
    * frequency, the variance-to-mean ratio (Fano factor) of the
    * term's per-document count, over the documents that CONTAIN it.
    * VMR ≈ 1 is Poisson scatter (function words); VMR ≫ 1 is a
    * bursty/topical term that clumps inside a few documents —
    * Church & Gale's burstiness contrast, the signal behind
    * adaptive-LM caching and topical-keyword extraction. In a
    * training-data pipeline it separates boilerplate vocabulary
    * (evenly smeared, low VMR) from content terms before any model
    * is in the loop.
    *
    * Determinism/scale shape: the two moments Σc and Σc² reduce as
    * exact BIGINTs over the (source, term, doc) count relation
    * (vocabulary-bounded after the first map-side-combined reduce);
    * VMR = (df·Σc² − (Σc)²) / (df·Σc) is ONE double division of two
    * exact integers, so both engines produce the identical bits.
    * The integer numerator stays under 2⁶³ through ~10⁹-token
    * sources; beyond that the moments should widen to decimal(38,0)
    * (same shape, no plan change). Top-k pick is a per-source
    * window over the vocabulary-bounded term relation — never a
    * single-partition global sort.
    */
  def burstiness(docs: DataFrame, text: Column, k: Int = 10): DataFrame = {
    val perDoc = docs.select(col("source"), col("doc_id"),
        explode(tokens(text)).as("tok"))
      .groupBy(col("source"), col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val perTerm = perDoc.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("df"),
        sum(col("c")).as("sx"),
        sum(col("c") * col("c")).as("sx2"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("df").desc, col("sx").desc, col("tok"))
    perTerm.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .withColumn("vmr",
        (col("df") * col("sx2") - col("sx") * col("sx")).cast("double") /
          (col("df") * col("sx")).cast("double"))
      .select(col("source"), col("tok"), col("df"), col("sx").as("total_tf"),
        col("vmr"), col("rk"))
  }

  /** Zipf octave census per source: rank the vocabulary by term
    * frequency, bucket ranks into OCTAVES (rank ∈ [2ʲ, 2ʲ⁺¹)), and
    * report each octave's term count, frequency mass, and the
    * octave-over-octave mass decay. Under an ideal Zipf law
    * (f ∝ 1/rank) every octave carries the SAME mass (Σ 1/r over a
    * doubling range ≈ ln 2), so decay ≈ 1.0 flags a natural-language
    * frequency profile while decay collapsing toward 0 flags
    * template/boilerplate corpora and decay ≫ 1 flags head-heavy
    * spam — the power-law fit without a single transcendental:
    * octave = length(bin(rank)) − 1 is pure integer bit-length in
    * BOTH engines (the same trick text_tfidf_topk's integer-log2 IDF
    * uses), so no libm log() whose last ulp could differ between the
    * JVM and DuckDB ever enters the compare.
    *
    * Scale shape: term counts are a vocabulary-bounded map-side-
    * combined reduce; the rank is a per-source window over that
    * bounded relation; octave rollup is |sources|·|octaves| rows.
    * decay is one double division of exact BIGINT masses (lag over
    * the tiny octave relation).
    */
  def zipfOctaves(docs: DataFrame, text: Column): DataFrame = {
    val tf = docs.select(col("source"), explode(tokens(text)).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("tf").desc, col("tok"))
    val oct = tf.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("octave", (length(bin(col("rank"))) - 1).cast("long"))
      .groupBy(col("source"), col("octave"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("mass"))
    val wo = Window.partitionBy(col("source")).orderBy(col("octave"))
    oct.withColumn("decay",
        col("mass").cast("double") /
          lag(col("mass"), 1).over(wo).cast("double"))
      .orderBy(col("source"), col("octave"))
  }
}
