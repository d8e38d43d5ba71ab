package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{ChangeFeed, Envelope, Exceptions, FullLoad, SchemaEvolution, TableMapping, TableStatistics, TypePalette}
import graft.functions.Portable
import graft.ml.{Corpus, Dedup, Similarity, TextAnalysis, Vectors}
import graft.multimodal.Binary
import graft.operators.Analytics

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  * Every entry in `queries` has a DuckDB twin in `oracleSql` unless
  * the operator isn't SQL-expressible (driver then does a rows-only
  * check). Column names are aligned 1:1 between the two maps.
  */
object SparkEntry {

  /** Flagship (driver smoke-checks rows > 0): the composed CDC
    * pipeline end-to-end — derive a change feed, wrap it into
    * envelope messages, parse them back, and maintain the per-group
    * incremental aggregate from the parsed stream. One DataFrame
    * touching the envelope, change-feed, and incremental-maintenance
    * surfaces together.
    *
    * Built over the orders table (plain micro timestamps) so it runs
    * on ANY caller-supplied session — the events table's
    * TIMESTAMP(NANOS) column reads differently across Spark versions
    * (Tables.withEventTime absorbs that, but a vanilla smoke-check
    * session may also lack the UTC timezone pin the ts comparisons
    * assume).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val feed = Tables.load(spark, dir, "orders").select(
      element_at(array(lit("insert"), lit("update"), lit("delete")),
        (col("o_orderkey") % 3 + 1).cast("int")).as("op"),
      lit("graft").as("schema_name"),
      concat(lit("orders_"), (col("o_custkey") % 4).cast("string")).as("table_name"),
      col("o_orderdate").as("ts"),
      col("o_orderkey").as("event_id"),
      col("o_custkey").as("user_id"),
      col("o_totalprice").as("value"))
    val wrapped = Envelope.wrap(feed, col("op"), col("schema_name"),
      col("table_name"), col("ts"), col("event_id"),
      Seq("event_id", "user_id", "value"))
    val parsed = Envelope.parse(wrapped.select("message"), "message", eventDataSchema)
      .select(
        col("metadata.`table-name`").as("table_name"),
        col("metadata.operation").as("op"),
        to_timestamp(col("metadata.timestamp"),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("ts"),
        col("data.event_id").as("event_id"),
        col("data.user_id").as("user_id"),
        col("data.value").as("value"))
    ChangeFeed.incrementalSum(parsed, "table_name",
        Seq("table_name", "user_id"), Seq(col("ts"), col("event_id")), "value")
      .withColumnRenamed("inc_sum_d", "maintained_sum")
      .orderBy(col("table_name"))
  }

  /** Shared DECIMAL cast used to keep aggregate math exact (and thus
    * engine-order-independent); oracle SQL mirrors it verbatim.
    */
  private val D = "DECIMAL(18,2)"

  /** Limited-LOB-mode byte budget for `cdc_lob_truncation` — the
    * LobMaxSize analog under audit (documents median ≈ 306 B, so the
    * split is non-degenerate at every SF).
    */
  private val LobBudgetBytes = 384L

  /** Per-bucket candidate cap for the capped-dedup demo pair
    * (`dedup_minhash_capped` / `dedup_cap_census`) — small enough to
    * BITE on the testdata's band buckets (max 5 at sf0.01, 17 at
    * sf0.1), so the oracle exercises the fair-order selection, not
    * the no-op path.
    */
  private val DemoCap = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> ((s, dir) => Analytics.q1PricingSummary(s, dir)),
    "q3_shipping_priority" -> ((s, dir) => Analytics.q3ShippingPriority(s, dir)),
    "q5_region_revenue"    -> ((s, dir) => Analytics.q5RegionRevenue(s, dir)),
    "q_market_share"       -> ((s, dir) => Analytics.qMarketShare(s, dir)),
    "q_top_parts_per_brand" -> ((s, dir) => Analytics.qTopPartsPerBrand(s, dir)),
    "q_semi_anti"          -> ((s, dir) => Analytics.qSemiAnti(s, dir)),
    "q_rollup"             -> ((s, dir) => Analytics.qRollup(s, dir)),
    "q_cube"               -> ((s, dir) => Analytics.qCube(s, dir)),
    "q_grouping_sets"      -> ((s, dir) => Analytics.qGroupingSets(s, dir)),
    "q13_custdist"         -> ((s, dir) => Analytics.q13CustDist(s, dir)),
    "q18_large_orders"     -> ((s, dir) => Analytics.q18LargeOrders(s, dir)),
    "q4_late_orders"       -> ((s, dir) => Analytics.q4LateOrders(s, dir)),
    "q10_returned_items"   -> ((s, dir) => Analytics.q10ReturnedItems(s, dir)),
    "q_quantile_sketch"    -> ((s, dir) => Analytics.qQuantileSketch(s, dir)),
    "q19_disjunctive_revenue" -> ((s, dir) => Analytics.q19DisjunctiveRevenue(s, dir)),
    "q7_volume_shipping"   -> ((s, dir) => Analytics.q7VolumeShipping(s, dir)),
    "q14_promo_revenue"    -> ((s, dir) => Analytics.q14PromoRevenue(s, dir)),
    "q15_top_supplier"     -> ((s, dir) => Analytics.q15TopSupplier(s, dir)),
    "q17_small_qty_revenue" -> ((s, dir) => Analytics.q17SmallQtyRevenue(s, dir)),
    "q21_waiting_suppliers" -> ((s, dir) => Analytics.q21WaitingSuppliers(s, dir)),
    "q22_sales_opportunity" -> ((s, dir) => Analytics.q22SalesOpportunity(s, dir)),
    "q2_min_cost_supplier" -> ((s, dir) => Analytics.q2MinCostSupplier(s, dir)),
    "q6_forecast_revenue"  -> ((s, dir) => Analytics.q6ForecastRevenue(s, dir)),
    "q16_supplier_variety" -> ((s, dir) => Analytics.q16SupplierVariety(s, dir)),
    "q20_bulk_suppliers"   -> ((s, dir) => Analytics.q20BulkSuppliers(s, dir)),
    "q9_product_profit"    -> ((s, dir) => Analytics.q9ProductProfit(s, dir)),
    "q11_important_stock"  -> ((s, dir) => Analytics.q11ImportantStock(s, dir)),
    "q12_priority_shipping" -> ((s, dir) => Analytics.q12PriorityShipping(s, dir)),
    "events_top_paths"     -> ((s, dir) => Analytics.eventsTopPaths(s, dir)),
    "events_anomaly"       -> ((s, dir) => Analytics.eventsAnomaly(s, dir)),
    "events_rolling_active" -> ((s, dir) => Analytics.eventsRollingActive(s, dir)),
    "q_above_avg_orders"   -> ((s, dir) => Analytics.qAboveAvgOrders(s, dir)),
    "events_dwell_time"    -> ((s, dir) => Analytics.eventsDwellTime(s, dir)),
    "events_range_join"    -> ((s, dir) => Analytics.eventsRangeJoin(s, dir)),
    "events_markov"        -> ((s, dir) => Analytics.eventsMarkov(s, dir)),
    // Stationary distribution of the transition chain (fixed-point
    // integer power iteration, 0.85 damping) — where the population
    // spends its time at equilibrium.
    "events_markov_stationary" -> ((s, dir) =>
      Analytics.markovStationary(Tables.load(s, dir, "events"))),
    "events_cooccurrence"  -> ((s, dir) => Analytics.eventsCooccurrence(s, dir)),
    "events_rfm"           -> ((s, dir) => Analytics.eventsRfm(s, dir)),
    "events_gini"          -> ((s, dir) => Analytics.eventsGini(s, dir)),
    "q_skyline"            -> ((s, dir) => Analytics.qSkyline(s, dir)),
    "q_window_range_30d"   -> ((s, dir) => Analytics.qWindowRange30d(s, dir)),
    "events_anomaly_mad"   -> ((s, dir) => Analytics.eventsAnomalyMad(s, dir)),
    "events_funnel_windowed" -> ((s, dir) => Analytics.eventsFunnelWindowed(s, dir)),
    // Sequential drift detection: exact-integer CUSUM over daily
    // volumes per type (prefix-sum identity, zero-filled day spine).
    "events_cusum"         -> ((s, dir) =>
      Analytics.cusum(Tables.load(s, dir, "events"))),

    // Count-Min sketch priced against exact truth: d×w integer
    // counter matrix (merge-by-addition at shard scale), per-type
    // min-over-rows estimate, overestimate ≥ 0 always.
    "events_countmin"      -> ((s, dir) =>
      Analytics.countMinAccuracy(Tables.load(s, dir, "events"))),

    // Daily-count autocorrelation at lags 1..7: the seasonality
    // STRENGTH next to events_seasonality's shape — integer-exact
    // Pearson r over the zero-filled day spine.
    "events_autocorr"      -> ((s, dir) =>
      Analytics.eventsAutocorr(Tables.load(s, dir, "events"))),

    // Declared-vs-sniffed modality census with planted mislabeled
    // containers (doc_id % 17 ships the next modality's bytes) —
    // the feed on-boarding gate before per-modality decode routing.
    "multimodal_sniff_mismatch" -> ((s, dir) =>
      Binary.sniffMismatch(Tables.load(s, dir, "documents"))),

    // Semi-structured payload discovery: per (event_type, JSON key)
    // presence and numeric profile over the props payload.
    "events_props_profile" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .filter(col("props").isNotNull)
        .select(col("event_type"),
          explode(from_json(col("props"),
            MapType(StringType, StringType)))
            .as(Seq("prop_key", "v")))
        .groupBy(col("event_type"), col("prop_key"))
        .agg(count(lit(1)).as("n_present"),
          count(col("v").cast("long")).as("n_numeric"),
          sum(col("v").cast("long")).as("sum_value"),
          min(col("v").cast("long")).as("min_value"),
          max(col("v").cast("long")).as("max_value"))
        .orderBy(col("event_type"), col("prop_key"))),

    // Language-ID evaluation against the declared label: confusion
    // matrix + per-truth-language share.
    "text_langid_eval" -> ((s, dir) => {
      val scored = TextAnalysis.langId(
        Tables.load(s, dir, "documents"), col("text"))
      val m = scored.groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("lang"))
      m.withColumn("lang_total", sum(col("n_docs")).over(w))
        .withColumn("share",
          col("n_docs").cast("double") / col("lang_total").cast("double"))
        .withColumn("is_correct", col("lang") === col("pred_lang"))
        .orderBy(col("lang"), col("pred_lang"))
    }),

    // Point-in-time replay: state AS OF mid-feed, summarized per
    // table (resume-from-timestamp semantics, run.py:156-185).
    "cdc_replay_at" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      ChangeFeed.replayAt(c, lit("2024-01-15 00:00:00"),
          Seq("user_id"), Seq(col("ts"), col("event_id")))
        .groupBy(col("table_name"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"),
          max(col("ts")).as("max_ts"))
        .orderBy(col("table_name"))
    }),

    // Retention-horizon audit: which replay points are still reachable
    // under the 24 h Kinesis retention (stack.py:356)? The Jan-15
    // point is cdc_replay_at's own cutoff — aged out past
    // TRIM_HORIZON at the feed head, so a resume from it would lose
    // records; the Jan-30 point sits inside the window.
    "cdc_retention_audit" -> ((s, dir) =>
      cdc.Retention.audit(ChangeFeed.fromEvents(s, dir),
          retentionHours = 24,
          replayPoints = Seq("2024-01-15 00:00:00", "2024-01-30 12:00:00"))
        .orderBy(col("table_name"), col("replay_ts"))),

    // Consumer resume playbook: per (shard, iterator type) where
    // TRIM_HORIZON / AT_TIMESTAMP / AFTER_SEQUENCE would start and
    // what each skips, serves, or silently loses — the unifying view
    // over retention_audit + replay_at + consume_paged. The Jan-29
    // AT_TIMESTAMP point sits below the 24 h horizon → data-loss
    // verdict; the Jan-30 checkpoint resumes cleanly.
    "cdc_consume_resume" -> ((s, dir) =>
      cdc.Retention.resumePlaybook(ChangeFeed.fromEvents(s, dir),
        retentionHours = 24, atTs = "2024-01-29 00:00:00",
        checkpointTs = "2024-01-30 12:00:00")),

    // Contiguous-acked-prefix frontier per shard: the only seq an
    // out-of-order-ack consumer may checkpoint, plus the replay
    // volume a restart from it redelivers.
    "cdc_checkpoint_frontier" -> ((s, dir) =>
      cdc.Retention.checkpointFrontier(ChangeFeed.fromEvents(s, dir))),

    // The DEPLOYABLE streaming twin: the frontier maintained
    // incrementally in per-shard state through the streaming engine;
    // latest state per shard must equal the batch audit.
    "cdc_stream_frontier" -> ((s, dir) =>
      streaming.CdcPipeline.frontierRoundtrip(s, dir)),

    // Full-load → CDC cutover: snapshot taken ACROSS an in-flight
    // change window, merged with the overlapping stream by position
    // (snapshot row at (read_ts, +inf)); per table the cached/
    // overridden/new/deleted key cohorts and the exactly-once
    // invariant n_mismatch = 0 vs the full-feed batch apply.
    "cdc_snapshot_handoff" -> ((s, dir) =>
      cdc.Handoff.snapshotHandoff(ChangeFeed.fromEvents(s, dir),
        "2024-01-29 00:00:00", windowSeconds = 86400)),

    // Storage tiering: live keys bucketed hot/warm/cold by
    // inactivity vs the feed head, with per-tier byte mass.
    "cdc_tiering_plan" -> ((s, dir) =>
      ChangeFeed.tieringPlan(ChangeFeed.fromEvents(s, dir))),

    // Streaming-state sizing: live keys x payload bytes per table,
    // shard count at 1 MB/shard (the apply's own state relation).
    "cdc_state_size" -> ((s, dir) =>
      ChangeFeed.stateSizePlan(ChangeFeed.fromEvents(s, dir))),

    // Backfill plan: per key-range segment, replay-from-stream vs
    // full-reload decision against the retention horizon.
    "cdc_backfill_plan" -> ((s, dir) =>
      ChangeFeed.backfillPlan(ChangeFeed.fromEvents(s, dir))),

    // Delivery-latency SLO report: planted deterministic jitter +
    // straggler cohort; exact rank-pick percentiles per table.
    "cdc_latency_slo" -> ((s, dir) =>
      ChangeFeed.latencySlo(ChangeFeed.fromEvents(s, dir))),

    // SCD type-2 history target: every change becomes a version with
    // a [valid_from, valid_to) interval; delete closes the key.
    "cdc_scd2" -> ((s, dir) =>
      ChangeFeed.scd2History(ChangeFeed.fromEvents(s, dir))),

    // Parallel full-load segmentation: 8 contiguous key ranges of
    // near-equal row counts over orders (DMS parallel-load ranges).
    "cdc_full_load_ranges" -> ((s, dir) =>
      FullLoad.segmentRanges(Tables.load(s, dir, "orders"),
        "o_orderkey", 8)),

    // Log-compaction summary: raw feed vs latest-per-key changelog
    // (tombstones retained), per table.
    "cdc_compacted_log" -> ((s, dir) =>
      ChangeFeed.compactionSummary(ChangeFeed.fromEvents(s, dir),
          Seq("user_id"), Seq(col("ts"), col("event_id")))
        .orderBy(col("table_name"))),
    "events_sessionize"    -> ((s, dir) => Analytics.eventsSessionize(s, dir)),
    "events_funnel"        -> ((s, dir) => Analytics.eventsFunnel(s, dir)),
    "q_window_running"     -> ((s, dir) => Analytics.qWindowRunning(s, dir)),
    "q_pivot"              -> ((s, dir) => Analytics.qPivot(s, dir)),
    "q_median_price"       -> ((s, dir) => Analytics.qMedianPrice(s, dir)),
    "q_profile_table"      -> ((s, dir) => Analytics.qProfileTable(s, dir)),
    "events_retention"     -> ((s, dir) => Analytics.eventsRetention(s, dir)),

    "cdc_apply_changes" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      ChangeFeed.applyChanges(c, Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), col("value").as("last_value"), col("table_name"))
        .orderBy(col("user_id"))
    }),

    "cdc_table_statistics" -> ((s, dir) =>
      TableStatistics.compute(ChangeFeed.fromEvents(s, dir))),

    // Limited-LOB-mode truncation audit (DMS default task settings
    // truncate LOBs at LobMaxSize; the reference replicates a BLOB
    // under those defaults): per source, overflow rows, bytes lost,
    // and the whole-KB budget that would make truncation zero.
    "cdc_lob_truncation" -> ((s, dir) =>
      TableStatistics.lobAudit(Tables.load(s, dir, "documents"),
        col("source"), col("text"), LobBudgetBytes)),

    "cdc_selection_rules" -> ((s, dir) => {
      val docs = graft.Tables.load(s, dir, "documents")
        .withColumn("schema_name", lit("graft"))
        .withColumn("table_name", col("source"))
      val m = TableMapping.Mapping(selectionDemoRules)
      docs.filter(m.predicate(col("schema_name"), col("table_name")))
        .groupBy(col("table_name"))
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("table_name"))
    }),

    "cdc_before_image" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      ChangeFeed.beforeImage(c, Seq("user_id"), Seq(col("ts"), col("event_id")),
          Seq("value", "event_id"))
        .filter(col("op") === "update")
        .select(col("user_id"), col("event_id"), col("value"),
          col("before_value"), col("before_event_id"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "cdc_partition_key" -> ((s, dir) =>
      ChangeFeed.withShard(ChangeFeed.fromEvents(s, dir), 8)
        .groupBy(col("partition_key"), col("shard"))
        .agg(count(lit(1)).as("n_messages"))
        .orderBy(col("partition_key"))),

    "cdc_full_load" -> ((s, dir) =>
      FullLoad.summary(s, dir, TableMapping.Mapping(fullLoadDemoRules))),

    "cdc_windowed_stats" -> ((s, dir) =>
      ChangeFeed.windowedStats(ChangeFeed.fromEvents(s, dir))),

    // The same hourly stats executed THROUGH the streaming engine:
    // file-stream source → watermarked stateful window aggregate →
    // complete-mode sink; the final table must equal the batch
    // formula. Proves the stateful-operator path end-to-end (the
    // envelope roundtrip proves the stateless one).
    "cdc_stream_windowed" -> ((s, dir) =>
      streaming.CdcPipeline.windowedRoundtrip(s, dir)),

    // SCD2 THROUGH the streaming engine: append-only closed
    // versions; the batch history minus open rows is the oracle.
    "cdc_stream_scd2" -> ((s, dir) =>
      streaming.CdcPipeline.scd2Roundtrip(s, dir)),

    // Full-load → CDC cutover THROUGH the streaming machinery: the
    // snapshot image publishes as state v=0 at its read positions,
    // the overlapping stream runs the STANDARD upsert, and the plain
    // (ts, event_id) latest-wins ordering IS the position merge.
    "cdc_stream_handoff" -> ((s, dir) =>
      streaming.CdcPipeline.snapshotHandoffRoundtrip(s, dir,
        "2024-01-29 00:00:00", windowSeconds = 86400)),

    // Stream-stream interval join (watermarked two-sided time range,
    // append mode) — pairs emitted exactly once, state evicted at
    // the range edge; batch interval join is the oracle.
    "events_stream_attribution" -> ((s, dir) =>
      streaming.CdcPipeline.attributionJoinStream(s, dir)),

    // Stream-stream LEFT OUTER interval join: every purchase emits,
    // unattributed ones as watermark-driven null rows (two
    // per-split sentinels advance the min-global watermark);
    // batch left interval join is the oracle.
    "events_stream_attribution_outer" -> ((s, dir) =>
      streaming.CdcPipeline.attributionJoinOuterStream(s, dir)),

    // EventTimeTimeout-driven quiet-user verdicts: the engine emits
    // on watermark passage (absence as signal), state removed on
    // emission; per-user batch aggregate is the oracle.
    "events_stream_quiet" -> ((s, dir) =>
      streaming.CdcPipeline.quietUsersStream(s, dir)),

    // Consecutive-duplicate census per type (the collapse-pass
    // price, measured before anyone deletes data).
    "events_dedup_consecutive" -> ((s, dir) =>
      Analytics.dedupConsecutive(Tables.load(s, dir, "events"))),

    // Exact per-type value percentiles through the two-phase rank
    // (|types| is small — a plain window would one-task each type).
    "events_value_percentiles" -> ((s, dir) =>
      Analytics.valuePercentiles(Tables.load(s, dir, "events"))),

    // Session windows through the streaming engine: native
    // session_window(ts, 30 min) gap-merge; the batch
    // gaps-and-islands formula is the oracle.
    "events_stream_sessions" -> ((s, dir) =>
      streaming.CdcPipeline.sessionRoundtrip(s, dir)),

    // Multi-source conflict resolution: planted diverged replica,
    // latest-commit-wins with priority tie-break — per table the
    // conflicted keys and who won them.
    "cdc_conflict_resolution" -> ((s, dir) =>
      ChangeFeed.conflictResolution(ChangeFeed.fromEvents(s, dir))),

    // Deterministic global training order (hash-rank shuffle) with
    // the per-source interleaving audit — the data-order step after
    // corpus_mix, reproducible across retries and partitioning.
    "corpus_shuffle" -> ((s, dir) =>
      Corpus.shuffleAudit(Tables.load(s, dir, "documents"))),

    "cdc_transactions" -> ((s, dir) =>
      ChangeFeed.commitSeq(ChangeFeed.fromEvents(s, dir))
        .select(col("table_name"), col("event_id"), col("commit_seq"))
        .orderBy(col("table_name"), col("commit_seq"))),

    "cdc_envelope" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      val wrapped = Envelope.wrap(c, col("op"), col("schema_name"),
        col("table_name"), col("ts"), col("event_id"),
        Seq("event_id", "user_id", "value", "props"))
      Envelope.parse(wrapped.select("message", "partition_key"), "message", eventDataSchema)
        .groupBy(
          col("metadata.`record-type`").as("record_type"),
          col("metadata.operation").as("operation"),
          col("metadata.`table-name`").as("table_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("data.user_id")).as("sum_user_id"),
          sum(col("data.value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("operation"), col("table_name"))
    }),

    // Control events through the envelope: the schema-evolution
    // surface (reference run.py:309-315 asserts create/alter/drop
    // control events arrive during CDC). record-type=control comes
    // from Envelope.metadata, and the envelope timestamp's UTC 'Z'
    // rendering is verified against the oracle's strftime.
    "cdc_control_events" -> ((s, dir) => {
      val ctl = SchemaEvolution.controlEvents(ChangeFeed.fromEvents(s, dir))
      val wrapped = Envelope.wrap(ctl, col("op"), col("schema_name"),
        col("table_name"), col("ts"), lit(null).cast("long"),
        Seq("table_name"))
      Envelope.parse(wrapped.select("message"), "message",
          StructType(Seq(StructField("table_name", StringType))))
        .select(
          col("metadata.`record-type`").as("record_type"),
          col("metadata.operation").as("operation"),
          col("metadata.`table-name`").as("table_name"),
          col("metadata.timestamp").as("ts_utc"))
        .orderBy(col("table_name"), col("operation"))
    }),

    // Full envelope: before-image riding IN the message (masked to
    // non-insert ops, stack.py:341-346) + commit-grouped transaction
    // ids (include_transaction_details) — parsed back and audited.
    "cdc_envelope_txn" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      val withB = ChangeFeed.beforeImage(c, Seq("user_id"),
        Seq(col("ts"), col("event_id")), Seq("value", "event_id"))
      // the txn window collapses to #tables partitions; spread back
      // out so the JSON wrap/parse runs on every core
      val t = SchemaEvolution.withTxnId(withB).repartition(col("user_id"))
      val wrapped = Envelope.wrap(t, col("op"), col("schema_name"),
        col("table_name"), col("ts"), col("txn_id"),
        Seq("event_id", "user_id", "value", "props"),
        beforeCols = Seq(
          SchemaEvolution.maskedBefore(col("before_value"), col("op")).as("value"),
          SchemaEvolution.maskedBefore(col("before_event_id"), col("op")).as("event_id")))
      Envelope.parse(wrapped.select("message"), "message", eventDataSchema)
        .groupBy(
          col("metadata.operation").as("operation"),
          col("metadata.`table-name`").as("table_name"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("metadata.`transaction-id`")).as("n_txns"),
          count(col("before_image.value")).as("n_before"))
        .orderBy(col("operation"), col("table_name"))
    }),

    // KMV (k-minimum-values) distinct sketch: cardinality estimation
    // the way a 100 TB pipeline does it — a bounded sketch instead of
    // an exact distinct — built portably from the 60-bit hash so the
    // oracle reproduces the estimate bit-for-bit. Output carries the
    // exact count too, so the result shows the sketch's accuracy.
    "cdc_distinct_sketch" -> ((s, dir) => {
      val k = 64
      val c = ChangeFeed.fromEvents(s, dir)
      val hashed = c.select(col("table_name"),
          Portable.pHash(col("user_id").cast("string")).as("h"))
        .distinct()
      val w = Window.partitionBy(col("table_name")).orderBy(col("h"))
      val kth = hashed.withColumn("rn", row_number().over(w))
        .filter(col("rn") === k)
        .select(col("table_name"), col("h").as("kth"))
      val exact = c.groupBy(col("table_name"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      kmvEstimate(k)(exact.join(kth, Seq("table_name"), "left"))
    }),

    // Same KMV statistic through the native TypedImperativeAggregate:
    // ONE aggregate pass with a bounded k-entry buffer and map-side
    // partial merge — no distinct relation shuffled, no per-group
    // sort. Value-identical to the relational twin above (same
    // deterministic order statistic), which is exactly what the
    // shared oracle asserts.
    "cdc_distinct_sketch_agg" -> ((s, dir) => {
      val k = 64
      val c = ChangeFeed.fromEvents(s, dir)
      kmvEstimate(k)(c.groupBy(col("table_name"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"),
          graft.functions.KmvSketch.kmvKth(
            Portable.pHash(col("user_id").cast("string")), k).as("kth")))
    }),

    // Hot-key (skew) aggregation: two-phase salted aggregate — the
    // pattern that keeps a single hot partition key from pinning one
    // reducer at 100 TB. Salt = portable hash of the event id, so the
    // oracle can replay the exact two-phase plan (decimal partials
    // make the re-aggregation order-independent).
    "cdc_salted_stats" -> ((s, dir) => {
      val nSalts = 8
      val c = ChangeFeed.fromEvents(s, dir)
        .withColumn("salt", Portable.pHash(col("event_id").cast("string")) % nSalts)
      val partial = c.groupBy(col("partition_key"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(18,2)")).as("pv"))
      partial.groupBy(col("partition_key"))
        .agg(sum(col("pn")).as("n_events"),
          sum(col("pv")).cast("double").as("total_value"),
          count(lit(1)).as("n_salts_used"))
        .orderBy(col("partition_key"))
    }),

    // AS-OF join (custom LogicalPlan + Strategy + sort-merge exec,
    // graft.plans): each event joins the most recent signup-version
    // of its user at event time — the CDC dimension-enrichment shape.
    "events_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val versions = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
          col("value").as("rate"))
      graft.plans.AsOf.join(ev, versions,
          Seq(ev("user_id")), Seq(versions("r_user_id")),
          ev("ts"), versions("r_ts"))
        .agg(
          count(lit(1)).as("n"),
          count(col("r_ts")).as("n_matched"),
          sum(col("rate").cast("decimal(18,2)")).cast("double").as("sum_rate"),
          countDistinct(when(col("r_ts").isNotNull, col("user_id"))).as("n_users_matched"))
    }),

    // Transformation rules: table renames re-route the change feed,
    // column add/remove/rename reshape the payload (DMS rule-type
    // "transformation").
    "cdc_transform_rules" -> ((s, dir) => {
      val t = TableMapping.Transformations(Seq(
        TableMapping.RenameTable("users_1", "u1"),
        TableMapping.RenameTable("users_3", "u3"),
        TableMapping.RenameColumn("value", "amount"),
        TableMapping.AddColumn("origin",
          concat(col("schema_name"), lit("."), col("table_name"))),
        TableMapping.RemoveColumn("props")))
      t(ChangeFeed.fromEvents(s, dir))
        .groupBy(col("table_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("amount").cast("decimal(18,2)")).cast("double").as("sum_amount"),
          countDistinct(col("origin")).as("n_origins"))
        .orderBy(col("table_name"))
    }),

    // Consumer semantics (run.py:156-185): parse the envelope stream,
    // drop messages before a timestamp threshold, count per shard.
    "cdc_consume" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      val wrapped = Envelope.wrap(c, col("op"), col("schema_name"),
        col("table_name"), col("ts"), col("event_id"),
        Seq("event_id", "user_id", "value", "props"))
      val feed = Envelope.parse(wrapped.select("message", "partition_key"),
          "message", eventDataSchema)
        .select(col("partition_key"), col("metadata.timestamp").as("event_ts"))
      graft.sources.EnvelopeSource.consumeSummary(feed, consumeThreshold)
        .orderBy(col("partition_key"))
    }),

    // Bounded-paging consumption (run.py:182-192): get_records pages
    // of 50, early-stop once 600 post-threshold records accumulated —
    // the consumed set is a page-aligned prefix per shard, not the
    // whole stream.
    "cdc_consume_paged" -> ((s, dir) =>
      graft.sources.EnvelopeSource.consumePaged(
          ChangeFeed.fromEvents(s, dir), consumeThreshold,
          expectedCount = 600L)
        .orderBy(col("partition_key"))),

    // Record-level consumer view (run.py:194-199): the reference
    // prints each kept record's payload MERGED with its partition
    // key — the row-by-row debugging view next to the consume
    // summaries. Same threshold filter; one output row per message.
    "cdc_consume_records" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      val wrapped = Envelope.wrap(c, col("op"), col("schema_name"),
        col("table_name"), col("ts"), col("event_id"),
        Seq("event_id", "user_id", "value", "props"))
      val feed = Envelope.parse(wrapped.select("message", "partition_key"),
          "message", eventDataSchema)
        .select(col("partition_key"),
          col("metadata.timestamp").as("event_ts"),
          col("metadata.operation").as("operation"),
          col("metadata.`table-name`").as("table_name"),
          col("data"))
      graft.sources.EnvelopeSource.consumeRecords(feed, consumeThreshold)
        .orderBy(col("partition_key"), col("event_id"))
    }),

    // Task-scoped table statistics (describe_table_statistics takes a
    // task_arn — run.py:202-209, polled for BOTH tasks at
    // run.py:262-265/317-321): each demo task's selection rules
    // evaluated over the source catalog, counts from ONE shared
    // per-table aggregate of the feed; a rule-selected table with no
    // delivered changes (novels) reports all-zero counts, as DMS does.
    "cdc_task_statistics" -> ((s, dir) =>
      TableStatistics.taskStatistics(ChangeFeed.fromEvents(s, dir),
        taskDemoTasks, taskDemoCatalog)),

    // The kinesis target's OTHER partition-key-type: the same feed
    // wrapped under schema-table AND transaction-id keys (the key
    // type rides each message's metadata and is read back from it),
    // shard routing compared per shard — schema-table pins each
    // table's whole volume to one shard, transaction-id keying
    // spreads a hot table across shards (the stream-layer remedy for
    // what cdc_hot_keys measures).
    "cdc_partition_key_txn" -> ((s, dir) => {
      // globally-unique commit id: table-local minute-commit rank
      // composed with the table index (binlog txn ids are global;
      // withTxnId's rank alone is only table-unique)
      val ev = SchemaEvolution.withTxnId(ChangeFeed.fromEvents(s, dir))
        .withColumn("gtxn", col("txn_id") * 4 + pmod(col("user_id"), lit(4)))
      def wrapOne(kt: Envelope.PartitionKeyType) =
        Envelope.wrap(ev, col("op"), col("schema_name"), col("table_name"),
            col("ts"), col("gtxn"), Seq("event_id"), keyType = kt)
          .select(col("message"), col("partition_key"))
      wrapOne(Envelope.SchemaTable).unionByName(wrapOne(Envelope.TransactionId))
        .withColumn("kt", from_json(col("message"),
          Envelope.messageSchema(eventDataSchema))
          .getField("metadata").getField("partition-key-type"))
        .withColumn("shard", Portable.pHash(col("partition_key")) % 8)
        .groupBy(col("shard"))
        .agg(
          sum(when(col("kt") === "schema-table", 1L).otherwise(0L))
            .as("n_schema_table"),
          countDistinct(when(col("kt") === "schema-table",
            col("partition_key"))).as("n_keys_schema_table"),
          sum(when(col("kt") === "transaction-id", 1L).otherwise(0L))
            .as("n_txn"),
          countDistinct(when(col("kt") === "transaction-id",
            col("partition_key"))).as("n_keys_txn"))
        .orderBy(col("shard"))
    }),

    // Full MariaDB type palette through the envelope: every type the
    // reference replicates survives wrap → JSON → parse value-exactly
    // (the *_ok columns count roundtrip equality row by row; the
    // numeric aggregates recompute independently in the oracle).
    "cdc_envelope_types" -> ((s, dir) => {
      val pal = TypePalette.palette(Tables.load(s, dir, "part"))
      val wrapped = Envelope.wrap(pal, lit("insert"), lit("graft"),
        lit("palette"), col("ts"), col("id"), TypePalette.paletteCols)
      val parsed = Envelope.parse(wrapped, "message", TypePalette.paletteSchema)
      parsed.agg(
        count(lit(1)).as("n"),
        sum(col("data.tiny").cast("long")).as("sum_tiny"),
        // UNSIGNED palette: sums only reconcile if values above the
        // signed range of the declared MariaDB width survived intact
        sum(col("data.utiny").cast("long")).as("sum_utiny"),
        sum(col("data.usmall").cast("long")).as("sum_usmall"),
        sum(col("data.uint")).as("sum_uint"),
        count(when(col("data.utiny") === col("utiny") &&
          col("data.usmall") === col("usmall") &&
          col("data.uint") === col("uint"), 1)).as("n_unsigned_ok"),
        sum(col("data.dec")).cast("double").as("sum_dec"),
        count(when(col("data.flag"), 1)).as("n_flag"),
        countDistinct(col("data.enum_v")).as("n_enum"),
        sum(length(col("data.txt"))).as("sum_txt_len"),
        count(when(col("data.blob") === col("blob"), 1)).as("n_blob_ok"),
        count(when(col("data.ts") === col("ts"), 1)).as("n_ts_ok"),
        count(when(col("data.d") === col("d"), 1)).as("n_d_ok"),
        count(when(col("data.f32") === col("f32"), 1)).as("n_f32_ok"),
        count(when(col("data.f64") === col("f64"), 1)).as("n_f64_ok"),
        count(when(col("data.dec") === col("dec"), 1)).as("n_dec_ok"))
    }),

    // Incremental view maintenance: the aggregate a CDC consumer
    // maintains by folding deltas (using before-images) must equal
    // recomputation over the materialized state — both computed and
    // compared in one result (`maintained_ok`).
    "cdc_incremental_agg" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      val keys = Seq("table_name", "user_id")
      val ord = Seq(col("ts"), col("event_id"))
      val inc = ChangeFeed.incrementalSum(c, "table_name", keys, ord, "value")
      val full = ChangeFeed.applyChanges(c, keys, ord)
        .groupBy(col("table_name"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("full_sum_d"),
          count(lit(1)).as("n_live_keys"))
      inc.join(full, Seq("table_name"), "left")
        .select(col("table_name"),
          col("inc_sum_d").cast("double").as("inc_sum"),
          coalesce(col("full_sum_d"), lit(0).cast("decimal(18,2)"))
            .cast("double").as("full_sum"),
          (col("inc_sum_d") ===
            coalesce(col("full_sum_d"), lit(0).cast("decimal(18,2)")))
            .as("maintained_ok"),
          col("n_changes"),
          coalesce(col("n_live_keys"), lit(0L)).as("n_live_keys"))
        .orderBy(col("table_name"))
    }),

    // ADD COLUMN ... DEFAULT drift (lib/query.py:65): pre-ALTER
    // messages lack the column entirely and must surface the declared
    // default; post-ALTER messages keep their explicit value —
    // including explicit null. Event-id parity splits the feed into a
    // pre-ALTER half (wrapped without is_stock) and a post-ALTER half
    // (wrapped with it, null when user_id % 3 == 0).
    "cdc_drifted_defaults" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      val pre = Envelope.wrap(c.filter(col("event_id") % 2 === 0),
        col("op"), col("schema_name"), col("table_name"), col("ts"),
        col("event_id"), Seq("event_id", "user_id", "value"))
      val post = Envelope.wrap(
        c.filter(col("event_id") % 2 === 1)
          .withColumn("is_stock",
            when(col("user_id") % 3 === 0, lit(null).cast("boolean"))
              .otherwise(col("user_id") % 2 === 0)),
        col("op"), col("schema_name"), col("table_name"), col("ts"),
        col("event_id"), Seq("event_id", "user_id", "value", "is_stock"))
      val msgs = pre.select("message").unionByName(post.select("message"))
      val evolved = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("is_stock", BooleanType)))
      SchemaEvolution.parseDrifted(msgs, "message", evolved,
          Map("is_stock" -> lit(true)))
        .groupBy(col("metadata.`table-name`").as("table_name"))
        .agg(count(lit(1)).as("n"),
          count(when(col("data.is_stock") === true, 1)).as("n_true"),
          count(when(col("data.is_stock") === false, 1)).as("n_false"),
          count(when(col("data.is_stock").isNull, 1)).as("n_null"))
        .orderBy(col("table_name"))
    }),

    // Dead-letter channel (apply_dms_exception, run.py:296-297):
    // change events failing apply-time validation are routed to an
    // exception envelope; the summary is the exception table a task
    // operator would page on.
    "cdc_exceptions" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      Exceptions.exceptions(c, exceptionDemoRules,
          Seq("event_id", "user_id", "value", "props"))
        .groupBy(col("table_name"), col("rule"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_event_id"),
          max(col("event_id")).as("max_event_id"))
        .orderBy(col("table_name"), col("rule"))
    }),

    // --- §2C LLM-data-pipeline operators --------------------------

    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          col("n_distinct_tokens"), col("n_subtokens"), col("avg_token_len"))
        .orderBy(col("doc_id"))),

    "text_fingerprint" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.fingerprint(docs, col("text"))
        .join(TextAnalysis.rollingFingerprint(docs), Seq("doc_id"), "left")
        .select(col("doc_id"), col("fp"), col("fp60"), col("fp_roll"))
        .orderBy(col("doc_id"))
    }),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
          col("avg_token_len"), col("quality_score"))
        .orderBy(col("doc_id"))),

    // UTF-8 byte-vs-char census (mojibake / transliteration gauge);
    // pure integer map-only arithmetic.
    "text_ascii_profile" -> ((s, dir) =>
      TextAnalysis.asciiProfile(Tables.load(s, dir, "documents"),
        col("text"))),

    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id") +: col("lang") +: col("pred_lang") +:
          TextAnalysis.markers.map { case (l, _) => col(s"score_$l") }: _*)
        .orderBy(col("doc_id"))),

    "text_term_stats" -> ((s, dir) =>
      TextAnalysis.termStats(Tables.load(s, dir, "documents"), col("text"))
        .orderBy(col("doc_freq").desc, col("term_freq").desc, col("tok"))),

    // Code-switching / concatenation-artifact detector: language-ID
    // the whole doc AND each half of its token stream; halves that
    // disagree with evidence ('mixed') are the docs every
    // per-language consumer mis-scores.
    "text_lang_consistency" -> ((s, dir) =>
      TextAnalysis.langConsistency(Tables.load(s, dir, "documents"),
          col("text"))
        .orderBy(col("doc_id"))),

    // DSIR-style targeted selection: hashed-unigram importance
    // weights (target = src0's distribution vs the raw pool),
    // exact-integer log-ratio, top-20% rank cut; per-source census.
    "corpus_dsir_select" -> ((s, dir) =>
      Corpus.dsirSelect(Tables.load(s, dir, "documents"), col("text"),
        targetSource = "src0")),

    // Lexical retrieval baseline: cosine top-k over feature-hashed
    // integer TF-IDF vectors (no embeddings involved).
    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(Tables.load(s, dir, "documents"))),

    // Term-distribution drift between ingestion halves (the text
    // twin of embed_epoch_drift): top drifted terms, integer-exact.
    "text_term_drift" -> ((s, dir) =>
      TextAnalysis.termDrift(Tables.load(s, dir, "documents"))),

    // BPE first-merge census: adjacent char-pair counts over the
    // vocabulary, weighted by token frequency; top 50.
    "text_bpe_pairs" -> ((s, dir) =>
      TextAnalysis.bpePairStats(Tables.load(s, dir, "documents"),
        col("text"), 50)),

    // BPE merge loop: 8 rounds of census -> argmax -> contraction over
    // the delimited vocabulary; output = the deterministic merge table
    // (round, pair, count) a tokenizer trainer would ship.
    "text_bpe_train" -> ((s, dir) =>
      TextAnalysis.bpeTrain(Tables.load(s, dir, "documents"),
        col("text"), 8)),

    // Apply the trained merges: per-source compression profile
    // (pieces/token, chars/piece) with byte-fallback for untrained
    // tokens — the trainer's payoff measured on its own corpus.
    "text_bpe_encode" -> ((s, dir) =>
      TextAnalysis.bpeEncode(Tables.load(s, dir, "documents"),
        col("text"), 8)),

    // Merges-vs-compression knob curve: per merge round the corpus
    // piece total / pieces-per-token over the trained vocabulary —
    // the "how many merges is enough" elbow of the tokenizer family.
    "text_bpe_compression" -> ((s, dir) =>
      TextAnalysis.bpeCompressionCurve(Tables.load(s, dir, "documents"),
        col("text"), 8)),

    // Tokenizer fertility per predicted language: pieces per word
    // under the corpus-trained merge table, keyed by langid — the
    // multilingual-tax report (an English-dominant census spends its
    // merges on English pairs; other languages pay more pieces).
    "text_bpe_fertility" -> ((s, dir) =>
      TextAnalysis.bpeFertility(Tables.load(s, dir, "documents"),
        col("text"), 8)),

    // Hapax-legomena share per source (lexical health gauge).
    "text_hapax" -> ((s, dir) =>
      TextAnalysis.hapaxProfile(Tables.load(s, dir, "documents"),
        col("text"))),

    // Top-N vocabulary coverage elbow at power-of-two budgets: the
    // tokenizer-sizing curve (rank + running mass from ONE range
    // exchange via Ranks.groupedWithSum).
    "text_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.load(s, dir, "documents"),
        col("text"))),

    // CCNet triage: language × perplexity head/middle/tail tertiles
    // (NTILE-parity rank cuts per predicted language, two-phase rank).
    "corpus_ccnet_buckets" -> ((s, dir) =>
      TextAnalysis.ccnetBuckets(Tables.load(s, dir, "documents"),
        col("text"))),

    // Code-vs-prose routing gate: exact symbol/digit censuses over
    // RAW text, integer 5% verdict — map-only.
    "text_code_detect" -> ((s, dir) =>
      TextAnalysis.codeDetect(Tables.load(s, dir, "documents"),
        col("text"))),

    "text_topk_terms" -> ((s, dir) =>
      TextAnalysis.topKTerms(Tables.load(s, dir, "documents"),
          col("source"), col("text"), 10)
        .orderBy(col("group_key"), col("rk"))),

    // Length-bias audit of the quality signal: integer-exact Pearson
    // r between token count and the gated per-mille quality.
    "corpus_quality_length_corr" -> ((s, dir) =>
      TextAnalysis.qualityLengthCorr(Tables.load(s, dir, "documents"),
        col("text"))),

    // Character-bigram LM surprise (encoding-level gibberish gate,
    // one level below the word-order bigram LM).
    "text_char_lm" -> ((s, dir) =>
      TextAnalysis.charLm(Tables.load(s, dir, "documents"), col("text"))),

    // Fano-factor burstiness of the top-df terms per source —
    // function words (VMR≈1) vs topical clumpers (VMR≫1).
    "text_burstiness" -> ((s, dir) =>
      TextAnalysis.burstiness(Tables.load(s, dir, "documents"),
          col("text"), 10)
        .orderBy(col("source"), col("rk"))),

    // Integer-octave Zipf census: rank-frequency mass per doubling
    // rank bucket + octave-over-octave decay (no libm in the compare).
    "text_zipf_octaves" -> ((s, dir) =>
      TextAnalysis.zipfOctaves(Tables.load(s, dir, "documents"),
        col("text"))),

    // Per-source bigram keyphrases (tf × integer idf) — the
    // multi-word topical identity unigram keywords can't see.
    "text_keyphrase_bigrams" -> ((s, dir) =>
      TextAnalysis.keyphrases(Tables.load(s, dir, "documents"),
        col("text"))),

    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.load(s, dir, "documents"))
        .orderBy(col("fp"))),

    // Estimated-vs-exact Jaccard calibration per agreement bucket —
    // the precision curve bands/rows-per-band are tuned against.
    "dedup_lsh_calibration" -> ((s, dir) =>
      Dedup.lshCalibration(Tables.load(s, dir, "documents"))
        .orderBy(col("n_match"))),

    // Batch-vs-snapshot incremental dedup — the daily-ingest shape
    // (dedup the new crawl against the standing index, not the world).
    "dedup_incremental" -> ((s, dir) =>
      Dedup.incrementalSummary(Tables.load(s, dir, "documents"))
        .orderBy(col("source"))),

    // Incremental NEAR-dup ingest: batch docs probe the standing band
    // index (batch x index + within-batch, never snapshot x snapshot)
    // with exact-integer near-dup verification per source.
    "dedup_minhash_incremental" -> ((s, dir) =>
      Dedup.incrementalMinhash(Tables.load(s, dir, "documents"))
        .orderBy(col("source"))),

    // Wide-SimHash near-dup pairs: pigeonhole band candidates +
    // integer hamming verify.
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashNearPairs(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // Blocked exact similarity join: all within-label pairs above τ.
    "sim_pairs_threshold" -> ((s, dir) =>
      Similarity.pairsAboveThreshold(Tables.load(s, dir, "embeddings"))
        .orderBy(col("label"), col("vec_id_a"), col("vec_id_b"))),

    // Int8 re-quantization error report per label (all-int64 math).
    "embed_quantize" -> ((s, dir) =>
      Similarity.int8QuantStats(Tables.load(s, dir, "embeddings"))
        .orderBy(col("label"))),

    // Per-label norm/dimension sanity profile — the encoder-drift
    // gate run before any similarity math.
    "embed_norm_profile" -> ((s, dir) =>
      Similarity.normProfile(Tables.load(s, dir, "embeddings"))
        .orderBy(col("label"))),

    // Token-level blocklist cleaning gate, per-source removal stats.
    "corpus_blocklist" -> ((s, dir) =>
      Corpus.blocklistSummary(Tables.load(s, dir, "documents"),
          Seq("dup", "slow"))
        .orderBy(col("source"))),

    // Hash-disjoint train/val/test assignment, summarized per stratum.
    "corpus_split" -> ((s, dir) =>
      Corpus.splitAssigned(Tables.load(s, dir, "documents"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("source"), col("split"))),

    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // The hot-bucket-capped candidate path at a cap (3) that BITES on
    // this corpus (sf0.01 has band buckets up to 5, sf0.1 up to 17),
    // so the fair-order member selection — not just the no-op case —
    // is what the oracle checks. Production pairs this with the
    // census below at the same cap: never cap silently.
    "dedup_minhash_capped" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.load(s, dir, "documents"), DemoCap)
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // The dropped-mass report for the cap above: per band, hot
    // buckets and the candidate-pair work a cap of 3 removes.
    "dedup_cap_census" -> ((s, dir) =>
      Dedup.minhashCapCensus(Tables.load(s, dir, "documents"), DemoCap)),

    // The cap's RESULT cost (the census prices its WORK): per cap
    // width, candidate and near-dup pairs surviving vs uncapped —
    // the tuning curve that justifies a production cap choice.
    "dedup_cap_recall_curve" -> ((s, dir) =>
      Dedup.capRecallCurve(Tables.load(s, dir, "documents"))),

    // The curve's production shape: the corpus_sample per-mille hash
    // gate thins the documents BEFORE the deliberately-uncapped pair
    // join (quadratic shrink in the rate); the result is the exact
    // curve of the sampled sub-corpus.
    "dedup_cap_curve_sampled" -> ((s, dir) =>
      Dedup.capRecallCurve(Tables.load(s, dir, "documents"),
        samplePerMille = Dedup.CurveSamplePerMille)),

    // Same report for the graph family's SRP buckets at the
    // OPERATIVE cap (KnnBucketCap = 512, the knnEdges default):
    // all-zero dropped columns here IS the evidence the cap never
    // binds at bench scale — and prices exactly what it drops on a
    // clone-planted corpus.
    "sim_knn_cap_census" -> ((s, dir) =>
      Similarity.knnCapCensus(Tables.load(s, dir, "embeddings"))),

    // Embedding-side recall curve: small widths bite on the
    // testdata's SRP buckets, the last row is the operative
    // SrpBucketCap — recall 1.0 there is the "never binds on benign
    // data" evidence as a RESULT (census above: as work).
    "dedup_embedding_cap_curve" -> ((s, dir) =>
      Dedup.embeddingCapRecallCurve(Tables.load(s, dir, "embeddings"))),

    // Sample-bounded embedding curve: deterministic vec_id hash gate
    // before quantization — the production shape of the uncapped SRP
    // pair join.
    "dedup_embedding_cap_curve_sampled" -> ((s, dir) =>
      Dedup.embeddingCapRecallCurve(Tables.load(s, dir, "embeddings"),
        samplePerMille = Dedup.CurveSamplePerMille)),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    "dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(Tables.load(s, dir, "documents"))
        .orderBy(col("cluster_id"))),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingPairs(Tables.load(s, dir, "embeddings"))
        .orderBy(col("vec_id_a"), col("vec_id_b"))),

    "sim_topk_bruteforce" -> ((s, dir) =>
      Similarity.topKBruteForce(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // Hard-negative mining: top-3 most-similar DIFFERENT-label
    // neighbors per probe (contrastive-training draw).
    "embed_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // Semi-hard triplet mining (FaceNet rule): hardest positive +
    // semi-hard negative + the margin the loss would push on.
    "embed_triplet_mining" -> ((s, dir) =>
      Similarity.tripletMining(Tables.load(s, dir, "embeddings"))),

    "sim_ann_lsh" -> ((s, dir) =>
      Similarity.topKAnnLsh(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // Multi-probe LSH: +Hamming-1 bucket probes per band — recall
    // without more tables; index memory identical to sim_ann_lsh.
    "sim_ann_lsh_multiprobe" -> ((s, dir) =>
      Similarity.topKAnnMultiprobe(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // Recall gauge for the multi-probe index: candidates are a strict
    // superset of plain LSH, so this row dominates sim_ann_recall.
    "sim_ann_multiprobe_recall" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.recallAtK(
          Similarity.topKBruteForce(embs),
          Similarity.topKAnnMultiprobe(embs))
        .orderBy(col("probe_id"))
    }),

    // Binary-Hamming ANN: the 1-bit budget point of the quantization
    // ladder — 16-byte signatures, popcount-only scan.
    "sim_ann_hamming" -> ((s, dir) =>
      Similarity.topKAnnHamming(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // What the last compression step costs: recall@k of the
    // sign-bit Hamming ranking vs the exact cosine top-k.
    "embed_binary_recall" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.recallAtK(
          Similarity.topKBruteForce(embs),
          Similarity.topKAnnHamming(embs))
        .orderBy(col("probe_id"))
    }),

    // Two-stage serving: Hamming top-32 prefilter, exact cosine
    // re-rank — float reads drop to 32 candidates per probe.
    "sim_ann_hamming_rerank" -> ((s, dir) =>
      Similarity.topKAnnHammingRerank(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // What the re-rank buys back: recall@k of the two-stage pipeline
    // (spec-pinned to dominate the plain-Hamming gauge per probe).
    "embed_rerank_recall" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.recallAtK(
          Similarity.topKBruteForce(embs),
          Similarity.topKAnnHammingRerank(embs))
        .orderBy(col("probe_id"))
    }),

    "sim_ann_ivf" -> ((s, dir) =>
      Similarity.topKAnnIvf(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // ANN quality gauge: recall@k of the LSH index against the exact
    // brute-force ranking — the number you tune bands against.
    "sim_ann_recall" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.recallAtK(
          Similarity.topKBruteForce(embs),
          Similarity.topKAnnLsh(embs))
        .orderBy(col("probe_id"))
    }),

    // Recall gauge for the IVF index (the LSH one is sim_ann_recall):
    // nProbe=2 over 10 cells trades recall for a 5x candidate cut —
    // this row is the measured cost of that trade.
    "sim_ann_ivf_curve" -> ((s, dir) =>
      Similarity.ivfRecallCurve(Tables.load(s, dir, "embeddings"))),

    "sim_ann_ivf_recall" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.recallAtK(
          Similarity.topKBruteForce(embs),
          Similarity.topKAnnIvf(embs))
        .orderBy(col("probe_id"))
    }),

    // Matryoshka truncation gauge: recall@k of the 16-component
    // prefix ranking vs the full 64-dim exact top-k.
    "embed_prefix_recall" -> ((s, dir) =>
      Similarity.prefixRecall(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"))),

    // Matryoshka trade-off curve: recall@k per probe at prefix
    // widths {4,8,16,32} — the byte-budget knee finder.
    "embed_prefix_curve" -> ((s, dir) =>
      Similarity.prefixRecallCurve(Tables.load(s, dir, "embeddings"))),

    // Scalar-quantization recall curve: recall@k at {2,4,6,8}-bit
    // symmetric requantization — what embed_quantize's err_ppm does
    // to retrieval, the bytes-per-component budget knee.
    "embed_quantize_recall" -> ((s, dir) =>
      Similarity.quantRecallCurve(Tables.load(s, dir, "embeddings"))),

    // MMR diversified re-ranking: k greedy picks from the top-C
    // candidates, λ·rel − (1−λ)·max-sim-to-selected; the serving
    // re-rank stage over any of the ANN indexes' raw neighbors.
    "embed_mmr_diversify" -> ((s, dir) =>
      Similarity.mmrDiversify(Tables.load(s, dir, "embeddings"))),

    // Hybrid retrieval: Reciprocal-Rank Fusion of the vector top-k
    // and the lexical TF-IDF top-k (doc_id = vec_id), rrf =
    // sum of 1/(60 + rank) over the rankings holding the candidate.
    "sim_hybrid_rrf" -> ((s, dir) =>
      Similarity.hybridRrf(Tables.load(s, dir, "embeddings"),
        Tables.load(s, dir, "documents"))),

    // Embedding collision census: bitwise-identical quantized
    // vectors per label (an upstream-dedup-failure smoke signal).
    "embed_exact_dups" -> ((s, dir) => {
      val qv = Tables.load(s, dir, "embeddings")
        .select(col("label"), col("vec_id"),
          graft.ml.Vectors.quantize(col("embedding")).as("q"))
      qv.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          countDistinct(col("q")).as("n_distinct"))
        .withColumn("n_dup_vecs", col("n_vecs") - col("n_distinct"))
        .orderBy(col("label"))
    }),

    // Mutual-kNN census over the LSH candidate graph: per label the
    // edge count and the reciprocated share (hubness gauge).
    "sim_knn_graph" -> ((s, dir) =>
      Similarity.knnGraphStats(Tables.load(s, dir, "embeddings"))),

    // Fixed-point PageRank over the kNN graph: top-20 hub exemplars
    // (integer 1e-12 rank units — no float sums in the compare).
    "sim_pagerank" -> ((s, dir) =>
      Similarity.pageRank(Tables.load(s, dir, "embeddings"))),

    // k-core peeling census of the kNN graph: how fast the corpus
    // graph erodes when low-degree periphery is stripped.
    "sim_knn_kcore" -> ((s, dir) =>
      Similarity.knnKcore(Tables.load(s, dir, "embeddings"))),

    // Triangle/wedge closure census per label: degree-oriented
    // (compact-forward) enumeration, hub-safe at any scale.
    "sim_knn_triangles" -> ((s, dir) =>
      Similarity.knnTriangles(Tables.load(s, dir, "embeddings"))),

    // Per-label anisotropy (‖mean‖²/mean‖v‖²): the common-direction
    // artifact gauge; exact integer moments, one double expression.
    "embed_anisotropy" -> ((s, dir) =>
      Similarity.anisotropy(Tables.load(s, dir, "embeddings"))),

    // Graph-walk ANN (DiskANN/HNSW family): T-hop beam search over
    // the kNN graph from a fixed entry vertex; final beam per probe.
    "sim_ann_graph" -> ((s, dir) =>
      Similarity.graphSearch(Tables.load(s, dir, "embeddings"))),

    // The graph index's recall gauge vs the exact ranking — fourth
    // geometry on the same measuring stick (LSH / IVF / PQ / graph).
    "sim_ann_graph_recall" -> ((s, dir) =>
      Similarity.graphSearchRecall(Tables.load(s, dir, "embeddings"))),

    // efSearch-style tuning curve: recall@k per walk length, three
    // snapshots of ONE traversal.
    "sim_ann_graph_curve" -> ((s, dir) =>
      Similarity.graphSearchCurve(Tables.load(s, dir, "embeddings"))),

    // Corpus-level media census: per (source, kind) the doc count
    // and total container bytes — "what's in my multimodal corpus".
    "multimodal_mix" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Binary.mediaPayload(docs)
        .withColumn("n_bytes", length(col("payload")).cast("long"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .withColumn("kind",
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
        .groupBy(col("source"), col("kind"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"))
        .orderBy(col("source"), col("kind"))
    }),

    "multimodal_meta" -> ((s, dir) =>
      Binary.withMeta(Binary.withPayload(Tables.load(s, dir, "documents")))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).as("total_bytes"),
          countDistinct(col("digest")).as("n_digests"))
        .orderBy(col("kind"))),

    // End-to-end corpus cleaning: the composition a training-data
    // pipeline actually runs — quality gate + language ID + exact-dup
    // canonicalization in ONE pass over documents (all three reuse
    // the same scan; only min/max/count aggregates so doubles stay
    // order-independent).
    "corpus_clean" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = TextAnalysis.langId(
        TextAnalysis.quality(docs, col("text")), col("text"))
        .withColumn("fp", md5(Portable.normText(col("text"))))
      val canonical = scored.withColumn("rn",
        row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      canonical
        .filter(col("quality_score") >= 0.5 && col("rn") === 1)
        .groupBy(col("source"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("quality_score")).as("min_q"),
          max(col("quality_score")).as("max_q"))
        .orderBy(col("source"), col("pred_lang"))
    }),

    // The 1→N decode shape end-to-end, REAL: video payloads fan out
    // one row per Y4M frame actually walked in the bytes — true frame
    // offsets, per-frame content and luma-plane checksums — and
    // image/audio pass through anchored at their located content.
    // Oracle-checked because the synthesized media content is a pure
    // function of doc_id (same contract as multimodal_decode); the
    // sampler itself never sees the formulas.
    "multimodal_frames" -> ((s, dir) =>
      Binary.frameSample(Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // Deterministic stratified sampling: portable-hash gate per
    // (source, doc_id) with per-stratum per-mille rates — stable
    // under retries/repartitioning, reproducible in the oracle.
    "corpus_sample" -> ((s, dir) =>
      Corpus.sampled(Tables.load(s, dir, "documents"),
          Map("src1" -> 500, "src2" -> 0), defaultPerMille = 100)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("source"))),

    // Importance-weighted sampling: keep-probability = quality score
    // (per-mille), deterministic hash gate; per-source yield audit.
    "corpus_weighted_sample" -> ((s, dir) =>
      Corpus.weightedSample(Tables.load(s, dir, "documents"))),

    // Benchmark decontamination: 3-gram overlap of every training doc
    // against the eval stratum (source=src0 stands in for a held-out
    // benchmark) — the leakage check a training pipeline gates on.
    "corpus_decontaminate" -> ((s, dir) =>
      Corpus.decontaminationScores(Tables.load(s, dir, "documents"),
          col("source") === "src0")
        .orderBy(col("doc_id"))),

    // NEAR-dup decontamination: the MinHash banding pipeline run
    // ACROSS the train/eval boundary — candidates from shared band
    // buckets, exact-Jaccard verify, explicit zeros for clean docs.
    "corpus_fuzzy_decontaminate" -> ((s, dir) =>
      Corpus.fuzzyDecontaminationScores(Tables.load(s, dir, "documents"),
          col("source") === "src0")
        .orderBy(col("doc_id"))),

    // Gopher hard-rule census (Rae et al. 2021 §A1.1 subset): per
    // source which rule rejects how many docs, and the all-rules
    // survivor count — the per-rule view a pipeline reads before
    // adopting the published gate.
    "corpus_gopher_rules" -> ((s, dir) =>
      Corpus.gopherRules(Tables.load(s, dir, "documents"), col("text"))),

    // Reliability diagram of the soft quality score vs the Gopher
    // hard gate: exact global score deciles (two-phase rank + exact
    // NTILE), per-bin all-rules pass rate.
    "corpus_quality_calibration" -> ((s, dir) =>
      Corpus.qualityCalibration(Tables.load(s, dir, "documents"), col("text"))
        .orderBy(col("bin"))),

    // Contamination-sensitivity curve: the overlap gate swept across
    // n-gram widths {3, 8, 13} (13 = the GPT-3 decontamination
    // width) — the table a pipeline reads to pick its gate; the
    // corpus tokenizes once, each width slices the cached arrays.
    "corpus_contamination_curve" -> ((s, dir) =>
      Corpus.contaminationCurve(Tables.load(s, dir, "documents"),
        col("source") === "src0")),

    // Greedy contiguous token-budget packing: the batch-manifest step
    // between cleaned documents and training batches.
    "corpus_pack" -> ((s, dir) =>
      Corpus.packSummary(Tables.load(s, dir, "documents"), budgetTokens = 2048)
        .orderBy(col("source"), col("bin"))),

    // Split-leakage audit: exact-dup fingerprints crossing the
    // train/val/test boundary (id-hash splitting's blind spot).
    "corpus_split_leakage" -> ((s, dir) =>
      Corpus.splitLeakage(Tables.load(s, dir, "documents"))),

    // Packing-efficiency gauge: greedy bins vs the ceil(sum/budget)
    // lower bound; says whether smarter packing buys step-count.
    "corpus_pack_efficiency" -> ((s, dir) =>
      Corpus.packEfficiency(Tables.load(s, dir, "documents"),
        budgetTokens = 2048)),

    // Fixed-window token chunking with overlap: the doc→sequence
    // fan-out (map-only, fingerprinted per chunk for passage dedup).
    "corpus_chunks" -> ((s, dir) =>
      Corpus.chunked(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Per-label embedding centroids through the native vec_sum
    // aggregate — |labels|·dim longs shuffle instead of an exploded
    // rows×dim relation.
    "embed_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(Tables.load(s, dir, "embeddings"))
        .orderBy(col("label"), col("dim"))),

    // Majority-label kNN classification of the probe set over the
    // exact neighbor ranking (deterministic tie-breaks).
    "sim_knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"))),

    // Relative quality gate: top half per source by score.
    "corpus_quality_filter" -> ((s, dir) =>
      Corpus.qualityFiltered(Tables.load(s, dir, "documents"))
        .orderBy(col("source"), col("rk"))),

    // Greedy token-budget planner: global quality-rank prefix cut
    // via the distributed prefix sum; per-source admission stats.
    "corpus_token_budget" -> ((s, dir) =>
      Corpus.tokenBudget(Tables.load(s, dir, "documents"))),

    // Passage-level duplication census over chunk fingerprints.
    "corpus_chunk_dedup" -> ((s, dir) =>
      Corpus.chunkDupStats(Tables.load(s, dir, "documents"))
        .orderBy(col("source"))),

    // Content-defined chunking: boundaries from the trailing-window
    // token hash, not position — the edit-robust chunk inventory.
    "corpus_content_chunks" -> ((s, dir) =>
      Corpus.contentChunks(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // The A/B that justifies content-defined chunking: chunk-fp
    // survival under a one-token prefix edit, content vs fixed grid.
    "corpus_chunk_robustness" -> ((s, dir) =>
      Corpus.chunkRobustness(Tables.load(s, dir, "documents"))
        .orderBy(col("method"))),

    // One k-means assignment step: label→nearest-centroid transition
    // matrix (broadcast integer-sum centroids, argmax via max-struct).
    "sim_kmeans_assign" -> ((s, dir) =>
      Similarity.kmeansAssign(Tables.load(s, dir, "embeddings"))
        .orderBy(col("label"), col("assigned_cell"))),

    // One k-means iteration gauge: E-step reassignment + M-step
    // centroid movement (exact integer d-squared per cell).
    "sim_kmeans_update" -> ((s, dir) =>
      Similarity.kmeansUpdate(Tables.load(s, dir, "embeddings"))),

    // Iterated k-means trainer: 3 label-seeded E/M rounds — the
    // convergence curve (moved vectors, live cells) per round.
    "sim_kmeans_train" -> ((s, dir) =>
      Similarity.kmeansTrain(Tables.load(s, dir, "embeddings"))),

    // Spherical-k-means elbow: cohesion objective (exact integer
    // sum of dot(q, final centroid)) across k in {2,4,8,16} — the
    // k-selection knob curve for the kmeans/IVF family.
    "sim_kmeans_elbow" -> ((s, dir) =>
      Similarity.kmeansElbow(Tables.load(s, dir, "embeddings"))),

    // IVF recall over the TRAINED coarse quantizer (vs the label
    // stand-in the other IVF gauges use) — what training buys the
    // index on this corpus.
    "sim_ann_ivf_trained" -> ((s, dir) =>
      Similarity.ivfTrainedRecall(Tables.load(s, dir, "embeddings"))),

    // IVF maintenance audit: per trained cell occupancy, load ratio
    // vs perfect balance, and the integer-exact split/merge/dead
    // verdict — when to re-shard the index (recall gauges say how
    // well it answers; this says when to rebuild).
    "sim_ivf_balance" -> ((s, dir) =>
      Similarity.ivfBalance(Tables.load(s, dir, "embeddings"))),

    // Cross-geometry cost/recall Pareto frontier: exact scan, LSH,
    // IVF nProbe sweep, PQ-ADC, graph walk on ONE stick — integer
    // micro-averaged recall vs candidates scored, with the
    // dominance verdict a serving deployment picks its index by.
    "sim_ann_frontier" -> ((s, dir) =>
      Similarity.annFrontier(Tables.load(s, dir, "embeddings"))),

    // Cluster purity of the E-step assignment vs the true labels:
    // per cell the majority label and its share.
    "embed_cluster_purity" -> ((s, dir) =>
      Similarity.kmeansAssign(Tables.load(s, dir, "embeddings"))
        .groupBy(col("assigned_cell"))
        .agg(sum(col("n_vecs")).as("n_vecs"),
          max(struct(col("n_vecs"), (-col("label")).as("neg_label")))
            .as("best"))
        .select(col("assigned_cell"), col("n_vecs"),
          (-col("best.neg_label")).as("majority_label"),
          col("best.n_vecs").as("n_majority"),
          (col("best.n_vecs").cast("double") / col("n_vecs").cast("double"))
            .as("purity"))
        .orderBy(col("assigned_cell"))),

    // Right-to-be-forgotten propagation: scrub a deterministic
    // deletion list (user_id % 17 == 0) from the feed, re-materialize
    // state, audit zero residual keys per table.
    "cdc_forget_keys" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      val keys = c.select(col("user_id")).distinct()
        .filter(col("user_id") % 17 === 0)
      cdc.Forget.audit(c, "user_id", keys, Seq(col("ts"), col("event_id")))
        .orderBy(col("table_name"))
    }),

    // Replication-lag monitor: per-table high-water mark vs the
    // newest event anywhere (1-row head broadcast, no second scan).
    "cdc_lag_monitor" -> ((s, dir) =>
      TableStatistics.lagMonitor(ChangeFeed.fromEvents(s, dir))
        .orderBy(col("table_name"))),

    // Hot-key skew monitor: top-5 most-changed keys per table via the
    // sharded two-level tournament (no whole-table window partition).
    "cdc_hot_keys" -> ((s, dir) =>
      TableStatistics.hotKeys(ChangeFeed.fromEvents(s, dir), 5)
        .orderBy(col("table_name"), col("rk"))),

    // Snapshot diff between two replay points: single-scan,
    // conditional-max-struct per key (never two replays joined).
    "cdc_snapshot_diff" -> ((s, dir) =>
      ChangeFeed.snapshotDiff(ChangeFeed.fromEvents(s, dir),
          lit("2024-01-10 00:00:00"), lit("2024-01-20 00:00:00"))
        .orderBy(col("table_name"))),

    // Referential-integrity audit after apply: orphans are PLANTED
    // deterministically (parents c_custkey%13==0 dropped from
    // customer; o_orderkey%997==0 dropped from orders; child FK
    // nulled where o_orderkey%101==0 — NULL is not an orphan, per
    // SQL MATCH SIMPLE) so the oracle replants and recounts them.
    "cdc_fk_audit" -> ((s, dir) => {
      val customer = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") % 13 =!= 0)
      val orders = Tables.load(s, dir, "orders")
      val ordersChild = orders.withColumn("o_custkey",
        when(col("o_orderkey") % 101 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")))
      val ordersParent = orders.filter(col("o_orderkey") % 997 =!= 0)
      val lineitem = Tables.load(s, dir, "lineitem")
      cdc.FkAudit.report(Seq(
          ("orders_custkey_fk", ordersChild, "o_custkey",
            customer, "c_custkey"),
          ("lineitem_orderkey_fk", lineitem, "l_orderkey",
            ordersParent, "o_orderkey")))
        .orderBy(col("constraint_name"))
    }),

    // The streaming pipeline as ONE driver-checked query: file-stream
    // source → annotate → envelope → partitioned-JSON sink, read back
    // by the batch consumer and reduced to a content summary the
    // oracle recomputes straight from the source table. The collect is
    // |record_type × op| rows (≤ a handful by construction) and exists
    // so the temp sink can be deleted before the result is returned.
    "cdc_stream_roundtrip" -> ((s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-roundtrip-").toString
      val summary = streaming.CdcPipeline.fileRoundtrip(s, dir, root)
        .orderBy(col("operation"))
      val rows = summary.collect()
      val out = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), summary.schema)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      out.orderBy(col("operation"))
    }),

    // CSV replication target (DMS S3-target default format): feed →
    // table-partitioned quoted CSV → schema read-back → per-table
    // parity audit (counts + integer/decimal checksums). The collect
    // is |tables| rows and exists so the temp sink can be deleted
    // before the result is returned.
    "cdc_csv_roundtrip" -> targetRoundtrip(sources.CsvTarget.roundtrip),

    // ORC replication target: columnar write + native-schema
    // read-back, same per-table parity audit as the CSV target.
    "cdc_orc_roundtrip" -> targetRoundtrip(sources.CsvTarget.orcRoundtrip),

    // Shard-split audit: hash-range layout (4 shards over the 60-bit
    // key-hash space), shard 1 splits at the cutover into children
    // 4/5; per-shard pre/post counts prove the handoff continuity
    // (closed parent receives nothing after the cutover).
    "cdc_reshard" -> ((s, dir) =>
      cdc.Resharding.splitAudit(
          Tables.load(s, dir, "events"),
          col("user_id").cast("string"),
          nShards = 4, splitShard = 1,
          lit("2024-01-15 00:00:00"))
        .orderBy(col("shard_id"))),

    // Last-touch attribution: purchases credited to the most recent
    // preceding non-purchase event within 7 days (else 'direct').
    "events_attribution" -> ((s, dir) =>
      Analytics.attribution(Tables.load(s, dir, "events"))
        .orderBy(col("channel"))),

    // First-touch twin: the EARLIEST preceding touch takes the credit
    // (brand-discovery vs closing credit).
    "events_attribution_first" -> ((s, dir) =>
      Analytics.attributionFirstTouch(Tables.load(s, dir, "events"))
        .orderBy(col("channel"))),

    // Missed-position audit: per-key event-id gaps beyond 8x the key
    // cardinality (exact integer threshold, lag window + 1-row
    // broadcast).
    "events_gap_detection" -> ((s, dir) =>
      Analytics.eventGaps(Tables.load(s, dir, "events"))
        .orderBy(col("user_id"))),

    // One-sided overlap on the LSH candidates: the inclusion detector
    // symmetric Jaccard under-scores (quotes, wrapped payloads).
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // Character-level verify on the LSH candidates: exact Levenshtein
    // with an integer relative near-dup verdict.
    "dedup_fuzzy_verify" -> ((s, dir) =>
      Dedup.fuzzyVerifiedPairs(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // DMS-style table validation: source vs drifted replicated twin,
    // per-status matched/mismatched/missing/extra KEY counts. Drift
    // is planted from the portable key hash (mod 97: 0→checksum
    // bump, 1→row dropped, 2→extra re-keyed row, 3→key duplicated on
    // the target — caught as a digest mismatch) so the oracle
    // replants it.
    "cdc_validation" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val cents = round(col("o_totalprice") * 100).cast("long")
      val h = pmod(Portable.pHash(col("o_orderkey").cast("string")), lit(97L))
      val src = orders.withColumn("chk", cents)
      val kept = orders.filter(h =!= 1)
        .withColumn("chk", when(h === 0, cents + 1L).otherwise(cents))
      val extra = orders.filter(h === 2)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("chk", cents)
      val dup = orders.filter(h === 3).withColumn("chk", cents)
      cdc.Validation.report(src,
          kept.unionByName(extra).unionByName(dup),
          "o_orderkey", "o_orderstatus", col("chk"))
        .orderBy(col("o_orderstatus"))
    }),

    // REAL per-partition media decoder end-to-end: payloads are
    // structurally-valid BMP / PCM-WAV / Y4M files, the decoder
    // sniffs the container from magic bytes and parses headers +
    // content (stride walk, RIFF chunk walk, frame scan) with nothing
    // but the bytes. Oracle-checked because the synthesized content
    // is a pure function of doc_id — a mis-parse (wrong stride,
    // mis-walked chunk, off-by-one frame size) changes payload_sum.
    "multimodal_decode" -> ((s, dir) =>
      Binary.decodeMedia(Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // Unigram-LM familiarity: token frequencies trained on the corpus
    // itself, scored per doc with exact-integer aggregates (the
    // cross-engine-reproducible decomposition of a perplexity filter).
    "text_unigram_lm" -> ((s, dir) =>
      TextAnalysis.unigramLm(Tables.load(s, dir, "documents"), col("text"))
        .orderBy(col("doc_id"))),

    // Bigram LM: per-doc word-order surprise under the corpus MLE —
    // the sequence-level fluency score next to text_unigram_lm.
    "text_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLm(Tables.load(s, dir, "documents"), col("text"))
        .orderBy(col("doc_id"))),

    // Interpolated Kneser-Ney bigram census: top-20 bigrams with the
    // discount/continuation components and the smoothed p_kn.
    "text_bigram_kn" -> ((s, dir) =>
      TextAnalysis.knBigrams(Tables.load(s, dir, "documents"), col("text"))),

    // No-leakage LM eval: unigram model trained on the hash-gated
    // TRAIN split only, scored on held-out val+test per source (OOV
    // rate + exact-integer log2 surprise).
    "text_heldout_perplexity" -> ((s, dir) =>
      TextAnalysis.heldoutPerplexity(Tables.load(s, dir, "documents"),
          col("text"))
        .orderBy(col("source"))),

    // PII scrub. The synthetic corpus carries no PII-shaped spans, so
    // the query plants doc_id-derived email/ssn/phone spans (same
    // derivation in the oracle) and the operator must count and
    // redact exactly those.
    "text_pii" -> ((s, dir) => {
      val enriched = Tables.load(s, dir, "documents").withColumn("pii_text",
        concat(
          col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit(" ssn 123-45-6789"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
              lit("-0199"))).otherwise(lit(""))))
      TextAnalysis.piiScrub(enriched, col("pii_text"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ids"),
          length(col("redacted")).cast("long").as("red_len"),
          md5(col("redacted")).as("red_md5"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style within-document repetition signals: duplicate-word
    // fraction, top-word fraction, duplicate-bigram fraction — all
    // map-only higher-order array expressions, value-exact in SQL.
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          col("top_freq"), col("n_bigrams"), col("n_distinct_bigrams"),
          col("dup_word_ratio"), col("top_word_ratio"), col("dup_bigram_ratio"))
        .orderBy(col("doc_id"))),

    // Corpus-level duplicated-3-gram census per source: the cheap
    // boilerplate gauge run before deciding to pay for passage dedup.
    "corpus_dup_ngrams" -> ((s, dir) =>
      Corpus.dupNgramStats(Tables.load(s, dir, "documents"))
        .orderBy(col("source"))),

    // Data-constrained epoch planner: uniform target mix under the
    // 4-epoch repeat cap, capped shares redistributed by remaining
    // capacity — integer-exact cross-source sums.
    "corpus_epoch_plan" -> ((s, dir) =>
      Corpus.epochPlan(Tables.load(s, dir, "documents"))
        .orderBy(col("source"))),

    // ExactSubstr-style duplicate-span census per document: maximal
    // merged spans of cross-document k-gram anchors — the regions
    // substring dedup would cut, with exact union token coverage.
    "corpus_dup_spans" -> ((s, dir) =>
      Corpus.dupSpans(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // Cross-source shingle overlap: which source pairs share 3-gram
    // boilerplate, with set Jaccard (the contamination map next to
    // corpus_dup_ngrams' per-source census).
    "corpus_source_overlap" -> ((s, dir) =>
      Corpus.sourceOverlap(Tables.load(s, dir, "documents"))),

    // Per-source total-variation distance from the corpus token
    // distribution (exact integer numerator via the cross-product
    // trick) — the out-of-distribution ranking a mixture designer
    // reads before weighting.
    "corpus_source_divergence" -> ((s, dir) =>
      Corpus.sourceDivergence(Tables.load(s, dir, "documents"))),

    // Per-doc TF-IDF argmax keyword with exact integer idf — document
    // tagging with engine-identical scoring and tie-breaks.
    "text_keywords" -> ((s, dir) =>
      TextAnalysis.keywords(Tables.load(s, dir, "documents"), col("text"))
        .orderBy(col("doc_id"))),

    // Power-of-two token-length histogram per source: the
    // token-budget planning view (exact integer log2 buckets).
    "corpus_histogram" -> ((s, dir) =>
      Corpus.lengthHistogram(Tables.load(s, dir, "documents"))
        .orderBy(col("source"), col("bucket"))),

    // Exact-dedup removal attribution per source (docs + char mass)
    // under the global min-doc_id canonical rule.
    "corpus_dedup_impact" -> ((s, dir) =>
      Corpus.dedupImpact(Tables.load(s, dir, "documents"))),

    // Temperature-annealed source mixing weights (α ∈ {1, ½, ¼} —
    // sqrt-only, so no libm pow in the oracle compare).
    "corpus_anneal_mix" -> ((s, dir) =>
      Corpus.annealMix(Tables.load(s, dir, "documents"))),

    // Training-mix realization: per-mille epoch weights per source —
    // full epochs plus one hash-gated partial epoch per doc.
    "corpus_mix" -> ((s, dir) =>
      Corpus.mixed(Tables.load(s, dir, "documents"),
          Map("src0" -> 2500, "src1" -> 1000, "src2" -> 300, "src3" -> 0),
          defaultPerMille = 1000)
        .groupBy(col("source"), col("epoch"), col("weight_pm"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("source"), col("epoch"))),

    // Gaps-and-islands: longest consecutive-day streak per user
    // (distinct-day reduce FIRST, then one per-user window chain).
    "events_streak" -> ((s, dir) => Analytics.eventsStreak(s, dir)),

    // Entry/exit transition matrix: first/last event type per user as
    // map-side min/max of ordering structs — no window over the stream.
    "events_entry_exit" -> ((s, dir) => Analytics.eventsEntryExit(s, dir)),

    // Recency buckets against the feed head (1-row broadcast of the
    // per-user aggregate's own max — the stream is scanned once).
    "events_churn" -> ((s, dir) => Analytics.eventsChurn(s, dir)),

    // Day-over-day change-rate drift per table: the first derivative
    // of cdc_table_statistics, lag window over the tiny post-aggregate.
    "cdc_rate_drift" -> ((s, dir) =>
      TableStatistics.rateDrift(ChangeFeed.fromEvents(s, dir))),

    // Exact per-source token-length percentiles by deterministic rank
    // selection (q_median_price's tie-break, widened to a profile).
    "corpus_percentiles" -> ((s, dir) =>
      Corpus.lengthPercentiles(Tables.load(s, dir, "documents"))),

    // Per-doc first-appearance 3-gram novelty: the marginal-diversity
    // curve over ingestion order.
    "corpus_novelty" -> ((s, dir) =>
      Corpus.ngramNovelty(Tables.load(s, dir, "documents"))),

    // Dedup yield curve: surviving candidate pairs + touched docs per
    // Jaccard threshold (integer keep test, candidate-bounded sweep).
    "dedup_jaccard_curve" -> ((s, dir) =>
      Dedup.jaccardCurve(Tables.load(s, dir, "documents"))),

    // Semantic-dedup yield curve: embedding twin of the Jaccard
    // curve over the SRP-bucketed candidates.
    "dedup_embedding_curve" -> ((s, dir) =>
      Dedup.embeddingYieldCurve(Tables.load(s, dir, "embeddings"))),

    // Hour-of-day × type seasonality with lift vs the type's overall
    // share; totals are windows over the 24·|types| post-aggregate.
    "events_seasonality" -> ((s, dir) => Analytics.eventsSeasonality(s, dir)),

    // Seasonal-naive forecast backtest: dow-mean vs overall-mean
    // daily-count predictors over a 21d train / 7d holdout split,
    // integer-exact MAEs (capacity planning, closed-loop).
    "events_forecast_backtest" -> ((s, dir) =>
      Analytics.forecastBacktest(Tables.load(s, dir, "events"))),

    // Heaps'-law vocabulary growth per doc-id decile (1-row broadcast
    // bounds, term-keyed min aggregate, ≤10-row cumulative window).
    "corpus_vocab_growth" -> ((s, dir) =>
      Corpus.vocabGrowth(Tables.load(s, dir, "documents"))),

    // Out-of-order delivery audit: running-max window per (table,key)
    // in delivery order; the lateness bound a streaming apply needs.
    "cdc_ordering_audit" -> ((s, dir) =>
      TableStatistics.orderingAudit(ChangeFeed.fromEvents(s, dir))),

    // Schema-drift timeline: per (table, payload column) first/last
    // delivery + added/retired/transient/stable verdict — the DDL
    // propagation audit from the schema side.
    "cdc_schema_timeline" -> ((s, dir) =>
      TableStatistics.schemaTimeline(ChangeFeed.fromEvents(s, dir))),

    // Per-label cohesion: mean intra vs inter dot and margin, exact
    // from vector sums (never pairwise) — the label-quality gate.
    "embed_label_cohesion" -> ((s, dir) =>
      Similarity.labelCohesion(Tables.load(s, dir, "embeddings"))
        .orderBy(col("label"))),

    // Per-label centroid-distance outliers (integer d²·n > 4·Σd²
    // test) — the per-cluster encoder-drift gate.
    "embed_outliers" -> ((s, dir) =>
      Similarity.embedOutliers(Tables.load(s, dir, "embeddings"))),

    // Watermark sizing plan: the ordering audit's lateness mass
    // turned into the zero-drop withWatermark recommendation plus
    // the drop cost of each tighter candidate. Same single (table,
    // key) exchange as the audit; candidates fold into the rollup.
    "cdc_watermark_plan" -> ((s, dir) =>
      TableStatistics.watermarkPlan(ChangeFeed.fromEvents(s, dir))),

    // Bloom-filter decontamination: the broadcast-bitmap scale path
    // of corpus_decontaminate, with exact-join FP accounting so the
    // filter's false-positive yield is measured, not assumed.
    "corpus_bloom_decontaminate" -> ((s, dir) =>
      Corpus.bloomDecontaminationScores(Tables.load(s, dir, "documents"),
          col("source") === "src0")
        .orderBy(col("doc_id"))),

    // Product-quantization codebook report: deterministic SRP-seeded
    // sub-codebooks, rounded-mean integer centroids, one refine
    // E-step; per (subspace, code) population + reconstruction error.
    "embed_pq" -> ((s, dir) =>
      Similarity.pqReport(Tables.load(s, dir, "embeddings"))),

    // SemDeDup impact attribution: what semantic (embedding-CC)
    // dedup would remove per source, in docs and character mass —
    // the near-dup twin of corpus_dedup_impact, same global
    // min-canonical rule.
    "corpus_semdedup_impact" -> ((s, dir) =>
      Dedup.semDedupImpact(Tables.load(s, dir, "embeddings"),
        Tables.load(s, dir, "documents"))),

    // MinHash-LSH impact attribution: the LEXICAL near-dup leg of
    // the impact trio (exact / minhash / semdedup), components over
    // exact-Jaccard-VERIFIED pairs at the curve's τ=0.80 cutoff.
    "corpus_minhash_impact" -> ((s, dir) =>
      Dedup.minhashImpact(Tables.load(s, dir, "documents"))),

    // Dup-survivorship direction: per (winner, loser) source pair,
    // what the loser surrenders under the global canonical rule —
    // mirrors lose consistently to their originators.
    "corpus_dup_survivorship" -> ((s, dir) =>
      Dedup.minhashSurvivorship(Tables.load(s, dir, "documents"))),

    // Semantic dedup clusters: exact connected components over the
    // SRP-bucketed embedding near-dup graph (the SemDeDup grouping
    // step; embedding twin of dedup_clusters).
    "dedup_embedding_clusters" -> ((s, dir) =>
      Dedup.embeddingClusters(Tables.load(s, dir, "embeddings"))
        .orderBy(col("cluster_id"))),

    // End-to-end training-data funnel: quality gate → exact-dup
    // canonical → decontamination as per-source stage yields + the
    // surviving token mass — one pass, all gates as conditional sums.
    "corpus_funnel" -> ((s, dir) =>
      Corpus.pipelineFunnel(Tables.load(s, dir, "documents"),
        col("source") === "src0")),

    // Per-sample audio features from the REAL PCM parse: energy,
    // zero crossings, peak, integer duration — the audio stratum's
    // content profile (silence/tone discrimination before training).
    "multimodal_audio_features" -> ((s, dir) =>
      Binary.audioFeatures(
          Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // Shot-boundary detection over the real frame walk: per video the
    // inter-frame luma deltas — where a sampling pipeline densifies.
    "multimodal_scene_cuts" -> ((s, dir) =>
      Binary.sceneCuts(Binary.frameSample(
          Binary.mediaPayload(Tables.load(s, dir, "documents"))))
        .orderBy(col("doc_id"))),

    // Per-channel image statistics from the real BGR pixel parse —
    // completes the per-modality content-feature triple.
    "multimodal_image_features" -> ((s, dir) =>
      Binary.imageFeatures(
          Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // Variance-of-Laplacian blur gate over the REAL BMP pixel walk:
    // exact integer moments, one double variance expression.
    "multimodal_blur" -> ((s, dir) =>
      Binary.blurStats(
          Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // Dominant 64-cell quantized color per image: the palette triage
    // census (exact counts, lowest-cell argmax tie-break).
    "multimodal_palette" -> ((s, dir) =>
      Binary.paletteStats(
          Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // Temporal resize: keep every other frame of the real Y4M walk.
    "multimodal_video_halfrate" -> ((s, dir) =>
      Binary.frameSample(
          Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .filter(col("kind") === "video")
        .withColumn("kept", col("frame_idx") % 2 === 0)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("frame_sum")).otherwise(0L))
            .as("kept_frame_sum"),
          sum(when(col("kept"), col("luma_sum")).otherwise(0L))
            .as("kept_luma_sum"))
        .orderBy(col("doc_id"))),

    // Audio resize on real bytes: 2:1 decimation of the PCM run.
    "multimodal_audio_decimate" -> ((s, dir) =>
      Binary.audioDecimated(
          Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // Resize step on real bytes: 2x2 nearest-neighbor thumbnail read
    // through the full BMP offset math (bottom-up rows + padding).
    "multimodal_thumbnail" -> ((s, dir) =>
      Binary.thumbnails(
          Binary.mediaPayload(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // PQ-ADC approximate top-k: per-probe exact-integer lookup table
    // to every codebook centroid; candidates rank by 4 table lookups
    // over their stored codes — the memory-budget ANN scan path.
    "sim_ann_pq" -> ((s, dir) =>
      Similarity.topKAnnPq(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // Recall gauge for the PQ-ADC scan vs the exact cosine ranking —
    // the measured cost of ranking by 16-bit codes instead of floats
    // (the number that decides how deep the re-rank fetch must go).
    "sim_ann_pq_recall" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.recallAtK(
          Similarity.topKBruteForce(embs),
          Similarity.topKAnnPq(embs))
        .orderBy(col("probe_id"))
    }),

    // IVF-PQ composed index: coarse cells prune the corpus to each
    // probe's nProbe nearest, the ADC code scan ranks only those
    // cells' members — the 100 TB serving shape (scan fraction
    // bounded by IVF, bytes/row bounded by PQ).
    "sim_ann_ivf_pq" -> ((s, dir) =>
      Similarity.topKAnnIvfPq(Tables.load(s, dir, "embeddings"))
        .orderBy(col("probe_id"), col("rk"))),

    // The composed index's recall vs the exact ranking — prices both
    // approximations (cell miss + code distortion) together.
    "sim_ann_ivf_pq_recall" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.recallAtK(
          Similarity.topKBruteForce(embs),
          Similarity.topKAnnIvfPq(embs))
        .orderBy(col("probe_id"))
    }),

    // Inter-arrival ⌊log2 µs⌋ histogram per event type — the arrival
    // cadence/burstiness profile; bounded |types|·64 output grid.
    "events_interarrival" -> ((s, dir) =>
      Analytics.eventsInterarrival(s, dir)),

    // Exactly-once apply from an at-least-once feed: planted
    // redeliveries deduped on the record identity before the apply;
    // per-table delivered/unique/dropped ledger + applied live state.
    "cdc_idempotent_apply" -> ((s, dir) =>
      cdc.ChangeFeed.idempotentApply(ChangeFeed.fromEvents(s, dir))),

    // CCNet-style perplexity gate over the unigram-LM familiarity
    // score: two-phase distributed rank, drop the bottom 25% by
    // exact rank cut (no float threshold anywhere).
    "text_perplexity_filter" -> ((s, dir) =>
      TextAnalysis.perplexityFilter(Tables.load(s, dir, "documents"),
          col("text"))
        .orderBy(col("doc_id"))),

    // One-pass embedding covariance (upper triangle) from native
    // vec_sum/vec_outer_sum sufficient statistics — exact integer
    // matrix entries, one fixed double expression per cell.
    "embed_covariance" -> ((s, dir) =>
      Similarity.covariance(Tables.load(s, dir, "embeddings"))),

    // Dominant-eigenvector power iteration over the second-moment
    // matrix — all-integer arithmetic (truncating-div renormalize,
    // int64 Rayleigh pair), corpus touched once.
    "embed_pca_power" -> ((s, dir) =>
      Similarity.pcaPower(Tables.load(s, dir, "embeddings"))),

    // Tombstone GC audit on the compacted changelog: GC-eligible
    // tombstones past the retention horizon + the keys a replay
    // could resurrect once their tombstone is dropped.
    "cdc_tombstone_gc" -> ((s, dir) =>
      ChangeFeed.tombstoneGc(ChangeFeed.fromEvents(s, dir))),

    // Streaming twin of cdc_idempotent_apply's delivery dedup:
    // planted redelivery union → watermarked
    // dropDuplicatesWithinWatermark → per-table summary equal to the
    // batch aggregate over the raw feed.
    "cdc_stream_dedup" -> ((s, dir) =>
      streaming.CdcPipeline.dedupRoundtrip(s, dir)),

    // Image near-dup census by perceptual hash over the REAL BMP
    // parse: 4x4 aHash clusters (exact cross-multiplied bit test),
    // then hamming<=2 neighbors over the 2^16-bounded DISTINCT-hash
    // relation via 4-bit LSH banding — corpus-size-bounded output.
    "multimodal_phash" -> ((s, dir) =>
      Binary.phashClusters(Binary.mediaPayload(Tables.load(s, dir, "documents")))),

    // The transitive hull of the phash near-pairs: connected
    // components over the hamming<=2 graph of DISTINCT hashes (the
    // drift chains a template family forms) — per family the hash
    // count, collapsible image mass, canonical doc.
    "multimodal_phash_families" -> ((s, dir) =>
      Binary.phashFamilies(Binary.mediaPayload(Tables.load(s, dir, "documents")))),

    // Per-source Spearman agreement between the heuristic quality
    // score and the LM familiarity signal — exact integer rank
    // statistic, both windows on one source exchange.
    "corpus_signal_agreement" -> ((s, dir) =>
      Corpus.signalAgreement(Tables.load(s, dir, "documents"))),

    // Transaction-atomicity audit: commit markers (seq + declared
    // size) ride each op; planted torn commits must be detected and
    // their delivered remainder held back by an atomic consumer.
    "cdc_txn_atomicity" -> ((s, dir) =>
      ChangeFeed.txnAtomicity(ChangeFeed.fromEvents(s, dir))),

    // Cadence-based bot detection: planted 1000x-compressed user
    // timelines; exact median-gap rank pick per user, flag < 120s.
    "events_bot_detection" -> ((s, dir) =>
      Analytics.eventsBotDetection(s, dir)),

    // Per-dimension drift between the two ingestion epochs — the
    // silent-encoder-swap monitor; 2-group vec_sum, d-row output.
    "embed_epoch_drift" -> ((s, dir) =>
      Similarity.epochDrift(Tables.load(s, dir, "embeddings"))),

    // Subject-access export (GDPR SAR; read-side twin of
    // cdc_forget_keys): per requested subject the change-history
    // summary, activity span, last op, live flag.
    "cdc_subject_export" -> ((s, dir) =>
      ChangeFeed.subjectExport(ChangeFeed.fromEvents(s, dir))),

    // Exact-k stratified sample by portable hash rank — the COUNT
    // gate next to corpus_sample's RATE gate; WindowGroupLimit caps
    // groups at k before any full sort.
    "corpus_stratified_k" -> ((s, dir) =>
      Corpus.stratifiedK(Tables.load(s, dir, "documents"))),

    // A/B value comparison by experiment arm: exact decimal moments,
    // Welch t as one fixed double expression.
    "events_ab_test" -> ((s, dir) => Analytics.eventsAbTest(s, dir)),

    // CUPED variance-reduction readout: pre-period covariate, pooled
    // theta, adjusted arm means; rho2 = the sample-size payoff.
    "events_ab_cuped" -> ((s, dir) => Analytics.eventsCuped(s, dir)),

    // Sample-ratio-mismatch guardrail: chi-square vs the 50/50
    // assignment with an integer 3.84-critical verdict.
    "events_srm" -> ((s, dir) => Analytics.eventsSrm(s, dir)),

    // Cohort-LTV triangle: first-week cohorts × week-of-age, exact
    // cents mass + running per-user LTV (calendar-free integer weeks).
    "events_cohort_ltv" -> ((s, dir) => Analytics.eventsCohortLtv(s, dir)),

    // Time-to-convert distribution (signup → first purchase): exact
    // two-phase rank percentiles of integer-µs delays.
    "events_conversion_lag" -> ((s, dir) =>
      Analytics.eventsConversionLag(s, dir)),

    // Session-depth ⌊log2⌋ histogram: bounce share and marathon tail
    // — the 30-minute-gap tuning readout.
    "events_session_depth" -> ((s, dir) =>
      Analytics.eventsSessionDepth(s, dir)),

    // Language-router confidence: per predicted language the win
    // margin census (0 = the alphabetical tie-break decided).
    "text_langid_margin" -> ((s, dir) =>
      TextAnalysis.langidMargin(Tables.load(s, dir, "documents"),
        col("text"))),

    // Voice-activity segmentation from the real PCM parse: 16-sample
    // frame energies, threshold, gaps-and-islands segments per doc.
    "multimodal_wav_vad" -> ((s, dir) =>
      Binary.vadSegments(Binary.mediaPayload(Tables.load(s, dir, "documents")))),

    // Luma-contour fingerprint census over the real frame walk:
    // strict-increase bits of consecutive frames' luma sums folded
    // LSB-first (the video member of the near-dup family).
    "multimodal_video_fingerprint" -> ((s, dir) =>
      Binary.videoFingerprintCensus(Binary.frameSample(
        Binary.mediaPayload(Tables.load(s, dir, "documents"))))),

    // Loudness-contour fingerprint census from the real PCM parse:
    // windowed energy-delta sign bits folded to one integer; docs
    // sharing (windows, fingerprint) have the same contour (the
    // audio member of the per-modality near-dup family).
    "multimodal_audio_fingerprint" -> ((s, dir) =>
      Binary.audioFingerprintCensus(
        Binary.mediaPayload(Tables.load(s, dir, "documents")))),

    // Per-label energy along the dominant principal axis (exact
    // integer projections onto the pca_power eigenvector) — the
    // subspace-collapse / semantic-shift monitor per cluster.
    "embed_subspace_energy" -> ((s, dir) =>
      Similarity.subspaceEnergy(Tables.load(s, dir, "embeddings"))),
  )

  /** Selection rules for the demo task: include src1%, exclude src15
    * (the reference's a% / exact-name pattern, stack.py:103-117).
    */
  private val selectionDemoRules = Seq(
    TableMapping.SelectionRule("graft", "src1%"),
    TableMapping.SelectionRule("graft", "src15", TableMapping.Exclude))

  /** Two replication tasks sharing one stream (the reference runs
    * two task pairs over ONE Kinesis stream, stack.py:96-180): a
    * wildcard task excluding one table, and an exact-name task that
    * also selects a catalog table with no delivered changes yet
    * (novels — lib/query.py creates it; DMS reports it with all-zero
    * statistics until its first write).
    */
  private val taskDemoTasks = Seq(
    "task_pct" -> TableMapping.Mapping(Seq(
      TableMapping.SelectionRule("graft", "users_%"),
      TableMapping.SelectionRule("graft", "users_3", TableMapping.Exclude))),
    "task_exact" -> TableMapping.Mapping(Seq(
      TableMapping.SelectionRule("graft", "users_3"),
      TableMapping.SelectionRule("graft", "novels"))))

  /** The source catalog the task rules evaluate over: the four
    * delivered change-feed tables plus the never-delivered novels.
    */
  private val taskDemoCatalog = Seq(
    ("graft", "users_0"), ("graft", "users_1"), ("graft", "users_2"),
    ("graft", "users_3"), ("graft", "novels"))

  /** Payload schema of the events change feed as wrapped by the CDC
    * demo queries — one definition so the envelope queries cannot
    * drift apart.
    */
  private val eventDataSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Consumer demo threshold (events span 2024-01-01..01-30). */
  private val consumeThreshold = "2024-01-15T00:00:00.000000Z"

  /** Apply-time validation rules for the exception-channel demo:
    * a key-integrity rule (never fires on clean testdata — the
    * mechanism must exist for it), a domain rule, and a payload rule
    * parsing the props JSON number without engine-specific JSON
    * functions so the oracle replays it exactly.
    */
  private val exceptionDemoRules = Seq(
    Exceptions.Rule("null_key", col("user_id").isNull),
    Exceptions.Rule("value_out_of_range", col("value") < 1.0),
    Exceptions.Rule("props_k_out_of_domain",
      regexp_extract(col("props"), "[0-9]+", 0).cast("long") > 90))

  /** Shared wrapper for the sink-format roundtrip queries: temp
    * target dir, bounded |tables|-row collect out of the transient
    * summary (so the dir can be deleted before the result returns —
    * deletion now in a finally, so a throwing parity check can't
    * leak the directory).
    */
  private def targetRoundtrip(
      fn: (SparkSession, String, String) => DataFrame)
    : (SparkSession, String) => DataFrame = (s, dir) => {
    val root = java.nio.file.Files
      .createTempDirectory("graft-target-").toString
    try {
      val summary = fn(s, dir, root)
      val rows = summary.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), summary.schema)
        .orderBy(col("table_name"))
    } finally {
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  private val fullLoadDemoRules = Seq(
    TableMapping.SelectionRule("graft", "p%"),
    TableMapping.SelectionRule("graft", "r%"),
    TableMapping.SelectionRule("graft", "nation"))

  /** Change-feed CTE shared by the CDC oracles. */
  private val C = s"WITH c AS (${ChangeFeed.duckFromEvents})"

  /** Unrolled 3-iteration integer power-method CTE chain (through
    * the final eigenvector `v3`), shared by the embed_pca_power and
    * embed_subspace_energy oracles — every step exact integer
    * (truncating //, matching Spark div and JVM / toward-zero).
    */
  private val pcaV3Ctes =
    s"""WITH q AS (SELECT vec_id,
       |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
       |e AS (SELECT vec_id,
       |    CAST(generate_subscripts(q, 1) - 1 AS BIGINT) AS i,
       |    unnest(q) AS x FROM q),
       |m AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS m
       |  FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |v0 AS (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM e),
       |u1 AS (SELECT m.i, CAST(sum(m.m * v.v) AS BIGINT) AS u
       |  FROM m JOIN v0 v ON v.i = m.j GROUP BY 1),
       |x1 AS (SELECT max(abs(u)) AS mx FROM u1),
       |v1 AS (SELECT i, CAST((u * 1000) // NULLIF(mx, 0) AS BIGINT) AS v
       |  FROM u1, x1),
       |u2 AS (SELECT m.i, CAST(sum(m.m * v.v) AS BIGINT) AS u
       |  FROM m JOIN v1 v ON v.i = m.j GROUP BY 1),
       |x2 AS (SELECT max(abs(u)) AS mx FROM u2),
       |v2 AS (SELECT i, CAST((u * 1000) // NULLIF(mx, 0) AS BIGINT) AS v
       |  FROM u2, x2),
       |u3 AS (SELECT m.i, CAST(sum(m.m * v.v) AS BIGINT) AS u
       |  FROM m JOIN v2 v ON v.i = m.j GROUP BY 1),
       |x3 AS (SELECT max(abs(u)) AS mx FROM u3),
       |v3 AS (SELECT i, CAST((u * 1000) // NULLIF(mx, 0) AS BIGINT) AS v
       |  FROM u3, x3)""".stripMargin

  // --- DuckDB fragments shared by the §2C oracles -----------------

  private val normT = Portable.duckNormText("text")
  private val toksT = TextAnalysis.duckTokens("text")

  private def markerCountSql(words: Seq[String]): String =
    markerCountSqlOn(toksT, words)

  /** [[markerCountSql]] over an arbitrary token-list SQL expression —
    * lang-consistency scores SLICES of one doc's token stream.
    */
  private def markerCountSqlOn(listExpr: String, words: Seq[String]): String = {
    val set = words.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter($listExpr, x -> x IN ($set))) AS BIGINT)"
  }

  /** IVF recall@k oracle SQL, parametrized by nProbe (shared by
    * the fixed gauge and the tuning curve). */
  private def ivfRecallSql(
      nProbe: Int,
      labSql: String = "SELECT vec_id, label FROM embeddings",
      extraCtes: String = ""): String =
    s"""WITH $embCtes,
         |$extraCtes$exactTopKCtes,
         |${ivfCellCtes(nProbe, labSql)},
         |ic AS (SELECT itc.probe_id, l.vec_id AS neighbor_id
         |  FROM itc JOIN lab l ON l.label = itc.label AND l.vec_id <> itc.probe_id),
         |idd AS (SELECT c.probe_id, c.neighbor_id, CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM ic c
         |  JOIN flat fa ON fa.vec_id = c.probe_id
         |  JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
         |  GROUP BY 1, 2),
         |iss AS (SELECT idd.probe_id, idd.neighbor_id,
         |    ${Vectors.duckCosine("idd.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM idd
         |  JOIN norms na ON na.vec_id = idd.probe_id
         |  JOIN norms nb ON nb.vec_id = idd.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |ir AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM iss),
         |ivfk AS (SELECT probe_id, neighbor_id FROM ir WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(i.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_at_k
         |FROM bfk b LEFT JOIN ivfk i
         |  ON i.probe_id = b.probe_id AND i.neighbor_id = b.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared CTE chain for the kmeans E-step oracles: quantize, cell
    * rounded-mean components, per-vector best-cell argmax (`a`, rk=1
    * is the assignment). */
  private val kmeansAssignCtes: String =
    s"""WITH q AS (SELECT vec_id, label,
       |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
       |flat AS (SELECT vec_id, label, generate_subscripts(q, 1) - 1 AS i,
       |    unnest(q) AS v FROM q),
       |comp AS (SELECT label AS cell, i,
       |    CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS s
       |  FROM flat GROUP BY 1, 2),
       |cells AS (SELECT cell, greatest(CAST(sum(s * s) AS BIGINT), 1) AS sn2
       |  FROM comp GROUP BY 1),
       |d AS (SELECT f.vec_id, f.label, c.cell,
       |    CAST(sum(f.v * c.s) AS BIGINT) AS dot
       |  FROM flat f JOIN comp c ON c.i = f.i
       |  GROUP BY 1, 2, 3),
       |scored AS (SELECT d.vec_id, d.label, d.cell,
       |    CAST(d.dot AS DOUBLE) / sqrt(CAST(ce.sn2 AS DOUBLE)) AS score
       |  FROM d JOIN cells ce ON ce.cell = d.cell),
       |a AS (SELECT vec_id, label, cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, cell) AS rk
       |  FROM scored)""".stripMargin

  /** Nested-CASE argmax over the language scores — same
    * strictly-greater / first-alphabetical semantics as
    * TextAnalysis.langId's fold.
    */
  private val langPredSql: String = langPredSqlOn("score")

  /** [[langPredSql]] over a caller-chosen score-column prefix —
    * lang-consistency evaluates the argmax on three score families
    * (full / h1 / h2) in one SELECT.
    */
  private def langPredSqlOn(prefix: String): String = {
    val l0 = TextAnalysis.markers.head._1
    val argmax = TextAnalysis.markers.tail.foldLeft(
      (s"'$l0'", s"${prefix}_$l0")) {
      case ((bl, bs), (l, _)) =>
        (s"CASE WHEN ${prefix}_$l > ($bs) THEN '$l' ELSE ($bl) END",
          s"CASE WHEN ${prefix}_$l > ($bs) THEN ${prefix}_$l ELSE ($bs) END")
    }._1
    val total = TextAnalysis.markers.map { case (l, _) => s"${prefix}_$l" }
      .mkString(" + ")
    s"CASE WHEN ($total) = 0 THEN 'und' ELSE ($argmax) END"
  }

  /** Shingle → minhash → band → candidate CTE chain (the oracle twin
    * of Dedup.{shingles,minhashSignatures,bandBuckets,candidatePairs}).
    */
  private val minhashCtes: String = minhashCtesFrom("documents")

  /** [[minhashCtes]] over an arbitrary document relation — the
    * hash-gated sampled-curve oracles splice a gated CTE name in
    * place of `documents`. */
  private def minhashCtesFrom(rel: String): String = {
    val (h1, h2) = Portable.duckHashPair("shingle")
    val mins = (0 until Dedup.NumHashes)
      .map(i => s"min(h1 + $i*h2) AS mh$i").mkString(", ")
    val bandRows = (0 until Dedup.Bands).map { b =>
      val cat = (0 until Dedup.RowsPerBand)
        .map(j => s"CAST(mh${b * Dedup.RowsPerBand + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, ${Portable.duckHash(s"($cat)")} AS bh FROM sigs"
    }.mkString(" UNION ALL ")
    s"""shf AS (${Dedup.duckShinglesN(Dedup.ShingleN, rel)}),
       |hs AS (SELECT doc_id, $h1 AS h1, $h2 AS h2 FROM shf),
       |sigs AS (SELECT doc_id, $mins FROM hs GROUP BY 1),
       |bands AS ($bandRows),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Cap recall-curve oracle body over an arbitrary minhash CTE
    * chain (full corpus or hash-gated sample) — ONE builder for both
    * registry variants so the curve arithmetic cannot drift between
    * them; `ctes` must end with the `bands`/`sigs` relations of
    * [[minhashCtesFrom]]. */
  private def dedupCapCurveSql(ctes: String): String = {
    val nMatch = (0 until Dedup.NumHashes)
      .map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val ord = Portable.duckHash(
      "(CAST(doc_id AS VARCHAR) || ':' || CAST(band AS VARCHAR)" +
        " || ':' || CAST(bh AS VARCHAR))")
    val capsList = Dedup.CapCurveCaps.mkString(", ")
    s"""WITH $ctes,
       |rb AS (SELECT doc_id, band, bh, row_number() OVER (
       |    PARTITION BY band, bh ORDER BY $ord, doc_id) AS rk
       |  FROM bands),
       |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    min(greatest(a.rk, b.rk)) AS cap_needed
       |  FROM rb a JOIN rb b
       |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sc AS (SELECT p.cap_needed, CAST($nMatch AS BIGINT) AS n_match
       |  FROM p
       |  JOIN sigs sa ON sa.doc_id = p.d1
       |  JOIN sigs sb ON sb.doc_id = p.d2),
       |cw AS (SELECT unnest([$capsList]) AS cap)
       |SELECT CAST(cw.cap AS BIGINT) AS cap,
       |  CAST(sum(CASE WHEN sc.cap_needed <= cw.cap THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_pairs_kept,
       |  count(*) AS n_pairs_total,
       |  CAST(sum(CASE WHEN sc.cap_needed <= cw.cap
       |      AND sc.n_match >= ${Dedup.NearDupMatches} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_neardup_kept,
       |  CAST(sum(CASE WHEN sc.n_match >= ${Dedup.NearDupMatches}
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_total,
       |  CASE WHEN sum(CASE WHEN sc.n_match >= ${Dedup.NearDupMatches}
       |      THEN 1 ELSE 0 END) > 0
       |    THEN CAST(sum(CASE WHEN sc.cap_needed <= cw.cap
       |        AND sc.n_match >= ${Dedup.NearDupMatches}
       |        THEN 1 ELSE 0 END) AS DOUBLE)
       |      / CAST(sum(CASE WHEN sc.n_match >= ${Dedup.NearDupMatches}
       |        THEN 1 ELSE 0 END) AS DOUBLE)
       |    ELSE 1.0 END AS neardup_recall
       |FROM cw, sc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Embedding cap recall-curve oracle body over an arbitrary
    * quantize+SRP CTE chain (full corpus or hash-gated sample) —
    * shared by both registry variants; `ctes` must end with the
    * `buckets`/`flat`/`norms` relations. */
  private def embCapCurveSql(ctes: String): String = {
    val ord = Portable.duckHash(
      "(CAST(vec_id AS VARCHAR) || ':' || CAST(band AS VARCHAR)" +
        " || ':' || CAST(bucket AS VARCHAR))")
    val capsList = Dedup.EmbCapCurveCaps.mkString(", ")
    val tau = s"CAST(${Dedup.CosineTau} AS DOUBLE)"
    s"""WITH $ctes,
       |rb AS (SELECT vec_id, band, bucket, row_number() OVER (
       |    PARTITION BY band, bucket ORDER BY $ord, vec_id) AS rk
       |  FROM buckets),
       |pc AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
       |    min(greatest(a.rk, b.rk)) AS cap_needed
       |  FROM rb a JOIN rb b
       |  ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2),
       |d AS (SELECT pc.v1, pc.v2, pc.cap_needed,
       |    CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
       |  FROM pc
       |  JOIN flat fa ON fa.vec_id = pc.v1
       |  JOIN flat fb ON fb.vec_id = pc.v2 AND fb.i = fa.i
       |  GROUP BY 1, 2, 3),
       |sc AS (SELECT d.cap_needed, $cosSql AS cos_sim
       |  FROM d
       |  JOIN norms na ON na.vec_id = d.v1
       |  JOIN norms nb ON nb.vec_id = d.v2
       |  WHERE na.n2 > 0 AND nb.n2 > 0),
       |cw AS (SELECT unnest([$capsList]) AS cap)
       |SELECT CAST(cw.cap AS BIGINT) AS cap,
       |  CAST(sum(CASE WHEN sc.cap_needed <= cw.cap THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_pairs_kept,
       |  count(*) AS n_pairs_total,
       |  CAST(sum(CASE WHEN sc.cap_needed <= cw.cap
       |      AND sc.cos_sim >= $tau THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_neardup_kept,
       |  CAST(sum(CASE WHEN sc.cos_sim >= $tau THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_neardup_total,
       |  CASE WHEN sum(CASE WHEN sc.cos_sim >= $tau THEN 1 ELSE 0 END) > 0
       |    THEN CAST(sum(CASE WHEN sc.cap_needed <= cw.cap
       |        AND sc.cos_sim >= $tau THEN 1 ELSE 0 END) AS DOUBLE)
       |      / CAST(sum(CASE WHEN sc.cos_sim >= $tau THEN 1 ELSE 0 END)
       |        AS DOUBLE)
       |    ELSE 1.0 END AS neardup_recall
       |FROM cw, sc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Content-defined chunk body over an arbitrary document text
    * expression — the boundary window hash, the strictly-prior
    * boundary prefix sum, and the per-chunk fingerprint, mirroring
    * Corpus.contentChunks exactly. Yields (doc_id, source, chunk_id,
    * chunk_start, chunk_tokens, chunk_fp) rows.
    */
  private def duckContentChunks(textExpr: String): String = {
    val w = Corpus.ContentWindow
    val win = Portable.duckHash(
      s"array_to_string(list_slice(toks, i - ${w - 1}, i), ' ')")
    s"""SELECT doc_id, source, CAST(chunk_id AS BIGINT) AS chunk_id,
       |    CAST(min(i) AS BIGINT) AS chunk_start,
       |    count(*) AS chunk_tokens,
       |    ${Portable.duckHash("string_agg(tok, ' ' ORDER BY i)")} AS chunk_fp
       |  FROM (
       |    SELECT doc_id, source, i, tok,
       |      COALESCE(sum(is_b) OVER (PARTITION BY doc_id ORDER BY i
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
       |    FROM (
       |      SELECT doc_id, source, i, tok,
       |        CASE WHEN i >= $w AND $win % ${Corpus.ContentMask} = 0
       |          THEN 1 ELSE 0 END AS is_b
       |      FROM (
       |        SELECT doc_id, source, toks,
       |          generate_subscripts(toks, 1) AS i, unnest(toks) AS tok
       |        FROM (SELECT doc_id, source,
       |            ${TextAnalysis.duckTokens(textExpr)} AS toks FROM documents)
       |        )))
       |  GROUP BY doc_id, source, chunk_id""".stripMargin
  }

  /** Distinct (doc_id, chunk_fp) pairs under either chunking method
    * over an arbitrary text expression — the unit the robustness A/B
    * joins on.
    */
  private def duckChunkFps(textExpr: String, content: Boolean): String =
    if (content)
      s"""SELECT DISTINCT doc_id, chunk_fp FROM (
         |  ${duckContentChunks(textExpr)})""".stripMargin
    else
      s"""SELECT DISTINCT doc_id,
         |    ${Portable.duckHash(
                s"array_to_string(list_slice(toks, start + 1, " +
                  s"start + ${Corpus.ChunkSize}), ' ')")} AS chunk_fp
         |  FROM (
         |    SELECT doc_id, toks, n_tokens,
         |      unnest(range(0, CAST(n_tokens AS BIGINT),
         |        ${Corpus.ChunkStride})) AS start
         |    FROM (SELECT doc_id, toks, len(toks) AS n_tokens
         |      FROM (SELECT doc_id,
         |          ${TextAnalysis.duckTokens(textExpr)} AS toks FROM documents)
         |      WHERE len(toks) > 0))
         |  WHERE start = 0
         |    OR start + ${Corpus.ChunkSize - Corpus.ChunkStride} < n_tokens""".stripMargin

  /** Shared KMV estimate projection for the sketch twins: ONE
    * definition of the (k-1)·2⁶⁰ / kth formula, so the relational
    * and native-aggregate rows cannot drift.
    */
  private def kmvEstimate(k: Int)(df: DataFrame): DataFrame =
    df.withColumn("kmv_estimate",
        round(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
          col("kth").cast("double"), 2))
      .select(col("table_name"), col("exact_distinct"), col("kmv_estimate"))
      .orderBy(col("table_name"))

  /** Shared oracle for cdc_distinct_sketch and its native-aggregate
    * twin (identical statistic, identical relational form).
    */
  private lazy val kmvOracleSql: String =
    s"""$C, h AS (SELECT DISTINCT table_name,
       |    ${Portable.duckHash("CAST(user_id AS VARCHAR)")} AS h FROM c),
       |r AS (SELECT table_name, h,
       |    row_number() OVER (PARTITION BY table_name ORDER BY h) AS rn FROM h),
       |kth AS (SELECT table_name, h AS kth FROM r WHERE rn = 64),
       |ex AS (SELECT table_name, count(DISTINCT user_id) AS exact_distinct
       |  FROM c GROUP BY 1)
       |SELECT ex.table_name, ex.exact_distinct,
       |  round(CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
       |    / CAST(kth.kth AS DOUBLE), 2) AS kmv_estimate
       |FROM ex LEFT JOIN kth ON kth.table_name = ex.table_name
       |ORDER BY ex.table_name""".stripMargin

  /** Quantized-embedding CTEs: flat (vec_id, i, v) + exact norms. */
  private val embCtes: String = embCtesFrom("embeddings")

  /** [[embCtes]] over an arbitrary embeddings relation — the
    * hash-gated sampled-curve oracle splices a gated CTE name in
    * place of `embeddings`. */
  private def embCtesFrom(rel: String): String =
    s"""qv AS (SELECT vec_id, ${Vectors.duckQuantize("embedding")} AS q FROM $rel),
       |flat AS (SELECT vec_id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS v FROM qv),
       |norms AS (SELECT vec_id, CAST(sum(v*v) AS BIGINT) AS n2 FROM flat GROUP BY 1)""".stripMargin

  /** SRP plane/bit/bucket CTEs (twin of Vectors.srpBuckets). */
  private val srpCtes: String = {
    val r = Dedup.EmbRowsPerBand
    s"""planes AS (${Vectors.duckPlanes(Dedup.EmbBands * r, Dedup.EmbDim)}),
       |bits AS (SELECT f.vec_id, p.p AS p,
       |    CASE WHEN sum(f.v * p.w) >= 0 THEN 1 ELSE 0 END AS bit
       |  FROM flat f JOIN planes p ON f.i = p.i GROUP BY 1, 2),
       |buckets AS (SELECT vec_id, p // $r AS band,
       |    CAST(sum(bit * (1 << (p % $r))) AS BIGINT) AS bucket
       |  FROM bits GROUP BY 1, 2)""".stripMargin
  }

  private val cosSql =
    Vectors.duckCosine("d.dot", "na.n2", "nb.n2")

  /** kNN edge CTE chain — the SQL twin of Similarity.knnEdges (SRP
    * bucket candidates → exact cosine → per-src top-k), shared by
    * every graph-family oracle so the edge construction cannot
    * drift between them. Emits ${p}cand/${p}dd/${p}sc/${p}rr and
    * the edge relation ${p}e; splice after [[embCtes]] + [[srpCtes]].
    * ${p}kb mirrors knnEdges' per-bucket candidate cap (fair
    * hash-order member selection at Similarity.KnnBucketCap) so the
    * oracle stays exact even at a corpus where the cap binds.
    */
  /** Capped SRP bucket relation — the SQL twin of
    * Dedup.capBucketMembers at Dedup.SrpBucketCap over the `buckets`
    * CTE (fair hash-order member selection, id tie-break); splice
    * after [[srpCtes]]. ONE builder shared by the knn-edge chain and
    * every embedding-pairs oracle so the capped membership cannot
    * drift between the generators that share it in Scala.
    */
  private def cappedBucketsSql(name: String): String =
    s"""$name AS (SELECT vec_id, band, bucket FROM (
       |    SELECT vec_id, band, bucket, row_number() OVER (
       |      PARTITION BY band, bucket
       |      ORDER BY ${Portable.duckHash(
                "(CAST(vec_id AS VARCHAR) || ':' || CAST(band AS VARCHAR)" +
                  " || ':' || CAST(bucket AS VARCHAR))")}, vec_id) AS rk
       |    FROM buckets)
       |  WHERE rk <= ${Dedup.SrpBucketCap})""".stripMargin

  private def knnEdgeCtes(k: Int, p: String = ""): String =
    s"""${cappedBucketsSql(s"${p}kb")},
       |${p}cand AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM ${p}kb a JOIN ${p}kb b
       |  ON b.band = a.band AND b.bucket = a.bucket
       |    AND b.vec_id <> a.vec_id),
       |${p}dd AS (SELECT c.src, c.dst,
       |    CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
       |  FROM ${p}cand c
       |  JOIN flat fa ON fa.vec_id = c.src
       |  JOIN flat fb ON fb.vec_id = c.dst AND fb.i = fa.i
       |  GROUP BY 1, 2),
       |${p}sc AS (SELECT ${p}dd.src, ${p}dd.dst,
       |    ${Vectors.duckCosine(s"${p}dd.dot", "na.n2", "nb.n2")} AS cos_sim
       |  FROM ${p}dd
       |  JOIN norms na ON na.vec_id = ${p}dd.src
       |  JOIN norms nb ON nb.vec_id = ${p}dd.dst
       |  WHERE na.n2 > 0 AND nb.n2 > 0),
       |${p}rr AS (SELECT *, row_number() OVER (PARTITION BY src
       |    ORDER BY cos_sim DESC, dst) AS rk FROM ${p}sc),
       |${p}e AS (SELECT src, dst FROM ${p}rr WHERE rk <= $k)""".stripMargin

  /** Shared CTE chain for the graph-walk ANN pair (sim_ann_graph /
    * sim_ann_graph_recall): knn edges `ge` (same construction as
    * sim_knn_graph's), probe-corpus cosines `pc`, fixed entry `gen`,
    * and the beam frontier gf0..gfH — the Spark loop unrolled.
    * Expects to be spliced after [[embCtes]] + [[srpCtes]].
    */
  private lazy val graphWalkCtes: String = {
    val beam = Similarity.GraphSearchBeam
    def hop(i: Int, prev: String): String =
      s"""gx$i AS (SELECT DISTINCT probe_id, node FROM (
         |    SELECT f.probe_id, ge.dst AS node
         |      FROM $prev f JOIN ge ON ge.src = f.node
         |    UNION ALL SELECT probe_id, node FROM $prev)),
         |gss$i AS (SELECT x.probe_id, x.node, pc.cos_sim
         |  FROM gx$i x
         |  JOIN pc ON pc.probe_id = x.probe_id AND pc.node = x.node),
         |gf$i AS (SELECT probe_id, node, cos_sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, node) AS rk FROM gss$i)
         |  WHERE rk <= $beam)""".stripMargin
    val hops = (1 to Similarity.GraphSearchHops)
      .map(i => hop(i, s"gf${i - 1}")).mkString(",\n")
    s"""${knnEdgeCtes(Similarity.GraphSearchDegree, "g")},
       |gpd AS (SELECT fp.vec_id AS probe_id, f.vec_id AS node,
       |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
       |  FROM flat fp
       |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
       |  WHERE fp.vec_id < ${Similarity.NumProbes}
       |  GROUP BY 1, 2),
       |pc AS (SELECT gpd.probe_id, gpd.node,
       |    ${Vectors.duckCosine("gpd.dot", "na.n2", "nb.n2")} AS cos_sim
       |  FROM gpd
       |  JOIN norms na ON na.vec_id = gpd.probe_id
       |  JOIN norms nb ON nb.vec_id = gpd.node
       |  WHERE na.n2 > 0 AND nb.n2 > 0),
       |gen AS (SELECT min(em.vec_id) AS entry FROM embeddings em
       |  JOIN norms n ON n.vec_id = em.vec_id
       |  WHERE em.vec_id >= ${Similarity.NumProbes} AND n.n2 > 0
       |  GROUP BY em.label),
       |gf0 AS (SELECT probe_id, node, cos_sim FROM (
       |    SELECT pc.probe_id, pc.node, pc.cos_sim,
       |      row_number() OVER (PARTITION BY pc.probe_id
       |        ORDER BY pc.cos_sim DESC, pc.node) AS rk
       |    FROM pc JOIN gen ON pc.node = gen.entry)
       |  WHERE rk <= $beam),
       |$hops""".stripMargin
  }

  /** Raw-quantized PQ head CTE: (vec_id, q) straight from the
    * quantizer — what [[pqCtes]] consumes for the codebook report.
    */
  private val pqRawHead: String =
    s"""pq_q AS (SELECT vec_id,
       |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings)""".stripMargin

  /** Normalized-quantized PQ head (twin of
    * Vectors.quantizedNormalized): components re-scaled onto the
    * unit sphere at Scale, zero-norm vectors dropped — the storage
    * form of a cosine-serving ADC index.
    */
  private val pqNormHead: String =
    s"""pq_q0 AS (SELECT vec_id,
       |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
       |pq_n0 AS (SELECT vec_id, q,
       |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
       |  FROM pq_q0),
       |pq_q AS (SELECT vec_id, list_transform(q, x ->
       |    CAST(round(CAST(x AS DOUBLE) * ${Vectors.Scale}
       |      / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)) AS q
       |  FROM pq_n0 WHERE n2 > 0)""".stripMargin

  /** PQ model CTE chain (twin of Similarity.pqParts): `head` ends in
    * a `pq_q` (vec_id, q) CTE — raw for the codebook report,
    * normalized for the cosine-serving ADC scan — then flatten into
    * (sub, il) sub-components → SRP sign-bit initial codes →
    * rounded-mean codebook → refine E-step ranked by (d2, code).
    * Ends at `best` (rk=1 = the chosen assignment); `f` and `comp`
    * remain visible for the ADC consumers.
    */
  private def pqCtes(head: String): String =
    s"""$head,
       |pq_flat AS (SELECT vec_id, generate_subscripts(q, 1) - 1 AS i,
       |    unnest(q) AS v FROM pq_q),
       |f AS (SELECT vec_id, i // ${Similarity.PqWidth} AS sub,
       |    i % ${Similarity.PqWidth} AS il, v FROM pq_flat),
       |pl AS (SELECT j, p, i,
       |    CAST(('0x' || substr(md5('pq#' || j || '#' || p || '#' || i),
       |      1, 15)) AS BIGINT) % 2001 - 1000 AS w
       |  FROM range(${Similarity.PqSub}) tj(j),
       |    range(${Similarity.PqBits}) tp(p),
       |    range(${Similarity.PqWidth}) ti(i)),
       |dots AS (SELECT f.vec_id, f.sub, pl.p,
       |    CAST(sum(pl.w * f.v) AS BIGINT) AS d
       |  FROM f JOIN pl ON pl.j = f.sub AND pl.i = f.il
       |  GROUP BY 1, 2, 3),
       |code0 AS (SELECT vec_id, sub,
       |    CAST(sum(CASE WHEN d >= 0 THEN CAST(1 AS BIGINT) << p
       |      ELSE 0 END) AS BIGINT) AS c
       |  FROM dots GROUP BY 1, 2),
       |comp AS (SELECT f.sub, c0.c AS code, f.il,
       |    CAST(round(CAST(sum(f.v) AS DOUBLE) / count(*)) AS BIGINT) AS m
       |  FROM f JOIN code0 c0 ON c0.vec_id = f.vec_id AND c0.sub = f.sub
       |  GROUP BY 1, 2, 3),
       |d2 AS (SELECT f.vec_id, f.sub, comp.code,
       |    CAST(sum((f.v - comp.m) * (f.v - comp.m)) AS BIGINT) AS d2
       |  FROM f JOIN comp ON comp.sub = f.sub AND comp.il = f.il
       |  GROUP BY 1, 2, 3),
       |best AS (SELECT vec_id, sub, code, d2,
       |    row_number() OVER (PARTITION BY vec_id, sub
       |      ORDER BY d2, code) AS rk
       |  FROM d2)""".stripMargin

  /** Exact brute-force top-k baseline chain (assumes `embCtes` in
    * scope; ends at `bfk` = the exact (probe, neighbor) top-k) — ONE
    * text shared by every recall oracle so the baseline cannot
    * drift between gauges.
    */
  /** Shared oracle for cdc_checkpoint_frontier and its streaming
    * twin cdc_stream_frontier (identical claimed semantics ⇒ one
    * recomputation): shard + seq chain, planted acks, prefix-acked
    * running min, replay arithmetic.
    */
  private lazy val checkpointFrontierSql: String =
    s"""$C, s0 AS (SELECT ts, event_id,
       |    ${Portable.duckHash("partition_key")} % 8 AS shard
       |  FROM c WHERE ts IS NOT NULL),
       |q AS (SELECT *, CAST(row_number() OVER (PARTITION BY shard
       |    ORDER BY ts, event_id) AS BIGINT) AS seq FROM s0),
       |q2 AS (SELECT *, (event_id % 37 <> 0) AS acked FROM q),
       |q3 AS (SELECT *, min(CASE WHEN acked THEN 1 ELSE 0 END) OVER (
       |    PARTITION BY shard ORDER BY seq
       |    ROWS UNBOUNDED PRECEDING) AS pfx FROM q2),
       |g AS (SELECT shard,
       |    CAST(count(*) AS BIGINT) AS n_records,
       |    CAST(count(*) FILTER (WHERE acked) AS BIGINT) AS n_acked,
       |    CAST(sum(pfx) AS BIGINT) AS frontier_seq,
       |    arg_max(ts, seq) FILTER (WHERE pfx = 1) AS frontier_ts,
       |    arg_max(event_id, seq) FILTER (WHERE pfx = 1)
       |      AS frontier_event_id,
       |    min(seq) FILTER (WHERE NOT acked) AS first_gap_seq
       |  FROM q3 GROUP BY 1)
       |SELECT shard, n_records, n_acked, frontier_seq, frontier_ts,
       |  frontier_event_id, first_gap_seq,
       |  n_acked - frontier_seq AS n_beyond_frontier,
       |  n_records - frontier_seq AS n_redelivered
       |FROM g ORDER BY shard""".stripMargin

  /** Multi-probe LSH candidate + ranking chain (twin of
    * Similarity.topKAnnMultiprobe): per probe band bucket, the code
    * itself plus its rowsPerBand Hamming-1 variants, then the shared
    * dot/cosine/rank tail. Assumes embCtes + srpCtes in scope; ends
    * at `mr` (ranked candidates). m-prefixed so it composes next to
    * exactTopKCtes for the recall gauge.
    */
  /** Multi-probe variant list (duck twin of
    * Similarity.multiprobeVariants) — one definition for the
    * standalone ranker's chain and the frontier's config row.
    */
  private def duckMultiprobeVariants(b: String): String =
    (b +: (0 until Dedup.EmbRowsPerBand).map(x => s"xor($b, ${1L << x})"))
      .mkString(", ")

  private lazy val multiprobeCtes: String =
    s"""mp AS (SELECT pb.vec_id AS probe_id, pb.band,
       |    unnest([${duckMultiprobeVariants("pb.bucket")}]) AS bucket
       |  FROM buckets pb WHERE pb.vec_id < ${Similarity.NumProbes}),
       |mcand AS (SELECT DISTINCT mp.probe_id, b.vec_id AS neighbor_id
       |  FROM mp JOIN buckets b ON b.band = mp.band AND b.bucket = mp.bucket
       |    AND b.vec_id <> mp.probe_id),
       |md AS (SELECT c.probe_id, c.neighbor_id,
       |    CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
       |  FROM mcand c
       |  JOIN flat fa ON fa.vec_id = c.probe_id
       |  JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
       |  GROUP BY 1, 2),
       |ms AS (SELECT md.probe_id, md.neighbor_id,
       |    ${Vectors.duckCosine("md.dot", "na.n2", "nb.n2")} AS cos_sim
       |  FROM md
       |  JOIN norms na ON na.vec_id = md.probe_id
       |  JOIN norms nb ON nb.vec_id = md.neighbor_id
       |  WHERE na.n2 > 0 AND nb.n2 > 0),
       |mr AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk FROM ms)"""
      .stripMargin

  /** Sign-bit Hamming chain (twin of Similarity.topKAnnHamming):
    * lo/hi 32-bit packs from the flat relation, popcount ranking.
    * Assumes embCtes in scope; ends at `hr`. h-prefixed.
    */
  private lazy val hammingCtes: String =
    s"""hs AS (SELECT f.vec_id,
       |    CAST(sum(CASE WHEN f.v >= 0 AND f.i < 32
       |      THEN (1::BIGINT << f.i) ELSE 0 END) AS BIGINT) AS lo,
       |    CAST(sum(CASE WHEN f.v >= 0 AND f.i >= 32
       |      THEN (1::BIGINT << (f.i - 32)) ELSE 0 END) AS BIGINT) AS hi
       |  FROM flat f JOIN norms n ON n.vec_id = f.vec_id AND n.n2 > 0
       |  GROUP BY 1),
       |hp AS (SELECT vec_id AS probe_id, lo AS lo_p, hi AS hi_p
       |  FROM hs WHERE vec_id < ${Similarity.NumProbes}),
       |hsc AS (SELECT hp.probe_id, hs.vec_id AS neighbor_id,
       |    CAST(bit_count(xor(hs.lo, hp.lo_p))
       |      + bit_count(xor(hs.hi, hp.hi_p)) AS BIGINT) AS hamming
       |  FROM hs JOIN hp ON hs.vec_id <> hp.probe_id),
       |hr AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
       |    ORDER BY hamming, neighbor_id) AS BIGINT) AS rk FROM hsc)"""
      .stripMargin

  private val exactTopKCtes: String =
    s"""bd AS (SELECT fp.vec_id AS probe_id, fx.vec_id AS neighbor_id,
       |    CAST(sum(fp.v * fx.v) AS BIGINT) AS dot
       |  FROM flat fp
       |  JOIN flat fx ON fx.i = fp.i AND fx.vec_id <> fp.vec_id
       |  WHERE fp.vec_id < ${Similarity.NumProbes}
       |  GROUP BY 1, 2),
       |bs AS (SELECT bd.probe_id, bd.neighbor_id,
       |    ${Vectors.duckCosine("bd.dot", "na.n2", "nb.n2")} AS cos_sim
       |  FROM bd
       |  JOIN norms na ON na.vec_id = bd.probe_id
       |  JOIN norms nb ON nb.vec_id = bd.neighbor_id
       |  WHERE na.n2 > 0 AND nb.n2 > 0),
       |br AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM bs),
       |bfk AS (SELECT probe_id, neighbor_id FROM br
       |  WHERE rk <= ${Similarity.TopK})""".stripMargin

  /** IVF coarse-quantizer cell selection (twin of
    * Similarity.ivfTopCells; assumes `embCtes` in scope; ends at
    * `itc` = each probe's nProbe nearest cells). i-prefixed names so
    * the chain composes next to pqCtes' `comp`. ONE text shared by
    * the exact-IVF ranker, the recall curve, and the IVF-PQ
    * composition.
    */
  private def ivfCellCtes(
      nProbe: Int,
      labSql: String = "SELECT vec_id, label FROM embeddings"): String =
    s"""lab AS ($labSql),
       |icomp AS (SELECT l.label, fl.i,
       |    CAST(round(CAST(sum(fl.v) AS DOUBLE) / count(*)) AS BIGINT) AS s
       |  FROM flat fl JOIN lab l ON l.vec_id = fl.vec_id GROUP BY 1, 2),
       |icells AS (SELECT label, greatest(CAST(sum(s*s) AS BIGINT), 1) AS sn2
       |  FROM icomp GROUP BY 1),
       |ipc AS (SELECT fl.vec_id AS probe_id, c.label,
       |    CAST(sum(fl.v * c.s) AS BIGINT) AS dotpc
       |  FROM flat fl JOIN icomp c ON c.i = fl.i
       |  WHERE fl.vec_id < ${Similarity.NumProbes} GROUP BY 1, 2),
       |isc AS (SELECT ipc.probe_id, ipc.label,
       |    CAST(dotpc AS DOUBLE)
       |      / sqrt(CAST(n.n2 AS DOUBLE) * CAST(cl.sn2 AS DOUBLE)) AS cell_cos
       |  FROM ipc
       |  JOIN norms n ON n.vec_id = ipc.probe_id AND n.n2 > 0
       |  JOIN icells cl ON cl.label = ipc.label),
       |itc AS (SELECT probe_id, label FROM (
       |    SELECT isc.*, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cell_cos DESC, label) AS crk FROM isc) t
       |  WHERE crk <= $nProbe)""".stripMargin

  /** Unrolled k-means training chain (twin of
    * Similarity.kmeansLoop): label-seeded assignment refined for
    * `nIter` E/M rounds; ends at `a{nIter}` (vec_id, old_cell,
    * cell). Same rounded-mean centroids, cosine-direction scoring
    * and smaller-cell tie-break as the one-step kmeansAssignCtes.
    */
  private def kmeansTrainCtes(
      nIter: Int, p: String = "km", seed: String = "label"): String = {
    val sb = new StringBuilder
    sb.append(
      s"""${p}q AS (SELECT vec_id, $seed AS cell,
         |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
         |${p}f0 AS (SELECT vec_id, cell, generate_subscripts(q, 1) - 1 AS i,
         |    unnest(q) AS v FROM ${p}q),
         |${p}fb AS (SELECT vec_id, i, v FROM ${p}f0)""".stripMargin)
    for (r <- 1 to nIter) {
      sb.append(
        s""",
           |${p}comp$r AS (SELECT cell, i,
           |    CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS s
           |  FROM ${p}f${r - 1} GROUP BY 1, 2),
           |${p}cells$r AS (SELECT cell,
           |    greatest(CAST(sum(s * s) AS BIGINT), 1) AS sn2
           |  FROM ${p}comp$r GROUP BY 1),
           |${p}d$r AS (SELECT f.vec_id, f.cell AS old_cell, c.cell AS cand,
           |    CAST(sum(f.v * c.s) AS BIGINT) AS dot
           |  FROM ${p}f${r - 1} f JOIN ${p}comp$r c ON c.i = f.i
           |  GROUP BY 1, 2, 3),
           |${p}a$r AS (SELECT vec_id, old_cell, cand AS cell FROM (
           |    SELECT d.vec_id, d.old_cell, d.cand,
           |      row_number() OVER (PARTITION BY d.vec_id
           |        ORDER BY CAST(d.dot AS DOUBLE)
           |          / sqrt(CAST(ce.sn2 AS DOUBLE)) DESC, d.cand) AS rk
           |    FROM ${p}d$r d JOIN ${p}cells$r ce ON ce.cell = d.cand) t
           |  WHERE rk = 1),
           |${p}f$r AS (SELECT a.vec_id, a.cell, fb.i, fb.v
           |  FROM ${p}a$r a JOIN ${p}fb fb ON fb.vec_id = a.vec_id)"""
          .stripMargin)
    }
    sb.toString
  }

  /** IVF-PQ composed chain (twin of Similarity.topKAnnIvfPq):
    * assumes `embCtes` (raw chain: qv/flat/norms, for the coarse
    * cells) and `pqCtes(pqNormHead)` (codebook + codes) are already
    * in scope. IVF-side CTEs carry an `i` prefix to avoid clashing
    * with the PQ chain's `comp`. Ends at `ipqr` (the ranked composed
    * result).
    */
  private val ivfPqCtes: String =
    s"""${ivfCellCtes(Similarity.IvfNProbe)},
       |icand AS (SELECT itc.probe_id, l.vec_id
       |  FROM itc JOIN lab l ON l.label = itc.label
       |    AND l.vec_id <> itc.probe_id),
       |ipq_codes AS (SELECT vec_id, sub, code FROM best WHERE rk = 1),
       |ipq_pflat AS (SELECT vec_id AS probe_id, sub, il, v FROM f
       |  WHERE vec_id < ${Similarity.NumProbes}),
       |ipq_lut AS (SELECT p.probe_id, c.sub, c.code,
       |    CAST(sum((p.v - c.m) * (p.v - c.m)) AS BIGINT) AS pd2
       |  FROM ipq_pflat p JOIN comp c ON c.sub = p.sub AND c.il = p.il
       |  GROUP BY 1, 2, 3),
       |ipq_sc AS (SELECT ic.probe_id, cd.vec_id AS neighbor_id,
       |    CAST(sum(l.pd2) AS BIGINT) AS approx_d2
       |  FROM icand ic
       |  JOIN ipq_codes cd ON cd.vec_id = ic.vec_id
       |  JOIN ipq_lut l ON l.probe_id = ic.probe_id AND l.sub = cd.sub
       |    AND l.code = cd.code
       |  GROUP BY 1, 2),
       |ipqr AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
       |    ORDER BY approx_d2, neighbor_id) AS BIGINT) AS rk
       |  FROM ipq_sc)""".stripMargin

  /** ONE template for both attribution twins — they differ only in
    * the window function that picks the credited touch
    * (last_value = closing credit, first_value = discovery credit),
    * mirroring Analytics.touchAttribution's single parameter.
    */
  private def attributionOracle(winFn: String): String =
    s"""WITH t AS (SELECT user_id, event_id, ts, event_type, value,
       |    $winFn(CASE WHEN event_type <> 'purchase' THEN
       |        struct_pack(t_us := epoch_us(ts), ch := event_type)
       |      END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
       |  FROM events),
       |p AS (SELECT *, epoch_us(ts) - (touch).t_us AS age_us FROM t
       |  WHERE event_type = 'purchase'),
       |c AS (SELECT CASE WHEN touch IS NULL
       |      OR age_us > ${7L * 86400000000L} THEN 'direct'
       |    ELSE (touch).ch END AS channel, value, age_us FROM p)
       |SELECT channel, count(*) AS n_conversions,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       |  CAST(sum(CASE WHEN channel <> 'direct' THEN age_us END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) / 60000000.0 AS avg_min_to_touch
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared full-load → CDC handoff chain (ends at the per-key merge
    * relation `k`) — consumed by both the batch audit oracle and the
    * streaming roundtrip oracle so the two cannot drift.
    */
  private val handoffKCtes: String =
    s"""$C, f AS (
         |  SELECT user_id, table_name, op, ts, event_id, value,
         |    TIMESTAMP '2024-01-29 00:00:00'
         |      + to_seconds(${Portable.duckHash("CAST(user_id AS VARCHAR)")}
         |        % 86400) AS read_ts
         |  FROM c WHERE ts IS NOT NULL),
         |snap AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM f WHERE ts <= read_ts) s
         |  WHERE rn = 1 AND op <> 'delete'),
         |u AS (
         |  SELECT user_id, table_name, value, ts AS src_ts,
         |    event_id AS src_event_id, 'load' AS src, 'load' AS op,
         |    read_ts AS pos_ts, 9223372036854775807 AS pos_seq,
         |    FALSE AS cached
         |  FROM snap
         |  UNION ALL
         |  SELECT user_id, table_name, value, ts, event_id, 'cdc', op,
         |    ts, event_id, ts <= read_ts
         |  FROM f WHERE ts > TIMESTAMP '2024-01-29 00:00:00'),
         |w AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY pos_ts DESC, pos_seq DESC) AS rn FROM u),
         |k AS (SELECT user_id, max(table_name) AS table_name,
         |    max(CASE WHEN src = 'load' THEN 1 ELSE 0 END) AS has_snap,
         |    sum(CASE WHEN src = 'cdc' THEN 1 ELSE 0 END) AS n_cdc,
         |    sum(CASE WHEN cached THEN 1 ELSE 0 END) AS n_cached,
         |    max(CASE WHEN rn = 1 THEN src END) AS win_src,
         |    max(CASE WHEN rn = 1 THEN op END) AS win_op,
         |    max(CASE WHEN rn = 1 THEN src_event_id END) AS win_event_id,
         |    max(CASE WHEN rn = 1 THEN value END) AS win_value
         |  FROM w GROUP BY 1)""".stripMargin

  /** Force DuckDB to MATERIALIZE every CTE of a non-recursive oracle.
    * DuckDB 1.x INLINES CTEs by default, so an oracle with unrolled
    * iteration (k-core peeling, PageRank rounds, k-means epochs,
    * graph-walk hops — each round referencing the previous one
    * several times) re-expands the whole upstream pipeline
    * EXPONENTIALLY in the round count: the sf0.1 replay measured the
    * k-core oracle spilling >70 GB of DuckDB temp before dying,
    * while the same query materialized runs in 7 s. The hint changes
    * evaluation strategy only, never results; the full sf0.01 gate
    * replays green under it. Recursive-CC oracles are left verbatim
    * (the self-referencing CTE cannot be materialized).
    */
  private def materializeCtes(sql: String): String =
    if (sql.startsWith("WITH RECURSIVE")) sql
    else sql.replace(" AS (", " AS MATERIALIZED (")
      // named-window definitions (WINDOW w AS (...), w2 AS (...))
      // share the `AS (` spelling but take no materialization hint —
      // undo by body shape: a window body opens with PARTITION BY /
      // ORDER BY, a CTE body never does (it is a SELECT/VALUES)
      .replaceAll("""AS MATERIALIZED \((PARTITION BY|ORDER BY)""", "AS ($1")

  def oracleSql: Map[String, String] =
    rawOracleSql.map { case (k, v) => k -> materializeCtes(v) }

  private def rawOracleSql: Map[String, String] = Map(
    "cdc_apply_changes" ->
      s"""$C, r AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn FROM c)
         |SELECT user_id, event_id AS last_event_id, ts AS last_ts,
         |  value AS last_value, table_name
         |FROM r WHERE rn = 1 AND op <> 'delete' ORDER BY user_id""".stripMargin,

    "cdc_replay_at" ->
      s"""$C, f AS (SELECT * FROM c WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn FROM f)
         |SELECT table_name, count(*) AS n_keys,
         |  CAST(sum(CAST(value AS $D)) AS DOUBLE) AS total_value,
         |  max(ts) AS max_ts
         |FROM r WHERE rn = 1 AND op <> 'delete'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_retention_audit" ->
      s"""$C, h AS (SELECT max(ts) - INTERVAL 24 HOUR AS horizon_ts FROM c),
         |p AS (SELECT unnest([TIMESTAMP '2024-01-15 00:00:00',
         |  TIMESTAMP '2024-01-30 12:00:00']) AS replay_ts)
         |SELECT c.table_name, p.replay_ts, h.horizon_ts,
         |  count(*) AS n_events,
         |  CAST(count(*) FILTER (WHERE c.ts < h.horizon_ts) AS BIGINT)
         |    AS n_aged_out,
         |  min(c.ts) FILTER (WHERE c.ts >= h.horizon_ts)
         |    AS oldest_reachable_ts,
         |  CAST(count(*) FILTER (WHERE c.ts > p.replay_ts
         |    AND c.ts < h.horizon_ts) AS BIGINT) AS n_lost_for_replay,
         |  count(*) FILTER (WHERE c.ts > p.replay_ts
         |    AND c.ts < h.horizon_ts) = 0 AS reachable
         |FROM c, h, p
         |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

    "cdc_consume_resume" ->
      s"""$C, s0 AS (SELECT ts, event_id,
         |    ${Portable.duckHash("partition_key")} % 8 AS shard
         |  FROM c WHERE ts IS NOT NULL),
         |h AS (SELECT max(ts) - INTERVAL 24 HOUR AS horizon_ts FROM s0),
         |q AS (SELECT *, CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY ts, event_id) AS BIGINT) AS seq FROM s0),
         |q2 AS (SELECT q.*, h.horizon_ts,
         |    max(CASE WHEN ts <= TIMESTAMP '2024-01-30 12:00:00'
         |      THEN seq END) OVER (PARTITION BY shard) AS cp_seq
         |  FROM q, h),
         |q3 AS (SELECT *, ts >= horizon_ts AS retained,
         |    (cp_seq IS NULL OR seq > cp_seq) AS after_cp FROM q2),
         |g AS (SELECT shard,
         |    CAST(count(*) FILTER (WHERE NOT retained) AS BIGINT)
         |      AS n_aged_out,
         |    arg_min(ts, seq) FILTER (WHERE retained) AS th_ts,
         |    arg_min(event_id, seq) FILTER (WHERE retained) AS th_eid,
         |    CAST(count(*) FILTER (WHERE retained) AS BIGINT) AS th_served,
         |    arg_min(ts, seq) FILTER (WHERE retained
         |      AND ts >= TIMESTAMP '2024-01-29 00:00:00') AS at_ts,
         |    arg_min(event_id, seq) FILTER (WHERE retained
         |      AND ts >= TIMESTAMP '2024-01-29 00:00:00') AS at_eid,
         |    CAST(count(*) FILTER (WHERE retained
         |      AND ts >= TIMESTAMP '2024-01-29 00:00:00') AS BIGINT)
         |      AS at_served,
         |    CAST(count(*) FILTER (WHERE retained
         |      AND ts < TIMESTAMP '2024-01-29 00:00:00') AS BIGINT)
         |      AS at_skipped,
         |    CAST(count(*) FILTER (WHERE NOT retained
         |      AND ts > TIMESTAMP '2024-01-29 00:00:00') AS BIGINT)
         |      AS at_lost,
         |    arg_min(ts, seq) FILTER (WHERE retained AND after_cp)
         |      AS as_ts,
         |    arg_min(event_id, seq) FILTER (WHERE retained AND after_cp)
         |      AS as_eid,
         |    CAST(count(*) FILTER (WHERE retained AND after_cp) AS BIGINT)
         |      AS as_served,
         |    CAST(count(*) FILTER (WHERE retained AND NOT after_cp)
         |      AS BIGINT) AS as_skipped,
         |    CAST(count(*) FILTER (WHERE NOT retained AND after_cp)
         |      AS BIGINT) AS as_lost
         |  FROM q3 GROUP BY 1),
         |u AS (
         |  SELECT shard, n_aged_out, 'TRIM_HORIZON' AS iterator_type,
         |    th_ts AS start_ts, th_eid AS start_event_id,
         |    th_served AS n_served, CAST(0 AS BIGINT) AS n_skipped,
         |    CAST(0 AS BIGINT) AS n_lost FROM g
         |  UNION ALL
         |  SELECT shard, n_aged_out, 'AT_TIMESTAMP', at_ts, at_eid,
         |    at_served, at_skipped, at_lost FROM g
         |  UNION ALL
         |  SELECT shard, n_aged_out, 'AFTER_SEQUENCE', as_ts, as_eid,
         |    as_served, as_skipped, as_lost FROM g)
         |SELECT *, CASE WHEN n_lost = 0 THEN 'ok' ELSE 'data-loss' END
         |  AS verdict
         |FROM u ORDER BY shard, iterator_type""".stripMargin,

    // Same one-shard-exchange chain as cdc_consume_resume; the
    // prefix-acked running min turns the gap census into plain sums.
    "cdc_checkpoint_frontier" -> checkpointFrontierSql,

    // ONE oracle text for the batch audit and its streaming twin —
    // the two operators claim the same semantics, so they must be
    // held to the same recomputation.
    "cdc_stream_frontier" -> checkpointFrontierSql,

    "cdc_snapshot_handoff" ->
      s"""$handoffKCtes,
         |fs AS (SELECT user_id, table_name, event_id, value FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn FROM f) s
         |  WHERE rn = 1 AND op <> 'delete'),
         |cmp AS (SELECT coalesce(m.table_name, fs.table_name) AS table_name,
         |    CASE WHEN m.user_id IS NULL OR fs.user_id IS NULL
         |      OR m.win_event_id <> fs.event_id
         |      OR m.win_value IS DISTINCT FROM fs.value
         |      THEN 1 ELSE 0 END AS mm
         |  FROM (SELECT * FROM k WHERE win_op <> 'delete') m
         |  FULL OUTER JOIN fs ON m.user_id = fs.user_id),
         |mm AS (SELECT table_name, CAST(sum(mm) AS BIGINT) AS n_mismatch
         |  FROM cmp GROUP BY 1),
         |a AS (SELECT table_name,
         |    CAST(sum(has_snap) AS BIGINT) AS n_snapshot_keys,
         |    CAST(sum(n_cdc) AS BIGINT) AS n_cdc_events,
         |    CAST(sum(n_cached) AS BIGINT) AS n_double_delivered,
         |    CAST(sum(CASE WHEN n_cdc = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_unchanged_keys,
         |    CAST(sum(CASE WHEN has_snap = 1 AND n_cdc > 0
         |      AND win_src = 'load' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_cached_only_keys,
         |    CAST(sum(CASE WHEN has_snap = 1 AND win_src = 'cdc'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_overridden_keys,
         |    CAST(sum(CASE WHEN has_snap = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_cdc_new_keys,
         |    CAST(sum(CASE WHEN win_op = 'delete' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_deleted_keys,
         |    CAST(sum(CASE WHEN win_op <> 'delete' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_final_keys
         |  FROM k GROUP BY 1)
         |SELECT a.table_name, a.n_snapshot_keys, a.n_cdc_events,
         |  a.n_double_delivered, a.n_unchanged_keys, a.n_cached_only_keys,
         |  a.n_overridden_keys, a.n_cdc_new_keys, a.n_deleted_keys,
         |  a.n_final_keys, coalesce(mm.n_mismatch, 0) AS n_mismatch
         |FROM a LEFT JOIN mm ON a.table_name = mm.table_name
         |ORDER BY 1""".stripMargin,

    "cdc_stream_handoff" ->
      s"""$handoffKCtes
         |SELECT table_name,
         |  CAST(count(*) FILTER (WHERE win_op <> 'delete') AS BIGINT)
         |    AS n_keys,
         |  CAST(sum(CAST(win_value AS $D))
         |    FILTER (WHERE win_op <> 'delete') AS DOUBLE) AS total_value,
         |  CAST(count(*) FILTER (WHERE win_op <> 'delete'
         |    AND win_src = 'load') AS BIGINT) AS n_from_snapshot,
         |  CAST(count(*) FILTER (WHERE win_op <> 'delete'
         |    AND win_src = 'cdc') AS BIGINT) AS n_from_cdc
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_compacted_log" ->
      s"""$C, r AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn FROM c),
         |k AS (SELECT table_name, count(*) AS n_keys,
         |    count(*) FILTER (WHERE op = 'delete') AS n_tombstones
         |  FROM r WHERE rn = 1 GROUP BY 1),
         |raw AS (SELECT table_name, count(*) AS n_raw FROM c GROUP BY 1)
         |SELECT k.table_name, raw.n_raw, k.n_keys,
         |  k.n_keys - k.n_tombstones AS n_live, k.n_tombstones,
         |  CAST(k.n_keys AS DOUBLE) / CAST(raw.n_raw AS DOUBLE)
         |    AS compaction_ratio
         |FROM k JOIN raw USING (table_name) ORDER BY 1""".stripMargin,

    "cdc_table_statistics" ->
      s"""$C
         |SELECT schema_name, table_name,
         |  CAST(sum(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS inserts,
         |  CAST(sum(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS updates,
         |  CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS deletes,
         |  CAST(sum(CASE WHEN op IN ('create-table','drop-table','alter-table')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS ddls,
         |  CAST(sum(CASE WHEN op = 'load' THEN 1 ELSE 0 END) AS BIGINT) AS full_load_rows,
         |  count(*) AS total
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "cdc_lob_truncation" ->
      s"""WITH s AS (SELECT source,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT source AS group_key, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN nb > $LobBudgetBytes THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_truncated,
         |  CAST(sum(nb) AS BIGINT) AS bytes_total,
         |  CAST(sum(least(nb, $LobBudgetBytes)) AS BIGINT) AS bytes_kept,
         |  CAST(sum(greatest(nb - $LobBudgetBytes, 0)) AS BIGINT)
         |    AS bytes_lost,
         |  max(nb) AS max_lob_bytes,
         |  CAST(ceil(CAST(max(nb) AS DOUBLE) / 1024.0) AS BIGINT)
         |    AS suggested_lob_kb
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_selection_rules" ->
      s"""SELECT source AS table_name, count(*) AS n_rows,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |WHERE ${TableMapping.duckPredicate(selectionDemoRules, "'graft'", "source")}
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_before_image" ->
      s"""$C, b AS (
         |  SELECT *,
         |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS before_value,
         |    lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS before_event_id
         |  FROM c)
         |SELECT user_id, event_id, value, before_value, before_event_id
         |FROM b WHERE op = 'update' ORDER BY user_id, event_id""".stripMargin,

    "cdc_partition_key" ->
      s"""$C
         |SELECT partition_key,
         |  ${graft.functions.Portable.duckHash("partition_key")} % 8 AS shard,
         |  count(*) AS n_messages
         |FROM c GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "cdc_full_load" -> {
      // Table list derived from the SAME mapping the query uses, so
      // editing the demo rules can't desynchronize the oracle.
      val selected = TableMapping.Mapping(fullLoadDemoRules)
        .selectTables(FullLoad.catalog).map(_._2).sorted
      val parts = selected.flatMap { t =>
        Seq(
          s"SELECT '$t' AS table_name, 'drop-table' AS op, CAST(1 AS BIGINT) AS n_records",
          s"SELECT '$t', 'create-table', CAST(1 AS BIGINT)",
          s"SELECT '$t', 'load', (SELECT count(*) FROM $t)")
      }
      s"SELECT * FROM (${parts.mkString(" UNION ALL ")}) t ORDER BY table_name, op"
    },

    "cdc_tiering_plan" ->
      s"""$C,
         |h AS (SELECT max(ts) AS head_ts FROM c WHERE ts IS NOT NULL),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM c WHERE ts IS NOT NULL),
         |st AS (SELECT r.table_name,
         |    CAST(CAST(h.head_ts AS DATE) - CAST(r.ts AS DATE) AS BIGINT)
         |      AS days_inactive,
         |    24 + length(coalesce(r.props, '')) AS key_bytes
         |  FROM r, h WHERE rn = 1 AND op <> 'delete'),
         |t AS (SELECT table_name,
         |    CASE WHEN days_inactive <= 7 THEN 'hot'
         |      WHEN days_inactive <= 30 THEN 'warm'
         |      ELSE 'cold' END AS tier,
         |    days_inactive, key_bytes FROM st)
         |SELECT table_name, tier, count(*) AS n_keys,
         |  CAST(sum(key_bytes) AS BIGINT) AS tier_bytes,
         |  CAST(min(days_inactive) AS BIGINT) AS min_days,
         |  CAST(max(days_inactive) AS BIGINT) AS max_days
         |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "cdc_state_size" ->
      s"""$C,
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn FROM c),
         |st AS (SELECT table_name,
         |    24 + length(coalesce(props, '')) AS key_bytes
         |  FROM r WHERE rn = 1 AND op <> 'delete')
         |SELECT table_name, count(*) AS n_live_keys,
         |  CAST(sum(key_bytes) AS BIGINT) AS state_bytes,
         |  CAST(sum(key_bytes) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS avg_bytes_per_key,
         |  CAST((sum(key_bytes) + 1048575) // 1048576 AS BIGINT) AS n_shards
         |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_backfill_plan" ->
      s"""$C,
         |k AS (SELECT DISTINCT user_id FROM c WHERE ts IS NOT NULL),
         |r AS (SELECT user_id,
         |    CAST(ntile(8) OVER (ORDER BY user_id) AS BIGINT) AS seg FROM k),
         |h AS (SELECT max(ts) AS head_ts FROM c WHERE ts IS NOT NULL),
         |j AS (SELECT r.seg, c.user_id,
         |    CASE WHEN c.ts < h.head_ts - INTERVAL 24 HOUR
         |      THEN 1 ELSE 0 END AS aged
         |  FROM c JOIN r USING (user_id), h WHERE c.ts IS NOT NULL)
         |SELECT seg, min(user_id) AS lo_key, max(user_id) AS hi_key,
         |  count(DISTINCT user_id) AS n_keys, count(*) AS n_changes,
         |  CAST(sum(aged) AS BIGINT) AS n_aged,
         |  CAST(sum(aged) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS aged_share,
         |  CASE WHEN sum(aged) > 0 THEN 'reload' ELSE 'replay' END AS decision
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // streaming execution, batch formula: closed versions only (the
    // open version per key lives in state, not the append sink)
    "cdc_stream_scd2" ->
      s"""$C,
         |r AS (SELECT user_id, op, table_name, value, ts,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS version,
         |    lead(ts) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS valid_to
         |  FROM c WHERE ts IS NOT NULL)
         |SELECT user_id, CAST(version AS BIGINT) AS version, op,
         |  table_name, value AS attr_value, ts AS valid_from, valid_to
         |FROM r WHERE valid_to IS NOT NULL
         |ORDER BY user_id, version""".stripMargin,

    "cdc_latency_slo" ->
      s"""$C,
         |lat AS (SELECT table_name, event_id,
         |    ${Portable.duckHash("CAST(event_id AS VARCHAR)")} % 30000000
         |      + CASE WHEN user_id % 13 = 0 THEN 300000000 ELSE 0 END
         |      AS lat_us
         |  FROM c WHERE ts IS NOT NULL),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY table_name
         |    ORDER BY lat_us, event_id) AS BIGINT) AS rn,
         |    count(*) OVER (PARTITION BY table_name) AS n FROM lat)
         |SELECT table_name, count(*) AS n_records,
         |  CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN lat_us END)
         |    AS BIGINT) AS p50_us,
         |  CAST(max(CASE WHEN rn = (n * 95 + 99) // 100 THEN lat_us END)
         |    AS BIGINT) AS p95_us,
         |  CAST(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN lat_us END)
         |    AS BIGINT) AS p99_us,
         |  CAST(max(lat_us) AS BIGINT) AS max_us,
         |  CAST(sum(CASE WHEN lat_us > 60000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_slo_miss,
         |  CAST(count(*) - sum(CASE WHEN lat_us > 60000000 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS slo_rate
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // the roundtrip equality is asserted inside the query (CSV write
    // + read-back both happen Spark-side); the oracle recomputes the
    // source-side sums and pins every parity flag TRUE
    "cdc_csv_roundtrip" ->
      s"""$C
         |SELECT table_name, count(*) AS n_rows,
         |  CAST(sum(user_id % 1000000000) AS BIGINT) AS user_sum,
         |  CAST(sum(${Portable.duckHash(
             "coalesce(props, '')")} % 1000000000) AS BIGINT) AS props_hash,
         |  TRUE AS rows_ok, TRUE AS keys_ok,
         |  TRUE AS payload_ok, TRUE AS values_ok
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_orc_roundtrip" ->
      s"""$C
         |SELECT table_name, count(*) AS n_rows,
         |  CAST(sum(user_id % 1000000000) AS BIGINT) AS user_sum,
         |  CAST(sum(${Portable.duckHash(
             "coalesce(props, '')")} % 1000000000) AS BIGINT) AS props_hash,
         |  TRUE AS rows_ok, TRUE AS keys_ok,
         |  TRUE AS payload_ok, TRUE AS values_ok
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_scd2" ->
      s"""$C,
         |r AS (SELECT user_id, op, table_name, value, ts,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS version,
         |    lead(ts) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS valid_to
         |  FROM c WHERE ts IS NOT NULL)
         |SELECT user_id, CAST(version AS BIGINT) AS version, op,
         |  table_name, value AS attr_value, ts AS valid_from, valid_to,
         |  (valid_to IS NULL AND op <> 'delete') AS is_current
         |FROM r ORDER BY user_id, version""".stripMargin,

    "cdc_full_load_ranges" ->
      """SELECT seg, min(o_orderkey) AS lo_key,
        |  max(o_orderkey) AS hi_key, count(*) AS n_rows
        |FROM (SELECT o_orderkey,
        |    CAST(ntile(8) OVER (ORDER BY o_orderkey) AS BIGINT) AS seg
        |  FROM orders) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_windowed_stats" ->
      s"""$C
         |SELECT date_trunc('hour', ts) AS window_start, op,
         |  count(*) AS n_ops,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // streaming execution, batch formula: the oracle IS the batch
    // windowed-stats query — stream-vs-batch equality is the check
    "cdc_stream_windowed" ->
      s"""$C
         |SELECT date_trunc('hour', ts) AS window_start, op,
         |  count(*) AS n_ops,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // streaming session_window vs the batch gaps-and-islands
    // formula: sessions merge up to and INCLUDING a gap of exactly
    // 30 min (session_window merges touching windows — pinned by
    // SessionWindowSpec), so the batch break rule is strictly-greater
    "events_stream_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t
        |  FROM events WHERE ts IS NOT NULL),
        |m AS (SELECT user_id, t, event_id,
        |    CASE WHEN lag(t) OVER w IS NULL
        |      OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |per AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(max(n) AS BIGINT) AS max_session_events
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_stream_quiet" ->
      """SELECT user_id, max(ts) AS last_seen_ts,
        |  count(*) AS n_events,
        |  max(ts) + INTERVAL 30 MINUTE AS quiet_since
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_value_percentiles" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM events)
        |SELECT event_type, CAST(max(cnt) AS BIGINT) AS n_events,
        |  max(CASE WHEN rn = (cnt * 25 + 99) // 100 THEN value END)
        |    AS p25_value,
        |  max(CASE WHEN rn = (cnt * 50 + 99) // 100 THEN value END)
        |    AS p50_value,
        |  max(CASE WHEN rn = (cnt * 75 + 99) // 100 THEN value END)
        |    AS p75_value,
        |  max(CASE WHEN rn = (cnt * 95 + 99) // 100 THEN value END)
        |    AS p95_value,
        |  max(value) AS max_value
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_dedup_consecutive" ->
      """WITH g AS (SELECT event_type, value,
        |    lag(event_type) OVER w AS prev_type,
        |    lag(value) OVER w AS prev_value
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN prev_type = event_type
        |    AND prev_value = value THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_consecutive_dups,
        |  CAST(sum(CASE WHEN prev_type = event_type
        |    AND prev_value = value THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dup_share
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_stream_attribution" ->
      s"""WITH p AS (SELECT user_id, event_id AS purchase_id,
         |    ts AS purchase_ts FROM events WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS touch_id, ts AS touch_ts,
         |    event_type AS touch_type FROM events
         |  WHERE event_type <> 'purchase'),
         |j AS (SELECT t.touch_type, p.purchase_id, t.touch_id
         |  FROM t JOIN p ON p.user_id = t.user_id
         |    AND t.touch_ts >= p.purchase_ts - INTERVAL 7 DAY
         |    AND t.touch_ts < p.purchase_ts)
         |SELECT touch_type, count(*) AS n_pairs,
         |  count(DISTINCT purchase_id) AS n_purchases,
         |  count(DISTINCT touch_id) AS n_touches
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_stream_attribution_outer" ->
      s"""WITH p AS (SELECT user_id, event_id AS purchase_id,
         |    ts AS purchase_ts FROM events
         |  WHERE event_type = 'purchase' AND ts IS NOT NULL),
         |t AS (SELECT user_id, event_id AS touch_id, ts AS touch_ts,
         |    event_type AS touch_type FROM events
         |  WHERE event_type <> 'purchase' AND ts IS NOT NULL),
         |j AS (SELECT t.touch_type, p.purchase_id, t.touch_id
         |  FROM p LEFT JOIN t ON t.user_id = p.user_id
         |    AND t.touch_ts >= p.purchase_ts - INTERVAL 7 DAY
         |    AND t.touch_ts < p.purchase_ts)
         |SELECT coalesce(touch_type, '(none)') AS touch_type,
         |  count(*) AS n_rows,
         |  count(DISTINCT purchase_id) AS n_purchases,
         |  count(DISTINCT touch_id) AS n_touches
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_conflict_resolution" ->
      s"""$C,
         |m AS (
         |  SELECT table_name, user_id, event_id, ts, value,
         |    'primary' AS src, 1 AS priority FROM c
         |  UNION ALL
         |  SELECT table_name, user_id, event_id,
         |    ts + INTERVAL 1 SECOND AS ts, value + 100 AS value,
         |    'replica' AS src, 2 AS priority FROM c
         |  WHERE user_id % 7 = 0),
         |k AS (SELECT *,
         |    max(CASE WHEN src = 'primary' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY table_name, user_id)
         |    + max(CASE WHEN src = 'replica' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY table_name, user_id) AS n_src,
         |    row_number() OVER (PARTITION BY table_name, user_id
         |      ORDER BY ts DESC, priority DESC, event_id DESC) AS rn
         |  FROM m)
         |SELECT table_name, count(*) AS n_keys,
         |  CAST(count(*) FILTER (WHERE n_src = 2) AS BIGINT) AS n_conflicted,
         |  CAST(count(*) FILTER (WHERE src = 'replica') AS BIGINT)
         |    AS n_replica_wins,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_winning_value
         |FROM k WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_shuffle" ->
      s"""WITH p AS (SELECT source, doc_id,
         |    CAST(row_number() OVER (ORDER BY
         |      ${Portable.duckHash("(source || '#' || CAST(doc_id AS VARCHAR))")},
         |      source, doc_id) AS BIGINT) AS pos
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  min(pos) AS first_pos, max(pos) AS last_pos,
         |  CAST(sum(pos) AS DOUBLE) / count(*) AS mean_pos
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_transactions" ->
      s"""$C
         |SELECT table_name, event_id,
         |  CAST(row_number() OVER (PARTITION BY table_name
         |    ORDER BY ts, event_id) AS BIGINT) AS commit_seq
         |FROM c ORDER BY table_name, commit_seq""".stripMargin,

    "cdc_envelope" ->
      s"""$C
         |SELECT 'data' AS record_type, op AS operation, table_name,
         |  count(*) AS n,
         |  CAST(sum(user_id) AS BIGINT) AS sum_user_id,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM c GROUP BY 1, 2, 3 ORDER BY 2, 3""".stripMargin,

    "sim_ann_recall" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |bd AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |bs AS (SELECT bd.probe_id, bd.neighbor_id,
         |    ${Vectors.duckCosine("bd.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM bd
         |  JOIN norms na ON na.vec_id = bd.probe_id
         |  JOIN norms nb ON nb.vec_id = bd.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |br AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM bs),
         |bfk AS (SELECT probe_id, neighbor_id FROM br WHERE rk <= ${Similarity.TopK}),
         |lc AS (SELECT DISTINCT pb.vec_id AS probe_id, b.vec_id AS neighbor_id
         |  FROM buckets pb JOIN buckets b
         |  ON b.band = pb.band AND b.bucket = pb.bucket AND b.vec_id <> pb.vec_id
         |  WHERE pb.vec_id < ${Similarity.NumProbes}),
         |ld AS (SELECT c.probe_id, c.neighbor_id, CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM lc c
         |  JOIN flat fa ON fa.vec_id = c.probe_id
         |  JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
         |  GROUP BY 1, 2),
         |ls AS (SELECT ld.probe_id, ld.neighbor_id,
         |    ${Vectors.duckCosine("ld.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM ld
         |  JOIN norms na ON na.vec_id = ld.probe_id
         |  JOIN norms nb ON nb.vec_id = ld.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |lr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM ls),
         |lshk AS (SELECT probe_id, neighbor_id FROM lr WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(l.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_at_k
         |FROM bfk b LEFT JOIN lshk l
         |  ON l.probe_id = b.probe_id AND l.neighbor_id = b.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // The real decoder's parse results are recomputable in SQL
    // because the synthesized media content is a pure function of
    // doc_id: dimensions from the per-kind formulas, payload_sum as
    // the sum of (doc_id*31+k) mod 256 over the content-byte count n
    // (pixels w·h·3, samples, or frames·w·h·3/2 — row padding and
    // container structure excluded, exactly what a correct parse
    // sums). The decoder itself never sees these formulas — it must
    // rediscover the values from the bytes.
    "multimodal_decode" ->
      s"""WITH d AS (SELECT doc_id,
         |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    CASE CAST(doc_id % 3 AS INT)
         |      WHEN 0 THEN 4 + doc_id % 13
         |      WHEN 1 THEN 8000 + (doc_id % 5) * 2000
         |      ELSE 4 + 2 * (doc_id % 6) END AS f0,
         |    CASE CAST(doc_id % 3 AS INT)
         |      WHEN 0 THEN 3 + doc_id % 7
         |      WHEN 1 THEN 8
         |      ELSE 2 + 2 * (doc_id % 4) END AS f1,
         |    CASE CAST(doc_id % 3 AS INT)
         |      WHEN 0 THEN 24
         |      WHEN 1 THEN 64 + doc_id % 101
         |      ELSE 1 + doc_id % 3 END AS f2,
         |    CASE CAST(doc_id % 3 AS INT)
         |      WHEN 0 THEN (4 + doc_id % 13) * (3 + doc_id % 7) * 3
         |      WHEN 1 THEN 64 + doc_id % 101
         |      ELSE (1 + doc_id % 3) *
         |        ((4 + 2 * (doc_id % 6)) * (2 + 2 * (doc_id % 4)) * 3 // 2)
         |      END AS n
         |  FROM documents)
         |SELECT doc_id, kind, CAST(f0 AS BIGINT) AS f0,
         |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
         |  CAST(list_sum(list_transform(range(0, n),
         |    k -> (doc_id * 31 + k) % 256)) AS BIGINT) AS payload_sum
         |FROM d ORDER BY doc_id""".stripMargin,

    // Frame-level twin of the decode oracle: every column is
    // recomputable because the synthesized containers put frame i's
    // content bytes at a formula-known offset (BMP pixel array at 54,
    // WAV data at 44, Y4M frame i after the ASCII header + i markers)
    // and the content bytes themselves are (doc_id*31+k) mod 256 with
    // k running continuously across frames. luma_sum covers the first
    // w·h bytes of a C420 frame (the Y plane); single-plane kinds
    // have no chroma, so their luma IS the frame sum.
    "multimodal_frames" ->
      s"""WITH d AS (SELECT doc_id,
         |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    CASE CAST(doc_id % 3 AS INT)
         |      WHEN 0 THEN (4 + doc_id % 13) * (3 + doc_id % 7) * 3
         |      WHEN 1 THEN 64 + doc_id % 101
         |      ELSE ((4 + 2 * (doc_id % 6)) * (2 + 2 * (doc_id % 4)) * 3) // 2
         |      END AS fb,
         |    CASE CAST(doc_id % 3 AS INT)
         |      WHEN 2 THEN (4 + 2 * (doc_id % 6)) * (2 + 2 * (doc_id % 4))
         |      END AS wh,
         |    CASE CAST(doc_id % 3 AS INT) WHEN 2 THEN 1 + doc_id % 3 ELSE 1
         |      END AS nf,
         |    CASE CAST(doc_id % 3 AS INT)
         |      WHEN 0 THEN 54
         |      WHEN 1 THEN 44
         |      ELSE length('YUV4MPEG2 W'
         |        || CAST(4 + 2 * (doc_id % 6) AS VARCHAR) || ' H'
         |        || CAST(2 + 2 * (doc_id % 4) AS VARCHAR)
         |        || ' F25:1 Ip A1:1 C420') + 1
         |      END AS base
         |  FROM documents),
         |f AS (SELECT doc_id, kind, fb, wh, nf, base,
         |    unnest(range(nf)) AS fi
         |  FROM d)
         |SELECT doc_id, kind, CAST(fi AS BIGINT) AS frame_idx,
         |  CAST(CASE WHEN kind = 'video' THEN base + (fi + 1) * 6 + fi * fb
         |    ELSE base END AS BIGINT) AS frame_off,
         |  CAST(fb AS BIGINT) AS frame_bytes,
         |  CAST(list_sum(list_transform(range(fi * fb, (fi + 1) * fb),
         |    k -> (doc_id * 31 + k) % 256)) AS BIGINT) AS frame_sum,
         |  CAST(list_sum(list_transform(range(fi * fb, fi * fb + COALESCE(wh, fb)),
         |    k -> (doc_id * 31 + k) % 256)) AS BIGINT) AS luma_sum
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "corpus_sample" ->
      s"""SELECT source, count(*) AS n_sampled,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM documents
         |WHERE ${Portable.duckHash("(source || '#' || CAST(doc_id AS VARCHAR))")} % 1000
         |  < (CASE source WHEN 'src1' THEN 500 WHEN 'src2' THEN 0 ELSE 100 END)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_weighted_sample" -> {
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH s AS (SELECT doc_id, source,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |  CAST(list_sum(list_transform($toksT, x -> length(x))) AS BIGINT) AS sum_len
         |FROM documents),
         |q AS (SELECT doc_id, source,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         |    CAST(0.4 AS DOUBLE) * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |    + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |    + CAST(0.3 AS DOUBLE) * least((CAST(sum_len AS DOUBLE) / $nTok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |    END AS quality_score
         |FROM s),
         |w AS (SELECT source,
         |  CAST(round(quality_score * 1000) AS BIGINT) AS permille,
         |  ${Portable.duckHash("(source || '#' || CAST(doc_id AS VARCHAR))")} % 1000 AS hh
         |FROM q)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN hh < permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(permille) AS BIGINT) AS permille_mass,
         |  CAST(sum(CASE WHEN hh < permille THEN 1 ELSE 0 END) AS DOUBLE) /
         |    CAST(count(*) AS DOUBLE) AS kept_rate
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "corpus_decontaminate" ->
      s"""WITH shf AS (${Dedup.duckShingles}),
         |ev AS (SELECT DISTINCT s.shingle
         |  FROM shf s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source = 'src0'),
         |cs AS (SELECT DISTINCT s.doc_id, s.shingle
         |  FROM shf s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source <> 'src0'),
         |sc AS (SELECT c.doc_id, count(*) AS n_shingles,
         |    count(e.shingle) AS n_overlap
         |  FROM cs c LEFT JOIN ev e ON e.shingle = c.shingle
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(sc.n_shingles, 0) AS n_shingles,
         |  COALESCE(sc.n_overlap, 0) AS n_overlap,
         |  COALESCE(CAST(sc.n_overlap AS DOUBLE)
         |    / CAST(sc.n_shingles AS DOUBLE), 0.0) AS contamination
         |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         |WHERE d.source <> 'src0' ORDER BY 1""".stripMargin,

    // Fuzzy-decontamination oracle: distinct-shingle signatures with
    // set sizes, banding, train-bucket x eval-bucket candidates,
    // exact-Jaccard verify (3*inter >= sa+sb), explicit zeros.
    "corpus_fuzzy_decontaminate" -> {
      val (h1, h2) = Portable.duckHashPair("shingle")
      val mins = (0 until Dedup.NumHashes)
        .map(i => s"min(h1 + $i*h2) AS mh$i").mkString(", ")
      val bandRows = (0 until Dedup.Bands).map { b =>
        val cat = (0 until Dedup.RowsPerBand)
          .map(j => s"CAST(mh${b * Dedup.RowsPerBand + j} AS VARCHAR)")
          .mkString(" || ',' || ")
        s"SELECT doc_id, $b AS band, ${Portable.duckHash(s"($cat)")} AS bh FROM sigs"
      }.mkString(" UNION ALL ")
      s"""WITH shf AS (${Dedup.duckShingles}),
         |ds AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |hs AS (SELECT doc_id, $h1 AS h1, $h2 AS h2 FROM ds),
         |sigs AS (SELECT doc_id, $mins, count(*) AS set_size
         |  FROM hs GROUP BY 1),
         |bands AS ($bandRows),
         |fl AS (SELECT doc_id, (source = 'src0') AS is_eval FROM documents),
         |bt AS (SELECT b.doc_id AS tid, band, bh FROM bands b
         |  JOIN fl ON fl.doc_id = b.doc_id WHERE NOT fl.is_eval),
         |be AS (SELECT b.doc_id AS eid, band, bh FROM bands b
         |  JOIN fl ON fl.doc_id = b.doc_id WHERE fl.is_eval),
         |cand AS (SELECT DISTINCT bt.tid, be.eid FROM bt
         |  JOIN be ON bt.band = be.band AND bt.bh = be.bh),
         |iv AS (SELECT c.tid, c.eid, count(*) AS n_inter
         |  FROM cand c
         |  JOIN ds a ON a.doc_id = c.tid
         |  JOIN ds b ON b.doc_id = c.eid AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |cj AS (SELECT c.tid, c.eid,
         |    COALESCE(iv.n_inter, 0) AS n_inter,
         |    sa.set_size AS sz_a, sb.set_size AS sz_b
         |  FROM cand c
         |  LEFT JOIN iv ON iv.tid = c.tid AND iv.eid = c.eid
         |  JOIN sigs sa ON sa.doc_id = c.tid
         |  JOIN sigs sb ON sb.doc_id = c.eid),
         |pt AS (SELECT tid, count(*) AS n_candidates,
         |    CAST(sum(CASE WHEN 3*n_inter >= sz_a + sz_b
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
         |    max(CAST(n_inter AS DOUBLE)
         |      / CAST(sz_a + sz_b - n_inter AS DOUBLE)) AS max_jaccard
         |  FROM cj GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(pt.n_candidates, 0) AS n_candidates,
         |  COALESCE(pt.n_matches, 0) AS n_matches,
         |  COALESCE(pt.max_jaccard, 0.0) AS max_jaccard
         |FROM documents d LEFT JOIN pt ON pt.tid = d.doc_id
         |WHERE d.source <> 'src0' ORDER BY 1""".stripMargin
    },

    // Repetition signals recomputed relationally: per-token term
    // frequencies for top_freq, a lead() window for bigrams — same
    // exact integers, same single double division.
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, ${TextAnalysis.duckTokens("text")} AS toks
         |  FROM documents),
         |u AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS tok
         |  FROM t),
         |wc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct FROM t),
         |top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_freq FROM (
         |    SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2)
         |  GROUP BY 1),
         |bg AS (SELECT doc_id, tok || ' ' || lead(tok) OVER w AS bigram
         |  FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         |bgn AS (SELECT doc_id, CAST(count(bigram) AS BIGINT) AS n_bigrams,
         |    CAST(count(DISTINCT bigram) AS BIGINT) AS n_distinct_bigrams
         |  FROM bg GROUP BY 1)
         |SELECT w.doc_id, w.n_words, w.n_distinct,
         |  COALESCE(top.top_freq, 0) AS top_freq,
         |  COALESCE(b.n_bigrams, 0) AS n_bigrams,
         |  COALESCE(b.n_distinct_bigrams, 0) AS n_distinct_bigrams,
         |  CASE WHEN w.n_words = 0 THEN 0.0
         |    ELSE CAST(w.n_words - w.n_distinct AS DOUBLE)
         |      / CAST(w.n_words AS DOUBLE) END AS dup_word_ratio,
         |  CASE WHEN w.n_words = 0 THEN 0.0
         |    ELSE CAST(COALESCE(top.top_freq, 0) AS DOUBLE)
         |      / CAST(w.n_words AS DOUBLE) END AS top_word_ratio,
         |  CASE WHEN COALESCE(b.n_bigrams, 0) = 0 THEN 0.0
         |    ELSE CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE)
         |      / CAST(b.n_bigrams AS DOUBLE) END AS dup_bigram_ratio
         |FROM wc w LEFT JOIN top USING (doc_id) LEFT JOIN bgn b USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Duplicated-3-gram census: distinct (doc, shingle) instances,
    // document frequency via a window over the shingle key, per-source
    // rollup — the same three-stage shape as the Spark plan.
    "corpus_dup_ngrams" ->
      s"""WITH shf AS (${Dedup.duckShingles}),
         |ds AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |w AS (SELECT doc_id, shingle,
         |    count(*) OVER (PARTITION BY shingle) AS df FROM ds)
         |SELECT d.source, count(*) AS n_shingles,
         |  count(*) FILTER (WHERE w.df > 1) AS n_shared,
         |  CAST(count(*) FILTER (WHERE w.df > 1) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS shared_ratio
         |FROM w JOIN documents d ON d.doc_id = w.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Epoch-plan oracle: same integer allocation arithmetic (div,
    // least, exact sums), one double redistribution per row.
    "corpus_epoch_plan" ->
      s"""WITH p AS (SELECT source,
         |    CAST(sum(len($toksT)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens,
         |    count(*) AS n_sources FROM p),
         |b AS (SELECT p.source, p.n_tokens,
         |    ${Corpus.EpochBudgetX} * t.corpus_tokens AS budget,
         |    (${Corpus.EpochBudgetX} * t.corpus_tokens) // t.n_sources
         |      AS target_tokens,
         |    ${Corpus.EpochCap} * p.n_tokens AS capacity
         |  FROM p, t),
         |c AS (SELECT *, least(target_tokens, capacity) AS alloc_capped
         |  FROM b),
         |a AS (SELECT CAST(sum(alloc_capped) AS BIGINT) AS allocated,
         |    CAST(sum(capacity - alloc_capped) AS BIGINT) AS spare FROM c)
         |SELECT c.source, c.n_tokens, c.target_tokens, c.alloc_capped,
         |  CASE WHEN a.spare > 0
         |    THEN CAST(c.alloc_capped AS DOUBLE)
         |      + CAST(c.budget - a.allocated AS DOUBLE)
         |        * (CAST(c.capacity - c.alloc_capped AS DOUBLE)
         |          / CAST(a.spare AS DOUBLE))
         |    ELSE CAST(c.alloc_capped AS DOUBLE) END AS alloc_final,
         |  CASE WHEN c.n_tokens > 0 THEN
         |    (CASE WHEN a.spare > 0
         |      THEN CAST(c.alloc_capped AS DOUBLE)
         |        + CAST(c.budget - a.allocated AS DOUBLE)
         |          * (CAST(c.capacity - c.alloc_capped AS DOUBLE)
         |            / CAST(a.spare AS DOUBLE))
         |      ELSE CAST(c.alloc_capped AS DOUBLE) END)
         |      / CAST(c.n_tokens AS DOUBLE)
         |    ELSE 0.0 END AS epochs,
         |  c.alloc_capped = c.capacity AS capped
         |FROM c, a ORDER BY c.source""".stripMargin,

    // Duplicate-span oracle: positioned k-gram anchors via lead()
    // windows, cross-doc df on the anchor hash, gaps-and-islands
    // span merge (gap <= k), exact union coverage per doc.
    "corpus_dup_spans" -> {
      val k = Corpus.DupSpanK
      val gram = (0 until k)
        .map(j => if (j == 0) "tok" else s"lead(tok, $j) OVER w")
        .mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, source,
         |    ${TextAnalysis.duckTokens("text")} AS toks FROM documents),
         |b AS (SELECT doc_id, source,
         |    CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
         |u AS (SELECT doc_id, generate_subscripts(toks, 1) AS i,
         |    unnest(toks) AS tok FROM t),
         |g AS (SELECT doc_id, i, $gram AS gram
         |  FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         |a AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
         |    ${Portable.duckHash("gram")} AS fp
         |  FROM g WHERE gram IS NOT NULL),
         |d AS (SELECT fp, doc_id FROM a GROUP BY 1, 2),
         |dd AS (SELECT fp, doc_id,
         |    count(*) OVER (PARTITION BY fp) AS df FROM d),
         |dup AS (SELECT a.doc_id, a.i FROM a
         |  JOIN dd ON dd.fp = a.fp AND dd.doc_id = a.doc_id
         |  WHERE dd.df > 1),
         |sp AS (SELECT doc_id, i,
         |    CASE WHEN lag(i) OVER wd IS NULL
         |      OR i - lag(i) OVER wd > $k THEN 1 ELSE 0 END AS ns
         |  FROM dup WINDOW wd AS (PARTITION BY doc_id ORDER BY i)),
         |si AS (SELECT doc_id, i, sum(ns) OVER (PARTITION BY doc_id
         |    ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS span_id
         |  FROM sp),
         |spn AS (SELECT doc_id, span_id, count(*) AS span_anchors,
         |    max(i) - min(i) + $k AS span_tokens
         |  FROM si GROUP BY 1, 2),
         |pd AS (SELECT doc_id, count(*) AS n_spans,
         |    CAST(sum(span_anchors) AS BIGINT) AS n_dup_anchors,
         |    CAST(max(span_tokens) AS BIGINT) AS max_span_tokens,
         |    CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
         |  FROM spn GROUP BY 1)
         |SELECT b.doc_id, b.source, b.n_tokens,
         |  greatest(b.n_tokens - ${k - 1}, 0) AS n_anchors,
         |  COALESCE(pd.n_dup_anchors, 0) AS n_dup_anchors,
         |  COALESCE(pd.n_spans, 0) AS n_spans,
         |  COALESCE(pd.max_span_tokens, 0) AS max_span_tokens,
         |  COALESCE(pd.dup_tokens, 0) AS dup_tokens,
         |  CASE WHEN b.n_tokens > 0
         |    THEN CAST(COALESCE(pd.dup_tokens, 0) AS DOUBLE)
         |      / CAST(b.n_tokens AS DOUBLE)
         |    ELSE 0.0 END AS dup_ratio
         |FROM b LEFT JOIN pd ON pd.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin
    },

    // TV-divergence oracle: the same exact-integer cross-product
    // numerator, absent-token mass in closed form, smallest-token
    // tie-break for the top contributor.
    "corpus_source_divergence" ->
      s"""WITH tc AS (SELECT source, unnest($toksT) AS tok FROM documents),
         |cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM tc GROUP BY 1, 2),
         |corpus AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct
         |  FROM cnt GROUP BY 1),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
         |  FROM cnt GROUP BY 1),
         |nt AS (SELECT CAST(sum(ct) AS BIGINT) AS n_total FROM corpus),
         |contrib AS (SELECT cnt.source, cnt.tok,
         |    abs(cnt.c * nt.n_total - corpus.ct * ns.n_s) AS gap,
         |    corpus.ct
         |  FROM cnt JOIN corpus USING (tok) JOIN ns USING (source), nt),
         |agg AS (SELECT c.source, max(ns.n_s) AS n_s,
         |    max(nt.n_total) AS n_total,
         |    CAST(sum(c.gap) AS BIGINT) AS present_gap,
         |    CAST(sum(c.ct) AS BIGINT) AS covered_ct,
         |    CAST(max(c.gap) AS BIGINT) AS max_gap
         |  FROM contrib c JOIN ns USING (source), nt GROUP BY 1),
         |top AS (SELECT c.source, min(c.tok) AS top_token
         |  FROM contrib c JOIN agg a
         |    ON a.source = c.source AND c.gap = a.max_gap
         |  GROUP BY 1)
         |SELECT a.source, a.n_s AS n_tokens,
         |  CAST(a.present_gap + a.n_s * (a.n_total - a.covered_ct) AS DOUBLE)
         |    / (CAST(2 AS DOUBLE) * CAST(a.n_s AS DOUBLE)
         |      * CAST(a.n_total AS DOUBLE)) AS tv_distance,
         |  t.top_token,
         |  CAST(a.max_gap AS DOUBLE) / (CAST(a.n_s AS DOUBLE)
         |    * CAST(a.n_total AS DOUBLE)) AS top_share_gap
         |FROM agg a JOIN top t ON t.source = a.source
         |ORDER BY a.source""".stripMargin,

    // Cross-source overlap: distinct (source, shingle) sets pair-
    // joined in SQL (the oracle may self-join; the Spark plan
    // collects per-shingle source sets instead — values must agree).
    "corpus_source_overlap" ->
      s"""WITH shs AS (SELECT DISTINCT source, shingle FROM (
         |    SELECT source,
         |      tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
         |    FROM (
         |      SELECT doc_id, source, generate_subscripts(l, 1) AS i, unnest(l) AS tok
         |      FROM (SELECT doc_id, source, ${TextAnalysis.duckTokens("text")} AS l
         |            FROM documents))
         |    WINDOW w AS (PARTITION BY doc_id ORDER BY i))
         |  WHERE shingle IS NOT NULL),
         |tot AS (SELECT source, count(*) AS n FROM shs GROUP BY 1),
         |p AS (SELECT a.source AS source_a, b.source AS source_b,
         |    count(*) AS n_shared
         |  FROM shs a JOIN shs b ON a.shingle = b.shingle
         |    AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT p.source_a, p.source_b, p.n_shared,
         |  ta.n AS n_a, tb.n AS n_b,
         |  CAST(p.n_shared AS DOUBLE) /
         |    CAST(ta.n + tb.n - p.n_shared AS DOUBLE) AS jaccard
         |FROM p
         |JOIN tot ta ON ta.source = p.source_a
         |JOIN tot tb ON tb.source = p.source_b
         |ORDER BY 1, 2""".stripMargin,

    // TF-IDF argmax with the same integer idf (bin-length log2 of the
    // floor quotient) and the same three-way tie-break.
    "text_keywords" ->
      s"""WITH toks AS (SELECT doc_id,
         |    unnest(${TextAnalysis.duckTokens("text")}) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |    tf.tf * (length(bin(n_docs // df.df)) - 1) AS score
         |  FROM tf JOIN df USING (tok), n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, tf DESC, tok) AS rn FROM sc)
         |SELECT d.doc_id, r.tok AS keyword, CAST(r.tf AS BIGINT) AS tf,
         |  CAST(r.df AS BIGINT) AS df, CAST(r.score AS BIGINT) AS score
         |FROM documents d LEFT JOIN r ON r.doc_id = d.doc_id AND r.rn = 1
         |ORDER BY d.doc_id""".stripMargin,

    "corpus_histogram" ->
      s"""WITH t AS (SELECT source,
         |    CAST(len(${TextAnalysis.duckTokens("text")}) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT source, CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
         |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "corpus_pack" ->
      s"""WITH t AS (SELECT source, doc_id,
         |    CAST(len(${TextAnalysis.duckTokens("text")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
         |  FROM t)
         |SELECT source, CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS bin,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "corpus_split_leakage" ->
      s"""WITH h AS (SELECT doc_id, md5($normT) AS fp,
         |    ${Portable.duckHash(
                "(source || '#' || CAST(doc_id AS VARCHAR) || '#split')")} % 1000
         |      AS hb
         |  FROM documents),
         |d AS (SELECT doc_id, fp,
         |    CASE WHEN hb < 800 THEN 'train' WHEN hb < 900 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM h WHERE hb IS NOT NULL),
         |fs AS (SELECT DISTINCT fp, split FROM d),
         |p AS (SELECT a.fp, a.split AS split_a, b.split AS split_b
         |  FROM fs a JOIN fs b ON b.fp = a.fp AND a.split < b.split),
         |c AS (SELECT fp, split, count(*) AS n_docs FROM d GROUP BY 1, 2)
         |SELECT p.split_a, p.split_b, count(*) AS n_shared_fps,
         |  CAST(sum(ca.n_docs + cb.n_docs) AS BIGINT) AS n_docs_affected
         |FROM p
         |JOIN c ca ON ca.fp = p.fp AND ca.split = p.split_a
         |JOIN c cb ON cb.fp = p.fp AND cb.split = p.split_b
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "corpus_pack_efficiency" ->
      s"""WITH t AS (SELECT source, doc_id,
         |    CAST(len(${TextAnalysis.duckTokens("text")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
         |  FROM t),
         |b AS (SELECT source, CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS bin,
         |    CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |  FROM c GROUP BY 1, 2),
         |p AS (SELECT source, count(*) AS bins_used,
         |    CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
         |    CAST(sum(CASE WHEN bin_tokens > 2048 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_overflow_bins
         |  FROM b GROUP BY 1)
         |SELECT source, bins_used, total_tokens, n_overflow_bins,
         |  CAST((total_tokens + 2047) // 2048 AS BIGINT) AS lower_bound,
         |  CAST((total_tokens + 2047) // 2048 AS DOUBLE) /
         |    CAST(bins_used AS DOUBLE) AS efficiency,
         |  CAST(total_tokens AS DOUBLE) /
         |    CAST(bins_used * 2048 AS DOUBLE) AS utilization
         |FROM p ORDER BY 1""".stripMargin,

    "corpus_chunks" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    ${TextAnalysis.duckTokens("text")} AS toks FROM documents),
         |n AS (SELECT doc_id, source, toks, len(toks) AS n_tokens FROM t
         |  WHERE len(toks) > 0),
         |c AS (SELECT doc_id, source, toks, n_tokens,
         |    unnest(range(0, CAST(n_tokens AS BIGINT),
         |      ${Corpus.ChunkStride})) AS start
         |  FROM n),
         |k AS (SELECT doc_id, source,
         |    CAST(start // ${Corpus.ChunkStride} AS BIGINT) AS chunk_id,
         |    list_slice(toks, start + 1, start + ${Corpus.ChunkSize}) AS chunk
         |  FROM c
         |  WHERE start = 0
         |    OR start + ${Corpus.ChunkSize - Corpus.ChunkStride} < n_tokens)
         |SELECT doc_id, source, chunk_id,
         |  CAST(len(chunk) AS BIGINT) AS chunk_tokens,
         |  ${Portable.duckHash("array_to_string(chunk, ' ')")} AS chunk_fp
         |FROM k ORDER BY doc_id, chunk_id""".stripMargin,

    "corpus_content_chunks" ->
      s"""${duckContentChunks("text")}
         |ORDER BY doc_id, chunk_id""".stripMargin,

    "corpus_chunk_robustness" -> {
      def leg(method: String, content: Boolean): String = {
        val o = duckChunkFps("text", content)
        val s = duckChunkFps("('zzz ' || text)", content)
        s"""SELECT '$method' AS method,
           |  count(DISTINCT o.doc_id) AS n_docs,
           |  count(*) AS n_fps,
           |  count(s.doc_id) AS n_preserved,
           |  CASE WHEN count(*) > 0
           |    THEN CAST(count(s.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |    ELSE 0.0 END AS preserved_ratio
           |FROM ($o) o LEFT JOIN ($s) s
           |ON o.doc_id = s.doc_id AND o.chunk_fp = s.chunk_fp""".stripMargin
      }
      s"""SELECT * FROM (
         |${leg("content", content = true)}
         |UNION ALL
         |${leg("fixed", content = false)})
         |ORDER BY method""".stripMargin
    },

    // Cohesion oracle: the same sums identities (‖S‖²−Σ‖q‖², and
    // S·(S_tot−S) as S·S_tot − ‖S‖²) over exploded per-dim sums.
    "embed_label_cohesion" ->
      s"""WITH q AS (SELECT label,
         |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
         |f AS (SELECT label, generate_subscripts(q, 1) AS dim,
         |    unnest(q) AS v FROM q),
         |per AS (SELECT label, dim, CAST(sum(v) AS BIGINT) AS s
         |  FROM f GROUP BY 1, 2),
         |n AS (SELECT label, count(*) AS n_vecs,
         |    CAST(sum(list_aggregate(list_transform(q, x -> x*x), 'sum'))
         |      AS BIGINT) AS sum_norm2
         |  FROM q GROUP BY 1),
         |tot AS (SELECT dim, CAST(sum(s) AS BIGINT) AS st
         |  FROM per GROUP BY 1),
         |ag AS (SELECT p.label,
         |    CAST(sum(p.s * p.s) AS BIGINT) AS norm_s2,
         |    CAST(sum(p.s * t.st) AS BIGINT) AS dot_tot
         |  FROM per p JOIN tot t ON t.dim = p.dim GROUP BY 1),
         |nt AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total FROM n),
         |m AS (SELECT n.label, n.n_vecs,
         |    ag.norm_s2 - n.sum_norm2 AS intra_num,
         |    n.n_vecs * (n.n_vecs - 1) AS intra_pairs,
         |    ag.dot_tot - ag.norm_s2 AS inter_num,
         |    n.n_vecs * (nt.n_total - n.n_vecs) AS inter_pairs
         |  FROM n JOIN ag ON ag.label = n.label CROSS JOIN nt),
         |d AS (SELECT *,
         |    CASE WHEN intra_pairs > 0
         |      THEN CAST(intra_num AS DOUBLE) / CAST(intra_pairs AS DOUBLE)
         |      ELSE 0.0 END AS mean_intra,
         |    CASE WHEN inter_pairs > 0
         |      THEN CAST(inter_num AS DOUBLE) / CAST(inter_pairs AS DOUBLE)
         |      ELSE 0.0 END AS mean_inter
         |  FROM m)
         |SELECT label, n_vecs, intra_num, intra_pairs, inter_num,
         |  inter_pairs, mean_intra, mean_inter,
         |  mean_intra - mean_inter AS margin
         |FROM d ORDER BY label""".stripMargin,

    "embed_centroids" ->
      s"""WITH q AS (SELECT label,
         |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
         |f AS (SELECT label, generate_subscripts(q, 1) - 1 AS dim,
         |    unnest(q) AS v FROM q)
         |SELECT label, CAST(dim AS BIGINT) AS dim,
         |  CAST(sum(v) AS BIGINT) AS sum_q, count(*) AS n_vecs,
         |  CAST(sum(v) AS DOUBLE)
         |    / CAST(count(*) * ${Vectors.Scale} AS DOUBLE) AS centroid
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "sim_knn_classify" ->
      s"""WITH $embCtes,
         |d AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |scored AS (SELECT d.probe_id, d.neighbor_id, $cosSql AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.vec_id = d.probe_id
         |  JOIN norms nb ON nb.vec_id = d.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk FROM scored),
         |v AS (SELECT r.probe_id, e.label, count(*) AS votes,
         |    min(r.rk) AS best_rk
         |  FROM r JOIN embeddings e ON e.vec_id = r.neighbor_id
         |  WHERE r.rk <= ${Similarity.TopK}
         |  GROUP BY 1, 2),
         |p AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY votes DESC, best_rk, label) AS pick FROM v)
         |SELECT probe_id, label AS predicted_label,
         |  CAST(votes AS BIGINT) AS votes
         |FROM p WHERE pick = 1 ORDER BY probe_id""".stripMargin,

    "corpus_quality_filter" -> {
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH s AS (SELECT doc_id, source,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |  CAST(list_sum(list_transform($toksT, x -> length(x))) AS BIGINT) AS sum_len
         |FROM documents),
         |q AS (SELECT doc_id, source,
         |  CAST(0.4 AS DOUBLE) * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |    + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |    + CAST(0.3 AS DOUBLE) * least((CAST(sum_len AS DOUBLE) / $nTok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |    AS quality_score
         |FROM s),
         |r AS (SELECT *,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rk,
         |    count(*) OVER (PARTITION BY source) AS n_docs
         |  FROM q)
         |SELECT source, doc_id, quality_score, rk
         |FROM r WHERE rk * 2 <= n_docs + 1 ORDER BY source, rk""".stripMargin
    },

    "corpus_token_budget" -> {
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH s AS (SELECT doc_id, source,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |  CAST(list_sum(list_transform($toksT, x -> length(x))) AS BIGINT) AS sum_len
         |FROM documents),
         |q AS (SELECT doc_id, source, n_tokens,
         |  CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE) ELSE
         |    CAST(0.4 AS DOUBLE) * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |      + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |      + CAST(0.3 AS DOUBLE) * least((CAST(sum_len AS DOUBLE) / $nTok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |    END AS quality_score
         |FROM s),
         |c AS (SELECT *, coalesce(sum(n_tokens) OVER (
         |    ORDER BY quality_score DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ps
         |  FROM q),
         |a AS (SELECT *, ps + n_tokens <= ${Corpus.TokenBudget} AS admitted
         |  FROM c)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_admitted,
         |  CAST(sum(CASE WHEN admitted THEN n_tokens ELSE 0 END) AS BIGINT)
         |    AS tokens_admitted,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
         |  min(CASE WHEN admitted THEN quality_score END) AS cut_quality
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "embed_prefix_recall" ->
      s"""WITH $embCtes,
         |pf AS (SELECT vec_id, i, v FROM flat WHERE i < ${Similarity.PrefixDim}),
         |pn AS (SELECT vec_id, CAST(sum(v*v) AS BIGINT) AS n2
         |  FROM pf GROUP BY 1),
         |bd AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |bs AS (SELECT bd.probe_id, bd.neighbor_id,
         |    ${Vectors.duckCosine("bd.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM bd
         |  JOIN norms na ON na.vec_id = bd.probe_id
         |  JOIN norms nb ON nb.vec_id = bd.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |br AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM bs),
         |bfk AS (SELECT probe_id, neighbor_id FROM br WHERE rk <= ${Similarity.TopK}),
         |pd AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM pf fp
         |  JOIN pf f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |ps AS (SELECT pd.probe_id, pd.neighbor_id,
         |    ${Vectors.duckCosine("pd.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM pd
         |  JOIN pn na ON na.vec_id = pd.probe_id
         |  JOIN pn nb ON nb.vec_id = pd.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |pr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM ps),
         |pk AS (SELECT probe_id, neighbor_id FROM pr WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(p.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS recall_at_k
         |FROM bfk b LEFT JOIN pk p
         |  ON p.probe_id = b.probe_id AND p.neighbor_id = b.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "embed_prefix_curve" -> {
      // one truncated re-rank block per prefix width, unioned; the
      // exact ranking (bd/bs/br/bfk) is shared by every width
      def dimBlock(d: Int): String =
        s"""pf$d AS (SELECT vec_id, i, v FROM flat WHERE i < $d),
           |pn$d AS (SELECT vec_id, CAST(sum(v*v) AS BIGINT) AS n2
           |  FROM pf$d GROUP BY 1),
           |pd$d AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
           |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
           |  FROM pf$d fp
           |  JOIN pf$d f ON f.i = fp.i AND f.vec_id <> fp.vec_id
           |  WHERE fp.vec_id < ${Similarity.NumProbes}
           |  GROUP BY 1, 2),
           |ps$d AS (SELECT pd$d.probe_id, pd$d.neighbor_id,
           |    ${Vectors.duckCosine(s"pd$d.dot", "na.n2", "nb.n2")} AS cos_sim
           |  FROM pd$d
           |  JOIN pn$d na ON na.vec_id = pd$d.probe_id
           |  JOIN pn$d nb ON nb.vec_id = pd$d.neighbor_id
           |  WHERE na.n2 > 0 AND nb.n2 > 0),
           |pr$d AS (SELECT *, row_number() OVER (PARTITION BY probe_id
           |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM ps$d),
           |pk$d AS (SELECT probe_id, neighbor_id FROM pr$d
           |  WHERE rk <= ${Similarity.TopK})""".stripMargin
      def dimSelect(d: Int): String =
        s"""SELECT CAST($d AS BIGINT) AS prefix_dim, b.probe_id,
           |  CAST(count(p.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |    AS recall_at_k
           |FROM bfk b LEFT JOIN pk$d p
           |  ON p.probe_id = b.probe_id AND p.neighbor_id = b.neighbor_id
           |GROUP BY 1, 2""".stripMargin
      val dims = Similarity.PrefixCurveDims
      s"""WITH $embCtes,
         |bd AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |bs AS (SELECT bd.probe_id, bd.neighbor_id,
         |    ${Vectors.duckCosine("bd.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM bd
         |  JOIN norms na ON na.vec_id = bd.probe_id
         |  JOIN norms nb ON nb.vec_id = bd.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |br AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM bs),
         |bfk AS (SELECT probe_id, neighbor_id FROM br
         |  WHERE rk <= ${Similarity.TopK}),
         |${dims.map(dimBlock).mkString(",\n")}
         |${dims.map(dimSelect).mkString("\nUNION ALL\n")}
         |ORDER BY prefix_dim, probe_id""".stripMargin
    },

    "embed_quantize_recall" -> {
      // per-bit requantized flat + rank block; the exact ranking
      // (bd/bs/br/bfk) is shared by every bit width
      def bitBlock(b: Int): String = {
        val l = (1L << (b - 1)) - 1
        s"""qf$b AS (SELECT f.vec_id, f.i,
           |    CAST(round(CAST(f.v * $l AS DOUBLE) / m.m) AS BIGINT) AS v
           |  FROM flat f JOIN mm m ON m.vec_id = f.vec_id),
           |qn$b AS (SELECT vec_id, CAST(sum(v*v) AS BIGINT) AS n2
           |  FROM qf$b GROUP BY 1),
           |qd$b AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
           |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
           |  FROM qf$b fp
           |  JOIN qf$b f ON f.i = fp.i AND f.vec_id <> fp.vec_id
           |  WHERE fp.vec_id < ${Similarity.NumProbes}
           |  GROUP BY 1, 2),
           |qs$b AS (SELECT qd$b.probe_id, qd$b.neighbor_id,
           |    ${Vectors.duckCosine(s"qd$b.dot", "na.n2", "nb.n2")} AS cos_sim
           |  FROM qd$b
           |  JOIN qn$b na ON na.vec_id = qd$b.probe_id
           |  JOIN qn$b nb ON nb.vec_id = qd$b.neighbor_id
           |  WHERE na.n2 > 0 AND nb.n2 > 0),
           |qr$b AS (SELECT *, row_number() OVER (PARTITION BY probe_id
           |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM qs$b),
           |qk$b AS (SELECT probe_id, neighbor_id FROM qr$b
           |  WHERE rk <= ${Similarity.TopK})""".stripMargin
      }
      def bitSelect(b: Int): String =
        s"""SELECT CAST($b AS BIGINT) AS n_bits, b.probe_id,
           |  CAST(count(p.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |    AS recall_at_k
           |FROM bfk b LEFT JOIN qk$b p
           |  ON p.probe_id = b.probe_id AND p.neighbor_id = b.neighbor_id
           |GROUP BY 1, 2""".stripMargin
      val bits = Similarity.QuantCurveBits
      s"""WITH $embCtes,
         |mm AS (SELECT vec_id, greatest(max(abs(v)), 1) AS m
         |  FROM flat GROUP BY 1),
         |bd AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |bs AS (SELECT bd.probe_id, bd.neighbor_id,
         |    ${Vectors.duckCosine("bd.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM bd
         |  JOIN norms na ON na.vec_id = bd.probe_id
         |  JOIN norms nb ON nb.vec_id = bd.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |br AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM bs),
         |bfk AS (SELECT probe_id, neighbor_id FROM br
         |  WHERE rk <= ${Similarity.TopK}),
         |${bits.map(bitBlock).mkString(",\n")}
         |${bits.map(bitSelect).mkString("\nUNION ALL\n")}
         |ORDER BY n_bits, probe_id""".stripMargin
    },

    "embed_mmr_diversify" -> {
      // unrolled greedy: sel0 empty; step t picks argmax of
      // 0.5·rel − 0.5·max-sim-to-sel(t−1) among unselected candidates
      def step(t: Int): String = {
        val prev = s"sel${t - 1}"
        s"""pen$t AS (SELECT c.probe_id, c.vec_id, c.rel,
           |    0.5 * c.rel - 0.5 * coalesce(mx.p, 0) AS mmr
           |  FROM cand c
           |  LEFT JOIN (SELECT s.probe_id, s.a, max(s.sim) AS p FROM csim s
           |      JOIN $prev sp ON sp.probe_id = s.probe_id
           |        AND sp.vec_id = s.b
           |      GROUP BY 1, 2) mx
           |    ON mx.probe_id = c.probe_id AND mx.a = c.vec_id
           |  WHERE NOT EXISTS (SELECT 1 FROM $prev sp
           |    WHERE sp.probe_id = c.probe_id AND sp.vec_id = c.vec_id)),
           |rk$t AS (SELECT *, row_number() OVER (PARTITION BY probe_id
           |    ORDER BY mmr DESC, vec_id) AS prk FROM pen$t),
           |pick$t AS (SELECT probe_id, vec_id, rel, mmr,
           |    CAST($t AS BIGINT) AS rk FROM rk$t WHERE prk = 1),
           |sel$t AS (SELECT * FROM $prev UNION ALL SELECT * FROM pick$t)"""
          .stripMargin
      }
      s"""WITH $embCtes,
         |bd AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |bs AS (SELECT bd.probe_id, bd.neighbor_id,
         |    ${Vectors.duckCosine("bd.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM bd
         |  JOIN norms na ON na.vec_id = bd.probe_id
         |  JOIN norms nb ON nb.vec_id = bd.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |br AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rk FROM bs),
         |cand AS (SELECT probe_id, neighbor_id AS vec_id, cos_sim AS rel
         |  FROM br WHERE rk <= ${Similarity.MmrC}),
         |pd AS (SELECT ca.probe_id, ca.vec_id AS a, cb.vec_id AS b,
         |    CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM cand ca
         |  JOIN cand cb ON cb.probe_id = ca.probe_id
         |    AND cb.vec_id <> ca.vec_id
         |  JOIN flat fa ON fa.vec_id = ca.vec_id
         |  JOIN flat fb ON fb.vec_id = cb.vec_id AND fb.i = fa.i
         |  GROUP BY 1, 2, 3),
         |csim AS (SELECT pd.probe_id, pd.a, pd.b,
         |    ${Vectors.duckCosine("pd.dot", "na.n2", "nb.n2")} AS sim
         |  FROM pd
         |  JOIN norms na ON na.vec_id = pd.a
         |  JOIN norms nb ON nb.vec_id = pd.b),
         |sel0 AS (SELECT probe_id, vec_id, rel, CAST(0 AS DOUBLE) AS mmr,
         |    CAST(0 AS BIGINT) AS rk FROM cand WHERE false),
         |${(1 to Similarity.MmrK).map(step).mkString(",\n")}
         |SELECT probe_id, rk, vec_id, rel, mmr AS mmr_score
         |FROM sel${Similarity.MmrK} ORDER BY probe_id, rk""".stripMargin
    },

    // RRF fusion oracle: the vector chain is sim_topk_bruteforce's,
    // the lexical chain text_tfidf_topk's with l-prefixed names;
    // rrf = sum of CAST(1 AS DOUBLE)/(K + rank) contributions in the
    // same left-to-right order as the engine expression.
    "sim_hybrid_rrf" -> {
      val k = Similarity.RrfK
      s"""WITH $embCtes,
         |vd AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |vs AS (SELECT vd.probe_id, vd.neighbor_id,
         |    ${Vectors.duckCosine("vd.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM vd
         |  JOIN norms na ON na.vec_id = vd.probe_id
         |  JOIN norms nb ON nb.vec_id = vd.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |vr AS (SELECT probe_id, neighbor_id,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS vec_rk
         |  FROM vs),
         |vk AS (SELECT * FROM vr WHERE vec_rk <= ${Similarity.TopK}),
         |ltoks AS (SELECT doc_id, unnest($toksT) AS tok FROM documents),
         |ltf AS (SELECT doc_id, tok, count(*) AS tf FROM ltoks GROUP BY 1, 2),
         |ldfr AS (SELECT tok, count(*) AS df FROM ltf GROUP BY 1),
         |ln AS (SELECT count(*) AS n_docs FROM documents),
         |lflat AS (SELECT ltf.doc_id,
         |    ${Portable.duckHash("tok")} % ${TextAnalysis.TfidfDim} AS i,
         |    CAST(sum(ltf.tf * length(bin(n_docs // ldfr.df)))
         |      AS BIGINT) AS v
         |  FROM ltf JOIN ldfr USING (tok), ln GROUP BY 1, 2),
         |lnorms AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
         |  FROM lflat GROUP BY 1),
         |ld AS (SELECT pf.doc_id AS probe_id, f.doc_id AS neighbor_id,
         |    CAST(sum(pf.v * f.v) AS BIGINT) AS dot
         |  FROM lflat pf
         |  JOIN lflat f ON f.i = pf.i AND f.doc_id <> pf.doc_id
         |  WHERE pf.doc_id < ${TextAnalysis.TfidfProbes}
         |  GROUP BY 1, 2),
         |lscored AS (SELECT ld.probe_id, ld.neighbor_id,
         |    ${Vectors.duckCosine("ld.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM ld
         |  JOIN lnorms na ON na.doc_id = ld.probe_id
         |  JOIN lnorms nb ON nb.doc_id = ld.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |lr AS (SELECT probe_id, neighbor_id,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS lex_rk
         |  FROM lscored),
         |lk AS (SELECT * FROM lr WHERE lex_rk <= ${TextAnalysis.TfidfTopK}),
         |fu AS (SELECT coalesce(v.probe_id, l.probe_id) AS probe_id,
         |    coalesce(v.neighbor_id, l.neighbor_id) AS neighbor_id,
         |    CAST(coalesce(v.vec_rk, 0) AS BIGINT) AS vec_rk,
         |    CAST(coalesce(l.lex_rk, 0) AS BIGINT) AS lex_rk,
         |    coalesce(CAST(1 AS DOUBLE) / ($k + v.vec_rk),
         |        CAST(0 AS DOUBLE))
         |      + coalesce(CAST(1 AS DOUBLE) / ($k + l.lex_rk),
         |        CAST(0 AS DOUBLE)) AS rrf_score
         |  FROM vk v FULL JOIN lk l
         |    ON l.probe_id = v.probe_id AND l.neighbor_id = v.neighbor_id),
         |rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY rrf_score DESC, neighbor_id) AS BIGINT) AS rk FROM fu)
         |SELECT probe_id, rk, neighbor_id, vec_rk, lex_rk, rrf_score
         |FROM rr WHERE rk <= ${Similarity.TopK}
         |ORDER BY probe_id, rk""".stripMargin
    },

    "sim_ann_ivf_recall" -> ivfRecallSql(Similarity.IvfNProbe),

    // Cross-geometry Pareto frontier: every chunk is the family's
    // own shared CTE text (exact baseline, SRP buckets, IVF cell
    // selection, PQ chain, graph walk) so the frontier CANNOT drift
    // from the per-geometry gauges; candidate counts come from the
    // same scored relations the rankers rank.
    "sim_ann_frontier" -> {
      val nps = Similarity.IvfCurveProbes
      val k = Similarity.TopK
      val hops = Similarity.GraphSearchHops
      val ivfCuts = nps.map { n =>
        s"""ic$n AS (SELECT probe_id, label FROM (
           |    SELECT isc.*, row_number() OVER (PARTITION BY probe_id
           |      ORDER BY cell_cos DESC, label) AS crk FROM isc) t
           |  WHERE crk <= $n),
           |iv$n AS (SELECT bs.probe_id, bs.neighbor_id, bs.cos_sim
           |  FROM (SELECT t.probe_id, l.vec_id FROM ic$n t
           |    JOIN lab l ON l.label = t.label
           |    WHERE l.vec_id <> t.probe_id) c
           |  JOIN bs ON bs.probe_id = c.probe_id
           |    AND bs.neighbor_id = c.vec_id),
           |ir$n AS (SELECT probe_id, neighbor_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY probe_id
           |      ORDER BY cos_sim DESC, neighbor_id) AS rk FROM iv$n)
           |  WHERE rk <= $k)""".stripMargin
      }.mkString(",\n")
      val ivfRows = nps.map { n =>
        s"""SELECT 'ivf' AS method, CAST($n AS BIGINT) AS param,
           |    (SELECT CAST(count(*) AS BIGINT) FROM bfk b JOIN ir$n a
           |      ON a.probe_id = b.probe_id
           |      AND a.neighbor_id = b.neighbor_id) AS n_matched,
           |    (SELECT CAST(count(*) AS BIGINT) FROM bfk) AS n_exact,
           |    (SELECT CAST(count(*) AS BIGINT) FROM iv$n)
           |      AS n_candidates""".stripMargin
      }.mkString("\n  UNION ALL\n")
      val gvisCtes = Similarity.GraphCurveHops.map { h =>
        val gssUnion = (1 to h)
          .map(x => s"SELECT probe_id, node FROM gss$x")
          .mkString("\n    UNION ALL ")
        s"""gvis$h AS (SELECT DISTINCT probe_id, node FROM (
           |    $gssUnion
           |    UNION ALL SELECT pc.probe_id, pc.node FROM pc
           |      JOIN gen ON pc.node = gen.entry))""".stripMargin
      }.mkString(",\n")
      val graphRows = Similarity.GraphCurveHops.map { h =>
        s"""SELECT 'graph' AS method, CAST($h AS BIGINT) AS param,
           |    (SELECT CAST(count(*) AS BIGINT) FROM bfk b
           |      JOIN gf$h a ON a.probe_id = b.probe_id
           |      AND a.node = b.neighbor_id) AS n_matched,
           |    (SELECT CAST(count(*) AS BIGINT) FROM bfk) AS n_exact,
           |    (SELECT CAST(count(*) AS BIGINT) FROM gvis$h)
           |      AS n_candidates""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH $embCtes,
         |$srpCtes,
         |$exactTopKCtes,
         |${ivfCellCtes(nps.max)},
         |${pqCtes(pqNormHead)},
         |$graphWalkCtes,
         |lcand AS (SELECT DISTINCT b.vec_id AS probe_id,
         |    a.vec_id AS neighbor_id
         |  FROM buckets a JOIN buckets b ON a.band = b.band
         |    AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |  WHERE b.vec_id < ${Similarity.NumProbes}),
         |lsc AS (SELECT bs.probe_id, bs.neighbor_id, bs.cos_sim
         |  FROM lcand c JOIN bs ON bs.probe_id = c.probe_id
         |    AND bs.neighbor_id = c.neighbor_id),
         |lrk AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rk FROM lsc)
         |  WHERE rk <= $k),
         |mpc AS (SELECT DISTINCT mp.probe_id, b.vec_id AS neighbor_id
         |  FROM (SELECT pb.vec_id AS probe_id, pb.band,
         |      unnest([${duckMultiprobeVariants("pb.bucket")}]) AS bucket
         |    FROM buckets pb WHERE pb.vec_id < ${Similarity.NumProbes}) mp
         |  JOIN buckets b ON b.band = mp.band AND b.bucket = mp.bucket
         |    AND b.vec_id <> mp.probe_id),
         |msc AS (SELECT bs.probe_id, bs.neighbor_id, bs.cos_sim
         |  FROM mpc c JOIN bs ON bs.probe_id = c.probe_id
         |    AND bs.neighbor_id = c.neighbor_id),
         |mrk AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rk FROM msc)
         |  WHERE rk <= $k),
         |$hammingCtes,
         |hmk AS (SELECT probe_id, neighbor_id FROM hr WHERE rk <= $k),
         |$ivfCuts,
         |pcodes AS (SELECT vec_id, sub, code FROM best WHERE rk = 1),
         |ppf AS (SELECT vec_id AS probe_id, sub, il, v FROM f
         |  WHERE vec_id < ${Similarity.NumProbes}),
         |plut AS (SELECT p.probe_id, c.sub, c.code,
         |    CAST(sum((p.v - c.m) * (p.v - c.m)) AS BIGINT) AS pd2
         |  FROM ppf p JOIN comp c ON c.sub = p.sub AND c.il = p.il
         |  GROUP BY 1, 2, 3),
         |psc AS (SELECT l.probe_id, cd.vec_id AS neighbor_id,
         |    CAST(sum(l.pd2) AS BIGINT) AS approx_d2
         |  FROM pcodes cd JOIN plut l ON l.sub = cd.sub
         |    AND l.code = cd.code
         |  WHERE cd.vec_id <> l.probe_id
         |  GROUP BY 1, 2),
         |prk AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY approx_d2, neighbor_id) AS rk FROM psc)
         |  WHERE rk <= $k),
         |$gvisCtes,
         |conf AS (
         |  SELECT 'exact' AS method, CAST(0 AS BIGINT) AS param,
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk) AS n_matched,
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk) AS n_exact,
         |    (SELECT CAST(count(*) AS BIGINT) FROM bs) AS n_candidates
         |  UNION ALL
         |  SELECT 'lsh', CAST(0 AS BIGINT),
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk b JOIN lrk a
         |      ON a.probe_id = b.probe_id
         |      AND a.neighbor_id = b.neighbor_id),
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk),
         |    (SELECT CAST(count(*) AS BIGINT) FROM lsc)
         |  UNION ALL
         |  SELECT 'lsh_multiprobe', CAST(0 AS BIGINT),
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk b JOIN mrk a
         |      ON a.probe_id = b.probe_id
         |      AND a.neighbor_id = b.neighbor_id),
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk),
         |    (SELECT CAST(count(*) AS BIGINT) FROM msc)
         |  UNION ALL
         |  SELECT 'hamming', CAST(0 AS BIGINT),
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk b JOIN hmk a
         |      ON a.probe_id = b.probe_id
         |      AND a.neighbor_id = b.neighbor_id),
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk),
         |    (SELECT CAST(count(*) AS BIGINT) FROM hsc)
         |  UNION ALL
         |  $ivfRows
         |  UNION ALL
         |  SELECT 'pq', CAST(0 AS BIGINT),
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk b JOIN prk a
         |      ON a.probe_id = b.probe_id
         |      AND a.neighbor_id = b.neighbor_id),
         |    (SELECT CAST(count(*) AS BIGINT) FROM bfk),
         |    (SELECT CAST(count(*) AS BIGINT) FROM psc)
         |  UNION ALL
         |  $graphRows)
         |SELECT c.method, c.param, c.n_matched, c.n_exact,
         |  c.n_candidates,
         |  CAST(c.n_matched AS DOUBLE) / CAST(c.n_exact AS DOUBLE)
         |    AS recall,
         |  NOT EXISTS (SELECT 1 FROM conf o
         |    WHERE (o.method <> c.method OR o.param <> c.param)
         |      AND o.n_matched >= c.n_matched
         |      AND o.n_candidates <= c.n_candidates
         |      AND (o.n_matched > c.n_matched
         |        OR o.n_candidates < c.n_candidates)) AS pareto
         |FROM conf c ORDER BY c.method, c.param""".stripMargin
    },

    // Balance audit over the same trained chain: per seed cell the
    // final-assignment occupancy, load ratio, and the integer
    // cross-product split/merge/dead verdict.
    "sim_ivf_balance" -> {
      val n = Similarity.KmeansIters
      s"""WITH ${kmeansTrainCtes(n)},
         |seeds AS (SELECT DISTINCT CAST(label AS BIGINT) AS cell
         |  FROM embeddings),
         |occ AS (SELECT CAST(cell AS BIGINT) AS cell,
         |    CAST(count(*) AS BIGINT) AS n_vecs FROM kma$n GROUP BY 1),
         |aud AS (SELECT s.cell, COALESCE(o.n_vecs, 0) AS n_vecs
         |  FROM seeds s LEFT JOIN occ o ON o.cell = s.cell),
         |tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total,
         |    CAST(count(*) AS BIGINT) AS n_cells FROM aud)
         |SELECT a.cell, a.n_vecs,
         |  CAST(a.n_vecs * t.n_cells AS DOUBLE) / CAST(t.n_total AS DOUBLE)
         |    AS load_ratio,
         |  CASE WHEN a.n_vecs = 0 THEN 'dead'
         |    WHEN a.n_vecs * t.n_cells > t.n_total * 2 THEN 'split'
         |    WHEN a.n_vecs * t.n_cells * 2 < t.n_total THEN 'merge'
         |    ELSE 'ok' END AS verdict
         |FROM aud a, tot t ORDER BY a.cell""".stripMargin
    },

    "sim_kmeans_train" -> {
      val n = Similarity.KmeansIters
      val rounds = (1 to n).map { r =>
        s"""SELECT CAST($r AS BIGINT) AS iter,
           |  CAST(count(*) FILTER (WHERE cell <> old_cell) AS BIGINT)
           |    AS n_moved,
           |  CAST(count(DISTINCT cell) AS BIGINT) AS n_live_cells
           |FROM kma$r""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH ${kmeansTrainCtes(n)}\n$rounds\nORDER BY iter"
    },

    // Elbow oracle: one seeded train chain per k (vec_id % k cells,
    // ElbowIters rounds), then the final-assignment centroids and
    // the exact-integer cohesion total.
    "sim_kmeans_elbow" -> {
      val n = Similarity.ElbowIters
      val chains = Similarity.ElbowKs
        .map(k => kmeansTrainCtes(n, s"e$k", s"vec_id % $k"))
        .mkString(",\n")
      val rows = Similarity.ElbowKs.map { k =>
        val p = s"e$k"
        s"""SELECT CAST($k AS BIGINT) AS k,
           |  (SELECT CAST(count(DISTINCT cell) AS BIGINT) FROM ${p}a$n)
           |    AS n_live_cells,
           |  CAST(sum(dt) AS BIGINT) AS total_dot,
           |  CAST(sum(dt) AS DOUBLE) / count(*) AS avg_dot
           |FROM (SELECT f.vec_id, CAST(sum(f.v * c.s) AS BIGINT) AS dt
           |  FROM ${p}f$n f
           |  JOIN (SELECT cell, i, CAST(round(CAST(sum(v) AS DOUBLE)
           |      / count(*)) AS BIGINT) AS s
           |    FROM ${p}f$n GROUP BY 1, 2) c
           |    ON c.cell = f.cell AND c.i = f.i
           |  GROUP BY 1) t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $chains\n$rows\nORDER BY k"
    },

    "sim_ann_ivf_trained" -> ivfRecallSql(Similarity.IvfNProbe,
      labSql =
        s"SELECT vec_id, cell AS label FROM kma${Similarity.KmeansIters}",
      extraCtes = kmeansTrainCtes(Similarity.KmeansIters) + ",\n"),

    "sim_ann_ivf_curve" -> (Similarity.IvfCurveProbes
      .map(np => s"SELECT CAST($np AS BIGINT) AS n_probe, t.* FROM (\n" +
        ivfRecallSql(np) + "\n) t")
      .mkString("\nUNION ALL\n") + "\nORDER BY n_probe, probe_id"),

    "corpus_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    ${TextAnalysis.duckTokens("text")} AS toks FROM documents),
         |n AS (SELECT doc_id, source, toks, len(toks) AS n_tokens FROM t
         |  WHERE len(toks) > 0),
         |c AS (SELECT doc_id, source, n_tokens,
         |    unnest(range(0, CAST(n_tokens AS BIGINT),
         |      ${Corpus.ChunkStride})) AS start, toks
         |  FROM n),
         |k AS (SELECT doc_id, source,
         |    ${Portable.duckHash(
                 s"array_to_string(list_slice(toks, start + 1, " +
                   s"start + ${Corpus.ChunkSize}), ' ')")} AS chunk_fp
         |  FROM c
         |  WHERE start = 0
         |    OR start + ${Corpus.ChunkSize - Corpus.ChunkStride} < n_tokens),
         |dpf AS (SELECT chunk_fp, doc_id,
         |    count(*) OVER (PARTITION BY chunk_fp) AS docs_with_fp
         |  FROM (SELECT DISTINCT chunk_fp, doc_id FROM k))
         |SELECT k.source, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN d.docs_with_fp > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_shared_chunks,
         |  CAST(sum(CASE WHEN d.docs_with_fp > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS shared_ratio
         |FROM k JOIN dpf d
         |  ON d.chunk_fp = k.chunk_fp AND d.doc_id = k.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sim_kmeans_assign" ->
      s"""$kmeansAssignCtes
         |SELECT label, cell AS assigned_cell, count(*) AS n_vecs
         |FROM a WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "sim_kmeans_update" ->
      s"""$kmeansAssignCtes,
         |av AS (SELECT vec_id, label, cell AS assigned_cell
         |  FROM a WHERE rk = 1),
         |newc AS (SELECT av.assigned_cell AS cell, f.i,
         |    CAST(round(CAST(sum(f.v) AS DOUBLE) / count(*)) AS BIGINT) AS s2
         |  FROM flat f JOIN av ON av.vec_id = f.vec_id GROUP BY 1, 2),
         |sh AS (SELECT c.cell,
         |    CAST(sum((c.s - COALESCE(n.s2, c.s)) *
         |      (c.s - COALESCE(n.s2, c.s))) AS BIGINT) AS shift_d2
         |  FROM comp c LEFT JOIN newc n ON n.cell = c.cell AND n.i = c.i
         |  GROUP BY 1),
         |bf AS (SELECT label AS cell, CAST(count(*) AS BIGINT) AS n_before
         |  FROM q GROUP BY 1),
         |af AS (SELECT assigned_cell AS cell,
         |    CAST(count(*) AS BIGINT) AS n_after FROM av GROUP BY 1)
         |SELECT bf.cell, bf.n_before,
         |  COALESCE(af.n_after, 0) AS n_after,
         |  COALESCE(sh.shift_d2, 0) AS shift_d2
         |FROM bf LEFT JOIN af ON af.cell = bf.cell
         |LEFT JOIN sh ON sh.cell = bf.cell
         |ORDER BY 1""".stripMargin,

    "embed_cluster_purity" ->
      s"""$kmeansAssignCtes,
         |m AS (SELECT cell, label, count(*) AS n
         |  FROM a WHERE rk = 1 GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cell
         |    ORDER BY n DESC, label) AS mr,
         |    CAST(sum(n) OVER (PARTITION BY cell) AS BIGINT) AS n_total
         |  FROM m)
         |SELECT cell AS assigned_cell, n_total AS n_vecs,
         |  label AS majority_label, n AS n_majority,
         |  CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS purity
         |FROM r WHERE mr = 1 ORDER BY 1""".stripMargin,

    "cdc_forget_keys" ->
      s"""$C,
         |fk AS (SELECT DISTINCT user_id FROM c WHERE user_id % 17 = 0),
         |scrub AS (SELECT c.* FROM c
         |  WHERE user_id NOT IN (SELECT user_id FROM fk)),
         |sb AS (SELECT table_name, count(*) AS state_keys_before FROM (
         |    SELECT *, row_number() OVER (PARTITION BY table_name, user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn FROM c)
         |  WHERE rn = 1 AND op <> 'delete' GROUP BY 1),
         |sa AS (SELECT table_name, count(*) AS state_keys_after FROM (
         |    SELECT *, row_number() OVER (PARTITION BY table_name, user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn FROM scrub)
         |  WHERE rn = 1 AND op <> 'delete' GROUP BY 1),
         |fc AS (SELECT table_name, count(*) AS feed_rows,
         |    CAST(sum(CASE WHEN user_id % 17 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS feed_scrubbed
         |  FROM c GROUP BY 1)
         |SELECT fc.table_name, fc.feed_rows, fc.feed_scrubbed,
         |  coalesce(sb.state_keys_before, 0) AS state_keys_before,
         |  coalesce(sa.state_keys_after, 0) AS state_keys_after,
         |  CAST(0 AS BIGINT) AS residual_keys
         |FROM fc
         |LEFT JOIN sb ON sb.table_name = fc.table_name
         |LEFT JOIN sa ON sa.table_name = fc.table_name
         |ORDER BY 1""".stripMargin,

    "cdc_lag_monitor" ->
      s"""$C,
         |pt AS (SELECT table_name, count(*) AS n_events,
         |    max(epoch_us(ts)) AS max_ts_us
         |  FROM c GROUP BY 1),
         |g AS (SELECT max(max_ts_us) AS head_us FROM pt)
         |SELECT table_name, n_events, max_ts_us,
         |  head_us - max_ts_us AS lag_us
         |FROM pt, g ORDER BY 1""".stripMargin,

    "cdc_hot_keys" ->
      s"""$C,
         |pk AS (SELECT table_name, user_id, count(*) AS n_changes
         |  FROM c GROUP BY 1, 2),
         |tt AS (SELECT table_name, sum(n_changes) AS table_total
         |  FROM pk GROUP BY 1),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY table_name
         |    ORDER BY n_changes DESC, user_id) AS BIGINT) AS rk FROM pk)
         |SELECT r.table_name, r.user_id, r.n_changes, r.rk,
         |  CAST(r.n_changes AS DOUBLE) / CAST(tt.table_total AS DOUBLE)
         |    AS share
         |FROM r JOIN tt ON tt.table_name = r.table_name
         |WHERE r.rk <= 5 ORDER BY r.table_name, r.rk""".stripMargin,

    "cdc_snapshot_diff" ->
      s"""$C,
         |f AS (SELECT * FROM c WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'),
         |r1 AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn FROM f
         |  WHERE ts <= TIMESTAMP '2024-01-10 00:00:00'),
         |r2 AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn FROM f),
         |s1 AS (SELECT user_id, table_name, event_id, op FROM r1 WHERE rn = 1),
         |s2 AS (SELECT user_id, table_name, event_id, op FROM r2 WHERE rn = 1),
         |j AS (SELECT coalesce(s2.table_name, s1.table_name) AS table_name,
         |    (s1.op IS NOT NULL AND s1.op <> 'delete') AS live1,
         |    (s2.op IS NOT NULL AND s2.op <> 'delete') AS live2,
         |    s1.event_id AS e1, s2.event_id AS e2
         |  FROM s1 FULL OUTER JOIN s2 ON s2.user_id = s1.user_id)
         |SELECT table_name,
         |  CAST(sum(CASE WHEN NOT live1 AND live2 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         |  CAST(sum(CASE WHEN live1 AND NOT live2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  CAST(sum(CASE WHEN live1 AND live2 AND e1 <> e2 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         |  CAST(sum(CASE WHEN live1 AND live2 AND e1 = e2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
         |  CAST(sum(CASE WHEN live1 THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_t1,
         |  CAST(sum(CASE WHEN live2 THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_t2
         |FROM j WHERE live1 OR live2
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_fk_audit" ->
      s"""WITH cust AS (SELECT DISTINCT c_custkey FROM customer
         |  WHERE c_custkey % 13 <> 0),
         |oc AS (SELECT CASE WHEN o_orderkey % 101 = 0 THEN NULL
         |    ELSE o_custkey END AS fk FROM orders),
         |op AS (SELECT DISTINCT o_orderkey FROM orders
         |  WHERE o_orderkey % 997 <> 0),
         |a1 AS (SELECT 'orders_custkey_fk' AS constraint_name,
         |    count(*) AS child_rows,
         |    CAST(count(CASE WHEN fk IS NULL THEN 1 END) AS BIGINT)
         |      AS null_fk_rows,
         |    CAST(count(CASE WHEN fk IS NOT NULL AND c_custkey IS NULL
         |      THEN 1 END) AS BIGINT) AS orphan_rows,
         |    count(DISTINCT CASE WHEN fk IS NOT NULL AND c_custkey IS NULL
         |      THEN fk END) AS orphan_keys
         |  FROM oc LEFT JOIN cust ON oc.fk = cust.c_custkey),
         |a2 AS (SELECT 'lineitem_orderkey_fk' AS constraint_name,
         |    count(*) AS child_rows,
         |    CAST(count(CASE WHEN l.l_orderkey IS NULL THEN 1 END)
         |      AS BIGINT) AS null_fk_rows,
         |    CAST(count(CASE WHEN l.l_orderkey IS NOT NULL
         |      AND op.o_orderkey IS NULL THEN 1 END) AS BIGINT)
         |      AS orphan_rows,
         |    count(DISTINCT CASE WHEN l.l_orderkey IS NOT NULL
         |      AND op.o_orderkey IS NULL THEN l.l_orderkey END) AS orphan_keys
         |  FROM lineitem l LEFT JOIN op ON l.l_orderkey = op.o_orderkey)
         |SELECT * FROM a1 UNION ALL SELECT * FROM a2 ORDER BY 1""".stripMargin,

    // The roundtrip summary must equal the aggregate computed
    // directly over the source slice the stream replicated — content
    // equality through sink + consumer, not just a row count.
    "cdc_stream_roundtrip" ->
      s"""$C
         |SELECT 'data' AS record_type, op AS operation, table_name,
         |  count(*) AS n,
         |  CAST(sum(user_id) AS BIGINT) AS sum_user_id,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM c WHERE user_id % 4 = 0
         |GROUP BY 1, 2, 3 ORDER BY 2""".stripMargin,

    "cdc_reshard" -> {
      val h = Portable.duckHash("CAST(user_id AS VARCHAR)")
      s"""WITH hx AS (SELECT $h AS h, ts FROM events),
         |r AS (SELECT CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
         |      THEN h >> 58
         |    WHEN (h >> 58) = 1 THEN 4 + ((h >> 57) % 2)
         |    ELSE h >> 58 END AS shard_id,
         |    CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
         |      THEN 1 ELSE 0 END AS bef
         |  FROM hx),
         |c AS (SELECT shard_id, CAST(sum(bef) AS BIGINT) AS n_before,
         |    CAST(sum(1 - bef) AS BIGINT) AS n_after
         |  FROM r GROUP BY 1),
         |l(shard_id, parent_shard) AS (VALUES
         |  (CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)),
         |  (0, -1), (1, -1), (2, -1), (3, -1), (4, 1), (5, 1))
         |SELECT l.shard_id, l.parent_shard,
         |  coalesce(c.n_before, CAST(0 AS BIGINT)) AS n_before,
         |  coalesce(c.n_after, CAST(0 AS BIGINT)) AS n_after
         |FROM l LEFT JOIN c ON c.shard_id = l.shard_id
         |ORDER BY 1""".stripMargin
    },

    "events_attribution" -> attributionOracle("last_value"),

    "events_attribution_first" -> attributionOracle("first_value"),

    "events_gap_detection" ->
      s"""WITH u AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
         |p AS (SELECT user_id, event_id,
         |    lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
         |      AS prev_id
         |  FROM events),
         |a AS (SELECT p.user_id, count(*) AS n_events,
         |    CAST(sum(CASE WHEN p.event_id - p.prev_id > u.n_users * 8
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
         |    max(p.event_id - p.prev_id) AS max_gap
         |  FROM p, u GROUP BY 1)
         |SELECT user_id, n_events, n_gaps, max_gap
         |FROM a WHERE n_gaps > 0 ORDER BY 1""".stripMargin,

    "dedup_containment" ->
      s"""WITH $minhashCtes,
         |shd AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |sizes AS (SELECT doc_id, count(*) AS set_size FROM shd GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS n_inter
         |  FROM cand c
         |  JOIN shd x ON x.doc_id = c.d1
         |  JOIN shd y ON y.doc_id = c.d2 AND y.shingle = x.shingle
         |  GROUP BY 1, 2)
         |SELECT i.d1 AS doc_id_a, i.d2 AS doc_id_b, i.n_inter,
         |  CAST(i.n_inter AS DOUBLE) / CAST(sa.set_size AS DOUBLE)
         |    AS containment_a,
         |  CAST(i.n_inter AS DOUBLE) / CAST(sb.set_size AS DOUBLE)
         |    AS containment_b,
         |  (i.n_inter * 5 >= least(sa.set_size, sb.set_size) * 4) AS contained
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.d1
         |JOIN sizes sb ON sb.doc_id = i.d2
         |ORDER BY 1, 2""".stripMargin,

    "dedup_fuzzy_verify" ->
      s"""WITH $minhashCtes,
         |nt AS (SELECT doc_id, $normT AS nt FROM documents)
         |SELECT c.d1 AS doc_id_a, c.d2 AS doc_id_b,
         |  CAST(levenshtein(a.nt, b.nt) AS BIGINT) AS lev,
         |  (levenshtein(a.nt, b.nt) * 5
         |    <= greatest(length(a.nt), length(b.nt))) AS near
         |FROM cand c
         |JOIN nt a ON a.doc_id = c.d1
         |JOIN nt b ON b.doc_id = c.d2
         |ORDER BY 1, 2""".stripMargin,

    "cdc_validation" ->
      s"""WITH src AS (SELECT o_orderkey AS k, o_orderstatus AS g,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         |    ${Portable.duckHash("CAST(o_orderkey AS VARCHAR)")} % 97 AS hb
         |  FROM orders),
         |tgt AS (
         |  SELECT k, g, CASE WHEN hb = 0 THEN c + 1 ELSE c END AS c
         |  FROM src WHERE hb <> 1
         |  UNION ALL
         |  SELECT k + 100000000, g, c FROM src WHERE hb = 2
         |  UNION ALL
         |  SELECT k, g, c FROM src WHERE hb = 3),
         |ds AS (SELECT k, max(g) AS g, count(*) AS cnt, count(c) AS c_cnt,
         |    sum(c) AS c_sum, min(c) AS c_min, max(c) AS c_max,
         |    TRUE AS present
         |  FROM src GROUP BY 1),
         |dt AS (SELECT k, max(g) AS g, count(*) AS cnt, count(c) AS c_cnt,
         |    sum(c) AS c_sum, min(c) AS c_min, max(c) AS c_max,
         |    TRUE AS present
         |  FROM tgt GROUP BY 1),
         |j AS (SELECT coalesce(s.g, t.g) AS g,
         |    coalesce(s.present, FALSE) AS in_s,
         |    coalesce(t.present, FALSE) AS in_t,
         |    (coalesce(s.present, FALSE) AND coalesce(t.present, FALSE)
         |      AND s.cnt = t.cnt AND s.c_cnt = t.c_cnt
         |      AND s.c_sum IS NOT DISTINCT FROM t.c_sum
         |      AND s.c_min IS NOT DISTINCT FROM t.c_min
         |      AND s.c_max IS NOT DISTINCT FROM t.c_max) AS is_match
         |  FROM ds s FULL OUTER JOIN dt t ON s.k IS NOT DISTINCT FROM t.k)
         |SELECT g AS o_orderstatus,
         |  CAST(sum(CASE WHEN in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_source,
         |  CAST(sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS BIGINT) AS n_target,
         |  CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_matched,
         |  CAST(sum(CASE WHEN in_s AND in_t AND NOT is_match
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
         |  CAST(sum(CASE WHEN in_s AND NOT in_t THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_missing_target,
         |  CAST(sum(CASE WHEN in_t AND NOT in_s THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_extra_target
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_incremental_agg" ->
      s"""$C,
         |prev AS (SELECT *, lag(value) OVER w AS pv, lag(op) OVER w AS pop
         |  FROM c
         |  WINDOW w AS (PARTITION BY table_name, user_id ORDER BY ts, event_id)),
         |inc AS (SELECT table_name,
         |    sum(CAST(COALESCE(CASE WHEN op <> 'delete' THEN value END, 0) AS DECIMAL(18,2))
         |      - CAST(COALESCE(CASE WHEN pop IS NOT NULL AND pop <> 'delete' THEN pv END, 0) AS DECIMAL(18,2))) AS inc_sum_d,
         |    count(*) AS n_changes
         |  FROM prev GROUP BY 1),
         |st AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY table_name, user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn FROM c)
         |  WHERE rn = 1 AND op <> 'delete'),
         |f AS (SELECT table_name, sum(CAST(value AS DECIMAL(18,2))) AS full_sum_d,
         |    count(*) AS n_live_keys
         |  FROM st GROUP BY 1)
         |SELECT i.table_name,
         |  CAST(i.inc_sum_d AS DOUBLE) AS inc_sum,
         |  CAST(COALESCE(f.full_sum_d, 0) AS DOUBLE) AS full_sum,
         |  i.inc_sum_d = COALESCE(f.full_sum_d, 0) AS maintained_ok,
         |  i.n_changes, COALESCE(f.n_live_keys, 0) AS n_live_keys
         |FROM inc i LEFT JOIN f USING (table_name) ORDER BY 1""".stripMargin,

    // The oracle needs no envelope round trip: the default rule is
    // "even event_id (pre-ALTER) → TRUE; odd → null when user_id%3==0
    // else user_id%2==0", computed straight from the change feed.
    "cdc_drifted_defaults" ->
      s"""$C
         |SELECT table_name, count(*) AS n,
         |  count(*) FILTER (WHERE event_id % 2 = 0
         |    OR (user_id % 3 <> 0 AND user_id % 2 = 0)) AS n_true,
         |  count(*) FILTER (WHERE event_id % 2 = 1
         |    AND user_id % 3 <> 0 AND user_id % 2 = 1) AS n_false,
         |  count(*) FILTER (WHERE event_id % 2 = 1
         |    AND user_id % 3 = 0) AS n_null
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_exceptions" ->
      s"""$C,
         |viol AS (
         |  SELECT table_name, 'null_key' AS rule, event_id FROM c
         |    WHERE user_id IS NULL
         |  UNION ALL
         |  SELECT table_name, 'value_out_of_range' AS rule, event_id FROM c
         |    WHERE value < 1.0
         |  UNION ALL
         |  SELECT table_name, 'props_k_out_of_domain' AS rule, event_id FROM c
         |    WHERE TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) > 90)
         |SELECT table_name, rule, count(*) AS n,
         |  min(event_id) AS min_event_id, max(event_id) AS max_event_id
         |FROM viol GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_mktsegment,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q_quantile_sketch" -> {
      val h = Portable.duckHash(
        "(CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR))")
      s"""WITH keyed AS (SELECT l_returnflag AS g, l_extendedprice AS v, $h AS h
         |  FROM lineitem),
         |samp AS (SELECT g, v, h FROM (
         |    SELECT *, row_number() OVER (PARTITION BY g ORDER BY h, v) AS rn
         |    FROM keyed)
         |  WHERE rn <= ${Analytics.QuantileSampleK}),
         |sorted AS (SELECT g, v,
         |    CAST(row_number() OVER (PARTITION BY g ORDER BY v, h) AS BIGINT) AS vr
         |  FROM samp),
         |wn AS (SELECT *, max(vr) OVER (PARTITION BY g) AS ns,
         |    ((max(vr) OVER (PARTITION BY g)) - 1) * 50 // 100 + 1 AS t50,
         |    ((max(vr) OVER (PARTITION BY g)) - 1) * 90 // 100 + 1 AS t90
         |  FROM sorted)
         |SELECT g, max(ns) AS n_sample,
         |  max(CASE WHEN vr = t50 THEN v END) AS est_p50,
         |  max(CASE WHEN vr = t90 THEN v END) AS est_p90
         |FROM wn GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q19_disjunctive_revenue" ->
      s"""SELECT
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1 AND 20)
         |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
         |    AND l_quantity BETWEEN 10 AND 30)
         |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
         |    AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
         |  AND cn.n_name <> sn.n_name
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q14_promo_revenue" ->
      s"""SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ship_month,
         |  CAST(sum(CASE WHEN p_type = 'PROMO'
         |      THEN CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))
         |      ELSE CAST(0 AS $D) END) AS DOUBLE) * 100.0
         |    / CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE)
         |    AS promo_pct,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS total_revenue,
         |  count(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS total_rev_d
         |  FROM lineitem
         |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, CAST(total_rev_d AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev_d = (SELECT max(total_rev_d) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q17_small_qty_revenue" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')),
         |w AS (SELECT *,
         |    sum(CAST(l_quantity AS $D)) OVER (PARTITION BY l_partkey) AS sum_qty_d,
         |    count(*) OVER (PARTITION BY l_partkey) AS cnt FROM li)
         |SELECT CAST(sum(CAST(l_extendedprice AS $D)) AS DOUBLE) / 7.0 AS avg_yearly,
         |  count(*) AS n_items
         |FROM w WHERE CAST(l_quantity AS $D) * 5 * cnt < sum_qty_d""".stripMargin,

    "q21_waiting_suppliers" ->
      s"""WITH per_supp AS (
         |  SELECT l_orderkey, l_suppkey,
         |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
         |      THEN 1 ELSE 0 END) AS s_late
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |culprit AS (
         |  SELECT l_orderkey, count(*) AS n_supp, sum(s_late) AS n_late,
         |    max(CASE WHEN s_late = 1 THEN l_suppkey END) AS late_supp
         |  FROM per_supp GROUP BY 1
         |  HAVING count(*) >= 2 AND sum(s_late) = 1)
         |SELECT s_suppkey, s_name, count(*) AS numwait
         |FROM culprit JOIN supplier ON late_supp = s_suppkey
         |GROUP BY 1, 2 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q22_sales_opportunity" ->
      s"""WITH pos AS (
         |  SELECT sum(CAST(c_acctbal AS $D)) AS sum_pos, count(*) AS n_pos
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_mktsegment, count(*) AS n_cust,
         |  CAST(sum(CAST(c_acctbal AS $D)) AS DOUBLE) AS total_acctbal
         |FROM customer, pos
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01')
         |  AND CAST(c_acctbal AS $D) * n_pos > sum_pos
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q2_min_cost_supplier" ->
      s"""WITH pf AS (SELECT p_partkey, p_name FROM part WHERE p_size <= 5),
         |c AS (SELECT l_partkey, l_suppkey,
         |    CAST(l_extendedprice AS $D) AS price_d,
         |    min(CAST(l_extendedprice AS $D))
         |      OVER (PARTITION BY l_partkey) AS min_d
         |  FROM lineitem JOIN pf ON l_partkey = p_partkey),
         |m AS (SELECT DISTINCT l_partkey, l_suppkey, min_d
         |  FROM c WHERE price_d = min_d)
         |SELECT m.l_partkey AS p_partkey, pf.p_name, s_name, n_name,
         |  CAST(min_d AS DOUBLE) AS min_price
         |FROM m
         |JOIN pf ON m.l_partkey = pf.p_partkey
         |JOIN supplier ON m.l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |ORDER BY 1, 3""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT
         |  CAST(sum(CAST(l_extendedprice AS $D) * CAST(l_discount AS $D)) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q16_supplier_variety" ->
      """SELECT p_brand, p_type,
        |  count(DISTINCT l_suppkey) AS supplier_cnt, count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size BETWEEN 1 AND 15
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_type LIMIT 25""".stripMargin,

    "q20_bulk_suppliers" ->
      s"""WITH ps AS (
         |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS $D)) AS qty_d
         |  FROM lineitem GROUP BY 1, 2),
         |w AS (SELECT *, sum(qty_d) OVER (PARTITION BY l_partkey) AS tot_d
         |  FROM ps),
         |dom AS (SELECT l_suppkey, count(*) AS n_parts_dominated
         |  FROM w WHERE qty_d * 5 > tot_d GROUP BY 1)
         |SELECT s_suppkey, s_name, n_parts_dominated
         |FROM dom JOIN supplier ON l_suppkey = s_suppkey
         |ORDER BY n_parts_dominated DESC, s_suppkey LIMIT 20""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE)
         |    - 0.6 * CAST(sum(CAST(l_quantity AS $D) * CAST(p_retailprice AS $D)) AS DOUBLE)
         |    AS profit,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q11_important_stock" ->
      s"""WITH base AS (
         |  SELECT l_partkey AS p_partkey,
         |    CAST(l_quantity AS $D) * CAST(p_retailprice AS $D) AS v_d
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey % 10 = 3)),
         |tot AS (SELECT sum(v_d) AS total_d FROM base)
         |SELECT p_partkey, CAST(sum(v_d) AS DOUBLE) AS stock_value,
         |  count(*) AS n_lines
         |FROM base, tot
         |GROUP BY p_partkey, total_d
         |HAVING sum(v_d) * 2000 > total_d
         |ORDER BY stock_value DESC, p_partkey""".stripMargin,

    "q12_priority_shipping" ->
      """SELECT CASE
        |    WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30d'
        |    WHEN date_diff('day', o_orderdate, l_shipdate) <= 60 THEN '31-60d'
        |    ELSE '60d+' END AS delay_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_anomaly" ->
      s"""WITH m AS (SELECT user_id, event_id, event_type, value,
         |    count(*) OVER w AS n,
         |    sum(CAST(value AS $D)) OVER w AS s_d,
         |    sum(CAST(value AS $D) * CAST(value AS $D)) OVER w AS q_d
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id)),
         |z AS (SELECT *,
         |    CAST(CAST(value AS $D) * n - s_d AS DOUBLE)
         |      * sqrt(CAST(n * (n - 1) AS DOUBLE))
         |      / (CAST(n AS DOUBLE) * sqrt(CAST(q_d * n - s_d * s_d AS DOUBLE)))
         |      AS z
         |  FROM m WHERE n >= 10 AND q_d * n - s_d * s_d > 0)
         |SELECT user_id, event_id, event_type, value, z
         |FROM z WHERE abs(z) > 2.0
         |ORDER BY user_id, event_id""".stripMargin,

    "q_above_avg_orders" ->
      s"""WITH pc AS (SELECT o_custkey AS ck,
         |    sum(CAST(o_totalprice AS $D)) AS sum_d, count(*) AS n_ord
         |  FROM orders GROUP BY 1)
         |SELECT c_mktsegment, count(*) AS n_above,
         |  CAST(sum(CAST(o_totalprice AS $D)) AS DOUBLE) AS sum_above
         |FROM orders
         |JOIN pc ON o_custkey = ck
         |JOIN customer ON o_custkey = c_custkey
         |WHERE CAST(o_totalprice AS $D) * n_ord > sum_d
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_dwell_time" ->
      """WITH g AS (SELECT user_id, event_type,
        |    lag(event_type) OVER w AS prev_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT prev_type AS from_type, event_type AS to_type,
        |  count(*) AS n,
        |  CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
        |    AS avg_gap_sec
        |FROM g WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_markov_stationary" -> {
      val S = Analytics.StationaryScale
      def iterCtes(i: Int, prev: String): String =
        s"""c$i AS (SELECT t.to_type AS v,
           |    CAST(sum(CAST(floor(CAST(pr.r AS DOUBLE)
           |      * (CAST(t.n_trans AS DOUBLE) / CAST(o.n_from AS DOUBLE)))
           |      AS BIGINT)) AS BIGINT) AS inflow
           |  FROM t JOIN $prev pr ON pr.v = t.from_type
           |  JOIN outm o ON o.from_type = t.from_type GROUP BY 1),
           |d$i AS (SELECT CAST(coalesce(sum(pr.r), 0) AS BIGINT) AS dang
           |  FROM $prev pr LEFT JOIN outm o ON o.from_type = pr.v
           |  WHERE o.from_type IS NULL),
           |pr$i AS (SELECT p.v,
           |    CAST(floor(0.15 * (CAST($S AS DOUBLE)
           |      / CAST(nn.n AS DOUBLE))) AS BIGINT)
           |    + CAST(floor(0.85 * CAST(coalesce(c$i.inflow, 0)
           |      + CAST(floor(CAST(d$i.dang AS DOUBLE)
           |        / CAST(nn.n AS DOUBLE)) AS BIGINT) AS DOUBLE)) AS BIGINT)
           |    AS r
           |  FROM $prev p LEFT JOIN c$i ON c$i.v = p.v, nn, d$i)""".stripMargin
      val iters = (1 to Analytics.StationaryIters)
        .map(i => iterCtes(i, s"pr${i - 1}")).mkString(",\n")
      s"""WITH g AS (SELECT event_type AS to_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS from_type
         |  FROM events),
         |t AS (SELECT from_type, to_type, count(*) AS n_trans
         |  FROM g WHERE from_type IS NOT NULL GROUP BY 1, 2),
         |outm AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
         |  FROM t GROUP BY 1),
         |pn AS (SELECT DISTINCT v FROM
         |  (SELECT from_type AS v FROM t UNION ALL SELECT to_type FROM t)),
         |nn AS (SELECT count(*) AS n FROM pn),
         |pr0 AS (SELECT v, CAST(floor(CAST($S AS DOUBLE)
         |    / CAST(nn.n AS DOUBLE)) AS BIGINT) AS r FROM pn, nn),
         |$iters
         |SELECT p.v AS event_type, p.r AS pi_fp,
         |  CAST(row_number() OVER (ORDER BY p.r DESC, p.v) AS BIGINT) AS rk
         |FROM pr${Analytics.StationaryIters} p ORDER BY rk""".stripMargin
    },

    "events_markov" ->
      """WITH g AS (SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |t AS (SELECT from_type, to_type, count(*) AS n_trans
        |  FROM g WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |x AS (SELECT *,
        |    sum(n_trans) OVER (PARTITION BY from_type) AS n_from,
        |    sum(n_trans) OVER (PARTITION BY to_type) AS n_to,
        |    sum(n_trans) OVER () AS n_all
        |  FROM t)
        |SELECT from_type, to_type, n_trans,
        |  CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE) AS p_trans,
        |  (CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE)) /
        |    (CAST(n_to AS DOUBLE) / CAST(n_all AS DOUBLE)) AS lift
        |FROM x ORDER BY 1, 2""".stripMargin,

    "events_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |tot AS (SELECT event_type, count(*) AS n_users FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.n_both,
        |  ta.n_users AS n_a, tb.n_users AS n_b,
        |  CAST(p.n_both AS DOUBLE) /
        |    CAST(ta.n_users + tb.n_users - p.n_both AS DOUBLE) AS jaccard
        |FROM p
        |JOIN tot ta ON ta.event_type = p.type_a
        |JOIN tot tb ON tb.event_type = p.type_b
        |ORDER BY 1, 2""".stripMargin,

    "q_window_range_30d" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS spend_30d,
        |  count(*) OVER w AS n_orders_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_skyline" ->
      """SELECT p.p_partkey, CAST(p.p_retailprice AS DOUBLE) AS price,
        |  p.p_size
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part o
        |  WHERE o.p_retailprice <= p.p_retailprice
        |    AND o.p_size >= p.p_size
        |    AND (o.p_retailprice < p.p_retailprice OR o.p_size > p.p_size))
        |ORDER BY 1""".stripMargin,

    "events_rfm" ->
      """WITH pu AS (SELECT user_id, max(ts) AS last_ts, count(*) AS n_ev,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS m_cents
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |h AS (SELECT max(last_ts) AS head_ts FROM pu),
        |b AS (SELECT user_id,
        |    CAST(CAST(h.head_ts AS DATE) - CAST(pu.last_ts AS DATE) AS BIGINT)
        |      AS rec_days,
        |    n_ev, m_cents FROM pu, h),
        |s AS (SELECT user_id,
        |    CAST(ntile(5) OVER (ORDER BY rec_days, user_id) AS BIGINT) AS r_bucket,
        |    CAST(ntile(5) OVER (ORDER BY n_ev, user_id) AS BIGINT) AS f_bucket,
        |    CAST(ntile(5) OVER (ORDER BY m_cents, user_id) AS BIGINT) AS m_bucket
        |  FROM b)
        |SELECT r_bucket, f_bucket, m_bucket, count(*) AS n_users
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "events_props_profile" ->
      """SELECT event_type, k.k AS prop_key, count(*) AS n_present,
        |  count(TRY_CAST(json_extract_string(props, '$.' || k.k) AS BIGINT))
        |    AS n_numeric,
        |  CAST(sum(TRY_CAST(json_extract_string(props, '$.' || k.k)
        |    AS BIGINT)) AS BIGINT) AS sum_value,
        |  CAST(min(TRY_CAST(json_extract_string(props, '$.' || k.k)
        |    AS BIGINT)) AS BIGINT) AS min_value,
        |  CAST(max(TRY_CAST(json_extract_string(props, '$.' || k.k)
        |    AS BIGINT)) AS BIGINT) AS max_value
        |FROM events, unnest(json_keys(props)) k(k)
        |WHERE props IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_funnel_windowed" ->
      """WITH s1 AS (SELECT user_id, min(CASE WHEN event_type = 'signup'
        |      THEN ts END) AS t1
        |  FROM events GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 72 HOUR
        |  GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |    AND e.ts <= s2.t2 + INTERVAL 72 HOUR
        |  GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM events),
        |per AS (SELECT u.user_id, s1.t1, s2.t2, s3.t3,
        |    epoch_us(s3.t3) - epoch_us(s1.t1) AS convert_us
        |  FROM u LEFT JOIN s1 USING (user_id)
        |  LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)),
        |comp AS (SELECT convert_us, row_number() OVER (ORDER BY convert_us,
        |      user_id) AS rn, count(*) OVER () AS n
        |  FROM per WHERE t3 IS NOT NULL)
        |SELECT count(*) AS n_users, count(t1) AS n_signup,
        |  count(t2) AS n_click_within, count(t3) AS n_purchase_within,
        |  (SELECT CAST(max(CASE WHEN rn = (n + 1) // 2 THEN convert_us END)
        |    AS BIGINT) FROM comp) AS median_convert_us
        |FROM per""".stripMargin,

    // CUSUM oracle: same D-scaled integer units, same prefix-sum /
    // running-min identity, same zero-filled global day spine.
    // CMS twin: same seeded portable hash, same d×w matrix, integer
    // min estimate — collisions only ever add; same sketch-ordered
    // top-N cut.
    "events_countmin" -> {
      val d = Analytics.CmsRows
      val w = Analytics.CmsWidth
      val hash = Portable.duckHash(
        "'u#' || CAST(user_id AS VARCHAR) || '#cms#' || CAST(r AS VARCHAR)")
      s"""WITH ev AS (SELECT user_id FROM events),
         |hx AS (SELECT user_id, r, $hash % $w AS cms_col
         |  FROM ev, range($d) t(r)),
         |cnt AS (SELECT r, cms_col, CAST(count(*) AS BIGINT) AS c
         |  FROM hx GROUP BY 1, 2),
         |tt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_true
         |  FROM ev GROUP BY 1),
         |keys AS (SELECT user_id, r, $hash % $w AS cms_col
         |  FROM tt, range($d) t(r)),
         |est AS (SELECT k.user_id,
         |    CAST(min(c.c) AS BIGINT) AS cms_estimate
         |  FROM keys k JOIN cnt c ON c.r = k.r AND c.cms_col = k.cms_col
         |  GROUP BY 1),
         |rk AS (SELECT tt.user_id, tt.n_true, est.cms_estimate,
         |    CAST(row_number() OVER (ORDER BY est.cms_estimate DESC,
         |      tt.user_id) AS BIGINT) AS rk
         |  FROM tt JOIN est ON est.user_id = tt.user_id)
         |SELECT rk, user_id, n_true, cms_estimate,
         |  cms_estimate - n_true AS overestimate
         |FROM rk WHERE rk <= ${Analytics.CmsTopN}
         |ORDER BY rk""".stripMargin
    },

    // Expectations recomputed from the planting rule alone — the
    // engine must SNIFF its way to the same census.
    "multimodal_sniff_mismatch" ->
      s"""WITH k AS (SELECT
         |    CAST(doc_id % 3 AS BIGINT) AS dk,
         |    CAST(CASE WHEN doc_id % 17 = 0 THEN (doc_id + 1) % 3
         |      ELSE doc_id % 3 END AS BIGINT) AS sk
         |  FROM documents),
         |n AS (SELECT
         |    CASE dk WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |      ELSE 'video' END AS declared_kind,
         |    CASE sk WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |      ELSE 'video' END AS sniffed_kind
         |  FROM k)
         |SELECT declared_kind, sniffed_kind,
         |  count(*) AS n_docs,
         |  declared_kind <> sniffed_kind AS mismatch
         |FROM n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same zero-filled day spine as the cusum oracle; Pearson r from
    // the same integer cross-products as corpus_quality_length_corr.
    "events_autocorr" -> {
      val maxLag = operators.Analytics.AutocorrMaxLag
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
         |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         |spine AS (SELECT t.event_type, i.day_idx
         |  FROM (SELECT DISTINCT event_type FROM daily) t,
         |    (SELECT unnest(range(0,
         |      CAST(date_diff('day', d0, d1) AS BIGINT) + 1)) AS day_idx
         |     FROM b) i),
         |dd AS (SELECT d.event_type,
         |    CAST(date_diff('day', b.d0, d.day) AS BIGINT) AS day_idx, d.x
         |  FROM daily d, b),
         |fl AS (SELECT s.event_type, s.day_idx, coalesce(dd.x, 0) AS x
         |  FROM spine s LEFT JOIN dd ON dd.event_type = s.event_type
         |    AND dd.day_idx = s.day_idx),
         |pr AS (SELECT a.event_type, l.lag, a.x, bb.x AS y
         |  FROM fl a
         |  CROSS JOIN (SELECT unnest(range(1, $maxLag + 1)) AS lag) l
         |  JOIN fl bb ON bb.event_type = a.event_type
         |    AND bb.day_idx = a.day_idx + l.lag),
         |st AS (SELECT event_type, lag,
         |    CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM pr GROUP BY 1, 2)
         |SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
         |  CASE WHEN n_pairs * sxx - sx * sx > 0
         |      AND n_pairs * syy - sy * sy > 0
         |    THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
         |        * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
         |    ELSE NULL END AS r
         |FROM st ORDER BY 1, 2""".stripMargin
    },

    "events_cusum" -> {
      val t = operators.Analytics.CusumThreshDiv
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
         |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         |spine AS (SELECT t.event_type, i.day_idx
         |  FROM (SELECT DISTINCT event_type FROM daily) t,
         |    (SELECT unnest(range(0,
         |      CAST(date_diff('day', d0, d1) AS BIGINT) + 1)) AS day_idx
         |     FROM b) i),
         |dd AS (SELECT d.event_type,
         |    CAST(date_diff('day', b.d0, d.day) AS BIGINT) AS day_idx, d.x
         |  FROM daily d, b),
         |fl AS (SELECT s.event_type, s.day_idx, coalesce(dd.x, 0) AS x
         |  FROM spine s LEFT JOIN dd ON dd.event_type = s.event_type
         |    AND dd.day_idx = s.day_idx),
         |tot AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS total,
         |    CAST(count(*) AS BIGINT) AS n_days FROM fl GROUP BY 1),
         |sc AS (SELECT f.event_type, f.day_idx, t.total, t.n_days,
         |    CAST(sum(f.x * t.n_days - t.total) OVER (
         |      PARTITION BY f.event_type ORDER BY f.day_idx) AS BIGINT) AS p
         |  FROM fl f JOIN tot t USING (event_type)),
         |s2 AS (SELECT *, p - least(min(p) OVER (
         |    PARTITION BY event_type ORDER BY day_idx), 0) AS s
         |  FROM sc)
         |SELECT event_type, max(n_days) AS n_days,
         |  max(total) AS total_events,
         |  CAST(count(*) FILTER (WHERE s * $t > total * n_days) AS BIGINT)
         |    AS n_alarm_days,
         |  CAST(coalesce(min(day_idx) FILTER (
         |    WHERE s * $t > total * n_days), -1) AS BIGINT)
         |    AS first_alarm_idx,
         |  CAST(max(s) AS BIGINT) AS max_stat_scaled,
         |  CAST(max(s) AS DOUBLE) / CAST(max(n_days) AS DOUBLE)
         |    AS max_excess_events
         |FROM s2 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "events_anomaly_mad" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY cnt, user_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM c),
        |med AS (SELECT event_type, cnt AS med FROM r1 WHERE rn = (n + 1) // 2),
        |d AS (SELECT c.event_type, c.user_id, c.cnt, m.med,
        |    abs(c.cnt - m.med) AS adev
        |  FROM c JOIN med m USING (event_type)),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY adev, user_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM d),
        |mad AS (SELECT event_type, adev AS mad FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, count(*) AS n_users,
        |  CAST(max(d.med) AS BIGINT) AS median_cnt,
        |  CAST(max(mad.mad) AS BIGINT) AS mad,
        |  CAST(sum(CASE WHEN d.cnt > d.med + 3 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN mad USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_gini" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
        |    ORDER BY cnt, user_id) AS BIGINT) AS rk FROM c)
        |SELECT event_type, count(*) AS n_users,
        |  CAST(sum(cnt) AS BIGINT) AS n_events,
        |  2.0 * CAST(sum(rk * cnt) AS DOUBLE) /
        |    (CAST(count(*) AS DOUBLE) * CAST(sum(cnt) AS DOUBLE)) -
        |    CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS gini
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_rolling_active" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |obs AS (SELECT DISTINCT d AS day FROM du),
        |w AS (SELECT du.d + CAST(t.x AS INTEGER) AS day, du.user_id
        |  FROM du, range(7) t(x))
        |SELECT w.day, count(DISTINCT w.user_id) AS active_7d
        |FROM w JOIN obs ON w.day = obs.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_top_paths" ->
      """WITH s AS (
        |  SELECT event_type,
        |    lag(event_type, 2) OVER w AS e2,
        |    lag(event_type, 1) OVER w AS e1
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT e2 || '>' || e1 || '>' || event_type AS path
        |  FROM s WHERE e2 IS NOT NULL)
        |SELECT path, count(*) AS n
        |FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    // The oracle joins on the raw BETWEEN predicate — DuckDB plans its
    // own IEJoin; the Spark side must produce identical rows through
    // the bucketized equi-join path.
    "events_range_join" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS t_us FROM events),
        |vip AS (SELECT user_id FROM (
        |  SELECT user_id, count(*) AS c FROM ev GROUP BY 1
        |  ORDER BY c DESC, user_id LIMIT 3)),
        |iv AS (SELECT e.user_id AS vip_user, min(t_us) AS lo,
        |    min(t_us) + 7200000000 AS hi
        |  FROM ev e JOIN vip USING (user_id) GROUP BY 1)
        |SELECT vip_user, count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM iv JOIN ev e ON e.t_us >= iv.lo AND e.t_us <= iv.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS $D)) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS $D)) AS DOUBLE) AS sum_base_price,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D)) * (1 + CAST(l_tax AS $D))) AS DOUBLE) AS sum_charge,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= '1998-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
         |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CASE WHEN n_name = 'NATION_3'
         |        THEN CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))
         |        ELSE CAST(0 AS $D) END) AS DOUBLE)
         |    / CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE)
         |    AS mkt_share,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1) t
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, sum(CAST(l_quantity AS $D)) AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING sum(CAST(l_quantity AS $D)) > 200)
         |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         |  CAST(sum_qty AS DOUBLE) AS sum_qty
         |FROM orders
         |JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_top_parts_per_brand" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice, rk FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    CAST(row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rk
        |  FROM part) t
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS $D)) AS DOUBLE) AS total_price
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_cube" ->
      s"""WITH o AS (SELECT o_orderstatus,
         |    CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
         |    o_totalprice FROM orders)
         |SELECT o_orderstatus, o_quarter,
         |  CAST(GROUPING(o_orderstatus, o_quarter) AS BIGINT) AS gid,
         |  count(*) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS $D)) AS DOUBLE) AS total_price
         |FROM o GROUP BY CUBE (o_orderstatus, o_quarter)
         |ORDER BY gid, o_orderstatus NULLS FIRST,
         |  o_quarter NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      s"""WITH o AS (SELECT o_orderstatus, o_orderpriority,
         |    CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
         |    o_totalprice FROM orders)
         |SELECT o_orderstatus, o_orderpriority, o_quarter,
         |  CAST(GROUPING(o_orderstatus, o_orderpriority, o_quarter)
         |    AS BIGINT) AS gid,
         |  count(*) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS $D)) AS DOUBLE) AS total_price
         |FROM o GROUP BY GROUPING SETS (
         |  (o_orderstatus, o_orderpriority),
         |  (o_orderstatus, o_quarter), ())
         |ORDER BY gid, o_orderstatus NULLS FIRST,
         |  o_orderpriority NULLS FIRST, o_quarter NULLS FIRST""".stripMargin,

    "events_sessionize" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events
         |), b AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |    THEN 1 ELSE 0 END AS is_break FROM g
         |), s AS (
         |  SELECT *, CAST(sum(is_break) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM b
         |)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  CAST(sum(CAST(value AS $D)) AS DOUBLE) AS session_value,
         |  min(ts) AS session_start
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_funnel" ->
      """WITH e1 AS (SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1 FROM events),
        |e2 AS (SELECT *,
        |    min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t2 FROM e1),
        |e3 AS (SELECT *,
        |    min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t3 FROM e2),
        |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
        |  FROM e3 GROUP BY 1)
        |SELECT count(*) AS n_users, count(t1) AS n_signup,
        |  count(t2) AS n_click_after, count(t3) AS n_purchase_after
        |FROM u""".stripMargin,

    "q_window_running" ->
      s"""SELECT o_custkey, o_orderkey, o_orderdate,
         |  CAST(row_number() OVER w AS BIGINT) AS order_seq,
         |  CAST(sum(CAST(o_totalprice AS $D)) OVER
         |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
         |  CAST(sum(CAST(o_totalprice AS $D)) OVER w3 AS DOUBLE)
         |    / CAST(count(*) OVER w3 AS DOUBLE) AS moving_avg_3
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         |  w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, order_seq""".stripMargin,

    "events_retention" ->
      """WITH t AS (SELECT user_id, ts,
        |    CAST(min(ts) OVER (PARTITION BY user_id) AS DATE) AS cohort_day
        |  FROM events)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, CAST(ts AS DATE)) // 7 AS BIGINT)
        |    AS offset_w,
        |  count(DISTINCT user_id) AS n_active
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_pivot" -> {
      val cols = Analytics.OrderPriorities.map(p =>
        s"""CAST(sum(CASE WHEN o_orderpriority = '$p' THEN 1 ELSE 0 END) AS BIGINT) AS "$p"""")
        .mkString(",\n  ")
      s"""SELECT o_orderstatus,
         |  $cols
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_median_price" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, max(n) AS n_orders,
        |  (min(o_totalprice) + max(o_totalprice)) / CAST(2 AS DOUBLE) AS median_price
        |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Column profile: per-column stats UNIONed (the oracle may scan
    // six times; the Spark plan is ONE aggregate over one Expand).
    // Timestamp extremes as epoch micros — no string formatting.
    "q_profile_table" ->
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_num,
        |  CAST(max(o_orderkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus), NULL, NULL,
        |  min(o_orderstatus), max(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |  count(DISTINCT o_totalprice),
        |  CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |  count(DISTINCT o_orderdate),
        |  CAST(epoch_us(min(o_orderdate)) AS DOUBLE),
        |  CAST(epoch_us(max(o_orderdate)) AS DOUBLE),
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority), NULL, NULL,
        |  min(o_orderpriority), max(o_orderpriority) FROM orders
        |ORDER BY col_name""".stripMargin,

    "cdc_control_events" ->
      s"""$C, agg AS (
         |  SELECT table_name,
         |    min(ts) AS create_ts,
         |    arg_max(ts, event_id) AS alter_ts,
         |    max(ts) AS drop_ts
         |  FROM c GROUP BY 1)
         |SELECT 'control' AS record_type, x.operation, agg.table_name,
         |  strftime(x.t, '%Y-%m-%dT%H:%M:%S.%fZ') AS ts_utc
         |FROM agg CROSS JOIN LATERAL (VALUES
         |  ('create-table', create_ts),
         |  ('alter-table', alter_ts),
         |  ('drop-table', drop_ts)) AS x(operation, t)
         |ORDER BY table_name, operation""".stripMargin,

    "cdc_envelope_txn" ->
      s"""$C, t AS (
         |  SELECT *,
         |    CAST(dense_rank() OVER (PARTITION BY table_name
         |      ORDER BY date_trunc('minute', ts)) AS BIGINT) AS txn_id,
         |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS bv
         |  FROM c)
         |SELECT op AS operation, table_name, count(*) AS n,
         |  count(DISTINCT txn_id) AS n_txns,
         |  count(CASE WHEN op <> 'insert' THEN bv END) AS n_before
         |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // ONE binding for both KMV rows: the native aggregate computes
    // the identical statistic, so the oracle must stay byte-identical
    // — a single val makes that impossible to desynchronize.
    "cdc_distinct_sketch" -> kmvOracleSql,
    "cdc_distinct_sketch_agg" -> kmvOracleSql,

    "cdc_salted_stats" ->
      s"""$C, s AS (SELECT *,
         |    ${Portable.duckHash("CAST(event_id AS VARCHAR)")} % 8 AS salt FROM c),
         |p AS (SELECT partition_key, salt, count(*) AS pn,
         |    sum(CAST(value AS DECIMAL(18,2))) AS pv
         |  FROM s GROUP BY 1, 2)
         |SELECT partition_key, CAST(sum(pn) AS BIGINT) AS n_events,
         |  CAST(sum(pv) AS DOUBLE) AS total_value,
         |  count(*) AS n_salts_used
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_asof_join" ->
      s"""WITH sg AS (SELECT user_id AS r_user_id, ts AS r_ts, value AS rate
         |  FROM events WHERE event_type = 'signup')
         |SELECT count(*) AS n, count(r_ts) AS n_matched,
         |  CAST(sum(CAST(rate AS DECIMAL(18,2))) AS DOUBLE) AS sum_rate,
         |  count(DISTINCT CASE WHEN r_ts IS NOT NULL THEN user_id END) AS n_users_matched
         |FROM events e ASOF LEFT JOIN sg
         |  ON e.user_id = sg.r_user_id AND e.ts >= sg.r_ts""".stripMargin,

    "cdc_transform_rules" ->
      s"""$C, t AS (SELECT *,
         |  CASE table_name WHEN 'users_1' THEN 'u1'
         |    WHEN 'users_3' THEN 'u3' ELSE table_name END AS tn FROM c)
         |SELECT tn AS table_name, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount,
         |  count(DISTINCT 'graft.' || tn) AS n_origins
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_consume" -> {
      val f = "strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ')"
      s"""$C
         |SELECT partition_key, count(*) AS n_messages,
         |  min($f) AS first_ts, max($f) AS last_ts
         |FROM c WHERE $f >= '$consumeThreshold'
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "cdc_consume_paged" ->
      s"""$C, r AS (SELECT partition_key, ts,
         |    (row_number() OVER (PARTITION BY partition_key
         |      ORDER BY ts, event_id) - 1) // 50 AS page
         |  FROM c),
         |pp AS (SELECT partition_key, page, count(*) AS n_scanned,
         |    count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-15 00:00:00')
         |      AS n_kept,
         |    max(ts) AS page_max_ts
         |  FROM r GROUP BY 1, 2),
         |cum AS (SELECT *, sum(n_kept) OVER (PARTITION BY partition_key
         |    ORDER BY page) AS cum_kept FROM pp),
         |sp AS (SELECT *, min(CASE WHEN cum_kept >= 600 THEN page END)
         |    OVER (PARTITION BY partition_key) AS stop_page FROM cum)
         |SELECT partition_key, count(*) AS n_pages_read,
         |  CAST(sum(n_scanned) AS BIGINT) AS n_records_scanned,
         |  CAST(sum(n_kept) AS BIGINT) AS n_consumed,
         |  count(stop_page) > 0 AS stopped_early,
         |  max(page_max_ts) AS consumed_through_ts
         |FROM sp WHERE stop_page IS NULL OR page <= stop_page
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_consume_records" -> {
      val f = "strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ')"
      s"""$C
         |SELECT partition_key, $f AS event_ts, op AS operation,
         |  table_name, event_id, user_id, value
         |FROM c WHERE $f >= '$consumeThreshold'
         |ORDER BY partition_key, event_id""".stripMargin
    },

    // The (task, table) row set is derived from the SAME mappings and
    // catalog the query uses (like cdc_full_load), so editing the demo
    // tasks cannot desynchronize the oracle.
    "cdc_task_statistics" -> {
      val rows = taskDemoTasks.flatMap { case (id, m) =>
        m.selectTables(taskDemoCatalog).map { case (sch, t) =>
          s"('$id', '$sch', '$t')"
        }
      }
      s"""$C, per AS (SELECT schema_name, table_name,
         |    CAST(sum(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS inserts,
         |    CAST(sum(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS updates,
         |    CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS deletes,
         |    CAST(sum(CASE WHEN op IN ('create-table','drop-table','alter-table')
         |      THEN 1 ELSE 0 END) AS BIGINT) AS ddls,
         |    CAST(sum(CASE WHEN op = 'load' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS full_load_rows,
         |    count(*) AS total
         |  FROM c GROUP BY 1, 2),
         |tt AS (SELECT * FROM (VALUES ${rows.mkString(", ")})
         |  AS v(task_id, schema_name, table_name))
         |SELECT tt.task_id, tt.schema_name, tt.table_name,
         |  CAST(coalesce(per.inserts, 0) AS BIGINT) AS inserts,
         |  CAST(coalesce(per.updates, 0) AS BIGINT) AS updates,
         |  CAST(coalesce(per.deletes, 0) AS BIGINT) AS deletes,
         |  CAST(coalesce(per.ddls, 0) AS BIGINT) AS ddls,
         |  CAST(coalesce(per.full_load_rows, 0) AS BIGINT) AS full_load_rows,
         |  CAST(coalesce(per.total, 0) AS BIGINT) AS total
         |FROM tt LEFT JOIN per USING (schema_name, table_name)
         |ORDER BY 1, 2, 3""".stripMargin
    },

    "cdc_partition_key_txn" ->
      s"""$C, t AS (SELECT *,
         |    CAST(dense_rank() OVER (PARTITION BY table_name
         |      ORDER BY date_trunc('minute', ts)) AS BIGINT) * 4
         |      + user_id % 4 AS gtxn
         |  FROM c),
         |u AS (
         |  SELECT 'schema-table' AS kt, partition_key AS k FROM t
         |  UNION ALL
         |  -- mirror Envelope.partitionKey's null-txn fallback to the
         |  -- schema-table key (control/DDL rows must never key null)
         |  SELECT 'transaction-id',
         |    coalesce(CAST(gtxn AS VARCHAR), partition_key) FROM t)
         |SELECT ${Portable.duckHash("k")} % 8 AS shard,
         |  CAST(count(*) FILTER (WHERE kt = 'schema-table') AS BIGINT)
         |    AS n_schema_table,
         |  CAST(count(DISTINCT k) FILTER (WHERE kt = 'schema-table')
         |    AS BIGINT) AS n_keys_schema_table,
         |  CAST(count(*) FILTER (WHERE kt = 'transaction-id') AS BIGINT)
         |    AS n_txn,
         |  CAST(count(DISTINCT k) FILTER (WHERE kt = 'transaction-id')
         |    AS BIGINT) AS n_keys_txn
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_envelope_types" ->
      s"""SELECT count(*) AS n,
         |  CAST(sum(p_partkey % 128) AS BIGINT) AS sum_tiny,
         |  CAST(sum(p_partkey % 128 + 128) AS BIGINT) AS sum_utiny,
         |  CAST(sum(p_partkey % 32768 + 32768) AS BIGINT) AS sum_usmall,
         |  CAST(sum(p_partkey + 2147483648) AS BIGINT) AS sum_uint,
         |  count(*) AS n_unsigned_ok,
         |  CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_dec,
         |  CAST(sum(CASE WHEN p_partkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flag,
         |  count(DISTINCT p_brand) AS n_enum,
         |  CAST(sum(length(p_name)) AS BIGINT) AS sum_txt_len,
         |  count(*) AS n_blob_ok,
         |  count(*) AS n_ts_ok,
         |  count(*) AS n_d_ok,
         |  count(*) AS n_f32_ok,
         |  count(*) AS n_f64_ok,
         |  count(*) AS n_dec_ok
         |FROM part""".stripMargin,

    // --- §2C LLM-data-pipeline oracles ----------------------------

    "text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct($toksT)) AS BIGINT) AS n_distinct_tokens,
         |  CAST(len(regexp_extract_all($normT, '${TextAnalysis.SubtokenPattern}')) AS BIGINT)
         |    AS n_subtokens,
         |  CASE WHEN len($toksT) > 0 THEN
         |    CAST(list_sum(list_transform($toksT, x -> length(x))) AS DOUBLE)
         |      / CAST(len($toksT) AS DOUBLE) ELSE 0.0 END AS avg_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" -> {
      val (h1, _) = Portable.duckHashPair("shingle")
      s"""WITH shf AS (${Dedup.duckShingles}),
         |r AS (SELECT doc_id, min($h1) AS fp_roll FROM shf GROUP BY 1)
         |SELECT d.doc_id, md5($normT) AS fp,
         |  ${Portable.duckHash(normT)} AS fp60, r.fp_roll
         |FROM documents d LEFT JOIN r ON r.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "text_quality" -> {
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH s AS (SELECT doc_id,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |  CAST(list_sum(list_transform($toksT, x -> length(x))) AS BIGINT) AS sum_len
         |FROM documents)
         |SELECT doc_id, n_tokens,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(stop_cnt AS DOUBLE) / $nTok ELSE 0.0 END AS stop_ratio,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(sum_len AS DOUBLE) / $nTok ELSE 0.0 END AS avg_token_len,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         |    CAST(0.4 AS DOUBLE) * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |    + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |    + CAST(0.3 AS DOUBLE) * least((CAST(sum_len AS DOUBLE) / $nTok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |    END AS quality_score
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "text_ascii_profile" ->
      s"""WITH d AS (SELECT source, CAST(length(text) AS BIGINT) AS chars,
         |    CAST(strlen(text) AS BIGINT) AS bytes FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(chars) AS BIGINT) AS n_chars,
         |  CAST(sum(bytes) AS BIGINT) AS n_bytes,
         |  CAST(sum(CASE WHEN bytes > chars THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_multibyte_docs,
         |  CAST(sum(bytes) AS BIGINT) - CAST(sum(chars) AS BIGINT)
         |    AS multibyte_excess,
         |  CAST(CAST(sum(bytes) AS BIGINT) - CAST(sum(chars) AS BIGINT)
         |      AS DOUBLE)
         |    / CAST(CAST(sum(chars) AS BIGINT) AS DOUBLE) AS excess_share
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_langid" -> {
      val scores = TextAnalysis.markers
        .map { case (l, ws) => s"${markerCountSql(ws)} AS score_$l" }
        .mkString(",\n  ")
      val outCols = TextAnalysis.markers.map { case (l, _) => s"score_$l" }
        .mkString(", ")
      s"""WITH s AS (SELECT doc_id, lang,
         |  $scores
         |FROM documents)
         |SELECT doc_id, lang, $langPredSql AS pred_lang, $outCols
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "text_langid_eval" -> {
      val scores = TextAnalysis.markers
        .map { case (l, ws) => s"${markerCountSql(ws)} AS score_$l" }
        .mkString(",\n  ")
      s"""WITH s AS (SELECT doc_id, lang,
         |  $scores
         |FROM documents),
         |p AS (SELECT lang, $langPredSql AS pred_lang FROM s),
         |m AS (SELECT lang, pred_lang, count(*) AS n_docs
         |  FROM p GROUP BY 1, 2)
         |SELECT lang, pred_lang, n_docs,
         |  CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
         |  CAST(n_docs AS DOUBLE) /
         |    CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE) AS share,
         |  lang = pred_lang AS is_correct
         |FROM m ORDER BY 1, 2""".stripMargin
    },

    "text_term_stats" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksT) AS tok FROM documents)
         |SELECT tok, count(DISTINCT doc_id) AS doc_freq,
         |  count(*) AS term_freq
         |FROM toks GROUP BY 1
         |ORDER BY doc_freq DESC, term_freq DESC, tok""".stripMargin,

    "text_lang_consistency" -> {
      val scores = TextAnalysis.markers.map { case (l, ws) =>
        s"${markerCountSqlOn("t", ws)} AS sf_$l,\n  " +
          s"${markerCountSqlOn("h1", ws)} AS s1_$l,\n  " +
          s"${markerCountSqlOn("h2", ws)} AS s2_$l"
      }.mkString(",\n  ")
      s"""WITH tk AS (SELECT doc_id, lang, $toksT AS t FROM documents),
         |hs AS (SELECT doc_id, lang, t,
         |    t[1:(len(t) // 2)] AS h1,
         |    t[(len(t) // 2 + 1):len(t)] AS h2
         |  FROM tk),
         |sc AS (SELECT doc_id, lang,
         |  $scores
         |FROM hs),
         |p AS (SELECT doc_id, lang,
         |    ${langPredSqlOn("sf")} AS pred_full,
         |    ${langPredSqlOn("s1")} AS pred_h1,
         |    ${langPredSqlOn("s2")} AS pred_h2
         |  FROM sc)
         |SELECT doc_id, lang, pred_full, pred_h1, pred_h2,
         |  CASE WHEN pred_h1 <> 'und' AND pred_h2 <> 'und'
         |      AND pred_h1 <> pred_h2 THEN 'mixed'
         |    WHEN pred_full <> 'und'
         |      AND (pred_h1 = 'und' OR pred_h2 = 'und') THEN 'thin'
         |    ELSE 'consistent' END AS verdict
         |FROM p ORDER BY doc_id""".stripMargin
    },

    "corpus_dsir_select" -> {
      val cut = "(grp_total * 20 + 99) // 100"
      s"""WITH toks AS (SELECT doc_id, source, unnest($toksT) AS tok
         |  FROM documents),
         |b AS (SELECT doc_id, source,
         |    ${Portable.duckHash("tok")} % 256 AS bucket FROM toks),
         |ct AS (SELECT bucket,
         |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS ct_t,
         |    CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS ct_r
         |  FROM b GROUP BY 1),
         |sc AS (SELECT doc_id, source, count(*) AS n_tokens,
         |    CAST(sum((length(bin(ct_t + 1)) - 1)
         |      - (length(bin(ct_r + 1)) - 1)) AS BIGINT) AS logw_int
         |  FROM b JOIN ct USING (bucket)
         |  WHERE source <> 'src0' GROUP BY 1, 2),
         |r AS (SELECT *,
         |    CAST(row_number() OVER (ORDER BY
         |      CAST(logw_int AS DOUBLE) / CAST(n_tokens AS DOUBLE) DESC,
         |      doc_id) AS BIGINT) AS rank,
         |    count(*) OVER () AS grp_total
         |  FROM sc)
         |SELECT source, count(*) AS n_docs,
         |  CAST(count(*) FILTER (WHERE rank <= $cut) AS BIGINT)
         |    AS n_selected,
         |  CAST(coalesce(sum(n_tokens) FILTER (WHERE rank <= $cut), 0)
         |    AS BIGINT) AS selected_tokens,
         |  CAST(sum(logw_int) AS BIGINT) AS sum_logw_int,
         |  CAST(coalesce(sum(logw_int) FILTER (WHERE rank <= $cut), 0)
         |    AS BIGINT) AS selected_logw_int,
         |  CAST(count(*) FILTER (WHERE rank <= $cut) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS selected_share
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "text_topk_terms" ->
      s"""WITH toks AS (SELECT source AS group_key, unnest($toksT) AS tok
         |  FROM documents),
         |tf AS (SELECT group_key, tok, count(*) AS term_freq
         |  FROM toks GROUP BY 1, 2),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY group_key
         |    ORDER BY term_freq DESC, tok) AS BIGINT) AS rk FROM tf)
         |SELECT group_key, tok, term_freq, rk FROM r
         |WHERE rk <= 10 ORDER BY group_key, rk""".stripMargin,

    "corpus_quality_length_corr" -> {
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH s AS (SELECT doc_id, source,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |  CAST(list_sum(list_transform($toksT, x -> length(x))) AS BIGINT) AS sum_len
         |FROM documents),
         |g AS (SELECT source, n_tokens AS x,
         |  CAST(floor((CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         |    CAST(0.4 AS DOUBLE) * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |    + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |    + CAST(0.3 AS DOUBLE) * least((CAST(sum_len AS DOUBLE) / $nTok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |    END) * CAST(1000 AS DOUBLE)) AS BIGINT) AS y
         |FROM s),
         |m AS (SELECT source, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM g GROUP BY 1)
         |SELECT source, n, sx AS sum_tokens, sy AS sum_quality_pm,
         |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         |    CAST(n * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |  ELSE NULL END AS r
         |FROM m ORDER BY source""".stripMargin
    },

    "text_char_lm" ->
      s"""WITH base AS (SELECT doc_id,
         |    ${Portable.duckNormText("text")} AS t FROM documents),
         |bi AS (SELECT doc_id, unnest(CASE WHEN length(t) > 1
         |    THEN list_transform(range(1, length(t)),
         |      i -> substr(t, CAST(i AS INTEGER), 2))
         |    ELSE [] END) AS bg FROM base),
         |un AS (SELECT doc_id, unnest(CASE WHEN length(t) > 0
         |    THEN list_transform(range(1, length(t) + 1),
         |      i -> substr(t, CAST(i AS INTEGER), 1))
         |    ELSE [] END) AS c FROM base),
         |uf AS (SELECT c, count(*) AS uf FROM un GROUP BY 1),
         |bfr AS (SELECT bg, count(*) AS bf FROM bi GROUP BY 1),
         |bf AS (SELECT b.bg, b.bf,
         |    CAST(length(bin(u.uf // b.bf)) - 1 AS BIGINT) AS surprise
         |  FROM bfr b JOIN uf u ON u.c = substr(b.bg, 1, 1)),
         |scs AS (SELECT bi.doc_id, count(*) AS n_bigrams,
         |    CAST(sum(CASE WHEN bf.bf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_novel,
         |    CAST(sum(bf.surprise) AS BIGINT) AS sum_surprise
         |  FROM bi JOIN bf ON bf.bg = bi.bg GROUP BY 1)
         |SELECT b.doc_id, coalesce(scs.n_bigrams, 0) AS n_bigrams,
         |  coalesce(scs.n_novel, 0) AS n_novel,
         |  coalesce(scs.sum_surprise, 0) AS sum_surprise,
         |  CAST(coalesce(scs.sum_surprise, 0) AS DOUBLE)
         |    / CAST(nullif(coalesce(scs.n_bigrams, 0), 0) AS DOUBLE)
         |    AS avg_surprise
         |FROM base b LEFT JOIN scs ON scs.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    "text_keyphrase_bigrams" ->
      s"""WITH toksrc AS (SELECT doc_id, source, $toksT AS toks
         |  FROM documents),
         |bi AS (SELECT doc_id, source, unnest(CASE WHEN len(toks) > 1
         |    THEN list_transform(range(1, len(toks)),
         |      i -> toks[CAST(i AS INTEGER)] || ' '
         |        || toks[CAST(i + 1 AS INTEGER)])
         |    ELSE [] END) AS bg FROM toksrc),
         |dfr AS (SELECT bg, count(DISTINCT doc_id) AS df FROM bi
         |  GROUP BY 1),
         |tf AS (SELECT source, bg, count(*) AS tf FROM bi GROUP BY 1, 2),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (SELECT tf.source, tf.bg, tf.tf, dfr.df,
         |    CAST(length(bin(nd.n_docs // dfr.df)) - 1 AS BIGINT) AS idf
         |  FROM tf JOIN dfr ON dfr.bg = tf.bg, nd),
         |r AS (SELECT source, bg, tf, df, tf * idf AS score,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY tf * idf DESC, bg) AS BIGINT) AS rk FROM sc)
         |SELECT source, bg AS keyphrase, tf, df, score, rk
         |FROM r WHERE rk <= ${TextAnalysis.KeyphraseK}
         |ORDER BY source, rk""".stripMargin,

    "text_burstiness" ->
      s"""WITH toks AS (SELECT source, doc_id, unnest($toksT) AS tok
         |  FROM documents),
         |pd AS (SELECT source, tok, doc_id, count(*) AS c
         |  FROM toks GROUP BY 1, 2, 3),
         |pt AS (SELECT source, tok, count(*) AS df,
         |    CAST(sum(c) AS BIGINT) AS sx,
         |    CAST(sum(c * c) AS BIGINT) AS sx2
         |  FROM pd GROUP BY 1, 2),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY df DESC, sx DESC, tok) AS BIGINT) AS rk FROM pt)
         |SELECT source, tok, df, sx AS total_tf,
         |  CAST(df * sx2 - sx * sx AS DOUBLE)
         |    / CAST(df * sx AS DOUBLE) AS vmr, rk
         |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin,

    "text_zipf_octaves" ->
      s"""WITH toks AS (SELECT source, unnest($toksT) AS tok FROM documents),
         |tf AS (SELECT source, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |r AS (SELECT source, tf,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY tf DESC, tok) AS BIGINT) AS rank FROM tf),
         |oct AS (SELECT source,
         |    CAST(length(bin(rank)) - 1 AS BIGINT) AS octave,
         |    count(*) AS n_terms, CAST(sum(tf) AS BIGINT) AS mass
         |  FROM r GROUP BY 1, 2)
         |SELECT source, octave, n_terms, mass,
         |  CAST(mass AS DOUBLE) / CAST(lag(mass, 1) OVER (
         |    PARTITION BY source ORDER BY octave) AS DOUBLE) AS decay
         |FROM oct ORDER BY source, octave""".stripMargin,

    "text_tfidf_topk" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksT) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfr AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |flat AS (SELECT tf.doc_id,
         |    ${Portable.duckHash("tok")} % ${TextAnalysis.TfidfDim} AS i,
         |    CAST(sum(tf.tf * length(bin(n_docs // dfr.df)))
         |      AS BIGINT) AS v
         |  FROM tf JOIN dfr USING (tok), n GROUP BY 1, 2),
         |norms AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
         |  FROM flat GROUP BY 1),
         |d AS (SELECT pf.doc_id AS probe_id, f.doc_id AS neighbor_id,
         |    CAST(sum(pf.v * f.v) AS BIGINT) AS dot
         |  FROM flat pf
         |  JOIN flat f ON f.i = pf.i AND f.doc_id <> pf.doc_id
         |  WHERE pf.doc_id < ${TextAnalysis.TfidfProbes}
         |  GROUP BY 1, 2),
         |scored AS (SELECT d.probe_id, d.neighbor_id,
         |    ${graft.ml.Vectors.duckCosine("d.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.doc_id = d.probe_id
         |  JOIN norms nb ON nb.doc_id = d.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk FROM scored)
         |SELECT probe_id, neighbor_id, cos_sim, rk FROM r
         |WHERE rk <= ${TextAnalysis.TfidfTopK} ORDER BY probe_id, rk""".stripMargin,

    "text_term_drift" ->
      s"""WITH b AS (SELECT (min(doc_id) + max(doc_id)) // 2 AS mid
         |  FROM documents),
         |t AS (SELECT CASE WHEN d.doc_id <= b.mid THEN 0 ELSE 1 END AS epoch,
         |    unnest($toksT) AS tok
         |  FROM documents d, b),
         |tc AS (SELECT tok,
         |    CAST(sum(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         |    CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
         |  FROM t GROUP BY 1),
         |n AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
         |    CAST(sum(c1) AS BIGINT) AS n1 FROM tc)
         |SELECT tok, c0, c1,
         |  CAST(abs(c0 * n.n1 - c1 * n.n0) AS BIGINT) AS drift
         |FROM tc, n
         |ORDER BY drift DESC, tok LIMIT 20""".stripMargin,

    "text_bpe_train" ->
      TextAnalysis.duckBpeTrain("text", "documents", 8),

    "text_bpe_encode" ->
      TextAnalysis.duckBpeEncode("text", "documents", 8),

    "text_bpe_compression" ->
      TextAnalysis.duckBpeCompression("text", "documents", 8),

    "text_bpe_fertility" -> {
      val scores = TextAnalysis.markers
        .map { case (l, ws) => s"${markerCountSql(ws)} AS score_$l" }
        .mkString(",\n  ")
      TextAnalysis.duckBpeFertility("text", "documents", 8,
        s"""SELECT doc_id, $langPredSql AS pred_lang FROM (
           |  SELECT doc_id, $scores FROM documents)""".stripMargin)
    },

    "text_bpe_pairs" ->
      s"""WITH toks AS (SELECT unnest($toksT) AS tok FROM documents),
         |tc AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY 1),
         |p AS (SELECT tok, n_tok,
         |    substring(tok, CAST(i AS INTEGER), 2) AS pair
         |  FROM tc, unnest(range(1, length(tok))) t(i)
         |  WHERE length(tok) >= 2)
         |SELECT pair, CAST(sum(n_tok) AS BIGINT) AS pair_count,
         |  count(DISTINCT tok) AS n_token_types
         |FROM p GROUP BY 1
         |ORDER BY pair_count DESC, pair LIMIT 50""".stripMargin,

    "text_hapax" ->
      s"""WITH toks AS (SELECT source, unnest($toksT) AS tok FROM documents),
         |tc AS (SELECT source, tok, count(*) AS cnt FROM toks GROUP BY 1, 2)
         |SELECT source, count(*) AS n_terms,
         |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
         |    CAST(count(*) AS DOUBLE) AS hapax_share
         |FROM tc GROUP BY 1 ORDER BY 1""".stripMargin,

    // RAW text (normalization would strip the symbols); DuckDB's
    // len(regexp_extract_all) == Spark's regexp_count on the
    // metacharacter-free classes.
    "text_code_detect" ->
      s"""SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.CodeSymbolPattern}')) AS BIGINT) AS n_symbols,
         |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
         |    AS n_digits,
         |  CASE WHEN length(text) > 0
         |    THEN CAST(len(regexp_extract_all(text,
         |      '${TextAnalysis.CodeSymbolPattern}')) AS DOUBLE)
         |      / CAST(length(text) AS DOUBLE) END AS symbol_share,
         |  CASE WHEN length(text) > 0
         |    THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
         |      / CAST(length(text) AS DOUBLE) END AS digit_share,
         |  length(text) > 0 AND 20 * len(regexp_extract_all(text,
         |    '${TextAnalysis.CodeSymbolPattern}')) >= length(text)
         |    AS is_code
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Window cumsum over the (tf desc, tok) total order; the
    // power-of-two gate is the branchless rank & (rank-1) = 0 test.
    "text_vocab_coverage" ->
      s"""WITH toks AS (SELECT unnest($toksT) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
         |r AS (SELECT tok, tf,
         |    row_number() OVER (ORDER BY tf DESC, tok) AS rank,
         |    sum(tf) OVER (ORDER BY tf DESC, tok
         |      ROWS UNBOUNDED PRECEDING) AS covered,
         |    count(*) OVER () AS n_vocab,
         |    sum(tf) OVER () AS total FROM tf)
         |SELECT CAST(rank AS BIGINT) AS vocab_size, tok,
         |  CAST(tf AS BIGINT) AS tf,
         |  CAST(covered AS BIGINT) AS covered_tokens,
         |  CAST(total AS BIGINT) AS total_tokens,
         |  CAST(covered AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
         |FROM r WHERE (rank & (rank - 1)) = 0 OR rank = n_vocab
         |ORDER BY vocab_size""".stripMargin,

    // text_perplexity_filter's exact-integer LM score + text_langid's
    // marker argmax, then SQL NTILE(3) per language — the Spark side
    // cuts with Ranks.ntileExpr, spec-pinned NTILE-parity.
    "corpus_ccnet_buckets" -> {
      val scores = TextAnalysis.markers
        .map { case (l, ws) => s"${markerCountSql(ws)} AS score_$l" }
        .mkString(",\n  ")
      s"""WITH toks AS (SELECT doc_id, unnest($toksT) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
         |sc AS (SELECT doc_id, count(*) AS n_tokens,
         |    CAST(sum(length(bin(tf)) - 1) AS BIGINT) AS sum_log2_tf
         |  FROM toks JOIN tf USING (tok) GROUP BY doc_id),
         |lm AS (SELECT d.doc_id,
         |    COALESCE(sc.n_tokens, 0) AS n_tokens,
         |    COALESCE(CAST(sc.sum_log2_tf AS DOUBLE)
         |        / CAST(sc.n_tokens AS DOUBLE),
         |      CAST(-1.0 AS DOUBLE)) AS score
         |  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
         |s AS (SELECT doc_id,
         |  $scores
         |FROM documents),
         |p AS (SELECT doc_id, $langPredSql AS pred_lang FROM s),
         |r AS (SELECT lm.n_tokens, lm.score, p.pred_lang,
         |    ntile(3) OVER (PARTITION BY p.pred_lang
         |      ORDER BY lm.score DESC, lm.doc_id) AS bucket
         |  FROM lm JOIN p ON p.doc_id = lm.doc_id)
         |SELECT pred_lang, CAST(bucket AS BIGINT) AS bucket,
         |  CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |    ELSE 'tail' END AS bucket_name,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  min(score) AS min_score, max(score) AS max_score
         |FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin
    },

    "dedup_exact" ->
      s"""SELECT md5($normT) AS fp, count(*) AS n_docs,
         |  min(doc_id) AS canonical_id
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_lsh_calibration" -> {
      val nMatch = (0 until Dedup.NumHashes)
        .map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashCtes,
         |shd AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |sz AS (SELECT doc_id, count(*) AS set_size FROM shd GROUP BY 1),
         |iv AS (SELECT c.d1, c.d2, count(*) AS n_inter
         |  FROM cand c
         |  JOIN shd a ON a.doc_id = c.d1
         |  JOIN shd b ON b.doc_id = c.d2 AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |nm AS (SELECT c.d1, c.d2, CAST($nMatch AS BIGINT) AS n_match
         |  FROM cand c
         |  JOIN sigs sa ON sa.doc_id = c.d1
         |  JOIN sigs sb ON sb.doc_id = c.d2),
         |p AS (SELECT nm.n_match, iv.n_inter,
         |    za.set_size AS size_a, zb.set_size AS size_b
         |  FROM iv
         |  JOIN nm ON nm.d1 = iv.d1 AND nm.d2 = iv.d2
         |  JOIN sz za ON za.doc_id = iv.d1
         |  JOIN sz zb ON zb.doc_id = iv.d2)
         |SELECT n_match,
         |  CAST(n_match AS DOUBLE) / ${Dedup.NumHashes}.0 AS est_jaccard,
         |  count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN n_inter * 3 >= size_a + size_b
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
         |  CAST(sum(CASE WHEN n_inter * 3 >= size_a + size_b
         |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS precision
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "dedup_simhash_pairs" -> {
      val (h1, h2) = Portable.duckHashPair("(tok || '#201')")
      val cols = (0 until Dedup.WideBits).map { b =>
        val (src, bit) = if (b < 30) ("h1", b) else ("h2", b - 30)
        s"sum(CASE WHEN ($src >> $bit) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
      }.mkString(", ")
      val sig = (0 until Dedup.WideBits)
        .map(b => s"(CASE WHEN s$b >= 0 THEN (1::BIGINT << $b) ELSE 0 END)")
        .mkString(" + ")
      val mask = (1L << Dedup.WideBandBits) - 1
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksT) AS tok FROM documents),
         |hs AS (SELECT doc_id, $h1 AS h1, $h2 AS h2 FROM toks),
         |bitsum AS (SELECT doc_id, $cols FROM hs GROUP BY 1),
         |sigs AS (SELECT doc_id, $sig AS sig FROM bitsum),
         |bands AS (SELECT doc_id, b,
         |    (sig >> (b * ${Dedup.WideBandBits})) & $mask AS bv
         |  FROM sigs, range(${Dedup.WideBands}) t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM bands a JOIN bands b
         |  ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT doc_id_a, doc_id_b,
         |  CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
         |FROM cand
         |JOIN sigs sa ON sa.doc_id = doc_id_a
         |JOIN sigs sb ON sb.doc_id = doc_id_b
         |WHERE bit_count(xor(sa.sig, sb.sig)) <= ${Dedup.MaxHamming}
         |ORDER BY 1, 2""".stripMargin
    },

    "dedup_incremental" ->
      s"""WITH fp AS (SELECT doc_id, source, md5($normT) AS fp FROM documents),
         |snap AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
         |batch AS (SELECT f.source, (s.fp IS NOT NULL) AS in_snap,
         |    row_number() OVER (PARTITION BY f.fp ORDER BY f.doc_id) AS rn
         |  FROM fp f LEFT JOIN snap s ON f.fp = s.fp
         |  WHERE f.doc_id % 2 = 1)
         |SELECT source, count(*) AS n_batch,
         |  CAST(sum(CASE WHEN in_snap THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_vs_snapshot,
         |  CAST(sum(CASE WHEN NOT in_snap AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_within_batch,
         |  CAST(sum(CASE WHEN NOT in_snap AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new_unique
         |FROM batch GROUP BY 1 ORDER BY 1""".stripMargin,

    "sim_pairs_threshold" ->
      s"""WITH $embCtes,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |d AS (SELECT la.label AS label, a.vec_id AS vec_id_a,
         |    b.vec_id AS vec_id_b, CAST(sum(a.v * b.v) AS BIGINT) AS dot
         |  FROM flat a
         |  JOIN lab la ON la.vec_id = a.vec_id
         |  JOIN lab lb ON lb.label = la.label AND lb.vec_id > la.vec_id
         |  JOIN flat b ON b.vec_id = lb.vec_id AND b.i = a.i
         |  GROUP BY 1, 2, 3),
         |scored AS (SELECT d.label, vec_id_a, vec_id_b,
         |    ${Vectors.duckCosine("d.dot", "na.n2", "nb.n2")} AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.vec_id = vec_id_a AND na.n2 > 0
         |  JOIN norms nb ON nb.vec_id = vec_id_b AND nb.n2 > 0)
         |SELECT label, vec_id_a, vec_id_b, cos_sim FROM scored
         |WHERE cos_sim >= ${Similarity.PairTau}
         |ORDER BY 1, 2, 3""".stripMargin,

    "embed_quantize" ->
      s"""WITH q AS (SELECT vec_id, label,
         |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
         |s AS (SELECT vec_id, label, q,
         |    greatest(list_aggregate(list_transform(q, x -> abs(x)), 'max'), 1) AS m,
         |    CAST(list_aggregate(list_transform(q, x -> x*x), 'sum') AS BIGINT) AS n2
         |  FROM q),
         |e AS (SELECT label, m, n2,
         |    CAST(list_aggregate(list_transform(
         |      list_zip(q, list_transform(q,
         |        x -> CAST(round(CAST(x * 127 AS DOUBLE) / m) AS BIGINT))),
         |      t -> (t[1]*127 - t[2]*m) * (t[1]*127 - t[2]*m)), 'sum') AS BIGINT)
         |      AS err_num
         |  FROM s)
         |SELECT label, count(*) AS n_vecs,
         |  CASE WHEN sum(127 * 127 * n2) > 0 THEN
         |    CAST(sum(err_num) AS DOUBLE) * 1000000.0
         |      / CAST(sum(127 * 127 * n2) AS DOUBLE) ELSE 0.0 END AS err_ppm,
         |  CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_scale
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // Norm profile: same quantized-int norms; the rms is the one
    // double op (sqrt of exact-sum / count) per label.
    "embed_norm_profile" ->
      s"""WITH q AS (SELECT label,
         |    CAST(len(embedding) AS BIGINT) AS dim,
         |    CAST(list_aggregate(list_transform(
         |      ${Vectors.duckQuantize("embedding")}, x -> x*x), 'sum') AS BIGINT)
         |      AS n2
         |  FROM embeddings)
         |SELECT label, count(*) AS n_vecs,
         |  min(dim) AS dim_lo, max(dim) AS dim_hi,
         |  CAST(count(*) FILTER (WHERE n2 = 0) AS BIGINT) AS n_zero,
         |  min(n2) AS min_n2, max(n2) AS max_n2,
         |  sqrt(CAST(sum(n2) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS rms_norm
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_blocklist" ->
      s"""WITH b AS (SELECT source, n_chars,
         |    list_has_any($toksT, ['dup', 'slow']) AS blocked
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
         |  CAST(sum(CASE WHEN blocked THEN n_chars ELSE 0 END) AS BIGINT)
         |    AS blocked_chars
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_split" ->
      s"""WITH h AS (SELECT source, n_chars, doc_id,
         |    ${Portable.duckHash(
                "(source || '#' || CAST(doc_id AS VARCHAR) || '#split')")} % 1000
         |      AS hb
         |  FROM documents)
         |SELECT source,
         |  CASE WHEN hb IS NULL THEN NULL
         |    WHEN hb < 800 THEN 'train' WHEN hb < 900 THEN 'val'
         |    ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  min(doc_id) AS min_doc
         |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "dedup_minhash" -> {
      val nMatch = (0 until Dedup.NumHashes)
        .map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashCtes
         |SELECT c.d1 AS doc_id_a, c.d2 AS doc_id_b,
         |  CAST($nMatch AS BIGINT) AS n_match,
         |  CAST($nMatch AS DOUBLE) / CAST(${Dedup.NumHashes} AS DOUBLE) AS est_jaccard
         |FROM cand c
         |JOIN sigs sa ON sa.doc_id = c.d1
         |JOIN sigs sb ON sb.doc_id = c.d2
         |ORDER BY 1, 2""".stripMargin
    },

    // Incremental-ingest oracle: batch-side band probe against the
    // full index, agreement fold on the same signature CTEs.
    "dedup_minhash_incremental" -> {
      val nMatch = (0 until Dedup.NumHashes)
        .map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashCtes,
         |nb AS (SELECT doc_id AS a, band, bh FROM bands
         |  WHERE doc_id % 2 = 1),
         |ab AS (SELECT doc_id AS b, band, bh FROM bands),
         |cd AS (SELECT DISTINCT nb.a, ab.b FROM nb
         |  JOIN ab ON nb.band = ab.band AND nb.bh = ab.bh
         |    AND nb.a <> ab.b),
         |sc AS (SELECT cd.a, cd.b, (cd.b % 2 = 0) AS vs_snap,
         |    ($nMatch) >= ${Dedup.NearDupMatches} AS neardup
         |  FROM cd
         |  JOIN sigs sa ON sa.doc_id = cd.a
         |  JOIN sigs sb ON sb.doc_id = cd.b),
         |pd AS (SELECT a,
         |    CAST(sum(CASE WHEN vs_snap THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cand_snap,
         |    CAST(sum(CASE WHEN NOT vs_snap THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cand_batch,
         |    CAST(max(CASE WHEN vs_snap AND neardup THEN 1 ELSE 0 END)
         |      AS BIGINT) AS dup_snap,
         |    CAST(max(CASE WHEN NOT vs_snap AND neardup THEN 1 ELSE 0 END)
         |      AS BIGINT) AS dup_batch
         |  FROM sc GROUP BY 1)
         |SELECT d.source, count(*) AS n_batch,
         |  CAST(sum(COALESCE(pd.cand_snap, 0)) AS BIGINT)
         |    AS n_cand_vs_snapshot,
         |  CAST(sum(COALESCE(pd.cand_batch, 0)) AS BIGINT)
         |    AS n_cand_within_batch,
         |  CAST(sum(COALESCE(pd.dup_snap, 0)) AS BIGINT)
         |    AS n_dup_vs_snapshot,
         |  CAST(sum(COALESCE(pd.dup_batch, 0)) AS BIGINT)
         |    AS n_dup_within_batch,
         |  CAST(sum(CASE WHEN COALESCE(pd.dup_snap, 0) = 0
         |    AND COALESCE(pd.dup_batch, 0) = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_clean
         |FROM documents d LEFT JOIN pd ON pd.a = d.doc_id
         |WHERE d.doc_id % 2 = 1 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Capped candidate path: same pipeline as dedup_minhash, with
    // the per-bucket fair-order member selection (hash(id:band:bh),
    // id) mirrored before the band self-join.
    "dedup_minhash_capped" -> {
      val nMatch = (0 until Dedup.NumHashes)
        .map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val ord = Portable.duckHash(
        "(CAST(doc_id AS VARCHAR) || ':' || CAST(band AS VARCHAR)" +
          " || ':' || CAST(bh AS VARCHAR))")
      s"""WITH $minhashCtes,
         |kbands AS (SELECT doc_id, band, bh FROM (
         |    SELECT doc_id, band, bh, row_number() OVER (
         |      PARTITION BY band, bh ORDER BY $ord, doc_id) AS rk
         |    FROM bands)
         |  WHERE rk <= $DemoCap),
         |kcand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM kbands a JOIN kbands b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT c.d1 AS doc_id_a, c.d2 AS doc_id_b,
         |  CAST($nMatch AS BIGINT) AS n_match,
         |  CAST($nMatch AS DOUBLE) / CAST(${Dedup.NumHashes} AS DOUBLE) AS est_jaccard
         |FROM kcand c
         |JOIN sigs sa ON sa.doc_id = c.d1
         |JOIN sigs sb ON sb.doc_id = c.d2
         |ORDER BY 1, 2""".stripMargin
    },

    "dedup_cap_census" ->
      s"""WITH $minhashCtes,
         |sz AS (SELECT band, bh, count(*) AS m FROM bands GROUP BY 1, 2)
         |SELECT CAST(band AS BIGINT) AS band,
         |  count(*) AS n_buckets,
         |  CAST(sum(CASE WHEN m > $DemoCap THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hot_buckets,
         |  CAST(sum(m) AS BIGINT) AS n_members,
         |  CAST(sum(m - least(m, $DemoCap)) AS BIGINT) AS n_members_dropped,
         |  CAST(sum(m * (m - 1) // 2) AS BIGINT) AS n_pairs_uncapped,
         |  CAST(sum(least(m, $DemoCap) * (least(m, $DemoCap) - 1) // 2)
         |    AS BIGINT) AS n_pairs_capped,
         |  CASE WHEN sum(m * (m - 1) // 2) > 0
         |    THEN CAST(sum(m * (m - 1) // 2)
         |        - sum(least(m, $DemoCap) * (least(m, $DemoCap) - 1) // 2)
         |        AS DOUBLE)
         |      / CAST(sum(m * (m - 1) // 2) AS DOUBLE)
         |    ELSE 0.0 END AS dropped_pair_share
         |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_cap_recall_curve" -> dedupCapCurveSql(minhashCtes),

    // The sample-bounded production shape of the curve: the same
    // deterministic (source, doc_id) per-mille gate as corpus_sample
    // thins the documents BEFORE any signature work, so the
    // deliberately-uncapped pair join shrinks quadratically in the
    // rate; the curve is then the exact curve OF the sampled
    // sub-corpus — one shared SQL builder with the full variant, the
    // only difference being the gated document relation.
    "dedup_cap_curve_sampled" -> dedupCapCurveSql(
      s"""ds AS (SELECT * FROM documents
         |  WHERE ${Portable.duckHash(
                "(source || '#' || CAST(doc_id AS VARCHAR))")} % 1000
         |    < ${Dedup.CurveSamplePerMille}),
         |${minhashCtesFrom("ds")}""".stripMargin),

    "dedup_embedding_cap_curve" -> embCapCurveSql(
      s"""$embCtes,
         |$srpCtes""".stripMargin),

    // Embedding twin of the sampled curve: deterministic vec_id
    // per-mille hash gate before quantization — same shared builder
    // as the full variant over a gated embeddings relation.
    "dedup_embedding_cap_curve_sampled" -> embCapCurveSql(
      s"""es AS (SELECT * FROM embeddings
         |  WHERE ${Portable.duckHash("(CAST(vec_id AS VARCHAR))")} % 1000
         |    < ${Dedup.CurveSamplePerMille}),
         |${embCtesFrom("es")},
         |$srpCtes""".stripMargin),


    "sim_knn_cap_census" -> {
      val cap = Similarity.KnnBucketCap
      s"""WITH $embCtes,
         |$srpCtes,
         |sz AS (SELECT band, bucket, count(*) AS m FROM buckets
         |  GROUP BY 1, 2)
         |SELECT CAST(band AS BIGINT) AS band,
         |  count(*) AS n_buckets,
         |  CAST(sum(CASE WHEN m > $cap THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hot_buckets,
         |  CAST(sum(m) AS BIGINT) AS n_members,
         |  CAST(sum(m - least(m, $cap)) AS BIGINT) AS n_members_dropped,
         |  CAST(sum(m * (m - 1) // 2) AS BIGINT) AS n_pairs_uncapped,
         |  CAST(sum(least(m, $cap) * (least(m, $cap) - 1) // 2)
         |    AS BIGINT) AS n_pairs_capped,
         |  CASE WHEN sum(m * (m - 1) // 2) > 0
         |    THEN CAST(sum(m * (m - 1) // 2)
         |        - sum(least(m, $cap) * (least(m, $cap) - 1) // 2)
         |        AS DOUBLE)
         |      / CAST(sum(m * (m - 1) // 2) AS DOUBLE)
         |    ELSE 0.0 END AS dropped_pair_share
         |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "dedup_ngram_jaccard" ->
      s"""WITH $minhashCtes,
         |shd AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |sizes AS (SELECT doc_id, count(*) AS set_size FROM shd GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS n_inter
         |  FROM cand c
         |  JOIN shd x ON x.doc_id = c.d1
         |  JOIN shd y ON y.doc_id = c.d2 AND y.shingle = x.shingle
         |  GROUP BY 1, 2)
         |SELECT i.d1 AS doc_id_a, i.d2 AS doc_id_b, i.n_inter,
         |  sa.set_size AS size_a, sb.set_size AS size_b,
         |  CAST(i.n_inter AS DOUBLE)
         |    / CAST(sa.set_size + sb.set_size - i.n_inter AS DOUBLE) AS jaccard
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.d1
         |JOIN sizes sb ON sb.doc_id = i.d2
         |ORDER BY 1, 2""".stripMargin,

    // TRUE connected components on both sides: Spark runs the
    // partition-local union-find "filtering" contraction to
    // convergence (Dedup.clusterLabels); DuckDB enumerates
    // reachability with a recursive CTE and takes the per-vertex min.
    // Both are exact, so the match is independent of iteration order.
    "dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
         |edges AS (SELECT d1 AS src, d2 AS dst FROM cand
         |  UNION ALL SELECT d2 AS src, d1 AS dst FROM cand),
         |reach AS (SELECT src AS v, src AS label FROM edges
         |  UNION
         |  SELECT e.src AS v, r.label AS label
         |  FROM edges e JOIN reach r ON r.v = e.dst),
         |lab AS (SELECT v, min(label) AS label FROM reach GROUP BY v)
         |SELECT label AS cluster_id, count(*) AS n_docs, max(v) AS max_doc_id
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_simhash" -> {
      val sums = (0 until Dedup.SimHashBits)
        .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
        .mkString(",\n  ")
      val sig = (0 until Dedup.SimHashBits)
        .map(b => s"(CASE WHEN s$b >= 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksT) AS tok FROM documents),
         |h AS (SELECT doc_id, ${Portable.duckHash("tok", 201)} AS h FROM toks),
         |bs AS (SELECT doc_id,
         |  $sums
         |FROM h GROUP BY 1),
         |sig AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM bs)
         |SELECT doc_id, simhash,
         |  CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS n_bucket
         |FROM sig ORDER BY doc_id""".stripMargin
    },

    "dedup_embedding_curve" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |${cappedBucketsSql("skb")},
         |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |  FROM skb a JOIN skb b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |d AS (SELECT c.v1, c.v2, CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN flat fa ON fa.vec_id = c.v1
         |  JOIN flat fb ON fb.vec_id = c.v2 AND fb.i = fa.i
         |  GROUP BY 1, 2),
         |sc AS (SELECT d.v1, d.v2, $cosSql AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.vec_id = d.v1
         |  JOIN norms nb ON nb.vec_id = d.v2
         |  WHERE na.n2 > 0 AND nb.n2 > 0
         |    AND $cosSql >= CAST(${Dedup.CosineTau} AS DOUBLE)),
         |f AS (SELECT sc.*, t.tau,
         |    sc.cos_sim >= CAST(t.tau AS DOUBLE) / 100 AS keep
         |  FROM sc, (SELECT unnest([40, 60, 80, 90]) AS tau) t),
         |e AS (SELECT tau, keep, unnest([v1, v2]) AS dd FROM f)
         |SELECT CAST(tau AS BIGINT) AS tau,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) // 2 AS BIGINT)
         |    AS n_pairs,
         |  count(DISTINCT CASE WHEN keep THEN dd END) AS n_docs
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_embedding" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |${cappedBucketsSql("skb")},
         |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |  FROM skb a JOIN skb b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |d AS (SELECT c.v1, c.v2, CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN flat fa ON fa.vec_id = c.v1
         |  JOIN flat fb ON fb.vec_id = c.v2 AND fb.i = fa.i
         |  GROUP BY 1, 2)
         |SELECT d.v1 AS vec_id_a, d.v2 AS vec_id_b, $cosSql AS cos_sim
         |FROM d
         |JOIN norms na ON na.vec_id = d.v1
         |JOIN norms nb ON nb.vec_id = d.v2
         |WHERE na.n2 > 0 AND nb.n2 > 0
         |  AND $cosSql >= CAST(${Dedup.CosineTau} AS DOUBLE)
         |ORDER BY 1, 2""".stripMargin,

    "sim_topk_bruteforce" ->
      s"""WITH $embCtes,
         |d AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |scored AS (SELECT d.probe_id, d.neighbor_id, $cosSql AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.vec_id = d.probe_id
         |  JOIN norms nb ON nb.vec_id = d.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk FROM scored)
         |SELECT probe_id, neighbor_id, cos_sim, rk FROM r
         |WHERE rk <= ${Similarity.TopK} ORDER BY probe_id, rk""".stripMargin,

    "embed_hard_negatives" ->
      s"""WITH $embCtes,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |d AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |scored AS (SELECT d.probe_id, la.label AS probe_label,
         |    d.neighbor_id, lb.label AS neighbor_label, $cosSql AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.vec_id = d.probe_id
         |  JOIN norms nb ON nb.vec_id = d.neighbor_id
         |  JOIN lab la ON la.vec_id = d.probe_id
         |  JOIN lab lb ON lb.vec_id = d.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0 AND la.label <> lb.label),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk FROM scored)
         |SELECT probe_id, probe_label, neighbor_id, neighbor_label,
         |  cos_sim, rk FROM r
         |WHERE rk <= ${Similarity.HardNegK} ORDER BY probe_id, rk""".stripMargin,

    "embed_triplet_mining" ->
      s"""WITH $embCtes,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |d AS (SELECT fp.vec_id AS probe_id, f.vec_id AS neighbor_id,
         |    CAST(sum(fp.v * f.v) AS BIGINT) AS dot
         |  FROM flat fp
         |  JOIN flat f ON f.i = fp.i AND f.vec_id <> fp.vec_id
         |  WHERE fp.vec_id < ${Similarity.NumProbes}
         |  GROUP BY 1, 2),
         |scored AS (SELECT d.probe_id, la.label AS probe_label,
         |    d.neighbor_id, lb.label AS neighbor_label, $cosSql AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.vec_id = d.probe_id
         |  JOIN norms nb ON nb.vec_id = d.neighbor_id
         |  JOIN lab la ON la.vec_id = d.probe_id
         |  JOIN lab lb ON lb.vec_id = d.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |pos AS (SELECT probe_id, probe_label, neighbor_id AS pos_id,
         |    cos_sim AS pos_cos
         |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim ASC, neighbor_id) AS pk
         |    FROM scored WHERE neighbor_label = probe_label)
         |  WHERE pk = 1),
         |neg AS (SELECT probe_id, neighbor_id AS neg_id,
         |    cos_sim AS neg_cos
         |  FROM (SELECT s.*, row_number() OVER (PARTITION BY s.probe_id
         |      ORDER BY s.cos_sim DESC, s.neighbor_id) AS nk
         |    FROM scored s JOIN pos p ON p.probe_id = s.probe_id
         |    WHERE s.neighbor_label <> s.probe_label
         |      AND s.cos_sim < p.pos_cos)
         |  WHERE nk = 1)
         |SELECT p.probe_id, p.probe_label, p.pos_id, p.pos_cos,
         |  n.neg_id, n.neg_cos, p.pos_cos - n.neg_cos AS margin
         |FROM pos p LEFT JOIN neg n ON n.probe_id = p.probe_id
         |ORDER BY p.probe_id""".stripMargin,

    "embed_anisotropy" ->
      s"""WITH $embCtes,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |comp AS (SELECT l.label, f.i, CAST(sum(f.v) AS BIGINT) AS s
         |  FROM flat f JOIN lab l ON l.vec_id = f.vec_id GROUP BY 1, 2),
         |num AS (SELECT label, sum(s * s) AS num FROM comp GROUP BY 1),
         |den AS (SELECT l.label, count(*) AS n_vecs,
         |    CAST(sum(n.n2) AS BIGINT) AS sum_n2
         |  FROM lab l LEFT JOIN norms n ON n.vec_id = l.vec_id
         |  GROUP BY 1)
         |SELECT d.label, d.n_vecs,
         |  CAST(num.num AS DOUBLE)
         |    / (CAST(d.n_vecs AS DOUBLE) * CAST(d.sum_n2 AS DOUBLE))
         |    AS anisotropy,
         |  sqrt(CAST(num.num AS DOUBLE)
         |    / (CAST(d.n_vecs AS DOUBLE) * CAST(d.sum_n2 AS DOUBLE)))
         |    AS mean_shift
         |FROM den d JOIN num ON num.label = d.label ORDER BY 1""".stripMargin,

    "sim_knn_kcore" -> {
      val k = Similarity.KcoreK
      def round(i: Int): String =
        s"""ae$i AS (SELECT s.src, s.dst FROM gsym s
           |  JOIN a$i x ON x.v = s.src JOIN a$i y ON y.v = s.dst),
           |cc$i AS (SELECT CAST($i AS BIGINT) AS round,
           |    (SELECT count(*) FROM a$i) AS n_alive,
           |    (SELECT count(*) // 2 FROM ae$i) AS n_edges),
           |a${i + 1} AS (SELECT src AS v FROM ae$i
           |  GROUP BY 1 HAVING count(*) >= $k)""".stripMargin
      val rounds = (0 to Similarity.KcoreRounds).map(round).mkString(",\n")
      val unions = (0 to Similarity.KcoreRounds)
        .map(i => s"SELECT * FROM cc$i").mkString(" UNION ALL ")
      s"""WITH $embCtes,
         |$srpCtes,
         |${knnEdgeCtes(Similarity.KnnGraphK)},
         |gsym AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
         |a0 AS (SELECT DISTINCT src AS v FROM gsym),
         |$rounds
         |SELECT round, n_alive, n_edges FROM ($unions)
         |ORDER BY round""".stripMargin
    },

    "embed_exact_dups" ->
      s"""WITH q AS (SELECT vec_id, label,
         |    ${graft.ml.Vectors.duckQuantize("embedding")} AS q FROM embeddings)
         |SELECT label, count(*) AS n_vecs,
         |  count(DISTINCT q) AS n_distinct,
         |  count(*) - count(DISTINCT q) AS n_dup_vecs
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    "sim_knn_graph" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |${knnEdgeCtes(Similarity.KnnGraphK)},
         |e2 AS (SELECT e.src, e.dst,
         |    CASE WHEN m.src IS NOT NULL THEN 1 ELSE 0 END AS mut
         |  FROM e LEFT JOIN e m ON m.src = e.dst AND m.dst = e.src)
         |SELECT l.label, count(DISTINCT e2.src) AS n_nodes,
         |  count(*) AS n_edges, CAST(sum(mut) AS BIGINT) AS n_mutual,
         |  CAST(sum(mut) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS reciprocity
         |FROM e2 JOIN embeddings l ON l.vec_id = e2.src
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same gsym construction as sim_knn_kcore; the orientation,
    // wedge join, and corner explode mirror the Spark plan exactly,
    // so every count is the same exact integer.
    "sim_knn_triangles" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |${knnEdgeCtes(Similarity.KnnGraphK)},
         |gsym AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
         |deg AS (SELECT src AS v, count(*) AS deg FROM gsym GROUP BY 1),
         |und AS (SELECT g.src, g.dst, ds.deg AS deg_s, dd.deg AS deg_d
         |  FROM gsym g
         |  JOIN deg ds ON ds.v = g.src
         |  JOIN deg dd ON dd.v = g.dst
         |  WHERE g.src < g.dst),
         |orr AS (SELECT
         |    CASE WHEN deg_s < deg_d OR (deg_s = deg_d AND src < dst)
         |      THEN src ELSE dst END AS lo,
         |    CASE WHEN deg_s < deg_d OR (deg_s = deg_d AND src < dst)
         |      THEN dst ELSE src END AS hi
         |  FROM und),
         |tri AS (SELECT w1.lo AS a, w1.hi AS b, w2.hi AS c
         |  FROM orr w1 JOIN orr w2 ON w2.lo = w1.lo AND w2.hi > w1.hi
         |  WHERE EXISTS (SELECT 1 FROM gsym g
         |    WHERE g.src = w1.hi AND g.dst = w2.hi)),
         |pn AS (SELECT v, count(*) AS n_tri FROM
         |    (SELECT unnest([a, b, c]) AS v FROM tri)
         |  GROUP BY 1)
         |SELECT l.label, count(*) AS n_nodes,
         |  CAST(sum(CASE WHEN d.deg >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_deg_ge2,
         |  CAST(sum(d.deg * (d.deg - 1)) // 2 AS BIGINT) AS n_wedges,
         |  CAST(sum(coalesce(pn.n_tri, 0)) AS BIGINT) AS n_closed,
         |  CASE WHEN sum(d.deg * (d.deg - 1)) > 0
         |    THEN CAST(sum(coalesce(pn.n_tri, 0)) AS DOUBLE) * 2.0
         |      / CAST(sum(d.deg * (d.deg - 1)) AS DOUBLE)
         |    ELSE NULL END AS closure
         |FROM deg d
         |LEFT JOIN pn ON pn.v = d.v
         |JOIN embeddings l ON l.vec_id = d.v
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sim_ann_graph" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |$graphWalkCtes
         |SELECT probe_id, node AS neighbor_id, cos_sim,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, node) AS BIGINT) AS rk
         |FROM gf${Similarity.GraphSearchHops}
         |ORDER BY probe_id, rk""".stripMargin,

    "sim_ann_graph_curve" -> {
      def hopSelect(h: Int): String =
        s"""SELECT CAST($h AS BIGINT) AS hops, b.probe_id,
           |  CAST(count(g.node) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |    AS recall_at_k
           |FROM bfk b LEFT JOIN gf$h g
           |  ON g.probe_id = b.probe_id AND g.node = b.node
           |GROUP BY 1, 2""".stripMargin
      s"""WITH $embCtes,
         |$srpCtes,
         |$graphWalkCtes,
         |bfk AS (SELECT probe_id, node FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, node) AS rk FROM pc)
         |  WHERE rk <= ${Similarity.TopK})
         |${Similarity.GraphCurveHops.map(hopSelect).mkString("\nUNION ALL\n")}
         |ORDER BY hops, probe_id""".stripMargin
    },

    "sim_ann_graph_recall" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |$graphWalkCtes,
         |bfk AS (SELECT probe_id, node FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, node) AS rk FROM pc)
         |  WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(g.node) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS recall_at_k
         |FROM bfk b LEFT JOIN gf${Similarity.GraphSearchHops} g
         |  ON g.probe_id = b.probe_id AND g.node = b.node
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sim_pagerank" -> {
      val S = Similarity.PageRankScale
      // one synchronous fixed-point iteration, unrolled (the Spark
      // loop's exact arithmetic twin — every division floored back
      // to BIGINT so no float sum exists to depend on order)
      def iterCtes(i: Int, prev: String): String =
        s"""c$i AS (SELECT e.dst AS v,
           |    CAST(sum(CAST(floor(CAST(pr.r AS DOUBLE)
           |      / CAST(o.outdeg AS DOUBLE)) AS BIGINT)) AS BIGINT) AS inflow
           |  FROM e JOIN $prev pr ON pr.v = e.src
           |  JOIN outd o ON o.src = e.src GROUP BY 1),
           |d$i AS (SELECT CAST(coalesce(sum(pr.r), 0) AS BIGINT) AS dang
           |  FROM $prev pr LEFT JOIN outd o ON o.src = pr.v
           |  WHERE o.src IS NULL),
           |pr$i AS (SELECT p.v,
           |    CAST(floor(0.15 * (CAST($S AS DOUBLE)
           |      / CAST(nn.n AS DOUBLE))) AS BIGINT)
           |    + CAST(floor(0.85 * CAST(coalesce(c$i.inflow, 0)
           |      + CAST(floor(CAST(d$i.dang AS DOUBLE)
           |        / CAST(nn.n AS DOUBLE)) AS BIGINT) AS DOUBLE)) AS BIGINT)
           |    AS r
           |  FROM $prev p LEFT JOIN c$i ON c$i.v = p.v, nn, d$i)""".stripMargin
      val iters = (1 to Similarity.PageRankIters)
        .map(i => iterCtes(i, s"pr${i - 1}")).mkString(",\n")
      s"""WITH $embCtes,
         |$srpCtes,
         |${knnEdgeCtes(Similarity.KnnGraphK)},
         |pn AS (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT count(*) AS n FROM pn),
         |outd AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |pr0 AS (SELECT v, CAST(floor(CAST($S AS DOUBLE)
         |    / CAST(nn.n AS DOUBLE)) AS BIGINT) AS r FROM pn, nn),
         |$iters,
         |t AS (SELECT p.v AS vec_id, l.label, p.r AS rank_fp
         |  FROM pr${Similarity.PageRankIters} p
         |  JOIN embeddings l ON l.vec_id = p.v
         |  ORDER BY p.r DESC, p.v LIMIT ${Similarity.PageRankTopN})
         |SELECT vec_id, label, rank_fp,
         |  CAST(row_number() OVER (ORDER BY rank_fp DESC, vec_id)
         |    AS BIGINT) AS rk
         |FROM t ORDER BY rk""".stripMargin
    },

    "sim_ann_lsh" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |cand AS (SELECT DISTINCT pb.vec_id AS probe_id, b.vec_id AS neighbor_id
         |  FROM buckets pb JOIN buckets b
         |  ON b.band = pb.band AND b.bucket = pb.bucket AND b.vec_id <> pb.vec_id
         |  WHERE pb.vec_id < ${Similarity.NumProbes}),
         |d AS (SELECT c.probe_id, c.neighbor_id, CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN flat fa ON fa.vec_id = c.probe_id
         |  JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
         |  GROUP BY 1, 2),
         |scored AS (SELECT d.probe_id, d.neighbor_id, $cosSql AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.vec_id = d.probe_id
         |  JOIN norms nb ON nb.vec_id = d.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk FROM scored)
         |SELECT probe_id, neighbor_id, cos_sim, rk FROM r
         |WHERE rk <= ${Similarity.TopK} ORDER BY probe_id, rk""".stripMargin,

    "sim_ann_hamming" ->
      s"""WITH $embCtes,
         |$hammingCtes
         |SELECT probe_id, neighbor_id, hamming, rk FROM hr
         |WHERE rk <= ${Similarity.TopK} ORDER BY probe_id, rk""".stripMargin,

    "embed_binary_recall" ->
      s"""WITH $embCtes,
         |$exactTopKCtes,
         |$hammingCtes,
         |hk AS (SELECT probe_id, neighbor_id FROM hr
         |  WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(h.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS recall_at_k
         |FROM bfk b LEFT JOIN hk h
         |  ON h.probe_id = b.probe_id AND h.neighbor_id = b.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Hamming top-C candidates re-scored against the exact cosine
    // relation (bs) — the oracle of the two-stage pipeline.
    "sim_ann_hamming_rerank" ->
      s"""WITH $embCtes,
         |$exactTopKCtes,
         |$hammingCtes,
         |hcand AS (SELECT probe_id, neighbor_id FROM hr
         |  WHERE rk <= ${Similarity.RerankCandidates}),
         |rsc AS (SELECT bs.probe_id, bs.neighbor_id, bs.cos_sim
         |  FROM hcand c JOIN bs ON bs.probe_id = c.probe_id
         |    AND bs.neighbor_id = c.neighbor_id),
         |rrk AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk FROM rsc)
         |SELECT probe_id, neighbor_id, cos_sim, rk FROM rrk
         |WHERE rk <= ${Similarity.TopK} ORDER BY probe_id, rk""".stripMargin,

    "embed_rerank_recall" ->
      s"""WITH $embCtes,
         |$exactTopKCtes,
         |$hammingCtes,
         |hcand AS (SELECT probe_id, neighbor_id FROM hr
         |  WHERE rk <= ${Similarity.RerankCandidates}),
         |rsc AS (SELECT bs.probe_id, bs.neighbor_id, bs.cos_sim
         |  FROM hcand c JOIN bs ON bs.probe_id = c.probe_id
         |    AND bs.neighbor_id = c.neighbor_id),
         |rk2 AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rk FROM rsc)
         |  WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(r.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS recall_at_k
         |FROM bfk b LEFT JOIN rk2 r
         |  ON r.probe_id = b.probe_id AND r.neighbor_id = b.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sim_ann_lsh_multiprobe" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |$multiprobeCtes
         |SELECT probe_id, neighbor_id, cos_sim, rk FROM mr
         |WHERE rk <= ${Similarity.TopK} ORDER BY probe_id, rk""".stripMargin,

    "sim_ann_multiprobe_recall" ->
      s"""WITH $embCtes,
         |$srpCtes,
         |$exactTopKCtes,
         |$multiprobeCtes,
         |mk AS (SELECT probe_id, neighbor_id FROM mr
         |  WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(m.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS recall_at_k
         |FROM bfk b LEFT JOIN mk m
         |  ON m.probe_id = b.probe_id AND m.neighbor_id = b.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sim_ann_ivf" ->
      s"""WITH $embCtes,
         |${ivfCellCtes(Similarity.IvfNProbe)},
         |cand AS (SELECT itc.probe_id, l.vec_id AS neighbor_id
         |  FROM itc JOIN lab l ON l.label = itc.label AND l.vec_id <> itc.probe_id),
         |d AS (SELECT c.probe_id, c.neighbor_id, CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN flat fa ON fa.vec_id = c.probe_id
         |  JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
         |  GROUP BY 1, 2),
         |scored AS (SELECT d.probe_id, d.neighbor_id, $cosSql AS cos_sim
         |  FROM d
         |  JOIN norms na ON na.vec_id = d.probe_id
         |  JOIN norms nb ON nb.vec_id = d.neighbor_id
         |  WHERE na.n2 > 0 AND nb.n2 > 0),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk FROM scored)
         |SELECT probe_id, neighbor_id, cos_sim, rk FROM r
         |WHERE rk <= ${Similarity.TopK} ORDER BY probe_id, rk""".stripMargin,

    "corpus_clean" -> {
      val scores = TextAnalysis.markers
        .map { case (l, ws) => s"${markerCountSql(ws)} AS score_$l" }
        .mkString(",\n  ")
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH s AS (SELECT doc_id, source,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |  CAST(list_sum(list_transform($toksT, x -> length(x))) AS BIGINT) AS sum_len,
         |  md5($normT) AS fp,
         |  $scores
         |FROM documents),
         |q AS (SELECT *,
         |  CAST(0.4 AS DOUBLE) * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |    + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |    + CAST(0.3 AS DOUBLE) * least((CAST(sum_len AS DOUBLE) / $nTok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |    AS quality_score,
         |  $langPredSql AS pred_lang,
         |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |FROM s)
         |SELECT source, pred_lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  min(quality_score) AS min_q, max(quality_score) AS max_q
         |FROM q WHERE quality_score >= CAST(0.5 AS DOUBLE) AND rn = 1
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "multimodal_meta" ->
      s"""SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  count(*) AS n_items,
         |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         |  count(DISTINCT md5(text)) AS n_digests
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_unigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksT) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
         |sc AS (SELECT doc_id,
         |    count(*) AS n_tokens,
         |    CAST(sum(tf) AS BIGINT) AS sum_tf,
         |    CAST(sum(length(bin(tf)) - 1) AS BIGINT) AS sum_log2_tf,
         |    CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |  FROM toks JOIN tf USING (tok)
         |  GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(sc.n_tokens, 0) AS n_tokens,
         |  COALESCE(sc.sum_tf, 0) AS sum_tf,
         |  COALESCE(sc.sum_log2_tf, 0) AS sum_log2_tf,
         |  COALESCE(sc.n_hapax, 0) AS n_hapax,
         |  CAST(sc.sum_tf AS DOUBLE) / CAST(sc.n_tokens AS DOUBLE) AS avg_tf,
         |  CAST(sc.sum_log2_tf AS DOUBLE) / CAST(sc.n_tokens AS DOUBLE)
         |    AS avg_log2_tf
         |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Bigram surprise with the same exact-integer floor-log2 of the
    // floor quotient; the w2 IS NOT NULL filter drops the doc-final
    // lead() row (Spark builds bigrams by array transform instead).
    "text_heldout_perplexity" ->
      s"""WITH h AS (SELECT doc_id, source, text,
         |    ${Portable.duckHash(
                "(source || '#' || CAST(doc_id AS VARCHAR) || '#split')")}
         |      % 1000 AS hb
         |  FROM documents),
         |sp AS (SELECT source, text,
         |    CASE WHEN hb IS NULL THEN NULL
         |      WHEN hb < 800 THEN 'train' WHEN hb < 900 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM h),
         |tk AS (SELECT source, split, unnest($toksT) AS tok
         |  FROM sp WHERE split IS NOT NULL),
         |tf AS (SELECT tok, count(*) AS tf FROM tk
         |  WHERE split = 'train' GROUP BY 1),
         |nt AS (SELECT CAST(COALESCE(sum(tf), 0) AS BIGINT) AS n_train
         |  FROM tf),
         |he AS (SELECT t.source, f.tf,
         |    CASE WHEN f.tf IS NOT NULL
         |      THEN CAST(length(bin(nt.n_train // f.tf)) - 1 AS BIGINT)
         |      END AS surprise
         |  FROM tk t LEFT JOIN tf f ON f.tok = t.tok CROSS JOIN nt
         |  WHERE t.split <> 'train'),
         |pr AS (SELECT source, count(*) AS n_tokens,
         |    CAST(count(surprise) AS BIGINT) AS n_invocab,
         |    CAST(count(*) FILTER (WHERE tf IS NULL) AS BIGINT) AS n_oov,
         |    CAST(COALESCE(sum(surprise), 0) AS BIGINT) AS sum_surprise
         |  FROM he GROUP BY 1)
         |SELECT s.source,
         |  COALESCE(pr.n_tokens, 0) AS n_tokens,
         |  COALESCE(pr.n_invocab, 0) AS n_invocab,
         |  COALESCE(pr.n_oov, 0) AS n_oov,
         |  CASE WHEN COALESCE(pr.n_tokens, 0) > 0
         |    THEN CAST(pr.n_oov AS DOUBLE) / CAST(pr.n_tokens AS DOUBLE)
         |    ELSE 0.0 END AS oov_rate,
         |  COALESCE(pr.sum_surprise, 0) AS sum_surprise,
         |  CASE WHEN COALESCE(pr.n_invocab, 0) > 0
         |    THEN CAST(pr.sum_surprise AS DOUBLE)
         |      / CAST(pr.n_invocab AS DOUBLE)
         |    ELSE 0.0 END AS avg_surprise
         |FROM (SELECT DISTINCT source FROM documents) s
         |LEFT JOIN pr USING (source) ORDER BY 1""".stripMargin,

    "text_bigram_kn" ->
      s"""WITH t AS (SELECT doc_id, $toksT AS toks FROM documents),
         |u AS (SELECT doc_id, generate_subscripts(toks, 1) AS i,
         |    unnest(toks) AS tok FROM t),
         |s AS (SELECT tok AS w1, lead(tok) OVER (
         |    PARTITION BY doc_id ORDER BY i) AS w2 FROM u),
         |bf AS (SELECT w1, w2, count(*) AS c_vw FROM s
         |  WHERE w2 IS NOT NULL GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(sum(c_vw) AS BIGINT) AS c_v,
         |    count(*) AS n1p_follow FROM bf GROUP BY 1),
         |prec AS (SELECT w2, count(*) AS n1p_prec FROM bf GROUP BY 1),
         |tot AS (SELECT count(*) AS n1p_total FROM bf)
         |SELECT bf.w1, bf.w2, bf.c_vw, ctx.c_v, ctx.n1p_follow,
         |  prec.n1p_prec, tot.n1p_total,
         |  ((CAST(bf.c_vw AS DOUBLE) - ${TextAnalysis.KnDiscount})
         |      / CAST(ctx.c_v AS DOUBLE))
         |    + (((${TextAnalysis.KnDiscount} * CAST(ctx.n1p_follow AS DOUBLE))
         |        / CAST(ctx.c_v AS DOUBLE))
         |      * (CAST(prec.n1p_prec AS DOUBLE)
         |        / CAST(tot.n1p_total AS DOUBLE))) AS p_kn
         |FROM bf JOIN ctx USING (w1) JOIN prec USING (w2) CROSS JOIN tot
         |ORDER BY bf.c_vw DESC, bf.w1, bf.w2
         |LIMIT ${TextAnalysis.KnTopK}""".stripMargin,

    "text_bigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
         |  FROM (SELECT doc_id, $toksT AS l FROM documents)),
         |bi AS (SELECT doc_id, w1, w2 FROM (
         |    SELECT doc_id, tok AS w1,
         |      lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS w2
         |    FROM toks)
         |  WHERE w2 IS NOT NULL),
         |uf AS (SELECT tok AS w1, count(*) AS uf FROM toks GROUP BY 1),
         |bf AS (SELECT w1, w2, count(*) AS bf FROM bi GROUP BY 1, 2),
         |e AS (SELECT bf.w1, bf.w2, bf.bf, uf.uf,
         |    CAST(length(bin(uf.uf // bf.bf)) - 1 AS BIGINT) AS surprise
         |  FROM bf JOIN uf USING (w1)),
         |sc AS (SELECT bi.doc_id,
         |    count(*) AS n_bigrams,
         |    CAST(count(*) FILTER (WHERE e.bf = 1) AS BIGINT) AS n_novel,
         |    CAST(sum(e.bf) AS BIGINT) AS sum_bf,
         |    CAST(sum(e.surprise) AS BIGINT) AS sum_surprise
         |  FROM bi JOIN e USING (w1, w2)
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(sc.n_bigrams, 0) AS n_bigrams,
         |  COALESCE(sc.n_novel, 0) AS n_novel,
         |  COALESCE(sc.sum_bf, 0) AS sum_bf,
         |  COALESCE(sc.sum_surprise, 0) AS sum_surprise,
         |  CAST(sc.sum_surprise AS DOUBLE) / CAST(sc.n_bigrams AS DOUBLE)
         |    AS avg_surprise
         |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "text_pii" ->
      s"""WITH p AS (SELECT doc_id, text
         |  || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         |  || CASE WHEN doc_id % 7 = 0 THEN ' ssn 123-45-6789' ELSE '' END
         |  || CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199' ELSE '' END
         |  AS pii_text FROM documents),
         |r AS (SELECT doc_id, pii_text,
         |  regexp_replace(pii_text,
         |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g') AS after_email
         |FROM p),
         |r2 AS (SELECT doc_id, pii_text, after_email,
         |  regexp_replace(after_email,
         |    '${TextAnalysis.IdRe}', '<ID>', 'g') AS after_id
         |FROM r)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(pii_text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(after_id, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(after_email, '${TextAnalysis.IdRe}')) AS BIGINT) AS n_ids,
         |  CAST(length(regexp_replace(after_id,
         |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS BIGINT) AS red_len,
         |  md5(regexp_replace(after_id,
         |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g')) AS red_md5
         |FROM r2 ORDER BY doc_id""".stripMargin,

    "corpus_dedup_impact" ->
      s"""WITH f AS (SELECT doc_id, source, n_chars,
         |    md5($normT) AS fp FROM documents),
         |m AS (SELECT source, n_chars,
         |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY fp)
         |      THEN 1 ELSE 0 END AS keep
         |  FROM f)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(keep) AS BIGINT) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
         |  CAST(sum(keep * n_chars) AS BIGINT) AS chars_kept,
         |  CAST(count(*) - CAST(sum(keep) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS removed_share,
         |  CAST(CAST(sum(n_chars) AS BIGINT)
         |      - CAST(sum(keep * n_chars) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
         |    AS chars_removed_share
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_anneal_mix" ->
      s"""WITH b AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS chars FROM documents
         |  GROUP BY 1),
         |r AS (SELECT *, CAST(chars AS DOUBLE) AS s1,
         |    sqrt(CAST(chars AS DOUBLE)) AS s2,
         |    sqrt(sqrt(CAST(chars AS DOUBLE))) AS s4 FROM b),
         |z AS (SELECT
         |    CAST(sum(CAST(s1 AS DECIMAL(38,6))) AS DOUBLE) AS z1,
         |    CAST(sum(CAST(s2 AS DECIMAL(38,6))) AS DOUBLE) AS z2,
         |    CAST(sum(CAST(s4 AS DECIMAL(38,6))) AS DOUBLE) AS z4 FROM r)
         |SELECT source, n_docs, chars, s1 / z1 AS share,
         |  s2 / z2 AS w_half, s4 / z4 AS w_quarter,
         |  1048576.0 * (s2 / z2) / s1 AS epochs_half
         |FROM r, z ORDER BY source""".stripMargin,

    "corpus_mix" ->
      s"""WITH w AS (SELECT doc_id, source,
         |  CAST(CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 1000
         |    WHEN 'src2' THEN 300 WHEN 'src3' THEN 0 ELSE 1000 END AS BIGINT)
         |    AS weight_pm
         |  FROM documents),
         |e AS (SELECT doc_id, source, weight_pm,
         |    unnest(range((weight_pm + 999) // 1000)) AS epoch
         |  FROM w WHERE weight_pm > 0),
         |k AS (SELECT * FROM e WHERE epoch < weight_pm // 1000
         |  OR ${Portable.duckHash("(source || '#' || CAST(doc_id AS VARCHAR) || '#' || CAST(epoch AS VARCHAR))")} % 1000 < weight_pm % 1000)
         |SELECT source, epoch, weight_pm, count(*) AS n_docs,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM k GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

    "events_streak" ->
      s"""WITH days AS (SELECT user_id, CAST(ts AS DATE) AS day,
         |    count(*) AS n_events
         |  FROM events GROUP BY 1, 2),
         |isl AS (SELECT user_id, day, n_events,
         |    CASE WHEN day - LAG(day) OVER
         |        (PARTITION BY user_id ORDER BY day) = 1
         |      THEN 0 ELSE 1 END AS gap
         |  FROM days),
         |isl2 AS (SELECT user_id, day, n_events,
         |    SUM(gap) OVER (PARTITION BY user_id ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS island
         |  FROM isl),
         |runs AS (SELECT user_id, island, count(*) AS len,
         |    min(day) AS start_day, sum(n_events) AS n_ev
         |  FROM isl2 GROUP BY 1, 2),
         |agg AS (SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
         |    count(*) AS n_streaks, CAST(sum(n_ev) AS BIGINT) AS n_events,
         |    CAST(max(len) AS BIGINT) AS best_streak
         |  FROM runs GROUP BY 1)
         |SELECT a.user_id, a.active_days, a.n_streaks, a.n_events,
         |  a.best_streak, min(r.start_day) AS best_start
         |FROM agg a JOIN runs r
         |  ON r.user_id = a.user_id AND r.len = a.best_streak
         |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin,

    "events_entry_exit" ->
      s"""WITH r AS (SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id, event_type) AS rf,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC, event_type DESC) AS rl,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM events WHERE ts IS NOT NULL)
         |SELECT f.event_type AS entry_type, l.event_type AS exit_type,
         |  count(*) AS n_users, CAST(sum(f.n) AS BIGINT) AS n_events
         |FROM (SELECT * FROM r WHERE rf = 1) f
         |JOIN (SELECT * FROM r WHERE rl = 1) l USING (user_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_churn" ->
      s"""WITH ls AS (SELECT user_id, max(ts) AS last_ts, count(*) AS n_ev
         |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
         |h AS (SELECT max(last_ts) AS head_ts FROM ls),
         |b AS (SELECT user_id, n_ev,
         |    CAST(CAST(h.head_ts AS DATE) - CAST(ls.last_ts AS DATE) AS BIGINT)
         |      AS days_inactive
         |  FROM ls, h)
         |SELECT CASE WHEN days_inactive <= 1 THEN 'active_1d'
         |    WHEN days_inactive <= 7 THEN 'active_7d'
         |    WHEN days_inactive <= 30 THEN 'active_30d'
         |    ELSE 'dormant' END AS recency_bucket,
         |  count(*) AS n_users, CAST(sum(n_ev) AS BIGINT) AS n_events,
         |  min(days_inactive) AS min_days, max(days_inactive) AS max_days
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_rate_drift" ->
      s"""WITH f AS (${ChangeFeed.duckFromEvents}),
         |daily AS (SELECT table_name, CAST(ts AS DATE) AS day,
         |    CAST(count(*) FILTER (WHERE op = 'insert') AS BIGINT) AS inserts,
         |    CAST(count(*) FILTER (WHERE op = 'update') AS BIGINT) AS updates,
         |    CAST(count(*) FILTER (WHERE op = 'delete') AS BIGINT) AS deletes,
         |    count(*) AS n_ops
         |  FROM f GROUP BY 1, 2)
         |SELECT table_name, day, inserts, updates, deletes, n_ops,
         |  LAG(n_ops) OVER (PARTITION BY table_name ORDER BY day) AS prev_ops,
         |  n_ops - LAG(n_ops) OVER (PARTITION BY table_name ORDER BY day)
         |    AS delta_ops
         |FROM daily ORDER BY 1, 2""".stripMargin,

    "corpus_percentiles" -> {
      val toks = TextAnalysis.duckTokens("text")
      s"""WITH d AS (SELECT source, doc_id,
         |    CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT source, n_tokens,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY n_tokens, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS cnt
         |  FROM d)
         |SELECT source, CAST(max(cnt) AS BIGINT) AS n_docs,
         |  max(CASE WHEN rn = (cnt * 50 + 99) // 100 THEN n_tokens END)
         |    AS p50_tokens,
         |  max(CASE WHEN rn = (cnt * 90 + 99) // 100 THEN n_tokens END)
         |    AS p90_tokens,
         |  max(CASE WHEN rn = (cnt * 99 + 99) // 100 THEN n_tokens END)
         |    AS p99_tokens,
         |  max(n_tokens) AS max_tokens
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "corpus_novelty" ->
      s"""WITH shf AS (${Dedup.duckShingles}),
         |ds AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |fd AS (SELECT doc_id, shingle,
         |    min(doc_id) OVER (PARTITION BY shingle) AS first_doc
         |  FROM ds),
         |pd AS (SELECT doc_id, count(*) AS n_shingles,
         |    CAST(count(*) FILTER (WHERE first_doc = doc_id) AS BIGINT)
         |      AS n_novel
         |  FROM fd GROUP BY 1)
         |SELECT d.doc_id, d.source,
         |  COALESCE(pd.n_shingles, 0) AS n_shingles,
         |  COALESCE(pd.n_novel, 0) AS n_novel,
         |  CASE WHEN COALESCE(pd.n_shingles, 0) > 0
         |    THEN CAST(pd.n_novel AS DOUBLE) / CAST(pd.n_shingles AS DOUBLE)
         |    ELSE 1.0 END AS novelty
         |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "dedup_jaccard_curve" -> {
      val taus = Dedup.CurveTaus.map(t => s"($t)").mkString(", ")
      s"""WITH $minhashCtes,
         |shd AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |sizes AS (SELECT doc_id, count(*) AS set_size FROM shd GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS n_inter
         |  FROM cand c
         |  JOIN shd x ON x.doc_id = c.d1
         |  JOIN shd y ON y.doc_id = c.d2 AND y.shingle = x.shingle
         |  GROUP BY 1, 2),
         |p AS (SELECT i.d1, i.d2, i.n_inter,
         |    sa.set_size + sb.set_size - i.n_inter AS n_union
         |  FROM inter i
         |  JOIN sizes sa ON sa.doc_id = i.d1
         |  JOIN sizes sb ON sb.doc_id = i.d2),
         |f AS (SELECT t.tau, p.d1, p.d2,
         |    100 * p.n_inter >= t.tau * p.n_union AS keep
         |  FROM p CROSS JOIN (VALUES $taus) t(tau)),
         |e AS (SELECT tau, keep, unnest([d1, d2]) AS d FROM f)
         |SELECT CAST(tau AS BIGINT) AS tau,
         |  CAST(count(*) FILTER (WHERE keep) / 2 AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT CASE WHEN keep THEN d END) AS BIGINT) AS n_docs
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "events_seasonality" ->
      s"""WITH cells AS (SELECT CAST(hour(ts) AS BIGINT) AS hr, event_type,
         |    count(*) AS n
         |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
         |SELECT hr, event_type, n,
         |  CAST(sum(n) OVER (PARTITION BY hr) AS BIGINT) AS hour_total,
         |  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_total,
         |  CAST(sum(n) OVER () AS BIGINT) AS total,
         |  CAST(n * sum(n) OVER () AS DOUBLE) /
         |    CAST(sum(n) OVER (PARTITION BY hr)
         |      * sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS lift
         |FROM cells ORDER BY 1, 2""".stripMargin,

    "events_forecast_backtest" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |h AS (SELECT max(day) AS maxd FROM d),
        |g AS (SELECT t.event_type,
        |    CAST(h.maxd - 27 + CAST(r.i AS INTEGER) AS DATE) AS day, h.maxd
        |  FROM (SELECT DISTINCT event_type FROM d) t, h, range(28) r(i)),
        |c AS (SELECT g.event_type, g.day, coalesce(d.n, 0) AS n,
        |    date_diff('day', DATE '1970-01-05', g.day) % 7 AS dow,
        |    g.day > g.maxd - 7 AS is_test
        |  FROM g LEFT JOIN d
        |    ON d.event_type = g.event_type AND d.day = g.day),
        |td AS (SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS s_dow
        |  FROM c WHERE NOT is_test GROUP BY 1, 2),
        |tt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS s_tot
        |  FROM c WHERE NOT is_test GROUP BY 1)
        |SELECT c.event_type, max(tt.s_tot) AS n_train,
        |  CAST(sum(c.n) AS BIGINT) AS n_test,
        |  CAST(sum(abs(3 * c.n - td.s_dow)) AS DOUBLE) / 21.0
        |    AS mae_seasonal,
        |  CAST(sum(abs(21 * c.n - tt.s_tot)) AS DOUBLE) / 147.0
        |    AS mae_naive
        |FROM c
        |JOIN td ON td.event_type = c.event_type AND td.dow = c.dow
        |JOIN tt ON tt.event_type = c.event_type
        |WHERE c.is_test GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_vocab_growth" ->
      s"""WITH shf AS (${Dedup.duckShingles}),
         |fd AS (SELECT shingle, min(doc_id) AS first_doc FROM shf GROUP BY 1),
         |b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
         |d AS (SELECT ((fd.first_doc - b.lo) * 10) // (b.hi - b.lo + 1)
         |    AS decile
         |  FROM fd, b),
         |g AS (SELECT decile, count(*) AS n_new_terms FROM d GROUP BY 1)
         |SELECT decile, n_new_terms,
         |  CAST(sum(n_new_terms) OVER (ORDER BY decile
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
         |FROM g ORDER BY 1""".stripMargin,

    "cdc_ordering_audit" ->
      s"""WITH f AS (${ChangeFeed.duckFromEvents}),
         |p AS (SELECT table_name, user_id, event_id,
         |    epoch_us(ts) AS ts_us,
         |    CASE WHEN user_id % 5 = 0 THEN -event_id ELSE event_id END
         |      AS delivery_pos
         |  FROM f),
         |r AS (SELECT table_name, user_id, event_id, ts_us,
         |    max(ts_us) OVER (PARTITION BY table_name, user_id
         |      ORDER BY delivery_pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS prev_max_us
         |  FROM p),
         |x AS (SELECT *, prev_max_us IS NOT NULL AND ts_us < prev_max_us
         |    AS late FROM r)
         |SELECT table_name, count(*) AS n_events,
         |  CAST(count(*) FILTER (WHERE late) AS BIGINT) AS n_out_of_order,
         |  CAST(count(DISTINCT CASE WHEN late THEN user_id END) AS BIGINT)
         |    AS n_affected_keys,
         |  max(CASE WHEN late THEN prev_max_us - ts_us END) AS max_late_us
         |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    // Key explode mirrors events_props_profile's json_keys; bounds
    // and verdicts are plain exact-timestamp comparisons.
    "cdc_schema_timeline" ->
      s"""WITH f AS (${ChangeFeed.duckFromEvents}),
         |b AS (SELECT table_name, min(ts) AS tf, max(ts) AS tl,
         |    count(*) AS n FROM f WHERE ts IS NOT NULL GROUP BY 1),
         |k AS (SELECT table_name, ts, unnest(json_keys(props))
         |    AS column_name
         |  FROM f WHERE ts IS NOT NULL AND props IS NOT NULL),
         |g AS (SELECT table_name, column_name, count(*) AS n_events,
         |    min(ts) AS first_seen_ts, max(ts) AS last_seen_ts
         |  FROM k GROUP BY 1, 2)
         |SELECT g.table_name, g.column_name, g.n_events,
         |  g.first_seen_ts, g.last_seen_ts,
         |  CAST(g.n_events AS DOUBLE) / CAST(b.n AS DOUBLE)
         |    AS presence_share,
         |  CASE WHEN g.first_seen_ts > b.tf AND g.last_seen_ts < b.tl
         |      THEN 'transient'
         |    WHEN g.first_seen_ts > b.tf THEN 'added'
         |    WHEN g.last_seen_ts < b.tl THEN 'retired'
         |    ELSE 'stable' END AS verdict
         |FROM g JOIN b USING (table_name) ORDER BY 1, 2""".stripMargin,

    "embed_outliers" ->
      s"""WITH q0 AS (SELECT vec_id, label,
         |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
         |q AS (SELECT vec_id, label,
         |    CASE WHEN vec_id % 97 = 0
         |      THEN list_transform(q, x -> x * 3) ELSE q END AS q
         |  FROM q0),
         |flat AS (SELECT vec_id, label, generate_subscripts(q, 1) - 1 AS i,
         |    unnest(q) AS v FROM q),
         |comp AS (SELECT label, i,
         |    CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS m
         |  FROM flat GROUP BY 1, 2),
         |d AS (SELECT f.vec_id, f.label,
         |    CAST(sum((f.v - c.m) * (f.v - c.m)) AS BIGINT) AS d2
         |  FROM flat f JOIN comp c ON c.label = f.label AND c.i = f.i
         |  GROUP BY 1, 2),
         |st AS (SELECT label, count(*) AS n_vecs,
         |    CAST(sum(d2) AS BIGINT) AS sum_d2 FROM d GROUP BY 1)
         |SELECT d.label, max(st.n_vecs) AS n_vecs,
         |  CAST(count(*) FILTER (WHERE d.d2 * st.n_vecs > 4 * st.sum_d2)
         |    AS BIGINT) AS n_outliers,
         |  max(d.d2) AS max_d2,
         |  CAST(max(st.sum_d2) AS DOUBLE) / CAST(max(st.n_vecs) AS DOUBLE)
         |    AS mean_d2
         |FROM d JOIN st ON st.label = d.label
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_watermark_plan" ->
      s"""WITH f AS (${ChangeFeed.duckFromEvents}),
         |p AS (SELECT table_name, user_id, event_id,
         |    epoch_us(ts) AS ts_us,
         |    CASE WHEN user_id % 5 = 0 THEN -event_id ELSE event_id END
         |      AS delivery_pos
         |  FROM f),
         |r AS (SELECT table_name, user_id, ts_us,
         |    max(ts_us) OVER (PARTITION BY table_name, user_id
         |      ORDER BY delivery_pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS prev_max_us
         |  FROM p),
         |x AS (SELECT table_name,
         |    CASE WHEN prev_max_us IS NOT NULL AND ts_us < prev_max_us
         |      THEN prev_max_us - ts_us END AS late_us
         |  FROM r)
         |SELECT table_name, count(*) AS n_events,
         |  CAST(count(late_us) AS BIGINT) AS n_late,
         |  COALESCE(CAST(sum(late_us) AS BIGINT), 0) AS sum_late_us,
         |  COALESCE(max(late_us), 0) AS max_late_us,
         |  CAST(count(*) FILTER (WHERE late_us > 1000000) AS BIGINT)
         |    AS n_drop_w1s,
         |  CAST(count(*) FILTER (WHERE late_us > 5000000) AS BIGINT)
         |    AS n_drop_w5s,
         |  COALESCE(max(late_us), 0) AS recommended_watermark_us
         |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_bloom_decontaminate" ->
      s"""WITH shf AS (${Dedup.duckShingles}),
         |ev AS (SELECT DISTINCT s.shingle
         |  FROM shf s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source = 'src0'),
         |fpos AS (SELECT DISTINCT pos FROM (
         |  SELECT ${Portable.duckHash("shingle", 0)} % 8192 AS pos FROM ev
         |  UNION ALL
         |  SELECT ${Portable.duckHash("shingle", 1)} % 8192 FROM ev
         |  UNION ALL
         |  SELECT ${Portable.duckHash("shingle", 2)} % 8192 FROM ev)),
         |cs AS (SELECT DISTINCT s.doc_id, s.shingle
         |  FROM shf s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source <> 'src0'),
         |h AS (SELECT doc_id, shingle,
         |    (${Portable.duckHash("shingle", 0)} % 8192 IN (SELECT pos FROM fpos)
         |     AND ${Portable.duckHash("shingle", 1)} % 8192 IN (SELECT pos FROM fpos)
         |     AND ${Portable.duckHash("shingle", 2)} % 8192 IN (SELECT pos FROM fpos))
         |      AS bloom_hit,
         |    shingle IN (SELECT shingle FROM ev) AS exact_hit
         |  FROM cs),
         |sc AS (SELECT doc_id, count(*) AS n_shingles,
         |    CAST(count(*) FILTER (WHERE bloom_hit) AS BIGINT) AS n_bloom_hits,
         |    CAST(count(*) FILTER (WHERE exact_hit) AS BIGINT) AS n_exact_hits
         |  FROM h GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(sc.n_shingles, 0) AS n_shingles,
         |  COALESCE(sc.n_bloom_hits, 0) AS n_bloom_hits,
         |  COALESCE(sc.n_exact_hits, 0) AS n_exact_hits,
         |  COALESCE(sc.n_bloom_hits, 0) - COALESCE(sc.n_exact_hits, 0)
         |    AS n_false_positives,
         |  COALESCE(sc.n_bloom_hits, 0) > 0 AS flagged
         |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         |WHERE d.source <> 'src0' ORDER BY 1""".stripMargin,

    "embed_pq" ->
      s"""WITH ${pqCtes(pqRawHead)}
         |SELECT CAST(sub AS BIGINT) AS subspace, code,
         |  count(*) AS n_vecs,
         |  CAST(sum(d2) AS BIGINT) AS sum_d2,
         |  CAST(sum(d2) AS DOUBLE) / count(*) AS avg_d2
         |FROM best WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "sim_ann_pq" ->
      s"""WITH ${pqCtes(pqNormHead)},
         |codes AS (SELECT vec_id, sub, code FROM best WHERE rk = 1),
         |pflat AS (SELECT vec_id AS probe_id, sub, il, v FROM f
         |  WHERE vec_id < ${Similarity.NumProbes}),
         |lut AS (SELECT p.probe_id, c.sub, c.code,
         |    CAST(sum((p.v - c.m) * (p.v - c.m)) AS BIGINT) AS pd2
         |  FROM pflat p JOIN comp c ON c.sub = p.sub AND c.il = p.il
         |  GROUP BY 1, 2, 3),
         |sc AS (SELECT l.probe_id, cd.vec_id AS neighbor_id,
         |    CAST(sum(l.pd2) AS BIGINT) AS approx_d2
         |  FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.code = cd.code
         |  WHERE cd.vec_id <> l.probe_id
         |  GROUP BY 1, 2),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY approx_d2, neighbor_id) AS BIGINT) AS rk FROM sc)
         |SELECT probe_id, neighbor_id, approx_d2, rk FROM r
         |WHERE rk <= ${Similarity.TopK} ORDER BY probe_id, rk""".stripMargin,

    "sim_ann_ivf_pq" ->
      s"""WITH $embCtes,
         |${pqCtes(pqNormHead)},
         |$ivfPqCtes
         |SELECT probe_id, neighbor_id, approx_d2, rk FROM ipqr
         |WHERE rk <= ${Similarity.TopK} ORDER BY probe_id, rk""".stripMargin,

    "sim_ann_ivf_pq_recall" ->
      s"""WITH $embCtes,
         |${pqCtes(pqNormHead)},
         |$ivfPqCtes,
         |$exactTopKCtes,
         |ak AS (SELECT probe_id, neighbor_id FROM ipqr
         |  WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(a.neighbor_id) AS DOUBLE) / count(*) AS recall_at_k
         |FROM bfk b LEFT JOIN ak a ON a.probe_id = b.probe_id
         |  AND a.neighbor_id = b.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Exact baseline from the RAW quantized chain (embCtes — the
    // same relation sim_topk_bruteforce ranks); the ADC side runs on
    // the normalized chain it actually stores. Disjoint CTE names.
    "sim_ann_pq_recall" ->
      s"""WITH $embCtes,
         |${pqCtes(pqNormHead)},
         |$exactTopKCtes,
         |codes AS (SELECT vec_id, sub, code FROM best WHERE rk = 1),
         |pflat AS (SELECT vec_id AS probe_id, sub, il, v FROM f
         |  WHERE vec_id < ${Similarity.NumProbes}),
         |lut AS (SELECT p.probe_id, c.sub, c.code,
         |    CAST(sum((p.v - c.m) * (p.v - c.m)) AS BIGINT) AS pd2
         |  FROM pflat p JOIN comp c ON c.sub = p.sub AND c.il = p.il
         |  GROUP BY 1, 2, 3),
         |sc AS (SELECT l.probe_id, cd.vec_id AS neighbor_id,
         |    CAST(sum(l.pd2) AS BIGINT) AS approx_d2
         |  FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.code = cd.code
         |  WHERE cd.vec_id <> l.probe_id
         |  GROUP BY 1, 2),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY approx_d2, neighbor_id) AS rk FROM sc),
         |ak AS (SELECT probe_id, neighbor_id FROM ar
         |  WHERE rk <= ${Similarity.TopK})
         |SELECT b.probe_id,
         |  CAST(count(a.neighbor_id) AS DOUBLE) / count(*) AS recall_at_k
         |FROM bfk b LEFT JOIN ak a ON a.probe_id = b.probe_id
         |  AND a.neighbor_id = b.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // dedup_ngram_jaccard's verify chain (exact intersections over
    // banding candidates), integer keep test at τ=80, then the same
    // recursive-CC + removal rollup as the other two impact gauges.
    "corpus_minhash_impact" ->
      s"""WITH RECURSIVE $minhashCtes,
         |shd AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |sizes AS (SELECT doc_id, count(*) AS set_size FROM shd GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS n_inter
         |  FROM cand c
         |  JOIN shd x ON x.doc_id = c.d1
         |  JOIN shd y ON y.doc_id = c.d2 AND y.shingle = x.shingle
         |  GROUP BY 1, 2),
         |ver AS (SELECT i.d1, i.d2 FROM inter i
         |  JOIN sizes sa ON sa.doc_id = i.d1
         |  JOIN sizes sb ON sb.doc_id = i.d2
         |  WHERE 100 * i.n_inter >= ${Dedup.MinhashImpactTau}
         |    * (sa.set_size + sb.set_size - i.n_inter)),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM ver
         |  UNION ALL SELECT d2 AS src, d1 AS dst FROM ver),
         |reach AS (SELECT src AS v, src AS label FROM edges
         |  UNION
         |  SELECT e.src AS v, r.label AS label
         |  FROM edges e JOIN reach r ON r.v = e.dst),
         |lab AS (SELECT v, min(label) AS label FROM reach GROUP BY v),
         |mk AS (SELECT doc.source, doc.n_chars,
         |    CASE WHEN l.v IS NULL OR l.label = doc.doc_id THEN 1
         |      ELSE 0 END AS keep
         |  FROM documents doc LEFT JOIN lab l ON l.v = doc.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(1 - keep) AS BIGINT) AS n_removed,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
         |  CAST(sum((1 - keep) * n_chars) AS BIGINT) AS chars_removed,
         |  CAST(CAST(sum(1 - keep) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS docs_removed_share,
         |  CAST(CAST(sum((1 - keep) * n_chars) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
         |    AS chars_removed_share
         |FROM mk GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same verified-CC chain as corpus_minhash_impact; winners are
    // the label-fixed-point rows, losers everything else.
    "corpus_dup_survivorship" ->
      s"""WITH RECURSIVE $minhashCtes,
         |shd AS (SELECT DISTINCT doc_id, shingle FROM shf),
         |sizes AS (SELECT doc_id, count(*) AS set_size FROM shd GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS n_inter
         |  FROM cand c
         |  JOIN shd x ON x.doc_id = c.d1
         |  JOIN shd y ON y.doc_id = c.d2 AND y.shingle = x.shingle
         |  GROUP BY 1, 2),
         |ver AS (SELECT i.d1, i.d2 FROM inter i
         |  JOIN sizes sa ON sa.doc_id = i.d1
         |  JOIN sizes sb ON sb.doc_id = i.d2
         |  WHERE 100 * i.n_inter >= ${Dedup.MinhashImpactTau}
         |    * (sa.set_size + sb.set_size - i.n_inter)),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM ver
         |  UNION ALL SELECT d2 AS src, d1 AS dst FROM ver),
         |reach AS (SELECT src AS v, src AS label FROM edges
         |  UNION
         |  SELECT e.src AS v, r.label AS label
         |  FROM edges e JOIN reach r ON r.v = e.dst),
         |lab AS (SELECT v, min(label) AS label FROM reach GROUP BY v),
         |win AS (SELECT l.label, d.source AS winner_source
         |  FROM lab l JOIN documents d ON d.doc_id = l.v
         |  WHERE l.v = l.label),
         |lose AS (SELECT l.label, d.source, d.n_chars
         |  FROM lab l JOIN documents d ON d.doc_id = l.v
         |  WHERE l.v <> l.label)
         |SELECT w.winner_source, lo.source AS loser_source,
         |  count(*) AS n_docs_lost,
         |  CAST(sum(lo.n_chars) AS BIGINT) AS chars_lost
         |FROM lose lo JOIN win w ON w.label = lo.label
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same recursive-CC chain as dedup_embedding_clusters, then the
    // removal rollup joined onto documents (vec_id = doc_id space).
    "corpus_semdedup_impact" ->
      s"""WITH RECURSIVE $embCtes,
         |$srpCtes,
         |${cappedBucketsSql("skb")},
         |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |  FROM skb a JOIN skb b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |d AS (SELECT c.v1, c.v2, CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN flat fa ON fa.vec_id = c.v1
         |  JOIN flat fb ON fb.vec_id = c.v2 AND fb.i = fa.i
         |  GROUP BY 1, 2),
         |pairs AS (SELECT d.v1, d.v2 FROM d
         |  JOIN norms na ON na.vec_id = d.v1
         |  JOIN norms nb ON nb.vec_id = d.v2
         |  WHERE na.n2 > 0 AND nb.n2 > 0
         |    AND $cosSql >= CAST(${Dedup.CosineTau} AS DOUBLE)),
         |edges AS (SELECT v1 AS src, v2 AS dst FROM pairs
         |  UNION ALL SELECT v2 AS src, v1 AS dst FROM pairs),
         |reach AS (SELECT src AS v, src AS label FROM edges
         |  UNION
         |  SELECT e.src AS v, r.label AS label
         |  FROM edges e JOIN reach r ON r.v = e.dst),
         |lab AS (SELECT v, min(label) AS label FROM reach GROUP BY v),
         |mk AS (SELECT doc.source, doc.n_chars,
         |    CASE WHEN l.v IS NULL OR l.label = doc.doc_id THEN 1
         |      ELSE 0 END AS keep
         |  FROM documents doc LEFT JOIN lab l ON l.v = doc.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(1 - keep) AS BIGINT) AS n_removed,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
         |  CAST(sum((1 - keep) * n_chars) AS BIGINT) AS chars_removed,
         |  CAST(CAST(sum(1 - keep) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS docs_removed_share,
         |  CAST(CAST(sum((1 - keep) * n_chars) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
         |    AS chars_removed_share
         |FROM mk GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_embedding_clusters" ->
      s"""WITH RECURSIVE $embCtes,
         |$srpCtes,
         |${cappedBucketsSql("skb")},
         |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |  FROM skb a JOIN skb b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |d AS (SELECT c.v1, c.v2, CAST(sum(fa.v * fb.v) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN flat fa ON fa.vec_id = c.v1
         |  JOIN flat fb ON fb.vec_id = c.v2 AND fb.i = fa.i
         |  GROUP BY 1, 2),
         |pairs AS (SELECT d.v1, d.v2 FROM d
         |  JOIN norms na ON na.vec_id = d.v1
         |  JOIN norms nb ON nb.vec_id = d.v2
         |  WHERE na.n2 > 0 AND nb.n2 > 0
         |    AND $cosSql >= CAST(${Dedup.CosineTau} AS DOUBLE)),
         |edges AS (SELECT v1 AS src, v2 AS dst FROM pairs
         |  UNION ALL SELECT v2 AS src, v1 AS dst FROM pairs),
         |reach AS (SELECT src AS v, src AS label FROM edges
         |  UNION
         |  SELECT e.src AS v, r.label AS label
         |  FROM edges e JOIN reach r ON r.v = e.dst),
         |lab AS (SELECT v, min(label) AS label FROM reach GROUP BY v)
         |SELECT label AS cluster_id, count(*) AS n_vecs, max(v) AS max_vec_id
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_funnel" -> {
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH shf AS (${Dedup.duckShingles}),
         |ev AS (SELECT DISTINCT s.shingle
         |  FROM shf s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source = 'src0'),
         |cs AS (SELECT DISTINCT s.doc_id, s.shingle
         |  FROM shf s JOIN documents d ON d.doc_id = s.doc_id
         |  WHERE d.source <> 'src0'),
         |ovl AS (SELECT c.doc_id, count(e.shingle) AS n_overlap
         |  FROM cs c LEFT JOIN ev e ON e.shingle = c.shingle
         |  GROUP BY 1),
         |s AS (SELECT doc_id, source,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |  CAST(list_sum(list_transform($toksT, x -> length(x))) AS BIGINT) AS sum_len,
         |  md5($normT) AS fp
         |FROM documents WHERE source <> 'src0'),
         |q AS (SELECT *,
         |  CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE) ELSE
         |    CAST(0.4 AS DOUBLE) * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |    + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |    + CAST(0.3 AS DOUBLE) * least((CAST(sum_len AS DOUBLE) / $nTok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |  END AS quality_score,
         |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |FROM s),
         |j AS (SELECT q.*, COALESCE(ovl.n_overlap, 0) AS n_overlap,
         |    q.quality_score >= CAST(0.5 AS DOUBLE) AS kq,
         |    q.quality_score >= CAST(0.5 AS DOUBLE) AND q.rn = 1 AS kc,
         |    q.quality_score >= CAST(0.5 AS DOUBLE) AND q.rn = 1
         |      AND COALESCE(ovl.n_overlap, 0) = 0 AS kd
         |  FROM q LEFT JOIN ovl ON ovl.doc_id = q.doc_id)
         |SELECT source, count(*) AS n_raw,
         |  CAST(count(*) FILTER (WHERE kq) AS BIGINT) AS n_quality,
         |  CAST(count(*) FILTER (WHERE kc) AS BIGINT) AS n_canonical,
         |  CAST(count(*) FILTER (WHERE kd) AS BIGINT) AS n_final,
         |  COALESCE(CAST(sum(n_tokens) FILTER (WHERE kd) AS BIGINT), 0)
         |    AS tokens_final
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // The audio-features oracle recomputes what a correct PCM parse
    // must find: sample k of audio doc id is (id·31+k) mod 256 (the
    // synthesized-content formula, see multimodal_decode), centered
    // at the unsigned midpoint 128.
    "multimodal_audio_features" ->
      s"""WITH a AS (SELECT doc_id,
         |    8000 + (doc_id % 5) * 2000 AS rate,
         |    64 + doc_id % 101 AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |s AS (SELECT doc_id, rate, n, unnest(range(0, n)) AS k FROM a),
         |d AS (SELECT doc_id, rate, n, k,
         |    (doc_id * 31 + k) % 256 - 128 AS dev FROM s),
         |x AS (SELECT *, lag(dev) OVER (PARTITION BY doc_id ORDER BY k)
         |    AS prev FROM d)
         |SELECT doc_id,
         |  CAST(max(rate) AS BIGINT) AS sample_rate,
         |  CAST(max(n) AS BIGINT) AS n_samples,
         |  CAST(sum(dev * dev) AS BIGINT) AS sum_sq_dev,
         |  CAST(count(*) FILTER (WHERE prev IS NOT NULL
         |    AND (dev < 0) <> (prev < 0)) AS BIGINT) AS n_zero_cross,
         |  CAST(max(abs(dev)) AS BIGINT) AS peak_dev,
         |  CAST(max(n) * 1000000 // max(rate) AS BIGINT) AS duration_us
         |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    // Fingerprint oracle: recomputes the windowed energies from the
    // synthesized-content formula (dev = (doc_id·31+k) mod 256 − 128
    // over the data chunk), then folds the strict-increase bits
    // MSB-first exactly as the parser does.
    "multimodal_audio_fingerprint" ->
      s"""WITH a AS (SELECT doc_id, 64 + doc_id % 101 AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |s AS (SELECT doc_id,
         |    unnest(range(0, (n // ${Binary.AudioFpWindow})
         |      * ${Binary.AudioFpWindow})) AS k
         |  FROM a),
         |d AS (SELECT doc_id, k // ${Binary.AudioFpWindow} AS w,
         |    (doc_id * 31 + k) % 256 - 128 AS dev FROM s),
         |e AS (SELECT doc_id, w, sum(dev * dev) AS en
         |  FROM d GROUP BY 1, 2),
         |b AS (SELECT doc_id, w, en,
         |    lag(en) OVER (PARTITION BY doc_id ORDER BY w) AS prev FROM e),
         |nwc AS (SELECT doc_id, max(w) + 1 AS nw FROM e GROUP BY 1),
         |f AS (SELECT b.doc_id, CAST(nwc.nw AS BIGINT) AS n_windows,
         |    CAST(coalesce(sum(CASE WHEN b.prev IS NOT NULL AND b.en > b.prev
         |      THEN CAST(1 AS BIGINT) << CAST(nwc.nw - 1 - b.w AS INT)
         |      ELSE 0 END), 0) AS BIGINT) AS fingerprint
         |  FROM b JOIN nwc ON nwc.doc_id = b.doc_id GROUP BY 1, 2)
         |SELECT n_windows, fingerprint, count(*) AS n_docs,
         |  min(doc_id) AS canonical_id
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Video-fingerprint oracle: same luma recomputation as the
    // scene-cut oracle, then the LSB-first strict-increase fold
    // (transition into frame i -> bit i-1, capped at the 63rd).
    "multimodal_video_fingerprint" ->
      s"""WITH v AS (SELECT doc_id,
         |    4 + 2 * (doc_id % 6) AS w,
         |    2 + 2 * (doc_id % 4) AS h,
         |    1 + doc_id % 3 AS frames
         |  FROM documents WHERE doc_id % 3 = 2),
         |fr AS (SELECT doc_id, w, h, frames, w * h * 3 // 2 AS fb,
         |    unnest(range(0, frames)) AS i FROM v),
         |luma AS (SELECT doc_id, frames, i,
         |    CAST(list_sum(list_transform(range(i * fb, i * fb + w * h),
         |      k -> (doc_id * 31 + k) % 256)) AS BIGINT) AS ls
         |  FROM fr),
         |b AS (SELECT doc_id, frames, i, ls,
         |    lag(ls) OVER (PARTITION BY doc_id ORDER BY i) AS prev
         |  FROM luma),
         |f AS (SELECT doc_id, CAST(max(frames) AS BIGINT) AS n_frames,
         |    CAST(coalesce(sum(CASE WHEN prev IS NOT NULL AND ls > prev
         |        AND i <= 63
         |      THEN CAST(1 AS BIGINT) << CAST(i - 1 AS INT)
         |      ELSE 0 END), 0) AS BIGINT) AS fingerprint
         |  FROM b GROUP BY 1)
         |SELECT n_frames, fingerprint, count(*) AS n_docs,
         |  min(doc_id) AS canonical_id
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Scene-cut oracle: frame i's luma plane covers content bytes
    // [i·(w·h·3/2), i·(w·h·3/2)+w·h) of the C420 stream (the frame
    // walk's luma_sum definition); diffs via lag, same as the engine.
    "multimodal_scene_cuts" ->
      s"""WITH v AS (SELECT doc_id,
         |    4 + 2 * (doc_id % 6) AS w,
         |    2 + 2 * (doc_id % 4) AS h,
         |    1 + doc_id % 3 AS frames
         |  FROM documents WHERE doc_id % 3 = 2),
         |fr AS (SELECT doc_id, w, h, frames, w * h * 3 // 2 AS fb,
         |    unnest(range(0, frames)) AS i FROM v),
         |luma AS (SELECT doc_id, frames, i,
         |    CAST(list_sum(list_transform(range(i * fb, i * fb + w * h),
         |      k -> (doc_id * 31 + k) % 256)) AS BIGINT) AS ls
         |  FROM fr),
         |d AS (SELECT doc_id, frames, ls,
         |    abs(ls - lag(ls) OVER (PARTITION BY doc_id ORDER BY i)) AS diff
         |  FROM luma)
         |SELECT doc_id, CAST(max(frames) AS BIGINT) AS n_frames,
         |  COALESCE(CAST(sum(diff) AS BIGINT), 0) AS sum_abs_diff,
         |  CAST(count(*) FILTER (WHERE diff > 100) AS BIGINT) AS n_cuts,
         |  COALESCE(CAST(max(diff) AS BIGINT), 0) AS max_diff
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // Image-features oracle: pixel content byte j of image doc id is
    // (id·31+j) mod 256 with j running row-major over w·3-byte pixel
    // rows (padding excluded by construction); BMP stores BGR, and
    // since w·3 ≡ 0 (mod 3) the channel of byte j is j mod 3.
    // container sizes recomputed from the per-kind format layout:
    // BMP 54 + stride*h, WAV 44 + n, Y4M header + frames*(6 + fb)
    "multimodal_mix" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    CASE CAST(doc_id % 3 AS INT)
         |      WHEN 0 THEN 54 +
         |        ((((4 + doc_id % 13) * 3 + 3) // 4) * 4) * (3 + doc_id % 7)
         |      WHEN 1 THEN 44 + 64 + doc_id % 101
         |      ELSE length('YUV4MPEG2 W'
         |          || CAST(4 + 2 * (doc_id % 6) AS VARCHAR) || ' H'
         |          || CAST(2 + 2 * (doc_id % 4) AS VARCHAR)
         |          || ' F25:1 Ip A1:1 C420') + 1
         |        + (1 + doc_id % 3) * (6 +
         |          ((4 + 2 * (doc_id % 6)) * (2 + 2 * (doc_id % 4)) * 3) // 2)
         |      END AS n_bytes
         |  FROM documents)
         |SELECT source, kind, count(*) AS n_docs,
         |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes
         |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "multimodal_video_halfrate" ->
      s"""WITH d AS (SELECT doc_id,
         |    ((4 + 2 * (doc_id % 6)) * (2 + 2 * (doc_id % 4)) * 3) // 2 AS fb,
         |    (4 + 2 * (doc_id % 6)) * (2 + 2 * (doc_id % 4)) AS wh,
         |    1 + doc_id % 3 AS nf
         |  FROM documents WHERE doc_id % 3 = 2),
         |f AS (SELECT doc_id, fb, wh, nf, unnest(range(nf)) AS fi FROM d),
         |v AS (SELECT doc_id, fi, fi % 2 = 0 AS kept,
         |    CAST(list_sum(list_transform(range(fi * fb, (fi + 1) * fb),
         |      k -> (doc_id * 31 + k) % 256)) AS BIGINT) AS frame_sum,
         |    CAST(list_sum(list_transform(range(fi * fb, fi * fb + wh),
         |      k -> (doc_id * 31 + k) % 256)) AS BIGINT) AS luma_sum
         |  FROM f)
         |SELECT doc_id, count(*) AS n_frames,
         |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN kept THEN frame_sum ELSE 0 END) AS BIGINT)
         |    AS kept_frame_sum,
         |  CAST(sum(CASE WHEN kept THEN luma_sum ELSE 0 END) AS BIGINT)
         |    AS kept_luma_sum
         |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,

    "multimodal_audio_decimate" ->
      s"""WITH au AS (SELECT doc_id,
         |    8000 + (doc_id % 5) * 2000 AS rate, 64 + doc_id % 101 AS n
         |  FROM documents WHERE doc_id % 3 = 1)
         |SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate,
         |  CAST(n AS BIGINT) AS n_samples,
         |  CAST((n + 1) // 2 AS BIGINT) AS n_kept,
         |  CAST(list_sum(list_transform(range(0, n, 2),
         |    k -> (doc_id * 31 + k) % 256)) AS BIGINT) AS kept_sum,
         |  CAST(list_max(list_transform(range(0, n, 2),
         |    k -> abs((doc_id * 31 + k) % 256 - 128))) AS BIGINT)
         |    AS kept_peak_dev,
         |  CAST(rate // 2 AS BIGINT) AS out_rate
         |FROM au ORDER BY doc_id""".stripMargin,

    "multimodal_thumbnail" ->
      s"""WITH im AS (SELECT doc_id,
         |    4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |px AS (SELECT doc_id, w, h,
         |    CAST(list_sum(list_transform(range(0, 3),
         |      c -> (doc_id * 31 + (0 * w * 3 + 0 * 3 + c)) % 256))
         |      AS BIGINT) AS p00,
         |    CAST(list_sum(list_transform(range(0, 3),
         |      c -> (doc_id * 31 + (0 * w * 3 + (w // 2) * 3 + c)) % 256))
         |      AS BIGINT) AS p01,
         |    CAST(list_sum(list_transform(range(0, 3),
         |      c -> (doc_id * 31 + ((h // 2) * w * 3 + 0 * 3 + c)) % 256))
         |      AS BIGINT) AS p10,
         |    CAST(list_sum(list_transform(range(0, 3),
         |      c -> (doc_id * 31 + ((h // 2) * w * 3 + (w // 2) * 3 + c)) % 256))
         |      AS BIGINT) AS p11
         |  FROM im)
         |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  p00, p01, p10, p11,
         |  p00 + p01 + p10 + p11 AS thumb_sum
         |FROM px ORDER BY doc_id""".stripMargin,

    "multimodal_image_features" ->
      s"""WITH im AS (SELECT doc_id,
         |    4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |b AS (SELECT doc_id, w, h,
         |    unnest(range(0, w * h * 3)) AS j FROM im),
         |v AS (SELECT doc_id, w, h, j % 3 AS ch,
         |    (doc_id * 31 + j) % 256 AS byte FROM b)
         |SELECT doc_id,
         |  CAST(max(w) AS BIGINT) AS width,
         |  CAST(max(h) AS BIGINT) AS height,
         |  CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
         |  CAST(sum(byte) FILTER (WHERE ch = 0) AS BIGINT) AS sum_b,
         |  CAST(sum(byte) FILTER (WHERE ch = 1) AS BIGINT) AS sum_g,
         |  CAST(sum(byte) FILTER (WHERE ch = 2) AS BIGINT) AS sum_r,
         |  CAST(sum(byte) AS DOUBLE) / (CAST(3 AS DOUBLE) * max(w) * max(h))
         |    AS mean_brightness
         |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,

    // The Laplacian is recomputed arithmetically from the generator's
    // closed form (byte k = (id·31+k) % 256): s_at(j) is the pixel-j
    // channel sum, neighbors are j±1 / j±w — no byte materialization.
    // The engine's storage-order walk is a vertical mirror of this
    // content-order walk; the moment sums are invariant to it.
    "multimodal_blur" -> {
      def sAt(j: String): String =
        s"""(((doc_id * 31 + ($j) * 3) % 256)
           | + ((doc_id * 31 + ($j) * 3 + 1) % 256)
           | + ((doc_id * 31 + ($j) * 3 + 2) % 256))""".stripMargin
      val lap = s"4 * ${sAt("j")} - ${sAt("j - 1")} - ${sAt("j + 1")}" +
        s" - ${sAt("j - w")} - ${sAt("j + w")}"
      s"""WITH im AS (SELECT doc_id,
         |    4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |px AS (SELECT doc_id, w, h, j, j % w AS x, j // w AS y
         |  FROM (SELECT doc_id, w, h,
         |    unnest(range(0, w * h)) AS j FROM im)),
         |lp AS (SELECT doc_id, w, h,
         |    CAST($lap AS BIGINT) AS lap
         |  FROM px
         |  WHERE x BETWEEN 1 AND w - 2 AND y BETWEEN 1 AND h - 2),
         |g AS (SELECT doc_id, max(w) AS w, max(h) AS h,
         |    CAST(count(*) AS BIGINT) AS n_interior,
         |    CAST(sum(lap) AS BIGINT) AS sum_lap,
         |    CAST(sum(lap * lap) AS BIGINT) AS sum_lap_sq
         |  FROM lp GROUP BY 1)
         |SELECT doc_id, CAST(w AS BIGINT) AS width,
         |  CAST(h AS BIGINT) AS height, n_interior, sum_lap, sum_lap_sq,
         |  CAST(n_interior * sum_lap_sq - sum_lap * sum_lap AS DOUBLE)
         |    / CAST(n_interior * n_interior AS DOUBLE) AS var_lap
         |FROM g ORDER BY doc_id""".stripMargin
    },

    // Same byte arithmetic as multimodal_image_features' oracle, with
    // the per-pixel 3-byte fold into the 64-cell (b,g,r)÷64 bucket.
    "multimodal_palette" ->
      s"""WITH im AS (SELECT doc_id,
         |    4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |b AS (SELECT doc_id, w, h,
         |    unnest(range(0, w * h * 3)) AS j FROM im),
         |v AS (SELECT doc_id, w, h, j // 3 AS pix, j % 3 AS ch,
         |    (doc_id * 31 + j) % 256 AS byte FROM b),
         |cells AS (SELECT doc_id, w, h, pix,
         |    CAST(sum(CASE CAST(ch AS INT)
         |      WHEN 0 THEN (byte // 64) * 16
         |      WHEN 1 THEN (byte // 64) * 4
         |      ELSE byte // 64 END) AS BIGINT) AS cell
         |  FROM v GROUP BY 1, 2, 3, 4),
         |cc AS (SELECT doc_id, w, h, cell, count(*) AS cnt
         |  FROM cells GROUP BY 1, 2, 3, 4),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY cnt DESC, cell) AS rk,
         |    count(*) OVER (PARTITION BY doc_id) AS n_cells
         |  FROM cc)
         |SELECT doc_id, CAST(w AS BIGINT) AS width,
         |  CAST(h AS BIGINT) AS height,
         |  CAST(w * h AS BIGINT) AS n_pixels,
         |  CAST(n_cells AS BIGINT) AS n_cells_used,
         |  cell AS top_cell, CAST(cnt AS BIGINT) AS top_count,
         |  CAST(cnt AS DOUBLE) / CAST(w * h AS DOUBLE) AS top_share
         |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "events_interarrival" ->
      s"""WITH g AS (SELECT event_type,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
         |  FROM events WHERE ts IS NOT NULL)
         |SELECT event_type,
         |  CAST(CASE WHEN gap_us = 0 THEN -1
         |    ELSE length(bin(gap_us)) - 1 END AS BIGINT) AS bucket,
         |  count(*) AS n,
         |  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
         |  CAST(max(gap_us) AS BIGINT) AS max_gap_us
         |FROM g WHERE gap_us IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The planted copies are full-row identical, so the oracle counts
    // them arithmetically (1 + %7 + %21) instead of materializing the
    // redelivered union the Spark side dedups.
    "cdc_idempotent_apply" ->
      s"""$C,
         |d AS (SELECT table_name, user_id, event_id, ts, op, value,
         |    1 + CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END
         |      + CASE WHEN event_id % 21 = 0 THEN 1 ELSE 0 END AS n_copies
         |  FROM c),
         |led AS (SELECT table_name,
         |    CAST(sum(n_copies) AS BIGINT) AS n_delivered,
         |    count(*) AS n_unique,
         |    CAST(sum(n_copies - 1) AS BIGINT) AS n_dup_dropped
         |  FROM d GROUP BY 1),
         |latest AS (SELECT * FROM (SELECT d.*, row_number() OVER (
         |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM d) WHERE rn = 1),
         |live AS (SELECT table_name, count(*) AS n_keys_live,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_live_value
         |  FROM latest WHERE op <> 'delete' GROUP BY 1)
         |SELECT l.table_name, l.n_delivered, l.n_unique, l.n_dup_dropped,
         |  v.n_keys_live, v.sum_live_value
         |FROM led l LEFT JOIN live v ON v.table_name = l.table_name
         |ORDER BY 1""".stripMargin,

    // Same exact-integer LM CTEs as text_unigram_lm; the gate is a
    // pure rank cut over (score, doc_id) with tokenless docs scored
    // -1.0 so "unscored" sorts into the dropped band on both engines.
    "text_perplexity_filter" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksT) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
         |sc AS (SELECT doc_id, count(*) AS n_tokens,
         |    CAST(sum(length(bin(tf)) - 1) AS BIGINT) AS sum_log2_tf
         |  FROM toks JOIN tf USING (tok) GROUP BY doc_id),
         |lm AS (SELECT d.doc_id,
         |    COALESCE(sc.n_tokens, 0) AS n_tokens,
         |    CAST(sc.sum_log2_tf AS DOUBLE) / CAST(sc.n_tokens AS DOUBLE)
         |      AS avg_log2_tf
         |  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
         |r AS (SELECT *, COALESCE(avg_log2_tf, CAST(-1.0 AS DOUBLE)) AS score
         |  FROM lm),
         |k AS (SELECT *, row_number() OVER (ORDER BY score, doc_id) AS pos,
         |    count(*) OVER () AS n_docs FROM r)
         |SELECT doc_id, n_tokens, avg_log2_tf, CAST(pos AS BIGINT) AS pos,
         |  pos > (n_docs * 25 + 99) // 100 AS kept
         |FROM k ORDER BY doc_id""".stripMargin,

    // Relational twin of the one-pass sufficient-statistic aggregate:
    // the component self-join the custom vec_outer_sum avoids.
    "embed_covariance" ->
      s"""WITH q AS (SELECT vec_id,
         |    ${Vectors.duckQuantize("embedding")} AS q FROM embeddings),
         |e AS (SELECT vec_id,
         |    CAST(generate_subscripts(q, 1) - 1 AS BIGINT) AS i,
         |    unnest(q) AS x FROM q),
         |s AS (SELECT i, CAST(sum(x) AS BIGINT) AS sum_x FROM e GROUP BY 1),
         |p AS (SELECT a.i AS i, b.i AS j,
         |    CAST(sum(a.x * b.x) AS BIGINT) AS sum_ij
         |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY 1, 2),
         |n AS (SELECT count(*) AS n FROM q)
         |SELECT p.i, p.j, n.n, sa.sum_x AS sum_i, sb.sum_x AS sum_j,
         |  p.sum_ij,
         |  (CAST(n.n AS DOUBLE) * CAST(p.sum_ij AS DOUBLE)
         |      - CAST(sa.sum_x AS DOUBLE) * CAST(sb.sum_x AS DOUBLE))
         |    / (CAST(n.n AS DOUBLE) * CAST(n.n - 1 AS DOUBLE)) AS cov
         |FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
         |  CROSS JOIN n
         |ORDER BY 1, 2""".stripMargin,

    // Unrolled 3-iteration power method — every step exact integer
    // (truncating //, matching Spark's div toward-zero semantics);
    // lambda is the single long->double division both engines share.
    "embed_pca_power" ->
      s"""$pcaV3Ctes,
         |ul AS (SELECT m.i, CAST(sum(m.m * v.v) AS BIGINT) AS u
         |  FROM m JOIN v3 v ON v.i = m.j GROUP BY 1),
         |ray AS (SELECT CAST(sum(v.v * u.u) AS BIGINT) AS ray_num,
         |    CAST(sum(v.v * v.v) AS BIGINT) AS ray_den
         |  FROM v3 v JOIN ul u ON u.i = v.i)
         |SELECT v.i, v.v, ray.ray_num, ray.ray_den,
         |  CAST(ray.ray_num AS DOUBLE) / CAST(ray.ray_den AS DOUBLE)
         |    AS lambda
         |FROM v3 v, ray ORDER BY v.i""".stripMargin,

    // Rides the SAME unrolled power-method CTEs; the projection is
    // exact int64, Σs² exact via HUGEINT, mean/var fixed double
    // expressions over the exact sums.
    "embed_subspace_energy" ->
      s"""$pcaV3Ctes,
         |proj AS (SELECT e.vec_id, CAST(sum(e.x * v.v) AS BIGINT) AS s
         |  FROM e JOIN v3 v ON v.i = e.i GROUP BY 1),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |st AS (SELECT l.label, count(*) AS n,
         |    CAST(sum(p.s) AS BIGINT) AS sum_s,
         |    CAST(sum(CAST(p.s AS HUGEINT) * p.s) AS BIGINT) AS sum_s2
         |  FROM proj p JOIN lab l ON l.vec_id = p.vec_id
         |  GROUP BY 1)
         |SELECT label, n, sum_s, sum_s2,
         |  CAST(sum_s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_s,
         |  CASE WHEN n > 1 THEN
         |    (CAST(n AS DOUBLE) * CAST(sum_s2 AS DOUBLE)
         |      - CAST(sum_s AS DOUBLE) * CAST(sum_s AS DOUBLE))
         |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) END AS var_s
         |FROM st ORDER BY 1""".stripMargin,

    "cdc_tombstone_gc" ->
      s"""$C,
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn FROM c),
         |nd AS (SELECT user_id,
         |    CAST(sum(CASE WHEN op <> 'delete' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_nondelete
         |  FROM c GROUP BY 1),
         |k AS (SELECT r.user_id, r.table_name, r.op AS last_op,
         |    r.ts AS last_ts, nd.n_nondelete
         |  FROM r JOIN nd ON nd.user_id = r.user_id WHERE r.rn = 1),
         |h AS (SELECT max(last_ts) AS head_ts FROM k)
         |SELECT table_name, count(*) AS n_keys,
         |  CAST(sum(CASE WHEN last_op = 'delete' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_tombstones,
         |  CAST(sum(CASE WHEN last_op = 'delete'
         |      AND last_ts < h.head_ts - INTERVAL 7 DAY THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_gc_eligible,
         |  CAST(sum(CASE WHEN last_op = 'delete'
         |      AND last_ts < h.head_ts - INTERVAL 7 DAY
         |      AND n_nondelete > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_resurrect_risk
         |FROM k, h GROUP BY 1 ORDER BY 1""".stripMargin,

    // The streaming dedup restores exactly-once, so the oracle is
    // simply the per-table aggregate over the raw (single-delivery)
    // feed.
    "cdc_stream_dedup" ->
      s"""$C
         |SELECT table_name, count(*) AS n_unique,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // Pixel-content replay of the 4x4 aHash (byte k of image id is
    // (id*31+k)%256, image row k/(3w), pixel (k%(3w))/3); the oracle
    // joins ALL distinct-hash pairs — banding is the Spark-side scale
    // path and hamming<=2 survives it by pigeonhole, so both sides
    // agree exactly.
    "multimodal_phash" ->
      s"""WITH im AS (SELECT doc_id,
         |    4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |b AS (SELECT doc_id, w, h,
         |    unnest(range(0, w * h * 3)) AS k FROM im),
         |v AS (SELECT doc_id,
         |    ((k // (w * 3)) * 4) // h AS gr,
         |    (((k % (w * 3)) // 3) * 4) // w AS gc,
         |    (doc_id * 31 + k) % 256 AS byte FROM b),
         |cell AS (SELECT doc_id, gr, gc,
         |    CAST(sum(byte) AS BIGINT) AS cs, count(*) AS cnt
         |  FROM v GROUP BY 1, 2, 3),
         |g AS (SELECT doc_id, CAST(sum(byte) AS BIGINT) AS ts,
         |    count(*) AS tc FROM v GROUP BY 1),
         |ph AS (SELECT c.doc_id,
         |    CAST(sum(CASE WHEN c.cs * g.tc > g.ts * c.cnt
         |      THEN CAST(1 AS BIGINT) << (c.gr * 4 + c.gc)
         |      ELSE 0 END) AS BIGINT) AS phash
         |  FROM cell c JOIN g ON g.doc_id = c.doc_id
         |  GROUP BY 1),
         |grp AS (SELECT phash, count(*) AS n_images,
         |    min(doc_id) AS min_doc FROM ph GROUP BY 1),
         |near AS (SELECT a.phash,
         |    count(*) AS n_near_hashes,
         |    CAST(sum(b.n_images) AS BIGINT) AS n_near_images
         |  FROM grp a JOIN grp b ON a.phash <> b.phash
         |    AND bit_count(xor(a.phash, b.phash)) <= 2
         |  GROUP BY 1)
         |SELECT g2.phash, g2.n_images, g2.min_doc,
         |  COALESCE(n.n_near_hashes, 0) AS n_near_hashes,
         |  COALESCE(n.n_near_images, 0) AS n_near_images
         |FROM grp g2 LEFT JOIN near n ON n.phash = g2.phash
         |ORDER BY 1""".stripMargin,

    "corpus_gopher_rules" ->
      s"""WITH s AS (SELECT source,
         |    CAST(len($toksT) AS BIGINT) AS n,
         |    CAST(coalesce(list_sum(list_transform($toksT,
         |      x -> length(x))), 0) AS BIGINT) AS sum_len,
         |    CAST(len(list_filter($toksT,
         |      x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         |    ${markerCountSql(TextAnalysis.EnStopwords)} AS n_stop
         |  FROM documents),
         |r AS (SELECT source,
         |    n BETWEEN 50 AND 100000 AS r_wc,
         |    (3 * n <= sum_len AND sum_len <= 10 * n) AS r_mwl,
         |    n_stop >= 2 AS r_stop,
         |    5 * n_alpha >= 4 * n AS r_alpha
         |  FROM s)
         |SELECT source, count(*) AS n_docs,
         |  CAST(count(*) FILTER (WHERE NOT r_wc) AS BIGINT)
         |    AS n_fail_wordcount,
         |  CAST(count(*) FILTER (WHERE NOT r_mwl) AS BIGINT)
         |    AS n_fail_meanlen,
         |  CAST(count(*) FILTER (WHERE NOT r_stop) AS BIGINT)
         |    AS n_fail_stopwords,
         |  CAST(count(*) FILTER (WHERE NOT r_alpha) AS BIGINT)
         |    AS n_fail_alpha,
         |  CAST(count(*) FILTER (WHERE r_wc AND r_mwl AND r_stop
         |    AND r_alpha) AS BIGINT) AS n_keep,
         |  CAST(count(*) FILTER (WHERE r_wc AND r_mwl AND r_stop
         |      AND r_alpha) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS keep_share
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // Calibration oracle: the same quality formula as the
    // weighted-sample oracle, the same rule flags as the gopher
    // oracle, native NTILE over (score, doc_id) — NTILE-parity with
    // Ranks.ntileExpr is spec-pinned.
    "corpus_quality_calibration" -> {
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH s AS (SELECT doc_id,
         |    CAST(len($toksT) AS BIGINT) AS n_tokens,
         |    ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |    CAST(coalesce(list_sum(list_transform($toksT,
         |      x -> length(x))), 0) AS BIGINT) AS sum_len,
         |    CAST(len(list_filter($toksT,
         |      x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha
         |  FROM documents),
         |q AS (SELECT doc_id,
         |    CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         |      CAST(0.4 AS DOUBLE)
         |        * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |      + CAST(0.3 AS DOUBLE)
         |        * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |      + CAST(0.3 AS DOUBLE)
         |        * least((CAST(sum_len AS DOUBLE) / $nTok)
         |          / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |      END AS quality_score,
         |    (n_tokens BETWEEN 50 AND 100000
         |      AND 3 * n_tokens <= sum_len AND sum_len <= 10 * n_tokens
         |      AND stop_cnt >= 2
         |      AND 5 * n_alpha >= 4 * n_tokens) AS gopher_pass
         |  FROM s),
         |r AS (SELECT quality_score, gopher_pass,
         |    ntile(10) OVER (ORDER BY quality_score, doc_id) AS bin
         |  FROM q)
         |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
         |  CAST(count(*) FILTER (WHERE gopher_pass) AS BIGINT) AS n_pass,
         |  CAST(count(*) FILTER (WHERE gopher_pass) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS pass_rate,
         |  min(quality_score) AS min_score,
         |  max(quality_score) AS max_score
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // One CTE family per width over the same tokenizer; the Spark
    // side slices one cached token relation, the oracle re-derives
    // each width's shingles — same row sets by the NULL-lead window.
    "corpus_contamination_curve" -> {
      val ns = Seq(3, 8, 13)
      val ctes = ns.map { n =>
        s"""sh$n AS (${Dedup.duckShinglesN(n)}),
           |e$n AS (SELECT DISTINCT s.shingle FROM sh$n s
           |  JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
           |p$n AS (SELECT s.doc_id, count(e.shingle) AS n_overlap
           |  FROM (SELECT DISTINCT s0.doc_id, s0.shingle FROM sh$n s0
           |    JOIN documents d USING (doc_id) WHERE d.source <> 'src0') s
           |  LEFT JOIN e$n e ON e.shingle = s.shingle GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val rows = ns.map { n =>
        s"""SELECT CAST($n AS BIGINT) AS ngram_n,
           |  CAST((SELECT count(*) FROM e$n) AS BIGINT) AS n_eval_ngrams,
           |  CAST((SELECT count(*) FROM documents WHERE source <> 'src0')
           |    AS BIGINT) AS n_docs,
           |  CAST((SELECT coalesce(sum(CASE WHEN n_overlap > 0 THEN 1 ELSE 0
           |    END), 0) FROM p$n) AS BIGINT) AS n_contaminated,
           |  CAST((SELECT coalesce(sum(n_overlap), 0) FROM p$n) AS BIGINT)
           |    AS sum_overlap,
           |  CAST((SELECT coalesce(sum(CASE WHEN n_overlap > 0 THEN 1 ELSE 0
           |      END), 0) FROM p$n) AS DOUBLE)
           |    / CAST((SELECT count(*) FROM documents WHERE source <> 'src0')
           |      AS DOUBLE) AS contaminated_share""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $ctes\nSELECT * FROM (\n$rows\n) ORDER BY ngram_n"
    },

    // Same synthetic-image + hash CTE chain as multimodal_phash; the
    // components close transitively via the recursive min-label CTE
    // (the dedup_clusters oracle scheme). The oracle joins ALL
    // distinct-hash pairs; banding is the Spark-side scale path and
    // hamming<=2 survives it by pigeonhole, so both sides agree.
    "multimodal_phash_families" ->
      s"""WITH RECURSIVE im AS (SELECT doc_id,
         |    4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |b AS (SELECT doc_id, w, h,
         |    unnest(range(0, w * h * 3)) AS k FROM im),
         |v AS (SELECT doc_id,
         |    ((k // (w * 3)) * 4) // h AS gr,
         |    (((k % (w * 3)) // 3) * 4) // w AS gc,
         |    (doc_id * 31 + k) % 256 AS byte FROM b),
         |cell AS (SELECT doc_id, gr, gc,
         |    CAST(sum(byte) AS BIGINT) AS cs, count(*) AS cnt
         |  FROM v GROUP BY 1, 2, 3),
         |g AS (SELECT doc_id, CAST(sum(byte) AS BIGINT) AS ts,
         |    count(*) AS tc FROM v GROUP BY 1),
         |ph AS (SELECT c.doc_id,
         |    CAST(sum(CASE WHEN c.cs * g.tc > g.ts * c.cnt
         |      THEN CAST(1 AS BIGINT) << (c.gr * 4 + c.gc)
         |      ELSE 0 END) AS BIGINT) AS phash
         |  FROM cell c JOIN g ON g.doc_id = c.doc_id
         |  GROUP BY 1),
         |grp AS (SELECT phash, count(*) AS n_images,
         |    min(doc_id) AS min_doc FROM ph GROUP BY 1),
         |pairs AS (SELECT a.phash AS pa, b.phash AS pb
         |  FROM grp a JOIN grp b ON a.phash < b.phash
         |    AND bit_count(xor(a.phash, b.phash)) <= 2),
         |edges AS (SELECT pa AS src, pb AS dst FROM pairs
         |  UNION ALL SELECT pb AS src, pa AS dst FROM pairs),
         |reach AS (SELECT src AS v, src AS label FROM edges
         |  UNION
         |  SELECT e.src AS v, r.label AS label
         |  FROM edges e JOIN reach r ON r.v = e.dst),
         |lab AS (SELECT v, min(label) AS label FROM reach GROUP BY v)
         |SELECT COALESCE(lab.label, grp.phash) AS family_id,
         |  count(*) AS n_hashes,
         |  CAST(sum(grp.n_images) AS BIGINT) AS n_images,
         |  min(grp.min_doc) AS min_doc
         |FROM grp LEFT JOIN lab ON lab.v = grp.phash
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Spearman between the heuristic quality gate and the LM
    // familiarity gate: both ranks (score, doc_id)-tie-broken, sum of
    // squared rank gaps exact, one double rho expression with the
    // denominator multiplied in doubles.
    "corpus_signal_agreement" -> {
      val nTok = "CAST(n_tokens AS DOUBLE)"
      s"""WITH s AS (SELECT doc_id, source,
         |  CAST(len($toksT) AS BIGINT) AS n_tokens,
         |  ${markerCountSql(TextAnalysis.EnStopwords)} AS stop_cnt,
         |  CAST(list_sum(list_transform($toksT, x -> length(x))) AS BIGINT) AS sum_len
         |FROM documents),
         |q AS (SELECT doc_id, source,
         |  CASE WHEN n_tokens = 0 THEN CAST(0 AS DOUBLE)
         |    ELSE CAST(0.4 AS DOUBLE) * least($nTok / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE))
         |      + CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(stop_cnt AS DOUBLE) / $nTok)
         |      + CAST(0.3 AS DOUBLE) * least((CAST(sum_len AS DOUBLE) / $nTok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE))
         |    END AS quality_score
         |FROM s),
         |toks AS (SELECT doc_id, unnest($toksT) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
         |sc AS (SELECT doc_id, count(*) AS n_tokens,
         |    CAST(sum(length(bin(tf)) - 1) AS BIGINT) AS sum_log2_tf
         |  FROM toks JOIN tf USING (tok) GROUP BY doc_id),
         |f AS (SELECT d.doc_id,
         |    COALESCE(CAST(sc.sum_log2_tf AS DOUBLE) / CAST(sc.n_tokens AS DOUBLE),
         |      CAST(-1.0 AS DOUBLE)) AS fam
         |  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
         |j AS (SELECT q.source, q.doc_id, q.quality_score, f.fam
         |  FROM q JOIN f ON f.doc_id = q.doc_id),
         |r AS (SELECT source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY quality_score, doc_id) AS BIGINT) AS rq,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY fam, doc_id) AS BIGINT) AS rf
         |  FROM j),
         |a AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum((rq - rf) * (rq - rf)) AS BIGINT) AS sum_d2
         |  FROM r GROUP BY 1)
         |SELECT source, n_docs, sum_d2,
         |  CASE WHEN n_docs > 1 THEN
         |    CAST(1.0 AS DOUBLE) - (CAST(6.0 AS DOUBLE) * CAST(sum_d2 AS DOUBLE))
         |      / (CAST(n_docs AS DOUBLE)
         |        * (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) - 1))
         |  ELSE NULL END AS spearman
         |FROM a ORDER BY 1""".stripMargin
    },

    "cdc_txn_atomicity" ->
      s"""$C,
         |s AS (SELECT *, event_id // 5 AS txn_id FROM c),
         |st AS (SELECT *,
         |    count(*) OVER (PARTITION BY txn_id) AS txn_size,
         |    first_value(table_name) OVER (PARTITION BY txn_id
         |      ORDER BY event_id) AS txn_table
         |  FROM s),
         |d AS (SELECT * FROM st WHERE event_id % 97 <> 3),
         |t AS (SELECT txn_id, max(txn_table) AS txn_table,
         |    CAST(max(txn_size) AS BIGINT) AS declared,
         |    count(*) AS observed
         |  FROM d GROUP BY 1)
         |SELECT txn_table AS table_name, count(*) AS n_txns,
         |  CAST(sum(CASE WHEN observed < declared THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_torn,
         |  CAST(sum(declared - observed) AS BIGINT) AS n_ops_lost,
         |  CAST(sum(CASE WHEN observed < declared THEN observed ELSE 0 END)
         |    AS BIGINT) AS n_ops_rollback
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // Timeline compression is truncating integer µs division toward
    // the user's first event — exact in both engines; the detector's
    // median is the same ⌈n/2⌉ rank pick corpus_percentiles uses.
    "events_bot_detection" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t
         |  FROM events WHERE ts IS NOT NULL),
         |m AS (SELECT *, min(t) OVER (PARTITION BY user_id) AS mt FROM e),
         |x AS (SELECT user_id, event_id,
         |    CASE WHEN user_id % 31 = 0 THEN mt + (t - mt) // 1000
         |      ELSE t END AS us
         |  FROM m),
         |g AS (SELECT user_id, event_id,
         |    us - lag(us) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id) AS gap
         |  FROM x),
         |r AS (SELECT user_id, gap,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY gap, event_id) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS cnt
         |  FROM g WHERE gap IS NOT NULL),
         |s AS (SELECT user_id,
         |    CAST(max(cnt) + 1 AS BIGINT) AS n_events,
         |    CAST(max(CASE WHEN rn = (cnt + 1) // 2 THEN gap END)
         |      AS BIGINT) AS median_gap_us
         |  FROM r GROUP BY 1)
         |SELECT user_id, n_events, median_gap_us
         |FROM s WHERE median_gap_us < 120000000 ORDER BY 1""".stripMargin,

    "embed_epoch_drift" ->
      s"""WITH bounds AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi
         |  FROM embeddings),
         |q AS (SELECT ((vec_id - lo) * 2) // (hi - lo + 1) AS epoch,
         |    ${Vectors.duckQuantize("embedding")} AS q
         |  FROM embeddings, bounds),
         |e AS (SELECT epoch,
         |    CAST(generate_subscripts(q, 1) - 1 AS BIGINT) AS i,
         |    unnest(q) AS x FROM q),
         |d AS (SELECT epoch, i, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sum_q
         |  FROM e GROUP BY 1, 2)
         |SELECT a.i, a.n AS n_a, a.sum_q AS sum_a,
         |  b.n AS n_b, b.sum_q AS sum_b,
         |  CAST(a.sum_q AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_a,
         |  CAST(b.sum_q AS DOUBLE) / CAST(b.n AS DOUBLE) AS mean_b,
         |  CAST(b.sum_q AS DOUBLE) / CAST(b.n AS DOUBLE)
         |    - CAST(a.sum_q AS DOUBLE) / CAST(a.n AS DOUBLE) AS delta
         |FROM d a JOIN d b ON b.i = a.i AND a.epoch = 0 AND b.epoch = 1
         |ORDER BY 1""".stripMargin,

    "cdc_subject_export" ->
      s"""$C,
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, table_name
         |    ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM c WHERE user_id % 97 = 0)
         |SELECT user_id, table_name,
         |  count(*) AS n_changes,
         |  CAST(sum(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_inserts,
         |  CAST(sum(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_updates,
         |  CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_deletes,
         |  min(ts) AS first_ts,
         |  max(ts) AS last_ts,
         |  max(CASE WHEN rn = 1 THEN op END) AS last_op,
         |  max(CASE WHEN rn = 1 THEN op END) <> 'delete' AS is_live
         |FROM r GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "corpus_stratified_k" ->
      s"""WITH h AS (SELECT source, doc_id,
         |    ${Portable.duckHash("(source || '#' || CAST(doc_id AS VARCHAR))")} AS h
         |  FROM documents),
         |r AS (SELECT source, doc_id,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY h, doc_id) AS BIGINT) AS rk
         |  FROM h)
         |SELECT source, doc_id, rk FROM r WHERE rk <= 10
         |ORDER BY source, rk""".stripMargin,

    // Same exact-decimal moment decomposition as the Spark side;
    // every mean/var/t is one fixed double expression over them.
    "events_ab_test" ->
      s"""WITH a AS (SELECT event_type,
         |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         |    count(*) AS n,
         |    sum(CAST(value AS DECIMAL(18,2))) AS s,
         |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
         |      AS s2
         |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
         |j AS (SELECT x.event_type,
         |    x.n AS n_a, x.s AS s_a, x.s2 AS s2_a,
         |    y.n AS n_b, y.s AS s_b, y.s2 AS s2_b
         |  FROM a x JOIN a y ON y.event_type = x.event_type
         |    AND x.arm = 'A' AND y.arm = 'B'),
         |m AS (SELECT event_type, n_a, n_b,
         |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
         |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
         |    CASE WHEN n_a > 1 THEN
         |      (CAST(n_a AS DOUBLE) * CAST(s2_a AS DOUBLE)
         |        - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
         |        / (CAST(n_a AS DOUBLE) * CAST(n_a - 1 AS DOUBLE)) END AS var_a,
         |    CASE WHEN n_b > 1 THEN
         |      (CAST(n_b AS DOUBLE) * CAST(s2_b AS DOUBLE)
         |        - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
         |        / (CAST(n_b AS DOUBLE) * CAST(n_b - 1 AS DOUBLE)) END AS var_b
         |  FROM j)
         |SELECT event_type, n_a, n_b, mean_a, mean_b, var_a, var_b,
         |  (mean_a - mean_b) / sqrt(var_a / CAST(n_a AS DOUBLE)
         |    + var_b / CAST(n_b AS DOUBLE)) AS t_stat
         |FROM m ORDER BY 1""".stripMargin,

    // Integer-cents per-user sums; all moments reduce exactly
    // (HUGEINT here, decimal(38,0) on the Spark side), then the same
    // fixed chain of double expressions.
    "events_ab_cuped" ->
      s"""WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
         |    AS mid_us FROM events WHERE ts IS NOT NULL),
         |pu AS (SELECT event_type, user_id,
         |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         |    CAST(sum(CASE WHEN epoch_us(ts) <= b.mid_us
         |      THEN CAST(value AS DECIMAL(18,2))
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN epoch_us(ts) > b.mid_us
         |      THEN CAST(value AS DECIMAL(18,2))
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS y
         |  FROM events, b WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
         |p AS (SELECT event_type, count(*) AS n_users,
         |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |    sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM pu GROUP BY 1),
         |ar AS (SELECT event_type, arm, count(*) AS n,
         |    sum(x) AS ax, sum(y) AS ay FROM pu GROUP BY 1, 2),
         |j AS (SELECT p.*, a.n AS n_a, a.ax AS ax_a, a.ay AS ay_a,
         |    bb.n AS n_b, bb.ax AS ax_b, bb.ay AS ay_b
         |  FROM p
         |  JOIN ar a ON a.event_type = p.event_type AND a.arm = 'A'
         |  JOIN ar bb ON bb.event_type = p.event_type AND bb.arm = 'B'),
         |m AS (SELECT *,
         |    CASE WHEN n_users * sxx - sx * sx > 0
         |      THEN CAST(n_users * sxy - sx * sy AS DOUBLE)
         |        / CAST(n_users * sxx - sx * sx AS DOUBLE) END AS theta,
         |    CASE WHEN n_users * sxx - sx * sx > 0
         |        AND n_users * syy - sy * sy > 0
         |      THEN CAST(n_users * sxy - sx * sy AS DOUBLE)
         |        * CAST(n_users * sxy - sx * sy AS DOUBLE)
         |        / (CAST(n_users * sxx - sx * sx AS DOUBLE)
         |          * CAST(n_users * syy - sy * sy AS DOUBLE)) END AS rho2,
         |    CAST(ay_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_y_a,
         |    CAST(ay_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 AS mean_y_b,
         |    CAST(ax_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_x_a,
         |    CAST(ax_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 AS mean_x_b,
         |    CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0
         |      AS mean_x_all
         |  FROM j)
         |SELECT event_type, n_users, n_a, n_b, theta, rho2,
         |  mean_y_a, mean_y_b, mean_y_b - mean_y_a AS lift_raw,
         |  mean_y_a - theta * (mean_x_a - mean_x_all) AS adj_mean_a,
         |  mean_y_b - theta * (mean_x_b - mean_x_all) AS adj_mean_b,
         |  (mean_y_b - theta * (mean_x_b - mean_x_all))
         |    - (mean_y_a - theta * (mean_x_a - mean_x_all)) AS lift_adj
         |FROM m ORDER BY 1""".stripMargin,

    // Calendar-free integer weeks against the feed's own start; the
    // cumulative window runs over the |weeks|²-bounded triangle.
    "events_cohort_ltv" -> {
      val weekUs = 7L * 24 * 3600 * 1000000L
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value
         |  FROM events WHERE ts IS NOT NULL),
         |fu AS (SELECT user_id, min(us) AS first_us FROM ev GROUP BY 1),
         |o AS (SELECT min(first_us) AS origin_us FROM fu),
         |cells AS (SELECT
         |    (f.first_us - o.origin_us) // $weekUs AS cohort_week,
         |    (e.us - f.first_us) // $weekUs AS age_weeks,
         |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
         |    count(*) AS n_events,
         |    CAST(sum(CAST(CAST(e.value AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS value_cents
         |  FROM ev e JOIN fu f ON f.user_id = e.user_id, o
         |  GROUP BY 1, 2),
         |cs AS (SELECT cohort_week, max(CASE WHEN age_weeks = 0
         |    THEN n_active END) AS cohort_size FROM cells GROUP BY 1),
         |r AS (SELECT c.*, cs.cohort_size,
         |    sum(c.value_cents) OVER (PARTITION BY c.cohort_week
         |      ORDER BY c.age_weeks ROWS UNBOUNDED PRECEDING)
         |      AS cum_value_cents
         |  FROM cells c JOIN cs ON cs.cohort_week = c.cohort_week)
         |SELECT cohort_week, age_weeks, n_active, n_events, value_cents,
         |  CAST(cohort_size AS BIGINT) AS cohort_size,
         |  CAST(cum_value_cents AS DOUBLE) / CAST(cohort_size AS DOUBLE)
         |    / 100.0 AS cum_ltv_per_user
         |FROM r ORDER BY 1, 2""".stripMargin
    },

    // Same session chain as events_sessionize, then the ⌊log2⌋
    // bucket census with a 1-row total for the share.
    "events_session_depth" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS prev_ts
         |  FROM events
         |), b AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |    THEN 1 ELSE 0 END AS is_break FROM g
         |), s AS (
         |  SELECT *, CAST(sum(is_break) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS session_id FROM b
         |), se AS (
         |  SELECT user_id, session_id, count(*) AS n_events
         |  FROM s GROUP BY 1, 2
         |), bu AS (
         |  SELECT CAST(length(bin(n_events)) - 1 AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_sessions,
         |    CAST(min(n_events) AS BIGINT) AS min_depth,
         |    CAST(max(n_events) AS BIGINT) AS max_depth,
         |    CAST(sum(n_events) AS BIGINT) AS n_events_total
         |  FROM se GROUP BY 1
         |), t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM se)
         |SELECT bucket, n_sessions, min_depth, max_depth, n_events_total,
         |  CAST(n_sessions AS DOUBLE) / CAST(t.total AS DOUBLE)
         |    AS session_share
         |FROM bu, t ORDER BY bucket""".stripMargin,

    // text_langid's score CTE; margin from the exact integer sort of
    // the 5-score vector (top minus second).
    "text_langid_margin" -> {
      val scores = TextAnalysis.markers
        .map { case (l, ws) => s"${markerCountSql(ws)} AS score_$l" }
        .mkString(",\n  ")
      val vec = TextAnalysis.markers.map { case (l, _) => s"score_$l" }
        .mkString("[", ", ", "]")
      s"""WITH s AS (SELECT doc_id,
         |  $scores
         |FROM documents),
         |m AS (SELECT $langPredSql AS pred_lang,
         |    list_sort($vec)[5] - list_sort($vec)[4] AS margin
         |  FROM s),
         |c AS (SELECT pred_lang,
         |    CAST(least(margin, 3) AS BIGINT) AS margin_bucket,
         |    count(*) AS n_docs
         |  FROM m GROUP BY 1, 2)
         |SELECT pred_lang, margin_bucket, n_docs,
         |  CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER (
         |    PARTITION BY pred_lang) AS DOUBLE) AS lang_share
         |FROM c ORDER BY 1, 2""".stripMargin
    },

    // Exact ⌈n·q/100⌉ rank picks over the (delay, user_id) total
    // order — corpus_percentiles' tie-break on the conversion delays.
    "events_conversion_lag" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
         |  FROM events WHERE ts IS NOT NULL),
         |s1 AS (SELECT user_id, min(us) AS t1 FROM e
         |  WHERE event_type = 'signup' GROUP BY 1),
         |d AS (SELECT e.user_id, min(e.us) - min(s1.t1) AS delay_us
         |  FROM e JOIN s1 ON s1.user_id = e.user_id
         |  WHERE e.event_type = 'purchase' AND e.us >= s1.t1
         |  GROUP BY 1),
         |r AS (SELECT *, row_number() OVER (ORDER BY delay_us, user_id)
         |    AS rn, count(*) OVER () AS n FROM d),
         |p AS (SELECT CAST(count(*) AS BIGINT) AS n_converted,
         |    max(CASE WHEN rn = (n * 25 + 99) // 100 THEN delay_us END)
         |      AS p25_delay_us,
         |    max(CASE WHEN rn = (n * 50 + 99) // 100 THEN delay_us END)
         |      AS p50_delay_us,
         |    max(CASE WHEN rn = (n * 75 + 99) // 100 THEN delay_us END)
         |      AS p75_delay_us,
         |    max(CASE WHEN rn = (n * 90 + 99) // 100 THEN delay_us END)
         |      AS p90_delay_us,
         |    max(delay_us) AS max_delay_us
         |  FROM r),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_signups FROM s1)
         |SELECT ns.n_signups, p.n_converted,
         |  CASE WHEN ns.n_signups > 0
         |    THEN CAST(p.n_converted AS DOUBLE)
         |      / CAST(ns.n_signups AS DOUBLE) END AS conversion_rate,
         |  p.p25_delay_us, p.p50_delay_us, p.p75_delay_us,
         |  p.p90_delay_us, p.max_delay_us
         |FROM p, ns""".stripMargin,

    "events_srm" ->
      s"""WITH u AS (SELECT DISTINCT event_type, user_id FROM events
         |  WHERE ts IS NOT NULL),
         |g AS (SELECT event_type,
         |    CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_a,
         |    CAST(count(*) FILTER (WHERE user_id % 2 <> 0) AS BIGINT) AS n_b
         |  FROM u GROUP BY 1)
         |SELECT event_type, n_a, n_b,
         |  CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
         |    / CAST(n_a + n_b AS DOUBLE) AS chi2,
         |  100 * (n_a - n_b) * (n_a - n_b) > 384 * (n_a + n_b) AS srm_flag
         |FROM g ORDER BY 1""".stripMargin,

    // Sample k of audio doc id is (id*31+k)%256 (64+id%101 samples);
    // the oracle replays the frame energies and the islands reduce.
    "multimodal_wav_vad" ->
      s"""WITH au AS (SELECT doc_id, 64 + doc_id % 101 AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |s AS (SELECT doc_id, unnest(range(0, n)) AS k FROM au),
         |fr AS (SELECT doc_id, k // 16 AS frame_idx,
         |    CAST(sum(abs((doc_id * 31 + k) % 256 - 128)) AS BIGINT)
         |      AS energy
         |  FROM s GROUP BY 1, 2),
         |act AS (SELECT doc_id, frame_idx,
         |    frame_idx - row_number() OVER (PARTITION BY doc_id
         |      ORDER BY frame_idx) AS grp
         |  FROM fr WHERE energy > 1024),
         |seg AS (SELECT doc_id, count(*) AS seg_len
         |  FROM act GROUP BY doc_id, grp),
         |sg AS (SELECT doc_id, count(*) AS n_segments,
         |    CAST(max(seg_len) AS BIGINT) AS max_segment
         |  FROM seg GROUP BY 1),
         |base AS (SELECT doc_id, count(*) AS n_frames,
         |    CAST(sum(CASE WHEN energy > 1024 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_active,
         |    max(energy) AS max_energy
         |  FROM fr GROUP BY 1)
         |SELECT b.doc_id, b.n_frames, b.n_active, b.max_energy,
         |  COALESCE(sg.n_segments, 0) AS n_segments,
         |  COALESCE(sg.max_segment, 0) AS max_segment
         |FROM base b LEFT JOIN sg ON sg.doc_id = b.doc_id
         |ORDER BY 1""".stripMargin,
  )
}
