package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Change-data-capture operators over a change stream (reference
  * behavior: run.py:255-318 CDC flow — insert/update/delete events
  * with before-image, partition keys, transaction details).
  *
  * The driver testdata's `events` table stands in for the binlog:
  * event_type maps onto CDC operations (signup→insert,
  * click/view/purchase→update, error→delete) and user_id buckets onto
  * replicated tables, giving a deterministic multi-table change
  * stream the DuckDB oracle can recompute.
  *
  * Scale notes: every operator here is one shuffle on its key
  * (user/table) followed by per-partition window work — the minimum
  * possible for the semantics. Nothing collects to the driver; output
  * partitioning is reusable downstream (same key).
  */
object ChangeFeed {

  val SchemaName = "graft"

  /** Annotate a raw event frame (batch OR streaming — the transform
    * is identical, which is the point of the unified Dataset API)
    * with op, schema/table and partition key.
    */
  def annotate(ev: DataFrame): DataFrame =
    ev.withColumn("op",
        when(col("event_type") === "signup", "insert")
          .when(col("event_type") === "error", "delete")
          .otherwise("update"))
      .withColumn("schema_name", lit(SchemaName))
      .withColumn("table_name",
        concat(lit("users_"), (col("user_id") % 4).cast("string")))
      .withColumn("partition_key",
        concat(col("schema_name"), lit("."), col("table_name")))

  /** The canonical change-stream view: op, schema/table, key, payload. */
  def fromEvents(spark: SparkSession, dir: String): DataFrame =
    annotate(Tables.load(spark, dir, "events"))

  /** Oracle twin of fromEvents as a DuckDB CTE body. */
  def duckFromEvents: String =
    """SELECT *,
      |  CASE event_type WHEN 'signup' THEN 'insert'
      |    WHEN 'error' THEN 'delete' ELSE 'update' END AS op,
      |  'graft' AS schema_name,
      |  'users_' || CAST(user_id % 4 AS VARCHAR) AS table_name,
      |  'graft.users_' || CAST(user_id % 4 AS VARCHAR) AS partition_key
      |FROM events""".stripMargin

  /** Materialize current table state from the change stream:
    * latest-wins per key, deleted keys dropped. This is the batch
    * twin of CDC "apply" — the streaming twin lives in
    * graft.streaming.CdcPipeline (flatMapGroupsWithState).
    *
    * One shuffle on the key; the row_number window runs per
    * partition. At 100 TB this is the unavoidable exchange, and AQE
    * handles hot keys.
    */
  def applyChanges(
      changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column]): DataFrame =
    latestPerKey(changes, keyCols, orderCols)
      .filter(col("op") =!= "delete")

  /** Latest row per key INCLUDING delete tombstones — the form a
    * persisted state table needs (a tombstone must survive so a
    * late-arriving older update can't resurrect the key; readers
    * filter `op != 'delete'`).
    */
  def latestPerKey(
      changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    changes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Point-in-time replay: the materialized state AS OF `cutoff` —
    * the batch twin of resuming a CDC task from a commit timestamp
    * (reference: the consumer's timestamp-threshold positioning,
    * run.py:156-185, and DMS's CdcStartPosition task setting). The
    * cutoff filter pushes into the scan, so replaying an old point
    * reads only the prefix of the feed; everything downstream is the
    * same single-shuffle latest-per-key as [[applyChanges]].
    */
  def replayAt(
      changes: DataFrame,
      cutoff: Column,
      keyCols: Seq[String],
      orderCols: Seq[Column]): DataFrame =
    applyChanges(changes.filter(col("ts") <= cutoff), keyCols, orderCols)

  /** Log-compaction summary per table: how far the raw feed collapses
    * under latest-per-key retention (tombstones kept, as a compacted
    * changelog must — see [[latestPerKey]]). Two aggregates — one over
    * the compacted relation, one tiny per-table raw count joined back
    * broadcast — output cardinality = |tables|.
    */
  def compactionSummary(
      changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    val compacted = latestPerKey(changes, keyCols, orderCols)
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("op") === "delete", 1L).otherwise(0L)).as("n_tombstones"))
    val raw = changes.groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_raw"))
    compacted.join(broadcast(raw), "table_name")
      .select(col("table_name"), col("n_raw"), col("n_keys"),
        (col("n_keys") - col("n_tombstones")).as("n_live"),
        col("n_tombstones"),
        (col("n_keys").cast("double") / col("n_raw").cast("double"))
          .as("compaction_ratio"))
  }

  /** Snapshot diff: how the materialized state changed between two
    * replay points t1 ≤ t2 — per table, the keys added, removed,
    * changed (live at both points but with a different last change),
    * and unchanged, plus the live-key counts at each point. The
    * audit a DMS operator runs after a resume-from-timestamp: "what
    * did the last week of CDC actually do to the target".
    *
    * Scale shape: NOT two replays joined (two scans + two shuffles +
    * a join). One scan with the t2 cutoff pushed into it, ONE shuffle
    * on the key, and per key two conditional max-of-struct aggregates
    * — latest-at-t1 and latest-at-t2 — which combine map-side.
    * Struct comparison is lexicographic on (ts, event_id), the feed's
    * unique change order, so max IS latest-per-key. Classification
    * and the per-table rollup are post-aggregate column math over
    * |keys| rows.
    */
  def snapshotDiff(changes: DataFrame, t1: Column, t2: Column): DataFrame = {
    val sel = struct(col("ts"), col("event_id"), col("op"))
    val perKey = changes.filter(col("ts") <= t2)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("ts") <= t1, sel)).as("s1"),
        max(sel).as("s2"),
        // table_name is keyed by user_id (annotate), so any row's
        // value is THE value; max() just picks one without a join.
        max(col("table_name")).as("table_name"))
    val live1 = col("s1").isNotNull && col("s1.op") =!= "delete"
    val live2 = col("s2").isNotNull && col("s2.op") =!= "delete"
    perKey
      .withColumn("status",
        when(!live1 && live2, "added")
          .when(live1 && !live2, "removed")
          .when(live1 && live2 &&
            col("s1.event_id") =!= col("s2.event_id"), "changed")
          .when(live1 && live2, "unchanged"))
      .filter(col("status").isNotNull) // dead at both points: no-op
      .groupBy(col("table_name"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        sum(when(live1, 1L).otherwise(0L)).as("n_keys_t1"),
        sum(when(live2, 1L).otherwise(0L)).as("n_keys_t2"))
  }

  /** Before-image per change (reference: BeforeImageSettings with
    * ColumnFilter=all, stack.py:341-346): previous values of the
    * tracked columns for every non-insert change.
    */
  def beforeImage(
      changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols: _*)
    valueCols.foldLeft(changes) { (df, c) =>
      df.withColumn(s"before_$c", lag(col(c), 1).over(w))
    }
  }

  /** Incremental view maintenance from CDC deltas: maintain
    * SUM(valueCol) per group WITHOUT recomputation, by folding each
    * change's contribution delta
    *
    *   delta = live(value, op) − live(before_value, before_op)
    *   live(x, o) = x when o ≠ delete (a deleted key contributes 0)
    *
    * where the before image/op come from lag windows per key. Summing
    * deltas over the whole feed telescopes to the sum over the FINAL
    * state's live rows — the classic incremental-materialized-view
    * identity, here as one window pass + one aggregate (no state
    * table, no join against a recomputed snapshot).
    *
    * Scale: this is why CDC consumers exist — at 100 TB of history a
    * maintained aggregate folds each arriving delta in O(delta),
    * while recomputation scans everything; the equality of the two is
    * what cdc_incremental_agg's oracle (and IncrementalAggSpec)
    * asserts.
    */
  def incrementalSum(
      changes: DataFrame,
      groupCol: String,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols: _*)
    def live(v: Column, op: Column): Column =
      when(op.isNotNull && op =!= "delete", v).otherwise(lit(null))
    val withPrev = changes
      .withColumn("_pv", lag(col(valueCol), 1).over(w))
      .withColumn("_pop", lag(col("op"), 1).over(w))
    val dec18 = "decimal(18,2)"
    val delta =
      coalesce(live(col(valueCol), col("op")).cast(dec18), lit(0).cast(dec18)) -
        coalesce(live(col("_pv"), col("_pop")).cast(dec18), lit(0).cast(dec18))
    withPrev.groupBy(col(groupCol))
      .agg(sum(delta).as("inc_sum_d"), count(lit(1)).as("n_changes"))
  }

  /** Kinesis shard assignment: hash the partition key to a shard, as
    * the Kinesis target does with partition_include_schema_table.
    * Uses the portable hash so the oracle recomputes shards exactly.
    */
  def withShard(changes: DataFrame, nShards: Int): DataFrame =
    changes.withColumn("shard", Portable.pHash(col("partition_key")) % nShards)

  /** Commit sequencing per table: the per-shard total order DMS
    * assigns when include_transaction_details is on. Window is
    * per-table (never a global sort).
    */
  def commitSeq(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("table_name"))
      .orderBy(col("ts"), col("event_id"))
    changes.withColumn("commit_seq", row_number().over(w).cast("long"))
  }

  /** Monitoring view: tumbling-window op counts (the batch twin of
    * the streaming watermarked aggregation).
    */
  def windowedStats(changes: DataFrame): DataFrame =
    changes.groupBy(date_trunc("hour", col("ts")).as("window_start"), col("op"))
      .agg(count(lit(1)).as("n_ops"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("window_start"), col("op"))

  /** Multi-source conflict resolution: two replicas of the change
    * feed merged under the bidirectional-replication policy "latest
    * commit wins; source priority breaks timestamp ties; position
    * breaks the rest" — per (table, key) ONE winning change survives.
    * The testdata has a single feed, so the second source is
    * deterministically DIVERGED (cdc_validation's planting pattern):
    * the replica re-commits every user_id%7==0 change one second
    * later with a +100 value — those keys' latest changes conflict
    * and the replica must win exactly where its re-commit IS the
    * key's newest position. Per table: keys, conflicted keys (both
    * sources supplied changes), replica wins, and the exact winning
    * value mass.
    *
    * Scale shape: union is map-side; ONE (table, key) exchange
    * carries both the winner window and (reused partitioning) the
    * per-key source-count reduce; the per-table rollup is tiny. Same
    * exchange family as apply-changes — resolution co-locates with
    * the apply it gates.
    */
  def conflictResolution(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = Seq("table_name", "user_id", "event_id", "ts", "value")
      .map(col)
    val primary = changes.select(cols: _*)
      .withColumn("src", lit("primary"))
    val replica = changes.filter(col("user_id") % 7 === 0)
      .select(cols: _*)
      .withColumn("ts", col("ts") + expr("INTERVAL 1 SECOND"))
      .withColumn("value", col("value") + 100.0)
      .withColumn("src", lit("replica"))
    val merged = primary.unionByName(replica)
      .withColumn("priority",
        when(col("src") === "replica", 2).otherwise(1))
    val w = Window.partitionBy(col("table_name"), col("user_id"))
      .orderBy(col("ts").desc, col("priority").desc, col("event_id").desc)
    val perKey = Window.partitionBy(col("table_name"), col("user_id"))
    merged
      .withColumn("n_src", size(collect_set(col("src")).over(perKey)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("n_src") === 2, 1L).otherwise(0L)).as("n_conflicted"),
        sum(when(col("src") === "replica", 1L).otherwise(0L))
          .as("n_replica_wins"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_winning_value"))
      .orderBy(col("table_name"))
  }

  /** Exactly-once apply from an at-least-once feed: the delivery
    * pipeline (reference: the Kinesis consumer, run.py:156-199)
    * guarantees records arrive but not that they arrive ONCE —
    * a resharded or retried read re-delivers. The consumer must
    * dedup on the delivery identity before applying, or duplicate
    * deliveries inflate every downstream counter. The testdata feed
    * is single-delivery, so redelivery is PLANTED deterministically
    * (every event_id%7==0 change arrives twice, %21==0 three times —
    * the retry-then-reshard double fault) and the operator reports,
    * per table, the delivered/unique/dropped ledger plus the applied
    * live state the deduped feed materializes.
    *
    * Scale shape: dedup is one exchange on the full record identity
    * (identical copies collapse in the map-side partial aggregate —
    * a retry storm costs network only for its distinct rows); the
    * apply is [[latestPerKey]]'s one key exchange; both rollups are
    * |tables|-sized. The planted union is three pushdown-narrowed
    * scans of the same source, a test-harness cost only.
    */
  def idempotentApply(changes: DataFrame): DataFrame = {
    val c = changes.select(col("table_name"), col("user_id"),
      col("event_id"), col("ts"), col("op"), col("value"))
    val delivered = c
      .unionByName(c.filter(col("event_id") % 7 === 0))
      .unionByName(c.filter(col("event_id") % 21 === 0))
    val uniq = delivered
      .groupBy(col("table_name"), col("user_id"), col("event_id"),
        col("ts"), col("op"), col("value"))
      .agg(count(lit(1)).as("n_copies"))
    val ledger = uniq.groupBy(col("table_name"))
      .agg(sum(col("n_copies")).as("n_delivered"),
        count(lit(1)).as("n_unique"),
        sum(col("n_copies") - 1).as("n_dup_dropped"))
    val live = latestPerKey(uniq, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .filter(col("op") =!= "delete")
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_keys_live"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_live_value"))
    ledger.join(live, Seq("table_name"), "left")
      .orderBy(col("table_name"))
  }

  /** Transaction-atomicity audit for the applied feed. The reference
    * replicates transactionally (run.py:255-318 — DMS groups binlog
    * changes by commit); a consumer applying a TORN transaction
    * (some ops delivered, the commit's tail lost to a crash or a
    * mid-commit reshard) silently breaks cross-row invariants. Here
    * every op record carries its commit's declared size (the GTID /
    * commit-marker pattern: seq_in_txn + txn_size travel WITH each
    * op, so the consumer needs no side channel), commits are the
    * synthetic 5-op event_id blocks, and the delivered feed is
    * PLANTED torn: ops with event_id % 97 == 3 vanish. Per table
    * (of the commit's first op): commits, torn commits, ops lost to
    * tears, and the ops a transactional apply must ROLL BACK (the
    * delivered remainder of torn commits — an atomic consumer holds
    * them back rather than applying a fraction).
    *
    * Scale shape: ONE txn-keyed exchange — the declared size and
    * first-op table are window/aggregate products of the SAME
    * partitioning the delivered-count reduce uses; the per-table
    * rollup is |tables|-sized. No joins against a commit catalog —
    * the markers ride the records.
    */
  def txnAtomicity(changes: DataFrame): DataFrame = {
    val source = changes
      .withColumn("txn_id", expr("event_id div 5"))
    // commit markers stamped at SOURCE (pre-loss): declared size +
    // the commit's first-op table
    val stamped = source
      .withColumn("txn_size",
        count(lit(1)).over(Window.partitionBy(col("txn_id"))))
      .withColumn("txn_table",
        first(col("table_name")).over(Window.partitionBy(col("txn_id"))
          .orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val delivered = stamped.filter(col("event_id") % 97 =!= 3)
    delivered
      .groupBy(col("txn_id"))
      .agg(max(col("txn_table")).as("txn_table"),
        max(col("txn_size")).as("declared"),
        count(lit(1)).as("observed"))
      .groupBy(col("txn_table").as("table_name"))
      .agg(count(lit(1)).as("n_txns"),
        sum(when(col("observed") < col("declared"), 1L).otherwise(0L))
          .as("n_torn"),
        sum(col("declared") - col("observed")).as("n_ops_lost"),
        sum(when(col("observed") < col("declared"), col("observed"))
          .otherwise(0L)).as("n_ops_rollback"))
      .orderBy(col("table_name"))
  }

  /** Subject-access export (the GDPR SAR batch; read-side twin of
    * graft.cdc.Forget's erasure): for every requested subject, the
    * complete change-history summary a data-protection response
    * returns — change counts by op, the activity span, the last
    * operation, and whether the key is still live. Subjects are the
    * planted %97 request batch (same planting discipline as the
    * validation/forget demos).
    *
    * Scale shape: the subject predicate pushes to the scan (a SAR
    * batch reads a sliver of the feed, never all of it); ONE key
    * exchange computes every aggregate including the last-op
    * max-of-struct; output is |subjects| rows.
    */
  def subjectExport(changes: DataFrame): DataFrame =
    changes.filter(col("user_id") % 97 === 0)
      .groupBy(col("user_id"), col("table_name"))
      .agg(count(lit(1)).as("n_changes"),
        sum(when(col("op") === "insert", 1L).otherwise(0L)).as("n_inserts"),
        sum(when(col("op") === "update", 1L).otherwise(0L)).as("n_updates"),
        sum(when(col("op") === "delete", 1L).otherwise(0L)).as("n_deletes"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        max(struct(col("ts"), col("event_id"), col("op")))
          .getField("op").as("last_op"))
      .withColumn("is_live", col("last_op") =!= "delete")
      .orderBy(col("user_id"))

  /** Streaming-state sizing plan: how much memory the stateful apply
    * actually holds per table, and how many state shards that needs.
    * The state of a latest-wins apply IS the latest record per live
    * key, so the estimate walks exactly that relation: per table the
    * live key count, the payload mass (24 bytes of fixed key/ts
    * overhead + the variable `props` text per key), the per-key
    * average, and the ⌈bytes/shardBytes⌉ shard count — the number a
    * deployment feeds into `spark.sql.shuffle.partitions` / state
    * store sizing BEFORE the stream falls over, not after.
    *
    * Scale shape: one latest-per-key exchange (shared family with
    * the apply itself) and a |tables|-row rollup; integer byte sums.
    */
  def stateSizePlan(
      changes: DataFrame,
      shardBytes: Long = 1L << 20): DataFrame =
    latestPerKey(changes, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .filter(col("op") =!= "delete")
      .withColumn("key_bytes",
        lit(24L) + length(coalesce(col("props"), lit(""))).cast("long"))
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_live_keys"),
        sum(col("key_bytes")).as("state_bytes"))
      .withColumn("avg_bytes_per_key",
        col("state_bytes").cast("double") / col("n_live_keys").cast("double"))
      .withColumn("n_shards",
        expr(s"(state_bytes + ${shardBytes - 1}) div $shardBytes"))
      .orderBy(col("table_name"))

  /** Storage-tiering plan over the materialized state: live keys
    * bucketed by inactivity against the feed head — hot (changed
    * within 7 days), warm (30), cold (older) — with key counts and
    * payload byte mass per tier. The input to a tiered state store
    * (hot keys in memory, cold in object storage) and the companion
    * to [[stateSizePlan]]'s total: not just how big the state is,
    * but how much of it is actually live.
    *
    * Scale shape: the same latest-per-key exchange as the apply;
    * head is a 1-row broadcast; |tables|·3 output rows.
    */
  def tieringPlan(changes: DataFrame): DataFrame = {
    val live = changes.filter(col("ts").isNotNull)
    val head = live.agg(max(col("ts")).as("head_ts"))
    latestPerKey(live, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .filter(col("op") =!= "delete")
      .crossJoin(broadcast(head))
      .withColumn("days_inactive",
        datediff(to_date(col("head_ts")), to_date(col("ts"))).cast("long"))
      .withColumn("tier",
        when(col("days_inactive") <= 7, "hot")
          .when(col("days_inactive") <= 30, "warm")
          .otherwise("cold"))
      .withColumn("key_bytes",
        lit(24L) + length(coalesce(col("props"), lit(""))).cast("long"))
      .groupBy(col("table_name"), col("tier"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("key_bytes")).as("tier_bytes"),
        min(col("days_inactive")).as("min_days"),
        max(col("days_inactive")).as("max_days"))
      .orderBy(col("table_name"), col("tier"))
  }

  /** Backfill plan: the recovery playbook when a resume point may
    * predate the retention horizon. The key space is segmented into
    * `nSegments` equal-count ranges (the parallel-load worker
    * assignment of `cdc_full_load_ranges`), and each segment is
    * audited against the horizon (feed head − retention, the
    * `cdc_retention_audit` bound): a segment whose keys have ANY
    * changes older than the horizon cannot be rebuilt from the
    * stream alone → `reload` (full-load those ranges from the
    * source); a segment whose history is entirely inside retention
    * replays from the stream → `replay`. Output per segment: key
    * range, key/change counts, aged mass, decision.
    *
    * Scale shape: distinct keys reduce map-side; the segment
    * assignment is the two-phase NTILE (no global window); the audit
    * joins the feed to its key's segment on the key (the
    * apply-changes exchange family) with the 1-row head broadcast.
    */
  def backfillPlan(
      changes: DataFrame,
      retentionHours: Int = 24,
      nSegments: Int = 8): DataFrame = {
    val live = changes.filter(col("ts").isNotNull)
    val keys = live.select(col("user_id")).distinct()
    val segs = graft.functions.Ranks
      .grouped(keys, Nil, Seq("user_id"))
      .withColumn("seg",
        expr(graft.functions.Ranks.ntileExpr("rank", "grp_total", nSegments)))
      .select(col("user_id"), col("seg"))
    val head = live.agg(max(col("ts")).as("head_ts"))
    live.join(segs, "user_id").crossJoin(broadcast(head))
      .withColumn("aged",
        when(col("ts") < col("head_ts") -
          expr(s"INTERVAL $retentionHours HOURS"), 1L).otherwise(0L))
      .groupBy(col("seg"))
      .agg(min(col("user_id")).as("lo_key"),
        max(col("user_id")).as("hi_key"),
        countDistinct(col("user_id")).as("n_keys"),
        count(lit(1)).as("n_changes"),
        sum(col("aged")).as("n_aged"))
      .withColumn("aged_share",
        col("n_aged").cast("double") / col("n_changes").cast("double"))
      .withColumn("decision",
        when(col("n_aged") > 0, "reload").otherwise("replay"))
      .orderBy(col("seg"))
  }

  /** Delivery-latency SLO report: per table the p50/p95/p99/max of
    * the commit→delivery latency and the share of records inside a
    * 60 s SLO — the replication-health view an on-call reads next to
    * `cdc_lag_monitor`'s instantaneous high-water gauge (the lag
    * monitor says where the feed IS; this says how it got there).
    *
    * The feed carries no delivery timestamp, so one is PLANTED
    * deterministically (the `cdc_validation` pattern): a 0–30 s
    * portable-hash jitter per event plus a 5-minute straggler on the
    * user_id%13 cohort — so the p99 and the SLO misses are real
    * structure the report must find, and the oracle can recompute
    * them exactly.
    *
    * Percentiles are ⌈n·p/100⌉ rank-picks over (latency, event_id)
    * via the two-phase [[graft.functions.Ranks.grouped]] — exact
    * integers, no single-partition window, engine-reproducible.
    */
  def latencySlo(changes: DataFrame, sloUs: Long = 60000000L): DataFrame = {
    val lat = changes.filter(col("ts").isNotNull)
      .select(col("table_name"), col("event_id"),
        (pmod(Portable.pHash(col("event_id").cast("string")),
          lit(30000000L)) +
          when(col("user_id") % 13 === 0, lit(300000000L))
            .otherwise(lit(0L))).as("lat_us"))
    val ranked = graft.functions.Ranks
      .grouped(lat, Seq("table_name"), Seq("lat_us", "event_id"))
    def pick(p: Int) =
      max(when(col("rank") === expr(s"(grp_total * $p + 99) div 100"),
        col("lat_us"))).as(s"p${p}_us")
    ranked.groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_records"),
        pick(50), pick(95), pick(99),
        max(col("lat_us")).as("max_us"),
        sum(when(col("lat_us") > sloUs, 1L).otherwise(0L)).as("n_slo_miss"))
      .withColumn("slo_rate",
        (col("n_records") - col("n_slo_miss")).cast("double") /
          col("n_records").cast("double"))
      .orderBy(col("table_name"))
  }

  /** Slowly-changing-dimension type-2 history: every change row
    * becomes a VERSION with a validity interval — `valid_from` = its
    * change timestamp, `valid_to` = the key's next change (NULL while
    * the version is open). A delete closes the key without opening a
    * live version, so `is_current` holds only for an open non-delete
    * version. This is the warehouse-side table a replication target
    * materializes when the consumer wants history, not just latest
    * state (the reference's DMS target keeps latest-wins; SCD2 is the
    * standard alternative target shape, and `replayAt` falls out of
    * it as a range predicate `valid_from <= t < valid_to`).
    *
    * Scale shape: ONE exchange on the key; both the version number
    * and the lead() run inside the same per-key sort (Spark plans a
    * single Window over the shared (user_id, ts, event_id) order).
    * Output is |feed| rows — written, not collected. The (ts,
    * event_id) order key is total per key (event ids are unique), so
    * versions are deterministic under retries.
    */
  def scd2History(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    changes
      .filter(col("ts").isNotNull)
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("op"),
        col("table_name"), col("value").as("attr_value"),
        col("ts").as("valid_from"), col("valid_to"),
        (col("valid_to").isNull && col("op") =!= "delete")
          .as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Tombstone garbage collection audit for the compacted changelog
    * ([[latestPerKey]] keeps delete tombstones so late updates can't
    * resurrect a key). Tombstones can't be kept forever — a GC
    * horizon (Kafka's delete.retention.ms; the same bounded-retention
    * family as `cdc_retention_audit`) eventually drops them, and any
    * key whose tombstone is GC'd while OLDER non-delete changes still
    * exist in the retained feed becomes resurrectable by a
    * from-scratch replay — the classic compaction hazard. Per table:
    * key census, tombstones, GC-eligible tombstones (older than
    * `gcDays` before the feed head), and the resurrection-risk count.
    *
    * Scale shape: ONE key exchange computing the per-key latest
    * (max-of-struct, map-side partial) AND the pre-delete change
    * count in the same aggregate — no window, no second scan; the
    * feed head is a 1-row broadcast of the aggregate's own max; the
    * per-table rollup is |tables|-sized.
    */
  def tombstoneGc(changes: DataFrame, gcDays: Int = 7): DataFrame = {
    val perKey = changes
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ts"), col("event_id"), col("op"), col("table_name")))
          .as("last"),
        sum(when(col("op") =!= "delete", 1L).otherwise(0L)).as("n_nondelete"))
      .select(col("user_id"),
        col("last.table_name").as("table_name"),
        col("last.op").as("last_op"),
        col("last.ts").as("last_ts"),
        col("n_nondelete"))
    val head = perKey.agg(max(col("last_ts")).as("head_ts"))
    perKey.crossJoin(broadcast(head))
      .withColumn("is_tombstone", col("last_op") === "delete")
      .withColumn("gc_eligible", col("is_tombstone") &&
        col("last_ts") < col("head_ts") - expr(s"INTERVAL $gcDays DAYS"))
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("n_tombstones"),
        sum(when(col("gc_eligible"), 1L).otherwise(0L)).as("n_gc_eligible"),
        // resurrection risk: the GC'd tombstone key still has at
        // least one non-delete change in the feed that a
        // from-scratch replay would reapply as live state
        sum(when(col("gc_eligible") && col("n_nondelete") > 0, 1L).otherwise(0L))
          .as("n_resurrect_risk"))
      .orderBy(col("table_name"))
  }
}
