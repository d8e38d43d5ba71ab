package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

import graft.cdc.{ChangeFeed, Envelope}

/** The continuous half of the engine (reference behavior:
  * run.py:255-326 `execute_cdc` — tasks start, binlog events stream
  * to Kinesis while consumers read, tasks stop). Batch and streaming
  * share the SAME transforms (ChangeFeed.annotate, Envelope.wrap) —
  * the unified Dataset API means a query tested in batch is the
  * query run on the stream.
  *
  * Scale notes: stateful materialization shuffles once on the
  * (table, key) grouping key and keeps ONE small state row per key —
  * state size is bounded by the DISTINCT (table, key) cardinality
  * ever seen, not stream length: delete tombstones are retained
  * (NoTimeout) so a late earlier update can never resurrect a key,
  * which is exactly the batch twin's semantics (applyChanges sees
  * every tombstone in the log). A delete-heavy deployment that can
  * bound its lateness should trade that invariant for
  * GroupStateTimeout.EventTimeTimeout ≥ the watermark delay,
  * evicting tombstones once no in-flight event can predate them.
  * The windowed stats use a watermark so state for closed windows is
  * dropped, and the sink partitions by the Kinesis-style partition
  * key, so downstream consumers read only their shard's files.
  */
object CdcPipeline {

  /** One raw event, as the binlog/Kinesis stand-in stream delivers it. */
  case class RawEvent(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** One annotated change (RawEvent + CDC columns). */
  case class Change(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String,
      op: String, schema_name: String, table_name: String,
      partition_key: String)

  /** Current materialized row for one key (tombstoned on delete). */
  case class KeyState(
      table_name: String, user_id: Long, event_id: Long,
      ts: Timestamp, value: Double, deleted: Boolean)

  /** Annotate a raw event stream with CDC columns — identical to the
    * batch path (ChangeFeed.annotate works on any DataFrame).
    */
  def annotate(raw: DataFrame): Dataset[Change] = {
    val spark = raw.sparkSession
    import spark.implicits._
    ChangeFeed.annotate(raw).as[Change]
  }

  /** Streaming latest-wins materialization: the streaming twin of
    * ChangeFeed.applyChanges. One state row per (table, key); events
    * compare on (ts, event_id) so late/duplicate micro-batch data
    * can't regress the state; deletes tombstone the key (kept so a
    * late earlier update cannot resurrect a deleted row).
    */
  def applyChangesStream(changes: Dataset[Change]): Dataset[KeyState] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(c => (c.table_name, c.user_id))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateKey)
  }

  /** Full-precision epoch micros from a Timestamp: getTime() alone
    * truncates to MILLIS (sub-ms lives only in getNanos), and the
    * source timestamps carry micros — comparing on getTime would
    * make two same-millisecond changes tie and fall to event_id,
    * diverging from the batch twin's full-precision ts ordering.
    */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private def updateKey(
      key: (String, Long),
      events: Iterator[Change],
      state: GroupState[KeyState]): Iterator[KeyState] = {
    var cur = state.getOption.orNull
    var changed = false
    events.foreach { e =>
      val newer = cur == null ||
        Ordering[(Long, Long)].gt(
          (micros(e.ts), e.event_id), (micros(cur.ts), cur.event_id))
      if (newer) {
        cur = KeyState(key._1, key._2, e.event_id, e.ts, e.value,
          deleted = e.op == "delete")
        changed = true
      }
    }
    if (changed) {
      state.update(cur)
      Iterator.single(cur)
    } else Iterator.empty
  }

  /** One observed timeline transition (streaming twin output). */
  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Last event seen for a user — the O(1) per-key transition state. */
  case class LastSeen(ts: Timestamp, event_id: Long, event_type: String)

  /** Streaming transition extraction — the streaming twin of
    * Analytics.markovTransitions' lag window (the Markov matrix is a
    * tiny downstream aggregate of these pairs). Per-user state keeps
    * only the LAST (ts, event_id, event_type); each arriving event
    * appends one (from, to) fact.
    *
    * Ordering contract: within a micro-batch, events sort on the
    * full-precision (micros, event_id) key before folding, so
    * intra-batch arrival order is irrelevant; ACROSS batches the
    * stream must deliver each user's events in timeline order — the
    * per-partition-key ordering a Kinesis-style shard guarantees
    * (same assumption the reference's consumer makes). A cross-batch
    * straggler would need retractions, which transition FACTS (an
    * append-only output) deliberately do not model.
    */
  def transitionsStream(events: Dataset[RawEvent]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        emitTransitions)
  }

  private def emitTransitions(
      user: Long,
      events: Iterator[RawEvent],
      state: GroupState[LastSeen]): Iterator[Transition] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var last = state.getOption.orNull
    val out = Seq.newBuilder[Transition]
    sorted.foreach { e =>
      if (last != null) out += Transition(user, last.event_type, e.event_type)
      last = LastSeen(e.ts, e.event_id, e.event_type)
    }
    if (last != null) state.update(last)
    out.result().iterator
  }

  /** One CLOSED SCD2 version, as the streaming history builder emits
    * it the moment a key's next change arrives. */
  case class Scd2Closed(
      user_id: Long, version: Long, op: String, table_name: String,
      attr_value: Double, valid_from: Timestamp, valid_to: Timestamp)

  /** The open (current) version a key holds between changes. */
  case class Scd2Open(
      version: Long, op: String, table_name: String,
      value: Double, ts: Timestamp, eventId: Long)

  /** Streaming SCD type-2 maintenance — the streaming twin of
    * ChangeFeed.scd2History. Each arriving change CLOSES the key's
    * open version (emitted append-only with `valid_to` = the new
    * change's timestamp) and becomes the new open version, held in
    * per-key state. Append mode is the honest output contract for a
    * history table: closed versions are immutable facts; the open
    * version per key lives in state, not the sink (emitting it would
    * require a retraction when it closes). So the sink equals the
    * batch history's `valid_to IS NOT NULL` rows exactly — which is
    * the oracle's check.
    *
    * Cross-batch ordering: same per-key in-order delivery contract
    * as [[transitionsStream]] (a Kinesis-style shard delivers one
    * key's records in order); intra-batch arrival order is
    * irrelevant (full-precision (micros, event_id) sort per batch).
    */
  def scd2Stream(changes: Dataset[Change]): Dataset[Scd2Closed] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        emitScd2)
  }

  private def emitScd2(
      user: Long,
      events: Iterator[Change],
      state: GroupState[Scd2Open]): Iterator[Scd2Closed] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var cur = state.getOption.orNull
    val out = Seq.newBuilder[Scd2Closed]
    sorted.foreach { e =>
      if (cur != null)
        out += Scd2Closed(user, cur.version, cur.op, cur.table_name,
          cur.value, cur.ts, e.ts)
      val v = if (cur == null) 1L else cur.version + 1L
      cur = Scd2Open(v, e.op, e.table_name, e.value, e.ts, e.event_id)
    }
    if (cur != null) state.update(cur)
    out.result().iterator
  }

  /** Running ack-frontier per shard — the streaming state. */
  case class FrontierState(
      shard: Long, n_records: Long, n_acked: Long, frontier_seq: Long,
      frontier_ts: Option[Timestamp], frontier_event_id: Option[Long],
      first_gap_seq: Option[Long])

  /** Streaming twin of cdc/Retention.checkpointFrontier: per shard,
    * the contiguous-acked-prefix frontier maintained INCREMENTALLY as
    * records arrive — the state a live exactly-once consumer
    * actually checkpoints from, not a batch audit after the fact.
    * O(1) state per shard (counts + the frontier position + the
    * first gap) under the delivery-time-ack model the gauge plants
    * (an in-flight record never acks later); a deferred-ack
    * deployment swaps in a pending-seq set bounded by the ack-lag
    * window — the same trade `sessionizeStream` documents for its
    * gap state.
    *
    * Ordering contract: per-shard in-order delivery across batches
    * (the Kinesis shard guarantee, as [[transitionsStream]]);
    * intra-batch order irrelevant (full-precision sort per batch).
    * Update mode: each batch emits the shard's running frontier —
    * the checkpoint a consumer could take at that instant.
    */
  def frontierStream(
      feed: Dataset[(Long, Timestamp, Long)]): Dataset[FrontierState] = {
    val spark = feed.sparkSession
    import spark.implicits._
    feed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        advanceFrontier)
  }

  private def advanceFrontier(
      shard: Long,
      events: Iterator[(Long, Timestamp, Long)],
      state: GroupState[FrontierState]): Iterator[FrontierState] = {
    val sorted = events.toSeq.sortBy(e => (micros(e._2), e._3))
    var s = state.getOption.getOrElse(
      FrontierState(shard, 0L, 0L, 0L, None, None, None))
    sorted.foreach { case (_, ts, id) =>
      val seq = s.n_records + 1
      val acked = id % 37L != 0L
      s = s.copy(
        n_records = seq,
        n_acked = s.n_acked + (if (acked) 1L else 0L),
        first_gap_seq =
          if (!acked && s.first_gap_seq.isEmpty) Some(seq)
          else s.first_gap_seq)
      if (acked && s.first_gap_seq.isEmpty)
        s = s.copy(frontier_seq = seq, frontier_ts = Some(ts),
          frontier_event_id = Some(id))
    }
    if (sorted.nonEmpty) { state.update(s); Iterator.single(s) }
    else Iterator.empty
  }

  /** Driver-checked roundtrip for [[frontierStream]]: file-stream
    * source → annotate + shard → incremental frontier → update-mode
    * memory sink; the LATEST state per shard (n_records is monotone,
    * so max picks it batch-count-independently) plus the replay
    * arithmetic must equal the batch audit exactly — which is what
    * the shared oracle recomputes.
    */
  def frontierRoundtrip(spark: SparkSession, dir: String): DataFrame =
    // 8 state partitions = the shard count: the stateful operator has
    // exactly 8 groups, so every partition past 8 is a state store
    // committed per batch for provably zero keys (r14 width sweep:
    // see withStateParts)
    withStateParts(spark, 8) {
    import spark.implicits._
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = graft.Tables.withEventTime(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val sharded = ChangeFeed.withShard(ChangeFeed.annotate(raw), 8)
      .filter(col("ts").isNotNull)
      .select(col("shard"), col("ts"), col("event_id"))
      .as[(Long, Timestamp, Long)]
    val states = frontierStream(sharded)
    drainToLocal(spark, states, OutputMode.Update) { sink =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("n_records").desc)
      sink.withColumn("_rn",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
        .select(col("shard"), col("n_records"), col("n_acked"),
          col("frontier_seq"), col("frontier_ts"), col("frontier_event_id"),
          col("first_gap_seq"),
          (col("n_acked") - col("frontier_seq")).as("n_beyond_frontier"),
          (col("n_records") - col("frontier_seq")).as("n_redelivered"))
        .orderBy(col("shard"))
    }
  }

  /** Driver-checked roundtrip for [[scd2Stream]]: file-stream source
    * → streaming SCD2 → append memory sink; output = every closed
    * version, bit-comparable to the batch history minus its open
    * rows. */
  def scd2Roundtrip(spark: SparkSession, dir: String): DataFrame =
    // floor 8, size-derived (statePartsFor): per-user state is CPU-bound in the one
    // data batch, but the sink-side sort below reads the full closed
    // history, so the width trades batch parallelism against the
    // per-batch store-commit barrier (r14 width sweep)
    withStateParts(spark, statePartsFor(dir, 8)) {
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = graft.Tables.withEventTime(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val versions = scd2Stream(annotate(raw.filter(col("ts").isNotNull)))
    drainFilesSummarized(spark, versions)(
      _.orderBy(col("user_id"), col("version")))
  }

  /** Run `body` with spark.sql.shuffle.partitions transiently set to
    * `n` — the state-partition sizing every stateful roundtrip here
    * uses. The conf is FIXED per streaming query at start, so it must
    * be set before `.start()`; the finally restores the session width
    * for whatever batch query runs next.
    *
    * Why: a micro-batch commits one state store per shuffle partition
    * per stateful operator per batch (an outer interval join commits
    * 4 per partition), so partition count multiplies a fixed per-
    * barrier cost that has nothing to do with data volume — and the
    * sequential-barrier structure is exactly what amplifies co-tenant
    * CPU bursts 2-3× on a shared host (BASELINE.md round-13
    * adjudication). Measured at sf0.1 going 32 → 4 on the outer
    * interval join: 12.3 s → 7.6 s; the r14 width sweep on the rest
    * of the stateful suite is recorded at each call site. This is the
    * real deployment practice — state partitions are sized to the
    * stateful load (key cardinality / state size), not to the
    * session's batch-shuffle width; a 100 TB stream raises it back.
    */
  private def withStateParts[T](spark: SparkSession, n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Size-derived state width for the DATA-HEAVY stateful roundtrips
    * (per-user / per-event state): `floor` at bench scale, growing
    * one partition per 8 MB of parquet feed (≈64 MB decompressed
    * state at the feed's measured ~8× compression) so the single
    * data batch keeps its parallelism when the feed outgrows the
    * floor — the "a 100 TB stream raises it back" contract as code,
    * not prose. At the test scales the floor always binds (sf1's
    * events.parquet is 15.7 MB), verified by an interleaved sf1 A/B
    * reading identical widths both sides; the growth arm is pinned
    * arithmetically by StatePartsSpec. Key-bounded state (the
    * 8-shard frontier) and group-bounded state (the windowed
    * aggregate) do NOT use this — width past the key count is
    * store-commits for provably empty stores at any feed size.
    */
  private[graft] def statePartsFor(dir: String, floor: Int): Int =
    statePartsForBytes(feedBytes(s"$dir/events.parquet"), floor,
      org.apache.spark.sql.SparkSession.active
        .sessionState.conf.numShufflePartitions)

  /** Content bytes of a feed path: a plain file's length, or the sum
    * of regular-file sizes under a DIRECTORY parquet. The directory
    * walk matters precisely at scale: `Files.size` on a directory
    * returns the directory-entry size (~4 KB), which would silently
    * pin every multi-file feed — i.e. exactly the at-scale feeds the
    * growth arm exists for — to the floor. An unreadable feed logs
    * once and degrades to 0 bytes (the floor binds) rather than
    * failing the build, but never SILENTLY: a mis-pathed deployment
    * should see why its state width stayed small.
    */
  private[graft] def feedBytes(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    try {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      } else java.nio.file.Files.size(p)
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[graft] statePartsFor: feed $path unreadable (${e.getClass.getSimpleName}); " +
            "state width stays at the floor")
        0L
    }
  }

  /** The pure sizing law behind [[statePartsFor]], separated so the
    * growth arm is unit-testable at byte counts no testdata reaches.
    * The cap is the session's shuffle width (same rule as
    * Dedup.clusterLabels): on the local[32] harness that is 32, on a
    * real cluster the configured width — so the law genuinely IS the
    * 100 TB contract, instead of a harness constant pretending to be.
    */
  private[graft] def statePartsForBytes(bytes: Long, floor: Int, cap: Int): Int =
    math.max(floor, math.min(cap, (bytes / (8L << 20)).toInt))

  /** Run a streaming relation to completion into a transient memory
    * sink, apply `summarize` to the sink table ENGINE-SIDE, and copy
    * only ITS rows out as a LOCAL DataFrame (the bench drops caches
    * between queries, which would empty the sink view under a later
    * consumer). Shared by the windowed/session/SCD2 roundtrips.
    *
    * The summarize-before-collect order is the scale contract
    * (guide §5 "the driver should do almost no data work"): the raw
    * drained relation grows with the feed (an sf10 rehearsal's
    * interval-join pairs serialized past spark.driver.maxResultSize
    * and killed the query), while every caller's summary is bounded
    * (|groups| / |users| / the declared result). Collecting the
    * summary instead of the raw sink computes the identical rows —
    * the summary ran in Spark either way, only the collect boundary
    * moves below it.
    */
  private def drainToLocal(
      spark: SparkSession,
      ds: org.apache.spark.sql.Dataset[_],
      mode: OutputMode)(
      summarize: DataFrame => DataFrame = identity): DataFrame = {
    val name = s"graft_sink_${System.nanoTime}"
    val q = ds.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    val t = summarize(spark.table(name))
    val rows = t.collect()
    val out = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), t.schema)
    spark.catalog.dropTempView(name)
    out
  }

  /** Append-mode drain for streams whose RAW output grows with the
    * feed (interval-join pairs, per-session rows): the memory sink is
    * unusable there — it collects every micro-batch to the DRIVER, so
    * the sf10 rehearsal's attribution pairs (>1 GiB serialized) blew
    * spark.driver.maxResultSize before any summary ran. Stream to a
    * transient PARQUET sink instead (guide §5 "don't collect; write
    * out and read back"), summarize the read-back relation
    * engine-side, and collect only the bounded summary. Same rows:
    * the file sink's _spark_metadata commits exactly the epochs the
    * memory sink would have held. Memory-sink drain stays for
    * Update/Complete streams (file sinks are append-only), whose
    * relations are state-bounded aggregates, not feed-sized.
    */
  private def drainFilesSummarized(
      spark: SparkSession,
      ds: org.apache.spark.sql.Dataset[_])(
      summarize: DataFrame => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_drain")
    val out = dir.resolve("out").toString
    val chk = dir.resolve("chk").toString
    try {
      val q = ds.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
      // explicit schema: a zero-row drain leaves no data file to
      // infer from, and the summary must still type-check.
      // localCheckpoint (not collect + local relation): the summary
      // materializes into EXECUTOR blocks, so a data-sized summary
      // (the SCD2 closed history IS the declared result) never
      // crosses the driver, while staying independent of the temp
      // dir (deleted below) and of the bench's cache clears.
      val t = summarize(spark.read.schema(ds.toDF().schema).parquet(out))
      val cp = t.localCheckpoint()
      // the checkpoint's executor blocks outlive Dataset.unpersist
      // (it only clears CacheManager entries) — register an explicit
      // RDD unpersist so the harness's releaseAll frees them instead
      // of waiting on GC + ContextCleaner, which at sf10 lets a
      // data-sized drain (the SCD2 full history) overlap the next
      // query's memory window
      graft.CacheScope.registerReleaseHook(() =>
        org.apache.spark.sql.graft.ExpressionBridge.unpersistCheckpoint(cp))
      cp
    } finally removeRecursively(dir)
  }

  /** Watermark delay derived from the ordering audit
    * (cdc/TableStatistics.orderingAudit): the measured max per-key
    * lateness, rounded up to whole seconds plus a 1 s guard. Closes
    * the loop the audit exists for — measure how late the feed
    * actually delivers, then configure the streaming apply to
    * tolerate exactly that (plus guard) instead of guessing a delay.
    *
    * Scope: per-key lateness bounds the needed watermark when the
    * disorder is within-key reversal at the stream head (the
    * audit's planted failure mode, and the Kinesis partition-key
    * contract's: a key rides one shard, so its reversal happens
    * against its own delivered prefix). Cross-shard skew beyond the
    * key's own head is a multi-source watermark problem the audit
    * does not claim to bound.
    *
    * The audit result is |tables| rows, so the driver-side max is a
    * bounded collect (same class as the roundtrip summary).
    */
  def auditWatermarkDelay(audit: DataFrame): String = {
    val m = audit.agg(max(col("max_late_us"))).head()
    val us = if (m.isNullAt(0)) 0L else m.getLong(0)
    s"${us / 1000000L + 1} seconds"
  }

  /** Watermarked tumbling-window op counts — the streaming twin of
    * ChangeFeed.windowedStats. The watermark bounds state: windows
    * older than (max event time - delay) are finalized and dropped.
    */
  def windowedStatsStream(changes: Dataset[Change], delay: String = "1 hour"): DataFrame =
    changes.toDF()
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("op"))
      .agg(count(lit(1)).as("n_ops"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("win.start").as("window_start"), col("op"),
        col("n_ops"), col("total_value"))

  /** Streaming twin of TableStatistics.lagMonitor's per-table
    * high-water marks: a running complete-mode aggregate (state =
    * |tables| rows, bounded). Lag against the head is derived from
    * the tiny result wherever it lands — a monitoring consumer does
    * one max over |tables| rows per refresh; putting the head
    * subtraction inside the streaming plan would force a second
    * stateful aggregate for no state saving.
    */
  def lagMonitorStream(changes: Dataset[Change]): DataFrame =
    changes.toDF().groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("max_ts_us"))

  /** Wrap a change stream into envelope messages (stateless — reuses
    * the batch Envelope transform verbatim).
    */
  def envelopeStream(changes: Dataset[Change]): DataFrame =
    Envelope.wrap(
      changes.toDF(),
      col("op"), col("schema_name"), col("table_name"), col("ts"),
      col("event_id"), // stream-side txn id: the source event id
      Seq("event_id", "user_id", "value", "props"))

  /** Streaming sessionization: Spark's native session_window merges
    * per-key events separated by less than `gap` — the streaming twin
    * of Analytics.eventsSessionize (which computes the same sessions
    * with lag + cumulative breaks in batch). The watermark closes
    * sessions once event time passes gap + delay, bounding state.
    */
  def sessionizeStream(
      changes: Dataset[Change],
      gap: String = "30 minutes",
      delay: String = "1 hour"): DataFrame =
    changes.toDF()
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"),
        min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("session_value"))

  /** foreachBatch upsert: maintain a parquet state table from the
    * change stream without any table-format dependency. Each
    * micro-batch merges into the previous state with latest-wins
    * semantics (tombstones kept, see ChangeFeed.latestPerKey) and
    * writes an immutable new version directory — readers always see
    * a complete consistent version, the classic
    * write-new-then-repoint layout.
    *
    * Scale notes: the merge is one shuffle on the key; state and
    * batch are both key-partitioned parquet, and versioned dirs give
    * atomic publication without read-modify-write races.
    */
  def foreachBatchUpsert(
      changes: Dataset[Change],
      stateDir: String,
      checkpoint: String): DataStreamWriter[Change] =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Change], batchId: Long) =>
        // an empty micro-batch (source files filtered to zero rows)
        // must not rewrite and republish the FULL unchanged state —
        // O(total state) I/O plus version churn that deletes the dir
        // a reader may have just resolved (the bucketed twin guards
        // the same case via its touched-bucket set)
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val fs = hadoopFs(spark, stateDir)
          val root = new org.apache.hadoop.fs.Path(stateDir)
          // ONE listing per batch serves the staging sweep, the
          // version resolution, AND the post-publish prune — on an
          // object store the LIST is the expensive metadata call
          val entries =
            if (fs.exists(root)) fs.listStatus(root).toSeq else Nil
          sweepStaging(fs, entries)
          // monotonic version (max existing + 1), NOT the batchId: a
          // fresh-checkpoint restart over existing state restarts
          // batchId at 0, and a v=0 dir under a v=N state would never
          // be read — see upsertBucketedBatch
          val prevVersions = entries.map(_.getPath.getName)
            .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
          val prevV =
            if (prevVersions.isEmpty) None else Some(prevVersions.max)
          val prev = prevV.map(v => spark.read.parquet(s"$stateDir/v=$v"))
          val all = prev match {
            case Some(p) => p.unionByName(batch.toDF())
            case None => batch.toDF()
          }
          val newV = prevV.getOrElse(-1L) + 1
          // stage under .tmp-N, publish with ONE rename: a crash
          // mid-write leaves only a staging dir the next batch sweeps,
          // never a partial v=N that latestVersion would read as the
          // newest complete state
          val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/.tmp-$newV")
          ChangeFeed.latestPerKey(all, Seq("table_name", "user_id"),
              Seq(col("ts"), col("event_id")))
            .write.mode("overwrite").parquet(tmp.toString)
          val dest = new org.apache.hadoop.fs.Path(s"$stateDir/v=$newV")
          if (fs.exists(dest)) fs.delete(dest, true)
          if (!fs.rename(tmp, dest))
            throw new java.io.IOException(s"publish failed: $tmp -> $dest")
          // prune from the pre-publish listing: retained = newV + the
          // newest previous version (the keep=2 contract) — no re-LIST
          prevVersions.sorted.reverse.drop(1).foreach(v =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/v=$v"), true))
        }
        (): Unit
      }

  /** The full-load → CDC cutover THROUGH the streaming machinery —
    * the deployable twin of graft.cdc.Handoff.snapshotHandoff. The
    * snapshot image publishes as the state table's version 0, each
    * row stamped at its READ position ((read_ts, +∞) — ts = the
    * key's snapshot read time, event_id = Long.MaxValue), and the
    * overlapping change stream then runs through the standard
    * [[foreachBatchUpsert]] with NO special-casing: the upsert's
    * plain (ts, event_id) latest-wins ordering IS the position
    * merge — a cached change (position ≤ read_ts) loses to the image
    * that already contains it, a later change wins, a delete
    * tombstones the key. Exactly-once at the seam falls out of the
    * ordering, not from deduplication.
    *
    * Output per table: final key count, value mass, and how many
    * winners came from the image vs the stream — equal by
    * construction to the batch handoff's merge, which the oracle
    * recomputes (and `cdc_snapshot_handoff` proves equal to the
    * full-feed apply).
    *
    * Scale shape: the snapshot is the one-shuffle latest-per-key
    * batch job; the stream is the standard upsert (one key shuffle
    * per batch, versioned-dir publication); the summary is a
    * |tables|-row rollup collected into a local frame so the temp
    * state can be deleted before returning.
    */
  def snapshotHandoffRoundtrip(
      spark: SparkSession,
      dir: String,
      snapStart: String,
      windowSeconds: Int): DataFrame = {
    import graft.cdc.Handoff
    val tmp = java.nio.file.Files.createTempDirectory("graft_handoff_state")
    val stateDir = s"$tmp/state"
    val ckpt = s"$tmp/ckpt"
    try {
      val start = lit(snapStart).cast("timestamp")
      val feed = ChangeFeed.fromEvents(spark, dir)
        .filter(col("ts").isNotNull)
        .withColumn("read_ts",
          Handoff.readTs(start, col("user_id"), windowSeconds))
      // v=0: the snapshot image at its read positions (the SHARED
      // batch definition — Handoff.snapshotImage)
      Handoff.snapshotImage(feed)
        .select(lit(Long.MaxValue).as("event_id"),
          col("read_ts").as("ts"), col("user_id"), col("event_type"),
          col("value"), col("props"), lit("load").as("op"),
          col("schema_name"), col("table_name"), col("partition_key"))
        .write.parquet(s"$stateDir/v=0")
      // the CDC task: resume from the window start, stream through
      // the standard upsert against the pre-seeded state
      val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
      val raw = graft.Tables.withEventTime(
        spark.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
      val changes = annotate(raw.filter(col("ts").isNotNull))
        .filter(col("ts") > start)
      val q = foreachBatchUpsert(changes, stateDir, ckpt).start()
      try q.processAllAvailable() finally q.stop()
      val summary = materializedView(spark, stateDir)
        .groupBy(col("table_name"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"),
          sum(when(col("event_id") === Long.MaxValue, 1L).otherwise(0L))
            .as("n_from_snapshot"),
          sum(when(col("event_id") =!= Long.MaxValue, 1L).otherwise(0L))
            .as("n_from_cdc"))
        .orderBy(col("table_name"))
      // copy out before deleting the backing state files
      val rows = summary.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), summary.schema)
    } finally removeRecursively(tmp)
  }

  /** Delete `.tmp-*` staging dirs a crashed writer orphaned —
    * SINGLE WRITER PER stateDir: the sweep deletes ALL staging dirs,
    * including one a concurrent writer might have in flight; that
    * matches both sinks' design (one streaming query owns a
    * stateDir; foreachBatch serializes batches within it). If
    * multi-writer sharing is ever wanted, scope the sweep to dirs
    * older than a grace age instead of deleting unconditionally.
    */
  private def sweepStaging(
      fs: org.apache.hadoop.fs.FileSystem,
      entries: Seq[org.apache.hadoop.fs.FileStatus]): Unit =
    entries.map(_.getPath)
      .filter(_.getName.startsWith(".tmp-"))
      .foreach(p => fs.delete(p, true))

  /** Delete superseded `v=N` dirs from an ALREADY-KNOWN version
    * list, keeping the newest `keep` (latest for readers repointing
    * now, latest-1 for a reader that resolved the version just
    * before a publish). Without pruning a steady stream accumulates
    * one full state copy per batch forever. The caller supplies the
    * versions it listed earlier in the same batch — no re-LIST.
    */
  private def pruneVersions(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      versions: Seq[Long],
      keep: Int = 2): Unit =
    versions.sorted.dropRight(keep).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v=$v"), true))

  // --- bucket-partitioned incremental upsert ----------------------

  /** Incremental twin of [[foreachBatchUpsert]]: state is
    * hash-partitioned into `nBuckets` key buckets, each bucket
    * versioned independently (`stateDir/bucket=B/v=N/`), and a
    * micro-batch merges and rewrites ONLY the buckets its keys hash
    * into. The full-rewrite variant's per-batch I/O is O(total
    * state); this is O(state in touched buckets) — the difference
    * between a scale-killer and a steady-state pipeline when state is
    * 100 TB and a batch touches a sliver of the key space.
    *
    * Mechanics per batch: tag rows with bucket = pmod(hash(table,
    * key), nBuckets); read the latest version of just the touched
    * buckets (directory-pruned, no full-state scan); latest-wins
    * merge (same ChangeFeed.latestPerKey semantics, tombstones kept);
    * write the merged buckets partitioned by bucket into a temp dir,
    * then rename each bucket dir to its new version — readers always
    * see a complete version per bucket, untouched buckets stay
    * byte-identical.
    */
  def foreachBatchUpsertBucketed(
      changes: Dataset[Change],
      stateDir: String,
      checkpoint: String,
      nBuckets: Int = 64): DataStreamWriter[Change] =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Change], _: Long) =>
        upsertBucketedBatch(batch.toDF(), stateDir, nBuckets)
      }

  private def bucketCol(nBuckets: Int) =
    pmod(hash(col("table_name"), col("user_id")), lit(nBuckets))

  /** Fail fast if `nBuckets` disagrees with what the state dir was
    * written with: nothing else persists the bucket count, and a
    * restart with a different value re-hashes keys into OTHER
    * buckets — the merge would never see (or supersede) a key's old
    * row, so the union view returns duplicates and deletes stop
    * tombstoning the old copy (silent resurrection). First writer
    * records the count in a `_n_buckets` marker; every batch
    * validates against it (one tiny read vs the per-bucket LISTs the
    * batch already pays).
    */
  private def checkBucketLayout(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      nBuckets: Int): Unit = {
    val marker = new org.apache.hadoop.fs.Path(root, "_n_buckets")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val recorded =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      require(recorded == nBuckets,
        s"state dir $root was written with nBuckets=$recorded; " +
          s"restarting with nBuckets=$nBuckets would split keys across " +
          "bucket layouts (duplicate/resurrected keys)")
    } else {
      val out = fs.create(marker, true)
      try out.write(nBuckets.toString.getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** One bucket-scoped merge step (exposed for batch-twin testing).
    *
    * Version numbering is monotonic over the STATE DIRECTORY (max
    * existing version + 1), not the streaming batchId: a stream
    * restarted with a fresh checkpoint over existing state restarts
    * batchId at 0, and publishing v=0 under buckets already at v=N
    * would pin every reader and merge to the stale N — silent data
    * loss. Replays are safe without version reuse because the
    * latest-wins merge is idempotent: re-merging an already-applied
    * batch publishes a new version with identical content.
    */
  def upsertBucketedBatch(
      batch: DataFrame, stateDir: String, nBuckets: Int): Unit = {
    val spark = batch.sparkSession
    // the batch is consumed twice (touched-bucket collect + merged
    // write) — persist so a real source isn't re-read per consumer
    val tagged = batch.withColumn("bucket", bucketCol(nBuckets)).persist()
    try {
      // touched buckets: bounded by nBuckets (a deliberately small
      // constant), so the collect is a driver-side set, not data
      val touched = tagged.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      val fs = hadoopFs(spark, stateDir)
      // sweep staging dirs a crashed writer orphaned between its
      // parquet write and the bucket renames — later batches use
      // fresh version suffixes, so nothing reclaims these except
      // [[sweepStaging]] (single-writer contract documented there)
      val root = new org.apache.hadoop.fs.Path(stateDir)
      sweepStaging(fs,
        if (fs.exists(root)) fs.listStatus(root).toSeq else Nil)
      checkBucketLayout(fs, root, nBuckets)
      // ONE listing per touched bucket serves version resolution AND
      // the post-publish prune
      val prevVersions = touched.map(b => b -> versionsUnder(fs,
        new org.apache.hadoop.fs.Path(s"$stateDir/bucket=$b")))
      val newVersion =
        (prevVersions.flatMap(_._2.lastOption) :+ -1L).max + 1
      val prevDirs = prevVersions.collect {
        case (b, vs) if vs.nonEmpty => s"$stateDir/bucket=$b/v=${vs.last}"
      }
      val prev =
        if (prevDirs.isEmpty) None
        else Some(spark.read.option("basePath", stateDir)
          .parquet(prevDirs.toIndexedSeq: _*)
          .drop("v"))
      val all = prev match {
        case Some(p) => p.unionByName(tagged)
        case None => tagged
      }
      val merged = ChangeFeed.latestPerKey(all, Seq("table_name", "user_id"),
        Seq(col("ts"), col("event_id")))
      val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/.tmp-$newVersion")
      merged.write.mode("overwrite").partitionBy("bucket")
        .parquet(tmp.toString)
      val prevByBucket = prevVersions.toMap
      touched.foreach { b =>
        val from = new org.apache.hadoop.fs.Path(s"$tmp/bucket=$b")
        if (fs.exists(from)) {
          val toDir = new org.apache.hadoop.fs.Path(s"$stateDir/bucket=$b")
          fs.mkdirs(toDir)
          val dest = new org.apache.hadoop.fs.Path(s"$toDir/v=$newVersion")
          // monotonic versions make collisions impossible in normal
          // operation; replace defensively if a crashed writer left one
          if (fs.exists(dest)) fs.delete(dest, true)
          if (!fs.rename(from, dest))
            throw new java.io.IOException(
              s"failed to publish state version $dest")
          // superseded versions of THIS bucket are dead weight now —
          // prune to the newest two so steady streaming cannot
          // accumulate one bucket copy per touching batch forever
          // (from the pre-publish listing, no re-LIST)
          pruneVersions(fs, toDir, prevByBucket(b) :+ newVersion)
        }
      }
      fs.delete(tmp, true)
      (): Unit
    } finally {
      tagged.unpersist(blocking = false)
      (): Unit
    }
  }

  /** Latest state across all buckets, minus tombstones. */
  def materializedViewBucketed(spark: SparkSession, stateDir: String): DataFrame = {
    val fs = hadoopFs(spark, stateDir)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val latest =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket=").toInt)
        .flatMap(b => versionsUnder(fs,
            new org.apache.hadoop.fs.Path(s"$stateDir/bucket=$b"))
          .lastOption.map(v => s"$stateDir/bucket=$b/v=$v"))
    if (latest.isEmpty)
      throw new IllegalStateException(s"no state buckets under $stateDir")
    spark.read.option("basePath", stateDir).parquet(latest.toIndexedSeq: _*)
      .drop("v")
      .filter(col("op") =!= "delete")
  }

  private def hadoopFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Ascending `v=N` versions under `dir` (empty if absent) — the
    * ONE listing that serves version resolution AND pruning; on an
    * object store LIST is the expensive metadata call, so every
    * consumer derives from this list instead of re-listing.
    */
  private def versionsUnder(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted

  /** The materialized view: latest state version minus tombstones. */
  def materializedView(spark: SparkSession, stateDir: String): DataFrame = {
    val fs = hadoopFs(spark, stateDir)
    val v = versionsUnder(fs, new org.apache.hadoop.fs.Path(stateDir))
      .lastOption.getOrElse(
        throw new IllegalStateException(s"no state versions under $stateDir"))
    spark.read.parquet(s"$stateDir/v=$v").filter(col("op") =!= "delete")
  }

  /** Streaming exact dedup of the change feed: at-least-once sources
    * (Kinesis re-polls, binlog reconnects) deliver duplicate events;
    * dropDuplicatesWithinWatermark keys on event_id and bounds the
    * dedup state by the watermark — at 100 TB/day the state holds one
    * tiny row per event id seen within the late window, not forever.
    */
  def dedupStream(changes: Dataset[Change], delay: String = "1 hour"): Dataset[Change] =
    changes
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Operational task-status surface — the engine-side mirror of the
    * reference's task lifecycle waits (run.py:154-165 polls
    * replication-task status running → stopped before moving on).
    * Wraps StreamingQuery/StreamingQueryProgress into one flat row a
    * task runner can poll or join on.
    *
    * `recentInputRows` sums the RETAINED progress window
    * (`spark.sql.streaming.numRecentProgressUpdates`, default 100
    * batches) — a freshness/volume signal, NOT a lifetime total; a
    * lifetime counter needs a StreamingQueryListener accumulating
    * every event. Predicates should compare against per-batch
    * expectations or batch ids, not a whole-stream row count.
    */
  case class TaskStatus(
      name: String, id: String, isActive: Boolean,
      latestBatchId: Long, numInputRows: Long, recentInputRows: Long)

  def taskStatus(q: org.apache.spark.sql.streaming.StreamingQuery): TaskStatus = {
    val last = Option(q.lastProgress)
    val recent = q.recentProgress.map(_.numInputRows).sum
    TaskStatus(
      Option(q.name).getOrElse(""), q.id.toString, q.isActive,
      last.map(_.batchId).getOrElse(-1L),
      last.map(_.numInputRows).getOrElse(0L),
      recent)
  }

  /** Poll a query's status until `pred` holds or `timeoutMs` elapses;
    * returns whether the predicate was met — the `wait_for_status`
    * idiom as a library call.
    */
  def awaitStatus(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long)(pred: TaskStatus => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = pred(taskStatus(q))
    while (!ok && System.nanoTime() < deadline) {
      Thread.sleep(50)
      ok = pred(taskStatus(q))
    }
    ok
  }

  /** End-to-end file roundtrip of ONE selected table through the
    * streaming pipeline: file-stream source over the events parquet →
    * annotate → envelope → kinesisLikeSink (partitioned JSON), then
    * the batch EnvelopeSource reads the sink back and reduces it to a
    * per-(record_type, operation, table) content summary. This is the
    * reference's single-table replication loop (run.py: start task,
    * stream to Kinesis, read the one shard back, check counts) as one
    * driver-checkable query — the summary must equal the same
    * aggregate computed directly over the source, which is exactly
    * what the DuckDB oracle recomputes.
    *
    * The table selection (user_id % 4 == 0 ⇒ users_0) mirrors the
    * reference's selection-rule scoping of a replication task AND
    * bounds the sink I/O to one shard's worth of the feed.
    */
  def fileRoundtrip(spark: SparkSession, dir: String, tmpRoot: String): DataFrame = {
    val sink = s"$tmpRoot/sink"
    val ckpt = s"$tmpRoot/ckpt"
    // same ts normalization as Tables.loadEvents (schema-dispatched:
    // raw-nanos long on legacy readers, timestamp_ntz on Spark 4.1+),
    // on a file STREAM source (schema comes from the batch footer
    // read). The testdata ships one parquet FILE per table and the
    // streaming file source lists a DIRECTORY — so stream the SF dir
    // with a glob pinned to the events file.
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = graft.Tables.withEventTime(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
      .filter(col("user_id") % 4 === 0)
    val q = kinesisLikeSink(envelopeStream(annotate(raw)), sink, ckpt).start()
    try { q.processAllAvailable() } finally { q.stop() }
    val dataSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))
    graft.sources.EnvelopeSource.changeFeed(spark, sink, dataSchema)
      .groupBy(col("record_type"), col("operation"), col("table_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("data.user_id")).as("sum_user_id"),
        sum(col("data.value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
  }

  /** Driver-checkable STREAMING twin of ChangeFeed.idempotentApply's
    * delivery dedup: two file-stream sources (the feed plus a planted
    * redelivery of every event_id%7==0 record — at-least-once
    * arrival) union into one stream, and
    * `dropDuplicatesWithinWatermark` on the delivery identity
    * restores exactly-once downstream. The append-mode sink is then
    * reduced per table and must equal the batch aggregate over the
    * raw feed — which is what the DuckDB oracle recomputes.
    *
    * The watermark delay is sized past the feed's replay span (the
    * whole history arrives in one burst when a file source replays
    * it), which is the honest general rule: delay ≥ the maximum
    * redelivery lag, here bounded by the replay itself. A live
    * deployment feeds the measured bound from `cdc_watermark_plan`
    * instead, and state stays proportional to the in-flight window
    * rather than the stream's history — the reason this operator
    * exists over plain dropDuplicates.
    */
  def dedupRoundtrip(spark: SparkSession, dir: String): DataFrame =
    // floor 8, size-derived: dedup state is one row per event_id — the
    // largest state in the suite — but the replay is 2 barriers and
    // the store-commit overhead at 32 dominated the extra scan
    // parallelism (r14 width sweep)
    withStateParts(spark, statePartsFor(dir, 8)) {
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    def src = graft.Tables.withEventTime(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val planted = src.unionByName(src.filter(col("event_id") % 7 === 0))
    val deduped = ChangeFeed.annotate(planted)
      .withWatermark("ts", "35 days")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("table_name"), col("event_id"), col("value"))
    // file-sink drain: the deduped relation is the whole feed — a
    // memory sink would collect it to the driver batch by batch (the
    // sf10 rehearsal's scale wall); the parquet drain keeps it on
    // executors and only the |tables|-row aggregate comes back
    drainFilesSummarized(spark, deduped)(
      _.groupBy(col("table_name"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy(col("table_name")))
  }

  /** Driver-checkable run of [[windowedStatsStream]] over the real
    * file-stream source: the watermarked stateful window aggregate
    * executes through the streaming engine (incremental state, one
    * micro-batch per source split) into a complete-mode memory sink,
    * and the final table must equal ChangeFeed.windowedStats' batch
    * formula — which is exactly what the DuckDB oracle recomputes.
    * cdc_stream_roundtrip proves the stateless envelope path;
    * this proves the STATEFUL operator path end-to-end.
    */
  def windowedRoundtrip(spark: SparkSession, dir: String): DataFrame =
    // 4 state partitions: the window-aggregate state is a few hundred
    // (window, op) groups — partitions beyond single digits only add
    // empty store commits (r14 width sweep)
    withStateParts(spark, 4) {
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = graft.Tables.withEventTime(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val agg = windowedStatsStream(annotate(raw))
    drainToLocal(spark, agg, OutputMode.Complete)(
      _.orderBy(col("window_start"), col("op")))
  }

  /** Session-window aggregation THROUGH the streaming engine, over
    * the DEPLOYABLE operator: file-stream source →
    * [[sessionizeStream]] (watermarked `session_window(ts, 30 min)`,
    * APPEND mode — the production contract: a session is emitted
    * exactly once, when the watermark passes its end, and its state
    * is dropped) → append memory sink → per-user summary. The batch
    * gaps-and-islands formula over the same feed is the oracle:
    * stream-vs-batch equality is the check, the same contract as
    * [[windowedRoundtrip]].
    *
    * Append mode on a finite replay needs the watermark to pass the
    * LAST session's end, which no data batch can do on its own — the
    * classic sentinel flush: the source is staged as two files
    * (`maxFilesPerTrigger = 1`), the feed and then one sentinel row
    * stamped past head + gap + delay under a reserved key. Batch 1
    * carries every real event (the initial watermark is the epoch, so
    * at delay "1 hour" NOTHING is late — SessionStreamSpec pins the
    * zero-drop claim); batch 2's sentinel advances the watermark past
    * every real session, and the engine's watermark-change batch
    * emits them all. The sentinel key is filtered from the summary
    * (its own session stays unemitted in state, by design).
    *
    * Scale shape: session state is keyed by (user, window), merged
    * incrementally, and EVICTED at the watermark — bounded by the
    * live-session working set, never the stream's history (the
    * Complete-mode alternative re-emits the whole result table every
    * trigger and ages nothing out). The summary is a |users|-row
    * rollup.
    */
  def sessionRoundtrip(spark: SparkSession, dir: String): DataFrame =
    // floor 8, size-derived: session-window state is per-user (CPU-heavy
    // merge in the data batch) but the replay runs 3 barriers (two
    // files + the watermark flush), each committing one store per
    // partition (r14 width sweep)
    withStateParts(spark, statePartsFor(dir, 8)) {
    val gap = "30 minutes"
    val delay = "1 hour"
    val stage = stageWithSentinel(spark, dir, marginSeconds = 3 * 3600L)
    try {
      val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
      val raw = graft.Tables.withEventTime(
        spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stage.toString))
      val sessions = sessionizeStream(
        annotate(raw.filter(col("ts").isNotNull)), gap, delay)
      drainFilesSummarized(spark, sessions)(
        _.filter(col("user_id") =!= SentinelUser)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("n_events"),
            max(col("n_events")).as("max_session_events"))
          .orderBy(col("user_id")))
    } finally removeRecursively(stage)
  }

  /** Stream-stream INTERVAL JOIN through the engine — the one
    * stateful streaming primitive the rest of the suite doesn't
    * exercise: purchases and preceding touches ride TWO watermarked
    * event-time streams, joined on user under a two-sided time-range
    * condition (touch in [purchase − lookback, purchase)). The range
    * condition is what makes the state BOUNDED: each side's rows are
    * held only until the other side's watermark passes the range
    * edge, then evicted — without it Spark would have to keep every
    * row forever (and refuses the append-mode query). Append
    * semantics: each qualifying (touch, purchase) pair is emitted
    * exactly once. The batch interval join over the same feed is
    * the oracle (stream-vs-batch equality, the
    * [[sessionRoundtrip]] contract); the summary reduces the drained
    * pairs per touch type.
    *
    * The sentinel staging is the same two-file replay: the sentinel
    * row is stamped past head + lookback + delay, advancing BOTH
    * streams' watermarks past every real pair's flush point; its
    * reserved key can never match a real user on the other side, so
    * it adds no pairs.
    */
  def attributionJoinStream(
      spark: SparkSession,
      dir: String,
      lookback: String = "7 days",
      delay: String = "1 hour"): DataFrame =
    // floor 4, size-derived — the OUTER variant's measured sizing (32 → 4
    // = 12.3 s → 7.6 s there): an interval join commits 4 state
    // stores per partition per micro-batch, the dominant fixed cost
    // of this query's ~4 barriers (r14 width sweep)
    withStateParts(spark, statePartsFor(dir, 4)) {
    val stage = stageWithSentinel(spark, dir, marginSeconds = 9 * 24 * 3600L)
    try {
      val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
      def src(): DataFrame = graft.Tables.withEventTime(
        spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stage.toString))
        .filter(col("ts").isNotNull)
      val touches = src().filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id").as("touch_id"),
          col("ts").as("touch_ts"), col("event_type").as("touch_type"))
        .withWatermark("touch_ts", delay)
      val purchases = src().filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", delay)
      val joined = touches.join(purchases,
        col("user_id") === col("p_user") &&
          col("touch_ts") >= col("purchase_ts") - expr(s"interval $lookback") &&
          col("touch_ts") < col("purchase_ts"))
      drainFilesSummarized(spark, joined)(
        _.filter(col("user_id") =!= SentinelUser)
          .groupBy(col("touch_type"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("purchase_id")).as("n_purchases"),
            countDistinct(col("touch_id")).as("n_touches"))
          .orderBy(col("touch_type")))
    } finally removeRecursively(stage)
  }

  /** Stream-stream LEFT OUTER interval join — the null-emission
    * semantics [[attributionJoinStream]]'s inner join never
    * exercises: every purchase must emit, attributed or not, and an
    * UNATTRIBUTED purchase's null-padded row can only be produced by
    * watermark PASSAGE (the engine may declare "no touch can match
    * any more" only once the touch-side watermark clears the
    * purchase's lookback window — emitting earlier would be wrong,
    * never emitting would drop the purchase). Inner pairs emit
    * eagerly on match exactly as the inner join; the outer rows are
    * the watermark-driven tail. State stays bounded by the same
    * range eviction.
    *
    * Staging plants TWO sentinel rows — one per stream split
    * (`sentinelTypes`): the global watermark is the min across both
    * sides' watermark nodes, so advancing only the touch split would
    * pin it at the purchase head and hold every null row in state.
    * The sentinel purchase's own outer row is
    * unreachable by construction (the touch watermark never passes
    * its margin) and its reserved key is filtered from the summary.
    *
    * Batch oracle: the LEFT interval join over the same feed,
    * unattributed rows under the '(none)' touch type.
    *
    * State-partition sizing: floor 4, size-derived
    * ([[withStateParts]]/statePartsFor) — an outer
    * interval join commits 4 state stores per partition per
    * micro-batch AND runs an extra no-data batch to flush null rows
    * after the watermark moves, so partition count multiplies a
    * 3-batch fixed cost (measured 12.3 s → 7.6 s at sf0.1 going
    * 32 → 4).
    */
  def attributionJoinOuterStream(
      spark: SparkSession,
      dir: String,
      lookback: String = "7 days",
      delay: String = "1 hour"): DataFrame =
    withStateParts(spark, statePartsFor(dir, 4)) {
    val stage = stageWithSentinel(spark, dir, marginSeconds = 9 * 24 * 3600L,
      sentinelTypes = Seq("sentinel", "purchase"))
    try {
      val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
      def src(): DataFrame = graft.Tables.withEventTime(
        spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stage.toString))
        .filter(col("ts").isNotNull)
      val touches = src().filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("t_user"), col("event_id").as("touch_id"),
          col("ts").as("touch_ts"), col("event_type").as("touch_type"))
        .withWatermark("touch_ts", delay)
      val purchases = src().filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", delay)
      val joined = purchases.join(touches,
        col("t_user") === col("p_user") &&
          col("touch_ts") >= col("purchase_ts") - expr(s"interval $lookback") &&
          col("touch_ts") < col("purchase_ts"),
        "leftOuter")
      drainFilesSummarized(spark, joined)(
        _.filter(col("p_user") =!= SentinelUser)
          .groupBy(coalesce(col("touch_type"), lit("(none)")).as("touch_type"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("purchase_id")).as("n_purchases"),
            countDistinct(col("touch_id")).as("n_touches"))
          .orderBy(col("touch_type")))
    } finally removeRecursively(stage)
  }

  case class QuietState(last_ts: Timestamp, n_events: Long)
  case class QuietVerdict(
      user_id: Long, last_seen_ts: Timestamp, n_events: Long,
      quiet_since: Timestamp)

  /** Timeout-DRIVEN emission through the engine — the one
    * GroupStateTimeout mode the rest of the stateful suite doesn't
    * exercise (apply/dedup/scd2 run NoTimeout; sessions use the
    * native session_window): per user, keep only (last event time,
    * count) in state and arm an EVENT-TIME TIMEOUT at last_ts +
    * quiet. The verdict row is emitted by the ENGINE when the
    * watermark passes the armed timestamp — i.e. when no event can
    * any longer precede the quiet horizon — not by any arriving
    * data, and the state is removed on emission. This is the
    * abandoned-session / gone-quiet alert shape: the absence of
    * data is the signal, and timeouts are the only streaming
    * construct that can observe absence.
    *
    * Scale shape: one state row per live user (two fields), removed
    * at timeout — state is bounded by users active within the quiet
    * horizon, never stream history. The finite-replay check arms
    * every timeout in batch 1 and the sentinel's watermark advance
    * fires them all; the sentinel's own state never times out (the
    * watermark cannot pass its armed horizon) and its reserved key
    * is filtered from the summary. Batch equality: per-user
    * max(ts)/count over the same feed.
    */
  def quietUsersStream(
      spark: SparkSession,
      dir: String,
      quietMinutes: Int = 30,
      delay: String = "1 hour"): DataFrame =
    // floor 8, size-derived: one small state row per user, 3 barriers
    // (data, sentinel, timeout flush) — same trade as the session
    // roundtrip (r14 width sweep)
    withStateParts(spark, statePartsFor(dir, 8)) {
    import spark.implicits._
    val quietMicros = quietMinutes * 60L * 1000000L
    val stage = stageWithSentinel(spark, dir, marginSeconds = 3 * 3600L)
    try {
      val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
      val raw = graft.Tables.withEventTime(
        spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stage.toString))
        .filter(col("ts").isNotNull)
        .withWatermark("ts", delay)
      val verdicts = raw.select(col("user_id"), col("ts"))
        .as[(Long, Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          quietUpdate(quietMicros))
      drainFilesSummarized(spark, verdicts)(
        _.filter(col("user_id") =!= SentinelUser)
          .orderBy(col("user_id")))
    } finally removeRecursively(stage)
  }

  private def quietUpdate(quietMicros: Long)(
      user: Long,
      events: Iterator[(Long, Timestamp)],
      state: GroupState[QuietState]): Iterator[QuietVerdict] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      val quietSince = new Timestamp(0L)
      quietSince.setTime((micros(s.last_ts) + quietMicros) / 1000L)
      quietSince.setNanos((((micros(s.last_ts) + quietMicros) % 1000000L)
        * 1000L).toInt)
      Iterator.single(
        QuietVerdict(user, s.last_ts, s.n_events, quietSince))
    } else {
      var cur = state.getOption.getOrElse(QuietState(null, 0L))
      events.foreach { case (_, ts) =>
        val later = cur.last_ts == null || micros(ts) > micros(cur.last_ts)
        cur = QuietState(if (later) ts else cur.last_ts, cur.n_events + 1)
      }
      state.update(cur)
      // arm (or re-arm) the quiet horizon after this batch's events
      state.setTimeoutTimestamp((micros(cur.last_ts) + quietMicros) / 1000L)
      Iterator.empty
    }
  }

  /** Reserved key for the watermark-advancing sentinel row. */
  val SentinelUser = -1L

  /** Stage `dir/events.parquet` plus a one-row sentinel file stamped
    * `marginSeconds` past the feed head into a temp directory the
    * file-stream source replays as two ordered micro-batches (mod
    * times pin the order; `maxFilesPerTrigger = 1` keeps them
    * separate). The sentinel row is built in the RAW on-disk schema —
    * whatever representation this Spark reads the source's
    * TIMESTAMP(NANOS) column as — so both files stream through one
    * schema.
    */
  private def stageWithSentinel(
      spark: SparkSession,
      dir: String,
      marginSeconds: Long,
      sentinelTypes: Seq[String] = Seq("sentinel")): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val src = Paths.get(s"$dir/events.parquet")
    val stage = Files.createTempDirectory("graft_session_stage")
    val feedFile = stage.resolve("batch0.parquet")
    Files.copy(src, feedFile)

    val head = graft.Tables.load(spark, dir, "events")
      .agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelInstant = head.toInstant.plusSeconds(marginSeconds)
    val rawSchema = spark.read.parquet(src.toString).schema
    val tsValue: Any = rawSchema("ts").dataType match {
      case LongType => // nanosAsLong read path (Spark ≤ 4.0)
        sentinelInstant.getEpochSecond * 1000000000L + sentinelInstant.getNano
      case TimestampNTZType =>
        java.time.LocalDateTime.ofInstant(sentinelInstant,
          java.time.ZoneOffset.UTC)
      case _ => java.sql.Timestamp.from(sentinelInstant)
    }
    // one sentinel row per requested type: a query that splits the
    // feed INTO MULTIPLE STREAMS by event_type (the outer interval
    // join) needs each split's watermark advanced — the global
    // watermark is the MIN across the query's watermark nodes, so a
    // split the lone sentinel doesn't reach would pin it at the
    // feed head and hold back every null-side emission
    val rows = sentinelTypes.zipWithIndex.map { case (tpe, i) =>
      Row.fromSeq(rawSchema.fields.map(_.name).toSeq.map {
        case "event_id" => Long.MaxValue - i
        case "ts" => tsValue
        case "user_id" => SentinelUser
        case "event_type" => tpe
        case "value" => 0.0
        case "props" => null
        case _ => null
      })
    }
    val tmpOut = stage.resolve("_sentinel_out")
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), rawSchema)
      .coalesce(1).write.parquet(tmpOut.toString)
    val part = Option(tmpOut.toFile.listFiles()).get
      .find(_.getName.endsWith(".parquet")).get.toPath
    val sentinelFile = stage.resolve("batch1.parquet")
    Files.move(part, sentinelFile)
    removeRecursively(tmpOut)
    // mod times decide replay order in the file-stream source
    Files.setLastModifiedTime(feedFile,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis - 60000))
    Files.setLastModifiedTime(sentinelFile,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis))
    stage
  }

  private def removeRecursively(p: java.nio.file.Path): Unit = {
    // File.listFiles, not Files.list: the stream variant holds an
    // open directory handle until GC (one per directory per call)
    val f = p.toFile
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(c => removeRecursively(c.toPath)))
    java.nio.file.Files.deleteIfExists(p); ()
  }

  /** Kinesis-like sink: JSON files partitioned by the schema.table
    * partition key (the exact partition_include_schema_table layout,
    * stack.py:196-211). Consumers tail one partition directory per
    * "shard".
    */
  def kinesisLikeSink(
      wrapped: DataFrame,
      path: String,
      checkpoint: String): DataStreamWriter[Row] =
    wrapped
      .select(col("partition_key"), col("message"))
      .writeStream
      .format("json")
      .partitionBy("partition_key")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
}
