package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retention-horizon audit for the replay/resume family.
  *
  * The reference's Kinesis stream keeps 24 hours of records
  * (dms_sample/stack.py:356 `retention_period_hours=24`): positions
  * older than `head − 24h` have aged out past TRIM_HORIZON, so a
  * resume-from-timestamp (`cdc_replay_at`'s cutoff, run.py:156-185's
  * threshold) requested below the horizon would silently skip every
  * record that expired between the requested position and the
  * horizon. This audit makes that guardrail a query: per (table,
  * requested replay point) it reports the stream horizon, the oldest
  * position still reachable, how many records the replay would lose,
  * and a reachability verdict.
  *
  * Scale shape: the stream head is a 1-row max broadcast back over
  * the feed (the `cdc_lag_monitor` pattern); replay points are a
  * literal |points|-row relation broadcast the same way, so the feed
  * is scanned ONCE with a bounded ×|points| fan-out (the
  * `dedup_jaccard_curve` shape) into ONE (table, replay_ts) shuffle
  * of map-side-combined conditional aggregates. Output cardinality =
  * |tables|·|points|. Nothing rescans the feed per point, and at
  * 100 TB the fan-out constant stays the number of audited positions,
  * not the data.
  */
object Retention {

  /** Audit `replayPoints` (timestamp literals, e.g. "2024-01-15
    * 00:00:00") against a `retentionHours` window ending at the feed
    * head. A point is reachable iff NO record newer than the point
    * has aged out — i.e. a resume from there replays the complete
    * suffix.
    */
  def audit(
      changes: DataFrame,
      retentionHours: Int,
      replayPoints: Seq[String]): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._

    // stream-wide head: 1 row, broadcast — retention is a property of
    // the STREAM (one Kinesis stream carries all tables), not per table
    val head = changes.agg(max(col("ts")).as("head_ts"))
    val points = replayPoints.toDF("replay_point")
      .select(col("replay_point").cast("timestamp").as("replay_ts"))

    changes
      .join(broadcast(head))
      .withColumn("horizon_ts",
        col("head_ts") - make_interval(lit(0), lit(0), lit(0), lit(0),
          lit(retentionHours)))
      .join(broadcast(points))
      .groupBy(col("table_name"), col("replay_ts"))
      .agg(
        first(col("horizon_ts")).as("horizon_ts"),
        count(lit(1)).as("n_events"),
        sum(when(col("ts") < col("horizon_ts"), 1L).otherwise(0L))
          .as("n_aged_out"),
        min(when(col("ts") >= col("horizon_ts"), col("ts")))
          .as("oldest_reachable_ts"),
        // records a resume-from-replay_ts would need but that expired
        sum(when(col("ts") > col("replay_ts") &&
          col("ts") < col("horizon_ts"), 1L).otherwise(0L))
          .as("n_lost_for_replay"))
      .withColumn("reachable", col("n_lost_for_replay") === 0L)
  }

  /** Consumer resume playbook: per (shard, iterator type) where each
    * of the Kinesis iterator semantics would start and what it would
    * skip, serve, or silently lose — the unifying view over the
    * piecewise coverage (`cdc_retention_audit` = TRIM_HORIZON
    * reachability, `cdc_replay_at` = AT_TIMESTAMP, `cdc_consume_paged`
    * = paging) for the consumer loop run.py:168-199 restarts.
    *
    *  - TRIM_HORIZON: oldest retained record; serves everything the
    *    stream still holds (never "loses" — it never requested the
    *    expired prefix).
    *  - AT_TIMESTAMP(t): first retained record at-or-after `t`;
    *    records before `t` are skipped BY CHOICE, records after `t`
    *    that expired are LOST — the data-loss verdict.
    *  - AFTER_SEQUENCE(cp): strictly after the shard's last sequence
    *    at-or-before the checkpoint time — the exactly-once resume:
    *    unlike AT_TIMESTAMP it does NOT re-serve the checkpointed
    *    record itself (sequence = per-shard (ts, event_id) arrival
    *    rank, the Kinesis sequence-number stand-in).
    *
    * Scale shape: ONE feed scan — the sequence row_number and the
    * checkpoint-sequence max share one shard exchange (two chained
    * windows, same partitioning), the head/horizon is a 1-row
    * broadcast, and every per-type metric reduces in a single
    * conditional aggregate whose start positions are struct-mins on
    * the unique sequence. The 3-way unpivot runs over the |shards|-row
    * post-aggregate. Output = |shards|·|types| rows.
    */
  /** Ack-frontier audit — the checkpointing primitive under every
    * exactly-once consumer whose downstream acks arrive OUT OF
    * ORDER (async batch writes, parallel appliers): the only seq a
    * shard may checkpoint is the CONTIGUOUS-ACKED PREFIX frontier —
    * the largest n with records 1..n all acked. Acked records beyond
    * the first gap are delivered work the checkpoint cannot cover:
    * on restart they replay, and the gauge prices exactly that
    * (`n_beyond_frontier` = duplicates the idempotent apply must
    * absorb, `n_redelivered` = total replay volume from the
    * frontier). In-flight (unacked) records are planted
    * deterministically (event_id % 37 = 0), so the oracle recomputes
    * the same gaps.
    *
    * Scale shape: ONE shard exchange — the sequence row_number and
    * the running prefix-acked min are chained windows on the same
    * partitioning (the [[resumePlaybook]] pattern); everything else
    * is one conditional aggregate per shard. The frontier position
    * rides a struct-max on the unique seq. Output = |shards| rows.
    */
  def checkpointFrontier(changes: DataFrame, nShards: Int = 8): DataFrame = {
    val feed = ChangeFeed.withShard(
      changes.filter(col("ts").isNotNull), nShards)
    val seqW = Window.partitionBy(col("shard"))
      .orderBy(col("ts"), col("event_id"))
    val q = feed
      .withColumn("seq", row_number().over(seqW).cast("long"))
      .withColumn("acked", col("event_id") % 37L =!= 0L)
      .withColumn("pfx",
        min(when(col("acked"), 1L).otherwise(0L))
          .over(seqW.rowsBetween(Window.unboundedPreceding, 0)))
    val g = q.groupBy(col("shard")).agg(
      count(lit(1)).as("n_records"),
      sum(when(col("acked"), 1L).otherwise(0L)).as("n_acked"),
      sum(col("pfx")).as("frontier_seq"),
      max(when(col("pfx") === 1L, struct(col("seq"), col("ts"),
        col("event_id")))).as("frontier_rec"),
      min(when(!col("acked"), col("seq"))).as("first_gap_seq"))
    g.select(col("shard"), col("n_records"), col("n_acked"),
        col("frontier_seq"),
        col("frontier_rec.ts").as("frontier_ts"),
        col("frontier_rec.event_id").as("frontier_event_id"),
        col("first_gap_seq"),
        (col("n_acked") - col("frontier_seq")).as("n_beyond_frontier"),
        (col("n_records") - col("frontier_seq")).as("n_redelivered"))
      .orderBy(col("shard"))
  }

  def resumePlaybook(
      changes: DataFrame,
      retentionHours: Int,
      atTs: String,
      checkpointTs: String,
      nShards: Int = 8): DataFrame = {
    val feed = ChangeFeed.withShard(
      changes.filter(col("ts").isNotNull), nShards)
    val head = feed.agg(
      (max(col("ts")) - make_interval(lit(0), lit(0), lit(0), lit(0),
        lit(retentionHours))).as("horizon_ts"))
    val at = lit(atTs).cast("timestamp")
    val cp = lit(checkpointTs).cast("timestamp")
    val seqW = Window.partitionBy(col("shard"))
      .orderBy(col("ts"), col("event_id"))
    val shardW = Window.partitionBy(col("shard"))

    val q = feed
      .withColumn("seq", row_number().over(seqW).cast("long"))
      .withColumn("cp_seq",
        max(when(col("ts") <= cp, col("seq"))).over(shardW))
      .join(broadcast(head))
      .withColumn("retained", col("ts") >= col("horizon_ts"))
      .withColumn("after_cp",
        col("cp_seq").isNull || col("seq") > col("cp_seq"))

    def startOf(cond: org.apache.spark.sql.Column) =
      min(when(cond, struct(col("seq").as("s"), col("ts").as("ts"),
        col("event_id").as("event_id"))))

    val g = q.groupBy(col("shard")).agg(
      sum(when(!col("retained"), 1L).otherwise(0L)).as("n_aged_out"),
      startOf(col("retained")).as("th_start"),
      sum(when(col("retained"), 1L).otherwise(0L)).as("th_served"),
      startOf(col("retained") && col("ts") >= at).as("at_start"),
      sum(when(col("retained") && col("ts") >= at, 1L).otherwise(0L))
        .as("at_served"),
      sum(when(col("retained") && col("ts") < at, 1L).otherwise(0L))
        .as("at_skipped"),
      sum(when(!col("retained") && col("ts") > at, 1L).otherwise(0L))
        .as("at_lost"),
      startOf(col("retained") && col("after_cp")).as("as_start"),
      sum(when(col("retained") && col("after_cp"), 1L).otherwise(0L))
        .as("as_served"),
      sum(when(col("retained") && !col("after_cp"), 1L).otherwise(0L))
        .as("as_skipped"),
      sum(when(!col("retained") && col("after_cp"), 1L).otherwise(0L))
        .as("as_lost"))

    g.select(col("shard"), col("n_aged_out"), expr(
        """stack(3,
          |  'TRIM_HORIZON', th_start.ts, th_start.event_id, th_served,
          |    CAST(0 AS BIGINT), CAST(0 AS BIGINT),
          |  'AT_TIMESTAMP', at_start.ts, at_start.event_id, at_served,
          |    at_skipped, at_lost,
          |  'AFTER_SEQUENCE', as_start.ts, as_start.event_id, as_served,
          |    as_skipped, as_lost)
          |AS (iterator_type, start_ts, start_event_id, n_served,
          |  n_skipped, n_lost)""".stripMargin))
      .withColumn("verdict",
        when(col("n_lost") === 0L, "ok").otherwise("data-loss"))
      .orderBy(col("shard"), col("iterator_type"))
  }
}
