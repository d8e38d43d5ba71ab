package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Full-load → CDC cutover: the exactly-once merge of a table
  * snapshot with the change stream that overlapped it, plus the
  * consistency audit for the seam.
  *
  * The reference runs the two task lifecycles sequentially over the
  * same tables — a full-load task (run.py:212-252) and then a CDC
  * task (run.py:255-318). The hard part of that handoff is the
  * cached-changes window: the snapshot is not a point — each row is
  * read at SOME position inside the load interval, and rows that
  * change while the scan is in flight arrive TWICE (baked into the
  * `load` image AND replayed from the binlog, which the CDC task
  * resumes from the position where the snapshot BEGAN). A naive
  * union double-applies the cached changes; a naive "CDC always
  * wins" mis-orders when the snapshot image is NEWER than a cached
  * change it already includes. DMS resolves it by position: the
  * snapshot row carries its read position, and a change beats the
  * image only if its binlog position is later.
  *
  * This operator models that exactly. The per-key read position is a
  * deterministic scatter over the load window (`snapStart +
  * portableHash(key) mod windowSeconds` — a hash-ordered table scan),
  * the snapshot is the latest pre-read-position row per key, and the
  * merge is ONE latest-per-position pass over
  * `snapshot-as-events ∪ change stream`: a snapshot row enters the
  * log at position (read_ts, +∞) so it beats every change it already
  * includes (ts ≤ read_ts) and loses to every change after its read
  * point — which is precisely exactly-once, proven per table by the
  * planted invariant `n_mismatch = 0` against the state the plain
  * batch apply computes from the full feed.
  *
  * Output per table: snapshot size, CDC volume, the double-delivered
  * (cached) events, the key cohorts at the seam (untouched /
  * cached-only / overridden-by-position / born-after-snapshot /
  * deleted), final state size, and the mismatch count vs the
  * full-feed apply (must be 0).
  *
  * Scale shape: the union is never materialized wide — one shuffle
  * on the key covers snapshot, merge winner, and all cohort counts
  * in a single aggregate (the winner is a struct-max ordered by
  * position, not a second window pass); the full-feed reference
  * state is the same single-shuffle latest-per-key as
  * [[ChangeFeed.applyChanges]]; the final join stitches two
  * |tables|-row aggregates broadcast. Null-position rows (the
  * malformed cohort `cdc_exceptions` quarantines) are excluded up
  * front — a binlog record always has a position.
  */
object Handoff {

  /** Deterministic per-key snapshot read position: the load task
    * scans keys in hash order across `[snapStart, snapStart +
    * windowSeconds)`.
    */
  def readTs(snapStart: Column, key: Column, windowSeconds: Int): Column =
    snapStart + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
      (Portable.pHash(key.cast("string")) % windowSeconds)
        .cast("decimal(18,6)"))

  /** The snapshot image over a read-position-stamped feed (must
    * carry `read_ts`, see [[readTs]]): latest live row per key as of
    * the key's read position (a deleted key has no row to scan).
    * ONE definition shared with the streaming roundtrip
    * (CdcPipeline.snapshotHandoffRoundtrip) — the seam the operator
    * family proves correct must not exist in two copies.
    */
  def snapshotImage(feedWithRead: DataFrame): DataFrame =
    ChangeFeed
      .latestPerKey(feedWithRead.filter(col("ts") <= col("read_ts")),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      .filter(col("op") =!= "delete")

  /** The cutover audit over an annotated change feed (see
    * [[ChangeFeed.fromEvents]] for the column contract).
    *
    * @param snapStart      load-task start, a timestamp literal —
    *                       also the binlog position the CDC task
    *                       resumes from
    * @param windowSeconds  load-task duration the per-key read
    *                       positions scatter across
    */
  def snapshotHandoff(
      changes: DataFrame,
      snapStart: String,
      windowSeconds: Int): DataFrame = {
    val start = lit(snapStart).cast("timestamp")
    val feed = changes.filter(col("ts").isNotNull)
      .withColumn("read_ts", readTs(start, col("user_id"), windowSeconds))

    val snapshot = snapshotImage(feed)

    // Position-stamped log entries. A snapshot row sits at
    // (read_ts, +∞): ties with a change AT the read position go to
    // the image, which already contains that change.
    val snapEvents = snapshot.select(
      col("user_id"), col("table_name"), col("value"),
      col("ts").as("src_ts"), col("event_id").as("src_event_id"),
      lit("load").as("src"), lit("load").as("op"),
      col("read_ts").as("pos_ts"), lit(Long.MaxValue).as("pos_seq"),
      lit(false).as("cached"))
    val cdcEvents = feed.filter(col("ts") > start).select(
      col("user_id"), col("table_name"), col("value"),
      col("ts").as("src_ts"), col("event_id").as("src_event_id"),
      lit("cdc").as("src"), col("op"),
      col("ts").as("pos_ts"), col("event_id").as("pos_seq"),
      (col("ts") <= col("read_ts")).as("cached"))

    // One keyed aggregate: merge winner by position (struct-max —
    // (pos_ts, pos_seq) is unique per key, so the trailing payload
    // fields never decide) + every cohort counter. Materialized: both
    // the cohort rollup and the mismatch join consume it, and without
    // the cache each branch re-runs the snapshot window + union
    // (5 feed scans total vs 3 — the |keys|-row relation is the cheap
    // thing to hold, the feed is not).
    val perKey = graft.CacheScope.materialize(
      snapEvents.unionByName(cdcEvents)
      .groupBy(col("user_id"))
      .agg(
        max(col("table_name")).as("table_name"),
        max(when(col("src") === "load", 1L).otherwise(0L)).as("has_snap"),
        sum(when(col("src") === "cdc", 1L).otherwise(0L)).as("n_cdc"),
        sum(when(col("cached"), 1L).otherwise(0L)).as("n_cached"),
        max(struct(col("pos_ts"), col("pos_seq"), col("src"), col("op"),
          col("src_event_id"), col("value"))).as("win"))
      .select(col("user_id"), col("table_name"), col("has_snap"),
        col("n_cdc"), col("n_cached"),
        col("win.src").as("win_src"), col("win.op").as("win_op"),
        col("win.src_event_id").as("win_event_id"),
        col("win.value").as("win_value")))

    // Reference state: the plain batch apply over the WHOLE feed —
    // what the merge must reproduce exactly.
    val fullState = ChangeFeed
      .applyChanges(feed.drop("read_ts"), Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("table_name").as("f_table"),
        col("event_id").as("f_event_id"), col("value").as("f_value"))

    val mismatch = perKey.filter(col("win_op") =!= "delete")
      .select(col("user_id"), col("table_name").as("m_table"),
        col("win_event_id"), col("win_value"))
      .join(fullState, Seq("user_id"), "full_outer")
      .select(
        coalesce(col("m_table"), col("f_table")).as("table_name"),
        when(col("m_table").isNull || col("f_table").isNull ||
          col("win_event_id") =!= col("f_event_id") ||
          !(col("win_value") <=> col("f_value")), 1L)
          .otherwise(0L).as("mm"))
      .groupBy(col("table_name"))
      .agg(sum(col("mm")).as("n_mismatch"))

    val audit = perKey.groupBy(col("table_name"))
      .agg(
        sum(col("has_snap")).as("n_snapshot_keys"),
        sum(col("n_cdc")).as("n_cdc_events"),
        sum(col("n_cached")).as("n_double_delivered"),
        sum(when(col("n_cdc") === 0L, 1L).otherwise(0L))
          .as("n_unchanged_keys"),
        sum(when(col("has_snap") === 1L && col("n_cdc") > 0L &&
          col("win_src") === "load", 1L).otherwise(0L))
          .as("n_cached_only_keys"),
        sum(when(col("has_snap") === 1L && col("win_src") === "cdc", 1L)
          .otherwise(0L)).as("n_overridden_keys"),
        sum(when(col("has_snap") === 0L, 1L).otherwise(0L))
          .as("n_cdc_new_keys"),
        sum(when(col("win_op") === "delete", 1L).otherwise(0L))
          .as("n_deleted_keys"),
        sum(when(col("win_op") =!= "delete", 1L).otherwise(0L))
          .as("n_final_keys"))

    audit.join(broadcast(mismatch), Seq("table_name"), "left")
      .withColumn("n_mismatch", coalesce(col("n_mismatch"), lit(0L)))
      .orderBy(col("table_name"))
  }
}
