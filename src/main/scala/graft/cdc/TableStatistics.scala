package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-table replication statistics (reference: run.py:188-196
  * describe_table_statistics — per (schema, table) counts of inserts/
  * updates/deletes/ddls + full-load rows, sorted by schema, table).
  *
  * Pure sum(when) aggregation: partial (map-side) combine does all
  * the work, output cardinality = number of replicated tables — the
  * cheapest possible plan at any scale.
  */
object TableStatistics {

  def compute(changes: DataFrame): DataFrame =
    perTable(changes).orderBy(col("schema_name"), col("table_name"))

  /** The unordered per-(schema, table) statistic relation shared by
    * [[compute]] and [[taskStatistics]].
    */
  private def perTable(changes: DataFrame): DataFrame =
    changes.groupBy(col("schema_name"), col("table_name"))
      .agg(
        sum(when(col("op") === "insert", 1L).otherwise(0L)).as("inserts"),
        sum(when(col("op") === "update", 1L).otherwise(0L)).as("updates"),
        sum(when(col("op") === "delete", 1L).otherwise(0L)).as("deletes"),
        sum(when(col("op").isin("create-table", "drop-table", "alter-table"), 1L)
          .otherwise(0L)).as("ddls"),
        sum(when(col("op") === "load", 1L).otherwise(0L)).as("full_load_rows"),
        count(lit(1)).as("total"))

  /** Per-TASK table statistics (reference: run.py:202-209
    * `describe_table_statistics(task_arn)`, called for BOTH tasks at
    * run.py:262-265 and 317-321): DMS scopes the statistics API to a
    * replication task — a selection-rule set over the shared stream —
    * and reports every table the task's rules SELECT, including
    * tables with no delivered changes yet (all-zero counts; the
    * reference's `novels` table shows 0s until its first write).
    *
    * A task's row set = its rules evaluated over the source catalog
    * (driver-side, same `selectTables` path full-load planning uses);
    * counts come from ONE shared per-table aggregate of the feed —
    * the feed is scanned once no matter how many tasks watch it, and
    * each task's rows are a broadcast join of its tiny
    * (task × selected-tables) relation against the |tables|-row
    * aggregate. Selection is table-granular, so the per-table counts
    * are exact per task without re-filtering the stream.
    */
  def taskStatistics(
      changes: DataFrame,
      tasks: Seq[(String, TableMapping.Mapping)],
      catalog: Seq[(String, String)]): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    val taskTables = tasks.flatMap { case (taskId, m) =>
      m.selectTables(catalog).map { case (sch, t) => (taskId, sch, t) }
    }.toDF("task_id", "schema_name", "table_name")
    val counts = Seq("inserts", "updates", "deletes", "ddls",
      "full_load_rows", "total")
    taskTables.join(perTable(changes),
        Seq("schema_name", "table_name"), "left")
      .select(col("task_id") +: col("schema_name") +: col("table_name") +:
        counts.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy(col("task_id"), col("schema_name"), col("table_name"))
  }

  /** Limited-LOB-mode truncation audit. The reference replicates a
    * BLOB column (accounts.profile_picture, lib/query.py:11) under
    * DEFAULT task settings (stack.py:329-330 sets only Logging) — and
    * DMS's default is limited LOB mode with a fixed LobMaxSize
    * budget: any LOB longer than the budget is silently truncated at
    * the source read. This is the audit an operator runs BEFORE
    * enabling that default on a new table: per group (the
    * schema/table analog), how many rows overflow the budget, how
    * many bytes the truncation would discard, the largest LOB seen,
    * and the smallest whole-KB budget that would make truncation
    * zero (the LobMaxSize to configure instead). Sizes are UTF-8
    * octet lengths — the wire size of the value, not its char count.
    *
    * Scale shape: ONE pass, map-side-combined sums keyed by the
    * bounded group column — output |groups| rows, identical plan at
    * 100 TB. The per-row octet_length is codegen'd; nothing shuffles
    * but the |groups|-row partials.
    */
  def lobAudit(rows: DataFrame, group: Column, lob: Column,
      budgetBytes: Long): DataFrame =
    rows.select(group.as("group_key"),
        octet_length(lob).cast("long").as("nb"))
      .filter(col("nb").isNotNull)
      .groupBy(col("group_key"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("nb") > budgetBytes, 1L).otherwise(0L))
          .as("n_truncated"),
        sum(col("nb")).as("bytes_total"),
        sum(least(col("nb"), lit(budgetBytes))).as("bytes_kept"),
        sum(greatest(col("nb") - budgetBytes, lit(0L))).as("bytes_lost"),
        max(col("nb")).as("max_lob_bytes"),
        ceil(max(col("nb")).cast("double") / 1024.0).cast("long")
          .as("suggested_lob_kb"))
      .orderBy(col("group_key"))

  /** Replication-lag monitor: each table's high-water mark against
    * the newest event anywhere in the feed (the task-level CDC
    * latency view an operator watches next to [[compute]] — a table
    * whose lag grows is a table whose apply has stalled).
    *
    * Exact integer epoch-micros arithmetic end to end. Scale shape:
    * map-side-combined per-table max/count (output = |tables| rows),
    * then the global head is a singleton-partition window over that
    * POST-AGGREGATE |tables|-row relation — ONE scan of the feed
    * (a broadcast-back formulation would re-run the aggregate branch
    * for the head, scanning the feed twice).
    */
  def lagMonitor(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perTable = changes.groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
    perTable
      .withColumn("head_us",
        max(col("max_ts_us")).over(Window.partitionBy()))
      .select(col("table_name"), col("n_events"), col("max_ts_us"),
        (col("head_us") - col("max_ts_us")).as("lag_us"))
  }

  /** Hot-key monitor: the top-`k` most-changed keys per table, with
    * each key's share of its table's change volume — the skew report
    * that tells an operator which keys need salting (and DMS users
    * which rows thrash replication).
    *
    * Scale shape: a window `rank() OVER (PARTITION BY table)` would
    * funnel EVERY distinct key of a table through one partition — the
    * exact skew this operator exists to find. Instead: per-key counts
    * (one shuffle, map-side combined), then a two-level tournament —
    * top-k per (table, key-shard) via a bounded sort_array/slice
    * aggregate, then top-k of the ≤ shards·k survivors per table. No
    * per-table partition ever holds more than its shard's keys; the
    * final merge handles shards·k rows per table. Table totals ride a
    * tiny |tables|-row broadcast join.
    *
    * Ties break toward the smaller key id (the struct packs a negated
    * key so one descending sort orders by count DESC, key ASC).
    */
  def hotKeys(changes: DataFrame, k: Int, shards: Int = 64): DataFrame = {
    val perKey = changes.groupBy(col("table_name"), col("user_id"))
      .agg(count(lit(1)).as("n_changes"))
    val packed = struct(col("n_changes"), (-col("user_id")).as("neg_id"))
    val topk: Column => Column =
      c => slice(reverse(array_sort(c)), 1, k)
    val top = perKey
      .withColumn("_shard", pmod(col("user_id"), lit(shards)))
      .groupBy(col("table_name"), col("_shard"))
      .agg(topk(collect_list(packed)).as("top"))
      .groupBy(col("table_name"))
      .agg(topk(flatten(collect_list(col("top")))).as("top"))
    val totals = perKey.groupBy(col("table_name"))
      .agg(sum(col("n_changes")).as("table_total"))
    top.select(col("table_name"), posexplode(col("top")).as(Seq("pos", "t")))
      .join(broadcast(totals), "table_name")
      .select(col("table_name"), (-col("t.neg_id")).as("user_id"),
        col("t.n_changes").as("n_changes"),
        (col("pos") + 1).cast("long").as("rk"),
        (col("t.n_changes").cast("double") / col("table_total").cast("double"))
          .as("share"))
  }

  /** Change-rate drift monitor: per (table, day) operation counts
    * with the day-over-day delta — the rate-anomaly view next to
    * [[lagMonitor]] (a table whose insert rate collapses or whose
    * delete rate spikes is a replication task worth paging on;
    * the reference surfaces only cumulative table statistics, this
    * is their first derivative).
    *
    * Exact integers throughout (delta vs the PREVIOUS OBSERVED day —
    * a silent day simply isn't a row; day-gap detection is
    * `events_gap_detection`'s job). Scale shape: ONE shuffle for the
    * (table, day) aggregate (map-side combined, output bounded at
    * |tables|·|days|), then the lag window runs over that tiny
    * post-aggregate — never over the stream.
    */
  def rateDrift(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = changes
      .groupBy(col("table_name"), to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("op") === "insert", 1L).otherwise(0L)).as("inserts"),
        sum(when(col("op") === "update", 1L).otherwise(0L)).as("updates"),
        sum(when(col("op") === "delete", 1L).otherwise(0L)).as("deletes"),
        count(lit(1)).as("n_ops"))
    val w = Window.partitionBy(col("table_name")).orderBy(col("day"))
    daily
      .withColumn("prev_ops", lag(col("n_ops"), 1).over(w))
      .withColumn("delta_ops",
        when(col("prev_ops").isNotNull, col("n_ops") - col("prev_ops")))
      .orderBy(col("table_name"), col("day"))
  }

  /** Schema-drift timeline per replicated table — the DDL-propagation
    * audit DMS users run when a source table evolves under a live
    * task: per (table, payload column) the first/last time the
    * column was delivered, its presence share, and a drift verdict
    * against the table's own delivery window ('added' = appeared
    * after the table's first event, 'retired' = stopped before its
    * last, 'transient' = both, 'stable' = spans the window). The
    * column population is the semi-structured props payload's keys —
    * exactly the part of the envelope a fixed reader schema silently
    * drops when the source adds a column (the `cdc_drifted_defaults`
    * failure mode, seen from the schema side instead of the value
    * side).
    *
    * Scale shape: one map-side-combined (table, column) reduce over
    * the key explode (bounded by |tables|·|columns|, not the feed);
    * table bounds are a |tables|-row aggregate broadcast back. All
    * verdict comparisons are exact timestamps.
    */
  def schemaTimeline(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    val base = changes.filter(col("ts").isNotNull)
    val bounds = base.groupBy(col("table_name"))
      .agg(min(col("ts")).as("table_first_ts"),
        max(col("ts")).as("table_last_ts"),
        count(lit(1)).as("table_events"))
    val cols = base.filter(col("props").isNotNull)
      .select(col("table_name"), col("ts"),
        explode(map_keys(from_json(col("props"),
          MapType(StringType, StringType)))).as("column_name"))
      .groupBy(col("table_name"), col("column_name"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_seen_ts"),
        max(col("ts")).as("last_seen_ts"))
    cols.join(broadcast(bounds), "table_name")
      .select(col("table_name"), col("column_name"), col("n_events"),
        col("first_seen_ts"), col("last_seen_ts"),
        (col("n_events").cast("double") /
          col("table_events").cast("double")).as("presence_share"),
        when(col("first_seen_ts") > col("table_first_ts") &&
            col("last_seen_ts") < col("table_last_ts"), "transient")
          .when(col("first_seen_ts") > col("table_first_ts"), "added")
          .when(col("last_seen_ts") < col("table_last_ts"), "retired")
          .otherwise("stable").as("verdict"))
      .orderBy(col("table_name"), col("column_name"))
  }

  /** Out-of-order delivery audit: per table, events whose commit
    * timestamp is OLDER than the running maximum already delivered
    * for their key (delivery order = event_id, the binlog position).
    * The timestamp-monotonicity integrity check next to
    * `events_gap_detection`'s id-continuity view — out-of-order
    * deliveries are exactly the rows a naive latest-wins apply keyed
    * on arrival order would get wrong, and the measured `max_late_us`
    * is the watermark a streaming apply must tolerate.
    *
    * Exact integer micros. Scale shape: ONE shuffle on (table, key) —
    * the same exchange family as apply-changes — with a running-max
    * window (frame ends at the previous row); the per-table rollup
    * (counts + distinct affected keys, two-phase) reuses nothing
    * heavier than that keyed relation.
    */
  def orderingAudit(changes: DataFrame): DataFrame = {
    latenessRelation(changes).groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_out_of_order"),
        countDistinct(when(col("late"), col("user_id"))).as("n_affected_keys"),
        max(when(col("late"), col("prev_max_us") - col("ts_us")))
          .as("max_late_us"))
      .orderBy(col("table_name"))
  }

  /** Shared lateness relation under the audit's PERTURBED delivery
    * order. The testdata feed is perfectly ordered (event_id follows
    * ts), which would make the audit trivially all-zero — so, like
    * cdc_validation's planted drift, delivery is deterministically
    * perturbed: keys with user_id % 5 == 0 deliver in reverse (the
    * replay-from-tail failure mode). The audit must find exactly
    * those keys and measure their lateness; the oracle recomputes the
    * same perturbation. ONE shuffle on (table, key) with a running-max
    * window whose frame ends at the previous row.
    */
  private def latenessRelation(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("table_name"), col("user_id"))
      .orderBy(col("delivery_pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    changes
      .select(col("table_name"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("delivery_pos",
        when(col("user_id") % 5 === 0, -col("event_id"))
          .otherwise(col("event_id")))
      .withColumn("prev_max_us", max(col("ts_us")).over(w))
      .withColumn("late",
        col("prev_max_us").isNotNull && col("ts_us") < col("prev_max_us"))
  }

  /** Watermark sizing plan: turns [[orderingAudit]]'s lateness
    * measurements into the decision a streaming apply actually makes —
    * how much event-time slack (`withWatermark` delay) buys zero
    * dropped rows, and what each tighter candidate would cost. Per
    * table: total/late counts, the exact lateness mass (sum + max,
    * integer micros), the drop count under each candidate watermark
    * (late events whose lateness EXCEEDS the candidate — the rows a
    * stateful apply configured that tight would discard), and the
    * zero-drop recommendation (max observed lateness; 0 for a table
    * with no late rows). CdcPipeline's watermark spec (StreamingSpec)
    * closes the loop: a replay configured at the recommendation drops
    * nothing.
    *
    * Scale shape: rides [[latenessRelation]]'s single (table, key)
    * exchange; candidates are literal columns, so the ×|candidates|
    * fan-out is per-ROW arithmetic folded into the same map-side
    * combined per-table aggregate — the feed is scanned once no
    * matter how many candidates are audited.
    */
  def watermarkPlan(
      changes: DataFrame,
      candidatesUs: Seq[Long] = Seq(1000000L, 5000000L)): DataFrame = {
    val lateUs = when(col("late"), col("prev_max_us") - col("ts_us"))
    // column name from the EXACT candidate (whole seconds keep the
    // pretty w1s/w5s form the oracle names; sub-second candidates get
    // the full micros) — integer-dividing all candidates to seconds
    // made two same-second candidates collide into one ambiguous name
    def candName(c: Long): String =
      if (c % 1000000L == 0L) s"w${c / 1000000L}s" else s"w${c}us"
    require(candidatesUs.map(candName).distinct.size == candidatesUs.size,
      s"duplicate watermark candidates: $candidatesUs")
    val dropCols = candidatesUs.map(c =>
      sum(when(lateUs > c, 1L).otherwise(0L)).as(s"n_drop_${candName(c)}"))
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
      coalesce(sum(lateUs), lit(0L)).as("sum_late_us"),
      coalesce(max(lateUs), lit(0L)).as("max_late_us")) ++ dropCols
    latenessRelation(changes)
      .groupBy(col("table_name"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("recommended_watermark_us", col("max_late_us"))
      .orderBy(col("table_name"))
  }
}
