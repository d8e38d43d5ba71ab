package graft.cdc

import org.apache.spark.sql.DataFrame
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
}
