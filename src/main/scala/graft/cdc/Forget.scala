package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion-list propagation (right-to-be-forgotten): scrub every
  * change of the listed keys from the feed, re-materialize state
  * from the scrubbed feed, and AUDIT that nothing survived — the
  * compliance pass a replicated pipeline must run end to end, not
  * just against the newest snapshot (an old change of a forgotten
  * key replayed later would resurrect it).
  *
  * Scale shape: the deletion list BROADCASTS (it is tiny next to the
  * feed at any scale), so the scrub is a map-side anti probe — the
  * feed is never shuffled to be scrubbed. The audit pays exactly two
  * state materializations (before and after — the after one also
  * answers the residual probe from the same pass) plus a map-side
  * feed count; counts reduce to |tables| rows.
  */
object Forget {

  /** Per-table audit of scrubbing `keys` (one column named like
    * `keyCol`) out of `changes`:
    * feed_rows/feed_scrubbed, state_keys before/after, and
    * `residual_keys` — forgotten keys still live in the state
    * rebuilt from the scrubbed feed, which must be 0.
    */
  def audit(
      changes: DataFrame,
      keyCol: String,
      keys: DataFrame,
      orderCols: Seq[Column]): DataFrame = {
    // ONE distinct + broadcast serves all three probes: the anti-join
    // scrub ignores the extra _forget column (anti output = left side
    // only), so a separate key-only relation would just pay the
    // distinct aggregation and broadcast twice.
    val kFlag = broadcast(keys.select(col(keyCol)).distinct()
      .withColumn("_forget", lit(true)))
    val scrubbed = changes.join(kFlag, Seq(keyCol), "left_anti")
    val before = ChangeFeed
      .applyChanges(changes, Seq("table_name", keyCol), orderCols)
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("state_keys_before"))
    // ONE materialization of the scrubbed state serves both the after
    // count and the residual probe (a separate residual branch would
    // re-run the whole feed shuffle + window a third time)
    val after = ChangeFeed
      .applyChanges(scrubbed, Seq("table_name", keyCol), orderCols)
      .join(kFlag, Seq(keyCol), "left")
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("state_keys_after"),
        sum(when(col("_forget"), 1L).otherwise(0L)).as("residual_keys"))
    val feedCounts = changes
      .join(kFlag, Seq(keyCol), "left")
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("feed_rows"),
        sum(when(col("_forget"), 1L).otherwise(0L)).as("feed_scrubbed"))
    feedCounts
      .join(before, Seq("table_name"), "left")
      .join(after, Seq("table_name"), "left")
      .select(col("table_name"), col("feed_rows"), col("feed_scrubbed"),
        coalesce(col("state_keys_before"), lit(0L)).as("state_keys_before"),
        coalesce(col("state_keys_after"), lit(0L)).as("state_keys_after"),
        coalesce(col("residual_keys"), lit(0L)).as("residual_keys"))
  }
}
