package graft.cdc

import org.apache.spark.sql.DataFrame
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
    changes.groupBy(col("schema_name"), col("table_name"))
      .agg(
        sum(when(col("op") === "insert", 1L).otherwise(0L)).as("inserts"),
        sum(when(col("op") === "update", 1L).otherwise(0L)).as("updates"),
        sum(when(col("op") === "delete", 1L).otherwise(0L)).as("deletes"),
        sum(when(col("op").isin("create-table", "drop-table", "alter-table"), 1L)
          .otherwise(0L)).as("ddls"),
        sum(when(col("op") === "load", 1L).otherwise(0L)).as("full_load_rows"),
        count(lit(1)).as("total"))
      .orderBy(col("schema_name"), col("table_name"))

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
}
