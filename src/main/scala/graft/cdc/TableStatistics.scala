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
}
