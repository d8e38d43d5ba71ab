package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Full-load replication task (reference: run.py:208-252 — per
  * selected table, emit drop-table + create-table control events then
  * one `load` data event per row; selection via table-mapping rules).
  *
  * The task plan (which tables) is driver-side over a tiny catalog —
  * exactly how DMS enumerates information_schema. The per-table row
  * work stays fully distributed: `events` streams table rows through
  * Envelope.wrap without collecting anything.
  */
object FullLoad {

  /** Catalog of replicable tables for a scale dir. */
  def catalog: Seq[(String, String)] =
    Tables.all.map(t => (ChangeFeed.SchemaName, t))

  /** Full-load events for one table: 2 control + N load messages. */
  def events(spark: SparkSession, dir: String, table: String): DataFrame = {
    val df = Tables.load(spark, dir, table)
    val controls = Seq("drop-table", "create-table").map { op =>
      spark.range(1).select(
        lit(op).as("op"),
        lit(ChangeFeed.SchemaName).as("schema_name"),
        lit(table).as("table_name"))
    }.reduce(_ union _)
    val loads = df.select(
      lit("load").as("op"),
      lit(ChangeFeed.SchemaName).as("schema_name"),
      lit(table).as("table_name"))
    controls.union(loads)
  }

  /** Task summary: per selected table, record counts by operation —
    * the shape run.py's wait_for_kinesis asserts on (2 controls +
    * row-count loads per table).
    */
  def summary(
      spark: SparkSession,
      dir: String,
      mapping: TableMapping.Mapping): DataFrame = {
    val selected = mapping.selectTables(catalog)
    val perTable = selected.map { case (_, t) =>
      events(spark, dir, t)
        .groupBy(col("table_name"), col("op"))
        .agg(count(lit(1)).as("n_records"))
    }
    perTable.reduce(_ union _)
      .orderBy(col("table_name"), col("op"))
  }
}
