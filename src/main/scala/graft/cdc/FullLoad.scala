package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Full-load replication task (reference: run.py:208-252 — per
  * selected table, emit drop-table + create-table control events then
  * one `load` data event per row; selection via table-mapping rules).
  *
  * The task plan (which tables) is driver-side over a tiny catalog —
  * exactly how DMS enumerates information_schema. Row counting stays
  * fully distributed.
  *
  * Scale notes: control rows are ONE local driver-built DataFrame
  * (two rows per table — zero Spark jobs, no per-table plan
  * explosion), and the load counts are one count-star aggregate per
  * table unioned into a single job whose scans run in parallel; a
  * count-star over parquet reduces to footer row-group metadata, so
  * at a 10k-table catalog this costs footer reads, not table scans.
  */
object FullLoad {

  /** Catalog of replicable tables for a scale dir. */
  def catalog: Seq[(String, String)] =
    Tables.all.map(t => (ChangeFeed.SchemaName, t))

  /** Drop/create control events for tables, as a zero-job local DF. */
  private def controlRows(spark: SparkSession, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    tables.flatMap { t =>
      Seq((t, "drop-table", 1L), (t, "create-table", 1L))
    }.toDF("table_name", "op", "n_records")
  }

  /** Full-load events for one table: 2 control + N load messages. */
  def events(spark: SparkSession, dir: String, table: String): DataFrame = {
    val controls = controlRows(spark, Seq(table))
      .select(col("op"), lit(ChangeFeed.SchemaName).as("schema_name"),
        col("table_name"))
    val loads = Tables.load(spark, dir, table).select(
      lit("load").as("op"),
      lit(ChangeFeed.SchemaName).as("schema_name"),
      lit(table).as("table_name"))
    controls.union(loads)
  }

  /** Task summary: per selected table, record counts by operation —
    * the shape run.py's wait_for_kinesis asserts on (2 controls +
    * row-count loads per table). An empty selection yields an empty
    * (table_name, op, n_records) frame rather than throwing.
    */
  def summary(
      spark: SparkSession,
      dir: String,
      mapping: TableMapping.Mapping): DataFrame = {
    val selected = mapping.selectTables(catalog).map(_._2)
    if (selected.isEmpty) return controlRows(spark, Nil)
    val controls = controlRows(spark, selected)
    // ONE aggregate over a union of zero-column tagged scans (not an
    // aggregate per table): plan analysis stays flat in catalog size,
    // and a parquet scan projecting no data columns materializes rows
    // from row-group counts — footer-speed, no column I/O. The left
    // join against the driver-side table list restores the
    // n_records=0 row an empty table would otherwise lose to the
    // groupBy (the task contract is one load row PER selected table).
    import spark.implicits._
    val counted = selected.map { t =>
      Tables.load(spark, dir, t).select(lit(t).as("table_name"))
    }.reduce(_ union _)
      .groupBy(col("table_name")).agg(count(lit(1)).as("cnt"))
    val loads = selected.toDF("table_name")
      .join(counted, Seq("table_name"), "left")
      .select(col("table_name"), lit("load").as("op"),
        coalesce(col("cnt"), lit(0L)).as("n_records"))
    controls.unionByName(loads)
      .orderBy(col("table_name"), col("op"))
  }

  /** Parallel full-load segmentation plan: split a table's key space
    * into `nSegments` contiguous ranges of near-equal ROW counts —
    * the ranges a parallel loader hands its workers so every segment
    * reads the same share regardless of key-space gaps (DMS calls
    * this parallel-load ranges; naive even KEY-range splits skew
    * badly when keys cluster). Output per segment: [lo_key, hi_key],
    * row count.
    *
    * Semantics match SQL NTILE over the key order exactly (first
    * `total % n` segments take the extra row), so the plan is
    * reproducible across engines.
    *
    * Scale shape: a global NTILE window would collapse the table to
    * ONE partition — instead ranks are two-phase (the corpus_shuffle
    * scheme): range-partition by key, per-partition row_number, plus
    * each partition's start offset from a |partitions|-row prefix-sum
    * relation joined back broadcast. The only global window runs over
    * that tiny offsets relation. The segment id is then pure
    * arithmetic on the rank, and the range bounds reduce per segment.
    */
  def segmentRanges(
      keyed: DataFrame,
      keyCol: String,
      nSegments: Int): DataFrame =
    graft.functions.Ranks
      .grouped(keyed.select(col(keyCol).as("k")), Nil, Seq("k"))
      .withColumn("seg",
        expr(graft.functions.Ranks.ntileExpr("rank", "grp_total", nSegments)))
      .groupBy(col("seg"))
      .agg(min(col("k")).as("lo_key"), max(col("k")).as("hi_key"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("seg"))
}
