package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.ChangeFeed
import graft.functions.Portable

/** CSV replication target (the DMS S3-target default format: one CSV
  * object per table directory) with a read-back parity audit.
  *
  * The feed is written as table_name-partitioned CSV with headers and
  * RFC-4180 double-quote escaping — the `props` payload is JSON text
  * full of quotes/commas/braces, so the escape path is genuinely
  * exercised — then read back under an explicit schema and compared
  * per table against the direct computation: row counts and exact
  * integer checksums (key sums, micros sums, a portable hash over
  * the string payload, decimal value mass).
  *
  * Documented CSV-format caveats (real in DMS S3 targets too):
  * embedded newlines would require a multiLine (non-splittable) read
  * — the CSV target is for newline-free payloads; the JSON envelope
  * target carries arbitrary bytes. And an
  * empty string and SQL NULL collapse to the same empty field, so
  * the parity hash runs over `coalesce(props, '')` on BOTH sides —
  * the audit proves byte fidelity of present text, not the
  * null/empty distinction (the JSON envelope target keeps that
  * distinction; that's its job).
  *
  * Scale shape: the write is the sink's own partitioned scan; both
  * summaries are map-side-combined |tables|-row aggregates; the
  * parity join is |tables|×|tables| broadcast. Timestamps travel as
  * micros BIGINTs — no text timestamp parsing on the read path.
  */
object CsvTarget {

  /** The feed projected to the columns every target format carries. */
  private def feedView(spark: SparkSession, dir: String): DataFrame =
    ChangeFeed.fromEvents(spark, dir)
      .select(col("table_name"), col("op"), col("user_id"),
        col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"), col("props"))

  /** ORC variant of [[roundtrip]]: the columnar S3-target option.
    * ORC carries the schema in-file, so the read-back needs no
    * declared schema and types (including the micros longs) arrive
    * natively — the parity audit then checks the IO path and
    * type fidelity rather than text escaping.
    */
  def orcRoundtrip(spark: SparkSession, dir: String, tmpRoot: String): DataFrame = {
    val feed = feedView(spark, dir)
    val path = s"$tmpRoot/graft_orc_${System.nanoTime}"
    feed.write.partitionBy("table_name").orc(path)
    parityReport(feed, spark.read.orc(path))
  }

  def roundtrip(spark: SparkSession, dir: String, tmpRoot: String): DataFrame = {
    val feed = feedView(spark, dir)
    val path = s"$tmpRoot/graft_csv_${System.nanoTime}"
    feed.write
      .option("header", "true")
      .option("escape", "\"")
      // Spark's CSV WRITER trims leading/trailing whitespace by
      // default (ignore*WhiteSpace=true on write, false on read) —
      // a payload ending in a space would come back shortened and
      // fail the parity hash; a replication target must not edit
      // the data it replicates
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .partitionBy("table_name")
      .csv(path)
    val back = spark.read
      .option("header", "true")
      .option("escape", "\"")
      .schema("op STRING, user_id BIGINT, event_id BIGINT, " +
        "ts_us BIGINT, value DOUBLE, props STRING, table_name STRING")
      .csv(path)
    parityReport(feed, back)
  }

  private def parityReport(feed: DataFrame, back: DataFrame): DataFrame = {

    // every checksum term is reduced mod 1e9 BEFORE summing: a sum of
    // raw 60-bit hashes (or micros timestamps) overflows int64 within
    // a few hundred thousand rows, and ANSI mode makes that a runtime
    // error rather than a silent wrap. The mod keeps each sum exact
    // in int64 out to ~9e9 rows per table while staying
    // corruption-sensitive.
    def summarize(df: DataFrame, prefix: String): DataFrame =
      df.groupBy(col("table_name"))
        .agg(count(lit(1)).as(s"${prefix}_rows"),
          sum(pmod(col("user_id"), lit(1000000000L))).as(s"${prefix}_user_sum"),
          sum(pmod(col("event_id"), lit(1000000000L))).as(s"${prefix}_event_sum"),
          sum(pmod(col("ts_us"), lit(1000000000L))).as(s"${prefix}_ts_sum"),
          sum(pmod(Portable.pHash(coalesce(col("props"), lit(""))),
            lit(1000000000L))).as(s"${prefix}_props_hash"),
          sum(expr("CAST(value AS DECIMAL(18,2))")).as(s"${prefix}_value"))

    summarize(feed, "src")
      .join(summarize(back, "dst"), "table_name")
      .select(col("table_name"), col("src_rows").as("n_rows"),
        col("src_user_sum").as("user_sum"),
        col("src_props_hash").as("props_hash"),
        (col("src_rows") === col("dst_rows")).as("rows_ok"),
        (col("src_user_sum") === col("dst_user_sum") &&
          col("src_event_sum") === col("dst_event_sum") &&
          col("src_ts_sum") === col("dst_ts_sum")).as("keys_ok"),
        (col("src_props_hash") === col("dst_props_hash")).as("payload_ok"),
        (col("src_value") === col("dst_value")).as("values_ok"))
      .orderBy(col("table_name"))
  }
}
