package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

import graft.cdc.{ChangeFeed, Envelope}

/** The continuous half of the engine (reference behavior:
  * run.py:255-326 `execute_cdc` — tasks start, binlog events stream
  * to Kinesis while consumers read, tasks stop). Batch and streaming
  * share the SAME transforms (ChangeFeed.annotate, Envelope.wrap) —
  * the unified Dataset API means a query tested in batch is the
  * query run on the stream.
  *
  * Scale notes: stateful materialization shuffles once on the
  * (table, key) grouping key and keeps ONE small state row per key —
  * state size is bounded by live-key cardinality, not stream length.
  * The windowed stats use a watermark so state for closed windows is
  * dropped, and the sink partitions by the Kinesis-style partition
  * key, so downstream consumers read only their shard's files.
  */
object CdcPipeline {

  /** One raw event, as the binlog/Kinesis stand-in stream delivers it. */
  case class RawEvent(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** One annotated change (RawEvent + CDC columns). */
  case class Change(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String,
      op: String, schema_name: String, table_name: String,
      partition_key: String)

  /** Current materialized row for one key (tombstoned on delete). */
  case class KeyState(
      table_name: String, user_id: Long, event_id: Long,
      ts: Timestamp, value: Double, deleted: Boolean)

  /** Annotate a raw event stream with CDC columns — identical to the
    * batch path (ChangeFeed.annotate works on any DataFrame).
    */
  def annotate(raw: DataFrame): Dataset[Change] = {
    val spark = raw.sparkSession
    import spark.implicits._
    ChangeFeed.annotate(raw).as[Change]
  }

  /** Streaming latest-wins materialization: the streaming twin of
    * ChangeFeed.applyChanges. One state row per (table, key); events
    * compare on (ts, event_id) so late/duplicate micro-batch data
    * can't regress the state; deletes tombstone the key (kept so a
    * late earlier update cannot resurrect a deleted row).
    */
  def applyChangesStream(changes: Dataset[Change]): Dataset[KeyState] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(c => (c.table_name, c.user_id))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateKey)
  }

  private def updateKey(
      key: (String, Long),
      events: Iterator[Change],
      state: GroupState[KeyState]): Iterator[KeyState] = {
    var cur = state.getOption.orNull
    var changed = false
    events.foreach { e =>
      val newer = cur == null ||
        Ordering[(Long, Long)].gt(
          (e.ts.getTime, e.event_id), (cur.ts.getTime, cur.event_id))
      if (newer) {
        cur = KeyState(key._1, key._2, e.event_id, e.ts, e.value,
          deleted = e.op == "delete")
        changed = true
      }
    }
    if (changed) {
      state.update(cur)
      Iterator.single(cur)
    } else Iterator.empty
  }

  /** Watermarked tumbling-window op counts — the streaming twin of
    * ChangeFeed.windowedStats. The watermark bounds state: windows
    * older than (max event time - delay) are finalized and dropped.
    */
  def windowedStatsStream(changes: Dataset[Change], delay: String = "1 hour"): DataFrame =
    changes.toDF()
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("op"))
      .agg(count(lit(1)).as("n_ops"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("win.start").as("window_start"), col("op"),
        col("n_ops"), col("total_value"))

  /** Wrap a change stream into envelope messages (stateless — reuses
    * the batch Envelope transform verbatim).
    */
  def envelopeStream(changes: Dataset[Change]): DataFrame =
    Envelope.wrap(
      changes.toDF(),
      col("op"), col("schema_name"), col("table_name"), col("ts"),
      col("event_id"), // stream-side txn id: the source event id
      Seq("event_id", "user_id", "value", "props"))

  /** Streaming sessionization: Spark's native session_window merges
    * per-key events separated by less than `gap` — the streaming twin
    * of Analytics.eventsSessionize (which computes the same sessions
    * with lag + cumulative breaks in batch). The watermark closes
    * sessions once event time passes gap + delay, bounding state.
    */
  def sessionizeStream(
      changes: Dataset[Change],
      gap: String = "30 minutes",
      delay: String = "1 hour"): DataFrame =
    changes.toDF()
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"),
        min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("session_value"))

  /** foreachBatch upsert: maintain a parquet state table from the
    * change stream without any table-format dependency. Each
    * micro-batch merges into the previous state with latest-wins
    * semantics (tombstones kept, see ChangeFeed.latestPerKey) and
    * writes an immutable new version directory — readers always see
    * a complete consistent version, the classic
    * write-new-then-repoint layout.
    *
    * Scale notes: the merge is one shuffle on the key; state and
    * batch are both key-partitioned parquet, and versioned dirs give
    * atomic publication without read-modify-write races.
    */
  def foreachBatchUpsert(
      changes: Dataset[Change],
      stateDir: String,
      checkpoint: String): DataStreamWriter[Change] =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Change], batchId: Long) =>
        val spark = batch.sparkSession
        val prev = latestVersion(spark, stateDir)
          .map(v => spark.read.parquet(s"$stateDir/v=$v"))
        val all = prev match {
          case Some(p) => p.unionByName(batch.toDF())
          case None => batch.toDF()
        }
        ChangeFeed.latestPerKey(all, Seq("table_name", "user_id"),
            Seq(col("ts"), col("event_id")))
          .write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
        (): Unit
      }

  /** The materialized view: latest state version minus tombstones. */
  def materializedView(spark: SparkSession, stateDir: String): DataFrame = {
    val v = latestVersion(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no state versions under $stateDir"))
    spark.read.parquet(s"$stateDir/v=$v").filter(col("op") =!= "delete")
  }

  private def latestVersion(spark: SparkSession, stateDir: String): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted.lastOption
  }

  /** Kinesis-like sink: JSON files partitioned by the schema.table
    * partition key (the exact partition_include_schema_table layout,
    * stack.py:196-211). Consumers tail one partition directory per
    * "shard".
    */
  def kinesisLikeSink(
      wrapped: DataFrame,
      path: String,
      checkpoint: String): DataStreamWriter[Row] =
    wrapped
      .select(col("partition_key"), col("message"))
      .writeStream
      .format("json")
      .partitionBy("partition_key")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
}
