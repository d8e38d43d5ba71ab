package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DMS-style change-event envelope the reference streams to
  * Kinesis (reference: dms_sample/stack.py:196-211 KinesisSettings —
  * json message format, include_control_details, include_partition_value,
  * include_transaction_details, partition_include_schema_table;
  * observed message shape in run.py:181-185).
  *
  * A message is a JSON document:
  * {
  *   "data": {...row columns...},            // data records
  *   "metadata": {
  *     "timestamp": "...", "record-type": "data"|"control",
  *     "operation": "load"|"insert"|"update"|"delete"|
  *                  "create-table"|"drop-table"|"alter-table",
  *     "partition-key-type": "schema-table",
  *     "schema-name": "...", "table-name": "...",
  *     "transaction-id": N
  *   },
  *   "before-image": {...}                   // CDC update/delete only
  * }
  * Partition key = "<schema>.<table>".
  *
  * Spark realization: the envelope is a plain struct column built with
  * `to_json(struct(...))` and parsed back with `from_json` — fully
  * codegen'd, no UDFs, so wrap/parse survive inside whole-stage
  * codegen at any scale.
  */
object Envelope {

  val RecordTypeData = "data"
  val RecordTypeControl = "control"

  /** DMS kinesis-target `partition-key-type` (stack.py:196-211 sets
    * `partition_include_schema_table=True`, which selects
    * schema-table; the target's other supported value routes by
    * transaction id so one hot table fans out across shards instead
    * of pinning its schema-table key's shard). The choice decides
    * BOTH the metadata field and the partition key the message is
    * put with.
    */
  sealed trait PartitionKeyType { def wireName: String }
  case object SchemaTable extends PartitionKeyType {
    val wireName = "schema-table"
  }
  case object TransactionId extends PartitionKeyType {
    val wireName = "transaction-id"
  }

  /** The partition key a message is put with under `keyType`.
    * transaction-id keying falls back to the schema-table key when
    * the record carries no transaction (control events, full load) —
    * a message must never be put with a null key.
    */
  def partitionKey(
      keyType: PartitionKeyType,
      schemaName: Column,
      tableName: Column,
      txnId: Column): Column = keyType match {
    case SchemaTable => concat(schemaName, lit("."), tableName)
    case TransactionId =>
      coalesce(txnId.cast("string"),
        concat(schemaName, lit("."), tableName))
  }

  def metadataSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("record-type", StringType),
    StructField("operation", StringType),
    StructField("partition-key-type", StringType),
    StructField("schema-name", StringType),
    StructField("table-name", StringType),
    StructField("transaction-id", LongType)))

  /** Message schema given the replicated table's row schema. */
  def messageSchema(dataSchema: StructType): StructType = StructType(Seq(
    StructField("data", dataSchema),
    StructField("metadata", metadataSchema),
    StructField("before-image", dataSchema)))

  /** Build the metadata struct column. */
  def metadata(
      op: Column,
      schemaName: Column,
      tableName: Column,
      ts: Column,
      txnId: Column,
      keyType: PartitionKeyType = SchemaTable): Column = {
    val recordType =
      when(op.isin("insert", "update", "delete", "load"), RecordTypeData)
        .otherwise(RecordTypeControl)
    // to_utc_timestamp(ts, current session tz) + date_format renders
    // the UTC wall time whatever the session time zone is, so the
    // trailing 'Z' designator is always truthful.
    struct(
      date_format(to_utc_timestamp(ts, current_timezone()),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("timestamp"),
      recordType.as("record-type"),
      op.as("operation"),
      lit(keyType.wireName).as("partition-key-type"),
      schemaName.as("schema-name"),
      tableName.as("table-name"),
      txnId.as("transaction-id"))
  }

  /** Wrap rows of `df` into JSON envelope messages.
    *
    * @param dataCols row columns serialized under "data"
    * @param beforeCols before-image columns (lag'd values), or empty
    * @return df with `message` (JSON string) and `partition_key`
    */
  def wrap(
      df: DataFrame,
      op: Column,
      schemaName: Column,
      tableName: Column,
      ts: Column,
      txnId: Column,
      dataCols: Seq[String],
      beforeCols: Seq[Column] = Nil,
      keyType: PartitionKeyType = SchemaTable): DataFrame = {
    val data = struct(dataCols.map(col): _*)
    val msg = if (beforeCols.nonEmpty) {
      struct(data.as("data"),
        metadata(op, schemaName, tableName, ts, txnId, keyType).as("metadata"),
        struct(beforeCols: _*).as("before-image"))
    } else {
      struct(data.as("data"),
        metadata(op, schemaName, tableName, ts, txnId, keyType).as("metadata"))
    }
    // include_null_and_empty (stack.py:196-211): null columns must
    // appear in the message as explicit JSON nulls, so the consumer
    // can distinguish "set to NULL" from "not present" — Spark's
    // default to_json drops them.
    df.withColumn("message",
        to_json(msg, Map("ignoreNullFields" -> "false")))
      .withColumn("partition_key",
        partitionKey(keyType, schemaName, tableName, txnId))
  }

  /** Parse envelope messages back into typed columns. */
  def parse(df: DataFrame, messageCol: String, dataSchema: StructType): DataFrame =
    df.withColumn("_msg", from_json(col(messageCol), messageSchema(dataSchema)))
      .withColumn("data", col("_msg.data"))
      .withColumn("metadata", col("_msg.metadata"))
      .withColumn("before_image", col("_msg.`before-image`"))
      .drop("_msg")
}
