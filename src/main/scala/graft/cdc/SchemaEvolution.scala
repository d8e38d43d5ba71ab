package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema evolution surface (reference: lib/query.py:59-66 issues
  * ALTER column-type-change / drop-column / add-column-with-default
  * during active CDC; run.py:309-315 asserts the resulting
  * create/alter/drop control events arrive on the stream).
  *
  * Two halves:
  *  1. DDL → control events: synthesize the create/alter/drop control
  *     stream a replication task emits, ready for Envelope.wrap
  *     (record-type becomes "control" via Envelope.metadata).
  *  2. Drifted payloads: parse change messages whose data schema has
  *     evolved — added columns read as null from old messages,
  *     dropped columns are ignored, retyped columns are cast.
  */
object SchemaEvolution {

  /** Derive the control-event stream from a change feed: per table,
    * a create-table at its first event time, an alter-table at its
    * latest event (max event_id — the reference alters mid-stream),
    * and a drop-table at its last event time. One aggregate per
    * table (tiny output), then a 3-way per-row explode — no extra
    * shuffle.
    */
  def controlEvents(changes: DataFrame): DataFrame =
    changes.groupBy(col("schema_name"), col("table_name"))
      .agg(
        min(col("ts")).as("create_ts"),
        max_by(col("ts"), col("event_id")).as("alter_ts"),
        max(col("ts")).as("drop_ts"))
      .select(col("schema_name"), col("table_name"),
        explode(array(
          struct(lit("create-table").as("op"), col("create_ts").as("ts")),
          struct(lit("alter-table").as("op"), col("alter_ts").as("ts")),
          struct(lit("drop-table").as("op"), col("drop_ts").as("ts"))))
          .as("ev"))
      .select(col("schema_name"), col("table_name"),
        col("ev.op").as("op"), col("ev.ts").as("ts"))

  /** Parse envelope messages against an EVOLVED data schema: columns
    * added since a message was written surface as null, dropped
    * columns are simply absent from the schema, and retyped columns
    * take the new type (from_json applies Spark's cast rules).
    */
  def parseDrifted(df: DataFrame, messageCol: String, evolved: StructType): DataFrame =
    Envelope.parse(df, messageCol, evolved)

  /** Parse with declared column DEFAULTs (the reference's third ALTER
    * is `ADD COLUMN is_stock BOOLEAN DEFAULT TRUE`, lib/query.py:65):
    * a message written BEFORE the ALTER does not carry the column at
    * all, and the source table says its value is the declared default
    * — surfacing null there silently corrupts any consumer
    * materializing state across the ALTER boundary.
    *
    * Key-absence (not value-null) decides: graft envelopes are
    * written with include_null_and_empty semantics (explicit JSON
    * nulls, Envelope.wrap), so a message whose data object lacks the
    * key predates the column and takes the default, while a
    * post-ALTER message carrying an explicit null keeps null. The
    * presence probe enumerates the data object's TOP-LEVEL keys
    * (`json_object_keys`) — a nested struct column whose inner
    * object happens to contain an identically-named key can NOT
    * shadow the probe (a raw substring test over the object text
    * would).
    */
  def parseDrifted(
      df: DataFrame,
      messageCol: String,
      evolved: StructType,
      defaults: Map[String, Column]): DataFrame = {
    val parsed = Envelope.parse(df, messageCol, evolved)
    defaults.foldLeft(parsed) { case (acc, (name, default)) =>
      // probe the "data" OBJECT's own keys, not the whole message: a
      // drifted column sharing its name with an always-present
      // metadata/before-image key — or with a key nested inside a
      // struct column's serialized object — must still default
      val present = array_contains(
        json_object_keys(get_json_object(col(messageCol), "$.data")),
        name)
      acc.withColumn("data",
        col("data").withField(name,
          when(present, col("data").getField(name)).otherwise(default)))
    }
  }

  /** Apply the reference's three ALTERs to a Spark schema (the
    * engine-side mirror of lib/query.py:59-66).
    */
  def addColumn(s: StructType, name: String, dt: org.apache.spark.sql.types.DataType): StructType =
    StructType(s.fields :+ org.apache.spark.sql.types.StructField(name, dt))

  def dropColumn(s: StructType, name: String): StructType =
    StructType(s.fields.filterNot(_.name == name))

  def retypeColumn(s: StructType, name: String, dt: org.apache.spark.sql.types.DataType): StructType =
    StructType(s.fields.map(f => if (f.name == name) f.copy(dataType = dt) else f))

  /** Transaction grouping: events of one table committing in the
    * same minute share a transaction id (the stand-in for binlog
    * commit boundaries; reference: include_transaction_details,
    * stack.py:196-211). dense_rank per table — never a global sort.
    */
  def withTxnId(changes: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("table_name"))
      .orderBy(date_trunc("minute", col("ts")))
    changes.withColumn("txn_id", dense_rank().over(w).cast("long"))
  }

  /** Before-image masked to non-insert ops (DMS emits before images
    * only for update/delete; BeforeImageSettings stack.py:341-346).
    */
  def maskedBefore(c: Column, op: Column): Column =
    when(op =!= "insert", c)
}
