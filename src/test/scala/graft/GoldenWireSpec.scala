package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeFeed, Envelope}

/** Foreign-wire golden messages: VERBATIM DMS-format Kinesis JSON —
  * composed from the PUBLIC AWS DMS documentation of the Kinesis
  * target's message format (dash-keyed metadata, string microsecond
  * timestamps, record-type data/control, before-image block,
  * include_null_and_empty explicit nulls, transaction-details extra
  * fields) — fed through `Envelope.parse` → latest-per-key apply.
  *
  * Every other consume test in the suite reads the ENGINE'S OWN
  * `Envelope.wrap` output; this spec is the third-party-producer
  * seam: a real DMS task writing the stream must parse and apply
  * identically, including shapes the engine never produces itself
  * (extra metadata fields, different key order, absent blocks).
  */
class GoldenWireSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("balance", DoubleType)))

  // -- golden literals ----------------------------------------------
  // Field ORDER inside objects differs from Envelope.wrap's output on
  // purpose (JSON objects are unordered; a consumer keyed to the
  // engine's own serialization order would be wrong).

  /** Full-load row: no transaction, operation "load". */
  private val gLoad =
    """{"metadata":{"operation":"load","record-type":"data",
      |"partition-key-type":"schema-table","schema-name":"graft",
      |"table-name":"customers","timestamp":"2026-08-15T10:00:00.000000Z",
      |"transaction-id":null},
      |"data":{"id":1,"name":"alice","balance":10.5}}""".stripMargin
      .replace("\n", "")

  /** CDC insert carrying transaction-details extras the engine never
    * emits (stream-position, prev-transaction-id ...): from_json must
    * ignore unknown metadata fields, not fail or null the row.
    */
  private val gInsert =
    """{"data":{"id":2,"name":"bob","balance":20.0},
      |"metadata":{"timestamp":"2026-08-15T10:00:01.000000Z",
      |"record-type":"data","operation":"insert",
      |"partition-key-type":"schema-table","schema-name":"graft",
      |"table-name":"customers","transaction-id":7001,
      |"stream-position":"00000000000000000001",
      |"prev-transaction-id":7000,
      |"prev-transaction-record-id":3}}""".stripMargin.replace("\n", "")

  /** CDC update with a before-image AND an include_null_and_empty
    * explicit-null column ("name": null = SET TO NULL, distinct from
    * absent).
    */
  private val gUpdate =
    """{"data":{"id":1,"name":null,"balance":11.0},
      |"before-image":{"id":1,"name":"alice","balance":10.5},
      |"metadata":{"timestamp":"2026-08-15T10:00:02.000000Z",
      |"record-type":"data","operation":"update",
      |"partition-key-type":"schema-table","schema-name":"graft",
      |"table-name":"customers","transaction-id":7002}}""".stripMargin
      .replace("\n", "")

  /** CDC update with an EMPTY-string column — include_null_and_empty
    * keeps "" and null distinguishable on the wire.
    */
  private val gUpdateEmpty =
    """{"data":{"id":2,"name":"","balance":21.0},
      |"before-image":{"id":2,"name":"bob","balance":20.0},
      |"metadata":{"timestamp":"2026-08-15T10:00:03.000000Z",
      |"record-type":"data","operation":"update",
      |"partition-key-type":"schema-table","schema-name":"graft",
      |"table-name":"customers","transaction-id":7003}}""".stripMargin
      .replace("\n", "")

  /** CDC delete: data carries the key (DMS sends the deleted row's
    * image under data).
    */
  private val gDelete =
    """{"data":{"id":3,"name":"carol","balance":30.0},
      |"metadata":{"timestamp":"2026-08-15T10:00:04.000000Z",
      |"record-type":"data","operation":"delete",
      |"partition-key-type":"schema-table","schema-name":"graft",
      |"table-name":"customers","transaction-id":7004}}""".stripMargin
      .replace("\n", "")

  /** Control record (DDL): NO data block at all, null transaction. */
  private val gControl =
    """{"metadata":{"timestamp":"2026-08-15T10:00:05.000000Z",
      |"record-type":"control","operation":"create-table",
      |"partition-key-type":"schema-table","schema-name":"graft",
      |"table-name":"customers"}}""".stripMargin.replace("\n", "")

  private val loadRow =
    (1L, "carol-seed") // unused marker to keep implicits import alive

  private def parsedGolden = {
    val msgs = Seq(gLoad, gInsert, gUpdate, gUpdateEmpty, gDelete, gControl)
      .toDF("message")
    Envelope.parse(msgs, "message", rowSchema)
  }

  test("golden DMS messages parse field-exact") {
    val rows = parsedGolden
      .select(
        col("metadata.`record-type`").as("rt"),
        col("metadata.operation").as("op"),
        col("metadata.`schema-name`").as("sn"),
        col("metadata.`table-name`").as("tn"),
        col("metadata.`transaction-id`").as("txn"),
        col("metadata.timestamp").as("ts"),
        col("data.id").as("id"),
        col("data.name").as("name"),
        col("data.balance").as("balance"),
        col("before_image.name").as("bi_name"))
      .collect()
    assert(rows.length == 6)
    val byOp = rows.map(r => r.getAs[String]("op") -> r).toMap

    val l = byOp("load")
    assert(l.getAs[String]("rt") == "data")
    assert(l.getAs[Any]("txn") == null)
    assert(l.getAs[Long]("id") == 1L && l.getAs[String]("name") == "alice")
    assert(l.getAs[Double]("balance") == 10.5)
    assert(l.getAs[String]("ts") == "2026-08-15T10:00:00.000000Z")
    assert(l.getAs[String]("bi_name") == null)

    val i = byOp("insert")
    assert(i.getAs[Long]("txn") == 7001L,
      "unknown transaction-details extras must not break known fields")
    assert(i.getAs[Long]("id") == 2L)

    val u = rows.filter(_.getAs[Any]("txn") == 7002L).head
    assert(u.getAs[String]("name") == null,
      "include_null_and_empty explicit null must land as SQL NULL")
    assert(u.getAs[Double]("balance") == 11.0)
    assert(u.getAs[String]("bi_name") == "alice",
      "before-image block must parse against the row schema")

    val ue = rows.filter(_.getAs[Long]("txn") == 7003L).head
    assert(ue.getAs[String]("name") == "",
      "empty string and null must stay distinguishable off the wire")

    val d = byOp("delete")
    assert(d.getAs[Long]("id") == 3L && d.getAs[String]("rt") == "data")

    val c = byOp("create-table")
    assert(c.getAs[String]("rt") == "control")
    assert(c.getAs[Any]("id") == null,
      "a control record has no data block — struct must be null, not error")
    assert(c.getAs[Any]("txn") == null)
  }

  test("golden messages apply to the expected end state") {
    // data records only (the consume path's control gate), keyed by
    // id, latest-wins on the wire timestamp, tombstones dropped
    val changes = parsedGolden
      .filter(col("metadata.`record-type`") === Envelope.RecordTypeData)
      .select(
        col("metadata.operation").as("op"),
        to_timestamp(col("metadata.timestamp"),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("ts"),
        col("data.id").as("id"),
        col("data.name").as("name"),
        col("data.balance").as("balance"))
    val state = ChangeFeed.applyChanges(changes, Seq("id"), Seq(col("ts")))
      .orderBy("id")
      .select("id", "name", "balance", "op")
      .collect()
    // id=1: load → update(name := NULL, balance 11.0)
    // id=2: insert → update(name := "", balance 21.0)
    // id=3: delete tombstone only → absent
    assert(state.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(state(0).getAs[String]("name") == null)
    assert(state(0).getAs[Double]("balance") == 11.0)
    assert(state(1).getAs[String]("name") == "")
    assert(state(1).getAs[Double]("balance") == 21.0)
  }

  test("third-party wire and the engine's own wrap parse identically") {
    // the same logical insert produced by Envelope.wrap: whatever the
    // producer, parse must land the identical typed row
    val src = Seq((2L, "bob", 20.0)).toDF("id", "name", "balance")
      .withColumn("ts",
        to_timestamp(lit("2026-08-15 10:00:01"), "yyyy-MM-dd HH:mm:ss"))
    val ours = Envelope.wrap(src, lit("insert"), lit("graft"),
      lit("customers"), col("ts"), lit(7001L),
      Seq("id", "name", "balance"))
    val a = Envelope.parse(ours.select("message"), "message", rowSchema)
    val b = Envelope.parse(Seq(gInsert).toDF("message"), "message", rowSchema)
    val proj: org.apache.spark.sql.DataFrame => Seq[Any] = df =>
      df.select(col("data.id"), col("data.name"), col("data.balance"),
        col("metadata.operation"), col("metadata.`schema-name`"),
        col("metadata.`table-name`"), col("metadata.`transaction-id`"),
        col("metadata.`record-type`"), col("metadata.timestamp"))
        .collect().head.toSeq
    assert(proj(a) == proj(b),
      "engine-wrapped and DMS-doc-format messages must parse to the same row")
  }
}
