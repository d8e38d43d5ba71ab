package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc._

/** Round-11 reference-fidelity ops: task-scoped table statistics
  * (describe_table_statistics per task_arn, run.py:202-209), the
  * transaction-id partition-key variant (the kinesis target's other
  * partition-key-type), and the record-level consumer view
  * (run.py:194-199).
  */
class TaskStatisticsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("task statistics: rule-selected but never-delivered table reports zeros") {
    import spark.implicits._
    val feed = Seq(
      ("graft", "users_0", "insert"),
      ("graft", "users_0", "update"),
      ("graft", "users_1", "delete"))
      .toDF("schema_name", "table_name", "op")
    val tasks = Seq(
      "t_a" -> TableMapping.Mapping(Seq(
        TableMapping.SelectionRule("graft", "users_%"))),
      "t_b" -> TableMapping.Mapping(Seq(
        TableMapping.SelectionRule("graft", "novels"))))
    val catalog = Seq(("graft", "users_0"), ("graft", "users_1"),
      ("graft", "novels"))
    val out = TableStatistics.taskStatistics(feed, tasks, catalog).collect()
    // t_a sees both users tables; t_b sees only the silent novels
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("t_a", "users_0"), ("t_a", "users_1"), ("t_b", "novels")))
    val novels = out.find(_.getString(2) == "novels").get
    // DMS reports a selected-but-silent table with ALL-ZERO counts
    assert((3 to 8).forall(i => novels.getLong(i) == 0L))
    val u0 = out.find(_.getString(2) == "users_0").get
    assert((u0.getAs[Long]("inserts"), u0.getAs[Long]("updates"),
      u0.getAs[Long]("total")) === ((1L, 1L, 2L)))
  }

  test("task statistics: a table shared by two tasks is reported to both") {
    import spark.implicits._
    val feed = Seq(("graft", "users_1", "insert"))
      .toDF("schema_name", "table_name", "op")
    val m = TableMapping.Mapping(Seq(
      TableMapping.SelectionRule("graft", "users_1")))
    val out = TableStatistics.taskStatistics(feed,
      Seq("t1" -> m, "t2" -> m), Seq(("graft", "users_1"))).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Long]("inserts") == 1L))
  }

  test("partition-key-type rides the metadata and keys the message") {
    import spark.implicits._
    val df = Seq((1L, 7L), (2L, 7L)).toDF("id", "txn")
    def wrapped(kt: Envelope.PartitionKeyType) =
      Envelope.wrap(df, lit("insert"), lit("graft"), lit("t"),
        current_timestamp(), col("txn"), Seq("id"), keyType = kt)
    val st = wrapped(Envelope.SchemaTable).collect()
    assert(st.forall(_.getAs[String]("partition_key") == "graft.t"))
    assert(st.forall(_.getAs[String]("message")
      .contains("\"partition-key-type\":\"schema-table\"")))
    val tx = wrapped(Envelope.TransactionId).collect()
    assert(tx.forall(_.getAs[String]("partition_key") == "7"))
    assert(tx.forall(_.getAs[String]("message")
      .contains("\"partition-key-type\":\"transaction-id\"")))
  }

  test("transaction-id keying falls back to schema-table when txn is null") {
    import spark.implicits._
    val df = Seq((1L, Some(9L)), (2L, None)).toDF("id", "txn")
    val keys = Envelope.wrap(df, lit("insert"), lit("graft"), lit("t"),
        current_timestamp(), col("txn"), Seq("id"),
        keyType = Envelope.TransactionId)
      .orderBy("id").select("partition_key").as[String].collect()
    assert(keys === Array("9", "graft.t"))
  }

  test("the two key types agree on per-shard totals (same feed, both schemes)") {
    val out = SparkEntry.queries("cdc_partition_key_txn")(spark, sf).collect()
    val nSt = out.map(_.getAs[Long]("n_schema_table")).sum
    val nTx = out.map(_.getAs[Long]("n_txn")).sum
    // both schemes route EVERY message exactly once
    assert(nSt === nTx)
    val feedN = cdc.ChangeFeed.fromEvents(spark, sf).count()
    assert(nSt === feedN)
    // schema-table has exactly 4 distinct keys (the 4 tables);
    // transaction-id fans the same volume over many more keys
    assert(out.map(_.getAs[Long]("n_keys_schema_table")).sum === 4L)
    assert(out.map(_.getAs[Long]("n_keys_txn")).sum >
      out.map(_.getAs[Long]("n_keys_schema_table")).sum)
    // the txn scheme occupies at least as many shards
    assert(out.count(_.getAs[Long]("n_txn") > 0) >=
      out.count(_.getAs[Long]("n_schema_table") > 0))
  }

  test("consume records: row-level view reconciles with the summary counts") {
    val records = SparkEntry.queries("cdc_consume_records")(spark, sf)
    val summary = SparkEntry.queries("cdc_consume")(spark, sf)
    val perShard = records.groupBy("partition_key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = summary.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_messages")).toMap
    assert(perShard === expected)
    // every record's envelope timestamp respects the threshold filter
    assert(records.filter(col("event_ts") < "2024-01-15T00:00:00.000000Z")
      .count() === 0L)
  }
}
