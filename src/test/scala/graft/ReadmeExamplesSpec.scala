package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcPipeline
import graft.streaming.CdcPipeline.RawEvent

/** Compiles and RUNS the README "Using it" examples, so the library's
  * public front door can never drift from the code. Each test body
  * mirrors a README snippet shape-for-shape (same entry points, same
  * argument spelling); if an API in the README changes, this spec
  * breaks before a user does.
  */
class ReadmeExamplesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("README: session recipe composes extensions + reader flags") {
    // the README's builder fold — getOrCreate() returns the shared
    // test session, proving the recipe is compatible with an
    // already-configured environment
    assert(spark != null) // force the shared session up first
    val builder = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val s = graft.Tables.sessionConf
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }

  test("README batch example: materialize current state from a change stream") {
    import spark.implicits._
    val changes = graft.cdc.ChangeFeed.fromEvents(
      spark, SparkTestSession.sf)
    val state = graft.cdc.ChangeFeed.applyChanges(changes,
      keyCols = Seq("user_id"), orderCols = Seq($"ts", $"event_id"))
    val rows = state.select("user_id", "op").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length == rows.length,
      "latest-wins must leave one row per key")
    assert(rows.forall(_.getAs[String]("op") != "delete"),
      "tombstoned keys must not surface in materialized state")
  }

  test("README as-of example: enrich events with the dimension version in effect") {
    import spark.implicits._
    val events = Seq((10L, 5L), (10L, 25L), (11L, 7L))
      .toDF("user_id", "ts")
    val dimVersions = Seq((10L, 0L, "bronze"), (10L, 20L, "gold"),
      (11L, 0L, "bronze"))
      .toDF("r_user_id", "r_ts", "tier")
    val enriched = graft.plans.AsOf.join(events, dimVersions,
      Seq(events("user_id")), Seq(dimVersions("r_user_id")),
      events("ts"), dimVersions("r_ts"))
    val got = enriched.select("user_id", "ts", "tier").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got == Map((10L, 5L) -> "bronze", (10L, 25L) -> "gold",
      (11L, 7L) -> "bronze"),
      "each event must see the latest dimension version at-or-before its ts")
  }

  test("README streaming example: envelope stream into the shard-partitioned sink") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-readme").toString
    val stream = MemoryStream[RawEvent]
    val q = graft.streaming.CdcPipeline.kinesisLikeSink(
      CdcPipeline.envelopeStream(CdcPipeline.annotate(stream.toDF())),
      s"$dir/data", s"$dir/ckpt").start()
    try {
      stream.addData(Seq(
        RawEvent(1, new java.sql.Timestamp(1700000000000L), 10,
          "signup", 1.0, "{}"),
        RawEvent(2, new java.sql.Timestamp(1700000060000L), 10,
          "click", 2.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val sunk = spark.read
      .schema("partition_key STRING, message STRING").json(s"$dir/data")
    assert(sunk.count() == 2)
    assert(sunk.select("partition_key").distinct().collect()
      .map(_.getString(0)).forall(_.startsWith("graft.users_")),
      "sink must shard by the schema.table partition key")
  }
}
