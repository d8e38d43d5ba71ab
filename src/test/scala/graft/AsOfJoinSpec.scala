package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("as-of join picks the most recent right row per key at or before ts") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(0), "a"), (1L, ts(5), "b"), (1L, ts(10), "c"),
      (2L, ts(3), "d"), (3L, ts(9), "e"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(1), 100.0), (1L, ts(5), 200.0), (1L, ts(8), 300.0),
      (2L, ts(2), 50.0))
      .toDF("r_user_id", "r_ts", "rate")
    val out = AsOf.join(left, right,
        Seq(left("user_id")), Seq(right("r_user_id")),
        left("ts"), right("r_ts"))
      .select("tag", "rate")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("a") == null)        // before any version
    assert(out("b") == 200.0)       // equal ts matches
    assert(out("c") == 300.0)       // latest ≤ ts wins
    assert(out("d") == 50.0)
    assert(out("e") == null)        // key with no versions at all
  }

  test("null timestamps: null-ts events match nothing, null-ts versions never match") {
    import spark.implicits._
    val nullTs: Option[Timestamp] = None
    val left = Seq(
      (1L, Option(ts(5)), "v"),   // normal: should match the ts(1) version
      (1L, nullTs, "n"),          // null event ts: SQL `r_ts <= NULL` is never true
      (2L, Option(ts(5)), "w"))   // its key's only version has null ts
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, Option(ts(1)), 100.0),
      (1L, nullTs, -1.0),         // null version ts must never attach (not epoch 0)
      (2L, nullTs, -2.0))
      .toDF("r_user_id", "r_ts", "rate")
    val out = AsOf.join(left, right,
        Seq(left("user_id")), Seq(right("r_user_id")),
        left("ts"), right("r_ts"))
      .select("tag", "rate")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("v") == 100.0) // the null-ts version did not shadow or block
    assert(out("n") == null)
    assert(out("w") == null)
  }

  test("as-of join matches a window-based reference on real data") {
    val ev = Tables.load(spark, sf, "events")
    val versions = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("value").as("rate"))
    val got = AsOf.join(ev, versions,
        Seq(ev("user_id")), Seq(versions("r_user_id")), ev("ts"), versions("r_ts"))
      .select(col("event_id"), col("r_ts"), col("rate"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap

    // reference: range join + keep latest per event (the plan shape
    // the custom operator exists to avoid)
    val expected = ev.join(versions,
        ev("user_id") === versions("r_user_id") && ev("ts") >= versions("r_ts"),
        "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id"))
          .orderBy(col("r_ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("rate"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got == expected)
  }
}
