package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeFeed, FullLoad}

/** SCD2 history invariants + full-load segmentation NTILE parity. */
class Scd2RangesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2History: versions chain, one current per live key, delete closes") {
    import spark.implicits._
    val feed = Seq(
      // key 1: insert -> update -> update (live)
      (1L, ts("2024-01-01 00:00:00"), 10L, "insert", "users_1", 1.0),
      (1L, ts("2024-01-02 00:00:00"), 11L, "update", "users_1", 2.0),
      (1L, ts("2024-01-03 00:00:00"), 12L, "update", "users_1", 3.0),
      // key 2: insert -> delete (closed)
      (2L, ts("2024-01-01 00:00:00"), 20L, "insert", "users_2", 5.0),
      (2L, ts("2024-01-04 00:00:00"), 21L, "delete", "users_2", 0.0))
      .toDF("user_id", "ts", "event_id", "op", "table_name", "value")
    val h = ChangeFeed.scd2History(feed).collect()

    // versions are 1..n per key in ts order
    val k1 = h.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(k1.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    // each version's valid_to equals the next version's valid_from
    k1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(6) == b.getTimestamp(5))
    }
    // exactly one current version for the live key, and it is the last
    assert(k1.count(_.getBoolean(7)) == 1)
    assert(k1.last.getBoolean(7) && k1.last.getDouble(4) == 3.0)
    // the deleted key has NO current version: the delete's own row is
    // open-ended but flagged non-current
    val k2 = h.filter(_.getLong(0) == 2L)
    assert(k2.count(_.getBoolean(7)) == 0)
    assert(k2.count(_.getTimestamp(6) == null) == 1)
  }

  test("scd2History: point-in-time lookup via the validity interval") {
    import spark.implicits._
    val feed = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "insert", "users_1", 1.0),
      (1L, ts("2024-01-05 00:00:00"), 11L, "update", "users_1", 7.0))
      .toDF("user_id", "ts", "event_id", "op", "table_name", "value")
    val h = ChangeFeed.scd2History(feed)
    // AS OF Jan-03: version 1 (value 1.0) is the one whose interval covers it
    val at = h.filter(col("valid_from") <= lit("2024-01-03") &&
      (col("valid_to").isNull || col("valid_to") > lit("2024-01-03")))
    val rows = at.collect()
    assert(rows.length == 1 && rows(0).getDouble(4) == 1.0)
  }

  test("funnelWindowed: a stage past the 72h deadline does not convert") {
    import spark.implicits._
    val ev = Seq(
      // user 1 converts: click +1h, purchase +2h
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // user 2: click lands 73h after signup -> outside the window;
      // the later purchase must NOT count either (no stage-2 anchor)
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-04 01:00:00"), "click"),
      (2L, ts("2024-01-04 02:00:00"), "purchase"),
      // user 3: click inside, purchase 73h after the click -> out
      (3L, ts("2024-01-01 00:00:00"), "signup"),
      (3L, ts("2024-01-01 12:00:00"), "click"),
      (3L, ts("2024-01-04 13:00:01"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = graft.operators.Analytics.funnelWindowed(ev).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 2L)  // users 1 and 3 click within 72h
    assert(r.getLong(3) == 1L)  // only user 1 purchases within 72h
    assert(r.getLong(4) == 7200000000L) // 2h signup->purchase
  }

  test("latencySlo: percentiles ordered, straggler cohort drives the misses") {
    import spark.implicits._
    // 26 events on one table: users 13 and 26 are the %13 straggler
    // cohort (two events, +5 min), everyone else jitters 0-30 s
    val feed = (1L to 26L).map { i =>
      (i, ts(s"2024-01-01 00:00:${(i % 60).toString.reverse.padTo(2, '0').reverse}"),
        i, "update", "users_0", 0.0)
    }.toDF("user_id", "ts", "event_id", "op", "table_name", "value")
    val r = ChangeFeed.latencySlo(feed).collect()
    assert(r.length == 1)
    val row = r(0)
    val (p50, p95, p99, mx) =
      (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(p50 <= p95 && p95 <= p99 && p99 <= mx)
    // exactly the 2 straggler events exceed the 60 s SLO
    assert(row.getLong(6) == 2L)
    assert(mx >= 300000000L)
    assert(row.getDouble(7) == 24.0 / 26.0)
  }

  test("segmentRanges: NTILE-parity sizes, contiguous non-overlapping ranges") {
    import spark.implicits._
    // skewed key space with gaps: 10 keys, 4 segments -> sizes 3,3,2,2
    val keys = Seq(1L, 2L, 3L, 100L, 101L, 102L, 5000L, 5001L, 9000L, 9999L)
    val df = spark.sparkContext.parallelize(keys, 4).toDF("k")
    val segs = FullLoad.segmentRanges(df, "k", 4)
      .orderBy("seg").collect()
    assert(segs.map(_.getLong(3)).toSeq == Seq(3L, 3L, 2L, 2L))
    // ranges cover the sorted key order contiguously: hi of seg i < lo of seg i+1
    segs.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) < b.getLong(1))
    }
    assert(segs.head.getLong(1) == 1L && segs.last.getLong(2) == 9999L)
  }

  test("segmentRanges: fewer rows than segments yields one singleton per row") {
    import spark.implicits._
    val df = Seq(7L, 3L, 5L).toDF("k")
    val segs = FullLoad.segmentRanges(df, "k", 8).orderBy("seg").collect()
    assert(segs.length == 3)
    assert(segs.forall(_.getLong(3) == 1L))
    assert(segs.map(_.getLong(1)).toSeq == Seq(3L, 5L, 7L))
  }
}
