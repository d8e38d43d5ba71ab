package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketized range join equals the naive BETWEEN join") {
    import spark.implicits._
    // irregular intervals (zero-length, bucket-straddling, overlapping)
    // and points on both closed endpoints
    val iv = Seq(
      (1L, 100L, 100L),   // degenerate single-point interval
      (2L, 90L, 310L),    // spans 4 buckets at width 100
      (3L, 250L, 260L),
      (4L, 995L, 1005L))  // straddles a bucket boundary
      .toDF("iv_id", "lo", "hi")
    val pts = Seq(50L, 90L, 100L, 101L, 250L, 260L, 300L, 310L, 311L,
      995L, 1000L, 1005L, 1006L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("pt_id", "t")

    val got = RangeJoin.pointInInterval(
        pts, col("t"), iv, col("lo"), col("hi"), bucketUs = 100L)
      .select(col("pt_id"), col("iv_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = pts.crossJoin(iv)
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select(col("pt_id"), col("iv_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == naive)
    assert(naive.contains((2L, 1L)))  // t=100 hits the degenerate interval
    assert(naive.contains((11L, 4L))) // closed upper endpoint
  }

  test("no duplicate pairs even when an interval spans many buckets") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 1000L)).toDF("iv_id", "lo", "hi")
    val pts = Seq((1L, 500L)).toDF("pt_id", "t")
    val rows = RangeJoin.pointInInterval(
      pts, col("t"), iv, col("lo"), col("hi"), bucketUs = 10L).collect()
    assert(rows.length == 1)
  }

  test("inverted intervals match nothing and cannot explode the bucket fan-out") {
    import spark.implicits._
    // hi << lo: without the guard, sequence(lo/w, hi/w) would step -1
    // and explode ~1e8 bucket rows from this single corrupt interval
    val iv = Seq(
      (1L, 10000000000L, 0L), // inverted epoch-scale sentinel
      (2L, 100L, 200L))       // a normal interval alongside it
      .toDF("iv_id", "lo", "hi")
    val pts = Seq((1L, 150L), (2L, 5000000000L)).toDF("pt_id", "t")
    val rows = RangeJoin.pointInInterval(
        pts, col("t"), iv, col("lo"), col("hi"), bucketUs = 100L)
      .select(col("pt_id"), col("iv_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 2L))) // only the normal interval matches
  }

  test("events_range_join counts every event inside each VIP window") {
    val rows = SparkEntry.queries("events_range_join")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 1)
      assert(r.getAs[Long]("n_users") >= 1)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
    }
  }
}
