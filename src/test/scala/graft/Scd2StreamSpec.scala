package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeFeed
import graft.streaming.CdcPipeline
import graft.streaming.CdcPipeline.RawEvent

/** The streaming SCD2 builder must equal the batch history's closed
  * rows even when a key's version chain SPANS micro-batches (the
  * open version must survive in state and close correctly in a later
  * batch). */
class Scd2StreamSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("versions chain across micro-batch boundaries") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[RawEvent]
    val versions = CdcPipeline.scd2Stream(CdcPipeline.annotate(mem.toDF()))
    val q = versions.writeStream.format("memory")
      .queryName("scd2mem").outputMode("append").start()
    try {
      // user 10's chain spans the boundary; user 11 closes via delete
      mem.addData(Seq(
        RawEvent(1, ts(0), 10, "signup", 1.0, "{}"),
        RawEvent(2, ts(1), 10, "click", 2.0, "{}"),
        RawEvent(3, ts(0), 11, "signup", 3.0, "{}")))
      q.processAllAvailable()
      mem.addData(Seq(
        RawEvent(4, ts(2), 10, "purchase", 4.0, "{}"),
        RawEvent(5, ts(3), 11, "error", 0.0, "{}")))
      q.processAllAvailable()

      val got = spark.table("scd2mem")
        .select("user_id", "version", "op", "attr_value",
          "valid_from", "valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3), r.getTimestamp(4), r.getTimestamp(5))).toSet

      // batch twin over the full feed, closed rows only
      val all = Seq(
        RawEvent(1, ts(0), 10, "signup", 1.0, "{}"),
        RawEvent(2, ts(1), 10, "click", 2.0, "{}"),
        RawEvent(3, ts(0), 11, "signup", 3.0, "{}"),
        RawEvent(4, ts(2), 10, "purchase", 4.0, "{}"),
        RawEvent(5, ts(3), 11, "error", 0.0, "{}")).toDF()
      val expected = ChangeFeed.scd2History(ChangeFeed.annotate(all))
        .filter(col("valid_to").isNotNull)
        .select("user_id", "version", "op", "attr_value",
          "valid_from", "valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3), r.getTimestamp(4), r.getTimestamp(5))).toSet

      assert(got == expected)
      // the boundary-spanning close is present: user 10 v2 closed at ts(2)
      assert(got.exists(v => v._1 == 10L && v._2 == 2L && v._6 == ts(2)))
    } finally q.stop()
  }
}
