package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.streaming.CdcPipeline

/** Pins the deployable streaming-session path the driver checks
  * (`events_stream_sessions` → CdcPipeline.sessionRoundtrip):
  * watermarked `sessionizeStream` in APPEND mode, flushed by the
  * staged sentinel batch — NOT the unwatermarked Complete-mode
  * aggregate it replaced. Two claims:
  *
  *  1. zero late-drops at the chosen delay on the test feed: every
  *     non-null-ts event lands in exactly one emitted session (the
  *     initial watermark is the epoch, so batch 1 can't drop
  *     anything; the sentinel only flushes);
  *  2. the emitted sessions equal the batch gaps-and-islands
  *     sessions exactly, per user.
  */
class SessionStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("append-mode session stream: zero late drops and batch equality") {
    val out = CdcPipeline.sessionRoundtrip(spark, sf).collect()

    val feed = Tables.load(spark, sf, "events").filter(col("ts").isNotNull)
    val feedCount = feed.count()
    val emitted = out.map(_.getAs[Long]("n_events")).sum
    assert(emitted === feedCount,
      s"late-drop: $emitted events emitted in sessions vs $feedCount in feed")

    val batch = Analytics.sessionize(feed)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Long]("max_session_events")))
      .toMap
    val stream = out.map(r => r.getAs[Long]("user_id") ->
      (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
        r.getAs[Long]("max_session_events"))).toMap
    assert(stream === batch)

    // the sentinel key must never leak into the result
    assert(!stream.contains(CdcPipeline.SentinelUser))
  }
}
