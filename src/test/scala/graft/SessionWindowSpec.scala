package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary pin for the streaming session roundtrip: a gap of
  * EXACTLY 30 min still merges (session_window merges touching
  * windows), and only a strictly greater gap breaks — the semantics
  * the batch oracle mirrors with its `> gap` break rule.
  */
class SessionWindowSpec extends AnyFunSuite {
  import SparkTestSession._

  test("session gap boundary: exactly 30:00 merges, 30:01 breaks") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sessions").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      // user 1: gaps 29:59 (merge), exactly 30:00 (still merges —
      // touching windows), then 30:01 (breaks)
      (10L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0, ""),
      (11L, ts("2024-01-01 00:29:59"), 1L, "click", 0.0, ""),
      (12L, ts("2024-01-01 00:59:59"), 1L, "click", 0.0, ""),
      (13L, ts("2024-01-01 01:30:00"), 1L, "click", 0.0, ""),
      // user 2: one lone event
      (20L, ts("2024-01-01 05:00:00"), 2L, "view", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    // the stream's pathGlobFilter matches LEAF file names, so the
    // fixture must be a single file literally named events.parquet
    // (the driver testdata layout), not a parquet directory
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = streaming.CdcPipeline.sessionRoundtrip(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // user 1: 0:00..59:59 one session (30:00 gap merges);
    // 59:59 -> 1:30:00 is 30:01 -> breaks. 2 sessions, longest 3.
    assert(got(1L) == (2L, 4L, 3L))
    assert(got(2L) == (1L, 1L, 1L))
  }
}
