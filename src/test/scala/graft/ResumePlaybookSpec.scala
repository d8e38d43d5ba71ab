package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Retention

/** Pins the iterator-type boundary semantics of
  * Retention.resumePlaybook on one planted shard:
  * AFTER_SEQUENCE must NOT re-serve the checkpointed record itself
  * (exactly-once resume), AT_TIMESTAMP at the same instant MUST
  * (at-or-after), and a point below the horizon turns into a
  * data-loss verdict with the exact lost count.
  */
class ResumePlaybookSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // one partition key → one shard; retention window chosen so t0 is
  // expired and t1..t3 are retained (head = t3)
  private def feed() = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-06-01 00:00:00"), 10L), // t0: aged out
      (2L, ts("2024-06-02 12:00:00"), 20L), // t1
      (3L, ts("2024-06-02 18:00:00"), 30L), // t2: the checkpoint
      (4L, ts("2024-06-03 06:00:00"), 40L)  // t3: head
    ).toDF("user_id", "ts", "event_id")
      .withColumn("partition_key", lit("graft.users_0"))
  }

  private def rows(atTs: String, cpTs: String) =
    Retention.resumePlaybook(feed(), retentionHours = 24,
        atTs = atTs, checkpointTs = cpTs)
      .collect()
      .map(r => r.getAs[String]("iterator_type") -> r)
      .toMap

  test("AFTER_SEQUENCE skips the checkpointed record; AT_TIMESTAMP re-serves it") {
    val m = rows(atTs = "2024-06-02 18:00:00", cpTs = "2024-06-02 18:00:00")
    val as = m("AFTER_SEQUENCE"); val at = m("AT_TIMESTAMP")
    assert(as.getAs[Long]("n_served") === 1L)       // t3 only
    assert(as.getAs[Long]("start_event_id") === 40L)
    assert(as.getAs[Long]("n_skipped") === 2L)      // t1, t2
    assert(at.getAs[Long]("n_served") === 2L)       // t2 AND t3
    assert(at.getAs[Long]("start_event_id") === 30L)
    assert(at.getAs[Long]("n_skipped") === 1L)      // t1
    assert(as.getAs[String]("verdict") === "ok")
    assert(at.getAs[String]("verdict") === "ok")
  }

  test("TRIM_HORIZON starts at the oldest retained record and counts the expired prefix") {
    val m = rows(atTs = "2024-06-02 18:00:00", cpTs = "2024-06-02 18:00:00")
    val th = m("TRIM_HORIZON")
    assert(th.getAs[Long]("start_event_id") === 20L) // t1
    assert(th.getAs[Long]("n_served") === 3L)
    assert(th.getAs[Long]("n_aged_out") === 1L)      // t0
    assert(th.getAs[String]("verdict") === "ok")
  }

  test("a replay point below the horizon is a data-loss verdict with the exact lost count") {
    // request from t0's position: t0 itself expired AFTER the point →
    // lost; everything retained is served
    val m = rows(atTs = "2024-05-31 00:00:00", cpTs = "2024-05-31 00:00:00")
    val at = m("AT_TIMESTAMP")
    assert(at.getAs[Long]("n_lost") === 1L)          // t0
    assert(at.getAs[String]("verdict") === "data-loss")
    assert(at.getAs[Long]("n_served") === 3L)
    // AFTER_SEQUENCE with no record at-or-before the checkpoint
    // resumes from the beginning of the retained stream — and is
    // equally lossy about the expired suffix after its position
    val as = m("AFTER_SEQUENCE")
    assert(as.getAs[Long]("n_served") === 3L)
    assert(as.getAs[Long]("n_lost") === 1L)
    assert(as.getAs[String]("verdict") === "data-loss")
  }
}
