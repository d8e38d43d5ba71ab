package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Handoff

/** Pins the full-load → CDC cutover semantics (cdc/Handoff.scala) on
  * planted keys, one per seam cohort — including the position
  * tie-break the exactly-once merge hinges on: a change AT the
  * snapshot read position is already inside the image, so the image
  * must win; one microsecond later and the change must win.
  */
class HandoffSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Start = "2024-06-01 00:00:00"
  private val WindowSec = 3600

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** The deterministic read position the operator assigns `uid`. */
  private def readTs(uid: Long): Timestamp = {
    import spark.implicits._
    Seq(uid).toDF("user_id")
      .select(Handoff.readTs(lit(Start).cast("timestamp"), col("user_id"),
        WindowSec).as("r"))
      .head().getTimestamp(0)
  }

  private def feed(rows: Seq[(Long, String, Timestamp, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "op", "ts", "event_id", "value")
      .withColumn("table_name", lit("t"))
  }

  private def audit(rows: Seq[(Long, String, Timestamp, Long, Double)]): Row =
    Handoff.snapshotHandoff(feed(rows), Start, WindowSec).head()

  private def plus(t: Timestamp, micros: Long): Timestamp =
    Timestamp.from(t.toInstant.plusNanos(micros * 1000L))

  test("seam cohorts: unchanged / cached-only / overridden / new / deleted") {
    val r2 = readTs(2L); val r4 = readTs(4L)
    val rows = Seq(
      (1L, "insert", ts("2024-05-01 00:00:00"), 10L, 1.0),
      (2L, "insert", ts("2024-05-01 00:00:00"), 20L, 2.0),
      (2L, "update", plus(r2, -1L), 21L, 2.5),
      (3L, "insert", ts("2024-05-01 00:00:00"), 30L, 3.0),
      (3L, "update", ts("2024-06-02 00:00:00"), 31L, 3.5),
      (4L, "insert", plus(r4, 1L), 40L, 4.0),
      (5L, "insert", ts("2024-05-01 00:00:00"), 50L, 5.0),
      (5L, "delete", ts("2024-06-02 00:00:00"), 51L, 5.0))
    val a = audit(rows)
    def g(n: String): Long = a.getAs[Long](n)
    assert(g("n_snapshot_keys") === 4L)      // k1 k2 k3 k5
    assert(g("n_cdc_events") === 4L)         // k2 upd, k3 upd, k4 ins, k5 del
    assert(g("n_double_delivered") === 1L)   // k2's cached update
    assert(g("n_unchanged_keys") === 1L)     // k1
    assert(g("n_cached_only_keys") === 1L)   // k2: image wins over cache
    assert(g("n_overridden_keys") === 2L)    // k3 update, k5 delete
    assert(g("n_cdc_new_keys") === 1L)       // k4
    assert(g("n_deleted_keys") === 1L)       // k5
    assert(g("n_final_keys") === 4L)         // k1 k2 k3 k4
    assert(g("n_mismatch") === 0L)
  }

  test("a change exactly AT the read position loses to the image (tie-break)") {
    val r7 = readTs(7L)
    val rows = Seq(
      (7L, "insert", ts("2024-05-01 00:00:00"), 70L, 7.0),
      (7L, "update", r7, 71L, 7.5)) // cached at ts == read_ts exactly
    val a = audit(rows)
    def g(n: String): Long = a.getAs[Long](n)
    assert(g("n_double_delivered") === 1L)
    assert(g("n_cached_only_keys") === 1L,
      "the image at (read_ts, +inf) must beat a change AT read_ts")
    assert(g("n_overridden_keys") === 0L)
    assert(g("n_mismatch") === 0L)
  }

  test("one microsecond past the read position and the change wins") {
    val r7 = readTs(7L)
    val rows = Seq(
      (7L, "insert", ts("2024-05-01 00:00:00"), 70L, 7.0),
      (7L, "update", plus(r7, 1L), 71L, 7.5))
    val a = audit(rows)
    def g(n: String): Long = a.getAs[Long](n)
    assert(g("n_cached_only_keys") === 0L)
    assert(g("n_overridden_keys") === 1L)
    assert(g("n_mismatch") === 0L)
  }

  test("streaming cutover equals the batch position merge, table by table") {
    val snapStart = "2024-01-15 00:00:00"
    val stream = streaming.CdcPipeline
      .snapshotHandoffRoundtrip(spark, sf, snapStart, 86400)
      .collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_from_snapshot"),
          r.getAs[Long]("n_from_cdc")))
      .toMap
    val batch = cdc.Handoff
      .snapshotHandoff(cdc.ChangeFeed.fromEvents(spark, sf), snapStart, 86400)
      .collect()
      .map { r =>
        val snapWon = r.getAs[Long]("n_unchanged_keys") +
          r.getAs[Long]("n_cached_only_keys")
        r.getAs[String]("table_name") ->
          (r.getAs[Long]("n_final_keys"), snapWon,
            r.getAs[Long]("n_final_keys") - snapWon)
      }
      .toMap
    assert(stream === batch,
      "the standard upsert ordering must implement the position merge")
  }

  test("merge reproduces the full-feed apply on the real feed") {
    val changes = cdc.ChangeFeed.fromEvents(spark, sf)
    val a = cdc.Handoff
      .snapshotHandoff(changes, "2024-01-15 00:00:00", 86400)
      .agg(sum(col("n_mismatch")).as("mm"),
        sum(col("n_double_delivered")).as("dd"))
      .head()
    assert(a.getAs[Long]("mm") === 0L)
    assert(a.getAs[Long]("dd") > 0L, "the overlap window must be exercised")
  }
}
