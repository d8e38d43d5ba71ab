package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Retention

/** Pins the contiguous-acked-prefix semantics of
  * Retention.checkpointFrontier on one planted shard: the frontier
  * stops at the FIRST gap no matter how much acked work lies beyond
  * it, the replay arithmetic follows (redelivered = everything past
  * the frontier; beyond-frontier = the acked part of it, i.e. the
  * duplicates an idempotent apply must absorb), and a fully-acked
  * shard checkpoints its head with zero replay.
  */
class CheckpointFrontierSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-06-01 10:$m%02d:00")

  private def feed(ids: Seq[Long]) = {
    import spark.implicits._
    ids.zipWithIndex.map { case (id, i) => (id, ts(i), id) }
      .toDF("user_id", "ts", "event_id")
      .withColumn("partition_key", lit("graft.users_0"))
  }

  test("frontier stops at the first gap; replay arithmetic follows") {
    // seq:    1  2   3(unacked)  4  5  → frontier 2
    val row = Retention.checkpointFrontier(feed(Seq(1L, 2L, 37L, 4L, 5L)))
      .collect().head
    assert(row.getAs[Long]("n_records") === 5L)
    assert(row.getAs[Long]("n_acked") === 4L)
    assert(row.getAs[Long]("frontier_seq") === 2L)
    assert(row.getAs[Long]("frontier_event_id") === 2L)
    assert(row.getAs[Long]("first_gap_seq") === 3L)
    // acked beyond the frontier (seq 4, 5) replay as duplicates
    assert(row.getAs[Long]("n_beyond_frontier") === 2L)
    assert(row.getAs[Long]("n_redelivered") === 3L)
  }

  test("a fully-acked shard checkpoints its head with zero replay") {
    val row = Retention.checkpointFrontier(feed(Seq(1L, 2L, 3L)))
      .collect().head
    assert(row.getAs[Long]("frontier_seq") === 3L)
    assert(row.isNullAt(row.fieldIndex("first_gap_seq")))
    assert(row.getAs[Long]("n_beyond_frontier") === 0L)
    assert(row.getAs[Long]("n_redelivered") === 0L)
  }

  test("an unacked head pins the frontier at zero") {
    val row = Retention.checkpointFrontier(feed(Seq(37L, 2L, 3L)))
      .collect().head
    assert(row.getAs[Long]("frontier_seq") === 0L)
    assert(row.isNullAt(row.fieldIndex("frontier_event_id")))
    assert(row.getAs[Long]("first_gap_seq") === 1L)
    assert(row.getAs[Long]("n_redelivered") === 3L)
  }
}
