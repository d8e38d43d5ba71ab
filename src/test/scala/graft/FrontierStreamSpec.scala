package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcPipeline

/** The incremental frontier must advance across micro-batch
  * boundaries exactly as the batch audit computes it after the fact:
  * a gap arriving in batch 1 freezes the frontier for everything
  * batch 2 delivers, and each Update emission is a valid checkpoint
  * for its instant (monotone n_records, frontier never regresses).
  */
class FrontierStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("frontier freezes at a gap across micro-batches; updates are monotone") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val q = CdcPipeline.frontierStream(mem.toDS())
      .writeStream.format("memory").queryName("frontmem")
      .outputMode("update").start()
    try {
      // shard 5: seq 1 acked, seq 2 UNACKED (event_id 37), seq 3 acked
      mem.addData(Seq((5L, ts(0), 1L), (5L, ts(1), 37L), (5L, ts(2), 3L)))
      q.processAllAvailable()
      // batch 2: two more acked records — frontier must stay frozen
      mem.addData(Seq((5L, ts(3), 4L), (5L, ts(4), 5L)))
      q.processAllAvailable()

      val updates = spark.table("frontmem").as[CdcPipeline.FrontierState]
        .collect().sortBy(_.n_records)
      assert(updates.length === 2)
      val Array(u1, u2) = updates
      assert((u1.n_records, u1.n_acked, u1.frontier_seq) === ((3L, 2L, 1L)))
      assert(u1.first_gap_seq === Some(2L))
      assert(u1.frontier_event_id === Some(1L))
      assert((u2.n_records, u2.n_acked, u2.frontier_seq) === ((5L, 4L, 1L)))
      assert(u2.frontier_seq >= u1.frontier_seq) // never regresses
    } finally q.stop()
  }

  test("a gapless shard checkpoints its head each batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val q = CdcPipeline.frontierStream(mem.toDS())
      .writeStream.format("memory").queryName("frontmem2")
      .outputMode("update").start()
    try {
      mem.addData(Seq((7L, ts(0), 1L), (7L, ts(1), 2L)))
      q.processAllAvailable()
      mem.addData(Seq((7L, ts(2), 3L)))
      q.processAllAvailable()
      val last = spark.table("frontmem2").as[CdcPipeline.FrontierState]
        .collect().maxBy(_.n_records)
      assert((last.n_records, last.frontier_seq) === ((3L, 3L)))
      assert(last.first_gap_seq === None)
      assert(last.frontier_event_id === Some(3L))
    } finally q.stop()
  }
}
