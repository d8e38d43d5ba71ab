package graft

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcPipeline

/** The incremental frontier must advance across micro-batch
  * boundaries exactly as the batch audit computes it after the fact:
  * a gap arriving in batch 1 freezes the frontier for everything
  * batch 2 delivers, and each Update emission is a valid checkpoint
  * for its instant (monotone n_records, frontier never regresses).
  *
  * Every test runs under BOTH state-store backends (HDFS default +
  * RocksDB — SURVEY §4's 1000-executor recipe); the crash test
  * additionally proves exactly-once across a kill-mid-batch restart:
  * state restores from the last committed batch, the failed batch
  * re-runs once, and the recovered frontier equals the
  * uninterrupted computation.
  */
class FrontierStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  for ((label, provider) <- stateStoreProviders) {

    test(s"[$label] frontier freezes at a gap across micro-batches; updates are monotone") {
      withStateStoreProvider(provider) {
        implicit val sq = spark.sqlContext
        import spark.implicits._
        val mem = MemoryStream[(Long, Timestamp, Long)]
        val q = CdcPipeline.frontierStream(mem.toDS())
          .writeStream.format("memory").queryName(s"frontmem_$label")
          .outputMode("update").start()
        try {
          // shard 5: seq 1 acked, seq 2 UNACKED (event_id 37), seq 3 acked
          mem.addData(Seq((5L, ts(0), 1L), (5L, ts(1), 37L), (5L, ts(2), 3L)))
          q.processAllAvailable()
          // batch 2: two more acked records — frontier must stay frozen
          mem.addData(Seq((5L, ts(3), 4L), (5L, ts(4), 5L)))
          q.processAllAvailable()

          val updates = spark.table(s"frontmem_$label")
            .as[CdcPipeline.FrontierState]
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
    }

    test(s"[$label] a gapless shard checkpoints its head each batch") {
      withStateStoreProvider(provider) {
        implicit val sq = spark.sqlContext
        import spark.implicits._
        val mem = MemoryStream[(Long, Timestamp, Long)]
        val q = CdcPipeline.frontierStream(mem.toDS())
          .writeStream.format("memory").queryName(s"frontmem2_$label")
          .outputMode("update").start()
        try {
          mem.addData(Seq((7L, ts(0), 1L), (7L, ts(1), 2L)))
          q.processAllAvailable()
          mem.addData(Seq((7L, ts(2), 3L)))
          q.processAllAvailable()
          val last = spark.table(s"frontmem2_$label")
            .as[CdcPipeline.FrontierState]
            .collect().maxBy(_.n_records)
          assert((last.n_records, last.frontier_seq) === ((3L, 3L)))
          assert(last.first_gap_seq === None)
          assert(last.frontier_event_id === Some(3L))
        } finally q.stop()
      }
    }

    test(s"[$label] crash mid-batch: checkpoint resume restores state and replays the batch exactly once") {
      withStateStoreProvider(provider) {
        implicit val sq = spark.sqlContext
        import spark.implicits._
        val mem = MemoryStream[(Long, Timestamp, Long)]
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"graft_frontier_ckpt_$label").toString
        val emitted = new ConcurrentLinkedQueue[CdcPipeline.FrontierState]()
        val crashNext = new AtomicBoolean(false)
        val q1 = CdcPipeline.frontierStream(mem.toDS())
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .foreachBatch {
              (df: org.apache.spark.sql.Dataset[CdcPipeline.FrontierState],
               _: Long) =>
            val rows = df.collect()
            // kill AFTER the state store computed the batch but BEFORE
            // the sink acknowledged — the crash-mid-batch shape: the
            // batch must not count as delivered
            if (crashNext.compareAndSet(true, false))
              throw new RuntimeException("sink crashed mid-batch")
            rows.foreach(emitted.add)
            ()
          }
          .start()
        // batch 1 commits: gap planted at seq 2 (event_id 37)
        mem.addData(Seq((5L, ts(0), 1L), (5L, ts(1), 37L), (5L, ts(2), 3L)))
        q1.processAllAvailable()
        // batch 2 crashes mid-flight
        mem.addData(Seq((5L, ts(3), 4L), (5L, ts(4), 5L)))
        crashNext.set(true)
        intercept[Throwable] { q1.processAllAvailable() }
        try q1.stop() catch { case _: Throwable => () }

        // resume from the SAME checkpoint: state v1 restores, the
        // uncommitted batch re-runs once
        val q2 = CdcPipeline.frontierStream(mem.toDS())
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .foreachBatch {
              (df: org.apache.spark.sql.Dataset[CdcPipeline.FrontierState],
               _: Long) =>
            df.collect().foreach(emitted.add)
            ()
          }
          .start()
        try q2.processAllAvailable() finally q2.stop()

        import scala.jdk.CollectionConverters._
        val updates = emitted.asScala.toSeq.sortBy(_.n_records)
        // exactly-once: the crashed batch's emission arrives ONCE —
        // two updates total, no duplicate n_records
        assert(updates.map(_.n_records) === Seq(3L, 5L))
        // monotone: the frontier never regresses across the restart
        assert(updates.sliding(2).forall {
          case Seq(a, b) => b.frontier_seq >= a.frontier_seq &&
            b.n_records >= a.n_records
          case _ => true
        })
        // the recovered final state equals the uninterrupted batch
        // audit: 5 records, 4 acked, frontier frozen at seq 1 by the
        // gap at seq 2
        val fin = updates.last
        assert((fin.n_records, fin.n_acked, fin.frontier_seq,
          fin.first_gap_seq) === ((5L, 4L, 1L, Some(2L))))
        assert(fin.frontier_event_id === Some(1L))
      }
    }
  }
}
