package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.cdc.ChangeFeed
import graft.streaming.CdcPipeline
import graft.streaming.CdcPipeline.{KeyState, RawEvent}

/** Property check for the stateful streaming materialization: an
  * arbitrary event log delivered under ARBITRARY micro-batch
  * boundaries must converge to exactly the batch twin's state.
  * Batch-edge placement is the axis state bugs live on (a late
  * update arriving after its key's delete, a key's whole history
  * split 1-per-batch, everything in one batch) and the fixed specs
  * can only sample it; the generator sweeps it. Case count is small
  * because every case runs a full streaming query.
  */
object StreamingProps extends Properties("graft.streaming") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  /** Timestamp at a MICROSECOND offset from the epoch base — the
    * generator draws many events inside the same millisecond, the
    * granularity where a getTime()-based recency comparison silently
    * ties and diverges from the batch twin's full-precision ordering
    * (the CdcPipeline.micros bug class).
    */
  private def ts(us: Long) = {
    val t = new Timestamp(1700000000000L + us / 1000L)
    t.setNanos((t.getNanos / 1000000 * 1000000 + (us % 1000L) * 1000L).toInt)
    t
  }

  private val events: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 3L),
      // micro offsets spanning sub-ms ties AND minute-scale gaps
      Gen.frequency(
        3 -> Gen.chooseNum(0L, 2000L),
        1 -> Gen.chooseNum(0L, 10L).map(_ * 60000000L)),
      Gen.frequency(3 -> "signup", 4 -> "click", 2 -> "purchase",
        2 -> "error"))) // error = delete tombstone

  private val cuts: Gen[List[Int]] = Gen.listOf(Gen.chooseNum(0, 40))

  private var runId = 0
  // fresh root per JVM: a fixed path would resume a PREVIOUS run's
  // checkpoint against a brand-new MemoryStream
  private lazy val ckptRoot =
    java.nio.file.Files.createTempDirectory("stream_props_ckpt").toString

  property("any micro-batching converges to the batch-twin state") =
    Prop.forAll(events, cuts) { (evs, rawCuts) =>
      import spark.implicits._
      implicit val sq = spark.sqlContext
      val raw = evs.zipWithIndex.map { case ((u, m, ty), i) =>
        RawEvent(i.toLong, ts(m), u, ty, (i * 7 % 100) / 10.0, "{}")
      }
      val batches = {
        val pts = (rawCuts.map(_ % (raw.size + 1)) :+ 0 :+ raw.size)
          .distinct.sorted
        pts.zip(pts.tail).map { case (a, b) => raw.slice(a, b) }
      }

      runId += 1
      // capture (batchId, emitted state) so the final state per key
      // is the LAST EMISSION, not a ts-window reconstruction over
      // all updates — a reconstruction would re-derive the right
      // answer from the full-precision ts column and MASK a state
      // that kept the wrong row (verified: the getTime-truncation
      // mutation passes a ts-window readback but fails this one)
      val emitted =
        scala.collection.mutable.ArrayBuffer.empty[(Long, KeyState)]
      val mem = MemoryStream[RawEvent]
      val q = CdcPipeline.applyChangesStream(CdcPipeline.annotate(mem.toDF()))
        .writeStream.outputMode("update")
        .foreachBatch { (ds: Dataset[KeyState], id: Long) =>
          emitted.synchronized {
            emitted ++= ds.collect().map(id -> _)
          }
          (): Unit
        }
        .option("checkpointLocation", s"$ckptRoot/$runId")
        .start()
      val got = try {
        batches.foreach { b =>
          mem.addData(b)
          q.processAllAvailable()
        }
        emitted.groupBy(e => (e._2.table_name, e._2.user_id))
          .values.map(_.maxBy(_._1)._2)
          .filter(!_.deleted)
          .map(s => (s.user_id, s.event_id, s.value)).toSet
      } finally q.stop()

      val expected = ChangeFeed.applyChanges(
          ChangeFeed.annotate(raw.toDF()), Seq("user_id"),
          Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().toSet

      got == expected
    }

  property("streamed transitions under any batching == batch Markov counts") =
    Prop.forAll(events, cuts) { (evs, rawCuts) =>
      import spark.implicits._
      implicit val sq = spark.sqlContext
      // the twin's contract is per-user IN-ORDER delivery across
      // batches (the Kinesis shard guarantee): sort the log globally
      // before cutting; each batch is REVERSED on delivery so the
      // intra-batch sort (which the contract does NOT delegate to
      // the transport) is actually exercised
      val raw = evs.zipWithIndex.map { case ((u, m, ty), i) =>
        RawEvent(i.toLong, ts(m), u, ty, 0.0, "{}")
      }.sortBy(e => (e.ts.getTime * 1000000L + e.ts.getNanos / 1000L, e.event_id))
      val batches = {
        val pts = (rawCuts.map(_ % (raw.size + 1)) :+ 0 :+ raw.size)
          .distinct.sorted
        pts.zip(pts.tail).map { case (a, b) => raw.slice(a, b).reverse }
      }

      runId += 1
      val emitted =
        scala.collection.mutable.ArrayBuffer.empty[CdcPipeline.Transition]
      val mem = MemoryStream[RawEvent]
      val q = CdcPipeline.transitionsStream(mem.toDS())
        .writeStream.outputMode("append")
        .foreachBatch { (ds: Dataset[CdcPipeline.Transition], _: Long) =>
          emitted.synchronized { emitted ++= ds.collect() }
          (): Unit
        }
        .option("checkpointLocation", s"$ckptRoot/$runId")
        .start()
      val got = try {
        batches.foreach { b =>
          mem.addData(b)
          q.processAllAvailable()
        }
        emitted.groupBy(t => (t.from_type, t.to_type)).view
          .mapValues(_.size.toLong).toMap
      } finally q.stop()

      val expected = graft.operators.Analytics.markovTransitions(
          raw.toDF().withColumn("ts", col("ts").cast("timestamp")))
        .select("from_type", "to_type", "n_trans")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap

      got == expected
    }
}
