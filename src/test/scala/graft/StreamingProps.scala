package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.cdc.ChangeFeed
import graft.streaming.CdcPipeline
import graft.streaming.CdcPipeline.RawEvent

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

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private val events: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 3L),
      Gen.chooseNum(0L, 10L),
      Gen.frequency(3 -> "signup", 4 -> "click", 2 -> "purchase",
        2 -> "error"))) // error = delete tombstone

  private val cuts: Gen[List[Int]] = Gen.listOf(Gen.chooseNum(0, 40))

  private var runId = 0

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
      val name = s"stream_props_$runId"
      val mem = MemoryStream[RawEvent]
      val q = CdcPipeline.applyChangesStream(CdcPipeline.annotate(mem.toDF()))
        .writeStream.format("memory")
        .queryName(name).outputMode("update").start()
      val got = try {
        batches.foreach { b =>
          mem.addData(b)
          q.processAllAvailable()
        }
        spark.table(name)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("table_name", "user_id")
              .orderBy(col("ts").desc, col("event_id").desc)))
          .filter(col("rn") === 1 && !col("deleted"))
          .select("user_id", "event_id", "value")
          .as[(Long, Long, Double)].collect().toSet
      } finally q.stop()

      val expected = ChangeFeed.applyChanges(
          ChangeFeed.annotate(raw.toDF()), Seq("user_id"),
          Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().toSet

      got == expected
    }
}
