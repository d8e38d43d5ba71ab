package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.cdc.Retention
import graft.streaming.CdcPipeline

/** Random-input laws for the checkpoint-frontier pair: the batch
  * audit must equal a driver-side prefix fold on ANY ack pattern the
  * generator produces, and the streaming twin must equal the batch
  * audit when the same feed is replayed through the engine split at
  * a RANDOM micro-batch boundary — the stream/batch-equality
  * contract under arbitrary cut points, not just the spec's
  * hand-picked ones.
  */
object FrontierProps extends Properties("graft.frontier") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  // event ids drawn around multiples of 37 so unacked holes are
  // common but not guaranteed; distinct so (ts, id) is a total order
  private val feedGen: Gen[List[Long]] =
    Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(30L, 120L)).map(_.distinct))

  private case class Expect(
      nRecords: Long, nAcked: Long, frontier: Long,
      frontierId: Option[Long], firstGap: Option[Long])

  private def fold(ids: List[Long]): Expect = {
    var (n, acked, frontier) = (0L, 0L, 0L)
    var frontierId: Option[Long] = None
    var firstGap: Option[Long] = None
    ids.foreach { id =>
      n += 1
      val ok = id % 37L != 0L
      if (ok) acked += 1 else if (firstGap.isEmpty) firstGap = Some(n)
      if (ok && firstGap.isEmpty) { frontier = n; frontierId = Some(id) }
    }
    Expect(n, acked, frontier, frontierId, firstGap)
  }

  property("batch audit == driver prefix fold on random ack patterns") =
    Prop.forAll(feedGen.suchThat(_.nonEmpty)) { ids =>
      import spark.implicits._
      val feed = ids.zipWithIndex.map { case (id, i) => (id, ts(i), id) }
        .toDF("user_id", "ts", "event_id")
        .withColumn("partition_key", lit("graft.users_0"))
      val row = Retention.checkpointFrontier(feed).collect().head
      val e = fold(ids)
      row.getAs[Long]("n_records") == e.nRecords &&
        row.getAs[Long]("n_acked") == e.nAcked &&
        row.getAs[Long]("frontier_seq") == e.frontier &&
        Option(row.getAs[java.lang.Long]("frontier_event_id"))
          .map(_.toLong) == e.frontierId &&
        Option(row.getAs[java.lang.Long]("first_gap_seq"))
          .map(_.toLong) == e.firstGap &&
        row.getAs[Long]("n_redelivered") == e.nRecords - e.frontier
    }

  property("streaming twin == batch audit under a random batch split") =
    Prop.forAll(feedGen.suchThat(_.size >= 2).flatMap(ids =>
      Gen.chooseNum(1, ids.size - 1).map(cut => (ids, cut)))) {
      case (ids, cut) =>
        implicit val sq = spark.sqlContext
        import spark.implicits._
        val rows = ids.zipWithIndex.map { case (id, i) => (5L, ts(i), id) }
        val mem = MemoryStream[(Long, Timestamp, Long)]
        val name = s"frontprop_${System.nanoTime}"
        val q = CdcPipeline.frontierStream(mem.toDS())
          .writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        val got =
          try {
            mem.addData(rows.take(cut)); q.processAllAvailable()
            mem.addData(rows.drop(cut)); q.processAllAvailable()
            spark.table(name).as[CdcPipeline.FrontierState]
              .collect().maxBy(_.n_records)
          } finally { q.stop(); spark.catalog.dropTempView(name) }
        val e = fold(ids)
        got.n_records == e.nRecords && got.n_acked == e.nAcked &&
          got.frontier_seq == e.frontier &&
          got.frontier_event_id == e.frontierId &&
          got.first_gap_seq == e.firstGap
    }
}
