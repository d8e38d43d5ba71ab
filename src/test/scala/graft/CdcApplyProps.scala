package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.cdc.ChangeFeed

/** Property checks for the CDC apply core: materialized state must
  * be a pure function of the change-log SET — row order and
  * partitioning invisible — and equal a plain-Scala latest-wins
  * fold. (key, seq) pairs are unique by construction (a real feed's
  * per-key LSN is), since equal-order ties have no defined winner.
  */
object CdcApplyProps extends Properties("graft.cdcapply") {
  private lazy val spark = SparkTestSession.spark

  private val ops = Gen.frequency(
    3 -> "insert", 4 -> "update", 2 -> "delete")
  private val log: Gen[Map[(Int, Long), String]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0L, 30L)), ops)).map(_.toMap)

  property("apply == latest-wins fold, any row order/partitioning") =
    Prop.forAll(log, Gen.chooseNum(1, 7), Gen.long) { (rows, parts, seed) =>
      import spark.implicits._
      val shuffled = new scala.util.Random(seed).shuffle(
        rows.toSeq.map { case ((k, s), op) => (k, s, op) })
      val df = shuffled.toDF("k", "seq", "op").repartition(parts)

      val applied = ChangeFeed.applyChanges(df, Seq("k"), Seq(col("seq")))
        .select("k", "seq", "op").collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap
      val retained = ChangeFeed.latestPerKey(df, Seq("k"), Seq(col("seq")))
        .select("k", "seq").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap

      val latest = rows.groupBy(_._1._1).view.mapValues(
        _.toSeq.maxBy(_._1._2)).toMap

      // tombstones survive compaction (latestPerKey keeps every key
      // at its latest position) while apply drops deleted keys
      retained == latest.map { case (k, ((_, s), _)) => k -> s } &&
        applied == latest.collect {
          case (k, ((_, s), op)) if op != "delete" => k -> (s, op)
        }
    }
}
