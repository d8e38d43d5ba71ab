package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcPipeline

/** Every stateful-operator family must be green under BOTH state
  * store backends: the HDFS-backed default every other spec
  * exercises for free, and RocksDB — SURVEY §4's recipe for the
  * 1000-executor deployment, where per-task state outgrows executor
  * heaps. The store is an implementation detail of the engine, so
  * each roundtrip's result under RocksDB must equal the default
  * provider's bit for bit; a divergence would mean state
  * serialization semantics leaked into operator results.
  *
  * One representative per state shape: windowed aggregate (complete
  * mode), flatMapGroupsWithState (SCD2), dropDuplicatesWithinWatermark
  * (dedup), EventTimeTimeout timers (quiet users), stream-stream
  * interval join (attribution), and session_window merges (sessions).
  * The frontier family runs both providers in FrontierStreamSpec
  * (including crash-recovery).
  */
class RocksDbStateSpec extends AnyFunSuite {
  import SparkTestSession._

  private val rocksdb = stateStoreProviders.toMap.apply("rocksdb")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def bothWays(name: String)(fn: => DataFrame): Unit = {
    val default = sortedRows(fn)
    assert(default.nonEmpty, s"$name produced no rows under the default store")
    val rocks = withStateStoreProvider(rocksdb) { sortedRows(fn) }
    assert(rocks === default,
      s"$name diverges between RocksDB and the default state store")
  }

  test("windowed aggregate equal under RocksDB") {
    bothWays("windowedRoundtrip") {
      CdcPipeline.windowedRoundtrip(spark, sf)
    }
  }

  test("streaming SCD2 equal under RocksDB") {
    bothWays("scd2Roundtrip") { CdcPipeline.scd2Roundtrip(spark, sf) }
  }

  test("watermarked dedup equal under RocksDB") {
    bothWays("dedupRoundtrip") { CdcPipeline.dedupRoundtrip(spark, sf) }
  }

  test("event-time-timeout quiet users equal under RocksDB") {
    bothWays("quietUsersStream") { CdcPipeline.quietUsersStream(spark, sf) }
  }

  test("stream-stream interval join equal under RocksDB") {
    bothWays("attributionJoinStream") {
      CdcPipeline.attributionJoinStream(spark, sf)
    }
  }

  test("session windows equal under RocksDB") {
    bothWays("sessionRoundtrip") { CdcPipeline.sessionRoundtrip(spark, sf) }
  }
}
