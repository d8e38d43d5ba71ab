package graft

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Large-state streaming rehearsal under RocksDB — prices SURVEY §4's
  * capacity claim (state that outgrows executor heaps belongs in the
  * RocksDB provider) instead of just asserting its semantics (which
  * RocksDbStateSpec already bit-pins against the HDFS provider).
  *
  * Runs the registry's stateful streaming queries through the real
  * engine with `spark.sql.streaming.stateStore.providerClass` set to
  * RocksDB, a deliberately small driver heap (run via
  * SPARK_DRIVER_MEM=3g), and records per query: wall seconds, number
  * of micro-batches, peak state rows, peak state bytes (max of
  * memoryUsedBytes and the stateOnCurrentVersionSizeBytes custom
  * metric), the RocksDB footprint (sst file size + pinned block
  * memory — Spark 4.1's provider exposes no single totalMemoryUsage
  * metric), and the slowest batch. One JSON line per query; paste
  * into BASELINE.md.
  *
  * Usage: RocksDbRehearsal <sfDir> [query ...]
  *        (default queries: cdc_stream_dedup cdc_stream_frontier)
  */
object RocksDbRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("cdc_stream_dedup", "cdc_stream_frontier")
    val spark = Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-rocksdb")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")

    // capture every progress event; queries run one at a time, so
    // the window between resets belongs to exactly one rehearsal
    val batches = mutable.ArrayBuffer.empty[
      (Long, Long, Long, Long)] // (durationMs, stateRows, stateBytes, memBytes)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        batches.synchronized {
          val p = e.progress
          val rows = p.stateOperators.map(_.numRowsTotal).sum
          val bytes = p.stateOperators.map { so =>
            val m = so.customMetrics
            math.max(so.memoryUsedBytes,
              if (m.containsKey("stateOnCurrentVersionSizeBytes"))
                m.get("stateOnCurrentVersionSizeBytes").longValue else 0L)
          }.sum
          // Spark 4.1's RocksDB provider reports its footprint as
          // sst file size (disk) + pinned block memory — there is no
          // single totalMemoryUsage metric in this version
          val mem = p.stateOperators.map { so =>
            val m = so.customMetrics
            Seq("rocksdbSstFileSize", "rocksdbPinnedBlocksMemoryUsage")
              .map(k => if (m.containsKey(k)) m.get(k).longValue else 0L)
              .sum
          }.sum
          batches += ((p.batchDuration, rows, bytes, mem))
        }
    }
    spark.streams.addListener(listener)

    names.foreach { name =>
      batches.synchronized(batches.clear())
      val t0 = System.nanoTime
      val n = SparkEntry.queries(name)(spark, dir).count()
      val secs = (System.nanoTime - t0) / 1e9
      val snap = batches.synchronized(batches.toSeq)
      val line =
        s"""{"query":"$name","secs":${f"$secs%.3f"},"rows":$n""" +
          s""","batches":${snap.size}""" +
          s""","peak_state_rows":${if (snap.isEmpty) 0 else snap.map(_._2).max}""" +
          s""","peak_state_bytes":${if (snap.isEmpty) 0 else snap.map(_._3).max}""" +
          s""","peak_rocksdb_sst_plus_pinned_bytes":${if (snap.isEmpty) 0 else snap.map(_._4).max}""" +
          s""","max_batch_ms":${if (snap.isEmpty) 0 else snap.map(_._1).max}""" +
          s""","provider":"rocksdb","heap":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}"}"""
      println(line)
    }
    spark.stop()
  }
}
