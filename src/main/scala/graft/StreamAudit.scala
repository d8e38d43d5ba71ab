package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement helper (optimization-guide §1, r15 verdict item 7):
  * price the streaming set's micro-batch barriers. For each named
  * query, run it once exactly as Bench does and report, summed over
  * every micro-batch of every stream the query drained, the
  * progress-reported duration components (addBatch = task execution
  * incl. sink, queryPlanning, getBatch/latestOffset = source
  * bookkeeping, walCommit/commitOffsets = offset-log fsyncs,
  * triggerExecution = whole-barrier wall) plus the state-store
  * operator totals (commit time, rows, memory). This is the table
  * that says WHERE the ~1 s/query fixed cost of the streaming twins
  * sits — scheduler tasks, state commits, or offset-log I/O — at any
  * SF and under either state-store provider
  * (SPARK_GRAFT_STATESTORE=rocksdb switches). Diagnostic only; not
  * part of the bench contract.
  *
  * Usage: runMain graft.StreamAudit [sfDir] [query ...]
  */
object StreamAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
        .filter(n => n.contains("stream") || n.contains("handoff"))
    val spark = Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-streamaudit")
    // per-query accumulation, keyed by duration component
    val durations = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicLong]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val commitMs = new java.util.concurrent.atomic.AtomicLong(0)
    val stateRows = new java.util.concurrent.atomic.AtomicLong(0)
    val stateStores = new java.util.concurrent.atomic.AtomicLong(0)
    def reset(): Unit = {
      durations.clear(); batches.set(0); commitMs.set(0)
      stateRows.set(0); stateStores.set(0)
    }
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batches.incrementAndGet()
        e.progress.durationMs.forEach { (k, v) =>
          durations.computeIfAbsent(k,
            _ => new java.util.concurrent.atomic.AtomicLong(0))
            .addAndGet(v); ()
        }
        e.progress.stateOperators.foreach { so =>
          commitMs.addAndGet(so.allUpdatesTimeMs + so.commitTimeMs)
          stateRows.addAndGet(so.numRowsTotal)
          stateStores.addAndGet(so.customMetrics
            .getOrDefault("numShufflePartitions", 0L).longValue())
          ()
        }
      }
    }
    spark.streams.addListener(listener)
    // warm-up (session/codegen), mirroring Bench
    Tables.load(spark, dir, "events").groupBy("event_type").count().collect()
    names.foreach { n =>
      CacheScope.releaseAll()
      spark.catalog.clearCache()
      reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      // progress events are async; settle like JobAudit does
      var last = -1
      var waited = 0
      while (batches.get() != last && waited < 1000) {
        last = batches.get(); Thread.sleep(20); waited += 20
      }
      val d = new java.util.TreeMap[String, Long]()
      durations.forEach { (k, v) => d.put(k, v.get()); () }
      println(f"STREAMAUDIT $n%-34s wall ${wallMs}%8.1f ms " +
        f"batches ${batches.get()}%3d stateCommitMs ${commitMs.get()}%6d " +
        f"stateRows ${stateRows.get()}%8d stateParts ${stateStores.get()}%5d " +
        f"durations $d")
    }
    spark.stop()
  }
}
