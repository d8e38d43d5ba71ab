package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Measurement helper (optimization-guide §1): for each named query
  * (all of them with no names given), run it once exactly as Bench
  * does (construction + count, caches dropped before each) and report
  * `name wall_ms n_jobs` — the job count separates queries whose wall
  * is ONE big computation from queries that pay many serial barrier
  * jobs (eager materializations, iterative checkpoints), which are
  * the §2.6 overlap candidates. Diagnostic only; not part of the
  * bench contract.
  *
  * Usage: runMain graft.JobAudit [sfDir] [query ...]
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-jobaudit")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    // warm-up (session/codegen), mirroring Bench
    Tables.load(spark, dir, "events").groupBy("event_type").count().collect()
    names.foreach { n =>
      CacheScope.releaseAll()
      spark.catalog.clearCache()
      jobs.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val ms = (System.nanoTime() - t0) / 1e6
      // listener events are async; give the bus a moment to drain
      // (job STARTS for jobs belonging to this query have all fired
      // by the time count() returns; 50 ms bounds the posting lag)
      Thread.sleep(50)
      println(f"JOBAUDIT $n%-40s ${ms}%9.1f ms ${jobs.get()}%4d jobs")
    }
    spark.stop()
  }
}
