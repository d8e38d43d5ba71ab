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
    // count jobs BY JOB GROUP, not by a raw global counter: the
    // listener bus posts asynchronously, so a fixed post-count sleep
    // only bounds the lag heuristically and a saturated bus could
    // attribute a job to the wrong query. Each query runs under its
    // own group id (inherited by Par threads — they are spawned after
    // setJobGroup from the tagged thread), and the count is read
    // after it goes STABLE rather than after a fixed delay.
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val g = Option(s.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        g.foreach(id => jobs
          .computeIfAbsent(id,
            _ => new java.util.concurrent.atomic.AtomicInteger(0))
          .incrementAndGet())
        ()
      }
    })
    // warm-up (session/codegen), mirroring Bench
    Tables.load(spark, dir, "events").groupBy("event_type").count().collect()
    names.foreach { n =>
      CacheScope.releaseAll()
      spark.catalog.clearCache()
      val group = s"jobaudit-$n"
      spark.sparkContext.setJobGroup(group, n)
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, dir).count()
      finally spark.sparkContext.clearJobGroup()
      val ms = (System.nanoTime() - t0) / 1e6
      def cnt(): Int =
        Option(jobs.get(group)).map(_.get()).getOrElse(0)
      var last = -1
      var waited = 0
      while (cnt() != last && waited < 1000) {
        last = cnt(); Thread.sleep(20); waited += 20
      }
      println(f"JOBAUDIT $n%-40s ${ms}%9.1f ms ${cnt()}%4d jobs")
    }
    spark.stop()
  }
}
