package graft

/** Run independent Spark-action thunks concurrently on a transient
  * thread pool — the optimization-guide §2.6 pattern ("Overlap
  * independent jobs": actions are only sequential because driver code
  * calls them sequentially; submitting independent jobs from a small
  * thread pool lets the next job's tasks back-fill executors freed by
  * the current job's tail).
  *
  * Used by operators whose construction runs SEVERAL eager
  * materializations with no data dependency between them (e.g. the
  * k-sweep trainings of `sim_kmeans_elbow`, the per-geometry index
  * builds of `sim_ann_frontier`). Each thunk's own chain stays
  * sequential, so per-thunk results are bit-identical to the serial
  * build; only the wall-clock overlap changes. Under a low-core
  * session (the driver's scaling measurement) the FIFO scheduler
  * serializes the work naturally — the overlap is an upper bound, not
  * a requirement.
  *
  * Concurrency notes:
  *  - Spark supports concurrent actions on one session; racing
  *    `persist()` calls on structurally-equal plans collapse to one
  *    cache entry (CacheManager synchronizes; the loser's persist is
  *    a no-op and its count reads/fills the same entry).
  *  - [[CacheScope.register]] is synchronized; registration order may
  *    vary run to run but release is all-at-once, so nothing observes
  *    the order.
  *  - A fresh pool per call (sized to the thunk count, which callers
  *    keep small and bounded) cannot deadlock on nested [[run]] the
  *    way a shared bounded pool could.
  *  - Thunks MUST NOT mutate session-level SQL conf (e.g. the
  *    transient shuffle-partitions pattern some streaming setup code
  *    uses): the session is shared, so a conf write in one thunk
  *    races every sibling's planning. Pass per-relation sizing
  *    through the plan (repartition/hints), never through the conf,
  *    inside a thunk.
  *  - Job-scoped properties (setJobDescription/setJobGroup) are
  *    InheritableThreadLocals captured when the pool thread is
  *    CREATED. Pool threads here are spawned at submit time from the
  *    calling thread, so they inherit its properties; a pool that
  *    pre-warmed or reused threads across calls would break that
  *    assumption (labels would leak between callers) — keep the
  *    pool-per-call design.
  *
  * Failures: the FIRST failing thunk's cause is rethrown unchanged
  * (unwrapped from ExecutionException) after every thunk settles, so
  * error behaviour matches the serial build (no half-running jobs
  * leaking past the call).
  */
object Par {
  def run[T](thunks: Seq[() => T]): Seq[T] = {
    if (thunks.lengthCompare(1) <= 0) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[T] {
            def call(): T = t()
          })
        }
        // settle everything before throwing so a failure can't leave
        // sibling jobs mutating CacheScope after the caller unwinds
        val settled = futs.map { f =>
          try Right(f.get())
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Left(Option(e.getCause).getOrElse(e))
            case e: Throwable => Left(e)
          }
        }
        settled.collectFirst { case Left(e) => e }.foreach(throw _)
        settled.collect { case Right(v) => v }
      } finally pool.shutdown()
    }
  }

  /** Two heterogeneous independent chains. */
  def run2[A, B](a: () => A, b: () => B): (A, B) = {
    val rs = run(Seq(() => (a(): Any), () => (b(): Any)))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }
}
