package graft

import org.apache.spark.sql.Dataset

/** Registry of relations persisted while building a query, so the
  * harness (Bench / Verify / a user session) can release them once
  * the query's result has been consumed.
  *
  * Why: several operators persist a multi-consumer intermediate (the
  * MLlib handle-persistence pattern). Left unreleased, a long-lived
  * session accumulates every intermediate ever cached, and per-query
  * cost depends on which sibling ran first — benchmarks become
  * order-dependent and memory grows without bound. Operators register
  * each persisted handle here; callers invoke `releaseAll()` at query
  * end (after the result is materialized — unpersisting earlier would
  * force recomputation of the branches still in flight).
  *
  * Concurrency contract: the registry is process-global, sized for the
  * single-threaded harness (Verify/Bench run queries sequentially). If
  * two queries run concurrently on one session, a `releaseAll()` from
  * one unpersists the other's in-flight intermediates — results stay
  * correct (Spark recomputes), but the persist-to-avoid-recompute
  * guarantee silently vanishes. Concurrent callers should skip
  * `releaseAll()` and unpersist their own handles instead.
  */
object CacheScope {

  private val active = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register a persisted dataset for later release; returns it. */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    active += ds
    ds
  }

  /** Unpersist (non-blocking) everything registered since the last
    * release. Safe to call when nothing is registered. Also clears
    * [[memoize]]'s table: a memoized verdict is derived from a
    * persisted upstream, so its lifetime is exactly the persistence
    * scope — after release the upstream may be recomputed (or, in a
    * user session, point at changed data), so the verdict must be
    * re-derived too.
    */
  def releaseAll(): Unit = synchronized {
    active.foreach { ds =>
      try ds.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    active.clear()
    memoTable.clear()
  }

  private val memoTable =
    new java.util.concurrent.ConcurrentHashMap[Any, Any]()

  /** Query-scoped memo for small plan-derived verdicts (e.g. the
    * capBucketMembers benign/hot pre-census): `compute` runs at most
    * once per distinct `key` between [[releaseAll]] calls, so a
    * builder invoked repeatedly over the same materialized relation
    * (several capped generators sharing one bucket relation, or a
    * plan-audit loop re-building a query) pays its eager Spark job
    * once instead of per call. Keys should embed a CANONICALIZED
    * logical plan plus the scalar parameters so structurally equal
    * inputs share an entry. Cleared by [[releaseAll]] — the same
    * boundary that releases the persisted upstream the verdict was
    * measured against, which also bounds staleness: within one query
    * scope inputs are immutable snapshots, so a frozen verdict is the
    * correct verdict.
    */
  def memoize[V](key: Any)(compute: => V): V =
    memoTable.computeIfAbsent(key, _ => compute).asInstanceOf[V]

  /** Number of currently registered (unreleased) handles. */
  def activeCount: Int = synchronized(active.size)

  /** Persist AND materialize a multi-consumer intermediate, registered
    * for release: a lazily-persisted relation consumed by several
    * branches of one job is recomputed per branch (the partitions race
    * into the cache), so count it once up front — the MLlib
    * handle-persistence pattern.
    */
  def materialize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = register(df.persist())
    p.count()
    p
  }

  /** Persist WITHOUT the up-front count, registered for release.
    * Safe when one consumer reaches the others only through a
    * broadcast exchange: the broadcast subtree runs as its own job
    * first and fully populates the cache, so the main job reads it —
    * no barrier job, no race. If concurrent stage materialization
    * (AQE) does overlap the consumers, partitions racing into the
    * cache recompute — the worst case degrades to the uncached cost,
    * never to a wrong result. Use [[materialize]] when consumers
    * share one job tree and the recompute must be prevented.
    */
  def lazyPersist(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    register(df.persist())
}
