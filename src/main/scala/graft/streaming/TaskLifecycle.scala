package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Transient-failure lifecycle around a replication task — the
  * library twin of the reference's retry wrapper (run.py:75-88: N+1
  * attempts, a fixed sleep after every failure, the LAST error
  * rethrown once attempts are exhausted) plus the Spark-native form
  * of "restart the task": re-start a streaming query from its OWN
  * checkpoint, where the commit log makes the restart exactly-once —
  * a failed micro-batch re-runs, a committed one never re-emits.
  *
  * Sleeping is injected (`sleeper`) so specs assert the backoff
  * schedule without wall-clock waits; production callers use the
  * default Thread.sleep.
  */
object TaskLifecycle {

  /** One attempt's outcome, for the operational audit trail. */
  final case class Attempt(
      attempt: Int, ok: Boolean, error: Option[String], elapsedMs: Long)

  /** run.py:75-88 semantics: up to `retries + 1` attempts, sleep
    * after EVERY failure (the reference sleeps inside the except
    * handler, including the final attempt's), rethrow the last error
    * when exhausted.
    */
  def retry[T](
      retries: Int,
      sleepMs: Long,
      sleeper: Long => Unit = Thread.sleep(_))(body: => T): T =
    retryWithAudit(retries, sleepMs, sleeper)(body)._1

  /** [[retry]] returning the per-attempt audit alongside the result. */
  def retryWithAudit[T](
      retries: Int,
      sleepMs: Long,
      sleeper: Long => Unit = Thread.sleep(_))(body: => T): (T, Seq[Attempt]) = {
    val audit = Seq.newBuilder[Attempt]
    var last: Throwable = null
    var attempt = 0
    while (attempt <= retries) {
      val t0 = System.nanoTime()
      try {
        val r = body
        audit += Attempt(attempt, ok = true, None,
          (System.nanoTime() - t0) / 1000000L)
        return (r, audit.result())
      } catch {
        case e: Throwable =>
          last = e
          audit += Attempt(attempt, ok = false, Some(e.toString),
            (System.nanoTime() - t0) / 1000000L)
          sleeper(sleepMs)
      }
      attempt += 1
    }
    throw last
  }

  /** Run a streaming task to completion with checkpoint-resumed
    * restarts: `start` must build the query against a FIXED
    * checkpoint location — each restart then resumes from the commit
    * log, so a batch that failed mid-flight re-runs and a batch that
    * committed is never re-emitted (the exactly-once contract a DMS
    * task recovery leans on). Up to `maxRestarts` restarts, a sleep
    * between them; the last error is rethrown when exhausted.
    * Returns the per-attempt audit.
    */
  def runWithRestarts(
      maxRestarts: Int,
      sleepMs: Long = 0L,
      sleeper: Long => Unit = Thread.sleep(_))(
      start: () => StreamingQuery): Seq[Attempt] = {
    val audit = Seq.newBuilder[Attempt]
    var attempt = 0
    var last: Throwable = null
    while (attempt <= maxRestarts) {
      val t0 = System.nanoTime()
      var q: StreamingQuery = null
      try {
        // start() itself is inside the attempt: a failure while
        // resolving the checkpoint/source at query construction is
        // exactly the transient class the lifecycle absorbs
        q = start()
        q.processAllAvailable()
        q.stop()
        audit += Attempt(attempt, ok = true, None,
          (System.nanoTime() - t0) / 1000000L)
        return audit.result()
      } catch {
        case e: Throwable =>
          if (q != null) { try q.stop() catch { case _: Throwable => () } }
          last = e
          audit += Attempt(attempt, ok = false, Some(e.toString),
            (System.nanoTime() - t0) / 1000000L)
          sleeper(sleepMs)
      }
      attempt += 1
    }
    throw last
  }
}
