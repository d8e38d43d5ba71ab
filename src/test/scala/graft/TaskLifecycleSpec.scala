package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TaskLifecycle

/** Pins the task retry/backoff lifecycle (run.py:75-88 semantics) and
  * the checkpoint-resumed streaming restart — the recovery seam a
  * replication task leans on: a failed micro-batch re-runs on
  * restart, a committed one never re-emits.
  */
class TaskLifecycleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("retry: N+1 attempts, sleep after every failure, last error rethrown") {
    val sleeps = Seq.newBuilder[Long]
    val calls = new AtomicInteger(0)
    val e = intercept[RuntimeException] {
      TaskLifecycle.retry(retries = 2, sleepMs = 7L, sleeper = sleeps += _) {
        throw new RuntimeException(s"boom ${calls.incrementAndGet()}")
      }
    }
    assert(calls.get() === 3)             // retries + 1 attempts
    assert(sleeps.result() === Seq(7L, 7L, 7L)) // sleep after EVERY failure
    assert(e.getMessage === "boom 3")     // the LAST error is rethrown
  }

  test("retry: success mid-way stops the loop and returns the value") {
    val sleeps = Seq.newBuilder[Long]
    val calls = new AtomicInteger(0)
    val (r, audit) = TaskLifecycle.retryWithAudit(
        retries = 5, sleepMs = 3L, sleeper = sleeps += _) {
      if (calls.incrementAndGet() < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(r === "ok")
    assert(calls.get() === 3)
    assert(sleeps.result() === Seq(3L, 3L)) // no sleep after the success
    assert(audit.map(_.ok) === Seq(false, false, true))
    assert(audit.map(_.attempt) === Seq(0, 1, 2))
    assert(audit.count(_.error.isDefined) === 2)
  }

  test("runWithRestarts: checkpoint resume is exactly-once across a mid-batch failure") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    input.addData(1L to 100L: _*)

    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt")
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val failOnce = new AtomicInteger(0)

    def start() = input.toDF().writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.as[Long].collect()
        // fail the FIRST delivery attempt after reading but before
        // acknowledging — the crash-mid-batch shape
        if (failOnce.getAndIncrement() == 0)
          throw new RuntimeException("sink crashed mid-batch")
        rows.foreach(delivered.add)
        ()
      }
      .start()

    val audit = TaskLifecycle.runWithRestarts(maxRestarts = 2)(start _)
    assert(audit.map(_.ok) === Seq(false, true))

    import scala.jdk.CollectionConverters._
    val got = delivered.asScala.toSeq.sorted
    assert(got === (1L to 100L), "restart must re-run the failed batch " +
      "exactly once — no loss, no duplicates")
  }

  test("runWithRestarts: exhausted restarts rethrow the last failure") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    input.addData(1L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt2")
    def start() = input.toDF().writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        throw new RuntimeException("permanent"); ()
      }
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      TaskLifecycle.runWithRestarts(maxRestarts = 1)(start _)
    }
    assert(e.getMessage.contains("permanent"))
  }
}
