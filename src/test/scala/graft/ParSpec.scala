package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.Par is the §2.6 overlap primitive under several operators'
  * eager builds (kmeansElbow's k-sweep, annFrontier's phases, the
  * walk/pcos pair, hybridRrf's rankers) — pin the contract those call
  * sites rely on: result order matches thunk order (results must be
  * position-addressable), every thunk settles before a failure is
  * rethrown (no job left mutating CacheScope after the caller
  * unwinds), and the rethrown failure is the ORIGINAL cause, not an
  * ExecutionException wrapper (error behavior must match the serial
  * build the concurrency replaced).
  */
class ParSpec extends AnyFunSuite {

  test("results come back in thunk order, not completion order") {
    val out = Par.run[Int](Seq(
      () => { Thread.sleep(80); 1 },
      () => { Thread.sleep(20); 2 },
      () => 3))
    assert(out == Seq(1, 2, 3))
  }

  test("single thunk runs on the calling thread (no pool)") {
    val caller = Thread.currentThread()
    val ran = Par.run[Boolean](Seq(() => Thread.currentThread() eq caller))
    assert(ran == Seq(true))
  }

  test("a failing thunk rethrows its ORIGINAL cause after all settle") {
    val slowDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val boom = new IllegalStateException("boom")
    val e = intercept[IllegalStateException] {
      Par.run[Int](Seq(
        () => throw boom,
        () => { Thread.sleep(100); slowDone.set(true); 2 }))
    }
    assert(e eq boom, "cause must be unwrapped, not ExecutionException")
    assert(slowDone.get(), "siblings must settle before the rethrow")
  }

  test("first failure wins when several thunks fail") {
    val e = intercept[RuntimeException] {
      Par.run[Int](Seq(
        () => throw new RuntimeException("first"),
        () => throw new RuntimeException("second")))
    }
    assert(e.getMessage == "first")
  }

  test("run2 pairs heterogeneous results positionally") {
    val (a, b) = Par.run2(() => "left", () => 42)
    assert(a == "left" && b == 42)
  }

  test("nested run does not deadlock (pool-per-call)") {
    val out = Par.run[Seq[Int]](Seq(
      () => Par.run[Int](Seq(() => 1, () => 2)),
      () => Par.run[Int](Seq(() => 3, () => 4))))
    assert(out == Seq(Seq(1, 2), Seq(3, 4)))
  }
}
