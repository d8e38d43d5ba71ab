package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[CacheScope.memoize]]'s epoch contract (r14 advice): a
  * compute in flight across a releaseAll must not leak its verdict
  * into the next scope, and a nested memoize inside a compute must be
  * legal (the old computeIfAbsent held the hash-bin lock for the
  * whole compute — a full Spark job — and deadlocked on recursion).
  */
class CacheScopeSpec extends AnyFunSuite {

  test("a compute spanning releaseAll cannot seed the next scope") {
    CacheScope.releaseAll()
    // the compute itself closes the scope before returning — the
    // worst-case interleaving of "releaseAll while a compute is in
    // flight", made deterministic
    val leaked = CacheScope.memoize("scope-race-key") {
      CacheScope.releaseAll()
      "stale"
    }
    assert(leaked == "stale") // the caller still gets ITS value
    val next = CacheScope.memoize("scope-race-key")("fresh")
    assert(next == "fresh",
      "the post-release insert carried into the new scope — epoch guard lost")
    CacheScope.releaseAll()
  }

  test("nested memoize inside a compute is legal") {
    CacheScope.releaseAll()
    val v = CacheScope.memoize("outer") {
      CacheScope.memoize("inner")(21) + 21
    }
    assert(v == 42)
    // both entries live and memoized within the scope
    assert(CacheScope.memoize("inner")(0) == 21)
    assert(CacheScope.memoize("outer")(0) == 42)
    CacheScope.releaseAll()
  }

  test("same scope memoizes, next scope recomputes") {
    CacheScope.releaseAll()
    var runs = 0
    def compute(): Int = { runs += 1; runs }
    assert(CacheScope.memoize("k")(compute()) == 1)
    assert(CacheScope.memoize("k")(compute()) == 1)
    CacheScope.releaseAll()
    assert(CacheScope.memoize("k")(compute()) == 2,
      "new scope must re-derive (staleness bound)")
    CacheScope.releaseAll()
  }
}
