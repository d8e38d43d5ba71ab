package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the `CacheScope.lazyPersist` reuse contract for the two
  * single-shuffle set-overlap operators (VERDICT r7 design caveat):
  * their scale shape is ONE corpus scan + ONE shuffle ONLY IF both
  * consumers (the totals broadcast and the pair fan-out) read the
  * persisted per-key set relation from the cache. A plan reorder
  * that stopped hitting the cache would stay correct but silently
  * re-scan (and re-shuffle) the corpus per consumer — this spec
  * makes that failure loud.
  */
class CacheReuseSpec extends AnyFunSuite {
  import SparkTestSession._

  private def inMemoryScans(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    "InMemoryTableScan".r.findAllIn(plan).length
  }

  test("events_cooccurrence: both consumers read the persisted per-user sets") {
    CacheScope.releaseAll()
    val df = SparkEntry.queries("events_cooccurrence")(spark, sf)
    assert(CacheScope.activeCount >= 1, "lazyPersist handle not registered")
    val scans = inMemoryScans(df)
    assert(scans >= 2,
      s"expected >=2 InMemoryTableScan consumers of the per-user set relation, got $scans")
    CacheScope.releaseAll()
  }

  test("corpus_source_overlap: both consumers read the persisted shingle sets") {
    CacheScope.releaseAll()
    val df = SparkEntry.queries("corpus_source_overlap")(spark, sf)
    assert(CacheScope.activeCount >= 1, "lazyPersist handle not registered")
    val scans = inMemoryScans(df)
    assert(scans >= 2,
      s"expected >=2 InMemoryTableScan consumers of the shingle set relation, got $scans")
    CacheScope.releaseAll()
  }

  test("events_churn: head and buckets read the persisted per-user relation") {
    CacheScope.releaseAll()
    val df = SparkEntry.queries("events_churn")(spark, sf)
    assert(CacheScope.activeCount >= 1, "lazyPersist handle not registered")
    // without the persist, column pruning specializes the head
    // branch's partial aggregate and ReuseExchange can't dedupe —
    // the feed would be scanned twice (measured)
    val scans = inMemoryScans(df)
    assert(scans >= 2,
      s"expected >=2 InMemoryTableScan consumers of the per-user relation, got $scans")
    CacheScope.releaseAll()
  }
}
