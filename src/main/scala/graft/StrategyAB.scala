package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Join-strategy A/B: runs each named query twice at one SF dir —
  * once on the plan Catalyst picks (at sf1 that is the SMJ-demoted
  * shape for the corpus-sized self-joins) and once with the broadcast
  * threshold raised so the joins plan the way the sf0.1 oracle runs
  * always executed them — and compares an order-insensitive EXACT
  * fingerprint (row count + sum of xxhash64 over all columns as
  * decimal(38,0)).
  *
  * Why this exists: the sf1 correctness replay (round 14) found that
  * several drift-set DuckDB oracles are themselves the quadratic
  * recompute (SRP/minhash pair joins in SQL) — at sf1 one such oracle
  * exceeded 25 minutes in DuckDB, so "replay through DuckDB" does not
  * bound. What the replay is FOR, though, is narrower: the oracle has
  * only ever checked these queries' results under the broadcast
  * plans, and sf1 executes sort-merge plans. This tool checks exactly
  * that equivalence — same engine, same query, both physical
  * strategies, bit-identical results — and prints each side's join
  * signature so a vacuous A/B (no actual strategy change) is visible.
  *
  * The fingerprint is exact, not tolerant: per-row values are
  * plan-order-independent (derived columns are row-local; aggregates
  * follow the engine's decimal-exact-then-cast discipline), so any
  * difference is a real result difference.
  *
  * Usage: runMain graft.StrategyAB <sfDir> <name[,name...]>
  */
object StrategyAB {
  private def joins(p: SparkPlan): Map[String, Int] =
    p.collect {
      case a: AdaptiveSparkPlanExec => joins(a.executedPlan).toSeq
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        joins(q.plan).toSeq
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        joins(s.relation.cachedPlan).toSeq
      case n if n.nodeName.contains("Join") => Seq(n.nodeName -> 1)
    }.flatten.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }

  private def fingerprint(df: DataFrame): (Long, java.math.BigDecimal, String) = {
    val h = xxhash64(df.columns.toSeq.map(col): _*).cast("decimal(38,0)")
    // the signature must come from the query that RAN: the base df's
    // own QueryExecution never executes here, so its AQE tree stays
    // the static initial plan and runtime re-planning (an SMJ→BHJ
    // demotion when actual sizes come in small) would be invisible —
    // exactly the vacuous-A/B blindness the signature exists to
    // expose. Reading the agg's executedPlan AFTER head() sees the
    // final adaptive plan (r14 advice).
    val agg = df.agg(count(lit(1)), sum(h))
    val r = agg.head()
    val sig = joins(agg.queryExecution.executedPlan)
      .toSeq.sorted.map { case (k, n) => s"${n}x$k" }.mkString("+")
    (r.getLong(0),
      Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO), sig)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val spark = Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-strategy-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val defaultThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    var bad = 0
    names.foreach { n =>
      CacheScope.releaseAll(); spark.catalog.clearCache()
      val natural = fingerprint(SparkEntry.queries(n)(spark, dir))
      CacheScope.releaseAll(); spark.catalog.clearCache()
      // 512 MB: far past every drift side at sf1 (tens of MB), far
      // under the 8 GB broadcast hard cap — restores the sf0.1 shapes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        String.valueOf(512L << 20))
      val forced =
        try fingerprint(SparkEntry.queries(n)(spark, dir))
        finally spark.conf.set(
          "spark.sql.autoBroadcastJoinThreshold", defaultThreshold)
      val ok = natural._1 == forced._1 && natural._2.compareTo(forced._2) == 0
      if (!ok) bad += 1
      println(s"${if (ok) "MATCH" else "MISMATCH"} $n rows=${natural._1}" +
        s"${if (ok) "" else s"/${forced._1}"} natural[${natural._3}] " +
        s"forced[${forced._3}]")
    }
    CacheScope.releaseAll()
    spark.stop()
    if (bad > 0) { Console.err.println(s"$bad mismatches"); sys.exit(1) }
  }
}
