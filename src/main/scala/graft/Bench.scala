package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the SF dir from
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Protocol (order-independent by construction):
  *  - A warm-up pass (one tiny query touching parquet + a shuffle)
  *    runs before any timing so session/codegen warm-up isn't
  *    attributed to whichever query happens to run first.
  *  - Before EVERY timed run, all caches are dropped
  *    (CacheScope.releaseAll + catalog.clearCache), so no query ever
  *    benefits from a sibling's cached intermediate — per-query
  *    numbers do not depend on execution order.
  *  - Each query runs `Reps` times cold-cache; the headline number is
  *    the minimum (first rep additionally pays one-off JIT/codegen
  *    for that plan shape; the min is the reproducible steady-state
  *    cold-cache cost). All rep times are published under "runs".
  */
object Bench {
  val Reps = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-bench")
    // warm-up: session, codegen, parquet reader, one shuffle
    Tables.load(spark, sfDir, "events")
      .groupBy("event_type").count().collect()
    val runs = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to Reps).map { _ =>
        CacheScope.releaseAll()
        spark.catalog.clearCache()
        // settle GC debt from the previous run so its collection
        // cost isn't attributed to this one's wall time
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    CacheScope.releaseAll()
    val results = runs.map { case (k, ts) => k -> ts.min }
    // Locale.ROOT: the f-interpolator uses the JVM default locale, which
    // on comma-decimal locales would emit "value":52,035 — invalid JSON.
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val detail = runs.map { case (k, ts) =>
      s"\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Two lines: full per-rep detail first, then the compact headline
    // line LAST. The harness that collects this output keeps only the
    // final ~2000 characters, so the headline line is kept short
    // (3-decimal values, no per-rep detail) and printed last so it
    // survives truncation intact and machine-parseable. If the query
    // surface ever grows the headline past the safety budget (the
    // window also has to fit sbt's trailing "[success]" line), fall
    // back to appending a total-only line that is guaranteed to fit.
    val headline =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val detailLine =
      s"""{"metric":"detail","runs":$detail,"reps":$Reps,"sf":"$sfDir"}"""
    println(detailLine)
    // The retained-stdout tail (~2000 chars) can no longer hold an
    // 84-query headline at ANY precision, so the full per-query
    // numbers are also persisted as a repo artifact every run —
    // stdout truncation can cost the per-query map but never the data.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (detailLine + "\n" + headline + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // read-only CWD: stdout still has it
    if (headline.length <= 1800) println(headline)
    else {
      // Middle tier before surrendering the per-query map: 2-decimal
      // values shave ~1 char/query, usually enough to refit the
      // growing surface inside the retained-tail window.
      def fmt2(d: Double): String =
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
      val qs2 = results.map { case (k, v) => s"\"" + k + "\":" + fmt2(v) }
        .mkString("{", ",", "}")
      val headline2 =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs2,"sf":"$sfDir"}"""
      if (headline2.length <= 1900) {
        Console.err.println(
          s"[bench] headline is ${headline.length} chars (>1800 budget); " +
            "emitting the 2-decimal variant as the final line")
        println(headline2)
      } else {
        Console.err.println(
          s"[bench] headline is ${headline.length} chars (>1800 budget); " +
            "emitting a total-only final line so truncation cannot split it")
        println(headline)
        println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{},"sf":"$sfDir"}""")
      }
    }
    spark.stop()
  }
}
