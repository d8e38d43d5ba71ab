package graft

import org.apache.spark.sql.SparkSession

/** The one SparkSession recipe shared by every driver-contract main
  * (Verify, Bench, ExplainAudit): local[cpus], matching shuffle
  * width, UTC, GraftExtensions, Tables.sessionConf reader flags. A
  * single definition — Bench must time exactly the session Verify
  * validates.
  */
object Sessions {
  def build(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = Tables.sessionConf.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        // Static conf, sized to the full query surface: the default
        // 100-entry codegen cache cannot hold the suite's several
        // hundred WholeStageCodegen units, so any workload that
        // cycles through the whole registry (Bench pass-major reps,
        // Verify) recompiles every generated class on every pass —
        // measured +7 s / +13% suite-wide at sf0.1 (BASELINE.md
        // "Measurement hygiene").
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
