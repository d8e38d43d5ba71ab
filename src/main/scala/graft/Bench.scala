package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the SF dir from
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A warm-up pass (one
  * tiny query touching parquet + a shuffle) runs before any timing so
  * JVM/Spark session warm-up isn't attributed to whichever query
  * happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.sessionConf.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: session, codegen, parquet reader, one shuffle
    Tables.load(spark, sfDir, "events")
      .groupBy("event_type").count().collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      // settle GC debt from the previous query so its collection
      // cost isn't attributed to this one's wall time
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
