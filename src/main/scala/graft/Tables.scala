package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table catalog over the driver-generated parquet star schema
  * (TESTDATA.md). All graft operators take a `dir` (scale-factor
  * directory) and read through this catalog so scans stay columnar
  * parquet with full Catalyst pushdown.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read nanos as long and floor-divide to
    * micros — the same truncation DuckDB applies reading ns→µs — so
    * both engines see identical timestamps.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
