package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeFeed, TableMapping}

/** SURVEY §4's pushdown claim, proven: when the change stream lands
  * partitioned by table, a selection rule's predicate prunes whole
  * partition directories — an `a%` task never reads bytes of
  * non-matching tables.
  */
class PruningSpec extends AnyFunSuite {
  import SparkTestSession._

  test("selection rules prune table partitions at the scan") {
    val dir = Files.createTempDirectory("graft-prune").toString
    ChangeFeed.fromEvents(spark, sf)
      .write.partitionBy("table_name").parquet(s"$dir/feed")

    val m = TableMapping.Mapping(Seq(
      TableMapping.SelectionRule("%", "users_1")))
    // AQE off so the pre-built plan object is the one executed and
    // its scan metrics are readable afterwards
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val feed = spark.read.parquet(s"$dir/feed")
        .filter(m.predicate(lit("graft"), col("table_name")))

      // the physical plan carries a partition filter…
      val plan = feed.queryExecution.executedPlan.toString()
      assert(plan.contains("PartitionFilters") && plan.contains("users_1"))

      // …and after execution the scan reports having read only the
      // matching partition's files (inputFiles is pre-pruning, so the
      // post-execution numFiles metric is the honest measure)
      val expected = ChangeFeed.fromEvents(spark, sf)
        .filter(col("table_name") === "users_1").count()
      assert(feed.collect().length == expected)
      val scan = feed.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
      val readFiles = scan.metrics("numFiles").value
      val allFiles = spark.read.parquet(s"$dir/feed").inputFiles.length
      assert(readFiles > 0 && readFiles < allFiles)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
