package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.FkAudit

class FkAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  test("complete parent set yields zero orphans") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val r = FkAudit.audit("fk", orders, "o_custkey", customer, "c_custkey")
      .collect()(0)
    assert(r.getAs[Long]("child_rows") === orders.count())
    assert(r.getAs[Long]("null_fk_rows") === 0L)
    assert(r.getAs[Long]("orphan_rows") === 0L)
    assert(r.getAs[Long]("orphan_keys") === 0L)
  }

  test("planted orphans and null FKs are counted per SQL MATCH SIMPLE") {
    import spark.implicits._
    // child keys: 1,2 ok; null not an orphan; 5 orphaned twice (one
    // distinct key); 9 orphaned once
    val child = Seq(Some(1L), Some(2L), None, Some(5L), Some(5L), Some(9L))
      .toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = FkAudit.audit("fk", child, "k", parent, "pk").collect()(0)
    assert(r.getAs[Long]("child_rows") === 6L)
    assert(r.getAs[Long]("null_fk_rows") === 1L)
    assert(r.getAs[Long]("orphan_rows") === 3L)
    assert(r.getAs[Long]("orphan_keys") === 2L)
  }

  test("report emits one row per constraint, constraint-labelled") {
    import spark.implicits._
    val child = Seq(1L, 7L).toDF("k")
    val parent = Seq(1L).toDF("pk")
    val rows = FkAudit.report(Seq(
        ("a_fk", child, "k", parent, "pk"),
        ("b_fk", child, "k", child, "k")))
      .orderBy(col("constraint_name")).collect()
    assert(rows.map(_.getAs[String]("constraint_name")).toSeq ===
      Seq("a_fk", "b_fk"))
    assert(rows(0).getAs[Long]("orphan_rows") === 1L)
    // self-reference: every key is its own parent — no orphans
    assert(rows(1).getAs[Long]("orphan_rows") === 0L)
  }

  test("stream file roundtrip equals the batch-computed summary") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rt-spec-").toString
    val got = streaming.CdcPipeline.fileRoundtrip(spark, sf, root)
      .orderBy(col("operation")).collect()
    val want = cdc.ChangeFeed.fromEvents(spark, sf)
      .filter(col("user_id") % 4 === 0)
      .groupBy(lit("data").as("record_type"), col("op").as("operation"),
        col("table_name"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_user_id"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy(col("operation")).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
