package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4's co-location claim, proven: bucketing both fact tables
  * on the join key removes the shuffle from the join entirely — the
  * 100 TB trick for repeated fact-fact joins.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed fact-fact join plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    Tables.load(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("g_orders_b")
    Tables.load(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("g_lineitem_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("g_lineitem_b")
        .join(spark.table("g_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      // exactly ONE shuffle (the final groupBy) — the join itself is
      // shuffle-free because both sides are bucketed on the key
      assert(shuffles.length == 1)

      // same answer as the unbucketed join
      val expected = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    }
  }

  test("bucketed dedup index: batch ingest joins with a batch-side-only shuffle") {
    // Dedup.incrementalSummary's scale claim made concrete: the
    // standing fingerprint index is MAINTAINED bucketed by fp, so a
    // daily batch join shuffles ONLY the (small) batch side — the
    // index is read in place, bucket by bucket.
    spark.sql("DROP TABLE IF EXISTS g_dedup_index")
    import graft.functions.Portable
    val docs = Tables.load(spark, sf, "documents")
    val snapshot = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(Portable.normText(col("text"))).as("fp")).distinct()
    snapshot.write.bucketBy(8, "fp").sortBy("fp")
      .mode("overwrite").saveAsTable("g_dedup_index")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val batch = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), md5(Portable.normText(col("text"))).as("fp"))
      val dups = batch.join(spark.table("g_dedup_index"), Seq("fp"), "left_semi")
      val shuffles = dups.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      // exactly ONE shuffle, and it's the batch side: the index
      // contributes its bucketing as the join's distribution
      assert(shuffles.length == 1)
      // same rows as the unbucketed join
      val expected = batch
        .join(snapshot, Seq("fp"), "left_semi")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      val got = dups.select("doc_id").collect().map(_.getLong(0)).sorted
      // (sf0.001 plants no cross-parity dups, so both sides may be
      // empty — the assertion is the match, the plan check is above)
      assert(got.sameElements(expected))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS g_dedup_index")
    }
  }
}
