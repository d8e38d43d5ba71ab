package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Resharding

class ReshardingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val cutover = lit("2024-01-15 00:00:00")

  test("split audit holds the handoff continuity invariants") {
    val ev = Tables.load(spark, sf, "events")
    val rows = Resharding.splitAudit(ev, col("user_id").cast("string"),
        nShards = 4, splitShard = 1, cutover)
      .orderBy(col("shard_id")).collect()
    // -1 is the fixed null-routing-key row (zero on this feed)
    assert(rows.map(_.getAs[Long]("shard_id")).toSeq === (-1L to 5L))
    assert(rows.map(_.getAs[Long]("parent_shard")).toSeq ===
      Seq(-1L, -1L, -1L, -1L, -1L, 1L, 1L))
    assert(rows.head.getAs[Long]("n_before") === 0L &&
      rows.head.getAs[Long]("n_after") === 0L)
    val byShard = rows.map(r =>
      r.getAs[Long]("shard_id") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"))).toMap
    // the closed parent receives NOTHING after the cutover
    assert(byShard(1L)._2 === 0L)
    // children did not exist before the cutover
    assert(byShard(4L)._1 === 0L)
    assert(byShard(5L)._1 === 0L)
    // nothing lost: shard counts partition the feed
    val total = byShard.values.map(p => p._1 + p._2).sum
    assert(total === ev.count())
    // children's traffic IS the parent range's post-cutover traffic
    val parentRangeAfter = ev
      .filter(col("ts") >= cutover)
      .filter(Resharding.rangeShard(col("user_id").cast("string"), 4) === 1)
      .count()
    assert(byShard(4L)._2 + byShard(5L)._2 === parentRangeAfter)
    assert(parentRangeAfter > 0L) // the split actually exercised
  }

  test("null routing keys land in the -1 audit row, not dropped") {
    import spark.implicits._
    val ev = Seq(
      (Option("u1"), "2024-01-10 00:00:00"),
      (Option.empty[String], "2024-01-01 00:00:00"),
      (Option.empty[String], "2024-01-20 00:00:00"))
      .toDF("k", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val rows = Resharding.splitAudit(ev, col("k"), nShards = 4,
        splitShard = 1, cutover)
      .collect()
      .map(r => r.getAs[Long]("shard_id") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"))).toMap
    assert(rows(-1L) === ((1L, 1L)))
    // nothing lost: the -1 row keeps the totals honest
    assert(rows.values.map(p => p._1 + p._2).sum === 3L)
  }

  test("untouched shards route identically before and after the split") {
    val ev = Tables.load(spark, sf, "events")
    val moved = ev.filter(
        Resharding.rangeShard(col("user_id").cast("string"), 4) =!= 1)
      .filter(
        Resharding.routeWithSplit(col("user_id").cast("string"), col("ts"),
          4, 1, cutover) =!=
          Resharding.rangeShard(col("user_id").cast("string"), 4))
      .count()
    assert(moved === 0L)
  }

  test("non-power-of-two layouts are rejected") {
    intercept[IllegalArgumentException] {
      Resharding.rangeShard(lit("x"), 3)
    }
  }
}
