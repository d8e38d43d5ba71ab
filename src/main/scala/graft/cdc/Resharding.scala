package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Shard-split (resharding) treatment for the Kinesis-like feed.
  *
  * The reference consumes a SINGLE shard with TRIM_HORIZON
  * (run.py:170-182: one ShardId, count-based waits) — fine at demo
  * scope, but a 100 TB/day stream reshards: Kinesis SplitShard cuts
  * one shard's hash-key range at a midpoint into two child shards;
  * the parent CLOSES (receives nothing after the cutover) and
  * consumers finish the parent then move to the children. This
  * module models exactly that: hash-RANGE sharding (each shard owns
  * a contiguous slice of the 60-bit portable-hash space — unlike
  * [[ChangeFeed.withShard]]'s modulo assignment, a range can be
  * split without remapping every other shard), a split event at a
  * cutover timestamp, and the per-shard count-continuity audit a
  * consumer runs to prove the handoff lost nothing:
  * the closed parent's post-cutover count must be 0, and the
  * children's post-cutover counts partition the parent's hash range.
  *
  * Scale shape: routing is a map-only expression over the key hash
  * (two shifts and a comparison — codegen'd, no lookup table), the
  * count rollup partially aggregates to |shards| rows map-side, and
  * the static lineage relation (|shards|+2 rows) joins broadcast.
  */
object Resharding {

  /** Hash-range shard id: the top log2(nShards) bits of the 60-bit
    * portable key hash. `nShards` must be a power of two (so ranges
    * halve cleanly on split — the Kinesis midpoint convention).
    */
  def rangeShard(key: Column, nShards: Int): Column = {
    val bits = rangeBits(nShards)
    shiftright(Portable.pHash(key), bits)
  }

  private def rangeBits(nShards: Int): Int = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two, got $nShards")
    60 - java.lang.Integer.numberOfTrailingZeros(nShards)
  }

  /** Route an event to its shard in a layout where `splitShard` was
    * split at `cutover`: before the cutover the original nShards
    * layout applies; after it, events in the split shard's range go
    * to child `nShards` (lower half) or `nShards+1` (upper half) —
    * the next bit of the hash picks the half. Every other shard is
    * untouched (the whole point of range sharding).
    */
  def routeWithSplit(
      key: Column, ts: Column, nShards: Int, splitShard: Int,
      cutover: Column): Column = {
    require(splitShard >= 0 && splitShard < nShards,
      s"splitShard must be in [0, $nShards), got $splitShard — " +
        "auditing a split of a shard outside the layout would report " +
        "zero-count children for a shard that doesn't exist")
    val bits = rangeBits(nShards)
    val h = Portable.pHash(key)
    val parent = shiftright(h, bits)
    val child = lit(nShards.toLong) + pmod(shiftright(h, bits - 1), lit(2L))
    when(ts < cutover, parent)
      .when(parent === splitShard.toLong, child)
      .otherwise(parent)
  }

  /** Per-shard split audit: one row per shard in the FINAL layout
    * (originals with parent_shard = -1, the two children with
    * parent_shard = splitShard), with pre- and post-cutover event
    * counts, plus one fixed `shard_id = -1` row counting events whose
    * routing key is NULL (routable to no shard — zero on a healthy
    * feed, and the row every "nothing lost" total must include).
    * Continuity is visible in the data: the closed parent's
    * `n_after` is 0, and the children's `n_after` sum to the
    * post-cutover traffic of the parent's hash range — the audit a
    * consumer checks before retiring the parent iterator.
    * `ts` names the event-time column (default `ts`).
    */
  def splitAudit(
      events: DataFrame, key: Column, nShards: Int, splitShard: Int,
      cutover: Column, ts: Column = col("ts")): DataFrame = {
    val spark = events.sparkSession
    // null routing keys hash to a null shard_id (pHash is
    // null-in/null-out) — route them to the explicit -1 row below
    // instead: a left join from the real-shard layout would DROP the
    // null-count row and the audit would claim "nothing lost" while
    // null-key events vanished from the report
    val routed = events.select(
      coalesce(
        routeWithSplit(key, ts, nShards, splitShard, cutover), lit(-1L))
        .as("shard_id"),
      when(ts < cutover, 1L).otherwise(0L).as("bef"))
    val counts = routed.groupBy(col("shard_id"))
      .agg(sum(col("bef")).as("n_before"),
        sum(lit(1L) - col("bef")).as("n_after"))
    val layout = spark.createDataFrame(
        Seq((-1L, -1L)) ++ // null-key events: routable to no shard
          (0 until nShards).map(i => (i.toLong, -1L)) ++
          Seq((nShards.toLong, splitShard.toLong),
            ((nShards + 1).toLong, splitShard.toLong)))
      .toDF("shard_id", "parent_shard")
    // both sides are tiny (|shards|+2 static rows vs a |shards|-row
    // post-aggregate); the outer side of a left join can't broadcast,
    // so let AQE broadcast the aggregated right side
    layout.join(counts, Seq("shard_id"), "left")
      .select(col("shard_id"), col("parent_shard"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
  }
}
