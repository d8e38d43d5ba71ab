package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range join: `point ∈ [lo, hi]` without a key.
  *
  * Spark plans a raw `t BETWEEN lo AND hi` join as a nested-loop
  * (broadcast or Cartesian) — fine for tiny interval sets, fatal when
  * both sides are large. The scale path quantizes the time axis:
  * each interval explodes to the buckets it overlaps, each point maps to
  * exactly one bucket, and the join becomes a hash equi-join on the
  * bucket id with the exact `BETWEEN` as a residual filter. Work is
  * O(points + Σ interval-span/width) with shuffle keyed on bucket —
  * no pairwise blow-up, AQE-skew-splittable, and the bucket width is
  * the single tuning knob (≈ median interval length keeps the
  * fan-out per interval at ~2 rows).
  *
  * Both columns are epoch-micros longs (callers convert timestamps
  * via `unix_micros`) so bucket arithmetic is exact integer division
  * — no engine-specific timestamp rounding at bucket boundaries.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` whose
    * `[lo, hi]` (inclusive both ends) contains its `t`.
    *
    * @param points      left side; `tCol` must be a long (epoch us)
    * @param intervals   right side; `loCol`/`hiCol` longs (epoch us)
    * @param bucketUs    bucket width in microseconds
    */
  def pointInInterval(
      points: DataFrame, tCol: Column,
      intervals: DataFrame, loCol: Column, hiCol: Column,
      bucketUs: Long): DataFrame = {
    val w = lit(bucketUs)
    // floorDiv semantics for potentially-negative epochs: Spark's
    // integral `div` truncates toward zero, so shift is avoided by
    // using pmod-corrected floor division
    def fdiv(c: Column): Column =
      ((c - pmod(c, w)) / w).cast("long")
    // inverted intervals (hi < lo) must match NOTHING — without the
    // guard, sequence(start, stop) steps -1 and one corrupt row
    // explodes ~|lo-hi|/bucketUs bucket rows (OOM-scale for epoch
    // sentinels) before the residual filter could discard them
    val iv = intervals
      .filter(loCol <= hiCol)
      .withColumn("__bucket",
        explode(sequence(fdiv(loCol), fdiv(hiCol))))
    val pt = points.withColumn("__bucket", fdiv(tCol))
    pt.join(iv, "__bucket")
      .filter(tCol >= loCol && tCol <= hiCol)
      .drop("__bucket")
  }
}
