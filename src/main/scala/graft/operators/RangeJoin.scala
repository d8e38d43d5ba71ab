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
    * @param maxFanOut   per-interval bucket-row cap: an interval
    *                    spanning more buckets (an open-ended "no
    *                    expiry" sentinel hi, a mis-tuned width) fails
    *                    the query with an attributable error instead
    *                    of materializing a crash-scale sequence —
    *                    the inversion filter below only covers
    *                    hi < lo, not wide-but-valid
    */
  def pointInInterval(
      points: DataFrame, tCol: Column,
      intervals: DataFrame, loCol: Column, hiCol: Column,
      bucketUs: Long, maxFanOut: Long = 1L << 20): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val w = lit(bucketUs)
    // floorDiv semantics for potentially-negative epochs, computed in
    // TRUE integer division (IntegralDivide): a double `/` is only
    // exact below 2^53 and an epoch sentinel near Long.MaxValue would
    // round up and overflow the ANSI cast. The pmod correction makes
    // the numerator exactly divisible, so truncation direction is
    // moot.
    def fdiv(c: Column): Column = {
      import org.apache.spark.sql.graft.ExpressionBridge
      val num = c - pmod(c, w)
      ExpressionBridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          ExpressionBridge.expression(num), ExpressionBridge.expression(w)))
    }
    // inverted intervals (hi < lo) must match NOTHING — without the
    // guard, sequence(start, stop) steps -1 and one corrupt row
    // explodes ~|lo-hi|/bucketUs bucket rows (OOM-scale for epoch
    // sentinels) before the residual filter could discard them
    val lob = fdiv(loCol)
    val hib = when(fdiv(hiCol) - fdiv(loCol) < lit(maxFanOut), fdiv(hiCol))
      .otherwise(raise_error(concat(
        lit(s"range-join interval spans >= $maxFanOut buckets of " +
          s"$bucketUs us (lo="), loCol, lit(", hi="), hiCol,
        lit(") — widen bucketUs or clamp open-ended intervals"))))
    val iv = intervals
      .filter(loCol <= hiCol)
      .withColumn("__bucket", explode(sequence(lob, hib)))
    val pt = points.withColumn("__bucket", fdiv(tCol))
    pt.join(iv, "__bucket")
      .filter(tCol >= loCol && tCol <= hiCol)
      .drop("__bucket")
  }
}
