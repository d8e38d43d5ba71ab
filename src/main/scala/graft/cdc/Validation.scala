package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DMS-style table-validation report: after (or during) replication,
  * the source row set and the replicated target row set are compared
  * and each KEY lands in one validation state — matched, mismatched
  * (present on both sides, different content), missing on the target,
  * or extra on the target. Mirrors the table-validation surface of
  * the reference's replication engine (per-table validation state
  * counts an operator polls next to `describe_table_statistics`,
  * run.py:188-196's monitoring loop).
  *
  * Robustness contract (each the kind of corruption validation
  * exists to catch, so none may distort the report):
  *  - DUPLICATE KEYS: each side pre-aggregates to one digest row per
  *    key (row count + checksum count/sum/min/max), so a key written
  *    twice by a replication bug reports as MISMATCHED instead of
  *    fanning out through the join and inflating every counter.
  *  - NULL CHECKSUMS: digest fields compare null-safely (`<=>`), so
  *    a null checksum is content like any other — never a row that
  *    silently lands in no state.
  *  - NULL KEYS: the join is null-safe on the key and presence is
  *    carried by explicit side markers, so null-key rows compare as
  *    one ordinary key group instead of being double-counted as both
  *    missing and extra.
  * Checksum sums accumulate in DECIMAL(38,0) — exact and
  * overflow-free whatever the per-key row count.
  *
  * Scale shape: one map-side-combinable aggregate per side, then ONE
  * full-outer shuffle join on the key — the same key partitioning
  * the apply-changes path already uses (the digest aggregate and the
  * join co-partition); states reduce map-side into |groups| rows.
  * No window, no collect.
  */
object Validation {

  private def digest(
      df: DataFrame, key: String, group: String, checksum: Column,
      suffix: String): DataFrame =
    df.select(col(key).as("k"), col(group).as("g"), checksum.as("c"))
      .groupBy(col("k"))
      .agg(max(col("g")).as("g"),
        count(lit(1)).as("cnt"),
        count(col("c")).as("c_cnt"),
        sum(col("c").cast("decimal(38,0)")).as("c_sum"),
        min(col("c")).as("c_min"),
        max(col("c")).as("c_max"))
      .withColumn("present", lit(true))
      .toDF(Seq("k", "g", "cnt", "c_cnt", "c_sum", "c_min", "c_max",
        "present").map(_ + suffix): _*)

  /** @param checksum integer-exact per-row content checksum, present
    *                  under the same expression on both inputs
    * @param group     reporting dimension (table name, status, shard).
    *                  Must be FUNCTIONALLY DEPENDENT on `key` and
    *                  replicated consistently: a key's group collapses
    *                  to max(g) per side and the report attributes the
    *                  key to coalesce(source, target) — rows of one
    *                  key disagreeing on group (or a group value that
    *                  itself drifted between sides) are misattributed
    *                  to one group's counts, not split
    */
  def report(
      source: DataFrame,
      target: DataFrame,
      key: String,
      group: String,
      checksum: Column): DataFrame = {
    val s = digest(source, key, group, checksum, "_s")
    val t = digest(target, key, group, checksum, "_t")
    val both = coalesce(col("present_s"), lit(false)) &&
      coalesce(col("present_t"), lit(false))
    val contentEqual = col("cnt_s") === col("cnt_t") &&
      col("c_cnt_s") === col("c_cnt_t") &&
      (col("c_sum_s") <=> col("c_sum_t")) &&
      (col("c_min_s") <=> col("c_min_t")) &&
      (col("c_max_s") <=> col("c_max_t"))
    s.join(t, col("k_s") <=> col("k_t"), "full_outer")
      .select(coalesce(col("g_s"), col("g_t")).as("g"),
        coalesce(col("present_s"), lit(false)).as("in_s"),
        coalesce(col("present_t"), lit(false)).as("in_t"),
        (both && contentEqual).as("is_match"),
        (both && !contentEqual).as("is_mismatch"))
      .groupBy(col("g").as(group))
      .agg(
        sum(when(col("in_s"), 1L).otherwise(0L)).as("n_source"),
        sum(when(col("in_t"), 1L).otherwise(0L)).as("n_target"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("is_mismatch"), 1L).otherwise(0L)).as("n_mismatched"),
        sum(when(col("in_s") && !col("in_t"), 1L).otherwise(0L))
          .as("n_missing_target"),
        sum(when(col("in_t") && !col("in_s"), 1L).otherwise(0L))
          .as("n_extra_target"))
  }
}
