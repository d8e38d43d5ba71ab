package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DMS-style table-validation report: after (or during) replication,
  * the source row set and the replicated target row set are compared
  * and each row lands in one validation state — matched, mismatched
  * (present on both sides, different content), missing on the target,
  * or extra on the target. Mirrors the table-validation surface of
  * the reference's replication engine (per-table validation state
  * counts an operator polls next to `describe_table_statistics`,
  * run.py:188-196's monitoring loop).
  *
  * Content comparison uses a caller-supplied integer-exact checksum
  * column (cents, counts, epoch micros — never raw doubles), so the
  * verdict is reproducible across engines and aggregation orders.
  *
  * Scale shape: ONE full-outer shuffle join on the primary key — the
  * same key partitioning the apply-changes path already uses, so at
  * 100 TB the validation pass rides the existing layout; states
  * reduce map-side into |groups| rows. No window, no collect.
  */
object Validation {

  /** @param checksum integer-exact per-row content checksum, present
    *                  under the same expression on both inputs
    * @param group     reporting dimension (table name, status, shard)
    */
  def report(
      source: DataFrame,
      target: DataFrame,
      key: String,
      group: String,
      checksum: Column): DataFrame = {
    val s = source.select(col(key).as("k_s"), col(group).as("g_s"),
      checksum.as("c_s"))
    val t = target.select(col(key).as("k_t"), col(group).as("g_t"),
      checksum.as("c_t"))
    s.join(t, col("k_s") === col("k_t"), "full_outer")
      .select(coalesce(col("g_s"), col("g_t")).as("g"),
        col("k_s"), col("k_t"), col("c_s"), col("c_t"))
      .groupBy(col("g").as(group))
      .agg(
        sum(when(col("k_s").isNotNull, 1L).otherwise(0L)).as("n_source"),
        sum(when(col("k_t").isNotNull, 1L).otherwise(0L)).as("n_target"),
        sum(when(col("k_s").isNotNull && col("k_t").isNotNull &&
          col("c_s") === col("c_t"), 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("k_s").isNotNull && col("k_t").isNotNull &&
          col("c_s") =!= col("c_t"), 1L).otherwise(0L)).as("n_mismatched"),
        sum(when(col("k_t").isNull, 1L).otherwise(0L)).as("n_missing_target"),
        sum(when(col("k_s").isNull, 1L).otherwise(0L)).as("n_extra_target"))
  }
}
