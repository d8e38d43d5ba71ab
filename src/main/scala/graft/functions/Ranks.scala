package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact per-group ranking without per-group
  * single-partition windows.
  *
  * A `row_number() OVER (PARTITION BY g ORDER BY v)` forces every
  * row of a group onto ONE task — the classic scale cliff when a
  * group holds billions of rows (one event_type, or the single
  * global group of an NTILE plan). The two-phase scheme instead:
  *
  *  1. range-partitions by (group ++ order) — the distributed total
  *     sort Spark already knows how to do at any scale;
  *  2. ranks rows per (physical partition, group) — a local window
  *     whose state is one counter;
  *  3. computes each (partition, group)'s start offset from a
  *     |partitions|·|groups|-row side relation (per-slice counts,
  *     prefix-summed per group over the partition id) joined back
  *     broadcast.
  *
  * The only cross-row windows run over that tiny offsets relation,
  * never over the data. Ties are broken by the caller's order
  * columns, which must form a total order within each group for the
  * rank to be deterministic under retries.
  *
  * Used by `corpus_shuffle` (the original inline form),
  * `cdc_full_load_ranges` (single global group), and the
  * `events_rfm` / `events_gini` per-group rank plans.
  */
object Ranks {

  /** Adds `rank` (1-based within group, ordered by `orderCols`
    * ascending) and `grp_total` (group row count) to `df`.
    * `groupCols` may be empty for a single global group.
    */
  def grouped(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val gc = groupCols.map(col)
    // materialized: range partitioning samples its bounds, so the
    // offsets pass and the rank pass must read ONE computed
    // partitioning, not two re-samples that could bucket rows
    // differently
    val ranged = graft.CacheScope.materialize(df
      .repartitionByRange(n, (groupCols ++ orderCols).map(col): _*)
      .withColumn("_rk_pid", spark_partition_id()))
    val byGroup = Window.partitionBy(gc: _*)
    val offs = ranged.groupBy(col("_rk_pid") +: gc: _*)
      .agg(count(lit(1)).as("_rk_cnt"))
      .withColumn("_rk_off",
        coalesce(sum(col("_rk_cnt")).over(byGroup.orderBy(col("_rk_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("grp_total", sum(col("_rk_cnt")).over(byGroup))
      .select(col("_rk_pid") +: (gc :+ col("_rk_off") :+ col("grp_total")): _*)
    val wp = Window.partitionBy(col("_rk_pid") +: gc: _*)
      .orderBy(orderCols.map(col): _*)
    ranged.join(broadcast(offs), "_rk_pid" +: groupCols)
      .withColumn("rank", col("_rk_off") + row_number().over(wp))
      .drop("_rk_pid", "_rk_off")
  }

  /** [[grouped]] PLUS the exclusive per-group running sum of
    * `valueCol` over the same order, from the SAME single range
    * exchange — for cumulative-coverage shapes (rank a vocabulary by
    * frequency AND accumulate the mass it covers) that would
    * otherwise pay two range sorts through [[grouped]] +
    * [[prefixSum]]. Adds `rank`, `grp_total` (group row count),
    * `prefix_sum` (exclusive running sum of `valueCol`, 0 for the
    * first row), and `grp_value_total` (the group's full `valueCol`
    * sum — the coverage denominator, free from the same offsets
    * relation). Same contract as [[grouped]]: the only cross-row
    * windows run over the |partitions|·|groups| offsets relation,
    * and `orderCols` must totally order each group.
    */
  def groupedWithSum(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val gc = groupCols.map(col)
    val ranged = graft.CacheScope.materialize(df
      .repartitionByRange(n, (groupCols ++ orderCols).map(col): _*)
      .withColumn("_rk_pid", spark_partition_id()))
    val byGroup = Window.partitionBy(gc: _*)
    val prior = byGroup.orderBy(col("_rk_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged.groupBy(col("_rk_pid") +: gc: _*)
      .agg(count(lit(1)).as("_rk_cnt"), sum(col(valueCol)).as("_rk_vsum"))
      .withColumn("_rk_off",
        coalesce(sum(col("_rk_cnt")).over(prior), lit(0L)))
      .withColumn("_rk_voff",
        coalesce(sum(col("_rk_vsum")).over(prior), lit(0L)))
      .withColumn("grp_total", sum(col("_rk_cnt")).over(byGroup))
      .withColumn("grp_value_total", sum(col("_rk_vsum")).over(byGroup))
      .select(col("_rk_pid") +: (gc :+ col("_rk_off") :+ col("_rk_voff")
        :+ col("grp_total") :+ col("grp_value_total")): _*)
    val wp = Window.partitionBy(col("_rk_pid") +: gc: _*)
      .orderBy(orderCols.map(col): _*)
    ranged.join(broadcast(offs), "_rk_pid" +: groupCols)
      .withColumn("rank", col("_rk_off") + row_number().over(wp))
      .withColumn("prefix_sum", col("_rk_voff") +
        coalesce(sum(col(valueCol))
          .over(wp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_rk_pid", "_rk_off", "_rk_voff")
  }

  /** Exclusive running maximum of `valueCol` (a numeric column) over
    * the global `orderCols` ascending order — NULL for the first
    * row(s). The scan-shaped sibling of [[grouped]]: a naive
    * `max() OVER (ORDER BY ...)` collapses to one partition, so the
    * prefix is computed two-phase — per-partition running max inside
    * the range partitioning, plus each partition's incoming maximum
    * from the tiny per-partition-maxima relation, prefix-maxed over
    * the partition id and joined back broadcast.
    *
    * The order should be total if the caller attaches per-row
    * meaning to the prefix; for monotone uses (dominance tests,
    * high-water marks) value ties across equal order keys are
    * already harmless.
    */
  def prefixMax(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = graft.CacheScope.materialize(df
      .repartitionByRange(n, orderCols.map(col): _*)
      .withColumn("_pm_pid", spark_partition_id()))
    val incoming = ranged.groupBy(col("_pm_pid"))
      .agg(max(col(valueCol)).as("_pm_max"))
      .withColumn("_pm_inc",
        max(col("_pm_max")).over(Window.orderBy(col("_pm_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_pm_pid"), col("_pm_inc"))
    val local = Window.partitionBy(col("_pm_pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(incoming), "_pm_pid")
      .withColumn("prefix_max",
        greatest(max(col(valueCol)).over(local), col("_pm_inc")))
      .drop("_pm_pid", "_pm_inc")
  }

  /** EXCLUSIVE running sum of `valueCol` (a long column) over the
    * global `orderCols` ascending order — 0 for the first row(s).
    * Same two-phase shape as [[prefixMax]]: per-partition exclusive
    * running sum inside the range partitioning, plus the partition's
    * incoming offset from the |partitions|-row per-partition-sums
    * relation, exclusive-prefix-summed over the partition id and
    * joined back broadcast. A naive `sum() OVER (ORDER BY ...)`
    * collapses the relation to one task.
    *
    * `orderCols` must be a total order for the per-row prefix to be
    * deterministic under retries (budget cuts attach meaning to
    * every row's prefix, unlike [[prefixMax]]'s monotone uses).
    */
  def prefixSum(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = graft.CacheScope.materialize(df
      .repartitionByRange(n, orderCols.map(col): _*)
      .withColumn("_ps_pid", spark_partition_id()))
    val incoming = ranged.groupBy(col("_ps_pid"))
      .agg(sum(col(valueCol)).as("_ps_sum"))
      .withColumn("_ps_inc",
        coalesce(sum(col("_ps_sum")).over(Window.orderBy(col("_ps_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_ps_pid"), col("_ps_inc"))
    val local = Window.partitionBy(col("_ps_pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(incoming), "_ps_pid")
      .withColumn("prefix_sum",
        coalesce(sum(col(valueCol)).over(local), lit(0L)) + col("_ps_inc"))
      .drop("_ps_pid", "_ps_inc")
  }

  /** SQL NTILE(n) over a precomputed 1-based `rank` within a group
    * of `total` rows: the first `total % n` tiles take
    * ceil(total/n) rows, the rest floor(total/n). Pure arithmetic —
    * pairs with [[grouped]] to express NTILE without the
    * single-partition global window. Integer `div` throughout; the
    * CASE branches short-circuit, so the small-tile branch's
    * `div (total div n)` never evaluates when total < n.
    */
  def ntileExpr(rank: String, total: String, n: Int): String =
    s"""1 + CASE
       |  WHEN $rank <= (($total div $n) + 1) * ($total % $n)
       |  THEN ($rank - 1) div (($total div $n) + 1)
       |  ELSE ($total % $n) +
       |    ($rank - (($total div $n) + 1) * ($total % $n) - 1)
       |      div ($total div $n)
       |END""".stripMargin
}
