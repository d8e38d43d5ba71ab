package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit over materialized state — the check a
  * replication consumer runs after apply, because full-load task
  * ordering and CDC races routinely land child rows whose parent is
  * missing (the reference schema declares exactly this shape:
  * `FOREIGN KEY (author_id) REFERENCES authors(author_id)`,
  * lib/query.py:51, and DMS docs tell users to drop/disable FK
  * constraints during load — so the target DB no longer enforces
  * them and an audit has to).
  *
  * Semantics follow SQL FK rules: a NULL child key is NOT an orphan
  * (MATCH SIMPLE), an orphan is a non-null child key with no parent
  * row. Output per constraint: child rows, null-FK rows, orphan
  * rows, distinct orphan keys.
  *
  * Scale shape: the parent side reduces to DISTINCT keys first (a
  * key-only shuffle — at 100 TB the parent's payload columns never
  * move), then ONE left equi-join child→parent-keys and a map-side
  * partially-aggregated rollup to a single row per constraint.
  * Unlike the forget-keys deletion list, parent key sets (customer,
  * orders) GROW with the data, so there is deliberately no broadcast
  * hint — AQE broadcasts small parents at small SF and falls back to
  * a co-partitioned shuffle at scale (a forced hint would OOM the
  * driver; see SURVEY §4).
  */
object FkAudit {

  /** Audit one FK constraint; returns exactly one row. */
  def audit(
      name: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("_present", lit(true))
    val keys = child.select(col(childKey))
    // Null child keys never enter the join: a nulled/disabled-FK load
    // (the very scenario this audit exists for) can be null-heavy,
    // and equality-joining nulls hashes every one of them to a single
    // shuffle partition — a straggler no matching row will ever pay
    // off. They are counted in a map-only pre-aggregate instead; the
    // join shuffles only keys that can match.
    // count(when), NOT sum(when): sum over an EMPTY aggregate input
    // is NULL, and the non-null key relation is empty exactly in the
    // null-heavy disabled-FK load this audit exists for — the report
    // must say 0 orphans, not NULL
    val base = keys.agg(
      count(lit(1)).as("child_rows"),
      count(when(col(childKey).isNull, lit(1))).as("null_fk_rows"))
    val orphan = col("_present").isNull
    val joined = keys.filter(col(childKey).isNotNull)
      .join(pk, Seq(childKey), "left")
      .agg(
        count(when(orphan, lit(1))).as("orphan_rows"),
        countDistinct(when(orphan, col(childKey))).as("orphan_keys"))
    // two single-row aggregates — the 1-row-broadcast idiom, same
    // shape as the global-threshold queries
    base.crossJoin(broadcast(joined))
      .select(lit(name).as("constraint_name"), col("child_rows"),
        col("null_fk_rows"), col("orphan_rows"), col("orphan_keys"))
  }

  /** Audit a set of constraints: one output row each. Constraints are
    * independent jobs unioned together — Spark runs the per-constraint
    * joins as separate stages, nothing cross-joins.
    */
  def report(
      constraints: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(constraints.nonEmpty, "FkAudit.report needs at least one constraint")
    constraints.map { case (n, c, ck, p, pk) => audit(n, c, ck, p, pk) }
      .reduce(_ unionByName _)
  }
}
