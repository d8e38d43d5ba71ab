package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Apply-time exception channel (reference behavior: the CDC apply
  * flow creates `apply_dms_exception` control tables, run.py:296-297
  * — a dead-letter table for change events that fail to apply).
  *
  * graft models it as a rule-driven split over the annotated change
  * feed: each rule names a violation predicate (null key, cast
  * failure on a drifted type, domain breach); rows violating any rule
  * are routed to an exception envelope carrying the rule name and the
  * original payload, rows passing all rules flow on to apply.
  *
  * Scale shape: both sides are plain filters/projections over ONE
  * scan of the feed — no shuffle, no UDFs; the per-row rule
  * evaluation is codegen'd column math. A row violating k rules emits
  * k exception rows (each names its rule), via one higher-order
  * filter over a literal-sized array — never a rows×rules explode of
  * passing rows.
  */
object Exceptions {

  /** One validation rule: `violation` is TRUE when the row FAILS.
    * A null predicate result (e.g. a comparison over a null column)
    * counts as NOT violated — rows must never vanish from both sides
    * of the split, so the ambiguity resolves toward "apply".
    */
  case class Rule(name: String, violation: Column) {
    def violated: Column = coalesce(violation, lit(false))
  }

  /** The exception feed: one row per (change row, violated rule),
    * with the original row preserved as a JSON payload — the
    * dead-letter table a replication task writes next to the target.
    */
  def exceptions(
      changes: DataFrame,
      rules: Seq[Rule],
      payloadCols: Seq[String]): DataFrame = {
    val flagged = array(rules.map(r =>
      when(r.violated, lit(r.name)).otherwise(lit(null))): _*)
    changes
      .withColumn("rule", explode(filter(flagged, _.isNotNull)))
      .select(col("schema_name"), col("table_name"), col("rule"),
        col("ts"), col("event_id"),
        to_json(struct(payloadCols.map(col): _*),
          Map("ignoreNullFields" -> "false")).as("payload"))
  }

  /** The rows that apply cleanly: violate no rule. An empty rule set
    * passes everything.
    */
  def valid(changes: DataFrame, rules: Seq[Rule]): DataFrame =
    changes.filter(!rules.map(_.violated).foldLeft(lit(false))(_ || _))
}
