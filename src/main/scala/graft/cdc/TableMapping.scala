package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DMS-style table-mapping selection rules (reference:
  * dms_sample/stack.py:103-180 — selection rules with SQL-LIKE
  * wildcards over (schema-name, table-name), rule-action
  * include/exclude; the reference tasks use "a%" and exact "novels").
  *
  * Rules compile to a single Catalyst `Column` predicate, so when the
  * change stream (or a partitioned source) carries schema/table
  * columns the selection is pushed into the scan — an `a%` task never
  * reads bytes of non-matching tables.
  */
object TableMapping {
  sealed trait Action
  case object Include extends Action
  case object Exclude extends Action

  /** One selection rule; patterns use SQL LIKE wildcards (% and _). */
  case class SelectionRule(
      schemaPattern: String,
      tablePattern: String,
      action: Action = Include)

  case class Mapping(rules: Seq[SelectionRule]) {

    /** DMS semantics: a table is replicated iff it matches at least
      * one include rule and no exclude rule.
      */
    def predicate(schemaCol: Column, tableCol: Column): Column = {
      def matches(r: SelectionRule): Column =
        schemaCol.like(r.schemaPattern) && tableCol.like(r.tablePattern)
      val included = rules.filter(_.action == Include)
        .map(matches).reduceOption(_ || _).getOrElse(lit(false))
      val excluded = rules.filter(_.action == Exclude)
        .map(matches).reduceOption(_ || _).getOrElse(lit(false))
      included && !excluded
    }

    /** Driver-side selection over a (tiny) static catalog — used by
      * full-load task planning, mirroring how DMS enumerates tables
      * from information_schema before a full load.
      */
    def selectTables(catalog: Seq[(String, String)]): Seq[(String, String)] =
      catalog.filter { case (s, t) => matchesPlain(s, t) }

    private def matchesPlain(schema: String, table: String): Boolean = {
      // Mirrors Column.like semantics including its default backslash
      // escape: \% \_ \\ match the literal characters, and — like
      // Spark's pattern parser — any other escape (backslash before a
      // plain character, or a trailing backslash) is REJECTED rather
      // than silently matched as a literal, so full-load planning and
      // the stream predicate can never disagree on the same rule set.
      def likeMatch(pat: String, v: String): Boolean = {
        val rx = new StringBuilder
        var i = 0
        while (i < pat.length) {
          pat.charAt(i) match {
            case '\\' =>
              if (i + 1 >= pat.length)
                throw new IllegalArgumentException(
                  s"invalid LIKE pattern '$pat': trailing escape")
              val n = pat.charAt(i + 1)
              if (n != '%' && n != '_' && n != '\\')
                throw new IllegalArgumentException(
                  s"invalid LIKE pattern '$pat': escape before '$n'")
              rx ++= java.util.regex.Pattern.quote(n.toString)
              i += 1
            case '%' => rx ++= ".*"
            case '_' => rx += '.'
            case c => rx ++= java.util.regex.Pattern.quote(c.toString)
          }
          i += 1
        }
        v.matches(rx.toString)
      }
      val inc = rules.exists(r => r.action == Include &&
        likeMatch(r.schemaPattern, schema) && likeMatch(r.tablePattern, table))
      val exc = rules.exists(r => r.action == Exclude &&
        likeMatch(r.schemaPattern, schema) && likeMatch(r.tablePattern, table))
      inc && !exc
    }
  }

  // --- transformation rules ---------------------------------------

  /** DMS-style transformation rules (rule-type "transformation" in a
    * table-mapping document: rename table, add/remove column with an
    * expression). They operate on the multiplexed change feed:
    * table renames rewrite the routing column, column rules reshape
    * the payload. All are pure projections — Catalyst folds them into
    * the surrounding plan, nothing materializes.
    */
  sealed trait TransformRule
  /** Exact-name table rename (DMS rename-to targets one table). */
  case class RenameTable(from: String, to: String) extends TransformRule
  case class RenameColumn(from: String, to: String) extends TransformRule
  case class AddColumn(name: String, value: Column) extends TransformRule
  case class RemoveColumn(name: String) extends TransformRule

  case class Transformations(rules: Seq[TransformRule]) {
    def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      rules.foldLeft(df) {
        case (d, RenameTable(from, to)) =>
          d.withColumn("table_name",
            when(col("table_name") === from, to).otherwise(col("table_name")))
        case (d, RenameColumn(from, to)) => d.withColumnRenamed(from, to)
        case (d, AddColumn(name, value)) => d.withColumn(name, value)
        case (d, RemoveColumn(name)) => d.drop(name)
      }
  }

  /** SQL LIKE → predicate for the same pattern in the DuckDB oracle.
    * Single quotes in patterns are doubled so a quote in a rule can't
    * break (or inject into) the generated SQL. An explicit
    * `ESCAPE '\'` rides every LIKE: Spark's Column.like treats
    * backslash as the escape by default, DuckDB only with the clause
    * — without it an escaped-wildcard pattern (`100\%`) matches
    * differently on the two engines.
    */
  def duckPredicate(rules: Seq[SelectionRule], schemaExpr: String, tableExpr: String): String = {
    def q(p: String) = p.replace("'", "''")
    def m(r: SelectionRule) =
      s"($schemaExpr LIKE '${q(r.schemaPattern)}' ESCAPE '\\' AND " +
        s"$tableExpr LIKE '${q(r.tablePattern)}' ESCAPE '\\')"
    val inc = rules.filter(_.action == Include).map(m) match {
      case Nil => "FALSE"; case xs => xs.mkString("(", " OR ", ")")
    }
    val exc = rules.filter(_.action == Exclude).map(m) match {
      case Nil => "FALSE"; case xs => xs.mkString("(", " OR ", ")")
    }
    s"$inc AND NOT $exc"
  }
}
