package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.cdc.{TableMapping, TableStatistics}

/** Property checks for cdc.TableStatistics.taskStatistics: for
  * arbitrary feeds, catalogs, and include/exclude rule sets, the
  * task-scoped statistics equal a driver-side fold — every
  * rule-selected catalog table appears exactly once per selecting
  * task (all-zero when silent, the DMS contract), no unselected
  * table appears, and each count column equals the feed's per-table
  * op census. Pins the Spark join path and the driver-side
  * `selectTables` rule evaluation to one another.
  */
object TaskStatsProps extends Properties("graft.taskstats") {
  private lazy val spark = SparkTestSession.spark

  private val tables = Vector("alpha", "amber", "beta", "gamma", "novels")

  private val ev: Gen[(String, String)] = for {
    t <- Gen.oneOf(tables)
    op <- Gen.frequency(3 -> Gen.const("insert"), 3 -> Gen.const("update"),
      1 -> Gen.const("delete"), 1 -> Gen.const("load"),
      1 -> Gen.const("alter-table"))
  } yield (t, op)

  // rule patterns over the synthetic names: exact, prefix-wildcard,
  // and the match-everything pattern, as include or exclude
  private val rule: Gen[TableMapping.SelectionRule] = for {
    pat <- Gen.oneOf("alpha", "amber", "beta", "gamma", "novels",
      "a%", "be%", "%")
    act <- Gen.frequency(3 -> Gen.const(TableMapping.Include),
      1 -> Gen.const(TableMapping.Exclude))
  } yield TableMapping.SelectionRule("graft", pat, act)

  private val task: Gen[TableMapping.Mapping] =
    Gen.nonEmptyListOf(rule).map(rs => TableMapping.Mapping(rs.take(4)))

  private def matches(pat: String, v: String): Boolean =
    if (pat.endsWith("%")) v.startsWith(pat.dropRight(1)) else v == pat

  private def selected(m: TableMapping.Mapping): Set[String] =
    tables.filter { t =>
      m.rules.exists(r => r.action == TableMapping.Include &&
        matches(r.tablePattern, t)) &&
      !m.rules.exists(r => r.action == TableMapping.Exclude &&
        matches(r.tablePattern, t))
    }.toSet

  property("task rows = driver-selected tables; counts = per-table op census") =
    Prop.forAll(Gen.listOf(ev), task, task) { (evs, mA, mB) =>
      import spark.implicits._
      val feed = evs.map { case (t, op) => ("graft", t, op) }
        .toDF("schema_name", "table_name", "op")
      val catalog = tables.map(t => ("graft", t))
      val out = TableStatistics.taskStatistics(feed,
        Seq("tA" -> mA, "tB" -> mB), catalog).collect()

      val expectTables = Map("tA" -> selected(mA), "tB" -> selected(mB))
      val census = evs.groupBy(_._1)
      def opCount(t: String, p: String => Boolean): Long =
        census.getOrElse(t, Nil).count(e => p(e._2)).toLong

      val rowsMatch = out.groupBy(_.getString(0)).forall { case (task, rs) =>
        rs.map(_.getString(2)).toSet == expectTables(task) &&
          rs.length == expectTables(task).size
      } && out.length ==
        expectTables.values.map(_.size).sum

      val countsMatch = out.forall { r =>
        val t = r.getString(2)
        r.getAs[Long]("inserts") == opCount(t, _ == "insert") &&
        r.getAs[Long]("updates") == opCount(t, _ == "update") &&
        r.getAs[Long]("deletes") == opCount(t, _ == "delete") &&
        r.getAs[Long]("ddls") == opCount(t,
          Set("create-table", "drop-table", "alter-table")) &&
        r.getAs[Long]("full_load_rows") == opCount(t, _ == "load") &&
        r.getAs[Long]("total") == opCount(t, _ => true)
      }
      Prop(rowsMatch && countsMatch) :| out.mkString("; ")
    }
}
