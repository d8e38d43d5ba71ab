package graft

/** Prints the sorted query registry, one name per line, with a
  * second column saying whether the name has a DuckDB oracle
  * ("sql") or is rows-only ("rows"). No SparkSession is built —
  * the registry map is pure data, so this is the cheap machine-
  * readable source of truth for tools/ scripts (explain_check,
  * bench_names) that must not drift from SparkEntry.
  */
object Names {
  def main(args: Array[String]): Unit = {
    val oracles = SparkEntry.oracleSql.keySet
    SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      println(s"$n\t${if (oracles(n)) "sql" else "rows"}")
    }
  }
}
