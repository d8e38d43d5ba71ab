package graft

/** Plan-audit utility: prints the executed physical plan for the
  * named registry queries — the tool behind EXPLAIN.md's observed
  * column (args: sfDir queryName[,queryName...]).
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainMain <sfDir> <q1,q2,...>")
    val spark = Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-explain")
    args(1).split(",").foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, args(0))
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
