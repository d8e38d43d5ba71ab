package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property checks for cdc.Validation: for arbitrary source/target
  * row sets — duplicate keys, null keys, null checksums included —
  * the report's states partition each side's key set and every
  * counter matches a driver-side digest recompute.
  */
object ValidationProps extends Properties("graft.validation") {
  private lazy val spark = SparkTestSession.spark

  private val row: Gen[(Option[Long], String, Option[Long])] = for {
    k <- Gen.frequency(9 -> Gen.chooseNum(0L, 6L).map(Option(_)),
      1 -> Gen.const(None: Option[Long]))
    g <- Gen.oneOf("a", "b")
    c <- Gen.frequency(8 -> Gen.chooseNum(-5L, 5L).map(Option(_)),
      2 -> Gen.const(None: Option[Long]))
  } yield (k, g, c)

  private val rows: Gen[List[(Option[Long], String, Option[Long])]] =
    Gen.listOfN(12, row)

  private type Digest = (Long, Long, Option[Long], Option[Long], Option[Long])
  private def digest(
      rs: Seq[(Option[Long], String, Option[Long])]): Map[Option[Long], Digest] =
    rs.groupBy(_._1).view.mapValues { g =>
      val cs = g.flatMap(_._3)
      (g.size.toLong, cs.size.toLong,
        if (cs.isEmpty) None else Some(cs.sum),
        cs.minOption, cs.maxOption)
    }.toMap

  property("states partition keys and match a driver digest recompute") =
    Prop.forAll(rows, rows) { (src, tgt) =>
      import spark.implicits._
      val report = cdc.Validation.report(
        src.toDF("k", "g", "c"), tgt.toDF("k", "g", "c"),
        "k", "g", col("c")).collect()
      val ds = digest(src)
      val dt = digest(tgt)
      val nMatched = ds.keySet.intersect(dt.keySet)
        .count(k => ds(k) == dt(k)).toLong
      val nMismatched = ds.keySet.intersect(dt.keySet)
        .count(k => ds(k) != dt(k)).toLong
      val nMissing = (ds.keySet -- dt.keySet).size.toLong
      val nExtra = (dt.keySet -- ds.keySet).size.toLong
      val sums = Map(
        "n_source" -> ds.size.toLong, "n_target" -> dt.size.toLong,
        "n_matched" -> nMatched, "n_mismatched" -> nMismatched,
        "n_missing_target" -> nMissing, "n_extra_target" -> nExtra)
      val got = sums.keys.map(c =>
        c -> report.map(_.getAs[Long](c)).sum).toMap
      val partitions = report.forall { r =>
        r.getAs[Long]("n_matched") + r.getAs[Long]("n_mismatched") +
          r.getAs[Long]("n_missing_target") == r.getAs[Long]("n_source") &&
        r.getAs[Long]("n_matched") + r.getAs[Long]("n_mismatched") +
          r.getAs[Long]("n_extra_target") == r.getAs[Long]("n_target")
      }
      Prop(got == sums) :| s"counters: got $got expected $sums" &&
        Prop(partitions) :| "states must partition each side's keys"
    }
}
