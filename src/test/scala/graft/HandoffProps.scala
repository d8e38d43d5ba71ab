package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.cdc.Handoff
import graft.ml.Vectors

/** Property checks for the full-load → CDC cutover merge: on
  * ARBITRARY feeds (random keys, positions scattered before/inside/
  * after the load window, random op mix), the position merge must
  * reproduce the full-feed latest-wins fold exactly (`n_mismatch` =
  * 0 — the exactly-once claim as a law, not an example), the seam
  * cohorts must partition the key space, and the double-delivery
  * count must equal a plain-Scala recount of the cached window.
  * Case count is small: every case runs the full audit (a cached
  * per-key aggregate + two rollups).
  */
object HandoffProps extends Properties("graft.handoff") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val SnapStart = "2024-06-01 00:00:00"
  private val WindowSec = 3600
  private val startMs = Timestamp.valueOf(SnapStart).getTime

  /** Driver twin of Handoff.readTs (same portable hash). */
  private def readTsMs(uid: Long): Long =
    startMs + (Vectors.jvmPHash(uid.toString) % WindowSec) * 1000L

  private val ops = Gen.frequency(3 -> "insert", 4 -> "update", 2 -> "delete")

  // (key, secondOffset from snapStart - 2h) -> op; unique (key, ts)
  // by Map construction, event ids assigned from the offset so the
  // (ts, event_id) order is the offset order
  private val feedGen: Gen[Map[(Long, Int), String]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.zip(Gen.chooseNum(0L, 6L), Gen.chooseNum(0, 4 * WindowSec)), ops))
      .map(_.toMap)

  /** The single-table audit row as a name→count map; a feed whose
    * seam is empty (e.g. only a pre-window delete) legitimately
    * yields ZERO audit rows — modeled as all-zero counts.
    */
  private def audit(rows: Map[(Long, Int), String]): Map[String, Long] = {
    import spark.implicits._
    val df = rows.toSeq.map { case ((k, off), op) =>
      (k, op, new Timestamp(startMs - 2 * WindowSec * 1000L + off * 1000L),
        off.toLong, off.toDouble)
    }.toDF("user_id", "op", "ts", "event_id", "value")
      .withColumn("table_name", lit("t"))
    val out = Handoff.snapshotHandoff(df, SnapStart, WindowSec).collect()
    out.headOption match {
      case Some(r) => r.schema.fieldNames.filter(_ != "table_name")
        .map(n => n -> r.getAs[Long](n)).toMap
      case None => Map.empty.withDefaultValue(0L)
    }
  }

  property("exactly-once: n_mismatch = 0 on arbitrary feeds") =
    Prop.forAll(feedGen) { rows =>
      rows.isEmpty || audit(rows)("n_mismatch") == 0L
    }

  property("cohorts partition the key space; final state matches the fold") =
    Prop.forAll(feedGen) { rows =>
      val a = audit(rows)
      def g(n: String): Long = a.getOrElse(n, 0L)

      // plain-Scala full-feed fold: latest (by offset) op per key
      val latest = rows.groupBy(_._1._1).view
        .mapValues(_.toSeq.maxBy(_._1._2)).toMap
      val liveKeys = latest.collect {
        case (k, (_, op)) if op != "delete" => k
      }.toSet

      // keys visible at the seam: any event in the snapshot range
      // (<= read position, latest not delete) or in the CDC range
      val eventsOf = rows.groupBy(_._1._1)
      val tsOf = (k: Long, off: Int) =>
        startMs - 2 * WindowSec * 1000L + off * 1000L
      val snapKeys = eventsOf.keySet.filter { k =>
        val pre = eventsOf(k).filter { case ((_, off), _) =>
          tsOf(k, off) <= readTsMs(k) }
        pre.nonEmpty && pre.toSeq.maxBy(_._1._2)._2 != "delete"
      }
      val cdcCount = rows.count { case ((k, off), _) => tsOf(k, off) > startMs }
      val cachedCount = rows.count { case ((k, off), _) =>
        tsOf(k, off) > startMs && tsOf(k, off) <= readTsMs(k) }

      (g("n_final_keys") == liveKeys.size.toLong) :| "final vs fold" &&
      (g("n_snapshot_keys") == snapKeys.size.toLong) :| "snapshot keys" &&
      (g("n_cdc_events") == cdcCount.toLong) :| "cdc volume" &&
      (g("n_double_delivered") == cachedCount.toLong) :| "cached window" &&
      (g("n_unchanged_keys") + g("n_cached_only_keys") +
        g("n_overridden_keys") == g("n_snapshot_keys")) :| "snap cohorts" &&
      (g("n_final_keys") + g("n_deleted_keys") ==
        g("n_snapshot_keys") + g("n_cdc_new_keys")) :| "key conservation"
    }
}
