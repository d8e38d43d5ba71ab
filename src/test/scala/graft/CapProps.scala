package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.ml.Dedup

/** Property checks for the per-bucket candidate cap against an
  * INDEPENDENT plain-Scala reference (java MessageDigest md5, not
  * the engine's Catalyst expression) — the same independent-reference
  * discipline as the rest of the ScalaCheck layer: a shared-formula
  * bug in the portable hash or the window order cannot hide here.
  */
object CapProps extends Properties("graft.cap") {
  private lazy val spark = SparkTestSession.spark

  /** Plain-Scala twin of Portable.pHash: first 15 hex chars of the
    * md5 digest as a non-negative long.
    */
  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Reference selection: per bucket, keep the `cap` members lowest
    * in (md5("id:band:bh"), id) order.
    */
  private def refKept(
      rows: Seq[(Long, Long, Long)], cap: Int): Set[(Long, Long, Long)] =
    rows.groupBy { case (_, band, bh) => (band, bh) }
      .values.flatMap { members =>
        members.sortBy { case (id, band, bh) =>
          (refHash(s"$id:$band:$bh"), id)
        }.take(cap)
      }.toSet

  private val bucketRows: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 30L)
      band <- Gen.chooseNum(0L, 2L)
      bh <- Gen.chooseNum(0L, 3L)
    } yield (id, band, bh))
  } yield rows.distinct

  property("capBucketMembers keeps exactly the reference selection") =
    Prop.forAll(bucketRows, Gen.chooseNum(2, 8)) { (rows, cap) =>
      import spark.implicits._
      val got = Dedup.capBucketMembers(
          rows.toDF("doc_id", "band", "bh"),
          "doc_id", Seq("band", "bh"), cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == refKept(rows, cap)
    }

  property("capCensus arithmetic matches a plain fold over bucket sizes") =
    Prop.forAll(bucketRows, Gen.chooseNum(2, 8)) { (rows, cap) =>
      import spark.implicits._
      val got = Dedup.capCensus(rows.toDF("doc_id", "band", "bh"),
          "doc_id", Seq("band", "bh"), cap)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      val ref = rows.groupBy(_._2).map { case (band, rs) =>
        val sizes = rs.groupBy(_._3).values.map(_.size.toLong).toSeq
        val kept = sizes.map(m => math.min(m, cap.toLong))
        band -> (
          sizes.size.toLong,
          sizes.count(_ > cap).toLong,
          sizes.sum,
          sizes.zip(kept).map { case (m, k) => m - k }.sum,
          sizes.map(m => m * (m - 1) / 2).sum,
          kept.map(k => k * (k - 1) / 2).sum)
      }
      got == ref
    }

  property("kept members always form a subset closed under the cap order") =
    Prop.forAll(bucketRows, Gen.chooseNum(2, 8)) { (rows, cap) =>
      // dropping a member implies every member ranked after it in the
      // same bucket is dropped too (the selection is a prefix)
      import spark.implicits._
      val kept = Dedup.capBucketMembers(
          rows.toDF("doc_id", "band", "bh"),
          "doc_id", Seq("band", "bh"), cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      rows.groupBy { case (_, b, h) => (b, h) }.values.forall { members =>
        val order = members.sortBy { case (id, b, h) =>
          (refHash(s"$id:$b:$h"), id)
        }
        val flags = order.map(kept.contains)
        // all true up to some point, then all false
        !flags.sliding(2).exists(w => w.length == 2 && !w.head && w(1))
      }
    }
}
