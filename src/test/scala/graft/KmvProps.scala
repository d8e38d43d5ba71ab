package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.functions.{KmvBuffer, KmvSketch}

/** Property checks for the native KMV distinct-count aggregate: the
  * bounded-buffer kth-smallest must equal the relational order
  * statistic it replaces, whatever the partitioning (which varies the
  * update/merge/serialize split), and the buffer itself must be a
  * pure function of the input SET — insertion order, duplicates, and
  * merge grouping can't show through, or map-side partials would
  * change the answer.
  */
object KmvProps extends Properties("graft.kmv") {
  private lazy val spark = SparkTestSession.spark

  private val hashes: Gen[List[(Int, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 3),
      // small value space on purpose: forces duplicate hashes, the
      // case where TreeSet dedup vs multiset semantics diverge
      Gen.chooseNum(0L, 40L)))

  private def kthDistinct(vs: Seq[Long], k: Int): Option[Long] = {
    val d = vs.distinct.sorted
    if (d.size >= k) Some(d(k - 1)) else None
  }

  property("kmv_kth == kth-smallest distinct under any partitioning") =
    Prop.forAll(hashes, Gen.chooseNum(1, 6), Gen.chooseNum(1, 7)) {
      (data, k, parts) =>
        import spark.implicits._
        val df = data.toDF("g", "h").repartition(parts, col("g"), col("h"))
        val got = df.groupBy(col("g"))
          .agg(KmvSketch.kmvKth(col("h"), k).as("kth"))
          .collect()
          .map(r => r.getAs[Int]("g") ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val expect = data.groupBy(_._1).view
          .mapValues(rows => kthDistinct(rows.map(_._2), k)).toMap
        got == expect
    }

  property("KmvBuffer is an order-free bounded set function") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)),
      Gen.chooseNum(1, 8), Gen.long) { (vs, k, seed) =>
      val a = new KmvBuffer(k)
      vs.foreach(a.insert)
      val b = new KmvBuffer(k)
      new scala.util.Random(seed).shuffle(vs).foreach(b.insert)
      val expect = vs.distinct.sorted.take(k)
      import scala.jdk.CollectionConverters._
      a.set.size <= k &&
        a.set.asScala.toList.map(Long.unbox) == expect &&
        b.set.asScala.toList.map(Long.unbox) == expect
    }
}
