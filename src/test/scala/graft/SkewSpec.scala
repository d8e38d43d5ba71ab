package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Dedup

/** SURVEY §4 claims the LSH candidate join survives hot buckets via
  * AQE skew handling — this spec exercises that claim instead of
  * assuming it: a pathological bucket (1000 identical boilerplate
  * docs ⇒ every band hashes them to ONE bucket) runs through the
  * real shingle→signature→band→candidate pipeline with the skew
  * thresholds scaled down to test size, and the FINAL adaptive plan
  * is read back for the skew=true split marker.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Throwable => None })
    }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pathological LSH bucket: AQE splits the skewed candidate join") {
    import spark.implicits._
    val n = 1000
    // identical text ⇒ identical signature ⇒ all docs share every
    // band bucket: the worst legal input for the candidate self-join
    val docs = (0 until n)
      .map(i => (i.toLong,
        "common boilerplate header repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
    withConfs(
      // force the sort-merge path (the skewed plan shape at scale —
      // locally the tiny side would broadcast and hide the skew)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // scale the skew thresholds to test-sized bytes
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      val buckets =
        Dedup.bandBuckets(Dedup.minhashSignatures(Dedup.shingles(docs)))
      val pairs = Dedup.candidatePairs(buckets)
      val agg = pairs.groupBy().count()
      val rows = agg.collect()
      // every unordered doc pair is a candidate, exactly once
      assert(rows(0).getLong(0) === n.toLong * (n - 1) / 2)
      // the FINAL adaptive plan must carry the skew-split marker on
      // the candidate join — completion alone could mean one straggler
      // task chewed the hot bucket serially
      val finalPlan = agg.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew=true in the final adaptive plan:\n$finalPlan")
    }
  }

  test("skew split divides the hot bucket's runtime reads across tasks") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import spark.implicits._
    // Runtime evidence, not just the plan marker: with the skew split
    // ON, no single task may read the whole hot bucket's shuffle
    // output — max per-task shuffle-read bytes must drop well below
    // the skew-OFF run, and more tasks must participate. This is the
    // partition-size half of the 100 TB claim (the marker alone could
    // coexist with one straggler chewing the bucket serially).
    val n = 1000
    val docs = (0 until n)
      .map(i => (i.toLong,
        "common boilerplate header repeated verbatim across the corpus"))
      .toDF("doc_id", "text")

    final class ShuffleStats extends SparkListener {
      @volatile var maxRead = 0L
      @volatile var readerTasks = 0
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.totalBytesRead
          if (r > maxRead) maxRead = r
          if (r > 0) readerTasks += 1
        }
      }
    }

    def run(skewOn: Boolean): (Long, Int) = {
      val stats = new ShuffleStats
      spark.sparkContext.addSparkListener(stats)
      try withConfs(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> skewOn.toString,
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> skewOn.toString) {
        // the RAW bucket self-join, no downstream distinct: the only
        // big shuffle read in the query is the SMJ's input — exactly
        // the read the skew split divides. (candidatePairs' distinct
        // would add a pair-sized exchange identical in both runs,
        // drowning the signal.)
        val buckets = Dedup.bandBuckets(
          Dedup.minhashSignatures(Dedup.shingles(docs)))
        val a = buckets.toDF("ida", "band", "bh")
        val b = buckets.toDF("idb", "band_b", "bh_b")
        val joined = a.join(b,
          col("band") === col("band_b") && col("bh") === col("bh_b") &&
            col("ida") < col("idb"))
        // identical docs ⇒ every band holds ALL n docs in one bucket
        assert(joined.count() ==
          Dedup.Bands.toLong * n * (n - 1) / 2)
        // listener bus is async — give the tail task events a moment
        Thread.sleep(1500)
        (stats.maxRead, stats.readerTasks)
      } finally spark.sparkContext.removeSparkListener(stats)
    }

    val (maxOff, tasksOff) = run(skewOn = false)
    val (maxOn, tasksOn) = run(skewOn = true)
    assert(maxOn * 2 <= maxOff,
      s"skew split did not divide the hot bucket: max task read " +
        s"$maxOn bytes with split vs $maxOff without")
    assert(tasksOn > tasksOff,
      s"skew split did not widen participation: $tasksOn reader tasks " +
        s"with split vs $tasksOff without")
  }

  test("skewed pipeline result matches the unskewed run exactly") {
    import spark.implicits._
    // mixed corpus: one hot bucket + distinct background docs; the
    // skew split must not duplicate or drop candidate pairs
    val docs = ((0 until 200).map(i => (i.toLong,
        "common boilerplate header repeated verbatim across the corpus")) ++
      (200 until 260).map(i => (i.toLong,
        s"zq$i xw${i * 3} vv${i * 7} kk${i * 11} mm${i * 13} jj${i * 17}")))
      .toDF("doc_id", "text")
    def run(): Set[(Long, Long)] =
      Dedup.candidatePairs(
          Dedup.bandBuckets(Dedup.minhashSignatures(Dedup.shingles(docs))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val skewed = withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")(run())
    val plain = run()
    assert(skewed === plain)
    // every hot-bucket pair is present (background docs may or may
    // not add band collisions — equality above is the strict check)
    assert(skewed.size >= 200 * 199 / 2)
  }
}
