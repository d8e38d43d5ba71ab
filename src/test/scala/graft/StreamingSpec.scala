package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeFeed
import graft.streaming.CdcPipeline
import graft.streaming.CdcPipeline.{Change, RawEvent}

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private val batch1 = Seq(
    RawEvent(1, ts(0), 10, "signup", 1.0, "{}"),
    RawEvent(2, ts(1), 10, "click", 2.0, "{}"),
    RawEvent(3, ts(0), 11, "signup", 3.0, "{}"))
  private val batch2 = Seq(
    RawEvent(4, ts(2), 10, "purchase", 4.0, "{}"),
    RawEvent(5, ts(3), 11, "error", 0.0, "{}"), // delete user 11
    RawEvent(6, ts(1), 11, "click", 9.0, "{}")) // late, pre-delete: ignored

  test("streaming latest-wins materialization matches the batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[RawEvent]
    val states = CdcPipeline.applyChangesStream(
      CdcPipeline.annotate(mem.toDF()))
    val q = states.writeStream.format("memory")
      .queryName("mat").outputMode("update").start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
      // latest state per key from the update-mode sink
      val got = spark.table("mat")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("table_name", "user_id")
            .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1 && !col("deleted"))
        .select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().toSet

      // batch twin over the full event set
      val all = (batch1 ++ batch2).toDF()
      val expected = ChangeFeed.applyChanges(
          ChangeFeed.annotate(all), Seq("user_id"),
          Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().toSet

      assert(got == expected)
      // user 11 was deleted after its last update; user 10's latest is event 4
      assert(got == Set((10L, 4L, 4.0)))
    } finally q.stop()
  }

  test("late event older than a delete cannot resurrect the key") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[RawEvent]
    val states = CdcPipeline.applyChangesStream(
      CdcPipeline.annotate(mem.toDF()))
    val q = states.writeStream.format("memory")
      .queryName("tomb").outputMode("update").start()
    try {
      mem.addData(Seq(RawEvent(5, ts(3), 11, "error", 0.0, "{}")))
      q.processAllAvailable()
      mem.addData(Seq(RawEvent(6, ts(1), 11, "click", 9.0, "{}")))
      q.processAllAvailable()
      val rows = spark.table("tomb").collect()
      // only the tombstone was ever emitted; the late update produced nothing
      assert(rows.length == 1 && rows.head.getAs[Boolean]("deleted"))
    } finally q.stop()
  }

  test("watermarked windowed stats equal the batch windowed stats") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[RawEvent]
    val agg = CdcPipeline.windowedStatsStream(
      CdcPipeline.annotate(mem.toDF()))
    val q = agg.writeStream.format("memory")
      .queryName("winstats").outputMode("update").start()
    try {
      mem.addData(batch1 ++ batch2)
      q.processAllAvailable()
      val got = spark.table("winstats")
        .groupBy("window_start", "op")
        .agg(max("n_ops").as("n_ops"), max("total_value").as("total_value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val expected = ChangeFeed.windowedStats(
          ChangeFeed.annotate((batch1 ++ batch2).toDF()))
        .select(col("window_start"), col("op"), col("n_ops"), col("total_value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("audit-derived watermark keeps every planted late row; zero delay drops them") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // Reversed-delivery key (user 10, user_id % 5 == 0 — the audit's
    // planted perturbation model): events at T0, T0+90min, T0+120min
    // DELIVERED newest-first, so the two tails arrive 30 and 120
    // minutes behind their key's delivered head. On-time users ride
    // along in the head batch. The audit measures max_late_us = 2 h
    // on exactly this relation; the watermark the helper derives from
    // it must admit every planted row on replay, and a zero-delay
    // watermark must NOT (proving the loop bites).
    val lateA = RawEvent(1, ts(0), 10, "click", 1.0, "{}")
    val lateB = RawEvent(2, ts(90), 10, "click", 2.0, "{}")
    val head = RawEvent(3, ts(120), 10, "click", 3.0, "{}")
    val onTime = Seq(
      RawEvent(4, ts(110), 1, "click", 4.0, "{}"),
      RawEvent(5, ts(115), 2, "click", 5.0, "{}"))
    val feed = Seq(lateA, lateB, head) ++ onTime

    val audit = cdc.TableStatistics.orderingAudit(
      ChangeFeed.annotate(feed.toDF()))
    val delay = CdcPipeline.auditWatermarkDelay(audit)
    assert(delay == "7201 seconds") // 120 min measured + 1 s guard

    // replay in the audited delivery order: head batch first (sets
    // the watermark), then the late tail, then a far-future flush so
    // every data window finalizes and emits in append mode
    def keptWith(d: String): Long = {
      val mem = MemoryStream[RawEvent]
      val agg = CdcPipeline.windowedStatsStream(
        CdcPipeline.annotate(mem.toDF()), d)
      val name = s"wmclose_${d.replace(' ', '_')}"
      val q = agg.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        mem.addData(head +: onTime)
        q.processAllAvailable()
        mem.addData(Seq(lateB, lateA))
        q.processAllAvailable()
        mem.addData(Seq(RawEvent(6, ts(600), 99, "click", 0.0, "{}")))
        q.processAllAvailable()
        spark.table(name).agg(sum(col("n_ops"))).head().getLong(0)
      } finally q.stop()
    }
    assert(keptWith(delay) == feed.length.toLong,
      "audit-derived watermark must admit every planted late row")
    assert(keptWith("0 seconds") == (1 + onTime.length).toLong,
      "zero-delay watermark must drop the planted late tail")
  }

  test("streaming lag monitor matches the batch high-water marks") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[RawEvent]
    val agg = CdcPipeline.lagMonitorStream(CdcPipeline.annotate(mem.toDF()))
    val q = agg.writeStream.format("memory")
      .queryName("lagmon").outputMode("complete").start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
      val got = spark.table("lagmon")
        .as[(String, Long, Long)].collect().toSet
      val batchTwin = cdc.TableStatistics.lagMonitor(
          ChangeFeed.annotate((batch1 ++ batch2).toDF()))
      val expected = batchTwin
        .select(col("table_name"), col("n_events"), col("max_ts_us"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == expected)
      // and the derived lag view agrees with the monitor's contract
      val head = expected.map(_._3).max
      batchTwin.collect().foreach(r =>
        assert(r.getAs[Long]("lag_us") == head - r.getAs[Long]("max_ts_us")))
    } finally q.stop()
  }

  test("foreachBatch upsert materializes the same state as the batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString
    val mem = MemoryStream[RawEvent]
    val q = CdcPipeline.foreachBatchUpsert(
      CdcPipeline.annotate(mem.toDF()),
      s"$dir/state", s"$dir/ckpt").start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()
    val got = CdcPipeline.materializedView(spark, s"$dir/state")
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    val expected = ChangeFeed.applyChanges(
        ChangeFeed.annotate((batch1 ++ batch2).toDF()),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    // tombstone for user 11 persists in the raw state version
    val raw = spark.read.parquet(
      new java.io.File(s"$dir/state").listFiles()
        .filter(_.getName.startsWith("v="))
        .maxBy(_.getName.stripPrefix("v=").toLong).getPath)
    assert(raw.filter(col("op") === "delete").count() == 1)
    // publish is staged (.tmp then rename) and superseded versions
    // are pruned: only the newest two survive, no staging dirs remain
    val names = new java.io.File(s"$dir/state").listFiles().map(_.getName)
    assert(names.count(_.startsWith("v=")) <= 2, names.mkString(","))
    assert(!names.exists(_.startsWith(".tmp-")), names.mkString(","))
  }

  test("upsert recovers from a crashed writer's staging dir") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-crash").toString
    // simulate a writer that died mid-write: orphan staging junk
    val orphan = new java.io.File(s"$dir/state/.tmp-7/part-junk")
    orphan.getParentFile.mkdirs()
    java.nio.file.Files.writeString(orphan.toPath, "not parquet")
    val mem = MemoryStream[RawEvent]
    val q = CdcPipeline.foreachBatchUpsert(
      CdcPipeline.annotate(mem.toDF()),
      s"$dir/state", s"$dir/ckpt").start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
    } finally q.stop()
    // the orphan was swept, a clean v=0 published, and the state is
    // exactly the batch twin's
    val names = new java.io.File(s"$dir/state").listFiles().map(_.getName)
    assert(!names.exists(_.startsWith(".tmp-")), names.mkString(","))
    val got = CdcPipeline.materializedView(spark, s"$dir/state")
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val expected = ChangeFeed.applyChanges(
        ChangeFeed.annotate(batch1.toDF()),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("bucketed upsert rewrites only touched buckets; untouched buckets stay byte-identical") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bupsert").toString
    val nBuckets = 8
    val mem = MemoryStream[RawEvent]
    val q = CdcPipeline.foreachBatchUpsertBucketed(
      CdcPipeline.annotate(mem.toDF()),
      s"$dir/state", s"$dir/ckpt", nBuckets).start()

    def fileState(): Map[String, (Long, String)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/state"))
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          val md = java.security.MessageDigest.getInstance("MD5")
          f.getPath -> (f.length(), md.digest(bytes).map("%02x".format(_)).mkString)
        }.toMap
    }

    try {
      mem.addData(batch1) // users 10 and 11
      q.processAllAvailable()
      val after1 = fileState()
      mem.addData(Seq(RawEvent(7, ts(9), 10, "purchase", 7.5, "{}"))) // user 10 only
      q.processAllAvailable()
      val after2 = fileState()
      // user 11's bucket files from batch 0 must be untouched
      val changedKeys = after2.keySet -- after1.keySet
      val u10Bucket = CdcPipeline.materializedViewBucketed(spark, s"$dir/state")
        .filter(col("user_id") === 10).select("bucket")
        .as[Int].collect().distinct.toSeq
      assert(u10Bucket.size == 1)
      changedKeys.foreach(p => assert(p.contains(s"bucket=${u10Bucket.head}")))
      after1.foreach { case (path, sig) =>
        assert(after2.get(path).contains(sig),
          s"pre-existing state file changed: $path")
      }
    } finally q.stop()
    // materialized view equals the batch twin over all events
    val got = CdcPipeline.materializedViewBucketed(spark, s"$dir/state")
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    val all = batch1 ++ Seq(RawEvent(7, ts(9), 10, "purchase", 7.5, "{}"))
    val expected = ChangeFeed.applyChanges(
        ChangeFeed.annotate(all.toDF()),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("bucketed upsert sweeps crashed staging dirs and prunes per-bucket versions") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bcrash").toString
    // orphan staging junk from a "crashed" writer
    val orphan = new java.io.File(s"$dir/state/.tmp-9/bucket=0/part-junk")
    orphan.getParentFile.mkdirs()
    java.nio.file.Files.writeString(orphan.toPath, "not parquet")
    val mem = MemoryStream[RawEvent]
    val q = CdcPipeline.foreachBatchUpsertBucketed(
      CdcPipeline.annotate(mem.toDF()),
      s"$dir/state", s"$dir/ckpt", nBuckets = 4).start()
    try {
      // three batches all touching user 10 → same bucket 3 times
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(Seq(RawEvent(7, ts(9), 10, "purchase", 7.5, "{}")))
      q.processAllAvailable()
      mem.addData(Seq(RawEvent(8, ts(10), 10, "click", 8.5, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val root = new java.io.File(s"$dir/state")
    assert(!root.listFiles().exists(_.getName.startsWith(".tmp-")))
    // every bucket retains at most the two newest versions
    root.listFiles().filter(_.getName.startsWith("bucket=")).foreach { b =>
      val vs = b.listFiles().map(_.getName).filter(_.startsWith("v="))
      assert(vs.length <= 2, s"${b.getName}: ${vs.mkString(",")}")
    }
    // and the state is still exactly the batch twin's
    val all = batch1 ++ Seq(
      RawEvent(7, ts(9), 10, "purchase", 7.5, "{}"),
      RawEvent(8, ts(10), 10, "click", 8.5, "{}"))
    val got = CdcPipeline.materializedViewBucketed(spark, s"$dir/state")
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val expected = ChangeFeed.applyChanges(
        ChangeFeed.annotate(all.toDF()),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("task status surfaces progress and lifecycle (running -> stopped)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-status").toString
    val mem = MemoryStream[RawEvent]
    val q = CdcPipeline.foreachBatchUpsert(
      CdcPipeline.annotate(mem.toDF()),
      s"$dir/state", s"$dir/ckpt").start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      // the wait_for_status idiom: poll until the task has consumed rows
      assert(CdcPipeline.awaitStatus(q, 10000)(s =>
        s.isActive && s.latestBatchId >= 0 && s.recentInputRows >= batch1.size))
      val st = CdcPipeline.taskStatus(q)
      assert(st.id.nonEmpty)
    } finally q.stop()
    assert(CdcPipeline.awaitStatus(q, 10000)(s => !s.isActive))
  }

  test("drifted-defaults parsing runs unchanged on a message stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.cdc.{Envelope, SchemaEvolution}
    // pre-ALTER message (no is_stock) and post-ALTER with explicit null
    val pre = Envelope.wrap(
      Seq((1L, 10L, 2.5)).toDF("event_id", "user_id", "value"),
      lit("insert"), lit("graft"), lit("t"), current_timestamp(),
      col("event_id"), Seq("event_id", "user_id", "value"))
      .select("message").as[String].collect()
    val post = Envelope.wrap(
      Seq((2L, 11L, 3.5, None: Option[Boolean]))
        .toDF("event_id", "user_id", "value", "is_stock"),
      lit("insert"), lit("graft"), lit("t"), current_timestamp(),
      col("event_id"), Seq("event_id", "user_id", "value", "is_stock"))
      .select("message").as[String].collect()
    val evolved = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("is_stock", BooleanType)))
    val mem = MemoryStream[String]
    val q = SchemaEvolution.parseDrifted(
        mem.toDF().withColumnRenamed("value", "message"),
        "message", evolved, Map("is_stock" -> lit(true)))
      .select(col("data.event_id").as("eid"), col("data.is_stock").as("st"))
      .writeStream.format("memory").queryName("drift")
      .outputMode("append").start()
    try {
      mem.addData(pre.toSeq ++ post.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("drift").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap
    assert(got(1L).contains(true)) // absent key → declared default
    assert(got(2L).isEmpty)        // explicit null survives
  }

  test("streaming dedup drops cross-batch duplicate deliveries within the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[RawEvent]
    val q = CdcPipeline.dedupStream(CdcPipeline.annotate(mem.toDF()))
      .toDF().writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      // redeliver batch1 (at-least-once source) plus one new event
      mem.addData(batch1 :+ RawEvent(9, ts(4), 12, "click", 5.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
    assert(ids.sameElements(batch1.map(_.event_id).sorted :+ 9L))
  }

  test("exception channel runs unchanged on a stream (batch twin equality)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rules = Seq(
      graft.cdc.Exceptions.Rule("low_value", col("value") < 1.0))
    val mem = MemoryStream[RawEvent]
    val q = graft.cdc.Exceptions.exceptions(
        CdcPipeline.annotate(mem.toDF()).toDF(), rules, Seq("event_id", "value"))
      .writeStream.format("memory").queryName("exc")
      .outputMode("append").start()
    try {
      mem.addData(batch1 ++ batch2)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("exc").select("event_id", "rule")
      .as[(Long, String)].collect().toSet
    val expected = graft.cdc.Exceptions.exceptions(
        ChangeFeed.annotate((batch1 ++ batch2).toDF()), rules,
        Seq("event_id", "value"))
      .select("event_id", "rule").as[(Long, String)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("streaming session_window sessions equal the batch lag-based sessions") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // two sessions for user 10 (gap > 30 min between minute 5 and 50)
    val evs = Seq(
      RawEvent(1, ts(0), 10, "click", 1.0, "{}"),
      RawEvent(2, ts(5), 10, "click", 2.0, "{}"),
      RawEvent(3, ts(50), 10, "click", 3.0, "{}"),
      RawEvent(4, ts(7), 11, "click", 4.0, "{}"))
    val mem = MemoryStream[RawEvent]
    val q = CdcPipeline.sessionizeStream(CdcPipeline.annotate(mem.toDF()))
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(evs)
      q.processAllAvailable()
      // advance the watermark far past every session's close, then
      // one more batch so the closed sessions flush in append mode
      mem.addData(Seq(RawEvent(98, ts(400), 99, "click", 0.0, "{}")))
      q.processAllAvailable()
      mem.addData(Seq(RawEvent(99, ts(401), 99, "click", 0.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess")
      .select("user_id", "session_start", "n_events", "session_value")
      .as[(Long, Timestamp, Long, Double)].collect().toSet

    val expected = Set(
      (10L, ts(0), 2L, 3.0),  // minutes 0+5
      (10L, ts(50), 1L, 3.0), // minute 50 alone
      (11L, ts(7), 1L, 4.0))
    assert(got == expected)
  }

  test("kinesis-like sink writes JSON partitioned by partition_key") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sink").toString
    val mem = MemoryStream[RawEvent]
    val wrapped = CdcPipeline.envelopeStream(
      CdcPipeline.annotate(mem.toDF()))
    val q = CdcPipeline.kinesisLikeSink(wrapped,
      s"$dir/data", s"$dir/ckpt").start()
    try {
      mem.addData(batch1 ++ batch2)
      q.processAllAvailable()
    } finally q.stop()
    val parts = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    // user 10 -> users_2, user 11 -> users_3
    assert(parts.contains("partition_key=graft.users_2"))
    assert(parts.contains("partition_key=graft.users_3"))
    val msgs = spark.read.json(s"$dir/data")
    assert(msgs.count() == (batch1 ++ batch2).size)
    val parsed = spark.read.json(msgs.select("message").as[String])
    assert(parsed.select("metadata.operation").distinct().count() >= 2)
  }

  test("streaming delivery dedup restores the exactly-once aggregate") {
    import org.apache.spark.sql.functions._
    val sf = SparkTestSession.sf
    val got = CdcPipeline.dedupRoundtrip(spark, sf).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_unique"), r.getAs[Double]("sum_value"))).toMap
    val expect = graft.cdc.ChangeFeed.fromEvents(spark, sf)
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n"), r.getAs[Double]("sv"))).toMap
    assert(got == expect)
  }
}
