package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc._

class CdcSpec extends AnyFunSuite {
  import SparkTestSession._

  test("envelope includes explicit nulls (include_null_and_empty)") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String], "")).toDF("id", "a", "b")
    val wrapped = Envelope.wrap(df, lit("update"), lit("graft"), lit("t"),
      current_timestamp(), col("id"), Seq("id", "a", "b"))
    val msg = wrapped.select("message").collect()(0).getString(0)
    // a null column and an empty string both ride in the message
    assert(msg.contains("\"a\":null"))
    assert(msg.contains("\"b\":\"\""))
  }

  test("UNSIGNED palette values above the signed range survive the roundtrip") {
    // MariaDB `age TINYINT UNSIGNED` (lib/query.py:4) carries 128-255
    // — values a signed-Byte mapping would overflow. The palette
    // widens each UNSIGNED width one step; prove the envelope
    // roundtrip keeps the above-signed-range values bit-exact.
    val pal = TypePalette.palette(Tables.load(spark, sf, "part"))
    assert(pal.schema("utiny").dataType ==
      org.apache.spark.sql.types.ShortType)
    assert(pal.schema("usmall").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(pal.schema("uint").dataType ==
      org.apache.spark.sql.types.LongType)
    val wrapped = Envelope.wrap(pal, lit("insert"), lit("graft"),
      lit("palette"), col("ts"), col("id"), TypePalette.paletteCols)
    val parsed = Envelope.parse(wrapped, "message", TypePalette.paletteSchema)
    val bad = parsed.filter(
      col("data.utiny") =!= col("utiny") ||
      col("data.usmall") =!= col("usmall") ||
      col("data.uint") =!= col("uint") ||
      col("data.utiny") < 128 || col("data.utiny") > 255 ||
      col("data.usmall") < 32768 ||
      col("data.uint") < 2147483648L).count()
    assert(bad == 0L)
  }

  test("retention audit: planted aged-out replay point is flagged, in-window point clears") {
    import spark.implicits._
    // feed head 2024-03-03 00:00 ⇒ 24h horizon at 2024-03-02 00:00.
    // Two records sit below the horizon (aged out past TRIM_HORIZON);
    // the 18:00 one is strictly between the first replay point and
    // the horizon, so a resume from 03-01 12:00 would LOSE it.
    val feed = Seq(
      ("users_0", "2024-03-01 00:00:00"),
      ("users_0", "2024-03-01 18:00:00"),
      ("users_0", "2024-03-02 12:00:00"),
      ("users_0", "2024-03-03 00:00:00"))
      .toDF("table_name", "ts_s")
      .select(col("table_name"), col("ts_s").cast("timestamp").as("ts"))
    val out = Retention.audit(feed, 24,
        Seq("2024-03-01 12:00:00", "2024-03-02 06:00:00"))
      .orderBy(col("replay_ts"))
      .collect()
    assert(out.length == 2)
    val aged = out(0); val ok = out(1)
    assert(aged.getAs[Long]("n_aged_out") == 2L)
    assert(aged.getAs[Long]("n_lost_for_replay") == 1L)
    assert(!aged.getAs[Boolean]("reachable"))
    assert(ok.getAs[Long]("n_lost_for_replay") == 0L)
    assert(ok.getAs[Boolean]("reachable"))
    assert(ok.getAs[java.sql.Timestamp]("oldest_reachable_ts").toString
      .startsWith("2024-03-02 12:00:00"))
    assert(ok.getAs[java.sql.Timestamp]("horizon_ts").toString
      .startsWith("2024-03-02 00:00:00"))
  }

  test("watermark plan: planted lateness sets the zero-drop recommendation and drop costs") {
    import spark.implicits._
    // user 5 (% 5 == 0) delivers in reverse under the audit's
    // perturbation: its events arrive newest-first, so every event
    // after the first is late by its distance to the key's max ts.
    // Events sit 3 s apart ⇒ lateness 3 s, 6 s, 9 s: the 1 s candidate
    // drops all three, the 5 s candidate drops two (6 s and 9 s), and
    // the zero-drop recommendation is 9 s. User 7 is in order ⇒ its
    // table contributes zero lateness.
    val feed = Seq(
      (5L, 1L, "2024-03-01 00:00:00"), (5L, 2L, "2024-03-01 00:00:03"),
      (5L, 3L, "2024-03-01 00:00:06"), (5L, 4L, "2024-03-01 00:00:09"),
      (7L, 5L, "2024-03-01 00:00:00"), (7L, 6L, "2024-03-01 00:00:05"))
      .toDF("user_id", "event_id", "ts_s")
      .select(lit("users_0").as("table_name"), col("user_id"),
        col("event_id"), col("ts_s").cast("timestamp").as("ts"))
    val out = TableStatistics.watermarkPlan(feed).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_events") == 6L)
    assert(r.getAs[Long]("n_late") == 3L)
    assert(r.getAs[Long]("max_late_us") == 9000000L)
    assert(r.getAs[Long]("sum_late_us") == 18000000L)
    assert(r.getAs[Long]("n_drop_w1s") == 3L)
    assert(r.getAs[Long]("n_drop_w5s") == 2L)
    assert(r.getAs[Long]("recommended_watermark_us") == 9000000L)
  }

  test("watermark plan: an in-order feed recommends zero slack") {
    import spark.implicits._
    val feed = Seq((1L, 1L, "2024-03-01 00:00:00"),
        (1L, 2L, "2024-03-01 00:00:05"))
      .toDF("user_id", "event_id", "ts_s")
      .select(lit("t").as("table_name"), col("user_id"), col("event_id"),
        col("ts_s").cast("timestamp").as("ts"))
    val r = TableStatistics.watermarkPlan(feed).collect()(0)
    assert(r.getAs[Long]("n_late") == 0L)
    assert(r.getAs[Long]("recommended_watermark_us") == 0L)
    assert(r.getAs[Long]("n_drop_w1s") == 0L)
  }

  test("conflict resolution: replica re-commits win exactly where they are newest") {
    import spark.implicits._
    // key 3: primary only → primary's latest (e2, v=20) wins.
    // key 7 (diverged): replica re-commits e4 at +1s → replica wins
    //   with v=140 (40+100) and the key counts as conflicted.
    // key 14 (diverged): the replica re-commits BOTH events one
    //   second later, so its copy of e6 (v=160) is strictly newest —
    //   with this planting the replica's newest re-commit always
    //   outranks every primary position (the ts/priority tie-break
    //   never has to fire; it exists for real two-master feeds).
    val feed = Seq(
      (3L, 1L, "2024-03-01 00:00:00", 10.0),
      (3L, 2L, "2024-03-01 00:00:05", 20.0),
      (7L, 3L, "2024-03-01 00:00:00", 30.0),
      (7L, 4L, "2024-03-01 00:00:05", 40.0),
      (14L, 5L, "2024-03-01 00:00:04", 50.0),
      (14L, 6L, "2024-03-01 00:00:05", 60.0))
      .toDF("user_id", "event_id", "ts_s", "value")
      .select(col("user_id"), col("event_id"),
        col("ts_s").cast("timestamp").as("ts"), col("value"),
        concat(lit("users_"), (col("user_id") % 4).cast("string"))
          .as("table_name"))
    val out = ChangeFeed.conflictResolution(feed).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_conflicted"),
          r.getAs[Long]("n_replica_wins"),
          r.getAs[Double]("sum_winning_value"))).toMap
    // users_3 holds keys 3 (7%4==3 too): key 3 resolves to primary's
    // latest (20), key 7 to the replica re-commit (140) — one of the
    // two keys conflicted, one replica win, winning mass 160
    assert(out("users_3") == ((2L, 1L, 1L, 160.0)))
    assert(out("users_2") == ((1L, 1L, 1L, 160.0)))  // key 14: newest re-commit
  }

  test("table mapping: include wildcard + exclude exact (DMS a% pattern)") {
    val m = TableMapping.Mapping(Seq(
      TableMapping.SelectionRule("db", "a%"),
      TableMapping.SelectionRule("db", "accounts", TableMapping.Exclude)))
    val cat = Seq(("db", "authors"), ("db", "accounts"), ("db", "novels"), ("other", "authors"))
    assert(m.selectTables(cat) == Seq(("db", "authors")))
  }

  test("table mapping: _ wildcard matches a single char") {
    val m = TableMapping.Mapping(Seq(TableMapping.SelectionRule("%", "users__")))
    assert(m.selectTables(Seq(("s", "users_1"), ("s", "users_12"))) == Seq(("s", "users_1")))
  }

  test("mapping predicate agrees with driver-side selection") {
    val m = TableMapping.Mapping(Seq(
      TableMapping.SelectionRule("graft", "src1%"),
      TableMapping.SelectionRule("graft", "src15", TableMapping.Exclude)))
    val docs = Tables.load(spark, sf, "documents")
    val viaCol = docs.filter(m.predicate(lit("graft"), col("source")))
      .select("source").distinct().collect().map(_.getString(0)).toSet
    val catalog = docs.select("source").distinct().collect()
      .map(r => ("graft", r.getString(0))).toSeq
    assert(viaCol == m.selectTables(catalog).map(_._2).toSet)
  }

  test("applyChanges keeps exactly the latest non-deleted row per key") {
    val c = ChangeFeed.fromEvents(spark, sf)
    val applied = ChangeFeed.applyChanges(c, Seq("user_id"), Seq(col("ts"), col("event_id")))
    assert(applied.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    // a user whose last event is an error (delete) must be absent
    val lastOps = c.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
    val deleted = lastOps.filter(col("op") === "delete")
      .select("user_id").collect().map(_.getLong(0)).toSet
    val kept = applied.select("user_id").collect().map(_.getLong(0)).toSet
    assert(deleted.intersect(kept).isEmpty)
  }

  test("envelope roundtrip preserves data and metadata") {
    val c = ChangeFeed.fromEvents(spark, sf).limit(50)
    val wrapped = Envelope.wrap(c, col("op"), col("schema_name"), col("table_name"),
      col("ts"), col("event_id"), Seq("event_id", "user_id", "value", "props"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val parsed = Envelope.parse(wrapped, "message", schema)
    val bad = parsed.filter(
      col("data.event_id") =!= col("event_id") ||
      col("data.value") =!= col("value") ||
      col("metadata.operation") =!= col("op") ||
      col("metadata.`record-type`") =!= "data" ||
      col("partition_key") =!= concat(col("schema_name"), lit("."), col("table_name")))
    assert(bad.count() == 0)
  }

  test("full load emits 2 controls + row-count loads per selected table") {
    val m = TableMapping.Mapping(Seq(TableMapping.SelectionRule("graft", "nation")))
    val sum = FullLoad.summary(spark, sf, m).collect()
    val byOp = sum.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byOp("drop-table") == 1 && byOp("create-table") == 1)
    assert(byOp("load") == Tables.load(spark, sf, "nation").count())
  }

  test("table statistics totals equal stream size") {
    val c = ChangeFeed.fromEvents(spark, sf)
    val stats = TableStatistics.compute(c).collect()
    assert(stats.map(_.getAs[Long]("total")).sum == c.count())
    stats.foreach { r =>
      assert(r.getAs[Long]("inserts") + r.getAs[Long]("updates") +
        r.getAs[Long]("deletes") == r.getAs[Long]("total"))
    }
  }

  test("incremental sum from deltas equals recomputation over the final state") {
    val rows = SparkEntry.queries("cdc_incremental_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("maintained_ok"),
        s"table ${r.getAs[String]("table_name")}: " +
          s"inc=${r.getAs[Double]("inc_sum")} full=${r.getAs[Double]("full_sum")}")
      assert(r.getAs[Double]("inc_sum") == r.getAs[Double]("full_sum"))
    }
  }

  test("exception channel: every row lands in valid or exceptions, multi-rule rows fan out") {
    import org.apache.spark.sql.functions.{col, lit, regexp_extract, when}
    val c = ChangeFeed.fromEvents(spark, sf)
    val rules = Seq(
      Exceptions.Rule("null_key", col("user_id").isNull),
      Exceptions.Rule("low_value", col("value") < 1.0),
      Exceptions.Rule("k_domain",
        regexp_extract(col("props"), "[0-9]+", 0).cast("long") > 90))
    val total = c.count()
    val ok = Exceptions.valid(c, rules).count()
    val exc = Exceptions.exceptions(c, rules,
      Seq("event_id", "user_id", "value", "props"))
    // distinct violating events + clean events = all events
    val violatingEvents = exc.select("event_id").distinct().count()
    assert(ok + violatingEvents == total)
    assert(exc.count() >= violatingEvents) // multi-rule rows fan out
    // a null predicate counts as not-violated: rows never vanish
    val nullRule = Seq(Exceptions.Rule("never",
      when(lit(false), lit(true)).otherwise(lit(null).cast("boolean"))))
    assert(Exceptions.valid(c, nullRule).count() == total)
    assert(Exceptions.exceptions(c, nullRule, Seq("event_id")).count() == 0)
    // payload is JSON with explicit nulls and the original columns
    val sample = exc.limit(1).collect()
    sample.foreach(r =>
      assert(r.getAs[String]("payload").contains("\"event_id\":")))
  }

  test("replay at the feed's end equals full apply; replay mid-feed is a prefix state") {
    val c = ChangeFeed.fromEvents(spark, sf)
    val keys = Seq("user_id")
    val ord = Seq(col("ts"), col("event_id"))
    val full = ChangeFeed.applyChanges(c, keys, ord)
    val atEnd = ChangeFeed.replayAt(c, lit("2099-01-01"), keys, ord)
    assert(atEnd.collect().toSet == full.collect().toSet)
    val mid = ChangeFeed.replayAt(c, lit("2024-01-15 00:00:00"), keys, ord)
    // every key live mid-feed existed in the feed prefix, so the
    // replayed state can't exceed the prefix's key count
    val prefixKeys = c.filter(col("ts") <= lit("2024-01-15 00:00:00"))
      .select(col("user_id")).distinct().count()
    assert(mid.count() <= prefixKeys)
    assert(mid.count() > 0)
  }

  test("native kmv_kth equals the sorted kth distinct value, null below k") {
    import spark.implicits._
    import graft.functions.KmvSketch
    // duplicates + shuffled order: the aggregate must dedup and the
    // result must be order-insensitive (merge path exercised by the
    // multi-partition input)
    val hs = (1L to 100L).flatMap(h => Seq(h * 7, h * 7)) // dup each
    val df = scala.util.Random.shuffle(hs).zipWithIndex
      .map { case (h, i) => (i % 4, h) }.toDF("g", "h")
      .repartition(8)
    val got = df.groupBy(col("g"))
      .agg(KmvSketch.kmvKth(col("h"), 10).as("kth"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = df.select("g", "h").collect()
      .groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(1)).distinct.sorted.apply(9)).toMap
    assert(got == expect.toMap)
    // below-k groups evaluate to null
    val small = Seq((0, 1L), (0, 2L), (0, 2L)).toDF("g", "h")
    val r = small.groupBy(col("g"))
      .agg(KmvSketch.kmvKth(col("h"), 10).as("kth")).collect()(0)
    assert(r.isNullAt(1))
  }

  test("forget audit: scrub is total, state shrinks by the forgotten live keys") {
    val c = ChangeFeed.fromEvents(spark, sf)
    val keys = c.select(col("user_id")).distinct()
      .filter(col("user_id") % 17 === 0)
    val rows = Forget.audit(c, "user_id", keys,
      Seq(col("ts"), col("event_id"))).collect()
    assert(rows.nonEmpty)
    // zero residual everywhere: no forgotten key survives in state
    rows.foreach(r => assert(r.getAs[Long]("residual_keys") == 0L))
    // scrubbed feed rows = rows whose key is in the list
    val expectScrub = c.filter(col("user_id") % 17 === 0).count()
    assert(rows.map(_.getAs[Long]("feed_scrubbed")).sum == expectScrub)
    // per table, state shrinks by exactly the forgotten LIVE keys
    val liveForgotten = ChangeFeed.applyChanges(c,
        Seq("table_name", "user_id"), Seq(col("ts"), col("event_id")))
      .filter(col("user_id") % 17 === 0)
      .groupBy(col("table_name")).count().collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("table_name")
      assert(r.getAs[Long]("state_keys_before") -
        r.getAs[Long]("state_keys_after") == liveForgotten.getOrElse(t, 0L), t)
    }
  }

  test("full-load events: 2 controls then one load row per table row") {
    val ev = cdc.FullLoad.events(spark, sf, "region").collect()
    val n = Tables.load(spark, sf, "region").count()
    assert(ev.length.toLong == 2L + n)
    val ops = ev.map(_.getAs[String]("op"))
    assert(ops.count(_ == "drop-table") == 1)
    assert(ops.count(_ == "create-table") == 1)
    assert(ops.count(_ == "load").toLong == n)
    assert(ev.forall(_.getAs[String]("table_name") == "region"))
  }

  test("escaped LIKE wildcards: driver match == stream predicate, invalid escapes rejected") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val m = TableMapping.Mapping(Seq(
      TableMapping.SelectionRule("graft", "100\\%")))
    // driver-side: literal percent
    assert(m.selectTables(Seq(("graft", "100%"))) == Seq(("graft", "100%")))
    assert(m.selectTables(Seq(("graft", "1000"))).isEmpty)
    // stream-side agrees
    val df = Seq(("graft", "100%"), ("graft", "1000"))
      .toDF("schema_name", "table_name")
    val kept = df.filter(m.predicate(col("schema_name"), col("table_name")))
      .collect().map(_.getString(1))
    assert(kept.toSeq == Seq("100%"))
    // invalid escapes throw instead of silently matching
    val bad = TableMapping.Mapping(Seq(
      TableMapping.SelectionRule("graft", "db\\a")))
    intercept[IllegalArgumentException] {
      bad.selectTables(Seq(("graft", "dba")))
    }
  }

  test("lag monitor: head table lags zero, others lag exactly to the head") {
    import org.apache.spark.sql.functions._
    val rows = cdc.TableStatistics.lagMonitor(
      ChangeFeed.fromEvents(spark, sf)).collect()
    assert(rows.nonEmpty)
    val head = rows.map(_.getAs[Long]("max_ts_us")).max
    assert(rows.count(_.getAs[Long]("lag_us") == 0L) >= 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("lag_us") == head - r.getAs[Long]("max_ts_us"))
      assert(r.getAs[Long]("lag_us") >= 0L)
    }
    // per-table maxima tie out against a direct recompute
    val expect = ChangeFeed.fromEvents(spark, sf)
      .groupBy(col("table_name"))
      .agg(max(unix_micros(col("ts"))).as("m")).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("m")).toMap
    rows.foreach(r => assert(
      expect(r.getAs[String]("table_name")) == r.getAs[Long]("max_ts_us")))
  }

  test("validation report ties out against the planted drift exactly") {
    import org.apache.spark.sql.functions._
    val orders = Tables.load(spark, sf, "orders")
    val rows = SparkEntry.queries("cdc_validation")(spark, sf).collect()
    // planted drift: key-hash mod 97 → 0 checksum mismatch, 1 missing,
    // 2 extra key, 3 key duplicated on target (digest mismatch)
    val h = pmod(graft.functions.Portable.pHash(
      col("o_orderkey").cast("string")), lit(97L))
    val planted = orders.groupBy()
      .agg(count(lit(1)).as("n"),
        sum(when(h === 0, 1L).otherwise(0L)).as("chk"),
        sum(when(h === 1, 1L).otherwise(0L)).as("drop"),
        sum(when(h === 2, 1L).otherwise(0L)).as("extra"),
        sum(when(h === 3, 1L).otherwise(0L)).as("dup"))
      .collect()(0)
    assert(rows.map(_.getAs[Long]("n_source")).sum == planted.getAs[Long]("n"))
    assert(rows.map(_.getAs[Long]("n_mismatched")).sum ==
      planted.getAs[Long]("chk") + planted.getAs[Long]("dup"))
    assert(rows.map(_.getAs[Long]("n_missing_target")).sum == planted.getAs[Long]("drop"))
    assert(rows.map(_.getAs[Long]("n_extra_target")).sum == planted.getAs[Long]("extra"))
    rows.foreach { r =>
      // states partition each side's keys
      assert(r.getAs[Long]("n_matched") + r.getAs[Long]("n_mismatched") +
        r.getAs[Long]("n_missing_target") == r.getAs[Long]("n_source"))
      assert(r.getAs[Long]("n_matched") + r.getAs[Long]("n_mismatched") +
        r.getAs[Long]("n_extra_target") == r.getAs[Long]("n_target"))
    }
  }

  test("validation handles null keys and null checksums without double-counting") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // k=1 matched; k=2 null checksum both sides (matched, null-safe);
    // k=3 null checksum source-only (mismatched); k=null on source
    // only (one missing key, NOT missing+extra); k=4 dup on target
    val src = Seq(
      (Option(1L), "a", Option(10L)), (Option(2L), "a", None),
      (Option(3L), "a", None), (None: Option[Long], "a", Option(7L)),
      (Option(4L), "a", Option(40L)))
      .toDF("k", "g", "c")
    val tgt = Seq(
      (Option(1L), "a", Option(10L)), (Option(2L), "a", None),
      (Option(3L), "a", Option(3L)), (Option(4L), "a", Option(40L)),
      (Option(4L), "a", Option(40L)))
      .toDF("k", "g", "c")
    val r = cdc.Validation.report(src, tgt, "k", "g", col("c")).collect()(0)
    assert(r.getAs[Long]("n_source") == 5L)   // 5 distinct source keys
    assert(r.getAs[Long]("n_target") == 4L)
    assert(r.getAs[Long]("n_matched") == 2L)  // k=1, k=2
    assert(r.getAs[Long]("n_mismatched") == 2L) // k=3 (null chk), k=4 (dup)
    assert(r.getAs[Long]("n_missing_target") == 1L) // the null key
    assert(r.getAs[Long]("n_extra_target") == 0L)
  }

  test("compaction summary: live + tombstones = keys, keys <= raw, ratio in (0,1]") {
    val s = ChangeFeed.compactionSummary(ChangeFeed.fromEvents(spark, sf),
      Seq("user_id"), Seq(col("ts"), col("event_id"))).collect()
    assert(s.nonEmpty)
    s.foreach { r =>
      assert(r.getAs[Long]("n_live") + r.getAs[Long]("n_tombstones")
        == r.getAs[Long]("n_keys"))
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n_raw"))
      val ratio = r.getAs[Double]("compaction_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
    }
  }

  test("hot keys: sharded tournament equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val c = ChangeFeed.fromEvents(spark, sf)
    val k = 7
    val got = TableStatistics.hotKeys(c, k, shards = 8)
      .orderBy(col("table_name"), col("rk")).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_changes"), r.getAs[Long]("rk")))
    val w = Window.partitionBy("table_name")
      .orderBy(col("n_changes").desc, col("user_id"))
    val expect = c.groupBy(col("table_name"), col("user_id"))
      .agg(count(lit(1)).as("n_changes"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("table_name"), col("rk")).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_changes"), r.getAs[Long]("rk")))
    assert(got.toSeq == expect.toSeq)
    // shares within a table sum to at most 1 and are ordered
    val shares = TableStatistics.hotKeys(c, k, shards = 8).collect()
      .groupBy(_.getAs[String]("table_name"))
    shares.values.foreach { rs =>
      assert(rs.map(_.getAs[Double]("share")).sum <= 1.0 + 1e-9)
      val ordered = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("n_changes"))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
  }

  test("snapshot diff equals the two-replay reference join") {
    val c = ChangeFeed.fromEvents(spark, sf)
    val (t1, t2) = (lit("2024-01-10 00:00:00"), lit("2024-01-20 00:00:00"))
    val got = ChangeFeed.snapshotDiff(c, t1, t2).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_added"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_changed"), r.getAs[Long]("n_unchanged"),
          r.getAs[Long]("n_keys_t1"), r.getAs[Long]("n_keys_t2"))).toMap
    // reference: two independent replays, full-outer-joined per key
    val ord = Seq(col("ts"), col("event_id"))
    def live(cut: org.apache.spark.sql.Column) =
      ChangeFeed.replayAt(c, cut, Seq("user_id"), ord)
        .select(col("user_id"), col("table_name"), col("event_id"))
    val j = live(t1).as("a").join(live(t2).as("b"),
      col("a.user_id") === col("b.user_id"), "full_outer")
    val expect = j.select(
        coalesce(col("b.table_name"), col("a.table_name")).as("table_name"),
        col("a.event_id").as("e1"), col("b.event_id").as("e2"))
      .groupBy(col("table_name"))
      .agg(
        sum(when(col("e1").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("e2").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("e1").isNotNull && col("e2").isNotNull &&
          col("e1") =!= col("e2"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("e1") === col("e2"), 1L).otherwise(0L)).as("n_unchanged"),
        sum(when(col("e1").isNotNull, 1L).otherwise(0L)).as("n_keys_t1"),
        sum(when(col("e2").isNotNull, 1L).otherwise(0L)).as("n_keys_t2"))
      .collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_added"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_changed"), r.getAs[Long]("n_unchanged"),
          r.getAs[Long]("n_keys_t1"), r.getAs[Long]("n_keys_t2"))).toMap
    assert(got == expect)
    got.values.foreach { case (add, rm, chg, same, k1, k2) =>
      assert(k2 == k1 + add - rm)
      assert(chg + same + rm == k1)
    }
  }

  test("idempotent apply: ledger balances and the applied state equals " +
    "the exactly-once apply") {
    val c = ChangeFeed.fromEvents(SparkTestSession.spark, SparkTestSession.sf)
    val rows = ChangeFeed.idempotentApply(c).collect()
    assert(rows.nonEmpty)
    // ledger identity per table
    rows.foreach { r =>
      assert(r.getAs[Long]("n_delivered") ==
        r.getAs[Long]("n_unique") + r.getAs[Long]("n_dup_dropped"))
    }
    // planted redelivery count: one extra copy per %7 event, one more per %21
    val extra = c.filter(col("event_id") % 7 === 0).count() +
      c.filter(col("event_id") % 21 === 0).count()
    assert(rows.map(_.getAs[Long]("n_dup_dropped")).sum == extra)
    assert(rows.map(_.getAs[Long]("n_unique")).sum == c.count())
    // the deduped apply must equal the exactly-once apply of the raw feed
    val expectLive = ChangeFeed.applyChanges(c, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n"), r.getAs[Double]("sv"))).toMap
    rows.foreach { r =>
      val (n, sv) = expectLive(r.getAs[String]("table_name"))
      assert(r.getAs[Long]("n_keys_live") == n)
      assert(r.getAs[Double]("sum_live_value") == sv)
    }
  }

  test("tombstone GC audit: counts nest and match a window recompute") {
    import org.apache.spark.sql.expressions.Window
    val c = ChangeFeed.fromEvents(SparkTestSession.spark, SparkTestSession.sf)
    val rows = ChangeFeed.tombstoneGc(c, gcDays = 7).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, t, g, rr) = (r.getAs[Long]("n_keys"), r.getAs[Long]("n_tombstones"),
        r.getAs[Long]("n_gc_eligible"), r.getAs[Long]("n_resurrect_risk"))
      assert(t <= k && g <= t && rr <= g)
    }
    // independent recompute through latestPerKey + an explicit horizon
    val latest = ChangeFeed.latestPerKey(c, Seq("user_id"),
      Seq(col("ts"), col("event_id")))
    val head = c.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val horizon = java.sql.Timestamp.from(
      head.toInstant.minus(java.time.Duration.ofDays(7)))
    val tombs = latest.filter(col("op") === "delete")
    val expTomb = tombs.groupBy(col("table_name")).count().collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("count")).toMap
    val expGc = tombs.filter(col("ts") < lit(horizon))
      .groupBy(col("table_name")).count().collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val tn = r.getAs[String]("table_name")
      assert(r.getAs[Long]("n_tombstones") == expTomb.getOrElse(tn, 0L))
      assert(r.getAs[Long]("n_gc_eligible") == expGc.getOrElse(tn, 0L))
    }
  }

  test("txn atomicity: planted tears are fully accounted") {
    val c = ChangeFeed.fromEvents(SparkTestSession.spark, SparkTestSession.sf)
    val rows = ChangeFeed.txnAtomicity(c).collect()
    assert(rows.nonEmpty)
    // every lost op belongs to exactly one torn commit
    val lost = c.filter(col("event_id") % 97 === 3)
    assert(rows.map(_.getAs[Long]("n_ops_lost")).sum == lost.count())
    assert(rows.map(_.getAs[Long]("n_torn")).sum ==
      lost.select(expr("event_id div 5")).distinct().count())
    // commits survive (within 5 consecutive ids only one can be ≡3
    // mod 97, so no commit is wholly lost) and tears nest
    assert(rows.map(_.getAs[Long]("n_txns")).sum ==
      c.select(expr("event_id div 5")).distinct().count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_torn") <= r.getAs[Long]("n_txns"))
      assert(r.getAs[Long]("n_ops_rollback") >= r.getAs[Long]("n_torn"))
    }
  }

  test("subject export covers exactly the requested subjects, ops balance") {
    val c = ChangeFeed.fromEvents(SparkTestSession.spark, SparkTestSession.sf)
    val rows = ChangeFeed.subjectExport(c).collect()
    val subjects = c.filter(col("user_id") % 97 === 0)
      .select(col("user_id")).distinct().collect()
      .map(_.getAs[Long]("user_id")).toSet
    assert(rows.map(_.getAs[Long]("user_id")).toSet == subjects)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_changes") ==
        r.getAs[Long]("n_inserts") + r.getAs[Long]("n_updates")
          + r.getAs[Long]("n_deletes"))
      assert(!r.getTimestamp(r.fieldIndex("first_ts"))
        .after(r.getTimestamp(r.fieldIndex("last_ts"))))
      assert(r.getAs[Boolean]("is_live") ==
        (r.getAs[String]("last_op") != "delete"))
    }
  }

  test("LOB audit: octet (not char) sizes, budget boundary inclusive") {
    import spark.implicits._
    // "é" is 1 char / 2 UTF-8 bytes — the char-count trap the audit
    // must not fall into. Budget 10: exactly-at-budget is NOT
    // truncated; one byte over is.
    val rows = Seq(
      ("t1", "abc"),          //  3 B
      ("t1", "ééééé"),        // 10 B = budget: kept whole
      ("t1", "éééééé"),       // 12 B: truncated, 2 lost
      ("t2", "aé"))           //  3 B
      .toDF("source", "text")
    val got = TableStatistics.lobAudit(rows, col("source"), col("text"), 10L)
      .collect().map(r => r.getString(0) -> r).toMap
    val t1 = got("t1")
    assert(t1.getAs[Long]("n_rows") == 3L)
    assert(t1.getAs[Long]("n_truncated") == 1L)
    assert(t1.getAs[Long]("bytes_total") == 25L)
    assert(t1.getAs[Long]("bytes_kept") == 23L)
    assert(t1.getAs[Long]("bytes_lost") == 2L)
    assert(t1.getAs[Long]("max_lob_bytes") == 12L)
    assert(t1.getAs[Long]("suggested_lob_kb") == 1L)
    val t2 = got("t2")
    assert(t2.getAs[Long]("n_truncated") == 0L)
    assert(t2.getAs[Long]("bytes_lost") == 0L)
    // sf corpus: ledger identity bytes_kept + bytes_lost = total, and
    // a zero-truncation group's suggested budget covers its max
    SparkEntry.queries("cdc_lob_truncation")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("bytes_kept") + r.getAs[Long]("bytes_lost")
        == r.getAs[Long]("bytes_total"))
      assert(r.getAs[Long]("suggested_lob_kb") * 1024L
        >= r.getAs[Long]("max_lob_bytes"))
      assert(r.getAs[Long]("n_truncated") <= r.getAs[Long]("n_rows"))
    }
  }
}
