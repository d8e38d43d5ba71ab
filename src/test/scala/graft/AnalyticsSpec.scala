package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Tables.sessionConf.foldLeft(SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  /** The two state-store backends the streaming suite must be green
    * under: the default HDFS-backed store (what local specs exercise
    * for free) and RocksDB — SURVEY §4's 1000-executor recipe, where
    * state no longer fits executor heaps. Each entry is
    * (label, providerClass).
    */
  val stateStoreProviders: Seq[(String, String)] = Seq(
    "hdfs" -> ("org.apache.spark.sql.execution.streaming.state." +
      "HDFSBackedStateStoreProvider"),
    "rocksdb" -> ("org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"))

  /** Run `body` with the session's streaming state store swapped to
    * `providerClass` (restored after — the conf is read at query
    * start, so only queries started inside `body` are affected).
    */
  def withStateStoreProvider[T](providerClass: String)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, providerClass)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Shared driver-side union-find: the connected-components ground
    * truth both MlSpec and GraphProps compare against.
    */
  def unionFindComponents(pairs: Iterable[(Long, Long)]): Set[Set[Long]] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    parent.keys.map(v => v -> find(v)).toSeq
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
  }
}

class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q1 groups are the 6 (returnflag, linestatus) combos with positive sums") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length >= 4 && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = SparkEntry.queries("q3_shipping_priority")(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 covers only ASIA nations") {
    val rows = SparkEntry.queries("q5_region_revenue")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
  }

  test("market share is a fraction per year") {
    val rows = SparkEntry.queries("q_market_share")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("top parts per brand gives <=3 per brand, rank contiguous") {
    val rows = SparkEntry.queries("q_top_parts_per_brand")(spark, sf).collect()
    val perBrand = rows.groupBy(_.getAs[String]("p_brand"))
    perBrand.values.foreach { g =>
      assert(g.length <= 3)
      assert(g.map(_.getAs[Long]("rk")).sorted.sameElements(1L to g.length))
    }
  }

  test("semi/anti join: every kept customer has a big order, none low-priority") {
    val got = SparkEntry.queries("q_semi_anti")(spark, sf)
    assert(got.count() > 0)
    val ord = Tables.load(spark, sf, "orders")
    val lowCust = ord.filter(ord("o_orderpriority") === "5-LOW")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    got.collect().foreach(r => assert(!lowCust.contains(r.getAs[Long]("c_custkey"))))
  }

  test("rollup has grand-total row equal to orders count") {
    val rows = SparkEntry.queries("q_rollup")(spark, sf).collect()
    val total = Tables.load(spark, sf, "orders").count()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getAs[Long]("n_orders") == total)
  }

  test("cube lattice: every gid stratum re-partitions the orders count") {
    val rows = SparkEntry.queries("q_cube")(spark, sf).collect()
    val total = Tables.load(spark, sf, "orders").count()
    // all four grouping sets present; each stratum sums to the total
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    byGid.foreach { case (gid, rs) =>
      assert(rs.map(_.getAs[Long]("n_orders")).sum == total, s"gid $gid")
    }
    // gid bit convention: 3 = grand total (both keys null), exactly once
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1 && grand.head.isNullAt(0) && grand.head.isNullAt(1))
  }

  test("grouping sets: exactly the three requested strata, each a partition of orders") {
    val rows = SparkEntry.queries("q_grouping_sets")(spark, sf).collect()
    val total = Tables.load(spark, sf, "orders").count()
    // gid over (status, priority, quarter), bit=1 means aggregated-out:
    // (status, priority) -> 001=1, (status, quarter) -> 010=2, () -> 111=7.
    // The skipped lattice members (0, 3, 4, 5, 6) must NOT appear.
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(1L, 2L, 7L))
    byGid.foreach { case (gid, rs) =>
      assert(rs.map(_.getAs[Long]("n_orders")).sum == total, s"gid $gid")
    }
    // each stratum nulls exactly its aggregated-out keys
    assert(byGid(1L).forall(r => !r.isNullAt(0) && !r.isNullAt(1) && r.isNullAt(2)))
    assert(byGid(2L).forall(r => !r.isNullAt(0) && r.isNullAt(1) && !r.isNullAt(2)))
    assert(byGid(7L).length == 1)
  }

  test("value percentiles: rank cuts pick actual observations") {
    import spark.implicits._
    import java.sql.Timestamp
    // 100 values 1..100 of one type: cut rank ⌈100·p/100⌉ = p, so
    // each percentile is exactly its value
    val ev = (1 to 100).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d"),
        (i % 7).toLong, "T", i.toDouble, null: String)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Analytics.valuePercentiles(ev).collect().head
    assert(r.getAs[Double]("p25_value") == 25.0)
    assert(r.getAs[Double]("p50_value") == 50.0)
    assert(r.getAs[Double]("p75_value") == 75.0)
    assert(r.getAs[Double]("p95_value") == 95.0)
    assert(r.getAs[Double]("max_value") == 100.0)
    // sf data: every percentile is an observed value of its type,
    // monotone across the cuts
    val rows = SparkEntry.queries("events_value_percentiles")(spark, sf)
      .collect()
    val byType = Tables.load(spark, sf, "events").collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Double]("value")).toSet).toMap
    rows.foreach { row =>
      val vals = byType(row.getAs[String]("event_type"))
      val ps = Seq("p25_value", "p50_value", "p75_value", "p95_value")
        .map(row.getAs[Double])
      ps.foreach(p => assert(vals.contains(p)))
      assert(ps.zip(ps.tail).forall { case (a, b) => b >= a })
    }
  }

  test("forecast backtest: exact weekly pattern zeroes the seasonal MAE") {
    import spark.implicits._
    import java.sql.Timestamp
    import java.time.LocalDate
    val maxd = LocalDate.of(2024, 2, 4)
    val start = maxd.minusDays(27)
    // type P: count on day i is 5 + (i % 7) — identical across all 4
    // weeks, so the dow-mean predicts the test week perfectly.
    // type Q: train-silent, all events on the last day (zero-filled
    // grid: 21 silent train days are inputs, not missing rows).
    val ev = ((0 until 28).flatMap { i =>
      val day = start.plusDays(i.toLong)
      (0 until 5 + (i % 7)).map { j =>
        (i * 100L + j, Timestamp.valueOf(day.atTime(12, 0, j)),
          j.toLong, "P", 1.0, null: String)
      }
    } ++ (0 until 14).map { j =>
      (10000L + j, Timestamp.valueOf(maxd.atTime(9, 0, j)),
        j.toLong, "Q", 1.0, null: String)
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.Analytics.forecastBacktest(ev)
      .collect().map(r => r.getString(0) -> r).toMap
    val p = got("P")
    assert(p.getAs[Long]("n_train") == 168L) // 21·5 + 3·(0+…+6)
    assert(p.getAs[Long]("n_test") == 56L)   // 7·5 + (0+…+6)
    assert(p.getAs[Double]("mae_seasonal") == 0.0)
    assert(p.getAs[Double]("mae_naive") == 252.0 / 147.0)
    val qr = got("Q")
    assert(qr.getAs[Long]("n_train") == 0L)
    assert(qr.getAs[Long]("n_test") == 14L)
    // one nonzero test day against an all-zero train: both
    // predictors predict 0, MAE = 14/7 = 2 events/day
    assert(qr.getAs[Double]("mae_seasonal") == 2.0)
    assert(qr.getAs[Double]("mae_naive") == 2.0)
    // sf data: MAEs non-negative, train+test consistent with the grid
    SparkEntry.queries("events_forecast_backtest")(spark, sf)
      .collect().foreach { r =>
        assert(r.getAs[Double]("mae_seasonal") >= 0.0)
        assert(r.getAs[Double]("mae_naive") >= 0.0)
        assert(r.getAs[Long]("n_train") >= 0L)
      }
  }

  test("consecutive dedup: only exact (type, value) repeats count") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "A", 1.0, null: String),
      (2L, Timestamp.valueOf("2024-01-01 00:02:00"), 1L, "A", 1.0, null: String),
      (3L, Timestamp.valueOf("2024-01-01 00:03:00"), 1L, "A", 2.0, null: String),
      (4L, Timestamp.valueOf("2024-01-01 00:04:00"), 1L, "B", 1.0, null: String),
      (5L, Timestamp.valueOf("2024-01-01 00:05:00"), 1L, "B", 1.0, null: String))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.Analytics.dedupConsecutive(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_consecutive_dups"))).toMap
    // event 2 repeats (A, 1.0); event 3 changes value — NOT a dup;
    // event 5 repeats (B, 1.0)
    assert(got("A") == ((3L, 1L)) && got("B") == ((2L, 1L)))
  }

  test("keyphrases: corpus-wide idf, per-source rank, hand-computed scores") {
    import spark.implicits._
    // "big data" appears in 1 of 2 docs → idf ⌊log2 2⌋ = 1, tf 2 →
    // score 2; "data lake" in both docs → idf ⌊log2 1⌋ = 0 → score 0
    val docs = Seq(
      (1L, "s", "big data big data lake"),
      (2L, "s", "data lake")).toDF("doc_id", "source", "text")
    val got = graft.ml.TextAnalysis.keyphrases(docs,
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getAs[String]("keyphrase") ->
        (r.getAs[Long]("score"), r.getAs[Long]("rk"))).toMap
    assert(got("big data") == ((2L, 1L)))
    assert(got("data lake")._1 == 0L)
  }

  test("markov stationary: symmetric two-state chain equalizes; mass ≈ scale") {
    import spark.implicits._
    import java.sql.Timestamp
    // one user alternating A→B→A→… : transitions A→B and B→A only,
    // perfectly symmetric → π(A) = π(B) exactly (identical integer
    // updates each round), tie broken alphabetically
    val ev = (0 until 10).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"),
        1L, if (i % 2 == 0) "A" else "B", 0.0, null: String)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.Analytics.markovStationary(ev).collect()
    assert(got.map(_.getAs[String]("event_type")).toSeq == Seq("A", "B"))
    assert(got(0).getAs[Long]("pi_fp") == got(1).getAs[Long]("pi_fp"))
    // full corpus: ranks contiguous, total mass within floor leakage
    // of the fixed-point scale (each round floors < 3 units per node
    // and per edge)
    val rows = SparkEntry.queries("events_markov_stationary")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("rk")).sorted.sameElements(
      1L to rows.length))
    val total = rows.map(_.getAs[Long]("pi_fp")).sum
    val scale = graft.operators.Analytics.StationaryScale
    assert(total <= scale && total > scale - 1000000L, s"mass $total")
  }

  test("sessionize: session event counts sum to total events") {
    val rows = SparkEntry.queries("events_sessionize")(spark, sf).collect()
    val total = Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("funnel: stage counts are monotone non-increasing") {
    val r = SparkEntry.queries("events_funnel")(spark, sf).collect().head
    val (u, s, c, p) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_signup"),
      r.getAs[Long]("n_click_after"), r.getAs[Long]("n_purchase_after"))
    assert(u >= s && s >= c && c >= p && s > 0)
  }

  test("retention: week-0 actives equal each cohort's size") {
    val rows = SparkEntry.queries("events_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("offset_w") >= 0))
    val week0 = rows.filter(_.getAs[Long]("offset_w") == 0)
      .map(_.getAs[Long]("n_active")).sum
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(week0 == users)
  }

  test("pivot: per-status priority counts sum to orders total") {
    val rows = SparkEntry.queries("q_pivot")(spark, sf).collect()
    val total = Tables.load(spark, sf, "orders").count()
    val sum = rows.map(r =>
      graft.operators.Analytics.OrderPriorities.map(r.getAs[Long]).sum).sum
    assert(sum == total)
  }

  test("median price sits within each group's min/max") {
    val ord = Tables.load(spark, sf, "orders")
    import org.apache.spark.sql.functions.{max, min}
    val bounds = ord.groupBy("o_orderpriority")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    SparkEntry.queries("q_median_price")(spark, sf).collect().foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("o_orderpriority"))
      val m = r.getAs[Double]("median_price")
      assert(m >= lo && m <= hi)
    }
  }

  test("returned items: top-20 revenue is sorted and only from returned lines") {
    val rows = SparkEntry.queries("q10_returned_items")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("disjunctive revenue: totals equal a driver-side recomputation") {
    import org.apache.spark.sql.functions.col
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").collect()
    val parts = Tables.load(spark, sf, "part")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val expectN = li.count { r =>
      parts.get(r.getLong(0)).exists { case (b, s) =>
        val q = r.getDouble(1)
        (b == "Brand#1" && s >= 1 && s <= 15 && q >= 1 && q <= 20) ||
        (b == "Brand#2" && s >= 10 && s <= 30 && q >= 10 && q <= 30) ||
        (b == "Brand#3" && s >= 20 && s <= 50 && q >= 20 && q <= 40)
      }
    }
    val got = SparkEntry.queries("q19_disjunctive_revenue")(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_items") == expectN.toLong)
  }

  test("quantile sketch: estimates bracket the true per-group percentiles loosely") {
    import org.apache.spark.sql.functions.col
    val exact = Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    SparkEntry.queries("q_quantile_sketch")(spark, sf).collect().foreach { r =>
      val vs = exact(r.getAs[String]("g"))
      val (p50, p90) = (r.getAs[Double]("est_p50"), r.getAs[Double]("est_p90"))
      assert(p50 >= vs.head && p50 <= vs.last)
      assert(p90 >= p50 && p90 <= vs.last)
      // a 256-point uniform sample's median lands within the exact
      // 35th..65th percentile band w.h.p. — loose, deterministic check
      val (lo, hi) = (vs((vs.length - 1) * 35 / 100), vs((vs.length - 1) * 65 / 100))
      assert(p50 >= lo && p50 <= hi, s"p50 $p50 outside [$lo,$hi]")
    }
  }

  test("window running: per-customer running spend is non-decreasing") {
    val rows = SparkEntry.queries("q_window_running")(spark, sf).collect()
    assert(rows.length == Tables.load(spark, sf, "orders").count())
    rows.groupBy(_.getAs[Long]("o_custkey")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("order_seq"))
      assert(sorted.map(_.getAs[Long]("order_seq")).sameElements(1L to g.length))
      val run = sorted.map(_.getAs[Double]("running_spend"))
      assert(run.zip(run.tail).forall { case (a, b) => b >= a })
    }
  }

  test("q7 pairs are distinct nations within the ship window") {
    val rows = SparkEntry.queries("q7_volume_shipping")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("cust_nation") != r.getAs[String]("supp_nation"))
      assert(r.getAs[Double]("revenue") > 0)
      val y = r.getAs[Long]("l_year")
      assert(y == 1996L || y == 1997L)
    }
  }

  test("q14 promo share is a percentage and months are 1996") {
    val rows = SparkEntry.queries("q14_promo_revenue")(spark, sf).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val m = r.getAs[Long]("ship_month")
      assert(m >= 199601L && m <= 199612L)
      val pct = r.getAs[Double]("promo_pct")
      assert(pct >= 0.0 && pct <= 100.0)
      assert(r.getAs[Double]("total_revenue") > 0)
    }
  }

  test("q15 returns the suppliers tied at the quarter-revenue maximum") {
    val rows = SparkEntry.queries("q15_top_supplier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1) // every returned supplier carries the max
  }

  test("q17 small-quantity lines are strictly below a fifth of their part's average") {
    val r = SparkEntry.queries("q17_small_qty_revenue")(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_items")
    assert(n >= 0)
    if (n > 0) assert(r.getAs[Double]("avg_yearly") > 0)
  }

  test("q21 numwait is positive and sorted descending") {
    val rows = SparkEntry.queries("q21_waiting_suppliers")(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val w = rows.map(_.getAs[Long]("numwait"))
    assert(w.forall(_ >= 1L))
    assert(w.zip(w.tail).forall { case (a, b) => a >= b })
  }

  test("q2 suppliers all quote their part's minimum price") {
    val rows = SparkEntry.queries("q2_min_cost_supplier")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("p_partkey")).values.foreach { g =>
      assert(g.map(_.getAs[Double]("min_price")).distinct.length == 1)
      assert(g.head.getAs[Double]("min_price") > 0)
    }
  }

  test("events_top_paths returns 3-step paths in descending frequency") {
    val rows = SparkEntry.queries("events_top_paths")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[String]("path").count(_ == '>') == 2)
    }
  }

  test("q6 is a single-row filtered aggregate with positive revenue") {
    val r = SparkEntry.queries("q6_forecast_revenue")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_items") > 0)
    assert(r.getAs[Double]("revenue") > 0)
  }

  test("q16 counts distinct suppliers, never more than lines") {
    val rows = SparkEntry.queries("q16_supplier_variety")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("supplier_cnt") >= 1)
      assert(r.getAs[Long]("supplier_cnt") <= r.getAs[Long]("n_lines"))
    }
    val cnts = rows.map(_.getAs[Long]("supplier_cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("q20 dominant suppliers each dominate at least one part") {
    val rows = SparkEntry.queries("q20_bulk_suppliers")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getAs[Long]("n_parts_dominated") >= 1))
    // strictly >20% share means at most 4 suppliers qualify per part
    val nParts = Tables.load(spark, sf, "part").count()
    assert(rows.map(_.getAs[Long]("n_parts_dominated")).sum <= 4 * nParts)
  }

  test("q22 keeps only above-average balances among recently-inactive customers") {
    val rows = SparkEntry.queries("q22_sales_opportunity")(spark, sf).collect()
    assert(rows.nonEmpty)
    // threshold property: each segment's average kept balance exceeds
    // the global average positive balance that defines the gate
    import org.apache.spark.sql.functions.{avg, col}
    val cust = Tables.load(spark, sf, "customer")
    val posAvg = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")))
      .collect()(0).getDouble(0)
    rows.foreach { r =>
      val avgKept = r.getAs[Double]("total_acctbal") / r.getAs[Long]("n_cust")
      assert(avgKept > posAvg,
        s"segment ${r.getAs[String]("c_mktsegment")}: $avgKept <= $posAvg")
    }
  }

  test("anomalies carry |z| > 2 and match a driver-side recomputation") {
    val rows = SparkEntry.queries("events_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("z")) > 2.0))
    // recompute one flagged user's z directly from the raw events
    val u = rows.head.getAs[Long]("user_id")
    val vals = Tables.load(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("user_id") === u)
      .select("event_id", "value").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value")).toMap
    val n = vals.size.toDouble
    val mean = vals.values.sum / n
    val variance = vals.values.map(v => (v - mean) * (v - mean)).sum / (n - 1)
    val e = rows.head
    val zRecomputed = (vals(e.getAs[Long]("event_id")) - mean) / math.sqrt(variance)
    assert(math.abs(e.getAs[Double]("z") - zRecomputed) < 1e-6)
  }

  test("rolling 7-day active users bounds daily actives and total users") {
    val rows = SparkEntry.queries("events_rolling_active")(spark, sf).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions.{col, countDistinct, to_date}
    val ev = Tables.load(spark, sf, "events")
    val totalUsers = ev.agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val daily = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy("day").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("day")
      val a = r.getAs[Long]("active_7d")
      assert(a <= totalUsers)
      assert(a >= daily(d), s"window active $a below same-day active ${daily(d)}")
    }
  }

  test("above-average orders are a strict subset with higher mean value") {
    val rows = SparkEntry.queries("q_above_avg_orders")(spark, sf).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions.{avg, col, count}
    val ord = Tables.load(spark, sf, "orders")
    val nAll = ord.count()
    val globalAvg = ord.agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    val nAbove = rows.map(_.getAs[Long]("n_above")).sum
    assert(nAbove > 0 && nAbove < nAll)
    // per-segment mean of kept orders exceeds the global mean: kept
    // orders beat their own customer's average, which lifts the pool
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_above") / r.getAs[Long]("n_above") > globalAvg * 0.8)
    }
  }

  test("attribution credits every purchase to exactly one channel") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("events_attribution")(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_conversions")).sum == purchases)
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(!channels.contains("purchase")) // a purchase never self-attributes
    // driver recompute: last non-purchase event before each purchase
    val all = ev.select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("event_type")))
    val lookbackUs = 7L * 86400000000L
    def us(t: java.sql.Timestamp) = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val expect = all.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (us(e._3), e._2))
      sorted.zipWithIndex.collect {
        case (e, i) if e._4 == "purchase" =>
          val touch = sorted.take(i).filter(_._4 != "purchase").lastOption
          touch match {
            case Some(t) if us(e._3) - us(t._3) <= lookbackUs => t._4
            case _ => "direct"
          }
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(expect(r.getAs[String]("channel")) ==
        r.getAs[Long]("n_conversions"), r.getAs[String]("channel"))
    }
    // first-touch twin: same conversion total, credit may move to
    // earlier channels but the two reports cover identical purchases
    val ft = SparkEntry.queries("events_attribution_first")(spark, sf)
      .collect()
    assert(ft.map(_.getAs[Long]("n_conversions")).sum == purchases)
    val ftExpect = all.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (us(e._3), e._2))
      sorted.zipWithIndex.collect {
        case (e, i) if e._4 == "purchase" =>
          sorted.take(i).find(_._4 != "purchase") match {
            case Some(t) if us(e._3) - us(t._3) <= lookbackUs => t._4
            case _ => "direct"
          }
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    ft.foreach { r =>
      assert(ftExpect(r.getAs[String]("channel")) ==
        r.getAs[Long]("n_conversions"), "first-touch " + r.getAs[String]("channel"))
    }
  }

  test("gap detection flags exactly the keys with an oversized id jump") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("events_gap_detection")(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")))
    val nUsers = ev.map(_._1).distinct.length.toLong
    val expect = ev.groupBy(_._1).flatMap { case (u, es) =>
      val ids = es.map(_._2).sorted
      val gaps = ids.zip(ids.tail).map { case (a, b) => b - a }
      val big = gaps.count(_ > nUsers * 8).toLong
      if (big > 0) Some(u -> (ids.length.toLong, big, gaps.max)) else None
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, g, m) = expect(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("n_gaps") == g)
      assert(r.getAs[Long]("max_gap") == m)
    }
  }

  test("dwell-time transitions cover each observed pair once with positive gaps") {
    val rows = SparkEntry.queries("events_dwell_time")(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
    assert(keys.distinct.length == keys.length)
    rows.foreach(r => assert(r.getAs[Double]("avg_gap_sec") >= 0.0))
    // total transition count = events minus one per multi-event user
    import org.apache.spark.sql.functions.{col, count}
    val ev = Tables.load(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
  }

  test("q9 profit groups cover only red parts' nations and years") {
    val rows = SparkEntry.queries("q9_product_profit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val years = rows.map(_.getAs[Long]("o_year"))
    assert(years.forall(y => y >= 1995 && y <= 2001))
    // revenue minus 60%-of-retail cost: every group saw at least a line
    rows.foreach(r => assert(r.getAs[Long]("n_lines") >= 1))
    // sorted by (nation, year)
    val keys = rows.map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year")))
    assert(keys.sameElements(keys.sorted))
  }

  test("q11 keeps only parts above 1/2000 of the nation's total value") {
    val rows = SparkEntry.queries("q11_important_stock")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getAs[Double]("stock_value"))
    assert(vals.sameElements(vals.sortBy(-_)))
    // each kept part's share strictly exceeds the 1/2000 threshold of
    // the total implied by the shares themselves (sum(all) >= sum(kept))
    val keptSum = vals.sum
    vals.foreach(v => assert(v * 2000 > keptSum * 0.999,
      s"kept value $v not above threshold vs kept-sum $keptSum"))
  }

  test("q12 buckets partition the year's lineitems by priority") {
    val rows = SparkEntry.queries("q12_priority_shipping")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 3)
    val total = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    import org.apache.spark.sql.functions.{col, lit}
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01")).count()
    assert(total == expected)
  }

  test("table profile matches per-column driver-side recomputation") {
    val rows = SparkEntry.queries("q_profile_table")(spark, sf).collect()
    assert(rows.length == 6)
    val o = Tables.load(spark, sf, "orders")
    val n = o.count()
    rows.foreach(r => assert(r.getAs[Long]("n_rows") == n))
    val byCol = rows.map(r => r.getAs[String]("col_name") -> r).toMap
    // spot-check one numeric, one string, and the timestamp column
    assert(byCol("o_custkey").getAs[Long]("n_distinct") ==
      o.select("o_custkey").distinct().count())
    assert(byCol("o_orderstatus").getAs[String]("min_str") ==
      o.agg(org.apache.spark.sql.functions.min("o_orderstatus"))
        .collect()(0).getString(0))
    assert(byCol("o_orderstatus").isNullAt(
      byCol("o_orderstatus").fieldIndex("min_num")))
    val tsMin = byCol("o_orderdate").getAs[Double]("min_num")
    val expectTs = o.agg(org.apache.spark.sql.functions
        .min(org.apache.spark.sql.functions
          .unix_micros(org.apache.spark.sql.functions.col("o_orderdate")
            .cast("timestamp")))).collect()(0).getLong(0)
    assert(tsMin == expectTs.toDouble)
  }

  test("table profile plan is one scan (Expand, no join, no reused scan)") {
    val df = SparkEntry.queries("q_profile_table")(spark, sf)
    // string-count the scans: the un-executed plan is wrapped in
    // AdaptiveSparkPlan, so collectLeaves would only see the wrapper
    val plan = df.queryExecution.executedPlan.toString()
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single parquet scan:\n$plan")
    assert(plan.contains("Expand"), "exact multi-column distincts should Expand")
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
  }

  test("markov rows are a probability matrix over all observed transitions") {
    val rows = SparkEntry.queries("events_markov")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every user timeline of k events contributes k-1 transitions
    val ev = Tables.load(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_trans")).sum == nEvents - nUsers)
    // conditional probabilities sum to 1 within each from_type
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, g) =>
      val s = g.map(_.getAs[Double]("p_trans")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"P(.|$ft) sums to $s")
    }
    // lift is p_trans over the destination's base rate
    val nAll = (nEvents - nUsers).toDouble
    val nTo = rows.groupBy(_.getAs[String]("to_type"))
      .map { case (t, g) => t -> g.map(_.getAs[Long]("n_trans")).sum }
    rows.foreach { r =>
      val expect = r.getAs[Double]("p_trans") /
        (nTo(r.getAs[String]("to_type")) / nAll)
      assert(math.abs(r.getAs[Double]("lift") - expect) < 1e-9)
    }
  }

  test("co-occurrence pairs match driver-side user-set intersections") {
    val rows = SparkEntry.queries("events_cooccurrence")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, sf, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ev.groupBy(_._2).map { case (t, g) => t -> g.map(_._1).toSet }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b, s"pair ($a,$b) not in canonical order")
      val (sa, sb) = (byType(a), byType(b))
      val both = (sa & sb).size.toLong
      assert(r.getAs[Long]("n_both") == both)
      assert(r.getAs[Long]("n_a") == sa.size && r.getAs[Long]("n_b") == sb.size)
      val jac = both.toDouble / (sa.size + sb.size - both)
      assert(math.abs(r.getAs[Double]("jaccard") - jac) < 1e-12)
    }
    // every pair with at least one shared user is present
    val types = byType.keys.toSeq.sorted
    val expectPairs = for {
      i <- types.indices; j <- (i + 1) until types.length
      if (byType(types(i)) & byType(types(j))).nonEmpty
    } yield (types(i), types(j))
    assert(rows.length == expectPairs.length)
  }

  test("interarrival histogram: mass = events - users, buckets bound gaps") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.load(spark, sf, "events").filter(col("ts").isNotNull)
    val rows = operators.Analytics.eventsInterarrival(spark, sf).collect()
    assert(rows.nonEmpty)
    // each user's first event has no gap; every other event lands in
    // exactly one bucket
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == ev.count() - nUsers)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (lo, hi) = (r.getAs[Long]("min_gap_us"), r.getAs[Long]("max_gap_us"))
      assert(lo <= hi)
      if (b == -1L) assert(lo == 0L && hi == 0L)
      else {
        assert(lo >= (1L << b.toInt) && hi < (1L << (b.toInt + 1)))
      }
    }
  }

  test("bot detection flags exactly the planted compressed users") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Analytics.eventsBotDetection(spark, sf).collect()
    val flagged = rows.map(_.getAs[Long]("user_id")).toSet
    // the planting compresses user_id%31==0 timelines 1000x; with
    // human medians ~7h vs the 120s line, flagged == planted exactly
    val planted = Tables.load(spark, sf, "events")
      .filter(col("ts").isNotNull && col("user_id") % 31 === 0)
      .select(col("user_id")).distinct().collect()
      .map(_.getAs[Long]("user_id")).toSet
    assert(flagged == planted && flagged.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("median_gap_us") < 120000000L)
      assert(r.getAs[Long]("n_events") > 1L)
    }
  }

  test("ab test equals a driver-side exact-decimal replay") {
    import org.apache.spark.sql.functions.col
    val got = operators.Analytics.eventsAbTest(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val ev = Tables.load(spark, sf, "events").filter(col("ts").isNotNull)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getAs[String]("event_type"),
        if (r.getAs[Long]("user_id") % 2 == 0) "A" else "B",
        BigDecimal(r.getAs[Double]("value"))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    ev.groupBy(_._1).foreach { case (tpe, g) =>
      val r = got(tpe)
      def stats(arm: String): (Long, Double, Double) = {
        val xs = g.filter(_._2 == arm).map(_._3)
        val n = xs.length.toLong
        val s = xs.sum.toDouble
        val s2 = xs.map(x => x * x).sum.toDouble
        val mean = s / n.toDouble
        val v = (n.toDouble * s2 - s * s) / (n.toDouble * (n - 1).toDouble)
        (n, mean, v)
      }
      val (na, ma, va) = stats("A")
      val (nb, mb, vb) = stats("B")
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
      assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-9)
      assert(math.abs(r.getAs[Double]("var_a") - va) < 1e-6)
      val t = (ma - mb) / math.sqrt(va / na + vb / nb)
      assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-6)
    }
  }

  test("cusum: window identity equals the clamped recursion replay") {
    import spark.implicits._
    import java.sql.Timestamp
    // type "shift": 2/day for days 0-9, then 12/day for days 10-14 —
    // the accumulating drift a point-outlier detector misses; type
    // "flat": 4/day throughout — never alarms. Day 7 is silent for
    // "shift" (the spine must zero-fill it).
    def at(day: Int, n: Int, tpe: String): Seq[(Long, Timestamp, Long, String, Double, String)] =
      (0 until n).map { j =>
        (day * 100L + j, Timestamp.valueOf(f"2024-03-${day + 1}%02d 08:00:$j%02d"),
          j.toLong, tpe, 1.0, null: String)
      }
    val rows = (0 to 14).flatMap { d =>
      val shift = if (d == 7) Nil
        else at(d, if (d < 10) 2 else 12, "shift")
      shift ++ at(d, 4, "flat")
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.Analytics.cusum(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // driver replay of S_t = max(0, S_{t-1} + x_t*D - total) per type
    def replay(xs: Seq[Long]): (Seq[Long], Long) = {
      val d = xs.length
      val total = xs.sum
      val stats = xs.scanLeft(0L) { (s, x) =>
        math.max(0L, s + x * d - total)
      }.tail
      (stats, total)
    }
    Seq(
      "shift" -> (0 to 14).map(d => if (d == 7) 0L else if (d < 10) 2L else 12L),
      "flat" -> Seq.fill(15)(4L)).foreach { case (tpe, xs) =>
      val (stats, total) = replay(xs)
      val alarms = stats.zipWithIndex.filter { case (s, _) =>
        s * graft.operators.Analytics.CusumThreshDiv > total * xs.length
      }
      val r = got(tpe)
      assert(r.getAs[Long]("n_days") == xs.length.toLong)
      assert(r.getAs[Long]("total_events") == total)
      assert(r.getAs[Long]("n_alarm_days") == alarms.length.toLong)
      assert(r.getAs[Long]("first_alarm_idx") ==
        alarms.headOption.map(_._2.toLong).getOrElse(-1L))
      assert(r.getAs[Long]("max_stat_scaled") == stats.max)
    }
    // the construction behaves as designed: the shift alarms, the
    // flat baseline never does
    assert(got("shift").getAs[Long]("n_alarm_days") > 0)
    assert(got("flat").getAs[Long]("n_alarm_days") == 0)
    // sf invariants: stat nonnegative, alarms consistent with count
    SparkEntry.queries("events_cusum")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("max_stat_scaled") >= 0)
      if (r.getAs[Long]("n_alarm_days") == 0)
        assert(r.getAs[Long]("first_alarm_idx") == -1L)
      else assert(r.getAs[Long]("first_alarm_idx") >= 0)
    }
  }

  test("countmin: estimates never undercount, and a planted colliding stream is exact-summed") {
    val rows = SparkEntry.queries("events_countmin")(spark, sf).collect()
    assert(rows.length <= graft.operators.Analytics.CmsTopN)
    rows.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"user ${r.getAs[Long]("user_id")}: CMS undercounted")
      assert(r.getAs[Long]("cms_estimate") ===
        r.getAs[Long]("n_true") + r.getAs[Long]("overestimate"))
    }
    // sketch-order ranking: estimates non-increasing down the cut
    val est = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("cms_estimate"))
    est.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => () }
    // hand case: two users forced into one stream each; a single-user
    // sketch row is exact when it owns all four of its counters, and
    // the estimate equals truth + exactly its co-resident mass when
    // it collides in every row (pigeonhole over w=256 can't be
    // forced, so assert only the two-sided bound)
    import spark.implicits._
    val ev = (1 to 30).map(i => (100L, s"e$i")) ++ (1 to 7).map(i => (200L, s"x$i"))
    val df = ev.toDF("user_id", "event_type")
    val got = graft.operators.Analytics.countMinAccuracy(df).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("cms_estimate"))).toMap
    assert(got(100L)._1 === 30L && got(100L)._2 >= 30L && got(100L)._2 <= 37L)
    assert(got(200L)._1 === 7L && got(200L)._2 >= 7L && got(200L)._2 <= 37L)
  }

  test("autocorr: a period-2 daily series scores exactly 1.0 at lag 2") {
    import spark.implicits._
    import java.sql.Timestamp
    // 10 days alternating 1/3 events: at lag 2 the lagged series IS
    // the original (r = 1.0 exactly — integer cross-products, no
    // rounding slack needed); at lag 1 it anti-correlates.
    val rows = for {
      d <- 0 until 10
      k <- 0 until (if (d % 2 == 0) 1 else 3)
    } yield (Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:0$k"), "t")
    val ev = rows.toDF("ts", "event_type")
    val got = graft.operators.Analytics.eventsAutocorr(ev).collect()
      .map(r => r.getAs[Long]("lag") -> r).toMap
    assert(got(2L).getAs[Double]("r") === 1.0)
    assert(got(1L).getAs[Double]("r") < 0.0)
    got.foreach { case (l, r) =>
      assert(r.getAs[Long]("n_pairs") === 10 - l)
      if (!r.isNullAt(r.fieldIndex("r"))) {
        val v = r.getAs[Double]("r")
        assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12)
      }
    }
  }

  test("countmin: shard sketches merge by addition (counter matrices are distributive)") {
    // THE 100 TB claim: build the sketch on two disjoint shards,
    // add the counter matrices, and get exactly the whole-stream
    // sketch — no other sketch state, no ordering sensitivity.
    val ev = Tables.load(spark, sf, "events")
    val whole = graft.operators.Analytics.cmsCounters(ev).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("cms_col")) ->
        r.getAs[Long]("c")).toMap
    def shard(pred: String) =
      graft.operators.Analytics.cmsCounters(ev.filter(pred)).collect()
        .map(r => (r.getAs[Long]("r"), r.getAs[Long]("cms_col")) ->
          r.getAs[Long]("c")).toMap
    val a = shard("event_id % 2 = 0")
    val b = shard("event_id % 2 <> 0")
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === whole,
      "adding per-shard counter matrices must reproduce the whole-stream sketch")
  }

  test("cohort LTV triangle ties out on a planted two-cohort feed") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-06-$d%02d $h%02d:00:00")
    // users 1,2 start week 0; user 3 starts week 1 (day 9)
    val ev = Seq(
      (1L, ts(1, 0), 1L, "e", 1.00),  // w0 a0
      (2L, ts(2, 0), 2L, "e", 2.00),  // w0 a0
      (3L, ts(9, 0), 1L, "e", 3.00),  // w0 a1 (8d after u1's first)
      (4L, ts(9, 12), 3L, "e", 4.00), // w1 a0
      (5L, ts(17, 0), 3L, "e", 5.00)  // w1 a1
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Analytics.cohortLtvOn(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("value_cents"),
          r.getAs[Long]("cohort_size"),
          r.getAs[Double]("cum_ltv_per_user"))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 300L, 2L, 1.5)),   // u1+u2 first week
      (0L, 1L) -> ((1L, 300L, 2L, 3.0)),   // u1 returns: cum 600/2
      (1L, 0L) -> ((1L, 400L, 1L, 4.0)),
      (1L, 1L) -> ((1L, 500L, 1L, 9.0))))
  }

  test("conversion lag picks exact rank percentiles on planted delays") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // 4 converters with delays 1,2,3,4 minutes; 1 signup never converts;
    // a pre-signup purchase must not count
    val ev = (Seq(
      (1L, ts(0), 1L, "signup", 0.0), (2L, ts(1), 1L, "purchase", 1.0),
      (3L, ts(0), 2L, "signup", 0.0), (4L, ts(2), 2L, "purchase", 1.0),
      (5L, ts(0), 3L, "signup", 0.0), (6L, ts(3), 3L, "purchase", 1.0),
      (7L, ts(0), 4L, "signup", 0.0), (8L, ts(4), 4L, "purchase", 1.0),
      (9L, ts(0), 5L, "signup", 0.0),
      (10L, ts(0), 6L, "purchase", 1.0), (11L, ts(1), 6L, "signup", 0.0))
    ).map { case (id, t, u, ty, v) => (id, t, u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Analytics.conversionLagOn(ev).collect().head
    val min = 60000000L // one minute in µs
    assert(r.getAs[Long]("n_signups") === 6L)
    assert(r.getAs[Long]("n_converted") === 4L)
    // ceil-rank picks over delays [1,2,3,4] min: p25→rank1, p50→rank2,
    // p75→rank3, p90→rank4 (⌈4·90/100⌉ = 4)
    assert(r.getAs[Long]("p25_delay_us") === 1 * min)
    assert(r.getAs[Long]("p50_delay_us") === 2 * min)
    assert(r.getAs[Long]("p75_delay_us") === 3 * min)
    assert(r.getAs[Long]("p90_delay_us") === 4 * min)
    assert(r.getAs[Long]("max_delay_us") === 4 * min)
  }

  test("sniff mismatch: every planted wrong-container doc is caught, none invented") {
    val rows = SparkEntry.queries("multimodal_sniff_mismatch")(spark, sf)
      .collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val planted = docs.count(id => Math.floorMod(id, 17L) == 0L)
    val mism = rows.filter(_.getAs[Boolean]("mismatch"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(mism === planted, "mismatch census must equal the planted fault count")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.length)
    // nothing sniffs as unknown: every synthesized container is valid
    assert(!rows.exists(_.getAs[String]("sniffed_kind") == "unknown"))
    // the planted fault maps declared k to sniffed (k+1) mod 3 only
    rows.filter(_.getAs[Boolean]("mismatch")).foreach { r =>
      val next = Map("image" -> "audio", "audio" -> "video", "video" -> "image")
      assert(r.getAs[String]("sniffed_kind") ===
        next(r.getAs[String]("declared_kind")))
    }
  }
}
