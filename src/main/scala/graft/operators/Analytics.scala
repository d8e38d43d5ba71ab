package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch analytics surface over the star schema (SURVEY.md §2B).
  *
  * Numeric discipline: every aggregate the DuckDB oracle re-computes
  * is carried in DECIMAL (exact, order-independent) and only cast to
  * double at the very end — double summation order differs between
  * engines, decimal summation doesn't.
  *
  * Scale notes: all transforms are single-pass declarative plans —
  * filters/projections reach the parquet scan, fact-side aggregates
  * are partial (map-side) before the one unavoidable shuffle on the
  * group/join key.
  *
  * Join-side policy: only BOUNDED relations (nation/region, 1-row
  * aggregates, top-k sets, non-equi probe sides) carry an explicit
  * broadcast() hint. Scale-growing dimensions (customer/supplier/
  * part) are joined plain: the size threshold + AQE broadcast them
  * at bench SFs — same local plans — and switch to a co-partitioned
  * shuffle at 100 TB, instead of OOMing the driver on a forced hint.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary. One scan + one shuffle on a
    * 6-row group key; partial aggregation does nearly all the work
    * map-side, so this scales linearly with input splits.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val qty   = dec(col("l_quantity"))
    val price = dec(col("l_extendedprice"))
    val disc  = dec(col("l_discount"))
    val tax   = dec(col("l_tax"))
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style shipping priority: filter both fact sides before
    * the join (pushdown), join on keys, top-N with a total order so
    * LIMIT is deterministic across engines.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation through a 6-table join.
    * nation/region broadcast by hint (bounded); customer/supplier
    * broadcast under the size threshold at bench SFs and shuffle at
    * real scale; the lineitem⋈orders fact join shuffles on orderkey.
    */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val cust   = Tables.load(spark, dir, "customer")
    val supp   = Tables.load(spark, dir, "supplier")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val li = Tables.load(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Conditional-aggregate market share: fraction of revenue from one
    * supplier nation per order-year. Numerator/denominator both exact
    * decimal; the ratio is one double division at the end.
    */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.load(spark, dir, "orders")
    val li  = Tables.load(spark, dir, "lineitem")
    val vol = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double") /
         sum(vol).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_year"))
  }

  /** Top-k parts per brand by retail price — window rank with a
    * unique tiebreak so results are stable across engines.
    */
  def qTopPartsPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    part.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_name"),
        col("p_retailprice"), col("rk"))
      .orderBy(col("p_brand"), col("rk"))
  }

  /** Semi/anti join surface: customers with orders above a threshold
    * (EXISTS) that never placed a low-priority order (NOT EXISTS).
    *
    * Both existence tests fold into ONE pass over orders (two
    * conditional max flags in a single aggregate), so the fact table
    * is scanned once and joined once — instead of two scans + a
    * semi- plus an anti-join.
    */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord  = Tables.load(spark, dir, "orders")
    val keep = ord.groupBy(col("o_custkey"))
      .agg(
        max(when(col("o_totalprice") > 150000, 1).otherwise(0)).as("has_big"),
        max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0)).as("has_low"))
      .filter(col("has_big") === 1 && col("has_low") === 0)
      .select(col("o_custkey"))
    cust.join(keep, col("c_custkey") === keep("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Rollup: order counts and totals by (status, priority) hierarchy.
    * Spark ROLLUP == DuckDB ROLLUP; grouping columns surface as NULL
    * at the coarser levels in both.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    ord.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Full CUBE over (status, order quarter) with the grouping_id
    * bitmask — the 2²-subtotal lattice a BI layer asks for in one
    * pass ([[qRollup]] covers the hierarchy prefix case). gid
    * disambiguates a NULL group key from a subtotal row, which the
    * rollup shape gets away without only because its NULLs nest.
    * One shuffle: Spark expands the lattice map-side and aggregates
    * all 4 grouping sets in a single partial+final pair.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .withColumn("o_quarter", quarter(col("o_orderdate")).cast("long"))
    ord.cube(col("o_orderstatus"), col("o_quarter"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_quarter").asc_nulls_first)
  }

  /** Explicit GROUPING SETS over MIXED dimensions — the lattice shape
    * neither [[qRollup]] (a hierarchy prefix) nor [[qCube]] (the full
    * power set) covers: (status, priority), (status, quarter), and
    * the grand total, skipping every other combination. This is the
    * BI-layer contract "give me exactly these three subtotal views in
    * one pass"; computing them as three separate aggregates would
    * scan the fact table three times, while the grouping-set expand
    * is ONE scan + ONE shuffle (Spark's Expand replicates each row
    * map-side once per set, then a single partial+final aggregate
    * pair reduces all three sets together). gid is the same
    * grouping_id bitmask as qCube's, here over three key columns.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .withColumn("o_quarter", quarter(col("o_orderdate")).cast("long"))
    ord.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus"), col("o_quarter")),
          Seq.empty[Column]),
        col("o_orderstatus"), col("o_orderpriority"), col("o_quarter"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first,
        col("o_quarter").asc_nulls_first)
  }

  /** TPC-H Q13-style: customer distribution by order count. Left
    * join so customers with zero orders land in the c_count=0 bucket;
    * two cheap aggregations (per-customer, then per-count).
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18-style: large-volume orders (lineitem quantity sum over
    * a threshold), joined back to order + customer, top by price.
    * The HAVING filter runs on the exact decimal sum pre-join, so the
    * fact table shrinks before touching dimensions.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > 200)
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q4-style: orders with at least one late shipment (shipped
    * more than 90 days after the order date), counted by priority —
    * a semi join with a cross-table inequality.
    */
  def q4LateOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q10-style: revenue lost to returned items per customer,
    * top 20. The big join (lineitem⋈orders) shuffles on the order
    * key; the customer dimension joins under the size threshold.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_returnflag") === "R")
      .join(ord.filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("revenue_d"))
      .orderBy(col("revenue_d").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("revenue_d").cast("double").as("revenue"))
  }

  /** TPC-H Q19-style: disjunctive multi-attribute predicate revenue.
    * The OR-of-ANDs spans both tables, but the single-table halves
    * (brand/size on part, quantity on lineitem) are pushed into each
    * scan as a disjunctive PushedFilter — the scan-level pruning this
    * query exists to exercise — and the part side joins under the
    * size threshold.
    */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    val li = Tables.load(spark, dir, "lineitem")
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 40))
    li.join(part, col("l_partkey") === col("p_partkey") && cond)
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Bounded-memory quantile estimation per group, done PORTABLY: the
    * sample is the k rows with the smallest portable hash of the row
    * key (a deterministic uniform sample — stable across engines,
    * partitioning, and retries, unlike rand() sampling or Spark's
    * internal approx_percentile sketch), and the estimate is an exact
    * order statistic of that sample. At 100 TB the sample bound makes
    * this a fixed-size aggregate; the hash ranking is one window per
    * group.
    */
  val QuantileSampleK = 256

  def qQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val keyed = li.select(col("l_returnflag").as("g"),
      col("l_extendedprice").as("v"),
      graft.functions.Portable.pHash(
        concat_ws("#", col("l_orderkey"), col("l_linenumber"))).as("h"))
    val byHash = Window.partitionBy(col("g")).orderBy(col("h"), col("v"))
    val samp = keyed.withColumn("rn", row_number().over(byHash))
      .filter(col("rn") <= QuantileSampleK)
    val byValue = Window.partitionBy(col("g")).orderBy(col("v"), col("h"))
    val wg = Window.partitionBy(col("g"))
    def target(p: Int) =
      (((col("ns") - 1) * p) / lit(100)).cast("long") + 1
    samp.withColumn("vr", row_number().over(byValue).cast("long"))
      .withColumn("ns", max(col("vr")).over(wg))
      .withColumn("t50", target(50))
      .withColumn("t90", target(90))
      .groupBy(col("g"))
      .agg(max(col("ns")).as("n_sample"),
        max(when(col("vr") === col("t50"), col("v"))).as("est_p50"),
        max(when(col("vr") === col("t90"), col("v"))).as("est_p90"))
      .orderBy(col("g"))
  }

  /** Sessionization over the event stream: a session break is a gap
    * > 30 minutes per user; session ids via cumulative sum of breaks.
    * Single shuffle on user_id, then two windows over the same
    * partitioning (Spark reuses the sort).
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.load(spark, dir, "events"))

  /** [[eventsSessionize]]'s core over any (user_id, ts, event_id,
    * value) relation — split out so tests can drive it with arbitrary
    * in-memory inputs (SessionizeProps) and library users aren't
    * coupled to the parquet catalog.
    */
  def sessionize(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapped = ev.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, lit(1L))
          .otherwise(lit(0L)))
    gapped.withColumn("session_id",
        sum(col("is_break")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("session_value"),
        min(col("ts")).as("session_start"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Session-depth histogram — the engagement-shape gauge over
    * [[sessionize]]'s output: sessions bucketed by ⌊log2(events)⌋
    * (bucket 0 = bounce singletons, the tail = marathon sessions),
    * with each bucket's session count, depth range, event mass, and
    * share. The bounce share and the depth tail are the two numbers
    * a session-gap change moves first — the tuning readout for the
    * 30-minute gap every sessionizer hardcodes.
    *
    * Adds ONE map-side-combined reduce over the session relation
    * (≤64 buckets); shares divide by a 1-row broadcast total.
    */
  def eventsSessionDepth(spark: SparkSession, dir: String): DataFrame = {
    val sessions = sessionize(Tables.load(spark, dir, "events"))
    val buckets = sessions
      .withColumn("bucket", (length(bin(col("n_events"))) - 1).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        min(col("n_events")).as("min_depth"),
        max(col("n_events")).as("max_depth"),
        sum(col("n_events")).as("n_events_total"))
    val total = sessions.agg(count(lit(1)).as("total_sessions"))
    buckets.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_sessions"), col("min_depth"),
        col("max_depth"), col("n_events_total"),
        (col("n_sessions").cast("double") /
          col("total_sessions").cast("double")).as("session_share"))
      .orderBy(col("bucket"))
  }

  /** Ordered-stage funnel over the event stream: per user, first
    * signup, first click at-or-after that signup, first purchase
    * at-or-after that click — then corpus-level stage counts.
    *
    * The sequential dependency (stage N's threshold is stage N-1's
    * timestamp) is expressed as three whole-partition window minima
    * chained over the SAME partitioning, so the plan is one shuffle
    * on user_id and one sort — not three self-joins. Stage counts
    * reduce to a single tiny row.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.load(spark, dir, "events"))

  /** [[eventsFunnel]]'s core over any (user_id, ts, event_type)
    * relation — split out so FunnelProps can drive it with arbitrary
    * in-memory inputs.
    */
  def funnel(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val staged = ev
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") >= col("t1"),
          col("ts"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") >= col("t2"),
          col("ts"))).over(byUser))
    staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
      .agg(count(lit(1)).as("n_users"),
        count(col("t1")).as("n_signup"),
        count(col("t2")).as("n_click_after"),
        count(col("t3")).as("n_purchase_after"))
  }

  /** Time-bounded funnel: signup → click → purchase where each later
    * stage must land within `windowHours` of the PREVIOUS stage —
    * the conversion-window semantics every funnel product defaults
    * to (an unbounded funnel credits a purchase two years after the
    * click; this one doesn't). Same chained-stage-minima shape as
    * [[funnel]], with the deadline folded into each stage's
    * condition, plus median time-to-convert for completers (exact
    * micros rank-pick).
    *
    * Scale shape: identical to `events_funnel` — all three stage
    * windows evaluate over ONE user_id exchange (no self-joins); the
    * completion-time median is a rank-pick over the completers only.
    */
  def funnelWindowed(ev: DataFrame, windowHours: Int = 72): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val lim = expr(s"INTERVAL $windowHours HOURS")
    val staged = ev
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" &&
          col("ts") >= col("t1") && col("ts") <= col("t1") + lim,
          col("ts"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" &&
          col("ts") >= col("t2") && col("ts") <= col("t2") + lim,
          col("ts"))).over(byUser))
    val perUser = staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
      .withColumn("convert_us",
        unix_micros(col("t3")) - unix_micros(col("t1")))
    val completers = perUser.filter(col("t3").isNotNull)
      .select(col("user_id"), col("convert_us"))
    // aggregate (not filter+select) so a completer-less feed still
    // yields the 1-row NULL median the final crossJoin needs
    val med = graft.functions.Ranks
      .grouped(completers, Nil, Seq("convert_us", "user_id"))
      .agg(max(when(col("rank") === expr("(grp_total + 1) div 2"),
        col("convert_us"))).as("median_convert_us"))
    perUser.agg(count(lit(1)).as("n_users"),
        count(col("t1")).as("n_signup"),
        count(col("t2")).as("n_click_within"),
        count(col("t3")).as("n_purchase_within"))
      .crossJoin(broadcast(med))
  }

  def eventsFunnelWindowed(spark: SparkSession, dir: String): DataFrame =
    funnelWindowed(Tables.load(spark, dir, "events"))

  /** Cohort retention: users grouped by first-seen day, then distinct
    * active users per whole-week offset from that day. The cohort
    * anchor is a whole-partition window minimum — ONE shuffle on
    * user_id, no self-join — and the final aggregate is tiny
    * (#cohorts × #offsets). Offsets are exact integer day arithmetic
    * floor-divided by 7, so engines agree without week-truncation
    * convention mismatches.
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame =
    retention(Tables.load(spark, dir, "events"))

  /** [[eventsRetention]]'s core over any (ts, user_id) relation —
    * split out so RetentionProps can drive it with arbitrary
    * in-memory inputs.
    */
  def retention(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    ev.withColumn("cohort_day", to_date(min(col("ts")).over(byUser)))
      .withColumn("offset_w",
        (datediff(to_date(col("ts")), col("cohort_day")) / 7).cast("long"))
      .groupBy(col("cohort_day"), col("offset_w"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("offset_w"))
  }

  /** Pivot: order counts per (status × priority) as a wide matrix —
    * the `groupBy().pivot()` reshape surface. Pivot values are
    * declared explicitly, so the plan is a single pass with map-side
    * partial conditional aggregates (no extra distinct-values job,
    * which at 100 TB would be a full scan before the real one).
    */
  val OrderPriorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    ord.groupBy(col("o_orderstatus"))
      .pivot(col("o_orderpriority"), OrderPriorities)
      .agg(count(lit(1)))
      .na.fill(0L, OrderPriorities)
      .orderBy(col("o_orderstatus"))
  }

  /** Exact per-group median: deterministic middle-row selection via a
    * ranked window (rows (n+1)/2 and (n+2)/2 in (price, key) order),
    * median = midpoint of the two (equal for odd n). No interpolation
    * ambiguity, so engines agree bitwise. One shuffle on the group
    * key; the window never crosses groups.
    */
  def qMedianPrice(spark: SparkSession, dir: String): DataFrame =
    medianPrice(Tables.load(spark, dir, "orders"))

  /** [[qMedianPrice]]'s core over any (o_orderpriority, o_totalprice,
    * o_orderkey) relation — split out so MedianProps can drive it
    * with arbitrary in-memory inputs.
    */
  def medianPrice(ord: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val n = Window.partitionBy(col("o_orderpriority"))
    ord.select(col("o_orderpriority"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(n).as("n"))
      // Spark's `/` on longs is double division; cast back to long so
      // both middle rows are selected for even n (matches DuckDB `//`)
      .filter(col("rn") === ((col("n") + 1) / 2).cast("long") ||
        col("rn") === ((col("n") + 2) / 2).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_orders"),
        ((min(col("o_totalprice")) + max(col("o_totalprice"))) / lit(2.0))
          .as("median_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q7-style volume shipping: revenue between distinct
    * customer/supplier nation pairs per ship year. Both nation maps
    * broadcast by hint; the cust/supp lookups join plain (threshold
    * decides); the unavoidable shuffle is lineitem⋈orders on the
    * order key. Output is #pairs × #years —
    * tiny at any scale.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val cust = Tables.load(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("cust_nation"), col("supp_nation"), col("l_year"))
  }

  /** TPC-H Q14-style promo revenue share per ship month. Numerator
    * and denominator are exact decimal conditional aggregates from ONE
    * pass (no second scan for the total); the share is a single double
    * division at the end. The part side joins under the size
    * threshold.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
    val vol = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0).cast("decimal(18,2)"))).as("promo_d"),
        sum(vol).as("total_d"),
        count(lit(1)).as("n_lines"))
      .select(col("ship_month"),
        (col("promo_d").cast("double") * 100.0 / col("total_d").cast("double"))
          .as("promo_pct"),
        col("total_d").cast("double").as("total_revenue"),
        col("n_lines"))
      .orderBy(col("ship_month"))
  }

  /** TPC-H Q15-style top supplier: supplier(s) whose quarter revenue
    * equals the maximum. The per-supplier aggregate is PERSISTED
    * (CacheScope, released by the harness after materialization), the
    * global max is a plain 1-row aggregate over it, and the 1-row max
    * broadcasts back as an equi-join — so the plan has ONE lineitem
    * scan (the cache stops Spark recomputing the aggregate for the
    * max branch) and NO partition-less window: |suppliers| grows
    * linearly with scale, and at 100 TB geometry a singleton window
    * would funnel ~10⁹ slim rows through one task. The broadcast
    * subtree runs as its own job first and populates the cache, so
    * lazyPersist suffices (no up-front count barrier). Equality on
    * exact decimals keeps the tie set engine-identical.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.load(spark, dir, "supplier")
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
    val rev = graft.CacheScope.lazyPersist(li.groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("total_rev_d")))
    val maxRev = rev.agg(max(col("total_rev_d")).as("max_rev_d"))
    rev.join(broadcast(maxRev), col("total_rev_d") === col("max_rev_d"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev_d").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17-style small-quantity revenue: lineitems of one brand's
    * parts with quantity under 20% of that part's average quantity.
    * The brand filter semi-joins BEFORE the heavy work, so
    * the per-part average — a whole-partition window over ONE shuffle
    * on l_partkey — only sees surviving rows. The 0.2·avg threshold is
    * evaluated as exact integer-free decimal cross-multiplication
    * (5·qty·cnt < Σqty), so engines agree at the boundary.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.load(spark, dir, "part")
      .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))
    val li = Tables.load(spark, dir, "lineitem")
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
    val perPart = Window.partitionBy(col("l_partkey"))
    li.withColumn("sum_qty_d", sum(dec(col("l_quantity"))).over(perPart))
      .withColumn("cnt", count(lit(1)).over(perPart))
      .filter(dec(col("l_quantity")) * lit(5) * col("cnt") < col("sum_qty_d"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21-style waiting suppliers: in orders served by at least
    * two suppliers, the supplier who alone shipped late (> 60 days
    * after the order date). Per-(order, supplier) lateness reduces
    * first (map-side partial), then one per-order aggregate decides
    * multi-supplier/single-late and names the culprit — no self-joins
    * over lineitem, which is the naive Q21 plan's downfall.
    */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.load(spark, dir, "supplier")
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.load(spark, dir, "lineitem")
    val perSupp = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        1L).otherwise(0L)).as("s_late"))
    val culprit = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(col("s_late")).as("n_late"),
        max(when(col("s_late") === 1L, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    culprit.groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(supp, col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q22-style sales opportunity: customers with no RECENT
    * orders (the anti-join window keeps the result non-trivial on a
    * corpus where everyone ordered at least once) whose balance
    * exceeds the average positive balance, grouped by segment. The
    * global average is a 1-row broadcast; the threshold compares
    * exact decimals cross-multiplied (bal·n > Σ), so no engine ever
    * disagrees at the float boundary. The anti join shuffles once on
    * the customer key, and the date filter pushes into the orders
    * scan before the shuffle.
    */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_custkey"))
    val pos = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("sum_pos"), count(lit(1)).as("n_pos"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(pos))
      .filter(dec(col("c_acctbal")) * col("n_pos") > col("sum_pos"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q2-flavored min-cost supplier, re-grounded on observed
    * lineitem prices (the testdata has no partsupp table): for small
    * parts, the supplier(s) whose line price hits the part's minimum.
    *
    * The part filter joins ahead of the fact scan (semi-ish
    * reduction before any heavy work; threshold-broadcast at bench
    * SFs), the per-part minimum is a whole-partition window over ONE
    * shuffle on l_partkey, and the supplier/nation lookup joins after
    * the candidate set has
    * collapsed to one row per (part, supplier). Decimal equality
    * picks the tie set identically in both engines.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_name"))
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val li = Tables.load(spark, dir, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"))
    val perPart = Window.partitionBy(col("l_partkey"))
    li.withColumn("price_d", dec(col("l_extendedprice")))
      .withColumn("min_d", min(dec(col("l_extendedprice"))).over(perPart))
      .filter(col("price_d") === col("min_d"))
      .select(col("l_partkey"), col("p_name"), col("l_suppkey"), col("min_d"))
      .distinct()
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_name"),
        col("s_name"), col("n_name"),
        col("min_d").cast("double").as("min_price"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  /** Top event-type paths: the 20 most common 3-step event sequences
    * across all user timelines — classic clickstream path analysis.
    *
    * Two lag() frames over ONE per-user window (single shuffle on
    * user_id), then a global count whose output cardinality is
    * |event_type|³ — tiny — so the final aggregation broadcasts
    * partials, never the stream. Deterministic top-20 via
    * (count desc, path asc).
    */
  def eventsTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("e2", lag(col("event_type"), 2).over(w))
      .withColumn("e1", lag(col("event_type"), 1).over(w))
      .filter(col("e2").isNotNull)
      .select(concat(col("e2"), lit(">"), col("e1"), lit(">"),
        col("event_type")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** TPC-H Q6-style forecast revenue: one scan, every predicate
    * pushed to parquet, a single partial+final aggregate — the
    * canonical "rides the scan" query. Revenue is Σ price·discount in
    * exact decimal.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q16-style supplier variety: distinct suppliers per
    * (brand, type) for mid-size parts. The distinct aggregate is
    * Spark's two-phase plan (partial distinct on (brand, type,
    * suppkey), then the final count) — both shuffles keyed on the
    * group, no row ever carries more than the three columns.
    */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_size").between(1, 15))
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    Tables.load(spark, dir, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
      .limit(25)
  }

  /** TPC-H Q20-flavored bulk suppliers: suppliers who alone shipped
    * more than 20% of a part's total quantity (concentrated-source
    * detection; this corpus spreads parts evenly enough that a >50%
    * bar never fires at any SF). Per-(part, supplier) totals reduce
    * FIRST (map-side partial), the part total is a window over the
    * reduced relation, and the share test cross-multiplies exact
    * decimals.
    */
  def q20BulkSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.load(spark, dir, "supplier")
    val ps = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty_d"))
    val perPart = Window.partitionBy(col("l_partkey"))
    ps.withColumn("tot_d", sum(col("qty_d")).over(perPart))
      .filter(col("qty_d") * 5 > col("tot_d"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts_dominated"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts_dominated"))
      .orderBy(col("n_parts_dominated").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Keyless range join demo: all events landing inside any VIP
    * user's first-two-hours window. The interval side has NO join
    * key in common with the point side — a raw `BETWEEN` join would
    * be a nested-loop — so it goes through [[RangeJoin]]'s bucketized
    * equi-join (10-minute buckets ≈ the interval span / 12, keeping
    * per-interval fan-out small). Everything runs in epoch-micros
    * longs; the VIP set is deterministic (count desc, user_id).
    */
  def eventsRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("t_us", unix_micros(col("ts")))
    val vip = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id")).limit(3)
      .select(col("user_id"))
    val iv = ev.join(broadcast(vip), "user_id")
      .groupBy(col("user_id"))
      .agg(min(col("t_us")).as("lo"))
      .withColumn("hi", col("lo") + lit(7200000000L))
      .select(col("user_id").as("vip_user"), col("lo"), col("hi"))
    RangeJoin.pointInInterval(
        ev.select(col("t_us"), col("user_id")), col("t_us"),
        iv, col("lo"), col("hi"), bucketUs = 600000000L)
      .groupBy(col("vip_user"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("vip_user"))
  }

  /** TPC-H Q9-style product profit, re-grounded on observed prices
    * (the testdata has no partsupp, so supply cost is modeled as 60%
    * of the part's retail price): for parts whose name carries one
    * token, profit per (supplier nation, order year).
    *
    * The part-name filter reduces the fact FIRST (it reaches the
    * part scan; the join then semi-reduces lineitem before orders /
    * supplier / nation attach). Revenue and cost each sum in exact
    * decimal; the 0.6 factor applies ONCE per group to the two
    * already-exact sums in double — one IEEE multiply + subtract on
    * both engines, so no accumulation-order drift. Group cardinality
    * is |nations|·|years| — the final shuffle is trivial no matter
    * the SF.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.load(spark, dir, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("rev_d"),
        sum(dec(col("l_quantity")) * dec(col("p_retailprice"))).as("cost_d"),
        count(lit(1)).as("n_lines"))
      .select(col("nation"), col("o_year"),
        (col("rev_d").cast("double") - lit(0.6) * col("cost_d").cast("double"))
          .as("profit"),
        col("n_lines"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** TPC-H Q11-style important stock: parts whose observed shipped
    * value from one nation's suppliers exceeds 1/2000 of that
    * nation's total. The global threshold is a 1-ROW aggregate
    * broadcast against the per-part relation — NOT a global window —
    * so nothing ever funnels into a single partition (at 100 TB the
    * per-part relation is billions of rows; the 1-row cross join
    * costs a second, fully parallel pass over the reduced join
    * instead). The share test cross-multiplies exact decimals.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    // nation "family" 3 (keys ≡ 3 mod 10): non-empty at every SF —
    // the smallest testdata slice only populates 10 nations
    val suppN = Tables.load(spark, dir, "supplier")
      .filter(col("s_nationkey") % 10 === 3)
      .select(col("s_suppkey"))
    val parts = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"))
    val base = Tables.load(spark, dir, "lineitem")
      .join(suppN, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"),
        (dec(col("l_quantity")) * dec(col("p_retailprice"))).as("v_d"))
    val total = base.agg(sum(col("v_d")).as("total_d"))
    base.groupBy(col("p_partkey"))
      .agg(sum(col("v_d")).as("value_d"), count(lit(1)).as("n_lines"))
      .crossJoin(broadcast(total))
      .filter(col("value_d") * 2000 > col("total_d"))
      .select(col("p_partkey"), col("value_d").cast("double").as("stock_value"),
        col("n_lines"))
      .orderBy(col("stock_value").desc, col("p_partkey"))
  }

  /** TPC-H Q12-style shipping buckets: one year of lineitems bucketed
    * by ship delay (≤30 / 31–60 / >60 days after the order date),
    * counting critical-priority vs other orders per bucket. The date
    * range pushes to the lineitem scan; the conditional counts are
    * one map-side-partial aggregate over a 3-row group key. The
    * orders join carries only (key, date, priority).
    */
  def q12PriorityShipping(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val crit = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_bucket",
        when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30, "0-30d")
          .when(datediff(col("l_shipdate"), col("o_orderdate")) <= 60, "31-60d")
          .otherwise("60d+"))
      .groupBy(col("delay_bucket"))
      .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("delay_bucket"))
  }

  /** Per-user event-value outliers: events whose value sits more than
    * 2 sample standard deviations from the user's mean. The moment
    * sums S=Σv and Q=Σv² ride ONE whole-partition window per user
    * (exact decimals, order-independent), and the z-score is a fixed
    * double expression tree over those exact moments —
    * z = (vn−S)·√(n(n−1)) / (n·√(Qn−S²)) — so both engines compute
    * identical doubles. Zero-variance users are excluded EXPLICITLY
    * (not via NaN comparisons, which DuckDB orders ABOVE all values
    * while Spark orders them below — the one place the engines'
    * float semantics disagree).
    *
    * PRECISION BOUND: the products s_d·s_d and q_d·n must fit
    * decimal(38). With value ≤ 10⁴ (so vd² ≤ 10⁸ at scale 4) the
    * exact-moment identity holds up to ~10¹⁵ events per user
    * (|s_d| ≤ 10¹⁹ ⇒ s_d² ≤ 10³⁸); beyond that Spark silently rounds
    * (spark.sql.decimal.operations.allowPrecisionLoss) while DuckDB
    * raises an overflow error — an engine divergence outside the
    * tested surface. Feeds with larger per-user magnitudes should
    * pre-scale value or compute the moments in decimal(38,0)
    * micros-scaled integers like the other exact-moment queries.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
    val vd = col("value").cast("decimal(18,2)")
    // one select → one Window node evaluating all three moments
    // (chained withColumn left three stacked Window nodes behind)
    val withMoments = ev.select(col("user_id"), col("event_id"),
      col("event_type"), col("value"),
      count(lit(1)).over(w).as("n"),
      sum(vd).over(w).as("s_d"),
      sum(vd * vd).over(w).as("q_d"))
    val numD = vd * col("n") - col("s_d")
    val varNumD = col("q_d") * col("n") - col("s_d") * col("s_d")
    val z = numD.cast("double") *
      sqrt((col("n") * (col("n") - 1)).cast("double")) /
      (col("n").cast("double") * sqrt(varNumD.cast("double")))
    withMoments
      .filter(col("n") >= 10 && varNumD > 0)
      .withColumn("z", z)
      .filter(abs(col("z")) > 2.0)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("z"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Trailing-7-day distinct active users per day. Sliding-window
    * DISTINCT doesn't decompose like a sum, so the scale-sane plan is
    * the bounded fan-out: reduce to distinct (day, user) first (the
    * big shuffle, keyed and partial-aggregated), then each active day
    * contributes to exactly 7 window anchors (a ×7 explode of the
    * REDUCED relation, not the raw stream) and a two-phase distinct
    * count lands per anchor day. Anchors are clipped to observed days
    * so the output range is data-defined on both engines.
    */
  def eventsRollingActive(spark: SparkSession, dir: String): DataFrame =
    rollingActive(Tables.load(spark, dir, "events"))

  /** [[eventsRollingActive]]'s core over any (ts, user_id) relation —
    * split out so RollingActiveProps can drive it with arbitrary
    * in-memory inputs.
    */
  def rollingActive(ev: DataFrame): DataFrame = {
    val du = ev.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val obs = du.select(col("d").as("day")).distinct()
    du.withColumn("day", explode(sequence(col("d"), date_add(col("d"), 6))))
      .join(obs, "day")
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
      .orderBy(col("day"))
  }

  /** Correlated-subquery decorrelation: orders strictly above their
    * own customer's average order value, counted per market segment.
    * The correlated `price > (SELECT avg ... WHERE same customer)`
    * rewrites to ONE per-customer aggregate joined back on the
    * correlation key — the standard decorrelation every engine does,
    * expressed directly so the plan is one orders scan + one
    * customer-keyed shuffle. The threshold compares exact decimals
    * cross-multiplied (price·n > Σ), never a float average.
    */
  def qAboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val perCust = ord.groupBy(col("o_custkey").as("ck"))
      .agg(sum(dec(col("o_totalprice"))).as("sum_d"),
        count(lit(1)).as("n_ord"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    ord.join(perCust, col("o_custkey") === col("ck"))
      .filter(dec(col("o_totalprice")) * col("n_ord") > col("sum_d"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_above"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_above"))
      .orderBy(col("c_mktsegment"))
  }

  /** Exact value percentiles per event type (p25/50/75/95 + max) —
    * the metric-distribution profile behind alerting thresholds and
    * anomaly baselines (events_anomaly's z-scores assume these
    * shapes were looked at first). Rank selection, not an
    * approximate sketch: the cut rank ⌈cnt·p/100⌉ picks an ACTUAL
    * observed value, and the rank runs through Ranks.grouped's
    * range-partition + per-partition windows — with only |types|
    * groups, a plain per-type window would collapse each type's
    * full history onto one task at 100 TB (the exact skew the
    * two-phase rank exists to avoid; corpus_percentiles gets away
    * with plain windows only because sources are many).
    */
  def valuePercentiles(ev: DataFrame): DataFrame = {
    val ranked = graft.functions.Ranks.grouped(
      ev.select(col("event_type"), col("event_id"), col("value")),
      Seq("event_type"), Seq("value", "event_id"))
    def pick(p: Int) =
      max(when(col("rank") === expr(s"(grp_total * $p + 99) DIV 100"),
        col("value"))).as(s"p${p}_value")
    ranked.groupBy(col("event_type"))
      .agg(max(col("grp_total")).as("n_events"),
        pick(25), pick(50), pick(75), pick(95),
        max(col("value")).as("max_value"))
      .orderBy(col("event_type"))
  }

  /** Dwell time between consecutive events per (from, to) transition:
    * one lag window per user timeline (single shuffle on user_id),
    * gaps summed as exact integer micros, ONE double division per
    * transition group. The transition matrix is |event_type|² rows —
    * partial aggregation collapses the stream map-side.
    */
  def eventsDwellTime(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("gap_us")).cast("double") / count(lit(1)).cast("double") /
          lit(1000000.0)).as("avg_gap_sec"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Consecutive-duplicate census per event type — the sensor/
    * at-least-once-delivery cleaning gauge: an event is a
    * consecutive dup when it repeats its user-timeline predecessor's
    * (type, value) exactly (double retries, stuck emitters, UI
    * double-fires). Reported per type: events, dups, and the share a
    * collapse pass would drop — measured BEFORE anyone deletes data,
    * the same price-it-first shape as corpus_dedup_impact. ONE lag
    * window on the user exchange (both lags in one Window node),
    * |types|-row rollup, one double division.
    */
  def dedupConsecutive(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("event_type"), col("value"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lag(col("value"), 1).over(w).as("prev_value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("prev_type") === col("event_type") &&
          col("prev_value") === col("value"), 1L).otherwise(0L))
          .as("n_consecutive_dups"))
      .withColumn("dup_share",
        col("n_consecutive_dups").cast("double") /
          col("n_events").cast("double"))
      .orderBy(col("event_type"))
  }

  /** Last-touch conversion attribution: each purchase is credited to
    * the user's most recent PRECEDING non-purchase event within a
    * `lookbackDays` window — older or absent touches fall to the
    * 'direct' channel. The clickstream-attribution shape: an as-of
    * lookup expressed as ONE ignore-nulls window over the existing
    * per-user ordering (no self-join, no as-of join needed because
    * source and target ride the same stream).
    *
    * Determinism: the frame orders by (ts, event_id) — unique — and
    * age math is exact integer micros; the per-channel averages do
    * two double divisions in a fixed order, identical in the oracle.
    */
  def attribution(events: DataFrame, lookbackDays: Int = 7): DataFrame =
    touchAttribution(events, lookbackDays, firstTouch = false)

  /** First-touch twin of [[attribution]]: the conversion is credited
    * to the EARLIEST preceding non-purchase touch instead of the
    * latest (brand-discovery credit vs closing credit — the two ends
    * of the multi-touch spectrum). Same single ignore-nulls window
    * frame, same lookback rule applied to the first touch's age.
    */
  def attributionFirstTouch(
      events: DataFrame, lookbackDays: Int = 7): DataFrame =
    touchAttribution(events, lookbackDays, firstTouch = true)

  /** Shared body of the two attribution twins — they differ ONLY in
    * which end of the preceding-touch frame takes the credit
    * (first vs last over the same ignore-nulls window).
    */
  private def touchAttribution(
      events: DataFrame, lookbackDays: Int, firstTouch: Boolean): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val picked = when(col("event_type") =!= "purchase",
      struct(unix_micros(col("ts")).as("t_us"),
        col("event_type").as("ch")))
    val touch =
      (if (firstTouch) first(picked, ignoreNulls = true)
       else last(picked, ignoreNulls = true)).over(w)
    events
      .withColumn("touch", touch)
      .filter(col("event_type") === "purchase")
      .withColumn("age_us", unix_micros(col("ts")) - col("touch.t_us"))
      .withColumn("channel",
        when(col("touch").isNull ||
          col("age_us") > lit(lookbackDays * 86400000000L), "direct")
          .otherwise(col("touch.ch")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"),
        (sum(when(col("channel") =!= "direct", col("age_us"))).cast("double") /
          count(lit(1)).cast("double") / lit(60000000.0))
          .as("avg_min_to_touch"))
  }

  /** Sequence-gap integrity check over the event feed: per key
    * (user), consecutive event ids are expected to advance by roughly
    * the key cardinality (ids are globally dense, keys interleave);
    * a jump beyond `factor`× that expectation marks positions the
    * feed never delivered — the missed-binlog-position audit a CDC
    * consumer runs against its own intake.
    *
    * Scale shape: one shuffle on the key for the lag window, the
    * 1-row distinct-key count broadcasts back (no second pass), and
    * only keys with at least one gap survive. Threshold arithmetic is
    * exact integers.
    */
  def eventGaps(events: DataFrame, factor: Int = 8): DataFrame = {
    val users = events.groupBy()
      .agg(countDistinct(col("user_id")).as("n_users"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events.select(col("user_id"), col("event_id"))
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .crossJoin(broadcast(users))
      .withColumn("gap", col("event_id") - col("prev_id"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("gap") > col("n_users") * factor, 1L).otherwise(0L))
          .as("n_gaps"),
        max(col("gap")).as("max_gap"))
      .filter(col("n_gaps") > 0)
  }

  /** Window-frame running aggregates: per customer, orders in date
    * order with a sequence number, a running (unbounded-preceding)
    * spend total, and a 3-row moving average. One shuffle on
    * o_custkey; all three windows share the partitioning + sort, so
    * Spark plans a single Window node. Decimal running sums keep the
    * doubles engine-identical; the moving average divides two exact
    * quantities in double at the end.
    */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w3 = w.rowsBetween(-2, Window.currentRow)
    ord.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(w).cast("long").as("order_seq"),
        sum(dec(col("o_totalprice"))).over(run).cast("double").as("running_spend"),
        (sum(dec(col("o_totalprice"))).over(w3).cast("double") /
          count(lit(1)).over(w3).cast("double")).as("moving_avg_3"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** RANGE-frame trailing window: each order's 30-day trailing spend
    * per customer — a VALUE-range frame (peers by date, not row
    * count), the frame type `q_window_running`'s ROWS frames don't
    * exercise. Peer-inclusive RANGE semantics make the result
    * deterministic under same-date ties with no tie-break column.
    *
    * Scale shape: one customer exchange + sort; the range frame
    * evaluates in the same Window node (Spark requires a numeric
    * order key for rangeBetween — epoch-day integers here, the
    * engine-portable encoding of `INTERVAL 29 DAY PRECEDING`).
    */
  def qWindowRange30d(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(day)
      .rangeBetween(-29, 0)
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** First-order Markov view of user timelines: for each observed
    * transition, its conditional probability P(to | from) and its
    * lift over the base rate P(to) across ALL transitions — lift far
    * from 1 marks genuine sequence dependence (what distinguishes a
    * funnel from independent traffic). Complements [[eventsDwellTime]]
    * (which reports the same matrix's timing, not its probabilities).
    *
    * One lag window per user timeline (single user_id shuffle, the
    * same exchange every sequence operator here reuses), then the
    * transition matrix is |event_type|² rows — the windows computing
    * row totals and the grand total run over that POST-AGGREGATE
    * relation, never over the stream.
    */
  def eventsMarkov(spark: SparkSession, dir: String): DataFrame =
    markovTransitions(Tables.load(spark, dir, "events"))

  /** Core of [[eventsMarkov]] over any (user_id, ts, event_id,
    * event_type) relation — split out so the property suite can
    * drive it with generated timelines.
    */
  /** The (from, to, n_trans) transition matrix both markov operators
    * reduce from — ONE definition of the user-timeline ordering and
    * lag extraction, so events_markov and events_markov_stationary
    * can never disagree about the chain (the knnEdges rule applied
    * to the behavioral graph).
    */
  def transitionCounts(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(lag(col("event_type"), 1).over(w).as("from_type"),
        col("event_type").as("to_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
  }

  def markovTransitions(ev: DataFrame): DataFrame = {
    val trans = transitionCounts(ev)
    val byFrom = Window.partitionBy(col("from_type"))
    val byTo = Window.partitionBy(col("to_type"))
    val all = Window.partitionBy()
    trans
      .withColumn("n_from", sum(col("n_trans")).over(byFrom))
      .withColumn("n_to", sum(col("n_trans")).over(byTo))
      .withColumn("n_all", sum(col("n_trans")).over(all))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        (col("n_trans").cast("double") / col("n_from").cast("double"))
          .as("p_trans"),
        ((col("n_trans").cast("double") / col("n_from").cast("double")) /
          (col("n_to").cast("double") / col("n_all").cast("double")))
          .as("lift"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val StationaryScale = 1000000000000L // 1e12 fixed-point units
  val StationaryIters = 3

  /** Stationary distribution of the [[markovTransitions]] chain —
    * where user behavior settles at equilibrium: π such that π ≈ πP
    * under 0.85 damping (teleport keeps the chain ergodic even with
    * absorbing event types; types with no outgoing transitions
    * redistribute uniformly, the dangling rule). The behavioral twin
    * of `sim_pagerank`'s graph centrality: p_trans says where a user
    * goes NEXT, π says where the population SPENDS ITS TIME — the
    * session-mix forecast a capacity planner reads.
    *
    * Same fixed-point integer discipline as Similarity.pageRankRanks
    * (ranks in 1e-12 units, every division floored to BIGINT, the
    * only floats are per-row products of exact integers — here
    * weighted by the transition probability n_trans/n_from), same
    * checkpoint-per-round lineage cut, same driver-scalar |V| and
    * dangling mass (1-row collects). The weighted contribution
    * floor(π·(n_trans/n_from)) keeps its own formula rather than
    * reusing the unweighted floor(π/outdeg) — the two aren't
    * IEEE-equal even at weight 1, and each is pinned by its own
    * oracle.
    *
    * Scale shape: the transition matrix is |types|²-bounded (one
    * user-timeline window + map-side-combined reduce); every
    * iteration is bounded joins over it. Output |types| rows.
    */
  def markovStationary(ev: DataFrame, iters: Int = StationaryIters): DataFrame = {
    import org.apache.spark.sql.graft.ExpressionBridge.checkpointTruncated
    val trans = graft.CacheScope.materialize(transitionCounts(ev))
    val outm = graft.CacheScope.materialize(trans
      .groupBy(col("from_type")).agg(sum(col("n_trans")).as("n_from")))
    val nodes = graft.CacheScope.materialize(
      trans.select(col("from_type").as("v"))
        .union(trans.select(col("to_type").as("v"))).distinct())
    val n = nodes.count()
    val base = math.floor(0.15 * (StationaryScale.toDouble / n)).toLong
    var pi = checkpointTruncated(nodes.select(col("v"),
      lit(math.floor(StationaryScale.toDouble / n).toLong).as("r")))
    for (_ <- 1 to iters) {
      val dang = pi
        .join(outm.select(col("from_type").as("v")), Seq("v"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L))).head.getLong(0)
      val dShare = math.floor(dang.toDouble / n).toLong
      val contrib = trans
        .join(pi.select(col("v").as("from_type"), col("r")), "from_type")
        .join(outm, "from_type")
        .select(col("to_type").as("v"),
          floor(col("r").cast("double") *
            (col("n_trans").cast("double") / col("n_from").cast("double")))
            .as("c"))
      val inflow = contrib.groupBy(col("v")).agg(sum(col("c")).as("inflow"))
      pi = checkpointTruncated(pi.select(col("v"))
        .join(inflow, Seq("v"), "left")
        .select(col("v"),
          (lit(base) + floor(lit(0.85) *
            (coalesce(col("inflow"), lit(0L)) + lit(dShare))
              .cast("double"))).as("r")))
    }
    val ranked = pi.select(col("v").as("event_type"), col("r").as("pi_fp"))
    ranked.withColumn("rk", row_number().over(
        Window.orderBy(col("pi_fp").desc, col("event_type"))).cast("long"))
      .orderBy(col("rk"))
  }

  /** Event-type co-occurrence (market-basket over user histories):
    * for each unordered type pair, how many users exhibit both, with
    * the Jaccard overlap of the two user sets. The "which behaviors
    * travel together" view segmentation starts from.
    *
    * Scale shape: ONE scan, ONE shuffle. The raw stream goes straight
    * into groupBy(user_id).collect_set(event_type) — collect_set
    * dedups during the map-side partial (set bounded at |types|), so
    * no separate DISTINCT exchange and no self-join exist. Per-type
    * user totals and the C(|types|,2)-bounded pair fan-out both
    * derive map-side from that one-row-per-user relation
    * (materialized, two consumers); totals ride a |types|-row
    * broadcast twice.
    */
  def eventsCooccurrence(spark: SparkSession, dir: String): DataFrame =
    typeCooccurrence(Tables.load(spark, dir, "events"))

  /** Core of [[eventsCooccurrence]] over any (user_id, event_type)
    * relation — split out for the property suite.
    */
  def typeCooccurrence(events: DataFrame): DataFrame = {
    val sets = graft.CacheScope.lazyPersist(events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("types")))
    val totals = sets.select(explode(col("types")).as("event_type"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
    val pairArr = flatten(transform(sequence(lit(0), size(col("types")) - 2), i =>
      transform(sequence(i + 1, size(col("types")) - 1), j =>
        struct(element_at(col("types"), i + 1).as("type_a"),
          element_at(col("types"), j + 1).as("type_b")))))
    val pairs = sets.filter(size(col("types")) >= 2)
      .select(explode(pairArr).as("p"))
      .groupBy(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n_users", "n_a")), "type_a")
      .join(broadcast(totals.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n_users", "n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_a"), col("n_b"),
        (col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"))
          .as("jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** One-scan column profile of `orders` — the schema-drift /
    * data-quality census (row count, null count, exact distinct
    * cardinality, typed min/max per column) a replication target is
    * audited with. Numeric and timestamp extremes land in `min_num`/
    * `max_num` (timestamps as epoch micros — no engine-specific
    * string formatting in the output), string extremes in `min_str`/
    * `max_str`.
    *
    * Scale shape: ONE aggregate node over ONE scan; the six exact
    * `countDistinct`s compile to a single Expand (×|cols| row
    * multiply) with map-side partials — still one pass, no joins, and
    * the result is |cols| rows exploded from a 1-row aggregate. At
    * 100 TB the exact distincts are the expensive honest choice; the
    * drop-in relaxation is `approx_count_distinct` (HLL) per column,
    * which removes the Expand entirely.
    */
  def qProfileTable(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val numExpr: Map[String, Column] = Map(
      "o_orderkey" -> col("o_orderkey").cast("double"),
      "o_custkey" -> col("o_custkey").cast("double"),
      "o_totalprice" -> col("o_totalprice").cast("double"),
      // orders carries TIMESTAMP_NTZ; the session runs UTC, so the
      // cast is a pure reinterpretation and epoch micros match
      // DuckDB's epoch_us over the same parquet values
      "o_orderdate" -> unix_micros(col("o_orderdate").cast("timestamp"))
        .cast("double"))
    val allCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = allCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"nd_$c")) ++
        (if (numExpr.contains(c))
          Seq(min(numExpr(c)).as(s"mn_$c"), max(numExpr(c)).as(s"mx_$c"))
        else
          Seq(min(col(c)).as(s"mns_$c"), max(col(c)).as(s"mxs_$c")))
    } :+ count(lit(1)).as("n_rows")
    val one = o.agg(aggs.head, aggs.tail: _*)
    val rows = allCols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"nulls_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
        (if (numExpr.contains(c)) col(s"mn_$c")
         else lit(null).cast("double")).as("min_num"),
        (if (numExpr.contains(c)) col(s"mx_$c")
         else lit(null).cast("double")).as("max_num"),
        (if (numExpr.contains(c)) lit(null).cast("string")
         else col(s"mns_$c")).as("min_str"),
        (if (numExpr.contains(c)) lit(null).cast("string")
         else col(s"mxs_$c")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy(col("col_name"))
  }

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands classic (engagement/retention gauge next to
    * `events_retention`'s cohort view). Emits per user: total active
    * days, number of streaks, event count, and the longest streak
    * with its start day (ties broken toward the EARLIEST start).
    *
    * Scale shape: the raw stream reduces to distinct (user, day)
    * FIRST (map-side combine, output bounded at |users|·|days| — the
    * same reduce-before-window discipline as events_rolling_active),
    * then ONE per-user window chain computes island ids; the two
    * downstream aggregates group on (user, island) and user, both
    * satisfied by the window's user_id partitioning — no further
    * exchange. Never a self-join, never a window over the raw stream.
    */
  def eventsStreak(spark: SparkSession, dir: String): DataFrame =
    streaks(Tables.load(spark, dir, "events"))

  /** Core of [[eventsStreak]] over any (user_id, ts) relation —
    * split out for the property suite.
    */
  def streaks(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = days
      .withColumn("gap",
        when(datediff(col("day"), lag(col("day"), 1).over(w)) === 1, 0L)
          .otherwise(1L))
      .withColumn("island", sum(col("gap")).over(w))
    islands
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"),
        sum(col("n_events")).as("n_ev"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("len")).as("active_days"),
        count(lit(1)).as("n_streaks"),
        sum(col("n_ev")).as("n_events"),
        // max-of-struct argmax: longest streak, then earliest start
        // (negated epoch-day makes "earliest" the struct maximum)
        max(struct(col("len"),
          (-datediff(col("start_day"), lit("1970-01-01").cast("date")))
            .cast("long").as("negd"),
          col("start_day").as("sd"))).as("m"))
      .select(col("user_id"), col("active_days"), col("n_streaks"),
        col("n_events"), col("m.len").as("best_streak"),
        col("m.sd").as("best_start"))
      .orderBy(col("user_id"))
  }

  /** Entry/exit transition matrix: per user the FIRST and LAST event
    * type (by ts, event_id, then event_type — the struct's third
    * field breaks (ts, event_id) ties lexicographically, and the
    * oracle's row_number ORDER BY carries the same three keys, so
    * both engines share a total order even if event_id ever stops
    * being unique), rolled up to a (entry_type, exit_type) matrix
    * with user and event counts — the acquisition-vs-abandonment
    * view next to `events_funnel`.
    *
    * Scale shape: ONE shuffle on user_id; first/last are min/max of
    * an ordering struct, so they combine map-side (no row_number
    * window over the raw stream, no per-user sort); the matrix
    * aggregate is |types|²-bounded. Null-ts events are excluded up
    * front (no defined position in the timeline).
    */
  def eventsEntryExit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").filter(col("ts").isNotNull)
    e.groupBy(col("user_id"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type"))).as("fst"),
        max(struct(col("ts"), col("event_id"), col("event_type"))).as("lst"),
        count(lit(1)).as("n_ev"))
      .groupBy(col("fst.event_type").as("entry_type"),
        col("lst.event_type").as("exit_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_ev")).as("n_events"))
      .orderBy(col("entry_type"), col("exit_type"))
  }

  /** Recency/churn buckets: per-user last-activity age against the
    * feed head, bucketed 0-1 / 2-7 / 8-30 / 30+ days — the audience-
    * health gauge a pipeline reads next to `cdc_lag_monitor`'s
    * replication view.
    *
    * Scale shape: ONE shuffle on user_id (max/count combine
    * map-side); the feed head is a 1-row aggregate OF THE SAME
    * per-user relation broadcast back. The per-user relation is
    * lazily persisted — without it, column pruning specializes the
    * head branch's partial aggregate (no n_ev) so ReuseExchange
    * can't dedupe and the FEED would be scanned twice (verified);
    * the cache is safe lazy because the main consumer reaches the
    * head only through its broadcast, whose job populates the cache
    * first (same contract as CacheScope.lazyPersist documents).
    * The bucket rollup is 4 rows.
    */
  def eventsChurn(spark: SparkSession, dir: String): DataFrame = {
    val lastSeen = graft.CacheScope.lazyPersist(
      Tables.load(spark, dir, "events")
        .filter(col("ts").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_ev")))
    val head = lastSeen.agg(max(col("last_ts")).as("head_ts"))
    lastSeen.crossJoin(broadcast(head))
      .withColumn("days_inactive",
        datediff(to_date(col("head_ts")), to_date(col("last_ts"))).cast("long"))
      .withColumn("recency_bucket",
        when(col("days_inactive") <= 1, "active_1d")
          .when(col("days_inactive") <= 7, "active_7d")
          .when(col("days_inactive") <= 30, "active_30d")
          .otherwise("dormant"))
      .groupBy(col("recency_bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_ev")).as("n_events"),
        min(col("days_inactive")).as("min_days"),
        max(col("days_inactive")).as("max_days"))
      .orderBy(col("recency_bucket"))
  }

  /** Hour-of-day seasonality profile: event counts per (hour, type)
    * with the lift of each cell against the type's overall share —
    * lift > 1 means the type over-indexes in that hour (the
    * time-structure detector next to `events_markov`'s sequence
    * view; a replication operator reads it to place maintenance
    * windows).
    *
    * Scale shape: ONE (hour, type) aggregate over the stream
    * (map-side combined, output 24·|types| rows); hour/type/grand
    * totals are windows over that POST-aggregate, never the stream;
    * lift = n·total/(hour_total·type_total) is the single double op.
    */
  def eventsSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .groupBy(hour(col("ts")).cast("long").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val all = Window.partitionBy()
    cells
      .withColumn("hour_total", sum(col("n")).over(Window.partitionBy(col("hr"))))
      .withColumn("type_total",
        sum(col("n")).over(Window.partitionBy(col("event_type"))))
      .withColumn("total", sum(col("n")).over(all))
      .withColumn("lift",
        (col("n") * col("total")).cast("double") /
          (col("hour_total") * col("type_total")).cast("double"))
      .orderBy(col("hr"), col("event_type"))
  }

  /** Seasonal-naive forecast backtest: per event type, predict each
    * of the last 7 days' event counts from the preceding 21 training
    * days — the day-of-week mean (3 samples per dow) vs the overall
    * daily mean — and report both predictors' holdout MAE. This is
    * the capacity-planning loop closed: `events_seasonality` SHOWS
    * the time structure; this measures whether exploiting it beats
    * the naive rate on data the model didn't see (mae_seasonal <
    * mae_naive ⇒ the dow profile is real signal, not noise).
    *
    * Exactness: with a fixed 3-sample dow window the prediction
    * error |c − S/3| = |3c − S|/3 has an integer numerator, so both
    * MAEs aggregate exactly and divide ONCE at the end (a
    * float-mean-then-subtract formulation would be order-dependent
    * and engine-divergent). Days with no events count as zero via
    * the zero-filled grid — a silent day is a forecast input, not a
    * missing row. Dow is epoch-anchored (days since Monday
    * 1970-01-05, mod 7) so both engines bucket identically.
    *
    * Scale shape: ONE (type, day) pre-aggregate over the stream
    * (map-side combined, |types|·|days| rows); everything after —
    * the 1-row horizon, the 28-day grid, the dow/total folds — runs
    * on that bounded post-aggregate. Broadcast joins only; nothing
    * keyed by user or event.
    */
  def forecastBacktest(ev: DataFrame): DataFrame = {
    // materialized: the horizon, the type list, and the grid join all
    // consume this — without the cache each branch would re-scan the
    // full stream for the same |types|·|days| post-aggregate
    val days = graft.CacheScope.materialize(
      ev.filter(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
    val horizon = days.groupBy().agg(max(col("day")).as("maxd"))
    val grid = days.select("event_type").distinct()
      .crossJoin(broadcast(horizon))
      .select(col("event_type"), col("maxd"),
        explode(sequence(date_sub(col("maxd"), 27), col("maxd"))).as("day"))
    val cells = grid.join(days, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        pmod(datediff(col("day"),
          lit(java.sql.Date.valueOf("1970-01-05"))), lit(7)).as("dow"),
        (col("day") > date_sub(col("maxd"), 7)).as("is_test"))
    val train = cells.filter(!col("is_test"))
    val trainDow = train.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("s_dow"))
    val trainTot = train.groupBy(col("event_type"))
      .agg(sum(col("n")).as("s_tot"))
    cells.filter(col("is_test"))
      .join(broadcast(trainDow), Seq("event_type", "dow"))
      .join(broadcast(trainTot), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        max(col("s_tot")).as("n_train"),
        sum(col("n")).as("n_test"),
        (sum(abs(lit(3L) * col("n") - col("s_dow"))).cast("double") /
          21.0).as("mae_seasonal"),
        (sum(abs(lit(21L) * col("n") - col("s_tot"))).cast("double") /
          147.0).as("mae_naive"))
      .orderBy(col("event_type"))
  }

  /** Inter-arrival time distribution: ⌊log2 gap_µs⌋ histogram of the
    * gap to the user's previous event, attributed to the later
    * event's type — the latency/burstiness profile a capacity planner
    * reads next to `events_dwell_time`'s per-user averages and
    * `cdc_rate_drift`'s trend (reference surface: the stream's
    * arrival cadence, run.py:255-318). Exact integer micros and the
    * length(bin(·))-1 floor-log2 keep the buckets engine-identical;
    * a zero gap (same-µs burst) takes bucket -1 by convention.
    *
    * Scale shape: ONE shuffle on user_id for the lag window, then a
    * partial-aggregating rollup on the ≤|types|·64 bucket grid —
    * output is bounded by the grid, not the stream. The window's
    * (ts, event_id) sort key is the same total order every other
    * per-user operator here uses.
    */
  def eventsInterarrival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .withColumn("bucket",
        when(col("gap_us") === 0, lit(-1L))
          .otherwise((length(bin(col("gap_us"))) - 1).cast("long")))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** A/B comparison of event value by experiment arm (user parity —
    * the deterministic stand-in for an assignment table): per event
    * type, each arm's count/mean/variance and the Welch t statistic.
    * The moments are EXACT decimal aggregates (Σx, Σx² in
    * decimal(18,2)/(38,4) — float sums would be order-dependent and
    * engine-divergent); mean, variance and t are then fixed double
    * expressions over those exact sums, bit-identical cross-engine.
    * Headroom: the Σx² integer representation stays double-exact to
    * ~10¹¹ value-mass per (type, arm); beyond that, keep the decimal
    * and divide in decimal before the final cast.
    *
    * Scale shape: ONE (type, arm) aggregate with map-side partials,
    * then a ≤|types|-row self-merge — the stream is scanned once,
    * nothing is keyed by user.
    */
  def eventsAbTest(spark: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast("decimal(18,2)")
    val arms = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy(col("event_type"), col("arm"))
      .agg(count(lit(1)).as("n"),
        sum(dec).as("s"),
        sum(dec * dec).as("s2"))
    def side(a: String) = arms.filter(col("arm") === a)
      .select(col("event_type"),
        col("n").as(s"n_$a"),
        col("s").as(s"s_$a"),
        col("s2").as(s"s2_$a"))
    def mean(a: String) =
      col(s"s_$a").cast("double") / col(s"n_$a").cast("double")
    def variance(a: String) =
      when(col(s"n_$a") > 1,
        (col(s"n_$a").cast("double") * col(s"s2_$a").cast("double")
          - col(s"s_$a").cast("double") * col(s"s_$a").cast("double"))
          / (col(s"n_$a").cast("double") * (col(s"n_$a") - 1).cast("double")))
    side("A").join(side("B"), "event_type")
      .withColumn("mean_a", mean("A"))
      .withColumn("mean_b", mean("B"))
      .withColumn("var_a", variance("A"))
      .withColumn("var_b", variance("B"))
      .withColumn("t_stat",
        (col("mean_a") - col("mean_b")) /
          sqrt(col("var_a") / col("n_A").cast("double")
            + col("var_b") / col("n_B").cast("double")))
      .select(col("event_type"), col("n_A").as("n_a"), col("n_B").as("n_b"),
        col("mean_a"), col("mean_b"), col("var_a"), col("var_b"),
        col("t_stat"))
      .orderBy(col("event_type"))
  }

  /** CUPED variance reduction for the A/B readout (Deng et al.,
    * WSDM'13 — the controlled-experiment industry standard): split
    * the feed at its time midpoint, use each user's PRE-period value
    * mass as the covariate X against the POST-period outcome Y,
    * pool θ = cov(X,Y)/var(X) across arms, and report both the raw
    * and the adjusted (Y − θ(X − X̄)) arm means. ρ² IS the variance
    * reduction CUPED buys — the experiment reads as if it had
    * 1/(1−ρ²)× the sample.
    *
    * Exactness: per-user sums become integer CENTS (×100 of the
    * 2-decimal sums — exact int64); every moment (Σx, Σy, Σxy, Σx²,
    * Σy²) reduces in decimal(38,0) (the anisotropy widening), and
    * θ/ρ²/means are a fixed chain of double expressions over those
    * exact integers — bit-identical cross-engine. Zero pre-period
    * variance yields null θ and null adjusted columns.
    *
    * Scale shape: ONE corpus reduce to the (type, user) relation
    * (map-side combined, cached — two consumers), then a pooled and
    * a per-arm aggregate on it (|types| and |types|·2 rows); the
    * midpoint is a 1-row broadcast.
    */
  def eventsCuped(spark: SparkSession, dir: String): DataFrame =
    cupedOn(Tables.load(spark, dir, "events"))

  /** [[eventsCuped]] on an arbitrary (event_type, user_id, ts, value)
    * frame — the unit the planted-θ spec drives directly.
    */
  def cupedOn(events: DataFrame): DataFrame = {
    val ev = events.filter(col("ts").isNotNull)
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"))
      .select(expr("(mn + mx) div 2").as("mid_us"))
    val dec = col("value").cast("decimal(18,2)")
    val zero = lit(0).cast("decimal(18,2)")
    val perUser = graft.CacheScope.materialize(
      ev.crossJoin(broadcast(bounds))
        .groupBy(col("event_type"), col("user_id"))
        .agg(
          (sum(when(unix_micros(col("ts")) <= col("mid_us"), dec)
            .otherwise(zero)) * 100).cast("long").as("x"),
          (sum(when(unix_micros(col("ts")) > col("mid_us"), dec)
            .otherwise(zero)) * 100).cast("long").as("y"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "A").otherwise("B")))
    val d38 = "decimal(38,0)"
    def wide(c: String) = col(c).cast(d38)
    val pooled = perUser.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_users"),
      sum(wide("x")).as("sx"), sum(wide("y")).as("sy"),
      sum(wide("x") * wide("y")).as("sxy"),
      sum(wide("x") * wide("x")).as("sxx"),
      sum(wide("y") * wide("y")).as("syy"))
    val arms = perUser.groupBy(col("event_type"), col("arm")).agg(
      count(lit(1)).as("n"), sum(wide("x")).as("ax"), sum(wide("y")).as("ay"))
    def side(a: String) = arms.filter(col("arm") === a)
      .select(col("event_type"), col("n").as(s"n_$a"),
        col("ax").as(s"ax_$a"), col("ay").as(s"ay_$a"))
    val covN = (col("n_users").cast(d38) * col("sxy") -
      col("sx") * col("sy")).cast("double")
    val varXN = (col("n_users").cast(d38) * col("sxx") -
      col("sx") * col("sx")).cast("double")
    val varYN = (col("n_users").cast(d38) * col("syy") -
      col("sy") * col("sy")).cast("double")
    def meanY(a: String) =
      col(s"ay_$a").cast("double") / col(s"n_$a").cast("double") / 100.0
    def meanX(a: String) =
      col(s"ax_$a").cast("double") / col(s"n_$a").cast("double") / 100.0
    val meanXAll =
      col("sx").cast("double") / col("n_users").cast("double") / 100.0
    pooled.join(side("A"), "event_type").join(side("B"), "event_type")
      .withColumn("theta", when(varXN > 0, covN / varXN))
      .withColumn("rho2",
        when(varXN > 0 && varYN > 0, covN * covN / (varXN * varYN)))
      .withColumn("mean_y_a", meanY("A"))
      .withColumn("mean_y_b", meanY("B"))
      .withColumn("adj_mean_a",
        meanY("A") - col("theta") * (meanX("A") - meanXAll))
      .withColumn("adj_mean_b",
        meanY("B") - col("theta") * (meanX("B") - meanXAll))
      .select(col("event_type"), col("n_users"), col("n_A").as("n_a"),
        col("n_B").as("n_b"), col("theta"), col("rho2"),
        col("mean_y_a"), col("mean_y_b"),
        (col("mean_y_b") - col("mean_y_a")).as("lift_raw"),
        col("adj_mean_a"), col("adj_mean_b"),
        (col("adj_mean_b") - col("adj_mean_a")).as("lift_adj"))
      .orderBy(col("event_type"))
  }

  /** Conversion-lag percentiles — the time-to-convert distribution
    * between a user's first signup and their first subsequent
    * purchase (the product metric funnels don't show: two funnels
    * with equal conversion can hide a 10× latency difference, and
    * the attribution window every marketing report picks comes FROM
    * this table). Exact order statistics: delays are integer µs, the
    * quantile picks are the two-phase rank cuts at ⌈n·q/100⌉ (the
    * corpus_percentiles tie-break) — no sketch, no interpolation.
    *
    * Scale shape: two user-keyed reduces (first signup, first
    * qualifying purchase — joined on the SAME user key), then ONE
    * global rank through functions/Ranks (a billion converters never
    * collapse to one task); the picks are a conditional aggregate on
    * the ranked relation, the signup denominator a 1-row broadcast.
    */
  def eventsConversionLag(spark: SparkSession, dir: String): DataFrame =
    conversionLagOn(Tables.load(spark, dir, "events"))

  def conversionLagOn(events: DataFrame): DataFrame = {
    val ev = events.filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val delays = ev.filter(col("event_type") === "purchase")
      .join(s1, "user_id")
      .filter(col("us") >= col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("us")).as("t2"))
      .select(col("user_id"), (col("t2") - col("t1")).as("delay_us"))
    val ranked = graft.functions.Ranks.grouped(
      delays, Nil, Seq("delay_us", "user_id"))
    def pick(q: Int) =
      max(when(col("rank") === expr(s"(grp_total * $q + 99) DIV 100"),
        col("delay_us"))).as(s"p${q}_delay_us")
    val stats = ranked.agg(
      count(lit(1)).as("n_converted"),
      pick(25), pick(50), pick(75), pick(90),
      max(col("delay_us")).as("max_delay_us"))
    // rate guarded: this is a global aggregate (always one row), so
    // unlike the per-group censuses the division DOES evaluate on an
    // empty feed — n_signups = 0 must yield null, not an ANSI error
    stats.crossJoin(broadcast(s1.agg(count(lit(1)).as("n_signups"))))
      .select(col("n_signups"), col("n_converted"),
        when(col("n_signups") > 0,
          col("n_converted").cast("double") /
            col("n_signups").cast("double")).as("conversion_rate"),
        col("p25_delay_us"), col("p50_delay_us"), col("p75_delay_us"),
        col("p90_delay_us"), col("max_delay_us"))
  }

  /** Cohort-LTV triangle — the retention-REVENUE matrix next to
    * `events_retention`'s activity view: users cohorted by
    * first-event week, each cohort's distinct actives and value mass
    * accumulated per week-of-age, with the running cumulative LTV
    * per user that growth models fit against. Weeks are pure integer
    * µs arithmetic against the feed's own start ((first−min) div 7d
    * — no calendar, no timezone), value mass is exact integer cents,
    * and cum_ltv_per_user is the one double division per cell.
    *
    * Scale shape: one (user) reduce for first-seen (map-side
    * combined), joined back on the SAME user key (co-partitioned at
    * scale), one (cohort, age) reduce — the triangle is
    * |weeks|²-bounded regardless of corpus size — and the running
    * sum is a per-cohort window over that bounded relation.
    */
  def eventsCohortLtv(spark: SparkSession, dir: String): DataFrame =
    cohortLtvOn(Tables.load(spark, dir, "events"))

  def cohortLtvOn(events: DataFrame): DataFrame = {
    val weekUs = 7L * 24 * 3600 * 1000000L
    val ev = events.filter(col("ts").isNotNull)
      .withColumn("us", unix_micros(col("ts")))
    val first = ev.groupBy(col("user_id")).agg(min(col("us")).as("first_us"))
    val origin = first.agg(min(col("first_us")).as("origin_us"))
    val cells = ev.join(first, "user_id")
      .crossJoin(broadcast(origin))
      .select(
        expr(s"(first_us - origin_us) div ${weekUs}L").as("cohort_week"),
        expr(s"(us - first_us) div ${weekUs}L").as("age_weeks"),
        col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .groupBy(col("cohort_week"), col("age_weeks"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("value_cents"))
    val cohorts = cells.groupBy(col("cohort_week"))
      .agg(max(when(col("age_weeks") === 0, col("n_active")))
        .as("cohort_size"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("age_weeks"))
    cells.join(cohorts, "cohort_week")
      .withColumn("cum_value_cents",
        sum(col("value_cents")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("cohort_week"), col("age_weeks"), col("n_active"),
        col("n_events"), col("value_cents"), col("cohort_size"),
        (col("cum_value_cents").cast("double") /
          col("cohort_size").cast("double") / 100.0)
          .as("cum_ltv_per_user"))
      .orderBy(col("cohort_week"), col("age_weeks"))
  }

  /** Sample-ratio mismatch guardrail for the A/B assignment — the
    * first check every experimentation platform runs before reading
    * means: with a 50/50 split, user counts per arm should differ
    * only by chance; χ²(df=1) = (n_A−n_B)²/(n_A+n_B), flagged past
    * the 3.84 critical value (p < 0.05) with an INTEGER test
    * (100·(n_A−n_B)² > 384·(n_A+n_B)) so no float threshold enters
    * the verdict. An SRM flag means the assignment/logging is broken
    * and `events_ab_test` / `events_ab_cuped` readouts are invalid.
    *
    * One distinct (type, user) reduce, |types|-row output.
    */
  def eventsSrm(spark: SparkSession, dir: String): DataFrame =
    srmOn(Tables.load(spark, dir, "events"))

  def srmOn(events: DataFrame): DataFrame = {
    val users = events
      .filter(col("ts").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
    users.groupBy(col("event_type"))
      .agg(
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("user_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_b"))
      .withColumn("chi2",
        (col("n_a") - col("n_b")).cast("double") *
          (col("n_a") - col("n_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("srm_flag",
        lit(100L) * (col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) >
          lit(384L) * (col("n_a") + col("n_b")))
      .orderBy(col("event_type"))
  }

  /** Automation/bot detection by cadence: flag users whose EXACT
    * median inter-arrival gap is under 120 s — the traffic-hygiene
    * gate an events pipeline runs before engagement analytics (a
    * scripted client fires orders of magnitude faster than any
    * human). The synthetic feed is uniformly human-paced (~7 h
    * median gaps), so bot users are PLANTED deterministically
    * (cdc_validation's pattern): every user_id%31==0 timeline is
    * compressed 1000× toward its first event — truncating integer
    * µs division, identical in both engines — and the detector,
    * which never sees the planting, must flag exactly those users
    * (compressed medians ≈ 26 s sit far inside the 120 s line;
    * human medians sit ~200× outside — no boundary sensitivity).
    *
    * Scale shape: ONE user exchange carries every window — the
    * first-event min for the planting, the gap lag, and the exact
    * median rank selection (corpus_percentiles' ⌈n/2⌉ pick) — then
    * the per-user rollup on the same key. Output is the flagged
    * subset, not the user census.
    */
  def eventsBotDetection(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val planted = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .withColumn("t", unix_micros(col("ts")))
      .withColumn("mt", min(col("t")).over(byUser))
      .withColumn("us",
        when(col("user_id") % 31 === 0,
          col("mt") + expr("(t - mt) div 1000"))
          .otherwise(col("t")))
    val gaps = planted
      .withColumn("gap",
        col("us") - lag(col("us"), 1).over(
          byUser.orderBy(col("us"), col("event_id"))))
      .filter(col("gap").isNotNull)
    gaps
      .withColumn("rn", row_number().over(
        byUser.orderBy(col("gap"), col("event_id"))))
      .withColumn("cnt", count(lit(1)).over(byUser))
      .groupBy(col("user_id"))
      .agg((max(col("cnt")) + 1).as("n_events"),
        max(when(col("rn") === expr("(cnt + 1) div 2"), col("gap")))
          .as("median_gap_us"))
      .filter(col("median_gap_us") < 120000000L)
      .orderBy(col("user_id"))
  }

  /** Robust per-type outlier census: median and MAD (median absolute
    * deviation) of per-user event counts, and the users beyond
    * median + 3·MAD — the robust twin of `events_anomaly`'s
    * mean/stddev z-score (one hub user shifts a mean and inflates a
    * stddev enough to hide itself; medians don't move). Low-median
    * convention (rank ⌈n/2⌉, user_id tie-break) keeps every statistic
    * an exact integer.
    *
    * Scale shape: both median selections are
    * [[graft.functions.Ranks.grouped]] rank-picks (no
    * single-partition window even for a billion-user type); the med/
    * MAD relations are |types|-row broadcasts; the outlier census is
    * one conditional aggregate over the per-user counts.
    */
  def eventsAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val counts = graft.CacheScope.lazyPersist(
      Tables.load(spark, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt")))
    val med = graft.functions.Ranks
      .grouped(counts, Seq("event_type"), Seq("cnt", "user_id"))
      .filter(col("rank") === expr("(grp_total + 1) div 2"))
      .select(col("event_type"), col("cnt").as("med"))
    val dev = graft.CacheScope.lazyPersist(
      counts.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("cnt") - col("med"))))
    val mad = graft.functions.Ranks
      .grouped(dev, Seq("event_type"), Seq("adev", "user_id"))
      .filter(col("rank") === expr("(grp_total + 1) div 2"))
      .select(col("event_type"), col("adev").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        max(col("med")).as("median_cnt"),
        max(col("mad")).as("mad"),
        sum(when(col("cnt") > col("med") + lit(3) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Pareto skyline over parts: the price/size frontier — parts for
    * which no other part is at-most-as-expensive AND at-least-as-big
    * with a strict improvement in one. The multi-objective "best
    * options" query relational engines lack as a primitive (the
    * BNL/D&C skyline literature); here the 2-D case reduces to a
    * dominance test against a running maximum.
    *
    * A part survives iff (a) it carries its price level's maximum
    * size (same price, bigger size dominates, strict in size) and
    * (b) every strictly cheaper price level maxes out BELOW its size
    * (otherwise that level's witness dominates, strict in price).
    *
    * Scale shape: one (price → max size) reduce bounds the relation
    * by |distinct prices|, the exclusive running max over the price
    * order is the two-phase [[graft.functions.Ranks.prefixMax]]
    * (no single-partition window), and the verdict joins back on the
    * price key — never part×part, while the NOT-EXISTS oracle is the
    * quadratic the operator replaces.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val lvl = p.groupBy(col("p_retailprice"))
      .agg(max(col("p_size")).as("lvl_max"))
    val lp = graft.functions.Ranks
      .prefixMax(lvl, Seq("p_retailprice"), "lvl_max")
    p.join(lp, "p_retailprice")
      .filter(col("p_size") === col("lvl_max") &&
        (col("prefix_max").isNull || col("prefix_max") < col("p_size")))
      .select(col("p_partkey"),
        col("p_retailprice").cast("double").as("price"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  /** RFM segmentation: users scored into quintiles on Recency (days
    * since last event vs the corpus head), Frequency (event count),
    * and Monetary (purchase value, in cents so the sum is exact
    * integer arithmetic), reported as the 5×5×5 cell census — the
    * standard marketing-db segmentation a replication consumer
    * derives from the users table.
    *
    * Quintiles are SQL NTILE(5) ordered by (metric, user_id) — the
    * user_id tie-break makes the assignment a total order, so the
    * segmentation is deterministic and engine-reproducible.
    *
    * Scale shape: a naive NTILE is a single-partition global window
    * over ALL users; instead the three metrics are unpivoted
    * (3·|users| rows), ranked per metric with [[graft.functions.Ranks.grouped]]
    * (range partition + tiny offsets relation — no global window),
    * bucketed by NTILE arithmetic, and pivoted back with one
    * user-keyed aggregate. Cost: one per-user reduce, one ranked
    * exchange, one pivot exchange — each shuffle carries O(|users|)
    * slim rows. Output ≤125 cells.
    */
  def eventsRfm(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_ev"),
        coalesce(sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)"))), lit(0L))
          .as("m_cents"))
    val head = perUser.agg(max(col("last_ts")).as("head_ts"))
    val metrics = perUser.crossJoin(broadcast(head))
      .withColumn("rec_days",
        datediff(to_date(col("head_ts")), to_date(col("last_ts"))).cast("long"))
      .selectExpr("user_id",
        "stack(3, 'r', rec_days, 'f', n_ev, 'm', m_cents) AS (metric, v)")
    graft.functions.Ranks.grouped(metrics, Seq("metric"), Seq("v", "user_id"))
      .withColumn("bucket",
        expr(graft.functions.Ranks.ntileExpr("rank", "grp_total", 5)))
      .groupBy(col("user_id"))
      .pivot("metric", Seq("r", "f", "m"))
      .agg(first(col("bucket")))
      .groupBy(col("r").as("r_bucket"), col("f").as("f_bucket"),
        col("m").as("m_bucket"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
  }

  /** Concentration of activity per event type as a Gini coefficient
    * over per-user event counts — 0 when every user contributes
    * equally, →1 when a few users dominate. The inequality gauge
    * that tells a capacity planner whether a type's volume is a
    * broad base or a hot-key risk (the distributional summary next
    * to `cdc_hot_keys`' top-N view).
    *
    * Uses the rank formula G = (2·Σ i·xᵢ) / (n·Σx) − (n+1)/n over
    * counts sorted ascending (ties broken by user_id). Numerators
    * and denominators are exact BIGINT sums; the only floating steps
    * are one multiply, two divides, one subtract in a fixed order —
    * IEEE-identical across engines (the `sim_topk_bruteforce`
    * exact-parity pattern), so no rounding is needed or applied.
    *
    * Scale shape: per-(type, user) counts reduce map-side; the
    * per-type rank is [[graft.functions.Ranks.grouped]] (no
    * single-partition window even when one type holds billions of
    * users); the Gini reduces per type. Output |types| rows.
    */
  def eventsGini(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    graft.functions.Ranks.grouped(counts, Seq("event_type"), Seq("cnt", "user_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("cnt")).as("n_events"),
        sum(col("rank") * col("cnt")).as("rank_mass"))
      .withColumn("gini",
        (lit(2.0) * col("rank_mass").cast("double")) /
          (col("n_users").cast("double") * col("n_events").cast("double")) -
          (col("n_users") + 1).cast("double") / col("n_users").cast("double"))
      .drop("rank_mass")
      .orderBy(col("event_type"))
  }

  val CusumThreshDiv = 20

  /** CUSUM change-point detection over daily event volumes, per
    * type: the classic sequential drift detector S_d = max(0,
    * S_{d−1} + (x_d − μ)) computed via the prefix-sum identity
    * S_d = P_d − min(0, min_{j≤d} P_j) — which turns the clamped
    * recursion (window-hostile) into two plain running windows.
    * Everything stays in EXACT integers by working in D-scaled
    * units: dev_d = x_d·D − total (so μ = total/D never becomes a
    * float), and a day alarms when the scaled statistic exceeds
    * total·D/[[CusumThreshDiv]] — i.e. the cumulative excess above
    * the mean passes 5% of the type's whole volume. Missing calendar
    * days count as zero-volume days (a silent feed IS a change), via
    * a global day spine. Complements `events_anomaly`/`_mad` (point
    * outliers) and `events_rate_drift` (two-window mean shift) with
    * the sequential accumulate-small-drift detector between them.
    *
    * Scale shape: ONE corpus-scale map-side-combined reduce to the
    * (type, day) relation; everything after operates on that bounded
    * |types|·|days| relation — the spine join, both running windows
    * (one (type) exchange), and the per-type rollup.
    */
  def cusum(ev: DataFrame, threshDiv: Int = CusumThreshDiv): DataFrame = {
    // materialized: bounds, the type spine, and the indexed counts
    // all read it — uncached, each consumer would re-scan the corpus
    val daily = graft.CacheScope.materialize(ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(0, datediff(d1, d0))")).as("di"))
      .select(col("event_type"), col("di").cast("long").as("day_idx"))
    val indexed = daily.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("day_idx"), col("x"))
    val full = spine.join(indexed, Seq("event_type", "day_idx"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val tot = full.groupBy(col("event_type"))
      .agg(sum(col("x")).as("total"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = full.join(broadcast(tot), "event_type")
      .withColumn("p", sum(col("x") * col("n_days") - col("total")).over(w))
      .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
      .withColumn("alarm",
        col("s") * threshDiv > col("total") * col("n_days"))
    scored.groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"),
        max(col("total")).as("total_events"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarm_days"),
        coalesce(min(when(col("alarm"), col("day_idx"))), lit(-1L))
          .as("first_alarm_idx"),
        max(col("s")).as("max_stat_scaled"))
      .withColumn("max_excess_events",
        col("max_stat_scaled").cast("double") / col("n_days").cast("double"))
      .orderBy(col("event_type"))
  }

  val AutocorrMaxLag = 7

  /** Daily-count autocorrelation at lags 1..[[AutocorrMaxLag]] per
    * event type — the seasonality-STRENGTH gauge that completes the
    * time-structure trio: `events_seasonality` shows the SHAPE
    * (hour×type lift), `events_forecast_backtest` prices the PAYOFF
    * of exploiting it, and this measures HOW PERIODIC the series
    * actually is (r at lag 7 ≫ lags 1-6 ⇒ weekly structure; all
    * lags ≈ 0 ⇒ the profile is noise and the seasonal forecast
    * should not be trusted).
    *
    * The day spine is zero-filled (a day with no events is a 0
    * sample, not a missing row — without the fill the lag pairs
    * silently misalign around gaps and every r inflates). Pearson r
    * comes from integer cross-products (the qualityLengthCorr
    * pattern): every sum is exact int64 and order-independent; the
    * only float op is one final division, identical in the oracle.
    * A constant window (zero variance on either side) yields null.
    *
    * Scale shape: ONE (type, day) reduce (map-side combined — the
    * relation is |types|·|days|, bounded by the retention window,
    * not the corpus); the lag pairs are an equi-join of that
    * bounded relation against itself on (type, day+lag) after a ≤7×
    * lag fan-out; output |types|·maxLag rows.
    */
  def eventsAutocorr(
      ev: DataFrame, maxLag: Int = AutocorrMaxLag): DataFrame = {
    val daily = graft.CacheScope.materialize(ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(0, datediff(d1, d0))")).as("di"))
      .select(col("event_type"), col("di").cast("long").as("day_idx"))
    val indexed = daily.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("day_idx"), col("x"))
    val full = graft.CacheScope.materialize(
      spine.join(indexed, Seq("event_type", "day_idx"), "left")
        .withColumn("x", coalesce(col("x"), lit(0L))))
    val pairs = full
      .withColumn("lag", explode(expr(s"sequence(1L, ${maxLag}L)")))
      .withColumn("day_y", col("day_idx") + col("lag"))
      .join(full.select(col("event_type"), col("day_idx").as("day_y"),
        col("x").as("y")), Seq("event_type", "day_y"))
    val m = pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val dx = m("n_pairs") * m("sxx") - m("sx") * m("sx")
    val dy = m("n_pairs") * m("syy") - m("sy") * m("sy")
    m.withColumn("r",
        when(dx > 0 && dy > 0,
          (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
          .otherwise(lit(null).cast("double")))
      .select(col("event_type"), col("lag").cast("long").as("lag"),
        col("n_pairs"), col("r"))
      .orderBy(col("event_type"), col("lag"))
  }

  val CmsRows = 4
  val CmsWidth = 256
  val CmsTopN = 64

  /** Count-Min heavy hitters priced against truth — the frequency
    * sibling of the KMV distinct sketch (`cdc_distinct_sketch`):
    * [[CmsRows]] independent hash rows × [[CmsWidth]] counters; every
    * event increments counter (r, h_r(user) mod w), a user's
    * estimate is the MIN over its row counters, and the report ranks
    * the top-[[CmsTopN]] users BY THE SKETCH next to their exact
    * counts and the overestimate (collisions only ever ADD, so
    * estimate ≥ truth always; the spec pins it). The user key space
    * deliberately exceeds the counter budget — the regime the sketch
    * exists for — so the error the ε·N theory prices is VISIBLE in
    * the gauge, not hidden by an oversized table. Why a 100 TB
    * engine carries this: the counter matrix is d·w plain integer
    * sums, so per-shard sketches MERGE BY ADDITION — frequency
    * monitoring over an unbounded key space in constant memory,
    * where the exact per-key census this gauge compares against
    * stops scaling.
    *
    * Determinism: counters are integer sums over the portable seeded
    * hash (engine-identical in DuckDB), the estimate is an integer
    * min, the cut an integer-ordered rank — no floats anywhere.
    *
    * Scale shape: ONE corpus reduce to the (r, col) counter matrix
    * (map-side combined, ≤ d·w rows) + one to the per-user truth;
    * the estimate join probes the broadcast counter matrix with the
    * |users|·d key relation; the top-N is a rank over the |users|-row
    * post-aggregate. No corpus self-join.
    */
  /** The (user, row, col) hash fan-out — applied to the raw event
    * stream to build the sketch, and to the |users|-row truth
    * relation to derive each key's probe coordinates (same formula,
    * so they can't drift).
    */
  private def cmsHashed(users: DataFrame): DataFrame =
    users.select(col("user_id"))
      .select(col("user_id"),
        explode(sequence(lit(0L), lit(CmsRows - 1L))).as("r"))
      .withColumn("cms_col",
        graft.functions.Portable.pHash(
          concat(lit("u#"), col("user_id"), lit("#cms#"), col("r")))
          % CmsWidth)

  /** The sketch itself: the (r, col) → count counter matrix. Exposed
    * so the merge-by-addition claim (sketch(A ∪ B) = sketch(A) +
    * sketch(B), counter-wise) is spec-pinned, not just asserted in
    * prose — it is the property that makes the sketch a shard-local
    * pre-aggregation at 100 TB.
    */
  private[graft] def cmsCounters(ev: DataFrame): DataFrame =
    cmsHashed(ev).groupBy(col("r"), col("cms_col"))
      .agg(count(lit(1)).as("c"))

  def countMinAccuracy(ev: DataFrame): DataFrame = {
    val counters = cmsCounters(ev)
    val truth = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_true"))
    // probe coordinates from the already-reduced |users|-row truth
    // relation (a |users|·d map) — NOT a distinct over the d×|events|
    // fan-out, which would be a second corpus-scale shuffle
    val keys = cmsHashed(truth)
    val est = keys.join(broadcast(counters), Seq("r", "cms_col"))
      .groupBy(col("user_id"))
      .agg(min(col("c")).as("cms_estimate"))
    // top-N via orderBy+limit (TakeOrderedAndProject — no global
    // sort materializes over the |users|-row relation); the rank is
    // then a window over the ≤N surviving rows only
    val top = truth.join(est, "user_id")
      .orderBy(col("cms_estimate").desc, col("user_id"))
      .limit(CmsTopN)
    top.withColumn("rk", row_number().over(
        Window.orderBy(col("cms_estimate").desc, col("user_id")))
        .cast("long"))
      .select(col("rk"), col("user_id"), col("n_true"),
        col("cms_estimate"),
        (col("cms_estimate") - col("n_true")).as("overestimate"))
      .orderBy(col("rk"))
  }
}
