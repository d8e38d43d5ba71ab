package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Analytics

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  * Every entry in `queries` has a DuckDB twin in `oracleSql` unless
  * the operator isn't SQL-expressible (driver then does a rows-only
  * check). Column names are aligned 1:1 between the two maps.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Shared DECIMAL cast used to keep aggregate math exact (and thus
    * engine-order-independent); oracle SQL mirrors it verbatim.
    */
  private val D = "DECIMAL(18,2)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> ((s, dir) => Analytics.q1PricingSummary(s, dir)),
    "q3_shipping_priority" -> ((s, dir) => Analytics.q3ShippingPriority(s, dir)),
    "q5_region_revenue"    -> ((s, dir) => Analytics.q5RegionRevenue(s, dir)),
    "q_market_share"       -> ((s, dir) => Analytics.qMarketShare(s, dir)),
    "q_top_parts_per_brand" -> ((s, dir) => Analytics.qTopPartsPerBrand(s, dir)),
    "q_semi_anti"          -> ((s, dir) => Analytics.qSemiAnti(s, dir)),
    "q_rollup"             -> ((s, dir) => Analytics.qRollup(s, dir)),
    "events_sessionize"    -> ((s, dir) => Analytics.eventsSessionize(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS $D)) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS $D)) AS DOUBLE) AS sum_base_price,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D)) * (1 + CAST(l_tax AS $D))) AS DOUBLE) AS sum_charge,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= '1998-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
         |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name,
         |  CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CASE WHEN n_name = 'NATION_3'
         |        THEN CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))
         |        ELSE CAST(0 AS $D) END) AS DOUBLE)
         |    / CAST(sum(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D))) AS DOUBLE)
         |    AS mkt_share,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_top_parts_per_brand" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice, rk FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    CAST(row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rk
        |  FROM part) t
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS $D)) AS DOUBLE) AS total_price
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "events_sessionize" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events
         |), b AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |    THEN 1 ELSE 0 END AS is_break FROM g
         |), s AS (
         |  SELECT *, CAST(sum(is_break) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM b
         |)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  CAST(sum(CAST(value AS $D)) AS DOUBLE) AS session_value,
         |  min(ts) AS session_start
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
