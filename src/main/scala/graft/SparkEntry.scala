package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{ChangeFeed, Envelope, FullLoad, TableMapping, TableStatistics}
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

    "cdc_apply_changes" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      ChangeFeed.applyChanges(c, Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), col("value").as("last_value"), col("table_name"))
        .orderBy(col("user_id"))
    }),

    "cdc_table_statistics" -> ((s, dir) =>
      TableStatistics.compute(ChangeFeed.fromEvents(s, dir))),

    "cdc_selection_rules" -> ((s, dir) => {
      val docs = graft.Tables.load(s, dir, "documents")
        .withColumn("schema_name", lit("graft"))
        .withColumn("table_name", col("source"))
      val m = TableMapping.Mapping(selectionDemoRules)
      docs.filter(m.predicate(col("schema_name"), col("table_name")))
        .groupBy(col("table_name"))
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("table_name"))
    }),

    "cdc_before_image" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      ChangeFeed.beforeImage(c, Seq("user_id"), Seq(col("ts"), col("event_id")),
          Seq("value", "event_id"))
        .filter(col("op") === "update")
        .select(col("user_id"), col("event_id"), col("value"),
          col("before_value"), col("before_event_id"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "cdc_partition_key" -> ((s, dir) =>
      ChangeFeed.withShard(ChangeFeed.fromEvents(s, dir), 8)
        .groupBy(col("partition_key"), col("shard"))
        .agg(count(lit(1)).as("n_messages"))
        .orderBy(col("partition_key"))),

    "cdc_full_load" -> ((s, dir) =>
      FullLoad.summary(s, dir, TableMapping.Mapping(fullLoadDemoRules))),

    "cdc_windowed_stats" -> ((s, dir) =>
      ChangeFeed.windowedStats(ChangeFeed.fromEvents(s, dir))),

    "cdc_transactions" -> ((s, dir) =>
      ChangeFeed.commitSeq(ChangeFeed.fromEvents(s, dir))
        .select(col("table_name"), col("event_id"), col("commit_seq"))
        .orderBy(col("table_name"), col("commit_seq"))),

    "cdc_envelope" -> ((s, dir) => {
      val c = ChangeFeed.fromEvents(s, dir)
      val wrapped = Envelope.wrap(c, col("op"), col("schema_name"),
        col("table_name"), col("ts"), col("event_id"),
        Seq("event_id", "user_id", "value", "props"))
      val dataSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("props", StringType)))
      Envelope.parse(wrapped.select("message", "partition_key"), "message", dataSchema)
        .groupBy(
          col("metadata.`record-type`").as("record_type"),
          col("metadata.operation").as("operation"),
          col("metadata.`table-name`").as("table_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("data.user_id")).as("sum_user_id"),
          sum(col("data.value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("operation"), col("table_name"))
    }),
  )

  /** Selection rules for the demo task: include src1%, exclude src15
    * (the reference's a% / exact-name pattern, stack.py:103-117).
    */
  private val selectionDemoRules = Seq(
    TableMapping.SelectionRule("graft", "src1%"),
    TableMapping.SelectionRule("graft", "src15", TableMapping.Exclude))

  private val fullLoadDemoRules = Seq(
    TableMapping.SelectionRule("graft", "p%"),
    TableMapping.SelectionRule("graft", "r%"),
    TableMapping.SelectionRule("graft", "nation"))

  /** Change-feed CTE shared by the CDC oracles. */
  private val C = s"WITH c AS (${ChangeFeed.duckFromEvents})"

  def oracleSql: Map[String, String] = Map(
    "cdc_apply_changes" ->
      s"""$C, r AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn FROM c)
         |SELECT user_id, event_id AS last_event_id, ts AS last_ts,
         |  value AS last_value, table_name
         |FROM r WHERE rn = 1 AND op <> 'delete' ORDER BY user_id""".stripMargin,

    "cdc_table_statistics" ->
      s"""$C
         |SELECT schema_name, table_name,
         |  CAST(sum(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS inserts,
         |  CAST(sum(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS updates,
         |  CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS deletes,
         |  CAST(sum(CASE WHEN op IN ('create-table','drop-table','alter-table')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS ddls,
         |  CAST(sum(CASE WHEN op = 'load' THEN 1 ELSE 0 END) AS BIGINT) AS full_load_rows,
         |  count(*) AS total
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "cdc_selection_rules" ->
      s"""SELECT source AS table_name, count(*) AS n_rows,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |WHERE ${TableMapping.duckPredicate(selectionDemoRules, "'graft'", "source")}
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_before_image" ->
      s"""$C, b AS (
         |  SELECT *,
         |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS before_value,
         |    lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS before_event_id
         |  FROM c)
         |SELECT user_id, event_id, value, before_value, before_event_id
         |FROM b WHERE op = 'update' ORDER BY user_id, event_id""".stripMargin,

    "cdc_partition_key" ->
      s"""$C
         |SELECT partition_key,
         |  ${graft.functions.Portable.duckHash("partition_key")} % 8 AS shard,
         |  count(*) AS n_messages
         |FROM c GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "cdc_full_load" -> {
      val parts = Seq("nation", "part", "region").flatMap { t =>
        Seq(
          s"SELECT '$t' AS table_name, 'drop-table' AS op, CAST(1 AS BIGINT) AS n_records",
          s"SELECT '$t', 'create-table', CAST(1 AS BIGINT)",
          s"SELECT '$t', 'load', (SELECT count(*) FROM $t)")
      }
      s"SELECT * FROM (${parts.mkString(" UNION ALL ")}) t ORDER BY table_name, op"
    },

    "cdc_windowed_stats" ->
      s"""$C
         |SELECT date_trunc('hour', ts) AS window_start, op,
         |  count(*) AS n_ops,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "cdc_transactions" ->
      s"""$C
         |SELECT table_name, event_id,
         |  CAST(row_number() OVER (PARTITION BY table_name
         |    ORDER BY ts, event_id) AS BIGINT) AS commit_seq
         |FROM c ORDER BY table_name, commit_seq""".stripMargin,

    "cdc_envelope" ->
      s"""$C
         |SELECT 'data' AS record_type, op AS operation, table_name,
         |  count(*) AS n,
         |  CAST(sum(user_id) AS BIGINT) AS sum_user_id,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM c GROUP BY 1, 2, 3 ORDER BY 2, 3""".stripMargin,

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
